"""End-to-end CDC streaming tests: envelope NDJSON -> routed history tables
-> SCD2 resolution, including delete-as-blank-row, dead-letter, gzip input,
and the registry's STRING-vs-TIMESTAMP update_date quirk."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from cdc_streamming___v2_spark.operators.history import as_of, latest_state
from cdc_streamming___v2_spark.sources.registry import SchemaRegistry
from cdc_streamming___v2_spark.streaming.ingest import CdcIngest

REGISTRY_DOC = {
    # mirrors /root/reference/src/data-stream.json: update_date STRING here...
    "olist_produtos": {
        "table_name": "produtos_cdc",
        "schema": {
            "fields": [
                {"name": "product_id", "type": "STRING"},
                {"name": "product_category_name", "type": "STRING"},
                {"name": "product_photos_qty", "type": "INT64"},
                {"name": "product_weight_g", "type": "FLOAT"},
                {"name": "action", "type": "STRING"},
                {"name": "update_date", "type": "STRING"},
            ]
        },
    },
    # ...and TIMESTAMP here (the reference's intentional divergence)
    "olist_users": {
        "table_name": "users_cdc",
        "schema": {
            "fields": [
                {"name": "first_name", "type": "STRING"},
                {"name": "email", "type": "STRING"},
                {"name": "action", "type": "STRING"},
                {"name": "update_date", "type": "TIMESTAMP"},
            ]
        },
    },
}


def _env(obj, ts, action, payload):
    return json.dumps(
        {
            "object": obj,
            "source_timestamp": ts,
            "source_metadata": {"change_type": action},
            "payload": payload,
        }
    )


LINES = [
    _env("olist_produtos", "2024-01-01T00:00:00Z", "INSERT",
         {"product_id": "p1", "product_category_name": "toys",
          "product_photos_qty": 2, "product_weight_g": 100.0}),
    _env("olist_produtos", "2024-01-02T00:00:00Z", "UPDATE-INSERT",
         {"product_id": "p1", "product_category_name": "games",
          "product_photos_qty": 3, "product_weight_g": 120.0}),
    # DELETE: blank row — payload carries only the key (reference py:68)
    _env("olist_produtos", "2024-01-03T00:00:00Z", "DELETE",
         {"product_id": "p2"}),
    _env("olist_produtos", "2024-01-01T12:00:00Z", "INSERT",
         {"product_id": "p2", "product_category_name": "books",
          "product_photos_qty": 1, "product_weight_g": 80.0}),
    _env("olist_users", "2024-01-05T08:30:00Z", "INSERT",
         {"first_name": "ana", "email": "a@x.com"}),
    # unmapped object -> dead letter (reference py:96-97 just prints)
    _env("mystery_table", "2024-01-05T00:00:00Z", "INSERT", {"x": 1}),
    "{this is not json",  # corrupt -> dead letter
]


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    # first file plain, second gzipped (Datastream logs are GZIP NDJSON,
    # build/stream/stream.tf:148-151)
    with open(os.path.join(in_dir, "batch1.jsonl"), "w") as f:
        f.write("\n".join(LINES[:4]) + "\n")
    with gzip.open(os.path.join(in_dir, "batch2.jsonl.gz"), "wt") as f:
        f.write("\n".join(LINES[4:]) + "\n")

    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
    )
    ing.run_available()
    return ing


def test_history_append_only(ingested):
    hist = ingested.history("olist_produtos")
    assert hist.count() == 4  # every change is a new row
    assert set(hist.columns) == {
        "product_id", "product_category_name", "product_photos_qty",
        "product_weight_g", "action", "update_date", "update_day",
    }


def test_delete_is_blank_row(ingested):
    rows = ingested.history("olist_produtos").filter("action = 'DELETE'").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.product_id == "p2"
    assert r.product_category_name is None and r.product_weight_g is None


def test_update_date_type_quirk(ingested):
    # produtos: STRING (data-stream.json:17); users: TIMESTAMP (:31)
    produtos = ingested.history("olist_produtos")
    users = ingested.history("olist_users")
    assert dict(produtos.dtypes)["update_date"] == "string"
    assert dict(users.dtypes)["update_date"] == "timestamp"
    assert users.first().update_date.year == 2024


def test_scd2_latest_state_over_history(ingested):
    hist = ingested.history("olist_produtos")
    state = latest_state(hist, keys=["product_id"], order_col="update_date")
    rows = {r.product_id: r for r in state.collect()}
    assert set(rows) == {"p1"}  # p2 deleted
    assert rows["p1"].product_category_name == "games"


def test_scd2_as_of_over_history(ingested):
    hist = ingested.history("olist_produtos")
    # before the delete and before p1's update
    state = as_of(hist, keys=["product_id"], ts="2024-01-01T23:59:59Z",
                  order_col="update_date")
    rows = {r.product_id: r.product_category_name for r in state.collect()}
    assert rows == {"p1": "toys", "p2": "books"}


def test_dead_letter_captures_unmapped_and_corrupt(ingested):
    dl = ingested.dead_letter().collect()
    assert len(dl) == 2
    objs = {r.object for r in dl}
    assert "mystery_table" in objs and None in objs
    raws = {r.raw for r in dl}
    assert "{this is not json" in raws


def test_incremental_second_run_exactly_once(spark, ingested):
    # re-running with no new files must not duplicate history rows
    before = ingested.history("olist_produtos").count()
    ingested.run_available()
    assert ingested.history("olist_produtos").count() == before


@pytest.fixture(scope="module")
def ingested_single_pass(spark, tmp_path_factory):
    """Same corpus through the one-scan foreachBatch mode, month partitions."""
    root = tmp_path_factory.mktemp("cdc_sp")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "batch1.jsonl"), "w") as f:
        f.write("\n".join(LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        partition_granularity="month",
    )
    ing.run_available_single_pass()
    return ing


def test_single_pass_matches_per_table_mode(ingested, ingested_single_pass):
    for obj in ("olist_produtos", "olist_users"):
        a = ingested.history(obj).drop("update_day").collect()
        b = ingested_single_pass.history(obj).drop("update_month").collect()
        key = lambda r: tuple(str(v) for v in r)
        assert sorted(map(key, a)) == sorted(map(key, b))
    assert ingested_single_pass.dead_letter().count() == 2


def test_single_pass_month_partition_dirs(ingested_single_pass):
    import glob
    dirs = glob.glob(
        os.path.join(ingested_single_pass.output_dir, "produtos_cdc", "update_month=*")
    )
    assert dirs, "expected hive-style month partition directories"


def test_single_pass_rerun_skips_completed_batches(spark, ingested_single_pass):
    ing = ingested_single_pass
    before = ing.history("olist_produtos").count()
    ing.run_available_single_pass()  # no new files -> no new batch
    assert ing.history("olist_produtos").count() == before


# --- Kafka source wiring (schema-gated: no broker/connector in this env) ------


def test_kafka_batch_twin_matches_file_source(spark, ingested):
    """The Kafka path is value-bytes -> cast(string) -> the SAME parse/route
    plan as the file source. Prove the shared plan on a batch frame shaped
    exactly like Kafka output (binary ``value``): routed rows must equal the
    file-ingested history (modulo the partition column)."""
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.sources.cdc_schema import parse_envelope

    kafka_like = spark.createDataFrame(
        [(line.encode("utf-8"),) for line in LINES], "value binary"
    )
    env = parse_envelope(kafka_like.select(F.col("value").cast("string").alias("value")))
    spec = ingested.registry.get("olist_produtos")
    routed = ingested._route_table(env, spec).drop("update_day")
    key = lambda r: tuple(str(v) for v in r)
    got = sorted(map(key, routed.collect()))
    want = sorted(map(key, ingested.history("olist_produtos").drop("update_day").collect()))
    assert got == want


def test_as_of_prunes_history_partitions(ingested):
    """VERDICT r2 #9: the SCD2 as_of path must reach the parquet scan as a
    PARTITION filter on update_day (not just a row filter on update_date),
    so a point-in-time query over a years-long partitioned history reads
    only the partitions at or before the requested timestamp."""
    hist = ingested.history("olist_produtos")
    view = as_of(hist, ["product_id"], "2024-01-02T00:00:00Z")
    plan = view._jdf.queryExecution().executedPlan().toString()
    scan = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "update_day" in scan.split("PartitionFilters", 1)[1][:200]
    # and the filter actually prunes: the 2024-01-03 DELETE partition is
    # not read, so p2 stays visible as of the 2nd
    ids = {r.product_id for r in view.collect()}
    assert ids == {"p1", "p2"}


def test_kafka_mock_e2e_matches_file_source(spark, ingested, tmp_path):
    """kafka-mock streams the same files but presents each record as a
    Kafka-shaped binary value through the real decode hop; e2e history
    must equal the file-source ingest exactly."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "batch1.jsonl"), "w") as f:
        f.write("\n".join(LINES[:4]) + "\n")
    with gzip.open(os.path.join(in_dir, "batch2.jsonl.gz"), "wt") as f:
        f.write("\n".join(LINES[4:]) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
        source_format="kafka-mock",
    )
    ing.run_available()
    for obj in ("olist_produtos", "olist_users"):
        key = lambda r: tuple(str(v) for v in r)
        got = sorted(map(key, ing.history(obj).collect()))
        want = sorted(map(key, ingested.history(obj).collect()))
        assert got == want


def test_kafka_reader_gated_on_connector(spark, tmp_path):
    """With source_format='kafka' the reader builds the standard Kafka source;
    in this container the connector jar is absent, so materializing the plan
    must fail with the canonical missing-data-source error (if a connector IS
    present, the plan must instead analyze cleanly)."""
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=str(tmp_path / "unused"),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
        source_format="kafka",
        kafka_options={
            "kafka.bootstrap.servers": "localhost:9092",
            "subscribe": "cdc-log",
        },
    )
    try:
        ing._read_stream()
    except Exception as e:  # missing connector is the expected outcome here
        assert "kafka" in str(e).lower()


def test_unknown_source_format_rejected(spark, tmp_path):
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=str(tmp_path / "in"),
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
        source_format="carrier-pigeon",
    )
    with pytest.raises(ValueError, match="source_format"):
        ing._read_stream()


# --- transactional single-pass publish ----------------------------------------


@pytest.fixture(scope="module")
def ingested_txn(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_txn")
    in_dir = str(root / "in")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "batch1.jsonl"), "w") as f:
        f.write("\n".join(LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=str(root / "out"),
        checkpoint_dir=str(root / "ck"),
        transactional=True,
    )
    ing.run_available_single_pass()
    return ing


def test_txn_matches_per_table_mode(ingested, ingested_txn):
    for obj in ("olist_produtos", "olist_users"):
        a = ingested.history(obj).drop("update_day").collect()
        b = ingested_txn.history(obj).drop("update_day").collect()
        key = lambda r: tuple(str(v) for v in r)
        assert sorted(map(key, a)) == sorted(map(key, b))
    assert ingested_txn.dead_letter().count() == 2


def test_txn_publishes_batch_dirs_no_staging_left(ingested_txn):
    import glob
    assert glob.glob(
        os.path.join(ingested_txn.output_dir, "produtos_cdc", "batch=*")
    ), "expected batch=<id> partition directories"
    assert not glob.glob(
        os.path.join(ingested_txn.output_dir, "*", "_staging_*")
    ), "staging dirs must not survive a successful publish"


def test_txn_replay_after_lost_marker_is_exactly_once(spark, ingested_txn):
    """Simulate the worst crash window: all sinks published but the batch
    marker never written. The replayed batch must skip every already-
    published (table, batch) directory -> zero duplicate rows."""
    import glob
    import shutil

    ing = ingested_txn
    before = {
        obj: ing.history(obj).count() for obj in ("olist_produtos", "olist_users")
    }
    for marker in glob.glob(os.path.join(ing.checkpoint_dir, "_batches", "*")):
        os.remove(marker)
    # also clear the stream checkpoint so the source re-offers the same file
    shutil.rmtree(os.path.join(ing.checkpoint_dir, "_single_pass"))
    ing.run_available_single_pass()
    after = {
        obj: ing.history(obj).count() for obj in ("olist_produtos", "olist_users")
    }
    assert after == before
    assert ing.dead_letter().count() == 2


# --- registry schema evolution ------------------------------------------------


def _evolved_registry():
    import copy
    doc = copy.deepcopy(REGISTRY_DOC)
    doc["olist_produtos"]["schema"]["fields"].insert(
        4, {"name": "product_height_cm", "type": "FLOAT"}
    )
    return doc


def test_registry_evolution_add_column_end_to_end(spark, tmp_path):
    """ALTER TABLE ADD COLUMN mid-stream: ingest under registry v1, restart
    under v2 (one added nullable column), ingest more. Old history rows
    project NULL for the new column; new rows carry it — no rewrite of
    existing files."""
    in_dir, out_dir, ck_dir = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "v1.jsonl"), "w") as f:
        f.write("\n".join(LINES[:4]) + "\n")
    v1 = SchemaRegistry.from_dict(REGISTRY_DOC)
    CdcIngest(spark, v1, in_dir, out_dir, ck_dir).run_available()

    v2 = SchemaRegistry.from_dict(_evolved_registry())
    v1.check_evolution(v2)  # safe: add-column only
    with open(os.path.join(in_dir, "v2.jsonl"), "w") as f:
        f.write(_env("olist_produtos", "2024-02-01T00:00:00Z", "INSERT",
                     {"product_id": "p9", "product_category_name": "tall",
                      "product_photos_qty": 1, "product_height_cm": 42.5,
                      "product_weight_g": 500.0}) + "\n")
    ing2 = CdcIngest(spark, v2, in_dir, out_dir, ck_dir)
    ing2.run_available()

    hist = ing2.history("olist_produtos")
    assert hist.count() == 5
    assert hist.filter("product_height_cm IS NOT NULL").count() == 1
    assert (
        hist.filter("product_id = 'p9'").first().product_height_cm == 42.5
    )


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: d.pop("olist_users"), "table dropped"),
        (
            lambda d: d["olist_produtos"]["schema"]["fields"].pop(0),
            "column dropped",
        ),
        (
            lambda d: d["olist_produtos"]["schema"]["fields"][0].update(
                {"type": "INT64"}
            ),
            "type changed",
        ),
        (
            lambda d: d["olist_users"].update({"table_name": "users_v2"}),
            "sink renamed",
        ),
    ],
)
def test_registry_evolution_rejects_unsafe(mutate, msg):
    import copy
    old = SchemaRegistry.from_dict(REGISTRY_DOC)
    doc = copy.deepcopy(REGISTRY_DOC)
    mutate(doc)
    with pytest.raises(ValueError, match=msg):
        old.check_evolution(SchemaRegistry.from_dict(doc))


def test_registry_hot_reload_new_table_mid_stream(spark, tmp_path):
    """The reference re-reads data-stream.json per record, so registry edits
    take effect mid-stream (src/dataflow-cdc-stream.py:71-76). Hot reload
    reproduces that observable behavior at one stat() per micro-batch:
    a table added to the registry FILE while the stream is running begins
    routing on the next micro-batch — no restart."""
    import copy

    in_dir, out_dir, ck_dir = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(in_dir)
    reg_path = str(tmp_path / "data-stream.json")
    with open(reg_path, "w") as f:
        json.dump(REGISTRY_DOC, f)
    with open(os.path.join(in_dir, "b1.jsonl"), "w") as f:
        f.write("\n".join(LINES[:4]) + "\n")
        # pedidos is not registered yet -> this row must dead-letter
        f.write(_env("olist_pedidos", "2024-03-01T00:00:00Z", "INSERT",
                     {"order_id": "o1", "status": "shipped"}) + "\n")

    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_file(reg_path),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        registry_path=reg_path,
        hot_reload=True,
    )
    q = ing.start_single_pass()
    try:
        q.processAllAvailable()
        dead = {r.object for r in ing.dead_letter().collect()}
        assert "olist_pedidos" in dead

        # add the new table to the registry FILE while the stream runs
        doc = copy.deepcopy(REGISTRY_DOC)
        doc["olist_pedidos"] = {
            "table_name": "pedidos_cdc",
            "schema": {"fields": [
                {"name": "order_id", "type": "STRING"},
                {"name": "status", "type": "STRING"},
                {"name": "action", "type": "STRING"},
                {"name": "update_date", "type": "TIMESTAMP"},
            ]},
        }
        with open(reg_path, "w") as f:
            json.dump(doc, f)
        with open(os.path.join(in_dir, "b2.jsonl"), "w") as f:
            f.write(_env("olist_pedidos", "2024-03-02T00:00:00Z", "INSERT",
                         {"order_id": "o2", "status": "created"}) + "\n")
        q.processAllAvailable()
    finally:
        ing.stop()

    hist = ing.history("olist_pedidos")
    assert [r.order_id for r in hist.collect()] == ["o2"]
    # pre-reload rows for the new table stay in the dead letter (append-only:
    # nothing re-routes), and the original tables were unaffected
    assert ing.history("olist_produtos").count() == 4


def test_hot_reload_rejects_unsafe_edit_mid_stream(spark, tmp_path):
    """An unsafe registry edit (type change) must FAIL the stream rather
    than silently write mixed-schema history files."""
    import copy

    in_dir, out_dir, ck_dir = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(in_dir)
    reg_path = str(tmp_path / "data-stream.json")
    with open(reg_path, "w") as f:
        json.dump(REGISTRY_DOC, f)
    with open(os.path.join(in_dir, "b1.jsonl"), "w") as f:
        f.write("\n".join(LINES[:4]) + "\n")

    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_file(reg_path),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        registry_path=reg_path,
        hot_reload=True,
    )
    q = ing.start_single_pass()
    try:
        q.processAllAvailable()
        doc = copy.deepcopy(REGISTRY_DOC)
        doc["olist_produtos"]["schema"]["fields"][0]["type"] = "INT64"
        with open(reg_path, "w") as f:
            json.dump(doc, f)
        with open(os.path.join(in_dir, "b2.jsonl"), "w") as f:
            f.write("\n".join(LINES[:1]) + "\n")
        with pytest.raises(Exception, match="type changed"):
            q.processAllAvailable()
            q.awaitTermination(60)
    finally:
        ing.stop()


def test_cli_runner_end_to_end(tmp_path):
    """python -m cdc_streamming___v2_spark.streaming.ingest — the job is
    launchable as a CLI with paths for the reference's 8 GCP parameters
    (src/dataflow-cdc-stream.py:152-177); available-now trigger drains the
    input and exits 0 with history tables on disk."""
    from cdc_streamming___v2_spark.streaming.ingest import main

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    reg_path = str(tmp_path / "data-stream.json")
    with open(reg_path, "w") as f:
        json.dump(REGISTRY_DOC, f)
    with open(os.path.join(in_dir, "b1.jsonl"), "w") as f:
        f.write("\n".join(LINES) + "\n")

    rc = main([
        "--input-dir", in_dir,
        "--registry", reg_path,
        "--output-dir", out_dir,
        "--trigger", "available-now",
        "--hot-reload",
    ])
    assert rc == 0

    import glob
    produtos = glob.glob(os.path.join(out_dir, "produtos_cdc", "**", "*.parquet"),
                         recursive=True)
    users = glob.glob(os.path.join(out_dir, "users_cdc", "**", "*.parquet"),
                      recursive=True)
    dead = glob.glob(os.path.join(out_dir, "_dead_letter", "**", "*.parquet"),
                     recursive=True)
    assert produtos and users and dead


def test_cli_replay_dead_letters(tmp_path, capsys):
    """--replay-dead-letters: the CLI twin of the operator — ingest a
    misconfigured stream (mixed-dialect lines under a registry missing
    olist_users), fix the registry FILE, re-invoke with the flag; the
    quarantined rows land and the stats line prints as JSON."""
    from cdc_streamming___v2_spark.streaming.ingest import main

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    reg_path = str(tmp_path / "data-stream.json")
    partial = {"olist_produtos": REGISTRY_DOC["olist_produtos"]}
    with open(reg_path, "w") as f:
        json.dump(partial, f)
    with open(os.path.join(in_dir, "b1.jsonl"), "w") as f:
        f.write("\n".join(LINES) + "\n")

    rc = main([
        "--input-dir", in_dir,
        "--registry", reg_path,
        "--output-dir", out_dir,
        "--trigger", "available-now",
    ])
    assert rc == 0
    # the fix: registry file gains the missing table
    with open(reg_path, "w") as f:
        json.dump(REGISTRY_DOC, f)
    rc = main([
        "--input-dir", in_dir,
        "--registry", reg_path,
        "--output-dir", out_dir,
        "--replay-dead-letters",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["tables"].get("users_cdc", 0) >= 1

    import glob
    users = glob.glob(os.path.join(out_dir, "users_cdc", "**", "*.parquet"),
                      recursive=True)
    assert users


def test_cli_rejects_bad_flag_combo(tmp_path):
    from cdc_streamming___v2_spark.streaming.ingest import main

    with pytest.raises(SystemExit):
        main([
            "--input-dir", "x", "--registry", "y", "--output-dir", "z",
            "--mode", "per-table", "--hot-reload",
        ])


# --- Debezium envelope adapter (VERDICT r4 #1) -------------------------------


def _dbz(table, op, ts_ms, before=None, after=None, wrap=False):
    rec = {
        "op": op,
        "ts_ms": ts_ms,
        "before": before,
        "after": after,
        "source": {"db": "olist", "table": table},
    }
    if wrap:  # Kafka Connect schema envelope
        rec = {"schema": {"type": "struct"}, "payload": rec}
    return json.dumps(rec)


P3 = {"product_id": "p3", "product_category_name": "tools",
      "product_photos_qty": 5, "product_weight_g": 250.0}
P3_V2 = {**P3, "product_category_name": "hardware", "product_weight_g": 260.0}

DBZ_LINES = [
    _dbz("olist_produtos", "c", 1704672000000, after=P3),           # insert
    _dbz("olist_produtos", "u", 1704758400000, before=P3,
         after=P3_V2, wrap=True),                                   # update
    _dbz("olist_produtos", "d", 1704844800000, before=P3_V2),       # delete
    _dbz("olist_users", "r", 1704931200000,
         after={"first_name": "bea", "email": "b@x.com"}, wrap=True),
    _dbz("olist_produtos", "x", 1704931200000, after=P3),  # unknown op -> DL
]


@pytest.fixture(scope="module")
def dbz_ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_dbz")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "dbz1.jsonl"), "w") as f:
        f.write("\n".join(DBZ_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="debezium",
    )
    ing.run_available_single_pass()
    return ing


def test_debezium_routes_all_ops(dbz_ingested):
    hist = dbz_ingested.history("olist_produtos")
    rows = {(r["action"], r["update_date"]): r for r in hist.collect()}
    assert len(rows) == 3
    # STRING-typed update_date gets the adapter's UTC ms-format string
    ins = rows[("INSERT", "2024-01-08 00:00:00.000")]
    assert ins["product_category_name"] == "tools"
    upd = rows[("UPDATE-INSERT", "2024-01-09 00:00:00.000")]
    assert upd["product_category_name"] == "hardware"
    # DELETE carries the full BEFORE image (richer than blank-row)
    dele = rows[("DELETE", "2024-01-10 00:00:00.000")]
    assert dele["product_category_name"] == "hardware"
    assert dele["product_weight_g"] == pytest.approx(260.0)


def test_debezium_snapshot_read_is_insert_with_timestamp(dbz_ingested):
    import datetime

    users = dbz_ingested.history("olist_users").collect()
    assert len(users) == 1
    assert users[0]["action"] == "INSERT"  # op 'r' folds into INSERT
    # TIMESTAMP-typed update_date coerces from the same raw string
    assert users[0]["update_date"] == datetime.datetime(2024, 1, 11)


def test_debezium_unknown_op_dead_letters(dbz_ingested):
    dl = dbz_ingested.dead_letter().collect()
    assert len(dl) == 1 and '"op": "x"' in dl[0]["raw"]


@pytest.fixture(scope="module")
def mixed_ingested(spark, tmp_path_factory):
    """Both envelope formats in ONE stream directory, auto-dispatched."""
    root = tmp_path_factory.mktemp("cdc_mixed")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "datastream.jsonl"), "w") as f:
        f.write("\n".join(LINES[:4]) + "\n")
    with open(os.path.join(in_dir, "debezium.jsonl"), "w") as f:
        f.write("\n".join(DBZ_LINES[:3]) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    return ing


def test_mixed_stream_unifies_both_envelopes(mixed_ingested):
    hist = mixed_ingested.history("olist_produtos")
    assert hist.count() == 7  # 4 datastream + 3 debezium
    by_product = {
        r["product_id"]: r["action"]
        for r in hist.filter("action = 'INSERT'").collect()
    }
    # p1/p2 arrived via Datastream, p3 via Debezium — one unified table
    assert set(by_product) == {"p1", "p2", "p3"}


# --- Maxwell / Canal envelope adapters ---------------------------------------


def _mxw(table, mtype, ts_s, data=None):
    return json.dumps({
        "database": "olist", "table": table, "type": mtype, "ts": ts_s,
        "data": data, "old": None,
    })


MXW_LINES = [
    _mxw("olist_produtos", "insert", 1704672000, data=P3),
    _mxw("olist_produtos", "update", 1704758400, data=P3_V2),
    _mxw("olist_produtos", "delete", 1704844800, data=P3_V2),
    _mxw("olist_users", "bootstrap-insert", 1704931200,
         data={"first_name": "bea", "email": "b@x.com"}),
    _mxw("olist_produtos", "bootstrap-start", 1704931200),  # marker -> DL
]


def _cnl(table, ctype, es_ms, data_rows):
    return json.dumps({
        "database": "olist", "table": table, "type": ctype, "es": es_ms,
        "ts": es_ms + 500, "isDdl": False, "data": data_rows,
        "old": None, "pkNames": ["product_id"],
    })


P4 = {"product_id": "p4", "product_category_name": "garden",
      "product_photos_qty": 2, "product_weight_g": 100.0}

CNL_LINES = [
    # one message, TWO batched row images -> must fan out to two rows
    _cnl("olist_produtos", "INSERT", 1704672000000, [P3, P4]),
    _cnl("olist_produtos", "UPDATE", 1704758400000, [P3_V2]),
    _cnl("olist_produtos", "DELETE", 1704844800000, [P4]),
    # DDL record: data null, type not in the DML vocabulary -> dead-letter
    _cnl("olist_produtos", "CREATE", 1704931200000, None),
]


@pytest.fixture(scope="module")
def mxw_ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_mxw")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "mxw1.jsonl"), "w") as f:
        f.write("\n".join(MXW_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="maxwell",
    )
    ing.run_available_single_pass()
    return ing


def test_maxwell_routes_all_types(mxw_ingested):
    hist = mxw_ingested.history("olist_produtos")
    rows = {r["action"]: r for r in hist.collect()}
    assert len(rows) == 3
    assert rows["INSERT"]["product_category_name"] == "tools"
    assert rows["UPDATE-INSERT"]["product_category_name"] == "hardware"
    # Maxwell deletes carry the full row image in `data`
    assert rows["DELETE"]["product_weight_g"] == pytest.approx(260.0)
    # epoch-seconds ts roundtrips at second precision
    assert rows["INSERT"]["update_date"] == "2024-01-08 00:00:00"


def test_maxwell_bootstrap_semantics(mxw_ingested):
    import datetime

    users = mxw_ingested.history("olist_users").collect()
    assert len(users) == 1 and users[0]["action"] == "INSERT"
    assert users[0]["update_date"] == datetime.datetime(2024, 1, 11)
    dl = mxw_ingested.dead_letter().collect()
    assert len(dl) == 1 and "bootstrap-start" in dl[0]["raw"]


@pytest.fixture(scope="module")
def cnl_ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_cnl")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "cnl1.jsonl"), "w") as f:
        f.write("\n".join(CNL_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="canal",
    )
    ing.run_available_single_pass()
    return ing


def test_canal_batched_data_fans_out(cnl_ingested):
    hist = cnl_ingested.history("olist_produtos")
    rows = hist.collect()
    assert len(rows) == 4  # 2 batched inserts + 1 update + 1 delete
    inserts = {r["product_id"] for r in rows if r["action"] == "INSERT"}
    assert inserts == {"p3", "p4"}  # one wire message -> two envelope rows
    # es (source execute time, millis) roundtrips on the shared header
    ins_dates = {r["update_date"] for r in rows if r["action"] == "INSERT"}
    assert ins_dates == {"2024-01-08 00:00:00.000"}


def test_canal_ddl_dead_letters(cnl_ingested):
    dl = cnl_ingested.dead_letter().collect()
    assert len(dl) == 1 and '"CREATE"' in dl[0]["raw"]


def test_auto_dispatch_unifies_all_four_envelopes(spark, tmp_path_factory):
    """One directory mixing Datastream, Debezium, Maxwell AND Canal lines
    parses into one unified history under envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed4")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    hist = ing.history("olist_produtos")
    rows = hist.collect()
    # 1 datastream + 1 dbz insert + 1 maxwell insert + 2 canal batched
    assert len(rows) == 5
    assert {r["product_id"] for r in rows} >= {"p3", "p4"}


def _dms(table, op, ts_iso, data, record_type="data"):
    return json.dumps({
        "data": data,
        "metadata": {
            "timestamp": ts_iso, "record-type": record_type,
            "operation": op, "partition-key-type": "primary-key",
            "schema-name": "olist", "table-name": table,
            "transaction-id": 123456789,
        },
    })


DMS_LINES = [
    _dms("olist_produtos", "insert", "2024-01-08T00:00:00.000001Z", P3),
    _dms("olist_produtos", "update", "2024-01-09T00:00:00.000002Z", P3_V2),
    _dms("olist_produtos", "delete", "2024-01-10T00:00:00.000003Z", P4),
    _dms("olist_produtos", "load", "2024-01-07T00:00:00.000000Z", P4),
    # control record (checkpoint): must dead-letter, never reach history
    _dms("olist_produtos", "checkpoint", "2024-01-11T00:00:00.000004Z",
         None, record_type="control"),
]


@pytest.fixture(scope="module")
def dms_ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_dms")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "dms.jsonl"), "w") as f:
        f.write("\n".join(DMS_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="aws_dms",
    )
    ing.run_available_single_pass()
    return ing


def test_aws_dms_routes_all_ops(dms_ingested):
    """insert/update/delete/load all route; load lands as INSERT."""
    hist = dms_ingested.history("olist_produtos").collect()
    assert len(hist) == 4
    actions = sorted(r["action"] for r in hist)
    assert actions == ["DELETE", "INSERT", "INSERT", "UPDATE-INSERT"]


def test_aws_dms_control_records_dead_letter(dms_ingested):
    dead = dms_ingested.dead_letter().collect()
    assert len(dead) == 1
    assert "control" in dead[0]["raw"]


def test_auto_dispatch_includes_dms(spark, tmp_path_factory):
    """A mixed directory with all FIVE producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed5")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    hist = ing.history("olist_produtos")
    rows = hist.collect()
    # 1 datastream + 1 dbz + 1 maxwell + 2 canal batched + 1 dms
    assert len(rows) == 6


def _ogg(table, op, ts, data, before=None):
    rec = {"table": table, "op_type": op, "op_ts": ts,
           "current_ts": ts, "pos": "00000000020030806864"}
    if before is not None:
        rec["before"] = before
    if data is not None:
        rec["after"] = data
    return json.dumps(rec)


OGG_LINES = [
    _ogg("OLIST.olist_produtos", "I", "2024-01-12 00:00:00.000001", P3),
    _ogg("OLIST.olist_produtos", "U", "2024-01-13 00:00:00.000002", P3_V2),
    # OGG deletes carry only the before image
    _ogg("OLIST.olist_produtos", "D", "2024-01-14 00:00:00.000003", None,
         before=P4),
    # truncate record: must dead-letter (no canonical action)
    _ogg("OLIST.olist_produtos", "T", "2024-01-15 00:00:00.000004", None,
         before=P4),
]


def test_goldengate_envelope_parses_and_dead_letters_truncate(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_goldengate,
    )

    df = spark.createDataFrame([(l,) for l in OGG_LINES], "value string")
    rows = parse_envelope_goldengate(df).collect()
    by_action = {r["action"]: r for r in rows}
    assert set(by_action) == {"INSERT", "UPDATE-INSERT", "DELETE", None}
    # schema prefix stripped for registry routing
    assert all(r["object"] == "olist_produtos" for r in rows)
    # delete payload recovered from the before image
    assert "p4" in by_action["DELETE"]["payload_json"]
    # op_ts roundtrips byte-exactly
    assert by_action["INSERT"]["update_date_raw"] == "2024-01-12 00:00:00.000001"


def test_auto_dispatch_includes_goldengate(spark, tmp_path_factory):
    """A mixed directory with all SIX producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed6")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    hist = ing.history("olist_produtos")
    rows = hist.collect()
    # 1 datastream + 1 dbz + 1 maxwell + 2 canal batched + 1 dms + 1 ogg
    assert len(rows) == 7


def _mssql(capture, op, ts, payload, ts_field="__$commit_time"):
    rec = {
        "__$operation": op,
        "__$start_lsn": "0000003a0000001c0003",
        "__$capture_instance": capture,
        ts_field: ts,
    }
    if payload:
        rec.update(payload)
    return json.dumps(rec)


MSSQL_LINES = [
    _mssql("dbo_olist_produtos", 2, "2024-01-16 00:00:00.001", P3),
    _mssql("dbo_olist_produtos", 4, "2024-01-17 00:00:00.002", P3_V2),
    # deletes carry the full last-known row; commit time arrives under the
    # lsn_time_mapping column name
    _mssql("dbo_olist_produtos", 1, "2024-01-18 00:00:00.003", P4,
           ts_field="tran_end_time"),
    # op 3 = update BEFORE image: applying it would double-apply the
    # update — must dead-letter (NULL action)
    _mssql("dbo_olist_produtos", 3, "2024-01-17 00:00:00.002", P3),
]


def test_sqlserver_envelope_parses_and_dead_letters_before_image(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_sqlserver,
    )

    df = spark.createDataFrame([(l,) for l in MSSQL_LINES], "value string")
    rows = parse_envelope_sqlserver(df).collect()
    by_action = {r["action"]: r for r in rows}
    assert set(by_action) == {"INSERT", "UPDATE-INSERT", "DELETE", None}
    # dbo_ capture-instance prefix stripped for registry routing
    assert all(r["object"] == "olist_produtos" for r in rows)
    # flat envelope: payload is the whole line (metadata keys drop at the
    # routed from_json decode because no table schema declares them)
    assert "__$operation" in by_action["INSERT"]["payload_json"]
    assert "p3" in by_action["INSERT"]["payload_json"]
    # tran_end_time fallback recovered the delete commit time
    assert by_action["DELETE"]["update_date_raw"] == "2024-01-18 00:00:00.003"
    # default_table fallback for single-table exports without the
    # capture-instance field
    bare = json.dumps({"__$operation": 2, "__$commit_time":
                       "2024-01-19 00:00:00.004", **P3})
    df2 = spark.createDataFrame([(bare,)], "value string")
    r2 = parse_envelope_sqlserver(df2, default_table="olist_produtos")
    assert r2.collect()[0]["object"] == "olist_produtos"


def test_auto_dispatch_includes_sqlserver(spark, tmp_path_factory):
    """A mixed directory with all SEVEN producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed7")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0], MSSQL_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    hist = ing.history("olist_produtos")
    rows = hist.collect()
    # 1 datastream + 1 dbz + 1 maxwell + 2 canal batched + 1 dms + 1 ogg
    # + 1 sqlserver
    assert len(rows) == 8


def test_sqlserver_e2e_ingest(spark, tmp_path_factory):
    """envelope_format='sqlserver' end-to-end through registry routing,
    payload decode (flat envelope: __$ keys dropped by the table schema),
    enrich, and history."""
    root = tmp_path_factory.mktemp("cdc_mssql_e2e")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "changes.jsonl"), "w") as f:
        f.write("\n".join(MSSQL_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="sqlserver",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    assert len(rows) == 3  # op-3 before image dead-lettered
    actions = sorted(r["action"] for r in rows)
    assert actions == ["DELETE", "INSERT", "UPDATE-INSERT"]
    by_action = {r["action"]: r for r in rows}
    # metadata keys dropped; payload columns decoded
    assert by_action["INSERT"]["product_category_name"] == "tools"
    assert by_action["DELETE"]["product_id"] == "p4"


# ---------------------------------------------------------------------------
# MongoDB change streams (eighth producer)
# ---------------------------------------------------------------------------


def _mongo(coll, op, iso_ts=None, full=None, upd=None, key=None,
           cluster_t=None):
    doc = {"operationType": op}
    if coll is not None:
        doc["ns"] = {"db": "retail", "coll": coll}
    if full is not None:
        doc["fullDocument"] = full
    if upd is not None:
        doc["updateDescription"] = {"updatedFields": upd,
                                    "removedFields": []}
    if key is not None:
        doc["documentKey"] = key
    if iso_ts is not None:
        doc["wallTime"] = {"$date": iso_ts}
    if cluster_t is not None:
        doc["clusterTime"] = {"$timestamp": {"t": cluster_t, "i": 1}}
    return json.dumps(doc)


MONGO_LINES = [
    _mongo("olist_produtos", "insert", "2024-01-16T00:00:00.001Z",
           full=P3, key={"product_id": "p3"}),
    # non-lookup update: key must MERGE into the partial image
    _mongo("olist_produtos", "update", "2024-01-17T00:00:00.002Z",
           upd={"product_category_name": "hardware",
                "product_weight_g": 260.0},
           key={"product_id": "p3"}),
    _mongo("olist_produtos", "replace", "2024-01-17T00:00:00.003Z",
           full=P3_V2, key={"product_id": "p3"}),
    # delete: documentKey only, clusterTime epoch-seconds fallback
    _mongo("olist_produtos", "delete", key={"product_id": "p4"},
           cluster_t=1705536000),
    # DDL event: must dead-letter
    _mongo("olist_produtos", "drop"),
]


def test_mongo_envelope_parses_merges_and_dead_letters_ddl(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_mongo,
    )

    df = spark.createDataFrame([(l,) for l in MONGO_LINES], "value string")
    rows = parse_envelope_mongo(df).collect()
    actions = [r["action"] for r in rows]
    assert actions.count("UPDATE-INSERT") == 2  # update + replace
    assert set(actions) == {"INSERT", "UPDATE-INSERT", "DELETE", None}
    assert all(r["object"] == "olist_produtos" for r in rows)
    # the partial update carries BOTH the key and the changed fields
    upd = rows[1]
    assert upd["action"] == "UPDATE-INSERT"
    assert '"product_id":"p3"' in upd["payload_json"].replace(" ", "")
    assert "hardware" in upd["payload_json"]
    # wallTime extended JSON -> canonical layout
    assert rows[0]["update_date_raw"] == "2024-01-16 00:00:00.001"
    # delete: clusterTime epoch fallback produced a timestamp
    assert rows[3]["update_date_raw"] is not None
    assert json.loads(rows[3]["payload_json"]) == {"product_id": "p4"}
    # drop dead-letters
    assert rows[4]["action"] is None
    # default_table fallback when ns is absent
    bare = _mongo(None, "insert", "2024-01-19T00:00:00.004Z", full=P3)
    r2 = parse_envelope_mongo(
        spark.createDataFrame([(bare,)], "value string"),
        default_table="olist_produtos",
    )
    assert r2.collect()[0]["object"] == "olist_produtos"


def test_auto_dispatch_includes_mongo(spark, tmp_path_factory):
    """A mixed directory with all EIGHT producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed8")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0], MSSQL_LINES[0], MONGO_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    # 1 datastream + 1 dbz + 1 maxwell + 2 canal batched + 1 dms + 1 ogg
    # + 1 sqlserver + 1 mongo
    assert len(rows) == 9


def test_mongo_e2e_ingest(spark, tmp_path_factory):
    """envelope_format='mongo' end-to-end through registry routing,
    payload decode (merged partial update keeps the key), enrich, and
    history."""
    root = tmp_path_factory.mktemp("cdc_mongo_e2e")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "changes.jsonl"), "w") as f:
        f.write("\n".join(MONGO_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="mongo",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    assert len(rows) == 4  # drop dead-lettered
    actions = sorted(r["action"] for r in rows)
    assert actions == ["DELETE", "INSERT", "UPDATE-INSERT", "UPDATE-INSERT"]
    by_ts = sorted(rows, key=lambda r: str(r["update_date"]))
    # merged partial update decoded both the key and the changed field
    assert by_ts[1]["product_id"] == "p3"
    assert by_ts[1]["product_category_name"] == "hardware"
    assert by_ts[1]["product_photos_qty"] is None  # not in the image
    # delete decodes the key only
    d = [r for r in rows if r["action"] == "DELETE"][0]
    assert d["product_id"] == "p4"


# ---------------------------------------------------------------------------
# PostgreSQL wal2json v2 (ninth producer)
# ---------------------------------------------------------------------------


def _w2j_cols(d, types):
    import json as _json

    parts = []
    for k, v in d.items():
        t = types[k]
        if v is None:
            val = "null"
        elif t in ("integer", "bigint", "numeric", "real", "boolean"):
            val = _json.dumps(v)
        else:
            val = _json.dumps(str(v))
        parts.append(f'{{"name":"{k}","type":"{t}","value":{val}}}')
    return "[" + ",".join(parts) + "]"


_W2J_TYPES = {"product_id": "text", "product_category_name": "text",
              "product_photos_qty": "integer", "product_weight_g": "real"}

W2J_LINES = [
    ('{"action":"I","schema":"public","table":"olist_produtos","columns":'
     + _w2j_cols(P3, _W2J_TYPES)
     + ',"timestamp":"2024-01-16 00:00:00.000001+00"}'),
    ('{"action":"U","schema":"public","table":"olist_produtos","columns":'
     + _w2j_cols(P3_V2, _W2J_TYPES)
     + ',"timestamp":"2024-01-17 00:00:00.000002+00"}'),
    # delete: replica identity only
    ('{"action":"D","schema":"public","table":"olist_produtos","identity":'
     + _w2j_cols({"product_id": "p4"}, _W2J_TYPES)
     + ',"timestamp":"2024-01-18 00:00:00.000003+00"}'),
    # transaction markers and truncate: must dead-letter
    '{"action":"B","timestamp":"2024-01-16 00:00:00.000001+00"}',
    ('{"action":"T","schema":"public","table":"olist_produtos",'
     '"timestamp":"2024-01-18 00:00:00.000004+00"}'),
]


def test_wal2json_envelope_parses_typed_and_dead_letters_markers(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_wal2json,
    )

    df = spark.createDataFrame([(l,) for l in W2J_LINES], "value string")
    rows = parse_envelope_wal2json(df).collect()
    actions = [r["action"] for r in rows]
    assert actions == ["INSERT", "UPDATE-INSERT", "DELETE", None, None]
    # type-aware pivot: numerics raw, strings quoted
    p = json.loads(rows[0]["payload_json"])
    assert p["product_photos_qty"] == 5          # int, not "5"
    assert p["product_weight_g"] == 250.0        # real, not "250.0"
    assert p["product_id"] == "p3"
    # timestamp offset parsed, canonical layout emitted
    assert rows[0]["update_date_raw"] == "2024-01-16 00:00:00.000001"
    # delete keeps the replica identity only
    assert json.loads(rows[2]["payload_json"]) == {"product_id": "p4"}


def test_auto_dispatch_includes_wal2json(spark, tmp_path_factory):
    """A mixed directory with all NINE producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed9")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0], MSSQL_LINES[0], MONGO_LINES[0],
             W2J_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    # 1 ds + 1 dbz + 1 maxwell + 2 canal batched + 1 dms + 1 ogg
    # + 1 sqlserver + 1 mongo + 1 wal2json
    assert len(rows) == 10


def test_wal2json_e2e_ingest(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_w2j_e2e")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "changes.jsonl"), "w") as f:
        f.write("\n".join(W2J_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="wal2json",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    assert len(rows) == 3  # B and T dead-lettered
    by_action = {r["action"]: r for r in rows}
    assert by_action["INSERT"]["product_photos_qty"] == 5
    assert by_action["INSERT"]["product_weight_g"] == 250.0
    assert by_action["UPDATE-INSERT"]["product_category_name"] == "hardware"
    assert by_action["DELETE"]["product_id"] == "p4"
    assert by_action["DELETE"]["product_photos_qty"] is None


# ---------------------------------------------------------------------------
# Airbyte protocol (tenth producer)
# ---------------------------------------------------------------------------


def _aby(data, emitted_ms, updated=None, deleted=None, stream="olist_produtos"):
    d = dict(data)
    if updated is not None:
        d["_ab_cdc_updated_at"] = updated
        d["_ab_cdc_deleted_at"] = deleted
        d["_ab_cdc_log_pos"] = 42
    rec = {"stream": stream, "namespace": "public",
           "emitted_at": emitted_ms, "data": d}
    return json.dumps({"type": "RECORD", "record": rec})


ABY_LINES = [
    # plain incremental record (no CDC columns): INSERT, ts from emitted_at
    _aby(P3, 1704672000000),
    # CDC update, epoch-millis wire form
    _aby(P3_V2, 1704758400500, updated=1704758400000),
    # CDC update, ISO-8601 wire form (newer connectors)
    _aby(P3_V2, 1704790000000, updated="2024-01-09 12:00:00.250"),
    # CDC delete: key-only data + deleted_at set
    _aby({"product_id": "p3"}, 1704844800000,
         updated=1704844800000, deleted=1704844800000),
    # STATE checkpoint and LOG message: must dead-letter
    '{"type":"STATE","state":{"data":{"cdc":{"lsn":9}}}}',
    '{"type":"LOG","log":{"level":"INFO","message":"sync started"}}',
]


def test_airbyte_envelope_parses_and_dead_letters_control(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_airbyte,
    )

    df = spark.createDataFrame([(l,) for l in ABY_LINES], "value string")
    rows = parse_envelope_airbyte(df).collect()
    actions = [r["action"] for r in rows]
    assert actions == ["INSERT", "UPDATE-INSERT", "UPDATE-INSERT",
                       "DELETE", None, None]
    # plain record: update_date falls back to emitted_at
    assert rows[0]["update_date_raw"] == "2024-01-08 00:00:00.000"
    # epoch-millis updated_at wins over emitted_at
    assert rows[1]["update_date_raw"] == "2024-01-09 00:00:00.000"
    # ISO-string updated_at parses too
    assert rows[2]["update_date_raw"] == "2024-01-09 12:00:00.250"
    p = json.loads(rows[1]["payload_json"])
    assert p["product_category_name"] == "hardware"
    assert p["_ab_cdc_log_pos"] == 42  # drops later at routed decode
    # delete keeps the key only (plus CDC metadata)
    pd_ = json.loads(rows[3]["payload_json"])
    assert pd_["product_id"] == "p3"
    assert "product_photos_qty" not in pd_
    assert all(r["object"] == "olist_produtos" for r in rows[:4])


def test_auto_dispatch_includes_airbyte(spark, tmp_path_factory):
    """A mixed directory with all TEN producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed10")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0], MSSQL_LINES[0], MONGO_LINES[0],
             W2J_LINES[0], ABY_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    # 1 ds + 1 dbz + 1 maxwell + 2 canal batched + 1 dms + 1 ogg
    # + 1 sqlserver + 1 mongo + 1 wal2json + 1 airbyte
    assert len(rows) == 11


def test_airbyte_e2e_ingest(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_aby_e2e")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "changes.jsonl"), "w") as f:
        f.write("\n".join(ABY_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="airbyte",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    assert len(rows) == 4  # STATE and LOG dead-lettered
    inserts = [r for r in rows if r["action"] == "INSERT"]
    deletes = [r for r in rows if r["action"] == "DELETE"]
    updates = [r for r in rows if r["action"] == "UPDATE-INSERT"]
    assert len(inserts) == 1 and len(deletes) == 1 and len(updates) == 2
    assert inserts[0]["product_photos_qty"] == 5
    assert all(u["product_category_name"] == "hardware" for u in updates)
    # _ab_cdc_* metadata dropped at the routed decode
    assert "_ab_cdc_log_pos" not in rows[0].asDict()
    assert deletes[0]["product_id"] == "p3"
    assert deletes[0]["product_photos_qty"] is None


# ---------------------------------------------------------------------------
# DynamoDB Streams adapter (eleventh producer)
# ---------------------------------------------------------------------------


def _ddb_image(data):
    def tv(v):
        if isinstance(v, bool):
            return {"BOOL": v}
        if isinstance(v, (int, float)):
            return {"N": str(v)}
        return {"S": v}

    return {k: tv(v) for k, v in data.items()}


def _ddb(event, secs, new=None, old=None, keys=None,
         table="olist_produtos", view="NEW_AND_OLD_IMAGES"):
    body = {
        "eventID": "ev1",
        "eventName": event,
        "eventSource": "aws:dynamodb",
        "awsRegion": "us-east-1",
        "dynamodb": {
            "ApproximateCreationDateTime": secs,
            "Keys": _ddb_image(keys or {"product_id": "p3"}),
            "SequenceNumber": "111",
            "SizeBytes": 99,
            "StreamViewType": view,
        },
        "eventSourceARN": (
            f"arn:aws:dynamodb:us-east-1:123456789012:table/{table}"
            "/stream/2026-01-01T00:00:00.000"
        ),
    }
    if new is not None:
        body["dynamodb"]["NewImage"] = _ddb_image(new)
    if old is not None:
        body["dynamodb"]["OldImage"] = _ddb_image(old)
    return json.dumps(body)


DDB_LINES = [
    _ddb("INSERT", 1704672000, new={**P3, "in_stock": True}),
    _ddb("MODIFY", 1704758400.5, new=P3_V2, old=P3),
    # REMOVE under KEYS_ONLY: no OldImage — Keys must recover the key
    _ddb("REMOVE", 1704844800, view="KEYS_ONLY"),
    # unknown eventName -> dead-letter
    _ddb("PING", 1704931200, new=P3),
]


def test_dynamodb_envelope_parses_and_dead_letters_unknown(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_dynamodb,
    )

    df = spark.createDataFrame([(l,) for l in DDB_LINES], "value string")
    rows = parse_envelope_dynamodb(df).collect()
    assert [r["action"] for r in rows] == [
        "INSERT", "UPDATE-INSERT", "DELETE", None,
    ]
    assert rows[0]["update_date_raw"] == "2024-01-08 00:00:00.000"
    # fractional ApproximateCreationDateTime keeps its millis
    assert rows[1]["update_date_raw"] == "2024-01-09 00:00:00.500"
    p0 = json.loads(rows[0]["payload_json"])
    # N values emit numeric JSON tokens, not strings
    assert p0["product_photos_qty"] == 5 and p0["product_weight_g"] == 250.0
    assert p0["product_id"] == "p3"
    assert p0["in_stock"] is True  # BOOL flattens to a bare boolean
    p1 = json.loads(rows[1]["payload_json"])
    assert p1["product_category_name"] == "hardware"
    # KEYS_ONLY delete recovers the key from Keys
    p2 = json.loads(rows[2]["payload_json"])
    assert p2 == {"product_id": "p3"}
    assert all(r["object"] == "olist_produtos" for r in rows)


def test_auto_dispatch_includes_dynamodb(spark, tmp_path_factory):
    """A mixed directory with all ELEVEN producers' lines unifies under
    envelope_format='auto'."""
    root = tmp_path_factory.mktemp("cdc_mixed11")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0], MSSQL_LINES[0], MONGO_LINES[0],
             W2J_LINES[0], ABY_LINES[0], DDB_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    # 1 ds + 1 dbz + 1 maxwell + 2 canal batched + 1 dms + 1 ogg
    # + 1 sqlserver + 1 mongo + 1 wal2json + 1 airbyte + 1 dynamodb
    assert len(rows) == 12


def test_dynamodb_e2e_ingest(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_ddb_e2e")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "changes.jsonl"), "w") as f:
        f.write("\n".join(DDB_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="dynamodb",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    assert len(rows) == 3  # PING dead-lettered
    by_action = {r["action"]: r for r in rows}
    assert set(by_action) == {"INSERT", "UPDATE-INSERT", "DELETE"}
    assert by_action["INSERT"]["product_photos_qty"] == 5
    assert by_action["UPDATE-INSERT"]["product_category_name"] == "hardware"
    assert by_action["UPDATE-INSERT"]["product_weight_g"] == 260.0
    # in_stock (BOOL) and SS-style extras drop at the routed decode
    assert "in_stock" not in rows[0].asDict()
    assert by_action["DELETE"]["product_id"] == "p3"
    assert by_action["DELETE"]["product_photos_qty"] is None


# ---------------------------------------------------------------------------
# Flattened Debezium (ExtractNewRecordState SMT) adapter (twelfth producer)
# ---------------------------------------------------------------------------


def _dbzf(data, ms=None, op=None, deleted=None, table="olist_produtos"):
    d = dict(data)
    if op is not None:
        d["__op"] = op
    if deleted is not None:
        d["__deleted"] = deleted
    if ms is not None:
        d["__ts_ms"] = ms
    if op is not None or deleted is not None or ms is not None:
        d["__table"] = table
        d["__lsn"] = 424242
    return json.dumps(d)


DBZF_LINES = [
    _dbzf(P3, 1704672000000, op="c"),                      # insert
    _dbzf(P3_V2, 1704758400000, op="u"),                   # update
    # rewrite mode without __op: deleted=false -> UPDATE-INSERT
    _dbzf(P3_V2, 1704790000000, deleted="false"),
    # rewrite DELETE carries the full last image
    _dbzf(P3_V2, 1704844800000, deleted="true"),
    # plain SMT row, no metadata: INSERT, null timestamp, default route
    _dbzf(P3),
]


def test_debezium_flat_envelope_parses(spark):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_debezium_flat,
    )

    df = spark.createDataFrame([(l,) for l in DBZF_LINES], "value string")
    rows = parse_envelope_debezium_flat(
        df, default_table="olist_produtos"
    ).collect()
    assert [r["action"] for r in rows] == [
        "INSERT", "UPDATE-INSERT", "UPDATE-INSERT", "DELETE", "INSERT",
    ]
    assert rows[0]["update_date_raw"] == "2024-01-08 00:00:00.000"
    assert rows[4]["update_date_raw"] is None  # plain row: no __ts_ms
    assert all(r["object"] == "olist_produtos" for r in rows)
    # rewrite delete keeps the full image
    pd_ = json.loads(rows[3]["payload_json"])
    assert pd_["product_category_name"] == "hardware"
    assert pd_["__deleted"] == "true"  # drops later at routed decode


def test_auto_dispatch_includes_debezium_flat(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_mixed12")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "all.jsonl"), "w") as f:
        f.write("\n".join(
            [LINES[0], DBZ_LINES[0], MXW_LINES[0], CNL_LINES[0],
             DMS_LINES[0], OGG_LINES[0], MSSQL_LINES[0], MONGO_LINES[0],
             W2J_LINES[0], ABY_LINES[0], DDB_LINES[0], DBZF_LINES[0]]
        ) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="auto",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    # 12 producers: ds + dbz + maxwell + 2 canal + dms + ogg + mssql
    # + mongo + wal2json + airbyte + dynamodb + debezium-flat
    assert len(rows) == 13


def test_debezium_flat_e2e_ingest(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cdc_dbzf_e2e")
    in_dir, out_dir, ck_dir = (
        str(root / "in"), str(root / "out"), str(root / "ck"),
    )
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "changes.jsonl"), "w") as f:
        f.write("\n".join(DBZF_LINES) + "\n")
    ing = CdcIngest(
        spark=spark,
        registry=SchemaRegistry.from_dict(REGISTRY_DOC),
        input_dir=in_dir,
        output_dir=out_dir,
        checkpoint_dir=ck_dir,
        envelope_format="debezium_flat",
    )
    ing.run_available_single_pass()
    rows = ing.history("olist_produtos").collect()
    # the PLAIN SMT row carries no __table: on Kafka the TOPIC routes it,
    # but a file stand-in has no topic, so strict ingest dead-letters it
    # (callers that know the topic pass default_table to the adapter —
    # covered by the unit test above)
    assert len(rows) == 4
    by_action = {}
    for r in rows:
        by_action.setdefault(r["action"], []).append(r)
    assert len(by_action["INSERT"]) == 1
    assert len(by_action["UPDATE-INSERT"]) == 2
    assert len(by_action["DELETE"]) == 1
    # __* metadata dropped at the routed decode
    assert "__lsn" not in rows[0].asDict()
    assert by_action["DELETE"][0]["product_category_name"] == "hardware"
    dl = ing.dead_letter()
    assert dl.count() == 1  # the routeless plain row, raw line preserved


def test_rebuilt_payload_escapes_control_chars(spark):
    """ADVICE r6: from_json decodes \\n/\\t in the source envelope to REAL
    control chars; the string-rebuilt payload_json must re-escape them
    (\\u00XX) or the routed permissive decode silently nulls the row.
    Covers both string-rebuilding producers (DynamoDB + wal2json)."""
    from pyspark.sql import functions as F

    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_dynamodb,
        parse_envelope_wal2json,
    )

    hairy = "line1\nline2\ttab\x01end"
    ddb = {
        "eventName": "INSERT",
        "eventSourceARN": "arn:aws:dynamodb:r:1:table/orders/stream/x",
        "dynamodb": {
            "ApproximateCreationDateTime": 1700000000.5,
            "NewImage": {"note": {"S": hairy}, "qty": {"N": "7"}},
        },
    }
    df = spark.createDataFrame([(json.dumps(ddb),)], "value string")
    payload = parse_envelope_dynamodb(df).collect()[0]["payload_json"]
    assert json.loads(payload) == {"note": hairy, "qty": 7}
    routed = (
        spark.createDataFrame([(payload,)], "p string")
        .select(F.from_json("p", "note string, qty long").alias("s"))
        .collect()[0][0]
    )
    assert routed["note"] == hairy and routed["qty"] == 7

    w2j = {
        "action": "I",
        "table": "orders",
        "timestamp": "2024-01-01 00:00:00.000+00",
        "columns": [
            {"name": "c1", "type": "text", "value": "a\r\nb"},
            {"name": "n", "type": "integer", "value": 5},
        ],
    }
    df2 = spark.createDataFrame([(json.dumps(w2j),)], "value string")
    payload2 = parse_envelope_wal2json(df2).collect()[0]["payload_json"]
    assert json.loads(payload2) == {"c1": "a\r\nb", "n": 5}


def test_cli_envelope_choices_all_dispatch(spark):
    """Every --envelope-format choice must resolve in _parse_lines (a
    stale CLI list was how 8 dialects went CLI-invisible through r8)."""
    from cdc_streamming___v2_spark.streaming.ingest import (
        _ENVELOPE_FORMATS,
        CdcIngest,
    )

    src = spark.createDataFrame([("{}",)], "value string")
    for fmt in _ENVELOPE_FORMATS:
        env = CdcIngest._parse_lines(src, fmt)
        assert {"object", "action", "payload_json", "raw"} <= set(
            env.columns
        ), fmt
    with pytest.raises(ValueError, match="unknown envelope_format"):
        CdcIngest._parse_lines(src, "nope")


def test_registry_evolution_safe_widenings_and_boundary():
    """SAFE_WIDENINGS admits exactly what Spark 4's parquet reader
    up-converts (measured): int32->int64, float32->float64,
    int32->float64. int64->float64 is NOT readable over old files and
    stays rejected."""
    import copy

    base = {
        "t": {"table_name": "t_cdc", "schema": {"fields": [
            {"name": "a", "type": "INT32"},
            {"name": "b", "type": "FLOAT32"},
            {"name": "c", "type": "INT64"},
        ]}},
    }
    old = SchemaRegistry.from_dict(base)
    wide = copy.deepcopy(base)
    wide["t"]["schema"]["fields"][0]["type"] = "INT64"
    wide["t"]["schema"]["fields"][1]["type"] = "FLOAT64"
    assert old.check_evolution(SchemaRegistry.from_dict(wide)) == {}

    int32_to_double = copy.deepcopy(base)
    int32_to_double["t"]["schema"]["fields"][0]["type"] = "FLOAT64"
    assert old.check_evolution(
        SchemaRegistry.from_dict(int32_to_double)) == {}

    bad = copy.deepcopy(base)
    bad["t"]["schema"]["fields"][2]["type"] = "FLOAT64"  # int64->double
    with pytest.raises(ValueError, match="not a safe parquet widening"):
        old.check_evolution(SchemaRegistry.from_dict(bad))


def test_registry_evolution_drop_opt_in_and_tombstone_readd():
    """Drops are rejected by default, admitted-and-tombstoned under
    allow_column_drops; a tombstoned column re-added under a type the
    buried files can't be read as is refused, while the original type
    (or a safe widening of it) is admitted."""
    import copy

    base = {
        "t": {"table_name": "t_cdc", "schema": {"fields": [
            {"name": "a", "type": "INT32"},
            {"name": "b", "type": "STRING"},
        ]}},
    }
    old = SchemaRegistry.from_dict(base)
    dropped = copy.deepcopy(base)
    dropped["t"]["schema"]["fields"] = [
        f for f in dropped["t"]["schema"]["fields"] if f["name"] != "a"
    ]
    new = SchemaRegistry.from_dict(dropped)
    with pytest.raises(ValueError, match="column dropped"):
        old.check_evolution(new)
    assert old.check_evolution(new, allow_column_drops=True) == {
        "t.a": "int"
    }

    after_drop = SchemaRegistry.from_dict(dropped)
    readd_bad = copy.deepcopy(dropped)
    readd_bad["t"]["schema"]["fields"].append(
        {"name": "a", "type": "STRING"})
    with pytest.raises(ValueError, match="tombstoned"):
        after_drop.check_evolution(
            SchemaRegistry.from_dict(readd_bad), tombstones={"t.a": "int"}
        )
    readd_widened = copy.deepcopy(dropped)
    readd_widened["t"]["schema"]["fields"].append(
        {"name": "a", "type": "INT64"})
    assert after_drop.check_evolution(
        SchemaRegistry.from_dict(readd_widened), tombstones={"t.a": "int"}
    ) == {}


def test_registry_evolution_rename_admission_rules():
    """Column RENAME (VERDICT r10 #3): declared via ``renamed_from`` on
    the new field (Avro-alias pattern).  Admitted without
    allow_column_drops when the old name is retired and the type is
    equal or safely widened; the old name is tombstoned AND recorded in
    the rename map; copies, ambiguous double-claims, engine columns,
    unsafe types, and re-introducing a renamed-away name are refused."""
    def reg(fields):
        return SchemaRegistry.from_dict({
            "t": {"table_name": "t_cdc", "schema": {"fields": fields}}
        })

    eng = [{"name": "action", "type": "STRING"},
           {"name": "update_date", "type": "STRING"}]
    base = reg([{"name": "a", "type": "INT32"},
                {"name": "x", "type": "STRING"}, *eng])

    # plain rename, same canonical type family is NOT required — widening
    # through the rename is admitted (a INT32 -> b INT64)
    ren = reg([{"name": "b", "type": "INT64", "renamed_from": "a"},
               {"name": "x", "type": "STRING"}, *eng])
    assert base.check_evolution_full(ren) == (
        {"t.a": "int"}, {"t.b": "a"}
    )
    # wrapper keeps the tombstones-only contract
    assert base.check_evolution(ren) == {"t.a": "int"}

    # unsafe type through the rename: refused
    with pytest.raises(ValueError, match="unsafe type change"):
        base.check_evolution_full(
            reg([{"name": "b", "type": "STRING", "renamed_from": "a"},
                 {"name": "x", "type": "STRING"}, *eng])
        )

    # old name still present: a copy, not a rename
    with pytest.raises(ValueError, match="still present"):
        base.check_evolution_full(
            reg([{"name": "a", "type": "INT32"},
                 {"name": "b", "type": "INT32", "renamed_from": "a"},
                 {"name": "x", "type": "STRING"}, *eng])
        )

    # two fields claiming the same predecessor: ambiguous
    with pytest.raises(ValueError, match="ambiguous"):
        base.check_evolution_full(
            reg([{"name": "b", "type": "INT32", "renamed_from": "a"},
                 {"name": "c", "type": "INT32", "renamed_from": "a"},
                 {"name": "x", "type": "STRING"}, *eng])
        )

    # engine columns can never be renamed
    with pytest.raises(ValueError, match="engine column"):
        base.check_evolution_full(
            reg([{"name": "a", "type": "INT32"},
                 {"name": "x", "type": "STRING"},
                 {"name": "when", "type": "STRING",
                  "renamed_from": "update_date"},
                 {"name": "action", "type": "STRING"}])
        )

    # re-introducing a renamed-away name (persisted map context): refused
    cur = reg([{"name": "b", "type": "INT64"},
               {"name": "x", "type": "STRING"}, *eng])
    readd = reg([{"name": "b", "type": "INT64"},
                 {"name": "a", "type": "INT32"},
                 {"name": "x", "type": "STRING"}, *eng])
    with pytest.raises(ValueError, match="renamed away"):
        cur.check_evolution_full(
            readd, tombstones={"t.a": "int"}, renames={"t.b": "a"}
        )

    # inert alias (Avro semantics): renamed_from with no matching old
    # column is a plain ADD
    inert = reg([{"name": "a", "type": "INT32"},
                 {"name": "x", "type": "STRING"},
                 {"name": "z", "type": "STRING",
                  "renamed_from": "never_was"}, *eng])
    assert base.check_evolution_full(inert) == ({}, {})
