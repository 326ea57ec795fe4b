"""Property-based fuzz of the CDC envelope parser (SURVEY.md §5 item 4).

Hypothesis generates batches of lines — well-formed Datastream-style
envelopes with randomly present/null/typed payload fields, envelopes for
unregistered objects, and outright garbage — and the Spark plan
(parse_envelope → route filter → from_json typed projection, the exact
expressions CdcIngest executes per micro-batch) must agree with a pure
Python model of the reference's semantics (src/dataflow-cdc-stream.py:64-97):

- registered object → one history row; payload fields absent OR null →
  NULL in the fixed schema (the reference strips None keys, py:68 — same
  sink-visible result);
- unregistered object, missing object, non-object JSON, non-JSON → dead
  letter, never a crash (the reference re-raises and retries forever).
"""

from __future__ import annotations

import json
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_streamming___v2_spark.sources.cdc_schema import (
    parse_envelope,
    update_date_expr,
)
from cdc_streamming___v2_spark.sources.registry import SchemaRegistry

REGISTRY = SchemaRegistry.from_dict(
    {
        "t1": {
            "table_name": "t1_hist",
            "schema": {
                "fields": [
                    {"name": "id", "type": "STRING"},
                    {"name": "qty", "type": "INT64"},
                    {"name": "price", "type": "FLOAT"},
                    {"name": "note", "type": "STRING"},
                    {"name": "action", "type": "STRING"},
                    {"name": "update_date", "type": "STRING"},
                ]
            },
        }
    }
)

# JSON-safe text: any unicode except surrogates (json.dumps escapes the rest)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=16
)
_payload = st.fixed_dictionaries(
    {},
    optional={
        "id": st.none() | _text,
        "qty": st.none() | st.integers(-(2**62), 2**62),
        "price": st.none()
        | st.floats(allow_nan=False, allow_infinity=False, width=64),
        "note": st.none() | _text,
    },
)
_envelope = st.fixed_dictionaries(
    {"source_timestamp": _text, "payload": _payload},
    optional={
        "object": st.sampled_from(["t1", "ghost", "t1 "]),
        "source_metadata": st.fixed_dictionaries(
            {
                "change_type": st.sampled_from(
                    ["INSERT", "UPDATE-INSERT", "DELETE"]
                )
            }
        ),
    },
)
_line = st.one_of(
    _envelope.map(json.dumps),
    st.just('{"object": "t1", broken'),
    st.just("null"),
    st.just("123"),
    _text,
)


def _model(lines):
    """Pure-Python reference semantics: (history rows, n dead letters)."""
    rows, dead = [], 0
    for line in lines:
        try:
            d = json.loads(line)
        except (ValueError, TypeError):
            dead += 1
            continue
        if not isinstance(d, dict) or d.get("object") != "t1":
            dead += 1
            continue
        p = d.get("payload") or {}
        if not isinstance(p, dict):
            p = {}
        meta = d.get("source_metadata") or {}
        rows.append(
            (
                p.get("id"),
                p.get("qty"),
                p.get("price"),
                p.get("note"),
                meta.get("change_type") if isinstance(meta, dict) else None,
                d.get("source_timestamp"),
            )
        )
    return rows, dead


def _key(row):
    # float NaN never generated; make floats hashable-stable for Counter
    return tuple(
        ("f", repr(v)) if isinstance(v, float) and not math.isnan(v) else v
        for v in row
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_line, min_size=1, max_size=12))
def test_envelope_parse_matches_python_model(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    env = parse_envelope(df)
    spec = REGISTRY.get("t1")
    payload = F.from_json(F.col("payload_json"), spec.payload_schema)
    typed = env.filter(F.col("object") == "t1").select(
        *[payload.getField(f.name).alias(f.name) for f in spec.payload_schema],
        F.col("action")
        .cast(spec.schema["action"].dataType)
        .alias("action"),
        update_date_expr(spec.schema["update_date"].dataType).alias(
            "update_date"
        ),
    )
    got = [
        (r.id, r.qty, r.price, r.note, r.action, r.update_date)
        for r in typed.collect()
    ]
    dead = env.filter(
        F.col("object").isNull() | (F.col("object") != "t1")
    ).count()
    want_rows, want_dead = _model(lines)
    assert Counter(map(_key, got)) == Counter(map(_key, want_rows))
    assert dead == want_dead


# --- Maxwell / Canal adapter properties --------------------------------------

from datetime import datetime, timezone  # noqa: E402

from cdc_streamming___v2_spark.sources.cdc_schema import (  # noqa: E402
    CANAL_ACTIONS,
    MAXWELL_ACTIONS,
    parse_envelope_canal,
    parse_envelope_maxwell,
)

_MXW_MAP = dict(MAXWELL_ACTIONS)
_CNL_MAP = dict(CANAL_ACTIONS)

_row_obj = st.fixed_dictionaries(
    {}, optional={"id": st.none() | _text, "qty": st.integers(-100, 100)}
)
_mxw_record = st.fixed_dictionaries(
    {},
    optional={
        "table": st.sampled_from(["t1", "ghost"]),
        "type": st.sampled_from(
            ["insert", "update", "delete", "bootstrap-insert",
             "bootstrap-start", "table-create", "WEIRD"]
        ),
        "ts": st.none() | st.integers(0, 4_000_000_000),
        "data": st.none() | _row_obj,
    },
)
_mxw_line = st.one_of(
    _mxw_record.map(json.dumps), st.just("{bad"), _text
)


def _mxw_model(lines):
    out = []
    for line in lines:
        try:
            d = json.loads(line)
        except (ValueError, TypeError):
            out.append((None, None, None, None))
            continue
        if not isinstance(d, dict):
            out.append((None, None, None, None))
            continue
        ts = d.get("ts")
        raw = (
            datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            if isinstance(ts, int)
            else None
        )
        data = d.get("data")
        out.append(
            (
                d.get("table"),
                _MXW_MAP.get(d.get("type")),
                raw,
                json.dumps(data, sort_keys=True)
                if isinstance(data, dict)
                else None,
            )
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_mxw_line, min_size=1, max_size=8))
def test_maxwell_parse_matches_python_model(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    env = parse_envelope_maxwell(df).collect()
    got = Counter(
        (
            r["object"],
            r["action"],
            r["update_date_raw"],
            json.dumps(json.loads(r["payload_json"]), sort_keys=True)
            if r["payload_json"] is not None
            else None,
        )
        for r in env
    )
    want = Counter(_mxw_model(lines))
    assert got == want


_cnl_record = st.fixed_dictionaries(
    {},
    optional={
        "table": st.sampled_from(["t1", "ghost"]),
        "type": st.sampled_from(
            ["INSERT", "UPDATE", "DELETE", "CREATE", "ALTER", "noise"]
        ),
        "es": st.none() | st.integers(0, 4_000_000_000_000),
        "data": st.none() | st.lists(_row_obj, max_size=3),
    },
)
_cnl_line = st.one_of(_cnl_record.map(json.dumps), st.just("{bad"), _text)


def _cnl_model(lines):
    out = []
    for line in lines:
        try:
            d = json.loads(line)
        except (ValueError, TypeError):
            out.append((None, None, None, None))
            continue
        if not isinstance(d, dict):
            out.append((None, None, None, None))
            continue
        es = d.get("es")
        raw = (
            datetime.fromtimestamp(es / 1000.0, tz=timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S."
            )
            + f"{es % 1000:03d}"
            if isinstance(es, int)
            else None
        )
        obj, act = d.get("table"), _CNL_MAP.get(d.get("type"))
        data = d.get("data")
        if isinstance(data, list) and data:
            for el in data:
                out.append(
                    (obj, act, raw, json.dumps(el, sort_keys=True))
                )
        else:
            # null / absent / empty / non-array data -> one null-payload
            # row (explode_outer keeps the line for dead-lettering)
            out.append((obj, act, raw, None))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_cnl_line, min_size=1, max_size=8))
def test_canal_parse_matches_python_model(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    env = parse_envelope_canal(df).collect()
    got = Counter(
        (
            r["object"],
            r["action"],
            r["update_date_raw"],
            json.dumps(json.loads(r["payload_json"]), sort_keys=True)
            if r["payload_json"] is not None
            else None,
        )
        for r in env
    )
    want = Counter(_cnl_model(lines))
    assert got == want


# --- DynamoDB Streams adapter property ---------------------------------------
#
# Locks the typed AttributeValue flattening (N/BOOL raw tokens, NULL ->
# null, S re-quoted) AND the round-6-advice escaping fix: attribute names
# and S values drawn from full unicode INCLUDING control characters,
# quotes and backslashes must survive parse -> rebuilt payload_json ->
# json.loads, byte-for-byte equal to a pure-Python flattening model.

from cdc_streamming___v2_spark.sources.cdc_schema import (  # noqa: E402
    parse_envelope_dynamodb,
)

_ddb_attr_name = st.text(min_size=1, max_size=8)
_ddb_value = st.one_of(
    st.tuples(st.just("S"), st.text(max_size=10)),
    st.tuples(
        st.just("N"),
        st.integers(-10**9, 10**9)
        | st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    st.tuples(st.just("BOOL"), st.booleans()),
    st.tuples(st.just("NULL"), st.none()),
)
_ddb_image = st.dictionaries(_ddb_attr_name, _ddb_value, max_size=5)


@st.composite
def _ddb_record(draw):
    event = draw(st.sampled_from(["INSERT", "MODIFY", "REMOVE", "PING"]))
    image = draw(_ddb_image)
    keys_only = draw(st.booleans())
    secs = draw(st.integers(0, 2_000_000_000))

    typed = {}
    expected = {}
    for k, (t, v) in image.items():
        if t == "S":
            typed[k] = {"S": v}
            expected[k] = v
        elif t == "N":
            token = json.dumps(v)
            typed[k] = {"N": token}  # DynamoDB wire numbers are strings
            expected[k] = json.loads(token)
        elif t == "BOOL":
            typed[k] = {"BOOL": v}
            expected[k] = v
        else:
            typed[k] = {"NULL": True}
            expected[k] = None

    ddb: dict = {
        "ApproximateCreationDateTime": secs,
        "SequenceNumber": "1",
        "Keys": dict(list(typed.items())[:1]),
    }
    if not keys_only:
        ddb["NewImage" if event != "REMOVE" else "OldImage"] = typed
    rec = {
        "eventID": "e1",
        "eventSource": "aws:dynamodb",
        "eventSourceARN": (
            "arn:aws:dynamodb:us-east-1:1:table/t_prop/stream/2026"
        ),
        "eventName": event,
        "dynamodb": ddb,
    }
    act = {
        "INSERT": "INSERT",
        "MODIFY": "UPDATE-INSERT",
        "REMOVE": "DELETE",
        "PING": None,  # dead-letter: action NULL but payload KEPT
    }[event]
    # the parser picks its image independently of the action: REMOVE ->
    # OldImage else Keys, everything else -> NewImage else Keys
    img = typed if not keys_only else ddb["Keys"]
    want_payload = {
        k: expected[k] for k in img  # img keys subset of typed keys
    }
    from datetime import datetime, timezone as _tz

    ts = datetime.fromtimestamp(secs, tz=_tz.utc).strftime(
        "%Y-%m-%d %H:%M:%S.000"
    )
    return json.dumps(rec, ensure_ascii=False), act, want_payload, ts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(recs=st.lists(_ddb_record(), min_size=1, max_size=8))
def test_dynamodb_parse_matches_python_model(spark, recs):
    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_dynamodb(df).collect()
    got = Counter(
        (
            r["object"],
            r["action"],
            r["update_date_raw"],
            json.dumps(json.loads(r["payload_json"]), sort_keys=True)
            if r["payload_json"] is not None
            else None,
        )
        for r in env
    )
    want = Counter(
        (
            "t_prop",
            act,
            ts,
            json.dumps(payload, sort_keys=True)
            if payload is not None
            else None,
        )
        for _, act, payload, ts in recs
    )
    assert got == want


# ---------------------------------------------------------------------------
# wal2json v2: property fuzz of the TYPE-AWARE value reconstruction
# (numeric/boolean/json types re-emit raw tokens, everything else re-quotes
# through _esc_json_string — the class the round-6 control-char fix and the
# round-8 conformance corpus both guard).  Model: payload_json must
# json-load to exactly the generated column dict; I/U read columns, D reads
# identity; markers are covered by the unit tests.
# ---------------------------------------------------------------------------

from cdc_streamming___v2_spark.sources.cdc_schema import (  # noqa: E402
    parse_envelope_wal2json,
)

_w2j_name = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    min_size=1,
    max_size=8,
)
_w2j_col = st.one_of(
    st.tuples(st.just("text"), st.none() | st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12)),
    st.tuples(st.just("character varying"), st.none() | st.text(max_size=8)),
    st.tuples(st.just("integer"), st.none() | st.integers(-10**12, 10**12)),
    st.tuples(st.just("numeric"), st.none() | st.floats(
        allow_nan=False, allow_infinity=False, width=32)),
    st.tuples(st.just("boolean"), st.none() | st.booleans()),
    st.tuples(st.just("jsonb"), st.none() | st.integers(0, 99)),
)


@st.composite
def _w2j_record(draw):
    op = draw(st.sampled_from(["I", "U", "D"]))
    cols = draw(st.dictionaries(_w2j_name, _w2j_col, max_size=5))
    arr = [
        {"name": n, "type": t, "value": v} for n, (t, v) in cols.items()
    ]
    rec = {
        "action": op,
        "schema": "public",
        "table": "t_w2j",
        "timestamp": "2024-01-01 00:00:00.000000+00",
    }
    if op == "D":
        rec["identity"] = arr
    else:
        rec["columns"] = arr
    act = {"I": "INSERT", "U": "UPDATE-INSERT", "D": "DELETE"}[op]
    want = {n: v for n, (t, v) in cols.items()}
    return json.dumps(rec, ensure_ascii=False), act, want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(recs=st.lists(_w2j_record(), min_size=1, max_size=8))
def test_wal2json_parse_matches_python_model(spark, recs):
    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_wal2json(df).collect()

    def canon_num(x):
        # integer-valued floats load as int or float depending on the
        # engine's token rendering; compare on value, not lexeme
        if isinstance(x, bool):
            return x
        if isinstance(x, (int, float)):
            return float(x)
        return x

    got = Counter(
        (
            r["object"],
            r["action"],
            r["update_date_raw"],
            json.dumps(
                {k: canon_num(v)
                 for k, v in json.loads(r["payload_json"]).items()},
                sort_keys=True,
            )
            if r["payload_json"] is not None
            else None,
        )
        for r in env
    )
    want = Counter(
        (
            "t_w2j",
            act,
            "2024-01-01 00:00:00.000000",
            json.dumps(
                {k: canon_num(v) for k, v in payload.items()},
                sort_keys=True,
            ),
        )
        for _, act, payload in recs
    )
    assert got == want


# ---------------------------------------------------------------------------
# Mongo change streams: property fuzz of the three-way payload fallback
# (fullDocument -> documentKey MERGED with updatedFields -> documentKey
# alone) and the action map incl. DDL-ish dead-letters.  The merge is
# text-level JSON surgery in the parser, so the model loads the result and
# compares by VALUE (updatedFields win over key fields on collision, the
# standard last-key-wins read).
# ---------------------------------------------------------------------------

from cdc_streamming___v2_spark.sources.cdc_schema import (  # noqa: E402
    parse_envelope_mongo,
)

_mongo_scalar = st.one_of(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=8),
    st.integers(-10**9, 10**9),
    st.booleans(),
    st.none(),
)
_mongo_fields = st.dictionaries(
    st.text(min_size=1, max_size=6).filter(lambda s: s != "_id"),
    _mongo_scalar,
    max_size=4,
)


@st.composite
def _mongo_event(draw):
    op = draw(st.sampled_from(["insert", "update", "replace", "delete",
                               "drop"]))
    key = {"_id": draw(st.integers(0, 10**6))}
    full = dict(key, **draw(_mongo_fields))
    upd = draw(_mongo_fields)
    has_full = op in ("insert", "replace") or (
        op == "update" and draw(st.booleans())
    )
    secs = draw(st.integers(0, 2_000_000_000))
    from datetime import datetime, timezone as _tz

    wall = datetime.fromtimestamp(secs, tz=_tz.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )
    doc: dict = {
        "operationType": op,
        "ns": {"db": "shop", "coll": "t_mongo"},
        "documentKey": key,
        "wallTime": wall,
    }
    if has_full:
        doc["fullDocument"] = full
    if op == "update":
        doc["updateDescription"] = {"updatedFields": upd,
                                    "removedFields": []}
    act = {"insert": "INSERT", "update": "UPDATE-INSERT",
           "replace": "UPDATE-INSERT", "delete": "DELETE",
           "drop": None}[op]
    if has_full:
        want = full
    elif op == "update":
        want = dict(key, **upd) if upd else key
    else:
        want = key
    ts = datetime.fromtimestamp(secs, tz=_tz.utc).strftime(
        "%Y-%m-%d %H:%M:%S.000"
    )
    return json.dumps(doc, ensure_ascii=False), act, want, ts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_mongo_event(), min_size=1, max_size=8))
def test_mongo_parse_matches_python_model(spark, events):
    df = spark.createDataFrame([(e[0],) for e in events], "value string")
    env = parse_envelope_mongo(df).collect()
    got = Counter(
        (
            r["object"],
            r["action"],
            r["update_date_raw"],
            json.dumps(json.loads(r["payload_json"]), sort_keys=True)
            if r["payload_json"] is not None
            else None,
        )
        for r in env
    )
    want = Counter(
        ("t_mongo", act, ts, json.dumps(payload, sort_keys=True))
        for _, act, payload, ts in events
    )
    assert got == want


# ---------------------------------------------------------------------------
# Airbyte protocol: property fuzz of the CDC-metadata action derivation
# (_ab_cdc_deleted_at > _ab_cdc_updated_at > plain INSERT), the DUAL wire
# forms of _ab_cdc_updated_at (epoch millis vs ISO-8601 string), the
# emitted_at fallback, and the non-RECORD dead-letter class.
# ---------------------------------------------------------------------------

from cdc_streamming___v2_spark.sources.cdc_schema import (  # noqa: E402
    parse_envelope_airbyte,
)


@st.composite
def _airbyte_msg(draw):
    from datetime import datetime, timezone as _tz

    kind = draw(st.sampled_from(["record", "record", "record", "state"]))
    if kind == "state":
        return (
            json.dumps({"type": "STATE", "state": {"data": {"c": 1}}}),
            None,
            None,
            None,
        )
    secs = draw(st.integers(0, 2_000_000_000))
    emitted_secs = draw(st.integers(0, 2_000_000_000))
    data = dict(draw(_mongo_fields))
    shape = draw(st.sampled_from(["insert", "upd_ms", "upd_iso", "delete"]))
    iso = datetime.fromtimestamp(secs, tz=_tz.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.000000Z"
    )
    if shape == "upd_ms":
        data["_ab_cdc_updated_at"] = secs * 1000
        act, eff = "UPDATE-INSERT", secs
    elif shape == "upd_iso":
        data["_ab_cdc_updated_at"] = iso
        act, eff = "UPDATE-INSERT", secs
    elif shape == "delete":
        data["_ab_cdc_updated_at"] = secs * 1000
        data["_ab_cdc_deleted_at"] = secs * 1000
        act, eff = "DELETE", secs
    else:
        act, eff = "INSERT", emitted_secs
    msg = {
        "type": "RECORD",
        "record": {
            "stream": "t_aby",
            "namespace": "public",
            "emitted_at": emitted_secs * 1000,
            "data": data,
        },
    }
    ts = datetime.fromtimestamp(eff, tz=_tz.utc).strftime(
        "%Y-%m-%d %H:%M:%S.000"
    )
    return json.dumps(msg, ensure_ascii=False), act, data, ts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(msgs=st.lists(_airbyte_msg(), min_size=1, max_size=8))
def test_airbyte_parse_matches_python_model(spark, msgs):
    df = spark.createDataFrame([(m[0],) for m in msgs], "value string")
    env = parse_envelope_airbyte(df).collect()
    got = Counter(
        (
            r["action"],
            r["update_date_raw"] if r["action"] is not None else None,
            json.dumps(json.loads(r["payload_json"]), sort_keys=True)
            if r["payload_json"] is not None and r["action"] is not None
            else None,
        )
        for r in env
    )
    want = Counter(
        (
            act,
            ts,
            json.dumps(payload, sort_keys=True) if act is not None else None,
        )
        for _, act, payload, ts in msgs
    )
    assert got == want


# ---------------------------------------------------------------------------
# Round-8 completion: hypothesis models for the remaining five dialects, so
# ALL twelve wire formats are property-fuzzed. Shared scalar/dict strategies
# reuse _mongo_fields (full-unicode names/values, nulls).
# ---------------------------------------------------------------------------

from cdc_streamming___v2_spark.sources.cdc_schema import (  # noqa: E402
    parse_envelope_aws_dms,
    parse_envelope_debezium,
    parse_envelope_debezium_flat,
    parse_envelope_goldengate,
    parse_envelope_sqlserver,
)


def _fmt(secs, pat):
    from datetime import datetime, timezone as _tz

    return datetime.fromtimestamp(secs, tz=_tz.utc).strftime(pat)


@st.composite
def _dbz_record(draw):
    op = draw(st.sampled_from(["c", "u", "d", "r", "t"]))
    image = dict(draw(_mongo_fields), id=draw(st.integers(0, 10**6)))
    secs = draw(st.integers(0, 2_000_000_000))
    wrapped = draw(st.booleans())
    rec = {
        "op": op,
        "ts_ms": secs * 1000,
        "before": image if op == "d" else None,
        "after": None if op == "d" else image,
        "source": {"db": "shop", "table": "t_dbz"},
    }
    line = json.dumps(rec, ensure_ascii=False)
    if wrapped:
        line = '{"schema":{"type":"struct"},"payload":' + line + "}"
    act = {"c": "INSERT", "u": "UPDATE-INSERT", "d": "DELETE",
           "r": "INSERT", "t": None}[op]
    return line, act, image, _fmt(secs, "%Y-%m-%d %H:%M:%S.000")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=st.lists(_dbz_record(), min_size=1, max_size=8))
def test_debezium_parse_matches_python_model(spark, recs):
    from cdc_streamming___v2_spark.sources.cdc_schema import (
        parse_envelope_debezium,
    )

    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_debezium(df).collect()
    got = Counter(
        (
            r["action"],
            r["update_date_raw"] if r["action"] else None,
            json.dumps(json.loads(r["payload_json"]), sort_keys=True)
            if r["payload_json"] is not None and r["action"] else None,
        )
        for r in env
    )
    want = Counter(
        (act, ts if act else None,
         json.dumps(img, sort_keys=True) if act else None)
        for _, act, img, ts in recs
    )
    assert got == want


@st.composite
def _dbz_flat_record(draw):
    shape = draw(st.sampled_from(["op", "deleted_true", "deleted_false",
                                  "plain"]))
    row = dict(draw(_mongo_fields), id=draw(st.integers(0, 10**6)))
    secs = draw(st.integers(0, 2_000_000_000))
    wire = dict(row)
    wire["__table"] = "t_flat"
    wire["__ts_ms"] = secs * 1000
    if shape == "op":
        op = draw(st.sampled_from(["c", "u", "d", "r"]))
        wire["__op"] = op
        act = {"c": "INSERT", "u": "UPDATE-INSERT", "d": "DELETE",
               "r": "INSERT"}[op]
    elif shape == "deleted_true":
        wire["__deleted"] = "true"
        act = "DELETE"
    elif shape == "deleted_false":
        wire["__deleted"] = "false"
        act = "UPDATE-INSERT"
    else:
        act = "INSERT"
    return (json.dumps(wire, ensure_ascii=False), act, wire,
            _fmt(secs, "%Y-%m-%d %H:%M:%S.000"))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=st.lists(_dbz_flat_record(), min_size=1, max_size=8))
def test_debezium_flat_parse_matches_python_model(spark, recs):
    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_debezium_flat(df).collect()
    got = Counter(
        (r["object"], r["action"], r["update_date_raw"],
         json.dumps(json.loads(r["payload_json"]), sort_keys=True))
        for r in env
    )
    # payload = the whole line (the __* keys drop at the routed decode)
    want = Counter(
        ("t_flat", act, ts, json.dumps(wire, sort_keys=True))
        for _, act, wire, ts in recs
    )
    assert got == want


@st.composite
def _mssql_record(draw):
    op = draw(st.sampled_from([1, 2, 3, 4, 9]))
    row = dict(draw(_mongo_fields), id=draw(st.integers(0, 10**6)))
    secs = draw(st.integers(0, 2_000_000_000))
    wire = dict(row)
    wire["__$operation"] = op
    wire["__$start_lsn"] = "00000025:00000448:0003"
    wire["__$capture_instance"] = "dbo_t_mssql"
    wire["__$commit_time"] = _fmt(secs, "%Y-%m-%d %H:%M:%S")
    act = {1: "DELETE", 2: "INSERT", 4: "UPDATE-INSERT"}.get(op)
    return (json.dumps(wire, ensure_ascii=False), act, wire,
            wire["__$commit_time"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=st.lists(_mssql_record(), min_size=1, max_size=8))
def test_sqlserver_parse_matches_python_model(spark, recs):
    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_sqlserver(df).collect()
    got = Counter(
        (r["object"], r["action"],
         r["update_date_raw"] if r["action"] else None,
         json.dumps(json.loads(r["payload_json"]), sort_keys=True)
         if r["action"] else None)
        for r in env
    )
    want = Counter(
        ("t_mssql", act, ts if act else None,
         json.dumps(wire, sort_keys=True) if act else None)
        for _, act, wire, ts in recs
    )
    assert got == want


@st.composite
def _dms_record(draw):
    kind = draw(st.sampled_from(["data", "data", "data", "control"]))
    op = draw(st.sampled_from(["insert", "update", "delete", "load"]))
    row = dict(draw(_mongo_fields), id=draw(st.integers(0, 10**6)))
    secs = draw(st.integers(0, 2_000_000_000))
    iso = _fmt(secs, "%Y-%m-%dT%H:%M:%S.%fZ")
    rec = {
        "data": row if kind == "data" else None,
        "metadata": {
            "record-type": kind, "operation": op, "timestamp": iso,
            "schema-name": "shop", "table-name": "t_dms",
        },
    }
    act = ({"insert": "INSERT", "update": "UPDATE-INSERT",
            "delete": "DELETE", "load": "INSERT"}[op]
           if kind == "data" else None)
    return (json.dumps(rec, ensure_ascii=False), act, row,
            _fmt(secs, "%Y-%m-%d %H:%M:%S.000000"))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=st.lists(_dms_record(), min_size=1, max_size=8))
def test_aws_dms_parse_matches_python_model(spark, recs):
    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_aws_dms(df).collect()
    got = Counter(
        (r["object"], r["action"],
         r["update_date_raw"] if r["action"] else None,
         json.dumps(json.loads(r["payload_json"]), sort_keys=True)
         if r["action"] and r["payload_json"] is not None else None)
        for r in env
    )
    want = Counter(
        ("t_dms", act, ts if act else None,
         json.dumps(row, sort_keys=True) if act else None)
        for _, act, row, ts in recs
    )
    assert got == want


@st.composite
def _ogg_record(draw):
    op = draw(st.sampled_from(["I", "U", "D", "T"]))
    image = dict(draw(_mongo_fields), id=draw(st.integers(0, 10**6)))
    secs = draw(st.integers(0, 2_000_000_000))
    ts = _fmt(secs, "%Y-%m-%d %H:%M:%S.000000")
    rec = {
        "op_type": op, "op_ts": ts, "table": "SHOP.t_ogg",
        "before": image if op == "D" else None,
        "after": None if op == "D" else image,
    }
    act = {"I": "INSERT", "U": "UPDATE-INSERT", "D": "DELETE",
           "T": None}[op]
    return json.dumps(rec, ensure_ascii=False), act, image, ts


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(recs=st.lists(_ogg_record(), min_size=1, max_size=8))
def test_goldengate_parse_matches_python_model(spark, recs):
    df = spark.createDataFrame([(r[0],) for r in recs], "value string")
    env = parse_envelope_goldengate(df).collect()
    got = Counter(
        (r["object"], r["action"],
         r["update_date_raw"] if r["action"] else None,
         json.dumps(json.loads(r["payload_json"]), sort_keys=True)
         if r["action"] and r["payload_json"] is not None else None)
        for r in env
    )
    want = Counter(
        ("t_ogg", act, ts if act else None,
         json.dumps(img, sort_keys=True) if act else None)
        for _, act, img, ts in recs
    )
    assert got == want
