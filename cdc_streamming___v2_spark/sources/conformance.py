"""Golden CDC conformance corpus: ONE canonical change set rendered
into every supported producer's public wire format (VERDICT r7 #4b).

Shared by the tests (tests/golden/*.jsonl replayed through the
single-pass ingest) and the registry query
``cdc_conformance_matrix`` (operators/cdc_batch.py), which parses all
renderings with the per-line auto dispatcher and proves cross-dialect
equivalence under the DuckDB oracle.

Wire shapes follow each parser's documented public contract
(sources/cdc_schema.py docstrings; reference envelope per
src/dataflow-cdc-stream.py:60-70).
"""


from __future__ import annotations

import json


# (table, action, epoch_seconds, full_payload, key_payload)
P1 = {"product_id": "p1", "product_category_name": "toys",
      "product_photos_qty": 2, "product_weight_g": 100.0}
P1B = {"product_id": "p1", "product_category_name": "games",
       "product_photos_qty": 3, "product_weight_g": 120.0}
P2 = {"product_id": "p2", "product_category_name": "books",
      "product_photos_qty": 1, "product_weight_g": 80.0}
P2KEY = {"product_id": "p2"}
ANA = {"first_name": "ana", "email": "a@x.com"}

CHANGES = [
    ("olist_produtos", "INSERT", 1704067200, P1, None),
    ("olist_produtos", "UPDATE-INSERT", 1704153600, P1B, None),
    ("olist_produtos", "INSERT", 1704110400, P2, None),
    ("olist_produtos", "DELETE", 1704240000, None, P2KEY),
    ("olist_users", "INSERT", 1704443400, ANA, None),
]


def _iso(ep: int) -> str:
    import datetime

    return (
        datetime.datetime.fromtimestamp(ep, datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    )


def _sql(ep: int, frac: str = "") -> str:
    import datetime

    s = datetime.datetime.fromtimestamp(
        ep, datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    return s + frac


def _datastream(t, a, ep, p, k):
    return json.dumps({
        "object": t,
        "source_timestamp": _iso(ep),
        "source_metadata": {"change_type": a},
        "payload": p if p is not None else k,
    })


_DBZ_OP = {"INSERT": "c", "UPDATE-INSERT": "u", "DELETE": "d"}


def _debezium(t, a, ep, p, k):
    return json.dumps({
        "op": _DBZ_OP[a],
        "ts_ms": ep * 1000,
        "before": k if a == "DELETE" else None,
        "after": p,
        "source": {"db": "shop", "table": t},
    })


def _debezium_flat(t, a, ep, p, k):
    row = dict(p if p is not None else k)
    row.update({"__op": _DBZ_OP[a], "__ts_ms": ep * 1000, "__table": t})
    return json.dumps(row)


_MXW_TYPE = {"INSERT": "insert", "UPDATE-INSERT": "update",
             "DELETE": "delete"}


def _maxwell(t, a, ep, p, k):
    return json.dumps({
        "database": "shop", "table": t, "type": _MXW_TYPE[a], "ts": ep,
        "data": p if p is not None else k,
    })


_CANAL_TYPE = {"INSERT": "INSERT", "UPDATE-INSERT": "UPDATE",
               "DELETE": "DELETE"}


def _canal(t, a, ep, p, k):
    return json.dumps({
        "database": "shop", "table": t, "type": _CANAL_TYPE[a],
        "es": ep * 1000, "ts": ep * 1000 + 5,
        "data": [p if p is not None else k],
    })


_MSSQL_OP = {"DELETE": 1, "INSERT": 2, "UPDATE-INSERT": 4}


def _sqlserver(t, a, ep, p, k):
    row = dict(p if p is not None else k)
    row.update({
        "__$operation": _MSSQL_OP[a],
        "__$start_lsn": "00000025:00000448:0003",
        "__$capture_instance": f"dbo_{t}",
        "__$commit_time": _sql(ep),
    })
    return json.dumps(row)


_DMS_OP = {"INSERT": "insert", "UPDATE-INSERT": "update",
           "DELETE": "delete"}


def _aws_dms(t, a, ep, p, k):
    import datetime

    ts = datetime.datetime.fromtimestamp(
        ep, datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return json.dumps({
        "data": p if p is not None else k,
        "metadata": {
            "record-type": "data", "operation": _DMS_OP[a],
            "timestamp": ts, "schema-name": "shop", "table-name": t,
        },
    })


_OGG_OP = {"INSERT": "I", "UPDATE-INSERT": "U", "DELETE": "D"}


def _goldengate(t, a, ep, p, k):
    return json.dumps({
        "op_type": _OGG_OP[a],
        "op_ts": _sql(ep, ".000000"),
        "table": f"SHOP.{t}",
        "before": k if a == "DELETE" else None,
        "after": p,
    })


_MONGO_OP = {"INSERT": "insert", "UPDATE-INSERT": "update",
             "DELETE": "delete"}


def _natural_key(p, k):
    """Identifying fields for key-only wire sections (Mongo documentKey,
    DynamoDB Keys): the explicit key payload when the change carries one,
    else the row's real identifier from the full payload — product_id for
    product rows, email for user rows (ADVICE r8: never synthesize a key
    field the table doesn't have, or the corpus misrepresents the wire)."""
    if k:
        return k
    src = p or {}
    for field in ("product_id", "email"):
        if field in src:
            return {field: src[field]}
    raise ValueError(f"no identifying field in payload {sorted(src)}")


def _mongo(t, a, ep, p, k):
    import datetime

    wall = datetime.datetime.fromtimestamp(
        ep, datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S.000Z")  # relaxed-EJSON $date layout
    doc = {
        "operationType": _MONGO_OP[a],
        "ns": {"db": "shop", "coll": t},
        "wallTime": wall,
        "documentKey": _natural_key(p, k),
    }
    if a != "DELETE":
        doc["fullDocument"] = p  # updateLookup-style full image
    return json.dumps(doc)


_W2J_OP = {"INSERT": "I", "UPDATE-INSERT": "U", "DELETE": "D"}
_W2J_TYPES = {
    "product_id": "text", "product_category_name": "text",
    "product_photos_qty": "integer", "product_weight_g": "numeric",
    "product_length_cm": "numeric", "category": "text",
    "first_name": "text", "email": "text",
}


def _w2j_cols(obj):
    return [
        {"name": n, "type": _W2J_TYPES[n], "value": v}
        for n, v in obj.items()
    ]


def _wal2json(t, a, ep, p, k):
    doc = {
        "action": _W2J_OP[a], "schema": "public", "table": t,
        # wal2json renders commit time with microseconds + numeric offset
        "timestamp": _sql(ep, ".000000+00"),
    }
    if a == "DELETE":
        doc["identity"] = _w2j_cols(k)
    else:
        doc["columns"] = _w2j_cols(p)
    return json.dumps(doc)


def _airbyte(t, a, ep, p, k):
    data = dict(p if p is not None else k)
    if a == "UPDATE-INSERT":
        data["_ab_cdc_updated_at"] = ep * 1000
    elif a == "DELETE":
        data["_ab_cdc_updated_at"] = ep * 1000
        data["_ab_cdc_deleted_at"] = ep * 1000
    return json.dumps({
        "type": "RECORD",
        "record": {
            "stream": t, "namespace": "public",
            "emitted_at": ep * 1000, "data": data,
        },
    })


def _ddb_attr(v):
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, (int, float)):
        return {"N": repr(v)}
    return {"S": str(v)}


_DDB_EVENT = {"INSERT": "INSERT", "UPDATE-INSERT": "MODIFY",
              "DELETE": "REMOVE"}


def _dynamodb(t, a, ep, p, k):
    body = {"ApproximateCreationDateTime": ep,
            "Keys": {n: _ddb_attr(v)
                     for n, v in _natural_key(p, k).items()}}
    if a == "DELETE":
        body["OldImage"] = {n: _ddb_attr(v) for n, v in k.items()}
    else:
        body["NewImage"] = {n: _ddb_attr(v) for n, v in p.items()}
    return json.dumps({
        "eventName": _DDB_EVENT[a],
        "eventSourceARN": (
            f"arn:aws:dynamodb:us-east-1:123456789012:table/{t}"
            "/stream/2024-01-01T00:00:00.000"
        ),
        "dynamodb": body,
    })


RENDERERS = {
    "datastream": _datastream,
    "debezium": _debezium,
    "debezium_flat": _debezium_flat,
    "maxwell": _maxwell,
    "canal": _canal,
    "sqlserver": _sqlserver,
    "aws_dms": _aws_dms,
    "goldengate": _goldengate,
    "mongo": _mongo,
    "wal2json": _wal2json,
    "airbyte": _airbyte,
    "dynamodb": _dynamodb,
}


def render(dialect: str) -> list[str]:
    fn = RENDERERS[dialect]
    return [fn(*c) for c in CHANGES]


# Schema-evolution phase (VERDICT r8 #6): the producer starts emitting a
# NEW column (ALTER TABLE ADD COLUMN product_length_cm upstream) after
# the steady-state change set above.  Rendered per dialect like CHANGES,
# replayed mid-stream in the golden e2e (tests/test_cdc_conformance.py):
# pre-add history rows must project NULL for the column, post-add rows
# must carry it — in every wire format, under the auto dispatcher.
P1C = {"product_id": "p1", "product_category_name": "games",
       "product_photos_qty": 3, "product_weight_g": 120.0,
       "product_length_cm": 30.0}
P3 = {"product_id": "p3", "product_category_name": "sports",
      "product_photos_qty": 4, "product_weight_g": 60.0,
      "product_length_cm": 45.0}

EVOLUTION_CHANGES = [
    ("olist_produtos", "UPDATE-INSERT", 1704499200, P1C, None),
    ("olist_produtos", "INSERT", 1704585600, P3, None),
]


def render_evolution(dialect: str) -> list[str]:
    fn = RENDERERS[dialect]
    return [fn(*c) for c in EVOLUTION_CHANGES]


# Type-widening phase (VERDICT r9 #6): the source ALTERs
# product_photos_qty from a 32-bit int to a 64-bit int (and weight from
# float32 to float64) and starts emitting values outside the old domain.
# History files written pre-widening keep their narrow physical types;
# Spark's parquet reader up-converts them under the widened read schema
# (sources/registry.py SAFE_WIDENINGS, measured).  Wire decoding is
# dialect-independent here (the per-dialect paths are proven by the
# conformance matrix), so the golden file still renders every dialect but
# the lifecycle query replays a 3-dialect diverse subset.
P4_WIDE = {"product_id": "p4", "product_category_name": "appliances",
           "product_photos_qty": 5000000000,
           "product_weight_g": 123.5}

WIDENING_CHANGES = [
    ("olist_produtos", "INSERT", 1704672000, P4_WIDE, None),
]


def render_widening(dialect: str) -> list[str]:
    fn = RENDERERS[dialect]
    return [fn(*c) for c in WIDENING_CHANGES]


# Column-drop phase (VERDICT r9 #6): the source DROPs product_weight_g;
# producers stop emitting it.  Old files retain the column physically —
# reads under the successor registry project it away; the drop is
# tombstoned so a later re-add under a type the buried data can't be
# read as (e.g. STRING over DOUBLE files) is refused.
P5_NOWEIGHT = {"product_id": "p5", "product_category_name": "home",
               "product_photos_qty": 7}

DROP_CHANGES = [
    ("olist_produtos", "INSERT", 1704758400, P5_NOWEIGHT, None),
]


def render_drop(dialect: str) -> list[str]:
    fn = RENDERERS[dialect]
    return [fn(*c) for c in DROP_CHANGES]


# Column-RENAME phase (VERDICT r10 #3): the source RENAMEs
# product_category_name -> category (the remaining MySQL ALTER class a
# CDC pipeline hits).  On the WIRE a rename is observable only as the
# field-name flip in data records — from the document diff alone,
# drop(a)+add(b) and rename(a→b) are indistinguishable — so identity is
# carried by the ``renamed_from`` declaration on the new registry field
# (the Avro schema-resolution ALIAS pattern; the registry file is the
# single source of schema truth, as in the reference's data-stream.json).
# Dialects that DO emit a dedicated DDL event for the rename (Canal
# ALTER sql, Maxwell table-alter) send it as a CONTROL record — those
# must dead-letter, never apply (RENAME_CONTROLS below).
#
# P6 emits the NEW name.  P7 is the transition-window witness: a LAGGING
# producer still emitting the OLD name AFTER the registry rename — the
# ``renamed_from`` parse fallback must land its value under ``category``.
P6_RENAMED = {"product_id": "p6", "category": "puzzles",
              "product_photos_qty": 2, "product_weight_g": 310.0}
P7_LAGGING = {"product_id": "p7", "product_category_name": "garden",
              "product_photos_qty": 1, "product_weight_g": 95.0}

RENAME_CHANGES = [
    ("olist_produtos", "INSERT", 1704844800, P6_RENAMED, None),
    ("olist_produtos", "INSERT", 1704931200, P7_LAGGING, None),
]

RENAME_CONTROLS: list[str] = [
    json.dumps({
        "database": "shop", "table": "olist_produtos", "type": "ALTER",
        "es": 1704844800000, "ts": 1704844800005, "data": None,
        "sql": ("ALTER TABLE olist_produtos RENAME COLUMN "
                "product_category_name TO category"),
    }),
    json.dumps({
        "database": "shop", "table": "olist_produtos",
        "type": "table-alter", "ts": 1704844800,
        "old": {"column": "product_category_name"},
        "def": {"column": "category"},
    }),
]


def render_rename(dialect: str) -> list[str]:
    fn = RENDERERS[dialect]
    return [fn(*c) for c in RENAME_CHANGES]




# Control / non-row records per dialect (transaction markers, DDL,
# bootstrap phases, protocol STATE, truncates, unknown ops, corrupt
# bytes).  Every one must land in the DEAD-LETTER sink — applying a
# BEGIN marker or a STATE checkpoint as a row would corrupt the table —
# both under the dialect's own parser AND through the auto dispatcher's
# precedence chain (where a control line may legitimately fall through
# to the Datastream branch; the contract is only that it dead-letters).
CONTROLS: list[tuple[str, str]] = [
    ("datastream", '{"this is not json'),
    ("debezium", json.dumps({
        "op": "t", "ts_ms": 1704067200000,
        "source": {"db": "shop", "table": "olist_produtos"},
    })),
    ("debezium_flat", json.dumps({
        "product_id": "p9", "__op": "x", "__ts_ms": 1704067200000,
        "__table": "olist_produtos",
    })),
    ("maxwell", json.dumps({
        "database": "shop", "table": "olist_produtos",
        "type": "bootstrap-start", "ts": 1704067200,
    })),
    ("canal", json.dumps({
        "database": "shop", "table": "olist_produtos", "type": "CREATE",
        "es": 1704067200000, "ts": 1704067200005, "data": None,
        "sql": "CREATE TABLE olist_produtos (...)",
    })),
    ("sqlserver", json.dumps({
        "product_id": "p1", "__$operation": 3,
        "__$capture_instance": "dbo_olist_produtos",
        "__$commit_time": "2024-01-01 00:00:00",
    })),
    ("aws_dms", json.dumps({
        "metadata": {"record-type": "control", "operation": "create-table",
                     "timestamp": "2024-01-01T00:00:00.000000Z",
                     "schema-name": "shop",
                     "table-name": "olist_produtos"},
    })),
    ("goldengate", json.dumps({
        "op_type": "T", "op_ts": "2024-01-01 00:00:00.000000",
        "table": "SHOP.olist_produtos",
    })),
    ("mongo", json.dumps({
        "operationType": "drop", "ns": {"db": "shop",
                                        "coll": "olist_produtos"},
        "wallTime": "2024-01-01T00:00:00.000Z",
    })),
    ("wal2json", json.dumps({"action": "B",
                             "timestamp": "2024-01-01 00:00:00.000000+00"})),
    ("wal2json", json.dumps({"action": "C",
                             "timestamp": "2024-01-01 00:00:00.000000+00"})),
    ("airbyte", json.dumps({"type": "STATE",
                            "state": {"data": {"cursor": "42"}}})),
    ("dynamodb", json.dumps({
        "eventName": "PING",
        "eventSourceARN": (
            "arn:aws:dynamodb:us-east-1:123456789012:table/"
            "olist_produtos/stream/2024-01-01T00:00:00.000"
        ),
        "dynamodb": {"ApproximateCreationDateTime": 1704067200,
                     "Keys": {"product_id": {"S": "p1"}}},
    })),
]


def controls_for(dialect: str) -> list[str]:
    return [ln for d, ln in CONTROLS if d == dialect]


# Registry doc for conformance-corpus replays (mirrors the reference's
# public data-stream.json shape, src/data-stream.json: produtos declares
# update_date STRING, users TIMESTAMP — the reference's intentional
# divergence both sink types must round-trip).
CONFORMANCE_REGISTRY = {
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


def evolved_registry() -> dict:
    """CONFORMANCE_REGISTRY after the upstream ALTER TABLE ADD COLUMN
    (product_length_cm FLOAT) that EVOLUTION_CHANGES starts emitting —
    the safe add-column successor SchemaRegistry.check_evolution admits."""
    import copy

    doc = copy.deepcopy(CONFORMANCE_REGISTRY)
    fields = doc["olist_produtos"]["schema"]["fields"]
    fields.insert(4, {"name": "product_length_cm", "type": "FLOAT"})
    return doc


def narrow_registry() -> dict:
    """CONFORMANCE_REGISTRY with the NARROW starting types of the
    widening lifecycle: product_photos_qty INT32, product_weight_g
    FLOAT32 (engine-extension types, sources/registry.py)."""
    import copy

    doc = copy.deepcopy(CONFORMANCE_REGISTRY)
    for f in doc["olist_produtos"]["schema"]["fields"]:
        if f["name"] == "product_photos_qty":
            f["type"] = "INT32"
        elif f["name"] == "product_weight_g":
            f["type"] = "FLOAT32"
    return doc


def dropped_registry() -> dict:
    """CONFORMANCE_REGISTRY after DROP COLUMN product_weight_g — the
    opt-in drop successor (allow_column_drops)."""
    import copy

    doc = copy.deepcopy(CONFORMANCE_REGISTRY)
    fields = doc["olist_produtos"]["schema"]["fields"]
    doc["olist_produtos"]["schema"]["fields"] = [
        f for f in fields if f["name"] != "product_weight_g"
    ]
    return doc


def renamed_registry() -> dict:
    """CONFORMANCE_REGISTRY after RENAME COLUMN product_category_name TO
    category: the new field carries ``renamed_from`` (Avro-alias
    pattern) so ``SchemaRegistry.check_evolution_full`` admits it as a
    rename — identity and data continuity preserved — instead of
    treating the diff as an (unsound) drop+add."""
    import copy

    doc = copy.deepcopy(CONFORMANCE_REGISTRY)
    for f in doc["olist_produtos"]["schema"]["fields"]:
        if f["name"] == "product_category_name":
            f["name"] = "category"
            f["renamed_from"] = "product_category_name"
    return doc


def readded_registry(bq_type: str) -> dict:
    """dropped_registry() with product_weight_g re-ADDED under
    ``bq_type`` — 'FLOAT' (the buried physical type, admissible) or an
    incompatible type like 'STRING' (must be refused via tombstone)."""
    doc = dropped_registry()
    doc["olist_produtos"]["schema"]["fields"].insert(
        3, {"name": "product_weight_g", "type": bq_type}
    )
    return doc
