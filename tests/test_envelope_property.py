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
