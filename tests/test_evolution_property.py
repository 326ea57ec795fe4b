"""Property-based fuzz of the registry-evolution state machine
(SURVEY §22.2): Hypothesis generates successor registries as random
per-column mutations of a random base registry, plus random tombstone
context, and SchemaRegistry.check_evolution must agree with a pure
Python model of the documented contract:

- add table / add column: safe;
- widen along SAFE_WIDENINGS (int32->int64, float32->float64,
  int32->float64): safe;
- any other type change (incl. int64->float64, narrowing, to/from
  string): rejected;
- drop column: rejected by default, safe-and-tombstoned under
  allow_column_drops (engine columns never droppable);
- re-add of a tombstoned name: safe iff the new type equals the buried
  type or is a safe widening of it;
- drop table / rename sink: rejected.

The model is deliberately independent code (dict/set arithmetic over the
BQ type names) so a drift in either side fails the property.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_streamming___v2_spark.sources.registry import (
    BQ_TO_SPARK,
    SchemaRegistry,
)

# BQ-name-level widening relation (mirrors SAFE_WIDENINGS through the
# loader's type map: INTEGER/INT64 -> long, FLOAT/FLOAT64 -> double)
_CANON = {
    "STRING": "string", "TIMESTAMP": "timestamp", "BOOL": "boolean",
    "BOOLEAN": "boolean", "INT64": "bigint", "INTEGER": "bigint",
    "FLOAT": "double", "FLOAT64": "double", "INT32": "int",
    "FLOAT32": "float",
}
_WIDEN_OK = {("int", "bigint"), ("float", "double"), ("int", "double")}

TYPES = ["STRING", "INT32", "INT64", "FLOAT32", "FLOAT64", "TIMESTAMP"]
COLS = ["c1", "c2", "c3"]

base_tables = st.dictionaries(
    st.sampled_from(["obj_a", "obj_b"]),
    st.fixed_dictionaries(
        {
            "cols": st.dictionaries(
                st.sampled_from(COLS), st.sampled_from(TYPES),
                min_size=1, max_size=3,
            )
        }
    ),
    min_size=1, max_size=2,
)

mutation = st.sampled_from(
    ["none", "add_col", "drop_col", "retype_col", "drop_table",
     "rename_sink", "add_table"]
)


def _doc(tables: dict) -> dict:
    return {
        obj: {
            "table_name": f"{obj}_hist",
            "schema": {
                "fields": [
                    {"name": c, "type": t}
                    for c, t in spec["cols"].items()
                ]
                + [
                    {"name": "action", "type": "STRING"},
                    {"name": "update_date", "type": "STRING"},
                ]
            },
        }
        for obj, spec in tables.items()
    }


@settings(
    max_examples=120, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    tables=base_tables,
    mut=mutation,
    target_col=st.sampled_from(COLS),
    new_type=st.sampled_from(TYPES),
    allow_drops=st.booleans(),
    tomb_type=st.one_of(st.none(), st.sampled_from(TYPES)),
    data=st.data(),
)
def test_check_evolution_matches_model(
    tables, mut, target_col, new_type, allow_drops, tomb_type, data
):
    import copy

    obj = data.draw(st.sampled_from(sorted(tables)))
    new_tables = copy.deepcopy(tables)
    expect_problems = []
    expect_dropped = {}

    if mut == "add_col":
        is_new = target_col not in tables[obj]["cols"]
        if not is_new:
            # adding an existing name IS a retype — fold into that case
            old_c = _CANON[tables[obj]["cols"][target_col]]
            new_c = _CANON[new_type]
            if old_c != new_c and (old_c, new_c) not in _WIDEN_OK:
                expect_problems.append("type changed")
        new_tables[obj]["cols"][target_col] = new_type
        if is_new and tomb_type is not None:
            buried, added = _CANON[tomb_type], _CANON[new_type]
            if buried != added and (buried, added) not in _WIDEN_OK:
                expect_problems.append("tombstoned")
    elif mut == "drop_col" and target_col in tables[obj]["cols"]:
        del new_tables[obj]["cols"][target_col]
        if allow_drops:
            expect_dropped[f"{obj}.{target_col}"] = _CANON[
                tables[obj]["cols"][target_col]
            ]
        else:
            expect_problems.append("column dropped")
    elif mut == "retype_col" and target_col in tables[obj]["cols"]:
        old_c = _CANON[tables[obj]["cols"][target_col]]
        new_tables[obj]["cols"][target_col] = new_type
        new_c = _CANON[new_type]
        if old_c != new_c and (old_c, new_c) not in _WIDEN_OK:
            expect_problems.append("type changed")
    elif mut == "drop_table":
        del new_tables[obj]
        expect_problems.append("table dropped")
    elif mut == "rename_sink":
        pass  # handled below via doc-level rename
    elif mut == "add_table":
        new_tables["obj_new"] = {"cols": {"x": "STRING"}}

    old_reg = SchemaRegistry.from_dict(_doc(tables))
    new_doc = _doc(new_tables)
    if mut == "rename_sink":
        new_doc[obj]["table_name"] = f"{obj}_v2"
        expect_problems.append("sink renamed")
    new_reg = SchemaRegistry.from_dict(new_doc)

    tombstones = (
        {f"{obj}.{target_col}": _CANON[tomb_type]}
        if tomb_type is not None
        else None
    )
    if expect_problems:
        with pytest.raises(ValueError) as exc:
            old_reg.check_evolution(
                new_reg, allow_column_drops=allow_drops,
                tombstones=tombstones,
            )
        for frag in expect_problems:
            assert frag in str(exc.value)
    else:
        dropped = old_reg.check_evolution(
            new_reg, allow_column_drops=allow_drops, tombstones=tombstones
        )
        assert dropped == expect_dropped


@settings(
    max_examples=120, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    tables=base_tables,
    new_type=st.sampled_from(TYPES),
    keep_old=st.booleans(),
    data=st.data(),
)
def test_check_evolution_rename_matches_model(
    tables, new_type, keep_old, data
):
    """Rename arm (VERDICT r10 #3): a successor field declaring
    ``renamed_from`` over a random base registry must be admitted iff
    the old name is retired AND the new type equals or safely widens the
    old — producing exactly one tombstone (the buried old name) and one
    rename-map entry; otherwise rejected with the documented message."""
    import copy

    obj = data.draw(st.sampled_from(sorted(tables)))
    src = data.draw(st.sampled_from(sorted(tables[obj]["cols"])))
    dst = f"renamed_{src}"
    old_c = _CANON[tables[obj]["cols"][src]]
    new_c = _CANON[new_type]

    new_tables = copy.deepcopy(tables)
    expect_problems = []
    if keep_old:
        expect_problems.append("still present")
    else:
        del new_tables[obj]["cols"][src]
        if old_c != new_c and (old_c, new_c) not in _WIDEN_OK:
            expect_problems.append("unsafe type change")

    old_reg = SchemaRegistry.from_dict(_doc(tables))
    new_doc = _doc(new_tables)
    new_doc[obj]["schema"]["fields"].insert(
        0, {"name": dst, "type": new_type, "renamed_from": src}
    )
    new_reg = SchemaRegistry.from_dict(new_doc)

    if expect_problems:
        with pytest.raises(ValueError) as exc:
            old_reg.check_evolution_full(new_reg)
        for frag in expect_problems:
            assert frag in str(exc.value)
    else:
        dropped, renamed = old_reg.check_evolution_full(new_reg)
        assert dropped == {f"{obj}.{src}": old_c}
        assert renamed == {f"{obj}.{dst}": src}
        # and the declaration is required: without it the same diff is
        # an (indistinguishable) drop+add, rejected by default
        del new_doc[obj]["schema"]["fields"][0]["renamed_from"]
        with pytest.raises(ValueError, match="column dropped"):
            SchemaRegistry.from_dict(_doc(tables)).check_evolution_full(
                SchemaRegistry.from_dict(new_doc)
            )
