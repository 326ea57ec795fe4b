"""SCD2 semantics golden tests (reference README.md:57 behavior)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from cdc_streamming___v2_spark.operators.history import as_of, history_of, latest_state


def _history(spark):
    t = dt.datetime
    rows = [
        # key 1: insert -> update -> update  (alive, v3 current)
        Row(id=1, name="a1", action="INSERT", update_date=t(2024, 1, 1)),
        Row(id=1, name="a2", action="UPDATE-INSERT", update_date=t(2024, 1, 2)),
        Row(id=1, name="a3", action="UPDATE-INSERT", update_date=t(2024, 1, 3)),
        # key 2: insert -> delete (dead; blank-row delete carries nulls)
        Row(id=2, name="b1", action="INSERT", update_date=t(2024, 1, 1)),
        Row(id=2, name=None, action="DELETE", update_date=t(2024, 1, 4)),
        # key 3: insert only
        Row(id=3, name="c1", action="INSERT", update_date=t(2024, 1, 2)),
        # key 4: insert -> delete -> re-insert (resurrection)
        Row(id=4, name="d1", action="INSERT", update_date=t(2024, 1, 1)),
        Row(id=4, name=None, action="DELETE", update_date=t(2024, 1, 2)),
        Row(id=4, name="d2", action="INSERT", update_date=t(2024, 1, 5)),
    ]
    return spark.createDataFrame(rows)


def test_latest_state_picks_newest_and_hides_deleted(spark):
    out = latest_state(_history(spark), keys=["id"]).collect()
    state = {r.id: r.name for r in out}
    assert state == {1: "a3", 3: "c1", 4: "d2"}  # id=2 deleted → hidden


def test_as_of_point_in_time(spark):
    h = _history(spark)
    # on Jan 2: 1→a2, 2→b1 (delete not yet), 3→c1, 4 deleted that day
    out = as_of(h, keys=["id"], ts=dt.datetime(2024, 1, 2))
    state = {r.id: r.name for r in out.collect()}
    assert state == {1: "a2", 2: "b1", 3: "c1"}
    # on Jan 4: 2 now deleted, 4 still deleted
    out = as_of(h, keys=["id"], ts=dt.datetime(2024, 1, 4))
    state = {r.id: r.name for r in out.collect()}
    assert state == {1: "a3", 3: "c1"}


def test_history_of_full_chain(spark):
    rows = history_of(_history(spark), keys=["id"], key_values=[4]).collect()
    assert [r.action for r in rows] == ["INSERT", "DELETE", "INSERT"]


def test_latest_state_tiebreaker_deterministic(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        Row(id=1, seq=1, name="x", action="INSERT", update_date=t),
        Row(id=1, seq=2, name="y", action="UPDATE-INSERT", update_date=t),
    ]
    df = spark.createDataFrame(rows)
    out = latest_state(df, keys=["id"], tiebreakers=["seq"]).collect()
    assert len(out) == 1 and out[0].name == "y"


def test_scd2_join_as_of_is_time_consistent(spark):
    """Every output pair must be each stream's own as-of state: both sides
    at or before the cut, neither side tombstoned, and exactly the newest
    row of its verb set per user."""
    from cdc_streamming___v2_spark.operators import scd2_queries as SQ
    from cdc_streamming___v2_spark.sources.tables import load_table
    import datetime

    rows = SQ.scd2_join_as_of(spark, "/root/testdata/sf0.001").collect()
    assert rows
    cut = datetime.datetime.fromisoformat(SQ.AS_OF_TS)
    e = load_table(spark, "/root/testdata/sf0.001", "events").collect()
    by_user: dict[int, list] = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append(r)
    for r in rows:
        assert r.a_ts <= cut and r.b_ts <= cut
        assert r.a_type in SQ._STREAM_A and r.b_type in SQ._STREAM_B
        # newest eligible row of each verb set (incl. tombstones) wins
        for verbs, (eid, ts) in (
            (SQ._STREAM_A, (r.a_event_id, r.a_ts)),
            (SQ._STREAM_B, (r.b_event_id, r.b_ts)),
        ):
            elig = [
                x for x in by_user[r.user_id]
                if x.ts <= cut and x.event_type in verbs + SQ._TOMBSTONE
            ]
            newest = max(elig, key=lambda x: (x.ts, x.event_id))
            assert (newest.event_id, newest.ts) == (eid, ts)


def test_snapshot_diff_classifies_against_bruteforce(spark):
    """Recompute both as-of states driver-side and check every diff row's
    classification."""
    from cdc_streamming___v2_spark.operators import scd2_queries as SQ
    from cdc_streamming___v2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").collect()

    def state(ts):
        best = {}
        for r in events:
            if str(r.ts) <= ts:
                k = (str(r.ts), r.event_id)
                if r.user_id not in best or k > best[r.user_id][0]:
                    best[r.user_id] = (k, r)
        return {
            u: r for u, (_, r) in best.items() if r.event_type != "error"
        }

    old = state(SQ.DIFF_T1)
    new = state(SQ.DIFF_T2)
    want = {}
    for u in set(old) | set(new):
        if u not in old:
            want[u] = "INSERT"
        elif u not in new:
            want[u] = "DELETE"
        elif old[u].event_id != new[u].event_id:
            want[u] = "UPDATE"
    got = {
        r.user_id: r.change_type
        for r in SQ.scd2_snapshot_diff(spark, sf).collect()
    }
    assert got == want
