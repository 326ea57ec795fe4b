"""Property-based fuzz of the commit-log table protocol: Hypothesis
drives random interleavings of append / txn-replay / replace / compact /
vacuum / change-feed operations against a pure-Python model (a multiset
of rows + a version->snapshot map), and after every step the table's
read() must equal the model, time travel must reproduce every retained
snapshot, and read_changes must reconstruct any later snapshot from an
earlier one (the net-delta contract) — the exactly-once machinery
exercised as a state machine rather than one scripted scenario."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_streamming___v2_spark.streaming.commitlog import CommitLogTable

ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 5)),
        st.tuples(st.just("replay_append"), st.integers(0, 5)),
        st.tuples(st.just("replace"), st.integers(0, 5)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("vacuum"), st.just(0)),
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(script=ops)
def test_commitlog_interleavings_match_model(spark, tmp_path_factory, script):
    work = tmp_path_factory.mktemp("clp")
    t = CommitLogTable(spark, str(work / "t"))
    model = Counter()          # multiset of k values
    snapshots = {}             # version -> Counter
    applied = set()            # txn ids already committed
    next_batch = 0

    def frame(batch, n):
        return spark.createDataFrame(
            [(batch * 100 + i,) for i in range(n)], "k long"
        )

    for op, n in script:
        if op == "append":
            txn = f"a{next_batch}"
            t.write_append(frame(next_batch, n), txn)
            model.update(next_batch * 100 + i for i in range(n))
            applied.add((txn, n, next_batch))
            next_batch += 1
        elif op == "replay_append":
            # replay the LAST append txn — must be a no-op
            replays = [a for a in applied if a[0].startswith("a")]
            if not replays:
                continue
            txn, rn, rb = sorted(replays)[-1]
            assert t.write_append(frame(rb, rn), txn) is False
        elif op == "replace":
            txn = f"r{next_batch}"
            t.write_replace(frame(next_batch, n), txn)
            model = Counter(next_batch * 100 + i for i in range(n))
            applied.add((txn, n, next_batch))
            next_batch += 1
        elif op == "compact":
            t.compact(txn=f"c{t.version()}")
        elif op == "vacuum":
            t.vacuum(keep_last=1, min_age_seconds=0)
            # vacuumed-away versions are no longer time-travelable
            snapshots = {
                v: c for v, c in snapshots.items() if v >= t.version()
            }
        if t.version() >= 0:
            snapshots[t.version()] = Counter(model)
            got = Counter(r.k for r in t.read().collect())
            assert got == model, f"after {op}: {got} != {model}"

    # time travel: every retained snapshot reproduces exactly
    for v, want in snapshots.items():
        got = Counter(r.k for r in t.read(version=v).collect())
        assert got == want, f"version {v}"

    # change feed reconstruction between the extreme retained versions
    if len(snapshots) >= 2:
        v0, v1 = min(snapshots), max(snapshots)
        feed = t.read_changes(v0, v1, schema=t.read().schema)
        ins = Counter(
            r.k for r in feed.filter("_change_type = 'insert'").collect()
        )
        dels = Counter(
            r.k for r in feed.filter("_change_type = 'delete'").collect()
        )
        recon = Counter(snapshots[v0])
        recon.update(ins)
        recon.subtract(dels)
        recon = +recon
        assert recon == snapshots[v1], "net-delta reconstruction"
