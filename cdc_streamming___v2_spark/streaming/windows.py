"""Streaming windowed / stateful operators over an events stream.

The reference IMPORTS Beam's windowing-and-trigger machinery but never uses
it (src/dataflow-cdc-stream.py:2,7 — AfterWatermark, AfterProcessingTime,
AccumulationMode, AfterCount, Repeatedly, window are all dead imports; see
SURVEY.md §2.A "unused streaming machinery"). This module makes that
gestured-at surface real on Structured Streaming.

Every function takes an events streaming DataFrame
(event_id, ts:timestamp, user_id, event_type, value, props) and returns a
transformed streaming DataFrame — composition stays declarative so the
incremental planner handles state stores, watermark advancement, and late
data. Batch twins with DuckDB oracles live in operators/event_windows.py.

Scale: windowed aggs shuffle on (window, key) into the state store; the
watermark bounds state size — without it a 100 TB stream's state grows
unboundedly. session_window + flatMapGroupsWithState shard by key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState


def tumbling_counts(
    events: DataFrame, width: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window event counts + value sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    width: str = "12 hours",
    slide: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window rolling average of event values."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide))
        .agg(F.avg("value").alias("avg_value"), F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "avg_value",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` idle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def interval_join_streams(
    errors: DataFrame,
    clicks: DataFrame,
    window_minutes: int = 10,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each error event paired with the same
    user's click events from the preceding ``window_minutes``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store can evict rows once the watermark passes
    — bounded state, the requirement for an unbounded 100 TB stream.
    Batch twin (oracle-checked): operators/temporal.range_join_error_clicks.

    ``how="leftOuter"`` keeps errors with NO click in the window: the
    engine can only emit the null-padded row once the click-side watermark
    passes the end of that error's interval (before that, a matching click
    might still arrive), so outer results trail the inner ones by up to
    the watermark delay — correctness over latency, resolved per event as
    soon as the stream itself proves no match can appear.
    """
    e = (
        errors.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    cond = (
        (F.col("e_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("c_ts") < F.col("e_ts"))
    )
    return e.join(c, cond, how).select(
        F.col("e_user").alias("user_id"), "error_id", "e_ts", "click_id", "c_ts"
    )


def enrich_stream_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a batch dim
    table (the relational form of the reference's per-record registry
    lookup, src/dataflow-cdc-stream.py:69–76 — which paid one remote fetch
    per record; here the dim is planned once per micro-batch and broadcast
    when small).

    Stream-static joins need no watermark: the static side is re-resolved
    each micro-batch, so slowly-changing dims pick up updates on the next
    trigger. At 100 TB the dim side stays a broadcast while the stream
    never shuffles — append-only output preserves exactly-once through the
    sink checkpoint.
    """
    return stream.join(F.broadcast(dim), on, "left")


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """At-least-once -> effectively-once: drop replayed event_ids within the
    watermark horizon (bounded state). This is the dedup the reference's
    WRITE_APPEND path lacks (SURVEY.md §4 'delivery semantics')."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value total, emitted every micro-batch (update mode)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` re-expressed on Spark 4's transformWithState
    API (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState with explicit state variables, TTL support, and
    timers. Same semantics as the GroupState version (a cross-API
    equivalence test pins them row-for-row), so the engine offers BOTH
    stateful surfaces a production pipeline might target.

    NOTE: the transformWithState Python worker speaks a protobuf-based
    state-server protocol — it requires the ``protobuf`` package at
    runtime (standard in any real Spark 4 deployment; absent in this
    sandbox, where the equivalence test auto-skips).

    Scale: identical to the GroupState twin — state shards by user_id in
    the state store (RocksDB-capable, see tests/test_rocksdb_state.py);
    per-batch work is one Arrow batch per active key.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            prev = self._totals.get() if self._totals.exists() else None
            n, total = (prev[0], prev[1]) if prev else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.DoubleType()))]
)

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("est_distinct", T.DoubleType()),
        T.StructField("n_mins", T.LongType()),
    ]
)


def kmv_distinct_stream(events: DataFrame, k: int = 64) -> DataFrame:
    """Streaming KMV distinct-user estimate per event_type — the batch
    sketch (operators/sketches.kmv_distinct) as a stateful operator.

    KMV merges trivially (min-k of a union == min-k of the partial min-k's),
    so per-key state is a bounded sorted list of <= k doubles regardless of
    stream length — the property that makes streaming COUNT(DISTINCT)
    feasible at all. Hashing happens JVM-side before the state operator;
    Python only merges the k-minimum sets, so an identical estimate to the
    batch query falls out at every emission.
    """
    from ..functions.texts import md5_hash_long

    hashed = events.select(
        "event_type",
        (
            md5_hash_long(F.col("user_id").cast("string"), "kmv")
            / F.lit(2.0**32)
        ).alias("u"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mins = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            mins.update(float(x) for x in pdf["u"])
        top = sorted(mins)[:k]
        state.update((top,))
        est = float(len(top)) if len(top) < k else (k - 1) / top[-1]
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "est_distinct": [round(est, 2)],
                "n_mins": [len(top)],
            }
        )

    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


QSK_STATE_SCHEMA = T.StructType(
    [T.StructField("counts", T.ArrayType(T.LongType()))]
)

QSK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("p", T.DoubleType()),
        T.StructField("est_q", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def quantile_sketch_stream(
    events: DataFrame,
    lo: float,
    hi: float,
    bins: int = 128,
    probes: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Streaming percentiles of event value per event_type — the batch
    histogram sketch (operators/sketches.quantile_sketch) as a stateful
    operator.

    Histogram bin counts merge by addition, so per-key state is a fixed
    array of ``bins`` longs regardless of stream length (the same bounded-
    state property as KMV). A stream can't take the batch sketch's first
    min/max pass, so the value range is DECLARED up front — the standard
    streaming-histogram contract; out-of-range values clamp into the edge
    bins. Binning runs JVM-side; Python only adds count vectors and
    interpolates the probe quantiles, identically to the batch estimator,
    so with ``lo``/``hi`` set to the data's true min/max the emissions
    match the batch sketch exactly at every micro-batch boundary.
    """
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    idx = (
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.lit(float(lo))) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
    ).cast("int")
    binned = (
        events.select(
            "event_type", F.col("value").cast("double").alias("x")
        )
        .filter(F.col("x").isNotNull())
        .select("event_type", idx.alias("idx"))
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counts = list(state.get[0]) if state.exists else [0] * bins
        for pdf in pdfs:
            for i, c in pdf["idx"].value_counts().items():
                counts[int(i)] += int(c)
        state.update((counts,))
        n = sum(counts)
        if n == 0:
            return
        out = {"event_type": [], "p": [], "est_q": [], "n": []}
        for p in probes:
            target = p * n
            running = 0
            for i, c in enumerate(counts):
                running += c
                if c > 0 and running >= target:
                    est = lo + i * width + (target - (running - c)) / c * width
                    break
            out["event_type"].append(key[0])
            out["p"].append(float(p))
            out["est_q"].append(float(est))
            out["n"].append(n)
        yield pd.DataFrame(out)

    return binned.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=QSK_OUTPUT_SCHEMA,
        stateStructType=QSK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


RUN_ENC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_type", T.StringType()),
        T.StructField("run_len", T.LongType()),
        T.StructField("run_start", T.LongType()),
    ]
)

RUN_ENC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("run_len", T.LongType()),
        T.StructField("start_event_id", T.LongType()),
    ]
)


def event_run_encoder(events: DataFrame) -> DataFrame:
    """Streaming run-length encoder (the stateful twin of the batch
    ``event_run_lengths`` operator): per-user state carries the OPEN run
    (last type, length, first event id); each arriving event either
    extends it or CLOSES it — closed runs emit immediately (append mode),
    the open run stays in state across micro-batches.  The sequence-
    compression / consecutive-anomaly detector as an incremental operator:
    state is O(1) per active user, per-batch work is one Arrow batch per
    user.

    Rows are processed in (ts, event_id) order within each batch; streams
    that can re-order across batches should front a watermark sort (the
    standard caveat for any order-sensitive stateful operator).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_type, run_len, run_start = (
            state.get if state.exists else (None, 0, None)
        )
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid in zip(pdf["event_type"], pdf["event_id"]):
                if last_type is None:
                    last_type, run_len, run_start = et, 1, int(eid)
                elif et == last_type:
                    run_len += 1
                else:
                    out.append((key[0], last_type, run_len, run_start))
                    last_type, run_len, run_start = et, 1, int(eid)
        state.update((last_type, run_len, run_start))
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "run_len", "start_event_id"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUN_ENC_OUTPUT_SCHEMA,
        stateStructType=RUN_ENC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --------------------------------------------------------------------------
# round-5 restarted-session: streaming Misra-Gries heavy hitters
# --------------------------------------------------------------------------

MG_K = 10        # counters per shard (finds items above n_shard/(K+1))
MG_SHARDS = 8    # state shards; summaries merge downstream


def heavy_hitters_stream(events: DataFrame) -> DataFrame:
    """Streaming Misra-Gries heavy-hitter maintenance (the stateful twin
    of the batch ``heavy_hitters_topfreq`` two-pass pattern): per-shard
    state carries at most MG_K (item, counter) pairs; each arriving
    user_id increments its counter, claims a free slot, or triggers the
    decrement-all step.  The classic guarantee holds per shard: any item
    whose true shard frequency exceeds n_shard/(MG_K+1) is guaranteed to
    be present in the final summary, and every reported counter is a
    lower bound within n_shard/(MG_K+1) of the true count.

    Each micro-batch emits the shard's CURRENT summary stamped with a
    monotone batch sequence number, so a consumer (or the parity test)
    takes the max-seq emission per shard as the final state — counters
    can legitimately shrink across batches (decrement-all), so "latest"
    is the only correct read, not "max".

    State is O(MG_K) per shard — constant regardless of stream length —
    and summaries from different shards/executors merge by counter
    addition then re-pruning, the mergeable-sketch property that makes
    this the 100-TB shape for streaming top-frequency monitoring.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, counts, seq = state.get
            d = dict(zip(ids, counts))
        else:
            d, seq = {}, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for uid in pdf["user_id"]:
                uid = int(uid)
                if uid in d:
                    d[uid] += 1
                elif len(d) < MG_K:
                    d[uid] = 1
                else:
                    d = {i: c - 1 for i, c in d.items() if c > 1}
        seq += 1
        state.update((list(d.keys()), list(d.values()), seq))
        yield pd.DataFrame(
            [(key[0], seq, i, c) for i, c in sorted(d.items())],
            columns=["shard", "seq", "user_id", "lower_count"],
        )

    shard = events.withColumn(
        "shard", (F.col("user_id") % MG_SHARDS).cast("int")
    )
    return shard.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ]
)

MG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("lower_count", T.LongType()),
    ]
)


def ams_f2_stream(events: DataFrame) -> DataFrame:
    """Streaming AMS F2 sketch maintenance (the stateful twin of
    sketches.ams_f2_sketch): per-shard state carries the AMS_R sign-sum
    counters; every arriving user_id adds its portable md5 sign to each
    counter.  Because the counters are LINEAR sums, the final per-shard
    vectors merge by plain addition into exactly the batch sketch's
    global S_r vector — the mergeable-sketch property demonstrated
    across a stream/shard decomposition.

    Emissions are stamped with a monotone sequence; consumers read the
    max-seq emission per shard and sum vectors across shards.
    """
    import hashlib

    from ..operators.sketches import AMS_R

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sums, seq = list(state.get[0]), state.get[1]
        else:
            sums, seq = [0] * AMS_R, 0
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                uid = int(uid)
                for r in range(AMS_R):
                    h = int(
                        hashlib.md5(f"ams{r}|{uid}".encode()).hexdigest()[:8],
                        16,
                    )
                    sums[r] += 1 if h % 2 == 0 else -1
        seq += 1
        state.update((sums, seq))
        yield pd.DataFrame(
            [(key[0], seq, r, sums[r]) for r in range(AMS_R)],
            columns=["shard", "seq", "r", "s"],
        )

    shard = events.withColumn(
        "shard", (F.col("user_id") % MG_SHARDS).cast("int")
    )
    return shard.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=AMS_STREAM_OUTPUT_SCHEMA,
        stateStructType=AMS_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


AMS_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sums", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ]
)

AMS_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("r", T.IntegerType()),
        T.StructField("s", T.LongType()),
    ]
)


MOM_SHARDS = 8


def moments_stream(events: DataFrame) -> DataFrame:
    """Streaming EXACT running moments per (event_type, shard): state
    carries (n, sum_cents, sumsq_cents, seq) with the two integer sums
    serialized as decimal STRINGS — arbitrary precision, so the state
    never overflows at any stream length (sumsq in cents^2 exceeds int64
    around 4e18, i.e. well inside a 100-TB stream's lifetime; a string
    carries it exactly at constant practical size).

    The counters are LINEAR, so the final per-shard vectors merge by
    plain integer addition into exactly the batch moments — the same
    mergeability contract ams_f2_stream demonstrates, here for the
    mean/variance monitoring that feeds control_chart_days /
    page_hinkley_drift online.  Emissions are stamped with a monotone
    sequence; consumers read the max-seq row per shard.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s_str, ss_str, seq = state.get
            s, ss = int(s_str), int(ss_str)
        else:
            n, s, ss, seq = 0, 0, 0, 0
        for pdf in pdfs:
            # HALF_UP to match the batch twins' F.round (pandas .round()
            # is half-to-even); values are non-negative dollar amounts.
            cents = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
            n += int(len(cents))
            # object dtype: exact bigint arithmetic regardless of magnitude
            as_obj = cents.astype(object)
            s += int(as_obj.sum())
            ss += int((as_obj * as_obj).sum())
        seq += 1
        state.update((n, str(s), str(ss), seq))
        yield pd.DataFrame(
            [(key[0], int(key[1]), seq, n, str(s), str(ss))],
            columns=["event_type", "shard", "seq", "n", "sum_cents", "sumsq_cents"],
        )

    shard = events.withColumn("shard", (F.col("event_id") % MOM_SHARDS).cast("int"))
    return shard.groupBy("event_type", "shard").applyInPandasWithState(
        update,
        outputStructType=MOM_OUTPUT_SCHEMA,
        stateStructType=MOM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


MOM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.StringType()),
        T.StructField("sumsq_cents", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

MOM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.StringType()),
        T.StructField("sumsq_cents", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# round-5 fifth session: streaming SMA-crossover monitor
# ---------------------------------------------------------------------------

SMA_STREAM_FAST, SMA_STREAM_SLOW = 5, 10


def sma_crossover_stream(events: DataFrame) -> DataFrame:
    """Streaming golden/death-cross monitor per event type: state carries
    the per-day integer cent revenue map (calendar-bounded — days, not
    rows), each micro-batch folds its arrivals in and re-derives the
    crossover list from rolling integer sums, so late/out-of-order
    arrivals REVISE past crossovers instead of missing them (the reason
    the rolling sums can't live in the state directly).

    Exactness contract (test-proven): the crossover decision is the same
    cross-multiplied integer inequality SLOW*s_fast > FAST*s_slow the
    batch twin uses — state stores exact integer cents, never floats.
    Emissions are seq-stamped; consumers read the max-seq rows per type.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            days_s, sums_s, seq = state.get
            daymap = (
                {d: int(v) for d, v in zip(days_s.split("|"), sums_s.split("|"))}
                if days_s
                else {}
            )
        else:
            daymap, seq = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            days = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%d")
            # HALF_UP to match the batch twins' F.round (pandas .round()
            # is half-to-even); values are non-negative dollar amounts.
            cents = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
            for d, c in zip(days, cents):
                daymap[d] = daymap.get(d, 0) + int(c)
        seq += 1
        days = sorted(daymap)
        pref = [0]
        for d in days:
            pref.append(pref[-1] + daymap[d])
        rows = []
        above_prev = None
        for i in range(len(days)):
            if i + 1 < SMA_STREAM_SLOW:
                continue
            s_f = pref[i + 1] - pref[i + 1 - SMA_STREAM_FAST]
            s_s = pref[i + 1] - pref[i + 1 - SMA_STREAM_SLOW]
            above = SMA_STREAM_SLOW * s_f > SMA_STREAM_FAST * s_s
            if above_prev is not None and above != above_prev:
                rows.append(
                    (key[0], seq, days[i], "golden" if above else "death")
                )
            above_prev = above
        state.update(
            (
                "|".join(days),
                "|".join(str(daymap[d]) for d in days),
                seq,
            )
        )
        yield pd.DataFrame(
            rows, columns=["event_type", "seq", "day", "direction"]
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=SMA_STREAM_OUTPUT_SCHEMA,
        stateStructType=SMA_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


SMA_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.StringType()),
        T.StructField("sums", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

SMA_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("day", T.StringType()),
        T.StructField("direction", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# round 6: streaming Count-Min twin (frequency monitoring in bounded state)
# ---------------------------------------------------------------------------


def countmin_stream(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming Count-Min sketch: the bounded-state frequency monitor
    whose counters EQUAL the batch sketch's (operators/sketches.py
    countmin_freq) on the same data — CMS counters are pure sums, so the
    estimate is arrival-order-independent and the streaming/batch
    equality is exact, not approximate (test-proven).

    Sharding: the d hash rows are exploded JVM-side with the SAME
    md5-salt family as the batch op (no Python hashing), then each row
    0..CM_D-1 is one state key holding its CM_W counters — state size is
    d x w integers regardless of stream length, and the d shards update
    in parallel.  Emissions are seq-stamped; consumers read the max-seq
    row per shard and take min-over-rows per probe key
    (``countmin_stream_estimates``).
    """
    from ..operators.sketches import CM_D, CM_W, _cm_idx

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counts_s, seq = state.get
            counters = np.array([int(c) for c in counts_s.split("|")],
                                dtype=np.int64)
        else:
            counters, seq = np.zeros(CM_W, dtype=np.int64), 0
        for pdf in pdfs:
            if len(pdf):
                counters += np.bincount(
                    pdf["idx"].to_numpy(), minlength=CM_W
                ).astype(np.int64)
        seq += 1
        counts_s = "|".join(str(int(c)) for c in counters)
        state.update((counts_s, seq))
        yield pd.DataFrame(
            [(int(key[0]), seq, counts_s)],
            columns=["row", "seq", "counters"],
        )

    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_idx(F.col(key_col), r).alias("idx"),
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("c")
    ).select(F.col("c.row").alias("row"), F.col("c.idx").alias("idx"))
    return cells.groupBy("row").applyInPandasWithState(
        update,
        outputStructType=CM_STREAM_OUTPUT_SCHEMA,
        stateStructType=CM_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def countmin_stream_estimates(emitted: DataFrame, probes: DataFrame) -> DataFrame:
    """Point-query the final streaming CMS state: max-seq counters per
    hash row, exploded to (row, idx, c) cells, min over rows per probe.
    ``probes`` needs a string ``key`` column; returns (key, est_count).
    """
    from pyspark.sql import Window

    from ..operators.sketches import CM_D, _cm_idx

    wseq = Window.partitionBy("row").orderBy(F.col("seq").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter(F.col("rn") == 1)
        .select(
            "row",
            F.posexplode(F.split("counters", "\\|")).alias("idx", "cs"),
        )
        .select("row", "idx", F.col("cs").cast("long").alias("c"))
    )
    pr = probes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_idx(F.col("key"), r).alias("idx"),
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("p"),
    ).select("key", F.col("p.row").alias("row"), F.col("p.idx").alias("idx"))
    return (
        F.broadcast(pr)
        .join(final, ["row", "idx"])
        .groupBy("key")
        .agg(F.min("c").alias("est_count"))
    )


CM_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

CM_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("row", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("counters", T.StringType()),
    ]
)


def kmv_stream(
    events: DataFrame, key_col: str = "user_id", group_col: str = "event_type"
) -> DataFrame:
    """Streaming K-minimum-values distinct sketch: bounded per-group
    state (the KMV_K smallest DISTINCT md5 hashes) whose final estimate
    EQUALS the batch operator's (operators/sketches.py kmv_distinct) on
    the same data — "k smallest of a set union" is associative and
    arrival-order-independent, and the hash family is the deterministic
    JVM-side md5 salt the batch op uses (no Python hashing), so the
    streaming/batch equality is exact, not approximate (test-proven).

    State per group: at most KMV_K int64 hashes serialized "|"-joined —
    bounded regardless of stream length.  Emissions are seq-stamped;
    ``kmv_stream_estimates`` decodes the max-seq row per group.
    """
    from ..functions.texts import md5_hash_long
    from ..operators.sketches import KMV_K

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins_s, seq = state.get
            cur = np.array(
                [int(x) for x in mins_s.split("|")], dtype=np.int64
            )
        else:
            cur, seq = np.empty(0, dtype=np.int64), 0
        for pdf in pdfs:
            if len(pdf):
                cur = np.unique(
                    np.concatenate([cur, pdf["h"].to_numpy(np.int64)])
                )[:KMV_K]
        seq += 1
        mins_s = "|".join(str(int(x)) for x in cur)
        state.update((mins_s, seq))
        yield pd.DataFrame(
            [(key[0], seq, mins_s)], columns=["event_type", "seq", "mins"]
        )

    cells = events.select(
        F.col(group_col).alias("event_type"),
        md5_hash_long(F.col(key_col).cast("string"), "kmv").alias("h"),
    )
    return cells.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=KMV_STREAM_OUTPUT_SCHEMA,
        stateStructType=KMV_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def kmv_stream_estimates(emitted: DataFrame) -> DataFrame:
    """Decode the final streaming KMV state per group: n_mins and the
    k-th smallest hash (the serialized list is ascending, so the LAST
    element is u_k) feed the batch estimator formula verbatim."""
    from pyspark.sql import Window

    from ..operators.sketches import HASH_RANGE, KMV_K

    wseq = Window.partitionBy("event_type").orderBy(F.col("seq").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter(F.col("rn") == 1)
        .select("event_type", F.split("mins", "\\|").alias("arr"))
    )
    n_mins = F.size(F.col("arr"))
    u_k = F.element_at(F.col("arr"), -1).cast("long") / F.lit(HASH_RANGE)
    est = F.when(n_mins < KMV_K, n_mins.cast("double")).otherwise(
        (KMV_K - 1) / u_k
    )
    return final.select(
        "event_type", F.round(est, 2).alias("est_distinct")
    )


KMV_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mins", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

KMV_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("mins", T.StringType()),
    ]
)


BF_STREAM_SHARDS = 4  # bit-space shards; state per shard <= BLOOM_M/4 bits

BF_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bits", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

BF_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("bits", T.StringType()),
    ]
)


def bloom_stream(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """Streaming Bloom filter: maintains the SAME bitset as the batch
    op (operators/sketches.py bloom_prefilter) over a stream of set
    keys — set-bit union is associative and arrival-order-independent,
    so the decoded bitset EQUALS the batch ``bits`` frame exactly
    (test-proven), and therefore the pass/true/false-positive counts of
    any probe frame are identical between the two paths.

    Sharding: keys explode to their BLOOM_K bit positions JVM-side with
    the batch op's md5-salt family (no Python hashing); ``bit %
    BF_STREAM_SHARDS`` routes each position to one state key whose
    value is the sorted set-bit list for that shard — state is bounded
    by BLOOM_M bits TOTAL regardless of stream length, and the shards
    update in parallel.  Emissions are seq-stamped; ``bloom_stream_bits``
    decodes max-seq rows back to the bit frame.
    """
    from ..operators.sketches import _bloom_bits

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bits_s, seq = state.get
            cur = {int(b) for b in bits_s.split("|") if b}
        else:
            cur, seq = set(), 0
        for pdf in pdfs:
            cur.update(int(b) for b in pdf["bit"].to_numpy())
        seq += 1
        bits_s = "|".join(str(b) for b in sorted(cur))
        state.update((bits_s, seq))
        yield pd.DataFrame(
            [(int(key[0]), seq, bits_s)], columns=["shard", "seq", "bits"]
        )

    cells = keys.select(
        F.explode(_bloom_bits(F.col(key_col))).alias("bit")
    ).select(
        (F.col("bit") % BF_STREAM_SHARDS).cast("int").alias("shard"), "bit"
    )
    return cells.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=BF_STREAM_OUTPUT_SCHEMA,
        stateStructType=BF_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def bloom_stream_bits(emitted: DataFrame) -> DataFrame:
    """Decode the final streaming Bloom state: max-seq bit list per
    shard, exploded to one ``bit`` row each — the exact twin of the
    batch op's distinct-bits frame."""
    from pyspark.sql import Window

    wseq = Window.partitionBy("shard").orderBy(F.col("seq").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter((F.col("rn") == 1) & (F.col("bits") != ""))
        .select(F.explode(F.split("bits", "\\|")).alias("b"))
        .select(F.col("b").cast("int").alias("bit"))
    )


HLL_STREAM_SHARDS = 4  # bucket-space shards; state per shard <= 64 registers

HLL_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

HLL_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("regs", T.StringType()),
    ]
)


def hll_stream(
    events: DataFrame, key_col: str = "user_id", group_col: str = "event_type"
) -> DataFrame:
    """Streaming HyperLogLog: per-(group, bucket-shard) register-max
    state whose decoded estimate EQUALS the batch operator's
    (operators/sketches.py hll_distinct) register construction on the
    same data — register max is associative and arrival-order-
    independent, and bucket/rho compute JVM-side with the batch op's
    exact md5 'hll' salt and bin()-length rho (no Python hashing), so
    streaming/batch equality is exact, not approximate (test-proven).

    State per (group, shard): at most HLL_M / HLL_STREAM_SHARDS = 64
    'bucket:maxrho' entries serialized '|'-joined — bounded regardless
    of stream length; the shards update in parallel.  Emissions are
    seq-stamped; ``hll_stream_estimates`` decodes the max-seq row per
    shard and folds the batch estimator formula.
    """
    from ..functions.texts import md5_hash_long
    from ..operators.sketches import HLL_VBITS, HLL_VRANGE

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs_s, seq = state.get
            cur = {
                int(b): int(r)
                for b, r in (e.split(":") for e in regs_s.split("|") if e)
            }
        else:
            cur, seq = {}, 0
        for pdf in pdfs:
            for b, r in zip(
                pdf["bucket"].to_numpy(np.int64), pdf["rho"].to_numpy(np.int64)
            ):
                b, r = int(b), int(r)
                if r > cur.get(b, 0):
                    cur[b] = r
        seq += 1
        regs_s = "|".join(f"{b}:{cur[b]}" for b in sorted(cur))
        state.update((regs_s, seq))
        yield pd.DataFrame(
            [(key[0], key[1], seq, regs_s)],
            columns=["event_type", "shard", "seq", "regs"],
        )

    h = md5_hash_long(F.col(key_col).cast("string"), "hll")
    v = h % HLL_VRANGE
    cells = events.select(
        F.col(group_col).alias("event_type"),
        F.floor(h / HLL_VRANGE).cast("int").alias("bucket"),
        F.when(v == 0, HLL_VBITS + 1)
        .otherwise(F.lit(HLL_VBITS + 1) - F.length(F.bin(v)))
        .cast("int")
        .alias("rho"),
    ).withColumn(
        "shard", (F.col("bucket") % HLL_STREAM_SHARDS).cast("int")
    )
    return cells.groupBy("event_type", "shard").applyInPandasWithState(
        update,
        outputStructType=HLL_STREAM_OUTPUT_SCHEMA,
        stateStructType=HLL_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def hll_stream_estimates(emitted: DataFrame) -> DataFrame:
    """Decode the final streaming HLL state: max-seq row per
    (event_type, shard), registers exploded and folded through the
    batch estimator (exact-integer harmonic sum, zero-register count,
    no small-range correction — hll_distinct's formula verbatim)."""
    from pyspark.sql import Window

    from ..operators.sketches import HLL_EST_NUM, HLL_M, HLL_VBITS, HLL_VRANGE

    wseq = Window.partitionBy("event_type", "shard").orderBy(
        F.col("seq").desc()
    )
    final = (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.explode(F.split("regs", "\\|")).alias("e"),
        )
        .filter(F.col("e") != "")
        .select(
            "event_type",
            F.split("e", ":").getItem(1).cast("int").alias("mj"),
        )
    )
    g = final.groupBy("event_type").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(HLL_VBITS + 1) - F.col("mj")))
        .cast("long")
        .alias("s_present"),
    )
    zeros = F.lit(HLL_M) - F.col("n_regs")
    s = F.col("s_present") + zeros * F.lit(2 * HLL_VRANGE)
    return g.select(
        "event_type",
        F.col("n_regs").cast("bigint").alias("n_regs"),
        zeros.cast("bigint").alias("n_zero_regs"),
        F.round(F.lit(HLL_EST_NUM) / s, 2).alias("hll_est"),
    )


DRIFT_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("first_s", T.StringType()),
        T.StructField("last_s", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

DRIFT_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("object", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("first_s", T.StringType()),
        T.StructField("last_s", T.StringType()),
    ]
)


def schema_drift_stream(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Streaming schema-drift monitor: the stateful twin of
    operators/cdc_batch.py cdc_schema_drift_report — per (object,
    payload key) the record count and first/last event time, maintained
    incrementally over the live CDC stream so an operator sees a NEW
    column (or one going stale) within a micro-batch of it appearing
    instead of after a batch audit.

    State per (object, key): (count, min_ts, max_ts) — all three merge
    by sum/min/max, associative and arrival-order-independent, so the
    max-seq decode EQUALS the batch report on the same lines exactly
    (test-proven).  State is bounded by tables x schema width, not by
    stream length.  Timestamps normalize to the ONE fixed-width
    'yyyy-MM-dd HH:mm:ss.SSS' layout before entering state, so
    lexicographic min/max IS chronological min/max by construction.
    """
    from ..sources.cdc_schema import parse_envelope

    env = parse_envelope(lines, line_col)
    # ADVICE r6: parse_envelope emits mixed 'ss' vs 'ss.SSS' layouts,
    # which stay lexicographically chronological only by the accident
    # '.' < digit.  Re-render to ONE fixed-width layout JVM-side before
    # the string enters stream state, so lexicographic min/max is
    # chronological by construction for any envelope layout (a future
    # ISO-'T' or timezone-suffixed producer included).
    ts_norm = F.date_format(
        F.to_timestamp("update_date_raw"), "yyyy-MM-dd HH:mm:ss.SSS"
    )
    keys = env.filter(F.col("payload_json").isNotNull()).select(
        "object",
        ts_norm.alias("ts"),
        F.explode(F.json_object_keys(F.col("payload_json"))).alias("key"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, first_s, last_s, seq = state.get
        else:
            n, first_s, last_s, seq = 0, None, None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf["ts"].dropna()
            n += len(pdf)
            if len(ts):
                lo, hi = ts.min(), ts.max()
                first_s = lo if first_s is None else min(first_s, lo)
                last_s = hi if last_s is None else max(last_s, hi)
        seq += 1
        state.update((n, first_s, last_s, seq))
        yield pd.DataFrame(
            [(key[0], key[1], seq, n, first_s, last_s)],
            columns=["object", "key", "seq", "n", "first_s", "last_s"],
        )

    return keys.groupBy("object", "key").applyInPandasWithState(
        update,
        outputStructType=DRIFT_STREAM_OUTPUT_SCHEMA,
        stateStructType=DRIFT_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def schema_drift_stream_report(emitted: DataFrame) -> DataFrame:
    """Decode the final monitor state: max-seq row per (object, key),
    shaped exactly like the batch report (n_records, first/last_seen)."""
    from pyspark.sql import Window

    wseq = Window.partitionBy("object", "key").orderBy(F.col("seq").desc())
    return (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter(F.col("rn") == 1)
        .select(
            "object",
            "key",
            F.col("n").cast("bigint").alias("n_records"),
            F.to_timestamp("first_s").alias("first_seen"),
            F.to_timestamp("last_s").alias("last_seen"),
        )
    )


MG_K = 16  # Misra-Gries counter budget per shard
MG_SHARDS = 4

MG_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)

MG_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("counters", T.StringType()),
    ]
)


def misra_gries_stream(
    events: DataFrame, key_col: str = "user_id", group_col: str = "event_type"
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters: per-(group, key-shard) MG(k)
    state — a DIFFERENT guarantee class from the exact-equality twins
    (KMV/CMS/Bloom/HLL): MG is arrival-order-DEPENDENT, so no batch
    equality is possible; what it guarantees instead is
    true_count - n_shard/(k+1) <= estimate <= true_count, and every key
    with true count > n_shard/(k+1) survives.  Sharding by key hash
    keeps each key's whole mass in ONE shard, so the per-shard bound IS
    the key's bound (no cross-shard error accumulation) — the honest
    way to parallelize MG (test-pinned invariants).

    State per (group, shard): at most MG_K 'key:count' counters plus the
    processed-count n_seen that prices the bound — bounded regardless of
    stream length.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counters_s, n_seen, seq = state.get
            cur = {
                e.split(":", 1)[0]: int(e.rsplit(":", 1)[1])
                for e in counters_s.split("|")
                if e
            }
        else:
            cur, n_seen, seq = {}, 0, 0
        for pdf in pdfs:
            # Delimiter safety (ADVICE r6): state serializes counters as
            # 'key:count' joined by '|', so a raw ':' in a key truncates
            # on restore and a raw '|' corrupts the whole counter set.
            # Percent-encode the three structural chars on arrival; the
            # topk decoder reverses it, so emitted keys are the originals.
            ks = (
                pdf["k"]
                .astype(str)
                .str.replace("%", "%25", regex=False)
                .str.replace(":", "%3A", regex=False)
                .str.replace("|", "%7C", regex=False)
            )
            for k in ks:
                n_seen += 1
                if k in cur:
                    cur[k] += 1
                elif len(cur) < MG_K:
                    cur[k] = 1
                else:  # decrement-all step
                    for c in list(cur):
                        cur[c] -= 1
                        if cur[c] == 0:
                            del cur[c]
        seq += 1
        counters_s = "|".join(f"{k}:{cur[k]}" for k in sorted(cur))
        state.update((counters_s, n_seen, seq))
        yield pd.DataFrame(
            [(key[0], key[1], seq, n_seen, counters_s)],
            columns=["event_type", "shard", "seq", "n_seen", "counters"],
        )

    from ..functions.texts import md5_hash_long

    cells = events.select(
        F.col(group_col).alias("event_type"),
        F.col(key_col).cast("string").alias("k"),
        (md5_hash_long(F.col(key_col).cast("string"), "mg") % MG_SHARDS)
        .cast("int")
        .alias("shard"),
    )
    return cells.groupBy("event_type", "shard").applyInPandasWithState(
        update,
        outputStructType=MG_STREAM_OUTPUT_SCHEMA,
        stateStructType=MG_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def misra_gries_stream_topk(emitted: DataFrame, topn: int = 10) -> DataFrame:
    """Decode the final MG state: max-seq row per (group, shard),
    counters exploded, global top-N per group by estimated count with
    each key's shard-priced error bound n_shard/(MG_K + 1)."""
    from pyspark.sql import Window

    wseq = Window.partitionBy("event_type", "shard").orderBy(
        F.col("seq").desc()
    )
    final = (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_seen",
            F.explode(F.split("counters", "\\|")).alias("e"),
        )
        .filter(F.col("e") != "")
        .select(
            "event_type",
            # reverse the arrival-side percent-encoding (%25 LAST so a
            # literal '%25' in a key survives the roundtrip)
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.split("e", ":").getItem(0), "%3A", ":"
                    ),
                    "%7C",
                    "|",
                ),
                "%25",
                "%",
            ).alias("key"),
            F.split("e", ":").getItem(1).cast("long").alias("est_count"),
            (F.col("n_seen") / (MG_K + 1)).alias("max_undercount"),
        )
    )
    wtop = Window.partitionBy("event_type").orderBy(
        F.col("est_count").desc(), F.col("key").asc()
    )
    return (
        final.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= topn)
        .orderBy("event_type", "rank")
    )


DDS_STREAM_SHARDS = 4

DDS_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

DDS_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("counters", T.StringType()),
    ]
)


def ddsketch_stream(rows: DataFrame, cents_col: str = "cents") -> DataFrame:
    """Streaming DDSketch: per-bucket-shard log-gamma counter state whose
    decoded quantile estimates EQUAL the batch operator's
    (operators/sketches.py ddsketch_quantiles) bucket construction on
    the same data — bucket counters are PURE SUMS (associative,
    order-independent), and the bucket index computes JVM-side with the
    batch op's exact pico-rounded ln-ratio expression, so streaming /
    batch equality is exact (test-proven).

    State per shard: at most ~900/DDS_STREAM_SHARDS 'bucket:count'
    entries — bounded by the VALUE RANGE, not the stream length (the
    relative-error guarantee's price is log-many buckets, which is the
    whole point at 100 TB).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counters_s, seq = state.get
            cur = {
                int(e.split(":")[0]): int(e.split(":")[1])
                for e in counters_s.split("|")
                if e
            }
        else:
            cur, seq = {}, 0
        for pdf in pdfs:
            for b in pdf["b"].to_numpy(np.int64):
                cur[int(b)] = cur.get(int(b), 0) + 1
        seq += 1
        counters_s = "|".join(f"{b}:{cur[b]}" for b in sorted(cur))
        state.update((counters_s, seq))
        yield pd.DataFrame(
            [(key[0], seq, counters_s)],
            columns=["shard", "seq", "counters"],
        )

    lng = 0.019802627296178876  # ln(1.02) — the batch op's literal
    b = F.ceil(
        F.round(F.log(F.col(cents_col).cast("double")) / lng, 9)
    ).cast("long")
    # Domain contract (ADVICE r6): DDSketch is defined on positive reals.
    # F.log yields NULL for cents <= 0 and the update kernel's
    # to_numpy(int64) would raise on it — a single non-positive value
    # must not be a poison message that kills the streaming query, so
    # filter the domain JVM-side before the stateful groupBy.  The batch
    # twin parks such rows in a null bucket instead; the proven
    # stream/batch equality is on the positive domain (order cents are
    # always > 0), where both paths see identical rows.
    cells = rows.filter(F.col(cents_col).cast("double") > 0).select(
        b.alias("b"),
        (b % DDS_STREAM_SHARDS).cast("int").alias("shard"),
    )
    return cells.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=DDS_STREAM_OUTPUT_SCHEMA,
        stateStructType=DDS_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def ddsketch_stream_quantiles(emitted: DataFrame, qs=(50, 90, 99)) -> DataFrame:
    """Decode the final streaming DDSketch: max-seq row per shard,
    counters exploded and folded through the batch estimator (smallest
    bucket with 100*cum >= q*n; estimate 2*gamma^b/(gamma+1))."""
    from pyspark.sql import Window

    from ..operators.sketches import DD_GAMMA

    lng = 0.019802627296178876
    wseq = Window.partitionBy("shard").orderBy(F.col("seq").desc())
    buckets = (
        emitted.withColumn("rn", F.row_number().over(wseq))
        .filter(F.col("rn") == 1)
        .select(F.explode(F.split("counters", "\\|")).alias("e"))
        .filter(F.col("e") != "")
        .select(
            F.split("e", ":").getItem(0).cast("long").alias("b"),
            F.split("e", ":").getItem(1).cast("long").alias("c"),
        )
    )
    tot = buckets.agg(F.sum("c").alias("n"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.crossJoin(F.broadcast(tot)).withColumn(
        "cum", F.sum("c").over(w_cum)
    )
    qdf = cum.sparkSession.createDataFrame([(q,) for q in qs], "q int")
    pick = (
        cum.join(F.broadcast(qdf), 100 * F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("b").alias("bq"))
    )
    est = 2.0 * F.exp(F.col("bq").cast("double") * lng) / (1.0 + DD_GAMMA)
    return pick.select(
        "q", F.round(est / 100.0, 2).alias("dd_estimate")
    ).orderBy("q")
