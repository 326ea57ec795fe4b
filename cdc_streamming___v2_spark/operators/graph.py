"""Graph analytics over the relational testdata (DRIVER surface).

``pagerank_nations``: weighted PageRank over the nation->nation trade
graph (supplier nation -> customer nation, edge weight = lineitem count
between them).  Complements the iterative tier (k-means lineage in
operators/similarity.py, label propagation in operators/pipeline_ops.py)
with the third classic fixed-point shape: power iteration over an edge
list.

Scale design: the expensive part is building the WEIGHTED EDGE LIST — a
lineitem-sized multi-join that Catalyst plans with broadcast dims (nation,
supplier, customer) and one shuffle agg down to edge cardinality.  Each
power-iteration round is then one equi-join of the edge list against the
rank vector plus a groupBy-sum at node cardinality — at 100 TB the edge
list is hash-partitioned by src once and every round reuses that
partitioning; rank/dangling terms are node-sized (broadcast).  Iteration
count is a fixed plan constant (no driver feedback loop), so the lineage
is a static ITERS-deep DAG, same pattern the deterministic k-means chain
uses.  Dangling mass (nations with no outgoing trade) is redistributed
uniformly — the standard correction — via a 1-row aggregate joined back
broadcast.

Float parity: sums reassociate under partitioning, but reassociation noise
(~1e-16 relative) sits far below the round(6) output contract; the DuckDB
oracle replicates the exact iteration chain (unrolled CTEs, same damping
arithmetic), as with the k-means oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

PR_DAMPING = 0.85
PR_ITERS = 3
PR_N = 25  # nations are a fixed-cardinality dimension (TPC-H invariant)


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_nation, dst_nation, w): supplier nation -> customer nation,
    weighted by the number of lineitems shipped between them."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping PR_DAMPING, PR_ITERS fixed rounds) over
    the nation trade graph; returns (nationkey, n_name, pagerank) rounded
    to 6 — nations that absorb trade from many well-connected exporters
    rank highest."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # deliberately NOT checkpointed (measured round 8): the fixed-round
    # power iteration compiles into one job where ReusedExchange already
    # deduplicates the edge build across iterations — eager checkpoints
    # on ep/outw ADDED blocking materialization passes (solo floor 0.96
    # -> 2.29 s with them; reverted)
    edges = _trade_edges(spark, sf_dir)
    # transition probability: edge weight / source out-weight
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ep = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    r = nodes.withColumn("r", F.lit(1.0 / PR_N))
    for _ in range(PR_ITERS):
        contrib = (
            ep.join(r, ep.src == r.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("r")).alias("c"))
        )
        # dangling mass: rank sitting on nodes with no outgoing edges
        dangle = (
            r.join(outw, r.node == outw.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        r = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangle))
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMPING) / PR_N)
                    + F.lit(PR_DAMPING)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / PR_N)
                ).alias("r"),
            )
            # deliberately NOT per-round checkpointed either (measured
            # r11): with ep/outw lazy, each round's eager cut re-executes
            # the edge build as a separate job (cross-job plans cannot
            # share ReusedExchange) — solo 1.04 -> 2.74 s; reverted. The
            # 270-Exchange unrolled plan is the cheaper evil here.
        )
    return (
        r.join(n, r.node == n.n_nationkey)
        .select(
            F.col("n_nationkey").cast("bigint").alias("nationkey"),
            "n_name",
            F.round("r", 6).alias("pagerank"),
        )
    )


def _pr_oracle() -> str:
    ctes = [
        """edges AS MATERIALIZED (
            SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                   count(*) AS w
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        )""",
        """outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src)""",
        """ep AS MATERIALIZED (SELECT e.src, e.dst, e.w * 1.0 / o.ow AS p
                  FROM edges e JOIN outw o ON e.src = o.src)""",
        """nodes AS (SELECT n_nationkey AS node FROM nation)""",
        f"""r0 AS (SELECT node, 1.0 / {PR_N} AS r FROM nodes)""",
    ]
    for i in range(1, PR_ITERS + 1):
        prev = f"r{i - 1}"
        ctes.append(f"""c{i} AS (
            SELECT ep.dst, sum(ep.p * r.r) AS c
            FROM ep JOIN {prev} r ON ep.src = r.node
            GROUP BY ep.dst
        )""")
        ctes.append(f"""d{i} AS (
            SELECT coalesce(sum(r.r), 0.0) AS dm
            FROM {prev} r
            WHERE r.node NOT IN (SELECT src FROM outw)
        )""")
        ctes.append(f"""r{i} AS (
            SELECT n.node,
                   {(1.0 - PR_DAMPING) / PR_N!r}
                   + {PR_DAMPING!r} * (coalesce(c.c, 0.0) + d.dm / {PR_N})
                       AS r
            FROM nodes n
            LEFT JOIN c{i} c ON n.node = c.dst
            CROSS JOIN d{i} d
        )""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey, n.n_name,
               round(r.r, 6) AS pagerank
        FROM r{PR_ITERS} r JOIN nation n ON r.node = n.n_nationkey
    """


TRIANGLE_MIN_W = 50  # edge weight floor: keep the graph non-trivial


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the (undirected) nation trade graph — the
    classic clustering-coefficient building block, computed the
    distributed way: orient every edge low->high, then join twice so each
    triangle {a<b<c} is generated EXACTLY once as (a-b) x (b-c) checked
    against (a-c).  Never enumerates all 3-paths of the undirected graph
    (which would count each triangle 6x and explode on high-degree hubs).

    Only edges with weight >= TRIANGLE_MIN_W participate (a thresholded
    co-trade graph; on the dense nation graph this is what leaves
    structure).  Output: per-nation triangle membership count + the global
    triangle total alongside.

    Scale: two hash joins on node keys over the oriented edge list; the
    standard hub mitigation (orient by degree instead of id) drops in
    without changing the plan shape.
    """
    e = _trade_edges(spark, sf_dir).filter(F.col("w") >= TRIANGLE_MIN_W)
    # undirected edge set, oriented low -> high, deduped; materialized
    # once (measured round 8: 10x 2.70 -> 1.84 s with sf0.1 inside noise
    # of the pin) — it sits on all THREE triangle self-join sides, and
    # at 10x exchange reuse did not fully cover the references
    und = (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("nationkey"))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    total = tri.agg(F.count(F.lit(1)).cast("bigint").alias("total_triangles"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_node.join(n, per_node.nationkey == n.n_nationkey)
        .crossJoin(F.broadcast(total))
        .select(
            F.col("nationkey").cast("bigint").alias("nationkey"),
            "n_name",
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            "total_triangles",
        )
    )


def _tri_oracle() -> str:
    return f"""
        WITH edges AS (
            SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM edges WHERE src <> dst AND w >= {TRIANGLE_MIN_W}
        ),
        tri AS MATERIALIZED (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM und e1
            JOIN und e2 ON e1.v = e2.u
            JOIN und e3 ON e1.u = e3.u AND e2.v = e3.v
        ),
        pn AS (
            SELECT nationkey, count(*) AS n_triangles
            FROM (SELECT a AS nationkey FROM tri
                  UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
            GROUP BY 1
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total_triangles FROM tri)
        SELECT CAST(pn.nationkey AS BIGINT) AS nationkey, n.n_name,
               CAST(pn.n_triangles AS BIGINT) AS n_triangles,
               tot.total_triangles
        FROM pn JOIN nation n ON pn.nationkey = n.n_nationkey
        CROSS JOIN tot
    """


BFS_SOURCE = 0        # start nation (ALGERIA)
BFS_ROUNDS = 3        # fixed frontier-expansion rounds (static DAG depth)
BFS_THR_DIVISOR = 500  # edge weight floor = lineitem_count / divisor


def bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distance over the thresholded undirected trade
    graph — the reachability primitive (supply-chain blast radius: how many
    trade hops from nation BFS_SOURCE is everyone?).

    The edge-weight floor scales with the data (total lineitems /
    BFS_THR_DIVISOR) so the graph keeps comparable sparsity at every SF.
    BFS as BFS is run on a cluster: a dist vector (node, d), BFS_ROUNDS
    relaxation rounds of join-edges + groupBy-min — each round one equi-join
    partitioned by node, edge list hash-partitioned once and reused, rank
    vector node-sized. Fixed round count keeps the lineage a static DAG
    (same pattern as pagerank); unreached nodes after BFS_ROUNDS are
    reported hop = -1 (the "beyond horizon" marker). Oracle: recursive CTE
    enumerating paths up to BFS_ROUNDS, min hop per node.
    """
    li_n = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    thr = li_n.agg(
        F.floor(F.count(F.lit(1)) / BFS_THR_DIVISOR).cast("long").alias("thr")
    )
    e = (
        _trade_edges(spark, sf_dir)
        .crossJoin(F.broadcast(thr))
        .filter((F.col("w") >= F.col("thr")) & (F.col("src") != F.col("dst")))
    )
    # deliberately NOT checkpointed (measured round 8): the fixed-round
    # relaxation compiles into one job where exchange reuse already
    # deduplicates the edge build — an eager checkpoint ADDED a blocking
    # materialization pass (10x: 0.90 -> 2.14 s with it; reverted)
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dist = n.select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == BFS_SOURCE, F.lit(0))
        .otherwise(F.lit(None))
        .cast("int")
        .alias("d"),
    )
    for _ in range(BFS_ROUNDS):
        relaxed = (
            und.join(dist, und.src == dist.node)
            .filter(F.col("d").isNotNull())
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("d") + 1).alias("nd"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select("node", F.least("d", "nd").cast("int").alias("d"))
            # dist is deliberately NOT per-round checkpointed either
            # (measured r11): with und lazy, each round's eager cut
            # re-executes the edge build as a separate job (cross-job
            # plans cannot share ReusedExchange) — solo 0.65 -> 2.40 s;
            # reverted. Same verdict as the und checkpoint above.
        )
    return (
        dist.join(n, dist.node == n.n_nationkey)
        .select(
            F.col("node").cast("bigint").alias("nationkey"),
            "n_name",
            F.coalesce("d", F.lit(-1)).cast("int").alias("hops"),
        )
    )


def _bfs_oracle() -> str:
    return f"""
        WITH RECURSIVE edges0 AS MATERIALIZED (
            SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        thr AS (
            SELECT count(*) // {BFS_THR_DIVISOR} AS thr FROM lineitem
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM edges0, thr
                WHERE w >= thr.thr AND src <> dst
                UNION ALL
                SELECT dst, src FROM edges0, thr
                WHERE w >= thr.thr AND src <> dst
            )
        ),
        walk(node, hops) AS (
            SELECT {BFS_SOURCE}, 0
            UNION ALL
            SELECT e.dst, w.hops + 1
            FROM walk w JOIN und e ON e.src = w.node
            WHERE w.hops < {BFS_ROUNDS}
        ),
        reach AS (SELECT node, min(hops) AS hops FROM walk GROUP BY node)
        SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey, n.n_name,
               CAST(coalesce(r.hops, -1) AS INT) AS hops
        FROM nation n LEFT JOIN reach r ON n.n_nationkey = r.node
    """


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the nation trade graph (Newman 2002): the
    Pearson correlation between source out-degree and destination
    in-degree across directed edges, plus the degree-distribution moments
    — do high-degree trade hubs ship to other hubs, or to the periphery?

    Scale: degrees are two tiny per-node aggregates of the edge list
    (broadcast back onto edges); the correlation is one map-side-combined
    aggregate over edges. The edge list itself comes from the same
    aggregated join pipeline as pagerank (never the raw fact table twice).
    """
    # materialized once: e feeds the two degree aggregates AND the
    # correlation join — un-materialized, the 4-way lineitem edge build
    # ran three times (the multi-consumer recompute class, round 8)
    e = _trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("kout"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).cast("double").alias("kin"))
    j = e.join(F.broadcast(outd), "src").join(F.broadcast(ind), "dst")
    # the nation graph can be COMPLETE (every nation trades with every
    # other) — degrees are then constant and Pearson r is undefined;
    # try_divide yields NULL there (ANSI-safe), matching DuckDB's corr
    r = F.expr(
        "try_divide(covar_samp(kout, kin),"
        " stddev_samp(kout) * stddev_samp(kin))"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.round(r, 4).alias("assortativity"),
        F.round(F.avg("kout"), 4).alias("mean_out_degree"),
        F.round(F.max("kout"), 4).alias("max_out_degree"),
        F.round(F.avg("kin"), 4).alias("mean_in_degree"),
        F.round(F.max("kin"), 4).alias("max_in_degree"),
    )


_EDGES_SQL = """
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
"""


def _assort_oracle() -> str:
    return f"""
    WITH e AS MATERIALIZED ({_EDGES_SQL}),
    outd AS (SELECT src, CAST(count(*) AS DOUBLE) AS kout FROM e GROUP BY 1),
    ind AS (SELECT dst, CAST(count(*) AS DOUBLE) AS kin FROM e GROUP BY 1),
    j AS (SELECT o.kout, i.kin FROM e
          JOIN outd o USING (src) JOIN ind i USING (dst))
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           round(corr(kout, kin), 4) AS assortativity,
           round(avg(kout), 4) AS mean_out_degree,
           round(max(kout), 4) AS max_out_degree,
           round(avg(kin), 4) AS mean_in_degree,
           round(max(kin), 4) AS max_in_degree
    FROM j
    """


def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source reachability via Spark 4's NATIVE recursive CTE
    (``WITH RECURSIVE`` / UnionLoop) over the thresholded trade graph:
    min hop distance AND walk count within BFS_ROUNDS hops per nation —
    the SQL-surface twin of bfs_hops' DataFrame relaxation loop, proving
    the engine's SQL entry point covers iterative queries too.

    Scale note: recursive-CTE path enumeration is exponential in dense
    graphs — it is the right tool for dimension-sized graphs reached
    from SQL (this one is nation-cardinality); the DataFrame loop in
    bfs_hops (per-round join + groupBy-min) remains the 100-TB path.
    """
    li_n = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    thr = li_n.agg(
        F.floor(F.count(F.lit(1)) / BFS_THR_DIVISOR).cast("long").alias("thr")
    )
    e = (
        _trade_edges(spark, sf_dir)
        .crossJoin(F.broadcast(thr))
        .filter((F.col("w") >= F.col("thr")) & (F.col("src") != F.col("dst")))
    )
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    und.createOrReplaceTempView("recur_reach_edges")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n.createOrReplaceTempView("recur_reach_nations")
    return spark.sql(f"""
        WITH RECURSIVE walk(node, hops) AS (
            SELECT CAST({BFS_SOURCE} AS BIGINT), 0
            UNION ALL
            SELECT CAST(e.dst AS BIGINT), w.hops + 1
            FROM walk w JOIN recur_reach_edges e ON e.src = w.node
            WHERE w.hops < {BFS_ROUNDS}
        ),
        reach AS (
            SELECT node, MIN(hops) AS hops,
                   CAST(COUNT(*) AS BIGINT) AS n_walks
            FROM walk GROUP BY node
        )
        SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey, n.n_name,
               CAST(COALESCE(r.hops, -1) AS INT) AS hops,
               COALESCE(r.n_walks, CAST(0 AS BIGINT)) AS n_walks
        FROM recur_reach_nations n LEFT JOIN reach r ON n.n_nationkey = r.node
    """)


def _recursive_reach_oracle() -> str:
    return f"""
        WITH RECURSIVE edges0 AS MATERIALIZED (
            SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        thr AS (
            SELECT count(*) // {BFS_THR_DIVISOR} AS thr FROM lineitem
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM edges0, thr
                WHERE w >= thr.thr AND src <> dst
                UNION ALL
                SELECT dst, src FROM edges0, thr
                WHERE w >= thr.thr AND src <> dst
            )
        ),
        walk(node, hops) AS (
            SELECT CAST({BFS_SOURCE} AS BIGINT), 0
            UNION ALL
            SELECT CAST(e.dst AS BIGINT), w.hops + 1
            FROM walk w JOIN und e ON e.src = w.node
            WHERE w.hops < {BFS_ROUNDS}
        ),
        reach AS (SELECT node, min(hops) AS hops,
                         CAST(count(*) AS BIGINT) AS n_walks
                  FROM walk GROUP BY node)
        SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey, n.n_name,
               CAST(coalesce(r.hops, -1) AS INT) AS hops,
               coalesce(r.n_walks, 0) AS n_walks
        FROM nation n LEFT JOIN reach r ON n.n_nationkey = r.node
    """


# --- round-5 graph additions -------------------------------------------------


def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per nation over the thresholded trade
    graph (same TRIANGLE_MIN_W universe as triangle_count): cc(v) =
    2 * triangles(v) / (deg(v) * (deg(v) - 1)), 0 where degree < 2 — the
    per-node "how clique-like is my neighborhood" score that triangle
    counting exists to feed.

    Scale: reuses the oriented two-join triangle enumeration (each
    triangle generated once, no 6x 3-path blowup) plus one degree
    aggregate; everything joins on node keys. All 25 nations appear (zero
    rows for isolated nodes), so the output is dimension-sized.
    """
    e = _trade_edges(spark, sf_dir).filter(F.col("w") >= TRIANGLE_MIN_W)
    # deliberately NOT checkpointed (measured round 8): the five und
    # references compile into one job where ReusedExchange deduplicates
    # the edge build — an eager checkpoint doubled the solo floor
    # (0.50 pin -> 1.08 s with it; reverted)
    und = (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nb = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = nb.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        n.join(deg, n.n_nationkey == deg.node, "left")
        .join(per_node, n.n_nationkey == per_node.node, "left")
    )
    d = F.coalesce(F.col("deg"), F.lit(0))
    t = F.coalesce(F.col("t"), F.lit(0))
    cc = F.when(d >= 2, 2.0 * t / (d * (d - 1))).otherwise(F.lit(0.0))
    return j.select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        "n_name",
        d.cast("bigint").alias("degree"),
        t.cast("bigint").alias("n_triangles"),
        F.round(cc, 6).alias("local_cc"),
    )


def _cc_oracle() -> str:
    return f"""
        WITH edges AS ({_EDGES_SQL}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM edges WHERE src <> dst AND w >= {TRIANGLE_MIN_W}
        ),
        nb AS (SELECT u AS node, v AS nbr FROM und
               UNION ALL SELECT v, u FROM und),
        deg AS (SELECT node, count(*) AS deg FROM nb GROUP BY node),
        tri AS MATERIALIZED (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM und e1
            JOIN und e2 ON e1.v = e2.u
            JOIN und e3 ON e1.u = e3.u AND e2.v = e3.v
        ),
        pn AS (
            SELECT node, count(*) AS t
            FROM (SELECT a AS node FROM tri
                  UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
            GROUP BY node
        )
        SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey, n.n_name,
               CAST(coalesce(d.deg, 0) AS BIGINT) AS degree,
               CAST(coalesce(p.t, 0) AS BIGINT) AS n_triangles,
               round(CASE WHEN coalesce(d.deg, 0) >= 2
                          THEN 2.0 * coalesce(p.t, 0)
                               / (d.deg * (d.deg - 1))
                          ELSE 0.0 END, 6) AS local_cc
        FROM nation n
        LEFT JOIN deg d ON n.n_nationkey = d.node
        LEFT JOIN pn p  ON n.n_nationkey = p.node
    """


def _scaled_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected trade graph at the SF-scaled weight floor (the bfs_hops
    threshold: total lineitems / BFS_THR_DIVISOR) — keeps comparable
    sparsity at every scale factor."""
    li_n = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    thr = li_n.agg(
        F.floor(F.count(F.lit(1)) / BFS_THR_DIVISOR).cast("long").alias("thr")
    )
    e = (
        _trade_edges(spark, sf_dir)
        .crossJoin(F.broadcast(thr))
        .filter((F.col("w") >= F.col("thr")) & (F.col("src") != F.col("dst")))
    )
    # materialized here so EVERY consumer reuses one edge build — the
    # nb unions / self-joins / anti-joins downstream reference und 2-5
    # times each, and un-materialized each reference re-ran the 4-way
    # lineitem join (the Spark-side twin of the DuckDB CTE-inlining
    # lesson below)
    return (
        e.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


# edges0/und/nb are referenced several times by every consumer below;
# DuckDB inlines CTEs by default, which re-evaluates the whole
# lineitem-join edge construction PER REFERENCE — and per-iteration CTE
# chains (lpa_communities' l1..l3) multiply the reference count
# exponentially (observed: >80 GB temp-disk exhaustion at sf0.1).
# MATERIALIZED pins each to one evaluation (hits_bipartite precedent).
_SCALED_UND_SQL = f"""
        edges0 AS MATERIALIZED ({_EDGES_SQL}),
        thr AS (SELECT count(*) // {BFS_THR_DIVISOR} AS thr FROM lineitem),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM edges0, thr WHERE w >= thr.thr AND src <> dst
        ),
        nb AS MATERIALIZED (SELECT u AS node, v AS nbr FROM und
               UNION ALL SELECT v, u FROM und)
"""


def adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the trade graph: for every
    NON-adjacent nation pair sharing at least one trade partner, score =
    sum over common neighbors z of 1/ln(deg(z)) — the classic
    common-neighbor predictor where rare intermediaries count more
    (Adamic & Adar 2003, public algorithm).

    deg(z) >= 2 for every common neighbor by construction (z neighbors
    both endpoints), so 1/ln(deg) is always finite — no epsilon needed.

    Scale: candidates come from the neighbor-list self-join keyed on the
    shared neighbor — volume is sum(deg(z)^2), governed by hub degree, the
    same quantity every production link-predictor caps (drop
    super-connector intermediaries above a degree ceiling, which only
    removes near-zero score terms); never an all-pairs product.  The
    existing-edge exclusion is a broadcast anti-join on the oriented edge
    list.
    """
    und = _scaled_und(spark, sf_dir)
    nb = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).union(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = nb.groupBy("nbr").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("nbr").alias("z"), "deg"
    )
    a, b = nb.alias("a"), nb.alias("b")
    cand = (
        a.join(b, (F.col("a.nbr") == F.col("b.nbr"))
               & (F.col("a.node") < F.col("b.node")))
        .join(F.broadcast(deg), F.col("a.nbr") == F.col("z"))
        .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum(1.0 / F.log(F.col("deg"))).alias("aa"),
        )
    )
    non_edges = cand.join(und, ["u", "v"], "left_anti")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("u"), F.col("n_name").alias("nation_u")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("v"), F.col("n_name").alias("nation_v")
    )
    return (
        non_edges.join(F.broadcast(n1), "u")
        .join(F.broadcast(n2), "v")
        .select(
            F.col("u").cast("bigint").alias("u"),
            F.col("v").cast("bigint").alias("v"),
            "nation_u",
            "nation_v",
            "n_common",
            F.round("aa", 6).alias("aa_score"),
        )
    )


def _aa_oracle() -> str:
    return f"""
        WITH {_SCALED_UND_SQL},
        deg AS (SELECT nbr, count(*) AS deg FROM nb GROUP BY nbr),
        cand AS (
            SELECT a.node AS u, b.node AS v,
                   CAST(count(*) AS BIGINT) AS n_common,
                   sum(1.0 / ln(d.deg)) AS aa
            FROM nb a
            JOIN nb b ON a.nbr = b.nbr AND a.node < b.node
            JOIN deg d ON a.nbr = d.nbr
            GROUP BY 1, 2
        ),
        non_edges AS (
            SELECT c.* FROM cand c
            LEFT JOIN und e ON c.u = e.u AND c.v = e.v
            WHERE e.u IS NULL
        )
        SELECT CAST(ne.u AS BIGINT) AS u, CAST(ne.v AS BIGINT) AS v,
               nu.n_name AS nation_u, nv.n_name AS nation_v,
               ne.n_common, round(ne.aa, 6) AS aa_score
        FROM non_edges ne
        JOIN nation nu ON ne.u = nu.n_nationkey
        JOIN nation nv ON ne.v = nv.n_nationkey
    """


LPA_ITERS = 3


def lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (synchronous, LPA_ITERS fixed
    rounds) over the SF-thresholded trade graph: every node starts as its
    own community; each round it adopts the most frequent label among its
    neighbors, ties broken by smallest label — fully deterministic, unlike
    the textbook's random tie-breaks, so the oracle replicates it exactly.
    Complements connected components (pipeline_ops pointer-doubling):
    LPA splits dense graphs into communities where CC would return one
    blob.

    Scale: each round is one edge-list join against the node-sized label
    frame + a (node, label)-keyed count + an argmax — the argmax is
    max(struct(cnt, -label)) inside the SAME groupBy (no second shuffle,
    no per-node window).  Fixed round count = static DAG, the
    pagerank/k-means lineage pattern.
    """
    und = _scaled_und(spark, sf_dir)
    nb = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .union(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        # one-shot materialization: each LPA round references the tiny
        # edge frame, not a re-executed lineitem edge build (house
        # pattern, see k_core_peel)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nodes = n.select(F.col("n_nationkey").cast("long").alias("node"))
    lab = nodes.withColumn("label", F.col("node"))
    for _ in range(LPA_ITERS):
        votes = (
            nb.join(lab.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        picked = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))
                 .alias("m"))
            .select("node", (-F.col("m.nl")).alias("new_label"))
        )
        lab = (
            nodes.join(picked, "node", "left")
            .join(lab, "node")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            # per-round lineage cut: each round references lab TWICE
            # (votes + carry-forward), so the un-truncated tree doubles
            # per round (measured r11: 2,378-line / 130-Exchange plan for
            # a node-sized frame; checkpointed: ~1s faster solo, plan
            # collapses to the single-round shape)
            .localCheckpoint(eager=True)
        )
    size = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return (
        lab.join(n, lab.node == n.n_nationkey)
        .join(size, "label")
        .select(
            F.col("node").cast("bigint").alias("nationkey"),
            "n_name",
            F.col("label").cast("bigint").alias("community"),
            "community_size",
        )
    )


def _lpa_oracle() -> str:
    ctes = [
        _SCALED_UND_SQL.strip(),
        "nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, LPA_ITERS + 1):
        prev = f"l{i - 1}"
        ctes.append(f"""v{i} AS (
            SELECT nb.node, l.label, count(*) AS cnt
            FROM nb JOIN {prev} l ON nb.nbr = l.node
            GROUP BY 1, 2
        )""")
        ctes.append(f"""p{i} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY cnt DESC, label ASC) AS rn
                FROM v{i}) WHERE rn = 1
        )""")
        ctes.append(f"""l{i} AS (
            SELECT n.node, coalesce(p.label, l.label) AS label
            FROM nodes n
            LEFT JOIN p{i} p ON n.node = p.node
            JOIN {prev} l ON n.node = l.node
        )""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined},
        size AS (SELECT label, CAST(count(*) AS BIGINT) AS community_size
                 FROM l{LPA_ITERS} GROUP BY label)
        SELECT CAST(l.node AS BIGINT) AS nationkey, n.n_name,
               CAST(l.label AS BIGINT) AS community, s.community_size
        FROM l{LPA_ITERS} l
        JOIN nation n ON l.node = n.n_nationkey
        JOIN size s ON l.label = s.label
    """



BF_ROUNDS = 3  # synchronous relaxation rounds (static DAG depth)


def bellman_ford_cheapest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source cheapest path (Bellman-Ford, BF_ROUNDS
    synchronous relaxation rounds) from nation BFS_SOURCE over the trade
    graph — bfs_hops counts hops; this minimizes an additive edge cost.
    Edge cost is INTEGER ceil(1e9 / lineitem_count) — heavier trade =
    cheaper hop — so every path cost is an exact bigint in both engines
    (min-plus over floats would be ULP-tie territory).

    Scale: each round is one equi-join of the edge list against the
    node-sized distance vector + a groupBy-min — the exact relaxation a
    Pregel/GraphFrames BFS runs, expressed relationally; the edge list
    partitioning by src is reused across rounds.  Unreachable (within
    BF_ROUNDS hops) nations report cost -1.
    """
    und = _scaled_und(spark, sf_dir)
    e = _trade_edges(spark, sf_dir).select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        F.col("w"),
    ).groupBy("u", "v").agg(F.sum("w").alias("w")).join(und, ["u", "v"])
    cost = F.ceil(F.lit(1_000_000_000) / F.col("w")).cast("long")
    edges = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                 cost.alias("cost"))
        .union(
            e.select(F.col("v").alias("src"), F.col("u").alias("dst"),
                     cost.alias("cost"))
        )
        # materialize the node-cardinality edge list ONCE (the k-core /
        # CC house pattern) so each relaxation round references the tiny
        # frame, not a fresh copy of the lineitem edge-build plan
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nodes = n.select(F.col("n_nationkey").cast("long").alias("node"))
    dist = nodes.withColumn(
        "d",
        F.when(F.col("node") == BFS_SOURCE, F.lit(0).cast("long")).otherwise(
            F.lit(None).cast("long")
        ),
    )
    for _ in range(BF_ROUNDS):
        relaxed = (
            edges.join(
                dist.filter(F.col("d").isNotNull())
                .withColumnRenamed("node", "src")
                .withColumnRenamed("d", "ds"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("ds") + F.col("cost")).alias("dr"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select("node", F.least("d", "dr").alias("d"))
            # per-round lineage cut on the node-sized distance vector
            # (referenced twice per round — relaxation + carry-forward)
            .localCheckpoint(eager=True)
        )
    return (
        dist.join(n, dist.node == n.n_nationkey)
        .select(
            F.col("node").cast("bigint").alias("nationkey"),
            "n_name",
            F.coalesce(F.col("d"), F.lit(-1)).cast("bigint").alias("min_cost"),
        )
    )


def _bf_oracle() -> str:
    ctes = [
        _SCALED_UND_SQL.strip(),
        f"""wsum AS (
            SELECT least(src, dst) AS u, greatest(src, dst) AS v,
                   sum(w) AS w
            FROM edges0 GROUP BY 1, 2
        )""",
        """ecost AS (
            SELECT ws.u, ws.v,
                   CAST(ceil(1000000000.0 / ws.w) AS BIGINT) AS cost
            FROM wsum ws JOIN und ON ws.u = und.u AND ws.v = und.v
        )""",
        """edges AS (
            SELECT u AS src, v AS dst, cost FROM ecost
            UNION ALL SELECT v, u, cost FROM ecost
        )""",
        "nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation)",
        f"""d0 AS (
            SELECT node,
                   CASE WHEN node = {BFS_SOURCE}
                        THEN CAST(0 AS BIGINT) END AS d
            FROM nodes
        )""",
    ]
    for i in range(1, BF_ROUNDS + 1):
        prev = f"d{i - 1}"
        ctes.append(f"""r{i} AS (
            SELECT e.dst AS node, min(p.d + e.cost) AS dr
            FROM edges e JOIN {prev} p ON e.src = p.node
            WHERE p.d IS NOT NULL
            GROUP BY e.dst
        )""")
        ctes.append(f"""d{i} AS (
            SELECT p.node, least(p.d, r.dr) AS d
            FROM {prev} p LEFT JOIN r{i} r ON p.node = r.node
        )""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT CAST(d.node AS BIGINT) AS nationkey, n.n_name,
               CAST(coalesce(d.d, -1) AS BIGINT) AS min_cost
        FROM d{BF_ROUNDS} d JOIN nation n ON d.node = n.n_nationkey
    """


KCORE_K = 6
KCORE_ROUNDS = 4


def k_core_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core extraction (k = KCORE_K) over the SF-thresholded undirected
    trade graph by bulk-synchronous peeling: each round recomputes degrees
    over the surviving subgraph and drops every node with degree < k —
    the standard distributed k-core algorithm (Montresor et al.,
    "Distributed k-core decomposition", public).  KCORE_ROUNDS is a fixed
    plan constant (the pagerank/LPA static-DAG pattern): each peel is one
    map-side-combined degree aggregation plus two node-keyed semi-joins,
    so total cost is O(rounds * |E|) with no driver feedback loop, and
    the oracle unrolls the identical rounds so the result hash-checks
    even on graphs where peeling hasn't fully converged.

    Returns the surviving nodes with their residual in-core degree.
    The core can legitimately be EMPTY when the thresholded graph has no
    dense club (the sf0.1 testdata graph is hub-and-spoke: its 6-core is
    empty, and the oracle agrees) — emptiness is an answer, not a failure.

    Physical formulation: the edge list stays STATIC and only the
    node-sized ALIVE set evolves (deg_i = degree of the subgraph induced
    by alive_i — identical peel semantics).  An earlier draft filtered the
    edge frame itself each round; its lineage referenced the previous
    round's edges 3x (degree agg + two key joins), so both engines
    expanded the expensive lineitem edge build 3^rounds times (Spark ran
    it 7.6 s; DuckDB OOM'd at sf0.1 before MATERIALIZED hints).  The
    static-edges/evolving-set shape keeps every round one pass over the
    same base frame; the base frame is materialized ONCE via
    localCheckpoint (the connected-components / mmr house pattern —
    without it both engines re-executed the lineitem edge build per
    reference: Spark 7.5 s, and DuckDB needed MATERIALIZED hints), so the
    rounds run on the node-cardinality frame alone.
    """
    und = _scaled_und(spark, sf_dir)
    nb = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .union(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    alive = nb.select("node").distinct()
    for _ in range(KCORE_ROUNDS):
        alive = (
            nb.join(alive, "node")
            .join(alive.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("node")
            # alive is deliberately NOT per-round checkpointed (measured
            # r11): the peel rounds run over the already-checkpointed nb,
            # so the unrolled 252-Exchange plan executes in one job with
            # exchange reuse; four eager cuts ADDED blocking round-trips
            # (solo 1.37 -> 1.70 s) — reverted.
        )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        nb.join(alive, "node")
        .join(alive.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .join(F.broadcast(n), F.col("node") == F.col("n_nationkey"))
        .select(
            F.col("node").cast("bigint").alias("nationkey"),
            "n_name",
            "core_degree",
        )
    )


def _kcore_oracle() -> str:
    # static edges + evolving alive set (see k_core_peel); MATERIALIZED on
    # the node-sized alive CTEs stops DuckDB from inlining the chain
    ctes = ["e0 AS MATERIALIZED (SELECT node, nbr FROM nb)",
            "a0 AS MATERIALIZED (SELECT DISTINCT node FROM e0)"]
    for i in range(1, KCORE_ROUNDS + 1):
        prev = f"a{i - 1}"
        ctes.append(f"""a{i} AS MATERIALIZED (
            SELECT node FROM (
                SELECT e.node, count(*) AS deg
                FROM e0 e
                JOIN {prev} x ON e.node = x.node
                JOIN {prev} y ON e.nbr = y.node
                GROUP BY e.node)
            WHERE deg >= {KCORE_K}
        )""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {_SCALED_UND_SQL},
        {joined}
        SELECT CAST(e.node AS BIGINT) AS nationkey, n.n_name,
               CAST(count(*) AS BIGINT) AS core_degree
        FROM e0 e
        JOIN a{KCORE_ROUNDS} x ON e.node = x.node
        JOIN a{KCORE_ROUNDS} y ON e.nbr = y.node
        JOIN nation n ON e.node = n.n_nationkey
        GROUP BY 1, 2
    """


HARMONIC_HOPS = 3


def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality within HARMONIC_HOPS hops over the thresholded
    undirected trade graph: C_H(u) = sum over v != u reachable in <= R
    hops of 1/dist(u, v) — the centrality that, unlike closeness, stays
    well-defined on disconnected graphs (Boldi & Vigna, "Axioms for
    centrality").  Bounded-radius truncation is the standard large-graph
    variant (hyperball-style); R is a plan constant.

    Construction: R rounds of frontier relaxation over the (node-pair,
    dist) frame — each round one edge join + a min-agg, the BFS/Bellman
    pattern.  The pair frame is bounded by nodes^2 of the
    fixed-cardinality nation dimension; on an unbounded graph this tier
    switches to sketched neighborhood counts (the HLL/hyperball path, see
    operators/sketches.py for the mergeable-HLL machinery).

    The edge frame is materialized once (localCheckpoint, the iterative-op
    house pattern) so the R relaxation rounds reference the tiny edge
    list, not R copies of the lineitem edge-build plan.
    """
    und = _scaled_und(spark, sf_dir)
    nb = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .union(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    nodes = (
        nb.select("node").distinct()
    )
    dist = nodes.select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    ).withColumn("d", F.lit(0))
    for _ in range(HARMONIC_HOPS):
        step = (
            dist.join(nb, dist.dst == nb.node)
            .select("src", F.col("nbr").alias("dst"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(step)
            .groupBy("src", "dst")
            .agg(F.min("d").alias("d"))
            # per-round lineage cut on the bounded pair frame (referenced
            # twice per round — carry-forward + frontier step)
            .localCheckpoint(eager=True)
        )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        dist.filter(F.col("d") > 0)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.round(F.sum(F.lit(1.0) / F.col("d")), 6).alias("harmonic"),
        )
        .join(F.broadcast(n), F.col("src") == F.col("n_nationkey"))
        .select(
            F.col("src").cast("bigint").alias("nationkey"),
            "n_name",
            "n_reached",
            "harmonic",
        )
    )


def _harmonic_oracle() -> str:
    ctes = [
        """nodes AS MATERIALIZED (SELECT DISTINCT node FROM nb)""",
        """d0 AS MATERIALIZED (SELECT node AS src, node AS dst, 0 AS d
                               FROM nodes)""",
    ]
    for i in range(1, HARMONIC_HOPS + 1):
        prev = f"d{i - 1}"
        ctes.append(f"""d{i} AS MATERIALIZED (
            SELECT src, dst, min(d) AS d FROM (
                SELECT src, dst, d FROM {prev}
                UNION ALL
                SELECT p.src, nb.nbr AS dst, p.d + 1 AS d
                FROM {prev} p JOIN nb ON p.dst = nb.node
            ) GROUP BY 1, 2
        )""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {_SCALED_UND_SQL},
        {joined}
        SELECT CAST(t.src AS BIGINT) AS nationkey, n.n_name,
               CAST(count(*) AS BIGINT) AS n_reached,
               round(sum(1.0 / t.d), 6) AS harmonic
        FROM d{HARMONIC_HOPS} t JOIN nation n ON t.src = n.n_nationkey
        WHERE t.d > 0
        GROUP BY 1, 2
    """



QUERIES = {
    "pagerank_nations": pagerank_nations,
    "triangle_count": triangle_count,
    "bfs_hops": bfs_hops,
    "degree_assortativity": degree_assortativity,
    "recursive_reachability": recursive_reachability,
    "clustering_coefficient": clustering_coefficient,
    "adamic_adar_linkpred": adamic_adar_linkpred,
    "lpa_communities": lpa_communities,
    "bellman_ford_cheapest": bellman_ford_cheapest,
    "k_core_peel": k_core_peel,
    "harmonic_centrality": harmonic_centrality,
}

ORACLES = {
    "pagerank_nations": _pr_oracle(),
    "triangle_count": _tri_oracle(),
    "bfs_hops": _bfs_oracle(),
    "degree_assortativity": _assort_oracle(),
    "recursive_reachability": _recursive_reach_oracle(),
    "clustering_coefficient": _cc_oracle(),
    "adamic_adar_linkpred": _aa_oracle(),
    "lpa_communities": _lpa_oracle(),
    "bellman_ford_cheapest": _bf_oracle(),
    "k_core_peel": _kcore_oracle(),
    "harmonic_centrality": _harmonic_oracle(),
}


# --------------------------------------------------------------------------
# round-5 restarted-session: HITS on the customer-part bipartite graph
# --------------------------------------------------------------------------

HITS_ROUNDS = 6
HITS_SCALE = 1_000_000  # scores as integer micro-units
HITS_TOP = 10


def hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities on the customer-part purchase graph:
    authority(part) = sum of hub scores of its buyers, hub(customer) =
    sum of authority scores of their parts, HITS_ROUNDS alternating
    rounds with max-normalization — "which parts do the broadest heavy
    buyers concentrate on" (authority) and "which customers span the
    catalog" (hubs).  Returns the top-HITS_TOP authority parts.

    Exactness (bellman_ford integer-iteration pattern): scores live in
    integer micro-units; neighbor sums are exact integer aggregations;
    normalization divides by the CURRENT MAX via integer floor division
    (max-norm instead of the L2 norm precisely so the iteration stays in
    integer arithmetic) — both engines round identically every round.

    Scale: the edge list is a distinct (customer, part) projection of
    lineitem x orders (fact-sized, built once, materialized); each round
    is two edge-keyed aggregate joins — the pagerank shape.  (Measured
    alternative, rejected: caching the edge list twice pre-partitioned
    by each join key to reuse InMemoryRelation outputPartitioning was
    ~1.8x SLOWER end-to-end at sf0.1 — AQE already broadcasts the
    entity-sized score frames, so the checkpointed edges never re-cross
    the wire per round, and the two repartition+cache materializations
    are pure added cost.)
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = edges.select("c").distinct().select(
        "c", F.lit(HITS_SCALE).cast("long").alias("h")
    ).localCheckpoint(eager=True)
    a = None
    dec = "decimal(38,0)"
    for _ in range(HITS_ROUNDS):
        # a_raw / h_raw are each referenced TWICE (by their max aggregate
        # and by the normalization), so THEY are the frames to
        # materialize — checkpointing the normalized frames instead would
        # still recompute every raw aggregation twice
        a_raw = (
            edges.join(h, "c")
            .groupBy("p")
            .agg(F.sum(F.col("h").cast(dec)).alias("ar"))
            .localCheckpoint(eager=True)
        )
        amax = a_raw.agg(F.max("ar").alias("am"))
        a = a_raw.crossJoin(F.broadcast(amax)).select(
            "p",
            F.floor(
                (F.col("ar") * HITS_SCALE).cast(dec) / F.col("am")
            ).cast("long").alias("a"),
        )
        h_raw = (
            edges.join(a, "p")
            .groupBy("c")
            .agg(F.sum(F.col("a").cast(dec)).alias("hr"))
            .localCheckpoint(eager=True)
        )
        hmax = h_raw.agg(F.max("hr").alias("hm"))
        h = h_raw.crossJoin(F.broadcast(hmax)).select(
            "c",
            F.floor(
                (F.col("hr") * HITS_SCALE).cast(dec) / F.col("hm")
            ).cast("long").alias("h"),
        )
    deg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        a.join(deg, "p")
        .select(
            F.col("p").cast("bigint").alias("part_id"),
            (F.col("a").cast("double") / HITS_SCALE).alias("authority"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
        )
        .orderBy(F.col("authority").desc(), F.col("part_id").asc())
        .limit(HITS_TOP)
    )


def _hits_oracle() -> str:
    s = HITS_SCALE
    ctes = [
        """edges AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS c, l_partkey AS p
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )""",
        f"""h0 AS MATERIALIZED (SELECT DISTINCT c, CAST({s} AS BIGINT) AS h
                   FROM edges)""",
    ]
    for i in range(1, HITS_ROUNDS + 1):
        prev_h = f"h{i - 1}"
        ctes.append(f"""ar{i} AS MATERIALIZED (
            SELECT e.p, sum(h.h) AS ar
            FROM edges e JOIN {prev_h} h ON e.c = h.c
            GROUP BY 1
        )""")
        ctes.append(f"""am{i} AS MATERIALIZED (SELECT max(ar) AS am
                        FROM ar{i})""")
        ctes.append(f"""a{i} AS MATERIALIZED (
            SELECT p, (ar * {s}) // am AS a FROM ar{i}, am{i}
        )""")
        ctes.append(f"""hr{i} AS MATERIALIZED (
            SELECT e.c, sum(a.a) AS hr
            FROM edges e JOIN a{i} a ON e.p = a.p
            GROUP BY 1
        )""")
        ctes.append(f"""hm{i} AS MATERIALIZED (SELECT max(hr) AS hm
                        FROM hr{i})""")
        ctes.append(f"""h{i} AS MATERIALIZED (
            SELECT c, (hr * {s}) // hm AS h FROM hr{i}, hm{i}
        )""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    deg AS (SELECT p, count(*) AS n_customers FROM edges GROUP BY 1)
    SELECT CAST(a.p AS BIGINT) AS part_id,
           CAST(a.a AS DOUBLE) / {s} AS authority,
           CAST(d.n_customers AS BIGINT) AS n_customers
    FROM a{HITS_ROUNDS} a JOIN deg d ON a.p = d.p
    ORDER BY authority DESC, part_id ASC
    LIMIT {HITS_TOP}
"""


ORACLES["hits_bipartite"] = _hits_oracle()
QUERIES["hits_bipartite"] = hits_bipartite


# --------------------------------------------------------------------------
# community_modularity — Newman modularity of the LPA partition
# --------------------------------------------------------------------------


def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the lpa_communities partition over the
    undirected trade graph: per community c, q_c = e_c/m - (d_c/(2m))^2
    (within-community edge share minus the degree-share square), Q = sum
    q_c — the standard goodness-of-partition score that tells whether the
    label propagation found real structure (Q > 0) or noise.

    Exactness: e_c, d_c, m are exact integers; each q_c is a fixed
    two-division expression; the community fold is ORDER-PINNED (terms
    can be negative, so the total is read at the last community via
    max_by on the community key, not max).

    Scale: re-runs the LPA_ITERS fixed label-propagation rounds (same
    static-DAG shape as lpa_communities), then two community-sized
    aggregations over the edge list.
    """
    und = _scaled_und(spark, sf_dir)
    nb = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .union(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    n = load_table(spark, sf_dir, "nation")
    nodes = n.select(F.col("n_nationkey").cast("long").alias("node"))
    lab = nodes.withColumn("label", F.col("node"))
    for _ in range(LPA_ITERS):
        votes = (
            nb.join(lab.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        picked = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl")))
                 .alias("m"))
            .select("node", (-F.col("m.nl")).alias("new_label"))
        )
        lab = (
            nodes.join(picked, "node", "left")
            .join(lab, "node")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            # per-round lineage cut — see lpa_communities (same loop;
            # unchecked here the plan measured 3,863 lines / 252
            # Exchanges / 80 SortMergeJoins for a node-sized frame)
            .localCheckpoint(eager=True)
        )
    m_edges = und.groupBy().agg(F.count(F.lit(1)).alias("m"))
    lu = lab.select(F.col("node").alias("u"), F.col("label").alias("cu"))
    lv = lab.select(F.col("node").alias("v"), F.col("label").alias("cv"))
    tagged = und.join(F.broadcast(lu), "u").join(F.broadcast(lv), "v")
    within = (
        tagged.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    deg = (
        nb.join(F.broadcast(lab), "node")
        .groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("degree_sum"),
             F.countDistinct("node").alias("n_nodes"))
    )
    per = (
        deg.join(within, "community", "left")
        .withColumn("e_within", F.coalesce("e_within", F.lit(0)))
        .crossJoin(F.broadcast(m_edges))  # 1-row scalar broadcast
    )
    md = F.col("m").cast("double")
    q_term = (
        F.col("e_within").cast("double") / md
        - (F.col("degree_sum").cast("double") / (F.lit(2.0) * md))
        * (F.col("degree_sum").cast("double") / (F.lit(2.0) * md))
    )
    wcum = Window.partitionBy().orderBy("community").rowsBetween(
        Window.unboundedPreceding, 0
    )
    folded = per.withColumn("q_term", q_term).withColumn(
        "q_cum", F.sum("q_term").over(wcum)
    )
    wfull = Window.partitionBy().orderBy("community").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return folded.select(
        F.col("community").cast("long").alias("community"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("e_within").cast("long").alias("e_within"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        F.round("q_term", 6).alias("q_term"),
        F.round(F.max_by(F.col("q_cum"), F.col("community")).over(wfull), 6).alias(
            "modularity"
        ),
    ).orderBy("community")


def _modularity_oracle() -> str:
    # edges0/und/nb MATERIALIZED markers now live in _SCALED_UND_SQL
    # itself (every consumer needs them — lpa_communities reproduced the
    # temp-disk exhaustion this oracle first hit at sf0.1)
    ctes = [
        _SCALED_UND_SQL.strip(),
        "nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, LPA_ITERS + 1):
        prev = f"l{i - 1}"
        ctes.append(f"""v{i} AS (
            SELECT nb.node, l.label, count(*) AS cnt
            FROM nb JOIN {prev} l ON nb.nbr = l.node
            GROUP BY 1, 2
        )""")
        ctes.append(f"""p{i} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY cnt DESC, label ASC) AS rn
                FROM v{i}) WHERE rn = 1
        )""")
        ctes.append(f"""l{i} AS MATERIALIZED (
            SELECT n.node, coalesce(p.label, l.label) AS label
            FROM nodes n
            LEFT JOIN p{i} p ON n.node = p.node
            JOIN {prev} l ON n.node = l.node
        )""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined},
        m_edges AS (SELECT count(*) AS m FROM und),
        tagged AS (
            SELECT und.u, und.v, lu.label AS cu, lv.label AS cv
            FROM und
            JOIN l{LPA_ITERS} lu ON und.u = lu.node
            JOIN l{LPA_ITERS} lv ON und.v = lv.node
        ),
        within AS (
            SELECT cu AS community, count(*) AS e_within
            FROM tagged WHERE cu = cv GROUP BY 1
        ),
        deg AS (
            SELECT l.label AS community, count(*) AS degree_sum,
                   count(DISTINCT nb.node) AS n_nodes
            FROM nb JOIN l{LPA_ITERS} l ON nb.node = l.node
            GROUP BY 1
        ),
        per AS (
            SELECT d.community, d.n_nodes, d.degree_sum,
                   coalesce(w.e_within, 0) AS e_within,
                   (SELECT m FROM m_edges) AS m
            FROM deg d LEFT JOIN within w USING (community)
        ),
        folded AS (
            SELECT community, n_nodes, e_within, degree_sum,
                   CAST(e_within AS DOUBLE) / CAST(m AS DOUBLE)
                   - (CAST(degree_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                     * (CAST(degree_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                       AS q_term,
                   sum(CAST(e_within AS DOUBLE) / CAST(m AS DOUBLE)
                       - (CAST(degree_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                         * (CAST(degree_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))
                       OVER (ORDER BY community
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS q_cum
            FROM per
        )
        SELECT CAST(community AS BIGINT) AS community,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(e_within AS BIGINT) AS e_within,
               CAST(degree_sum AS BIGINT) AS degree_sum,
               round(q_term, 6) AS q_term,
               round(arg_max(q_cum, community) OVER (), 6) AS modularity
        FROM folded ORDER BY community
    """


QUERIES["community_modularity"] = community_modularity
ORACLES["community_modularity"] = _modularity_oracle()


KATZ_BETA = 0.05  # attenuation; < 1/lambda_max for a 25-node graph at this beta
KATZ_K = 4  # truncation depth: walks up to length 4


def katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality over the (unweighted) nation trade
    graph: katz(v) = sum_{k=1..KATZ_K} beta^k * walks_k(v), where
    walks_k(v) is the EXACT INTEGER count of directed walks of length k
    ending at v — the attenuated-influence companion of
    pagerank_nations (stationary shares) and harmonic_centrality
    (distances).

    Exactness: each walk-count round is one integer join-aggregate
    (w_k(v) = sum over edges u->v of w_{k-1}(u), counts bounded by
    25^k on the fixed 25-nation dimension), so katz is a single float
    polynomial in beta over four exact integers — bit-identical across
    engines; rank ties break on nationkey.

    Scale: the edge list reduces the fact join ONCE to <= 625 rows;
    every round is a broadcast join on that frame.  KATZ_K is a fixed
    truncation, not a convergence loop — the 100-TB cost is the one
    fact reduce.
    """
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = _trade_edges(spark, sf_dir).select("src", "dst").distinct()
    walks = []
    w = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("w")
    )
    walks.append(w)
    for _ in range(KATZ_K - 1):
        w = (
            F.broadcast(edges)
            .join(w, F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum("w").alias("w"))
            .select(F.col("node2").alias("node"), "w")
        )
        walks.append(w)
    out = n.select(F.col("n_nationkey").alias("node"), "n_name")
    for k, wk in enumerate(walks, start=1):
        out = out.join(
            wk.select("node", F.col("w").alias(f"w{k}")), "node", "left"
        ).withColumn(f"w{k}", F.coalesce(F.col(f"w{k}"), F.lit(0).cast("decimal(38,0)")))
    katz = sum(
        F.lit(KATZ_BETA**k) * F.col(f"w{k}").cast("double")
        for k in range(1, KATZ_K + 1)
    )
    ranked = out.select(
        F.col("node").cast("bigint").alias("nationkey"),
        "n_name",
        *[F.col(f"w{k}").cast("long").alias(f"walks_{k}") for k in range(1, KATZ_K + 1)],
        F.round(katz, 6).alias("katz"),
    )
    wr = Window.orderBy(F.col("katz").desc(), F.col("nationkey").asc())
    return ranked.withColumn("rank", F.row_number().over(wr))


ORACLES["katz_centrality"] = f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
    ),
    w1 AS (
        SELECT dst AS node, CAST(count(*) AS HUGEINT) AS w
        FROM edges GROUP BY 1
    ),
    w2 AS (
        SELECT e.dst AS node, CAST(sum(w1.w) AS HUGEINT) AS w
        FROM edges e JOIN w1 ON w1.node = e.src GROUP BY 1
    ),
    w3 AS (
        SELECT e.dst AS node, CAST(sum(w2.w) AS HUGEINT) AS w
        FROM edges e JOIN w2 ON w2.node = e.src GROUP BY 1
    ),
    w4 AS (
        SELECT e.dst AS node, CAST(sum(w3.w) AS HUGEINT) AS w
        FROM edges e JOIN w3 ON w3.node = e.src GROUP BY 1
    ),
    base AS (
        SELECT n_nationkey AS node, n_name,
               coalesce(w1.w, 0) AS c1, coalesce(w2.w, 0) AS c2,
               coalesce(w3.w, 0) AS c3, coalesce(w4.w, 0) AS c4
        FROM nation
        LEFT JOIN w1 ON w1.node = n_nationkey
        LEFT JOIN w2 ON w2.node = n_nationkey
        LEFT JOIN w3 ON w3.node = n_nationkey
        LEFT JOIN w4 ON w4.node = n_nationkey
    )
    SELECT CAST(node AS BIGINT) AS nationkey, n_name,
           CAST(c1 AS BIGINT) AS walks_1, CAST(c2 AS BIGINT) AS walks_2,
           CAST(c3 AS BIGINT) AS walks_3, CAST(c4 AS BIGINT) AS walks_4,
           round({KATZ_BETA} * CAST(c1 AS DOUBLE)
                 + {KATZ_BETA**2} * CAST(c2 AS DOUBLE)
                 + {KATZ_BETA**3} * CAST(c3 AS DOUBLE)
                 + {KATZ_BETA**4} * CAST(c4 AS DOUBLE), 6) AS katz,
           CAST(row_number() OVER (
               ORDER BY {KATZ_BETA} * CAST(c1 AS DOUBLE)
                        + {KATZ_BETA**2} * CAST(c2 AS DOUBLE)
                        + {KATZ_BETA**3} * CAST(c3 AS DOUBLE)
                        + {KATZ_BETA**4} * CAST(c4 AS DOUBLE) DESC,
                        node ASC) AS INT) AS rank
    FROM base
"""
QUERIES["katz_centrality"] = katz_centrality
