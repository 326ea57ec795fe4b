"""Spatial-autocorrelation tier (DRIVER surface).

The areal-statistics companion of geo_grid_join (which answers "which
points are NEAR each other"; these answer "do nearby areas hold SIMILAR
values"):

- ``morans_i_acctbal``: global Moran's I of mean customer account
  balance over a 10-degree grid with rook (4-neighbor) contiguity
  weights, plus the normality z-score (E[I] = -1/(n-1), Var from the
  S1/S2 moments — S1 = 2W and S2 = 4*sum(deg^2) for binary symmetric
  weights).
- ``join_count_spatial``: the binary join-count statistic — cells are
  classed Black (mean above the exact lower median) / White, and the
  observed BB / WW / BW adjacent-pair counts are compared to their
  non-free-sampling (hypergeometric) expectations.  The categorical
  counterpart of Moran's I.
- ``getis_ord_hotspots``: local Gi* per cell (self-inclusive rook
  neighborhood) — the hot/cold-spot decomposition of the global
  statistic; cells ranked by |z|, verdicts at the 1% normal critical
  point 2.576.

Shared determinism machinery: coordinates are the SAME md5-synthesized
points geo_grid_join uses (analytics.py:2945); cells reduce customers to
a bounded 12x36 grid, so every window/join below the first groupBy runs
on a <= 432-row frame.  The per-cell mean is one correctly-rounded
double division of exact cent integers, rounded to 1e-4 cents and
re-integered (both engines produce the identical long), after which all
centered products (n*m_i - M) fold in decimal(38,0) and the statistics
are single float expressions.  Adjacency is an equi-join on shifted cell
ids — never a cell x cell cross join.

Scale (100 TB): one shuffle of customer on the cell id; everything else
is bounded by the fixed grid.  A finer grid grows the bounded frame as
O(cells), never O(customers^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import md5_hash_long
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_DEC = "decimal(38,0)"

SPATIAL_CELL_DEG = 10  # 12 x 36 = 432-cell bounded grid
_GRID = 10000  # analytics.GEO_COORD_GRID: 1e-4-degree synthetic coords


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cy, cx, cnt, mi): cell id, customer count, mean acctbal in
    1e-4-cent integer units (exactly reproducible in both engines)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    key = F.col("c_custkey").cast("string")
    lat = (
        F.pmod(md5_hash_long(key, "lat"), F.lit(120 * _GRID))
        / F.lit(float(_GRID))
        - 60.0
    )
    lon = (
        F.pmod(md5_hash_long(key, "lon"), F.lit(360 * _GRID))
        / F.lit(float(_GRID))
        - 180.0
    )
    pts = c.select(
        F.floor(lat / SPATIAL_CELL_DEG).cast("long").alias("cy"),
        F.floor(lon / SPATIAL_CELL_DEG).cast("long").alias("cx"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    g = pts.groupBy("cy", "cx").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("sc")
    )
    mean4 = F.round(F.col("sc").cast("double") / F.col("cnt"), 4)
    return g.select(
        "cy",
        "cx",
        "cnt",
        F.round(mean4 * 10000.0).cast("long").alias("mi"),
    )


_CELLS_SQL = f"""
        SELECT cy, cx, count(*) AS cnt,
               CAST(round(round(sum(cents) * 1.0 / count(*), 4) * 10000.0)
                    AS BIGINT) AS mi
        FROM (
            SELECT CAST(floor(((CAST('0x' || substr(md5('lat' || c_custkey),
                                1, 8) AS BIGINT) % {120 * _GRID})
                               / {float(_GRID)} - 60.0)
                              / {SPATIAL_CELL_DEG}) AS BIGINT) AS cy,
                   CAST(floor(((CAST('0x' || substr(md5('lon' || c_custkey),
                                1, 8) AS BIGINT) % {360 * _GRID})
                               / {float(_GRID)} - 180.0)
                              / {SPATIAL_CELL_DEG}) AS BIGINT) AS cx,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        )
        GROUP BY 1, 2
"""


def morans_i_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I with rook contiguity on the 10-degree grid."""
    cells = _cells(spark, sf_dir)
    glob = cells.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("mi").cast(_DEC)).alias("m"),
        F.sum(F.col("mi").cast(_DEC) * F.col("mi").cast(_DEC)).alias("mm"),
    )
    # directed rook edges via two one-step shifts (each undirected pair once)
    a = cells.select(
        F.col("cy").alias("ay"), F.col("cx").alias("ax"), F.col("mi").alias("ma")
    )
    right = a.join(
        cells,
        (F.col("cy") == F.col("ay")) & (F.col("cx") == F.col("ax") + 1),
    ).select(F.col("ma").alias("m1"), F.col("mi").alias("m2"))
    down = a.join(
        cells,
        (F.col("cy") == F.col("ay") + 1) & (F.col("cx") == F.col("ax")),
    ).select(F.col("ma").alias("m1"), F.col("mi").alias("m2"))
    pairs = right.unionAll(down).crossJoin(F.broadcast(glob))
    n = F.col("n")
    z1 = n * F.col("m1").cast(_DEC) - F.col("m")
    z2 = n * F.col("m2").cast(_DEC) - F.col("m")
    pagg = pairs.agg(
        F.count(F.lit(1)).cast(_DEC).alias("p"),
        F.sum(z1 * z2).alias("cross"),
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.max("mm").alias("mm"),
    )
    # degree moments for Var(I): join the 4-neighborhood, count per cell
    nbr = cells.select(
        "mi",
        F.explode(
            F.array(
                F.struct((F.col("cy") + 1).alias("ny"), F.col("cx").alias("nx")),
                F.struct((F.col("cy") - 1).alias("ny"), F.col("cx").alias("nx")),
                F.struct(F.col("cy").alias("ny"), (F.col("cx") + 1).alias("nx")),
                F.struct(F.col("cy").alias("ny"), (F.col("cx") - 1).alias("nx")),
            )
        ).alias("nb"),
    ).select("mi", "nb.ny", "nb.nx")
    deg = (
        nbr.join(
            cells.select(F.col("cy").alias("ny"), F.col("cx").alias("nx")),
            ["ny", "nx"],
        )
        .groupBy("ny", "nx")
        .count()
        # factors cast BEFORE multiply and the SUM accumulates in decimal:
        # the long sum-of-squared-degrees overflows int64 first at scale
        .agg(
            F.sum(
                F.col("count").cast(_DEC) * F.col("count").cast(_DEC)
            ).alias("sdeg2")
        )
    )
    out = pagg.crossJoin(F.broadcast(deg))
    nd = F.col("n").cast("double")
    w = 2.0 * F.col("p").cast("double")  # symmetric weight total
    # z' = n*z_i, so sum z'^2 = n*(n*mm - m^2) and the (n/W) prefactor's
    # n cancels: I = 2*cross / (W * (n*mm - m^2)) — the dense-matrix twin
    # test caught the uncancelled factor the hash-parity oracle could not
    denom = (F.col("n") * F.col("mm") - F.col("m") * F.col("m")).cast("double")
    i_stat = 2.0 * F.col("cross").cast("double") / (w * denom)
    e_i = -1.0 / (nd - 1.0)
    s1 = 2.0 * w
    s2 = 4.0 * F.col("sdeg2").cast("double")
    var_i = (nd * nd * s1 - nd * s2 + 3.0 * w * w) / (
        w * w * (nd * nd - 1.0)
    ) - e_i * e_i
    z = (i_stat - e_i) / F.sqrt(var_i)
    return out.select(
        F.col("n").cast("long").alias("n_cells"),
        F.col("p").cast("long").alias("w_pairs"),
        F.round(i_stat, 6).alias("morans_i"),
        F.round(F.lit(e_i), 6).alias("expected_i"),
        F.round(z, 6).alias("z_score"),
        F.when(z > 1.96, F.lit("clustered"))
        .when(z < -1.96, F.lit("dispersed"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


ORACLES["morans_i_acctbal"] = f"""
    WITH cells AS ({_CELLS_SQL}),
    gstats AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(mi) AS HUGEINT) AS m,
               CAST(sum(CAST(mi AS HUGEINT) * mi) AS HUGEINT) AS mm
        FROM cells
    ),
    pairs AS (
        SELECT a.mi AS m1, b.mi AS m2 FROM cells a
        JOIN cells b ON b.cy = a.cy AND b.cx = a.cx + 1
        UNION ALL
        SELECT a.mi, b.mi FROM cells a
        JOIN cells b ON b.cy = a.cy + 1 AND b.cx = a.cx
    ),
    pagg AS (
        SELECT CAST(count(*) AS HUGEINT) AS p,
               sum((n * m1 - m) * (n * m2 - m)) AS cp,
               max(n) AS n, max(m) AS m, max(mm) AS mm
        FROM pairs, gstats
    ),
    deg AS (
        SELECT CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdeg2
        FROM (
            SELECT b.cy, b.cx, count(*) AS d
            FROM (
                SELECT cy + dy AS ny, cx + dx AS nx FROM cells,
                     (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1))
                      t(dy, dx))
            ) nb
            JOIN cells b ON b.cy = nb.ny AND b.cx = nb.nx
            GROUP BY 1, 2
        )
    ),
    parts AS (
        SELECT CAST(n AS DOUBLE) AS nd, 2.0 * CAST(p AS DOUBLE) AS w,
               CAST(p AS BIGINT) AS pc, CAST(n AS BIGINT) AS nc,
               2.0 * CAST(cp AS DOUBLE)
                   / ((2.0 * CAST(p AS DOUBLE))
                      * CAST(n * mm - m * m AS DOUBLE)) AS i_stat,
               -1.0 / (CAST(n AS DOUBLE) - 1.0) AS e_i,
               4.0 * CAST(sdeg2 AS DOUBLE) AS s2
        FROM pagg, deg
    ),
    fin AS (
        SELECT nc, pc, i_stat, e_i,
               (i_stat - e_i)
               / sqrt((nd * nd * (2.0 * w) - nd * s2 + 3.0 * w * w)
                      / (w * w * (nd * nd - 1.0)) - e_i * e_i) AS z
        FROM parts
    )
    SELECT nc AS n_cells, pc AS w_pairs,
           round(i_stat, 6) AS morans_i, round(e_i, 6) AS expected_i,
           round(z, 6) AS z_score,
           CASE WHEN z > 1.96 THEN 'clustered'
                WHEN z < -1.96 THEN 'dispersed'
                ELSE 'random' END AS verdict
    FROM fin
"""
QUERIES["morans_i_acctbal"] = morans_i_acctbal


def join_count_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary join-count statistics: Black = cell mean above the exact
    lower median; observed vs hypergeometric-expected BB/WW/BW counts."""
    from pyspark.sql import Window

    cells = _cells(spark, sf_dir)
    w_rank = Window.orderBy("mi", "cy", "cx")
    ranked = cells.withColumn("r", F.row_number().over(w_rank))
    glob = ranked.agg(F.count(F.lit(1)).alias("nc"))
    med = (
        ranked.crossJoin(F.broadcast(glob))
        .filter(F.col("r") == F.expr("(nc + 1) div 2"))
        .select(F.col("mi").alias("med"))
    )
    lab = cells.crossJoin(F.broadcast(med)).select(
        "cy", "cx", (F.col("mi") > F.col("med")).cast("int").alias("b")
    )
    a = lab.select(
        F.col("cy").alias("ay"), F.col("cx").alias("ax"), F.col("b").alias("b1")
    )
    right = a.join(
        lab, (F.col("cy") == F.col("ay")) & (F.col("cx") == F.col("ax") + 1)
    ).select("b1", F.col("b").alias("b2"))
    down = a.join(
        lab, (F.col("cy") == F.col("ay") + 1) & (F.col("cx") == F.col("ax"))
    ).select("b1", F.col("b").alias("b2"))
    pairs = right.unionAll(down)
    counts = pairs.agg(
        F.count(F.lit(1)).alias("j"),
        F.sum((F.col("b1") * F.col("b2"))).alias("bb"),
        F.sum(((1 - F.col("b1")) * (1 - F.col("b2")))).alias("ww"),
    )
    nb = lab.agg(
        F.count(F.lit(1)).alias("n"), F.sum("b").alias("k")
    )
    out = counts.crossJoin(F.broadcast(nb))
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    j = F.col("j").cast("double")
    e_bb = j * k * (k - 1.0) / (n * (n - 1.0))
    e_ww = j * (n - k) * (n - k - 1.0) / (n * (n - 1.0))
    e_bw = 2.0 * j * k * (n - k) / (n * (n - 1.0))
    return out.select(
        F.col("n").cast("long").alias("n_cells"),
        F.col("k").cast("long").alias("n_black"),
        F.col("j").cast("long").alias("n_joins"),
        F.col("bb").cast("long").alias("bb_observed"),
        F.round(e_bb, 4).alias("bb_expected"),
        F.col("ww").cast("long").alias("ww_observed"),
        F.round(e_ww, 4).alias("ww_expected"),
        (F.col("j") - F.col("bb") - F.col("ww")).cast("long").alias("bw_observed"),
        F.round(e_bw, 4).alias("bw_expected"),
    )


ORACLES["join_count_spatial"] = f"""
    WITH cells AS ({_CELLS_SQL}),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY mi, cy, cx) AS r,
               count(*) OVER () AS nc
        FROM cells
    ),
    med AS (SELECT mi AS med FROM ranked WHERE r = (nc + 1) // 2),
    lab AS (
        SELECT cy, cx, CASE WHEN mi > med THEN 1 ELSE 0 END AS b
        FROM cells, med
    ),
    pairs AS (
        SELECT a.b AS b1, c.b AS b2 FROM lab a
        JOIN lab c ON c.cy = a.cy AND c.cx = a.cx + 1
        UNION ALL
        SELECT a.b, c.b FROM lab a
        JOIN lab c ON c.cy = a.cy + 1 AND c.cx = a.cx
    ),
    counts AS (
        SELECT CAST(count(*) AS BIGINT) AS j,
               CAST(sum(b1 * b2) AS BIGINT) AS bb,
               CAST(sum((1 - b1) * (1 - b2)) AS BIGINT) AS ww
        FROM pairs
    ),
    nb AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(b) AS BIGINT) AS k
        FROM lab
    )
    SELECT n AS n_cells, k AS n_black, j AS n_joins,
           bb AS bb_observed,
           round(j * k * (k - 1.0) / (n * (n - 1.0)), 4) AS bb_expected,
           ww AS ww_observed,
           round(j * (n - k) * (n - k - 1.0) / (n * (n - 1.0)), 4)
               AS ww_expected,
           j - bb - ww AS bw_observed,
           round(2.0 * j * k * (n - k) / (n * (n - 1.0)), 4) AS bw_expected
    FROM counts, nb
"""
QUERIES["join_count_spatial"] = join_count_spatial


GISTAR_CRIT = 2.576  # 1% two-sided normal critical point


def getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Gi* per cell (self-inclusive rook neighborhood), top 20 by
    |z| with hot/cold verdicts at 2.576."""
    cells = _cells(spark, sf_dir)
    glob = cells.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("mi").cast(_DEC)).alias("m"),
        F.sum(F.col("mi").cast(_DEC) * F.col("mi").cast(_DEC)).alias("mm"),
    )
    # self-inclusive neighborhood: explode 5 offsets, equi-join values
    nbr = cells.select(
        F.col("cy").alias("oy"),
        F.col("cx").alias("ox"),
        F.explode(
            F.array(
                F.struct(F.col("cy").alias("ny"), F.col("cx").alias("nx")),
                F.struct((F.col("cy") + 1).alias("ny"), F.col("cx").alias("nx")),
                F.struct((F.col("cy") - 1).alias("ny"), F.col("cx").alias("nx")),
                F.struct(F.col("cy").alias("ny"), (F.col("cx") + 1).alias("nx")),
                F.struct(F.col("cy").alias("ny"), (F.col("cx") - 1).alias("nx")),
            )
        ).alias("nb"),
    ).select("oy", "ox", "nb.ny", "nb.nx")
    vals = cells.select(
        F.col("cy").alias("ny"), F.col("cx").alias("nx"), "mi"
    )
    local = (
        nbr.join(vals, ["ny", "nx"])
        .groupBy("oy", "ox")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.col("mi").cast(_DEC)).alias("ls"),
        )
        .crossJoin(F.broadcast(glob))
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    num = (F.col("n") * F.col("ls") - F.col("k") * F.col("m")).cast("double")
    # n^2 * s^2 = n*mm - m^2; Gi* denom s*sqrt((n k - k^2)/(n-1)) n-scaled
    s2n = (F.col("n") * F.col("mm") - F.col("m") * F.col("m")).cast("double")
    z = num / F.sqrt(s2n * (n * k - k * k) / (n - 1.0))
    ranked = local.select(
        F.col("oy").alias("cy"),
        F.col("ox").alias("cx"),
        F.col("k").cast("int").alias("k_neighbors"),
        F.round(z, 6).alias("gi_z"),
        F.when(z > GISTAR_CRIT, F.lit("hot"))
        .when(z < -GISTAR_CRIT, F.lit("cold"))
        .otherwise(F.lit("none"))
        .alias("spot"),
    )
    return ranked.orderBy(
        F.abs(F.col("gi_z")).desc(), "cy", "cx"
    ).limit(20)


ORACLES["getis_ord_hotspots"] = f"""
    WITH cells AS ({_CELLS_SQL}),
    gstats AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(mi) AS HUGEINT) AS m,
               CAST(sum(CAST(mi AS HUGEINT) * mi) AS HUGEINT) AS mm
        FROM cells
    ),
    local AS (
        SELECT a.cy AS oy, a.cx AS ox, count(*) AS k,
               CAST(sum(b.mi) AS HUGEINT) AS ls
        FROM cells a
        CROSS JOIN (SELECT * FROM (VALUES (0, 0), (1, 0), (-1, 0), (0, 1),
                                          (0, -1)) t(dy, dx)) o
        JOIN cells b ON b.cy = a.cy + o.dy AND b.cx = a.cx + o.dx
        GROUP BY 1, 2
    ),
    zs AS (
        SELECT oy AS cy, ox AS cx, CAST(k AS INTEGER) AS k_neighbors,
               CAST(n * ls - k * m AS DOUBLE)
               / sqrt(CAST(n * mm - m * m AS DOUBLE)
                      * (CAST(n AS DOUBLE) * k - CAST(k AS DOUBLE) * k)
                      / (CAST(n AS DOUBLE) - 1.0)) AS z
        FROM local, gstats
    )
    SELECT cy, cx, k_neighbors, round(z, 6) AS gi_z,
           CASE WHEN z > {GISTAR_CRIT} THEN 'hot'
                WHEN z < -{GISTAR_CRIT} THEN 'cold'
                ELSE 'none' END AS spot
    FROM zs
    ORDER BY abs(round(z, 6)) DESC, cy, cx
    LIMIT 20
"""
QUERIES["getis_ord_hotspots"] = getis_ord_hotspots
