"""Agreement / method-comparison tier (DRIVER surface).

Completes the reliability toolkit around cohens_kappa_langid (2 raters,
nominal), fleiss_kappa_filters (n raters, complete data) and
cronbach_alpha (internal consistency of continuous items):

- ``krippendorff_alpha``: the missing-data generalization the kappa
  family cannot handle — the three ensemble quality raters
  (length / logistic / lang-marker, the quality_ensemble_vote predicates
  verbatim) each "annotate" only a deterministic ~70% subset of
  documents (md5 presence hash per rater), exactly the partial-coverage
  shape of real annotation campaigns.  Binary-nominal alpha reduces to
  exact integers: per pairable unit (>= 2 ratings present) the
  disagreement term 2*k(m-k)/(m-1) with m in {2,3} is ALWAYS an integer
  (k(2-k) in {0,1}, k(3-k) in {0,2}), so D_o, D_e and alpha are single
  float expressions of four exact counts.
- ``lin_ccc``: Lin's concordance correlation coefficient between two
  measurements of the same order — the order header total
  (o_totalprice) vs the lineitem-derived net total
  sum(extendedprice*(1-disc)*(1+tax)) — Pearson r scaled by the
  bias-correction factor C_b that penalizes location/scale shift, which
  plain correlation hides.  All five moments are exact decimal(38,0)
  cent folds; CCC = 2(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2 + n*Syy - Sy^2
  + (Sx - Sy)^2) is one float division.
- ``bland_altman``: the limits-of-agreement companion on the same
  measurement pair — mean difference, d_bar +/- 1.96 s_d, and the count
  of orders OUTSIDE the limits decided by the exact integer
  cross-multiplied test 625*(n*d_i - Sd)^2*(n-1) > 2401*n*(n*Sdd - Sd^2)
  (1.96 = 49/25 exactly, so 1.96^2 = 2401/625) — no float comparison
  can flip a boundary order between engines.  The exact test needs
  (n*d_i)^2 inside decimal(38,0): safe to ~1e9 orders x 1e7-cent
  deltas; past that, drop to the pico-rounded float comparison.
- ``icc_oneway``: ICC(1,1) one-way random-effects intraclass
  correlation on cronbach_alpha's IDENTICAL k=4 quarterly-spend panel —
  the variance-decomposition view (between/within mean squares) of the
  same reliability question, so the two statistics are directly
  comparable.  MSB/MSW assemble from the same eight exact moments.

Scale notes (100 TB): krippendorff is one projection + one 4-counter
fold; lin_ccc / bland_altman shuffle lineitem once on l_orderkey and
join orders on the same key (co-partitioned); icc_oneway is one
conditional-sum reduce of orders.  Nothing materializes above the
one-row moment frames except bland_altman's second pass, which re-reads
the per-order diff frame to flag outliers (a map-side broadcast
comparison, no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import (
    EN_STOPWORDS,
    LANG_MARKERS,
    md5_hash_long,
    n_tokens_ws,
    punct_ratio,
    stopword_hits,
)
from ..sources.tables import load_table
from .text_analysis import ENSEMBLE_MIN_WORDS, _QL_W, _sw_hits, _WORDS

QUERIES: dict = {}
ORACLES: dict = {}

_DEC = "decimal(38,0)"

KRIPP_COVERAGE = 7  # each rater annotates docs with md5 % 10 < 7 (~70%)


def krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, binary) over the three ensemble
    quality raters under deterministic partial coverage."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * sw_ratio
        + F.lit(_QL_W["punct"]) * punct_ratio(t)
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    any_lang = (
        F.greatest(*[stopword_hits(t, mk) for mk in LANG_MARKERS.values()]) > 0
    )
    votes = [
        (n_words >= ENSEMBLE_MIN_WORDS).cast("int"),
        (prob >= 0.5).cast("int"),
        any_lang.cast("int"),
    ]
    key = F.col("doc_id").cast("string")
    present = [
        (md5_hash_long(key, f"kra{r}") % 10 < KRIPP_COVERAGE).cast("int")
        for r in (1, 2, 3)
    ]
    per_doc = d.select(
        sum(present).alias("m"),
        sum(p * v for p, v in zip(present, votes)).alias("k"),
    ).filter(F.col("m") >= 2)
    # disagreement term 2*k*(m-k)/(m-1), exactly integral for m in {2,3}
    term = F.when(F.col("m") == 2, 2 * F.col("k") * (2 - F.col("k"))).otherwise(
        F.col("k") * (3 - F.col("k"))
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).cast(_DEC).alias("u"),
        F.sum(F.col("m").cast(_DEC)).alias("npv"),
        F.sum(F.col("k").cast(_DEC)).alias("nk"),
        F.sum(term.cast(_DEC)).alias("st"),
    )
    npv = F.col("npv").cast("double")
    nk = F.col("nk").cast("double")
    nd = (F.col("npv") - F.col("nk")).cast("double")
    d_o = F.col("st").cast("double") / npv
    d_e = 2.0 * nk * nd / (npv * (npv - 1.0))
    alpha = F.when(F.lit(True) & (nk > 0) & (nd > 0), 1.0 - d_o / d_e)
    return agg.select(
        F.col("u").cast("long").alias("n_units"),
        F.col("npv").cast("long").alias("n_values"),
        F.round(nk / npv, 6).alias("keep_share"),
        F.round(d_o, 6).alias("d_observed"),
        F.round(d_e, 6).alias("d_expected"),
        F.round(alpha, 6).alias("alpha"),
    )


def _kripp_oracle() -> str:
    any_lang = (
        "greatest("
        + ", ".join(_sw_hits(_WORDS, mk) for mk in LANG_MARKERS.values())
        + ") > 0"
    )
    z = f"""{_QL_W["bias"]}
            + {_QL_W["n_words"]} * len({_WORDS})
            + {_QL_W["sw_ratio"]} * ({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                                     / len({_WORDS}))
            + ({_QL_W["punct"]}) * (length(regexp_replace(text,
                    '[^.,!?;:]', '', 'g')) * 1.0 / length(text))"""
    pres = {
        r: f"""(CASE WHEN CAST('0x' || substr(md5('kra{r}' || doc_id), 1, 8)
                         AS BIGINT) % 10 < {KRIPP_COVERAGE}
                THEN 1 ELSE 0 END)"""
        for r in (1, 2, 3)
    }
    v1 = f"(CASE WHEN len({_WORDS}) >= {ENSEMBLE_MIN_WORDS} THEN 1 ELSE 0 END)"
    v2 = f"(CASE WHEN 1.0 / (1.0 + exp(-({z}))) >= 0.5 THEN 1 ELSE 0 END)"
    v3 = f"(CASE WHEN {any_lang} THEN 1 ELSE 0 END)"
    return f"""
    WITH per_doc AS (
        SELECT {pres[1]} + {pres[2]} + {pres[3]} AS m,
               {pres[1]} * {v1} + {pres[2]} * {v2} + {pres[3]} * {v3} AS k
        FROM documents
    ),
    pairable AS (SELECT * FROM per_doc WHERE m >= 2),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS u,
               CAST(sum(m) AS HUGEINT) AS npv,
               CAST(sum(k) AS HUGEINT) AS nk,
               CAST(sum(CASE WHEN m = 2 THEN 2 * k * (2 - k)
                             ELSE k * (3 - k) END) AS HUGEINT) AS st
        FROM pairable
    )
    SELECT CAST(u AS BIGINT) AS n_units, CAST(npv AS BIGINT) AS n_values,
           round(CAST(nk AS DOUBLE) / CAST(npv AS DOUBLE), 6) AS keep_share,
           round(CAST(st AS DOUBLE) / CAST(npv AS DOUBLE), 6) AS d_observed,
           round(2.0 * CAST(nk AS DOUBLE) * CAST(npv - nk AS DOUBLE)
                 / (CAST(npv AS DOUBLE) * (CAST(npv AS DOUBLE) - 1.0)), 6)
               AS d_expected,
           round(CASE WHEN nk > 0 AND npv - nk > 0 THEN
                 1.0 - (CAST(st AS DOUBLE) / CAST(npv AS DOUBLE))
                     / (2.0 * CAST(nk AS DOUBLE) * CAST(npv - nk AS DOUBLE)
                        / (CAST(npv AS DOUBLE) * (CAST(npv AS DOUBLE) - 1.0)))
                 END, 6) AS alpha
    FROM agg
"""


ORACLES["krippendorff_alpha"] = _kripp_oracle()
QUERIES["krippendorff_alpha"] = krippendorff_alpha


def _order_measurement_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order (x, y) cents: header total vs lineitem-derived net total.
    One shuffle on l_orderkey; the orders join lands on the same key."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("xc"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
            * 100
        )
        .cast("long")
        .alias("net_cents"),
    )
    derived = li.groupBy("l_orderkey").agg(F.sum("net_cents").alias("yc"))
    return o.join(derived, o.o_orderkey == derived.l_orderkey).select(
        "o_orderkey", "xc", "yc"
    )


_PAIR_SQL = """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS xc,
               yc
        FROM orders
        JOIN (SELECT l_orderkey,
                     sum(CAST(round(l_extendedprice * (1 - l_discount)
                                    * (1 + l_tax) * 100) AS BIGINT)) AS yc
              FROM lineitem GROUP BY 1) d
          ON o_orderkey = l_orderkey
"""


def lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation between the order header total and
    the lineitem-derived net total.

    Plan choice (VERDICT r8 #4, measured): the lineitem groupBy IS the
    per-order partial-moment pre-aggregation — only (x_i, y_i) pairing
    remains, which needs orderkey co-location either way.  The one
    further candidate — replacing the join with
    union(orders, lineitem) -> single groupBy(orderkey) (one exchange
    instead of two; map-side partial sum keeps shuffle volume equal) —
    was measured r9 and REJECTED: sf0.1 join 1.081s vs union 1.718s
    (min of 3, interleaved); 10x corpus join 1.618s vs union 1.533s
    (tie within noise).  The extra exchange the union saves is cheaper
    than the null-padded double-width rows it shuffles.  The prior
    bench_sf1 row (4.28s/4.65x) was host-noise-inflated: re-measured
    10x min is ~1.6s, ratio ~1.5 — fact-join-bound and sub-linear."""
    pair = _order_measurement_pair(spark, sf_dir)
    x, y = F.col("xc").cast(_DEC), F.col("yc").cast(_DEC)
    agg = pair.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    shift = (F.col("sx") - F.col("sy")).cast("double")
    r = cov / F.sqrt(vx * vy)
    ccc = 2.0 * cov / (vx + vy + shift * shift)
    nd = n.cast("double")
    return agg.select(
        n.cast("long").alias("n_orders"),
        F.round(F.col("sx").cast("double") / nd / 100.0, 2).alias("mean_header"),
        F.round(F.col("sy").cast("double") / nd / 100.0, 2).alias("mean_derived"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc, 6).alias("ccc"),
        F.round(ccc / r, 6).alias("bias_correction"),
    )


ORACLES["lin_ccc"] = f"""
    WITH pair AS ({_PAIR_SQL}),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(xc) AS HUGEINT) AS sx, CAST(sum(yc) AS HUGEINT) AS sy,
               CAST(sum(CAST(xc AS HUGEINT) * xc) AS HUGEINT) AS sxx,
               CAST(sum(CAST(yc AS HUGEINT) * yc) AS HUGEINT) AS syy,
               CAST(sum(CAST(xc AS HUGEINT) * yc) AS HUGEINT) AS sxy
        FROM pair
    ),
    parts AS (
        SELECT n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
               CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
               CAST(n * syy - sy * sy AS DOUBLE) AS vy,
               CAST(sx - sy AS DOUBLE) AS shift,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(sxd / CAST(n AS DOUBLE) / 100.0, 2) AS mean_header,
           round(syd / CAST(n AS DOUBLE) / 100.0, 2) AS mean_derived,
           round(cov / sqrt(vx * vy), 6) AS pearson_r,
           round(2.0 * cov / (vx + vy + shift * shift), 6) AS ccc,
           round((2.0 * cov / (vx + vy + shift * shift))
                 / (cov / sqrt(vx * vy)), 6) AS bias_correction
    FROM parts
"""
QUERIES["lin_ccc"] = lin_ccc


def bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman limits of agreement on the header-vs-derived order
    totals, with the outside-limits count decided by exact integers."""
    pair = _order_measurement_pair(spark, sf_dir).select(
        "o_orderkey", (F.col("xc") - F.col("yc")).alias("dc")
    )
    dd = F.col("dc").cast(_DEC)
    agg = pair.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(dd).alias("sd"),
        F.sum(dd * dd).alias("sdd"),
    )
    flagged = pair.crossJoin(F.broadcast(agg))
    n = F.col("n")
    dev = n * F.col("dc").cast(_DEC) - F.col("sd")  # n*d_i - Sd, exact
    varnum = n * F.col("sdd") - F.col("sd") * F.col("sd")  # n^2(n-1)/n * var
    outside = (
        F.lit(625).cast(_DEC) * dev * dev * (n - 1)
        > F.lit(2401).cast(_DEC) * n * varnum
    )
    out = flagged.agg(
        F.max(n).alias("nn"),
        F.max(F.col("sd")).alias("sdv"),
        F.max(F.col("sdd")).alias("sddv"),
        F.sum(outside.cast("long")).alias("n_outside"),
    )
    nd = F.col("nn").cast("double")
    mean_d = F.col("sdv").cast("double") / nd
    sd_d = F.sqrt(
        (F.col("nn") * F.col("sddv") - F.col("sdv") * F.col("sdv")).cast(
            "double"
        )
        / (nd * (nd - 1.0))
    )
    return out.select(
        F.col("nn").cast("long").alias("n_orders"),
        F.round(mean_d / 100.0, 4).alias("mean_diff"),
        F.round(sd_d / 100.0, 4).alias("sd_diff"),
        F.round((mean_d - 1.96 * sd_d) / 100.0, 4).alias("loa_low"),
        F.round((mean_d + 1.96 * sd_d) / 100.0, 4).alias("loa_high"),
        F.col("n_outside").cast("long").alias("n_outside"),
        F.round(F.col("n_outside") / nd * 100.0, 4).alias("pct_outside"),
    )


ORACLES["bland_altman"] = f"""
    WITH pair AS (
        SELECT o_orderkey, xc - yc AS dc FROM ({_PAIR_SQL})
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(dc) AS HUGEINT) AS sd,
               CAST(sum(CAST(dc AS HUGEINT) * dc) AS HUGEINT) AS sdd
        FROM pair
    ),
    flags AS (
        SELECT n, sd, sdd,
               CASE WHEN 625 * (n * dc - sd) * (n * dc - sd) * (n - 1)
                         > 2401 * n * (n * sdd - sd * sd)
                    THEN 1 ELSE 0 END AS outside
        FROM pair, agg
    ),
    o AS (
        SELECT max(n) AS n, max(sd) AS sd, max(sdd) AS sdd,
               CAST(sum(outside) AS BIGINT) AS n_outside
        FROM flags
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
               AS mean_diff,
           round(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 / 100.0, 4) AS sd_diff,
           round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
                  - 1.96 * sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
                 / 100.0, 4) AS loa_low,
           round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)
                  + 1.96 * sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
                 / 100.0, 4) AS loa_high,
           n_outside,
           round(CAST(n_outside AS DOUBLE) / CAST(n AS DOUBLE) * 100.0, 4)
               AS pct_outside
    FROM o
"""
QUERIES["bland_altman"] = bland_altman


ICC_YEAR = 1997  # cronbach_alpha's CRONBACH_YEAR, pinned independently


def icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1,1) one-way random-effects intraclass correlation on the
    k=4 quarterly-spend panel (cronbach_alpha's exact frame)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == ICC_YEAR
    )
    q = F.quarter("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    panel = o.groupBy("o_custkey").agg(
        *[
            F.sum(F.when(q == i, cents).otherwise(0)).cast(_DEC).alias(f"s{i}")
            for i in (1, 2, 3, 4)
        ]
    )
    tot = sum(F.col(f"s{i}") for i in (1, 2, 3, 4))
    sq = sum(F.col(f"s{i}") * F.col(f"s{i}") for i in (1, 2, 3, 4))
    agg = panel.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(tot).alias("g"),
        F.sum(tot * tot).alias("vt"),
        F.sum(sq).alias("syy"),
    )
    n = F.col("n")
    nd = n.cast("double")
    # MSB = (n*vt - g^2) / (4n(n-1)); MSW = (4*syy - vt) / (12n); cents^2
    msb = (n * F.col("vt") - F.col("g") * F.col("g")).cast("double") / (
        4.0 * nd * (nd - 1.0)
    )
    msw = (4 * F.col("syy") - F.col("vt")).cast("double") / (12.0 * nd)
    icc = (msb - msw) / (msb + 3.0 * msw)
    return agg.select(
        n.cast("long").alias("n_subjects"),
        F.lit(4).cast("int").alias("k_items"),
        F.round(icc, 6).alias("icc1"),
        F.round(msb / msw, 6).alias("f_stat"),
        F.round(msb / 10000.0, 2).alias("ms_between"),
        F.round(msw / 10000.0, 2).alias("ms_within"),
    )


ORACLES["icc_oneway"] = f"""
    WITH panel AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 1
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s1,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 2
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s2,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 3
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s3,
               CAST(sum(CASE WHEN quarter(CAST(o_orderdate AS DATE)) = 4
                    THEN CAST(round(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS HUGEINT) AS s4
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = {ICC_YEAR}
        GROUP BY 1
    ),
    agg AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(s1 + s2 + s3 + s4) AS g,
               sum((s1 + s2 + s3 + s4) * (s1 + s2 + s3 + s4)) AS vt,
               sum(s1 * s1 + s2 * s2 + s3 * s3 + s4 * s4) AS syy
        FROM panel
    ),
    parts AS (
        SELECT n,
               CAST(n * vt - g * g AS DOUBLE)
                   / (4.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                   AS msb,
               CAST(4 * syy - vt AS DOUBLE) / (12.0 * CAST(n AS DOUBLE))
                   AS msw
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_subjects, CAST(4 AS INTEGER) AS k_items,
           round((msb - msw) / (msb + 3.0 * msw), 6) AS icc1,
           round(msb / msw, 6) AS f_stat,
           round(msb / 10000.0, 2) AS ms_between,
           round(msw / 10000.0, 2) AS ms_within
    FROM parts
"""
QUERIES["icc_oneway"] = icc_oneway
