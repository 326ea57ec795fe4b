"""Model-evaluation / drift-monitoring operators (DRIVER surface).

The training-data pipeline ships classifiers (lang-id, quality logit) and
needs the standard evaluation loop next to them: confusion-matrix metrics,
exact AUC, calibration, and population-stability drift.  Everything here is
a small fixed-cardinality result computed from one or two corpus-sized
aggregations — the shape that stays cheap at 100 TB:

- ``classifier_eval_langid``: the confusion matrix is a
  (n_classes x n_classes) groupBy — map-side combined down to <= 25 cells
  regardless of corpus size; per-class precision/recall/F1 are joins over
  that tiny frame.
- ``auc_roc_quality``: exact Mann-Whitney AUC with tie handling.  Scores
  are 4-decimal-rounded probabilities, so the tie-group frame is bounded
  by the score grid (<= 10,001 rows AT ANY SCALE) — the cumulative-rank
  window runs on that bounded frame, never on N rows.  Rank sums use
  decimal(38,0) so the statistic is exact far past 2^53 rows.
- ``calibration_bins``: decile reliability diagram; per-bin mean predicted
  probability is computed over integer ten-thousandths (exact sums, one
  final division) so the result is bit-identical under any partitioning.
- ``psi_drift``: Population Stability Index between the even/odd
  ``event_id`` halves of ``events`` over 10 equal-width value bins derived
  from the reference half's min/max (exact data values — no interpolated
  quantile boundaries, so bin edges are bit-identical across engines);
  +1/+10 Laplace smoothing keeps every bin term finite.

Float parity: every division has exact-integer operands on both engines
(one IEEE division → identical doubles); ln/exp on identical doubles are
identical; the only reassociating sums are over exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texts import EN_STOPWORDS, n_tokens_ws, punct_ratio, stopword_hits
from ..sources.tables import load_table
from .text_analysis import _QL_W, _WORDS, _lang_id_sql, _sw_hits, lang_id

POS_LANG = "en"  # binary-task positive class: the majority corpus language


def _prob_keep(t):
    """The quality_logit_score probability (same expression shape, so both
    engines compute bit-identical doubles — see text_analysis)."""
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * sw_ratio
        + F.lit(_QL_W["punct"]) * punct_ratio(t)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


_Z_SQL = f"""{_QL_W["bias"]}
               + {_QL_W["n_words"]} * len({_WORDS})
               + {_QL_W["sw_ratio"]} * ({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                                        / len({_WORDS}))
               + ({_QL_W["punct"]}) * (length(regexp_replace(text,
                       '[^.,!?;:]', '', 'g')) * 1.0 / length(text))"""


def classifier_eval_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the lang_id heuristic against
    the declared ``lang`` column — the standard multi-class evaluation
    over the confusion matrix.

    Scale: ONE corpus aggregation down to the (declared, predicted) cell
    frame (<= n_classes^2 rows, map-side combined); all metric arithmetic
    runs on that tiny frame.  Zero-support guards: precision/recall/F1
    are 0.0 when their denominator is empty (e.g. a class never
    predicted), mirrored exactly in the oracle.
    """
    # materialize the n_classes^2 cell frame once: four consumers
    # (true/pred margins, tp filter, the classes union) each re-ran the
    # corpus lang_id aggregation — 5 documents scans in the r12 before
    # plan; solo A/B at matched canaries 1.58/1.57 -> 1.13/1.23 s (r12)
    conf = (
        lang_id(spark, sf_dir)
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    true_tot = conf.groupBy(F.col("declared_lang").alias("class")).agg(
        F.sum("n").alias("n_true")
    )
    pred_tot = conf.groupBy(F.col("predicted_lang").alias("class")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = conf.filter(F.col("declared_lang") == F.col("predicted_lang")).select(
        F.col("declared_lang").alias("class"), F.col("n").alias("tp")
    )
    classes = true_tot.select("class").union(pred_tot.select("class")).distinct()
    m = (
        classes.join(true_tot, "class", "left")
        .join(pred_tot, "class", "left")
        .join(tp, "class", "left")
        .select(
            "class",
            F.coalesce("n_true", F.lit(0)).cast("bigint").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(
        F.lit(0.0)
    )
    rec = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true")).otherwise(
        F.lit(0.0)
    )
    return m.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("n_true") - F.col("tp")).cast("bigint").alias("fn"),
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(
            F.when(prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)).otherwise(
                F.lit(0.0)
            ),
            4,
        ).alias("f1"),
    )


def _eval_oracle() -> str:
    return f"""
        WITH pred AS ({_lang_id_sql()}),
        conf AS (
            SELECT declared_lang, predicted_lang, count(*) AS n
            FROM pred GROUP BY 1, 2
        ),
        tt AS (SELECT declared_lang AS class, sum(n) AS n_true
               FROM conf GROUP BY 1),
        pt AS (SELECT predicted_lang AS class, sum(n) AS n_pred
               FROM conf GROUP BY 1),
        tp AS (SELECT declared_lang AS class, n AS tp FROM conf
               WHERE declared_lang = predicted_lang),
        cls AS (SELECT class FROM tt UNION SELECT class FROM pt),
        m AS (
            SELECT c.class,
                   CAST(coalesce(n_true, 0) AS BIGINT) AS n_true,
                   CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
                   CAST(coalesce(tp, 0) AS BIGINT) AS tp
            FROM cls c
            LEFT JOIN tt ON c.class = tt.class
            LEFT JOIN pt ON c.class = pt.class
            LEFT JOIN tp ON c.class = tp.class
        )
        SELECT class, n_true, n_pred, tp,
               CAST(n_pred - tp AS BIGINT) AS fp,
               CAST(n_true - tp AS BIGINT) AS fn,
               round(CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred
                          ELSE 0.0 END, 4) AS precision,
               round(CASE WHEN n_true > 0 THEN tp * 1.0 / n_true
                          ELSE 0.0 END, 4) AS recall,
               round(CASE WHEN (CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred
                                     ELSE 0.0 END)
                          + (CASE WHEN n_true > 0 THEN tp * 1.0 / n_true
                                  ELSE 0.0 END) > 0
                     THEN 2.0 * (CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred
                                      ELSE 0.0 END)
                          * (CASE WHEN n_true > 0 THEN tp * 1.0 / n_true
                                  ELSE 0.0 END)
                          / ((CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred
                                   ELSE 0.0 END)
                             + (CASE WHEN n_true > 0 THEN tp * 1.0 / n_true
                                     ELSE 0.0 END))
                     ELSE 0.0 END, 4) AS f1
        FROM m
    """


def auc_roc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the quality-logit probability as a predictor of
    ``lang == POS_LANG``, via the tie-corrected Mann-Whitney rank sum:

        AUC = (sum of average ranks of positives - P(P+1)/2) / (P * N)

    Scores round to 4 decimals FIRST (the published score of
    quality_logit_score), so distinct scores — and hence the rank window —
    are bounded by the 10^4 score grid at any corpus size.  Average ranks
    are kept doubled (2*cum - n + 1: always an integer) and summed in
    decimal(38,0), so the statistic is exact beyond 2^53 rows; the single
    final division is the only float op.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.round(_prob_keep(F.col("text")), 4).alias("score"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    g = scored.groupBy("score").agg(
        F.sum("y").alias("npos"), F.count(F.lit(1)).alias("ntot")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    g2 = g.withColumn("cumtot", F.sum("ntot").over(w))
    # doubled average rank of the tie group: 2*(cum_before) + ntot + 1
    rank2 = (F.lit(2) * F.col("cumtot") - F.col("ntot") + F.lit(1)).cast(
        "decimal(38,0)"
    )
    t = g2.agg(
        F.sum(F.col("npos").cast("decimal(38,0)") * rank2).alias("sum_rank2"),
        F.sum("npos").cast("decimal(38,0)").alias("p"),
        F.sum("ntot").cast("decimal(38,0)").alias("n"),
    )
    num = F.col("sum_rank2") - F.col("p") * (F.col("p") + 1)
    den = F.lit(2) * F.col("p") * (F.col("n") - F.col("p"))
    return t.select(
        F.col("p").cast("bigint").alias("n_pos"),
        (F.col("n") - F.col("p")).cast("bigint").alias("n_neg"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("auc"),
    )


_AUC_ORACLE = f"""
    WITH scored AS (
        SELECT round(1.0 / (1.0 + exp(-z)), 4) AS score,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT lang, {_Z_SQL} AS z FROM documents)
    ),
    g AS (SELECT score, sum(y) AS npos, count(*) AS ntot
          FROM scored GROUP BY 1),
    g2 AS (SELECT npos, ntot,
                  sum(ntot) OVER (ORDER BY score
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cumtot
           FROM g),
    t AS (SELECT sum(npos * (2 * cumtot - ntot + 1)) AS sum_rank2,
                 sum(npos) AS p, sum(ntot) AS n
          FROM g2)
    SELECT CAST(p AS BIGINT) AS n_pos,
           CAST(n - p AS BIGINT) AS n_neg,
           round(CAST(sum_rank2 - p * (p + 1) AS DOUBLE)
                 / CAST(2 * p * (n - p) AS DOUBLE), 6) AS auc
    FROM t
"""


CAL_BINS = 10


def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality-logit probability against
    ``lang == POS_LANG``: CAL_BINS equal-width probability bins, each with
    document count, mean predicted probability, and observed positive
    rate — the calibration audit run before trusting a filter model's
    scores as sampling weights.

    Exactness: the 4-decimal score becomes an integer count of
    ten-thousandths before summing, so the per-bin mean is a single
    division of exact integers — bit-identical under any partitioning.
    """
    d = load_table(spark, sf_dir, "documents")
    p4 = F.round(_prob_keep(F.col("text")), 4)
    scored = d.select(
        F.round(p4 * 10000).cast("long").alias("pi"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    b = scored.withColumn(
        "bin",
        F.least(F.floor(F.col("pi") / (10000 / CAL_BINS)), F.lit(CAL_BINS - 1))
        .cast("bigint"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pi").alias("spi"),
            F.sum("y").alias("sy"),
        )
        .select(
            "bin",
            "n_docs",
            F.round(F.col("spi") / (F.lit(10000.0) * F.col("n_docs")), 4).alias(
                "avg_pred"
            ),
            F.round(F.col("sy") / F.col("n_docs"), 4).alias("obs_rate"),
        )
    )


_CAL_ORACLE = f"""
    WITH scored AS (
        SELECT CAST(round(round(1.0 / (1.0 + exp(-z)), 4) * 10000, 0)
                    AS BIGINT) AS pi,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT lang, {_Z_SQL} AS z FROM documents)
    ),
    b AS (SELECT least(pi // (10000 // {CAL_BINS}), {CAL_BINS - 1}) AS bin,
                 pi, y
          FROM scored)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(pi) / (10000.0 * count(*)), 4) AS avg_pred,
           round(sum(y) * 1.0 / count(*), 4) AS obs_rate
    FROM b GROUP BY 1
"""


PSI_BINS = 10


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the ``events.value`` distribution
    between the even-``event_id`` reference half and the odd current half
    (an A/A-style monitoring audit; in production the split key is a time
    boundary and the same plan applies).

    Bin edges are PSI_BINS equal widths over the REFERENCE half's
    [min, max] — exact data values, so edges are bit-identical across
    engines (no interpolated quantiles); out-of-range current values clamp
    into the edge bins.  +1 / +PSI_BINS Laplace smoothing keeps every
    term finite even for empty bins.

    Scale: one min/max aggregate (broadcast back), one bin-keyed count —
    both map-side combined; the result is always PSI_BINS rows.
    """
    e = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 2 == 0).alias("is_ref"), "value"
    )
    stats = e.filter("is_ref").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(PSI_BINS))
    binned = e.crossJoin(F.broadcast(stats)).select(
        "is_ref",
        F.least(
            F.greatest(F.floor((F.col("value") - F.col("mn")) / width), F.lit(0)),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    c = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("cur_n"),
    )
    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    tot = c.agg(F.sum("ref_n").alias("rt"), F.sum("cur_n").alias("ct"))
    full = (
        bins.join(c, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).cast("bigint").alias("cur_n"),
            "rt",
            "ct",
        )
    )
    pr = (F.col("ref_n") + 1) / (F.col("rt") + PSI_BINS)
    pc = (F.col("cur_n") + 1) / (F.col("ct") + PSI_BINS)
    return full.select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((pr - pc) * F.log(pr / pc), 6).alias("psi_term"),
    )


_PSI_ORACLE = f"""
    WITH e AS (SELECT event_id % 2 = 0 AS is_ref, value FROM events),
    s AS (SELECT min(value) AS mn, max(value) AS mx FROM e WHERE is_ref),
    binned AS (
        SELECT is_ref,
               least(greatest(CAST(floor((value - mn)
                                          / ((mx - mn) / {float(PSI_BINS)}))
                                   AS BIGINT), 0), {PSI_BINS - 1}) AS bin
        FROM e, s
    ),
    c AS (SELECT bin,
                 sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                 sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_n
          FROM binned GROUP BY 1),
    bins AS (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin),
    t AS (SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM c)
    SELECT CAST(b.bin AS BIGINT) AS bin,
           CAST(coalesce(ref_n, 0) AS BIGINT) AS ref_n,
           CAST(coalesce(cur_n, 0) AS BIGINT) AS cur_n,
           round(((coalesce(ref_n, 0) + 1) * 1.0 / (rt + {PSI_BINS})
                  - (coalesce(cur_n, 0) + 1) * 1.0 / (ct + {PSI_BINS}))
                 * ln(((coalesce(ref_n, 0) + 1) * 1.0 / (rt + {PSI_BINS}))
                      / ((coalesce(cur_n, 0) + 1) * 1.0
                         / (ct + {PSI_BINS}))), 6) AS psi_term
    FROM bins b LEFT JOIN c ON b.bin = c.bin CROSS JOIN t
"""


QUERIES = {
    "classifier_eval_langid": classifier_eval_langid,
    "auc_roc_quality": auc_roc_quality,
    "calibration_bins": calibration_bins,
    "psi_drift": psi_drift,
}

ORACLES = {
    "classifier_eval_langid": _eval_oracle(),
    "auc_roc_quality": _AUC_ORACLE,
    "calibration_bins": _CAL_ORACLE,
    "psi_drift": _PSI_ORACLE,
}


# --------------------------------------------------------------------------
# round-5 restarted-session wave B: PR metrics, agreement tests, isotonic
# --------------------------------------------------------------------------


def average_precision_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve by the
    step rule) of the quality-logit probability as a ranker of
    ``lang == POS_LANG`` — the imbalanced-class companion of
    auc_roc_quality: AP = sum over descending score groups of
    (delta recall) * precision-at-threshold.

    Exactness: the score grid argument of auc_roc_quality bounds the
    group frame (<= 10,001 rows at ANY corpus size); TP/FP cumulatives
    are exact integers; per-group term floats fold via an ORDER-PINNED
    cumulative sum (kaplan_meier pattern).
    """
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.round(_prob_keep(F.col("text")), 4).alias("score"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    g = scored.groupBy("score").agg(
        F.sum("y").alias("npos"), F.count(F.lit(1)).alias("ntot")
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = g.agg(F.sum("npos").alias("p"), F.sum("ntot").alias("n"))
    folded = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("cumpos", F.sum("npos").over(w))
        .withColumn("cumtot", F.sum("ntot").over(w))
        .withColumn(
            "term",
            F.col("npos").cast("double")
            / F.col("p").cast("double")
            * (F.col("cumpos").cast("double") / F.col("cumtot").cast("double")),
        )
        .withColumn("ap", F.sum("term").over(w))
        .withColumn("rows_seen", F.count(F.lit(1)).over(w))
    )
    last = folded.orderBy(F.col("rows_seen").desc()).limit(1)
    return last.select(
        F.col("p").cast("bigint").alias("n_pos"),
        F.col("n").cast("bigint").alias("n_total"),
        F.round(F.col("p").cast("double") / F.col("n").cast("double"), 4).alias(
            "prevalence"
        ),
        F.round("ap", 4).alias("average_precision"),
    )


_AP_ORACLE = f"""
    WITH scored AS (
        SELECT round(1.0 / (1.0 + exp(-z)), 4) AS score,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT lang, {_Z_SQL} AS z FROM documents)
    ),
    g AS (SELECT score, sum(y) AS npos, count(*) AS ntot
          FROM scored GROUP BY 1),
    tot AS (SELECT sum(npos) AS p, sum(ntot) AS n FROM g),
    terms AS (
        SELECT score, p, n,
               CAST(npos AS DOUBLE) / CAST(p AS DOUBLE)
                 * (CAST(sum(npos) OVER wd AS DOUBLE)
                    / CAST(sum(ntot) OVER wd AS DOUBLE)) AS term
        FROM g, tot
        WINDOW wd AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    folded AS (
        SELECT p, n,
               sum(term) OVER wd AS ap,
               count(*) OVER wd AS rows_seen
        FROM terms
        WINDOW wd AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    last AS (SELECT * FROM folded ORDER BY rows_seen DESC LIMIT 1)
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_total,
           round(CAST(p AS DOUBLE) / CAST(n AS DOUBLE), 4) AS prevalence,
           round(ap, 4) AS average_precision
    FROM last
"""


def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the lang_id heuristic and the declared
    language — chance-corrected agreement over the confusion matrix:
    kappa = (N * sum tp - sum n_true*n_pred) / (N^2 - sum n_true*n_pred).

    Exactness: both numerator and denominator are exact decimal(38,0)
    integers from the n_classes^2 cell frame; one final division.
    """
    # same cell-frame cut as classifier_eval_langid (5 documents scans
    # before; solo A/B 1.23/1.15 -> 1.06/1.13 s, r12)
    conf = (
        lang_id(spark, sf_dir)
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tt = conf.groupBy(F.col("declared_lang").alias("cls")).agg(
        F.sum("n").alias("n_true")
    )
    pt = conf.groupBy(F.col("predicted_lang").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )
    classes = tt.select("cls").union(pt.select("cls")).distinct()
    marg = (
        classes.join(tt, "cls", "left")
        .join(pt, "cls", "left")
        .agg(
            F.sum(
                F.coalesce("n_true", F.lit(0)).cast("decimal(38,0)")
                * F.coalesce("n_pred", F.lit(0)).cast("decimal(38,0)")
            ).alias("chance")
        )
    )
    agree = conf.agg(
        F.sum(
            F.when(F.col("declared_lang") == F.col("predicted_lang"), F.col("n"))
            .otherwise(0)
        ).alias("n_agree"),
        F.sum("n").alias("n"),
    )
    n = F.col("n").cast("decimal(38,0)")
    kappa = (
        (n * F.col("n_agree").cast("decimal(38,0)") - F.col("chance")).cast("double")
        / (n * n - F.col("chance")).cast("double")
    )
    return agree.crossJoin(F.broadcast(marg)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("n_agree").cast("bigint").alias("n_agree"),
        F.round(F.col("n_agree").cast("double") / F.col("n").cast("double"), 4)
        .alias("observed_agreement"),
        F.round(F.col("chance").cast("double") / (n * n).cast("double"), 4)
        .alias("chance_agreement"),
        F.round(kappa, 4).alias("kappa"),
    )


def _kappa_oracle() -> str:
    return f"""
        WITH pred AS ({_lang_id_sql()}),
        conf AS (SELECT declared_lang, predicted_lang, count(*) AS n
                 FROM pred GROUP BY 1, 2),
        tt AS (SELECT declared_lang AS cls, sum(n) AS n_true
               FROM conf GROUP BY 1),
        pt AS (SELECT predicted_lang AS cls, sum(n) AS n_pred
               FROM conf GROUP BY 1),
        cls AS (SELECT cls FROM tt UNION SELECT cls FROM pt),
        marg AS (
            SELECT sum(coalesce(n_true, 0) * coalesce(n_pred, 0)) AS chance
            FROM cls c LEFT JOIN tt ON c.cls = tt.cls
            LEFT JOIN pt ON c.cls = pt.cls
        ),
        agree AS (
            SELECT sum(CASE WHEN declared_lang = predicted_lang THEN n
                            ELSE 0 END) AS n_agree,
                   sum(n) AS n
            FROM conf
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               CAST(n_agree AS BIGINT) AS n_agree,
               round(CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE), 4)
                 AS observed_agreement,
               round(CAST(chance AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4)
                 AS chance_agreement,
               round(CAST(n * n_agree - chance AS DOUBLE)
                     / CAST(n * n - chance AS DOUBLE), 4) AS kappa
        FROM agree, marg
    """


def mcnemar_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) comparing two binary quality
    filters on the same documents against the ``lang == POS_LANG`` truth:
    filter A keeps when the quality logit is non-negative (prob >= 0.5
    <=> z >= 0); filter B keeps when the stopword ratio >= 0.3.  The test
    uses only the discordant counts b (A right, B wrong) and c (A wrong,
    B right): chi2 = (|b - c| - 1)^2 / (b + c).

    Exactness: both decision thresholds are exact-integer comparisons
    (z >= 0 on identical doubles; hits*10 >= 3*n_words), so b and c are
    exact counts; the statistic is one scalar expression.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    z = (
        F.lit(_QL_W["bias"])
        + F.lit(_QL_W["n_words"]) * n_words
        + F.lit(_QL_W["sw_ratio"]) * (stopword_hits(t, EN_STOPWORDS) / n_words)
        + F.lit(_QL_W["punct"]) * punct_ratio(t)
    )
    scored = d.select(
        (F.col("lang") == POS_LANG).alias("truth"),
        (z >= 0).alias("pa"),
        (stopword_hits(t, EN_STOPWORDS) * 10 >= 3 * n_words).alias("pb"),
    )
    cnt = scored.agg(
        F.sum(
            F.when((F.col("pa") == F.col("truth")) & (F.col("pb") != F.col("truth")),
                   1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("pa") != F.col("truth")) & (F.col("pb") == F.col("truth")),
                   1).otherwise(0)
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    bd, cd = F.col("b").cast("double"), F.col("c").cast("double")
    chi2 = F.when(
        F.col("b") + F.col("c") > 0,
        (F.abs(bd - cd) - 1) * (F.abs(bd - cd) - 1) / (bd + cd),
    ).otherwise(F.lit(0.0))
    return cnt.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("b").cast("bigint").alias("a_only_right"),
        F.col("c").cast("bigint").alias("b_only_right"),
        F.round(chi2, 4).alias("chi2"),
    )


_MCNEMAR_ORACLE = f"""
    WITH scored AS (
        SELECT lang = '{POS_LANG}' AS truth,
               z >= 0 AS pa,
               {_sw_hits(_WORDS, EN_STOPWORDS)} * 10
                 >= 3 * len({_WORDS}) AS pb
        FROM (SELECT lang, text, {_Z_SQL} AS z FROM documents)
    ),
    cnt AS (
        SELECT sum(CASE WHEN pa = truth AND pb != truth THEN 1 ELSE 0 END)
                 AS b,
               sum(CASE WHEN pa != truth AND pb = truth THEN 1 ELSE 0 END)
                 AS c,
               count(*) AS n
        FROM scored
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(b AS BIGINT) AS a_only_right,
           CAST(c AS BIGINT) AS b_only_right,
           round(CASE WHEN b + c > 0
                 THEN (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)
                      * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)
                      / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))
                 ELSE 0.0 END, 4) AS chi2
    FROM cnt
"""


def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) recalibration of the reliability diagram: the
    monotone fit over calibration_bins' observed rates via the exact
    minimax identity fit_b = max_{i<=b} min_{j>=b} avg(y over bins i..j)
    — the closed form of pool-adjacent-violators, computable as a
    triangular join over the CAL_BINS-row frame (never over documents).

    Exactness: interval averages are single divisions of exact integer
    cumulatives; min/max over those doubles are order-free.
    """
    d = load_table(spark, sf_dir, "documents")
    p4 = F.round(_prob_keep(F.col("text")), 4)
    scored = d.select(
        F.round(p4 * 10000).cast("long").alias("pi"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    binned = scored.withColumn(
        "bin",
        F.least(F.floor(F.col("pi") / (10000 / CAL_BINS)), F.lit(CAL_BINS - 1))
        .cast("bigint"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.withColumn("cn", F.sum("n").over(wb)).withColumn(
        "cs", F.sum("sy").over(wb)
    )
    lo = cum.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn_lo"),
        (F.col("cs") - F.col("sy")).alias("cs_lo"),
    )
    hi = cum.select(
        F.col("bin").alias("j"), F.col("cn").alias("cn_hi"),
        F.col("cs").alias("cs_hi"),
    )
    # bin-frame triangular join: CAL_BINS^3 candidate rows at most (~1000)
    spans = (
        lo.crossJoin(F.broadcast(hi))
        .filter(F.col("i") <= F.col("j"))
        .withColumn(
            "avg_ij",
            (F.col("cs_hi") - F.col("cs_lo")).cast("double")
            / (F.col("cn_hi") - F.col("cn_lo")).cast("double"),
        )
    )
    b = cum.select(F.col("bin").alias("b"), "n", "sy")
    fit = (
        b.join(
            F.broadcast(spans),
            (F.col("i") <= F.col("b")) & (F.col("b") <= F.col("j")),
        )
        .groupBy("b", "i")
        .agg(F.first("n").alias("n"), F.first("sy").alias("sy"),
             F.min("avg_ij").alias("min_j"))
        .groupBy("b")
        .agg(F.first("n").alias("n"), F.first("sy").alias("sy"),
             F.max("min_j").alias("iso"))
    )
    return fit.select(
        F.col("b").cast("bigint").alias("bin"),
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("sy").cast("double") / F.col("n").cast("double"), 4)
        .alias("raw_rate"),
        F.round("iso", 4).alias("iso_rate"),
    )


_ISO_ORACLE = f"""
    WITH scored AS (
        SELECT CAST(round(round(1.0 / (1.0 + exp(-z)), 4) * 10000, 0)
                    AS BIGINT) AS pi,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT lang, {_Z_SQL} AS z FROM documents)
    ),
    g AS (
        SELECT least(pi // (10000 // {CAL_BINS}), {CAL_BINS - 1}) AS bin,
               count(*) AS n, sum(y) AS sy
        FROM scored GROUP BY 1
    ),
    cum AS (
        SELECT bin, n, sy,
               sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cn,
               sum(sy) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cs
        FROM g
    ),
    spans AS (
        SELECT lo.bin AS i, hi.bin AS j,
               CAST(hi.cs - (lo.cs - lo.sy) AS DOUBLE)
               / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS avg_ij
        FROM cum lo, cum hi WHERE lo.bin <= hi.bin
    ),
    fit AS (
        SELECT b.bin AS b, any_value(b.n) AS n, any_value(b.sy) AS sy,
               max(min_j) AS iso
        FROM (
            SELECT c.bin, c.n, c.sy, s.i, min(s.avg_ij) AS min_j
            FROM cum c JOIN spans s ON s.i <= c.bin AND c.bin <= s.j
            GROUP BY 1, 2, 3, 4
        ) b
        GROUP BY 1
    )
    SELECT CAST(b AS BIGINT) AS bin, CAST(n AS BIGINT) AS n_docs,
           round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 4) AS raw_rate,
           round(iso, 4) AS iso_rate
    FROM fit
"""


QUERIES["average_precision_quality"] = average_precision_quality
QUERIES["cohens_kappa_langid"] = cohens_kappa_langid
QUERIES["mcnemar_quality_filters"] = mcnemar_quality_filters
QUERIES["isotonic_calibration"] = isotonic_calibration
ORACLES["average_precision_quality"] = _AP_ORACLE
ORACLES["cohens_kappa_langid"] = _kappa_oracle()
ORACLES["mcnemar_quality_filters"] = _MCNEMAR_ORACLE
ORACLES["isotonic_calibration"] = _ISO_ORACLE


GAINS_DECILES = 10


def decile_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table for the quality-logit ranking of
    ``lang == POS_LANG``: documents ranked by score into
    GAINS_DECILES ntiles, each reporting cumulative capture rate and
    lift over prevalence — the campaign-targeting view of
    average_precision_quality.

    Determinism: the ntile orders by (4-decimal score DESC, doc_id) —
    fully tie-broken, so decile membership is identical across engines;
    cumulative sums are exact integers folded over the 10-row frame.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.round(_prob_keep(F.col("text")), 4).alias("score"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    wn = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    binned = scored.withColumn("decile", F.ntile(GAINS_DECILES).over(wn))
    g = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = g.agg(F.sum("n").alias("tn"), F.sum("pos").alias("tp"))
    cum = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("cn", F.sum("n").over(wc))
        .withColumn("cp", F.sum("pos").over(wc))
    )
    capture = F.col("cp").cast("double") / F.col("tp").cast("double")
    lift = (F.col("cp").cast("double") / F.col("cn").cast("double")) / (
        F.col("tp").cast("double") / F.col("tn").cast("double")
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("pos").cast("bigint").alias("n_pos"),
        F.round(capture, 4).alias("cum_capture"),
        F.round(lift, 4).alias("cum_lift"),
    )


_GAINS_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT doc_id, lang, {_Z_SQL} AS z FROM documents)
    ),
    binned AS (
        SELECT y, ntile({GAINS_DECILES}) OVER (ORDER BY score DESC,
                                               doc_id ASC) AS decile
        FROM scored
    ),
    g AS (SELECT decile, count(*) AS n, sum(y) AS pos
          FROM binned GROUP BY 1),
    tot AS (SELECT sum(n) AS tn, sum(pos) AS tp FROM g),
    cum AS (
        SELECT decile, n, pos, tn, tp,
               sum(n) OVER wc AS cn, sum(pos) OVER wc AS cp
        FROM g, tot
        WINDOW wc AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    )
    SELECT CAST(decile AS INT) AS decile, CAST(n AS BIGINT) AS n_docs,
           CAST(pos AS BIGINT) AS n_pos,
           round(CAST(cp AS DOUBLE) / tp, 4) AS cum_capture,
           round((CAST(cp AS DOUBLE) / cn) / (CAST(tp AS DOUBLE) / tn), 4)
             AS cum_lift
    FROM cum
"""

QUERIES["decile_gains_table"] = decile_gains_table
ORACLES["decile_gains_table"] = _GAINS_ORACLE


# --------------------------------------------------------------------------
# kfold_cv_rmse — hash-fold cross-validation of a groupwise-mean predictor
# --------------------------------------------------------------------------

CV_FOLDS = 5


def kfold_cv_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated RMSE of the per-order-priority mean-price
    predictor.  Folds are md5-hash buckets of ``o_orderkey`` (stable under
    reruns and incremental arrivals, unlike randomSplit); the out-of-fold
    training mean for cell (group g, fold f) is (S_g - S_gf)/(n_g - n_gf),
    so training sums are read off the SAME 25-cell aggregate — no second
    scan and no per-row residual materialization.

    Exactness: per-cell sum/count/sum-of-squares accumulate in
    decimal(38,0) cents; the fold SSE uses the algebraic identity
    sum((y - m)^2) = SS - 2*m*S + n*m^2 per cell (scalar float ops on
    exact-integer-derived doubles), and the over-cells reduction is an
    ORDER-PINNED cumulative sum on the 25-row frame, so both engines add
    in the identical sequence.  Since every SSE term is >= 0 the fold
    total is max(cumulative).

    Scale: ONE map-side-combined groupBy to g x f cells; everything after
    runs on that bounded frame.
    """
    o = load_table(spark, sf_dir, "orders")
    from ..functions.texts import md5_hash_long

    cells = (
        o.select(
            F.col("o_orderpriority").alias("g"),
            (md5_hash_long(F.col("o_orderkey").cast("string"), "cv") % CV_FOLDS)
            .cast("int")
            .alias("f"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("g", "f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
            ).alias("ss"),
        )
    )
    wg = Window.partitionBy("g")
    t = cells.select(
        "g",
        "f",
        "n",
        "s",
        "ss",
        F.sum("n").over(wg).alias("n_g"),
        F.sum("s").over(wg).alias("s_g"),
    )
    m = (F.col("s_g") - F.col("s")).cast("double") / (
        F.col("n_g") - F.col("n")
    ).cast("double")
    sse = (
        F.col("ss").cast("double")
        - F.lit(2.0) * m * F.col("s").cast("double")
        + F.col("n").cast("double") * m * m
    )
    scored = t.filter(F.col("n_g") > F.col("n")).select(
        "f", "g", "n", sse.alias("sse")
    )
    wf = Window.partitionBy("f").orderBy("g").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = scored.withColumn("cum", F.sum("sse").over(wf))
    return (
        cum.groupBy("f")
        .agg(F.sum("n").alias("n_test"), F.max("cum").alias("sse_total"))
        .select(
            F.col("f").alias("fold"),
            "n_test",
            F.round(
                F.sqrt(F.col("sse_total") / F.col("n_test")) / F.lit(100.0), 6
            ).alias("rmse_dollars"),
        )
        .orderBy("fold")
    )


QUERIES["kfold_cv_rmse"] = kfold_cv_rmse
ORACLES["kfold_cv_rmse"] = f"""
    WITH cells AS (
        SELECT o_orderpriority AS g,
               CAST(CAST('0x' || substr(md5('cv' || CAST(o_orderkey AS VARCHAR)), 1, 8)
                         AS BIGINT) % {CV_FOLDS} AS INT) AS f,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s,
               sum(CAST(round(o_totalprice * 100) AS HUGEINT)
                   * CAST(round(o_totalprice * 100) AS HUGEINT)) AS ss
        FROM orders GROUP BY 1, 2
    ),
    t AS (
        SELECT g, f, n, s, ss,
               sum(n) OVER (PARTITION BY g) AS n_g,
               sum(s) OVER (PARTITION BY g) AS s_g
        FROM cells
    ),
    scored AS (
        SELECT f, g, n,
               CAST(ss AS DOUBLE)
               - 2.0 * (CAST(s_g - s AS DOUBLE) / CAST(n_g - n AS DOUBLE))
                     * CAST(s AS DOUBLE)
               + CAST(n AS DOUBLE)
                     * (CAST(s_g - s AS DOUBLE) / CAST(n_g - n AS DOUBLE))
                     * (CAST(s_g - s AS DOUBLE) / CAST(n_g - n AS DOUBLE))
                   AS sse
        FROM t WHERE n_g > n
    ),
    cum AS (
        SELECT f, n, sum(sse) OVER (PARTITION BY f ORDER BY g
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
        FROM scored
    )
    SELECT f AS fold, CAST(sum(n) AS BIGINT) AS n_test,
           round(sqrt(max(cum) / CAST(sum(n) AS BIGINT)) / 100.0, 6)
               AS rmse_dollars
    FROM cum GROUP BY f ORDER BY fold
"""


# --------------------------------------------------------------------------
# conformal_interval_coverage — split-conformal prediction intervals
# --------------------------------------------------------------------------

CONF_ALPHA_NUM = 9  # coverage level 0.9 = CONF_ALPHA_NUM / 10


def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% prediction interval around the per-event-type
    train-mean predictor, with empirical coverage measured on a held-out
    test split.  Splits are md5(event_id) buckets: 0 = calibration,
    1 = test, 2-3 = train.

    Exactness: with a constant per-type mean m = S/n, ordering calibration
    residuals |y - m| is identical to ordering the INTEGER score
    |y*n - S| — so the conformal quantile is an exact integer order
    statistic (rank ceil(0.9*(n_cal+1)), capped at n_cal) picked off the
    bounded cent grid, and the test-side coverage comparison
    |y*n - S| <= q is an exact integer compare that cannot flip between
    engines.

    Scale: the calibration and test frames reduce to the (type, cent)
    grid (<= ~33k rows at ANY corpus size — the auc_roc_quality bound)
    before any window runs.
    """
    e = load_table(spark, sf_dir, "events")
    from ..functions.texts import md5_hash_long

    base = e.select(
        F.col("event_type").alias("t"),
        (md5_hash_long(F.col("event_id").cast("string"), "conf") % 4)
        .cast("int")
        .alias("split"),
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    )
    tr = (
        base.filter(F.col("split") >= 2)
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_tr"),
            F.sum(F.col("cv").cast("decimal(38,0)")).alias("s_tr"),
        )
    )
    cal = (
        base.filter(F.col("split") == 0)
        .groupBy("t", "cv")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(tr, "t")
        .withColumn(
            "ri",
            F.abs(
                F.col("cv").cast("decimal(38,0)") * F.col("n_tr").cast("decimal(38,0)")
                - F.col("s_tr")
            ),
        )
    )
    wt = Window.partitionBy("t")
    wcum = wt.orderBy("ri", "cv").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cal.withColumn("n_cal", F.sum("cnt").over(wt)).withColumn(
        "cum", F.sum("cnt").over(wcum)
    )
    # k = min(n_cal, ceil(0.9 * (n_cal + 1))) — exact arithmetic, one floor
    k = F.floor(
        F.least(
            F.col("n_cal").cast("double"),
            (((F.col("n_cal") + 1) * CONF_ALPHA_NUM + 9) / F.lit(10)).cast("double"),
        )
    )
    q = (
        ranked.filter(F.col("cum") >= k)
        .groupBy("t")
        .agg(
            F.min("ri").alias("qi"),
            F.max("n_cal").alias("n_calib"),
        )
    )
    stats = tr.join(q, "t")
    test = (
        base.filter(F.col("split") == 1)
        .groupBy("t", "cv")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(stats, "t")
    )
    covered = F.when(
        F.abs(
            F.col("cv").cast("decimal(38,0)") * F.col("n_tr").cast("decimal(38,0)")
            - F.col("s_tr")
        )
        <= F.col("qi"),
        F.col("cnt"),
    ).otherwise(0)
    return (
        test.groupBy("t", "n_tr", "n_calib", "qi")
        .agg(F.sum("cnt").alias("n_test"), F.sum(covered).alias("n_covered"))
        .select(
            F.col("t").alias("event_type"),
            F.col("n_tr").alias("n_train"),
            "n_calib",
            "n_test",
            F.round(
                F.col("qi").cast("double") / F.col("n_tr").cast("double") / F.lit(100.0),
                6,
            ).alias("q_dollars"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test").cast("double"), 6
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


QUERIES["conformal_interval_coverage"] = conformal_interval_coverage
ORACLES["conformal_interval_coverage"] = f"""
    WITH base AS (
        SELECT event_type AS t,
               CAST(CAST('0x' || substr(md5('conf' || CAST(event_id AS VARCHAR)), 1, 8)
                         AS BIGINT) % 4 AS INT) AS split,
               CAST(round(value * 100) AS BIGINT) AS cv
        FROM events
    ),
    tr AS (
        SELECT t, count(*) AS n_tr, sum(cv) AS s_tr
        FROM base WHERE split >= 2 GROUP BY t
    ),
    cal AS (
        SELECT b.t, b.cv, count(*) AS cnt, any_value(tr.n_tr) AS n_tr,
               any_value(tr.s_tr) AS s_tr
        FROM (SELECT * FROM base WHERE split = 0) b JOIN tr USING (t)
        GROUP BY b.t, b.cv
    ),
    ranked AS (
        SELECT t, cv, cnt, abs(CAST(cv AS HUGEINT) * n_tr - s_tr) AS ri,
               sum(cnt) OVER (PARTITION BY t) AS n_cal,
               sum(cnt) OVER (PARTITION BY t
                              ORDER BY abs(CAST(cv AS HUGEINT) * n_tr - s_tr), cv
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM cal
    ),
    q AS (
        SELECT t, min(ri) AS qi, max(n_cal) AS n_calib
        FROM ranked
        WHERE cum >= floor(least(CAST(n_cal AS DOUBLE),
                                 CAST((n_cal + 1) * {CONF_ALPHA_NUM} + 9 AS DOUBLE)
                                 / 10))
        GROUP BY t
    ),
    test AS (
        SELECT b.t, b.cv, count(*) AS cnt FROM base b WHERE split = 1
        GROUP BY b.t, b.cv
    )
    SELECT t AS event_type,
           CAST(tr.n_tr AS BIGINT) AS n_train,
           CAST(q.n_calib AS BIGINT) AS n_calib,
           CAST(sum(cnt) AS BIGINT) AS n_test,
           round(CAST(qi AS DOUBLE) / CAST(tr.n_tr AS DOUBLE) / 100.0, 6)
               AS q_dollars,
           round(CAST(sum(CASE WHEN abs(CAST(cv AS HUGEINT) * tr.n_tr - tr.s_tr)
                                    <= qi THEN cnt ELSE 0 END) AS DOUBLE)
                 / CAST(sum(cnt) AS DOUBLE), 6) AS coverage
    FROM test JOIN tr USING (t) JOIN q USING (t)
    GROUP BY t, tr.n_tr, q.n_calib, qi
    ORDER BY event_type
"""


# --------------------------------------------------------------------------
# recsys_eval_cf — held-out hit-rate of the co-occurrence recommender
# --------------------------------------------------------------------------

REC_TEST_MOD = 5  # orders with md5 % 5 == 0 form the held-out test set


def recsys_eval_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline evaluation of the item-item co-occurrence recommender
    (item_cf_topk's count space): split orders 80/20 by md5 hash, build
    directed co-occurrence counts from TRAIN baskets only, recommend each
    item's top-1 partner (count desc, partner id asc — deterministic), and
    score on TEST baskets: a scored item "hits" when its recommended
    partner appears in the same held-out basket.  Reports hit rate,
    scoring coverage, and catalog coverage — the standard recsys offline
    loop next to ranking_eval_bm25's IR metrics.

    Scale: the pair space is the market_basket shape (distinct
    (order, part), order-keyed self-join, O(k^2) per basket — never part x
    part); top-1 selection is a per-anchor rank window on the bounded
    co-occurrence frame; test scoring is two equi-joins.
    """
    from ..functions.texts import md5_hash_long

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn(
            "is_test",
            md5_hash_long(F.col("l_orderkey").cast("string"), "rec") % REC_TEST_MOD
            == 0,
        )
    )
    train = li.filter(~F.col("is_test")).select("l_orderkey", "l_partkey")
    test = li.filter(F.col("is_test")).select("l_orderkey", "l_partkey")
    a = train.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = train.select("l_orderkey", F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    w = Window.partitionBy("pa").orderBy(F.col("n_co").desc(), F.col("pb"))
    top1 = (
        co.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("pa"), F.col("pb").alias("rec"))
    )
    scored = test.join(top1, test.l_partkey == top1.pa, "left").select(
        "l_orderkey", "l_partkey", "rec"
    )
    hit_probe = test.select(
        F.col("l_orderkey").alias("ho"), F.col("l_partkey").alias("hp")
    )
    hits = scored.join(
        hit_probe,
        (F.col("l_orderkey") == F.col("ho")) & (F.col("rec") == F.col("hp")),
        "left",
    )
    catalog = train.groupBy().agg(
        F.countDistinct("l_partkey").alias("n_train_items")
    )
    g = hits.groupBy().agg(
        F.count(F.lit(1)).alias("n_test_items"),
        F.sum(F.col("rec").isNotNull().cast("int")).alias("n_scored"),
        F.sum(F.col("hp").isNotNull().cast("int")).alias("n_hits"),
        F.countDistinct(F.col("rec")).alias("n_rec_distinct"),
    ).crossJoin(F.broadcast(catalog))  # 1-row scalar broadcast
    return g.select(
        "n_test_items",
        "n_scored",
        "n_hits",
        F.round(
            F.col("n_hits").cast("double") / F.col("n_scored").cast("double"), 6
        ).alias("hit_rate_at1"),
        F.round(
            F.col("n_scored").cast("double") / F.col("n_test_items").cast("double"), 6
        ).alias("scoring_coverage"),
        F.round(
            F.col("n_rec_distinct").cast("double")
            / F.col("n_train_items").cast("double"),
            6,
        ).alias("catalog_coverage"),
    )


QUERIES["recsys_eval_cf"] = recsys_eval_cf
ORACLES["recsys_eval_cf"] = f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    tagged AS (
        SELECT l_orderkey, l_partkey,
               CAST('0x' || substr(md5('rec' || CAST(l_orderkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % {REC_TEST_MOD} = 0 AS is_test
        FROM li
    ),
    train AS (SELECT l_orderkey, l_partkey FROM tagged WHERE NOT is_test),
    test AS (SELECT l_orderkey, l_partkey FROM tagged WHERE is_test),
    co AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_co
        FROM train a JOIN train b USING (l_orderkey)
        WHERE a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    top1 AS (
        SELECT pa, pb AS rec FROM (
            SELECT pa, pb,
                   row_number() OVER (PARTITION BY pa
                                      ORDER BY n_co DESC, pb) AS rn
            FROM co
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT t.l_orderkey, t.l_partkey, top1.rec
        FROM test t LEFT JOIN top1 ON t.l_partkey = top1.pa
    ),
    hits AS (
        SELECT s.*, h.l_partkey AS hp
        FROM scored s LEFT JOIN test h
          ON s.l_orderkey = h.l_orderkey AND s.rec = h.l_partkey
    )
    SELECT count(*) AS n_test_items,
           CAST(sum(CASE WHEN rec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scored,
           CAST(sum(CASE WHEN hp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           round(CAST(sum(CASE WHEN hp IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CASE WHEN rec IS NOT NULL THEN 1 ELSE 0 END)
                        AS DOUBLE), 6) AS hit_rate_at1,
           round(CAST(sum(CASE WHEN rec IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS scoring_coverage,
           round(CAST(count(DISTINCT rec) AS DOUBLE)
                 / (SELECT CAST(count(DISTINCT l_partkey) AS DOUBLE) FROM train),
                 6) AS catalog_coverage
    FROM hits
"""


# --------------------------------------------------------------------------
# round-6 wave AX: probability-forecast audits (Murphy decomposition + HL)
# --------------------------------------------------------------------------

from .diagnostics_ext import _chi2_crit_spark, _chi2_crit_sql  # noqa: E402


def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the quality-logit probability's Brier
    score against ``lang == POS_LANG``: Brier ~= reliability - resolution
    + uncertainty over the CAL_BINS reliability bins — the single-number
    companion of calibration_bins (which shows the curve) and
    auc_roc_quality (which ignores calibration entirely).

    Exactness: the raw Brier sums (sum pi^2, sum pi*y, sum y on the
    integer ten-thousandths grid) are exact; each bin's reliability /
    resolution cell is the cross-multiplied integer form ((spi - 1e4*sy)^2
    and (n*sy_b - n_b*sy)^2 over exact counts) evaluated in double and
    micro-rounded before the CAL_BINS-row fold.  ``decomp_gap`` reports
    Brier - (rel - res + unc) — nonzero exactly because binning pools
    distinct forecasts, a fact the audit should surface, not hide.

    Scale: one corpus reduce to the 10^4-value score grid / bin frame;
    everything after runs on <= CAL_BINS rows.
    """
    d = load_table(spark, sf_dir, "documents")
    p4 = F.round(_prob_keep(F.col("text")), 4)
    scored = d.select(
        F.round(p4 * 10000).cast("long").alias("pi"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    binned = scored.withColumn(
        "bin",
        F.least(F.floor(F.col("pi") / (10000 / CAL_BINS)), F.lit(CAL_BINS - 1))
        .cast("bigint"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nb"),
        F.sum("pi").cast("decimal(38,0)").alias("spib"),
        F.sum("y").cast("decimal(38,0)").alias("syb"),
        F.sum((F.col("pi") * F.col("pi")).cast("decimal(38,0)")).alias("sppb"),
        F.sum((F.col("pi") * F.col("y")).cast("decimal(38,0)")).alias("spyb"),
    )
    tot = per.agg(
        F.sum("nb").alias("n"), F.sum("syb").alias("sy"),
        F.sum("spib").alias("spi"), F.sum("sppb").alias("spp"),
        F.sum("spyb").alias("spy"),
    )
    cells = per.crossJoin(F.broadcast(tot)).select(
        "nb", "spib", "syb", "n", "sy", "spi", "spp", "spy",
        F.round(
            F.pow((F.col("spib") - 10000 * F.col("syb")).cast("double"), F.lit(2.0))
            / (F.col("nb").cast("double") * 1e8),
            6,
        ).cast("decimal(38,6)").alias("rel_cell"),
        F.round(
            F.pow((F.col("n") * F.col("syb") - F.col("nb") * F.col("sy")).cast("double"), F.lit(2.0))
            / (F.col("nb") * F.col("n") * F.col("n")).cast("double"),
            6,
        ).cast("decimal(38,6)").alias("res_cell"),
    )
    agg = cells.groupBy("n", "sy", "spi", "spp", "spy").agg(
        F.sum("rel_cell").alias("rel_s"), F.sum("res_cell").alias("res_s")
    )
    n = F.col("n").cast("double")
    brier = (
        F.col("spp").cast("double")
        - 2e4 * F.col("spy").cast("double")
        + 1e8 * F.col("sy").cast("double")
    ) / (n * 1e8)
    rel = F.col("rel_s").cast("double") / n
    res = F.col("res_s").cast("double") / n
    unc = (F.col("sy") * (F.col("n") - F.col("sy"))).cast("double") / (n * n)
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(brier - (rel - res + unc), 6).alias("decomp_gap"),
    )


ORACLES["brier_decomposition"] = f"""
    WITH scored AS (
        SELECT CAST(round(round(1.0 / (1.0 + exp(-z)), 4) * 10000, 0)
                    AS BIGINT) AS pi,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT lang, {_Z_SQL} AS z FROM documents)
    ),
    binned AS (
        SELECT least(pi // (10000 // {CAL_BINS}), {CAL_BINS - 1}) AS bin,
               pi, y
        FROM scored
    ),
    per AS (
        SELECT bin, CAST(count(*) AS HUGEINT) AS nb,
               CAST(sum(pi) AS HUGEINT) AS spib,
               CAST(sum(y) AS HUGEINT) AS syb,
               CAST(sum(pi * pi) AS HUGEINT) AS sppb,
               CAST(sum(pi * y) AS HUGEINT) AS spyb
        FROM binned GROUP BY 1
    ),
    tot AS (
        SELECT sum(nb) AS n, sum(syb) AS sy, sum(spib) AS spi,
               sum(sppb) AS spp, sum(spyb) AS spy
        FROM per
    ),
    cells AS (
        SELECT nb, spib, syb, n, sy, spi, spp, spy,
               CAST(round(pow(CAST(spib - 10000 * syb AS DOUBLE), 2.0)
                          / (CAST(nb AS DOUBLE) * 1e8), 6)
                    AS DECIMAL(38,6)) AS rel_cell,
               CAST(round(pow(CAST(n * syb - nb * sy AS DOUBLE), 2.0)
                          / CAST(nb * n * n AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS res_cell
        FROM per, tot
    ),
    agg AS (
        SELECT n, sy, spi, spp, spy,
               sum(rel_cell) AS rel_s, sum(res_cell) AS res_s
        FROM cells GROUP BY 1, 2, 3, 4, 5
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round((CAST(spp AS DOUBLE) - 2e4 * CAST(spy AS DOUBLE)
                  + 1e8 * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * 1e8), 6) AS brier,
           round(CAST(rel_s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS reliability,
           round(CAST(res_s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resolution,
           round(CAST(sy * (n - sy) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS uncertainty,
           round((CAST(spp AS DOUBLE) - 2e4 * CAST(spy AS DOUBLE)
                  + 1e8 * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e8)
                 - (CAST(rel_s AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(res_s AS DOUBLE) / CAST(n AS DOUBLE)
                    + CAST(sy * (n - sy) AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
               AS decomp_gap
    FROM agg
"""
QUERIES["brier_decomposition"] = brier_decomposition


HL_GROUPS = 10


def hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit chi2 for the quality-logit
    probability: HL_GROUPS equal-count score groups, HL = sum (O-E)^2 /
    (E * (1 - E/n_g)) — the hypothesis-test companion of
    calibration_bins' descriptive curve.

    Grouping is deterministic on the bounded ten-thousandths score grid:
    a tie run of identical scores moves as ONE unit into the decile of
    its first element (g = 10 * cum_before // n, integer division — the
    runs_test division lesson), so group membership can never differ
    between engines.  Degenerate groups (E = 0 or E = n_g, possible only
    if a decile is a single saturated score) are excluded from the fold
    by the same predicate in both engines and reported in n_degenerate.
    Verdict vs chi2(G-2, .95) from the inlined critical table.

    Scale: one corpus reduce to the score grid, one ordered window on
    <= 10^4 rows, one <= 10-row fold.
    """
    d = load_table(spark, sf_dir, "documents")
    p4 = F.round(_prob_keep(F.col("text")), 4)
    scored = d.select(
        F.round(p4 * 10000).cast("long").alias("pi"),
        (F.col("lang") == POS_LANG).cast("long").alias("y"),
    )
    grid = scored.groupBy("pi").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("ny")
    )
    tot = grid.agg(F.sum("cnt").alias("n"))
    wv = Window.partitionBy().orderBy("pi")
    g = (
        grid.withColumn("cum", F.sum("cnt").over(wv))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "grp",
            F.expr(f"({HL_GROUPS} * (cum - cnt)) div n").cast("long"),
        )
    )
    per = g.groupBy("grp").agg(
        F.sum("cnt").cast("decimal(38,0)").alias("ng"),
        F.sum("ny").cast("decimal(38,0)").alias("obs"),
        # accumulate in decimal (pi<=1e4 basis points x group counts: the
        # long SUM is the overflow risk at extreme scale, not the product)
        F.sum(
            F.col("pi").cast("decimal(38,0)") * F.col("cnt")
        ).alias("spi"),
    )
    ok = (F.col("spi") > 0) & (F.col("spi") < F.col("ng") * 10000)
    term = (
        F.pow((10000 * F.col("obs") - F.col("spi")).cast("double"), F.lit(2.0))
        / (
            F.col("spi").cast("double")
            * (F.col("ng") * 10000 - F.col("spi")).cast("double")
            / F.col("ng").cast("double")
        )
    )
    folded = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias("n_degenerate"),
        F.sum(
            F.when(ok, F.round(term, 6).cast("decimal(38,6)")).otherwise(
                F.lit(0).cast("decimal(38,6)")
            )
        ).alias("hl"),
    )
    hl = F.col("hl").cast("double")
    crit = _chi2_crit_spark(F.col("n_groups") - F.col("n_degenerate") - 2)
    return folded.select(
        "n_groups",
        "n_degenerate",
        F.round(hl, 4).alias("hl_stat"),
        F.when(crit.isNull(), F.lit(None).cast("string"))
        .when(hl > crit, F.lit("poor_calibration"))
        .otherwise(F.lit("calibrated"))
        .alias("verdict"),
    )


ORACLES["hosmer_lemeshow"] = f"""
    WITH scored AS (
        SELECT CAST(round(round(1.0 / (1.0 + exp(-z)), 4) * 10000, 0)
                    AS BIGINT) AS pi,
               CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS y
        FROM (SELECT lang, {_Z_SQL} AS z FROM documents)
    ),
    grid AS (
        SELECT pi, count(*) AS cnt, sum(y) AS ny FROM scored GROUP BY 1
    ),
    tot AS (SELECT sum(cnt) AS n FROM grid),
    g AS (
        SELECT grid.*, ({HL_GROUPS} * (sum(cnt) OVER (ORDER BY pi) - cnt)) // n
                   AS grp
        FROM grid, tot
    ),
    per AS (
        SELECT grp, CAST(sum(cnt) AS HUGEINT) AS ng,
               CAST(sum(ny) AS HUGEINT) AS obs,
               CAST(sum(pi * cnt) AS HUGEINT) AS spi
        FROM g GROUP BY 1
    ),
    folded AS (
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN spi > 0 AND spi < ng * 10000
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_degenerate,
               sum(CASE WHEN spi > 0 AND spi < ng * 10000
                        THEN CAST(round(
                            pow(CAST(10000 * obs - spi AS DOUBLE), 2.0)
                            / (CAST(spi AS DOUBLE)
                               * CAST(ng * 10000 - spi AS DOUBLE)
                               / CAST(ng AS DOUBLE)), 6) AS DECIMAL(38,6))
                        ELSE CAST(0 AS DECIMAL(38,6)) END) AS hl
        FROM per
    )
    SELECT n_groups, n_degenerate,
           round(CAST(hl AS DOUBLE), 4) AS hl_stat,
           CASE WHEN {_chi2_crit_sql("n_groups - n_degenerate - 2")} IS NULL
                THEN NULL
                WHEN CAST(hl AS DOUBLE)
                     > {_chi2_crit_sql("n_groups - n_degenerate - 2")}
                THEN 'poor_calibration'
                ELSE 'calibrated' END AS verdict
    FROM folded
"""
QUERIES["hosmer_lemeshow"] = hosmer_lemeshow
