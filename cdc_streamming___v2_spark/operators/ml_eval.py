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
    conf = (
        lang_id(spark, sf_dir)
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
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
    conf = (
        lang_id(spark, sf_dir)
        .groupBy("declared_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
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
