"""Text-analysis operators over the ``documents`` table (DRIVER surface):
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions — at 100 TB these run entirely inside the
parquet scan stage (no shuffle, no Python), so throughput is scan-bound.
Each query has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texts import (
    EN_STOPWORDS,
    LANG_MARKERS,
    md5_hash_long,
    n_tokens_bpe_est,
    n_tokens_ws,
    normalized,
    punct_ratio,
    stopword_hits,
)
from ..sources.tables import load_table


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-estimate token counts per document."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        n_tokens_ws(t).alias("n_tokens_ws"),
        n_tokens_bpe_est(t).alias("n_tokens_bpe"),
        F.length(t).cast("long").alias("n_chars_actual"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = n_tokens_ws(t)
    sw_ratio = stopword_hits(t, EN_STOPWORDS) / n_words
    pr = punct_ratio(t)
    avg_word_len = (F.length(t) - (n_words - 1)) / n_words
    # crude composite: long enough, some stopwords, low punctuation
    score = (
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(sw_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(pr * 10, F.lit(1.0))) * 0.2
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(avg_word_len, 3).alias("avg_word_len"),
        F.round(pr, 4).alias("punct_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic: argmax of per-language hit counts
    with fixed precedence (en > fr > de > es, ties to earlier)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    hits = {lang: stopword_hits(t, mk) for lang, mk in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hits[lg] for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(hits[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("unknown")).otherwise(pred)
    out = d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        *[hits[lg].alias(f"hits_{lg}") for lg in langs],
        pred.alias("predicted_lang"),
    )
    return out


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: md5 of normalized text plus a
    64-bit-range numeric fingerprint (hash-join-able across engines)."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalized(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint_md5"),
        md5_hash_long(norm).alias("fingerprint_id"),
    )


# --- oracles -----------------------------------------------------------------

_WORDS = "regexp_split_to_array(trim(text), '\\s+')"


def _sw_hits(words_expr: str, stopwords) -> str:
    lst = ", ".join(f"'{w}'" for w in stopwords)
    return (
        f"CAST(len(list_filter({words_expr}, x -> list_contains([{lst}], x)))"
        " AS BIGINT)"
    )


def _lang_id_sql() -> str:
    langs = list(LANG_MARKERS)
    hit_cols = ",\n               ".join(
        f"{_sw_hits(_WORDS, LANG_MARKERS[lg])} AS hits_{lg}" for lg in langs
    )
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'unknown' "
    for lg in langs:
        case += f"WHEN hits_{lg} = {best} THEN '{lg}' "
    case += "ELSE 'unknown' END"
    return f"""
        SELECT doc_id, declared_lang, {', '.join('hits_' + lg for lg in langs)},
               {case} AS predicted_lang
        FROM (
            SELECT doc_id, lang AS declared_lang,
               {hit_cols}
            FROM documents
        )
    """


ORACLES = {
    "token_count": f"""
        SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT)            AS n_tokens_ws,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe,
               CAST(length(text) AS BIGINT)             AS n_chars_actual
        FROM documents
    """,
    "text_quality": f"""
        SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT) AS n_words,
               round((length(text) - (len({_WORDS}) - 1)) * 1.0 / len({_WORDS}), 3)
                   AS avg_word_len,
               round(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0
                     / length(text), 4) AS punct_ratio,
               round({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0 / len({_WORDS}), 4)
                   AS stopword_ratio,
               round(least(len({_WORDS}) / 50.0, 1.0) * 0.4
                     + least({_sw_hits(_WORDS, EN_STOPWORDS)} * 1.0
                             / len({_WORDS}) * 5, 1.0) * 0.4
                     + (1 - least(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                                  * 1.0 / length(text) * 10, 1.0)) * 0.2, 4)
                   AS quality_score
        FROM documents
    """,
    "lang_id": _lang_id_sql(),
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS fingerprint_md5,
               CAST('0x' || substr(
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 8)
                   AS BIGINT) AS fingerprint_id
        FROM documents
    """,
}

QUERIES = {
    "token_count": token_count,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
}
