"""Text metrics as column expressions, shared by the text-analysis and
dedup operators. Every construct has an exact DuckDB twin (documented per
function) so the operators stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lists for the n-gram/stopword language heuristic.
# Deterministic + tiny: inlined as literals on both engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "las", "una", "y"),
}

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

PUNCT_CLASS = r"[^.,!?;:]"  # regexp_replace keep-punct inverse class


def words(text: Column) -> Column:
    """Whitespace tokenization. DuckDB: regexp_split_to_array(trim(x),'\\s+')."""
    return F.split(F.trim(text), r"\s+")


def n_tokens_ws(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def n_tokens_bpe_est(text: Column) -> Column:
    """BPE-ish token-count estimate: ceil(chars/4) — the common ~4 chars per
    subword heuristic. DuckDB: CAST(ceil(length(x)/4.0) AS BIGINT)."""
    return F.ceil(F.length(text) / 4.0).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars. DuckDB twin uses the 'g' flag."""
    return F.length(F.regexp_replace(text, PUNCT_CLASS, "")) / F.length(text)


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens in the stopword list.
    DuckDB: len(list_filter(words, x -> list_contains([...], x)))."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(text), lambda w: F.array_contains(sw, w))).cast(
        "long"
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles.
    DuckDB: list_distinct(list_transform(generate_series(1, len(w)-(n-1)),
    i -> array_to_string(w[i:i+n-1], ' '))) — note DuckDB list slices are
    1-based inclusive, Spark F.slice is 1-based (start, length).

    PERF: the tokenizing `words()` expression is duplicated into every
    lambda invocation (one regex split per shingle index — O(tokens²) regex
    work per row), and any filter Catalyst derives from a later explode
    drags the whole expression below the fan-out exchange onto the raw
    scan's few partitions. For corpus-sized inputs use
    ``sources.tables.exploded_shingles``, which materializes the token
    array behind an exchange barrier; this column form is fine for small
    frames (streaming micro-batches, eval sets)."""
    return shingles_of_words(words(text), n)


def shingles_of_words(w: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column — evaluates ``w`` once per row instead of once per lambda
    invocation when ``w`` is a plain attribute reference."""
    # Spark's sequence(1, 0) auto-steps DOWN (yields [1,0]) instead of an
    # empty range, so short texts must be guarded explicitly.
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    empty = F.array().cast("array<string>")
    return F.when(F.size(w) >= n, F.array_distinct(sh)).otherwise(empty)


def md5_hash_long(col: Column, salt: str = "") -> Column:
    """Engine-portable 32-bit-range hash: first 8 hex chars of md5 as a long.
    DuckDB: CAST('0x' || substr(md5(salt || x), 1, 8) AS BIGINT).
    Shared by MinHash/SimHash so signatures hash-match the oracle exactly.
    """
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def normalized(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace.
    DuckDB: lower(regexp_replace(trim(x), '\\s+', ' ', 'g'))."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
