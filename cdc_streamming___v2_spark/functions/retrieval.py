"""BM25 retrieval constants and the DuckDB scored-frame CTE, factored out
of operators/corpus_ops.py so operators/similarity.py's hybrid-RRF oracle
can reuse them without a circular import (corpus_ops imports similarity at
module init for the IVF-kmeans helpers).
"""

from __future__ import annotations

BM25_TERMS = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20

_W = "regexp_split_to_array(trim(text), '\\s+')"
_BM25_TERM_LIST = ", ".join(f"'{t}'" for t in BM25_TERMS)

# the scored-frame CTE chain (ends at `scored`), shared by the bm25_topk
# and hybrid_rrf_topk oracles; integer micro-score sum for cross-engine
# float parity (see operators/corpus_ops.bm25_scored).
BM25_SCORED_CTE = f"""
    d AS (SELECT doc_id, {_W} AS ws FROM documents),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
              FROM dl),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(ws) AS w FROM d)
        WHERE w IN ({_BM25_TERM_LIST})
        GROUP BY 1, 2
    ),
    dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_terms_hit,
               sum(CAST(round(
                   log2(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
                   * (t.tf * ({BM25_K1} + 1)) / (t.tf + {BM25_K1}
                      * (1 - {BM25_B} + {BM25_B} * l.dl / s.avgdl))
                   * 10000) AS BIGINT)) / 10000.0 AS score_raw
        FROM tf t
        JOIN dfq q USING (w)
        JOIN dl l ON l.doc_id = t.doc_id
        CROSS JOIN stats s
        GROUP BY t.doc_id
    )
"""
