"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Each query executes as ``count()`` over the result (forces the full plan
without driver-side collect of wide rows; limits/top-k still materialize).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_streamming___v2_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "scd2_latest_state",
    "scd2_as_of",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "top_customers",
    "window_rank_lag",
    "json_funcs",
    "asof_join_purchase_view",
    "range_join_error_clicks",
    "cdc_envelope_roundtrip",
    "cdc_merge_apply",
    "skew_salted_join",
    "multimodal_decode",
    "dedup_exact",
    "minhash_near_dup",
    "simhash_fingerprint",
    "cosine_topk",
    "ann_lsh_topk",
    "token_count",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    qs = entrymod.queries()
    run = [n for n in HEADLINE if n in qs]

    # warm the JVM + file metadata cache once (not timed)
    qs["q1_pricing_summary"](spark, sf_dir).count()

    per_query: dict[str, float] = {}
    t_all = time.time()
    for name in run:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        per_query[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
