"""Solo-idle re-measure of bench queries vs their BASELINE.md pins
(VERDICT r6 #4): min-over-repeats on an otherwise-idle machine, the
documented pinning policy.  Prints one JSON line per query with the raw
repeat list, the min, and the implied vs-pin ratio.

Usage: python tools/repin_check.py <query> [query ...] [--repeats=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_streamming___v2_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = 6
    for a in sys.argv[1:]:
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("repin-check")
    qs = entrymod.queries()
    # warm JVM + Python worker pool exactly like bench.py (untimed)
    qs["q1_pricing_summary"](spark, sf_dir).count()
    spark.range(1024).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    out = {}
    for name in names:
        times = []
        for _ in range(repeats):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        out[name] = {"repeats": times, "min": min(times)}
        print(json.dumps({"query": name, **out[name]}), flush=True)


if __name__ == "__main__":
    main()
