"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship SCD2 latest-state query (the reference's
core query semantic, README.md:57) on sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2; ``oracle_sql()`` the DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_streamming___v2_spark.session import configure_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cdc_streamming___v2_spark.operators.scd2_queries import scd2_latest_state

    configure_existing(spark)
    return scd2_latest_state(spark, "/root/testdata/sf0.001")


def _registry() -> tuple[dict, dict]:
    from cdc_streamming___v2_spark.operators import relational, scd2_queries

    modules = [scd2_queries, relational]
    try:  # optional modules appear as they land
        from cdc_streamming___v2_spark.operators import relational_ext as _rext

        modules.append(_rext)
    except ImportError:
        pass
    try:
        from cdc_streamming___v2_spark.operators import temporal as _temporal

        modules.append(_temporal)
    except ImportError:
        pass
    try:
        from cdc_streamming___v2_spark.operators import dedup as _dedup

        modules.append(_dedup)
    except ImportError:
        pass
    try:
        from cdc_streamming___v2_spark.operators import similarity as _sim

        modules.append(_sim)
    except ImportError:
        pass
    try:
        from cdc_streamming___v2_spark.operators import text_analysis as _text

        modules.append(_text)
    except ImportError:
        pass
    try:
        from cdc_streamming___v2_spark.operators import event_windows as _ew

        modules.append(_ew)
    except ImportError:
        pass

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        queries.update(getattr(m, "QUERIES", {}))
        oracles.update(getattr(m, "ORACLES", {}))
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = _registry()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        return run

    return {name: _wrap(fn) for name, fn in q.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted => rows-only check."""
    _, o = _registry()
    return o
