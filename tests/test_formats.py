"""Round-trip + pushdown checks for the batch file-format surface."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cdc_streamming___v2_spark.sources import formats as FMT
from cdc_streamming___v2_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("fmt", sorted(FMT.FORMATS))
def test_roundtrip_preserves_values(spark, tmp_path, fmt):
    src = load_table(spark, SF_SMALL, "lineitem").limit(500)
    write, read = FMT.FORMATS[fmt]
    path = str(tmp_path / fmt)
    write(src, path)
    back = read(spark, path, src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


@pytest.mark.parametrize("fmt", ["orc", "parquet"])
def test_columnar_formats_push_filters(spark, tmp_path, fmt):
    src = load_table(spark, SF_SMALL, "lineitem")
    write, read = FMT.FORMATS[fmt]
    path = str(tmp_path / fmt)
    write(src, path)
    q = (
        read(spark, path, src.schema)
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in plan
    # column pruning: the scan reads 2 columns, not 11
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:400]


def test_partitioned_write_prunes(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = str(tmp_path / "part")
    FMT.write_parquet(src, path, partition_cols=["ship_year"])
    years = glob.glob(os.path.join(path, "ship_year=*"))
    assert len(years) > 3
    q = spark.read.parquet(path).filter(F.col("ship_year") == 1996)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter handled by pruning, not a data filter
    assert "PartitionFilters" in plan
    assert q.count() == src.filter(F.col("ship_year") == 1996).count()


def test_csv_gzip_files_on_disk(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "region")
    path = str(tmp_path / "csvgz")
    FMT.write_csv(src, path)
    assert glob.glob(os.path.join(path, "*.csv.gz"))


def test_partition_pruning_via_join_static_and_dynamic(spark, tmp_path):
    """Star-schema scan viability at scale: fact partitions implied only by
    a join must still prune. Two regimes, both pinned:
    - dim filtered on the JOIN KEY itself -> Catalyst constant-propagates
      the literal through the equi-join and prunes STATICALLY (no DPP
      needed, strictly better);
    - dim filtered on an unrelated column -> partition keys are runtime
      values, so the scan must carry a dynamicpruningexpression (DPP) fed
      by the reused broadcast of the dim."""
    fact = load_table(spark, SF_SMALL, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = str(tmp_path / "dpp_fact")
    FMT.write_parquet(fact, path, partition_cols=["ship_year"])

    dim_on_key = (
        load_table(spark, SF_SMALL, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .filter(F.col("o_year") == 1996)
        .select("o_orderkey", "o_year")
    )
    q1 = (
        spark.read.parquet(path)
        .join(dim_on_key, F.col("ship_year") == F.col("o_year"))
        .select("l_orderkey")
    )
    p1 = q1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [(ship_year" in p1  # static literal pruning

    dim_runtime = (
        load_table(spark, SF_SMALL, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .withColumn("o_year", F.year("o_orderdate"))
        .select("o_orderkey", "o_year")
    )
    q2 = (
        spark.read.parquet(path)
        .join(dim_runtime, F.col("ship_year") == F.col("o_year"))
        .select("l_orderkey")
    )
    p2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in p2, p2[:2000]
    assert q2.count() > 0
