"""PageRank (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators.graph import pagerank


def test_ranks_sum_to_one_and_hub_wins(spark):
    # star: every leaf links to the hub, hub links back to one leaf
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"), ("hub", "a")],
        ["src", "dst"],
    )
    pr = pagerank(edges, iterations=20).collect()
    ranks = {r["node"]: r["rank"] for r in pr}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert max(ranks, key=ranks.get) == "hub"
    # leaf 'a' receives the hub's whole out-mass, so it beats b/c/d
    assert ranks["a"] > ranks["b"] == pytest.approx(ranks["c"])


def test_dangling_mass_redistributed(spark):
    # 'sink' has no out-edges: its mass must spread uniformly, keeping
    # the total at 1 (without the correction it leaks to 1-d per step)
    edges = spark.createDataFrame([("a", "sink"), ("b", "sink")], ["src", "dst"])
    pr = pagerank(edges, iterations=10).collect()
    total = sum(r["rank"] for r in pr)
    assert abs(total - 1.0) < 1e-9
    ranks = {r["node"]: r["rank"] for r in pr}
    assert ranks["sink"] > ranks["a"] == pytest.approx(ranks["b"])


def test_symmetric_pair_is_uniform(spark):
    # a <-> b: symmetric 2-cycle converges to the uniform distribution
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert pr["a"] == pytest.approx(0.5) and pr["b"] == pytest.approx(0.5)


def test_duplicate_edges_weighted(spark):
    # two parallel a->b edges next to one a->c edge: b gets 2/3 of a's mass
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], ["src", "dst"]
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=1).collect()}
    base = pr["a"]  # only receives the base + dangling share
    assert (pr["b"] - base) == pytest.approx(2 * (pr["c"] - base))


def test_triangle_stats_k4_and_star(spark):
    from ml_data_pipeline_spark.operators.graph import triangle_stats

    # K4: 4 triangles, 12 wedges, clustering coefficient exactly 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = triangle_stats(spark.createDataFrame(k4, ["u", "v"])).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 6, 12, 4)
    assert r["clustering_coeff"] == 1.0

    # star K1,5: plenty of wedges, zero triangles
    star = [(0, i) for i in range(1, 6)]
    s = triangle_stats(spark.createDataFrame(star, ["u", "v"])).collect()[0]
    assert s["n_triangles"] == 0 and s["n_wedges"] == 10
    assert s["clustering_coeff"] == 0.0


def test_triangle_stats_cleans_dups_loops_and_direction(spark):
    from ml_data_pipeline_spark.operators.graph import triangle_stats

    # same triangle given with duplicates, reversed edges, and a self-loop
    rows = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]
    r = triangle_stats(spark.createDataFrame(rows, ["u", "v"])).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)


def test_flatten_hierarchy_depths_and_forest(spark):
    from ml_data_pipeline_spark.operators.graph import flatten_hierarchy

    # two trees: chain 0<-1<-2<-3<-4 and a lone root 10
    rows = [(0, None), (1, 0), (2, 1), (3, 2), (4, 3), (10, None)]
    df = spark.createDataFrame(rows, "id long, parent long")
    out = {r["id"]: r for r in flatten_hierarchy(df, max_depth=16).collect()}
    assert all(out[i]["root"] == 0 for i in range(5))
    assert [out[i]["depth"] for i in range(5)] == [0, 1, 2, 3, 4]
    assert out[10]["root"] == 10 and out[10]["depth"] == 0


def test_flatten_hierarchy_log_rounds_suffice_for_deep_chain(spark):
    from ml_data_pipeline_spark.operators.graph import flatten_hierarchy

    # depth-30 chain with max_depth=32 -> only 5 doubling rounds
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "id long, parent long")
    out = {r["id"]: r for r in flatten_hierarchy(df, max_depth=32).collect()}
    assert out[30]["depth"] == 30 and out[30]["root"] == 0
    assert len(out) == 31


def test_flatten_hierarchy_dangling_parent_becomes_root(spark):
    from ml_data_pipeline_spark.operators.graph import flatten_hierarchy

    # node 0 was filtered upstream; 1 and 2 must NOT vanish — they root
    # at the dangling id 0 with the depth walked to it
    rows = [(1, 0), (2, 1)]
    df = spark.createDataFrame(rows, "id long, parent long")
    out = {r["id"]: r for r in flatten_hierarchy(df, max_depth=8).collect()}
    assert set(out) == {1, 2}
    assert out[1]["root"] == 0 and out[1]["depth"] == 1
    assert out[2]["root"] == 0 and out[2]["depth"] == 2


def test_adamic_adar_hand_computed(spark):
    from ml_data_pipeline_spark.operators.graph import adamic_adar
    import math

    # v1 shared by u1,u2,u3 (deg 3); v2 by u1,u2 (deg 2); v3 only u3 (deg 1)
    edges = spark.createDataFrame(
        [(1, "v1"), (2, "v1"), (3, "v1"), (1, "v2"), (2, "v2"), (3, "v3"),
         (1, "v2")],  # duplicate edge must not double-count
        "u int, v string",
    )
    got = {(r["ua"], r["ub"]): (r["n_common"], r["aa_score"])
           for r in adamic_adar(edges, "u", "v").collect()}
    assert got[(1, 2)] == (2, round(1 / math.log(3) + 1 / math.log(2), 6))
    assert got[(1, 3)] == (1, round(1 / math.log(3), 6))
    assert got[(2, 3)] == (1, round(1 / math.log(3), 6))
    assert len(got) == 3


def test_adamic_adar_top_k_deterministic(spark):
    from ml_data_pipeline_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(u, v) for v in ("a", "b", "c") for u in range(4)], "u int, v string"
    )
    out = adamic_adar(edges, "u", "v", top_k=3).collect()
    # all 6 pairs tie -> id-ordered cut keeps the 3 smallest pairs
    assert [(r["ua"], r["ub"]) for r in out] == [(0, 1), (0, 2), (0, 3)]


def test_r10_graph_funnel_causal_guards(spark):
    """r10 review: cycles flag as NULL root/depth instead of garbage;
    empty-edge pagerank returns empty; zero-user funnel stages emit 0
    rows; NULL-propensity treated units are excluded from PSM matches."""
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.operators import funnel as FU
    from ml_data_pipeline_spark.operators.graph import flatten_hierarchy, pagerank

    # 2-cycle + a clean chain
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, None), (4, 3)], "id long, parent long"
    )
    out = {r["id"]: r for r in flatten_hierarchy(df, max_depth=8).collect()}
    assert out[1]["root"] is None and out[2]["root"] is None  # cycle flagged
    assert out[4]["root"] == 3 and out[4]["depth"] == 1       # chain intact
    # empty edges: empty result, not ZeroDivisionError
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    # funnel: a stage nobody reaches still gets a row with n_users=0
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "view")],
        "user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {r["stage_idx"]: r["n_users"] for r in
            FU.funnel_counts(ev, stages=["view", "click", "purchase"]).collect()}
    assert rows == {1: 1, 2: 0, 3: 0}
