"""Connected-components dedup clustering (operators/components.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ml_data_pipeline_spark.operators import components as CC


def _uf_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find oracle: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_chain_collapses_to_min(spark):
    # a 12-node chain: diameter 11, but large/small-star needs O(log n)
    # rounds, so max_rounds stays untouched
    edges = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {(r["id"], r["component"]) for r in CC.connected_components(df).collect()}
    assert out == {(i, 1) for i in range(1, 13)}


def test_multiple_components_and_reversed_edges(spark):
    edges = [(5, 4), (4, 3), (10, 11), (11, 10), (20, 20), (7, 8)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["id"], r["component"]) for r in CC.connected_components(df).collect()}
    # (20,20) is a self-loop: dropped; node 20 is isolated and not emitted
    assert got == {(3, 3), (4, 3), (5, 3), (10, 10), (11, 10), (7, 7), (8, 7)}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(17)
    nodes = list(range(1000))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(700)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in CC.connected_components(df).collect()}
    assert got == _uf_reference(edges)


def test_keep_canonical_survivors(spark):
    data = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in CC.keep_canonical(data, pairs, "doc_id").collect()
    )
    # components {1,2,3} -> keep 1; {5,6} -> keep 5; 4,7,8 untouched
    assert kept == [1, 4, 5, 7, 8]


def test_empty_pairs(spark):
    data = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert CC.connected_components(pairs).count() == 0
    assert CC.keep_canonical(data, pairs, "doc_id").count() == 1


def test_r12_non_integral_ids_raise_loudly(spark):
    """r12 review: string/UUID pair ids used to cast(long) to NULL, filter
    every edge, and silently no-op every downstream consumer
    (cluster_safe_split's split degenerates to all-train, keep_canonical
    keeps everything). The integral-id contract is now a TypeError at the
    boundary instead of a docstring."""
    import pytest

    from ml_data_pipeline_spark.operators import components as CC

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    with pytest.raises(TypeError, match="must be integral"):
        CC.connected_components(pairs)


def test_r13_decimal_scale0_ids_accepted_wider_rejected(spark):
    """ADVICE r12: the r12 integral-id guard false-positived DECIMAL(p,0)
    keys, which cast(long) losslessly and produced correct components
    before the guard existed (JDBC NUMBER(n,0) / decimal parquet sources).
    Accept scale-0 precision<=18; keep rejecting scaled decimals (truncate)
    and precision>18 (can overflow a long to NULL — the exact silent-NULL
    class the guard exists for)."""
    import pytest
    from decimal import Decimal

    from ml_data_pipeline_spark.operators import components as CC

    ok = spark.createDataFrame(
        [(Decimal(1), Decimal(2)), (Decimal(2), Decimal(3)), (Decimal(9), Decimal(10))],
        "id_a decimal(18,0), id_b decimal(18,0)",
    )
    comps = {r["id"]: r["component"] for r in CC.connected_components(ok).collect()}
    assert comps[1] == comps[2] == comps[3] != comps[9]

    for schema in ("id_a decimal(20,0), id_b decimal(20,0)",
                   "id_a decimal(10,2), id_b decimal(10,2)"):
        bad = spark.createDataFrame([(Decimal(1), Decimal(2))], schema)
        with pytest.raises(TypeError, match="must be integral"):
            CC.connected_components(bad)
