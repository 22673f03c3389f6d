"""Union-find: distributed min-label propagation vs driver-side DSU must
produce identical clusters; singletons stay singleton."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def graph(spark):
    # components: {a,b,c,d} via chain, {e,f}, singleton {g}; plus a 4-cycle
    edges = pd.DataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("h", "i"), ("i", "j"), ("j", "k"), ("k", "h")],
        columns=["a", "b"],
    )
    verts = pd.DataFrame({"clip_id": list("abcdefghijk")})
    return spark.createDataFrame(edges), spark.createDataFrame(verts)


EXPECTED = {
    "a": "a", "b": "a", "c": "a", "d": "a",
    "e": "e", "f": "e", "g": "g",
    "h": "h", "i": "h", "j": "h", "k": "h",
}


def test_driver_dsu_path(spark, graph):
    from datasketches_pig_spark.operators.unionfind import connected_components

    edges, verts = graph
    out = connected_components(edges, verts)  # small → driver DSU
    got = {r.clip_id: r.cluster_id for r in out.collect()}
    assert got == EXPECTED


def test_distributed_path_identical(spark, graph):
    from datasketches_pig_spark.operators.unionfind import connected_components

    edges, verts = graph
    out = connected_components(edges, verts, max_driver_edges=0)  # force joins
    got = {r.clip_id: r.cluster_id for r in out.collect()}
    assert got == EXPECTED
