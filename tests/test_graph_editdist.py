"""Triangle enumeration (degree-ordered wedge join) and blocked
edit-distance near-dup pairs — closed-form graphs/titles."""

from itertools import combinations

from stirling_pdf_spark.operators.dedup import edit_distance_pairs
from stirling_pdf_spark.operators.graph import triangles


def _tris(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {tuple(r) for r in triangles(df).collect()}


def test_triangles_k4(spark):
    nodes = ["a", "b", "c", "d"]
    edges = list(combinations(nodes, 2))
    assert _tris(spark, edges) == {
        ("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"),
        ("b", "c", "d")}


def test_triangles_dedup_normalization(spark):
    # multi-edges, reversed duplicates and self-loops collapse; the
    # star around the hub adds no triangles
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
             ("a", "a"), ("a", "c"),
             ("hub", "p1"), ("hub", "p2"), ("hub", "p3"),
             ("hub", "p4"), ("hub", "a")]
    assert _tris(spark, edges) == {("a", "b", "c")}


def test_triangles_two_shared_edge(spark):
    # two triangles sharing edge (a, b) — each reported exactly once
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"),
             ("b", "d")]
    assert _tris(spark, edges) == {("a", "b", "c"), ("a", "b", "d")}


def test_edit_distance_pairs_blocked(spark):
    rows = [
        ("d0", "alpha annual report"),
        ("d1", "alpha annual reports"),      # dist 1 from d0
        ("d2", "alpha annual reporx"),       # dist 1 from d0, 2 from d1
        ("d3", "alpha quarterly bulletin"),  # different length band
        ("d4", "beta annual report"),        # different leading token
    ]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    got = {(r.id_a, r.id_b): r.dist
           for r in edit_distance_pairs(df, max_dist=2).collect()}
    assert got == {("d0", "d1"): 1, ("d0", "d2"): 1, ("d1", "d2"): 2}


def test_edit_distance_max_block_drops_hot_key(spark):
    rows = [(f"d{i}", "the common title") for i in range(6)]
    rows.append(("x0", "rare heading one"))
    rows.append(("x1", "rare heading onX"))
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    got = {(r.id_a, r.id_b)
           for r in edit_distance_pairs(df, max_dist=2,
                                        max_block=4).collect()}
    assert got == {("x0", "x1")}


def test_clustering_coefficient(spark):
    from stirling_pdf_spark.operators.graph import clustering_coefficient
    # triangle a-b-c plus pendant d on a: deg(a)=3 others {2,2,1}
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.degree, r.tri_count, r.coeff_micro)
           for r in clustering_coefficient(df).collect()}
    assert got == {
        "a": (3, 1, 333333),   # 2*1e6 // 6
        "b": (2, 1, 1000000),
        "c": (2, 1, 1000000),
        "d": (1, 0, 0),
    }


def test_cocitation_counts_threshold_and_hub_cap(spark):
    from stirling_pdf_spark.operators.graph import cocitation

    edges = spark.createDataFrame(
        [
            ("s1", "x"), ("s1", "y"), ("s1", "y"),   # dup edge collapses
            ("s2", "x"), ("s2", "y"),
            ("s3", "x"), ("s3", "z"),
            ("hub", "x"), ("hub", "y"), ("hub", "z"), ("hub", "w"),
            ("s4", "s4"),                             # self loop dropped
        ],
        "src string, dst string")
    got = {(r["id_a"], r["id_b"]): r["common"]
           for r in cocitation(edges, min_common=2).collect()}
    # x,y co-cited by s1, s2, hub = 3; x,z by s3 + hub = 2
    assert got == {("x", "y"): 3, ("x", "z"): 2}
    # capping hub out-degree at 3 removes its contributions
    capped = {(r["id_a"], r["id_b"]): r["common"]
              for r in cocitation(edges, min_common=2,
                                  max_out=3).collect()}
    assert capped == {("x", "y"): 2}
