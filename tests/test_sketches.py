"""Unit tests for the sketch operators (operators/sketches.py)."""

from __future__ import annotations

from pipegen_spark.operators import sketches as sk


def test_cms_sketch_is_bounded_and_mass_preserving(spark):
    toks = spark.createDataFrame(
        [(t,) for t in "a b c a b a b c d d d d".split()], "t string"
    )
    cells = sk.cms_sketch(toks, "t").collect()
    assert len(cells) <= sk.CMS_D * sk.CMS_W
    # Every sketch row preserves the total token mass.
    per_row = {}
    for c in cells:
        per_row[c["j"]] = per_row.get(c["j"], 0) + c["cnt"]
    assert set(per_row) == set(range(sk.CMS_D))
    assert all(v == 12 for v in per_row.values())


def test_cms_estimate_never_undercounts_and_is_exact_when_sparse(spark):
    df = spark.createDataFrame(
        [(1, "x x x y y z"), (2, "x y w w q")], "doc_id long, text string"
    )
    out = {r["token"]: r for r in sk.cms_heavy_hitters(df, "text").collect()}
    assert set(out) == {"x", "y", "z", "w", "q"}
    for r in out.values():
        assert r["overcount"] >= 0
        assert r["est_count"] >= r["true_count"]
    # 5 distinct tokens in 4x64 cells: collisions are possible but the
    # exact counts themselves must be right.
    assert out["x"]["true_count"] == 4
    assert out["y"]["true_count"] == 3
    assert out["w"]["true_count"] == 2


def test_cms_topk_orders_by_estimate_then_token(spark):
    df = spark.createDataFrame(
        [(1, "m m m n n o")], "doc_id long, text string"
    )
    rows = sk.cms_heavy_hitters(df, "text", topk=2).collect()
    assert len(rows) == 2
    assert rows[0]["token"] == "m"
    assert rows[0]["est_count"] >= rows[1]["est_count"]


def test_cms_sketch_is_mergeable(spark):
    # Partial sketches summed cell-wise == the sketch of the union: the
    # property that makes CMS safe for map-side partial aggregation and
    # streaming state.
    t1 = spark.createDataFrame([(t,) for t in "a b a c".split()], "t string")
    t2 = spark.createDataFrame([(t,) for t in "b c d d".split()], "t string")
    whole = spark.createDataFrame(
        [(t,) for t in "a b a c b c d d".split()], "t string"
    )
    def cells(df):
        return {
            (r["j"], r["bucket"]): r["cnt"]
            for r in sk.cms_sketch(df, "t").collect()
        }
    c1, c2, cw = cells(t1), cells(t2), cells(whole)
    merged = dict(c1)
    for k, v in c2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cw


def test_cms_heavy_hitters_tokenless_corpus_is_empty(spark):
    df = spark.createDataFrame([(1, "..."), (2, "")], "doc_id long, text string")
    assert sk.cms_heavy_hitters(df, "text").collect() == []


# --- KMV overlap -------------------------------------------------------------


def test_kmv_exact_path_below_k(spark):
    # Slices smaller than k surface their exact distinct counts, and the
    # k-min-domain Jaccard of disjoint sets is 0.
    from pipegen_spark.operators import sketches as sk

    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(100, 105)]
    df = spark.createDataFrame(rows, ["s", "m"])
    r = sk.kmv_overlap(df, "s", "m", "a", "b").collect()[0]
    assert r["est_distinct_a"] == 10 and r["est_distinct_b"] == 5
    assert r["kmv_inter"] == 0 and r["est_jaccard_ppm"] == 0


def test_kmv_estimator_within_tolerance_and_overlap(spark):
    # 500 members in A, the same 500 in B (full overlap): estimates land
    # within ~35% of truth at k=64 and the k-min-domain Jaccard is 1.
    from pipegen_spark.operators import sketches as sk

    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(500)]
    df = spark.createDataFrame(rows, ["s", "m"])
    r = sk.kmv_overlap(df, "s", "m", "a", "b").collect()[0]
    for est in (r["est_distinct_a"], r["est_distinct_b"]):
        assert 325 <= est <= 675, r
    assert r["est_jaccard_ppm"] == 1_000_000
    assert r["kmv_union"] == sk.KMV_K


def test_kmv_partial_overlap_direction(spark):
    # A = 0..399, B = 200..599: true Jaccard 1/3 — the sketch estimate
    # must land well away from both 0 and 1.
    from pipegen_spark.operators import sketches as sk

    rows = [("a", i) for i in range(400)] + [
        ("b", i) for i in range(200, 600)
    ]
    df = spark.createDataFrame(rows, ["s", "m"])
    r = sk.kmv_overlap(df, "s", "m", "a", "b").collect()[0]
    assert 100_000 <= r["est_jaccard_ppm"] <= 600_000, r


def test_hll_known_cardinalities(spark):
    """From-scratch HLL (r13): estimates land inside ~3 standard
    errors (1.04/sqrt(256) = 6.5%) of known cardinalities, BOTH
    estimator branches fire across the range, and the register state
    is bounded at m rows per group."""
    from pipegen_spark.operators import sketches as sk

    rows = []
    for gname, n in (("g50", 50), ("g640", 640), ("g5000", 5000),
                     ("g200000", 200000)):
        rows += [(gname, f"{gname}-val-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "source string, s string")
    out = {r["source"]: r for r in
           sk.hll_distinct(df, "s", "source").collect()}
    assert out["g50"]["correction"] == "linear"
    assert out["g200000"]["correction"] == "raw"
    for g, n in (("g50", 50), ("g640", 640), ("g5000", 5000),
                 ("g200000", 200000)):
        r = out[g]
        assert r["n_exact"] == n
        assert abs(r["hll_estimate"] - n) <= max(0.20 * n, 8), r
        assert 0 <= r["v_empty"] <= sk.HLL_M
    # exact-register bound: the sketch state can never exceed m rows
    assert all(0 <= r["v_empty"] <= sk.HLL_M for r in out.values())


def test_hll_constants_are_shared_literals():
    """The two float-derived constants are import-time literals (the
    determinism contract: both dialects embed the SAME numbers)."""
    from pipegen_spark.operators import sketches as sk

    assert sk.HLL_ALPHA_PPM == 718273
    assert len(sk.HLL_LINEAR) == sk.HLL_M
    assert sk.HLL_LINEAR[0] == round(sk.HLL_M * __import__("math").log(sk.HLL_M))
    assert sk.HLL_LINEAR[-1] == 0
    # linear table is strictly decreasing until the tail zeros
    assert all(a >= b for a, b in zip(sk.HLL_LINEAR, sk.HLL_LINEAR[1:]))
