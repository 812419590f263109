"""Unit tests for the training-data operator library on constructed data
(planted duplicates / known neighbors), independent of the oracle harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipegen_spark.operators import dedup as dd
from pipegen_spark.operators import multimodal as mm
from pipegen_spark.operators import similarity as sim
from pipegen_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox leaps over the lazy dog", "en"),  # near dup
        (4, "completely different content about spark engines", "en"),
        (5, "el rapido zorro marron salta sobre el perro", "es"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup_flags_copy(docs):
    out = dd.exact_dedup(docs).select("doc_id", "is_dup").collect()
    flags = {r.doc_id: r.is_dup for r in out}
    assert flags == {1: False, 2: True, 3: False, 4: False, 5: False}


def test_minhash_finds_planted_near_dup(docs):
    pairs = dd.minhash_lsh_pairs(docs, k=1, threshold=0.7).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    # identical docs 1/2 collapse into one set (rep=1); the near-dup pair
    # (1,3) survives LSH and exact verification (jaccard 8/10)
    assert (1, 3) in found
    assert (1, 2) not in found
    for r in pairs:
        assert r.jac >= 0.7
    # doc-level mode keeps the identical pair
    raw = dd.minhash_lsh_pairs(
        docs, k=1, threshold=0.7, collapse_identical=False
    ).collect()
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in raw}


def test_simhash_identical_docs_hamming_zero(docs):
    pairs = dd.simhash_pairs(docs, max_hamming=60).collect()
    ham = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert ham.get((1, 2)) == 0
    # near-dup should be closer than the unrelated doc
    if (1, 3) in ham and (1, 4) in ham:
        assert ham[(1, 3)] < ham[(1, 4)]


def test_ngram_jaccard_scores(docs):
    pairs = dd.ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    jac = {(r.doc_a, r.doc_b): r.jac for r in pairs}
    assert jac.get((1, 2)) == 1.0


def test_brute_force_topk_self_similarity(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [1.0, 0.01, 0.0], 0),  # nearest to 0
            (2, [0.0, 1.0, 0.0], 0),
            (3, [-1.0, 0.0, 0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = vecs.filter(F.col("vec_id") == 0)
    out = sim.brute_force_topk(vecs, q, k=3).collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]
    assert out[0].cos == pytest.approx(1.0, abs=1e-3)


def test_langid_tiebreak_and_scores(docs):
    out = {r.doc_id: r for r in tx.with_langid(docs).collect()}
    assert out[1].pred_lang == "en"
    assert out[5].pred_lang == "es"
    assert out[1].score_en >= 2


def test_quality_monotone_in_length(docs):
    out = {r.doc_id: r for r in tx.with_quality(docs).collect()}
    assert 0.0 <= out[1].quality_score <= 1.0
    assert out[1].alpha_ratio < 1.0  # spaces exist


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], ["doc_id", "text"]
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert fps[1] != fps[2]  # rolling hash is order-sensitive


def test_multimodal_feature_extraction(spark):
    rows = [(1, "image", b"\x89PNG-fake-bytes"), (2, "image", None)]
    df = spark.createDataFrame(rows, ["media_id", "media_type", "content"])
    out = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert out[1].n_bytes == 15
    assert out[1].feat_dim == 8
    assert out[2].n_bytes == 0  # null payload handled
    # determinism
    again = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert out[1].content_sha == again[1].content_sha


def test_multimodal_decoder_stub_raises(spark):
    df = spark.createDataFrame([(1, b"x")], ["media_id", "content"])
    with pytest.raises(Exception, match="decoder"):
        mm.extract_features(df, decoder=None).collect()


def test_frame_sample_counts(spark):
    df = spark.createDataFrame(
        [(1, 3500)], ["media_id", "meta_duration_ms"]
    )
    out = mm.frame_sample(df, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in out] == [0, 1000, 2000, 3000]
