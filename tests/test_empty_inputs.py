"""Degenerate-input hardening: every operator family must return an
EMPTY (or well-defined degenerate) result on empty input frames, not
crash — at 100 TB, empty partitions/slices/sources are routine (a new
dump, a filtered-out language, a fresh incremental window)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def test_dedup_family_empty(spark, empty_docs):
    from pipegen_spark.operators import dedup as dd

    assert dd.exact_dedup(empty_docs, "text", "doc_id").count() == 0
    assert dd.minhash_lsh_pairs(empty_docs, "text", "doc_id").count() == 0
    assert dd.simhash_pairs(empty_docs, "text", "doc_id").count() == 0


def test_text_family_empty(spark, empty_docs):
    from pipegen_spark.operators import text as tx

    assert tx.with_quality(empty_docs.select("doc_id", "text")).count() == 0
    assert tx.with_langid(empty_docs.select("doc_id", "text")).count() == 0
    assert tx.vocab_topk(empty_docs, "text", "doc_id", k=5).count() == 0


def test_curation_family_empty(spark, empty_docs):
    from pipegen_spark.operators import curation as cu

    assert cu.quality_percentile_gate(empty_docs).count() == 0
    assert cu.rep_ngram_stats(empty_docs).count() == 0


def test_similarity_family_empty(spark, empty_emb):
    from pipegen_spark.operators import similarity as sim

    q = empty_emb.limit(0)
    assert sim.brute_force_topk(empty_emb, q, k=3, dim=2).count() == 0
    assert sim.range_search(empty_emb, q, threshold=0.5, dim=2).count() == 0
    assert (
        sim.knn_graph(empty_emb, empty_emb.vec_id < 0, k=3, dim=2).count()
        == 0
    )


def test_embeddings_family_empty(spark, empty_emb):
    from pipegen_spark.operators import embeddings as em

    assert em.centroid_outliers(empty_emb, dim=2).count() == 0
    assert em.l2_normalize(empty_emb, dim=2).count() == 0
