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


def test_round8_additions_empty(spark, empty_docs, empty_emb):
    from pyspark.sql import functions as F

    from pipegen_spark.operators import curation as cu
    from pipegen_spark.operators import similarity as sim
    from pipegen_spark.operators import text as tx

    # BPE trainer: empty corpus -> no merges, empty (schema'd) frame
    out = tx.bpe_train(empty_docs, rounds=3)
    assert out.count() == 0
    assert out.columns == [
        "merge_rank", "sym_x", "sym_y", "pair_count", "merged"
    ]
    # hard negatives / bitext: empty base (planes predicate matches
    # nothing -> zero-plane bucket 0 for everyone, still empty)
    assert sim.hard_negatives(
        empty_emb, F.col("vec_id") < 0, dim=2
    ).count() == 0
    empty_groups = spark.createDataFrame(
        [], "vec_id long, is_src boolean"
    )
    assert sim.bitext_margin(
        empty_emb, empty_groups, F.col("vec_id") < 0, dim=2
    ).count() == 0
    # one-sided bitext corpus (sources but no targets) -> no pairs
    one_side = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    one_groups = spark.createDataFrame(
        [(0, True), (1, True)], "vec_id long, is_src boolean"
    )
    assert sim.bitext_margin(
        one_side, one_groups, F.col("vec_id") == 0, dim=2
    ).count() == 0
    # preference pairs: empty corpus and singleton sources (n DIV 2 = 0)
    assert cu.preference_pairs(empty_docs).count() == 0
    singles = spark.createDataFrame(
        [(0, "only doc here", "a"), (1, "another lone doc", "b")],
        "doc_id long, text string, source string",
    )
    assert cu.preference_pairs(singles).count() == 0
