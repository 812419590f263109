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


def test_round8_late_tranche_empty(spark, empty_docs, empty_emb):
    from pyspark.sql import functions as F

    from pipegen_spark.operators import curation as cu
    from pipegen_spark.operators import embeddings as em
    from pipegen_spark.operators import similarity as sim
    from pipegen_spark.operators import text as tx

    # BPE tokenization pass: empty corpus -> empty per-doc frame
    out = tx.bpe_encode_stats(empty_docs, rounds=3)
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "n_words", "n_chars_az", "n_bpe_tokens",
        "tok_per_char_ppm",
    ]
    # TextRank: empty corpus -> no edges -> empty ranking
    assert tx.textrank_keywords(empty_docs).count() == 0
    # ... and a corpus whose every bigram is stopword-adjacent or a
    # self-pair (no qualifying edges) -> empty, not a crash
    degenerate = spark.createDataFrame(
        [(0, "the the the"), (1, "a of the")],
        "doc_id long, text string",
    )
    assert tx.textrank_keywords(degenerate).count() == 0
    # DoReMi: empty corpus -> no domains; single source -> weight 1e6
    assert cu.doremi_weights(empty_docs).count() == 0
    one_src = spark.createDataFrame(
        [(0, "some text here", "src0"), (1, "more text there", "src0")],
        "doc_id long, text string, source string",
    )
    rows = cu.doremi_weights(one_src).collect()
    assert len(rows) == 1
    assert rows[0]["w_ppm"] == 1_000_000  # loss deficit vs itself is 0
    # Blocklist: empty corpus -> empty frame (NULL text covered in
    # tests/test_curation.py)
    assert cu.with_blocklist(empty_docs).count() == 0
    # IVF-PQ: empty base (no centroids, no codebook, no queries)
    assert sim.ivfpq_topk(
        empty_emb,
        F.col("vec_id") < 0,
        F.col("vec_id") < 0,
        F.col("vec_id") < 0,
        dim=2,
        m=1,
    ).count() == 0
    # Power iteration: empty embeddings -> empty Gram -> empty direction
    assert em.top_direction(empty_emb, dim=2).count() == 0


def test_round8_validation_errors(spark, empty_docs, empty_emb):
    """Loud rejection beats silent no-ops: bad blocklist entries (wrong
    case / punctuation can never match the lowercased [a-z0-9]+ token
    stream) and a zero-round power iteration raise ValueError."""
    from pipegen_spark.operators import curation as cu
    from pipegen_spark.operators import embeddings as em

    with pytest.raises(ValueError, match="blocklist entry"):
        cu.blocklist_exprs("text", "spark", {"bad": "Slow"})
    with pytest.raises(ValueError, match="blocklist entry"):
        cu.blocklist_exprs("text", "spark", {"bad": "don't"})
    with pytest.raises(ValueError, match="blocklist entry"):
        cu.blocklist_exprs("text", "spark", {"bad": ""})
    with pytest.raises(ValueError, match="rounds"):
        em.top_direction(empty_emb, dim=2, rounds=0)


def test_hll_and_curation_signals_empty(spark, empty_docs):
    from pipegen_spark.operators import sketches as sk
    from pipegen_spark.queries.training_data import _curation_signals

    empty_vals = spark.createDataFrame([], "source string, s string")
    assert sk.hll_distinct(empty_vals, "s", "source").count() == 0
    # the e2e pipeline's signal stage (WARC ingest -> langid -> redact)
    # on an empty corpus: empty frame, full schema
    sig = _curation_signals(empty_docs.select("doc_id", "text", "source"))
    assert sig.count() == 0
    assert set(sig.columns) == {
        "doc_id", "source", "pred_lang", "http_status", "n_pii",
        "redacted",
    }


def test_group_assignor_degenerate():
    from pipegen_spark.sources.kafka_wire import range_assign

    assert range_assign({}, {"t": 4}) == {}
    assert range_assign({"a": ["t"]}, {}) == {"a": {}}
    # zero-partition topic: nobody gets an entry for it
    assert range_assign({"a": ["t"]}, {"t": 0}) == {"a": {}}
