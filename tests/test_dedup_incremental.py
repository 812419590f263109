"""Unit tests for cross-corpus incremental dedup (operators/dedup.py)."""

from __future__ import annotations

from pipegen_spark.operators import dedup as dd


def test_incremental_flags_exact_and_prefix(spark):
    ref = spark.createDataFrame(
        [
            (1, "the shared template header one two three four five six "
                "seven eight nine ten eleven twelve then unique ref tail"),
            (2, "an exact copy travels between corpora unchanged"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # exact copy of ref doc 2 -> both flags
            (10, "an exact copy travels between corpora unchanged"),
            # same first 12 tokens as ref doc 1, different tail -> prefix only
            (11, "the shared template header one two three four five six "
                 "seven eight nine ten eleven twelve but a new ending here"),
            # genuinely new
            (12, "nothing like anything in the reference corpus at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dd.incremental_dedup(new, ref, prefix_k=12).collect()
    }
    assert rows[10]["ref_exact_dup"] and rows[10]["ref_prefix_dup"]
    assert not rows[11]["ref_exact_dup"] and rows[11]["ref_prefix_dup"]
    assert not rows[12]["ref_exact_dup"] and not rows[12]["ref_prefix_dup"]
    assert set(rows) == {10, 11, 12}  # reference rows never surface


def test_bloom_admission_no_false_negatives_and_planted_hit(spark):
    from pipegen_spark.operators import dedup as dd

    ref = spark.createDataFrame(
        [(i, f"template header alpha beta gamma delta doc {i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, "template header alpha beta gamma delta doc 100"),
            (101, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    # prefix_k=7 makes doc 100 share the reference prefix fingerprint.
    out = {
        r["doc_id"]: r
        for r in dd.bloom_admission(new, ref, prefix_k=7).collect()
    }
    assert out[100]["exact_dup"] and out[100]["bloom_hit"]
    assert not out[100]["false_positive"]
    # No false negatives: every exact_dup row must be bloom_hit.
    for r in out.values():
        if r["exact_dup"]:
            assert r["bloom_hit"]
