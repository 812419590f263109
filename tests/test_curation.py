"""Unit tests for the corpus-curation operators (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipegen_spark.operators import curation as cu


def test_redaction_detects_and_redacts_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or 555-123-4567 now"),
            (2, "server at 10.0.42.7 leaked id 123456789"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in cu.with_redaction(df, "text").collect()
    }
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_digits"] == 1
    assert "<EMAIL>" in rows[1]["redacted"]
    assert "<PHONE>" in rows[1]["redacted"]
    assert "bob@example.com" not in rows[1]["redacted"]
    assert "<IPV4>" in rows[2]["redacted"]
    assert rows[3]["redacted"] == "nothing sensitive here"
    assert rows[3]["n_email"] == 0


def test_contamination_flags_benchmark_overlap(spark):
    phrase = "one two three four five six seven eight"
    bench = spark.createDataFrame(
        [(100, phrase)], "doc_id long, text string"
    )
    cand = spark.createDataFrame(
        [
            (1, phrase + " nine"),  # 2 8-grams, 1 shared -> ratio 0.5
            (2, "totally different words entirely here and everywhere now"),
            (3, "short"),  # < 8 tokens -> zeros
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in cu.contamination_check(
            cand, bench, "text", "doc_id", n=8, threshold=0.5
        ).collect()
    }
    assert out[1]["n_overlap"] >= 1 and out[1]["is_contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["is_contaminated"]
    assert out[3]["n_ngrams"] == 0 and out[3]["contamination"] == 0.0


def test_repetition_scores_repeated_text_higher(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "every word here is completely distinct friend"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cu.with_repetition(df, "text").collect()}
    assert rows[1]["rep_ratio"] > 0.8
    assert rows[2]["rep_ratio"] == 0.0
    assert rows[2]["n_distinct"] == rows[2]["n_ngrams"]


def test_stratified_sample_deterministic_and_rate_ordered(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        "doc_id long, lang string",
    )
    rates = {"en": 5000, "fr": 500}
    s1 = cu.stratified_sample(df, "doc_id", "lang", rates).collect()
    s2 = cu.stratified_sample(df, "doc_id", "lang", rates).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    by_lang = {"en": 0, "fr": 0}
    for r in s1:
        by_lang[r["lang"]] += 1
    # en sampled at 50% of 1000, fr at 5% of 1000 — wide margins
    assert 350 < by_lang["en"] < 650
    assert by_lang["fr"] < 150
    assert by_lang["en"] > by_lang["fr"]


def test_pack_sequences_offsets_and_chunks(spark):
    # 5 docs of 10 tokens each in one stream, budget 25:
    # offsets 0,10,20,30,40 -> seq ids 0,0,0,1,1
    text = " ".join(["tok"] * 10)
    df = spark.createDataFrame(
        [(i, "en", "s0", text) for i in range(5)],
        "doc_id long, lang string, source string, text string",
    )
    rows = sorted(
        cu.pack_sequences(df, "text", "doc_id", budget=25).collect(),
        key=lambda r: r["id"],
    )
    assert [r["tok_offset"] for r in rows] == [0, 10, 20, 30, 40]
    assert [r["seq_id"] for r in rows] == [0, 0, 0, 1, 1]
    assert [r["seq_off"] for r in rows] == [0, 10, 20, 5, 15]
    assert all(r["n_tokens"] == 10 for r in rows)


def test_pack_sequences_streams_are_independent(spark):
    text = " ".join(["tok"] * 10)
    df = spark.createDataFrame(
        [
            (1, "en", "s0", text),
            (2, "fr", "s0", text),
            (3, "en", "s0", text),
        ],
        "doc_id long, lang string, source string, text string",
    )
    rows = {
        r["id"]: r for r in cu.pack_sequences(df, "text", "doc_id", 2048).collect()
    }
    # fr stream restarts at offset 0 regardless of en docs
    assert rows[2]["tok_offset"] == 0
    assert rows[1]["tok_offset"] == 0 and rows[3]["tok_offset"] == 10


def test_pack_sequences_auto_shard_bounds_streams(spark):
    """A deliberately hot stream gets hash-sharded: no (stream, shard)
    group exceeds ~max_stream_rows-scale, tokens are conserved, and the
    window math stays valid inside each shard."""
    docs = spark.createDataFrame(
        [(i, "en", "web", "alpha beta gamma") for i in range(200)]
        + [(1000 + i, "fr", "web", "un deux") for i in range(5)],
        "doc_id long, lang string, source string, text string",
    )
    out = cu.pack_sequences(
        docs, "text", "doc_id", budget=10,
        part_cols=("lang", "source"), max_stream_rows=50,
    ).collect()
    assert len(out) == 205
    assert all(hasattr(r, "_shard") for r in out)
    from collections import Counter

    groups = Counter((r.lang, r.source, r._shard) for r in out)
    hot = {k: v for k, v in groups.items() if k[0] == "en"}
    assert len(hot) > 1, "hot stream must split into multiple shards"
    # hash-uniform split: no shard should be anywhere near the full stream
    assert max(hot.values()) < 200
    # per-shard window math: offsets within each shard are cumulative
    by_group: dict = {}
    for r in sorted(out, key=lambda r: r.id):
        key = (r.lang, r.source, r._shard)
        expected = by_group.get(key, 0)
        assert r.tok_offset == expected, (key, r.id)
        assert r.seq_id == expected // 10 and r.seq_off == expected % 10
        by_group[key] = expected + r.n_tokens
    # the small stream must not shard
    assert len({k for k in groups if k[0] == "fr"}) == 1


def test_pack_sequences_no_shard_by_default(spark):
    docs = spark.createDataFrame(
        [(1, "en", "web", "a b c")],
        "doc_id long, lang string, source string, text string",
    )
    out = cu.pack_sequences(docs, "text", "doc_id")
    assert "_shard" not in out.columns


def test_chunk_documents_overlap_and_coverage(spark):
    text = "abcdefghij" * 50  # 500 chars
    df = spark.createDataFrame(
        [(1, text), (2, ""), (3, "tiny")], "doc_id long, text string"
    )
    rows = cu.chunk_documents(
        df, "text", "doc_id", size=200, overlap=50
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    # 500 chars, step 150 -> starts 1,151,301,451 (451 <= 500)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_start"] for r in c1] == [1, 151, 301, 451]
    assert all(len(r["chunk"]) == 200 for r in c1[:-1])
    assert len(c1[-1]["chunk"]) == 50  # tail clamp
    # consecutive chunks share exactly `overlap` characters
    assert c1[0]["chunk"][150:] == c1[1]["chunk"][:50]
    # reconstruction: dropping each chunk's overlap prefix rebuilds the doc
    rebuilt = c1[0]["chunk"] + "".join(r["chunk"][50:] for r in c1[1:])
    assert rebuilt == text
    # empty doc -> exactly one empty chunk; short doc -> one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == ""
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk"] == "tiny"


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cu.chunk_documents(df, size=100, overlap=100)


def test_with_normalized_canonicalizes(spark):
    from pipegen_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "  Hello,   WORLD!  "),
            (2, "hello world"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in tx.with_normalized(df, "text").collect()}
    assert rows[1]["norm_text"] == "hello world"
    # differently-messy inputs normalize to the same canonical form
    assert rows[1]["norm_text"] == rows[2]["norm_text"]
    assert rows[1]["n_norm_chars"] == 11
    assert rows[3]["norm_text"] == "" and rows[3]["n_norm_chars"] == 0


def test_mixture_sample_budget_semantics(spark):
    """Rates: under-budget streams keep everything (rate 1.0);
    over-budget streams down-sample toward the uniform per-stream
    target; decisions are a pure function of doc_id."""
    from pipegen_spark.operators.curation import mixture_sample

    rows = []
    # stream A: 10 docs x 100 tokens = 1000 tokens; stream B: 10 x 10.
    for i in range(10):
        rows.append((i, "en", "web", " ".join(["tok"] * 100)))
        rows.append((100 + i, "en", "book", " ".join(["tok"] * 10)))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    out = mixture_sample(df, budget_fraction="0.5").collect()
    # total 1100 tokens, budget 550, 2 streams -> 275 target/stream.
    by_stream = {}
    for r in out:
        by_stream.setdefault(r["source"], []).append(r)
    web_rate = by_stream["web"][0]["rate"]
    book_rate = by_stream["book"][0]["rate"]
    assert book_rate == 1.0          # 100 tokens < 275 target
    assert abs(web_rate - 0.275) < 1e-12  # 275/1000
    # determinism: same decisions on a second run
    again = {r["doc_id"]: r["keep"] for r in mixture_sample(
        df, budget_fraction="0.5").collect()}
    assert {r["doc_id"]: r["keep"] for r in out} == again
    # every under-budget doc kept
    assert all(r["keep"] for r in by_stream["book"])


def test_gopher_rules_fire_individually(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs back "
        "to the barn with plenty of words that have normal length so the "
        "document passes every published heuristic rule just fine today "
        "because it keeps going for more than fifty words in total which "
        "is the gopher minimum word count requirement for a document"
    )
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipsis = "\n".join(f"the line trails off {i} ..." for i in range(10))
    symbols = "the # doc # with # far # too # many # hash # symbols # here"
    short = "too short"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, ellipsis), (4, symbols), (5, short)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cu.with_gopher(df, "text").collect()}
    assert rows[1]["gopher_keep"]
    assert rows[1]["n_required_stops"] >= 2
    assert rows[2]["bullet_ratio"] == 1.0 and not rows[2]["gopher_keep"]
    assert rows[3]["ellipsis_ratio"] == 1.0 and not rows[3]["gopher_keep"]
    assert rows[4]["symbol_ratio"] > 0.1 and not rows[4]["gopher_keep"]
    assert rows[5]["n_words"] < 50 and not rows[5]["gopher_keep"]


def test_gopher_threshold_overrides(spark):
    df = spark.createDataFrame(
        [(1, "the small doc has these ten plain words here now")],
        "doc_id long, text string",
    )
    strict = cu.with_gopher(df, "text").collect()[0]
    tuned = cu.with_gopher(
        df, "text", min_words=5, min_required_stops=1
    ).collect()[0]
    assert not strict["gopher_keep"]
    assert tuned["gopher_keep"]


def test_split_deterministic_and_weighted(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    out = cu.with_split(df).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1600  # ~90% of 2000
    assert 30 < counts["val"] < 200 and 30 < counts["test"] < 200
    # stable under re-evaluation and partitioning
    again = {
        r["doc_id"]: r["split"]
        for r in cu.with_split(df.repartition(7)).collect()
    }
    first = {r["doc_id"]: r["split"] for r in cu.with_split(df).collect()}
    assert first == again


def test_split_rejects_bad_weights(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cu.split_expr("doc_id", "spark", (("a", 5000), ("b", 600)))


def test_dsir_prefers_target_like_documents(spark):
    # Target docs are "alpha"-flavored; one candidate matches the target
    # distribution, one is pure out-of-domain vocabulary.
    rows = [
        (1, True, "alpha beta alpha beta alpha beta"),
        (2, True, "alpha beta gamma alpha beta gamma"),
        (3, False, "alpha beta alpha beta gamma alpha"),
        (4, False, "zulu yankee xray zulu yankee xray"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, is_target boolean, text string")
    out = {
        r["doc_id"]: r
        for r in cu.dsir_scores(df, target=F.col("is_target")).collect()
    }
    # In-domain candidate outscores the out-of-domain one, and the keep
    # decision splits exactly at the corpus mean.
    assert out[3]["score_micro"] > out[4]["score_micro"]
    assert out[3]["keep"] and not out[4]["keep"]
    assert all(out[i]["n_feats"] == 11 for i in (1, 2, 3, 4))


def test_dsir_featureless_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, True, "alpha beta"), (2, False, "...")],
        "doc_id long, is_target boolean, text string",
    )
    out = {
        r["doc_id"]: r
        for r in cu.dsir_scores(df, target=F.col("is_target")).collect()
    }
    assert out[2]["n_feats"] == 0
    assert out[2]["score_micro"] == 0
    assert out[2]["keep"] is False


def test_weighted_sample_is_deterministic_and_size_biased(spark):
    # 200 docs, half weight 10, half weight 1000: the heavy half should
    # dominate a 50-doc sample under priority = hash/weight.
    rows = [(i, 10 if i % 2 == 0 else 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out1 = cu.weighted_sample(df, "n_chars", k=50).collect()
    out2 = cu.weighted_sample(df, "n_chars", k=50).collect()
    assert [r["doc_id"] for r in out1] == [r["doc_id"] for r in out2]
    heavy = sum(1 for r in out1 if r["weight"] == 1000)
    assert heavy >= 40
    # TakeOrdered path: no global sort shuffle in the physical plan.
    plan = (
        cu.weighted_sample(df, "n_chars", k=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_k_larger_than_input_returns_all(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id long, n_chars long"
    )
    assert len(cu.weighted_sample(df, "n_chars", k=100).collect()) == 2


# --- corpus drift ------------------------------------------------------------


def test_drift_identical_distributions_is_zero(spark):
    # Same token multiset in both slices -> every bucket's cross-products
    # cancel exactly -> TV = 0.
    df = spark.createDataFrame(
        [(1, "en", "alpha beta gamma"), (2, "de", "alpha beta gamma")],
        ["doc_id", "lang", "text"],
    )
    rows = cu.corpus_drift(df, F.col("lang") == "en", "text").collect()
    assert rows and all(r["tv_ppm"] == 0 and r["drift_num"] == 0 for r in rows)
    assert all(r["cnt_a"] == r["cnt_b"] for r in rows)


def test_drift_disjoint_distributions_is_maximal(spark):
    # Fully disjoint vocabularies: TV = 1. With tiny counts the ppm
    # denominator clamps to 1, so tv_ppm = sum of numerators = 2*na*nb.
    df = spark.createDataFrame(
        [(1, "en", "aaa aaa bbb"), (2, "de", "xxx yyy zzz zzz")],
        ["doc_id", "lang", "text"],
    )
    rows = cu.corpus_drift(df, F.col("lang") == "en", "text").collect()
    na, nb = 3, 4
    assert rows[0]["tv_ppm"] == 2 * na * nb
    # Every bucket is single-sided.
    assert all(r["cnt_a"] == 0 or r["cnt_b"] == 0 for r in rows)


def test_drift_empty_slice_degenerates_to_zero(spark):
    # No rows in slice A: all numerators are 0 (cnt_a = 0 and nb-side
    # cross terms multiply by na = 0) — deterministic, no crash.
    df = spark.createDataFrame(
        [(1, "de", "alpha beta"), (2, "fr", "gamma delta")],
        ["doc_id", "lang", "text"],
    )
    rows = cu.corpus_drift(df, F.col("lang") == "en", "text").collect()
    assert rows and all(r["tv_ppm"] == 0 for r in rows)


# --- objective transforms: span mask + FIM -----------------------------------


def test_span_mask_reconstructs_original(spark):
    # Splicing each target span back over its sentinel must reproduce the
    # original token sequence exactly — the round-trip property that
    # makes the (input, target) pair a valid denoising example.
    import re

    docs = [
        (i, " ".join(f"tok{j}" for j in range(40))) for i in range(1, 9)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in cu.span_mask(df).collect()}
    masked_total = 0
    for i, text in docs:
        r = out[i]
        spans = {}
        cur, buf = None, []
        for t in r["target_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", t)
            if m:
                if cur is not None:
                    spans[cur] = buf
                cur, buf = int(m.group(1)), []
            else:
                buf.append(t)
        if cur is not None:
            spans[cur] = buf
        rebuilt = []
        for t in r["input_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", t)
            if m:
                rebuilt.extend(spans[int(m.group(1))])
            else:
                rebuilt.append(t)
        assert rebuilt == text.split(), i
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        masked_total += r["n_masked"]
    # The 15% gate should mask SOMETHING across 320 positions.
    assert masked_total > 0


def test_fim_reassembles_and_bounds(spark):
    docs = [(1, "abcdefghij"), (2, "x"), (3, "")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in cu.with_fim(df).collect()}
    for i, text in docs:
        r = out[i]
        a, b = r["split_a"], r["split_b"]
        assert 0 <= a <= b <= len(text), (i, a, b)
        body = r["fim_text"]
        assert body.startswith(cu.FIM_PRE)
        pre, rest = body[len(cu.FIM_PRE):].split(cu.FIM_SUF, 1)
        suf, mid = rest.split(cu.FIM_MID, 1)
        assert pre + mid + suf == text, i
        assert (pre, mid, suf) == (text[:a], text[a:b], text[b:])


def test_temperature_weights_sqrt_scaling(spark):
    # sources 16:4 -> shares 0.8/0.2; sqrt scaling gives 4:2 = 2/3, 1/3.
    rows = [(i, "s_big") for i in range(16)] + [
        (100 + i, "s_small") for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in cu.temperature_weights(df).collect()}
    assert out["s_big"]["share_ppm"] == 800_000
    assert out["s_small"]["share_ppm"] == 200_000
    assert out["s_big"]["weight_ppm"] == 666_667  # 2/3 rounded half-up
    assert out["s_small"]["weight_ppm"] == 333_333
    # the small source gets oversampled (boost > 1), the big one damped
    assert out["s_small"]["boost_micro"] > 1_000_000
    assert out["s_big"]["boost_micro"] < 1_000_000


def test_rep_ngram_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b c"),          # top 2-gram "a b" x2
            (2, "x x x x x x"),        # dup 5-gram "x x x x x" x2
            (3, "q"),                  # shorter than both n
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in cu.rep_ngram_stats(df).collect()
    }
    # doc 1: joined "a b a b c" = 9 chars; top gram "a b" (3 chars) x2
    assert rows[1]["total_chars"] == 9
    assert rows[1]["top_frac_ppm"] == 1_000_000 * 2 * 3 // 9
    assert rows[1]["dup_chars"] == 0 and rows[1]["dup_frac_ppm"] == 0
    # doc 2: joined 11 chars; "x x" x5 carries 15 overlapping chars over
    # 11 total -> raw ratio >1, capped at 1e6 like dup_frac_ppm;
    # "x x x x x" (9 chars) x2 -> also capped
    assert rows[2]["total_chars"] == 11
    assert rows[2]["top_frac_ppm"] == 1_000_000  # least() cap
    assert rows[2]["dup_chars"] == 18
    assert rows[2]["dup_frac_ppm"] == 1_000_000  # least() cap
    # doc 3: no 2-grams or 5-grams at all
    assert rows[3]["total_chars"] == 1
    assert rows[3]["top_frac_ppm"] == 0 and rows[3]["dup_frac_ppm"] == 0


def test_classifier_scores_match_reference_model(spark):
    """Replicate the hashed-feature linear model in plain Python (md5
    hash60 -> bucket -> Knuth weight) and check the engine agrees."""
    import hashlib

    texts = {1: "alpha beta alpha", 2: "gamma", 3: ""}
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )

    def weight(feature: str) -> int:
        h60 = int(hashlib.md5(feature.encode()).hexdigest()[:15], 16)
        return ((h60 % cu.CLF_BUCKETS) * 2654435761) % 2001

    expected = {}
    for did, text in texts.items():
        toks = [t for t in text.lower().split() if t]
        feats = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        sw = sum(weight(f) for f in feats)
        expected[did] = (len(feats), sw)

    rows = {
        r["doc_id"]: r for r in cu.classifier_scores(df).collect()
    }
    for did, (nf, sw) in expected.items():
        assert rows[did]["n_feats"] == nf
        assert rows[did]["sum_w"] == sw
        assert rows[did]["avg_micro"] == (sw // nf if nf else 0)
        assert rows[did]["keep"] == (nf > 0 and sw >= cu.CLF_NEUTRAL * nf)


def test_near_dup_rate_counts_exact_and_fuzzy(spark):
    """Planted corpus: srcA has an exact-dup pair + a unique doc; srcB has
    a fuzzy near-dup pair (high bigram Jaccard) + a unique doc."""
    from pipegen_spark.queries.training_data import (
        MINHASH_K,
        MINHASH_THRESHOLD,
    )
    from pipegen_spark.operators import dedup as dd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    words = [f"w{i}" for i in range(25)]
    base = " ".join(words)
    near_words = list(words)
    near_words[12] = "CHANGED"  # 1 word of 25 -> bigram J = 22/26 ~ 0.846
    near = " ".join(near_words)
    rows = [
        (0, "a", base),
        (1, "a", base),                       # exact dup of 0
        (2, "a", "totally different words here one two three four five six"),
        (3, "b", base + " tail0 tail1"),
        (4, "b", near + " tail0 tail1"),       # fuzzy near-dup of 3
        (5, "b", "unrelated content entirely something else and more again"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # sanity: the fuzzy pair really crosses the threshold
    pairs = dd.minhash_lsh_pairs(
        docs, "text", "doc_id", k=MINHASH_K, threshold=MINHASH_THRESHOLD
    ).collect()
    assert (3, 4) in {(r["doc_a"], r["doc_b"]) for r in pairs}

    out = {}
    # run the query logic on the constructed frame via the operator chain
    # (the registry query reads parquet; here we inline the same steps)
    dup_reps = (
        spark.createDataFrame(
            [(r["doc_a"],) for r in pairs] + [(r["doc_b"],) for r in pairs],
            "rep long",
        ).distinct().withColumn("_hit", F.lit(1))
    )
    sh = (
        dd.shingle_rows(docs, "text", "doc_id", MINHASH_K, distinct=False)
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("s")).alias("sh"))
    )
    wk = Window.partitionBy("skey")
    mapped = sh.withColumn("skey", F.md5(F.array_join("sh", ","))).select(
        "id",
        F.min("id").over(wk).alias("rep"),
        F.count("*").over(wk).alias("grp"),
    )
    flagged = mapped.join(dup_reps, "rep", "left").select(
        "id", ((F.col("grp") > 1) | F.col("_hit").isNotNull()).alias("d")
    )
    for r in (
        docs.select(F.col("doc_id").alias("id"), "source")
        .join(flagged, "id")
        .groupBy("source")
        .agg(F.sum(F.when(F.col("d"), 1).otherwise(0)).alias("n"))
        .collect()
    ):
        out[r["source"]] = r["n"]
    assert out == {"a": 2, "b": 2}


def test_near_dup_rate_short_docs_counted_never_dup(spark, tmp_path):
    """Round-7 ADVICE repro: docs with fewer than MINHASH_K tokens (so
    shingle_rows emits no rows) must be COUNTED in n_docs and NEVER
    flagged near-dup — and the Spark query must agree with its DuckDB
    oracle on such a corpus. Previously Spark's inner join dropped them
    (a source of only short docs vanished) while the oracle grouped all
    shingle-less docs under one empty-set key and flagged unrelated docs
    as mutual near-dups."""
    import duckdb

    import __spark_entry__ as e
    from pipegen_spark.queries.training_data import curate_near_dup_rate

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "srcA", 34),
        (1, "alpha beta gamma delta epsilon zeta", "en", "srcA", 34),
        (2, "solo", "en", "srcB", 4),       # shingle-less (1 token < k=2)
        (3, "hapax", "en", "srcB", 5),      # shingle-less, unrelated to 2
        (4, "completely different words one two three", "en", "srcC", 40),
        (5, "", "en", "srcC", 0),           # zero tokens
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    out = {
        r["source"]: r
        for r in curate_near_dup_rate(spark, str(tmp_path)).collect()
    }
    assert out["srcA"]["n_docs"] == 2 and out["srcA"]["n_near_dup"] == 2
    assert out["srcB"]["n_docs"] == 2 and out["srcB"]["n_near_dup"] == 0
    assert out["srcC"]["n_docs"] == 2 and out["srcC"]["n_near_dup"] == 0
    assert out["srcB"]["near_dup_ppm"] == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    drows = sorted(
        tuple(r)
        for r in con.execute(
            e.oracle_sql()["curate_near_dup_rate"]
        ).fetchall()
    )
    con.close()
    srows = sorted(
        (r["source"], r["n_docs"], r["n_near_dup"], r["near_dup_ppm"])
        for r in out.values()
    )
    assert drows == srows


def test_quality_threshold_gate_semantics(spark):
    """Planted-data semantics of the scale-safe gate: k = n*frac // 1e6
    docs kept per source, tie-inclusive at the cutoff, keep_frac_ppm=0
    keeps NOTHING (unlike the rank form's keep-the-maximum boundary),
    and on a tie-free corpus it keeps exactly the top-k."""
    from pipegen_spark.operators import curation as cu
    from pipegen_spark.operators import text as tx
    from pyspark.sql import functions as F

    # 10 docs in one source with strictly increasing quality (longer =
    # more tokens = higher score below the 100-token saturation).
    rows = [
        (i, "src", " ".join(f"the w{j}" for j in range(2 * i + 2)))
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out = {r["doc_id"]: r for r in
           cu.quality_threshold_gate(docs, keep_frac_ppm=600_000).collect()}
    scores = {d: out[d]["score_micro"] for d in out}
    # sanity: strictly increasing scores (tie-free)
    vals = [scores[d] for d in sorted(scores)]
    assert vals == sorted(set(vals)), vals
    # k = 10 * 0.6 = 6 -> exactly the 6 best kept
    kept = {d for d in out if out[d]["keep"]}
    assert kept == set(sorted(scores, key=lambda d: scores[d])[-6:])
    cut = min(scores[d] for d in kept)
    assert all(out[d]["cutoff_micro"] == cut for d in out)

    # keep 0% really keeps zero, with the sentinel cutoff surfaced
    z = cu.quality_threshold_gate(docs, keep_frac_ppm=0).collect()
    assert all(not r["keep"] for r in z)
    assert all(r["cutoff_micro"] == cu.QT_CUTOFF_NONE for r in z)

    # tie-inclusive: duplicate the best doc's text; k=2 of 4 -> cutoff at
    # the tied top score keeps all three tied docs
    tied = spark.createDataFrame(
        [(0, "s", "!!! ??? ,,, ... ;;;"),  # near-zero alpha ratio
         (1, "s", "the beta gamma delta epsilon"),
         (2, "s", "the beta gamma delta epsilon"),
         (3, "s", "the beta gamma delta epsilon")],
        "doc_id long, source string, text string",
    )
    t = {r["doc_id"]: r for r in
         cu.quality_threshold_gate(tied, keep_frac_ppm=500_000).collect()}
    assert {d for d in t if t[d]["keep"]} == {1, 2, 3}

    # keep_frac_ppm out of range raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cu.quality_threshold_gate(docs, keep_frac_ppm=1_000_001)


def test_ensemble_accepts_rank_gate(spark):
    """curate_ensemble's default is the 100 TB-safe threshold gate
    (r10 re-point); swapping the exact-rank [test-scale] form back in
    must preserve the output contract, and on the smoke corpus the
    verdicts agree wherever the two gates agree on pct_keep."""
    from pipegen_spark.operators import curation as cu
    from pipegen_spark.queries.training_data import curate_ensemble
    from tests.conftest import SF_SMOKE

    thresh = {r["doc_id"]: r for r in
              curate_ensemble(spark, SF_SMOKE).collect()}
    exact = {r["doc_id"]: r for r in
             curate_ensemble(
                 spark, SF_SMOKE,
                 percentile_gate=cu.quality_percentile_gate,
             ).collect()}
    assert set(exact) == set(thresh)
    for d in exact:
        assert exact[d]["gopher_keep"] == thresh[d]["gopher_keep"]
        assert exact[d]["clf_keep"] == thresh[d]["clf_keep"]
        if exact[d]["pct_keep"] == thresh[d]["pct_keep"]:
            assert exact[d]["keep"] == thresh[d]["keep"]


def test_rank_and_threshold_gates_keep_equivalence(spark):
    """The r10 re-point's safety net: on the micro-quantized score at
    test scale the production threshold plan and the retired exact-rank
    plan make IDENTICAL keep decisions (verified at sf0.001 and sf0.01
    before the re-point; pinned here at smoke scale so a future scoring
    change that breaks the equivalence fails loudly instead of silently
    shifting the gated surface's semantics)."""
    from pipegen_spark.queries.training_data import (
        curate_quality_percentile,
        ref_quality_percentile_rank,
    )
    from tests.conftest import SF_SMOKE

    prod = {r["doc_id"]: r["keep"] for r in
            curate_quality_percentile(spark, SF_SMOKE).collect()}
    rank = {r["doc_id"]: r["keep"] for r in
            ref_quality_percentile_rank(spark, SF_SMOKE).collect()}
    assert prod == rank and len(prod) > 0


def test_split_leakage_planted(spark):
    """Identical-text docs: every eval doc fully leaked (ppm 1e6,
    flagged); a unique-text eval doc reports 0; a short eval doc is
    counted with zeros. Split membership is discovered from the
    deterministic labels rather than assumed."""
    from pipegen_spark.operators import curation as cu

    ids = list(range(400))
    labels = {
        r["doc_id"]: r["split"]
        for r in cu.with_split(
            spark.createDataFrame([(i,) for i in ids], "doc_id long")
        ).collect()
    }
    evals = [i for i in ids if labels[i] != "train"]
    trains = [i for i in ids if labels[i] == "train"]
    assert evals and trains
    uniq, short = evals[0], evals[1]
    rows = []
    for i in ids:
        if i == uniq:
            rows.append((i, "totally unique eval words never in train"))
        elif i == short:
            rows.append((i, "so"))  # < k tokens
        else:
            rows.append((i, "alpha beta gamma delta epsilon"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cu.split_leakage(docs).collect()}
    assert set(out) == set(evals)
    for i in evals:
        if i == uniq:
            assert out[i]["leak_ppm"] == 0 and not out[i]["flagged"]
        elif i == short:
            assert tuple(out[i])[2:] == (0, 0, 0, False)
        else:
            assert out[i]["leak_ppm"] == 1_000_000 and out[i]["flagged"]


def test_vocab_growth_hand_computed(spark):
    from pipegen_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [(0, "a", "x x y"), (1, "a", "x z"), (2, "b", "w w w")],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in vocab_growth(docs).collect()}
    # source a: tokens x,x,y,x,z -> 5 tokens, 3 types, hapax {y,z}
    assert tuple(out["a"])[1:] == (
        5, 3, 2, 3 * 1_000_000 // 5, 2 * 1_000_000 // 3,
    )
    assert tuple(out["b"])[1:] == (3, 1, 0, 333_333, 0)


def test_unimax_zero_token_source_cross_engine(spark, tmp_path):
    """Round-7 ADVICE repro: a source whose documents are all
    empty/whitespace has n_tokens = 0; epochs_ppm must be 0 (guarded
    division) instead of ANSI DIVIDE_BY_ZERO, and Spark must agree
    with the DuckDB oracle row-for-row on such a corpus."""
    import duckdb

    import __spark_entry__ as e
    from pipegen_spark.queries.training_data import curate_unimax

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "srcA", 34),
        (1, "one two three four", "en", "srcA", 18),
        (2, "", "en", "srcEmpty", 0),
        (3, "   ", "en", "srcEmpty", 3),
        (4, "lorem ipsum dolor sit amet", "en", "srcB", 26),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    out = {r["source"]: r for r in curate_unimax(spark, str(tmp_path)).collect()}
    assert out["srcEmpty"]["n_tokens"] == 0
    assert out["srcEmpty"]["alloc_tokens"] == 0
    assert out["srcEmpty"]["epochs_ppm"] == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    drows = sorted(
        tuple(r)
        for r in con.execute(e.oracle_sql()["curate_unimax"]).fetchall()
    )
    con.close()
    srows = sorted(tuple(r) for r in out.values())
    assert drows == srows


def test_mul_ppm_overflow_safe_cross_engine(spark):
    """mul_ppm must stay exact where the naive total*ppm product
    overflows BIGINT (total > ~9.7e12 at ppm=950000) — verified against
    Python's arbitrary-precision floor on both engines."""
    import duckdb

    from pipegen_spark.functions import dialect as dl

    for total in (0, 1, 999_999, 1_000_000, 9_700_000_000_000,
                  4_000_000_000_000_000, 9_223_000_000_000_000_000):
        for ppm in (1, 950_000, 999_999):
            want = total * ppm // 1_000_000
            got_s = spark.sql(
                "SELECT "
                + dl.mul_ppm(f"CAST({total} AS BIGINT)", ppm, dl.SPARK)
                + " AS v"
            ).collect()[0]["v"]
            got_d = duckdb.sql(
                "SELECT "
                + dl.mul_ppm(f"CAST({total} AS BIGINT)", ppm, dl.DUCK)
                + " AS v"
            ).fetchone()[0]
            assert got_s == want, (total, ppm, got_s)
            assert got_d == want, (total, ppm, got_d)


def test_blocklist_word_boundary_phrase_counts(spark):
    """Planted C4-style blocklist semantics: phrase matches only at true
    token boundaries, adjacent repeats all count (the doubled-separator
    wrapped string gives every token its own flanking spaces), substrings
    of longer tokens never match, NULL text keeps."""
    import pipegen_spark.operators.curation as cu

    df = spark.createDataFrame(
        [
            # "slow" x2 adjacent + "big table" x2 (one split by "is")
            (1, "the big table is slow slow and big table again"),
            # non-overlapping phrase scan: merge batch | merge batch | merge
            (2, "merge batch merge batch merge"),
            (3, "clean text only"),
            # substring must NOT match: "slowly" is one token, "bigger
            # tables" shares no boundary-aligned phrase
            (4, "slowly bigger tables merge batches"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in cu.with_blocklist(df).collect()
    }
    assert rows[1]["hits_slow"] == 2
    assert rows[1]["hits_big_table"] == 2
    assert rows[1]["n_block_hits"] == 4 and not rows[1]["keep"]
    assert rows[2]["hits_merge_batch"] == 2 and not rows[2]["keep"]
    assert rows[3]["n_block_hits"] == 0 and rows[3]["keep"]
    assert rows[4]["n_block_hits"] == 0 and rows[4]["keep"]
    assert rows[5] == {
        "doc_id": 5, "n_tokens": 0, "hits_slow": 0, "hits_big_table": 0,
        "hits_merge_batch": 0, "n_block_hits": 0, "keep": True,
    }


def test_domain_stats_and_blocklist_semantics(spark):
    """Domain family invariants on the smoke corpus: the hash-derived
    label is deterministic and within [d0, dN), shares sum to ~1e6
    (floor residue < |domains|), the mixing weight follows sqrt token
    mass (larger domain -> larger weight, sub-linear boost), and the
    blocklist verdict matches the stats it derives from."""
    from pipegen_spark.operators import curation as cu
    from tests.conftest import SF_SMOKE
    from pipegen_spark.queries.training_data import table

    docs = table(spark, SF_SMOKE, "documents")
    stats = cu.domain_stats(docs).collect()
    assert 0 < len(stats) <= cu.N_DOMAIN_BUCKETS
    for r in stats:
        assert r["domain"].startswith("d")
        assert 0 <= int(r["domain"][1:]) < cu.N_DOMAIN_BUCKETS
    for col, tol in (("doc_share_ppm", len(stats)),
                     ("token_share_ppm", len(stats)),
                     ("mix_weight_ppm", len(stats))):
        s = sum(r[col] for r in stats)
        assert 1_000_000 - tol <= s <= 1_000_000 + tol, (col, s)
    # sqrt temperature: weight rank == token rank, but boost sub-linear
    # (the biggest domain's weight share < its token share)
    big = max(stats, key=lambda r: r["total_tokens"])
    small = min(stats, key=lambda r: r["total_tokens"])
    assert big["mix_weight_ppm"] >= small["mix_weight_ppm"]
    assert big["mix_weight_ppm"] < big["token_share_ppm"] or (
        big["token_share_ppm"] == small["token_share_ppm"]
    )
    sm = {r["domain"]: r for r in stats}
    gate = cu.domain_blocklist_gate(docs).collect()
    assert {r["doc_id"] for r in gate} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    for r in gate:
        st = sm[r["domain"]]
        lowq = st["mean_quality_micro"] < cu.DOM_MIN_MEAN_QUALITY_MICRO
        mega = st["token_share_ppm"] > cu.DOM_MAX_TOKEN_SHARE_PPM
        assert r["domain_keep"] == (not lowq and not mega)
        exp = "low_quality" if lowq else ("mega_domain" if mega else "ok")
        assert r["reason"] == exp
