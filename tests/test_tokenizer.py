"""BPE tokenizer (operators/tokenizer.py): merge learning against the
BPE paper's worked example, encode invariants, distributed determinism,
and the Arrow-batched plan shape."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.tokenizer import (
    END,
    bpe_encode,
    encode_word,
    learn_merges,
    train_bpe,
    word_frequencies,
)
from edna_dbt_library_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

# Sennrich et al. 2016 §3.2 worked example vocabulary
PAPER_FREQS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_reproduces_paper_example():
    """First merges on the paper's vocabulary: ('e','s') at count 9
    (newest 6 + widest 3), then ('es','t'), then ('est','</w>'), then
    ('l','o') at count 7 — count ties resolve to the lexicographically
    smallest pair, which is what makes ('e','s') beat ('s','t') and
    ('t','</w>') on the opening 9-9-9 tie."""
    merges = learn_merges(PAPER_FREQS, 4)
    assert merges == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_encode_word_invariants():
    merges = learn_merges(PAPER_FREQS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lower", "newest", "widest", "lowest", "unseen"):
        toks = encode_word(w, ranks)
        # lossless: concatenating tokens reconstructs word + end marker
        assert "".join(toks) == w + END
    # zero merges -> pure characters
    assert encode_word("low", {}) == ["l", "o", "w", END]
    # a fully merged frequent word collapses far below char count
    assert len(encode_word("newest", ranks)) < 4


def test_more_merges_never_increase_token_count():
    freqs = PAPER_FREQS + [("lowest", 4), ("newer", 3)]
    prev = None
    for k in (0, 2, 4, 8, 16):
        ranks = {p: i for i, p in enumerate(learn_merges(freqs, k))}
        total = sum(len(encode_word(w, ranks)) * f for w, f in freqs)
        if prev is not None:
            assert total <= prev
        prev = total


def test_word_frequencies_distributed_and_capped(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a B\tc")], "doc_id long, text string"
    )
    wf = word_frequencies(docs, max_words=2)
    # lowercased, whitespace split, top-2 by (count desc, word asc)
    assert wf == [("a", 3), ("b", 3)]


def test_bpe_encode_matches_driver_side_encoding(spark):
    docs = load_table(spark, SF, "documents").limit(40).select("doc_id", "text")
    merges = train_bpe(docs, num_merges=64)
    assert len(merges) > 0
    encoded = bpe_encode(docs, merges, keep_tokens=True)
    rows = encoded.collect()
    assert len(rows) == 40
    ranks = {p: i for i, p in enumerate(merges)}
    local = {
        r["doc_id"]: [t for w in r["text"].lower().split() for t in encode_word(w, ranks)]
        for r in docs.collect()
    }
    for r in rows:
        assert r["tokens"] == local[r["doc_id"]]
        assert r["n_tokens"] == len(local[r["doc_id"]])
    # determinism across partitionings
    again = bpe_encode(docs.repartition(7), merges, keep_tokens=False)
    a = {r["doc_id"]: r["n_tokens"] for r in again.collect()}
    assert a == {r["doc_id"]: r["n_tokens"] for r in rows}


def test_bpe_encode_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hi hi")], "doc_id long, text string"
    )
    merges = [("h", "i"), ("hi", END)]
    rows = {r["doc_id"]: r for r in bpe_encode(docs, merges, keep_tokens=True).collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["tokens"] == []
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["tokens"] == ["hi" + END, "hi" + END]


def test_bpe_encode_string_doc_ids(spark):
    """The output schema derives the id type from the input frame (r4
    ADVICE: it was hardcoded long) — md5-hex string ids from
    sources/ingest must survive unchanged."""
    docs = spark.createDataFrame(
        [("ab12", "hi hi"), ("cd34", "hi")], "doc_id string, text string"
    )
    out = bpe_encode(docs, [("h", "i"), ("hi", END)])
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert rows == {"ab12": 2, "cd34": 1}


def test_bpe_encode_is_arrow_batched(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = bpe_encode(docs, [("a", END)])._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    assert "BatchEvalPython" not in plan  # never a row-at-a-time Python UDF


def test_real_token_counts_feed_packing_budget(spark):
    """End-to-end: trained counts are plausible for budget accounting —
    bounded below by word count (every word emits >= 1 token) and above
    by chars+words (char fallback + end markers)."""
    docs = load_table(spark, SF, "documents").limit(30).select("doc_id", "text")
    merges = train_bpe(docs, num_merges=128)
    got = bpe_encode(docs, merges)
    joined = got.join(docs, "doc_id").select(
        "n_tokens",
        F.size(F.split(F.lower("text"), r"\s+")).alias("n_words"),
        F.length("text").alias("n_chars"),
    )
    for r in joined.collect():
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"] + r["n_words"] + 1


def test_unigram_exact_scoring_and_reference_agreement(spark):
    """Forward Viterbi (engine) vs the queries.py backward suffix DP
    (independent reference) must agree on token counts for every word
    in a generated corpus — exact big-int scoring leaves no float room
    to disagree; plus hand-checks of coverage and UNK fallback."""
    from edna_dbt_library_spark.operators.tokenizer import (
        train_unigram,
        unigram_encode,
        viterbi_segment,
    )
    from edna_dbt_library_spark.queries import _unigram_count_suffix_dp

    words = [
        ("lower", 30), ("lowest", 20), ("slowest", 11), ("newest", 18),
        ("widest", 9), ("low", 25), ("new", 14), ("tokenization", 6),
        ("token", 13), ("ization", 5), ("aaaa", 7), ("aa", 9), ("ab", 3),
    ]
    vocab = train_unigram(words, vocab_size=40, rounds=3)
    total = sum(vocab.values())

    probe = [w for w, _ in words] + [
        "lowlow", "newestlowest", "zzzqqq", "a", "", "tokenlow", "slowestaaaa"
    ]
    for w in probe:
        assert len(viterbi_segment(w, vocab, total)) == _unigram_count_suffix_dp(
            w, vocab, total
        ), w

    # segmentation covers the word exactly; unknown chars fall back
    assert "".join(viterbi_segment("zzz", vocab, total)) == "zzz"
    seg = viterbi_segment("lowest", vocab, total)
    assert "".join(seg) == "lowest"

    # distributed encode == driver segmentation, NULL -> 0
    docs = spark.createDataFrame(
        [(1, "lowest newest"), (2, None), (3, "zzz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_tokens"] for r in unigram_encode(docs, vocab).collect()}
    expect1 = len(viterbi_segment("lowest", vocab, total)) + len(
        viterbi_segment("newest", vocab, total)
    )
    assert got == {1: expect1, 2: 0, 3: 3}


def test_unigram_distributed_training_on_fixture(spark):
    """End-to-end on the real corpus: distributed word counts -> hard-EM
    -> distributed encode. Training is deterministic (re-train equals),
    the vocab respects its budget, and multi-char pieces actually earn
    usage (compression beats character splitting)."""
    from edna_dbt_library_spark.operators.tokenizer import (
        train_unigram_distributed,
        unigram_encode,
    )
    from edna_dbt_library_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    v1 = train_unigram_distributed(docs, vocab_size=300, rounds=2)
    v2 = train_unigram_distributed(docs, vocab_size=300, rounds=2)
    assert v1 == v2
    n_chars = sum(1 for p in v1 if len(p) == 1)
    assert len(v1) <= 300 + n_chars  # budget: multi-char pieces capped
    assert any(len(p) >= 4 for p in v1)  # real subwords learned

    enc = unigram_encode(docs, v1)
    stats = enc.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"]
    naive_chars = docs.agg(
        F.sum(F.length(F.regexp_replace(F.lower("text"), r"\s+", ""))).alias("c")
    ).collect()[0]["c"]
    assert 0 < stats < naive_chars  # fewer tokens than characters
