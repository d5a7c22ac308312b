"""Byte-pair-encoding tokenizer: distributed-corpus training statistics,
driver-side merge learning, Arrow-batched distributed encoding.

Why this exists: sequence packing and token-budget accounting
(operators/curation.pack_sequences, functions/text.approx_bpe_token_count)
need REAL token counts for a real vocabulary, not a regex estimate. BPE
(Sennrich et al., 2016, "Neural machine translation of rare words with
subword units") is the canonical subword scheme.

Scale split — each stage runs where it belongs:

* ``train_bpe`` — the only corpus-scale statistic BPE training needs is
  the WORD FREQUENCY table, which Spark computes distributed (explode +
  groupBy, map-side combinable) and caps at ``max_words`` by a
  TakeOrderedAndProject (count desc, word asc — deterministic). Only
  that bounded vocabulary reaches the driver; the merge loop itself is
  inherently sequential (merge t+1 depends on merge t) and runs over
  the word-freq dict in pure Python — exactly how every production BPE
  trainer works (they train on word counts, not the raw corpus).
* ``bpe_encode`` — encoding is an iterative, data-dependent merge loop
  per word that Column algebra cannot express; it runs as Arrow-batched
  ``mapInPandas`` (the library's documented escape hatch — no
  row-at-a-time Python UDF) with a per-batch word→tokens memo, so each
  DISTINCT word in a batch is encoded once no matter how often it
  repeats (natural-language corpora repeat almost every word).

Determinism: merge selection breaks count ties on the lexicographically
smallest pair (the choice that reproduces the worked example in the BPE
paper), encoding resolves rank ties leftmost-first, and pre-tokenization
is the library-wide lowercase-whitespace ``tokens()`` — so the same
corpus yields the same merges and the same encoding on any
partitioning, cluster size, or replay.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.text import tokens

END = "</w>"  # end-of-word marker (paper's notation)


def word_frequencies(
    documents: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped at the ``max_words`` most
    frequent words (ties broken on the word — deterministic). The cap
    bounds the driver collect by VOCABULARY size, not corpus size; the
    dropped long tail carries negligible pair mass for merge learning."""
    rows = (
        documents.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def _apply_merge(key: tuple[str, ...], best: tuple[str, str], merged_sym: str) -> tuple[str, ...]:
    """Left-to-right replacement of ``best`` within one symbol tuple."""
    out: list[str] = []
    i = 0
    while i < len(key):
        if i < len(key) - 1 and (key[i], key[i + 1]) == best:
            out.append(merged_sym)
            i += 2
        else:
            out.append(key[i])
            i += 1
    return tuple(out)


def _learn_merges_naive(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Reference implementation: full pair recount every iteration —
    O(num_merges × Σ|word|). Kept as the property-test oracle for the
    incremental trainer below (hypothesis pins merge-list equality)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        key = tuple(w) + (END,)
        vocab[key] = vocab.get(key, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged_sym = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            key = _apply_merge(syms, best, merged_sym)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def learn_merges(word_freqs: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """BPE merge learning over a word-frequency dict with INCREMENTAL
    pair-count maintenance: each iteration touches only the words that
    contain the merged pair (tracked in an inverted pair→words index),
    so total cost is O(Σ touched-word lengths) instead of
    O(num_merges × Σ|word|) — the difference between seconds and
    minutes at a production 32–64k-merge vocabulary (PLAN_AUDIT.md).
    Deterministic and merge-for-merge identical to the naive recount
    (hypothesis property test): highest pair count wins, ties go to the
    lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        key = tuple(w) + (END,)
        vocab[key] = vocab.get(key, 0) + f

    import heapq

    pairs: Counter = Counter()
    # pair -> word keys that (at some point) contained it; stale members
    # (words since rewritten) are filtered on touch via the vocab lookup
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    # lazy-deletion max-heap over (-count, pair): every count change
    # pushes a fresh entry; stale entries (stored count != live count)
    # are discarded at pop time. Best-pair selection is then O(log P)
    # amortized instead of a full O(P) scan per merge — the second
    # bottleneck once pair counts are incremental.
    heap: list[tuple[int, tuple[str, str]]] = []

    def add_word(key: tuple[str, ...], f: int) -> None:
        for p in zip(key, key[1:]):
            pairs[p] += f
            where.setdefault(p, set()).add(key)
            heapq.heappush(heap, (-pairs[p], p))

    def drop_word(key: tuple[str, ...], f: int) -> None:
        for p in zip(key, key[1:]):
            pairs[p] -= f
            if pairs[p] <= 0:
                del pairs[p]
                where.pop(p, None)
            else:
                heapq.heappush(heap, (-pairs[p], p))

    # initial counts WITHOUT per-increment heap pushes; one heapify of
    # the final counts seeds the selection heap
    for key, f in vocab.items():
        for p in zip(key, key[1:]):
            pairs[p] += f
            where.setdefault(p, set()).add(key)
    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heap[0]
            if pairs.get(p, 0) == -negc:
                best = p
                break
            heapq.heappop(heap)  # stale entry
        if best is None:
            break
        merges.append(best)
        merged_sym = best[0] + best[1]
        for key in list(where.get(best, ())):
            f = vocab.pop(key, None)
            if f is None:  # stale index entry: word already rewritten
                continue
            drop_word(key, f)
            new_key = _apply_merge(key, best, merged_sym)
            if new_key in vocab:
                # two old words collapsed onto one spelling: counts and
                # index membership for new_key are already present for
                # the existing freq; add this word's share on top
                vocab[new_key] += f
            else:
                vocab[new_key] = f
            add_word(new_key, f)
        # every occurrence of best is now consumed
        pairs.pop(best, None)
        where.pop(best, None)
    return merges


def train_bpe(
    documents: DataFrame,
    num_merges: int = 512,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus: distributed word counting, then the
    sequential merge loop on the driver (see module docstring)."""
    return learn_merges(word_frequencies(documents, text_col, max_words), num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merge ranks: repeatedly apply the
    lowest-rank applicable merge (leftmost on rank ties)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_tokens: bool = False,
) -> DataFrame:
    """Distributed BPE encoding: (doc_id, n_tokens[, tokens]).

    Arrow-batched mapInPandas with a per-batch word→encoding memo (each
    distinct word in a batch is encoded once). NULL text encodes to
    n_tokens = 0 with an empty token list — the row survives, matching
    the ingestion/curation convention."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    # the id column keeps its source type (string md5 ids from
    # sources/ingest work as well as bigint ids)
    id_type = documents.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens long" + (
        ", tokens array<string>" if keep_tokens else ""
    )

    def run(batches):
        import re

        import pandas as pd

        # exact mirror of functions.text.tokens: Java's \s is ASCII-only,
        # so the Python split must be too (str.split() is Unicode-aware
        # and would tokenize NBSP-separated text differently)
        ws = re.compile(r"\s+", re.ASCII)
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = encode_word(word, ranks)
            return got

        for pdf in batches:
            ids, counts, toks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (
                    [w for w in ws.split(text.lower()) if w] if isinstance(text, str) else []
                )
                out: list[str] = []
                for w in words:
                    out.extend(enc(w))
                ids.append(did)
                counts.append(len(out))
                if keep_tokens:
                    toks.append(out)
            data = {id_col: ids, "n_tokens": counts}
            if keep_tokens:
                data["tokens"] = toks
            yield pd.DataFrame(data)

    return documents.select(id_col, text_col).mapInPandas(run, schema)


# --- Unigram-LM (SentencePiece-style) tokenizer -----------------------------
#
# The second of the two standard subword algorithms (Kudo 2018), as
# hard-EM: seed a substring candidate vocabulary, repeatedly (a) Viterbi-
# segment every distinct word under the current piece counts and (b)
# re-estimate counts from usage, pruning multi-char pieces to the vocab
# budget. Single characters are never pruned (full coverage), and any
# character unseen in training gets an implicit count of 1 at encode
# time, so encoding is total.
#
# EXACT-integer scoring throughout: a segmentation p1..pk under counts
# c_i and normalizer T scores prod(c_i) / T^k; two candidates compare by
# the big-int cross-product prod_a * T^k_b vs prod_b * T^k_a — no
# floating point anywhere, so training and encoding are bit-deterministic
# on any platform, and an independently-written reference encoder must
# agree exactly (the cross-engine gate in queries.py).

UNK_CHAR_COUNT = 1


def _seg_better(a, b, total: int) -> bool:
    """True when segmentation a=(prod, k, seq) beats b under the exact
    total order: higher prob (big-int cross-multiply), then fewer
    pieces, then lexicographically smaller piece sequence."""
    pa, ka, sa = a
    pb, kb, sb = b
    lhs, rhs = pa * total**kb, pb * total**ka
    if lhs != rhs:
        return lhs > rhs
    if ka != kb:
        return ka < kb
    return sa < sb


def viterbi_segment(word: str, counts: dict[str, int], total: int) -> list[str]:
    """Forward Viterbi under exact-integer unigram scoring. Unknown
    single characters fall back to count UNK_CHAR_COUNT, so every word
    segments."""
    maxlen = max((len(p) for p in counts), default=1)
    n = len(word)
    best: list[tuple[int, int, tuple] | None] = [None] * (n + 1)
    best[0] = (1, 0, ())
    for i in range(1, n + 1):
        for j in range(max(0, i - maxlen), i):
            prev = best[j]
            if prev is None:
                continue
            piece = word[j:i]
            c = counts.get(piece)
            if c is None:
                if i - j != 1:
                    continue
                c = UNK_CHAR_COUNT
            cand = (prev[0] * c, prev[1] + 1, prev[2] + (piece,))
            if best[i] is None or _seg_better(cand, best[i], total):
                best[i] = cand
    return list(best[n][2]) if n else []


def train_unigram(
    word_freqs: list[tuple[str, int]],
    vocab_size: int = 2000,
    max_piece_len: int = 6,
    seed_multiplier: int = 4,
    rounds: int = 3,
) -> dict[str, int]:
    """Hard-EM unigram training over a word-frequency table (use
    word_frequencies() for the distributed count): returns
    {piece: count} — the model IS its usage counts, normalizer =
    sum(counts). Deterministic by construction: integer arithmetic,
    sorted tie-breaks, fixed round count."""
    from collections import Counter

    cand: Counter = Counter()
    for w, f in word_freqs:
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i : i + ln]] += f
    chars = {p for p in cand if len(p) == 1}
    budget = max(0, vocab_size - len(chars))
    multis = sorted(
        (p for p in cand if len(p) > 1), key=lambda p: (-cand[p], p)
    )[: budget * seed_multiplier]
    counts: dict[str, int] = {p: cand[p] for p in chars}
    counts.update({p: cand[p] for p in multis})

    for _ in range(rounds):
        total = sum(counts.values())
        usage: Counter = Counter()
        for w, f in word_freqs:
            for p in viterbi_segment(w, counts, total):
                usage[p] += f
        keep = sorted(
            (p for p in usage if len(p) > 1), key=lambda p: (-usage[p], p)
        )[:budget]
        counts = {p: usage[p] for p in keep}
        for ch in chars:
            counts[ch] = max(usage.get(ch, 0), 1)  # coverage floor
    return counts


def unigram_encode(
    documents: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_tokens: bool = False,
) -> DataFrame:
    """Distributed unigram encoding: (doc_id, n_tokens[, tokens]) —
    the Viterbi twin of bpe_encode (same Arrow batching, per-batch word
    memo, ASCII whitespace split, NULL -> 0 tokens)."""
    total = sum(vocab.values())
    id_type = documents.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens long" + (
        ", tokens array<string>" if keep_tokens else ""
    )

    def run(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = viterbi_segment(word, vocab, total)
            return got

        for pdf in batches:
            ids, counts_o, toks = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (
                    [w for w in ws.split(text.lower()) if w]
                    if isinstance(text, str)
                    else []
                )
                out: list[str] = []
                for w in words:
                    out.extend(enc(w))
                ids.append(did)
                counts_o.append(len(out))
                if keep_tokens:
                    toks.append(out)
            data = {id_col: ids, "n_tokens": counts_o}
            if keep_tokens:
                data["tokens"] = toks
            yield pd.DataFrame(data)

    return documents.select(id_col, text_col).mapInPandas(run, schema)


def train_unigram_distributed(
    documents: DataFrame,
    vocab_size: int = 2000,
    text_col: str = "text",
    max_words: int = 100_000,
    max_piece_len: int = 6,
    rounds: int = 3,
) -> dict[str, int]:
    """Train on a corpus: distributed word counting (vocabulary-bounded
    driver state, exactly train_bpe's contract), then the hard-EM loop
    on the driver."""
    return train_unigram(
        word_frequencies(documents, text_col, max_words),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        rounds=rounds,
    )
