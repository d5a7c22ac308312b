"""Property-based tests (hypothesis) for the scalar library — inputs are
generated per property but evaluated in ONE Spark job per example set to
keep runtime sane."""

import struct
import uuid as pyuuid

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions import (
    bitstring_to_int,
    bytes4_to_int32,
    double_from_components,
    double_mantissa,
    double_unbiased_exponent,
    hex_to_int,
    uuid_v5,
    value_to_bitstring,
)

SETTLE = settings(max_examples=8, deadline=None)


def _eval_batch(spark, values, col_builder, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["out"] for r in df.select(col_builder(F.col("v")).alias("out")).collect()]


@SETTLE
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=40))
def test_hex_to_int_matches_python(spark, xs):
    hexes = [format(x, "x") for x in xs]
    got = _eval_batch(spark, hexes, hex_to_int)
    for x, g in zip(xs, got):
        expected = x if x < 2**63 else None  # SAFE_CAST: signed-64 overflow -> NULL
        assert g == expected


@SETTLE
@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), min_size=1, max_size=40))
def test_bitstring_roundtrip_property(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    out = df.select(
        bitstring_to_int(value_to_bitstring(F.col("v"), 63)).alias("rt"), F.col("v")
    ).collect()
    for r in out:
        assert r["rt"] == r["v"]


@SETTLE
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=40))
def test_bytes4_int32_roundtrip(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    # encode as unsigned 32-bit hex -> bytes -> decode back to signed
    enc = F.unhex(F.lpad(F.hex(F.pmod(F.col("v"), F.lit(2**32))), 8, "0"))
    out = df.select(bytes4_to_int32(enc).alias("rt"), F.col("v")).collect()
    for r in out:
        assert r["rt"] == r["v"]


@SETTLE
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=25))
def test_uuid_v5_matches_rfc4122(spark, names):
    ns = "3bfbbd36-410b-43fa-999a-bb990a6db5c7"
    got = _eval_batch(spark, names, lambda c: uuid_v5(c, ns))
    for name, g in zip(names, got):
        assert g == str(pyuuid.uuid5(pyuuid.UUID(ns), name))


@SETTLE
@given(
    st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            min_value=1e-3,
            max_value=1e6,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ieee754_reconstruction_property(spark, xs):
    from decimal import ROUND_HALF_UP, Decimal

    rows = []
    for x in xs:
        raw = struct.unpack(">Q", struct.pack(">d", x))[0]
        rows.append(
            (x, raw >> 63, format((raw >> 52) & 0x7FF, "011b"), format(raw & ((1 << 52) - 1), "052b"))
        )
    df = spark.createDataFrame(rows, "x double, sign long, exp string, frac string")
    out = df.select(
        "x",
        double_from_components(
            F.col("sign"), double_mantissa(F.col("frac")), double_unbiased_exponent(F.col("exp"))
        ).alias("rt"),
    ).collect()
    for r in out:
        expected = float(Decimal(r["x"]).quantize(Decimal("0.00001"), rounding=ROUND_HALF_UP))
        assert r["rt"] == expected


@SETTLE
@given(
    st.lists(st.text(alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]), min_size=1, max_size=300), min_size=1, max_size=10),
    st.integers(min_value=2, max_value=50),
    st.integers(min_value=0, max_value=49),
)
def test_chunk_documents_reassembly_property(spark, texts, chunk, overlap):
    """For ANY text and any valid (chunk, overlap): stride-concatenation of
    the chunks reproduces the document exactly, every chunk is ≤ chunk
    chars, and consecutive chunks overlap by exactly `overlap` chars."""
    from hypothesis import assume

    from edna_dbt_library_spark.operators.curation import chunk_documents

    assume(overlap < chunk)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = chunk_documents(df, chunk, overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert all(len(r["chunk_text"]) <= chunk for r in rows)
        rebuilt = rows[0]["chunk_text"] + "".join(r["chunk_text"][overlap:] for r in rows[1:])
        assert rebuilt == text, (chunk, overlap, text)


@SETTLE
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40), st.integers(min_value=0, max_value=2**40)
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=21),
)
def test_morton_key_matches_python_property(spark, pairs, bits):
    from edna_dbt_library_spark.functions import morton_key

    def py_morton(vals):
        key = 0
        for d, v in enumerate(vals):
            v &= (1 << bits) - 1
            for b in range(bits):
                key |= ((v >> b) & 1) << (b * len(vals) + d)
        return key

    df = spark.createDataFrame(pairs, "x long, y long")
    got = [r["m"] for r in df.select(morton_key(["x", "y"], bits).alias("m")).collect()]
    assert got == [py_morton(p) for p in [tuple(p) for p in pairs]]


@SETTLE
@given(
    st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=120), min_size=2, max_size=8
    ),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=2, max_value=5),
)
def test_winnowing_coverage_guarantee_property(spark, texts, k, w):
    """Winnowing theorem (Schleimer et al. 2003): two docs sharing a
    normalized substring of length >= k + w - 1 share >= 1 fingerprint.
    Adversarially tiny alphabet maximizes repeated grams/hash ties."""
    from edna_dbt_library_spark.operators.dedup import winnowing_fingerprints

    shared = "abab abba bab abab ab"  # 21 chars > k + w - 1 for all gen'd (k, w)
    rows = [(i, t[: len(t) // 2] + shared + t[len(t) // 2 :]) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnowing_fingerprints(df, k=k, window=w).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    docs = {i for i, _ in rows}
    # every pair of docs embeds `shared`, so every pair must overlap
    for a in docs:
        for b in docs:
            if a < b:
                assert fps[a] & fps[b], (k, w, texts[a], texts[b])


@SETTLE
@given(
    st.lists(st.text(alphabet="abc \n", min_size=0, max_size=150), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=7),
)
def test_winnowing_segmented_equals_unchunked_property(spark, texts, k, w, seg):
    """Bounded-segment winnowing (the giant-document guard) must produce
    the EXACT row set of the unchunked construction — fingerprints AND
    first_window positions — for any segment size, including the
    pathological seg=1 (every window its own segment). The winnowing
    coverage theorem then survives by construction."""
    from edna_dbt_library_spark.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    seg_rows = sorted(
        map(tuple, winnowing_fingerprints(df, k=k, window=w, segment=seg).collect())
    )
    ref_rows = sorted(
        map(tuple, winnowing_fingerprints(df, k=k, window=w, segment=None).collect())
    )
    assert seg_rows == ref_rows


@SETTLE
@given(st.binary(min_size=0, max_size=200))
def test_parse_media_header_never_crashes_on_junk(spark, blob):
    """Format sniffing over arbitrary bytes (truncated headers, random
    RIFF/PNG prefixes) must return a dict or None, never raise — the
    ingest path sees every malformed file on the crawl."""
    from edna_dbt_library_spark.operators.multimodal import parse_media_header

    for payload in (
        blob,
        b"\x89PNG\r\n\x1a\n" + blob,  # PNG magic + junk
        b"RIFF" + blob,               # RIFF magic + junk
        b"RIFF\xff\xff\xff\xffWAVE" + blob,
    ):
        meta = parse_media_header(payload)
        assert meta is None or isinstance(meta, dict)


URL_CHARS = st.text(
    alphabet="abcXYZ019:/?&=#._-%~ ", min_size=0, max_size=40
)


@SETTLE
@given(st.lists(URL_CHARS, min_size=1, max_size=12))
def test_canonicalize_url_idempotent_and_total_property(spark, raws):
    """canonicalize(canonicalize(x)) == canonicalize(x) for arbitrary
    URL-ish junk, and the builder never throws under ANSI."""
    from edna_dbt_library_spark.functions.urls import canonicalize_url

    once = _eval_batch(spark, raws, canonicalize_url)
    twice = _eval_batch(spark, once, canonicalize_url)
    assert once == twice


@SETTLE
@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=10), min_size=1, max_size=20
    ),
    st.integers(min_value=0, max_value=30),
)
def test_bpe_encode_lossless_property(spark, words, n_merges):
    """For ANY corpus and merge depth: every word's encoding concatenates
    back to word + end marker, and deeper merge tables never produce
    more tokens for the training corpus."""
    from edna_dbt_library_spark.operators.tokenizer import (
        END,
        encode_word,
        learn_merges,
    )

    freqs = [(w, 1 + i % 3) for i, w in enumerate(dict.fromkeys(words))]
    merges = learn_merges(freqs, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    shallow = {p: i for i, p in enumerate(merges[: max(0, n_merges - 1)])}
    for w, _f in freqs:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END
        assert len(toks) <= len(encode_word(w, shallow))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef", min_size=1, max_size=12),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=40),
)
def test_incremental_learn_merges_equals_naive_property(word_freqs, n_merges):
    """The incremental pair-count trainer must produce the EXACT merge
    list of the naive full-recount reference on any corpus (including
    duplicate words, overlapping pairs like 'aaaa', and count ties) —
    pure driver-side property, no Spark session needed."""
    from edna_dbt_library_spark.operators.tokenizer import (
        _learn_merges_naive,
        learn_merges,
    )

    assert learn_merges(word_freqs, n_merges) == _learn_merges_naive(word_freqs, n_merges)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=8),
            st.text(alphabet="ab", min_size=1, max_size=8),
        ),
        min_size=1,
        max_size=15,
    ),
)
def test_length_band_blocking_is_lossless_property(pairs):
    """The neighbor length-band join key: for ANY two strings within
    Levenshtein distance 1 sharing a first character, the lower side's
    {b-1, b, b+1} bands always cover the other's band — the length
    dimension of edit_distance_pairs' blocking loses nothing."""

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    width = 2  # max_dist 1 -> band width 2
    for a, b in pairs:
        if a[0] != b[0] or lev(a, b) > 1:
            continue
        ba, bb = len(a) // width, len(b) // width
        assert bb in (ba - 1, ba, ba + 1)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-8000, max_value=8000), min_size=66, max_size=400),
    st.integers(min_value=2, max_value=4),
)
def test_audio_fingerprint_volume_invariance_property(samples, gain):
    """Energy-delta fingerprints are invariant under ANY exact positive
    gain (energies scale by gain², comparisons unchanged)."""
    from edna_dbt_library_spark.operators.multimodal import audio_fingerprint_int

    assert audio_fingerprint_int(samples) == audio_fingerprint_int(
        [v * gain for v in samples]
    )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdefg", min_size=1, max_size=6),
                  st.floats(min_value=0.05, max_value=1.0)),
        min_size=1, max_size=4, unique_by=lambda t: t[0],
    )
)
def test_hash_split_covers_every_row_exactly_once_property(spark, splits):
    """For ANY normalized fraction mapping, every row gets exactly one
    label and every label's range is honored (labels ⊆ mapping keys)."""
    from edna_dbt_library_spark.operators.curation import hash_split

    total = sum(f for _n, f in splits)
    fractions = {n: f / total for n, f in splits}
    # absorb float error into the last split so the sum is exactly 1
    names = list(fractions)
    fractions[names[-1]] += 1.0 - sum(fractions.values())
    df = spark.range(200).select(F.col("id").alias("k"))
    rows = hash_split(df, "k", fractions).collect()
    assert len(rows) == 200
    assert {r["split"] for r in rows} <= set(fractions)


@SETTLE
@given(
    st.lists(
        st.one_of(
            st.text(min_size=0, max_size=40).filter(lambda s: "\n" not in s and "\r" not in s),
            st.builds(
                lambda u, t: __import__("json").dumps({"url": u, "text": t}),
                st.one_of(st.none(), st.text(max_size=15).filter(lambda s: "\n" not in s)),
                st.text(max_size=15).filter(lambda s: "\n" not in s),
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_jsonl_ingest_total_classification_property(spark, tmp_path_factory, lines):
    """For ANY line soup (valid JSON, junk, empty, unicode): ingestion
    never throws, and every non-empty line lands in EXACTLY one of
    good/quarantine — total, exclusive classification."""
    from pyspark.sql import types as T

    from edna_dbt_library_spark.sources.ingest import load_jsonl

    p = tmp_path_factory.mktemp("fuzz") / "drop.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("text", T.StringType())]
    )
    res = load_jsonl(spark, str(p), schema, required=("url",))
    n_good, n_quar = res.good.count(), res.quarantine.count()
    # spark.read.text drops nothing; every line classifies exactly once
    n_lines = spark.read.text(str(p)).count()
    assert n_good + n_quar == n_lines
    # and the split is stable under a different downstream projection
    assert len(res.good.collect()) == n_good
    assert len(res.quarantine.collect()) == n_quar


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcd", min_size=1, max_size=9), st.integers(1, 50)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.text(alphabet="abcde", min_size=0, max_size=14),
)
@settings(max_examples=60, deadline=None)
def test_unigram_forward_equals_backward_reference(words, probe):
    """Property: for ANY trained vocab and ANY probe word (including
    chars the vocab never saw — 'e' is outside the training alphabet),
    the engine's forward exact-integer Viterbi and the oracle's
    independently-written backward suffix DP agree on the token count."""
    from edna_dbt_library_spark.operators.tokenizer import (
        train_unigram,
        viterbi_segment,
    )
    from edna_dbt_library_spark.queries import _unigram_count_suffix_dp

    vocab = train_unigram(sorted(words), vocab_size=16, rounds=2)
    total = sum(vocab.values())
    fwd = viterbi_segment(probe, vocab, total)
    assert "".join(fwd) == probe  # total coverage
    assert len(fwd) == _unigram_count_suffix_dp(probe, vocab, total)


# --- frequent items & AllPairs exactness under random inputs ---------------
#
# Both operators claim EXACT equality with plain SQL aggregations via
# provable-superset candidate pruning whose proofs lean on integer floor
# boundaries (min_count = N div den vs the sketch's N div capacity
# undercount; alpha = ceil-division positional bounds). Property-fuzz the
# boundaries with adversarial distributions, capacities near the 2*den
# limit, and random partitionings.


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=50, max_size=400),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=1, max_value=7),
)
def test_frequent_items_exact_under_random_distributions(spark, draws, den, parts):
    from edna_dbt_library_spark.operators.sketches import frequent_items

    capacity = 2 * den  # the tightest capacity the guarantee admits
    df = spark.createDataFrame([(f"k{d}",) for d in draws], "k string").repartition(parts)
    got = {(r["k"], r["cnt"]) for r in frequent_items(df, "k", den=den, capacity=capacity).collect()}
    n = len(draws)
    mc = max(1, n // den)
    from collections import Counter

    expect = {(k, c) for k, c in Counter(f"k{d}" for d in draws).items() if c >= mc}
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=11), min_size=3, max_size=14),
        min_size=3,
        max_size=14,
    ),
    st.sampled_from([(1, 2), (3, 5), (2, 3), (4, 5)]),
)
def test_jaccard_join_exact_under_random_corpora(spark, token_lists, threshold):
    from edna_dbt_library_spark.operators.dedup import jaccard_join_exact

    rows = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    t_num, t_den = threshold
    got = {
        (r["doc_a"], r["doc_b"], r["n_int"], r["n_a"], r["n_b"])
        for r in jaccard_join_exact(df, threshold=threshold, shingle_n=2).collect()
    }
    # python reference over bigram shingle sets
    def sh(toks):
        ws = [f"w{t}" for t in toks]
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    sets = {i: sh(t) for i, t in enumerate(token_lists) if len(t) >= 2}
    expect = set()
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ni = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if (t_den + t_num) * ni >= t_num * (na + nb):
                expect.add((a, b, ni, na, nb))
    assert got == expect


# --- merge-on-read DML: warehouse vs a Python dict reference model -----------
# A random sequence of delete_where / update_where / append / apply_deletes
# must leave read() equal to the model at every step: the positional
# sidecar, the anti-join mask, partition-scoped folding and the
# append-then-mask update commit all compose under arbitrary interleaving.

_DML_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.integers(0, 6)),   # k % 7 == r
        st.tuples(st.just("update"), st.integers(0, 6)),   # set v for k % 7 == r
        st.tuples(st.just("append"), st.integers(0, 4)),   # 3 new rows, batch tag
        st.tuples(st.just("apply"), st.integers(0, 0)),
        # crash injection (warehouse._txn): the statement dies at the
        # given point and must be INVISIBLE — the model is unchanged,
        # and every later op must compose over the orphaned artifacts
        st.tuples(st.just("crash_update"), st.integers(0, 2)),
        st.tuples(st.just("crash_delete"), st.integers(0, 0)),
        st.tuples(st.just("vacuum"), st.integers(0, 0)),
        # atomic keyed upsert: replaces k%9==r rows' v, inserts one new
        st.tuples(st.just("upsert"), st.integers(0, 8)),
        # small-files maintenance must never change visible content,
        # including over crashed-txn orphans and live delete masks
        st.tuples(st.just("compact"), st.integers(0, 0)),
    ),
    min_size=1,
    max_size=5,
)

_CRASH_POINTS = ["after_stage_write", "after_data_move", "before_commit"]


@settings(max_examples=5, deadline=None)
@given(_DML_OPS)
def test_dml_sequences_match_reference_model(spark, tmp_path_factory, ops):
    from edna_dbt_library_spark.sources import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("dmlfuzz")))
    rel = wh.relation("s", "t")
    rows = [(k, f"v{k}", "a" if k % 2 else "b") for k in range(30)]
    wh.create_as(
        rel,
        spark.createDataFrame(rows, "k long, v string, p string").coalesce(2),
        TableMeta(partition_by="p"),
    )
    model = {k: (v, p) for k, v, p in rows}  # k is unique by construction
    next_k = 1000
    for op, arg in ops:
        if op == "delete":
            wh.delete_where(rel, f"k % 7 = {arg}")
            model = {k: vp for k, vp in model.items() if k % 7 != arg}
        elif op == "update":
            wh.update_where(rel, f"k % 7 = {arg}", {"v": F.lit(f"u{arg}")})
            model = {
                k: ((f"u{arg}", p) if k % 7 == arg else (v, p))
                for k, (v, p) in model.items()
            }
        elif op == "append":
            batch = [(next_k + i, f"n{arg}", "a") for i in range(3)]
            wh.append(
                rel,
                spark.createDataFrame(batch, "k long, v string, p string").coalesce(1),
            )
            model.update({k: (v, p) for k, v, p in batch})
            next_k += 3
        elif op == "crash_update":
            from edna_dbt_library_spark.sources.warehouse import InjectedCrash

            wh._txn_crash_point = _CRASH_POINTS[arg]
            try:
                # a 0-match update returns before the txn starts, so the
                # injected point is only reached when rows match
                if any(k % 5 == 1 for k in model):
                    with pytest.raises(InjectedCrash):
                        wh.update_where(rel, "k % 5 = 1", {"v": F.lit("ghost")})
                else:
                    wh.update_where(rel, "k % 5 = 1", {"v": F.lit("ghost")})
            finally:
                wh._txn_crash_point = None
            # model UNCHANGED: the crashed statement never happened
        elif op == "crash_delete":
            from edna_dbt_library_spark.sources.warehouse import InjectedCrash

            wh._txn_crash_point = "before_commit"
            try:
                if any(k % 5 == 2 for k in model):
                    with pytest.raises(InjectedCrash):
                        wh.delete_where(rel, "k % 5 = 2")
                else:
                    wh.delete_where(rel, "k % 5 = 2")
            finally:
                wh._txn_crash_point = None
        elif op == "vacuum":
            wh.vacuum(rel)  # sweeps crashed txns; never changes content
        elif op == "compact":
            wh.compact(rel, min_files=1)
        elif op == "upsert":
            batch = [
                (k, f"up{arg}", p)
                for k, (v, p) in sorted(model.items())
                if k % 9 == arg
            ][:2] + [(next_k, f"up{arg}", "b")]
            wh.upsert_matching(
                rel,
                spark.createDataFrame(
                    batch, "k long, v string, p string"
                ).coalesce(1),
                ["k"],
            )
            model.update({k: (v, p) for k, v, p in batch})
            next_k += 1
        else:
            wh.apply_deletes(rel)  # must never change visible content
        got = {
            r["k"]: (r["v"], r["p"])
            for r in wh.read(rel).select("k", "v", "p").collect()
        }
        assert got == model, (op, arg)


# --- SQL DML == DataFrame DML: same statement, same operator, same state ---
# Random DELETE/UPDATE sequences executed once through Warehouse.sql
# (sources/sql_dml.py parsing) and once through the DataFrame API on a
# twin table must leave identical final states — the parser can never
# drift from the operators it dispatches to.

_SQLDML_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.integers(0, 6), st.integers(0, 4)),
        st.tuples(st.just("update"), st.integers(0, 6), st.integers(0, 4)),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(_SQLDML_OPS)
def test_sql_dml_matches_dataframe_dml(spark, tmp_path_factory, ops):
    from edna_dbt_library_spark.sources import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("sqldmlfuzz")))
    rows = [(k, k * 10, "a" if k % 2 else "b") for k in range(30)]
    rels = {}
    for name in ("sq", "df"):
        rels[name] = wh.relation("s", name)
        wh.create_as(
            rels[name],
            spark.createDataFrame(rows, "k long, amt long, p string").coalesce(2),
            TableMeta(partition_by="p"),
        )
    for op, r, b in ops:
        if op == "delete":
            cond = f"k % 7 = {r} AND amt >= {b * 20}"
            s = wh.sql(f"DELETE FROM s__sq WHERE {cond}", {"s__sq": rels["sq"]})
            d = wh.delete_where(rels["df"], cond)
            assert s.first()["n_rows"] == d["n_deleted"]
        else:
            cond = f"k % 7 = {r}"
            s = wh.sql(
                f"UPDATE s__sq SET amt = amt + {b}, p = concat(p, '{b}') "
                f"WHERE {cond}",
                {"s__sq": rels["sq"]},
            )
            d = wh.update_where(
                rels["df"], cond, {"amt": f"amt + {b}", "p": f"concat(p, '{b}')"}
            )
            assert s.first()["n_rows"] == d["n_updated"]
        got_s = sorted(map(tuple, wh.read(rels["sq"]).select("k", "amt", "p").collect()))
        got_d = sorted(map(tuple, wh.read(rels["df"]).select("k", "amt", "p").collect()))
        assert got_s == got_d, (op, r, b)


# --- changelog reconstruction: since-state + inserts - deletes == to-state ---
# under ARBITRARY interleavings of DML and snapshots, for every adjacent
# snapshot pair (the soundness claim read_changelog's docstring makes).

_CL_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.integers(0, 5)),
        st.tuples(st.just("update"), st.integers(0, 5)),
        st.tuples(st.just("append"), st.integers(0, 3)),
        st.tuples(st.just("snap"), st.just(0)),
    ),
    min_size=2,
    max_size=6,
)


@settings(max_examples=4, deadline=None)
@given(_CL_OPS)
def test_changelog_reconstructs_any_window(spark, tmp_path_factory, ops):
    from collections import Counter

    from edna_dbt_library_spark.sources import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("clfuzz")))
    rel = wh.relation("s", "t")
    rows = [(k, f"v{k}", "a" if k % 2 else "b") for k in range(24)]
    wh.create_as(
        rel,
        spark.createDataFrame(rows, "k long, v string, p string").coalesce(2),
        TableMeta(partition_by="p"),
    )
    versions = [wh.snapshot(rel)]
    next_k = 500
    for op, arg in ops:
        if op == "delete":
            wh.delete_where(rel, f"k % 6 = {arg}")
        elif op == "update":
            wh.update_where(rel, f"k % 6 = {arg}", {"v": F.lit(f"u{arg}")})
        elif op == "append":
            wh.append(
                rel,
                spark.createDataFrame(
                    [(next_k + i, "n", "a") for i in range(2)],
                    "k long, v string, p string",
                ).coalesce(1),
            )
            next_k += 2
        else:
            versions.append(wh.snapshot(rel))
    versions.append(wh.snapshot(rel))

    def _rows(df):
        return Counter(
            (r["k"], r["v"], r["p"]) for r in df.select("k", "v", "p").collect()
        )

    for since, to in zip(versions, versions[1:]):
        log = wh.read_changelog(rel, since, to)
        ins = _rows(log.where("_change_type = 'insert'"))
        dels = _rows(log.where("_change_type = 'delete'"))
        state = _rows(wh.read_version(rel, since)) + ins
        state.subtract(dels)
        assert +state == _rows(wh.read_version(rel, to)), (since, to)


_LSM_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf"]


@settings(max_examples=6, deadline=None)
@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.lists(st.sampled_from(_LSM_WORDS), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    batches=st.lists(
        st.dictionaries(
            st.integers(min_value=0, max_value=12),
            st.lists(st.sampled_from(_LSM_WORDS), min_size=0, max_size=6),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=2,
    ),
)
def test_bm25_lsm_view_equals_current_corpus_property(
    spark, tmp_path_factory, base, batches
):
    """LSM masking law: after any sequence of delta maintenance batches
    (new docs, edits, zero-token deletes — each applied with the same
    atomic keyed upsert the stream uses, tombstones included), the live
    postings view must equal a from-scratch tokenization of the CURRENT
    corpus, and the refreshed stats row must equal corpus_stats_exact
    over it. This is the whole correctness of the delta design in one
    property — search equality follows because both paths consume only
    postings + stats."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.functions.text import tokens
    from edna_dbt_library_spark.operators.retrieval import (
        _bm25_delta_rel,
        _bm25_live_postings,
        corpus_stats_exact,
        doc_term_freqs,
        refresh_bm25_stats,
    )
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    def docs_df(d):
        return spark.createDataFrame(
            [(k, " ".join(v)) for k, v in sorted(d.items())],
            "doc_id long, text string",
        )

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("lsmwh")))
    idx = wh.relation("ix", "p")
    wh.create_as(idx, doc_term_freqs(docs_df(base)), TableMeta(cluster_by=["term"]))
    wh.create_as(
        wh.relation("ix", "p_stats"),
        corpus_stats_exact(docs_df(base)),
        TableMeta(),
    )
    delta = _bm25_delta_rel(wh, idx)
    wh.create_as(delta, doc_term_freqs(docs_df(base)).limit(0), TableMeta())

    current = dict(base)
    for b in batches:
        bdf = docs_df(b)
        postings = doc_term_freqs(bdf)
        tomb = bdf.where(
            F.coalesce(F.size(tokens("text")), F.lit(0)) == 0
        ).select(
            "doc_id",
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("long").alias("tf"),
            F.lit(0).cast("int").alias("dl"),
        )
        wh.upsert_matching(delta, postings.unionByName(tomb), ["doc_id"])
        current.update(b)

    live_corpus = {k: v for k, v in current.items() if v}
    want = sorted(map(tuple, doc_term_freqs(docs_df(live_corpus)).collect())) if live_corpus else []
    got = sorted(
        map(
            tuple,
            _bm25_live_postings(wh, idx)
            .where(F.col("term").isNotNull())
            .collect(),
        )
    )
    assert got == want

    refresh_bm25_stats(wh, idx)
    srow = wh.read(wh.relation("ix", "p_stats")).first()
    wrow = (
        corpus_stats_exact(docs_df(live_corpus)).first()
        if live_corpus
        else None
    )
    if wrow is None:
        assert srow["n_docs"] == 0
    else:
        assert (srow["n_docs"], srow["sum_dl"]) == (
            wrow["n_docs"],
            wrow["sum_dl"] or 0,
        )
