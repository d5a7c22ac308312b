"""Dataset-curation operators for training-data pipelines: deterministic
stratified sampling, sequence packing, and benchmark decontamination.

These extend the reference's surface (it has no corpus-curation layer —
the driver mandate adds them as first-class operators; see SURVEY.md §7
phase 6). All three follow the reference's reproducibility rule for keys
(macros/utils/uuid_generation.sql: derived ids must be stable across
runs): every decision is a pure function of the row via the md5 idiom, so
re-running on re-partitioned / re-ordered data — or on a different engine
— selects exactly the same rows.

Scale design (100 TB corpus):
* Sampling is a scan-side filter — no shuffle, no state, embarrassingly
  parallel; rates change per stratum without touching the data layout.
* Packing shuffles once on a bounded shard key, then two window passes
  over the same sort — the concat-then-chunk packing used by LLM data
  loaders, computed without materializing concatenated text.
* Decontamination reduces both sides to arithmetic 64-bit shingle
  hashes (no n-gram strings are ever built) and broadcasts the benchmark
  set — heldout eval suites are tiny next to the corpus.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.dedup import _fan_out, minhash_word_value


def hash_permille(key: Column) -> Column:
    """Deterministic uniform value in [0, 1000) from the md5 of ``key``
    (cast to string) — the engine-portable sampling coin. Pinned to the
    md5 path (fast=False): sample MEMBERSHIP must never change because a
    performance flag (SPARK_GRAFT_FAST_HASH) was flipped."""
    return F.pmod(minhash_word_value(key.cast("string"), fast=False), F.lit(1000))


def deterministic_sample(
    df: DataFrame,
    key: Column | str,
    rate_permille: int | None = None,
    *,
    strata_col: str | None = None,
    strata_rates: Mapping[str, int] | None = None,
    default_rate_permille: int = 0,
) -> DataFrame:
    """Hash-based sampling: keep a row iff md5(key) lands under the rate.

    Unlike ``df.sample`` (seeded per-partition RNG: results change with
    partitioning), membership here depends only on the row's key — stable
    across runs, engines, and cluster sizes, and consistent across tables
    sharing the key (sampling ``documents`` and ``annotations`` at the
    same rate keeps them joinable).

    Flat mode: ``rate_permille`` applies to every row. Stratified mode:
    ``strata_rates`` maps values of ``strata_col`` to per-stratum rates
    (e.g. keep all purchases, 10% of views), with
    ``default_rate_permille`` for unlisted strata.
    """
    key = F.col(key) if isinstance(key, str) else key
    if (rate_permille is None) == (strata_rates is None):
        raise ValueError("pass exactly one of rate_permille or strata_rates")
    if rate_permille is not None:
        rate: Column = F.lit(int(rate_permille))
    else:
        if strata_col is None:
            raise ValueError("strata_rates requires strata_col")
        rate = F.lit(int(default_rate_permille))
        for value, r in strata_rates.items():
            rate = F.when(F.col(strata_col) == F.lit(value), F.lit(int(r))).otherwise(rate)
    return df.where(hash_permille(key) < rate)


def hash_split(
    df: DataFrame,
    key: Column | str,
    fractions: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: a ``split_col`` label
    from disjoint md5 ranges over ``ppm(salt || key)`` (parts per
    million). Membership is a pure function of the key, so it is stable
    across runs, partitionings, engines and cluster sizes; every table
    sharing the key lands in the same split (features and labels never
    straddle train/test); and changing ``salt`` re-deals the whole
    assignment without touching data. Fractions must sum to 1 (±1e-9);
    ranges follow the mapping's insertion order, boundaries floored to
    integer ppm with the LAST split absorbing the rounding remainder.
    Zero shuffle — the label is scan-side Column algebra."""
    fractions = dict(
        {"train": 0.9, "val": 0.05, "test": 0.05} if fractions is None else fractions
    )
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = F.col(key) if isinstance(key, str) else key
    coin = F.pmod(
        minhash_word_value(
            F.concat(F.lit(salt), key.cast("string")), fast=False
        ),
        F.lit(1_000_000),
    )
    names = list(fractions)
    bounds, acc = [], 0.0
    for name in names[:-1]:
        acc += fractions[name]
        bounds.append(int(acc * 1_000_000))
    label = F.lit(names[-1])
    lo = 0
    for name, hi in zip(names[:-1], bounds):
        label = F.when((coin >= lo) & (coin < hi), F.lit(name)).otherwise(label)
        lo = hi
    return df.withColumn(split_col, label)


def domain_mix_sample(
    df: DataFrame,
    key: Column | str,
    domain_col: str,
    weights: Mapping[str, float],
) -> DataFrame:
    """Rebalance a corpus to target mixture ``weights`` by deterministic
    per-domain downsampling — the domain-mix step of an LLM data pipeline
    (e.g. cap web text at 60%, keep all code).

    The largest achievable corpus keeping the exact mixture is
    ``scale = min(count_d / weight_d)`` rows; each domain then keeps
    ``weight_d * scale`` of its ``count_d`` rows, i.e. a keep-rate of
    ``(w*scale)/c`` — the binding domain keeps everything, oversized
    domains are thinned. Membership reuses the md5 coin
    (``hash_permille``), so the sample is stable across runs, engines and
    partitionings. Domains absent from ``weights`` are dropped.

    All rate arithmetic is IEEE double ops with one shared
    parenthesization — ``floor(((w * scale) / c) * 1000)`` — so an oracle
    engine computes bit-identical rates and selects identical rows.

    Scale: counts are a map-side partial agg on a low-cardinality key
    (#domains rows total); rates come back as a broadcast, so the sampling
    pass itself is a scan-side filter with no shuffle of the corpus.
    """
    key = F.col(key) if isinstance(key, str) else key
    w_expr: Column = F.lit(None).cast("double")
    for value, w in weights.items():
        w_expr = F.when(F.col(domain_col) == F.lit(value), F.lit(float(w))).otherwise(w_expr)
    counts = (
        df.where(F.col(domain_col).isin(list(weights)))
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .withColumn("_w", w_expr)
    )
    scale = counts.agg(F.min(F.col("_c") / F.col("_w")).alias("_scale"))
    rates = counts.crossJoin(F.broadcast(scale)).select(
        domain_col,
        F.least(
            F.floor(((F.col("_w") * F.col("_scale")) / F.col("_c")) * 1000.0),
            F.lit(1000).cast("long"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(hash_permille(key) < F.col("_rate"))
        .drop("_rate")
        .select(*df.columns)
    )


def temperature_mix_sample(
    df: DataFrame,
    key: Column | str,
    domain_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rebalancing: downsample each domain to
    the ``w_d ∝ count_d^alpha`` mixture (the multilingual/pretraining
    upsampling-of-rare-domains rule; alpha=1 keeps natural proportions,
    alpha→0 approaches uniform). No target weights to hand-tune —
    the observed counts ARE the input, unlike domain_mix_sample.

    The normalization constant cancels out of the keep-rate algebra:
    the binding domain is the smallest, and
    ``rate_d = (count_min / count_d)^(1-alpha)``, clamped to [0, 1000]
    permille. For the default ``alpha=0.5`` every operation in that
    chain (sqrt, min, divide, floor) is IEEE-EXACT, so the rates — and
    with the md5 coin, the exact row membership — are bit-identical on
    any engine or partitioning; other alphas use pow(), which is
    correctly-rounded on common libms but not guaranteed by IEEE 754
    (operationally fine, only the cross-engine gate pins 0.5).

    Scale: one #domains-row partial agg, a broadcast of the rates, and
    a scan-side coin filter — the corpus itself never shuffles.
    """
    key = F.col(key) if isinstance(key, str) else key
    beta = 1.0 - float(alpha)

    def powed(c: Column) -> Column:
        if alpha == 0.5:
            return F.sqrt(c)  # IEEE-exact
        return F.pow(c, F.lit(beta))

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).cast("double").alias("_c"))
    mn = counts.agg(F.min(powed(F.col("_c"))).alias("_mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        domain_col,
        F.least(
            F.floor((F.col("_mn") / powed(F.col("_c"))) * 1000.0),
            F.lit(1000).cast("long"),
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(hash_permille(key) < F.col("_rate"))
        .drop("_rate")
        .select(*df.columns)
    )


def pack_sequences(
    docs: DataFrame,
    token_count: Column,
    target_tokens: int,
    num_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign every document the
    training sequence it would start in, if the corpus were concatenated
    in (shard, id) order and chunked into ``target_tokens``-sized pieces.

    Documents are sharded by md5(id) so shards stay balanced and the
    assignment is independent of the input partitioning; within a shard a
    running token total over the id-ordered window yields each document's
    byte-offset-like position, and integer division by the target gives
    its sequence number. One shuffle (the shard sort); the window sum and
    the derived columns share it. All arithmetic is exact long math —
    ``start - pmod(start, target)`` rather than a double ``floor`` — so
    bin boundaries cannot rounding-flip at any corpus size.

    Output: (id, shard, n_tokens, seq_id, seq_offset) where ``seq_offset``
    is the document's starting token offset within its sequence.
    """
    from pyspark.sql import Window

    # shard assignment pinned to md5 (fast=False): packed-sequence layout
    # must not change when the perf flag flips
    shard = F.pmod(minhash_word_value(F.col(id_col).cast("string"), fast=False), F.lit(num_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.lit(int(target_tokens))
    start = (F.col("cum") - F.col("n_tokens")).cast("long")
    return (
        docs.select(
            F.col(id_col),
            shard.alias("shard"),
            token_count.cast("long").alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            "n_tokens",
            ((start - F.pmod(start, t)) / t).cast("long").alias("seq_id"),
            F.pmod(start, t).alias("seq_offset"),
        )
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with a
    heldout benchmark set — the decontamination sweep run before training
    so eval data does not leak into the corpus.

    Both sides reduce to arithmetic 64-bit shingle hashes built straight
    from per-word xxhash64 values (position-rotated XOR — see
    _hashed_ngram_structs): no n-gram STRINGS are ever materialized on
    either side. String shingle builds were the CPU dominator of this
    operator in every earlier round (r1: md5 per shingle; r2: raw-string
    concat_ws — profiling the repetition family showed the string build
    itself costs ~10x the hashing). Collisions can add a spurious hit at
    ~2^-64 per (corpus shingle, bench shingle) pair — negligible against
    any eval-set size, and the DuckDB oracle joins raw strings, so the
    parity gate would catch a collision if one ever landed in a fixture.

    Broadcast mode (the default, and the 100 TB path): the benchmark's
    distinct hashes broadcast (8 bytes per shingle — an eval suite of
    millions of shingles is still a few MB) and the corpus side joins
    map-side with no corpus shuffle. Shuffle mode
    (``broadcast_benchmark=False``, for an eval set too big to
    broadcast): the same 8-byte keys shuffle instead.

    Output: (id, n_hits) for contaminated documents only, where n_hits
    counts the distinct overlapping shingles (array_distinct before the
    explode + bench-side distinct ⇒ a plain count, no distinct-agg state).
    """
    from edna_dbt_library_spark.functions.text import tokens

    def gram_hash_rows(df: DataFrame) -> DataFrame:
        pre = df.select(
            F.col(id_col),
            F.transform(tokens(F.col(text_col)), lambda x: F.xxhash64(x)).alias("_hw"),
        )
        grams = _hashed_ngram_values(F.col("_hw"), n)
        return pre.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gh"))

    bench = gram_hash_rows(benchmark).select("gh").distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    joined = gram_hash_rows(docs).join(bench, "gh")
    return joined.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int,
    overlap_chars: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping windows — the chunking
    step before embedding/context-window packing. Chunk i covers
    ``[i*stride, i*stride + chunk_chars)`` with ``stride = chunk_chars −
    overlap_chars``; the last chunk may be short, and an empty/NULL text
    yields no chunks.

    Pure Column algebra (sequence → explode → substring): chunk count and
    boundaries are exact integer math, so the output is deterministic and
    engine-portable; the explode is the only row amplification and carries
    no shuffle — chunking pipelines scan-side, like all curation filters.

    Output: (id, chunk_id, chunk_text, chunk_start) with 0-based
    ``chunk_id`` and ``chunk_start`` (1-based substring offset kept
    internal).
    """
    if not (0 <= overlap_chars < chunk_chars):
        raise ValueError("require 0 <= overlap_chars < chunk_chars")
    stride = chunk_chars - overlap_chars
    n = F.length(text_col)
    # smallest c with c*stride + overlap >= n ==> ceil((n - overlap)/stride);
    # clamped to >= 1 so a doc shorter than the overlap still yields its one
    # (short) chunk — and so sequence() never sees a negative upper bound
    # (sequence(0, -1) auto-steps BACKWARDS instead of returning empty)
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        -F.floor(-(n - F.lit(overlap_chars)) / F.lit(stride)).cast("long"),
    )
    idx = F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    out = docs.where(F.col(text_col).isNotNull() & (n > 0)).select(
        F.col(id_col), F.col(text_col), idx.alias("chunk_id")
    )
    start = (F.col("chunk_id") * stride).cast("long")
    return out.select(
        id_col,
        "chunk_id",
        F.substring(F.col(text_col), (start + 1).cast("int"), chunk_chars).alias("chunk_text"),
        start.alias("chunk_start"),
    )


# Gopher-style repetition thresholds (Rae et al. 2021, "Scaling Language
# Models", Table A1): docs above any of these are dropped as repetitive.
REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
}


def _rotl64(c: Column, k: int) -> Column:
    """Bitwise left-rotate of a long by a constant — overflow-free under
    ANSI mode (shifts and OR never throw, unlike multiplication)."""
    k %= 64
    if k == 0:
        return c
    return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))


def _hashed_ngram_values(hw: Column, n: int) -> Column:
    """array<long> of combined word n-gram hashes (no char counts) —
    the slice+zip_with construction of _hashed_ngram_structs (see its
    docstring for why per-element element_at indexing is forbidden
    here), for consumers that only join/count on the hash."""
    W = F.size(hw)

    def xor_rot(rot: int):
        return lambda a, b: a.bitwiseXOR(_rotl64(b, rot))

    def build() -> Column:
        m = W - n + 1
        h = F.slice(hw, 1, m)
        for j in range(1, n):
            h = F.zip_with(h, F.slice(hw, 1 + j, m), xor_rot(7 * j))
        return h

    return F.when(W >= n, build()).otherwise(F.array().cast("array<bigint>"))


def _hashed_ngram_structs(hw: Column, lw: Column, n: int) -> Column:
    """array<struct<h,c>> of word n-grams WITHOUT materializing n-gram
    strings: h combines the per-word xxhash64 values with position-
    distinct rotations (rot(7j) XOR — bitwise, so no ANSI overflow), and
    c is the exact n-gram character count (word lengths + n-1 joiner
    spaces). Building 12M n-gram strings measured 12.5s at sf0.1 where
    this builds the same information in 1.4s; equal n-grams get equal
    (h, c) keys, and distinct n-grams collide with probability ~2^-64
    per doc — far below any fixture or production corpus size.

    Built by zip_with-ing n position-shifted slices of the word arrays —
    NOT by indexing them with element_at per output element. The
    distinction is load-bearing: each slice evaluates its input array
    expression exactly once per row, so even if Catalyst collapses the
    projection that materializes hw/lw into this one (it does for some
    input plans, e.g. localCheckpoint/ExistingRDD inputs), the worst
    case is n extra array builds per row — where per-element element_at
    calls re-evaluated the whole array build per element, an O(W²·n)
    per-doc blowup measured as ~45x wall on a 27k-doc corpus."""
    W = F.size(hw)

    def shifted(arr: Column, j: int, m: Column) -> Column:
        return F.slice(arr, 1 + j, m)

    def xor_rot(rot: int):
        # closure factory: zip_with lambdas must be exactly binary
        return lambda a, b: a.bitwiseXOR(_rotl64(b, rot))

    def build() -> Column:
        m = W - n + 1
        h = shifted(hw, 0, m)
        ch = F.transform(shifted(lw, 0, m), lambda x: x + F.lit(n - 1).cast("long"))
        for j in range(1, n):
            h = F.zip_with(h, shifted(hw, j, m), xor_rot(7 * j))
            ch = F.zip_with(ch, shifted(lw, j, m), lambda a, b: a + b)
        return F.zip_with(h, ch, lambda a, b: F.struct(a.alias("h"), b.alias("c")))

    return F.when(W >= n, build()).otherwise(
        F.array().cast("array<struct<h:bigint,c:bigint>>")
    )


def _run_length_stats(items: Column) -> Column:
    """Fold over a sorted array<struct<h,c>> of hashed items, returning
    struct(total, dup_cnt, dup_chars, top_c, top_ch): instance counts,
    duplicated-instance count and chars, and the (count, chars)-
    lexicographic most frequent item. One linear pass with an
    accumulator holding the open run — the row-local equivalent of
    groupBy(item).count() + rollup, with no shuffle at all."""
    sa = F.array_sort(items)
    long0 = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("long").alias("prev"),
        long0.alias("pch"),
        long0.alias("run"),
        long0.alias("total"),
        long0.alias("dup_cnt"),
        long0.alias("dup_chars"),
        long0.alias("top_c"),
        long0.alias("top_ch"),
    )

    def _close(acc):
        # fold the open run into the rollup fields (run == 0 contributes
        # nothing: `dup` is false and `better` is false/null-safe)
        r = acc.getField("run")
        ch = acc.getField("pch")
        dup = r > 1
        dc = acc.getField("dup_cnt") + F.when(dup, r).otherwise(long0)
        dch = acc.getField("dup_chars") + F.when(dup, r * ch).otherwise(long0)
        better = (r > acc.getField("top_c")) | (
            (r == acc.getField("top_c")) & (ch > acc.getField("top_ch"))
        )
        tc = F.when(better, r).otherwise(acc.getField("top_c"))
        tch = F.when(better, ch).otherwise(acc.getField("top_ch"))
        return dc, dch, tc, tch

    def merge(acc, x):
        same = (
            acc.getField("prev").isNotNull()
            & (acc.getField("prev") == x.getField("h"))
            & (acc.getField("pch") == x.getField("c"))
        )
        dc, dch, tc, tch = _close(acc)
        total = (acc.getField("total") + 1).alias("total")
        return F.when(
            same,
            F.struct(
                acc.getField("prev").alias("prev"),
                acc.getField("pch").alias("pch"),
                (acc.getField("run") + 1).alias("run"),
                total,
                acc.getField("dup_cnt").alias("dup_cnt"),
                acc.getField("dup_chars").alias("dup_chars"),
                acc.getField("top_c").alias("top_c"),
                acc.getField("top_ch").alias("top_ch"),
            ),
        ).otherwise(
            F.struct(
                x.getField("h").alias("prev"),
                x.getField("c").alias("pch"),
                F.lit(1).cast("long").alias("run"),
                total,
                dc.alias("dup_cnt"),
                dch.alias("dup_chars"),
                tc.alias("top_c"),
                tch.alias("top_ch"),
            )
        )

    def finish(acc):
        dc, dch, tc, tch = _close(acc)
        return F.struct(
            acc.getField("total").alias("total"),
            dc.alias("dup_cnt"),
            dch.alias("dup_chars"),
            tc.alias("top_c"),
            tch.alias("top_ch"),
        )

    return F.aggregate(sa, init, merge, finish)


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Per-document repetition signals for Gopher-style quality filtering.

    Signals (public definitions from Rae et al. 2021 Table A1, with the
    standard occurrence-count approximation for n-gram char coverage —
    overlapping occurrences are not interval-merged):

    * ``dup_line_frac`` — fraction of (trimmed, non-empty) line instances
      whose line occurs more than once in the doc.
    * ``dup_line_char_frac`` — chars inside duplicated lines over ALL
      document characters (the Table A1 denominator — not just line
      characters — so the published 0.20 threshold applies unmodified).
    * ``top_{2,3,4}gram_char_frac`` — chars covered by the single most
      frequent word n-gram (count × n-gram length) over the doc length.
    * ``dup_5gram_char_frac`` — chars covered by all 5-grams occurring
      more than once, over the doc length, capped at 1.0.

    Total row coverage: EVERY input doc gets exactly one output row.
    Docs that yield no countable items — NULL/empty text, whitespace-only
    text, a lone word with no lines after trimming — score 0.0 on every
    signal (and therefore ``keep=True`` in repetition_filter): repetition
    evidence is absent, so this filter has no grounds to drop them;
    length/quality filters are the right tool for that.

    Extends the reference surface (no curation layer there — driver
    mandate, SURVEY.md §7 phase 6).

    Scale design (100 TB corpus): ZERO shuffles, zero joins — every
    signal is per-document, so the whole computation is row-local Column
    algebra: hash each word once (xxhash64, JVM-side), build n-gram keys
    arithmetically (_hashed_ngram_structs — no n-gram strings are ever
    materialized; that string build dominated the previous explode+
    groupBy formulation at 21.7s of a 78s bench), then one sorted-array
    run-length fold per signal family (_run_length_stats). Embarrassingly
    parallel, perfectly linear, no skew surface, and the scan's column
    pruning reaches parquet untouched.

    Count keys are (64-bit combined hash, exact char count) rather than
    the item strings; the oracle counts raw items, which is equal-valued
    up to hash collisions within a single document (~2^-64 per pair —
    negligible at any corpus size, and any engine would face the same
    within-doc birthday bound).

    Engine-portable doubles: every fraction is one IEEE division of two
    exact BIGINTs, so DuckDB produces bit-identical values for the parity
    gate (CLAUDE.md determinism rule).

    ``carry`` maps extra output column names to Column expressions over
    the input row (e.g. language ID, quality score, PII flags): they are
    computed in the same scan projection and ride through to the output,
    letting curation_verdict fuse every row-local curation family into
    this one pass with no join. A carry value may also be a CALLABLE
    taking the projected token-array column and returning the Column —
    token-reading carries (lang_id, quality_score) then share this
    pass's single tokenization instead of re-deriving it per signal
    (r14).
    """
    from edna_dbt_library_spark.functions.text import tokens

    text = F.col(text_col)
    line_structs = F.transform(
        F.filter(
            F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
            lambda ln: ln != "",
        ),
        lambda ln: F.struct(
            F.xxhash64(ln).alias("h"), F.length(ln).cast("long").alias("c")
        ),
    )
    # hw/lw are materialized as columns of an inner projection so each
    # gram builder's slice reads a computed value when Catalyst keeps
    # the projection; when it instead collapses the projections (it
    # does over some input plans), the slice+zip_with construction in
    # _hashed_ngram_structs bounds the damage to n re-builds per row —
    # see its docstring for the measured element_at O(W²·n) failure
    # mode this replaced.
    carry = dict(carry or {})
    # _fan_out: the signals are row-local (zero shuffles by design), so a
    # single-file scan would fold every document on one core — measured
    # 2.35s -> 0.64s at sf0.1 on local[32] (no-op at real scale).
    docs = _fan_out(docs)
    # tokens(text) projected ONCE and consumed by every token reader
    # (hashes, lengths, and any callable carry): an alias referenced
    # more than once is exempt from CollapseProject inlining (repo
    # rule), so the lower+split+filter tokenization runs one time per
    # row instead of once per consumer (r14; it previously appeared
    # verbatim in both the _hw and _lw builders, and each token-reading
    # carry column — lang_id, quality_score — re-derived it again).
    # A carry VALUE may be a callable: it receives the projected token
    # array column and returns the carry Column (computed in the second
    # projection, where the raw text column is still present).
    pre = docs.select(
        F.col(id_col),
        text,
        F.length(text).cast("bigint").alias("_dc"),
        line_structs.alias("_lines"),
        tokens(text).alias("_t"),
    ).select(
        F.col(id_col),
        F.col("_dc"),
        F.col("_lines"),
        F.transform(F.col("_t"), lambda x: F.xxhash64(x)).alias("_hw"),
        F.transform(F.col("_t"), lambda x: F.length(x).cast("long")).alias("_lw"),
        *[
            (c(F.col("_t")) if callable(c) else c).alias(name)
            for name, c in carry.items()
        ],
    )
    sel = pre.select(
        F.col(id_col),
        F.col("_dc"),
        _run_length_stats(F.col("_lines")).alias("_L"),
        *[
            _run_length_stats(
                _hashed_ngram_structs(F.col("_hw"), F.col("_lw"), n)
            ).alias(f"_G{n}")
            for n in (2, 3, 4, 5)
        ],
        *[F.col(name) for name in carry],
    )

    def _frac(num: Column, den: Column) -> Column:
        # NULLIF guard: ANSI mode turns x/0 into an error; a doc with no
        # items of some kind (e.g. 4 words -> zero 5-grams) scores 0.0,
        # and NULL-text docs (all-NULL stats) coalesce to 0.0 rows.
        return F.coalesce(num / F.nullif(den, F.lit(0)), F.lit(0.0))

    dc = F.col("_dc")
    return sel.select(
        F.col(id_col),
        _frac(F.col("_L.dup_cnt"), F.col("_L.total")).alias("dup_line_frac"),
        _frac(F.col("_L.dup_chars"), dc).alias("dup_line_char_frac"),
        _frac(F.col("_G2.top_c") * F.col("_G2.top_ch"), dc).alias("top_2gram_char_frac"),
        _frac(F.col("_G3.top_c") * F.col("_G3.top_ch"), dc).alias("top_3gram_char_frac"),
        _frac(F.col("_G4.top_c") * F.col("_G4.top_ch"), dc).alias("top_4gram_char_frac"),
        F.least(_frac(F.col("_G5.dup_chars"), dc), F.lit(1.0)).alias("dup_5gram_char_frac"),
        *[F.col(name) for name in carry],
    )


def repetition_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: Mapping[str, float] | None = None,
) -> DataFrame:
    """repetition_stats + a ``keep`` flag: True iff every signal is at or
    under its (Gopher-default) threshold. Join the result back on the id
    (or filter on it) to drop repetitive docs before training."""
    stats = repetition_stats(docs, text_col=text_col, id_col=id_col)
    return stats.withColumn("keep", _repetition_keep_expr(thresholds))


def _repetition_keep_expr(thresholds: Mapping[str, float] | None) -> Column:
    """AND of every repetition signal at or under its threshold; rejects
    unknown signal names."""
    th = dict(REPETITION_THRESHOLDS)
    th.update(thresholds or {})
    unknown = set(th) - set(REPETITION_THRESHOLDS)
    if unknown:
        raise ValueError(f"unknown repetition signals: {sorted(unknown)}")
    keep = None
    for name, limit in th.items():
        cond = F.col(name) <= F.lit(float(limit))
        keep = cond if keep is None else (keep & cond)
    return keep


def corpus_dup_ngram_stats(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_frequent: bool = False,
) -> DataFrame:
    """CORPUS-level duplicated-n-gram fraction per document — the
    inter-document complement of the doc-local Gopher repetition
    signals (repetition_stats): a word n-gram is "duplicated" when it
    occurs in at least ``min_docs`` distinct documents, and a document's
    score is the fraction of its DISTINCT n-grams that are duplicated.
    High scores mark templated/boilerplate documents that doc-local
    repetition cannot see (each copy looks clean in isolation) and
    exact/near dedup does not collapse (the surrounding text differs).

    Output, one row per doc with >= 1 n-gram: (id, n_grams,
    n_dup_grams, dup_permille) with dup_permille the EXACT
    integer (1000 * n_dup) div n_grams — engine-replayable, no float
    division (pagerank_int's determinism idiom); threshold the
    permille downstream to derive a keep verdict.

    Scale shape: n-grams are arithmetic 64-bit hashes built from
    per-word xxhash64 (the contamination_flags machinery — no n-gram
    strings ever materialize; collisions ~2^-64 per pair, and the
    string-joining DuckDB oracle would catch one landing in a fixture).
    Cost is two shuffles of 8-byte keys — per-gram doc counts
    (map-side-combinable) and the count join back — plus one scan-side
    explode; per-doc distinct'ing happens array-side BEFORE the
    explode, so shuffled rows are bounded by distinct grams per doc.
    ``broadcast_frequent=True`` replaces the second shuffle with a
    broadcast of only the >= min_docs gram hashes — the 100 TB path
    when a high ``min_docs`` makes the frequent set small; the default
    shuffle join is the safe shape when min_docs=2 leaves it corpus-
    sized."""
    from edna_dbt_library_spark.functions.text import tokens as _tokens

    # _fan_out: tokenize+hash is scan-side work; a single-file scan would
    # run it (and the explode) on one core (no-op at real scale).
    # The COMPACT per-doc distinct-gram arrays are pinned: ``grams``
    # feeds both the per-gram counts and the flag join, and with the
    # counts side broadcast there are no identical exchanges for
    # ReuseExchange to dedupe — unpinned, the whole tokenize+hash+ngram
    # subtree evaluates twice (verified in the plan: two Scan+Generate
    # chains). 8 bytes/gram, far smaller than the text it derives from.
    pre = (
        _fan_out(docs)
        .select(
            F.col(id_col),
            # _hw stays a PROJECTED alias: _hashed_ngram_values slices it
            # n+1 times, and only an alias referenced >1 time is exempt
            # from CollapseProject inlining (repo-wide rule)
            F.transform(_tokens(F.col(text_col)), lambda x: F.xxhash64(x)).alias("_hw"),
        )
        .select(
            F.col(id_col),
            F.array_distinct(_hashed_ngram_values(F.col("_hw"), n)).alias("_ghs"),
        )
        .localCheckpoint(eager=True)
    )
    grams = pre.select(F.col(id_col), F.explode("_ghs").alias("gh"))
    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("nd"))
    if broadcast_frequent:
        freq = F.broadcast(counts.where(F.col("nd") >= min_docs).select("gh"))
        flagged = grams.join(freq.withColumn("_dup", F.lit(1)), "gh", "left")
        dup = F.coalesce(F.col("_dup"), F.lit(0))
    else:
        flagged = grams.join(counts, "gh")
        dup = F.when(F.col("nd") >= min_docs, F.lit(1)).otherwise(F.lit(0))
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(dup).cast("long").alias("n_dup_grams"),
    )
    return out.select(
        id_col,
        "n_grams",
        "n_dup_grams",
        F.expr("(1000 * n_dup_grams) div n_grams").alias("dup_permille"),
    )


def duplicate_substring_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_frequent: bool = False,
    pin_storage: str = "local",
) -> DataFrame:
    """EXACT-substring duplicate spans (the ExactSubstr dedup of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better"), re-expressed for Spark: instead of a corpus-wide suffix
    array (monolithic, memory-bound), a token k-gram is "duplicated"
    when it occurs >= ``min_count`` times ANYWHERE in the corpus
    (within-doc repeats count, unlike corpus_dup_ngram_stats's
    distinct-docs test), and each document's duplicated windows are
    merged into maximal spans. Any duplicated substring of
    >= k tokens is fully covered by duplicated k-gram windows, so the
    merged spans are a superset of the suffix-array answer at
    granularity k — the standard distributed approximation.

    Output, one row per maximal span: (id, span_start, span_end,
    span_tokens) with 0-based inclusive token indices. Windows merge
    when they overlap OR touch (gap 0): back-to-back duplicated
    k-grams form one run of duplicated text.

    Scale shape: gram identities are arithmetic 64-bit hashes over
    per-word xxhash64 (no n-gram strings materialize); the corpus-wide
    occurrence count is one map-side-combinable shuffle of 8-byte keys
    and the flag join a second (``broadcast_frequent=True`` replaces it
    with a broadcast of only the >= min_count hashes — the 100 TB path
    when min_count is high). Span merging is gaps-and-islands over a
    window PARTITIONED BY document (never global), so its cost is
    bounded by the longest document, not the corpus."""
    from pyspark.sql import Window

    from edna_dbt_library_spark.functions.text import tokens as _tokens

    # _fan_out: same single-file-scan serialization fix as
    # corpus_dup_ngram_stats (no-op at real scale); same two-consumer
    # pin too — ``grams`` feeds the occurrence counts AND the flag join,
    # and without the checkpoint the tokenize+hash+ngram subtree
    # evaluates once per consumer. SIZE HONESTY (ADVICE r13): unlike
    # corpus_dup_ngram_stats, this variant pins the NON-distinct per-doc
    # gram array — ~8 bytes per token POSITION, i.e. the same order as
    # the hashed token stream itself, not "far smaller than the text";
    # and localCheckpoint blocks are not fault-tolerant (an executor
    # loss fails the job instead of recomputing). At cluster scale
    # prefer ``pin_storage="disk"`` below (persist(DISK_ONLY): lineage
    # kept, so executor loss recomputes; blocks live on local disk not
    # executor memory) — the default stays localCheckpoint for the
    # single-JVM bench where the pin is cheap and eager.
    pre = (
        _fan_out(docs)
        .select(
            F.col(id_col),
            # projected alias — _hashed_ngram_values slices _hw k+1 times
            F.transform(_tokens(F.col(text_col)), lambda x: F.xxhash64(x)).alias("_hw"),
        )
        .select(
            F.col(id_col),
            _hashed_ngram_values(F.col("_hw"), k).alias("_ghs"),
        )
    )
    if pin_storage == "disk":
        from pyspark import StorageLevel

        pre = pre.persist(StorageLevel.DISK_ONLY)
    elif pin_storage == "local":
        pre = pre.localCheckpoint(eager=True)
    else:
        raise ValueError(f"pin_storage must be 'local' or 'disk', got {pin_storage!r}")
    grams = pre.select(F.col(id_col), F.posexplode("_ghs").alias("pos", "gh"))
    counts = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    if broadcast_frequent:
        freq = F.broadcast(counts.where(F.col("cnt") >= min_count).select("gh"))
        dup = grams.join(freq, "gh")
    else:
        dup = grams.join(counts, "gh").where(F.col("cnt") >= min_count)
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0))
        .otherwise(F.lit(1))
        .alias("_brk")
    )
    spans = dup.select(F.col(id_col), F.col("pos"), brk).withColumn(
        "_sid", F.sum("_brk").over(w)
    )
    return (
        spans.groupBy(id_col, "_sid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def scrub_duplicate_substrings(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_frequent: bool = False,
) -> DataFrame:
    """Remove every duplicated span found by duplicate_substring_spans
    from each document's token stream (the destructive half of Lee et
    al.'s ExactSubstr: cut the duplicated bytes, keep the remainder).
    Returns one row per input document: (id, scrubbed_text, n_tokens,
    kept_tokens) — scrubbed_text is the space-join of surviving
    lowercased tokens (tokenization is lossy by design; the contract is
    token-stream, not byte, fidelity).

    The span filter is row-local: spans collect per document (bounded
    by doc length), broadcast back via a keyed join, and each token's
    keep-test is a HOF `exists` over that doc's spans — zero shuffles
    beyond the span computation itself."""
    from edna_dbt_library_spark.functions.text import tokens as _tokens

    spans = duplicate_substring_spans(
        docs,
        k=k,
        min_count=min_count,
        text_col=text_col,
        id_col=id_col,
        broadcast_frequent=broadcast_frequent,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = docs.join(per_doc, id_col, "left").select(
        F.col(id_col),
        _tokens(F.col(text_col)).alias("_t"),
        F.coalesce(
            F.col("_spans"),
            F.array().cast("array<struct<span_start:long,span_end:long>>"),
        ).alias("_s"),
    )
    kept = F.filter(
        F.col("_t"),
        lambda t, i: ~F.exists(
            F.col("_s"),
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("scrubbed_text"),
        F.size("_t").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
    )


def dedup_lines_across_docs(
    docs: DataFrame,
    min_line_chars: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact line deduplication (the C4/MassiveText boilerplate
    scrub): a line appearing in many documents survives only at its FIRST
    occurrence — minimum (doc_id, position) — and is dropped everywhere
    else; each document's text is rebuilt from its surviving lines.

    Lines shorter than ``min_line_chars`` bypass dedup entirely (always
    kept): empty lines and one-word bullets recur in every document by
    nature, and deduplicating them would strip paragraph structure from
    the whole corpus rather than remove boilerplate.

    Output, one row per non-NULL-text input doc: (doc_id, n_lines,
    n_kept, text_deduped) — text_deduped is '' when every line was a
    duplicate (total coverage: consumers never lose a doc id).

    Scale design (100 TB): explode to line rows (linear), ONE map-side-
    combinable min-struct aggregate per distinct long line (hot
    boilerplate lines collapse on the map side — no single-task sort of
    100M copies, unlike a window formulation), one line-keyed join that
    AQE skew-splits, and one doc-keyed rebuild shuffle. No all-pairs
    work, no driver-side state.
    """
    if min_line_chars < 0:
        raise ValueError("min_line_chars must be >= 0")
    lines = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    long_lines = lines.where(F.length("line") >= min_line_chars)
    keepers = long_lines.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("k")
    )
    flagged = lines.join(keepers, "line", "left").withColumn(
        "_keep",
        (F.length("line") < min_line_chars)
        | ((F.col(id_col) == F.col("k.d")) & (F.col("pos") == F.col("k.p"))),
    )
    kept_line = F.when(F.col("_keep"), F.struct(F.col("pos"), F.col("line")))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(kept_line)), lambda s: s.getField("line")
            ),
        ).alias("text_deduped"),
    )


def weighted_sample(df: DataFrame, weight: Column, key: Column | str) -> DataFrame:
    """Keep each row with probability ``weight`` (a per-row Column in
    [0, 1]) — quality-weighted / curriculum sampling: keep iff
    ``md5_60bit(key) < floor(weight * 2^60)``.

    Same determinism contract as deterministic_sample (membership is a
    pure function of the row key — stable across runs, partitionings and
    engines; the md5 path is pinned for the same reason), but the rate
    varies per row, so quality scores, fitted curriculum weights, or any
    other Column can drive the mixture. The threshold comparison is exact
    integer math: ``floor(weight * 2^60)`` is one IEEE multiply + floor on
    both engines, never a float-vs-int comparison.

    Scale: scan-side filter, zero shuffle, composes with any downstream
    layout. (weight > 1 keeps everything; weight <= 0 keeps nothing.)
    """
    key_col = (F.col(key) if isinstance(key, str) else key).cast("string")
    h = minhash_word_value(key_col, fast=False)
    threshold = F.floor(weight * F.lit(float(1 << 60))).cast("long")
    return df.where(h < threshold)


def shuffle_assignment(df: DataFrame, n_shards: int, key: str, salt: str = "") -> DataFrame:
    """Attach the deterministic shuffle columns ``_skey`` (60-bit md5 of
    salt||key — the reproducible permutation order) and ``_shard``
    (``_skey mod n_shards``). Pure scan-side expressions; shared by
    export_shuffled_shards and the shard-summary driver query so the
    written layout and the audited assignment can never drift apart."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key_col = F.concat(F.lit(salt), F.col(key).cast("string"))
    h = minhash_word_value(key_col, fast=False)
    return df.withColumn("_skey", h).withColumn(
        "_shard", F.pmod(F.col("_skey"), F.lit(n_shards)).cast("int")
    )


def export_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    salt: str = "",
) -> None:
    """Write ``df`` as ``n_shards`` deterministically shuffled parquet
    shards (``_shard=K/`` directories) — the export step before training:
    data loaders stream shards independently and read rows in ``_skey``
    order, giving a reproducible global permutation without any
    full-dataset sort on the read path.

    The permutation is the md5 idiom again: ``_skey = md5_60bit(salt ||
    key)`` orders rows pseudo-randomly but reproducibly (change ``salt``
    for a fresh epoch permutation); ``_shard = _skey mod n_shards``.
    Membership and order depend only on (key, salt) — never on input
    partitioning, cluster size, or engine.

    Scale (100 TB): one range shuffle on (_shard, _skey) both balances
    output tasks and pre-sorts rows so each shard directory's files are
    internally ordered and non-overlapping in key range; uniform md5 keys
    mean no skew by construction. No driver-side collection.
    """
    out = shuffle_assignment(df, n_shards, key, salt)
    (
        out.repartitionByRange(n_shards, "_shard", "_skey")
        .sortWithinPartitions("_shard", "_skey")
        .write.partitionBy("_shard")
        .mode("overwrite")
        .parquet(path)
    )


def curation_verdict(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: Mapping[str, float] | None = None,
) -> DataFrame:
    """The fused production form of the per-document curation row: ONE
    corpus scan, ONE projection, ZERO shuffles computing language ID,
    quality score, all six Gopher repetition signals with their keep
    flag, and PII detection + redaction together. This is what runs over
    100 TB; the driver-scored ``curation_quality`` query instead composes
    the granular registered queries (one scan per family) so the scored
    row provably matches each of them — same values, different plan
    (asserted equal in tests).

    Output columns: id, the six repetition signal fracs, pred_lang,
    quality, redacted, has_email/has_ip/has_phone, keep_repetition.
    Every input doc gets exactly one row (signals coalesce to 0.0 for
    item-less docs, keep_repetition=True)."""
    from edna_dbt_library_spark.functions.text import lang_id, pii_flags, pii_redact, quality_score

    text = F.col(text_col)
    flags = pii_flags(text)
    carry = {
        # callables: share repetition_stats' single projected
        # tokenization instead of re-deriving lower+split+filter once
        # per language score + once per quality signal (r14)
        "pred_lang": lambda t: lang_id(text, toks=t),
        "quality": lambda t: quality_score(text, toks=t),
        "redacted": pii_redact(text),
        "has_email": flags["has_email"],
        "has_ip": flags["has_ip"],
        "has_phone": flags["has_phone"],
    }
    stats = repetition_stats(docs, text_col=text_col, id_col=id_col, carry=carry)
    return stats.withColumn("keep_repetition", _repetition_keep_expr(thresholds))
