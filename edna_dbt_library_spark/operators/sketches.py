"""Mergeable sketch operators: HyperLogLog distinct-count and Count-Min
frequency estimation.

The reference has no sketches (its COUNT(DISTINCT ...) is delegated to
BigQuery, macros/materialization — BigQuery itself answers
APPROX_COUNT_DISTINCT with HLL++); the driver mandate asks for the
scale-path equivalents as first-class operators. Both sketches here are
**engine-portable and bit-deterministic**: every register/counter is an
exact integer derived from the same md5 idiom the dedup family uses
(operators/dedup.minhash_word_value, mirroring the reference's
reproducible-key rule in macros/utils/uuid_generation.sql), so a DuckDB
oracle reproduces the estimates bit-for-bit — including the final double
(one literal-constant division; IEEE-754 division is deterministic).

Scale design (100 TB):
* HLL: per-group state is at most ``HLL_M`` (256) small integers,
  reached via map-side-combining ``max`` — the shuffle moves O(groups ×
  256) rows regardless of input size, vs. an exact COUNT DISTINCT whose
  shuffle carries every distinct key. Registers are **mergeable** (max):
  compute per day/partition, union + max to any coarser grouping —
  the idiom for continuous rollups and cross-cluster combination.
* CMS: global state is a fixed depth×width grid (4×2048 cells). Rows
  explode to ``depth`` cells but partial aggregation collapses each task
  to ≤ depth·width partial counts, so the shuffle is O(8192) rows per
  task regardless of input size — no full-key shuffle ever happens.
  Counters are mergeable by cell-wise sum; lookups broadcast the grid.

Estimator notes: the HLL estimate is the raw Flajolet HLL formula
(alpha_m · m² / Σ 2^-rho). The small-range linear-counting correction is
deliberately omitted — it needs ln(), whose last-bit rounding is libm-
specific and would break cross-engine bit parity; at the cardinalities
the sketch is for (≫ m), the correction never fires. All Σ 2^-rho
arithmetic is exact integer math scaled by 2^53 (rho ≤ 53, so every term
is an integer), making the sum order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_MODULUS,
    minhash_word_value,
)

# --- HyperLogLog parameters -------------------------------------------------
HLL_P = 8  # register-index bits
HLL_M = 1 << HLL_P  # 256 registers
HLL_VALUE_BITS = 60 - HLL_P  # minhash_word_value is a 60-bit hash
HLL_RHO_MAX = HLL_VALUE_BITS + 1  # all-zero suffix
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# estimate = alpha*m^2 / sum(2^-rho); with the sum scaled by 2^RHO_MAX the
# numerator becomes this single double literal (embedded identically in the
# DuckDB oracle — same Python float, same parsed double).
HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)
_EMPTY_TERM = 1 << HLL_RHO_MAX  # an unseen register has rho=0 -> 2^53


def _as_col(key: Column | str) -> Column:
    return F.col(key) if isinstance(key, str) else key


def _with_bitlen(df: DataFrame, src: str, out: str) -> DataFrame:
    """Append column ``out`` = exact integer bit-length of non-negative
    long column ``src`` (bitlen(0) = 0) — a 6-step binary search over
    shift/compare built-ins, materialized stepwise so the shrinking
    value is a bound column at every level (each level references its
    predecessor 3x; inlining would grow the expression tree 3^6-fold).
    Replaces the previous ``length(conv(x::string, 10, 2))`` idiom,
    which built a decimal string AND a binary string per row and
    measured as the single largest cost of the HLL register pass
    (sf0.1 lineitem probe: rho projection 1.41s via conv vs 0.77s
    here, identical output on every power-of-two boundary and the
    whole fixture). Pure integer compares — no float log2, no libm,
    engine-independent. Intermediate ``_bl_*`` columns are dropped."""
    v = src
    parts = []
    for i, k in enumerate((32, 16, 8, 4, 2, 1)):
        ge = F.col(v) >= F.lit(1 << k).cast("long")
        df = df.withColumn(f"_bl_b{i}", F.when(ge, F.lit(k)).otherwise(F.lit(0)))
        df = df.withColumn(f"_bl_v{i}", F.when(ge, F.shiftright(F.col(v), k)).otherwise(F.col(v)))
        parts.append(f"_bl_b{i}")
        v = f"_bl_v{i}"
    bl = sum([F.col(p) for p in parts], F.lit(0)) + F.when(
        F.col(src) > 0, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(out, bl).drop(
        *[f"_bl_b{i}" for i in range(6)], *[f"_bl_v{i}" for i in range(6)]
    )


def hll_registers(df: DataFrame, key: Column | str, group_cols: list[str]) -> DataFrame:
    """Per-group HLL register table: (group..., hll_idx, hll_rho).

    The 60-bit hash splits into an 8-bit register index and a 52-bit
    value whose leading-zero count (+1) is rho; ``length(conv(x, 10, 2))``
    is the exact integer bit-length (no float log2, which mis-rounds near
    powers of two). Register tables are the mergeable form: ``max(rho)``
    over any union of register tables equals the registers of the
    combined input (see hll_merge).
    """
    key = _as_col(key)
    h = minhash_word_value(key.cast("string"))
    pre = df.where(key.isNotNull()).select(
        *group_cols,
        F.shiftright(h, HLL_VALUE_BITS).alias("hll_idx"),
        h.bitwiseAND(F.lit((1 << HLL_VALUE_BITS) - 1)).alias("_rest"),
    )
    pre = _with_bitlen(pre, "_rest", "_bl")
    # bitlen(0) = 0 makes the rest == 0 case (rho = RHO_MAX) fall out of
    # the same expression: RHO_MAX - 0 = RHO_MAX.
    rho = F.lit(HLL_RHO_MAX) - F.col("_bl")
    return (
        pre.select(
            *group_cols,
            "hll_idx",
            rho.cast("int").alias("hll_rho"),
        )
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("hll_rho").alias("hll_rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables to a coarser grouping (or combine unions of
    independently-built sketches): cell-wise max."""
    return registers.groupBy(*group_cols, "hll_idx").agg(F.max("hll_rho").alias("hll_rho"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw-HLL cardinality estimate per group from a register table.

    Output: (group..., distinct_est double, registers_used long). The
    denominator Σ 2^-rho is computed scaled by 2^53 so every term —
    including the 2^53 of each of the (m − used) empty registers — is an
    exact integer; the only float op is one literal/long division.
    """
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - hll_rho)")).alias("_present"),
        F.count(F.lit(1)).alias("registers_used"),
    )
    s = F.col("_present") + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(_EMPTY_TERM)
    return agg.select(
        *group_cols,
        (F.lit(HLL_NUMERATOR) / s.cast("double")).alias("distinct_est"),
        "registers_used",
    )


def hll_distinct(df: DataFrame, key: Column | str, group_cols: list[str]) -> DataFrame:
    """One-shot approximate COUNT(DISTINCT key) GROUP BY group_cols."""
    return hll_estimate(hll_registers(df, key, group_cols), group_cols)


# --- fixed-bin histogram quantiles ------------------------------------------
HIST_BINS = 256


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    group_cols: list[str],
    k: int = HIST_BINS,
) -> DataFrame:
    """Approximate per-group quantiles from a fixed-width histogram:
    (group..., q, est) — est is the upper edge of the first bin whose
    cumulative count reaches rank ceil(q·n).

    The scale path for quantiles: exact percentile needs a full sort (or
    per-group collect) of every value; this keeps O(k) integer bin counts
    per group — mergeable by bin-wise sum — at the cost of (hi−lo)/k
    resolution. Two passes: a min/max/count aggregate (broadcast back),
    then one binning aggregation. Every bin index is
    ``floor(((x−lo)/(hi−lo))·k)`` — pure IEEE double ops with one
    parenthesization shared with the oracle, so bin assignment (and hence
    the estimate) is bit-identical across engines and partitionings.
    """
    stats = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_lo"),
        F.max(value_col).alias("_hi"),
        F.count(value_col).alias("_n"),
    )
    j = df.where(F.col(value_col).isNotNull()).join(F.broadcast(stats), group_cols)
    bin_idx = F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor(((F.col(value_col) - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))) * k),
            F.lit(k - 1).cast("long"),
        )
    )
    hist = (
        j.select(*group_cols, "_lo", "_hi", "_n", bin_idx.alias("_bin"))
        .groupBy(*group_cols, "_lo", "_hi", "_n", "_bin")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w))
    expanded = cum.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in quantiles])))
    hit = (
        expanded.where(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy(*group_cols, "q")
        .agg(F.min("_bin").alias("_bin"), F.min("_lo").alias("_lo"), F.min("_hi").alias("_hi"))
    )
    est = F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
        F.col("_lo") + (F.col("_bin") + 1) * ((F.col("_hi") - F.col("_lo")) / k)
    )
    return hit.select(*group_cols, "q", est.alias("est"))


# --- Count-Min sketch -------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_bucket(i: int, key: Column, width: int) -> Column:
    """Row-i bucket index: the dedup module's universal hash family over
    the shared 60-bit base value, folded to the sketch width."""
    x = minhash_word_value(key.cast("string")) % MINHASH_MODULUS
    return F.pmod(x * MINHASH_A[i] + MINHASH_B[i], F.lit(MINHASH_MODULUS)) % width


def cms_build(
    df: DataFrame, key: Column | str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-Min counter grid over occurrences of ``key``:
    (cms_row, cms_col, cms_count), ≤ depth·width rows total.

    Each input row scatters into one cell per hash row; the groupBy's
    map-side combine collapses every task's contribution to the fixed
    grid size before the (tiny) shuffle. Grids over disjoint inputs merge
    by cell-wise sum (see test_sketches mergeability)."""
    if depth > len(MINHASH_A):
        raise ValueError(f"depth must be <= {len(MINHASH_A)}")
    key = _as_col(key)
    buckets = F.array(*[_cms_bucket(i, key, width) for i in range(depth)])
    return (
        df.where(key.isNotNull())
        .select(F.posexplode(buckets).alias("cms_row", "cms_col"))
        .groupBy("cms_row", "cms_col")
        .agg(F.count(F.lit(1)).alias("cms_count"))
    )


def cms_lookup(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Frequency estimates for each row of ``keys``: (key, est_count),
    est = min over hash rows of the probed cell (0 if unseen). Always an
    over-estimate (collisions only add). The grid is broadcast — probing
    never shuffles the counters."""
    key = F.col(key_col)
    buckets = F.array(*[_cms_bucket(i, key, width) for i in range(depth)])
    probes = keys.select(key_col, F.posexplode(buckets).alias("cms_row", "cms_col"))
    return (
        probes.join(F.broadcast(counters), ["cms_row", "cms_col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cms_count"), F.lit(0).cast("long"))).alias("est_count"))
    )


# --- Bloom filter -----------------------------------------------------------
BLOOM_BITS = 1 << 18  # 4096 words -> 32 KiB broadcast
BLOOM_K = 3


def _bloom_positions(key: Column, num_bits: int, k: int) -> list[Column]:
    """k seeded xxhash64 bit positions in [0, num_bits) — deterministic
    and partitioning-stable (fixed seed per slot), the same scheme the
    warehouse bloom sidecars use (sources/warehouse.py). Previously k
    salted md5 hashes (concat + md5 + hex substring + base conversion
    per position); nothing replays the positions cross-engine — every
    bloom consumer (bloom_semi_join, the incremental-dedup store
    probes) removes false positives with an exact join, so the RESULT
    is position-scheme-independent and only the pruning rate matters.
    Switching to one JVM hash per slot measured 1.65x on the
    bloom_semi_join_urgent bench query with identical output. The
    string cast keeps build/probe sides hashing identical bytes when
    their key columns differ in numeric type."""
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(num_bits))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key: Column | str, num_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Aggregate ``df``'s keys into a Bloom filter: a ONE-row DataFrame
    with ``bf: array<long>`` of ``num_bits/64`` words.

    Spark's own runtime filter (InjectRuntimeFilter / bloom_filter_agg) is
    not user-invocable, so the bitmap is built from built-ins: k salted
    positions per key, ``bit_or`` word aggregation (map-side combine caps
    every task's shuffle at num_bits/64 rows), then a dense word array.
    Mergeable across corpora by element-wise ``|``. An empty build side
    yields the all-zero filter, which rejects every probe.
    """
    key = F.col(key) if isinstance(key, str) else key
    num_words = num_bits // 64
    pos = F.explode(F.array(*_bloom_positions(key, num_bits, k))).alias("p")
    words = (
        df.select(pos)
        .groupBy(F.shiftright("p", 6).alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(p % 64 AS INT)))").alias("bits"))
    )
    # densify via a full word range + ordered collect: O(m log m) once.
    # (A map-based transform would linear-scan the map per element —
    # O(m²) ≈ 17M comparisons on one row for the default size.)
    full = (
        df.sparkSession.range(num_words)
        .withColumnRenamed("id", "w")
        .join(F.broadcast(words), "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    packed = F.array_sort(F.collect_list(F.struct("w", "bits")))
    return full.agg(
        F.transform(packed, lambda x: x["bits"]).alias("bf")
    )


def bloom_filter_rows(
    probe: DataFrame,
    key: Column | str,
    bloom: DataFrame,
    num_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Keep probe rows whose key is *possibly* in the filter (no false
    negatives). The 1-row filter broadcasts; the probe side is a pure
    scan-side predicate — O(1) array word lookups, no shuffle, no state."""
    key = F.col(key) if isinstance(key, str) else key
    tagged = probe
    for i, p in enumerate(_bloom_positions(key, num_bits, k)):
        tagged = tagged.withColumn(f"_bp{i}", p)
    cond = F.lit(True)
    for i in range(k):
        cond = cond & F.expr(
            f"(element_at(bf, cast(shiftright(_bp{i}, 6) AS INT) + 1)"
            f" & shiftleft(1L, cast(_bp{i} % 64 AS INT))) != 0"
        )
    return (
        tagged.join(F.broadcast(bloom))
        .where(cond)
        .drop("bf", *[f"_bp{i}" for i in range(k)])
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Semi-join ``probe`` to ``build`` with Bloom pre-pruning: the filter
    eliminates most non-matching probe rows before any shuffle, the exact
    left-semi join then removes the false positives — the RESULT is
    exactly a semi-join (the filter only cuts the shuffled volume), which
    is what makes it oracle-checkable against plain `IN (SELECT ...)`.

    At 100 TB this is the manual form of Spark's runtime row-filter: the
    32 KiB bitmap reaches every scan task, so only the ~matching fraction
    of the corpus enters the semi-join shuffle.
    """
    bloom = bloom_build(build, build_key, num_bits, k)
    candidates = bloom_filter_rows(probe, probe_key, bloom, num_bits, k)
    keys = build.select(F.col(build_key).alias("__bloom_bk")).distinct()
    return candidates.join(
        keys, candidates[probe_key] == keys["__bloom_bk"], "left_semi"
    )


# --- Misra-Gries frequent items --------------------------------------------
#
# The reference exposes no frequent-items surface (its top-k idioms are
# plain GROUP BY ... ORDER BY count in BigQuery, e.g. the catalog size
# rollups around macros/catalog); at 100 TB an exact global GROUP BY over
# a heavy-tailed key (n-grams, URLs, user ids) shuffles every distinct
# key. The classic fix is the two-pass exact heavy hitter: a per-partition
# Misra-Gries summary (Misra & Gries 1982; mergeability per Agarwal et
# al. 2012, "Mergeable Summaries") nominates a PROVABLY sufficient
# candidate set, then one broadcast semi-join counts candidates exactly.
# The output is therefore EXACT — identical to GROUP BY ... HAVING
# count >= min_count — which is what makes it oracle-checkable in plain
# SQL, while the shuffle never carries more than ~capacity keys.


def _mg_summaries(capacity: int):
    """mapInPandas body: one Misra-Gries summary per input partition.

    Vectorized per Arrow batch: value_counts folds the batch, pandas
    ``Series.add`` merges it into the running summary, and when the
    summary exceeds ``capacity`` the classic decrement subtracts the
    (capacity+1)-th largest count from everything and drops the
    non-positives. Decrement accounting: each such step removes >=
    (capacity+1) * s of total mass, so any single key's undercount is
    <= N_p / (capacity + 1) for a partition of N_p rows. Emits
    (k, lb) for every retained key (lb = the MG lower bound on its
    partition count) plus one sentinel row (k = NULL, lb = N_p)
    carrying the partition's non-null row count."""

    def run(it):
        import pandas as pd

        ser = None
        total = 0
        for pdf in it:
            s = pdf["k"].dropna()
            total += len(s)
            vc = s.value_counts()
            ser = vc if ser is None else ser.add(vc, fill_value=0)
            if len(ser) > capacity:
                sub = ser.nlargest(capacity + 1).iloc[-1]
                ser = ser - sub
                ser = ser[ser > 0]
        frames = [pd.DataFrame({"k": pd.array([None], dtype="string"), "lb": [total]})]
        if ser is not None and len(ser):
            frames.append(
                pd.DataFrame({"k": ser.index.astype(str), "lb": ser.to_numpy("int64")})
            )
        yield pd.concat(frames, ignore_index=True)

    return run


def frequent_items(
    df: DataFrame,
    key: Column | str,
    den: int = 5000,
    capacity: int = 10000,
) -> DataFrame:
    """EXACT corpus-wide frequent items: every key occurring at least
    ``min_count = max(1, N div den)`` times (N = non-null key count),
    with its exact count — the result of
    ``GROUP BY k HAVING count(*) >= min_count``, computed without ever
    shuffling the distinct-key space.

    Two passes over ``df``:

    1. **Sketch**: one Misra-Gries summary of size ``capacity`` per
       partition (:func:`_mg_summaries`, Arrow-batched). Summed across
       partitions, a key absent from every summary has true count
       <= floor(N / capacity), and a retained key's summed lower bound
       ``lb`` undercounts by at most floor(N / capacity) total. The
       candidate rule keeps ``lb >= max(1, min_count - N div capacity)``,
       which therefore (a) keeps every true frequent item (superset
       guarantee — requires ``2 * den <= capacity``, enforced), and
       (b) bounds the candidate count by ~capacity (each kept candidate
       owns >= N/capacity of the total mass N).
    2. **Exact count**: candidates broadcast, one map-side semi-join +
       count, filter ``>= min_count``. False candidates die here, so
       the output is exact and partitioning-independent.

    Scale shape: the sketch pass shuffles <= capacity + 1 rows per
    partition (localCheckpoint'd — the frame is tiny and is read twice:
    once for N, once for candidates); the exact pass's shuffle carries
    only candidate keys (<= ~capacity distinct). An exact GROUP BY
    would shuffle all distinct keys — the win is the heavy-tail corpus
    where distinct keys ~ N.

    Keys are compared as strings (the mapInPandas schema is fixed);
    NULL keys are ignored on both passes, mirroring a SQL
    ``WHERE k IS NOT NULL``. Output: (k string, cnt long).
    """
    if 2 * den > capacity:
        raise ValueError(
            f"superset guarantee needs 2*den <= capacity, got den={den} capacity={capacity}"
        )
    keyed = df.select(_as_col(key).cast("string").alias("k"))
    sketch = keyed.mapInPandas(_mg_summaries(capacity), "k string, lb long").localCheckpoint(
        eager=True
    )
    n_total = sketch.where(F.col("k").isNull()).agg(F.sum("lb")).first()[0] or 0
    min_count = max(1, n_total // den)
    lb_keep = max(1, min_count - n_total // capacity)
    cand = (
        sketch.where(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.sum("lb").alias("lb"))
        .where(F.col("lb") >= lb_keep)
        .select("k")
    )
    return (
        keyed.where(F.col("k").isNotNull())
        .join(F.broadcast(cand), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
