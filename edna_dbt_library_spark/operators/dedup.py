"""Deduplication operators for LLM-data pipelines over a ``documents``-like
table: exact, fingerprint, MinHash+LSH, SimHash, and n-gram Jaccard.

Scale design (100 TB documents):
* Exact/fingerprint dedup is one hash-groupBy — a single shuffle on a
  uniformly distributed md5 key (no skew by construction).
* MinHash-LSH never compares all pairs: docs shuffle once to build
  signatures (groupBy doc), bands explode to (band, signature) buckets, and
  only same-bucket docs join — the classic shingle→minhash→band→bucket-join
  pipeline. Bucket skew (giant near-dup clusters) is handled by AQE skew
  join; candidate verification is a narrow join on doc_id.
* SimHash is one aggregation producing a 60-bit signature per doc;
  Hamming-neighbor search then groups on rotated prefixes (not implemented
  here — signatures alone already support blocking).
* Everything is md5/split/aggregate built-ins: deterministic across runs,
  partitionings and engines (the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.text import fingerprint, tokens


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by md5 of the raw text: (hash, keep_id = min id, n_docs)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def fingerprint_duplicate_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Like exact, but on the normalized fingerprint (case/whitespace/punct
    insensitive)."""
    return (
        docs.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return the surviving rows (min id per exact text hash)."""
    keep = exact_duplicate_groups(docs, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


def _word_set(text_col: str) -> Column:
    return F.array_distinct(tokens(F.col(text_col)))


def _fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Ensure enough input partitions to use every core before a
    row-multiplying explode. A small documents table often arrives as ONE
    parquet file = one partition, serializing the whole shingle+hash map
    side; the fix is a cheap pre-explode repartition of the compact rows.
    No-op (no shuffle) when the scan is already parallel enough — at real
    scale (many files) this never triggers.

    With ``keys``, the fan-out hash-partitions on those columns instead of
    round-robin, so a downstream window/groupBy clustered on the same keys
    reuses the partitioning (guide §2.4: two operations keyed the same way
    share one exchange) — the fan-out then REPLACES that operator's own
    exchange of the post-explode rows with an exchange of the compact
    pre-explode rows, rather than adding one.

    The check reads the plan's backing file list (``inputFiles`` — pure
    plan inspection, no job, no RDD lineage; an RDD-based partition count
    here would force plan analysis into an RDD conversion on the driver
    for every call). File count underestimates true scan parallelism for
    large splittable files (maxPartitionBytes splits them further), which
    only errs toward an extra repartition of compact pre-explode rows —
    cheap insurance next to the explode it feeds.

    Non-file-backed inputs (cached/localCheckpoint'd intermediates, test
    DataFrames) report zero files; for those the fallback is the RDD
    partition count — acceptable there because a materialized input's
    lineage is already truncated, so ``df.rdd`` is a cheap wrapper, not a
    forced re-analysis — and the repartition is skipped when the input is
    already parallel enough."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:
            pass
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)


# universal-hash family over a single md5-derived base value:
#   x  = int(first 15 hex chars of md5(word))          (60-bit, engine-portable)
#   h_i(x) = (x mod M) * A_i + B_i  mod M,   M = 2^31 - 1 (prime)
# One md5 per word instead of one per (word, seed): 8x fewer digest calls,
# and the shuffled aggregation state is 8 longs instead of 8 hex strings.
MINHASH_MODULUS = 2147483647
MINHASH_A = (1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841, 15485863)
MINHASH_B = (15487469, 32452843, 49979687, 67867967, 86028121, 104395301, 122949823, 141650939)


# Opt-in production hash fast path: xxhash64 stays entirely inside
# whole-stage codegen (one JVM hash call) where the md5 route pays
# digest → hex string → substring → base-conversion per shingle — the CPU
# dominator of the dedup/decontamination family (~43% of bench r1).
# md5 remains the default because it is the engine-portable oracle hash:
# the DuckDB gate reproduces it bit-for-bit, which xxhash64 (Spark-
# specific seed/variant) cannot. Flip per call (fast=True) or per run
# (SPARK_GRAFT_FAST_HASH=1) in production where no cross-engine parity
# gate applies; candidate quality is equivalent (both are uniform 60-bit
# hashes) but bucket contents — and would-be collisions — differ.
FAST_HASH_ENV = "SPARK_GRAFT_FAST_HASH"


def _fast_hash_default() -> bool:
    import os

    return os.environ.get(FAST_HASH_ENV, "").strip().lower() not in ("", "0", "false")


def minhash_word_value(word: Column, fast: bool | None = None) -> Column:
    """60-bit integer base hash of a word. Default: 15 hex chars of md5
    (fits a signed long in every engine, oracle-portable). fast=True (or
    SPARK_GRAFT_FAST_HASH=1): xxhash64 masked to the same 60-bit range."""
    if fast is None:
        fast = _fast_hash_default()
    if fast:
        return F.xxhash64(word).bitwiseAND(F.lit((1 << 60) - 1))
    return F.conv(F.substring(F.md5(word), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
) -> DataFrame:
    """Per-doc MinHash signature over the distinct shingle set (``shingle_n``
    = 1 → word set; >1 → word n-grams, order-sensitive), using the
    universal integer family above — deterministic across engines, runs and
    partitionings (dedup keys need the same reproducibility as the
    reference's UUIDv5, macros/utils/uuid_generation.sql). Signature
    columns are named mh0..mh{n-1}.

    ROW-LOCAL (r14, guide §2.4 remove shuffles outright): each lane's
    minimum is ``array_min`` over a per-row transform of the projected
    word-hash array — the previous explode + groupBy(id) shuffled one
    combined row per (doc, partition) for an aggregation whose inputs
    never leave the row. Zero exchanges now; the min over the same
    per-word values is identical by commutativity. The base word hash is
    projected ONCE (`_xs`, an alias consumed by all ``num_hashes`` lanes
    — CollapseProject-exempt), so md5-per-word still evaluates once per
    word. Empty shingle sets (formerly dropped by the explode) are
    excluded by an equivalent RAW-column predicate — ``rlike`` with
    ``shingle_n`` whitespace-separated token groups — which pushes to
    the scan instead of re-deriving the tokenize inside a pushed
    size()-filter (the wave-6/8 trap). Requires ``id_col``-unique input
    rows (every caller is a per-doc corpus; the old groupBy silently
    merged duplicate ids instead of flagging them)."""
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"num_hashes must be <= {len(MINHASH_A)}")
    if shingle_n == 1:
        sh = _word_set(text_col)
        # tokens() splits on \s+ after lower(): at least one token
        # exists iff the raw text has a non-whitespace char (same Java
        # regex class; NULL-safe — NULL rlike drops the row)
        nonempty = F.col(text_col).rlike(r"\S")
    else:
        from edna_dbt_library_spark.functions.text import shingles

        sh = F.array_distinct(shingles(F.col(text_col), shingle_n))
        # >= shingle_n whitespace-separated tokens <=> at least one
        # n-gram shingle (shingles() yields empty below n tokens)
        nonempty = F.col(text_col).rlike(r"\S+(\s+\S+){%d}" % (shingle_n - 1))
    base = (
        _fan_out(docs)
        .where(nonempty)
        .select(
            F.col(id_col),
            F.transform(
                sh, lambda w: minhash_word_value(w) % MINHASH_MODULUS
            ).alias("_xs"),
        )
    )
    def _lane(i: int) -> Column:
        # NB: closing over i via this factory, NOT a default-arg lambda —
        # PySpark's HOF machinery reads a default arg as the 2-parameter
        # (element, index) form (same trap as text._stopword_hits)
        return F.array_min(
            F.transform(
                F.col("_xs"),
                lambda x: F.pmod(x * MINHASH_A[i] + MINHASH_B[i], F.lit(MINHASH_MODULUS)),
            )
        ).alias(f"mh{i}")

    return base.select(F.col(id_col), *[_lane(i) for i in range(num_hashes)])


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    shingle_n: int = 1,
) -> DataFrame:
    """MinHash-LSH candidate pairs: split the signature into ``bands`` bands
    of ``num_hashes//bands`` rows; docs sharing any full band signature
    become a candidate pair. Output: (doc_a, doc_b) with doc_a < doc_b,
    distinct.

    ``max_bucket_size`` is the production stop-bucket cap: buckets larger
    than this are non-discriminative (near-identical boilerplate clusters)
    and would contribute O(bucket^2) pairs; dropping them bounds the join
    output. Default None = exact LSH semantics (what the oracle checks).
    ``shingle_n`` > 1 hashes word n-grams instead of the word set."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    sig = minhash_signatures(docs, num_hashes, text_col, id_col, shingle_n)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            # '_'-separated so ('1','23') never collides with ('12','3')
            F.concat_ws("_", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("sig"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "sig")
        buckets = (
            buckets.withColumn("__bn", F.count(F.lit(1)).over(w))
            .where(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    # materialize the bucket table once: the self-join would otherwise
    # execute the whole tokenize→hash→aggregate pipeline twice (measured 8x
    # slower at sf0.1). localCheckpoint also truncates the lineage, so the
    # join plans against the compact (id, band, sig) rows only.
    buckets = buckets.localCheckpoint(eager=True)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    bands: int = 4,
    bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash Hamming-neighbor pairs via band blocking.

    The ``bits``-bit signature splits into ``bands`` substrings; by the
    pigeonhole principle two signatures within Hamming distance
    ``bands - 1`` share at least one exact band, so candidate generation is
    an equi-join per band (never all-pairs). Candidates are then verified
    exactly with ``bit_count(xor)`` ≤ ``max_hamming``. Output:
    (doc_a, doc_b, hamming), doc_a < doc_b, distinct.

    Note: blocking guarantees recall only up to ``bands - 1`` bit flips;
    pairs at distance in (bands-1, max_hamming] are found only when the
    flips happen to cluster inside few bands — the standard
    recall/cost trade of banded SimHash at scale.
    """
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    width = bits // bands
    sig = simhash(docs, bits, text_col, id_col).withColumn(
        "sig_int", F.conv(F.col("simhash_bits"), 2, 10).cast("long")
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring(F.col("simhash_bits"), b * width + 1, width).alias("bsig"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.col("sig_int"), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, "sig_int", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))
    buckets = buckets.localCheckpoint(eager=True)
    a, b = buckets.alias("a"), buckets.alias("b")
    hamming = F.bit_count(F.col("a.sig_int").bitwiseXOR(F.col("b.sig_int")))
    return (
        a.join(b, ["band", "bsig"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    sig_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Generic banded-Hamming neighbor pairs over an INTEGER signature
    column — the blocking engine behind simhash_near_pairs, factored
    for any precomputed signature (perceptual image hashes, feature
    sketches). Bands are bit-slices extracted with shift+mask (pure
    codegen); candidates equi-join per (band, slice), then verify with
    exact ``bit_count(xor)``. Pigeonhole: recall is total while
    ``max_hamming`` <= ``bands - 1``; beyond that, pairs are found only
    when the flips cluster inside few bands. Output: (doc_a, doc_b,
    hamming), doc_a < doc_b, distinct."""
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    width = bits // bands
    mask = -1 if width >= 64 else (1 << width) - 1  # -1 = all-ones in two's complement
    sig = F.col(sig_col).cast("long")
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(sig, b * width).bitwiseAND(F.lit(mask)).alias("bsig"),
        )
        for b in range(bands)
    ]
    buckets = (
        sigs.select(F.col(id_col), sig.alias("_sig"), F.explode(F.array(*band_cols)).alias("bk"))
        .select(id_col, "_sig", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))
        .localCheckpoint(eager=True)
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    hamming = F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig")))
    return (
        a.join(b, ["band", "bsig"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def edit_distance_pairs(
    records: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 1,
    lowercase: bool = True,
    collapse_exact: bool = False,
) -> DataFrame:
    """Record-linkage candidate pairs within Levenshtein distance
    ``max_dist`` — typo-level duplicate detection for short strings
    (names, titles, product labels) where shingle/minhash machinery is
    overkill and exact hashing misses single-character edits.

    Blocking: (first character, length band of width ``max_dist + 1``).
    The length dimension is LOSSLESS — two strings within distance k
    differ in length by at most k, i.e. at most one band, and the
    lower-id side is exploded to its {b-1, b, b+1} neighbor bands so
    every qualifying pair shares a join key exactly once (no distinct
    needed). The first-character key is the classic record-linkage
    trade: an edit at position 0 crosses blocks (documented recall
    loss, same contract as banded SimHash beyond ``bands - 1``).
    Verification is exact JVM ``levenshtein`` on the blocked
    candidates only. Output: (doc_a, doc_b, distance), doc_a < doc_b.

    Scale guard — ``collapse_exact=True`` is the 100 TB form: rows
    sharing an identical (normalized) string are a distance-0 CLIQUE,
    and enumerating cliques is O(m²) per repeated value (measured on
    the sf0.1 part fixture: 3.12M enumerated pairs, of which ALL are
    exact-name duplicates over just 64 distinct strings). Collapsed
    mode dedupes to distinct strings first (min-id representative +
    clique size), runs the blocked edit-distance join between DISTINCT
    strings only — bounded by distinct-value count², independent of
    corpus duplication — and returns (doc_a, doc_b, distance, n_a,
    n_b). Exact cliques themselves are one hash shuffle away via
    ``exact_duplicate_groups``; they never belong in a pair join.
    """
    width = max_dist + 1
    nm = F.col(text_col)
    if lowercase:
        nm = F.lower(nm)
    base = records.select(F.col(id_col).alias("rid"), nm.alias("nm")).where(
        F.col("nm").isNotNull() & (F.length("nm") > 0)
    )
    if collapse_exact:
        base = base.groupBy("nm").agg(
            F.min("rid").alias("rid"), F.count(F.lit(1)).alias("n_rows")
        )
    base = base.select(
        "*",
        F.substring("nm", 1, 1).alias("c1"),
        F.floor(F.length("nm") / width).alias("b"),
    )
    extra_a = [F.col("n_rows").alias("n_a")] if collapse_exact else []
    extra_b = [F.col("n_rows").alias("n_b")] if collapse_exact else []
    a = base.select(
        F.col("rid").alias("rid_a"),
        F.col("nm").alias("nm_a"),
        "c1",
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("band"),
        *extra_a,
    )
    b = base.select(
        F.col("rid").alias("rid_b"),
        F.col("nm").alias("nm_b"),
        "c1",
        F.col("b").alias("band"),
        *extra_b,
    )
    dist = F.levenshtein("nm_a", "nm_b")
    out_cols = [
        F.col("rid_a").alias("doc_a"),
        F.col("rid_b").alias("doc_b"),
        dist.cast("int").alias("distance"),
    ]
    if collapse_exact:
        out_cols += [F.col("n_a"), F.col("n_b")]
    return (
        a.join(b, ["c1", "band"])
        .where(F.col("rid_a") < F.col("rid_b"))
        .where(F.abs(F.length("nm_a") - F.length("nm_b")) <= max_dist)
        .select(*out_cols)
        .where(F.col("distance") <= max_dist)
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool | None = None,
    segment: int | None = 65536,
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 — the MOSS algorithm): hash every character
    ``k``-gram of the normalized text, then keep the minimum hash of each
    ``window`` of consecutive positions. Output one row per distinct
    selected hash: (doc_id, fp, first_window) where ``first_window`` is
    the earliest window start achieving that minimum.

    Guarantee: any shared substring of length >= k + window - 1 between
    two documents produces at least one identical fingerprint in both
    (the winnowing coverage theorem), so joining on ``fp`` finds partial
    overlaps — plagiarism / quotation / template reuse — that whole-doc
    hashing (functions.text.fingerprint) and set-based MinHash both miss.
    Expected density ~2/(window+1) of positions selected.

    Normalization: lowercase + whitespace collapsed to single spaces +
    trim, mirroring the exact-dup fingerprint, so formatting changes
    don't shift grams. Docs shorter than k + window - 1 normalized chars
    yield no rows (nothing to guarantee — handle short docs with exact
    hashing).

    Scale design (100 TB): one explode to L rows per doc (linear, same
    class as shingle hashing), one window pass partitioned by
    (doc id, segment), one (doc, fp) group — uniform per-document keys,
    no all-pairs work; the md5-per-gram cost dominates and the ``fast``
    xxhash64 flag removes it in production exactly as in MinHash (oracle
    stays md5).

    ``segment`` bounds the giant-document straggler: the window pass
    partitions on (doc, segment) where each segment covers at most
    ``segment`` window-start positions, so no single task ever holds a
    whole document's grams — a GB-scale outlier doc becomes many
    bounded tasks instead of one spilling straggler. The fingerprint
    set is IDENTICAL to the unchunked construction (``segment=None``)
    by construction: positions are global, every window-start position
    belongs to exactly one segment, and each segment regenerates the
    ``window - 1`` boundary grams it needs (equivalently: text chunks
    overlapping by k + window - 2 chars), so every window min is
    computed over exactly the same grams. Gram hashes are computed
    streaming from the full text BEFORE the window shuffle — only
    (pos, hash) rows, at most ``segment + window - 1`` per task, ever
    reach an executor's window state.
    """
    from pyspark.sql import Window

    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    if segment is not None and segment < 1:
        raise ValueError("segment must be >= 1 or None")
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), norm.alias("_t"), F.length(norm).alias("_len"))
        # docs below k + window - 1 chars have no window position at all
        .where(F.col("_len") >= k + window - 1)
        # _w = number of window-start positions (pos 1.._w, global)
        .withColumn("_w", (F.col("_len") - k - window + 2).cast("long"))
    )
    seg_size = F.col("_w") if segment is None else F.lit(int(segment)).cast("long")
    # Keyed fan-out of the COMPACT (doc, segment) rows: a single-file scan
    # otherwise computes every gram md5 in one task (measured 2.7s of the
    # 3.7s sf0.1 wall serial), and hash-partitioning on the window's own
    # keys here means the window below reuses this exchange instead of
    # shuffling the L-per-doc gram rows (guide §2.4).
    segs = _fan_out(
        base.select(
            F.col(id_col),
            F.col("_t"),
            F.col("_w"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.col("_w") - 1) / seg_size).cast("long"),
                )
            ).alias("_seg"),
        ),
        id_col,
        "_seg",
    )
    w_start = F.col("_seg") * seg_size + 1  # first window-start pos (global)
    w_end = F.least((F.col("_seg") + 1) * seg_size, F.col("_w"))  # last one
    g_end = w_end + window - 1  # last gram pos any of this segment's windows reads
    grams = segs.select(
        F.col(id_col),
        F.col("_seg"),
        w_end.alias("_we"),
        F.explode(F.sequence(w_start, g_end)).alias("pos"),
        F.col("_t"),
    ).select(
        id_col,
        "_seg",
        "_we",
        "pos",
        minhash_word_value(F.substring(F.col("_t"), F.col("pos").cast("int"), k), fast=fast).alias("h"),
    )
    w = Window.partitionBy(id_col, "_seg").orderBy("pos").rowsBetween(0, window - 1)
    windowed = grams.select(
        id_col,
        "pos",
        F.min("h").over(w).alias("fp"),
        F.col("_we"),
    ).where(F.col("pos") <= F.col("_we"))
    return windowed.groupBy(id_col, "fp").agg(F.min("pos").alias("first_window"))


def winnowing_overlap_pairs(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 5,
    max_bucket_size: int | None = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool | None = None,
) -> DataFrame:
    """Partial-overlap document pairs from winnowing fingerprints: docs
    sharing >= ``min_shared`` selected rolling-hash fingerprints — the
    plagiarism / quotation / template-reuse detector. Finds pairs whose
    overlap is a contiguous PASSAGE, which set-based MinHash (whole-doc
    similarity) dilutes away on long documents.

    ``max_bucket_size`` is the stop-fingerprint cap, exactly the LSH
    stop-bucket argument (see lsh_candidate_pairs and the measured
    numbers in PLAN_AUDIT.md): a fingerprint appearing in more docs than
    the cap is corpus boilerplate contributing O(bucket²) pairs and no
    passage-overlap signal. None = exact semantics.

    Output: (doc_a, doc_b, n_shared) with doc_a < doc_b.

    Scale: fingerprint generation is linear (winnowing_fingerprints);
    the pair join is bounded by capped bucket sizes; the pair count
    aggregate is map-side combinable. Same shape as MinHash-LSH
    candidate generation — never all-pairs."""
    fps = winnowing_fingerprints(
        docs, k=k, window=window, text_col=text_col, id_col=id_col, fast=fast
    ).select(F.col(id_col), "fp")
    return _overlap_pairs_from_fps(fps, min_shared, max_bucket_size, id_col)


def _overlap_pairs_from_fps(
    fps: DataFrame,
    min_shared: int,
    max_bucket_size: int | None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, fp) rows -> (doc_a, doc_b, n_shared) pairs at >= min_shared
    shared fingerprints, with the stop-fingerprint cap applied first."""
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("fp")
        fps = (
            fps.withColumn("__bn", F.count(F.lit(1)).over(w))
            .where(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    fps = fps.localCheckpoint(eager=True)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs: assign every doc the
    minimum doc id reachable through the pair graph (the cluster
    representative / survivor; everything else is the kill set).

    Iterative label propagation: each round every node adopts the minimum
    label among itself and its neighbors; converges in O(diameter) rounds
    (near-dup clusters are dense, so usually 2-4). Each round is one
    grouped aggregation over the edge list; lineage is cut per round with
    localCheckpoint so plans stay flat. Driver-side loop stops early when a
    round changes nothing — the runtime→compile-time feedback pattern the
    reference's partition discovery also uses.

    Input: (doc_a, doc_b) pairs. Output: (doc_id, cluster_id) for every
    doc appearing in any pair, cluster_id = min doc id of its component.
    """
    # Pin the compact (doc_a, doc_b) rows BEFORE the symmetric union: the
    # two union branches are different projections of the same subtree
    # (no identical exchange for ReuseExchange to dedupe), so an
    # unpinned candidate-pair pipeline — typically a full LSH
    # bucket+self-join DAG — would evaluate TWICE in the edges job
    # (CLAUDE.md multi-consumer rule; measured: dedup_clusters carries
    # the whole minhash pipeline, one evaluation is ~1.4s of its 4.9s
    # solo wall at sf0.1/c32).
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    # No .distinct() on the symmetric union: distinct pairs (a < b, the
    # contract of every candidate generator here) can never produce a
    # duplicate directed edge, so the dedup was a pure no-op SHUFFLE of
    # the whole edge list. Min-label propagation is duplicate-TOLERANT
    # anyway (min over a multiset == min over its set), so callers
    # passing duplicated pairs lose nothing but join width; a caller
    # with heavy duplication should pre-distinct.
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    # The init IS the first propagation round: with label(id) = id, round
    # one's "min over self ∪ neighbors" is min(u, min of u's neighbors) —
    # one grouped aggregation straight over the edge list, no join, no
    # separate identity-labels checkpoint. Saves one full round plus the
    # init materialization versus starting from identity labels.
    # lazy checkpoint: the stats aggregate right below is the first
    # action, so ONE job materializes the checkpoint blocks AND returns
    # the loop-sizing stats (an eager pin + separate count + separate
    # sum was three jobs for the same answers).
    labels = (
        edges.select("u", F.col("v").alias("label"))
        .unionAll(edges.select("u", F.col("u").alias("label")))
        .groupBy("u")
        .agg(F.min("label").alias("label"))
        .select(F.col("u").alias("id"), "label")
        .localCheckpoint(eager=False)
    )
    # One stats pass up front sizes the whole loop: below the broadcast
    # threshold each round's edge⋈label join is map-side (zero edge
    # shuffle); above it the join falls back to a shuffle join — the
    # only choice when the node set itself is cluster-scale.
    stats = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    n_nodes, prev_sum = stats["n"], stats["s"]
    small_labels = n_nodes <= 8_000_000  # ~128 MB of (long,long) rows
    # TWO single-shuffle hops per materialization in the BROADCAST regime
    # only: each hop is neighbor label contributions unioned with the
    # node's own label, then one grouped min. Composing two hops in one
    # plan halves the checkpoint writes and driver round-trips per
    # converged component diameter; the first hop's (unmaterialized)
    # result is consumed twice inside the plan (join probe + union),
    # costing one extra edges⋈labels evaluation per round — cheaper than
    # the checkpoint + scheduling of the round it replaces while that
    # extra evaluation is a broadcast probe (measured at bench scale).
    # Above the broadcast threshold the duplicated hop-1 subplan would
    # re-run a SHUFFLE join of the full edge list — roughly doubling
    # per-round shuffle work — so the shuffle-join regime keeps one
    # checkpointed hop per round (ADVICE r13: the 'cheaper than a
    # checkpoint' measurement only covered the broadcast regime).
    hops_per_round = 2 if small_labels else 1
    for _ in range(max_iter):
        cur = labels
        for _hop in range(hops_per_round):
            lbl = F.broadcast(cur) if small_labels else cur
            contrib = edges.join(lbl, edges.v == lbl.id).select("u", "label")
            cur = (
                contrib.unionAll(cur.select(F.col("id").alias("u"), "label"))
                .groupBy("u")
                .agg(F.min("label").alias("label"))
                .select(F.col("u").alias("id"), "label")
            )
        # lazy checkpoint + the convergence aggregate as its first action:
        # one job both materializes the round's label blocks and returns
        # the sum (eager pin + separate sum was two jobs per round).
        new_labels = cur.localCheckpoint(eager=False)
        # labels only ever decrease, so the exact label sum is a strictly
        # decreasing convergence metric: comparing sums costs one scan of
        # the checkpointed frame instead of a join+shuffle per round.
        # decimal(38,0) keeps the sum exact at any cluster size.
        new_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        converged = new_sum == prev_sum
        prev_sum, labels = new_sum, new_labels
        if converged:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step
    after LSH). Joins the sets in twice by doc id — narrow joins, no
    all-pairs blowup. ``shingle_n`` > 1 compares word n-gram sets
    instead of word sets — on small-vocabulary corpora the word sets of
    unrelated documents are nearly identical (both cover the whole
    vocabulary), and only n-gram order separates them; match the
    ``shingle_n`` used for the LSH candidates."""
    if shingle_n == 1:
        ws = _word_set(text_col)
    else:
        from edna_dbt_library_spark.functions.text import shingles

        ws = F.array_distinct(shingles(F.col(text_col), shingle_n))
    sets_df = docs.select(F.col(id_col), ws.alias("ws"))
    a = sets_df.select(F.col(id_col).alias("doc_a"), F.col("ws").alias("ws_a"))
    b = sets_df.select(F.col(id_col).alias("doc_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = F.size(F.array_union("ws_a", "ws_b")).cast("double")
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
    )


def near_duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold."""
    cands = lsh_candidate_pairs(docs, num_hashes, bands, text_col, id_col)
    return jaccard_pairs(docs, cands, text_col, id_col).where(F.col("jaccard") >= threshold)


def jaccard_join_exact(
    docs: DataFrame,
    threshold: tuple = (3, 5),
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_prefix_bucket: int | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering: every pair
    of documents whose shingle-set Jaccard is >= t_num/t_den — the
    AllPairs / SSJoin algorithm (Bayardo et al. 2007 "Scaling Up All
    Pairs Similarity Search"; Chaudhuri et al. 2006 prefix filter).
    Unlike the MinHash-LSH pipeline (probabilistic recall) this misses
    NOTHING: if J(A, B) >= t then both prefixes contain the pair's
    globally-smallest common token (any consistent total order — proof:
    the |A∩B| common tokens all sort at or after it, so it sits at
    position <= |A| - ceil(t|A|) + 1 in A, symmetrically in B), so the
    prefix-to-prefix join generates every qualifying pair and the exact
    verify keeps precision at 1.

    The ENTIRE join runs in arithmetic hash space — per-word xxhash64
    combined by position-rotated XOR (curation._hashed_ngram_values):
    no shingle string is ever materialized (string shingle builds are
    the measured CPU dominator of every n-gram operator in this repo —
    8.9s of this operator's 17s sf0.1 wall before this form), and all
    shuffle keys are 8 bytes. Sets, sizes, and the intersection are
    therefore hash sets (contamination_flags' convention: two distinct
    shingles collide at ~2^-64 per doc — far below any fixture or
    production corpus — and the raw-string-joining DuckDB oracle would
    mismatch on one landing in a fixture). The global order is
    (document frequency ASC, hash ASC): rarest-first, the ordering that
    minimizes prefix-bucket sizes. The threshold is exact rational
    algebra — J >= t_num/t_den iff (t_den + t_num)·|∩| >= t_num·(|A| +
    |B|) — and jacc_permille is integer ``(1000·|∩|) div |∪|``: no
    float division anywhere (pagerank_int's determinism idiom).

    Scale shape: one df-count shuffle (8-byte keys, map-side combined),
    one df-attach join, one doc-keyed collect into the per-doc sorted
    prefix (doc-bounded rows — prefix length |d| - ceil(t|d|) + 1, so
    ~(1-t) of each set is ever emitted), a prefix-bucket self-join
    whose buckets are by construction each document's RAREST tokens,
    and a broadcast of the surviving candidate pairs for the exact
    verify. ``max_prefix_bucket`` caps pathological buckets (a doc made
    entirely of frequent shingles) like the LSH stop-bucket cap — the
    capped variant trades the exactness guarantee for a bound, so the
    default is None (exact).

    Output: (doc_a, doc_b, n_int, n_a, n_b, jacc_permille), doc_a <
    doc_b, one row per qualifying pair.
    """
    t_num, t_den = threshold
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be a fraction in (0, 1], got {threshold}")
    from edna_dbt_library_spark.operators.curation import _hashed_ngram_values

    hw = F.transform(tokens(F.col(text_col)), lambda x: F.xxhash64(x))
    ws = F.array_distinct(_hashed_ngram_values(hw, shingle_n))
    # checkpoint: the set table feeds the prefix path AND both verify
    # sides, the prefix table feeds both self-join sides — without the
    # cut each consumer re-runs the tokenize->hash pipeline (the LSH
    # bucket-table precedent, lsh_candidate_pairs)
    # the empty-set filter runs AFTER the checkpoint, on the materialized
    # column: placed before it, predicate pushdown re-derives the whole
    # tokenize->hash->distinct expression inside the filter — one extra
    # corpus-wide evaluation (measured 0.6s/eval at sf0.1) for a size()
    # check that costs nothing post-materialization
    sets_df = (
        docs.select(F.col(id_col).alias("id"), ws.alias("ws"))
        .localCheckpoint(eager=True)
        .where(F.size("ws") > 0)
    )
    exploded = sets_df.select("id", F.explode("ws").alias("h"))
    df_counts = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # per-doc prefix: first n - ceil(t*n) + 1 tokens in (df, h) order
    n = F.size("ordered")
    p = n - ((F.lit(t_num) * n + t_den - 1) / t_den).cast("int") + 1
    prefix = (
        exploded.join(df_counts, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("ordered"))
        .select(
            "id",
            F.size("ordered").alias("n"),
            F.posexplode(F.slice("ordered", F.lit(1), p)).alias("pos", "_t"),
        )
        .select("id", "n", "pos", F.col("_t.h").alias("h"))
        .localCheckpoint(eager=True)
    )
    if max_prefix_bucket is not None:
        from pyspark.sql import Window

        bucket_w = Window.partitionBy("h").orderBy("id")
        prefix = (
            prefix.withColumn("_r", F.row_number().over(bucket_w))
            .where(F.col("_r") <= max_prefix_bucket)
            .drop("_r")
        )
    # PPJoin-style pair-instance filters (Xiao et al. 2008), both provably
    # safe: LENGTH — J >= t forces t_num*max(|A|,|B|) <= t_den*min;
    # POSITIONAL — the pair's globally-smallest common token at positions
    # (i, j) bounds the overlap by 1 + min(|A|-1-i, |B|-1-j), which must
    # reach alpha = ceil(t_num*(|A|+|B|) / (t_num+t_den)); a qualifying
    # pair's smallest common token is in both prefixes and passes, so
    # keeping pairs where ANY shared instance passes loses nothing.
    na, nb = F.col("x.n"), F.col("y.n")
    ub = 1 + F.least(na - 1 - F.col("x.pos"), nb - 1 - F.col("y.pos"))
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "h")
        .where(
            (F.col("x.id") < F.col("y.id"))
            & (t_num * F.greatest(na, nb) <= t_den * F.least(na, nb))
            & ((t_num + t_den) * ub >= t_num * (na + nb))
        )
        .select(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
        .distinct()
    )
    a = sets_df.select(F.col("id").alias("doc_a"), F.col("ws").alias("ws_a"))
    b = sets_df.select(F.col("id").alias("doc_b"), F.col("ws").alias("ws_b"))
    n_int = F.size(F.array_intersect("ws_a", "ws_b")).cast("long")
    n_a, n_b = F.size("ws_a").cast("long"), F.size("ws_b").cast("long")
    scored = (
        a.join(F.broadcast(cand), "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_int.alias("n_int"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
        .where(
            (t_den + t_num) * F.col("n_int") >= t_num * (F.col("n_a") + F.col("n_b"))
        )
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "n_int",
        "n_a",
        "n_b",
        ((1000 * F.col("n_int")).cast("long")).alias("_num"),
        (F.col("n_a") + F.col("n_b") - F.col("n_int")).alias("_den"),
    ).select(
        "doc_a",
        "doc_b",
        "n_int",
        "n_a",
        "n_b",
        F.expr("_num div _den").alias("jacc_permille"),
    )


def simhash(
    docs: DataFrame,
    bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc SimHash over distinct words: bit i of the signature is the
    sign of Σ_words (±1 by bit i of md5(word)). 60 bits so the word hash
    (15 hex chars) stays inside a signed 64-bit long in every engine.
    Output: (id, simhash_bits as a '0'/'1' string, msb first)."""
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60]")
    words = _fan_out(docs).select(F.col(id_col), F.explode(_word_set(text_col)).alias("w"))
    words = words.withColumn("h", minhash_word_value(F.col("w")))
    # per-bit ±1 sums ride as raw bit sums + one count: Σ(±1) = 2·Σbit − n,
    # so "Σ(±1) > 0" is exactly "2·Σbit > n" — drops the per-row-per-bit
    # conditional from the 60-aggregate update loop (~15% of the pass)
    sums = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"s{i}")
        for i in range(bits)
    ]
    agg = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *sums)
    sig = F.concat(*[
        F.when(2 * F.col(f"s{i}") > F.col("_n"), F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits - 1, -1, -1)
    ])
    return agg.select(F.col(id_col), sig.alias("simhash_bits"))


def run_incremental_dedup(
    wh,
    store,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming batch against ALL previously-ingested documents
    without ever re-scanning the corpus: a persistent store keeps one
    (fingerprint, id) row per unique document ever admitted; each batch
    drops its internal duplicates, anti-joins the store, appends what
    survives, and returns the admitted rows.

    The fingerprint is functions/text.fingerprint (casefold/whitespace
    normalized md5 — same stability contract as the reference's derived
    keys, macros/utils/uuid_generation.sql). First-keeper choice inside a
    batch is min(id) — deterministic under any partitioning. Replaying a
    batch admits nothing (its fingerprints are already stored), so
    ingestion is idempotent / at-least-once safe.

    Scale: the store grows with *unique* documents but each run's cost is
    bounded by the batch — the batch's fingerprints build a Bloom filter
    (operators/sketches.bloom_build) that prunes the store scan to the
    ~colliding fraction before the anti-join shuffle, the same
    runtime-row-filter pattern as bloom_semi_join.
    """
    from edna_dbt_library_spark.functions.text import fingerprint
    from edna_dbt_library_spark.operators.sketches import bloom_build, bloom_filter_rows

    fp = batch.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp"), F.col(text_col)
    )
    # in-batch dedup: deterministic min-id keeper per fingerprint
    w_min = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    batch_unique = fp.join(w_min, ["fp", id_col])

    if wh.exists(store):
        seen = wh.read(store)
        bloom = bloom_build(batch_unique, F.col("fp"))
        seen_hits = bloom_filter_rows(seen.select("fp"), F.col("fp"), bloom)
        # materialize the result BEFORE appending: the plan reads the store
        # path the append mutates (a cache would not survive — the write
        # invalidates cached plans over the path), and a lazy re-execution
        # after the write would see its own fingerprints and return empty
        admitted = batch_unique.join(seen_hits, "fp", "left_anti").localCheckpoint(eager=True)
        wh.append(store, admitted.select("fp", id_col))
    else:
        admitted = batch_unique
        from edna_dbt_library_spark.sources.warehouse import TableMeta

        wh.create_as(store, admitted.select("fp", id_col), TableMeta())
    return admitted.select(id_col, "fp", text_col)


def run_incremental_passage_dedup(
    wh,
    store,
    batch: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 5,
    max_bucket_size: int | None = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    fast: bool = False,
) -> DataFrame:
    """Passage-level incremental dedup: admit only batch documents that do
    not substantially overlap the already-ingested corpus — the crawl-
    ingestion companion of run_incremental_dedup, but at winnowing
    fingerprint granularity, so re-posted articles with new boilerplate,
    quoted passages and lightly-edited copies are caught, not just
    byte-identical texts.

    Rules (all deterministic):
    * In-batch: passage-overlap pairs (>= ``min_shared`` shared
      fingerprints, stop-fingerprint cap applied) are clustered
      transitively (duplicate_clusters) and only each cluster's min-id
      doc survives.
    * Against the store: a doc is rejected when >= ``min_shared`` of its
      fingerprints are already stored, OR when ALL of its fingerprints
      are (full passage containment — this also makes replaying a batch
      admit nothing, for any doc long enough to fingerprint at all).
    * Docs too short to produce any fingerprint (< k + window - 1
      normalized chars) are always admitted here — run them through the
      exact-fingerprint store (run_incremental_dedup) instead; the two
      compose.

    Store schema: one (fp, doc_id) row per fingerprint of every admitted
    doc. Each run's cost is bounded by the batch: the batch's
    fingerprints build a Bloom filter that prunes the store scan before
    the membership join, as in run_incremental_dedup.

    The fingerprint hash mode is PINNED per store via the explicit
    ``fast`` parameter (default False = md5, matching
    run_incremental_dedup's pinned functions/text.fingerprint). The
    SPARK_GRAFT_FAST_HASH env var is deliberately NOT consulted here:
    md5 and xxhash64 fingerprints never collide, so a session-level
    flag differing between the run that wrote the store and a later run
    would make every membership join match nothing and silently admit
    every duplicate. Callers that opt into ``fast=True`` must use it
    for the store's whole lifetime.

    Returns the admitted batch rows (id, text).
    """
    from edna_dbt_library_spark.operators.sketches import bloom_build, bloom_filter_rows

    fps = winnowing_fingerprints(
        batch, k=k, window=window, text_col=text_col, id_col=id_col, fast=fast
    ).select(F.col(id_col), "fp").localCheckpoint(eager=True)

    # in-batch transitive passage clusters -> min-id keeper
    pairs = _overlap_pairs_from_fps(fps, min_shared, max_bucket_size, id_col)
    labels = duplicate_clusters(pairs)
    kill = labels.where(F.col(id_col) != F.col("cluster_id")).select(id_col)
    batch_kept = batch.join(kill, id_col, "left_anti")
    fps_kept = fps.join(kill, id_col, "left_anti")

    if wh.exists(store):
        bloom = bloom_build(fps_kept, F.col("fp"))
        seen_fps = bloom_filter_rows(
            wh.read(store).select("fp").distinct(), F.col("fp"), bloom
        )
        overlap = (
            fps_kept.join(seen_fps, "fp", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("_n_hit"))
        )
        totals = fps_kept.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_fp"))
        rejected = (
            totals.join(overlap, id_col)
            .where(
                (F.col("_n_hit") >= min_shared) | (F.col("_n_hit") == F.col("_n_fp"))
            )
            .select(id_col)
        )
        admitted = batch_kept.join(rejected, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        wh.append(store, fps_kept.join(rejected, id_col, "left_anti").select("fp", id_col))
    else:
        admitted = batch_kept.localCheckpoint(eager=True)
        from edna_dbt_library_spark.sources.warehouse import TableMeta

        wh.create_as(store, fps_kept.select("fp", id_col), TableMeta())
    return admitted.select(id_col, text_col)


def run_incremental_jaccard_join(
    wh,
    store,
    batch: DataFrame,
    threshold: tuple = (3, 5),
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs_sink=None,
) -> DataFrame:
    """Incremental EXACT set-similarity join: every Jaccard >= t pair the
    incoming batch forms — with everything previously admitted AND
    within itself — without ever re-joining old-vs-old (the daily-crawl
    shape of :func:`jaccard_join_exact`, mirroring
    run_incremental_dedup's store contract: replaying a batch admits
    nothing and emits nothing).

    The prefix filter needs one GLOBAL total order shared by every
    batch, so the order is FROZEN from the first batch's document
    frequencies (the frozen-first-batch-centroids precedent of
    run_incremental_semantic_dedup): tokens unseen in batch 1 sort
    last under (df = 2^62, h). Any fixed order keeps the filters
    provably lossless — first-batch rarest-first just keeps buckets
    small when batch 1 is representative.

    Store layout (three warehouse relations):
      * ``<store>``          (id, n, ws array<long>)  admitted hash sets
      * ``<store>_prefix``   (id, n, pos, h)          their prefix index
      * ``<store>_order``    (h, df)                  the frozen order

    Per run the corpus-sized tables are touched exactly where a search
    must: the prefix INDEX joins the new docs' prefixes (8-byte keys,
    PPJoin length + positional filters), and the sets table is read
    only for candidate ids (broadcast semi-join) in the exact verify.
    Old-vs-old pairs are never recomputed.

    Output: (doc_a, doc_b, n_int, n_a, n_b, jacc_permille), doc_a <
    doc_b, every qualifying pair with >= 1 newly-admitted member.
    Accumulated over any batch split, the union of outputs equals
    ``jaccard_join_exact`` over the whole corpus (pytest-locked) —
    exactness is order-independent even though the candidates differ.

    ``pairs_sink(pairs)`` (optional) is invoked with the materialized
    pair frame BEFORE the store mutates, and ONLY when the batch
    contains new ids — the ordering that makes an at-least-once
    redelivery safe end to end: a crash before the sink recomputes
    everything (store untouched); a crash between sink and store-append
    recomputes and rewrites the IDENTICAL pairs; after the append a
    redelivery short-circuits on zero new ids, leaving the sink's
    committed output untouched (an overwrite-with-empty there would
    destroy first-delivery pairs — the hole this parameter closes for
    streaming.stream_jaccard_join).
    """
    t_num, t_den = threshold
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be a fraction in (0, 1], got {threshold}")
    from edna_dbt_library_spark.operators.curation import _hashed_ngram_values
    from edna_dbt_library_spark.sources.warehouse import TableMeta

    UNSEEN_DF = 1 << 62
    prefix_rel = wh.relation(store.schema, store.identifier + "_prefix")
    order_rel = wh.relation(store.schema, store.identifier + "_order")

    hw = F.transform(tokens(F.col(text_col)), lambda x: F.xxhash64(x))
    ws = F.array_distinct(_hashed_ngram_values(hw, shingle_n))
    # filter after the checkpoint: pushed before it, the predicate
    # re-derives the tokenize->hash->distinct expression (same catch as
    # jaccard_join_exact's sets_df)
    bsets = (
        batch.select(F.col(id_col).cast("long").alias("id"), ws.alias("ws"))
        .localCheckpoint(eager=True)
        .where(F.size("ws") > 0)
    )
    first = not wh.exists(store)
    if first:
        new = bsets
    else:
        new = bsets.join(wh.read(store).select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
    if not new.take(1):
        return new.sparkSession.createDataFrame(
            [], "doc_a long, doc_b long, n_int long, n_a long, n_b long, jacc_permille long"
        )
    exploded = new.select("id", F.explode("ws").alias("h"))
    if first:
        order_df = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df")).localCheckpoint(
            eager=True
        )
    else:
        order_df = wh.read(order_rel)

    nn = F.size("ordered")
    p = nn - ((F.lit(t_num) * nn + t_den - 1) / t_den).cast("int") + 1
    newpref = (
        exploded.join(order_df, "h", "left")
        .withColumn("df", F.coalesce("df", F.lit(UNSEEN_DF)))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("ordered"))
        .select(
            "id",
            F.size("ordered").alias("n"),
            F.posexplode(F.slice("ordered", F.lit(1), p)).alias("pos", "_t"),
        )
        .select("id", "n", "pos", F.col("_t.h").alias("h"))
        .localCheckpoint(eager=True)
    )

    na, nb = F.col("x.n"), F.col("y.n")
    ub = 1 + F.least(na - 1 - F.col("x.pos"), nb - 1 - F.col("y.pos"))
    filters = (t_num * F.greatest(na, nb) <= t_den * F.least(na, nb)) & (
        (t_num + t_den) * ub >= t_num * (na + nb)
    )
    cand = (
        newpref.alias("x")
        .join(newpref.alias("y"), "h")
        .where((F.col("x.id") < F.col("y.id")) & filters)
        .select(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
    )
    all_sets = new
    if not first:
        cross = (
            newpref.alias("x")
            .join(wh.read(prefix_rel).alias("y"), "h")
            .where((F.col("x.id") != F.col("y.id")) & filters)
            .select(
                F.least(F.col("x.id"), F.col("y.id")).alias("doc_a"),
                F.greatest(F.col("x.id"), F.col("y.id")).alias("doc_b"),
            )
        )
        cand = cand.unionByName(cross)
        all_sets = new.unionByName(wh.read(store).select("id", "ws"))
    cand = cand.distinct()

    a = all_sets.select(F.col("id").alias("doc_a"), F.col("ws").alias("ws_a"))
    b = all_sets.select(F.col("id").alias("doc_b"), F.col("ws").alias("ws_b"))
    n_int = F.size(F.array_intersect("ws_a", "ws_b")).cast("long")
    pairs = (
        a.join(F.broadcast(cand), "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_int.alias("n_int"),
            F.size("ws_a").cast("long").alias("n_a"),
            F.size("ws_b").cast("long").alias("n_b"),
        )
        .where(
            (t_den + t_num) * F.col("n_int") >= t_num * (F.col("n_a") + F.col("n_b"))
        )
        .select(
            "doc_a",
            "doc_b",
            "n_int",
            "n_a",
            "n_b",
            F.expr(
                "(1000 * n_int) div (n_a + n_b - n_int)"
            ).alias("jacc_permille"),
        )
        .localCheckpoint(eager=True)  # materialize before mutating the store
    )
    if pairs_sink is not None:
        pairs_sink(pairs)  # sink BEFORE the store mutates (see docstring)

    new_rows = new.select("id", F.size("ws").cast("long").alias("n"), "ws")
    if first:
        # store LAST: exists(store) is the first-batch commit point, so
        # the auxiliary relations must exist before it does — a crash
        # after the store create with _order/_prefix missing would brick
        # every later batch (the not-first path reads them), while a
        # crash before it just re-runs the first batch and CREATE OR
        # REPLACEs the auxiliaries. Same sink-before-commit ordering as
        # pairs_sink above.
        wh.create_as(order_rel, order_df, TableMeta())
        wh.create_as(prefix_rel, newpref, TableMeta())
        wh.create_as(store, new_rows, TableMeta())
    else:
        wh.append(store, new_rows)
        wh.append(prefix_rel, newpref)
    return pairs
