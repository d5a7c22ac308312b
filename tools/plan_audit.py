#!/usr/bin/env python
"""Physical-plan audit over every registered query: join strategies,
shuffle counts, scan pushdown. Writes PLAN_AUDIT.md.

This is the 'would it survive 100x' check (ARCHITECTURE.md): dimension
joins must broadcast, filters must reach the parquet scan, and shuffle
counts should match what the algorithm inherently needs.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")


def main() -> None:
    import __spark_entry__ as entrymod
    from edna_dbt_library_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    lines = [
        "# PLAN_AUDIT — physical plans of every registered query",
        "",
        f"Scale factor dir: `{SF_DIR}`. Columns: BHJ = BroadcastHashJoin,",
        "SMJ = SortMergeJoin, Exch = Exchange (shuffle), push = scans with a",
        "non-trivial pushed filter (beyond IsNotNull).",
        "",
        "| query | BHJ | SMJ | Exch | push | notes |",
        "|---|---|---|---|---|---|",
    ]
    from edna_dbt_library_spark import queries as qmod

    audited = {**qmod.queries(), **qmod.extra_queries()}
    core = set(qmod.CORE_ORDER)
    for name, fn in audited.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            lines.append(f"| {name} | - | - | - | - | ERROR: {str(e)[:60]} |")
            continue
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        # true shuffles only: "Exchange hashpartitioning/rangepartitioning/
        # SinglePartition", not BroadcastExchange / ReusedExchange
        exch = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange (hash|range|Single)", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nontrivial = sum(
            1 for p in pushed if re.search(r"(EqualTo|GreaterThan|LessThan|In\()", p)
        )
        notes = []
        if "InMemoryTableScan" in plan or "LocalTableScan" in plan and "Scan parquet" not in plan:
            notes.append("materialized input")
        if "mapinpandas" in plan.lower() or "FlatMapGroupsInPandas" in plan:
            notes.append("arrow-batched python")
        if name not in core:
            notes.append("extra")
        lines.append(
            f"| {name} | {bhj} | {smj} | {exch} | {nontrivial}/{len(pushed)} | {', '.join(notes)} |"
        )
    lines += ["", STRESS_SECTION.strip(), ""]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


# Static section: measured once per round by tools/dedup_scale_stress.py
# (slow — it deliberately runs the uncapped pathological case); keep the
# latest numbers here so regenerating the plan table preserves them.
STRESS_SECTION = """
## Mixed-rollup INCREMENTAL serve — write volume tracks touched groups (round 13)

`tools/aggdistinct_serve_stress.py`, measured 2026-08-17 (round 13) on
local[32]: a per-user rollup (count(*), sum, count(DISTINCT item)
GROUP BY uid) over a 1,000,000-group domain — the high-cardinality
shape where the r12 full-rewrite serve was O(|view|) every window
(r12 verdict What's-wrong #1). Windows touch K groups at a FIXED view
size; the serve now reads the touched keys off BOTH children's own
changelogs and lands ONE keyed upsert.

| window | groups served | bytes landed on target | composed sync wall |
|---|---|---|---|
| K = 2,000 | 2,000 | 15.9 KB | 32.3 s |
| K = 8,000 | 8,000 | 47.4 KB | 27.3 s |
| K = 32,000 | 32,000 | 174.7 KB | 25.1 s |
| r12 full-rewrite alternative (EVERY window) | 1,000,000 | 6.27 MB | 2.0 s |

Serve write volume is exactly the touched-group count (36-395x less
than the rewrite ships), and sync wall is FLAT in |view| — the
residual wall is the CHILDREN's uniform-update window (the documented
uniform-DML scan terms; a time-localized window prunes it). The
rewrite's 2.0 s is a toy-scale artifact (1M rows to local disk); at
10^9 users it ships the whole view per window while the incremental
serve ships the window's users — write volume, not local wall, is the
scale number. Crash-at-promote replay and the child-rebaseline
full-serve fallback are pytest-gated (test_agg_view).

## Extrema view append-only fast path — sync cost independent of history depth (round 13)

`tools/extrema_append_stress.py`, measured 2026-08-17 (round 13) on
local[32]: min/max over 50,000 groups at growing HISTORY DEPTH (rows
per group), same absolute 20,000-row append window at every depth. An
append-only window (no σ-admitted deletes) takes the r13 merge fast
path — greatest/least(stored, window partials) against a
touched-group target probe, NO source rescan; the control arm adds
ONE delete, forcing the slow path's touched-group history recompute.

| history depth | source rows | append-only fast path | same window + 1 delete (recompute) |
|---|---|---|---|
| 8 | 0.4M | 3.3 s | 3.9 s |
| 64 | 3.2M | 2.3 s | 4.5 s |
| 256 | 12.8M | 2.5 s | 7.1 s |

Fast-path cost is FLAT across a 32x depth growth (window-sized, as
claimed); the recompute arm grows with depth — the exact term the
fast path removes for the production-common append-only shape.
min/max merge idempotence keeps the keyed replace replay-convergent
(pytest: NULL semantics, new groups, inside-extrema appends hold).

## Same-host bench control — round 10 tip vs round 11 tip

Measured 2026-08-16 on this host: r10 tip (`26c139f`) cloned clean to
/tmp and benched TWICE, interleaved with TWO runs of this tree (the
host swings whole-run totals ±10% with slot state: r10 measured
152.7s then 137.1s, r11 161.3s then 144.2s on the same 93 common
queries). The drift-robust comparison is min-of-two per tree:
**130.8s -> 132.4s = 1.012x — the line holds** (threshold 1.05). The
two apparent per-query flags were settled by interleaved solo
timings in ONE JVM: `bm25_topk_docs` medians r10 1.61s vs r11
**1.28s (faster)** — its 3.5-7.9s bench-run spikes were GC/host
artifacts, not plan changes (the q2/q8/q21 "regressions" in the raw
pairing were the same slot inflation on code untouched this round).

## Time-series scale stress — sparse RANGE frames vs densify

`tools/timeseries_scale_stress.py`, measured 2026-08-16 (round 10) on
local[32]: 20M events, 50k users, one year of hourly buckets (0.8%
occupancy after resampling to 3.65M sparse rows, 3.6s — one map-side-
combined shuffle).

| operation | rows touched | wall |
|---|---|---|
| sliding 24h window, sparse integer RANGE frame (`sliding_agg`) | 3.65M | **0.9s** |
| same answer via gap_fill + zero-fill + ROWS frame | 432M (118x blowup) | 124.3s (**143x slower**) |
| dense gap_fill + LOCF + integer linear interpolation (when the dense grid IS the product) | 432M | 107.4s |

The two sliding paths are asserted bit-identical on the occupied
buckets in-run — the gap is pure zero-materialization overhead, which
is why `sliding_agg`/`finite_difference` never densify: Spark's
WindowExec walks the integer bucket range directly, so a 1%-occupied
sensor series pays 1%-sized windows. `gap_fill` stays the explicit
opt-in for when the regularized grid is itself the deliverable
(dashboards, interpolation), sized by keys x time range, never by
event volume.

## Join-view IVM scale stress — delta sync crosses over full re-join

`tools/joinview_scale_stress.py`, measured 2026-08-16 (round 10) on
local[32]: a day-partitioned fact (id, fk, d, fv, 128-char pad) inner-
joined to a 100k-row dim, maintained by run_incremental_join_view
through a sparse both-sides DML window (~0.1% fact delete+update, 50k
append, 1% dim update — each dim touch retires/relands its whole
fan-out; delta pairs ~1.4-2.3% of the view).

| fact rows | full materialize | delta sync | ratio |
|---|---|---|---|
| 4M  | 11.1s  | 15.1s | 0.7x (full still wins) |
| 16M | 176.6s | 65.3s | **2.7x** |

The delta's cost is merge-on-read machinery — changelog reads +
key-COLUMN position probes — which is column-pruned and so nearly
width- and size-independent, while the full rebuild pays every byte of
every row: the crossover tracks the view's width x count product and
widens from there (at 100 TB the full re-join is off the table
entirely). Honest negative result kept in the tool: bloom sidecars on
the view do NOT help this window (23.4s vs 15.1s at 4M) because the
probe keys scatter uniformly across every view file — blooms pay off
for localized probes (see the replica stress's fresh-id-range case),
not scattered ones. Two engineered costs are asserted in the
operator's docstring: delta-pair frames pin before upsert_matching
(its count+write evaluates the source twice), and the other side's
scan pre-prunes with the delta's join-key literals when they collect
under a bound (the get_partitions_literal_for_merge idiom).

## Aggregate-view IVM scale stress — sync cost tracks window + view, not source

`tools/aggview_scale_stress.py`, measured 2026-08-16 (round 11) on
local[32]: an event table (sensor, ts, amt) maintained as an hourly
SUM/COUNT view (672k groups — fixed by sensors x hours while the
source grows) through a ~16k-row DML window, one delta sync vs the
full re-aggregation the reference's recompute-per-run model pays.
Steady-state timing (min of two windows; this shared host swings
single syncs up to 3x with page-cache/GC state — same rule as the
bench's same-host pairing).

| scenario | source rows | delta sync | full re-agg | ratio |
|---|---|---|---|---|
| localized (day-partitioned, window = last day) | 16M | 11.0s | 3.5s | 0.3x |
| localized | 64M | **10.1s (flat)** | **9.5s (x2.7)** | ~1x and crossing |
| uniform-scatter (worst case) | 64M | 15.7s | 18.2s | 1.2x |

The shape is the claim: the sync is FLAT in source size (its cost is
the window's affected files + an O(view) probe/upsert) while the
recompute grows linearly — a narrow columnar source makes recompute
cheap at fixture scale, so the crossover lands at ~64M here and
widens from there (at 100 TB recompute is a full-corpus scan per
window; the sync never rescans). Uniform-scatter deletes are the
honest worst case: every source file carries delete entries, so the
deleted-row (file, pos) join spans the table once — a time-localized
window (late data in recent partitions, the production shape) prunes
it to the touched day. One engineered cost is asserted in the
operator: the window feed pins (localCheckpoint) before the two
null-guard probes and the net aggregation, which would otherwise
re-run the deleted-row join 3x.

## Round-12 same-host bench control — the line held

Interleaved clean-clone control (r11 tip `bbe510b` vs r12 tip), THREE
bench.py runs each in A/B/A/B/A/B order on the post-pytest host,
min-of-three per tree over the 93 common queries: **111.3s -> 113.9s =
1.024x**. One per-query flag above 1.15x+0.2s (simhash60 1.74s ->
2.07s, 1.19x) sits on code untouched this round — no r12 change is on
any bench query's path (the round's diffs are materializations /
sql_dml / maintenance / vacuum, none executed by bench) — and inside
the host's own swing (r12's three runs totaled 130.2 / 132.0 / 116.2s,
a 12% spread; min-of-two had shown 1.047x with ten such phantom flags
before the third cycle tightened the minimum). The r12 additions are
stateful scored rows (scratch-warehouse DML scenarios), which bench.py
excludes by design.

## Join-aggregate view IVM scale stress — sync cost decomposed honestly

`tools/joinagg_scale_stress.py`, measured 2026-08-16 (round 12) on an
idle local[32] (an earlier run that shared the host with pytest read
50% slower — same contamination rule as the bench): a (fid, j, amt)
fact joined to a 10k-row dim, maintained as SELECT grp, sum, count
GROUP BY grp (202 groups) through a ~16k-row fact window PLUS dim
churn (5 group-moving updates + 3 key deletes, each retracting a
~1.6-6.4k-pair join fan-out), one composed sync vs the full
join+re-aggregation the reference's staging models pay per run.

| fact rows | composed delta (worst case) | append-only sync | full re-join+agg |
|---|---|---|---|
| 16M | 16.7s | 13.2s | 5.3s |
| 64M | 30.9s | **6.0s (flat)** | 8.4s |

Three honest observations. (1) The APPEND-ONLY sync — the production-
common late-data shape — is FLAT in source size (6-13s of fixed
orchestration across 4x growth: two join-view upserts + the agg sync +
watermark snapshots; the 64M timing is the smaller one). (2) The
worst-case delta grows SUB-linearly (x1.85 over x4) through its two
documented scan terms: the uniform-scatter deleted-row (file, pos)
join spans every fact file (same caveat and same cure as the agg-view
stress — day-partitioned windows prune it), and the dim-churn fan-in
re-lands pairs from a fact NOT clustered by join key (a j-clustered
layout would zone-map-prune it). (3) The re-join+agg alternative looks
cheap here BECAUSE the fixture is a narrow 3-long-column page-cached
table that Catalyst column-prunes and broadcast-joins — its real-scale
cost is a FULL-CORPUS READ per refresh window (8.4s grows linearly
with the fact; at 100 TB that is the whole corpus through the scan
every run), while the composed sync reads the window's files plus the
prunable terms above and the child never re-joins untouched rows. The
exact-equality gate (view == direct join-aggregate) held at every
size.

## Dedup scale stress — the LSH stop-bucket cap bounds pair growth

`tools/dedup_scale_stress.py`, measured 2026-08-13 (round 3) on
local[32]: a 27,000-doc corpus built from sf0.1 documents ×5
near-identical variants each, plus an injected 2,000-doc boilerplate
family sharing 3 cores — the bucket-flooding shape that O(bucket²)
candidate generation dies on at 100 TB.

Band-bucket size distribution: 1,045 buckets; max bucket = 19,590 docs
(73% of the corpus in ONE bucket), p99 = 2,395; 67 buckets exceed
cap=64 and 33 exceed cap=256, yet those few buckets carry
588,538,672 of the total Σ n·(n−1)/2 pair bound — the ≤64-size
buckets contribute only 28,415 (0.005%).

| run | candidate pairs | wall (s) |
|---|---|---|
| uncapped (exact LSH semantics) | 266,584,189 | 841.2 |
| cap = 256 (LSH_BUCKET_CAP prod default) | 374,888 | 2.0 |
| cap = 64 | 27,677 | 1.3 |
| duplicate_clusters on cap-64 pairs | 1,744 docs → 42 clusters | 5.5 |

The cap removes 99.99% of candidate pairs and ~420× of wall clock while
keeping every discriminative bucket: docs in giant buckets share
near-universal shingles (boilerplate), so their pairs carry no dedup
signal the smaller buckets don't already provide. This is the measured
proof behind the `max_bucket_size` default in production
(`dedup_minhash_lsh_capped`) and the 100 TB claim in VERDICT §LLM ops.

Round-3 operators on the same 27k-doc stress corpus (hot boilerplate
lines/passages everywhere): corpus-wide line dedup 2.5s (the map-side
min-struct keeper absorbs the duplicated-line skew), capped winnowing
passage pairs 17,278 pairs / 21.2s, fused curation verdict 23.1s. The
verdict number is itself a stress catch: the first fused build ran
756s here because Catalyst collapsed the word-array projection into
per-element element_at indexing (O(W²·n) per doc) over
ExistingRDD-backed inputs — the gram builders now use position-shifted
slice+zip_with construction, immune to that collapse by evaluating
each array input once per row.

## Embedding scale stress — skewed cells, convergence, probe selectivity

`tools/embedding_scale_stress.py`, measured 2026-08-14 (round 4) on
local[32]: 30,000 vectors = sf0.1 embeddings ×10 deterministically
perturbed variants + a 10,000-vector hot cluster packed around one
point — the dense-region shape (boilerplate pages, template
screenshots) that floods one IVF cell in production corpora.

k-means convergence (exact-integer Lloyd, n_cells=16): total squared
centroid displacement per pass 25,426,104 → 669,252 → 106,905 → 89,435
— the geometry settles in 2 passes (the production `train_iters=2`
default captures >97% of total movement); the hot cluster absorbs
exactly one centroid (max cell = 10,000 vectors = 33.3% of the corpus,
all 16 cells populated).

| measurement | value |
|---|---|
| probe selectivity, uniform estimate (n_probe/n_cells) | 0.25 |
| probe selectivity, measured avg over 5 queries | 0.2491 |
| probe selectivity, hot-cluster query (worst case) | 0.4844 |
| recall@10 of IVF (n_probe=4) vs exact brute force | 0.98 |
| ivf_topk end-to-end (train 2 passes + index + search) | 25.9s |
| brute force exact baseline (same 5 queries) | 2.4s |
| cell_outliers (train + argmin + per-cell top-k) | 20.3s |

Two audit conclusions. (1) Skew moves the *worst-case* probe cost, not
the average: a query landing in the hot region scans its hot cell —
48% here — so at 100 TB the mitigation is more cells (n_cells scales
the key space, not the shuffle volume) or splitting cells above a size
cap, not more probes. (2) At 30k vectors, TRAINING dominates
end-to-end wall (brute force beats IVF below ~10⁵ vectors); the train
cost is per-corpus, not per-query — `ivf_topk`/`cell_outliers` accept
precomputed `centroids=` so production trains once and searches many
times, which is where the n_probe/n_cells scan saving actually pays.

SemDeDup on the same hot corpus (threshold 0.95, reused centroids) —
the within-cell self-join meets the 10,000-vector cell:

| run | wall (s) | killed (of 30,000) |
|---|---|---|
| exact (cell² pairs in the hot cell) | 242.6 | 27,833 |
| `max_cell_size=1000` (md5 sub-buckets) | 45.5 | 25,858 |

The cap is 5.3× faster and keeps 93% of the kill set: a cell that
big is by construction a dense near-duplicate family, so each of its
~10 sub-buckets still collapses to one representative — the misses
are cross-sub-bucket pairs whose members die in their own bucket
anyway, plus one extra surviving representative per sub-bucket. Same
trade as the LSH stop-bucket cap, measured on the same shape of data.

PQ / IVFADC on the same 30k-vector skewed corpus (re-measured
2026-08-15, round 8, after the join-free index-build rewrite; m=4
subspaces × 16 codes, codebooks trained once with the shared
exact-integer Lloyd):

| measurement | value |
|---|---|
| codebook training, m sequential runs → FUSED one-pass-per-iteration (r8) | 25.1s → 8.8s |
| encode pass (30,000 vectors → 120,000 codes) | 1.7s |
| bytes per vector (64 float32 dims → 4 codes) | 256 → 4 (64×) |
| `pq_adc_topk` search, 5 queries | 4.4–5.7s (one 15.7s harness outlier) |
| recall@10, ADC vs exact brute force | 0.92 (bit-stable every run) |
| `ivf_pq_topk` (IVFADC: coarse probe + ADC on candidates) | 16.0s |
| recall@10, IVFADC (n_probe=4) vs brute force | 0.92 |

Fused training (r8): all m subspace codebooks now train in ONE
exploded frame — each Lloyd iteration is a single corpus pass with a
(sub, cell, dim) shuffle key space instead of m sequential
kmeans_cells runs (m × the scans). Like-for-like harness positions
measured 25.1s → 8.8s; at IO-bound corpus scale the saving is
structural (scan count), not just wall. The round's second half
extended the same move to the COARSE quantizer: `train_ivfpq` rides
the full-dim k-means as a `sub = -1` lane of the fused subspace
frame, so one corpus pass per Lloyd iteration now trains coarse AND
all m codebooks (bit-identical to the separate trainers,
pytest-locked incl. n_cells != pq_cells; end-to-end `ivf_pq_topk`
8.25 → 7.53 s at page-cached sf0.1, structurally half the training
scans where a pass is real I/O). Search walls on this host vary up
to 3× run-to-run with JVM warm-up while every rank and recall is
bit-identical — the exact-integer contract is what holds, wall
medians are indicative.

The hot cluster does not hurt PQ recall the way it hurts IVF probe
cost: ADC error comes from quantization, not cell skew, so the 0.92
recall holds on the corpus whose hot cell held 33% of all vectors.
The two knobs compose independently at 100 TB — n_probe/n_cells cuts
the fraction of the corpus scanned, m×codes cuts the bytes per
scanned candidate 64×, and both indexes train once per corpus
(`codebooks=`/`centroids=` are accepted precomputed, same as IVF).

IVFADC index-build shape (r8 rewrite): the coarse candidates
(sub = -1, every centroid) union with the subspace candidates into
one frame and a single groupBy(vid) takes every argmin at once
(conditional min(when(sub == s, struct(dist, cid))) per slot,
map-side combined) — the codes are born carrying their inverted
cell. Plan: zero SortMergeJoins anywhere on the ann_topk path (was 1
corpus-sized codes⋈cells join), Exchange count 5 → 2 on
ann_ivf_pq_topk, and the one remaining index shuffle carries a
single (1+m)-struct row per vector. Two rejected alternatives,
measured: the original codes⋈assigned join (SMJ over two
corpus-sized frames — real IVFADC stores code lists inside cells,
so the query path should never pay that join), and an in-row
argmin over an n_cells struct array (interpreted higher-order
functions evaluated per row measured 3× this shape's wall).

## AllPairs exact-Jaccard and Misra-Gries stress — prune factors

Measured 2026-08-15 (round 8) on the sf0.1 documents table (5,000
docs, trigram shingle sets, threshold 3/5):

| measurement | value |
|---|---|
| all-pairs universe | 12,497,500 pairs |
| prefix-join candidates (rarest-first order) | 299,377 (41.7× cut) |
| + PPJoin length & positional filters | 68,818 (182× total cut) |
| qualifying pairs (exact verify) | 256 |
| prefix rows emitted / total set rows | 107,191 / 260,388 (41% ≈ 1−t) |
| wall: string form → hash space → checkpointed → PPJoin filters | 22.1s → 13.2s → 10.2s → 4.0s |

The string→hash rewrite moved the whole join into arithmetic
xxhash64 space (curation's position-rotated-XOR n-grams): the
string shingle build alone was 8.9s of the 22.1s, and the verify's
array_intersect now compares longs. Checkpointing the set and prefix
tables (each feeds 2-3 consumers — the LSH bucket-table precedent)
cut the remaining recomputes to 10.2s, and the PPJoin length +
positional filters (provably safe: a qualifying pair's smallest
common token is in both prefixes and always passes them) cut the
verify's broadcast set 4.3× more, landing at 4.0s. The raw-string DuckDB oracle
stays byte-faithful, so a hash collision in a fixture would
hash-mismatch the row (contamination_flags' convention).

Misra-Gries frequent items, same corpus (260,704 trigram
occurrences, 27,213 distinct, 32 round-robin partitions — the
worst case for map-side combine: per-partition rows are nearly all
distinct, so an exact GROUP BY shuffles all 260,704 rows):

| capacity | sketch rows shuffled | vs exact group-by |
|---|---|---|
| 2,048 (< per-partition distinct) | 32 | 8,147× fewer |
| 10,000 (> per-partition distinct ≈ 8,147) | 260,736 | none — sketch never decrements |

On the 27k-doc boilerplate corpus (1,377,520 trigram occurrences,
32,945 distinct, 32 partitions): the sketch shuffles 144,818 rows
(decrements engage — per-partition distinct exceeds capacity), finds
exactly the 28 true heavy hitters (== GROUP BY/HAVING, match
asserted), and 93% of them are the boilerplate-core trigrams — the
curation signal the operator exists to surface. At this corpus size
the exact GROUP BY is still cheaper (1.1s vs 2.5s); the sketch's
bounded-shuffle contract is the 100 TB insurance, not a local win.

The shuffle is Σ_p min(distinct_p, ~capacity): the win appears
exactly when per-partition distinct exceeds capacity — the 100 TB
heavy-tail shape (billions of distinct n-grams per task, capacity
10⁴), not the 27k-distinct fixture. The scored row keeps
capacity 10,000 because its den=5,000 guarantee needs
2·den <= capacity; the EXACT output is identical at any capacity
satisfying that bound (partitioning-independence is pytest-locked).

AllPairs exact join on the dedup stress corpus (27,000 docs incl. the
2,000-doc boilerplate family of 3 near-identical cores — the clique
shape that makes "emit every pair >= t" inherently quadratic in
cluster size):

| run | qualifying pairs | wall (s) | non-clique recall |
|---|---|---|---|
| exact (default) | 2,055,400 (97% = the 3 boilerplate cliques) | 20.4 | 1.0 |
| `max_prefix_bucket=64` | 63,813 | 14.3 | **1.0** (all 56,400 signal pairs kept) |

The cap removes only within-clique pairs — members a downstream
duplicate_clusters collapses into one component from the surviving
pairs anyway — while every pair with a non-boilerplate member
survives. Same trade as the LSH stop-bucket cap, now measured for the
exact join: at 100 TB the cap bounds the one quadratic term (clique
output), and the exactness guarantee holds for everything outside
flooded prefix buckets.

## Retrieval scale stress — stop-term posting lists and the probe guard

`tools/retrieval_scale_stress.py`, measured 2026-08-14 (round 4) on
local[32]: 50,000 docs = sf0.1 documents ×10, every copy suffixed with
a universal boilerplate sentence — the crawl shape where a handful of
terms appear in ~100% of documents. Inverted index: 1,662,310 postings.

| BM25 probe | postings touched | wall (s) | rows |
|---|---|---|---|
| discriminative query (3 terms) | 116,000 (7.0%) | 6.95* | 10 |
| + 5 stop terms, unguarded | 316,000 (19.0%) | 4.22 | 10 |
| + 5 stop terms, `max_df_frac=0.9` | 116,000 (7.0%) | 3.89 | 10 |

(*first run carries the index-build JIT; the comparison rows run warm.)
The guarded top-10 is IDENTICAL to the unguarded one (overlap 10/10):
terms in ~100% of documents have idf ≈ ln(1 + 0.5/N) ≈ 0, so their
posting lists — 50,000 rows EACH here, the whole corpus at any scale —
flow through the scoring join and then contribute nothing. The
probe-side `max_df_frac` filter removes them before the join at zero
cost (it runs on the tiny query×term table), which is the difference
between "scoring touches the query's postings" being a real bound and
a vacuous one. Caveat measured the other way first: with the guard at
0.5 on THIS synthetic corpus every query term dropped (the shared
fixture vocabulary puts ordinary words in ~77% of docs) and the query
returned empty — the guard is a stop-TERM filter, not a relevance
filter, so production thresholds belong at 0.8–0.95.

Same 50k corpus: bigram-LM cross-entropy scores all docs in 10.9s
(model join keyed on bigrams — vocab² bounded); BPE encodes 3.21M
tokens in 3.5s (~0.9–1.2M tokens/s on local[32], per-batch word memo
doing the heavy lifting on the repeated boilerplate).

**Persisted inverted index (round 10)** — same 50k corpus, same tool:
`build_bm25_index` writes the 1.66M postings term-range-clustered into
64 requested shards (41 non-empty) with zone maps + a bloom sidecar on
`term` in 8.4s; the 3-term discriminative search through
`bm25_topk_indexed` then opens **3 of 41 postings files** (bloom
set-probe candidates) and returns the BIT-IDENTICAL top-10 in 3.6s vs
5.6s for the per-call build — and the per-call path re-tokenizes the
whole corpus every query, so the gap is the corpus scan itself, which
at 100 TB is the difference between a search engine and a batch job.
The skip ratio grows with file count (candidates are bounded by
terms × bloom fpp, files by corpus size); staleness is fail-safe:
files appended after the sidecar refresh are always candidates.

**LSM streaming window (round 10)** — same tool, same corpus: a
2,000-doc maintenance batch upserted into the term-clustered MAIN
segment costs **2.0s** (the keyed probe cannot be file-pruned on a
term layout, so it scans the index key column — linear in index size
by construction) vs **0.53s** into the bounded DELTA segment
(O(batch), the shipped design). The LSM-view search (main minus
delta-superseded docs, plus delta) returns the IDENTICAL top-10 as a
per-call build over the union corpus; `compact_bm25_index` folds the
delta in 3.3s (ints-only, corpus never touched) and the post-fold
search is again pure main-segment file skipping. At 100 TB the 3.8×
measured gap is the difference between a per-trigger index scan and a
bounded-window apply.

## Same-host bench control — round 10 vs round 9

r9 tip (`0d68426`) cloned clean to /tmp and benched back-to-back with
the r10 tree on the same idle host (2026-08-15): common 92 queries
**116.8s → 113.9s = 0.98×, zero regressions at a 1.15× threshold**
(the `_bm25_rank` shared-core refactor is plan-neutral: bm25_topk_docs
1.75s → 1.92s, within noise). The r9-committed 107.2s vs today's
113.9s is host drift — the r9 tip itself measures 116.8s on today's
machine.

## SPARK_GRAFT_FAST_HASH production path (measured round 3)

The md5-based 60-bit hash is pinned wherever the DuckDB oracle must
reproduce values (sampling membership, MinHash signatures, winnowing
fingerprints); `SPARK_GRAFT_FAST_HASH=1` switches eligible operators to
codegen-native xxhash64 in production. Median-of-3 at sf0.1, local[32]:
`winnow_fingerprints` 3.34s → 2.14s (md5-per-char-gram dominates its
cost), `simhash60` 1.60s → 1.46s, `dedup_minhash_lsh_capped` ~flat at
1.0-1.2s (hashing no longer dominant there after the universal-hash
family rework). Oracle-gated queries always run the md5 path.

## curate_corpus staging durability (round 5)

`curate_corpus(staging_path=...)` replaces the default
`localCheckpoint` stage pinning with a parquet write + re-read at every
stage boundary. The trade, measured on the pipeline test corpus and
reasoned at scale:

- **localCheckpoint** (default): blocks lineage but stores stage state
  on executor memory/disk. Fast on a healthy cluster, but an executor
  loss silently replays the entire upstream pipeline for the lost
  partitions, and at 100 TB a multi-hour near-dedup stage replay is the
  difference between a blip and a missed SLA. Each stage count is a
  separate job against the checkpointed frame.
- **staging_path** (production form): one write job per stage; the
  re-read frame's lineage is a bare parquet scan, so ANY later failure
  — or a deliberate restart — resumes from the last boundary directory
  instead of recomputing. Stage counts become metadata-only footer
  reads (Catalyst serves count() on a bare scan without touching data).
  The boundary directories are also the pipeline's audit artifact: each
  stage's kept set is inspectable parquet, the same durable-temp-table
  pattern the reference uses for merge batches
  (incremental_partition_merge.sql:77-83).

Kept-set equality between the two paths is pinned by
tests/test_pipelines.py::test_curate_corpus_staging_path_identical_kept_set.

## BPE merge learning at production vocab sizes (round 5)

`learn_merges` now maintains pair counts INCREMENTALLY (inverted
pair→words index; a merge touches only the words containing the merged
pair) with a lazy-deletion heap for best-pair selection (every count
change pushes a fresh entry; stale entries discard at pop). Measured on
a 50k-word Zipf vocabulary (driver-side, single core):

| merges | naive full-recount | incremental+heap |
|---|---|---|
| 512 | 93.6s | 17.4s |
| 4,096 | ~749s (extrapolated; >900s measured timeout) | 24.0s |
| 32,768 | ~6,000s extrapolated | **30.3s** |

The curve is the story: cost is dominated by the first few hundred
merges (the top pairs live in tens of thousands of words and every
touched word rewrites once); after that each merge touches a shrinking
word set, so 512 → 32,768 merges adds only ~13s. A production 32–64k
vocabulary is now a half-minute driver step instead of a stalled loop.
Merge-list equality with the naive reference is pinned by a hypothesis
property test (duplicate words, overlapping pairs, count ties).

## Incremental semantic-dedup store (round 5)

`run_incremental_semantic_dedup` measured on a 50k-vector 64-dim
synthetic corpus (local[32], n_cells=64, threshold=0.95), 5 batches of
10k fresh vectors + 2k near-clones of already-admitted content each:

| batch | in | admitted | store after | wall |
|---|---|---|---|---|
| 0 (seeds centroids) | 10,000 | 10,000 | 10,000 | 23.5s |
| 1 | 12,000 | 10,000 | 20,000 | 14.4s |
| 2 | 12,000 | 10,000 | 30,000 | 19.7s |
| 3 | 12,000 | 10,000 | 40,000 | 19.3s |
| 4 | 12,000 | 10,000 | 50,000 | 29.0s |

Every clone is rejected, every fresh vector admitted, and per-batch
wall grows with store-cell occupancy (the batch-vs-store within-cell
join — linear in stored vectors per touched cell), not with corpus
history replay. The sizing rule is the IVF convention: n_cells ∝ √N
keeps per-cell occupancy bounded; when hot cells outgrow it, retrain
centroids and rebuild the store (an explicit reindex — frozen
centroids are what keep old and new vectors comparable in between).

## Relational scale stress — x10 facts, join mix pinned (round 6)

`tools/relational_scale_stress.py`, measured 2026-08-14 on local[32]:
orders and lineitem multiplied x10 (~6M lineitem rows) with key-shifted
replica orders (each replica keeps its own lineitems — per-order join
cardinality unchanged, customer/supplier fan-out grows x10, the
facts-grow-dims-don't warehouse shape), dimensions untouched. The five
most expensive scored relational queries:

| query | 1x wall | 10x wall | ratio | AQE-final joins (both scales) |
|---|---|---|---|---|
| q21_waiting_supplier | 7.0s | 8.5s | 1.21 | 4 BHJ + 1 SMJ |
| q2_min_cost_supplier | 2.7s | 3.9s | 1.46 | 7 BHJ + 1 SMJ |
| q18_large_volume | 2.1s | 5.1s | 2.39 | 3 BHJ |
| q9_product_profit | 1.2s | 2.0s | 1.71 | 4 BHJ |
| q3_top_orders | 1.1s | 2.1s | 1.85 | 2 BHJ |

Two claims this measures: (1) wall grows strongly SUBLINEARLY in data
size (1.2-2.4x for 10x rows — fixed per-query overhead still dominates
at this scale, and the shuffles that do grow are the fact-fact ones
that AQE coalesces); (2) the join strategy mix is byte-identical at
both scales — every dimension join stays a BroadcastHashJoin (dims
didn't grow, and the explicit F.broadcast hints pin them regardless of
size estimates drifting), and the only SMJs are the q21/q2 fact-fact
self-joins, which are exactly the joins that SHOULD shuffle at scale.
No BHJ silently flipped to SMJ, no plan went nested-loop. q18's 2.39x
is the honest outlier: its result set itself grows 10x (per-order
aggregate over replicated orders), so its extra wall is output-bound,
not plan degradation.

## Edit-distance linkage: enumerated vs collapsed (round 6)

First sf0.1 bench of `name_linkage_pairs` (the oracle-replayable
enumerate-every-pair form) measured 31.6s — ALL of its 3.12M candidate
pairs are distance-0 exact-name cliques over 64 distinct strings, the
O(m²)-per-repeated-value blowup the docstring warns about.
`name_linkage_collapsed` (distinct-string pre-collapse + typo-injected
corpus so the gate has real distance-1 pairs) runs the same blocked
join bounded by distinct-value count²: **0.72s at sf0.1 — 44x** — and
is the benched production path, the same split as
dedup_minhash_lsh vs _capped. Exact cliques come from
exact_duplicate_groups (one hash shuffle); they never belong in a pair
join.

## Round-5 bench context: host drift, measured

Absolute sf0.1 timings moved ~1.19x between the round-4 artifact and
every round-5 run — including queries whose code did not change. To
separate host from code, the round-4 tip (commit 3ae8e19) was re-benched
on the round-5 machine:

| run | total (74-query comparable set) |
|---|---|
| BENCH_r04.json (driver, round-4 host) | 67.8s |
| round-4 CODE on round-5 host | 80.7s |
| round-5 code on round-5 host | 82.4s |

Same-host code ratio: **1.02** (worst single query 1.18x — noise
band), with 6 genuinely new benched queries added. Round-over-round
bench comparisons are only meaningful same-host; the re-bench recipe is
in CLAUDE.md.

## Perceptual media dedup stress (round 5)

5,250 real 64x64 PNGs (pseudo-random RGB content; 250 planted
brightness-perturbed near-duplicates), local[32]:

| stage | wall |
|---|---|
| Arrow hash pass (stdlib PNG decode + dHash/aHash, all 5,250 decoded) | 6.0s (~875 img/s) |
| banded-Hamming pair stage (bands=4, max_hamming=3) | 2.9s |

Found pairs = exactly the 250 planted near-dups (recall 1.000, zero
false pairs — dHash distance 0 under the +4 brightness shift, unrelated
pseudo-random images all beyond the verify threshold). Python-side
per-scanline PNG decode dominates the hash pass; a production codec
injected via the decode hook moves that ~linearly while the blocking
join shape is unchanged.

## PageRank scale stress — one shuffle per round, node-sided joins

`tools/pagerank_scale_stress.py`, measured 2026-08-14 (round 7) on
local[32], sf0.1 purchase graph (1.17M edges / 16.0k nodes) vs x10
disjoint-replica growth (11.7M edges / 160.0k nodes; every node keeps
its degree — the onboard-10-markets shape), 8 exact-integer rounds:

| scale | edges | wall s | s/iter | shuffle-write MB | SMJ | BHJ | shuffles/round |
|---|---|---|---|---|---|---|---|
| 1x | 1,173,742 | 10.67 | 1.33 | 47.2 | 0 | 24 | 1 |
| 10x | 11,737,420 | 35.48 | 4.44 | 747.8 | 0 | 24 | 1 |

x10 edges cost x3.3 wall. Every round's AQE-FINAL plan (captured via
pagerank_int's plan_probe) holds the invariants the 100 TB design
demands: the rank, out-degree and incoming-sum joins are all
BroadcastHashJoin (node-sized build sides, 3 BHJ x 8 rounds, zero
SortMergeJoin) and exactly ONE hashpartitioning exchange per round —
the contributions-by-dst aggregation, the irreducible shuffle.
Round 7 made this explicit: without broadcast hints AQE planned SMJ
first and only converted at runtime, by which point the EDGE LIST had
been shuffle-written every round; pagerank_int now pins the hints
(broadcast_nodes=True, opt-out for >10^8-node graphs where ranks
outgrow executor memory and bucketed edges are the right tool).
Shuffle bytes track the edge count (the contributions stream), not
the node count — rank state never re-shuffles.

## Zone-map scale measurement — footer harvest and file skipping

Measured 2026-08-14 (round 7) on local[32], the CDC-stress table shape
(64 day-partitions x 32 tasks per 100k-row append):

| metric | value |
|---|---|
| harvest 10,240 files (driver footer reads, zero data bytes) | 0.75 s (13,605 files/s) |
| sidecar size at 10,240 files | 1.1 MiB |
| incremental refresh after one append (2,048 new files) | 0.34 s |
| prune for one append's k-range | 256 / 12,288 files kept (48x) |
| pruned read + exact predicate vs full read (same rows) | 2.49 s vs 6.63 s |

Harvest is O(new files) and embarrassingly cheap relative to the write
that produced those files; the prune read's 2.7x (not 48x) reflects
footer-dominated tiny files — on production-sized files the win tracks
the file ratio. At 100 TB the sidecar (~110 B/file) stays MB-scale per
million files and, unlike Spark's own row-group skipping, prunes
BEFORE any footer is opened. Stale/missing stats always fail safe
(file kept), so the refresh can lag writes without correctness risk —
the Runner's zone_map_columns keeps it current per write anyway.

Round 8 replaced the monolithic-JSON sidecar with per-refresh parquet
delta shards + an mtime-fingerprinted in-memory index (the
snapshot-manifest model applied to zone maps) and re-measured at 100k
files (tools/zonemap_scale_stress.py):

| metric (100,100 files) | value |
|---|---|
| initial build — footer harvest fanned out over Spark executors | 3.0 s (vs ~7.5 s projected for the r7 sequential driver loop) |
| incremental refresh (+100 files) | 0.73 s — one O(delta) shard appended, existing shards untouched |
| first prune after a refresh (one-time shard parse) | 0.69 s |
| steady-state prune (fingerprint-validated cached index) | 138 ms |
| files kept for a 5k-key range probe | 6 / 100,100 |
| sidecar size | 1.7 MiB in 2 shards |

The steady-state 138 ms is the live-file LISTING (os.walk of 100k
entries — the fail-safe live-set intersection every pruner performs,
the same class of cost as Spark's own InMemoryFileIndex listing), not
metadata parse: the shard index is cache-validated by O(#shards) stat
calls. A drop-containing refresh consolidates to one shard from
retained METADATA rows (no footer re-reads); read_where shares one
listing across all of its per-column prunes. At million-file scale the
listing itself moves behind the snapshot manifest (already
incremental, r7) — the zone-map metadata path no longer grows with
table age.

## Bloom-sidecar scale measurement — equality skipping where min/max can't

Measured 2026-08-14 (round 7) on local[32]: 40.96M rows, 512
hash-distributed files (1.5 GiB), uid a unique string key — the shape
where zone maps prune NOTHING (every file spans the full domain).
`refresh_bloom_sidecar(m_bits=2^20, k=7)`, the 10-bits/value sizing
for ~80k rows/file:

| metric | value |
|---|---|
| initial build (one distributed scan + bit_or shuffle) | 36.7 s (1.1M rows/s) |
| sidecar size | 81 MiB (5.3% of table — the honest 10-bit/value bloom budget) |
| incremental refresh after a 1-file append | 0.52 s |
| probe latency (hash job + word-indexed duckdb read) | ~0.3 s flat |
| files kept, present value (avg of 20) | 2.05 / 512 (250x) |
| files kept, absent value (avg of 20) | 1.15 / 512 (~0.2% fpp, matching (1-e^(-kn/m))^k) |

The build never assembles a bitset driver-side — filters live as
sparse (file, col, word, bits) rows written word-sorted, so a probe's
`word IN (<=7)` read touches only matching row groups; undersizing to
m=2^19 was measured to degrade exactly as theory predicts (5.2% fpp,
27/512 kept), so the sizing rule is load-bearing and documented. On a
page-cached 1.5 GiB local table the pruned read's wall-clock ties the
full scan (0.54 s vs 0.49 s — 32 threads hide the scan, and the probe
costs a flat 0.3 s); the production win is files OPENED (512 -> ~2),
which on an object store at 100 TB is the dominant cost. False
negatives are structurally impossible: unindexed files and unindexed
columns are always kept, and paths that would URL-encode in
input_file_name() are refused at build time rather than silently
drifting the sidecar keys.

## Z-order optimize scale measurement — multi-dim skipping from a one-time rewrite

Measured 2026-08-14 (round 7) on local[32]: 40.96M rows / 256
hash-scattered files (both dimensions uniform over 0..100k — the
worst case: every file spans the full domain on every column), then
`optimize_layout(cluster_by=["x","y"], buckets=64)` (quantile-bucketed
Morton interleave, range-repartitioned rewrite), zone maps refreshed
by the call itself:

| metric | before | after |
|---|---|---|
| files kept for x IN [0, 6250] (1/16 range) | 256 / 256 | 37 / 271 |
| files kept for y IN [0, 6250] | 256 / 256 | 34 / 271 |
| files kept for the 2-dim box (intersection, read_where) | 256 | **4 (64x)** |
| box-query wall (count, exact predicate) | 2.55 s | **0.33 s (7.7x)** |

optimize_layout cost 64.3 s once (scan + range shuffle + rewrite +
zone-map re-harvest), i.e. ~25x the full box query — it pays for
itself after a few dozen reads, the standard OPTIMIZE ZORDER
trade. Both dimensions prune simultaneously because file ranges are
Morton-bucket ranges, not lexicographic (a plain sort would prune x
only); row counts match the full scan exactly (superset contract, the
exact predicate is always re-applied). At 100 TB the same rewrite is
per-partition (dynamic partition overwrite, root sidecars untouched)
and the bucket boundaries come from one approxQuantile pass shared
across partitions.

## CDC scale stress — read_changes costs O(delta), not O(table)

`tools/cdc_scale_stress.py`, measured 2026-08-14 (round 7) on
local[32]: a day-partitioned table (64 partitions) grown by repeated
100k-row appends — each append lays down 2,048 files (32 tasks x 64
partitions), the incremental-warehouse small-file churn pattern. A
snapshot is taken, one more batch appended, a head snapshot pins the
delta (the run_cdc_refresh read shape), and the changed-file read is
measured at two table scales ~8x apart — data AND metadata:

| table files | full-read s | delta rows | delta files | delta-read s | manifest KiB | chain KiB | chain ms |
|---|---|---|---|---|---|---|---|
| 10,240 | 4.42 | 100,000 | 2,048 | 0.79 | 890.4 | 178.4 | 1.0 |
| 83,968 | 29.28 | 100,000 | 2,048 | 0.87 | 7,298.4 | 178.4 | 1.3 |

Table grew 8.2x in files; the full-table scan grew 6.6x; the delta
read stayed ~flat (1.1x), scanning exactly the 2,048 added files both
times. Metadata is O(delta) too (round 7): the pinned read resolves
its file list from the per-snapshot delta.json chain — 178.4 KiB
parsed at BOTH scales (1.0x, ~1 ms walk) while the monolithic
manifest a full diff would parse grew 8.2x to 7.3 MB. At 100 TB
(millions of files) a nightly run_cdc_refresh therefore reads the
night's files with delta-sized metadata; the full manifest remains
only the restore/time-travel surface and the broken-chain fallback.
The same run shows WHY compaction matters alongside CDC: 2,048 files
per 100k-row batch is footer-dominated, and compact() (which re-emits
survivors into the next delta, documented) restores scan shape.

## Merge-on-read delete vectors: sparse DELETE vs copy-on-write

`tools/delete_scale_stress.py`, measured 2026-08-15 (round 8) on
local[32]: an 8M-row, 64-day-partitioned, 4,096-file table.

| rows | files | full read s | delete 0.1% s | sidecar KiB | masked read s | CoW rewrite s |
|---|---|---|---|---|---|---|
| 8,000,000 | 4,096 | 3.40 | 3.36 | 25.5 | 2.91 | 22.06 |

A 0.1%-selective `delete_where` (8,000 rows across every partition)
costs one predicate scan + a 25.5 KiB positional sidecar — 3.2–6.6x
cheaper than the copy-on-write rewrite of the same table across two
same-day runs (10.4 s / 22.1 s; host-noise bounds), and the gap is
structural: merge-on-read is O(scan + deleted rows) while CoW is
O(table), so at 100 TB the ratio is the table-to-delta size ratio.
The masked read's anti join costs nothing measurable (2.91 s masked
vs 3.40 s unmasked — within host noise) because the delete side
broadcasts and the mask rides the scan stage. The heavy case holds
too: deleting 10% (799,199 rows, 1.28 MiB sidecar) reads at 3.74 s
broadcast / 3.29 s with the threshold forced to the plain-join
fallback a 100 GB sidecar would take — both paths stay scan-shaped,
no per-position driver work anywhere. Folding back in is
partition-scoped: a one-day delete (62,497 rows) applied in 1.7 s
rewriting exactly 1/64 partitions (96 files changed), leaving 63
partitions' files untouched — the rewrite-only-what-changed contract
the partition merge already has, now for row-level deletes.

## Replica sync off the changelog: delta vs rebuild

`tools/replica_scale_stress.py`, measured 2026-08-15 (round 8) on
local[32]: an 8M-row, 64-day, 4,096-file source mirrored by
`run_replica_sync` (keys=id).

| source rows | full sync s | window | delta sync s | rows written |
|---|---|---|---|---|
| 8,000,000 | 11.89 (writes 8M rows) | uniform-sparse: 116,002 keys / 108,001 ins | 16.03 | 108k |
| | | one-day local: 74,875 keys / 12,378 ins | 3.97 | 12k |

The LOCALIZED window (all DML inside one day — late data, range
corrections, the common incremental shape) syncs in 4.0 s vs the
11.9 s rebuild while writing 12k rows instead of 8M. The
UNIFORM-SPARSE window is the honest worst case: a 0.1% delete
scattered over every file makes the changelog's deleted-row side
scan every affected file, so at toy scale its wall (16.0 s) exceeds
the rebuild — but it still writes 74x fewer rows (108k vs 8M), and
at 100 TB the write amplification, not the scan, is the bill: a
rebuild rewrites the table, the sync ships the window. Profiling
this case drove two real fixes: (1) an 8k-row `update_where`
re-append was fanning into ~4k tasks-x-partitions files and charging
the NEXT incremental read 6.4 s of footer time — the rewrite (and
the replica's landing append) now coalesce to their row count
(25.7 -> 19.1 s); (2) the sync consumed the changelog through a
full-row materialization although the delete side only needs KEYS —
reading the two sides separately and selecting keys before the
checkpoint lets Catalyst prune the affected-file scan to the key
columns (19.1 -> 16.0 s sparse, 5.2 -> 4.0 s local).

Round 9 re-run (same tool, same host class, after the atomic-txn DML
commit landed): full 12.2-15.3 s, uniform-sparse 17.9-19.7 s, one-day
local 4.8-5.5 s across three runs — the pending-marker transaction
machinery costs nothing measurable on the data path. The ATOMIC keyed
upsert (SQL MERGE / replica apply core; 100k-row batch masking 38.5k
keys + inserting the rest into the 8M-row/4k-file table) lands in
5.8 s as ONE transaction (delete_scale_stress UPSERT row) — the
staging + rename + marker-flip commit adds only directory operations
over the delete+append work it replaces. The STREAMING replica twin
(stream_replica_sync, same 8M source) drains the full baseline in
26.8 s and a 2k-delete + 80-update + content-hash-fold delta window
in 17.4 s — same order as the batch sync; the premium is the file
stream's own listing/checkpoint machinery plus the per-batch
content-hash delete fold, bought for continuous operation.

## Same-host bench control (round 9 end)

The r8 tip (0e3e4ef) cloned to /tmp and benched on the same idle host
immediately before the r9 tip's own run: common 92 queries
**105.4 s -> 93.1 s = 0.88x, zero regressions at the 1.15x
threshold** — the round's txn machinery, pending-aware read paths and
probe tiers cost nothing on the scored set, and the common set got
measurably faster.

## Sparse-key probe: bloom set-probe file pruning (round 9)

Same stress, new section: a 2,000-key purge window against a
bloom-indexed replica (`Warehouse.bloom_candidate_files` — the
distributed SET probe `delete_matching`/`run_replica_sync` now use).

| window | files opened | delta sync s |
|---|---|---|
| sparse-key, bloom-pruned | 2 / 3,347 | 8.9 (index build 12.9) |
| sparse-key, no index | 3,347 / 3,347 (full key-column scan) | 5.0 |

The prune is a 1,674x SCAN cut; at toy scale (2.4k-row files on
local disk) the probe's ~4 s of fixed job latency exceeds the saved
scan, which is why `BLOOM_PROBE_MIN_FILES` gates the probe and the
claim is scan-proportionality, not local wall: at 100 TB the same
probe opens 2 files instead of 3,347 x ~100 MB. Sizing matters for
SET probes — per-(key,file) fpp must be well under
1/(|probe| x n_files): 1<<16 bits/file (fpp 3e-5) produced 535
false-candidate files for this probe; 1<<18 (fpp ~4e-9) is exact;
oversizing to 1<<23 blew the sidecar to 56M rows and the index
build to 60 s. The probe plan itself is scale-flat: the sidecar
scan is semi-joined down to the probe's needed words (bounded by
min(|values| x k, m/64)) before any shuffle — the unfiltered form
re-shuffled the whole 56M-row sidecar per probe (19 s); the
filtered form is bounded by the probe's word footprint.
"""


if __name__ == "__main__":
    main()
