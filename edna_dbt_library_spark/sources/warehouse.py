"""Path-based parquet warehouse: the engine's storage layer.

The reference delegates storage to BigQuery datasets/tables
(``project.dataset.table``); here a relation is ``schema.table`` mapped to
``<root>/<schema>/<table>/`` holding partitioned parquet plus a small
``_edna_meta.json`` sidecar recording the table's partition/cluster spec
(the information BigQuery keeps in table metadata,
reference: macros/materialization/incremental_partition_merge.sql:29-37).

Scale notes
-----------
* Writes are date-partitioned (`partitionBy(day)`), so incremental reads and
  the partition-merge operator prune at the directory level — the parquet
  analogue of BigQuery DAY partitioning + require_partition_filter.
* ``overwrite_partitions`` relies on Spark's *dynamic* partition overwrite:
  only partitions present in the batch are replaced; the other N thousand
  partitions of a 100 TB table are untouched.
* ``cluster_by`` maps to ``sortWithinPartitions`` before write — min/max
  parquet stats then give file-level skipping on clustered columns (the
  BigQuery clustering analogue).
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import shutil
import sys
import time
import uuid
import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_FILE = "_edna_meta.json"


class InjectedCrash(BaseException):
    """Crash-injection for the DML atomicity tests: BaseException so the
    in-process abort cleanup does NOT run — exactly like a kill -9."""


def _is_pending_file(basename: str, pending: list[str]) -> bool:
    """True when ``basename`` belongs to an uncommitted transaction."""
    return basename.startswith("txn-") and any(
        basename.startswith(f"txn-{t}-") for t in pending
    )


def _is_hidden(name: str) -> bool:
    """Spark's file-index hiding rule: `_`/`.`-prefixed entries are
    metadata/sidecars UNLESS they contain '=' — a partition directory
    for an underscore-named column (`_pdate=2024-01-01`) is DATA. Every
    warehouse walk must use this exact rule or `_pdate`-partitioned
    tables silently lose their data dirs (caught by the r6 snapshot
    walk: it pruned every partition of a _pdate table to zero files)."""
    return name.startswith(("_", ".")) and "=" not in name


def _zm_stat_value(v):
    """Comparable/JSON-safe stat normalization. Dates/timestamps become
    ISO strings (lexicographic order == chronological, so pruning bounds
    are passed in the same form); bytes must decode as STRICT utf-8 — a
    lossy decode is not order-preserving against raw byte order, so
    undecodable binary stats become None (= never prune)."""
    import datetime as _dt
    import decimal as _decimal

    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (_dt.date, _dt.datetime)):
        return v.isoformat()
    if isinstance(v, _decimal.Decimal):
        return float(v)
    return v


def _zm_encode(v) -> tuple[str, str]:
    """typed stat -> (kind, string) shard cell. Exact roundtrip: ints via
    str(), floats via repr() (shortest roundtripping form), strings as-is."""
    if isinstance(v, bool):
        return "int", str(int(v))
    if isinstance(v, int):
        return "int", str(v)
    if isinstance(v, float):
        return "float", repr(v)
    return "str", str(v)


def _zm_encode_stat(st) -> tuple[str, str, str]:
    """(lo, hi) | None -> (kind, lo_str, hi_str)."""
    if st is None:
        return "none", "", ""
    lo, hi = st
    k, ls = _zm_encode(lo)
    _, hs = _zm_encode(hi)
    return k, ls, hs


def _zm_decode(kind: str, s: str):
    if kind == "int":
        return int(s)
    if kind == "float":
        return float(s)
    return s


def _zm_harvest_file(base: str, relp: str, columns: list[str]) -> list[tuple]:
    """Footer-only stat harvest for one data file -> encoded shard rows
    (file, col, kind, lo, hi). Module-level (not a method) so the Spark
    executor-side harvest closure serializes without the Warehouse."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(base, relp)).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = []
    for c in columns:
        i = names.get(c)
        lo = hi = None
        ok = i is not None
        for rg in range(md.num_row_groups if ok else 0):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = _zm_stat_value(st.min), _zm_stat_value(st.max)
            if mn is None or mx is None:  # undecodable binary stat
                ok = False
                break
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        # kind 'none' = "no usable stats, never prune this file on c"
        stat = (lo, hi) if ok and lo is not None else None
        out.append((relp, c, *_zm_encode_stat(stat)))
    return out


@dataclass(frozen=True)
class Relation:
    """database.schema.identifier triple (reference: log_helpers.sql:2-18
    uses BigQuery project/dataset/table). ``database`` is the warehouse
    root; schema/identifier are directory levels."""

    schema: str
    identifier: str
    database: str = "warehouse"

    @property
    def table_id(self) -> str:
        return f"{self.database}.{self.schema}.{self.identifier}"


@dataclass
class TableMeta:
    partition_by: str | None = None  # column holding the DAY partition date
    partition_source: str | None = None  # timestamp column the date derives from
    cluster_by: list[str] = field(default_factory=list)
    schema_json: str | None = None
    schema_evolved: bool = False  # files with heterogeneous schemas present
    # grants/docs carried through the runner (reference:
    # incremental_log.sql:27,161-166 apply_grants/persist_docs). Parquet
    # paths have no ACL engine, so the orchestration surface RECORDS them
    # here (and catalog labels) instead of enforcing.
    grants: dict | None = None  # privilege -> [grantees]
    description: str | None = None
    column_descriptions: dict | None = None  # column -> description


class Warehouse:
    """Minimal catalog over a directory tree of parquet tables."""

    # delete sidecars at or below this on-disk size broadcast into the
    # read-side anti join (mask rides the scan stage); larger ones take a
    # plain join and let AQE pick the strategy. Class-level so stress
    # tooling can force the fallback path without building 100 GB.
    BROADCAST_DELETE_BYTES = 64 << 20

    # delete_matching only attempts the bloom set-probe above this live
    # file count: the probe's fixed job latency (~seconds) beats a scan
    # only when there are enough files to skip. Class-level so tests
    # with tiny fixtures can force the probe path.
    BLOOM_PROBE_MIN_FILES = 64

    def __init__(self, spark: SparkSession, root: str, database: str = "warehouse"):
        self.spark = spark
        self.root = root
        self.database = database
        # zone-map index cache: table path -> (shard fingerprint, columns,
        # {file: {col: (lo, hi) | None}}). Invalidated by shard mtimes, so
        # repeated prune_files calls are O(1) metadata, not a re-parse.
        self._zm_cache: dict[str, tuple] = {}
        os.makedirs(root, exist_ok=True)

    # --- paths / existence -------------------------------------------------
    def path(self, rel: Relation) -> str:
        return os.path.join(self.root, rel.schema, rel.identifier)

    def exists(self, rel: Relation) -> bool:
        p = self.path(rel)
        if not os.path.isdir(p):
            return False
        # the meta sidecar marks a created table even when it holds zero
        # rows (a 0-row partitioned write produces no data files at all)
        if os.path.exists(self._meta_path(rel)):
            return True
        for _dirpath, dirs, files in os.walk(p):
            dirs[:] = [d for d in dirs if not _is_hidden(d)]  # sidecars
            if any(f.endswith(".parquet") or f == "_SUCCESS" for f in files):
                return True
        return False

    def relation(self, schema: str, identifier: str) -> Relation:
        return Relation(schema=schema, identifier=identifier, database=self.database)

    # --- metadata sidecar --------------------------------------------------
    def _meta_path(self, rel: Relation) -> str:
        return os.path.join(self.path(rel), META_FILE)

    def write_meta(self, rel: Relation, meta: TableMeta) -> None:
        os.makedirs(self.path(rel), exist_ok=True)
        with open(self._meta_path(rel), "w") as f:
            json.dump(
                {
                    "partition_by": meta.partition_by,
                    "partition_source": meta.partition_source,
                    "cluster_by": meta.cluster_by,
                    "schema_json": meta.schema_json,
                    "schema_evolved": meta.schema_evolved,
                    "grants": meta.grants,
                    "description": meta.description,
                    "column_descriptions": meta.column_descriptions,
                },
                f,
            )

    def read_meta(self, rel: Relation) -> TableMeta:
        try:
            with open(self._meta_path(rel)) as f:
                d = json.load(f)
            return TableMeta(
                partition_by=d.get("partition_by"),
                partition_source=d.get("partition_source"),
                cluster_by=list(d.get("cluster_by") or []),
                schema_json=d.get("schema_json"),
                schema_evolved=bool(d.get("schema_evolved", False)),
                grants=d.get("grants"),
                description=d.get("description"),
                column_descriptions=d.get("column_descriptions"),
            )
        except FileNotFoundError:
            return TableMeta()

    # --- profile baseline sidecar (content-contract gate) -------------------
    # Stored as parquet under an underscore-prefixed directory INSIDE the
    # table path: Spark's file index skips `_`-prefixed entries (the
    # _SUCCESS/_metadata convention), so table reads never see it — same
    # placement contract as the _edna_meta.json sidecar.
    def _profile_path(self, rel: Relation) -> str:
        return os.path.join(self.path(rel), "_edna_profile")

    def write_profile(self, rel: Relation, profile: DataFrame) -> None:
        """Persist a ``profile_columns`` output as the table's drift
        baseline (one row per column — driver-scale however big the
        table is)."""
        os.makedirs(self.path(rel), exist_ok=True)
        profile.coalesce(1).write.mode("overwrite").parquet(self._profile_path(rel))

    def read_profile(self, rel: Relation) -> DataFrame | None:
        """The stored baseline profile, or None when none exists yet."""
        p = self._profile_path(rel)
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)

    # --- zone maps (file-level min/max data skipping) ------------------------
    # Partition pruning only helps on the partition column; zone maps are
    # the Iceberg/Delta answer for every OTHER selective column: per-file
    # min/max harvested from parquet FOOTERS (no data scan) into a
    # `_`-prefixed sidecar, so a range read opens only intersecting files.
    # At 100 TB the win is planning-side too — Spark's own row-group
    # skipping still has to OPEN every footer; the sidecar prunes the
    # file list before any footer is touched.

    def _zonemap_path(self, rel: Relation) -> str:
        """LEGACY v1 monolithic-JSON sidecar path. Still readable (and
        migrated to the sharded layout on the next refresh); new writes
        go to ``_zonemap_dir``."""
        return os.path.join(self.path(rel), "_edna_zonemap.json")

    def _zonemap_dir(self, rel: Relation) -> str:
        """v2 sharded sidecar: per-refresh parquet delta shards
        (file, col, kind, lo, hi) plus a tiny ``_meta.json`` holding the
        column set and shard sequence — the snapshot-manifest /
        bloom-sidecar model applied to zone maps (r7 verdict item #5).
        Refresh metadata cost is O(delta); a drop-containing refresh
        consolidates to one shard; reads hit an mtime-fingerprinted
        in-memory index so steady-state prune cost is O(1) metadata."""
        return os.path.join(self.path(rel), "_edna_zonemap")

    def _zonemap_meta_path(self, rel: Relation) -> str:
        return os.path.join(self._zonemap_dir(rel), "_meta.json")

    @staticmethod
    def _zm_value(v):
        return _zm_stat_value(v)

    def zone_map_columns(self, rel: Relation) -> list | None:
        """The column set the table's zone maps cover (None when no zone
        maps exist) — reads v2 meta, falling back to the legacy v1 JSON."""
        for p in (self._zonemap_meta_path(rel), self._zonemap_path(rel)):
            try:
                with open(p) as f:
                    return json.load(f)["columns"]
            except (FileNotFoundError, json.JSONDecodeError, KeyError):
                continue
        return None

    def _zm_fingerprint(self, rel: Relation) -> tuple | None:
        """Cheap change detector for the sharded sidecar: (name, size,
        mtime_ns) of every shard + the meta file. O(#shards) stat calls."""
        d = self._zonemap_dir(rel)
        try:
            entries = []
            with os.scandir(d) as it:
                for e in it:
                    st = e.stat()
                    entries.append((e.name, st.st_size, st.st_mtime_ns))
            return tuple(sorted(entries))
        except FileNotFoundError:
            return None

    def _zm_load(self, rel: Relation) -> tuple[list | None, dict | None]:
        """(columns, {file: {col: (lo, hi) typed | None}}) — fingerprint-
        cached; falls back to the legacy v1 JSON when no shard dir
        exists. Returns (None, None) when the table has no zone maps."""
        key = self.path(rel)
        fp = self._zm_fingerprint(rel)
        if fp is not None:
            cached = self._zm_cache.get(key)
            if cached is not None and cached[0] == fp:
                return cached[1], cached[2]
            import pyarrow.parquet as _pq

            d = self._zonemap_dir(rel)
            try:
                with open(self._zonemap_meta_path(rel)) as f:
                    columns = json.load(f)["columns"]
            except (FileNotFoundError, json.JSONDecodeError, KeyError):
                return None, None
            index: dict[str, dict] = {}
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                t = _pq.read_table(os.path.join(d, name))
                fs, cs = t.column("file").to_pylist(), t.column("col").to_pylist()
                ks = t.column("kind").to_pylist()
                los, his = t.column("lo").to_pylist(), t.column("hi").to_pylist()
                for fname, c, k, lo, hi in zip(fs, cs, ks, los, his):
                    st = None if k == "none" else (_zm_decode(k, lo), _zm_decode(k, hi))
                    index.setdefault(fname, {})[c] = st
            self._zm_cache[key] = (fp, columns, index)
            return columns, index
        # legacy v1 monolithic JSON
        try:
            with open(self._zonemap_path(rel)) as f:
                zm = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None, None
        index = {
            fname: {c: (None if st is None else tuple(st)) for c, st in stats.items()}
            for fname, stats in zm.get("files", {}).items()
        }
        return zm.get("columns"), index

    def _zm_write_shard(self, rel: Relation, rows: list[tuple], columns: list[str]) -> None:
        """Append one delta shard + rewrite the tiny meta. ``rows`` are
        encoded (file, col, kind, lo, hi) tuples."""
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        d = self._zonemap_dir(rel)
        os.makedirs(d, exist_ok=True)
        try:
            with open(self._zonemap_meta_path(rel)) as f:
                seq = json.load(f).get("seq", 0)
        except (FileNotFoundError, json.JSONDecodeError):
            seq = 0
        if rows:
            cols = list(zip(*rows))
            t = _pa.table(
                {
                    "file": list(cols[0]),
                    "col": list(cols[1]),
                    "kind": list(cols[2]),
                    "lo": list(cols[3]),
                    "hi": list(cols[4]),
                },
                schema=_pa.schema(
                    [(n, _pa.string()) for n in ("file", "col", "kind", "lo", "hi")]
                ),
            )
            _pq.write_table(t, os.path.join(d, f"shard-{seq:06d}.parquet"))
            seq += 1
        with open(self._zonemap_meta_path(rel), "w") as f:
            json.dump({"version": 2, "columns": list(columns), "seq": seq}, f)
        self._zm_cache.pop(self.path(rel), None)

    def refresh_zone_maps(self, rel: Relation, columns: list[str]) -> dict:
        """Incrementally harvest per-file min/max for ``columns``: only
        files NOT already in the sidecar are opened (one footer read
        each — zero data bytes). An append-only refresh writes ONE delta
        shard (O(new files) metadata); dropped files or a changed column
        set consolidate the index into a single fresh shard (metadata
        rows only — retained files' footers are NOT re-read). Large
        harvests (>= 256 new files) fan the footer reads out over Spark
        executors instead of a sequential driver loop."""
        base = self.path(rel)
        live = self._live_data_files(rel)
        prev_cols, index = self._zm_load(rel)
        if prev_cols != list(columns) or index is None:
            index = {}
        live_set = set(live)
        dropped = [f for f in index if f not in live_set]
        added = [f for f in live if f not in index]

        if len(added) >= 256:
            # distributed harvest: footer reads are pure I/O, stats rows
            # are tiny — executors open footers, the driver collects only
            # the encoded stat tuples
            sc = self.spark.sparkContext
            n_slices = max(1, min(len(added) // 32 + 1, sc.defaultParallelism * 4))
            cols_b = list(columns)
            new_rows = (
                sc.parallelize(added, n_slices)
                .flatMap(lambda relp: _zm_harvest_file(base, relp, cols_b))
                .collect()
            )
        else:
            new_rows = [r for relp in added for r in _zm_harvest_file(base, relp, columns)]

        legacy = os.path.exists(self._zonemap_path(rel))
        if dropped or prev_cols != list(columns) or legacy:
            # consolidate: rewrite the whole index as one shard (metadata
            # only), drop old shards + the legacy v1 JSON
            retained = [
                (fname, c, *_zm_encode_stat(st))
                for fname, stats in index.items()
                if fname in live_set
                for c, st in stats.items()
            ]
            shutil.rmtree(self._zonemap_dir(rel), ignore_errors=True)
            if legacy:
                os.remove(self._zonemap_path(rel))
            self._zm_write_shard(rel, retained + new_rows, columns)
        else:
            self._zm_write_shard(rel, new_rows, columns)
        return {"files_total": len(live), "added": len(added), "dropped": len(dropped)}

    def prune_files(
        self, rel: Relation, col: str, lo=None, hi=None, live: list[str] | None = None
    ) -> tuple[list[str], int]:
        """(kept live files, total live files) for a [lo, hi] range on
        ``col`` (None = unbounded on that side). Fail-safe by
        construction: a file missing from the sidecar (stats stale),
        lacking usable stats, or whose stats are not comparable to the
        probe bounds is always kept. ``live`` lets a multi-column caller
        (read_where) share one directory listing across its prunes."""
        lo, hi = self._zm_value(lo), self._zm_value(hi)  # date/ts bounds -> ISO
        if live is None:
            live = self._live_data_files(rel)
        _cols, index = self._zm_load(rel)
        if index is None:
            return live, len(live)
        kept = []
        for relp in live:
            st = index.get(relp, {}).get(col) if relp in index else None
            if st is None:
                kept.append(relp)
                continue
            fmin, fmax = st
            try:
                if (lo is None or fmax >= lo) and (hi is None or fmin <= hi):
                    kept.append(relp)
            except TypeError:  # probe/stat type mismatch: never prune
                kept.append(relp)
        return kept, len(live)

    @staticmethod
    def _probe_values(values_df: DataFrame, col: str) -> DataFrame:
        """Resolve a candidate-file probe frame's value column by NAME:
        a multi-column probe frame whose first column is not ``col``
        must never be trusted positionally — wrong bounds/hashes would
        wrongly prune files and cause missed deletes (ADVICE r9 #3).
        A single-column frame keeps working under any name (the probe
        values need not share the table column's name)."""
        if col in values_df.columns:
            return values_df.select(col)
        if len(values_df.columns) == 1:
            return values_df
        raise ValueError(
            f"probe frame has columns {values_df.columns} but none is "
            f"{col!r}; pass values_df.select({col!r}) or a one-column "
            "frame of probe values"
        )

    def zonemap_candidate_files(
        self,
        rel: Relation,
        col: str,
        values_df: DataFrame,
        live: list[str] | None = None,
    ) -> list[str] | None:
        """Bounding-box SET-probe of the zone-map sidecar: the live
        files whose [min, max] for ``col`` intersects the probe set's
        own [min, max] — one aggregation job on the probe, never a
        collect of the values. Fail-safe superset like prune_files.
        Strongest when the probe is range-clustered over a
        clustered/Z-ordered layout (expiry by id range, time-window
        backfills); a scattered probe prunes nothing. Returns None when
        the index cannot help (no sidecar, column not indexed, or zero
        files pruned) so callers fall back to bloom/full scan; returns
        [] for an all-null probe (an equality key of NULL matches no
        row)."""
        cols, index = self._zm_load(rel)
        if index is None or col not in (cols or []):
            return None
        values_df = self._probe_values(values_df, col)
        row = values_df.select(
            F.min(values_df.columns[0]).alias("lo"),
            F.max(values_df.columns[0]).alias("hi"),
        ).first()
        if row["lo"] is None:
            return []
        if live is None:
            live = self._live_data_files(rel)
        kept, total = self.prune_files(rel, col, row["lo"], row["hi"], live=live)
        return kept if len(kept) < total else None

    def read_pruned(self, rel: Relation, col: str, lo=None, hi=None) -> DataFrame:
        """Zone-map file skipping read: the table restricted to files
        whose [min, max] for ``col`` intersects [lo, hi]. The caller
        still applies the exact row predicate — pruning is a superset
        guarantee (same contract as the ns-scan pushdown superset
        range), so composing ``read_pruned(...).where(exact)`` is
        always correct and scans only intersecting files."""
        kept, _total = self.prune_files(rel, col, lo, hi)
        return self._read_file_subset(rel, kept)

    def _read_file_subset(self, rel: Relation, kept: list[str]) -> DataFrame:
        """Read only ``kept`` (table-relative) data files, preserving the
        table's merge-schema / partition-discovery read options; an empty
        subset returns an empty frame with the table schema."""
        meta = self.read_meta(rel)
        if not kept:
            if meta.schema_json:
                import pyspark.sql.types as _T

                schema = _T.StructType.fromJson(json.loads(meta.schema_json))
                return self.spark.createDataFrame([], schema)
            return self.read(rel).limit(0)
        reader = self.spark.read
        if meta.schema_evolved:
            reader = reader.option("mergeSchema", "true")
        if meta.partition_by:
            reader = reader.option("basePath", self.path(rel))
        base = self.path(rel)
        df = reader.parquet(*(os.path.join(base, f) for f in kept))
        # entries for files outside `kept` simply never match the anti join
        return self._merge_deletes(df, self._delete_files(rel), base)

    def read_candidates(
        self, rel: Relation, col: str, values_df: DataFrame
    ) -> DataFrame:
        """Index-assisted SET-probe read: the table restricted to data
        files that may contain ANY probe value of ``col`` — the bloom
        sidecar's distributed set-probe first (equality strength on
        high-cardinality columns), the zone-map bounding box second
        (range-clustered layouts), the plain ``read()`` when neither
        helps. Same fail-safe superset contract as read_pruned: the
        caller still applies the exact predicate (typically a semi/inner
        join against ``values_df``), so composing is always correct and
        scans only candidate files. The set-probe costs a few fixed
        Spark jobs, so it only runs once the table has enough files for
        pruning to beat one combined scan (``BLOOM_PROBE_MIN_FILES``) —
        the same gate ``delete_matching`` uses. This is the read the
        persisted text index (operators/retrieval.bm25_topk_indexed)
        and any future posting-list consumer probe through."""
        cand = None
        live = self._live_data_files(rel)
        if len(live) >= self.BLOOM_PROBE_MIN_FILES:
            cand = self.bloom_candidate_files(rel, col, values_df, live=live)
            if cand is None:
                cand = self.zonemap_candidate_files(
                    rel, col, values_df, live=live
                )
        if cand is None:
            return self.read(rel)
        return self._read_file_subset(rel, cand)

    # --- bloom sidecars (file-level equality skipping) ------------------------
    # Zone maps prune RANGE predicates; on a high-cardinality unsorted
    # column (uuid, url, user id) every file spans ~the whole domain and
    # min/max prunes nothing. The bloom sidecar is the Parquet/Iceberg
    # answer for point lookups there: per file, per column, a Bloom
    # filter over the column's values, stored SPARSELY as relational
    # rows (file, col, word, bits) in a `_`-prefixed parquet dataset —
    # built by one distributed scan (map-side-combinable bit_or, one
    # shuffle of 16-byte keys), probed by a driver-side indexed read of
    # <= k words per file. Nothing is ever assembled driver-side at
    # build time, so a million-file table indexes without a driver
    # bottleneck. Sizing: fpp ~ (1 - e^(-k*n/m))^k; the default k=7
    # wants m_bits >= ~10x the max rows per file (1% fpp) — the honest
    # per-file cost every engine pays for blooms (Parquet's own
    # column-chunk blooms use the same budget), which is why columns
    # are opt-in.

    def _bloom_dir(self, rel: Relation) -> str:
        return os.path.join(self.path(rel), "_edna_bloom")

    def _bloom_meta_path(self, rel: Relation) -> str:
        return os.path.join(self.path(rel), "_edna_bloom_meta.json")

    def refresh_bloom_sidecar(
        self,
        rel: Relation,
        columns: list[str],
        m_bits: int = 1 << 20,
        k: int = 7,
    ) -> dict:
        """Incrementally index ``columns`` for equality skipping: only
        files NOT already indexed are scanned; entries for deleted files
        are dropped (sidecar compacted); changed column set / sizing
        rebuilds from scratch. Run after appends/merges like
        refresh_zone_maps — cost is O(new files' rows), fully
        distributed."""
        base = self.path(rel)
        live = self._live_data_files(rel)
        try:
            with open(self._bloom_meta_path(rel)) as f:
                bm = json.load(f)
            if (
                bm.get("column_order") != list(columns)
                or bm.get("m") != m_bits
                or bm.get("k") != k
            ):
                bm = None
        except (FileNotFoundError, json.JSONDecodeError):
            bm = None
        if bm is None:
            bm = {
                "m": m_bits,
                "k": k,
                "column_order": list(columns),
                "columns": {},
                "files": [],
            }
            if os.path.isdir(self._bloom_dir(rel)):
                shutil.rmtree(self._bloom_dir(rel))
        live_set = set(live)
        indexed = set(bm["files"])
        added = [f for f in live if f not in indexed]
        dropped = sorted(indexed - live_set)
        if added:
            # the sidecar keys files by the relpath derived from
            # input_file_name(); a char Hadoop URL-encodes in the URI
            # (space, %, ...) would silently drift that key and turn
            # fail-safe probes into false prunes — refuse upfront
            import re as _re

            odd = [f for f in added if not _re.fullmatch(r"[A-Za-z0-9._=\-/]+", f)]
            if odd:
                raise ValueError(
                    f"unsupported characters in data-file paths for bloom indexing: {odd[:3]}"
                )
            df = self.spark.read.parquet(*(os.path.join(base, f) for f in added))
            missing = [c for c in columns if c not in df.columns]
            if missing:
                raise ValueError(
                    f"bloom columns must be data columns present in the files: {missing}"
                )
            for c in columns:
                dt = df.schema[c].dataType.simpleString()
                prev = bm["columns"].setdefault(c, dt)
                if prev != dt:
                    raise ValueError(f"bloom column {c} changed type {prev} -> {dt}")
            # table-relative path derived in-plan from input_file_name():
            # basenames are NOT unique (dynamic-partition writes reuse the
            # same part-file name across partition dirs), the full relpath is
            base_abs = os.path.abspath(base)
            bname = F.substring(
                F.regexp_replace(F.input_file_name(), "^file:/+", "/"),
                len(base_abs) + 2,
                1 << 30,
            )
            parts = []
            for c in columns:
                sel = df.where(F.col(c).isNotNull()).select(
                    bname.alias("_b"), F.col(c).alias("_v")
                )
                pos = sel.select(
                    "_b",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.xxhash64(F.col("_v"), F.lit(i)), F.lit(m_bits)
                                )
                                for i in range(k)
                            ]
                        )
                    ).alias("_p"),
                )
                parts.append(
                    pos.groupBy("_b", F.expr("_p div 64").alias("word"))
                    .agg(
                        F.bit_or(
                            F.expr("shiftleft(1L, cast(pmod(_p, 64) as int))")
                        ).alias("bits")
                    )
                    .select(F.lit(c).alias("col"), "_b", "word", "bits")
                )
            rows = parts[0]
            for p in parts[1:]:
                rows = rows.unionByName(p)
            out = rows.select(F.col("_b").alias("file"), "col", "word", "bits")
            # word-sorted row groups: a probe's `word IN (k words)` read
            # prunes to the matching row groups via parquet stats instead
            # of scanning the whole sidecar
            out.sortWithinPartitions("col", "word").write.mode("append").parquet(
                self._bloom_dir(rel)
            )
            bm["files"] = sorted(indexed | set(added))
        if dropped:
            bm["files"] = [f for f in bm["files"] if f in live_set]
            livedf = self.spark.createDataFrame(
                [(f,) for f in bm["files"]], "file string"
            )
            keep = self.spark.read.parquet(self._bloom_dir(rel)).join(
                F.broadcast(livedf), "file", "left_semi"
            )
            tmp = self._bloom_dir(rel) + ".tmp"
            keep.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(self._bloom_dir(rel))
            os.rename(tmp, self._bloom_dir(rel))
        with open(self._bloom_meta_path(rel), "w") as f:
            json.dump(bm, f)
        return {"files_total": len(live), "added": len(added), "dropped": len(dropped)}

    def bloom_prune_files(
        self, rel: Relation, col: str, value, live: list[str] | None = None
    ) -> tuple[list[str], int]:
        """(kept live files, total live files) for an equality probe
        ``col == value``. Fail-safe by construction: a file not yet
        indexed (stale sidecar) or a column never indexed is always
        kept; only a file whose filter PROVES absence is skipped.
        ``live`` shares a caller's directory listing (read_where)."""
        if live is None:
            live = self._live_data_files(rel)
        try:
            with open(self._bloom_meta_path(rel)) as f:
                bm = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return live, len(live)
        dt = bm.get("columns", {}).get(col)
        if dt is None or value is None:
            return live, len(live)
        m_bits, k = bm["m"], bm["k"]
        probe = (
            self.spark.range(1)
            .select(
                *[
                    F.pmod(
                        F.xxhash64(F.lit(value).cast(dt), F.lit(i)), F.lit(m_bits)
                    ).alias(f"h{i}")
                    for i in range(k)
                ]
            )
            .first()
        )
        need: dict[int, int] = {}
        for i in range(k):
            p = probe[i]
            need[p // 64] = need.get(p // 64, 0) | (1 << (p % 64))
        indexed = set(bm["files"])
        got: dict[str, dict[int, int]] = {}
        glob_pat = os.path.join(self._bloom_dir(rel), "*.parquet")
        if indexed and not glob.glob(glob_pat):
            # meta survived but the bloom data dir is gone (e.g. a
            # whole-dir overwrite that restored only root-level
            # sidecars): stale index, fail safe until the next refresh
            return live, len(live)
        if indexed:
            import duckdb

            words = ",".join(str(w) for w in sorted(need))
            con = duckdb.connect()
            try:
                for fname, word, bits in con.execute(
                    f"SELECT file, word, bit_or(bits) FROM read_parquet('{glob_pat}') "
                    f"WHERE col = ? AND word IN ({words}) GROUP BY file, word",
                    [col],
                ).fetchall():
                    got.setdefault(fname, {})[word] = bits
            finally:
                con.close()
        kept = []
        for f in live:
            if f not in indexed:
                kept.append(f)  # stale stats fail safe
                continue
            have = got.get(f, {})
            if all((have.get(w, 0) & mask) == mask for w, mask in need.items()):
                kept.append(f)
        return kept, len(live)

    def read_bloom_pruned(self, rel: Relation, col: str, value) -> DataFrame:
        """Bloom file-skipping read for ``col == value``: only files whose
        filter admits the value are opened. Superset contract as
        read_pruned — compose with the exact ``.where(col == value)``."""
        kept, _total = self.bloom_prune_files(rel, col, value)
        return self._read_file_subset(rel, kept)

    def bloom_candidate_files(
        self,
        rel: Relation,
        col: str,
        values_df: DataFrame,
        live: list[str] | None = None,
    ) -> list[str] | None:
        """Distributed SET-probe of the bloom sidecar: the live data
        files that may contain ANY value of ``values_df``'s first column
        (fail-safe superset — an unindexed file is always a candidate).
        The value set is never collected: per-value (word, mask) needs
        are computed in-plan, joined against the sidecar's (file, word,
        bits) rows, and only the DISTINCT candidate file list — bounded
        by the table's file count, never by |values| — reaches the
        driver. Returns None when the index cannot help (no sidecar,
        column not indexed, bloom dir missing or empty) so callers fall
        back to the full scan. This is what makes delete_matching /
        replica sync cost O(delta + candidate files) instead of a full
        key-column scan of the table.

        Probe plan: the sidecar scan is semi-joined down to the probe's
        needed words BEFORE any wide operation — the needed-word set is
        bounded by min(|values| * k, m/64) so it broadcasts, and the
        defensive (file, word) re-aggregation (a crashed refresh can
        append duplicate shards) then touches only surviving rows. The
        unfiltered form measured 19s per probe at a 56M-row sidecar
        (8M rows / 3.3k files, replica_scale_stress) because it
        re-shuffled the whole sidecar per call; the filtered form is
        bounded by the probe's word footprint instead."""
        pre = self._bloom_probe_frame(rel, col, values_df, live=live)
        if pre is None:
            return None
        hits, live, indexed = pre
        cand = {r["file"] for r in hits.collect()}
        return [f for f in live if f not in indexed or f in cand]

    def _bloom_probe_frame(
        self,
        rel: Relation,
        col: str,
        values_df: DataFrame,
        live: list[str] | None = None,
    ) -> tuple[DataFrame, list[str], set[str]] | None:
        """(hits frame, live files, indexed files) for the set probe —
        split out so tests can assert the probe PLAN (word semi-join
        broadcast before any shuffle) without collecting."""
        try:
            with open(self._bloom_meta_path(rel)) as f:
                bm = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None
        dt = bm.get("columns", {}).get(col)
        if dt is None or not bm["files"]:
            return None
        glob_pat = os.path.join(self._bloom_dir(rel), "*.parquet")
        if not glob.glob(glob_pat):
            # meta survived but the bloom data dir is gone: stale
            # index, fail safe until the next refresh
            return None
        if live is None:
            live = self._live_data_files(rel)
        indexed = set(bm["files"])
        m_bits, k = bm["m"], bm["k"]
        values_df = self._probe_values(values_df, col)
        vals = (
            values_df.select(F.col(values_df.columns[0]).cast(dt).alias("_v"))
            .where(F.col("_v").isNotNull())
            .dropDuplicates()
        )
        pos = vals.select(
            "_v",
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col("_v"), F.lit(i)), F.lit(m_bits))
                        for i in range(k)
                    ]
                )
            ).alias("_p"),
        )
        # needs has 3 consumers (word filter, hits join, per-value word
        # count): checkpoint once so the caller's values_df lineage is
        # not re-evaluated per consumer; size is |values| * k rows max
        needs = (
            pos.groupBy("_v", F.expr("_p div 64").alias("word"))
            .agg(
                F.bit_or(
                    F.expr("shiftleft(1L, cast(pmod(_p, 64) as int))")
                ).alias("mask")
            )
            .localCheckpoint(eager=True)
        )
        n_words = needs.groupBy("_v").agg(F.count(F.lit(1)).alias("_nw"))
        words = needs.select("word").dropDuplicates()
        side = self.spark.read.parquet(glob_pat).where(F.col("col") == col)
        # scan-side word cut: distinct needed words are bounded by
        # min(|values| * k, m/64); broadcast-semi-join them into the
        # sidecar scan while that stays comfortably under the broadcast
        # budget, so the defensive re-aggregation below shuffles only
        # rows a probe word can match
        if words.count() * 8 <= self.BROADCAST_DELETE_BYTES:
            side = side.join(F.broadcast(words), "word", "left_semi")
        side = side.groupBy("file", "word").agg(F.bit_or("bits").alias("bits"))
        hits = (
            needs.join(side, "word")
            .where(F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            .groupBy("_v", "file")
            .agg(F.count(F.lit(1)).alias("_hit"))
            .join(n_words, "_v")
            .where(F.col("_hit") == F.col("_nw"))
            .select("file")
            .distinct()
        )
        return hits, live, indexed

    # --- merge-on-read delete vectors ----------------------------------------
    # Row-level DELETE without rewriting data files: the Iceberg-v2
    # positional-delete design. `delete_where` records each deleted
    # row's (data file, row position) — harvested distributedly from
    # Spark's `_metadata.file_path` / `_metadata.row_index` scan
    # columns — into a `_`-prefixed parquet sidecar dataset; every read
    # path then LEFT ANTI joins the scan against the delete set. At
    # 100 TB a delete touching 0.1% of rows costs one predicate scan +
    # a tiny sidecar write instead of rewriting every touched file;
    # `apply_deletes` (or any whole-scope rewrite: compact /
    # optimize_layout) folds the vectors back into the data and clears
    # them. File-level CDC (`read_changes`) does not emit these deletes
    # — the same contract as Iceberg's incremental append scan — and
    # streaming reads of the raw directory see pre-delete rows; batch
    # consumers must go through `read()` / `read_where`.

    @staticmethod
    def _decoded_file_path() -> F.Column:
        """`_metadata.file_path` percent-decoded back to the raw
        filesystem path. Hadoop renders the scan path as a URI — a
        partition dir literally named `prio=4-NOT SPECIFIED` surfaces
        as `...%20...` — while every driver-side walk sees raw names,
        so sidecar file keys MUST be stored decoded or the
        apply/vacuum intersections silently miss files (caught by the
        resurrected 103 rows of orders' `4-NOT SPECIFIED` partition).
        `+` is pre-escaped because url_decode applies the
        form-encoding `+`->space rule, which would corrupt a literal
        plus in a path."""
        return F.url_decode(
            F.replace(F.col("_metadata.file_path"), F.lit("+"), F.lit("%2B"))
        )

    @staticmethod
    def _rel_path_from_uri(base: str, uri_col: F.Column) -> F.Column:
        """Table-relative raw path from a `_metadata.file_path` VALUE
        already projected into a plain column (streaming micro-batches
        materialize it before foreachBatch, where the scan-node-only
        rule no longer applies). Same decode contract as
        `_decoded_file_path`."""
        prefix = "file:" + base.rstrip("/") + "/"
        return F.substr(
            F.url_decode(F.replace(uri_col, F.lit("+"), F.lit("%2B"))),
            F.lit(len(prefix) + 1),
        )

    @classmethod
    def _rel_file_path(cls, base: str) -> F.Column:
        """Table-relative raw file path of each scanned row."""
        # pass the RAW uri: the helper decodes exactly once
        return cls._rel_path_from_uri(base, F.col("_metadata.file_path"))

    def _deletes_dir(self, rel: Relation) -> str:
        return os.path.join(self.path(rel), "_edna_deletes")

    def _delete_files(self, rel: Relation) -> list[str]:
        files = sorted(glob.glob(os.path.join(self._deletes_dir(rel), "*.parquet")))
        pending = self._pending_txids(rel)
        if pending:
            files = [
                p
                for p in files
                if not _is_pending_file(os.path.basename(p), pending)
            ]
        return files

    # --- atomic multi-step DML commit ---------------------------------------
    # A statement that must land BOTH new data files and a delete-sidecar
    # shard (update_where) — or wants its shard to appear as one unit
    # (delete_where/delete_matching write several part files) — runs
    # inside a pending-marker transaction: every artifact is written
    # under a `txn-<txid>-` name that ALL read paths ignore while
    # `_edna_pending/<txid>.json` exists, and the commit is the single
    # atomic removal of that marker. A crash at any earlier point leaves
    # the table byte-for-byte readable at its pre-statement state (no
    # transient duplicates, no half-visible deletes), making every DML
    # retry safe — including self-referential UPDATE sets (v = v + 1),
    # the caveat the pre-txn design documented. vacuum() sweeps the
    # invisible artifacts of crashed transactions. Single-writer
    # semantics as everywhere in this warehouse. The one reader outside
    # the contract is streaming's file-stream source (it lists raw
    # files), which already documents its raw-row boundary.

    def _pending_dir(self, rel: Relation) -> str:
        return os.path.join(self.path(rel), "_edna_pending")

    def _pending_txids(self, rel: Relation) -> list[str]:
        try:
            return sorted(
                fn[:-5]
                for fn in os.listdir(self._pending_dir(rel))
                if fn.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def _maybe_crash(self, point: str) -> None:
        """Crash-injection hook for the atomicity tests: raises a
        BaseException-derived error (so the txn abort cleanup does NOT
        run, exactly like a process kill) when `_txn_crash_point`
        matches."""
        if getattr(self, "_txn_crash_point", None) == point:
            raise InjectedCrash(point)

    @contextlib.contextmanager
    def _txn(self, rel: Relation, op: str):
        """Pending-marker transaction: yields the txid; the marker
        unlink on exit IS the commit point. An in-process failure
        aborts cleanly (artifacts swept, marker removed — nothing ever
        became visible); a process crash leaves the marker, and every
        read path keeps serving the pre-statement state until vacuum()
        sweeps the orphans."""
        txid = uuid.uuid4().hex[:12]
        pdir = self._pending_dir(rel)
        os.makedirs(pdir, exist_ok=True)
        marker = os.path.join(pdir, f"{txid}.json")
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"op": op}, f)
        os.replace(tmp, marker)
        try:
            yield txid
        except Exception:
            self._sweep_txn(rel, txid)
            os.unlink(marker)
            raise
        self._maybe_crash("before_commit")
        os.unlink(marker)  # COMMIT

    def _touch_txn(self, rel: Relation, txid: str) -> None:
        """Refresh the pending marker's mtime after a staging step so
        its age measures INACTIVITY, not total statement duration: a
        legitimately slow multi-shard statement keeps its marker young
        while it makes progress, and stream consumers' crashed-txn
        classification (`_settle_pending`, which drops rows of markers
        older than ``crashed_after_s``) never mistakes a large in-flight
        commit for a crash (ADVICE r9 #1)."""
        with contextlib.suppress(OSError):
            os.utime(os.path.join(self._pending_dir(rel), f"{txid}.json"))

    def _sweep_txn(self, rel: Relation, txid: str) -> int:
        """Remove every (invisible) artifact of one transaction:
        staging dir, txn-named delete shards, txn-named data files."""
        n = 0
        staging = os.path.join(self.path(rel), "_staging", txid)
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
            n += 1
        # a crash DURING shard staging leaves the shard's tmp write dir
        shard_tmp = self._deletes_dir(rel) + f".txn-{txid}"
        if os.path.isdir(shard_tmp):
            shutil.rmtree(shard_tmp, ignore_errors=True)
            n += 1
        prefix = f"txn-{txid}-"
        for dirpath, dirs, fnames in os.walk(self.path(rel)):
            dirs[:] = [
                d for d in dirs if not _is_hidden(d) or d == "_edna_deletes"
            ]
            for fn in fnames:
                if fn.startswith(prefix):
                    os.unlink(os.path.join(dirpath, fn))
                    n += 1
        return n

    def _raw_scan(self, rel: Relation, meta: TableMeta) -> DataFrame:
        """Raw parquet scan of the table's COMMITTED data files (the
        `_metadata` pseudo-column stays resolvable — no joins applied).
        DML scans must come through here: a plain directory read would
        see a crashed transaction's invisible txn-named files, and an
        update/delete over those rows would resurrect them."""
        base = self.path(rel)
        reader = self.spark.read
        if meta.schema_evolved:
            reader = reader.option("mergeSchema", "true")
        if self._pending_txids(rel):
            live = self._live_data_files(rel)
            if not live:
                # only a crashed txn's orphans exist: committed state is
                # empty — callers' 0-match paths handle the empty frame
                return self.read(rel).limit(0)
            if meta.partition_by:
                reader = reader.option("basePath", base)
            return reader.parquet(*(os.path.join(base, f) for f in live))
        return reader.parquet(base)

    def _stage_delete_shard(
        self, rel: Relation, dels: DataFrame, n: int, txid: str
    ) -> None:
        """Write a delete-sidecar shard under the transaction's
        invisible name (visible as one unit at commit)."""
        dtmp = self._deletes_dir(rel) + f".txn-{txid}"
        dels.repartition(max(1, -(-n // 10_000_000))).write.mode(
            "overwrite"
        ).parquet(dtmp)
        # the txn becomes VISIBLE to file streams at the first rename
        # below; refresh the marker now so a slow pre-stage scan/write
        # can never make a just-appearing txn look crashed-old
        self._touch_txn(rel, txid)
        os.makedirs(self._deletes_dir(rel), exist_ok=True)
        for i, p in enumerate(sorted(glob.glob(os.path.join(dtmp, "*.parquet")))):
            os.rename(
                p,
                os.path.join(
                    self._deletes_dir(rel), f"txn-{txid}-{i}.parquet"
                ),
            )
        shutil.rmtree(dtmp, ignore_errors=True)
        self._touch_txn(rel, txid)

    def _stage_data_files(
        self, rel: Relation, df: DataFrame, meta: TableMeta, txid: str
    ) -> None:
        """Write ``df`` with the table's layout into the hidden staging
        dir, then move each file into its partition dir under the
        transaction's invisible name."""
        base = self.path(rel)
        staging = os.path.join(base, "_staging", txid)
        self._writer(df, meta).mode("overwrite").save(staging)
        self._maybe_crash("after_stage_write")
        # first rename below makes the txn visible: refresh the marker
        # so age can never already exceed crashed_after_s at appearance
        self._touch_txn(rel, txid)
        skip = len(staging) + 1
        for dirpath, _dirs, fnames in os.walk(staging):
            relpart = dirpath[skip:]
            for fn in fnames:
                if not fn.endswith(".parquet"):
                    continue
                dest_dir = os.path.join(base, relpart) if relpart else base
                os.makedirs(dest_dir, exist_ok=True)
                os.rename(
                    os.path.join(dirpath, fn),
                    os.path.join(dest_dir, f"txn-{txid}-{fn}"),
                )
        shutil.rmtree(staging, ignore_errors=True)
        with contextlib.suppress(OSError):
            os.rmdir(os.path.join(base, "_staging"))
        self._touch_txn(rel, txid)

    @staticmethod
    def _files_bytes(paths: list[str]) -> int:
        return sum(os.path.getsize(p) for p in paths)

    def _gate_broadcast(self, df: DataFrame, size_bytes: int | None) -> DataFrame:
        """Broadcast-hint ``df`` only while ``size_bytes`` is known and
        within ``BROADCAST_DELETE_BYTES``. A pinned ``F.broadcast``
        cannot be demoted by AQE — an oversized pin dies on the 8 GB
        broadcast limit / driver OOM instead of degrading to a shuffle
        join — so EVERY DML metadata join (probe key sets, accumulated
        delete sidecars, changelog deltas) routes through this gate;
        an un-hinted join still broadcasts when AQE's runtime stats say
        it is small."""
        if size_bytes is not None and size_bytes <= self.BROADCAST_DELETE_BYTES:
            return F.broadcast(df)
        return df

    def _plan_size_bytes(self, df: DataFrame) -> int | None:
        """Catalyst's optimized-plan size estimate for ``df`` (bytes),
        or None when unavailable (e.g. no JVM plan handle). Gates
        broadcast hints on frames with no on-disk footprint (probe key
        frames): only a provably-small side gets pinned; unknown or
        large estimates leave the join un-hinted for AQE."""
        try:
            return int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return None

    def _prior_deletes(self, dfiles: list[str]) -> DataFrame:
        """(file, pos) frame of the accumulated delete sidecar,
        broadcast only while its on-disk bytes fit the budget — a table
        with a large un-applied delete history degrades to a shuffle
        anti join instead of OOMing the driver."""
        dels = self.spark.read.parquet(*dfiles).select("file", "pos")
        return self._gate_broadcast(dels, self._files_bytes(dfiles))

    def _merge_deletes(self, df: DataFrame, dfiles: list[str], base: str) -> DataFrame:
        """Anti-join a direct parquet scan against positional delete
        files rooted at ``base``. Must be applied to the raw scan frame
        (the `_metadata` pseudo-column is only resolvable there); the
        output restores the scan's exact column set. The delete side is
        broadcast while its on-disk size is within the session's
        autoBroadcast budget — the common case (deletes ≪ data) makes
        the merge a map-side hash anti join with zero extra shuffle of
        the data side; larger delete sets fall back to a plain join and
        let AQE pick the strategy."""
        if not dfiles:
            return df
        dels = self.spark.read.parquet(*dfiles).select(
            F.col("file").alias("__del_file"), F.col("pos").alias("__del_pos")
        )
        dels = self._gate_broadcast(dels, self._files_bytes(dfiles))
        cols = df.columns
        return (
            df.withColumn("__del_file", self._rel_file_path(base))
            .withColumn("__del_pos", F.col("_metadata.row_index"))
            .join(dels, ["__del_file", "__del_pos"], "left_anti")
            .select(*cols)
        )

    def delete_where(self, rel: Relation, condition) -> dict:
        """DELETE FROM ``rel`` WHERE ``condition`` (a Column or SQL
        string), merge-on-read: matching rows' (file, position) pairs
        are appended to the delete sidecar; no data file is rewritten.
        Rows already deleted are skipped (re-running the same predicate
        is a no-op), so the sidecar never accumulates duplicate
        entries. Returns {"n_deleted": rows newly deleted}.

        The matched set is materialized (localCheckpoint) before the
        sidecar write so the count and the write see the same rows, and
        the write lays down ~one part file per 10M positions — a
        delete's sidecar footprint is proportional to the rows deleted,
        never to the table."""
        meta = self.read_meta(rel)
        if not self._has_data_files(rel):
            return {"n_deleted": 0}
        base = self.path(rel)
        df = self._raw_scan(rel, meta)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        # predicate first, on the untouched scan columns — the helper
        # projections must not shadow a data column named file/pos
        matched = df.where(cond).select(
            self._rel_file_path(base).alias("file"),
            F.col("_metadata.row_index").alias("pos"),
        )
        existing = self._delete_files(rel)
        if existing:
            matched = matched.join(
                self._prior_deletes(existing), ["file", "pos"], "left_anti"
            )
        matched = matched.localCheckpoint(eager=True)
        n = matched.count()
        if n:
            # txn so a multi-part shard becomes visible as ONE unit —
            # a reader never observes a partial cut of the statement
            with self._txn(rel, "delete_where") as txid:
                self._stage_delete_shard(rel, matched, n, txid)
        return {"n_deleted": n}

    def apply_deletes(self, rel: Relation) -> dict:
        """Fold the delete vectors into the data (Iceberg's
        rewrite_position_delete_files + rewrite_data_files in one):
        only partitions containing a deleted file are rewritten —
        via dynamic partition overwrite — and a partition whose every
        row is deleted is dropped outright (dynamic overwrite cannot
        replace a partition with nothing). Unpartitioned tables take
        the stash-protected whole-dir rewrite. The sidecar is cleared
        afterwards; entries pointing at already-rewritten (dead) files
        are simply discarded — they stopped matching at read time the
        moment their file vanished."""
        dfiles = self._delete_files(rel)
        if not dfiles:
            return {"applied_files": 0, "partitions": []}
        meta = self.read_meta(rel)
        dels = self.spark.read.parquet(*dfiles)
        affected = {r["file"] for r in dels.select("file").distinct().collect()}
        touched = affected & set(self._live_data_files(rel))
        if not touched:
            shutil.rmtree(self._deletes_dir(rel), ignore_errors=True)
            return {"applied_files": 0, "partitions": []}
        if not meta.partition_by:
            df = self.read(rel).localCheckpoint(eager=True)
            self._overwrite_preserving_sidecars(rel, meta, df)
            # the whole-dir overwrite already wiped the sidecar
            self._refresh_skipping_sidecars(rel)
            return {"applied_files": len(touched), "partitions": [None]}
        # dir name -> partition VALUE: Spark escapes %-and-friends (not
        # space/+) when writing partition dirs, and unquote is the exact
        # inverse (escapePathName turns every literal % into %25, so any
        # % in a dir name is an escape); fully-deleted partitions are
        # dropped by DIR name — rebuilding the path from the value would
        # miss escaped dirs
        from urllib.parse import unquote

        pdirs = sorted({f.split("/", 1)[0] for f in touched})
        parts = [unquote(d.split("=", 1)[1]) for d in pdirs]
        # NULL partition values live in __HIVE_DEFAULT_PARTITION__; a
        # cast-isin filter is NULL (never true) for them, which would
        # select zero survivors and rmtree the whole null partition —
        # destroying its non-deleted rows. Match nulls explicitly.
        NULLDIR = "__HIVE_DEFAULT_PARTITION__"
        pc = F.col(meta.partition_by).cast("string")
        cond = pc.isin([p for p in parts if p != NULLDIR])
        if NULLDIR in parts:
            cond = cond | pc.isNull()
        df = self.read(rel).where(cond).localCheckpoint(eager=True)
        present = {
            (NULLDIR if r[0] is None else r[0])
            for r in df.select(pc).distinct().collect()
        }
        if present:
            self.overwrite_partitions(rel, df)
        for d, p in zip(pdirs, parts):
            if p not in present:
                shutil.rmtree(os.path.join(self.path(rel), d), ignore_errors=True)
        shutil.rmtree(self._deletes_dir(rel), ignore_errors=True)
        self._refresh_skipping_sidecars(rel)
        return {"applied_files": len(touched), "partitions": parts}

    def delete_matching(
        self,
        rel: Relation,
        keys_df: DataFrame,
        keys: list[str],
        derived: dict[str, F.Column] | None = None,
    ) -> dict:
        """DELETE WHERE EXISTS (the set-driven sibling of delete_where):
        rows whose ``keys`` columns match any row of ``keys_df`` join the
        delete sidecar. The probe side is a LEFT SEMI join (broadcast
        while the key frame is small, AQE otherwise) — a predicate
        cannot express an arbitrary key set without collecting it into
        a literal, which is exactly the driver bottleneck this avoids.
        Idempotent like delete_where (already-masked positions are not
        re-recorded). Returns {"n_deleted": rows newly deleted}.

        When any key column carries a bloom sidecar, the scan is first
        FILE-PRUNED with a distributed set-probe
        (:meth:`bloom_candidate_files`): only files that may contain a
        probe key are opened, so a sparse purge / replica sync costs
        O(delta + candidate files) rather than one full key-column scan
        of the table — the fail-safe superset contract means an
        unindexed or stale file is always scanned.

        ``derived`` maps extra match-column names to Column expressions
        evaluated on BOTH sides before matching (e.g. a row-content
        hash: ``{"__rh": xxhash64(*cols)}`` with ``keys=[k, "__rh"]``
        deletes by key AND content — the streaming replica apply uses
        this so a positional delete can never kill the key's newer
        replacement). Derived names must not collide with table
        columns; candidate-file pruning only consults physical key
        columns."""
        if not self._has_data_files(rel):
            return {"n_deleted": 0}
        matched, n = self._matching_delete_entries(rel, keys_df, keys, derived)
        if n:
            with self._txn(rel, "delete_matching") as txid:
                self._stage_delete_shard(rel, matched, n, txid)
        return {"n_deleted": n}

    def _matching_delete_entries(
        self,
        rel: Relation,
        keys_df: DataFrame,
        keys: list[str],
        derived: dict[str, F.Column] | None = None,
    ) -> tuple[DataFrame | None, int]:
        """Checkpointed (file, pos) entries of the NOT-yet-masked rows
        whose key columns match ``keys_df`` — the probe core shared by
        delete_matching and upsert_matching (bloom candidate-file
        pruning included)."""
        meta = self.read_meta(rel)
        base = self.path(rel)
        reader = self.spark.read
        if meta.schema_evolved:
            reader = reader.option("mergeSchema", "true")
        probe = keys_df
        if derived:
            probe = probe.withColumns(derived)
        probe = probe.select(*keys).dropDuplicates(keys)
        # (the cand branch below reads live files only; the fallback
        # goes through _raw_scan — both exclude uncommitted txn files)
        # the set-probe costs a few fixed Spark jobs (needs checkpoint,
        # word count, hits collect): only worth paying when the table
        # has enough files for pruning to beat one combined scan
        phys = [c for c in keys if not derived or c not in derived]
        cand = None
        # ONE directory walk shared by the gate and both probe tiers
        # (the listing dominated prune_files at 100k files)
        live = self._live_data_files(rel)
        if len(live) >= self.BLOOM_PROBE_MIN_FILES:
            for c in phys:
                cand = self.bloom_candidate_files(rel, c, probe.select(c), live=live)
                if cand is not None:
                    break
            if cand is None:
                # no bloom on any key column: the zone-map bounding-box
                # probe covers the range-clustered case (expiry by id
                # range over a clustered layout) for one cheap agg job
                for c in phys:
                    cand = self.zonemap_candidate_files(
                        rel, c, probe.select(c), live=live
                    )
                    if cand is not None:
                        break
        if cand is not None:
            if not cand:
                return None, 0
            if meta.partition_by:
                reader = reader.option("basePath", base)
            df = reader.parquet(*(os.path.join(base, f) for f in cand))
        else:
            df = self._raw_scan(rel, meta)
        # `_metadata` resolves only on the raw scan node: project the
        # positions alongside the keys BEFORE joining (helper names
        # avoid shadowing a key literally called file/pos)
        if derived:
            df = df.withColumns(derived)
        scan = df.select(
            *[F.col(c) for c in keys],
            self._rel_file_path(base).alias("__dm_file"),
            F.col("_metadata.row_index").alias("__dm_pos"),
        )
        matched = scan.join(
            self._gate_broadcast(probe, self._plan_size_bytes(probe)),
            keys,
            "left_semi",
        ).select(F.col("__dm_file").alias("file"), F.col("__dm_pos").alias("pos"))
        existing = self._delete_files(rel)
        if existing:
            matched = matched.join(
                self._prior_deletes(existing), ["file", "pos"], "left_anti"
            )
        matched = matched.localCheckpoint(eager=True)
        return matched, matched.count()

    def upsert_matching(
        self,
        rel: Relation,
        src: DataFrame,
        keys: list[str],
        delete_keys_df: DataFrame | None = None,
    ) -> dict:
        """Keyed UPSERT as ONE atomic statement: rows matching ``src``'s
        keys (or ``delete_keys_df``'s, when the delete set is wider than
        the insert set — the replica-sync shape, where pure deletes ride
        along) are masked AND ``src`` is appended, both staged under a
        single pending-marker transaction — a reader never observes the
        deletes without the replacements (the two-statement form
        delete_matching-then-append had exactly that crash window).
        ``src`` must be column-aligned to the table. Returns
        {"n_upserted": src rows, "n_deleted": newly masked rows}."""
        meta = self.read_meta(rel)
        probe = delete_keys_df if delete_keys_df is not None else src
        if self._has_data_files(rel):
            matched, n_del = self._matching_delete_entries(rel, probe, keys)
        else:
            matched, n_del = None, 0
        src = src.localCheckpoint(eager=True)
        n_ins = src.count()
        if not n_ins and not n_del:
            return {"n_upserted": 0, "n_deleted": 0}
        # size the landing files to the batch, not the source task
        # layout (same small-files rule as update_where's rewrite)
        src = src.coalesce(max(1, -(-n_ins // 2_000_000)))
        with self._txn(rel, "upsert_matching") as txid:
            if n_ins:
                self._stage_data_files(rel, src, meta, txid)
            self._maybe_crash("after_data_move")
            if n_del:
                self._stage_delete_shard(rel, matched, n_del, txid)
        self._refresh_skipping_sidecars(rel)
        return {"n_upserted": int(n_ins), "n_deleted": int(n_del)}

    def purge_keys(self, rel: Relation, keys_df: DataFrame, keys: list[str]) -> dict:
        """Right-to-be-forgotten purge: delete every row matching the
        key set AND physically remove the bytes now — `delete_matching`
        masks the rows, `apply_deletes` rewrites exactly the touched
        partitions (so the original values stop existing on disk, not
        just in query results), and the sidecar entries (which
        themselves name file+position, not values) are dropped with it.
        Snapshots are the caller's concern: hardlinked versions retain
        the purged rows until `expire_snapshots`/`drop_snapshot` —
        the same completeness boundary Delta/Iceberg VACUUM documents
        for their time travel. Returns the masked + applied counts."""
        d = self.delete_matching(rel, keys_df, keys)
        a = self.apply_deletes(rel)
        return {
            "n_deleted": d["n_deleted"],
            "applied_files": a["applied_files"],
            "partitions": a["partitions"],
        }

    def update_where(self, rel: Relation, condition, set: dict) -> dict:
        """UPDATE ... SET ... WHERE, merge-on-read: matching rows are
        re-written once with the ``set`` expressions applied ({column:
        Column-or-SQL-string}; columns must exist) and APPENDED, while
        the originals' (file, position) pairs join the delete sidecar —
        no existing data file is rewritten, the same economics
        delete_where measures (O(scan + changed rows), not O(table)).
        Updating the partition column is allowed: the appended rows
        land in their new partitions.

        ATOMIC commit: both sides of the statement — the rewritten
        rows and the delete-sidecar shard masking their originals —
        are written under a pending-marker transaction (see
        :meth:`_txn`) and become visible together when the marker is
        unlinked. A reader at ANY intermediate point (or after a
        crash) sees exactly the pre-statement table: no transient
        duplicates, no half-applied sets — so retrying a crashed
        update is always safe, including self-referential sets
        (v = v + 1), closing the caveat the pre-txn design documented.
        Returns {"n_updated": rows}."""
        meta = self.read_meta(rel)
        if not self._has_data_files(rel):
            return {"n_updated": 0}
        base = self.path(rel)
        df = self._raw_scan(rel, meta)
        bad = [c for c in set if c not in df.columns]
        if bad:
            raise ValueError(f"update_where: unknown columns {bad}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        # pre-append scan decides BOTH sides: the positions to mask and
        # the rows to rewrite (appending first would let the delete scan
        # see — and mask — the new rows whenever cond still matches)
        matched = df.where(cond)
        existing = self._delete_files(rel)
        dels = (
            matched.select(
                self._rel_file_path(base).alias("file"),
                F.col("_metadata.row_index").alias("pos"),
            )
        )
        if existing:
            dels = dels.join(
                self._prior_deletes(existing), ["file", "pos"], "left_anti"
            )
        dels = dels.localCheckpoint(eager=True)
        n = dels.count()
        if not n:
            return {"n_updated": 0}
        # assignments cast to the column's DECLARED type (ANSI UPDATE
        # semantics; overflow throws under ANSI mode) — without this a
        # narrower literal (amt = 0 -> int into a bigint column) lands
        # files whose physical type diverges and every later read dies
        # with SchemaColumnConvertNotSupportedException
        exprs = {
            c: (F.expr(e) if isinstance(e, str) else e).cast(
                df.schema[c].dataType
            )
            for c, e in set.items()
        }
        # size the rewrite to its row count BEFORE the partitioned append:
        # the scan's task layout would otherwise fan a small update into
        # tasks x partitions tiny files (measured ~4k files for an
        # 8k-row update — the next incremental read paid 6.4s of footer
        # time for 8k rows)
        updated = (
            self._merge_deletes(matched, existing, base)
            .withColumns(exprs)
            .select(*df.columns)
            .coalesce(max(1, -(-n // 2_000_000)))
            .localCheckpoint(eager=True)
        )
        with self._txn(rel, "update_where") as txid:
            self._stage_data_files(rel, updated, meta, txid)
            self._maybe_crash("after_data_move")
            self._stage_delete_shard(rel, dels, n, txid)
        # committed — keep file skipping online (incremental: only the
        # new files' footers are opened)
        self._refresh_skipping_sidecars(rel)
        return {"n_updated": int(updated.count())}

    def vacuum(self, rel: Relation, older_than_s: float | None = None) -> dict:
        """Maintenance sweep for the table's dead metadata: removes
        failed-write staging dirs (`_temporary` / `.spark-staging*` —
        Spark cleans them on success but leaves them on executor
        failure), and compacts the delete sidecar down to entries whose
        data file is still live (compact / optimize_layout /
        expire_partitions leave harmless-but-dead positional entries
        behind), and sweeps the invisible artifacts of CRASHED DML
        transactions (pending markers whose statements never
        committed — see :meth:`_txn`; single-writer contract: don't
        vacuum under a live writer). Bounded by the directory listing +
        the sidecar size — no data scan. Returns {"staging_removed",
        "delete_entries_pruned", "txns_swept"}.

        ``older_than_s`` restricts the txn sweep (and the staging-dir
        removal) to artifacts idle at least that long — the
        auto-maintenance policy's safety margin: marker mtimes are
        refreshed at every staging step (:meth:`_touch_txn`), and a
        staging dir's age is its NEWEST tree mtime (tasks write into
        nested attempt dirs without touching the root, so the root's
        own mtime would read a live long write as idle), so age
        measures INACTIVITY and an in-flight statement or an active
        Spark write task can never be swept out from under a live
        writer. None (the default) keeps the manual-call contract:
        sweep everything, the caller vouches there is no live writer."""
        base = self.path(rel)

        def _old_enough(path: str) -> bool:
            if older_than_s is None:
                return True
            try:
                return (time.time() - os.path.getmtime(path)) >= older_than_s
            except OSError:
                return False  # vanished underfoot: not ours to sweep

        def _tree_old_enough(path: str) -> bool:
            # a LIVE Spark write refreshes mtimes deep inside nested
            # task-attempt dirs while the staging root's own mtime stays
            # at write start — gate on the NEWEST mtime found anywhere
            # under the dir, or a long write would be rmtree'd mid-task
            if older_than_s is None:
                return True
            if not _old_enough(path):
                return False
            for dirpath, dns, fns in os.walk(path):
                for entry in dns + fns:
                    if not _old_enough(os.path.join(dirpath, entry)):
                        return False
            return True
        txns = 0
        for txid in self._pending_txids(rel):
            marker = os.path.join(self._pending_dir(rel), f"{txid}.json")
            if not _old_enough(marker):
                continue
            self._sweep_txn(rel, txid)
            os.unlink(marker)
            txns += 1
        with contextlib.suppress(OSError):
            os.rmdir(self._pending_dir(rel))
        staging = 0
        for dirpath, dirs, _files in os.walk(base):
            for d in list(dirs):
                if d == "_temporary" or d.startswith(".spark-staging"):
                    full = os.path.join(dirpath, d)
                    if _tree_old_enough(full):
                        shutil.rmtree(full, ignore_errors=True)
                        staging += 1
                    dirs.remove(d)
            dirs[:] = [d for d in dirs if not _is_hidden(d)]
        pruned = 0
        dfiles = self._delete_files(rel)
        if dfiles:
            dels = self.spark.read.parquet(*dfiles)
            live = self._live_data_files(rel)
            livedf = self.spark.createDataFrame([(f,) for f in live], "file string")
            kept = dels.join(F.broadcast(livedf), "file", "left_semi").localCheckpoint(
                eager=True
            )
            n_before, n_after = dels.count(), kept.count()
            pruned = n_before - n_after
            if n_after == 0:
                shutil.rmtree(self._deletes_dir(rel), ignore_errors=True)
            elif pruned:
                tmp = self._deletes_dir(rel) + ".compacting"
                kept.repartition(max(1, -(-n_after // 10_000_000))).write.mode(
                    "overwrite"
                ).parquet(tmp)
                shutil.rmtree(self._deletes_dir(rel))
                os.rename(tmp, self._deletes_dir(rel))
        return {
            "staging_removed": staging,
            "delete_entries_pruned": pruned,
            "txns_swept": txns,
        }

    # --- reads -------------------------------------------------------------
    def _has_data_files(self, rel: Relation) -> bool:
        pending = self._pending_txids(rel)
        for _dirpath, dirs, files in os.walk(self.path(rel)):
            dirs[:] = [d for d in dirs if not _is_hidden(d)]  # sidecars
            if any(
                f.endswith(".parquet")
                and not (pending and _is_pending_file(f, pending))
                for f in files
            ):
                return True
        return False

    def read(self, rel: Relation) -> DataFrame:
        meta = self.read_meta(rel)
        if meta.schema_json and not self._has_data_files(rel):
            # empty table (created from a 0-row batch): schema comes from
            # the sidecar, mirroring BigQuery's empty-CTAS table
            import pyspark.sql.types as _T

            schema = _T.StructType.fromJson(json.loads(meta.schema_json))
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if meta.schema_evolved:
            # schema-on-read union across heterogeneous files (the
            # on_schema_change evolution path); scoped to evolved tables
            # because footer merging has a cost at large file counts
            reader = reader.option("mergeSchema", "true")
        if self._pending_txids(rel):
            # a crashed (or in-flight) transaction left invisible
            # txn-named files in the data dirs: read by explicit live
            # file list so the statement stays invisible until its
            # commit. The no-pending fast path below is the normal case.
            live = self._live_data_files(rel)
            if not live:
                return self.spark.createDataFrame(
                    [], self.spark.read.parquet(self.path(rel)).schema
                ).limit(0)
            if meta.partition_by:
                reader = reader.option("basePath", self.path(rel))
            base = self.path(rel)
            df = reader.parquet(*(os.path.join(base, f) for f in live))
        else:
            df = reader.parquet(self.path(rel))
        # merge-on-read: mask positionally-deleted rows (no-op glob
        # when the table has no delete sidecar)
        df = self._merge_deletes(df, self._delete_files(rel), self.path(rel))
        if meta.schema_evolved and meta.schema_json:
            import pyspark.sql.types as _T

            logical = _T.StructType.fromJson(__import__("json").loads(meta.schema_json))
            cols = [f.name for f in logical.fields if f.name in df.columns]
            extra = [c for c in df.columns if c not in cols]
            df = df.select(*(cols + extra)) if not meta.partition_by else df.select(
                *(cols + [c for c in extra if c == meta.partition_by])
            )
        return df

    def sql(self, query: str, tables: dict[str, Relation] | None = None) -> DataFrame:
        """Run SQL over warehouse tables with full storage semantics:
        every alias in ``tables`` resolves through ``read()`` — schema
        sidecar, schema-on-read evolution, merge-on-read delete masks —
        so SQL consumers see exactly what DataFrame consumers see (a raw
        ``spark.read.parquet`` would resurrect deleted rows). Aliases
        are registered as temp views for the query and dropped after
        analysis; ``tables=None`` registers every table in the
        warehouse as ``<schema>__<identifier>``. The table state (file
        list, delete masks) is bound when this is CALLED — like any
        DataFrame read — so re-run sql() after DML to see new state.

        DML statements (DELETE / UPDATE / INSERT INTO / MERGE INTO)
        dispatch to the merge-on-read operators and return a one-row
        stats frame — see :mod:`.sql_dml` for the exact grammar; the
        reference's user surface is SQL-first
        (macros/materialization/incremental_partition_merge.sql:248-265),
        so every DML operator here has the matching statement form."""
        if tables is None:
            tables = {}
            for schema in sorted(os.listdir(self.root)):
                sdir = os.path.join(self.root, schema)
                if _is_hidden(schema) or not os.path.isdir(sdir):
                    continue
                for ident in sorted(os.listdir(sdir)):
                    rel = self.relation(schema, ident)
                    if self.exists(rel):
                        tables[f"{schema}__{ident}"] = rel
        from . import sql_dml

        if sql_dml.DML_HEAD_RE.match(query):
            return sql_dml.dispatch(self, tables, query)
        for alias, rel in tables.items():
            self.read(rel).createOrReplaceTempView(alias)
        try:
            return self.spark.sql(query)
        finally:
            for alias in tables:
                self.spark.catalog.dropTempView(alias)

    # --- writes ------------------------------------------------------------
    def _writer(self, df: DataFrame, meta: TableMeta):
        if meta.cluster_by:
            keys = [meta.partition_by] if meta.partition_by else []
            df = df.sortWithinPartitions(*(keys + meta.cluster_by))
        w = df.write.format("parquet")
        if meta.partition_by:
            w = w.partitionBy(meta.partition_by)
        return w

    def create_as(self, rel: Relation, df: DataFrame, meta: TableMeta | None = None) -> None:
        """CREATE OR REPLACE TABLE AS SELECT with partition/cluster layout
        (reference: incremental_partition_merge.sql:77-83, 228-235)."""
        meta = meta or TableMeta()
        meta.schema_json = df.schema.json()
        self._writer(df, meta).mode("overwrite").save(self.path(rel))
        self.write_meta(rel, meta)

    def append(self, rel: Relation, df: DataFrame) -> None:
        """INSERT INTO … SELECT (column-aligned by the caller;
        reference: incremental_log.sql:146-151)."""
        meta = self.read_meta(rel)
        self._writer(df, meta).mode("append").save(self.path(rel))

    def overwrite_partitions(self, rel: Relation, df: DataFrame) -> None:
        """Dynamic partition overwrite: replaces exactly the partitions
        present in ``df``, leaving all others in place. Requires
        spark.sql.sources.partitionOverwriteMode=dynamic (session.py)."""
        meta = self.read_meta(rel)
        if not meta.partition_by:
            raise ValueError(f"{rel.table_id} is not partitioned; cannot partition-overwrite")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        self._writer(df, meta).mode("overwrite").save(self.path(rel))

    def drop(self, rel: Relation) -> None:
        shutil.rmtree(self.path(rel), ignore_errors=True)

    def drop_partition(self, rel: Relation, value: str) -> None:
        """Remove one partition directory (used when a merge empties a
        touched partition)."""
        meta = self.read_meta(rel)
        if not meta.partition_by:
            raise ValueError(f"{rel.table_id} is not partitioned")
        shutil.rmtree(
            os.path.join(self.path(rel), f"{meta.partition_by}={value}"), ignore_errors=True
        )

    def partition_file_stats(self, rel: Relation) -> dict[str | None, tuple[int, int]]:
        """Per-partition (parquet file count, bytes) from a directory
        listing — no data scan. Unpartitioned tables report one entry
        keyed None."""
        meta = self.read_meta(rel)
        root = self.path(rel)
        stats: dict[str | None, tuple[int, int]] = {}
        if not meta.partition_by:
            n, b = 0, 0
            for dirpath, dirs, files in os.walk(root):
                # skip sidecars (_edna_profile, .stash dirs): Spark's
                # file index ignores them, so must the file stats
                dirs[:] = [d for d in dirs if not _is_hidden(d)]
                for fn in files:
                    if fn.endswith(".parquet"):
                        n += 1
                        b += os.path.getsize(os.path.join(dirpath, fn))
            return {None: (n, b)}
        prefix = meta.partition_by + "="
        for d in os.listdir(root):
            if not d.startswith(prefix):
                continue
            n, b = 0, 0
            for dirpath, _dirs, files in os.walk(os.path.join(root, d)):
                for fn in files:
                    if fn.endswith(".parquet"):
                        n += 1
                        b += os.path.getsize(os.path.join(dirpath, fn))
            stats[d[len(prefix):]] = (n, b)
        return stats

    def compact(
        self,
        rel: Relation,
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
    ) -> dict[str | None, tuple[int, int]]:
        """Rewrite fragmented partitions into ~``target_file_bytes``
        files — the small-files maintenance every incremental parquet
        warehouse needs: each micro-batch append lays down its own files,
        and a year of hourly appends turns one partition into thousands
        of KB-sized parquet footers that dominate scan planning time.

        Scope is bounded like the merge materialization: only partitions
        whose file count exceeds both ``min_files`` and the byte-derived
        target count are rewritten (directory listing decides — no data
        scan), each via dynamic partition overwrite, so a table with one
        hot fragmented partition rewrites exactly that partition.
        Idempotent: a second run finds every partition already at target
        and rewrites nothing. Row content is untouched (tests pin
        read-back equality); clustering order is re-applied by the
        shared writer. Returns {partition: (files_before, files_after)}
        for the rewritten partitions only.
        """
        meta = self.read_meta(rel)
        report: dict[str | None, tuple[int, int]] = {}
        for part, (nfiles, nbytes) in self.partition_file_stats(rel).items():
            want = max(1, -(-nbytes // target_file_bytes))  # ceil
            if nfiles <= max(want, min_files):
                continue
            if part is None:
                # unpartitioned: whole-table rewrite; materialize first —
                # the source files are the overwrite target
                df = self.read(rel).repartition(want).localCheckpoint(eager=True)
                self._overwrite_preserving_sidecars(rel, meta, df)
            else:
                df = (
                    self.read(rel)
                    .where(F.col(meta.partition_by).cast("string") == part)
                    .repartition(want)
                    .localCheckpoint(eager=True)
                )
                self.overwrite_partitions(rel, df)
            report[part] = (nfiles, self.partition_file_stats(rel).get(part, (0, 0))[0])
        return report

    def _overwrite_preserving_sidecars(
        self, rel: Relation, meta: TableMeta, df: DataFrame
    ) -> None:
        """Whole-table overwrite that survives the sidecar wipe: the
        directory-level overwrite deletes everything inside the table
        dir, so the profile baseline, zone-map sidecar, and bloom meta
        are stashed OUTSIDE it and restored, and the meta sidecar is
        rewritten (mirrors create_as) — clustering order / schema /
        grants / drift baseline / skipping configs all survive. Bloom
        DATA is deliberately dropped: every file changes, so the next
        refresh_bloom_sidecar re-indexes from the preserved config.
        The caller must pass an already-materialized ``df`` (the source
        files are the overwrite target)."""
        keep = [
            p
            for p in (
                self._profile_path(rel),
                self._zonemap_path(rel),
                self._zonemap_dir(rel),
                self._bloom_meta_path(rel),
            )
            if os.path.exists(p)
        ]
        stash = os.path.join(
            self.root, f"._sidecar_stash__{rel.schema}__{rel.identifier}"
        )
        shutil.rmtree(stash, ignore_errors=True)
        if keep:
            os.makedirs(stash)
            for src in keep:
                shutil.move(src, os.path.join(stash, os.path.basename(src)))
        try:
            self._writer(df, meta).mode("overwrite").save(self.path(rel))
        finally:
            if keep:
                # a failed overwrite can remove the table dir entirely;
                # recreate it so the restore itself can't raise and mask
                # the original write error (sidecars stranded in the stash)
                try:
                    os.makedirs(self.path(rel), exist_ok=True)
                    for src in keep:
                        shutil.move(os.path.join(stash, os.path.basename(src)), src)
                    shutil.rmtree(stash, ignore_errors=True)
                except OSError as restore_err:
                    if sys.exc_info()[0] is None:
                        raise  # no write error in flight: surface it
                    warnings.warn(
                        "sidecar restore failed after an overwrite write "
                        f"error; sidecars kept at {stash}: {restore_err}",
                        stacklevel=2,
                    )
        self.write_meta(rel, meta)

    # --- layout optimization (OPTIMIZE ... ZORDER BY analogue) ---------------

    def _zorder_bucket_expr(
        self, df: DataFrame, columns: list[str], buckets: int, sample_rows: int
    ) -> Column:
        """The multi-dimensional clustering key for optimize_layout:
        per column, map values to their approx-quantile bucket (one
        sample-based pass per numeric column via approxQuantile; a
        bounded seeded sample for strings), then Morton-interleave the
        bucket ids (functions/binary.morton_key) so file ranges are
        tight on EVERY clustered dimension — Delta's OPTIMIZE ZORDER
        uses the same range-bucket interleave. Boundaries are computed
        ONCE over the whole table so every partition shares the same
        bucketing. Bucket lookup is an O(buckets) whole-stage-codegen'd
        HOF per row — no UDF, no global sort."""
        from edna_dbt_library_spark.functions.binary import morton_key

        if not (1 <= len(columns) <= 3):
            raise ValueError("optimize_layout clusters 1-3 columns")
        bits = max(1, (buckets - 1).bit_length())
        if bits * len(columns) > 63:
            raise ValueError("buckets * columns exceed the 63-bit morton key")
        bucket_cols: list[Column] = []
        for c in columns:
            dt = df.schema[c].dataType.simpleString()
            if dt == "string":
                n = df.select(c).where(F.col(c).isNotNull())
                # top-k by hash == deterministic uniform sample (no full
                # sort materializes; takeOrdered is a distributed heap)
                sample = [
                    r[0]
                    for r in n.orderBy(F.xxhash64(F.col(c)))
                    .limit(sample_rows)
                    .collect()
                ]
                sample.sort()
                step = max(1, len(sample) // buckets)
                bnds = sorted(set(sample[step::step]))[: buckets - 1]
                arr = F.array(*[F.lit(b) for b in bnds])
                bucket_cols.append(
                    F.size(F.filter(arr, lambda b: b <= F.col(c))).cast("long")
                )
            else:
                if dt == "date":
                    num = F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
                    numdf = df.select(num.cast("double").alias("_n"))
                elif dt.startswith("timestamp"):
                    num = F.unix_micros(F.col(c))
                    numdf = df.select(num.cast("double").alias("_n"))
                else:
                    num = F.col(c).cast("double")
                    numdf = df.select(num.alias("_n"))
                qs = [i / buckets for i in range(1, buckets)]
                bnds = sorted(set(numdf.stat.approxQuantile("_n", qs, 1.0 / (4 * buckets))))
                arr = F.array(*[F.lit(float(b)) for b in bnds])
                bucket_cols.append(
                    F.size(F.filter(arr, lambda b: b <= num.cast("double"))).cast(
                        "long"
                    )
                )
        if len(bucket_cols) == 1:
            return bucket_cols[0]
        return morton_key(bucket_cols, bits_per_dim=bits)

    def optimize_layout(
        self,
        rel: Relation,
        cluster_by: list[str] | None = None,
        target_file_bytes: int = 128 << 20,
        buckets: int = 64,
        sample_rows: int = 100_000,
    ) -> dict:
        """Rewrite the table Z-ORDERED on ``cluster_by`` (default: the
        meta's cluster columns) — Delta's OPTIMIZE ZORDER BY for this
        warehouse: each partition's rows are range-repartitioned on the
        quantile-bucketed Morton key into ~``target_file_bytes`` files
        and sorted within files, so AFTER a refresh_zone_maps every
        clustered dimension prunes at FILE level (a hash-compacted
        table prunes nothing: every file spans the full domain).
        Partitioned tables rewrite per partition via dynamic partition
        overwrite (root sidecars untouched); unpartitioned tables go
        through the stash-protected whole-dir overwrite. Zone-map and
        bloom sidecars that exist are refreshed afterwards from their
        preserved configs, so skipping works immediately. Returns
        {partition: (files_before, files_after)}."""
        meta = self.read_meta(rel)
        cols = list(cluster_by) if cluster_by else list(meta.cluster_by or [])
        if not cols:
            raise ValueError(
                f"{rel.table_id}: optimize_layout needs cluster_by (arg or meta)"
            )
        zexpr = self._zorder_bucket_expr(self.read(rel), cols, buckets, sample_rows)
        report: dict[str | None, tuple[int, int]] = {}
        for part, (nfiles, nbytes) in sorted(
            self.partition_file_stats(rel).items(), key=lambda kv: str(kv[0])
        ):
            want = max(1, -(-nbytes // target_file_bytes))  # ceil
            src = self.read(rel)
            if part is not None:
                src = src.where(F.col(meta.partition_by).cast("string") == part)
            df = (
                src.withColumn("_zk", zexpr)
                .repartitionByRange(want, "_zk")
                .sortWithinPartitions("_zk")
                .drop("_zk")
                .localCheckpoint(eager=True)
            )
            if part is None:
                self._overwrite_preserving_sidecars(rel, meta, df)
            else:
                self.overwrite_partitions(rel, df)
            report[part] = (
                nfiles,
                self.partition_file_stats(rel).get(part, (0, 0))[0],
            )
        # bring skipping back online from the preserved configs
        self._refresh_skipping_sidecars(rel)
        return report

    def _refresh_skipping_sidecars(self, rel: Relation) -> None:
        """Re-sync whatever skipping structures the table maintains from
        their preserved configs (zone maps incrementally — only unseen
        files' footers are opened; blooms from the stored sizing).
        Shared by optimize_layout and the row-level DML ops so ad-hoc
        writes keep file skipping online without a manual refresh."""
        zm_cols = self.zone_map_columns(rel)
        if zm_cols:
            self.refresh_zone_maps(rel, zm_cols)
        try:
            with open(self._bloom_meta_path(rel)) as f:
                bmj = json.load(f)
            if bmj.get("column_order"):
                self.refresh_bloom_sidecar(
                    rel, bmj["column_order"], m_bits=bmj["m"], k=bmj["k"]
                )
        except (FileNotFoundError, json.JSONDecodeError):
            pass

    def read_where(
        self,
        rel: Relation,
        eq: dict[str, object] | None = None,
        between: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """The composed pruned read: bloom-prune every ``eq`` column,
        zone-map-prune every ``eq`` (degenerate [v, v] range) and
        ``between`` column, intersect the kept file lists, read only
        that subset, and apply the EXACT predicates on top — so the
        result equals the full-scan filter by construction (every
        pruner is fail-safe / superset), while the files opened are the
        intersection of every skipping structure the table maintains."""
        live = self._live_data_files(rel)
        kept = set(live)
        for c, v in (eq or {}).items():
            kept &= set(self.bloom_prune_files(rel, c, v, live=live)[0])
            kept &= set(self.prune_files(rel, c, v, v, live=live)[0])
        for c, (lo, hi) in (between or {}).items():
            kept &= set(self.prune_files(rel, c, lo, hi, live=live)[0])
        df = self._read_file_subset(rel, [f for f in live if f in kept])
        for c, v in (eq or {}).items():
            df = df.where(F.col(c).eqNullSafe(F.lit(v)))
        for c, (lo, hi) in (between or {}).items():
            if lo is not None:
                df = df.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(c) <= F.lit(hi))
        return df

    def expire_partitions(self, rel: Relation, keep_from: str) -> list[str]:
        """Retention maintenance: drop every DAY partition strictly older
        than ``keep_from`` (an ISO date string). Pure directory-level
        deletes decided from the partition listing — no data scan, no
        rewrite of surviving partitions, so expiring 30 days out of a
        100 TB / 3-year table touches exactly 30 directories. Returns
        the dropped partition values (ISO-date directory names compare
        correctly as strings). Unpartitioned tables raise — expiry
        without a partition column would be a full rewrite, which is a
        filter + create_as the caller should do explicitly."""
        meta = self.read_meta(rel)
        if not meta.partition_by:
            raise ValueError(
                f"{rel.table_id} is unpartitioned: retention needs a partition column"
            )
        dropped = []
        for part in self.partitions(rel):
            if part < keep_from:
                shutil.rmtree(
                    os.path.join(self.path(rel), f"{meta.partition_by}={part}")
                )
                dropped.append(part)
        return dropped


    # --- snapshots / time travel --------------------------------------------
    # BigQuery gives its users implicit time travel; a parquet warehouse
    # has none, so snapshots are explicit: a HARDLINK farm outside the
    # table directory (whole-dir overwrites — replace/compact — wipe
    # everything inside it, the same reason the compact profile stash
    # lives outside; hardlinked inodes survive the source file deletion
    # for free, so a snapshot costs directory entries, not data bytes).

    def _snapshots_dir(self, rel: Relation) -> str:
        return os.path.join(self.root, ".edna_snapshots", rel.schema, rel.identifier)

    def snapshot(self, rel: Relation, note: str | None = None) -> int:
        """Record the table's current state as a new version: every data
        file hardlinked (partition layout preserved) plus the meta
        sidecar, with a manifest. Returns the version number (1-based,
        monotonic). O(#files) directory operations, zero data copied."""
        base = self.path(rel)
        if not self.exists(rel):
            raise FileNotFoundError(f"cannot snapshot missing table {rel.table_id}")
        snaps = self._snapshots_dir(rel)
        os.makedirs(snaps, exist_ok=True)
        versions = [
            int(d[1:]) for d in os.listdir(snaps) if d.startswith("v") and d[1:].isdigit()
        ]
        v = max(versions, default=0) + 1
        vdir = os.path.join(snaps, f"v{v}")
        # an EMPTY table (created from a 0-row batch) still snapshots —
        # the loops below may create nothing, the manifest must land
        os.makedirs(vdir, exist_ok=True)
        # _live_data_files (not a raw walk): an uncommitted/crashed
        # transaction's txn-named files must never be pinned in a version
        files: list[str] = []
        for relp in self._live_data_files(rel):
            dst = os.path.join(vdir, "data", relp)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.link(os.path.join(base, relp), dst)
            files.append(relp)
        # delete vectors are table STATE: a version pinned without them
        # would resurrect deleted rows on read_version/restore (Iceberg
        # manifests track delete files for the same reason)
        delete_files: list[str] = []
        for p in self._delete_files(rel):
            dst = os.path.join(vdir, "deletes", os.path.basename(p))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.link(p, dst)
            delete_files.append(os.path.basename(p))
        meta = self.read_meta(rel)
        import time as _time

        with open(os.path.join(vdir, "manifest.json"), "w") as f:
            json.dump(
                {
                    "version": v,
                    "note": note,
                    "created_at": _time.time(),  # unix UTC; read_as_of resolution
                    "n_files": len(files),
                    "files": sorted(files),
                    "delete_files": sorted(delete_files),
                    "partition_by": meta.partition_by,
                    "schema_evolved": meta.schema_evolved,
                    "schema_json": meta.schema_json,
                },
                f,
            )
        # Iceberg-style incremental manifest: a sidecar delta.json holds
        # only (parent, added, removed) vs the previous live snapshot, so
        # read_changes' metadata cost is O(delta files), not a full
        # manifest parse per read — at 100 TB the monolithic manifest is
        # MB-scale (millions of files) while a nightly delta is a few
        # hundred entries. The full manifest above stays authoritative
        # (restore/read_version/fallback diff).
        # restore() re-creates previously-removed PATHS, breaking the
        # chain's path-added-at-most-once algebra (an add->remove->
        # restore-re-add history would make the set difference silently
        # DROP the re-added files). Its marker forces parent=None here,
        # so chains never span a restore and pinned reads fall back to
        # the exact full-manifest diff across that boundary.
        marker = os.path.join(snaps, ".chain_break")
        parent = max(versions, default=None)
        if os.path.exists(marker):
            parent = None
            os.remove(marker)
        if parent is None:
            added, removed = sorted(files), []
        else:
            try:
                _, pm = self._snapshot_manifest(rel, parent)
                pset, fset = set(pm["files"]), set(files)
                added, removed = sorted(fset - pset), sorted(pset - fset)
            except FileNotFoundError:
                parent, added, removed = None, sorted(files), []
        with open(os.path.join(vdir, "delta.json"), "w") as f:
            json.dump(
                {
                    "version": v,
                    "parent": parent,
                    "added": added,
                    "removed": removed,
                    "partition_by": meta.partition_by,
                    "schema_evolved": meta.schema_evolved,
                    "schema_json": meta.schema_json,
                },
                f,
            )
        return v

    def set_snapshot_note(self, rel: Relation, version: int, note: str | None) -> None:
        """Atomically rewrite a snapshot's note (tmp + os.replace). The
        CDC/replica watermark protocol uses this as its COMMIT: the
        snapshot is taken with a '<note>!pending' note before the apply
        and promoted to the real note only after the apply succeeds, so
        a hard crash can never leave an unapplied snapshot as the
        newest watermark (which would make the next run diff from it
        and silently skip the crashed window)."""
        vdir, m = self._snapshot_manifest(rel, version)
        m["note"] = note
        tmp = os.path.join(vdir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(vdir, "manifest.json"))

    def list_snapshots(self, rel: Relation) -> list[dict]:
        """[{version, note, n_files}] ascending; [] when none exist."""
        snaps = self._snapshots_dir(rel)
        if not os.path.isdir(snaps):
            return []
        out = []
        for d in sorted(os.listdir(snaps), key=lambda x: int(x[1:]) if x[1:].isdigit() else -1):
            mf = os.path.join(snaps, d, "manifest.json")
            if os.path.exists(mf):
                with open(mf) as f:
                    m = json.load(f)
                out.append(
                    {
                        "version": m["version"],
                        "note": m.get("note"),
                        "n_files": m["n_files"],
                        # pre-created_at snapshots: the manifest write time
                        # IS the snapshot time (written last, atomically
                        # with the version)
                        "created_at": m.get("created_at", os.path.getmtime(mf)),
                    }
                )
        return out

    def version_as_of(self, rel: Relation, ts: float) -> int:
        """The newest snapshot version whose creation time is <= ``ts``
        (a unix timestamp, UTC) — Delta/Iceberg's TIMESTAMP AS OF
        resolution. Raises if every snapshot is newer than ``ts``."""
        cands = [s for s in self.list_snapshots(rel) if s["created_at"] <= ts]
        if not cands:
            raise FileNotFoundError(
                f"no snapshot of {rel.table_id} at or before {ts}"
            )
        return max(cands, key=lambda s: (s["created_at"], s["version"]))["version"]

    def read_as_of(self, rel: Relation, ts: float) -> DataFrame:
        """TIMESTAMP AS OF time travel: the table as of the newest
        snapshot taken at or before ``ts`` (delete-vector state
        included, via read_version)."""
        return self.read_version(rel, self.version_as_of(rel, ts))

    def _snapshot_manifest(self, rel: Relation, version: int) -> tuple[str, dict]:
        vdir = os.path.join(self._snapshots_dir(rel), f"v{version}")
        mf = os.path.join(vdir, "manifest.json")
        if not os.path.exists(mf):
            raise FileNotFoundError(f"no snapshot v{version} of {rel.table_id}")
        with open(mf) as f:
            return vdir, json.load(f)

    def read_version(self, rel: Relation, version: int) -> DataFrame:
        """Time travel: the table exactly as it was at ``snapshot()``
        time — reads the hardlinked files, unaffected by every write,
        merge, compact or replace since."""
        vdir, m = self._snapshot_manifest(rel, version)
        data = os.path.join(vdir, "data")
        if not m["files"]:
            import pyspark.sql.types as _T

            schema = _T.StructType.fromJson(json.loads(m["schema_json"]))
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if m.get("schema_evolved"):
            reader = reader.option("mergeSchema", "true")
        if m.get("partition_by"):
            # basePath keeps partition-column derivation rooted at data/
            reader = reader.option("basePath", data)
        df = reader.parquet(data)
        # positions reference table-relative paths, which the hardlink
        # farm preserves under data/ — the same anti join applies
        sdel = sorted(
            glob.glob(os.path.join(vdir, "deletes", "*.parquet"))
        )
        return self._merge_deletes(df, sdel, data)

    def _live_data_files(self, rel: Relation) -> list[str]:
        base = self.path(rel)
        pending = self._pending_txids(rel)
        skip = len(base) + 1  # prefix-slice instead of per-file relpath:
        # os.walk roots every dirpath at base, and relpath() is ~20x the
        # cost of the slice (it dominated prune_files at 100k files)
        out = []
        for dirpath, dirs, fnames in os.walk(base):
            dirs[:] = [d for d in dirs if not _is_hidden(d)]
            keep = [
                fn
                for fn in fnames
                if fn.endswith(".parquet")
                and not (pending and _is_pending_file(fn, pending))
            ]
            prefix = dirpath[skip:]
            if prefix:
                out.extend(f"{prefix}/{fn}" for fn in keep)
            else:
                out.extend(keep)
        return sorted(out)

    def _delta_chain(self, rel: Relation, since: int, to: int) -> list[str] | None:
        """Added files in (since, to] from the incremental delta.json
        chain — O(delta) metadata: only the small per-snapshot deltas
        are parsed, never a full file listing. Returns None when the
        chain is broken (an intermediate snapshot was dropped, or a
        pre-delta.json snapshot is involved); the caller falls back to
        the full manifest diff. Sound because every write path creates
        uniquely-named part files: a path is added at most once and
        removed at most once, so union(added) - union(removed) over the
        range equals the full set difference."""
        added: set[str] = set()
        removed: set[str] = set()
        cur = to
        while cur != since:
            dpath = os.path.join(self._snapshots_dir(rel), f"v{cur}", "delta.json")
            if not os.path.exists(dpath):
                return None
            with open(dpath) as f:
                d = json.load(f)
            parent = d.get("parent")
            if parent is None or parent < since:
                return None
            added.update(d["added"])
            removed.update(d["removed"])
            cur = parent
        return sorted(added - removed)

    def read_changes(
        self,
        rel: Relation,
        since_version: int,
        to_version: int | None = None,
        masked: bool = False,
    ) -> DataFrame:
        """Incremental consumption (Iceberg-style changed-file read):
        the rows in data files ADDED after ``since_version`` — up to
        ``to_version``'s snapshot, or the live table when omitted. A
        downstream consumer processes only the new files instead of
        rescanning the table: at 100 TB the nightly delta is a file-list
        diff plus a scan of just those files, and file identity is sound
        because every write path creates uniquely-named part files.

        File-level CDC caveats (same contract as Iceberg's incremental
        append scan): deletes/partition-overwrites are not emitted, and
        a compact() rewrites surviving rows into new files, so they
        reappear — diff across a compaction boundary re-reads them.

        Metadata cost: with ``to_version`` pinned (the run_cdc_refresh
        path), the added-file list comes from the per-snapshot
        delta.json chain — O(delta files) parsed, never a full file
        listing; the monolithic manifest diff is only the fallback when
        the chain is broken (dropped intermediate snapshot /
        pre-delta.json table) or the live table is the target.

        ``masked=True`` additionally anti-joins ``to_version``'s delete
        entries, so a row appended AND positionally deleted within the
        window is NOT emitted — the form a row-level consumer (replica
        sync) needs: the raw default would hand it a row the source
        deleted, with no later delete feed to retract it (entries for
        pre-window files never match added-file rows, so the mask is
        exactly the within-window deletes).
        """
        if to_version is not None and to_version < since_version:
            raise ValueError("to_version must be >= since_version")
        snaps = self._snapshots_dir(rel)
        if not os.path.exists(os.path.join(snaps, f"v{since_version}", "manifest.json")):
            raise FileNotFoundError(f"no snapshot v{since_version} of {rel.table_id}")
        added = None
        if to_version is not None:
            vdir = os.path.join(snaps, f"v{to_version}")
            if not os.path.exists(os.path.join(vdir, "manifest.json")):
                raise FileNotFoundError(f"no snapshot v{to_version} of {rel.table_id}")
            root = os.path.join(vdir, "data")
            dpath = os.path.join(vdir, "delta.json")
            if os.path.exists(dpath):
                with open(dpath) as f:
                    d = json.load(f)
                if "partition_by" in d:  # layout carried by the sidecar
                    chain = self._delta_chain(rel, since_version, to_version)
                    if chain is not None:
                        added = chain
                        meta_partition_by = d.get("partition_by")
                        schema_evolved = d.get("schema_evolved")
                        schema_json = d.get("schema_json")
            if added is None:  # broken chain: full manifest diff
                _, m_since = self._snapshot_manifest(rel, since_version)
                _, m_to = self._snapshot_manifest(rel, to_version)
                added = sorted(set(m_to["files"]) - set(m_since["files"]))
                meta_partition_by = m_to.get("partition_by")
                schema_evolved = m_to.get("schema_evolved")
                schema_json = m_to.get("schema_json")
        else:
            _, m_since = self._snapshot_manifest(rel, since_version)
            to_files, root = self._live_data_files(rel), self.path(rel)
            meta = self.read_meta(rel)
            meta_partition_by = meta.partition_by
            schema_evolved = meta.schema_evolved
            schema_json = meta.schema_json
            added = sorted(set(to_files) - set(m_since["files"]))
        if not added:
            if not schema_json:  # pre-sidecar-schema table: derive from a read
                src = self.read_version(rel, to_version) if to_version else self.read(rel)
                return src.limit(0)
            import pyspark.sql.types as _T

            schema = _T.StructType.fromJson(json.loads(schema_json))
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if schema_evolved:
            reader = reader.option("mergeSchema", "true")
        if meta_partition_by:
            reader = reader.option("basePath", root)
        df = reader.parquet(*(os.path.join(root, f) for f in added))
        if masked:
            df = self._merge_deletes(
                df, self._version_delete_files(rel, to_version), root
            )
        return df

    def _version_delete_files(self, rel: Relation, version: int | None) -> list[str]:
        """Positional-delete parquet files as of a snapshot (hardlinked
        under v<N>/deletes/) or of the live table (None)."""
        if version is None:
            return self._delete_files(rel)
        vdir, _ = self._snapshot_manifest(rel, version)  # raises if absent
        return sorted(glob.glob(os.path.join(vdir, "deletes", "*.parquet")))

    def read_deleted_rows(
        self, rel: Relation, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level delete feed: the FULL CONTENT of rows whose
        positional-delete entries were recorded after ``since_version``
        — up to ``to_version``'s snapshot, or the live table. The
        complement of ``read_changes``: together they are a complete
        changelog (an ``update_where`` shows as delete + insert, the
        Iceberg-v2 changelog-scan semantics).

        Shape: the delete-entry delta is a small anti join of two
        sidecar reads; only the AFFECTED data files are then scanned
        (delete-delta-sized, never the table) and inner-joined on
        (file, position) against the delta (broadcast only while its
        size estimate fits the budget — a long-backlog window falls
        back to a shuffle join) to materialize the deleted rows. Caveat (same file-level boundary as
        read_changes): deletes FOLDED IN during the window — via
        apply_deletes / compact / optimize_layout, which rewrite the
        files and drop the entries — are not emitted; diff across a
        maintenance boundary before it runs, or treat the rewrite as
        the re-baseline it is."""
        if to_version is not None and to_version < since_version:
            raise ValueError("to_version must be >= since_version")
        d_since = self._version_delete_files(rel, since_version)
        d_to = self._version_delete_files(rel, to_version)
        if to_version is not None:
            vdir, m_to = self._snapshot_manifest(rel, to_version)
            root = os.path.join(vdir, "data")
            to_files = set(m_to["files"])
            partition_by = m_to.get("partition_by")
            schema_evolved = m_to.get("schema_evolved")
        else:
            root = self.path(rel)
            to_files = set(self._live_data_files(rel))
            meta = self.read_meta(rel)
            partition_by = meta.partition_by
            schema_evolved = meta.schema_evolved

        def _empty() -> DataFrame:
            src = (
                self.read_version(rel, to_version)
                if to_version is not None
                else self.read(rel)
            )
            return src.limit(0)

        if not d_to:
            return _empty()
        delta = self.spark.read.parquet(*d_to).select("file", "pos")
        if d_since:
            delta = delta.join(
                self._prior_deletes(d_since), ["file", "pos"], "left_anti"
            )
        delta = delta.localCheckpoint(eager=True)
        affected = sorted(
            {r["file"] for r in delta.select("file").distinct().collect()} & to_files
        )
        if not affected:
            return _empty()
        reader = self.spark.read
        if schema_evolved:
            reader = reader.option("mergeSchema", "true")
        if partition_by:
            reader = reader.option("basePath", root)
        scan = reader.parquet(*(os.path.join(root, f) for f in affected))
        cols = scan.columns
        return (
            scan.withColumn("__del_file", self._rel_file_path(root))
            .withColumn("__del_pos", F.col("_metadata.row_index"))
            .join(
                self._gate_broadcast(
                    delta.select(
                        F.col("file").alias("__del_file"),
                        F.col("pos").alias("__del_pos"),
                    ),
                    self._plan_size_bytes(delta),
                ),
                ["__del_file", "__del_pos"],
            )
            .select(*cols)
        )

    def materialize_delete_entries(
        self, rel: Relation, entries: DataFrame
    ) -> DataFrame:
        """FULL rows for a frame of positional delete entries
        (file, pos), scanned from the CURRENT data files — the
        building block the streaming changelog source uses to turn a
        delete-sidecar micro-batch into row-level delete records. Only
        the affected files are opened (entry-delta-sized, never the
        table); entries whose file no longer exists are skipped (the
        same maintenance boundary read_deleted_rows documents)."""
        meta = self.read_meta(rel)
        base = self.path(rel)
        entries = entries.select("file", "pos").localCheckpoint(eager=True)
        affected = sorted(
            {r["file"] for r in entries.select("file").distinct().collect()}
            & set(self._live_data_files(rel))
        )
        if not affected:
            return self.read(rel).limit(0)
        reader = self.spark.read
        if meta.schema_evolved:
            reader = reader.option("mergeSchema", "true")
        if meta.partition_by:
            reader = reader.option("basePath", base)
        scan = reader.parquet(*(os.path.join(base, f) for f in affected))
        cols = scan.columns
        return (
            scan.withColumn("__del_file", self._rel_file_path(base))
            .withColumn("__del_pos", F.col("_metadata.row_index"))
            .join(
                self._gate_broadcast(
                    entries.select(
                        F.col("file").alias("__del_file"),
                        F.col("pos").alias("__del_pos"),
                    ),
                    self._plan_size_bytes(entries),
                ),
                ["__del_file", "__del_pos"],
            )
            .select(*cols)
        )

    def read_changelog(
        self, rel: Relation, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level changelog between two versions (Iceberg
        changelog-scan analogue): appended rows tagged
        ``_change_type='insert'`` (read_changes) unioned with deleted
        rows tagged ``'delete'`` (read_deleted_rows). Within a window,
        applying inserts THEN deletes to the since-state reconstructs
        the to-state exactly — sound because data files are never
        rewritten in place, so a (file, position) can only transition
        live -> deleted, never back; a row both appended and deleted
        inside the window appears once with each tag and nets out. The
        file-level maintenance caveats of both feeds apply."""
        ins = self.read_changes(rel, since_version, to_version).withColumn(
            "_change_type", F.lit("insert")
        )
        dels = self.read_deleted_rows(rel, since_version, to_version).withColumn(
            "_change_type", F.lit("delete")
        )
        return ins.unionByName(dels, allowMissingColumns=True)

    def restore(self, rel: Relation, version: int) -> None:
        """Roll the table back to a snapshot: current data files are
        replaced by hardlinks to the snapshot's (directory operations
        only); the meta sidecar reverts to the manifest's layout; the
        profile baseline and other snapshots are left untouched."""
        vdir, m = self._snapshot_manifest(rel, version)
        base = self.path(rel)
        # clear current data (keep sidecars: _ and . prefixed)
        for entry in os.listdir(base):
            if _is_hidden(entry):
                continue
            p = os.path.join(base, entry)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        for relp in m["files"]:
            src = os.path.join(vdir, "data", relp)
            dst = os.path.join(base, relp)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.link(src, dst)
        # the delete sidecar is version state: replace the live one with
        # the snapshot's (a post-snapshot delete must be undone; a
        # pre-snapshot delete must survive the rollback)
        shutil.rmtree(self._deletes_dir(rel), ignore_errors=True)
        sdel = os.path.join(vdir, "deletes")
        if os.path.isdir(sdel):
            os.makedirs(self._deletes_dir(rel), exist_ok=True)
            for fn in os.listdir(sdel):
                os.link(
                    os.path.join(sdel, fn), os.path.join(self._deletes_dir(rel), fn)
                )
        meta = self.read_meta(rel)
        meta.partition_by = m.get("partition_by")
        meta.schema_evolved = bool(m.get("schema_evolved", False))
        meta.schema_json = m.get("schema_json")
        self.write_meta(rel, meta)
        # restored paths are RE-ADDED: break the incremental-manifest
        # chain at the next snapshot (see snapshot()) so pinned
        # read_changes never applies add-once set algebra across this
        with open(os.path.join(self._snapshots_dir(rel), ".chain_break"), "w"):
            pass

    def expire_snapshots(
        self,
        rel: Relation,
        keep_last: int = 1,
        protect_note_prefix: str = "cdc:",
        min_age_s: float | None = None,
    ) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (frees the
        hardlinked bytes once no snapshot references them). Returns the
        dropped version numbers.

        Snapshots whose note starts with ``protect_note_prefix`` are
        exempt and don't count toward ``keep_last``: they are another
        pipeline's CDC watermarks (run_cdc_refresh), and a blanket
        expiry — e.g. the Runner's pre-write keep_last on a table that
        is ALSO a CDC source — must not silently demote that consumer
        to a full-table rescan. Watermarks have their own lifecycle
        (advanced + dropped selectively by the refresh itself); pass
        ``protect_note_prefix=None`` to expire unconditionally.

        ``min_age_s`` is an additional retention floor (Delta's RETAIN):
        snapshots younger than it are kept even beyond ``keep_last`` —
        the guard that makes scheduled expiry safe next to consumers
        still reading a just-taken version."""
        if keep_last < 0:
            raise ValueError("keep_last must be >= 0")
        import time as _time

        cutoff = None if min_age_s is None else _time.time() - min_age_s
        versions = [
            m["version"]
            for m in self.list_snapshots(rel)
            if not (
                protect_note_prefix
                and (m.get("note") or "").startswith(protect_note_prefix)
            )
            and (cutoff is None or m["created_at"] <= cutoff)
        ]
        drop = versions[: max(0, len(versions) - keep_last)]
        for v in drop:
            shutil.rmtree(os.path.join(self._snapshots_dir(rel), f"v{v}"), ignore_errors=True)
        return drop

    def drop_snapshot(self, rel: Relation, version: int) -> None:
        """Drop ONE snapshot version (selective — unlike expire_snapshots'
        keep-newest-N, this never touches other consumers' versions;
        the CDC refresh bookkeeping drops exactly its own superseded
        watermark snapshot)."""
        vdir, _ = self._snapshot_manifest(rel, version)  # raises if absent
        shutil.rmtree(vdir, ignore_errors=True)

    def clone(self, src: Relation, dst: Relation) -> dict:
        """Zero-copy table clone (Delta SHALLOW CLONE analogue): every
        data file hardlinked into ``dst`` preserving partition layout;
        sidecars (_edna_meta.json, _edna_profile/, any _/.-prefixed
        entry) are COPIED because write_meta truncates in place — a
        hardlinked meta would corrupt both tables on the first write.

        The clone is fully independent afterwards: writes replace files
        rather than mutating them, so overwriting/merging/compacting one
        side never changes the other (same inode-survival property the
        snapshot farm relies on). This is the dev/ci workflow the
        reference serves with dataset rewriting (macros/
        generate_schema_name.sql:5-12 dev/ci prefixes): materialize a
        production table once, clone it
        into the dev schema for free, iterate there. Snapshots are NOT
        cloned — they belong to the source's history.
        """
        base = self.path(src)
        if not self.exists(src):
            raise FileNotFoundError(f"cannot clone missing table {src.table_id}")
        if self.exists(dst):
            raise FileExistsError(f"clone target {dst.table_id} already exists")
        dbase = self.path(dst)
        n_files = 0
        try:
            for dirpath, dirs, fnames in os.walk(base):
                dirs[:] = [d for d in dirs if not _is_hidden(d)]
                for fn in fnames:
                    if fn.endswith(".parquet"):
                        relp = os.path.relpath(os.path.join(dirpath, fn), base)
                        d = os.path.join(dbase, relp)
                        os.makedirs(os.path.dirname(d), exist_ok=True)
                        os.link(os.path.join(dirpath, fn), d)
                        n_files += 1
            os.makedirs(dbase, exist_ok=True)  # empty-table clone
            for entry in os.listdir(base):
                if not _is_hidden(entry):
                    continue
                s, d = os.path.join(base, entry), os.path.join(dbase, entry)
                shutil.copytree(s, d) if os.path.isdir(s) else shutil.copy(s, d)
        except Exception:
            shutil.rmtree(dbase, ignore_errors=True)  # no half-clones
            raise
        return {"table": dst.table_id, "n_files": n_files}

    # --- introspection (the INFORMATION_SCHEMA analogues) ------------------
    def partitions(self, rel: Relation) -> list[str]:
        """Partition values present on disk (directory listing — no data
        scan; reference reads INFORMATION_SCHEMA.PARTITIONS,
        log_helpers.sql:307-318)."""
        meta = self.read_meta(rel)
        if not meta.partition_by:
            return []
        prefix = meta.partition_by + "="
        out = []
        for d in os.listdir(self.path(rel)):
            if d.startswith(prefix):
                out.append(d[len(prefix):])
        return sorted(out)

    def size_info(self, rel: Relation) -> dict[str, int]:
        """row_count / size_bytes (reference: __TABLES__ scan,
        register_dataproduct_metadata.sql:35-49)."""
        total = 0
        for dirpath, dirs, files in os.walk(self.path(rel)):
            dirs[:] = [d for d in dirs if not _is_hidden(d)]  # sidecars
            for fn in files:
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(dirpath, fn))
        return {"row_count": self.read(rel).count(), "size_bytes": total}

    def distinct_partition_dates(self, df: DataFrame, partition_field: str) -> list[str]:
        """Touched-partition discovery on a batch: SELECT DISTINCT
        DATE(field) — collected to the driver and inlined as literals in the
        merge filter (manual dynamic partition pruning; reference:
        macros/utils/partition_helpers.sql:18-31)."""
        rows = (
            df.select(F.to_date(F.col(partition_field)).alias("part_date"))
            .where(F.col("part_date").isNotNull())
            .distinct()
            .collect()
        )
        return sorted(str(r["part_date"]) for r in rows)
