"""Partitioned-Parquet instance store with MERGE semantics.

Implements the instance-connector contract surface the reference defines in
meerschaum/connectors/instance/_pipes.py:17-665 (sync/read/clear/dedup/drop)
on a directory of hive-partitioned parquet. The physical layout IS the
reference's epoch-aligned range-partition grid
(connectors/sql/_partition.py:26-942): one directory per
``chunk_minutes``-wide epoch cell, keyed by ``_mrsm_part = floor(epoch_us /
width_us)``.

Scale notes (designed for 100 TB / 1000 executors, tested on local[32]):
  * Reads pass an explicit schema (no footer inference) and prune on the
    partition column, so a time-bounded read lists/opens only the matching
    partition directories.
  * MERGE rewrites only the partitions the patch touches: affected cells are
    computed from the patch, the existing rows of those cells are anti-joined
    against patch keys (null-safe), and keep ∪ patch is written to a staging
    dir then swapped in per-partition. Work is proportional to the patch's
    time-range, never the table size.
  * Appends of unseen rows are plain file adds (no rewrite) — the common
    incremental-sync case costs one write of the new rows.
  * Writes are cross-process safe (r11): every mutation holds a per-table
    flock (``locking.ProcessLock`` — the local stand-in for the reference's
    per-sync DB transaction, connectors/sql/_pipes.py:2217-2809), and the
    staging swap publishes a fsync'd manifest before its renames so a
    writer killed mid-swap is rolled FORWARD by the next lock holder
    (``recover_interrupted_swap``). On a real cluster the staging swap
    would be a transactional commit (Delta/Iceberg); the layout and
    pruning strategy carry over unchanged.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meerschaum_spark.chunks import DEFAULT_CHUNK_MINUTES
from meerschaum_spark.dtypes import UNIT_US, normalize_unit, to_spark_type
from meerschaum_spark.locking import ProcessLock, process_lock
from meerschaum_spark.params import sql_in_condition

EXISTS_TTL_SECONDS = 60.0  # reference config/_default.py:244-258
PART_COL = "_mrsm_part"
NULL_PART_DIR = f"{PART_COL}=__HIVE_DEFAULT_PARTITION__"
#: swap-commit manifest: present (state "begin") exactly for the
#: duration of a staging swap's rename window; a crashed writer leaves
#: it behind and the next lock holder ROLLS the swap FORWARD from it
MANIFEST_NAME = "_swap_manifest.json"


class ParquetPipeStore:
    """One pipe's physical table: ``<root>/<target>/data/_mrsm_part=N/*.parquet``."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        target: str,
        dt_col: str | None = None,
        dt_is_int: bool = False,
        dt_unit: str = "microsecond",
        chunk_minutes: int = DEFAULT_CHUNK_MINUTES,
        lock_path: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self.target = target
        self.dt_col = dt_col
        self.dt_is_int = dt_is_int
        self.dt_unit = normalize_unit(dt_unit)
        self.chunk_minutes = int(chunk_minutes)
        self.width_us = self.chunk_minutes * 60_000_000
        #: lock under ANOTHER table's lockfile (ADVICE r11): a side
        #: table NESTED inside a base pipe directory (annidx,
        #: rollup_*) must share the BASE pipe's lock — its own
        #: lockfile would live at <pipe-dir>/.locks/<side>.lock,
        #: INSIDE the directory the base drop() rmtrees, so a
        #: side-store-only holder (another process's read→recover)
        #: could be mid-rename while drop() deletes under it. One
        #: lock per pipe covers base + side tables; re-entrancy makes
        #: the nested acquires free.
        self._lock_path = lock_path
        self._exists_cache: tuple[bool, float] | None = None

    # -- paths -------------------------------------------------------------

    @property
    def path(self) -> str:
        return os.path.join(self.root, self.target)

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "data")

    # -- cross-process commit protocol --------------------------------------

    @property
    def lock(self) -> ProcessLock:
        """Per-table cross-process write lock (``<root>/.locks/``),
        shared with ``Pipe._write_lock``: flock across OS processes,
        re-entrant RLock within one. Every store mutation holds it for
        its read-modify-write, so two drivers syncing the same pipe
        serialize exactly like the reference's per-sync DB transaction
        (connectors/sql/_pipes.py:2217-2809). Nested side stores share
        their base pipe's lock via ``lock_path`` (see ``__init__``)."""
        return process_lock(self._lock_path or self.path)

    def _manifest_path(self) -> str:
        return os.path.join(self.path, MANIFEST_NAME)

    def _write_manifest(self, doc: dict) -> None:
        """Atomically publish the swap manifest (tmp + rename + fsync):
        written AFTER the staged parquet is complete and BEFORE the
        first rename, so its presence always means 'staging holds the
        full new state for the listed cells — roll forward'."""
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())

    def _clear_manifest(self) -> None:
        try:
            os.remove(self._manifest_path())
        except FileNotFoundError:
            pass

    def _maybe_recover(self) -> None:
        """Cheap fast-path probe (one isfile) callers sprinkle before
        reads/mutations; the slow path only runs when a dead writer
        actually left a manifest behind."""
        if os.path.isfile(self._manifest_path()):
            self.recover_interrupted_swap()

    def recover_interrupted_swap(self) -> bool:
        """Roll FORWARD a swap whose writer died mid-commit.

        The manifest is only ever written once the staged parquet is
        complete, so the staged cells/files ARE the committed new state:
        recovery finishes the renames (idempotently — a cell already
        moved has no staging source left; a remove-only cell's rmtree
        re-runs harmlessly), clears the manifest, and deletes staging.
        Rolling back is impossible by construction — the interrupted
        writer may already have destroyed destination cells.

        Returns True when a recovery was performed. Safe to call any
        time: takes the write lock, so it cannot fire while the writer
        is alive mid-swap (the writer holds the lock for the whole
        window), and re-checks the manifest under the lock."""
        if not os.path.isfile(self._manifest_path()):
            return False
        with self.lock:
            try:
                with open(self._manifest_path()) as f:
                    doc = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                return False  # writer finished, or torn tmp never published
            staging_name = str(doc.get("staging", ""))
            if not re.fullmatch(r"_staging_[0-9a-f]{12}", staging_name):
                # A manifest that parses as JSON but carries a
                # missing/empty/foreign 'staging' field is TORN, not a
                # commit record (ADVICE r11): trusting it would make
                # staging == self.path and the 'overwrite' branch would
                # rmtree the data dir then rename the table into its own
                # child — refuse any destructive action, clear the
                # malformed manifest, and let the caller proceed on the
                # (still intact) published state.
                self._clear_manifest()
                return False
            staging = os.path.join(self.path, staging_name)
            kind = doc.get("kind")
            if kind == "cells":
                for name in doc.get("staged", []):
                    src = os.path.join(staging, name)
                    dst = os.path.join(self.data_path, name)
                    if os.path.isdir(src):
                        if os.path.isdir(dst):
                            shutil.rmtree(dst)
                        shutil.move(src, dst)
                for name in doc.get("removed", []):
                    dst = os.path.join(self.data_path, name)
                    if os.path.isdir(dst):
                        shutil.rmtree(dst)
            elif kind == "files":
                for rel in doc.get("remove", []):
                    try:
                        os.remove(os.path.join(self.data_path, rel))
                    except FileNotFoundError:
                        pass
                for src_rel, dst_rel in doc.get("moves", []):
                    src = os.path.join(staging, src_rel)
                    dst = os.path.join(self.data_path, dst_rel)
                    if os.path.isfile(src):
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        if not os.path.isfile(dst):  # same-fs rename: at
                            shutil.move(src, dst)    # most one side exists
            elif kind == "overwrite":
                if os.path.isdir(staging):
                    if os.path.isdir(self.data_path):
                        shutil.rmtree(self.data_path)
                    os.replace(staging, self.data_path)
            self._clear_manifest()
            if os.path.isdir(staging):
                shutil.rmtree(staging, ignore_errors=True)
            self._mark_exists(self._exists_uncached())
            self._refresh_listing()
            return True

    def exists(self, refresh: bool = False) -> bool:
        """Directory probe with a TTL cache (reference caches ``exists``
        for 60 s, core/Pipe/_cache.py + config/_default.py:244-258): on a
        busy driver the per-call listing dominates small-sync latency.
        Local writes update the cache in place; external writers are
        covered by expiry.

        ``refresh=True`` bypasses the cache — write paths whose behavior
        forks on existence (first-sync append vs diff) must probe fresh:
        a stale False cached up to TTL seconds before another writer
        created the table would otherwise append without diffing."""
        now = time.monotonic()
        if not refresh and self._exists_cache is not None:
            val, ts = self._exists_cache
            if now - ts < EXISTS_TTL_SECONDS:
                return val
        val = self._exists_uncached()
        self._exists_cache = (val, now)
        return val

    def _exists_uncached(self) -> bool:
        if not os.path.isdir(self.data_path):
            return False
        for entry in os.scandir(self.data_path):
            if entry.is_dir() and entry.name.startswith(f"{PART_COL}="):
                return True
        return False

    def _mark_exists(self, val: bool) -> None:
        self._exists_cache = (val, time.monotonic())

    def _refresh_listing(self) -> None:
        """Invalidate Spark's cached file listing/data for this table.
        Spark shares a FileStatusCache across queries with no TTL: after a
        partition rewrite a plan can reference deleted files
        (FAILED_READ_FILE), and after an append it can silently MISS the
        new files. Every mutation must end with this."""
        try:
            self.spark.catalog.refreshByPath(self.data_path)
        except Exception:
            pass  # path may not exist yet

    # -- partition key -----------------------------------------------------

    def _epoch_us_col(self) -> F.Column:
        c = F.col(self.dt_col)
        if self.dt_is_int:
            return (c.cast("long") * F.lit(UNIT_US[self.dt_unit])).cast("long")
        return F.unix_micros(c)

    def _epoch_us_sql(self) -> str:
        q = "`" + self.dt_col.replace("`", "``") + "`"
        if self.dt_is_int:
            return f"(cast({q} as bigint) * {UNIT_US[self.dt_unit]})"
        return f"unix_micros({q})"

    def part_expr(self) -> F.Column:
        """The partition-cell expression, exact int64 end to end: floor
        division spelled as subtract-nonneg-remainder + truncating
        ``div`` (the engine's cross-engine discipline). The previous
        ``floor(epoch / width)`` float division is lossy above 2^53 µs
        and disagreed with the driver-side ``part_index_of``'s exact
        ``//`` at extreme epochs — the partition key must never touch a
        double. pmod keeps negative int-axis epochs flooring like
        ``//``."""
        e = self._epoch_us_sql()
        w = self.width_us
        return F.expr(f"(({e}) - pmod(({e}), {w})) div {w}").cast("long")

    def with_part(self, df: DataFrame) -> DataFrame:
        if self.dt_col is None or self.dt_col not in df.columns:
            return df.withColumn(PART_COL, F.lit(0).cast("long"))
        return df.withColumn(PART_COL, self.part_expr())

    def part_index_of(self, epoch_us: int) -> int:
        return epoch_us // self.width_us

    # -- schema ------------------------------------------------------------

    def read_schema(self, dtypes: dict[str, str] | None) -> T.StructType | None:
        """Explicit read schema from registered dtypes (+ partition col).

        Passing a schema skips footer inference — at 100 TB, inference would
        list and open every file before the first byte of real work.
        """
        if not dtypes:
            return None
        fields = [T.StructField(c, to_spark_type(dt), True) for c, dt in dtypes.items()]
        fields.append(T.StructField(PART_COL, T.LongType(), True))
        return T.StructType(fields)

    # -- read --------------------------------------------------------------

    def read(
        self,
        dtypes: dict[str, str] | None = None,
        begin_us: int | None = None,
        end_us: int | None = None,
        keep_part_col: bool = False,
        part_values: Iterable[Any] | None = None,
    ) -> DataFrame:
        """Scan the table with partition pruning from epoch-µs bounds.

        ``end_us`` is exclusive (matching the engine-wide bound contract).
        """
        self._maybe_recover()  # one isfile; heals a dead writer's swap
        if not self.exists():
            schema = self.read_schema(dtypes) or T.StructType([])
            empty = self.spark.createDataFrame([], schema)
            return empty if keep_part_col else empty.drop(PART_COL)
        reader = self.spark.read
        schema = self.read_schema(dtypes)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(self.data_path)
        if begin_us is not None:
            df = df.filter(F.col(PART_COL) >= self.part_index_of(begin_us))
        if end_us is not None:
            df = df.filter(F.col(PART_COL) <= self.part_index_of(end_us - 1))
        if part_values is not None:
            vals = list(part_values)
            non_null = [v for v in vals if v is not None]
            cond = (sql_in_condition(PART_COL, non_null)
                    if non_null else F.lit(False))
            if any(v is None for v in vals):
                cond = cond | F.col(PART_COL).isNull()
            df = df.filter(cond)
        return df if keep_part_col else df.drop(PART_COL)

    # -- write paths -------------------------------------------------------

    def _observe_rows(self, df: DataFrame):
        """Attach a row-count Observation that rides the write job itself.
        Returns ``(df, getter)``; ``getter()`` yields the written row count
        or ``None`` when metrics are unavailable (foreachBatch-detached
        sessions, where ``Observation.get`` cannot see the listener row).

        Why: the post-write existence refresh must distinguish "rows
        landed" (table certainly exists — no probe needed) from "empty
        frame wrote no partition dirs" (must re-probe, or the cached True
        poisons the next read — the replace_range property-test bug). An
        UNCONDITIONAL listing per write is an object-storage API
        round-trip on every small maintenance write (rollup/verify issue
        many per sync), so the count rides the job for free and the
        listing runs only on the rare empty/unknown outcome."""
        from pyspark.sql import Observation
        obs = Observation()
        observed = df.observe(obs, F.count(F.lit(1)).alias("_n"))

        def getter() -> int | None:
            try:
                return int(obs.get["_n"])
            except Exception:
                return None
        return observed, getter

    def _post_write_exists(self, n_written: int | None) -> None:
        """Refresh the exists cache after a write: a positive observed
        count proves existence without touching storage; an empty or
        unobservable write re-probes (see ``_observe_rows``)."""
        if n_written is not None and n_written > 0:
            self._mark_exists(True)
        else:
            self._mark_exists(self._exists_uncached())

    def _data_files(self) -> set:
        """All parquet data-file paths (driver-side listing)."""
        out: set = set()
        if not os.path.isdir(self.data_path):
            return out
        for entry in os.scandir(self.data_path):
            if not entry.is_dir() or not entry.name.startswith(f"{PART_COL}="):
                continue
            for f in os.scandir(entry.path):
                if f.is_file() and f.name.endswith(".parquet"):
                    out.add(f.path)
        return out

    def append(self, df: DataFrame,
               new_files: list | None = None) -> None:
        """File-add append of rows known to be unseen (no rewrite).

        Pass ``new_files=[]`` to receive the file paths this append
        created (a before/after listing pair) — the written-rows set AS
        FILES, which rollup delta maintenance aggregates instead of
        rescanning base-table buckets. Callers opt in because the two
        listings are API round-trips on object storage."""
        with self.lock:
            self._maybe_recover()
            before = self._data_files() if new_files is not None else None
            observed, n_written = self._observe_rows(df)
            out = self._rebalanced(self.with_part(observed))
            out.write.mode("append").partitionBy(PART_COL).parquet(
                self.data_path)
            if new_files is not None:
                new_files.extend(sorted(self._data_files() - before))
            self._post_write_exists(n_written())
            self._refresh_listing()

    def _rebalanced(self, df: DataFrame) -> DataFrame:
        """REBALANCE(_mrsm_part) before a partitioned write: AQE coalesces
        a small sync's N task-outputs into one file per partition cell
        (instead of tasks × cells small files that every later backtrack
        scan and merge re-lists), and splits skewed cells of a bulk load
        into multiple right-sized files. This is the standard AQE answer
        to the dynamic-partition small-files problem. When AQE is off
        (the low-latency sync window) fall back to a plain
        repartition(_mrsm_part): one task — one file — per touched cell,
        which is the right shape for a small incremental sync (few cells,
        tiny shuffle) and keeps every later backtrack scan from paying a
        tasks × cells small-file listing."""
        try:
            aqe = self.spark.conf.get("spark.sql.adaptive.enabled")
        except Exception:
            aqe = "true"
        if str(aqe).lower() != "true":
            return df.repartition(F.col(PART_COL))
        return df.hint("rebalance", PART_COL)

    def overwrite(self, df: DataFrame) -> None:
        """Full-table replace (staged + manifest-committed when replacing
        live data: the rmtree/replace pair is two steps — a writer dying
        between them is rolled forward from the manifest)."""
        with self.lock:
            self._maybe_recover()
            observed, n_written = self._observe_rows(df)
            out = self._rebalanced(self.with_part(observed))
            if os.path.isdir(self.data_path):
                staging = self._staging_dir()
                out.write.mode("overwrite").partitionBy(PART_COL).parquet(
                    staging)
                self._write_manifest({
                    "txn": uuid.uuid4().hex, "kind": "overwrite",
                    "staging": os.path.basename(staging),
                })
                shutil.rmtree(self.data_path)
                os.replace(staging, self.data_path)
                self._clear_manifest()
            else:
                out.write.mode("overwrite").partitionBy(PART_COL).parquet(
                    self.data_path
                )
            self._post_write_exists(n_written())
            self._refresh_listing()

    def merge(
        self,
        patch: DataFrame,
        keys: list[str],
        dtypes: dict[str, str] | None = None,
        begin_us: int | None = None,
        end_us: int | None = None,
        parts: list | None = None,
    ) -> None:
        """Upsert ``patch`` on ``keys``: delete-matching + insert, rewriting
        only affected partitions.

        Equivalent of the reference's per-flavor MERGE templates
        (meerschaum/utils/sql.py:74-236, get_update_queries :1667-1991) and of
        Delta ``MERGE INTO`` with a partition-pruning merge condition. Key
        equality is null-safe (``eqNullSafe``), replacing the reference's
        COALESCE-sentinel machinery (utils/sql.py:1994-2045).

        When the caller already knows the patch's time bounds
        (``begin_us``/``end_us``, exclusive end — sync's diff computed them
        anyway), the existing side prunes STATICALLY on the partition
        column and the swap list comes from the staging directory after
        the write — the whole merge is then ONE Spark action. Without
        bounds, the affected-partition list is collected from the patch
        first (one extra small action), exactly the reference's
        MERGE date-bound pre-filter shape (utils/sql.py:1920-1933).

        ``parts`` (caller-known affected CELL list, e.g. observed from
        the sync diff job): prunes the existing side to exactly those
        partition cells with NO extra action and NO contiguous-window
        assumption — the right path for SCATTERED patches (late
        corrections spread across history), where a [min, max] window
        covers the whole table and the footer-range file pruning
        degenerates to touching every file.

        Holds the cross-process lock for the WHOLE read-modify-write
        (listing, footer stats, anti-join, swap): two drivers merging
        the same pipe serialize like the reference's DB transaction.
        """
        with self.lock:
            self._maybe_recover()
            self._merge_locked(patch, keys, dtypes=dtypes,
                               begin_us=begin_us, end_us=end_us,
                               parts=parts)

    def _merge_locked(
        self,
        patch: DataFrame,
        keys: list[str],
        dtypes: dict[str, str] | None = None,
        begin_us: int | None = None,
        end_us: int | None = None,
        parts: list | None = None,
    ) -> None:
        if not self.exists():
            self.append(patch)
            return
        # Partial-column patches that omit the partition-driving datetime
        # column MUST recover it before _mrsm_part is computed — otherwise
        # every patch row lands in partition 0, the true partitions keep
        # their stale rows, and pruned reads go wrong. Re-attach dt_col (and
        # any other missing columns) first via a column-pruned key join
        # against the whole table; this is the only merge shape that cannot
        # be partition-scoped, because the patch carries no time bounds.
        if (
            self.dt_col is not None
            and self.dt_col not in patch.columns
            and self.dt_col not in keys
        ):
            full = self.read(dtypes=dtypes, keep_part_col=False)
            missing_pre = [c for c in full.columns if c not in patch.columns]
            patch = self._reattach(patch, full, keys, missing_pre)
        patch = self.with_part(patch)
        if parts is not None:
            if not parts:
                return
            existing = self.read(dtypes=dtypes, keep_part_col=True,
                                 part_values=parts)
        elif begin_us is not None and end_us is not None:
            # file-level pruning inside the affected cells: parquet footer
            # min/max of the dt column decides which FILES can hold a
            # matchable row (key sets include dt on this path, so a row
            # matching a patch key has the patch row's dt — a file whose
            # dt range misses [begin_us, end_us) cannot participate).
            # Untouched files stay in place; the rewrite is proportional
            # to overlapping files, not to the cell width — the same
            # economics as Delta's file-pruned MERGE.
            touched, untouched = self._split_files_by_dt(
                begin_us, end_us)
            if touched is not None and untouched:
                self._merge_files(patch, keys, dtypes, touched)
                return
            parts = None
            existing = self.read(dtypes=dtypes, keep_part_col=True,
                                 begin_us=begin_us, end_us=end_us)
        else:
            # Affected partitions: small driver-side list (bounded by the
            # patch's time range / chunk width — the analogue of MERGE
            # date-bound pruning).
            parts = [r[0] for r in patch.select(PART_COL).distinct().collect()]
            if not parts:
                return
            existing = self.read(dtypes=dtypes, keep_part_col=True,
                                 part_values=parts)

        # Partial-column patches: re-attach the stored values of columns the
        # patch does not carry (reference J7, core/Pipe/_sync.py:993-1006 —
        # an update must not null out unmentioned columns), via a bounded
        # left join on the merge keys.
        missing = [c for c in existing.columns
                   if c not in patch.columns and c != PART_COL]
        if missing:
            patch = self._reattach(patch, existing, keys, missing)

        p = patch.alias("p")
        e = existing.alias("e")
        cond = None
        for k in keys:
            c = F.col(f"e.{k}").eqNullSafe(F.col(f"p.{k}"))
            cond = c if cond is None else (cond & c)
        keep = e.join(p, on=cond, how="left_anti")
        # column union — kept rows MUST NOT lose columns absent from the patch
        merged = keep.unionByName(patch, allowMissingColumns=True)
        self._swap_partitions(merged, parts)

    def _split_files_by_dt(
        self, begin_us: int, end_us: int,
    ) -> tuple[list[str] | None, list[str]]:
        """Partition the data files of the in-range cells into (touched,
        untouched) by parquet footer dt statistics. Returns
        ``(None, [])`` when pruning is unavailable (no dt column, a file
        without stats) — callers then fall back to the cell-level path.

        Driver-side footer reads are bounded by the patch's time range
        (files of the matching cells only); on a cluster this is the
        table-format metadata lookup Delta/Iceberg do from their
        manifests."""
        if self.dt_col is None:
            return None, []
        lo_cell = self.part_index_of(begin_us)
        hi_cell = self.part_index_of(end_us - 1)
        touched: list[str] = []
        untouched: list[str] = []
        try:
            import pyarrow.parquet as pq
        except Exception:
            return None, []
        for cell in self.partition_values():
            if cell is None or not (lo_cell <= cell <= hi_cell):
                continue
            cell_dir = os.path.join(self.data_path, self._part_dir_name(cell))
            for entry in os.scandir(cell_dir):
                if not entry.is_file() or not entry.name.endswith(".parquet"):
                    continue
                rng = self._file_dt_range_us(pq, entry.path)
                if rng is None:
                    return None, []  # no stats → cannot prune safely
                fmin, fmax = rng
                # overlap test against the exclusive-end patch range
                if fmin < end_us and fmax >= begin_us:
                    touched.append(entry.path)
                else:
                    untouched.append(entry.path)
        return touched, untouched

    def _file_dt_range_us(self, pq, path: str) -> tuple[int, int] | None:
        """[min, max] of the dt column across a file's row groups, in
        epoch µs (or the int axis scaled to µs); None when stats are
        missing."""
        import datetime as _dt
        try:
            meta = pq.ParquetFile(path).metadata
            if meta.num_row_groups == 0:
                # zero rows → can never match; an empty (inverted) range
                # makes every overlap test false
                return (2**62, -(2**62))
            rg0 = meta.row_group(0)
            idx = None
            for i in range(rg0.num_columns):
                if rg0.column(i).path_in_schema == self.dt_col:
                    idx = i
                    break
            if idx is None:
                return None
            lo = hi = None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mn, mx = st.min, st.max
                for v in (mn, mx):
                    if v is None:
                        return None
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            if lo is None:
                return None

            def _us(v) -> int:
                if isinstance(v, _dt.datetime):
                    if v.tzinfo is not None:
                        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                    return int((v - _dt.datetime(1970, 1, 1)).total_seconds()
                               * 1_000_000)
                return int(v) * UNIT_US[self.dt_unit] if self.dt_is_int \
                    else int(v)
            return _us(lo), _us(hi)
        except Exception:
            return None

    def _merge_files(
        self,
        patch: DataFrame,
        keys: list[str],
        dtypes: dict[str, str] | None,
        touched: list[str],
    ) -> None:
        """Merge against an explicit file set: anti-join only the touched
        files' rows, write keep ∪ patch to staging, then swap at FILE
        granularity — delete the touched files and move the staged ones
        in beside the untouched files."""
        if touched:
            reader = self.spark.read.option("basePath", self.data_path)
            schema = self.read_schema(dtypes)
            if schema is not None:
                reader = reader.schema(schema)
            existing = reader.parquet(*touched)
        else:
            schema = self.read_schema(dtypes) or patch.schema
            existing = self.spark.createDataFrame([], schema)
        missing = [c for c in existing.columns
                   if c not in patch.columns and c != PART_COL]
        if missing:
            patch = self._reattach(patch, existing, keys, missing)
        p = patch.alias("p")
        e = existing.alias("e")
        cond = None
        for k in keys:
            c = F.col(f"e.{k}").eqNullSafe(F.col(f"p.{k}"))
            cond = c if cond is None else (cond & c)
        keep = e.join(p, on=cond, how="left_anti")
        merged = keep.unionByName(patch, allowMissingColumns=True)
        staging = self._staging_dir()
        committed = False
        try:
            (self._rebalanced(merged)
             .write.mode("overwrite").partitionBy(PART_COL).parquet(staging))
            # plan the file-granular swap up front (final names fixed
            # BEFORE the manifest) so a crashed writer's moves replay
            # deterministically from the manifest
            moves: list[list[str]] = []
            if os.path.isdir(staging):
                for entry in os.scandir(staging):
                    if (not entry.is_dir()
                            or not entry.name.startswith(f"{PART_COL}=")):
                        continue
                    for f in os.scandir(entry.path):
                        if f.is_file() and f.name.endswith(".parquet"):
                            moves.append([
                                os.path.join(entry.name, f.name),
                                os.path.join(
                                    entry.name,
                                    f"m{uuid.uuid4().hex[:8]}-{f.name}")])
            self._write_manifest({
                "txn": uuid.uuid4().hex, "kind": "files",
                "staging": os.path.basename(staging),
                "remove": [os.path.relpath(p, self.data_path)
                           for p in touched],
                "moves": moves,
            })
            # staged files move in, touched files go
            for path in touched:
                try:
                    os.remove(path)
                except OSError:
                    pass
            for src_rel, dst_rel in moves:
                dst = os.path.join(self.data_path, dst_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(os.path.join(staging, src_rel), dst)
            self._clear_manifest()
            committed = True
        except BaseException:
            try:
                self.recover_interrupted_swap()
            except Exception:
                pass
            raise
        finally:
            if committed or not os.path.isfile(self._manifest_path()):
                shutil.rmtree(staging, ignore_errors=True)
        # callers guarantee ``untouched`` is non-empty (merge() falls back
        # to the cell-level path otherwise), so the table cannot have been
        # emptied by this swap — no listing probe needed
        self._mark_exists(True)
        self._refresh_listing()

    @staticmethod
    def _reattach(
        patch: DataFrame,
        existing: DataFrame,
        keys: list[str],
        missing: list[str],
    ) -> DataFrame:
        """Left-join the stored values of ``missing`` columns onto ``patch``
        by null-safe key equality (reference J7 partial-column update)."""
        if not missing:
            return patch
        e_m = existing.select(*keys, *missing).alias("em")
        p_m = patch.alias("pm")
        cond_m = None
        for k in keys:
            c = F.col(f"pm.{k}").eqNullSafe(F.col(f"em.{k}"))
            cond_m = c if cond_m is None else (cond_m & c)
        return p_m.join(e_m, on=cond_m, how="left").select(
            *[F.col(f"pm.{c}") for c in patch.columns],
            *[F.col(f"em.{c}").alias(c) for c in missing],
        )

    def replace_range(self, df: DataFrame, begin_us: int, end_us: int,
                      dtypes: dict[str, str] | None = None) -> None:
        """Atomically replace every stored row whose dt epoch lies in
        ``[begin_us, end_us)`` with ``df`` (whose rows must all lie in
        that range — the caller's recompute supersedes the window).

        The fused form of ``delete_where(range)`` + ``append(df)`` used
        by rollup maintenance: ONE job (keep-outside-range ∪ new rows)
        and ONE partition swap instead of two of each, with no window
        where the range is empty. Cells the recompute emptied are
        removed by the swap's ``also_remove`` list; cells that only the
        new rows populate come from the staging listing."""
        with self.lock:
            self._maybe_recover()
            self._replace_range_locked(df, begin_us, end_us, dtypes=dtypes)

    def _replace_range_locked(self, df: DataFrame, begin_us: int,
                              end_us: int,
                              dtypes: dict[str, str] | None = None) -> None:
        if not self.exists():
            self.append(df)
            return
        p_lo = self.part_index_of(begin_us)
        p_hi = self.part_index_of(end_us - 1)
        # stored cells overlapping the range — from the directory
        # listing, no Spark job (null-dt rows live in the null cell,
        # which a bounded range never touches)
        affected: list[int] = []
        for entry in os.scandir(self.data_path):
            if not entry.is_dir() \
                    or not entry.name.startswith(f"{PART_COL}="):
                continue
            try:
                v = int(entry.name.split("=", 1)[1])
            except ValueError:
                continue
            if p_lo <= v <= p_hi:
                affected.append(v)
        new = self.with_part(df)
        if not affected:
            # nothing stored overlaps: plain file-add append (the
            # recompute may be empty — _post_write_exists re-probes
            # only in that case)
            observed, n_written = self._observe_rows(new)
            out = self._rebalanced(observed)
            out.write.mode("append").partitionBy(PART_COL).parquet(
                self.data_path)
            self._post_write_exists(n_written())
            self._refresh_listing()
            return
        us = self._epoch_us_col()
        keep = (self.read(dtypes=dtypes, keep_part_col=True,
                          part_values=affected)
                .filter((us < F.lit(begin_us)) | (us >= F.lit(end_us))))
        combined = keep.unionByName(new, allowMissingColumns=True)
        self._swap_partitions(combined, None, also_remove=affected)

    def delete_where(self, cond: F.Column, dtypes: dict[str, str] | None = None,
                     begin_us: int | None = None, end_us: int | None = None) -> int:
        """Bounded DELETE (reference clear_pipe, connectors/sql/_pipes.py:3158-3246):
        rewrite affected partitions without the matching rows. Returns rows deleted."""
        with self.lock:
            self._maybe_recover()
            return self._delete_where_locked(cond, dtypes=dtypes,
                                             begin_us=begin_us,
                                             end_us=end_us)

    def _delete_where_locked(self, cond: F.Column,
                             dtypes: dict[str, str] | None = None,
                             begin_us: int | None = None,
                             end_us: int | None = None) -> int:
        if not self.exists():
            return 0
        df = self.read(dtypes=dtypes, keep_part_col=True,
                       begin_us=begin_us, end_us=end_us)
        affected = [
            r[0] for r in df.filter(cond).select(PART_COL).distinct().collect()
        ]
        if not affected:
            return 0
        scoped = self.read(dtypes=dtypes, keep_part_col=True, part_values=affected)
        # n_before must be known BEFORE the swap (its files are gone
        # after); the after-count rides the swap's write job as an
        # Observation — one action saved per delete vs the previous
        # count/count/write shape. The unobservable-metrics fallback
        # (detached foreachBatch session, see Pipe._obs_get) recounts
        # the POST-swap state fresh, which is exactly ``remaining``.
        n_before = scoped.count()
        from pyspark.sql import Observation
        obs = Observation()
        remaining = (scoped
                     .filter(~F.coalesce(cond, F.lit(False)))
                     .observe(obs, F.count(F.lit(1)).alias("_n")))
        self._swap_partitions(remaining, affected)
        try:
            n_after = int(obs.get["_n"])
        except Exception:
            n_after = self.read(dtypes=dtypes,
                                part_values=affected).count()
        return n_before - n_after

    def drop(self) -> None:
        with self.lock:
            if os.path.isdir(self.path):
                shutil.rmtree(self.path)
            # reap the lockfile while we hold it: a dropped pipe must
            # not leave a file in <root>/.locks forever. Safe under the
            # lock — a waiter that acquires the orphaned inode detects
            # the path mismatch and retries on the fresh file
            # (locking.ProcessLock._flock inode recheck).
            from meerschaum_spark.locking import lockfile_for
            try:
                os.unlink(lockfile_for(self.path))
            except OSError:
                pass
            self._mark_exists(False)
            self._refresh_listing()

    # -- staging swap ------------------------------------------------------

    def _staging_dir(self) -> str:
        return os.path.join(self.path, f"_staging_{uuid.uuid4().hex[:12]}")

    @staticmethod
    def _part_dir_name(value: Any) -> str:
        if value is None:
            return NULL_PART_DIR
        return f"{PART_COL}={value}"

    def _swap_partitions(self, df: DataFrame, parts: list[Any] | None,
                         sort_by: list[str] | None = None,
                         also_remove: list[Any] | None = None) -> None:
        """Write ``df`` (covering exactly ``parts``) to staging, then swap
        each partition directory into place. ``parts=None`` means "derive
        the list from the staging directory after the write" — a local
        scandir, not a Spark action (used by the bounds-pruned merge).
        ``also_remove`` lists cells that must be swapped even when absent
        from staging (i.e. deleted — a replace_range can empty a cell,
        and a staging-derived list would never touch it).

        ``sort_by`` applies a per-task sort (PART_COL first, so rows of
        one cell stay contiguous) AFTER the rebalance — the clustering
        write for ``optimize(cluster_by=...)``; sorting before the
        rebalance would be undone by its shuffle.

        Spark refuses to overwrite a path it is also reading
        (self-referential plan), so the rewrite lands in a staging dir first;
        the swap is then a handful of driver-side renames under the
        cross-process lock, published through the swap manifest: the
        manifest goes down (fsync'd) after the staged parquet is
        complete and before the first rename, so a writer killed
        mid-swap is rolled FORWARD by the next lock holder
        (``recover_interrupted_swap``) — the local-FS stand-in for a
        transactional commit (Delta/Iceberg own this on a cluster).
        """
        with self.lock:
            self._maybe_recover()
            self._swap_partitions_locked(df, parts, sort_by=sort_by,
                                         also_remove=also_remove)

    def _swap_partitions_locked(self, df: DataFrame,
                                parts: list[Any] | None,
                                sort_by: list[str] | None = None,
                                also_remove: list[Any] | None = None,
                                ) -> None:
        staging = self._staging_dir()
        moved_any = False
        committed = False
        try:
            out = self._rebalanced(df)
            if sort_by:
                out = out.sortWithinPartitions(PART_COL, *sort_by)
            (out
             .write.mode("overwrite").partitionBy(PART_COL).parquet(staging))
            if parts is None:
                parts = []
                if os.path.isdir(staging):
                    for entry in os.scandir(staging):
                        if (entry.is_dir()
                                and entry.name.startswith(f"{PART_COL}=")):
                            raw = entry.name.split("=", 1)[1]
                            parts.append(
                                None if raw == "__HIVE_DEFAULT_PARTITION__"
                                else int(raw))
            swap_set = list(parts)
            for extra in (also_remove or []):
                if extra not in swap_set:
                    swap_set.append(extra)
            staged, removed = [], []
            for value in swap_set:
                name = self._part_dir_name(value)
                if os.path.isdir(os.path.join(staging, name)):
                    staged.append(name)
                else:
                    removed.append(name)  # cell fully emptied → delete
            self._write_manifest({
                "txn": uuid.uuid4().hex, "kind": "cells",
                "staging": os.path.basename(staging),
                "staged": staged, "removed": removed,
            })
            crash = os.environ.get("MRSM_TEST_CRASH_SWAP")
            for i, name in enumerate(staged):
                src = os.path.join(staging, name)
                dst = os.path.join(self.data_path, name)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                shutil.move(src, dst)
                moved_any = True
                if crash == "after_first_move" and i == 0:
                    # test-only crash injection: die with the swap half
                    # committed (manifest present, staging live)
                    os._exit(137)
            for name in removed:
                dst = os.path.join(self.data_path, name)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
            self._clear_manifest()
            committed = True
        except BaseException:
            # in-process failure mid-swap: roll forward NOW (we still
            # hold the lock); if even that fails the manifest stays on
            # disk and the next lock holder completes it
            try:
                self.recover_interrupted_swap()
            except Exception:
                pass
            raise
        finally:
            # a crash-orphaned (unrecovered) swap keeps staging + the
            # manifest on disk so the NEXT lock holder rolls it forward
            if committed or not os.path.isfile(self._manifest_path()):
                shutil.rmtree(staging, ignore_errors=True)
        # a swap that moved a staged cell in proves the table is non-empty
        # (partitionBy only creates dirs rows landed in); a remove-only
        # swap can empty the table entirely — re-probe just for that case
        if moved_any:
            self._mark_exists(True)
        else:
            self._mark_exists(self._exists_uncached())
        self._refresh_listing()

    # -- stats -------------------------------------------------------------

    def rowcount_from_footers(self) -> int | None:
        """Total stored rows from parquet footer metadata — driver-side,
        no Spark job (the manifest-count a table format serves from its
        metadata layer; reference rowcount issues COUNT(*) to the
        database, connectors/sql/_pipes.py get_pipe_rowcount). Returns
        None when any footer is unreadable — callers then fall back to a
        Spark count."""
        try:
            import pyarrow.parquet as pq
        except Exception:
            return None
        if not self.exists():
            return 0
        total = 0
        try:
            for entry in os.scandir(self.data_path):
                if not entry.is_dir() \
                        or not entry.name.startswith(f"{PART_COL}="):
                    continue
                for f in os.scandir(entry.path):
                    if f.is_file() and f.name.endswith(".parquet"):
                        total += pq.ParquetFile(f.path).metadata.num_rows
        except Exception:
            return None
        return total

    def size_bytes(self) -> int:
        total = 0
        for dirpath, _dirnames, filenames in os.walk(self.data_path):
            for f in filenames:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total

    def partition_values(self) -> list[int | None]:
        if not self.exists():
            return []
        out: list[int | None] = []
        for entry in os.scandir(self.data_path):
            if not entry.is_dir() or not entry.name.startswith(f"{PART_COL}="):
                continue
            raw = entry.name.split("=", 1)[1]
            out.append(None if raw == "__HIVE_DEFAULT_PARTITION__" else int(raw))
        return sorted(out, key=lambda v: (v is None, v))
