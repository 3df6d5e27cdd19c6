"""Versioned collection store: a minimal table-format commit protocol.

``Warehouse`` (warehouse.py) swaps a whole directory per rewrite — fine for
a single writer on a POSIX filesystem, but directory rename is not atomic
on object stores and two writers can interleave. This module replaces the
swap with the standard log-structured table-format design (the public
Delta/Iceberg commit idea, re-implemented from scratch):

    root/<name>/
        _commits/000000.json     one manifest per version; THE commit is
        _commits/000001.json     the atomic create of this single file
        data/v000001-<uuid>/     immutable Spark-written parquet dirs

* A writer stages data under ``data/`` (invisible to readers), then commits
  by exclusive-create (``open(..., "x")``) of ``_commits/<next>.json``.
  Losing a race raises ``FileExistsError`` → re-read the new head and retry
  (optimistic concurrency). On an object store the same protocol is a
  conditional PUT ("if-none-match"); data files never need atomic semantics
  because they are invisible until a manifest references them.
* ``append`` commits a manifest that lists the parent's dirs + one new dir,
  so appends never rewrite history — O(delta), not O(table).
* Readers resolve the highest manifest (or a pinned ``version=`` for time
  travel) and read exactly the dirs it lists: a reader never observes a
  half-written table, with no reader/writer coordination at all.
* ``vacuum`` deletes data dirs unreferenced by the kept manifest tail.

Reference parity: the reference persists collections with a hand-rolled
binary format + full-file rewrite (``binary_persistence.py:39-193``,
``vectordb_optimized.py:282-331``) and has no versioning; this is the
scale-correct replacement (SURVEY.md §8 deferred item, landed round 2).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_WIDTH = 6  # 000000.json … 999999.json keeps lexicographic = numeric


class CommitConflict(RuntimeError):
    """Raised when the optimistic-commit retry budget is exhausted."""


class VersionedWarehouse:
    """Create/load/save/drop collections with versioned atomic commits."""

    def __init__(self, spark: SparkSession, root: str, max_retries: int = 10):
        self.spark = spark
        self.root = root
        self.max_retries = max_retries
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------- layout
    def _cdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _commits(self, name: str) -> str:
        return os.path.join(self._cdir(name), "_commits")

    def _data(self, name: str) -> str:
        return os.path.join(self._cdir(name), "data")

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self._commits(name), f"{version:0{_MANIFEST_WIDTH}d}.json")

    # ---------------------------------------------------------- catalog
    def list_collections(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d, "_commits"))
        )

    def exists(self, name: str) -> bool:
        return self.latest_version(name) is not None

    def drop(self, name: str) -> bool:
        if not os.path.isdir(self._cdir(name)):
            return False
        shutil.rmtree(self._cdir(name))
        return True

    # ---------------------------------------------------------- versions
    def latest_version(self, name: str) -> int | None:
        cdir = self._commits(name)
        if not os.path.isdir(cdir):
            return None
        versions = [
            int(f[: -len(".json")])
            for f in os.listdir(cdir)
            if f.endswith(".json") and f[: -len(".json")].isdigit()
        ]
        return max(versions) if versions else None

    def _read_manifest(self, name: str, version: int) -> dict:
        with open(self._manifest_path(name, version)) as fh:
            return json.load(fh)

    def history(self, name: str) -> list[dict]:
        """All manifests, oldest first."""
        latest = self.latest_version(name)
        if latest is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        return [self._read_manifest(name, v) for v in range(latest + 1)]

    # ---------------------------------------------------------- read
    def _resolve_dirs(self, name: str, entries: list[str]) -> list[str]:
        # entries are data-dir names relative to this collection's data/
        # root; clone manifests list ABSOLUTE source paths (os.path.join
        # passes absolute second args through untouched)
        return [os.path.join(self._data(name), d) for d in entries]

    def load(self, name: str, version: int | None = None) -> DataFrame:
        """Read the collection at `version` (default: latest). Time travel
        is just pinning an older manifest — data dirs are immutable. If the
        manifest carries deletion vectors (`delete_where`), the deleted
        keys are anti-joined out at read time."""
        latest = self.latest_version(name)
        if latest is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        v = latest if version is None else version
        if not 0 <= v <= latest:
            raise ValueError(f"version {v} out of range 0..{latest}")
        manifest = self._read_manifest(name, v)
        df = self.spark.read.parquet(*self._resolve_dirs(name, manifest["dirs"]))
        del_dirs = manifest.get("deletes") or []
        if del_dirs:
            keys = self.spark.read.parquet(*self._resolve_dirs(name, del_dirs))
            df = df.join(keys, manifest["delete_key"], "left_anti")
        return df

    def shard_paths(self, name: str, version: int | None = None) -> list[str]:
        """Parquet shard files of the snapshot at `version` (default:
        latest) — the manifest's dirs expanded to files, so superseded
        versions' files are excluded (for direct shard access, e.g. the
        serving replica)."""
        import glob

        latest = self.latest_version(name)
        if latest is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        v = latest if version is None else version
        manifest = self._read_manifest(name, v)
        if manifest.get("deletes"):
            # raw shard files cannot see read-time deletion vectors — serving
            # them would resurrect deleted rows. Materialize first.
            raise RuntimeError(
                f"snapshot {name!r}@v{v} carries deletion vectors; run "
                "optimize() to materialize them before shard-level serving"
            )
        return sorted(
            p
            for d in self._resolve_dirs(name, manifest["dirs"])
            for p in glob.glob(os.path.join(d, "*.parquet"))
        )

    # ---------------------------------------------------------- write
    @staticmethod
    def _carried(parent_manifest: dict) -> dict:
        """Caller metadata that must SURVIVE maintenance commits: dropping
        `stream_batch_id` on optimize/delete would make the head look
        stream-virgin and re-open the exactly-once sink's replay window
        (`streaming/versioned_sink.py`)."""
        out = {}
        if "stream_batch_id" in parent_manifest:
            out["stream_batch_id"] = parent_manifest["stream_batch_id"]
        return out

    def _dir_stats(self, name: str, staged: str, stats_cols: list[str]) -> dict:
        """(rows, per-column [min,max]) of one staged dir — the manifest-level
        statistics that let `scan_pruned` skip whole dirs at PLANNING time,
        before any parquet footer is opened (the Iceberg manifest-pruning
        idea at dir granularity). Numeric columns only; others are skipped
        (a reader treats a missing column as 'no stats' and keeps the dir)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        sdf = self.spark.read.parquet(os.path.join(self._data(name), staged))
        numeric = [
            f.name
            for f in sdf.schema.fields
            if f.name in stats_cols and isinstance(f.dataType, T.NumericType)
        ]
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in numeric:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        row = sdf.agg(*aggs).collect()[0]

        def _finite(v):
            # NaN poisons pruning math (F.max returns NaN — sorts greatest —
            # and `NaN >= lo` is False, so an in-range dir would be silently
            # SKIPPED) and json.dump would emit a non-standard `NaN` token.
            # Store None instead: scan_pruned's `s[0] is None` branch keeps
            # the dir conservatively.
            if isinstance(v, float) and not math.isfinite(v):
                return None
            return v

        return {
            "rows": row["__rows"],
            "cols": {
                c: [_finite(row[f"mn_{c}"]), _finite(row[f"mx_{c}"])] for c in numeric
            },
        }

    def save(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        stats_cols: list[str] | None = None,
        extra: dict | None = None,
    ) -> int:
        """Stage `df` then commit; returns the committed version.

        `overwrite`: the new version references only the staged dir.
        `append`: the new version references parent dirs + the staged dir;
        on a lost race the parent is re-read so concurrent appends all land.
        `stats_cols`: record per-dir (rows, min, max) for these numeric
        columns in the manifest — `scan_pruned` then skips non-matching
        dirs at planning time. Appends keep the parent's per-dir stats.
        `extra`: caller metadata merged into the manifest (e.g. the
        streaming sink's batch id — the commit doubles as the
        exactly-once marker).
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        os.makedirs(self._commits(name), exist_ok=True)
        os.makedirs(self._data(name), exist_ok=True)

        staged_stats: dict | None = None
        for attempt in range(self.max_retries):
            parent = self.latest_version(name)
            next_v = 0 if parent is None else parent + 1
            if attempt == 0:
                # stage once — invisible until a manifest references it
                staged = f"v{next_v:0{_MANIFEST_WIDTH}d}-{uuid.uuid4().hex[:8]}"
                df.write.mode("overwrite").parquet(os.path.join(self._data(name), staged))
                if stats_cols:
                    staged_stats = self._dir_stats(name, staged, stats_cols)
            deletes: list[str] = []
            delete_key = None
            stats: dict = {}
            carried: dict = {}
            if mode == "append" and parent is not None:
                pm = self._read_manifest(name, parent)
                dirs = pm["dirs"] + [staged]
                # appends inherit the parent's deletion vectors (note the
                # key-based caveat in delete_where's docstring)
                deletes = pm.get("deletes") or []
                delete_key = pm.get("delete_key")
                stats = dict(pm.get("stats") or {})
                carried = self._carried(pm)
            else:
                dirs = [staged]
            if staged_stats is not None:
                stats[staged] = staged_stats
            manifest = {
                "version": next_v,
                "parent": parent,
                "mode": mode,
                "dirs": dirs,
                "deletes": deletes,
                "delete_key": delete_key,
                "stats": stats,
                "committed_at": time.time(),
                **carried,
                **(extra or {}),  # caller metadata wins over carried values
            }
            try:
                # THE commit: atomic exclusive create of one small file
                with open(self._manifest_path(name, next_v), "x") as fh:
                    json.dump(manifest, fh)
                return next_v
            except FileExistsError:
                continue  # lost the race — recompute head and retry
        raise CommitConflict(f"gave up committing {name!r} after {self.max_retries} races")

    def scan_pruned(
        self, name: str, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Read the snapshot restricted to `lo <= col <= hi`, skipping every
        data dir whose manifest [min,max] for `col` cannot intersect the
        range — the dirs are never listed, opened, or footer-read, so at
        100 TB a selective range query plans against the manifest alone.
        The win is biggest on range-disjoint appends (time-ordered ingest:
        each batch's ids/timestamps occupy a fresh range); after OPTIMIZE
        compacts to one dir, pruning falls back to parquet row-group
        min/max, which the optimize-time clustering keeps tight.
        Dirs without recorded stats for `col` are conservatively kept. The
        residual filter still applies (stats prune dirs, not rows), and
        active deletion vectors are honored."""
        from pyspark.sql import functions as F

        latest = self.latest_version(name)
        if latest is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        v = latest if version is None else version
        manifest = self._read_manifest(name, v)
        stats = manifest.get("stats") or {}
        kept = []
        for d in manifest["dirs"]:
            s = (stats.get(d) or {}).get("cols", {}).get(col)
            if s is None or s[0] is None or s[1] is None or (s[0] <= hi and s[1] >= lo):
                kept.append(d)
        if not kept:
            # Nothing can match: empty frame with the right schema, derived
            # from ONE dir — reading all dirs here would list and footer-read
            # everything, breaking the never-opened contract exactly in the
            # most selective case.
            one = self._resolve_dirs(name, manifest["dirs"][:1])
            df = self.spark.read.parquet(*one)
            return df.filter(F.lit(False))
        df = self.spark.read.parquet(*self._resolve_dirs(name, kept))
        del_dirs = manifest.get("deletes") or []
        if del_dirs:
            keys = self.spark.read.parquet(*self._resolve_dirs(name, del_dirs))
            df = df.join(keys, manifest["delete_key"], "left_anti")
        return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))

    def delete_where(self, name: str, cond, key_col: str) -> int:
        """Row-level delete WITHOUT rewriting data: stage only the matching
        keys and commit a manifest whose `deletes` list references them —
        the write is O(deleted rows), reads anti-join the keys out, and
        time travel to pre-delete versions still sees the rows (the
        deletion-vector idea of modern table formats, key-based here).

        Key-based caveat, stated plainly: the vector stores KEY VALUES, not
        file positions (Spark exposes no stable row position), so an append
        that re-inserts a deleted key is also masked until `optimize()`
        materializes the deletes. `optimize` applies and clears them;
        `shard_paths` refuses to serve raw files while deletes are active.

        Concurrency: like `optimize`, the staged keys are derived from the
        head snapshot, so ANY concurrent commit aborts with
        `CommitConflict` (never silently mis-scopes the delete); re-run.
        """
        parent = self.latest_version(name)
        if parent is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        pm = self._read_manifest(name, parent)
        if pm.get("delete_key") not in (None, key_col):
            raise ValueError(
                f"existing deletion vectors key on {pm['delete_key']!r}; "
                "materialize with optimize() before deleting on a new key"
            )
        next_v = parent + 1
        staged = f"del{next_v:0{_MANIFEST_WIDTH}d}-{uuid.uuid4().hex[:8]}"
        keys = self.load(name).filter(cond).select(key_col).distinct()
        keys.write.mode("overwrite").parquet(os.path.join(self._data(name), staged))
        manifest = {
            "version": next_v,
            "parent": parent,
            "mode": "delete",
            "dirs": pm["dirs"],
            "deletes": (pm.get("deletes") or []) + [staged],
            "delete_key": key_col,
            "stats": pm.get("stats") or {},
            "committed_at": time.time(),
            **self._carried(pm),
        }
        try:
            with open(self._manifest_path(name, next_v), "x") as fh:
                json.dump(manifest, fh)
            return next_v
        except FileExistsError:
            shutil.rmtree(os.path.join(self._data(name), staged), ignore_errors=True)
            raise CommitConflict(
                f"delete on {name!r} raced a concurrent commit at v{next_v}; re-run"
            ) from None

    def merge_into(
        self,
        name: str,
        source: DataFrame,
        on: str,
        *,
        when_matched: str = "update",
        when_not_matched: str = "insert",
        stats_cols: list[str] | None = None,
        extra: dict | None = None,
    ) -> int:
        """Delta-style MERGE with manifest-pruned copy-on-write: data dirs
        whose recorded [min, max] range on `on` cannot contain ANY source
        key are carried into the new version BY REFERENCE (never read,
        never rewritten); only the touched dirs are rewritten together
        with the merge delta. On range-disjoint ingest (time-ordered ids)
        a merge touching recent keys therefore rewrites O(touched dirs +
        delta), not the table — the same pruning `scan_pruned` uses, on
        the write path.

        `when_matched`: "update" (target row replaced by the source row)
        or "delete"; `when_not_matched`: "insert" or "skip". Source must
        carry the target schema for update/insert. Active deletion
        vectors are honored when reading touched dirs and CARRIED for the
        untouched ones (anti-join is idempotent, so rewritten dirs simply
        no longer contain the masked rows).

        Concurrency: the touched-set derives from the head snapshot, so a
        lost commit race recomputes the whole merge from the new head
        (never silently mis-scopes), up to max_retries."""
        from pyspark.sql import functions as F

        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
        if when_not_matched not in ("insert", "skip"):
            raise ValueError(
                f"when_not_matched must be insert|skip, got {when_not_matched!r}"
            )
        bounds = source.agg(
            F.min(on).alias("lo"), F.max(on).alias("hi"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        for attempt in range(self.max_retries):
            parent = self.latest_version(name)
            if parent is None:
                raise FileNotFoundError(f"collection {name!r} does not exist")
            pm = self._read_manifest(name, parent)
            stats = dict(pm.get("stats") or {})
            if bounds["n"] == 0:  # empty source: merge is the identity
                return parent
            touched, untouched = [], []
            for d in pm["dirs"]:
                s = (stats.get(d) or {}).get("cols", {}).get(on)
                if s is None or s[0] is None or s[1] is None or (
                    s[0] <= bounds["hi"] and s[1] >= bounds["lo"]
                ):
                    touched.append(d)
                else:
                    untouched.append(d)
            next_v = parent + 1
            staged = f"mrg{next_v:0{_MANIFEST_WIDTH}d}-{uuid.uuid4().hex[:8]}"
            if touched:
                tgt = self.spark.read.parquet(*self._resolve_dirs(name, touched))
                del_dirs = pm.get("deletes") or []
                if del_dirs:
                    keys = self.spark.read.parquet(*self._resolve_dirs(name, del_dirs))
                    tgt = tgt.join(keys, pm["delete_key"], "left_anti")
            else:
                tgt = self.load(name, version=parent).limit(0)
            unmatched_tgt = tgt.join(source.select(on), on, "left_anti")
            parts = [unmatched_tgt]
            if when_matched == "update":
                parts.append(
                    source.join(tgt.select(on), on, "left_semi").select(*tgt.columns)
                )
            if when_not_matched == "insert":
                parts.append(
                    source.join(tgt.select(on), on, "left_anti").select(*tgt.columns)
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.write.mode("overwrite").parquet(os.path.join(self._data(name), staged))
            new_stats = {d: stats[d] for d in untouched if d in stats}
            if stats_cols:
                new_stats[staged] = self._dir_stats(name, staged, stats_cols)
            manifest = {
                "version": next_v,
                "parent": parent,
                "mode": "merge",
                "dirs": untouched + [staged],
                "deletes": pm.get("deletes") or [],
                "delete_key": pm.get("delete_key"),
                "stats": new_stats,
                "merge_touched": len(touched),
                "merge_untouched": len(untouched),
                "committed_at": time.time(),
                **self._carried(pm),
                **(extra or {}),  # caller metadata wins (streaming batch id)
            }
            try:
                with open(self._manifest_path(name, next_v), "x") as fh:
                    json.dump(manifest, fh)
                return next_v
            except FileExistsError:
                # lost the race: the touched-set may now be wrong — drop the
                # stage and redo the whole merge against the new head
                shutil.rmtree(os.path.join(self._data(name), staged), ignore_errors=True)
                continue
        raise CommitConflict(f"gave up merging into {name!r} after {self.max_retries} races")

    def diff(self, name: str, v_from: int, v_to: int, on: str) -> DataFrame:
        """Row-level change feed between two versions (the public
        change-data-feed idea, computed rather than logged): returns the
        `v_to` schema plus `_change ∈ {insert, update_postimage, delete}`,
        keyed by `on`. `delete` rows carry the PRE-image (they no longer
        exist at v_to). Computed as two key anti-joins + one
        changed-row-hash semi-join over the two pinned snapshots — no
        extra state is stored, so the feed works between ANY two versions,
        including pre-merge/pre-optimize history. At scale both snapshots
        shuffle once on the key; dirs shared verbatim by both manifests
        still scan twice — the documented trade for a zero-maintenance
        feed (a logged CDF trades write-path cost for skipping that)."""
        from pyspark.sql import functions as F

        a = self.load(name, version=v_from)
        b = self.load(name, version=v_to)
        cols = b.columns
        inserts = b.join(a.select(on), on, "left_anti").select(
            *cols, F.lit("insert").alias("_change")
        )
        deletes = a.join(b.select(on), on, "left_anti").select(
            *cols, F.lit("delete").alias("_change")
        )
        hash_of = lambda df: F.md5(F.concat_ws("\x00", *[F.col(c).cast("string") for c in cols]))  # noqa: E731
        a_h = a.select(F.col(on).alias("__k"), hash_of(a).alias("__ha"))
        updates = (
            b.withColumn("__hb", hash_of(b))
            .join(
                a_h,
                (F.col(on) == F.col("__k")) & (F.col("__hb") != F.col("__ha")),
                "left_semi",
            )
            .select(*cols, F.lit("update_postimage").alias("_change"))
        )
        return inserts.unionByName(deletes).unionByName(updates)

    def clone(self, src: str, dst: str, version: int | None = None) -> int:
        """Shallow (zero-copy) clone: `dst`'s v0 manifest references `src`'s
        immutable data dirs by ABSOLUTE path — no data moves, the clone is
        one small JSON write, and subsequent commits to either collection
        never affect the other (new dirs land under their own data/ root).
        Same hazard as Delta/Iceberg shallow clones, stated plainly:
        `vacuum(src)` can delete dirs a clone still references — vacuum
        only collections you know are unreferenced, or deep-copy first."""
        latest = self.latest_version(src)
        if latest is None:
            raise FileNotFoundError(f"collection {src!r} does not exist")
        if self.exists(dst):
            raise FileExistsError(f"collection {dst!r} already exists")
        v = latest if version is None else version
        sm = self._read_manifest(src, v)
        os.makedirs(self._commits(dst), exist_ok=True)
        os.makedirs(self._data(dst), exist_ok=True)
        manifest = {
            "version": 0,
            "parent": None,
            "mode": "clone",
            "clone_of": {"collection": src, "version": v},
            "dirs": self._resolve_dirs(src, sm["dirs"]),
            "deletes": self._resolve_dirs(src, sm.get("deletes") or []),
            "delete_key": sm.get("delete_key"),
            # stats keys must match the (now absolute) dir entries
            "stats": {
                self._resolve_dirs(src, [d])[0]: s
                for d, s in (sm.get("stats") or {}).items()
            },
            "committed_at": time.time(),
        }
        with open(self._manifest_path(dst, 0), "x") as fh:
            json.dump(manifest, fh)
        return 0

    # ---------------------------------------------------------- maintenance
    def optimize(
        self,
        name: str,
        cluster_by: list[str] | None = None,
        target_file_mb: float = 128,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Compact the current version into few right-sized files, optionally
        range-clustered, and commit the result as a new version.

        The two operational killers of a 100 TB table are (a) the small-files
        problem — every append commits its own parquet dir, and a thousand
        appends make a scan open a thousand footers — and (b) unclustered
        data, where a selective filter still touches every row group.
        `optimize` rewrites the CURRENT snapshot into ceil(bytes/target) files
        (`repartitionByRange` + `sortWithinPartitions` over `cluster_by` when
        given → globally sorted ⇒ tight per-row-group min/max stats ⇒ scans
        of `cluster_by` predicates prune to few files), then commits it like
        any other writer. Time travel to pre-optimize versions still works —
        old manifests keep referencing the old dirs until `vacuum`.

        Concurrency: compaction is a snapshot rewrite, so if ANY other commit
        lands between reading the snapshot and committing, this aborts with
        `CommitConflict` (never silently drops the concurrent write) and the
        caller simply re-runs. The staged dir is cleaned up on abort.

        `zorder_by` (mutually exclusive with `cluster_by`): cluster on the
        Morton interleave of ≥2 numeric columns instead of a lexicographic
        sort — every listed column gets tight per-file [min,max], so
        selective predicates on ANY of them prune files, not just the
        leading sort column (operators/zorder.py; Delta/Iceberg's OPTIMIZE
        ZORDER BY). Columns are min-max bucketed to 8 bits each (one cheap
        aggregate), so up to 7 columns fit a signed long.
        """
        if cluster_by and zorder_by:
            raise ValueError("pass either cluster_by or zorder_by, not both")
        parent = self.latest_version(name)
        if parent is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        manifest = self._read_manifest(name, parent)
        src_dirs = self._resolve_dirs(name, manifest["dirs"])
        total_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for sd in src_dirs
            for r, _, files in os.walk(sd)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, int(-(-total_bytes // int(target_file_mb * 1024 * 1024))))
        # load() (not a raw read) so active deletion vectors are MATERIALIZED
        # by the rewrite; the new manifest clears them
        df = self.load(name)
        if cluster_by:
            df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(*cluster_by)
        elif zorder_by:
            from pyspark.sql import functions as F

            from custom_python_vectordb_spark.operators.zorder import zvalue

            bits = 8
            mm = df.agg(
                *[F.min(c).alias(f"mn_{c}") for c in zorder_by],
                *[F.max(c).alias(f"mx_{c}") for c in zorder_by],
            ).collect()[0]
            buckets = []
            for c in zorder_by:
                mn, mx = float(mm[f"mn_{c}"]), float(mm[f"mx_{c}"])
                span = mx - mn
                if span <= 0:  # constant column: every row in bucket 0
                    buckets.append(F.lit(0).cast("long"))
                else:
                    scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
                    buckets.append(
                        F.least(
                            F.floor(scaled * F.lit(1 << bits)).cast("long"),
                            F.lit((1 << bits) - 1),
                        )
                    )
            df = (
                df.withColumn("__z", zvalue(buckets, bits=bits))
                .repartitionByRange(n_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        else:
            df = df.coalesce(n_files)

        next_v = parent + 1
        staged = f"v{next_v:0{_MANIFEST_WIDTH}d}-{uuid.uuid4().hex[:8]}"
        staged_path = os.path.join(self._data(name), staged)
        df.write.mode("overwrite").parquet(staged_path)
        # re-derive manifest stats for the compacted dir (same columns the
        # parent tracked) so pruning keeps working after OPTIMIZE
        tracked = sorted(
            {c for s in (manifest.get("stats") or {}).values() for c in s.get("cols", {})}
        )
        new_stats = {staged: self._dir_stats(name, staged, tracked)} if tracked else {}
        new_manifest = {
            "version": next_v,
            "parent": parent,
            "mode": "optimize",
            "dirs": [staged],
            "deletes": [],  # materialized by the rewrite
            "delete_key": None,
            "stats": new_stats,
            "cluster_by": cluster_by or [],
            "zorder_by": zorder_by or [],
            "committed_at": time.time(),
            **self._carried(manifest),
        }
        try:
            with open(self._manifest_path(name, next_v), "x") as fh:
                json.dump(new_manifest, fh)
            return next_v
        except FileExistsError:
            shutil.rmtree(staged_path, ignore_errors=True)
            raise CommitConflict(
                f"optimize of {name!r} raced a concurrent commit at v{next_v}; re-run"
            ) from None

    def vacuum(self, name: str, keep_last: int = 2) -> list[str]:
        """Delete data dirs unreferenced by the newest `keep_last` manifests
        (older manifests stay readable only if their dirs are still shared).
        Returns the deleted dir names."""
        latest = self.latest_version(name)
        if latest is None:
            raise FileNotFoundError(f"collection {name!r} does not exist")
        keep: set[str] = set()
        for v in range(max(0, latest - keep_last + 1), latest + 1):
            m = self._read_manifest(name, v)
            keep.update(m["dirs"])
            keep.update(m.get("deletes") or [])
        deleted = []
        for d in sorted(os.listdir(self._data(name))):
            if d not in keep:
                shutil.rmtree(os.path.join(self._data(name), d), ignore_errors=True)
                deleted.append(d)
        return deleted
