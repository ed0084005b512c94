"""Snapshot / time-travel manifest layer over the parquet warehouse
(VERDICT r12 task 7) — the public-lakehouse-spec shape (an Iceberg-like
catalog: immutable data files + immutable manifests + ONE atomically
swapped pointer) applied to the same directory-backed namespace
``sinks/warehouse.py`` manages.

Why the plain warehouse needs it: ``replace_dir`` documents its own
limit honestly — the two renames of an overwrite publish are not
jointly atomic, so a reader planning a scan at exactly the publish
instant can see a missing directory, and an append rewrites nothing
but gives readers no stable version to pin. The manifest layer removes
both problems without changing the storage substrate:

- DATA FILES ARE IMMUTABLE: every write lands new uniquely-named
  parquet part files under ``data/``; nothing ever mutates or removes
  a file a previous snapshot references (until ``expire_snapshots``,
  which only deletes files no RETAINED manifest references).
- MANIFESTS ARE IMMUTABLE: each snapshot is one JSON file listing the
  exact data files (with per-file row counts from the parquet footers)
  that make up the table at that version, plus parent pointer and
  operation — append manifests inherit the parent's file list.
- ONE POINTER SWAP COMMITS EVERYTHING: readers resolve tables through
  the CATALOG (``catalog/v-<n>.json`` mapping every table to its
  snapshot id), and the only mutable object in the layout is the
  ``catalog/CURRENT`` pointer file, swapped with ``os.replace`` — the
  POSIX-atomic single-file publish. A commit that touches N tables
  (the import job's per-table loop) writes N manifests, one new
  catalog version, one swap: readers see ALL tables flip together or
  none (the multi-table atomicity BigQuery gives the reference via
  per-job atomic loads, restated for a file warehouse).

Reader isolation follows from immutability: ``pin()`` loads the
current catalog version once; every subsequent ``read``/``read_at``
against that pin resolves file lists that can never change or vanish
underneath the scan, however many publishes land meanwhile. Time
travel is the same mechanism pointed at an older manifest
(``read_at(snapshot_id)``) or an older catalog version
(``pin(version=n)``).

Writers are serialized by COMPARE-AND-SWAP at the commit point
(VERDICT r13 task 6): each commit claims the next catalog version file
with ``os.link`` (fails atomically with EEXIST if another writer got
there first — POSIX's create-exclusive primitive), so two interleaved
writers produce either a linear history or one explicit
:class:`SnapshotConflictError`; a commit is never silently dropped.
A failed/aborted commit rolls back its own manifests before
re-raising, so a retry recomputes the same snapshot ids cleanly.
Readers are unlimited and lock-free.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflictError(RuntimeError):
    """Another writer committed between this commit's pin and its
    publish. The losing commit left NOTHING visible (its manifests are
    rolled back, its data files are unreferenced orphans swept by
    ``expire_snapshots``); re-running the commit rebases it onto the
    winner's catalog."""


@dataclass
class SnapshotResult:
    table: str  # "dataset.table"
    snapshot_id: int
    catalog_version: int
    operation: str
    n_rows: int
    n_files: int


class SnapshotWarehouse:
    """Dataset/table namespace with snapshot isolation and time travel:
    ``<root>/<dataset>/<table>/{data,manifests}`` plus a root-level
    ``catalog/`` whose CURRENT pointer is the single commit point."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "catalog"), exist_ok=True)

    # -- catalog plumbing ---------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.root, "catalog", "CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _catalog_file(self, version: int) -> str:
        return os.path.join(self.root, "catalog", f"v-{version}.json")

    def pin(self, version: int | None = None) -> dict:
        """Load one immutable catalog version (default: current) — the
        reader's isolation token. ``{"version": n, "tables": {"ds.tbl":
        snapshot_id}}``; version 0 is the empty catalog."""
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "tables": {}}
        with open(self._catalog_file(v)) as f:
            return json.load(f)

    def _swap_current(self, version: int) -> None:
        tmp = self._current_path() + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path())  # POSIX-atomic publish

    # -- manifest plumbing --------------------------------------------------

    def _table_dir(self, dataset: str, table: str) -> str:
        return os.path.join(self.root, dataset, table)

    def _manifest_path(self, dataset: str, table: str, sid: int) -> str:
        return os.path.join(self._table_dir(dataset, table), "manifests", f"m-{sid}.json")

    def manifest(self, dataset: str, table: str, snapshot_id: int) -> dict:
        with open(self._manifest_path(dataset, table, snapshot_id)) as f:
            return json.load(f)

    def snapshots(self, dataset: str, table: str) -> list[dict]:
        """All retained manifests, oldest first."""
        mdir = os.path.join(self._table_dir(dataset, table), "manifests")
        if not os.path.isdir(mdir):
            return []
        sids = sorted(
            int(f[2:-5]) for f in os.listdir(mdir) if f.startswith("m-")
        )
        return [self.manifest(dataset, table, s) for s in sids]

    # -- write path ---------------------------------------------------------

    def _stage_data_files(self, df: DataFrame, dataset: str, table: str) -> list[dict]:
        """Write the DataFrame's part files into ``data/`` under fresh
        unique names; return [{path(rel), rows}] from the footers. The
        files are INVISIBLE until a manifest references them and a
        catalog version commits — a failure here leaves only orphans,
        swept by expire_snapshots.

        The staging dir lives INSIDE the table dir (not the system
        tmpdir): the move into ``data/`` must be same-filesystem or
        ``os.rename`` raises EXDEV when the warehouse root is mounted
        elsewhere (ADVICE r13); ``shutil.move`` is the belt-and-braces
        fallback for exotic layouts (e.g. data/ itself a mount)."""
        import pyarrow.parquet as pq

        tdir = self._table_dir(dataset, table)
        ddir = os.path.join(tdir, "data")
        os.makedirs(ddir, exist_ok=True)
        staging = tempfile.mkdtemp(prefix="snapstage_", dir=tdir)
        try:
            df.write.mode("overwrite").parquet(staging)
            out = []
            for name in sorted(os.listdir(staging)):
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(staging, name)
                final = f"part-{uuid.uuid4().hex}.parquet"
                try:
                    os.rename(src, os.path.join(ddir, final))
                except OSError:  # EXDEV: data/ on another filesystem
                    shutil.move(src, os.path.join(ddir, final))
                out.append(
                    {
                        "path": os.path.join("data", final),
                        "rows": pq.ParquetFile(
                            os.path.join(ddir, final)
                        ).metadata.num_rows,
                    }
                )
            return out
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _prepare_snapshot(
        self, df: DataFrame, dataset: str, table: str, mode: str, catalog: dict
    ) -> tuple[str, int, dict]:
        """Stage data + write the immutable manifest for one table;
        returns (key, snapshot_id, manifest). No pointer moves here."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported write mode {mode!r}")
        key = f"{dataset}.{table}"
        parent = catalog["tables"].get(key)
        parent_manifest = (
            self.manifest(dataset, table, parent) if parent is not None else None
        )
        new_files = self._stage_data_files(df, dataset, table)
        files = list(new_files)
        if mode == "append" and parent_manifest is not None:
            files = parent_manifest["files"] + new_files
        sid = (parent or 0) + 1
        man = {
            "snapshot_id": sid,
            "parent_id": parent,
            "operation": mode if parent_manifest is not None else "create",
            "files": files,
            "added_files": new_files,
            "n_rows": sum(f["rows"] for f in files),
        }
        mpath = self._manifest_path(dataset, table, sid)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        if os.path.exists(mpath):
            raise SnapshotConflictError(
                f"manifest {mpath} already exists — either a concurrent "
                "writer beat this commit to the table or a crashed "
                "commit left an orphan (recover_orphan_catalogs() sweeps "
                "those when no writer is live)"
            )
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, mpath)
        return key, sid, man

    def commit_many(
        self, writes: list[tuple[DataFrame, str, str, str]]
    ) -> list[SnapshotResult]:
        """Atomic multi-table commit — the import job's catalog loop:
        stage EVERY table's data and manifest first, then publish them
        ALL with one catalog-pointer swap. ``writes`` is [(df, dataset,
        table, mode)].

        Abort safety (ADVICE r13): a failure anywhere before the swap
        DELETES every manifest this commit already wrote before
        re-raising — otherwise the orphan manifest would collide with
        the same snapshot id a retry recomputes from the committed
        catalog and block the table forever. Data-file orphans are
        left for ``expire_snapshots`` (they are invisible and cheap).

        Writer safety (VERDICT r13 task 6): the next catalog version
        file is claimed with ``os.link`` — create-exclusive, the CAS.
        If another writer committed since this commit pinned its base,
        the claim fails, the manifests roll back, and
        :class:`SnapshotConflictError` tells the caller to rebase
        (re-run the commit); histories are always linear."""
        keys = [f"{d}.{t}" for _, d, t, _ in writes]
        dupes = {k for k in keys if keys.count(k) > 1}
        if dupes:
            raise ValueError(f"duplicate table {sorted(dupes)} in one commit")
        base = self.pin()
        tables = dict(base["tables"])
        prepared: list[tuple[str, int, dict, str, str]] = []
        version = base["version"] + 1
        cpath = self._catalog_file(version)
        tmp = cpath + f".tmp{uuid.uuid4().hex[:8]}"
        try:
            for df, dataset, table, mode in writes:
                key, sid, man = self._prepare_snapshot(df, dataset, table, mode, base)
                prepared.append((key, sid, man, dataset, table))
                tables[key] = sid
            with open(tmp, "w") as f:
                json.dump({"version": version, "tables": tables}, f, indent=1)
            try:
                os.link(tmp, cpath)  # CAS: exactly ONE writer creates v-<n>
            except FileExistsError:
                raise SnapshotConflictError(
                    f"catalog v{version} was committed by another writer "
                    f"after this commit pinned v{base['version']} — "
                    "nothing from this commit is visible; re-run to rebase"
                ) from None
        except BaseException:
            # roll back THIS commit's manifests so a retry can reuse the
            # same snapshot ids; staged data files stay as invisible
            # orphans for expire_snapshots
            for _, sid, _, dataset, table in prepared:
                try:
                    os.remove(self._manifest_path(dataset, table, sid))
                except FileNotFoundError:
                    pass
            raise
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
        self._swap_current(version)  # THE commit point
        return [
            SnapshotResult(
                key, sid, version, man["operation"], man["n_rows"], len(man["files"])
            )
            for key, sid, man, _, _ in prepared
        ]

    def write(
        self, df: DataFrame, dataset: str, table: str, mode: str = "append"
    ) -> SnapshotResult:
        """Single-table publish: a one-entry commit."""
        return self.commit_many([(df, dataset, table, mode)])[0]

    # -- read path ----------------------------------------------------------

    def _read_manifest(self, spark: SparkSession, dataset: str, table: str, man: dict) -> DataFrame:
        tdir = self._table_dir(dataset, table)
        paths = [os.path.join(tdir, f["path"]) for f in man["files"]]
        if not paths:
            raise ValueError(f"snapshot {man['snapshot_id']} of {dataset}.{table} is empty")
        return spark.read.parquet(*paths)

    def read(
        self, spark: SparkSession, dataset: str, table: str, pin: dict | None = None
    ) -> DataFrame:
        """Read the table at the pinned catalog (default: current).
        Because manifests and data files are immutable, a reader
        holding ``pin`` resolves the same bytes however many commits
        land concurrently."""
        cat = pin or self.pin()
        sid = cat["tables"].get(f"{dataset}.{table}")
        if sid is None:
            raise ValueError(
                f"table {dataset}.{table} not in catalog v{cat['version']}"
            )
        return self._read_manifest(spark, dataset, table, self.manifest(dataset, table, sid))

    def read_at(
        self, spark: SparkSession, dataset: str, table: str, snapshot_id: int
    ) -> DataFrame:
        """Time travel: the table exactly as snapshot ``snapshot_id``
        committed it."""
        return self._read_manifest(
            spark, dataset, table, self.manifest(dataset, table, snapshot_id)
        )

    def snapshot_diff(
        self,
        spark: SparkSession,
        dataset: str,
        table: str,
        from_id: int,
        to_id: int,
    ) -> DataFrame:
        """File-lineage diff between two snapshots of one table: rows
        from data files PRESENT in ``to`` but not ``from`` are
        ``change='added'``; files present in ``from`` but dropped by
        ``to`` (an overwrite) are ``change='removed'``. Exact because
        files are immutable — no row hashing needed; composes with the
        CDC/SCD2 operators for value-level semantics."""
        from pyspark.sql import functions as F

        a = {f["path"] for f in self.manifest(dataset, table, from_id)["files"]}
        b = {f["path"] for f in self.manifest(dataset, table, to_id)["files"]}
        tdir = self._table_dir(dataset, table)
        parts = []
        added = sorted(b - a)
        removed = sorted(a - b)
        if added:
            parts.append(
                spark.read.parquet(*[os.path.join(tdir, p) for p in added])
                .withColumn("change", F.lit("added"))
            )
        if removed:
            parts.append(
                spark.read.parquet(*[os.path.join(tdir, p) for p in removed])
                .withColumn("change", F.lit("removed"))
            )
        if not parts:
            base = self.read_at(spark, dataset, table, to_id)
            return base.withColumn("change", F.lit("added")).limit(0)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- maintenance ----------------------------------------------------------

    def recover_orphan_catalogs(self) -> dict:
        """Sweep the leftovers of a writer that CRASHED between
        claiming a catalog version (``os.link``) and swapping CURRENT:
        catalog files NEWER than CURRENT (their commits never
        published — the pointer swap is the commit point) and any
        manifest only those orphan catalogs reference. Run ONLY when
        no writer is live — a writer inside that tiny window would be
        indistinguishable from a crash. Returns
        ``{"catalogs_removed": n, "manifests_removed": m}``."""
        cur = self.current_version()
        committed = self.pin()["tables"]
        cdir = os.path.join(self.root, "catalog")
        removed_c = removed_m = 0
        for name in sorted(os.listdir(cdir)):
            if not (name.startswith("v-") and name.endswith(".json")):
                continue
            v = int(name[2:-5])
            if v <= cur:
                continue
            with open(os.path.join(cdir, name)) as f:
                orphan = json.load(f)
            for key, sid in orphan["tables"].items():
                # only manifests BEYOND the table's committed head can
                # belong to the crashed commit; anything ≤ head is a
                # real (possibly historical) snapshot — keep it
                if sid <= (committed.get(key) or 0):
                    continue
                dataset, table = key.split(".", 1)
                try:
                    os.remove(self._manifest_path(dataset, table, sid))
                    removed_m += 1
                except FileNotFoundError:
                    pass
            os.remove(os.path.join(cdir, name))
            removed_c += 1
        return {"catalogs_removed": removed_c, "manifests_removed": removed_m}

    def expire_snapshots(self, dataset: str, table: str, keep_last: int = 2) -> dict:
        """Drop all but the newest ``keep_last`` manifests and delete
        data files no retained manifest references (orphans from failed
        stages included). The CURRENT catalog's snapshot is always
        retained. Returns {"manifests_removed": n, "files_removed": m}."""
        mans = self.snapshots(dataset, table)
        if not mans:
            return {"manifests_removed": 0, "files_removed": 0}
        current_sid = self.pin()["tables"].get(f"{dataset}.{table}")
        keep_ids = {m["snapshot_id"] for m in mans[-keep_last:]}
        if current_sid is not None:
            keep_ids.add(current_sid)
        drop = [m for m in mans if m["snapshot_id"] not in keep_ids]
        keep = [m for m in mans if m["snapshot_id"] in keep_ids]
        referenced = {f["path"] for m in keep for f in m["files"]}
        tdir = self._table_dir(dataset, table)
        for m in drop:
            os.remove(self._manifest_path(dataset, table, m["snapshot_id"]))
        removed = 0
        ddir = os.path.join(tdir, "data")
        for name in os.listdir(ddir):
            rel = os.path.join("data", name)
            if rel not in referenced:
                os.remove(os.path.join(ddir, name))
                removed += 1
        return {"manifests_removed": len(drop), "files_removed": removed}
