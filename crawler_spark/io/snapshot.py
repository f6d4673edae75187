"""Snapshot table IO: atomic multi-table round commits (SURVEY.md ST6/M2).

The reference persists state as JSON files rewritten in place
(crawler.py:852-876, app.py:112-135) — a crash between the page-write
and the key-write re-fetches pages (at-least-once). Here every round
commits ALL tables (frontier, seen, documents, records, metrics, ...)
in ONE atomic snapshot so the engine is exactly-once and resumes
bit-identically.

`ParquetSnapshotIO` is the sandbox implementation: each table version is
a parquet directory; a JSON manifest lists, per table, the parquet paths
that make it up (append tables accumulate paths; overwrite tables point
at one path). Atomicity = write manifest vN.json, then atomically
rename a CURRENT.tmp pointer file over CURRENT. A kill anywhere before
the rename leaves the previous snapshot intact; half-written version
directories are invisible because no manifest references them.

On a real cluster the same interface is backed by Iceberg
(`crawler_spark.io.iceberg.IcebergTableIO`): snapshot-id ≙ manifest
version, multi-table commit ≙ one transaction, incremental scan ≙ path
diff between manifests.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Interface: snapshot-versioned multi-table store."""

    def read(self, spark: SparkSession, name: str) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def commit(
        self,
        round_no: int,
        appends: dict[str, DataFrame] | None = None,
        overwrites: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
    ) -> int:  # pragma: no cover
        raise NotImplementedError


class ParquetSnapshotIO(TableIO):
    def __init__(self, root: str, schemas: dict[str, "object"] | None = None):
        self.root = root
        self.schemas = schemas or {}
        # serializes the manifest read-modify-swap so an engine round loop
        # and a streaming foreachBatch sink (separate thread, same process)
        # can both commit without losing each other's table updates
        self._commit_lock = threading.Lock()
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)
        self._lock_path = os.path.join(root, "_manifest", "LOCK")

    def _process_lock(self):
        """Advisory cross-process writer lock (flock on a file under the
        manifest dir): two separate driver processes committing to one
        posix snapshot root serialize their read-modify-swap instead of
        losing the loser's table updates; the kernel releases it if the
        holder dies. Posix-local roots only — on a distributed store the
        Iceberg catalog's commit transaction plays this role (see
        io/iceberg.py)."""
        from contextlib import contextmanager

        @contextmanager
        def held():
            try:
                import fcntl
            except ImportError:  # non-posix: in-process lock only
                yield
                return
            with open(self._lock_path, "a") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)

        return held()

    # --- manifest plumbing -------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.root, "_manifest", "CURRENT")

    def current_version(self) -> int:
        p = self._current_path()
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v < 0:
            return {"version": -1, "round": -1, "tables": {}, "meta": {}}
        with open(os.path.join(self.root, "_manifest", f"v{v}.json")) as f:
            return json.load(f)

    def table_paths(self, name: str) -> list[str]:
        return [os.path.join(self.root, p) for p in self.table_rels(name)]

    def table_rels(self, name: str) -> list[str]:
        """Manifest-relative path list for a table (the delta chain)."""
        return list(self.manifest()["tables"].get(name, []))

    # --- read/write --------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        paths = self.table_paths(name)
        schema = self.schemas.get(name)
        if not paths:
            if schema is None:
                raise KeyError(f"table {name} has no data and no declared schema")
            return spark.createDataFrame([], schema)
        reader = spark.read
        if schema is not None:
            # explicit schema: skips footer-based schema merge across the
            # accumulated delta paths (matters once appends pile up)
            reader = reader.schema(schema)
        return reader.parquet(*paths)

    def read_rels(self, spark: SparkSession, name: str, rels: list[str]) -> DataFrame:
        """Read a PINNED list of delta paths (not whatever the live
        manifest says) — lets a consumer snapshot exactly what it will
        later mark consumed, immune to concurrent appends."""
        schema = self.schemas.get(name)
        if not rels:
            return spark.createDataFrame([], schema)
        reader = spark.read.schema(schema) if schema is not None else spark.read
        return reader.parquet(*[os.path.join(self.root, r) for r in rels])

    def _write_version_dir(self, name: str, version: int, df: DataFrame) -> str:
        rel = os.path.join("tables", name, f"v{version}")
        out = os.path.join(self.root, rel)
        tmp = out + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        return rel

    def commit(
        self,
        round_no: int,
        appends: dict[str, DataFrame] | None = None,
        overwrites: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
        consumes: dict[str, list[str]] | None = None,
    ) -> int:
        """Stage parquet for every changed table, then swap the pointer.

        appends: new rows only — manifest accumulates the path list.
        overwrites: full replacement — manifest points at the new path only.
        consumes: {table: rel_paths} to REMOVE from a table's path list in
        the same atomic swap (e.g. pending-ingest deltas folded into the
        frontier this commit). Paths appended concurrently by another
        writer are untouched.
        """
        with self._commit_lock, self._process_lock():
            prev = self.manifest()
            tables: dict[str, list[str]] = {k: list(v) for k, v in prev["tables"].items()}
            version = prev["version"] + 1
            # stage all table writes concurrently — Spark schedules the jobs in
            # parallel and atomicity only depends on the pointer swap below
            from concurrent.futures import ThreadPoolExecutor

            jobs = [("a", n, df) for n, df in (appends or {}).items()] + [
                ("o", n, df) for n, df in (overwrites or {}).items()
            ]
            # one worker per staged table up to 16: a round commits
            # ~13 tiny tables and a second wave of writes doubles the
            # fixed per-round commit latency (measured ~0.7 s/round on
            # the tiny-world profile)
            with ThreadPoolExecutor(max_workers=min(16, max(1, len(jobs)))) as ex:
                rels = list(
                    ex.map(lambda j: (j[0], j[1], self._write_version_dir(j[1], version, j[2])), jobs)
                )
            for name, eaten in (consumes or {}).items():
                gone = set(eaten)
                tables[name] = [p for p in tables.get(name, []) if p not in gone]
            for kind, name, rel in rels:
                if kind == "a":
                    tables.setdefault(name, []).append(rel)
                else:
                    tables[name] = [rel]
            man = {
                "version": version,
                "round": round_no,
                "tables": tables,
                "meta": {**prev.get("meta", {}), **(meta or {})},
            }
            man_path = os.path.join(self.root, "_manifest", f"v{version}.json")
            with open(man_path + ".tmp", "w") as f:
                json.dump(man, f, indent=1, sort_keys=True)
            os.rename(man_path + ".tmp", man_path)
            cur = self._current_path()
            with open(cur + ".tmp", "w") as f:
                f.write(str(version))
            os.rename(cur + ".tmp", cur)  # the atomic commit point
            return version

    # --- maintenance -------------------------------------------------------
    def compact(self, spark: SparkSession, name: str, round_no: int) -> None:
        """Rewrite an append table's accumulated deltas into one dir
        (Iceberg rewrite_data_files analog); used when path lists grow."""
        df = self.read(spark, name)
        self.commit(round_no, overwrites={name: df})

    def last_round(self) -> int:
        return self.manifest()["round"]

    def rows_meta(self, key: str, default=None):
        return self.manifest().get("meta", {}).get(key, default)


def append_only_names(names: Iterable[str]) -> set[str]:
    return set(names)
