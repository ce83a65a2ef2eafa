"""Snapshot-manifest Parquet tables — Iceberg-style semantics on plain
files (this sandbox has no Iceberg runtime jars; swap ``SnapshotStore``
for an Iceberg catalog in production — the driver loop programs only
against this interface).

Replaces the reference's three-file, non-atomic checkpoint
(``crawler/discovery.py:123-155``: queue_state.json + visited_urls.txt +
discovered_urls.txt written sequentially — a crash between writes tears
state). Here one crawl round = ONE atomic commit:

* data files for every table are written first
  (``data/<table>/v<version>/part-*.parquet``);
* a JSON manifest listing the *cumulative* file set per table (append
  tables accumulate files; replace tables point only at their newest
  version) plus per-partition lineage (file → row count) is renamed
  into place (``os.replace`` is atomic on POSIX);
* ``_current`` is then atomically repointed.

A crash at any point leaves ``_current`` on the previous consistent
snapshot; orphaned data directories are unreferenced and harmless.
Time travel = read any older manifest.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from ccr_web_crawler_spark.plans.phaselog import phase

# Tables that grow by appending deltas vs. tables replaced wholesale
# each round (the frontier is the mutable working set).
APPEND = "append"
REPLACE = "replace"


class SnapshotStore:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        (self.root / "snapshots").mkdir(parents=True, exist_ok=True)
        (self.root / "data").mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- state
    @property
    def _current_file(self) -> Path:
        return self.root / "_current"

    def current_version(self) -> int | None:
        try:
            return int(self._current_file.read_text().strip())
        except FileNotFoundError:
            return None

    def manifest(self, version: int | None = None) -> dict | None:
        version = self.current_version() if version is None else version
        if version is None:
            return None
        path = self.root / "snapshots" / f"v{version:06d}.json"
        return json.loads(path.read_text())

    # ------------------------------------------------------------- read
    def read(self, spark: SparkSession, table: str, version: int | None = None) -> DataFrame | None:
        m = self.manifest(version)
        if m is None or table not in m["tables"] or not m["tables"][table]["files"]:
            return None
        files = [str(self.root / f) for f in m["tables"][table]["files"]]
        return spark.read.parquet(*files)

    # ------------------------------------------------------------ commit
    def commit(
        self,
        round_no: int,
        tables: dict[str, tuple[DataFrame, str]],
        metrics: dict | None = None,
        metrics_fn=None,
        derived: dict | None = None,
    ) -> int:
        """Atomically commit one round. ``tables`` maps name →
        (DataFrame, APPEND|REPLACE). Empty DataFrames are recorded with
        no files (cheap no-op deltas). ``metrics_fn``, if given, is
        called with {table: rows written by THIS commit} and its result
        is merged into the manifest metrics — this is how the driver
        persists seq watermarks atomically with the data they describe.

        ``derived`` maps name → (src_table, fn, mode): after ``src``'s
        data files are written, ``fn(read-back-of-those-files)`` is
        written as another table IN THE SAME atomic commit. This lets a
        big table (e.g. extracted sections) materialize exactly once
        while small projections of it (e.g. the failures sink) come from
        a column-pruned scan of the files just written — the crash
        window stays zero because the manifest lands last."""
        prev = self.manifest() or {"tables": {}}
        # next version = 1 + highest EXISTING snapshot, not 1 + current:
        # after a rollback the current pointer sits below newer (now
        # abandoned) snapshots, and a commit must never overwrite one —
        # the abandoned branch stays on disk as audit trail, exactly
        # Iceberg's rollback semantics
        existing = (int(p.stem[1:]) for p in (self.root / "snapshots").glob("v*.json"))
        version = max(existing, default=0) + 1
        new_tables: dict[str, dict] = {
            k: {"files": list(v["files"]), "lineage": dict(v.get("lineage", {}))}
            for k, v in prev["tables"].items()
        }
        delta_rows: dict[str, int] = {}
        delta_files: dict[str, list[str]] = {}

        def _write(name: str, df: DataFrame, mode: str) -> None:
            rel_dir = f"data/{name}/v{version:06d}-{uuid.uuid4().hex[:8]}"
            out_dir = self.root / rel_dir
            with phase(f"commit.write[{name}]"):
                df.write.mode("overwrite").parquet(str(out_dir))
            files, lineage = [], {}
            for p in sorted(out_dir.glob("*.parquet")):
                rel = f"{rel_dir}/{p.name}"
                # per-partition lineage incl. row count from the parquet
                # footer — a driver-side metadata read, not a Spark job;
                # downstream count()/isEmpty checks become free.
                rows = pq.ParquetFile(str(p)).metadata.num_rows
                if rows == 0:
                    # the documented no-op-delta contract: zero-row part
                    # files never enter the manifest, so an append of an
                    # empty delta leaves the table's file list untouched
                    # (quiet backlog rounds must not grow frontier_cold)
                    # and readers never schedule tasks over empty files.
                    # The file itself stays on disk as an unreferenced
                    # orphan — documented harmless, like a crashed write.
                    continue
                files.append(rel)
                lineage[rel] = {"round": round_no, "rows": rows}
            entry = new_tables.get(name, {"files": [], "lineage": {}})
            if mode == REPLACE:
                entry = {"files": files, "lineage": lineage}
            else:
                entry["files"] = entry["files"] + files
                entry["lineage"].update(lineage)
            new_tables[name] = entry
            delta_rows[name] = sum(v["rows"] for v in lineage.values())
            delta_files[name] = [str(self.root / f) for f in files]

        if not tables and derived:
            raise ValueError("derived tables require their source in `tables`")
        spark = next(iter(tables.values()))[0].sparkSession if tables else None
        # Submit the per-table writes CONCURRENTLY: they are independent
        # jobs on disjoint directories, and Spark's scheduler interleaves
        # them fine — sequential submission would pay one full
        # job-scheduling + AQE-compile latency per table per round
        # (~0.5-1s each), which dominates small rounds and caps scaling.
        from concurrent.futures import ThreadPoolExecutor

        items = list(tables.items())
        if len(items) > 1 and os.environ.get("SPARK_GRAFT_SEQ_COMMIT") != "1":
            with ThreadPoolExecutor(max_workers=len(items)) as pool:
                futs = [
                    pool.submit(_write, name, df, mode)
                    for name, (df, mode) in items
                ]
                for f in futs:
                    f.result()
        else:
            for name, (df, mode) in items:
                _write(name, df, mode)
        for name, (src, fn, mode) in (derived or {}).items():
            if delta_files.get(src):
                src_df = spark.read.parquet(*delta_files[src])
            else:
                # empty source delta → empty derived delta; do NOT fall
                # back to fn(original DataFrame): that would re-execute
                # the full source DAG (fetch join + extract UDF) just to
                # write zero rows — the recompute `derived` exists to
                # avoid
                src_df = spark.createDataFrame([], tables[src][0].schema)
            _write(name, fn(src_df), mode)

        metrics = dict(metrics or {})
        if metrics_fn is not None:
            metrics.update(metrics_fn(delta_rows))
        manifest = {
            "version": version,
            "round": round_no,
            "parent": prev.get("version"),
            "committed_at": time.time(),
            "tables": new_tables,
            "metrics": metrics or {},
        }
        snap = self.root / "snapshots" / f"v{version:06d}.json"
        tmp = snap.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, snap)  # atomic
        tmp2 = self._current_file.with_suffix(".tmp")
        tmp2.write_text(str(version))
        os.replace(tmp2, self._current_file)  # atomic pointer swing
        return version

    def rollback(self, version: int) -> int:
        """Swing the current pointer back to an older snapshot (Iceberg
        rollback): subsequent reads and commits build on that manifest's
        cumulative file set; snapshots above it stay on disk as an
        abandoned branch (commit numbers continue past them, never
        overwriting). Atomic — a crash mid-rollback leaves either the
        old or the new pointer, both consistent."""
        try:
            if self.manifest(version) is None:
                raise ValueError(f"rollback target v{version} does not exist")
        except FileNotFoundError:
            raise ValueError(f"rollback target v{version} does not exist") from None
        tmp = self._current_file.with_suffix(".tmp")
        tmp.write_text(str(version))
        os.replace(tmp, self._current_file)
        return version

    def count(self, table: str, version: int | None = None) -> int:
        """Committed row count from manifest lineage (no Spark job)."""
        m = self.manifest(version)
        if m is None or table not in m["tables"]:
            return 0
        lineage = m["tables"][table].get("lineage", {})
        if any("rows" not in v for v in lineage.values()):
            # a silent 0 here would make the driver treat a non-empty
            # frontier as drained; externally-written manifests must
            # carry row counts (or be recounted by the caller via Spark)
            raise ValueError(
                f"manifest lineage for table {table!r} lacks row counts"
            )
        return sum(v["rows"] for v in lineage.values())

    def rows_in_round(self, table: str, round_no: int, version: int | None = None) -> int:
        """Rows a specific round contributed to *table* (from lineage)."""
        m = self.manifest(version)
        if m is None or table not in m["tables"]:
            return 0
        return sum(
            v.get("rows", 0)
            for v in m["tables"][table].get("lineage", {}).values()
            if v.get("round") == round_no
        )

    def history(self) -> list[dict]:
        out = []
        for p in sorted((self.root / "snapshots").glob("v*.json")):
            out.append(json.loads(p.read_text()))
        return out


def write_bucketed_pages(
    pages: DataFrame,
    table: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> DataFrame:
    """Persist the pages corpus as a BUCKETED table on ``url`` (the
    production layout for a fetch-heavy corpus: Iceberg bucket
    partition transform / Hive bucketing). A frontier join on
    ``url_canon = url`` then co-locates WITHOUT shuffling the corpus —
    only the round-sized candidate side exchanges into the corpus's
    bucketing, which is the only join layout that survives a round too
    big to broadcast at 10^10 pages (``RoundConfig.fetch_strategy
    = 'shuffle'`` + bucketed pages; plan pinned by
    tests/test_bucketed_fetch.py: exactly one Exchange, on the
    candidate side). ``sortBy`` url keeps row-group stats tight for
    the small-round In-pushdown path too. Returns the table read back.

    Bucket metadata lives in the session catalog here (no external
    metastore in the sandbox); on a real deployment the same layout is
    an Iceberg ``bucket(N, url)`` partition spec.
    """
    spark = pages.sparkSession
    writer = (
        pages.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "url")
        .sortBy("url")
    )
    if path is not None:
        writer = writer.option("path", str(path))
    writer.saveAsTable(table)
    return spark.table(table)
