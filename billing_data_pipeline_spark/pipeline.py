"""The end-to-end billing pipeline job (SURVEY.md §2.11 O1-O2, §3).

The reference's 7-asset Dagster DAG — billing_files -> billing_db ->
{daily,user,service,region}_aggregates -> billing_insights (reference:
pipeline/pipeline.py:165-182) — expressed as explicit Spark stages: each
stage is a function with a write at its boundary, dependencies are function
composition, lineage is the Spark UI. No orchestration framework: an
external scheduler calls ``run()`` (the reference's cron entry, ST3).

Stage semantics preserved:
- ingest: Hive-partitioned CSV lake -> idempotent anti-join append into
  ``raw_billing`` (J1) with a content-hash file ledger (ST5) and a
  partition-pruned backfill window (ST6/OPT1).
- aggregates: four FULL-REFRESH tables (the reference's DELETE + INSERT,
  S8/OPT5) as atomic parquet overwrites.
- insights: the five report queries -> markdown at the collect edge (S10).

Every stage returns an O2-style metrics dict.
"""

from __future__ import annotations

import os
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.aggregates import grouped_profile
from .operators.ingest import append_new_rows_per_file
from .operators.ledger import FileLedger, hash_files, ledger_key
from .operators.reports import billing_insights
from .sources.csv_source import (
    RAW_BILLING_KEYS,
    parse_hive_partition_keys,
    read_partition_root,
)

class BillingPipeline:
    """One warehouse directory holding raw_billing + the four aggregate
    tables + the processing ledger, all plain parquet."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = warehouse_dir

    def table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    #: full-refresh tables that publish through SnapshotTable on a local
    #: warehouse (review r6: a crash mid-plain-overwrite deletes the old
    #: aggregate table before the new one commits — the exact torn-table
    #: failure versioned_sink exists to prevent; its own docstring says
    #: Spark overwrite "is NOT atomic")
    _SNAPSHOT_TABLES = ("daily_aggs", "user_aggs", "service_aggs", "region_aggs")

    def _snapshot_capable(self) -> bool:
        """SnapshotTable's manifest/lock protocol is os-level (POSIX
        rename); remote warehouses (s3a://, hdfs://) keep the plain
        overwrite until a conditional-PUT manifest backend exists —
        documented residual, mirrors versioned_sink's own object-store
        note."""
        return "://" not in self.warehouse or self.warehouse.startswith("file:")

    def read(self, name: str) -> DataFrame:
        if name == "processed_files":
            # the ledger publishes via a versioned dir + atomic pointer
            # (r4 crash-safety); its own load() resolves the pointer
            return FileLedger(self.spark, self.table_path(name)).load()
        if name in self._SNAPSHOT_TABLES and self._snapshot_capable():
            # snapshot_table_for, not a raw SnapshotTable(url) (review
            # r7): a 'file:///...' warehouse handed the literal URL to
            # os.rename/makedirs, creating a cwd-relative 'file:' junk
            # tree and crashing every publish; the factory normalizes
            # the scheme once for the whole kit.
            from .sources.os_snapshot import snapshot_table_for

            st = snapshot_table_for(self.spark, self.table_path(name))
            if st.latest_version() is not None:
                return st.read()
            # pre-r6 warehouse written as plain parquet: fall through
        return self.spark.read.parquet(self.table_path(name))

    # -- stage 1: ingest ----------------------------------------------------

    def ingest(
        self,
        source_root: str,
        from_date: date | None = None,
        to_date: date | None = None,
    ) -> dict:
        """billing_files + billing_db (reference: pipeline/assets/ingest.py):
        partition-pruned lake read, file-hash ledger skip, anti-join append."""
        lake = read_partition_root(
            self.spark, source_root, from_date=from_date, to_date=to_date
        )
        # Ledger: skip files whose (name, md5) is already recorded (ST5).
        # O(files-in-window) driver memory — filenames only, bounded by the
        # partition-pruned backfill window, never by data volume; matches
        # the reference's own per-file driver loop (ingest.py:214-272).
        # inputFiles() lists from the file index — metadata only. The
        # previous input_file_name().distinct().collect() scanned and
        # shuffled the window's DATA to learn its paths, and a header-only
        # (0-row) file never surfaced, so it was re-hashed every run
        # (review r3). inputFiles() is NOT window-pruned, though (review
        # r5, verified live): the backfill filter prunes at PLAN time
        # while inputFiles() reads the unpruned index — without the
        # explicit path filter below, out-of-window files were hashed,
        # ledger-recorded with 0 ingested rows, and PERMANENTLY skipped
        # by every later backfill that actually covered them (silent data
        # loss), while every run re-hashed the whole lake.
        files = sorted(lake.inputFiles())
        if from_date is not None or to_date is not None:
            def _in_window(p: str) -> bool:
                ks = parse_hive_partition_keys(p)
                try:
                    d = date(int(ks["year"]), int(ks["month"]), int(ks["day"]))
                except (KeyError, ValueError):
                    return True  # unpartitioned path: keep; the read decides
                return (from_date is None or d >= from_date) and (
                    to_date is None or d <= to_date
                )

            files = [p for p in files if _in_window(p)]
        ledger = FileLedger(self.spark, self.table_path("processed_files"))
        metrics = {
            "files_discovered": len(files),
            "files_new_or_changed": 0,
            "rows_appended": 0,
        }
        if not files:
            return metrics
        candidates = hash_files(self.spark, files)
        todo = ledger.filter_unprocessed(candidates).collect()
        todo_names = {r["filename"] for r in todo}
        metrics["files_new_or_changed"] = len(todo_names)
        if not todo_names:
            return metrics

        # Filter the lake to new/changed files using the SAME partition-
        # qualified key the ledger uses (basenames collide across Hive
        # partitions — every partition's file is 'billing.csv').
        batch = lake.withColumn("_lk", ledger_key(F.input_file_name())).filter(
            F.col("_lk").isin(todo_names)
        )
        n, per_file = append_new_rows_per_file(
            batch, self.table_path("raw_billing"), list(RAW_BILLING_KEYS), "_lk"
        )
        # Per-file new-row counts, matching the reference's per-file
        # new_record_count (ingest.py:262-265) — a file whose rows were all
        # already present records 0, not the batch total.
        ledger.record(
            [(r["filename"], r["file_hash"], per_file.get(r["filename"], 0)) for r in todo]
        )
        metrics["rows_appended"] = n
        return metrics

    # -- stage 2: aggregates (full refresh, OPT4/OPT5) ----------------------

    def build_aggregates(self) -> dict:
        raw = self.read("raw_billing")
        succ = F.col("success")
        tables = {
            # reference: aggregates.py:34-48
            "daily_aggs": grouped_profile(
                raw,
                ["year", "month", "day"],
                "credit_usage",
                distinct_cols={
                    "unique_users": "user_id",
                    "unique_resources": "resource_id",
                },
                conditions={"success_count": succ, "failure_count": ~succ},
            ),
            # reference: aggregates.py:99-115
            "user_aggs": grouped_profile(
                raw,
                ["user_id"],
                "credit_usage",
                distinct_cols={
                    "unique_resources": "resource_id",
                    "resource_types_used": "resource_type",
                    "operation_types_used": "operation_type",
                    "regions_used": "region",
                },
                time_col="timestamp",
            ),
            # reference: aggregates.py:166-181
            "service_aggs": grouped_profile(
                raw,
                ["service_tier", "resource_type", "operation_type"],
                "credit_usage",
                distinct_cols={"unique_users": "user_id"},
                conditions={"success_count": succ, "failure_count": ~succ},
            ),
            # reference: aggregates.py:229-242
            "region_aggs": grouped_profile(
                raw,
                ["region"],
                "credit_usage",
                distinct_cols={
                    "unique_users": "user_id",
                    "resource_types_used": "resource_type",
                    "operation_types_used": "operation_type",
                },
            ),
        }
        # O2 metrics via the Observation API: row counts are collected from
        # the SAME job that writes each table — no read-back count scan.
        # At 100 TB the old pattern (write, then re-scan to count) doubled
        # the I/O of every aggregate refresh.
        from pyspark.sql import Observation

        metrics = {}
        snapshot = self._snapshot_capable()
        for name, df in tables.items():
            obs = Observation(f"{name}_obs")
            observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            if snapshot:
                # atomic publish: stage, rename, manifest swap — a crash
                # mid-refresh leaves the previous version readable, never
                # a deleted/torn table (review r6); keep one prior
                # version so in-flight readers of the old snapshot finish.
                # Via the factory: normalizes file:/// (review r7).
                from .sources.os_snapshot import snapshot_table_for

                st = snapshot_table_for(self.spark, self.table_path(name))
                st.commit(observed, mode="overwrite")
                st.vacuum(keep=2)
            else:
                observed.write.mode("overwrite").parquet(self.table_path(name))
            try:
                metrics[f"{name}_rows"] = obs.get["rows"]
            except Exception:
                # AQE empty-relation propagation can eliminate the
                # CollectMetrics node when the input is zero rows, so the
                # observation never materializes (same carve-out as
                # curate._obs_n). The write above still succeeded; read the
                # count back from the published table.
                metrics[f"{name}_rows"] = self.read(name).count()
        return metrics

    # -- stage 3: insights --------------------------------------------------

    def insights(self) -> tuple[str, dict]:
        return billing_insights(
            self.read("raw_billing"),
            self.read("user_aggs"),
            self.read("region_aggs"),
            ledger=self.read("processed_files"),
            # exact integer counts already materialized by build_aggregates
            # — folds the op-frequency/tier-rate sections without two more
            # full raw scans (review r6)
            service_aggs=self.read("service_aggs"),
        )

    def _table_data_bytes(self, name: str) -> int:
        """Data-file bytes of a warehouse table, scheme-aware. The local
        fast path is session.dir_input_bytes; non-posix warehouses
        (s3a://, hdfs://) go through the Hadoop FileSystem — os.walk on a
        remote URI silently measured 0 bytes and made run() skip every
        downstream stage forever (review r5)."""
        path = self.table_path(name)
        if "://" not in path or path.startswith("file:"):
            from .session import dir_input_bytes

            return dir_input_bytes(path.removeprefix("file:"))
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        try:
            fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            if not fs.exists(hpath):
                return 0
            total = 0
            it = fs.listFiles(hpath, True)
            while it.hasNext():
                f = it.next()
                p = f.getPath()
                n = p.getName()
                if not n.startswith((".", "_")):
                    # skip committer garbage under _temporary/ at any depth
                    if "/_" not in p.toString().split(path, 1)[-1]:
                        total += f.getLen()
            return total
        except Exception:
            # an unreachable FS must not silently look empty: let the
            # downstream read raise the real error
            return 1

    # -- the DAG ------------------------------------------------------------

    def run(
        self,
        source_root: str,
        from_date: date | None = None,
        to_date: date | None = None,
    ) -> dict:
        """Topological materialization of the whole asset graph."""
        metrics = {"ingest": self.ingest(source_root, from_date, to_date)}
        if self._table_data_bytes("raw_billing") == 0:
            # First-ever run over an empty window: nothing ingested, no
            # raw table yet — report empty metrics instead of crashing the
            # downstream reads (review r3; mirrors the reference's
            # continue-on-empty sensors). Checked via data-file bytes, not
            # bare directory existence: a crash-orphaned dir holding only
            # committer garbage (_temporary/...) must take this branch too,
            # or the downstream read dies on UNABLE_TO_INFER_SCHEMA.
            metrics["aggregates"] = {}
            metrics["insights"] = {}
            metrics["report_markdown"] = ""
            return metrics
        metrics["aggregates"] = self.build_aggregates()
        report, report_metrics = self.insights()
        metrics["insights"] = report_metrics
        metrics["report_markdown"] = report
        return metrics
