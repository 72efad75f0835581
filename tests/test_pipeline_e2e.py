"""End-to-end pipeline test: CSV lake -> idempotent ingest -> full-refresh
aggregates -> markdown insights, twice (SURVEY.md §5.3 idempotency)."""

from __future__ import annotations

from datetime import date

from billing_data_pipeline_spark.pipeline import BillingPipeline

CSV_HEADER = (
    "timestamp,resource_id,user_id,credit_usage,region,service_tier,"
    "operation_type,success,resource_type,invoice_id,currency\n"
)


def _write_lake(tmp_path):
    root = tmp_path / "lake"
    days = {22: 6, 23: 8}
    for day, n in days.items():
        p = root / "year=2025" / "month=04" / f"day={day:02d}"
        p.mkdir(parents=True)
        rows = "".join(
            f"2025-04-{day:02d} 10:00:{i:02d},res-{i % 3},user-{i % 4},{1.5 * (i + 1)},"
            f"{'eu' if i % 2 else 'us'},{'pro' if i % 3 else 'free'},inference,"
            f"{'true' if i % 5 else 'false'},gpu,inv-{day}-{i},USD\n"
            for i in range(n)
        )
        (p / "billing.csv").write_text(CSV_HEADER + rows)
    return str(root), sum(days.values())


def test_pipeline_end_to_end_idempotent(spark, tmp_path):
    root, n_rows = _write_lake(tmp_path)
    pipe = BillingPipeline(spark, str(tmp_path / "warehouse"))

    m1 = pipe.run(root)
    assert m1["ingest"]["rows_appended"] == n_rows
    assert pipe.read("raw_billing").count() == n_rows
    assert m1["aggregates"]["daily_aggs_rows"] == 2
    assert pipe.read("user_aggs").count() == 4
    assert pipe.read("processed_files").count() == 2

    report = m1["report_markdown"]
    assert "# Billing Insights Report" in report
    assert "Top 5 Most Active Users" in report
    assert "Success Rate by Service Tier" in report
    assert "Files processed: 2" in report

    # Per-file record counts (reference ingest.py:262-265): each ledger row
    # carries ITS file's appended rows, not the batch total.
    counts = sorted(
        r["record_count"] for r in pipe.read("processed_files").collect()
    )
    assert counts == [6, 8]

    # Second run over the unchanged lake: ledger skips both files, nothing
    # appends, aggregates recompute to identical state.
    m2 = pipe.run(root)
    assert m2["ingest"]["files_new_or_changed"] == 0
    assert m2["ingest"]["rows_appended"] == 0
    assert pipe.read("raw_billing").count() == n_rows
    assert m2["report_markdown"] == report

    # A new partition lands; its file is ALSO named billing.csv. Run 3 must
    # ingest only it, and run 4 must skip everything — i.e. recording the
    # new file must not evict the other partitions' ledger entries
    # (ADVICE r1 medium: basename-keyed ledgers break here).
    import pathlib

    p = pathlib.Path(root) / "year=2025" / "month=04" / "day=24"
    p.mkdir(parents=True)
    (p / "billing.csv").write_text(
        CSV_HEADER
        + "2025-04-24 10:00:00,res-9,user-9,2.5,us,pro,inference,true,gpu,inv-24-0,USD\n"
    )
    m3 = pipe.run(root)
    assert m3["ingest"]["files_new_or_changed"] == 1
    assert m3["ingest"]["rows_appended"] == 1
    assert pipe.read("processed_files").count() == 3

    m4 = pipe.run(root)
    assert m4["ingest"]["files_new_or_changed"] == 0
    assert m4["ingest"]["rows_appended"] == 0
    assert pipe.read("raw_billing").count() == n_rows + 1


def test_pipeline_backfill_window_limits_ingest(spark, tmp_path):
    root, _ = _write_lake(tmp_path)
    pipe = BillingPipeline(spark, str(tmp_path / "wh2"))
    m = pipe.ingest(root, from_date=date(2025, 4, 23), to_date=date(2025, 4, 23))
    assert m["rows_appended"] == 8  # only day=23
    days = {r["day"] for r in pipe.read("raw_billing").select("day").collect()}
    assert days == {23}


def test_ingest_backfill_window_does_not_ledger_out_of_window_files(spark, tmp_path):
    """Review r5 (verified live): inputFiles() is not window-pruned, so a
    windowed ingest previously hashed out-of-window files, recorded them
    in the ledger with 0 ingested rows, and every LATER backfill that
    actually covered them skipped their data permanently."""
    from datetime import date

    from billing_data_pipeline_spark.pipeline import BillingPipeline

    header = (
        "timestamp,resource_id,user_id,credit_usage,region,service_tier,"
        "operation_type,success,resource_type,invoice_id,currency\n"
    )
    root = tmp_path / "lake"
    for day in (1, 2, 3):
        p = root / "year=2025" / "month=04" / f"day={day:02d}"
        p.mkdir(parents=True)
        (p / "billing.csv").write_text(
            header
            + f"2025-04-{day:02d} 10:00:00,r-{day},u-{day},1.5,eu,pro,inf,true,gpu,inv-{day},USD\n"
        )
    pipe = BillingPipeline(spark, str(tmp_path / "wh"))
    m1 = pipe.ingest(str(root), from_date=date(2025, 4, 2), to_date=date(2025, 4, 2))
    assert m1["files_discovered"] == 1  # only the in-window file listed
    assert m1["rows_appended"] == 1
    # the out-of-window days must NOT be in the ledger: a later full
    # backfill still ingests them
    m2 = pipe.ingest(str(root))
    assert m2["files_new_or_changed"] == 2
    assert m2["rows_appended"] == 2
    assert pipe.read("raw_billing").count() == 3


def test_aggregates_publish_atomically_via_snapshots(spark, tmp_path):
    """Review r6: plain overwrite deleted the old aggregate table before
    the new job committed — a crash mid-refresh left a torn warehouse.
    Local warehouses now publish aggregates through SnapshotTable: each
    refresh is a new version behind an atomic manifest swap, the previous
    version stays readable for in-flight readers (keep=2), and a pre-r6
    plain-parquet table still reads through the fallback."""
    import os

    root, n_rows = _write_lake(tmp_path)
    wh = str(tmp_path / "wh_atomic")
    pipe = BillingPipeline(spark, wh)
    pipe.run(root)

    daily = os.path.join(wh, "daily_aggs")
    assert os.path.exists(os.path.join(daily, "_latest"))
    assert os.path.isdir(os.path.join(daily, "v=0"))
    assert pipe.read("daily_aggs").count() == 2

    # second refresh publishes v=1; keep=2 retains v=0 for readers
    pipe.build_aggregates()
    versions = sorted(d for d in os.listdir(daily) if d.startswith("v="))
    assert versions == ["v=0", "v=1"]
    assert pipe.read("daily_aggs").count() == 2

    # an empty-window third refresh is a no-op for correctness: reads
    # still resolve to a complete table at every point
    pipe.build_aggregates()
    assert pipe.read("daily_aggs").count() == 2

    # pre-r6 compatibility: a table written as plain parquet (no
    # manifest) reads through the fallback path
    legacy = BillingPipeline(spark, str(tmp_path / "wh_legacy"))
    pipe.read("daily_aggs").write.mode("overwrite").parquet(
        legacy.table_path("daily_aggs")
    )
    # remove any manifest the write never created; read must fall through
    assert not os.path.exists(
        os.path.join(legacy.table_path("daily_aggs"), "_latest")
    )
    assert legacy.read("daily_aggs").count() == 2


def test_billing_insights_renders_on_empty_and_all_null_input(spark):
    """Review r8: an empty lake (or an all-NULL measure column) makes the
    global SUM — and a zero-count tier's success rate — NULL; the report
    must render 0.00 / n/a instead of crashing on None.__format__ (the r4
    fix covered only the per-region totals)."""
    from billing_data_pipeline_spark.operators.reports import billing_insights

    raw = spark.createDataFrame(
        [],
        "user_id string, credit_usage double, region string,"
        " service_tier string, operation_type string, success boolean",
    )
    user_aggs = spark.createDataFrame([], "user_id string, transaction_count long")
    region_aggs = spark.createDataFrame([], "region string, total_usage double")
    md, metrics = billing_insights(raw, user_aggs, region_aggs)
    assert "**Total credit usage:** 0.00" in md
    assert metrics["total_credit_usage"] == 0.0

    # the service_aggs fold path: a tier whose success_count is NULL
    # (all successes unknown) has NULL success_rate -> n/a, not a crash
    service_aggs = spark.createDataFrame(
        [("free", "gpu", "inference", 3, None)],
        "service_tier string, resource_type string, operation_type string,"
        " transaction_count long, success_count long",
    )
    md2, _ = billing_insights(
        raw, user_aggs, region_aggs, service_aggs=service_aggs
    )
    assert "| free | n/a |" in md2  # NULL success rate renders, not crashes
