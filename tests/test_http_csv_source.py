"""The http_csv Python DataSource (sources/http_csv_source.py): URL-per-
partition parallel CSV ingestion, typed conversion, malformed-row policy."""

import pytest

from billing_data_pipeline_spark.sources.http_csv_source import HttpCsvDataSource

SCHEMA = "ts timestamp, user_id string, amount double, ok boolean"


@pytest.fixture()
def csv_urls(tmp_path):
    a = tmp_path / "a.csv"
    a.write_text(
        "ts,user_id,amount,ok\n"
        "2025-04-23T10:00:00,u1,1.5,true\n"
        "2025-04-23T11:00:00,u2,2.0,false\n"
    )
    b = tmp_path / "b.csv"
    b.write_text(
        "ts,user_id,amount,ok\n"
        "2025-04-24T09:00:00,u3,,true\n"  # empty amount -> NULL
        "malformed,row\n"  # wrong arity -> KEPT null-filled (PERMISSIVE)
    )
    return [f"file://{a}", f"file://{b}"]


def test_http_csv_reads_urls_in_parallel_partitions(spark, csv_urls):
    spark.dataSource.register(HttpCsvDataSource)
    df = (
        spark.read.format("http_csv")
        .schema(SCHEMA)
        .option("urls", ",".join(csv_urls))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per URL
    rows = {r["user_id"]: r for r in df.collect()}
    # PERMISSIVE keeps the malformed row null-filled (Spark's CSV
    # contract — review r4: it was silently dropped before): 'malformed'
    # fails the timestamp parse -> NULL ts, 'row' is the user_id, the
    # two missing trailing fields pad with NULL.
    assert set(rows) == {"u1", "u2", "u3", "row"}
    assert rows["u1"]["amount"] == 1.5 and rows["u2"]["ok"] is False
    assert rows["u3"]["amount"] is None
    assert rows["row"]["ts"] is None
    assert rows["row"]["amount"] is None and rows["row"]["ok"] is None
    assert rows["u1"]["ts"].hour == 10


def test_http_csv_stream_drains_url_log(spark, csv_urls, tmp_path):
    # The streaming form treats the URL list as an ordered log: one URL
    # per trigger, offsets checkpointed, AvailableNow drains everything.
    import uuid

    spark.dataSource.register(HttpCsvDataSource)
    sdf = (
        spark.readStream.format("http_csv")
        .schema(SCHEMA)
        .option("urls", ",".join(csv_urls))
        .option("urlsPerTrigger", "1")
        .load()
    )
    name = f"httpcsv_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table(name).collect()
        # "row" = the malformed fixture line, kept null-filled (PERMISSIVE)
        assert {r["user_id"] for r in rows} == {"u1", "u2", "u3", "row"}
        # one URL per trigger -> the drain took at least 2 micro-batches
        fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(fed) >= 2
    finally:
        q.stop()


def test_http_csv_failfast_raises_on_malformed(spark, csv_urls):
    spark.dataSource.register(HttpCsvDataSource)
    df = (
        spark.read.format("http_csv")
        .schema(SCHEMA)
        .option("urls", csv_urls[1])
        .option("mode", "failfast")
        .load()
    )
    with pytest.raises(Exception, match="columns|PYTHON_DATA_SOURCE"):
        df.collect()


def test_http_csv_convert_and_url_split_edges():
    """Review r7 triple: RFC3339 'Z' timestamps parse on the 3.10 floor
    (fromisoformat rejects the suffix there — permissive mode silently
    nulled whole feeds), unsupported schema types fail at PLAN time in
    every mode (not per-row nulls / opaque serialization errors), and
    comma-splitting is decided per LINE (one signed URL must not fuse
    another line's comma-separated plain URLs)."""
    from datetime import datetime, timezone

    from pyspark.sql.types import (
        DecimalType,
        StructField,
        StructType,
        TimestampType,
    )

    from billing_data_pipeline_spark.sources.http_csv_source import (
        HttpCsvReader,
        _convert,
    )

    got = _convert("2025-04-01T00:00:00Z", TimestampType())
    assert got == datetime(2025, 4, 1, tzinfo=timezone.utc)

    with pytest.raises(TypeError, match="unsupported type"):
        HttpCsvReader(
            StructType([StructField("amount", DecimalType(10, 2))]),
            {"urls": "https://h/a.csv"},
        )

    r = HttpCsvReader(
        StructType([]),
        {"urls": "https://h/a.csv,https://h/b.csv\nhttps://h/c.csv?sig=x,y"},
    )
    assert r.urls == [
        "https://h/a.csv",
        "https://h/b.csv",
        "https://h/c.csv?sig=x,y",
    ]
