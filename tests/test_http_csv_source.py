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
        "malformed,row\n"  # wrong arity -> dropped in permissive mode
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
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"]["amount"] == 1.5 and rows["u2"]["ok"] is False
    assert rows["u3"]["amount"] is None
    assert rows["u1"]["ts"].hour == 10


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
