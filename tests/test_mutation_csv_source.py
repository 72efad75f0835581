"""Mutation-aware streaming CSV source (ST2 streaming closure, r6): the
reference's mtime-diff sensor (reference: pipeline/pipeline.py:120-146)
as a checkpointable Spark stream — new files AND in-place modifications
re-emit, across restarts."""

from __future__ import annotations

import os
import time
import uuid

from billing_data_pipeline_spark.sources.mutation_csv_source import (
    MutationCsvDataSource,
)

SCHEMA = "k long, v string, _file string"


def _write(path, rows, header=True):
    body = ("k,v\n" if header else "") + "".join(f"{a},{b}\n" for a, b in rows)
    path.write_text(body)
    # mtime granularity guard: ensure successive writes differ
    st = os.stat(path)
    os.utime(path, (st.st_atime, st.st_mtime + 0.01))


def _drain(spark, lake, ckpt, name):
    """One catch-up drain; returns the rows this drain emitted. foreachBatch
    sink (the memory sink refuses checkpoint recovery across restarts)."""
    sdf = (
        spark.readStream.format("mutation_csv")
        .schema(SCHEMA)
        .option("path", f"{lake}/*.csv")
        .load()
    )
    rows = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, _id: rows.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return rows


def test_mutation_stream_emits_new_and_modified_files(spark, tmp_path):
    spark.dataSource.register(MutationCsvDataSource)
    lake = tmp_path / "lake"
    lake.mkdir()
    _write(lake / "a.csv", [(1, "x"), (2, "y")])
    _write(lake / "b.csv", [(3, "z")])
    ckpt = tmp_path / "ckpt"

    got = _drain(spark, lake, ckpt, f"mut_{uuid.uuid4().hex[:8]}")
    assert sorted(r["k"] for r in got) == [1, 2, 3]

    # in-place modification: same name, new content -> whole file re-emits
    time.sleep(0.02)
    _write(lake / "a.csv", [(1, "x"), (2, "y"), (4, "w")])
    # plus a brand-new file
    _write(lake / "c.csv", [(5, "q")])
    got2 = _drain(spark, lake, ckpt, f"mut_{uuid.uuid4().hex[:8]}")
    ks = sorted(r["k"] for r in got2)
    # the second drain (same checkpoint) emits ONLY the delta: the
    # modified a.csv (full re-emission: 1,2,4) and the new c.csv (5)
    assert ks == [1, 2, 4, 5]
    files = {os.path.basename(r["_file"]) for r in got2}
    assert files == {"a.csv", "c.csv"}

    # unchanged lake: a third drain emits nothing
    got3 = _drain(spark, lake, ckpt, f"mut_{uuid.uuid4().hex[:8]}")
    assert got3 == []


def test_mutation_stream_mtime_buffer_defers_not_suppresses(spark, tmp_path):
    """The reference's buffer, recast as a DEFERRAL: a same-size mtime
    advance is held back only while the change is recent; once the file
    has been quiet past the buffer it re-emits on the next poll (the
    reference's own old_mtime+buffer form suppressed a genuine
    same-length edit FOREVER). A size change always counts."""
    from billing_data_pipeline_spark.sources.mutation_csv_source import (
        MutationCsvStreamReader,
    )
    from pyspark.sql.types import _parse_datatype_string

    lake = tmp_path / "lake"
    lake.mkdir()
    f = lake / "a.csv"
    _write(f, [(1, "x")])
    schema = _parse_datatype_string(SCHEMA)
    r = MutationCsvStreamReader(
        schema, {"path": f"{lake}/*.csv", "mtimebuffersecs": "0.4"}
    )
    rows, off = r.read(r.initialOffset())
    assert len(list(rows)) == 1
    # fresh same-size touch: deferred while inside the buffer window
    st = os.stat(f)
    os.utime(f, (st.st_atime, time.time()))
    rows2, off2 = r.read(off)
    assert list(rows2) == []
    # ... but NOT lost: once quiet past the buffer, the next poll emits
    time.sleep(0.5)
    rows3, off3 = r.read(off2)
    assert len(list(rows3)) == 1
    # real edit: size changes -> re-emit immediately, no deferral
    _write(f, [(1, "x"), (2, "longer")])
    rows4, _ = r.read(off3)
    assert len(list(rows4)) == 2


def test_mutation_failfast_rejects_malformed_shape(tmp_path):
    from billing_data_pipeline_spark.sources.mutation_csv_source import (
        MutationCsvStreamReader,
    )
    from pyspark.sql.types import _parse_datatype_string

    import pytest

    lake = tmp_path / "lake"
    lake.mkdir()
    (lake / "a.csv").write_text("k,v\n1\n")  # missing column
    r = MutationCsvStreamReader(
        _parse_datatype_string(SCHEMA),
        {"path": f"{lake}/*.csv", "permissive": "false"},
    )
    with pytest.raises(ValueError, match="fields"):
        list(r.read(r.initialOffset())[0])


def test_mutation_batch_reader_and_schema_guard(spark, tmp_path):
    spark.dataSource.register(MutationCsvDataSource)
    lake = tmp_path / "lake"
    lake.mkdir()
    _write(lake / "a.csv", [(1, "x")])
    _write(lake / "b.csv", [(2, "y")])
    df = (
        spark.read.format("mutation_csv")
        .schema(SCHEMA)
        .option("path", f"{lake}/*.csv")
        .load()
    )
    assert sorted(r["k"] for r in df.collect()) == [1, 2]
    # missing the _file column -> clear error
    import pytest

    bad = (
        spark.read.format("mutation_csv")
        .schema("k long, v string")
        .option("path", f"{lake}/*.csv")
        .load()
    )
    with pytest.raises(Exception, match="_file"):
        bad.collect()


def test_mutation_stream_offset_cap_fails_fast(tmp_path):
    from billing_data_pipeline_spark.sources.mutation_csv_source import (
        MutationCsvStreamReader,
    )
    from pyspark.sql.types import _parse_datatype_string

    lake = tmp_path / "lake"
    lake.mkdir()
    for i in range(5):
        _write(lake / f"f{i}.csv", [(i, "x")])
    r = MutationCsvStreamReader(
        _parse_datatype_string(SCHEMA),
        {"path": f"{lake}/*.csv", "maxfilesinoffset": "3"},
    )
    import pytest

    with pytest.raises(RuntimeError, match="maxFilesInOffset"):
        r.read(r.initialOffset())


def test_mutation_offset_prunes_vanished_files_and_reemits_on_restore(tmp_path):
    """Deleted files are dropped from the checkpointed snapshot (the offset
    tracks the LIVE directory, not its whole history), and a restore —
    even byte-identical with a preserved mtime, `cp -p` style — re-emits
    as a new file instead of being swallowed by a stale fingerprint
    (advice r6)."""
    import shutil

    from billing_data_pipeline_spark.sources.mutation_csv_source import (
        MutationCsvStreamReader,
    )
    from pyspark.sql.types import _parse_datatype_string

    lake = tmp_path / "lake"
    lake.mkdir()
    _write(lake / "a.csv", [(1, "x")])
    _write(lake / "b.csv", [(2, "y")])
    backup = tmp_path / "a.bak"
    shutil.copy2(lake / "a.csv", backup)  # preserves mtime AND size

    r = MutationCsvStreamReader(
        _parse_datatype_string(SCHEMA), {"path": f"{lake}/*.csv"}
    )
    rows, off1 = r.read(r.initialOffset())
    assert sorted(t[0] for t in rows) == [1, 2]
    assert set(os.path.basename(p) for p in off1["files"]) == {"a.csv", "b.csv"}

    # delete a.csv -> the prune is DEFERRED one poll (review r7: a
    # one-trigger listing blip must not dump the snapshot), then drops
    os.unlink(lake / "a.csv")
    rows, off2 = r.read(off1)
    assert list(rows) == []
    assert set(os.path.basename(p) for p in off2["files"]) == {"a.csv", "b.csv"}
    rows, off2b = r.read(off2)
    assert list(rows) == []
    assert set(os.path.basename(p) for p in off2b["files"]) == {"b.csv"}

    # restore with identical mtime:size -> counts as NEW, re-emits
    shutil.copy2(backup, lake / "a.csv")
    rows, off3 = r.read(off2b)
    assert sorted(t[0] for t in rows) == [1]
    assert set(os.path.basename(p) for p in off3["files"]) == {"a.csv", "b.csv"}

    # a restore DURING the deferral window cancels the pending drop and
    # does NOT re-emit (the stale fingerprint still matches: unchanged)
    os.unlink(lake / "a.csv")
    rows, off4 = r.read(off3)  # first miss: retained, pending
    assert set(os.path.basename(p) for p in off4["files"]) == {"a.csv", "b.csv"}
    shutil.copy2(backup, lake / "a.csv")
    rows, off5 = r.read(off4)
    assert list(rows) == []  # fingerprint unchanged -> no duplicate rows
    assert set(os.path.basename(p) for p in off5["files"]) == {"a.csv", "b.csv"}
