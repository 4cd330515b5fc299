"""io.py format dispatch: parquet paths end-to-end, Iceberg branch via a
faked catalog (the container ships no Iceberg runtime jars — these mocks
pin the exact catalog calls the branch makes, so wiring is covered
without the runtime)."""

import os
from unittest import mock

import pytest

from sketchlib.io import _is_path, iceberg_available, read_table, snapshot_id, write_table


def test_is_path_dispatch():
    assert _is_path("/tmp/x.parquet")
    assert _is_path("s3a://bucket/key")
    assert _is_path("file:/x")
    assert not _is_path("db.tbl")
    assert not _is_path("catalog.db.tbl")


def test_parquet_roundtrip_and_snapshot(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    write_table(df, path, mode="overwrite")
    got = read_table(spark, path)
    assert got.count() == 100
    fp1 = snapshot_id(spark, path)
    assert fp1.startswith("files:")
    # stable for an unchanged dir, changes when files change
    assert snapshot_id(spark, path) == fp1
    df.limit(10).write.mode("append").parquet(path)
    assert snapshot_id(spark, path) != fp1


class TestIcebergBranchFakedCatalog:
    def test_read_uses_iceberg_format(self):
        spark = mock.MagicMock()
        read_table(spark, "cat.db.tbl")
        spark.read.format.assert_called_once_with("iceberg")
        spark.read.format.return_value.load.assert_called_once_with("cat.db.tbl")

    def test_write_append_and_replace(self):
        df = mock.MagicMock()
        write_table(df, "db.tbl", mode="append")
        df.writeTo.assert_called_once_with("db.tbl")
        df.writeTo.return_value.append.assert_called_once_with()
        df.reset_mock()
        write_table(df, "db.tbl", mode="overwrite")
        df.writeTo.return_value.replace.assert_called_once_with()
        with pytest.raises(ValueError, match="unsupported mode"):
            write_table(df, "db.tbl", mode="ignore")

    def test_snapshot_id_reads_snapshots_metadata(self):
        spark = mock.MagicMock()
        first = spark.read.format.return_value.load.return_value.orderBy.return_value.select.return_value.first
        first.return_value = (12345,)
        got = snapshot_id(spark, "db.tbl")
        assert got == "iceberg:12345"
        spark.read.format.assert_called_once_with("iceberg")
        # reads the table's .snapshots metadata relation, newest first
        spark.read.format.return_value.load.assert_called_once_with("db.tbl.snapshots")
        load = spark.read.format.return_value.load.return_value
        load.orderBy.assert_called_once_with("committed_at", ascending=False)
        load.orderBy.return_value.select.assert_called_once_with("snapshot_id")

    def test_iceberg_unavailable_here(self, spark):
        # honest environment statement: no Iceberg jars in this container
        assert iceberg_available(spark) is False


def test_file_manifest_parquet_and_direct_feed(spark, tmp_path):
    from sketchlib.agg import SketchSpec, sketch_aggregate, sketch_aggregate_direct
    from sketchlib.io import file_manifest

    path = str(tmp_path / "m.parquet")
    spark.range(0, 500, 1, 4).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS g"
    ).write.parquet(path)
    files = file_manifest(spark, path)
    assert len(files) == 4
    assert files == sorted(files)
    # file: URIs normalized to plain paths pyarrow can open
    assert all(os.path.exists(f) for f in files)
    # the manifest IS the direct feed's input: byte-parity with the JVM feed
    specs = [SketchSpec("h", "hll", "id", {"p": 12, "seed": 1})]
    a = {
        (r["g"], r["sketch"]): bytes(r["state"])
        for r in sketch_aggregate_direct(spark, files, ["g"], specs).collect()
    }
    b = {
        (r["g"], r["sketch"]): bytes(r["state"])
        for r in sketch_aggregate(spark.read.parquet(path), ["g"], specs).collect()
    }
    assert a == b


def test_file_manifest_iceberg_branch():
    rows = [mock.Mock(file_path=f"file:/tmp/ice/data/f{i}.parquet") for i in (2, 0, 1)]
    reader = mock.Mock()
    reader.format.return_value = reader
    reader.load.return_value = reader
    reader.select.return_value = reader
    reader.collect.return_value = rows
    spark = mock.Mock()
    spark.read = reader
    from sketchlib.io import file_manifest

    got = file_manifest(spark, "cat.db.seq")
    reader.load.assert_called_once_with("cat.db.seq.files")
    assert got == [f"/tmp/ice/data/f{i}.parquet" for i in (0, 1, 2)]
