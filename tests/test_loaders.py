"""Source loader tests: format inference, csv/json/jsonl, ns-timestamps."""

import pytest

from datacompy_spark.sources import loaders as L


class TestInferFormat:
    def test_known_extensions(self):
        assert L.infer_format("/x/a.csv") == "csv"
        assert L.infer_format("/x/a.parquet") == "parquet"
        assert L.infer_format("/x/a.json") == "json"
        assert L.infer_format("/x/a.ndjson") == "jsonl"
        assert L.infer_format("/x/a.jsonl") == "jsonl"

    def test_tsv_deliberately_unmapped(self):
        # ref cli/backends.py:84-88: .tsv requires explicit format+delimiter
        assert L.infer_format("/x/a.tsv") is None


class TestLoad:
    def test_csv_with_delimiter(self, spark, tmp_path):
        p = tmp_path / "t.csv"
        p.write_text("id|v\n1|a\n2|b\n")
        df = L.load(spark, str(p), fmt="csv", delimiter="|")
        assert df.count() == 2 and df.columns == ["id", "v"]

    def test_jsonl(self, spark, tmp_path):
        p = tmp_path / "t.jsonl"
        p.write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
        df = L.load(spark, str(p))
        assert df.count() == 2 and set(df.columns) == {"id", "v"}

    def test_multiline_json(self, spark, tmp_path):
        p = tmp_path / "t.json"
        p.write_text('[{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]')
        df = L.load(spark, str(p))
        assert df.count() == 2

    def test_unknown_format_raises(self, spark):
        with pytest.raises(ValueError, match="cannot infer format"):
            L.load(spark, "/x/file.xyz")

    def test_ns_timestamp_parquet(self, spark, sf_dir):
        import duckdb

        df = L.load_table(spark, sf_dir, "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp"
        got = df.orderBy("event_id").limit(3).collect()
        want = duckdb.connect().execute(
            f"SELECT ts FROM '{sf_dir}/events.parquet' ORDER BY event_id LIMIT 3"
        ).fetchall()
        assert [r["ts"] for r in got] == [w[0] for w in want]


class TestCatalogTables:
    def test_unqualified_table_name(self, spark):
        spark.createDataFrame([(1, "a")], "id bigint, v string").createOrReplaceTempView(
            "ldr_plain"
        )
        assert L.load(spark, "ldr_plain").count() == 1

    def test_qualified_table_name(self, spark):
        # global temp views live under the two-part name global_temp.<name> —
        # the dotted-ref path the reference accepts (cli/backends.py:341-366)
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
        df.createOrReplaceGlobalTempView("ldr_qualified")
        assert L.load(spark, "global_temp.ldr_qualified").count() == 2

    def test_explicit_table_format(self, spark):
        spark.createDataFrame([(3, "c")], "id bigint, v string").createOrReplaceTempView(
            "ldr_fmt"
        )
        assert L.load(spark, "ldr_fmt", fmt="table").count() == 1

    def test_existing_file_without_extension_still_errors(self, spark, tmp_path):
        p = tmp_path / "noext"
        p.write_text("id,v\n1,a\n")
        with pytest.raises(ValueError, match="cannot infer format"):
            L.load(spark, str(p))


class TestConfRestore:
    def test_nanos_flag_restored_to_prior_value(self, spark, sf_dir):
        key = "spark.sql.legacy.parquet.nanosAsLong"
        spark.conf.set(key, "true")
        try:
            df = L.read_parquet(spark, f"{sf_dir}/events.parquet")
            df.limit(1).collect()
            assert spark.conf.get(key) == "true"
        finally:
            spark.conf.unset(key)


class TestOrc:
    def test_orc_round_trip_with_ntz_normalization(self, spark, tmp_path):
        src = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id bigint, v string"
        ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).expr(
            "timestamp_ntz '2024-01-02 03:04:05'"
        ))
        path = str(tmp_path / "t.orc")
        src.write.orc(path)
        df = L.load(spark, path)
        assert df.count() == 2
        assert dict(df.dtypes)["ts"] == "timestamp"  # NTZ normalized
        assert L.infer_format("x.orc") == "orc"


class TestTextAndBinary:
    def test_text_line_mode(self, spark, tmp_path):
        p = tmp_path / "corpus.txt"
        p.write_text("line one\nline two\nline three\n")
        df = L.read_text(spark, str(p))
        assert df.columns == ["value"]
        assert df.count() == 3

    def test_text_whole_file(self, spark, tmp_path):
        d = tmp_path / "docs"
        d.mkdir()
        (d / "a.txt").write_text("doc a\nhas two lines")
        (d / "b.txt").write_text("doc b")
        df = L.read_text(spark, str(d), whole=True)
        assert df.count() == 2
        texts = {r["value"] for r in df.collect()}
        assert "doc a\nhas two lines" in texts

    def test_binary_with_glob(self, spark, tmp_path):
        d = tmp_path / "media"
        d.mkdir()
        (d / "x.jpg").write_bytes(b"\xff\xd8\xff fakejpeg")
        (d / "y.jpg").write_bytes(b"\xff\xd8\xff other")
        (d / "z.wav").write_bytes(b"RIFF fakewav")
        df = L.read_binary(spark, str(d), glob="*.jpg")
        rows = df.collect()
        assert len(rows) == 2
        assert set(df.columns) >= {"path", "length", "content"}
        assert all(bytes(r["content"]).startswith(b"\xff\xd8\xff") for r in rows)
        # explicit fmt routing through load()
        assert L.load(spark, str(d), fmt="binary", glob="*.wav").count() == 1
