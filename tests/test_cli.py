"""CLI tests: exit codes, thresholds, output formats (F2 fixture shape)."""

import json
import subprocess
import sys

import pytest

from datacompy_spark.cli import main


@pytest.fixture(scope="module")
def pair(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("cli")
    left = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "id bigint, name string, amount double",
    )
    right = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.005), (4, "dave", 40.0)],
        "id bigint, name string, amount double",
    )
    lp, rp = str(d / "left.parquet"), str(d / "right.parquet")
    left.coalesce(1).write.parquet(lp)
    right.coalesce(1).write.parquet(rp)
    return lp, rp


class TestExitCodes:
    def test_differ_exits_1(self, pair, capsys):
        rc = main(["compare", "--left", pair[0], "--right", pair[1], "--on", "id"])
        out = capsys.readouterr().out
        assert rc == 1
        assert "Column Summary" in out

    def test_identical_exits_0(self, pair, capsys):
        rc = main(["compare", "--left", pair[0], "--right", pair[0], "--on", "id"])
        assert rc == 0

    def test_threshold_pass(self, pair, capsys):
        # 1 unequal + 1 left-only + 1 right-only
        rc = main(
            ["compare", "--left", pair[0], "--right", pair[1], "--on", "id",
             "--max-unequal-rows", "3", "--include-unique-in-threshold"]
        )
        assert rc == 0
        rc = main(
            ["compare", "--left", pair[0], "--right", pair[1], "--on", "id",
             "--max-unequal-rows", "2", "--include-unique-in-threshold"]
        )
        assert rc == 1

    def test_abs_tol_heals_value_diff(self, pair, capsys):
        rc = main(
            ["compare", "--left", pair[0], "--right", pair[1], "--on", "id",
             "--abs-tol", "0.01", "--max-unequal-rows", "2",
             "--include-unique-in-threshold"]
        )
        assert rc == 0

    def test_bad_join_column_exits_2(self, pair, capsys):
        rc = main(["compare", "--left", pair[0], "--right", pair[1], "--on", "nope"])
        assert rc == 2
        assert "error:" in capsys.readouterr().err

    def test_missing_file_exits_2(self, pair, capsys):
        rc = main(["compare", "--left", "/does/not/exist.parquet",
                   "--right", pair[1], "--on", "id"])
        assert rc == 2


class TestOutputs:
    def test_json_format(self, pair, capsys):
        rc = main(["compare", "--left", pair[0], "--right", pair[1], "--on", "id",
                   "--format", "json"])
        data = json.loads(capsys.readouterr().out)
        assert data["row_summary"]["common_rows"] == 2
        assert rc == 1

    def test_html_to_file_quiet(self, pair, tmp_path, capsys):
        out = tmp_path / "report.html"
        rc = main(["compare", "--left", pair[0], "--right", pair[1], "--on", "id",
                   "--format", "html", "--output", str(out), "--quiet"])
        assert out.read_text().startswith("<html><head>")  # reference format
        assert capsys.readouterr().out == ""

    def test_export_mismatches_and_unique(self, pair, tmp_path, capsys, spark):
        mp, up = str(tmp_path / "mm"), str(tmp_path / "uq")
        rc = main(["compare", "--left", pair[0], "--right", pair[1], "--on", "id",
                   "--quiet", "--export-mismatches", mp, "--export-unique", up])
        assert rc == 1
        mm = spark.read.parquet(mp)
        assert [r["id"] for r in mm.collect()] == [2]
        uq = spark.read.parquet(up)
        assert sorted((r["side"], r["id"]) for r in uq.collect()) == [("left", 3), ("right", 4)]

    def test_csv_inputs(self, tmp_path, capsys):
        lp, rp = tmp_path / "l.csv", tmp_path / "r.csv"
        lp.write_text("id,v\n1,a\n2,b\n")
        rp.write_text("id,v\n1,a\n2,c\n")
        rc = main(["compare", "--left", str(lp), "--right", str(rp), "--on", "id"])
        assert rc == 1
        assert "v" in capsys.readouterr().out
