"""Report-format parity with the reference renderer.

The fixture ``tests/snapshots/ref_pandas_with_mismatches.txt`` is the
reference repo's published golden report for its known-diff scenario
(``tests/snapshots/pandas_with_mismatches.txt``). Our Spark engine renders
the same scenario; output must match byte-for-byte after accounting for the
one legitimate engine difference — dtype names (``int64``/``float64`` vs
``bigint``/``double``) and the fixed-width padding those names drive.
"""

import pathlib
import re

import pytest

from datacompy_spark import SparkCompare

REF_SNAP = pathlib.Path(__file__).parent / "snapshots" / "ref_pandas_with_mismatches.txt"
REF_JSON = pathlib.Path(__file__).parent / "snapshots" / "ref_report_data.json"

_DTYPES = {"float64": "double", "int64": "bigint", "object": "string"}


def _norm(text: str) -> list:
    """Collapse fixed-width gutters and map engine dtype names, so the
    comparison checks content + structure independent of dtype-name width."""
    out = []
    for line in text.strip().splitlines():
        toks = re.split(r"  +", line.strip())
        toks = [_DTYPES.get(t, t) for t in toks]
        if all(set(t) == {"-"} for t in toks if t):  # separator rows: width varies
            toks = ["-" * len(toks)]
        out.append(toks)
    return out


@pytest.fixture()
def ref_scenario(spark):
    df1 = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, 30, 3.0)], "id bigint, val bigint, score double"
    )
    df2 = spark.createDataFrame(
        [(1, 10, 1.0), (2, 99, 2.5), (3, 30, 3.0)], "id bigint, val bigint, score double"
    )
    return SparkCompare(spark, df1, df2, join_columns="id")


def test_reference_report_format(ref_scenario):
    ours = ref_scenario.report()
    assert _norm(ours) == _norm(REF_SNAP.read_text())


def test_reference_json_shape(ref_scenario):
    """Golden-JSON parity: ``to_dict()`` serialized through our JSON path
    must equal the reference CLI's JSON rendering of the same scenario
    (fixture generated via ref ``cli/output.py:render(data, "json")`` on the
    pandas backend) — key names, nesting, value types, sample strings, and
    ordering all identical; the single legitimate engine difference is dtype
    naming."""
    import json

    gold = json.loads(REF_JSON.read_text())
    ours = json.loads(ref_scenario.build_report_data().to_json())

    def norm(obj):
        if isinstance(obj, dict):
            return {
                k: (_DTYPES.get(v, v) if k in ("dtype1", "dtype2") else norm(v))
                for k, v in obj.items()
            }
        if isinstance(obj, list):
            return [norm(x) for x in obj]
        return obj

    assert norm(ours) == norm(gold)


def test_report_data_contract(ref_scenario):
    """Typed tree mirrors the reference's ReportData contract
    (ref ``report.py:50-331``)."""
    data = ref_scenario.build_report_data()
    assert data.row_summary.equal_rows == 2
    assert data.row_summary.unequal_rows == 1
    assert data.column_summary.df1_unique_columns == ()
    assert data.column_comparison.unequal_values == 2
    # join column present as an always-equal entry
    assert data.column_comparison.equal_columns == 1
    ms = data.mismatch_stats
    assert ms.has_mismatches and ms.has_samples
    assert [s.column for s in ms.stats] == ["score", "val"]  # sorted by name
    assert len(ms.samples) == 2
    d = data.to_dict()
    assert d["row_summary"]["common_rows"] == 3
    import json

    json.dumps(d, default=str)  # JSON-serializable


REF_DUPES = pathlib.Path(__file__).parent / "snapshots" / "ref_pandas_duplicates.txt"
REF_TOL = pathlib.Path(__file__).parent / "snapshots" / "ref_pandas_with_tolerances.txt"


def test_reference_duplicates_report_format(spark):
    """The reference's duplicate-keys golden (``tests/snapshots/
    pandas_duplicates.txt``, scenario from ``test_report_snapshots.py:88``):
    identical frames with a repeated join key — 'Any duplicates on match
    values: Yes', three common rows, zero mismatch sections."""
    df1 = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "id bigint, val bigint"
    )
    df2 = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "id bigint, val bigint"
    )
    c = SparkCompare(spark, df1, df2, join_columns="id")
    assert _norm(c.report()) == _norm(REF_DUPES.read_text())


def test_reference_tolerances_report_format(spark):
    """The reference's tolerance golden (``tests/snapshots/
    pandas_with_tolerances.txt``, scenario from
    ``test_report_snapshots.py:82``): abs_tol=0.001 absorbs a +0.0001
    drift — zero unequal values, and the tolerance itself is printed in
    the Row Summary."""
    df1 = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id bigint, val double")
    df2 = spark.createDataFrame(
        [(1, 1.0001), (2, 2.0001)], "id bigint, val double"
    )
    c = SparkCompare(spark, df1, df2, join_columns="id", abs_tol=0.001)
    assert _norm(c.report()) == _norm(REF_TOL.read_text())
