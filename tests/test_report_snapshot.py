"""Golden-output snapshot test for report() (reference test layer 3,
``tests/test_report_snapshots.py``). Regenerate with
DATACOMPY_REGEN_SNAPSHOTS=1 after intentional format changes."""

import os
import pathlib

import pytest

from datacompy_spark import SparkCompare

SNAP = pathlib.Path(__file__).parent / "snapshots" / "report_with_mismatches.txt"


@pytest.fixture()
def cmp_(spark):
    df1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id bigint, val string, score double",
    )
    df2 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "x", 2.0), (4, "d", 4.5)],
        "id bigint, val string, score double",
    )
    return SparkCompare(spark, df1, df2, join_columns="id")


def test_report_snapshot(cmp_):
    text = cmp_.report(sample_count=5)
    if os.environ.get("DATACOMPY_REGEN_SNAPSHOTS") == "1" or not SNAP.exists():
        SNAP.parent.mkdir(exist_ok=True)
        SNAP.write_text(text)
    assert text == SNAP.read_text()


def test_custom_template(cmp_, tmp_path):
    tpl = tmp_path / "short.j2"
    tpl.write_text(
        "{{ df1_name }} vs {{ df2_name }}: common={{ row_summary.common_rows }} "
        "unequal={{ row_summary.unequal_rows }}"
    )
    out = cmp_.build_report_data().render(template_path=str(tpl))
    assert out == "df1 vs df2: common=2 unequal=1"


def test_template_name_resolution(cmp_):
    """Reference-style resolution: bare name, name+.j2, absolute path
    (ref base.py:493-533)."""
    data = cmp_.build_report_data()
    full = data.render()
    assert data.render(template_path="report_template") == full
    assert data.render(template_path="report_template.j2") == full
    with pytest.raises(FileNotFoundError):
        data.render(template_path="no_such_template")
    with pytest.raises(FileNotFoundError):
        data.render(template_path="/absolute/missing.j2")


def test_report_header_matches_reference(cmp_):
    text = cmp_.report()
    assert text.startswith("DataComPy Comparison\n-------------------\n")
    assert "DataFrame Summary" in text
    assert "Default Absolute Tolerance: 0" in text
