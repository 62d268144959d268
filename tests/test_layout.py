"""Z-order layout: Morton key correctness, NULL handling, and the
row-group-pruning payoff of the z-ordered writer."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datacompy_spark.operators.layout import zorder_key, zorder_key_sql, zorder_write


def _morton2(x: int, y: int, bits: int = 8) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_zorder_key_matches_reference_bit_math(spark):
    # ranges chosen so quantization is the identity: min=0, max=255
    rows = [(i, x, y) for i, (x, y) in enumerate([(0, 0), (255, 255), (0, 255), (3, 5), (128, 64)])]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    # pin min/max by including the corners in the data above
    got = {r["id"]: r["zval"] for r in zorder_key(df, ["x", "y"], bits=8).collect()}
    for i, x, y in rows:
        assert got[i] == _morton2(x, y), (i, x, y)


def test_zorder_key_quantizes_and_handles_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (3, None, 150), (4, 30, None)],
        ["id", "x", "y"],
    )
    out = zorder_key(df, ["x", "y"], bits=4).collect()
    z = {r["id"]: r["zval"] for r in out}
    # NULL quantizes to the cell floor, not NULL, and never poisons the key
    assert all(v is not None for v in z.values())
    # x: min 10 / max 30 -> q in {0, 7, 15}; y: min 100 / max 200 -> same.
    # x occupies even bit positions, y odd.
    assert z[1] == 0  # (q 0, q 0)
    assert z[2] == _morton2(7, 15, bits=4)  # (20, 200) -> (7, 15) = 191
    assert z[3] == _morton2(0, 7, bits=4)  # NULL x -> cell floor
    assert z[4] == _morton2(15, 0, bits=4)  # NULL y -> cell floor
    assert all(0 <= v < (1 << 8) for v in z.values())


def test_zorder_key_bits_cap():
    with pytest.raises(ValueError):
        zorder_key_sql("t", ["a", "b", "c"], bits=21)


def test_zorder_key_sql_matches_spark(spark, tmp_path):
    import duckdb

    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("x"),
        (F.col("id") * 91 % 53).alias("y"),
    )
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute(
        zorder_key_sql("t", ["x", "y"], bits=8, select_cols=["id", "x", "y"])
    ).df()
    got = zorder_key(df, ["x", "y"], bits=8).toPandas()
    merged = got.merge(oracle, on="id", suffixes=("", "_o"))
    assert (merged["zval"] == merged["zval_o"]).all()


def test_zorder_write_tightens_rowgroup_ranges(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("long").alias("o_day"),
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(orders, zpath, ["o_custkey", "o_day"], bits=8, target_files=8)

    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey", "o_day"}

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_day"), F.max("o_day")
    ).first()
    cust_span = max(1, stats[1] - stats[0])
    day_span = max(1, stats[3] - stats[2])

    def file_spans(col):
        spans = []
        for f in glob.glob(f"{zpath}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return spans

    # every z-ordered file covers a strict sub-box of BOTH dimensions:
    # a filter on either column can skip most files via footer min/max
    cust_spans = file_spans("o_custkey")
    day_spans = file_spans("o_day")
    assert len(cust_spans) >= 4
    assert sorted(cust_spans)[len(cust_spans) // 2] <= 0.6 * cust_span
    assert sorted(day_spans)[len(day_spans) // 2] <= 0.6 * day_span
