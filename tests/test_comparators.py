"""Comparator truth-table tests — FIXTURES.md F1 families.

Mirrors the reference's canonical unit shape (two value columns + expected
boolean, ``tests/test_spark.py:59-112``) without copying its tables.
"""

import datetime
import math

import pytest
from pyspark.sql import functions as F, types as T

from datacompy_spark import columns_equal


def check(spark, schema, rows, expected, **kwargs):
    df = spark.createDataFrame(rows, schema)
    got = [
        r["m"]
        for r in df.withColumn("m", columns_equal(df, "a", "b", **kwargs)).collect()
    ]
    assert got == expected, f"got {got} expected {expected}"


class TestNumeric:
    def test_exact_and_nulls(self, spark):
        rows = [(1.0, 1.0), (2.0, 2.1), (4.0, None), (None, 4.0), (None, None)]
        check(spark, "a double, b double", rows, [True, False, False, False, True])

    def test_abs_tol(self, spark):
        rows = [(1.0, 1.0), (2.0, 2.1), (3.0, 4.0)]
        check(spark, "a double, b double", rows, [True, True, False], abs_tol=0.2)

    def test_rel_tol_asymmetric_in_df2(self, spark):
        # |a-b| <= rel_tol * |b|: (100, 90) → 10 <= 0.1*90=9 → False;
        # (90, 100) → 10 <= 0.1*100=10 → True (np.isclose asymmetry)
        rows = [(100.0, 90.0), (90.0, 100.0)]
        check(spark, "a double, b double", rows, [False, True], rel_tol=0.1)

    def test_nan_semantics(self, spark):
        nan = float("nan")
        rows = [(nan, nan), (nan, 1.0), (1.0, nan)]
        check(spark, "a double, b double", rows, [True, False, False])

    def test_infinity(self, spark):
        inf = float("inf")
        rows = [(inf, inf), (inf, 1.0), (-inf, inf)]
        check(spark, "a double, b double", rows, [True, False, False])

    def test_cross_width_int_double(self, spark):
        rows = [(1, 1.0), (2, 2.0000001), (3, 4.0)]
        check(spark, "a bigint, b double", rows, [True, False, False])
        check(spark, "a bigint, b double", rows, [True, True, False], abs_tol=0.001)

    def test_decimal_vs_double(self, spark):
        from decimal import Decimal

        rows = [(Decimal("1.00"), 1.0), (Decimal("1.50"), 1.6), (None, 1.0)]
        check(
            spark,
            T.StructType(
                [
                    T.StructField("a", T.DecimalType(38, 2)),
                    T.StructField("b", T.DoubleType()),
                ]
            ),
            rows,
            [True, False, False],
        )

    def test_large_bigint_no_overflow(self, spark):
        # integral pre-cast to double dodges ANSI overflow on subtraction.
        # Parity caveat (same in the reference, numeric.py:293-304): values
        # beyond double's 53-bit mantissa lose precision, so 2^62 and 2^62-1
        # compare EQUAL under tolerance arithmetic. Values within 2^53 are exact.
        big = 2**62
        rows = [(big, big - 1), (big, big), (2**52, 2**52 - 1)]
        check(spark, "a bigint, b bigint", rows, [True, True, False])


class TestString:
    def test_basic_and_unicode(self, spark):
        rows = [("aa", "aa"), ("aa", "ab"), ("日本", "日本"), ("🎉", "🎉"), (None, None), ("x", None)]
        check(
            spark, "a string, b string", rows, [True, False, True, True, True, False]
        )

    def test_ignore_spaces_and_case(self, spark):
        rows = [("aa ", "aa"), ("AA", "aa"), (" a A ", "a a")]
        check(spark, "a string, b string", rows, [False, False, False])
        check(spark, "a string, b string", rows, [True, False, False], ignore_spaces=True)
        check(spark, "a string, b string", rows, [False, True, False], ignore_case=True)
        check(
            spark,
            "a string, b string",
            rows,
            [True, True, True],  # " a A " → trim+upper → "A A" == upper("a a")
            ignore_spaces=True,
            ignore_case=True,
        )

    def test_string_vs_date_try_cast(self, spark):
        d = datetime.date(2024, 3, 1)
        rows = [("2024-03-01", d), ("2024-03-02", d), ("garbage", d), (None, None)]
        schema = T.StructType(
            [T.StructField("a", T.StringType()), T.StructField("b", T.DateType())]
        )
        # malformed string → TRY_CAST NULL → False, never an ANSI error
        check(spark, schema, rows, [True, False, False, True])

    def test_string_vs_timestamp(self, spark):
        ts = datetime.datetime(2024, 3, 1, 12, 30)
        rows = [("2024-03-01 12:30:00", ts), ("not a ts", ts)]
        schema = T.StructType(
            [T.StructField("a", T.StringType()), T.StructField("b", T.TimestampType())]
        )
        check(spark, schema, rows, [True, False])

    def test_date_vs_date(self, spark):
        d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
        rows = [(d1, d1), (d1, d2), (None, d1)]
        schema = T.StructType(
            [T.StructField("a", T.DateType()), T.StructField("b", T.DateType())]
        )
        check(spark, schema, rows, [True, False, False])


class TestBoolean:
    def test_bool_bool(self, spark):
        rows = [(True, True), (True, False), (None, None), (True, None)]
        check(spark, "a boolean, b boolean", rows, [True, False, True, False])

    def test_bool_numeric(self, spark):
        rows = [(True, 1), (False, 0), (True, 0), (False, 1), (True, 2), (None, None)]
        check(
            spark, "a boolean, b bigint", rows, [True, True, False, False, False, True]
        )

    def test_bool_decimal(self, spark):
        from decimal import Decimal

        schema = T.StructType(
            [T.StructField("a", T.BooleanType()), T.StructField("b", T.DecimalType(38, 2))]
        )
        rows = [(True, Decimal("1.00")), (False, Decimal("0.00")), (True, Decimal("0.50"))]
        check(spark, schema, rows, [True, True, False])

    def test_bool_string_declined_to_false(self, spark):
        # deliberately NOT claimed (ref boolean.py:243-247) → constant False
        rows = [(True, "True"), (True, "yes"), (False, "False")]
        check(spark, "a boolean, b string", rows, [False, False, False])


class TestArray:
    def test_array_semantics(self, spark):
        rows = [
            ([1, 2], [1, 2]),
            ([1, 2], [2, 1]),       # order matters
            ([1, 2], [1, 2, 3]),    # length matters
            ([None], [None]),
            ([1], [None]),
            (None, None),
        ]
        check(
            spark,
            "a array<int>, b array<int>",
            rows,
            [True, False, False, True, False, True],
        )


class TestUnclaimed:
    def test_numeric_vs_array_constant_false(self, spark):
        rows = [(1.0, [1]), (2.0, [2])]
        check(spark, "a double, b array<int>", rows, [False, False])


class TestComplexExtension:
    def test_struct(self, spark):
        rows = [((1, "a"), (1, "a")), ((1, "a"), (1, "b"))]
        schema = "a struct<x:int,y:string>, b struct<x:int,y:string>"
        check(spark, schema, rows, [True, False])

    def test_map_order_insensitive(self, spark):
        rows = [({"k1": 1, "k2": 2}, {"k2": 2, "k1": 1}), ({"k1": 1}, {"k1": 2})]
        schema = "a map<string,int>, b map<string,int>"
        check(spark, schema, rows, [True, False])

    def test_binary(self, spark):
        rows = [(b"ab", b"ab"), (b"ab", b"ac")]
        check(spark, "a binary, b binary", rows, [True, False])


class TestCustomComparator:
    def test_custom_comparator_first_wins(self, spark):
        from datacompy_spark import BaseComparator

        class AlwaysTrueStrings(BaseComparator):
            def compare(self, df, col1, col2, **kwargs):
                if isinstance(df.schema[col1].dataType, T.StringType):
                    return F.lit(True)
                return None

        rows = [("a", "b"), (None, "x")]
        check(
            spark,
            "a string, b string",
            rows,
            [True, True],
            comparators=[AlwaysTrueStrings()],
        )
