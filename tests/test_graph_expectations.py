"""PageRank fixed-point arithmetic and the declarative expectations engine."""

import math

import pytest
from pyspark.sql import functions as F

from datacompy_spark.operators.expectations import expect, expect_sql
from datacompy_spark.operators.graph import RANK_SCALE, pagerank


def _py_pagerank(edges, iterations=3, damping_pct=85):
    """Driver-side mirror of the fixed-point iteration for pinning."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    n = len(nodes)
    r = {v: RANK_SCALE // n for v in nodes}  # floor(double/double) == //
    tele = math.floor((RANK_SCALE * (100 - damping_pct)) / (100 * n))
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d, w in edges:
            inc[d] += math.floor((r[s] * w) / out_w[s])
        r = {v: tele + math.floor((damping_pct * inc[v]) / 100.0) for v in nodes}
    return r


class TestPagerank:
    def test_pins_to_reference_arithmetic(self, spark):
        edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "a", 1)]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        got = {r["node"]: r["rank_q"] for r in pagerank(df, weight_col="w").collect()}
        assert got == _py_pagerank(edges)

    def test_symmetry_and_mass(self, spark):
        # a 4-cycle is vertex-transitive: every node gets the same rank
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank_q"] for r in pagerank(df).collect()}
        assert len(set(got.values())) == 1
        # mass is conserved up to floor-rounding leakage
        assert abs(sum(got.values()) - RANK_SCALE) < 100 * len(got)

    def test_hub_outranks_leaf(self, spark):
        edges = [("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("hub", "l1")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank_q"] for r in pagerank(df).collect()}
        assert got["hub"] > max(got["l2"], got["l3"])

    def test_bad_damping_rejected(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            pagerank(df, damping_pct=0)


class TestExpectations:
    @pytest.fixture()
    def frame(self, spark):
        rows = [
            (1, "x", 10.0, "A-1"),
            (2, "y", 20.0, "B-2"),
            (2, None, 999.0, "bad"),
            (4, "z", -5.0, None),
        ]
        return spark.createDataFrame(rows, "id long, s string, v double, code string")

    def test_rule_matrix(self, spark, frame):
        rules = [
            {"rule": "not_null", "col": "s"},
            {"rule": "unique", "cols": ["id"]},
            {"rule": "accepted_values", "col": "s", "values": ["x", "y"]},
            {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 100.0},
            {"rule": "matches_regex", "col": "code", "pattern": "^[A-Z]-[0-9]$"},
        ]
        got = {r["rule"]: r for r in expect(frame, rules).collect()}
        assert got["not_null(s)"]["violations"] == 1
        assert got["unique(id)"]["violations"] == 1  # id=2 twice
        assert got["accepted_values(s)"]["violations"] == 1  # 'z'
        assert got["in_range(v,0.0,100.0)"]["violations"] == 2  # 999, -5
        assert got["matches_regex(code)"]["violations"] == 1  # 'bad'; NULL exempt
        assert all(r["total"] == 4 for r in got.values())
        assert not got["not_null(s)"]["passed"]

    def test_unique_counts_null_keys(self, spark):
        df = spark.createDataFrame(
            [(None, 1), (None, 1), (1, 2)], "a int, b int"
        )
        out = {r["rule"]: r for r in expect(df, [{"rule": "unique", "cols": ["a", "b"]}]).collect()}
        # the two (NULL, 1) rows collide — NULL is its own key token, it
        # does not make rows vacuously distinct
        assert out["unique(a,b)"]["violations"] == 1

    def test_unique_key_is_injective(self, spark):
        # adversarial values: in-band \x1f separators and a literal
        # NULL-sentinel string must NOT merge distinct tuples into one
        # composite key (per-part hash keys are injective)
        rows = [
            ("a\x1f", "b"),      # ('a\x1f','b') vs ('a','\x1fb') would
            ("a", "\x1fb"),      # collide under naive \x1f-joined concat
            ("\x1fNULL\x1f", "x"),
            (None, "x"),         # literal sentinel string vs real NULL
        ]
        df = spark.createDataFrame(rows, ["a", "b"])
        out = {r["rule"]: r for r in expect(df, [{"rule": "unique", "cols": ["a", "b"]}]).collect()}
        assert out["unique(a,b)"]["violations"] == 0

        import duckdb
        from datacompy_spark.operators.expectations import expect_sql

        con = duckdb.connect()
        con.register("t", df.toPandas())
        oracle = con.execute(
            expect_sql("t", [{"rule": "unique", "cols": ["a", "b"]}])
        ).df()
        assert int(oracle["violations"][0]) == 0

    def test_single_pass_plan(self, spark, frame):
        rules = [
            {"rule": "not_null", "col": "s"},
            {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 100.0},
        ]
        plan = expect(frame, rules)._jdf.queryExecution().executedPlan().toString()
        # row-level rules fold into one aggregate: no join, no extra scan
        assert "Join" not in plan

    def test_rejects_empty_and_duplicate(self, spark, frame):
        with pytest.raises(ValueError):
            expect(frame, [])
        with pytest.raises(ValueError):
            expect(frame, [{"rule": "not_null", "col": "s"}] * 2)
        with pytest.raises(ValueError):
            expect(frame, [{"rule": "frobnicate", "col": "s"}])

    def test_sql_twin_agrees(self, spark, frame):
        import duckdb

        rules = [
            {"rule": "not_null", "col": "s"},
            {"rule": "unique", "cols": ["id"]},
            {"rule": "accepted_values", "col": "s", "values": ["x", "y"]},
        ]
        con = duckdb.connect()
        con.register("t", frame.toPandas())
        oracle = con.execute(expect_sql("t", rules)).df().set_index("rule")
        got = expect(frame, rules).toPandas().set_index("rule")
        for rule in got.index:
            assert got.loc[rule, "violations"] == oracle.loc[rule, "violations"]
            assert bool(got.loc[rule, "passed"]) == bool(oracle.loc[rule, "passed"])
