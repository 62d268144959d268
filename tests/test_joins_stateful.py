"""As-of join semantics + stateful streaming running totals."""

import datetime

import pytest
from pyspark.sql import functions as F

from datacompy_spark.operators.joins import asof_join
from datacompy_spark.sources.loaders import load_table
from datacompy_spark.streaming.stateful import running_totals


def ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


class TestAsofJoin:
    @pytest.fixture()
    def frames(self, spark):
        quotes = spark.createDataFrame(
            [(1, ts(0), 10.0), (1, ts(5), 11.0), (1, ts(10), 12.0), (2, ts(3), 99.0)],
            "uid bigint, t timestamp, px double",
        )
        trades = spark.createDataFrame(
            [(1, ts(4), "A"), (1, ts(5), "B"), (1, ts(12), "C"),
             (2, ts(1), "D"), (3, ts(9), "E")],
            "uid bigint, t timestamp, trade string",
        )
        return trades, quotes

    def test_backward_asof(self, spark, frames):
        trades, quotes = frames
        out = {
            r["trade"]: (r["asof_t"], r["asof_px"])
            for r in asof_join(
                trades, quotes, on=["uid"], ts_col="t", carry_cols=["px"]
            ).collect()
        }
        assert out["A"] == (ts(0), 10.0)    # most recent quote before 0:04
        assert out["B"] == (ts(5), 11.0)    # equal ts counts as prior (<=)
        assert out["C"] == (ts(10), 12.0)
        assert out["D"] == (None, None)     # quote for uid 2 arrives later
        assert out["E"] == (None, None)     # uid 3 has no quotes at all

    def test_asof_on_events(self, spark, sf_dir):
        # every purchase gets the most recent prior click's value, per user
        ev = load_table(spark, sf_dir, "events")
        purchases = ev.filter(F.col("event_type") == "purchase")
        clicks = ev.filter(F.col("event_type") == "click")
        out = asof_join(
            purchases, clicks, on=["user_id"], ts_col="ts",
            carry_cols=["value"], tiebreak_col="event_id",
        )
        assert out.count() == purchases.count()
        row = out.filter(F.col("asof_ts").isNotNull()).first()
        assert row["asof_ts"] <= row["ts"]


class TestRangeJoin:
    def test_boundaries_inclusive(self, spark):
        from datacompy_spark.operators.joins import range_join

        left = spark.createDataFrame([(1, ts(10), "P")], "uid bigint, t timestamp, p string")
        right = spark.createDataFrame(
            [(1, ts(0), "tooearly"), (1, ts(5), "edge_low"), (1, ts(8), "in"),
             (1, ts(10), "edge_high"), (1, ts(11), "late"), (2, ts(9), "otheruser")],
            "uid bigint, t timestamp, c string",
        )
        out = range_join(
            left, right, on=["uid"], left_ts="t", right_ts="t",
            lower_ms=-5 * 60_000, upper_ms=0,
        )
        got = sorted(r["c_r"] for r in out.collect())
        assert got == ["edge_high", "edge_low", "in"]

    def test_invalid_bounds(self, spark):
        from datacompy_spark.operators.joins import range_join

        df = spark.createDataFrame([(1, ts(0))], "uid bigint, t timestamp")
        with pytest.raises(ValueError, match="upper_ms"):
            range_join(df, df, on=["uid"], left_ts="t", right_ts="t",
                       lower_ms=0, upper_ms=0)


class TestStatefulRunningTotals:
    def test_stream_matches_batch(self, spark, sf_dir, tmp_path):
        ev = load_table(spark, sf_dir, "events")
        d = str(tmp_path / "ev")
        ev.coalesce(4).write.parquet(d)
        batch = spark.read.parquet(d)
        # maxFilesPerTrigger=1 → 4 separate micro-batches → state must carry
        # across batches for totals to come out right
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = (
            running_totals(stream, "event_type", "value")
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # update mode emits one row per key per touching batch; the LAST row
        # per key is the final running total
        import pandas as pd

        got_df = spark.table("running_totals").toPandas()
        got = {
            k: (int(g["n_events"].iloc[-1]), g["total_value"].iloc[-1], int(g["n_nulls"].iloc[-1]))
            for k, g in got_df.groupby("key")
        }
        want = {
            r["key"]: (r["n_events"], r["total_value"], r["n_nulls"])
            for r in running_totals(batch, "event_type", "value").collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][2] == want[k][2]
            assert abs(got[k][1] - want[k][1]) < 1e-6


class TestFunnel:
    def test_sequential_gap_semantics(self, spark):
        from datacompy_spark.operators.joins import funnel

        ts = lambda m: f"2026-01-01 00:{m:02d}:00"  # noqa: E731
        rows = [
            # u1 completes all three stages in order, within gaps
            (1, 1, ts(0), "view"), (2, 1, ts(5), "click"), (3, 1, ts(10), "purchase"),
            # u2: purchase BEFORE click → stops at click
            (4, 2, ts(0), "view"), (5, 2, ts(3), "purchase"), (6, 2, ts(8), "click"),
            # u3: click before any view → never enters the funnel past stage 0
            (7, 3, ts(0), "click"), (8, 3, ts(5), "view"),
            # u4: gap exceeded (view at :00, click 2h later)
            (9, 4, "2026-01-01 00:00:00", "view"), (10, 4, "2026-01-01 02:30:00", "click"),
        ]
        df = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r["stage"]: r["n_users"]
            for r in funnel(
                df, "user_id", "ts", "event_type",
                stages=["view", "click", "purchase"],
                max_gap_ms=3_600_000, tiebreak_col="event_id",
            ).collect()
        }
        # view: u1,u2,u3,u4 ; click after view: u1,u2 (u3 viewed after, u4 late)
        # purchase after qualified click: u1 only (u2 purchased before clicking)
        assert got == {"view": 4, "click": 2, "purchase": 1}

    def test_single_shuffle_plan(self, spark):
        from datacompy_spark.operators.joins import funnel

        df = spark.createDataFrame(
            [(1, 1, "2026-01-01 00:00:00", "view")],
            "event_id bigint, user_id bigint, ts string, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = funnel(
            df, "user_id", "ts", "event_type",
            stages=["view", "click"], tiebreak_col="event_id",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one hash exchange for the user window; the final count agg collapses
        # to a single partition but adds no user-keyed shuffle
        assert plan.count("hashpartitioning(user_id") == 1


class TestStreamingAnomaly:
    def test_single_batch_replay_matches_batch_operator(self, spark, sf_dir, tmp_path):
        """One micro-batch containing all events must reproduce the batch
        rolling_anomaly floats bit for bit (identical exact-integer
        formula on both paths)."""
        from datacompy_spark.streaming.stateful import streaming_anomaly

        ev = load_table(spark, sf_dir, "events")
        d = str(tmp_path / "ev_anom")
        ev.coalesce(1).write.parquet(d)
        batch = spark.read.parquet(d)
        stream = spark.readStream.schema(batch.schema).parquet(d)
        q = (
            streaming_anomaly(stream, "ts", "event_type", trailing=24)
            .writeStream.format("memory")
            .queryName("anom_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["key"], r["bucket"]): (
                r["n_events"], r["n_history"], r["hist_sum"],
                r["hist_sumsq"], r["zscore"],
            )
            for r in spark.table("anom_stream").collect()
        }
        want = {
            (r["key"], r["bucket"]): (
                r["n_events"], r["n_history"], r["hist_sum"],
                r["hist_sumsq"], r["zscore"],
            )
            for r in streaming_anomaly(batch, "ts", "event_type", trailing=24).collect()
        }
        assert got == want  # exact, including the float z-scores

    def test_state_carries_across_micro_batches(self, spark, tmp_path):
        """Buckets split across micro-batches: the second batch's score
        must see the first batch's history through the state store."""
        import datetime as dt

        from datacompy_spark.streaming.stateful import streaming_anomaly

        base = dt.datetime(2026, 1, 1)
        # file 0: 10 hourly buckets of exactly 2 events (history)
        f0 = [(i, "click", base + dt.timedelta(hours=h))
              for h in range(10) for i in (2 * h, 2 * h + 1)]
        # file 1: one later bucket with a 7-event spike
        f1 = [(100 + i, "click", base + dt.timedelta(hours=10)) for i in range(7)]
        schema = "event_id bigint, event_type string, ts timestamp"
        d = str(tmp_path / "split")
        spark.createDataFrame(f0, schema).coalesce(1).write.parquet(d)
        spark.createDataFrame(f1, schema).coalesce(1).write.mode("append").parquet(d)
        stream = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = (
            streaming_anomaly(stream, "ts", "event_type", trailing=24, min_history=6)
            .writeStream.format("memory")
            .queryName("anom_split")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = {r["bucket"]: r for r in spark.table("anom_split").collect()}
        spike_bucket = max(rows)
        spike = rows[spike_bucket]
        assert spike["n_events"] == 7
        # history from the OTHER micro-batch: 10 buckets of 2 (var 0 -> NULL
        # would fire if variance were zero; it IS zero -> NULL score, but
        # history sums prove the state carried)
        assert spike["n_history"] == 10 and spike["hist_sum"] == 20
        assert spike["hist_sumsq"] == 40 and spike["zscore"] is None


class TestStreamingHeavyHitters:
    def test_exact_when_capacity_covers_distinct(self, spark, tmp_path):
        """capacity >= distinct values per key -> MG summary is exact and
        must equal the batch groupBy counts, across micro-batches."""
        from datacompy_spark.streaming.stateful import streaming_heavy_hitters

        rows = []
        for i, (k, v, n) in enumerate(
            [("click", "u1", 30), ("click", "u2", 12), ("click", "u3", 5),
             ("view", "u1", 7), ("view", "u9", 3)]
        ):
            rows += [(k, v)] * n
        schema = "event_type string, user string"
        d = str(tmp_path / "hh")
        half = len(rows) // 2
        spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(d)
        spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode("append").parquet(d)
        stream = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = (
            streaming_heavy_hitters(stream, "event_type", "user", capacity=16)
            .writeStream.format("memory").queryName("hh_stream")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        got_df = spark.table("hh_stream").toPandas()
        # update mode re-emits summaries; keep the LAST emission per (key,value)
        got = {
            (r.key, r.value): (int(r.min_count), int(r.n_total))
            for r in got_df.itertuples()
        }
        batch = spark.read.parquet(d)
        from datacompy_spark.streaming.stateful import streaming_heavy_hitters as hh

        want = {
            (r["key"], r["value"]): (r["min_count"], r["n_total"])
            for r in hh(batch, "event_type", "user", capacity=16).collect()
        }
        assert got == want

    def test_misra_gries_guarantees(self):
        """Pure-sketch properties on an adversarial stream: every value
        with freq > n/(cap+1) survives; counters never overcount and
        undercount by at most n/(cap+1)."""
        import random

        from datacompy_spark.streaming.stateful import _misra_gries_fold

        rng = random.Random(7)
        stream = (
            ["hot"] * 400
            + ["warm"] * 150
            + [f"cold{i}" for i in range(300)] * 1
            + ["hot"] * 100
        )
        rng.shuffle(stream)
        cap = 8
        counters = _misra_gries_fold({}, stream, cap)
        n = len(stream)
        exact = {}
        for v in stream:
            exact[v] = exact.get(v, 0) + 1
        bound = n / (cap + 1)
        assert len(counters) <= cap
        for v, c in exact.items():
            if c > bound:
                assert v in counters, v
        for v, c in counters.items():
            assert c <= exact[v]            # never overcounts
            assert exact[v] - c <= bound    # bounded undercount
