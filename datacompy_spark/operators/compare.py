"""SparkCompare — the core DataFrame comparison engine.

Semantics parity target: capitalone/datacompy ``spark.py`` (SparkSQLCompare).
Architecture is deliberately NOT a port:

* The null-safe full outer join (ref ``spark.py:450-466``, built as a SQL
  string over temp views) is a pure DataFrame-API join on ``eqNullSafe``
  conditions — Catalyst still plans it as a sort-merge join (null-safe
  equality is an equi-join key) and AQE may convert to broadcast.
* ALL statistics — left/right/both row classes, per-column match counts,
  null diffs, max diffs, all-match row count (ref ``spark.py:573-636``, which
  runs 2N+1 separate actions) — fold into ONE aggregate over the joined frame:
  one shuffle + one action computes the entire comparison. At 100 TB this is
  the difference between one pass over the data and dozens.
* Statistics are computed lazily on first access and memoized; the derived
  frames (``intersect_rows``/``df1_unq_rows``/``df2_unq_rows``) stay lazy
  DataFrames (never collected unless the caller asks for samples).

Scale design notes (local[32] test, 1000-executor target):
* single full-outer shuffle on the join keys; AQE handles skew/broadcast;
* stats aggregation is a partial (map-side) aggregate → single-row result:
  driver memory is O(columns), never O(rows);
* report samples are ``limit``-bounded before any ``toPandas``.
"""

from __future__ import annotations

import logging
from functools import cached_property, reduce
from typing import Any, Dict, List, Mapping, Optional, Sequence, TypedDict, Union

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacompy_spark.functions.comparators import (
    BaseComparator,
    columns_equal,
    _NUMERIC_TYPES,
    _STRING_TYPES,
)

LOG = logging.getLogger(__name__)

#: accepted input frame types: classic plus Spark Connect DataFrames
#: (ref ``spark.py:290-295`` accepts both; the Connect class only exists
#: when the connect extras are installed, hence the guard)
try:  # pragma: no cover - depends on the pyspark build
    from pyspark.sql.connect.dataframe import DataFrame as _ConnectDataFrame

    _DATAFRAME_TYPES: tuple = (DataFrame, _ConnectDataFrame)
except Exception:  # pragma: no cover
    _DATAFRAME_TYPES = (DataFrame,)

MASK_VALUE = "*******"  # ref ``spark.py:246`` sensitive-column replacement

#: Hot-join-key advisory threshold (r13 verdict item 3). AQE's
#: OptimizeSkewedJoin never splits a FULL OUTER join (verified with an
#: engaged inner-join control at the same thresholds — SCALING.md r13
#: §hot-key), so every row of one join-key value lands on ONE task at any
#: cluster size, and the default range-pair ordinal residual is O(k²)
#: inside that task. Below ~10⁴ rows per key both effects are noise;
#: above, the single task becomes the straggler that dominates the stage.
#: When the single statistics pass observes a key at/over this threshold
#: on either side, the engine logs a loud warning naming the
#: ``dup_join_on_ordinal=True`` re-key (uniform by construction, linear
#: in k) as the mitigation. Advisory only — results are identical either
#: way, and uniform-key compares never reach it.
HOT_KEY_WARN_THRESHOLD = 10_000


def consistent_key_sample(
    df: DataFrame,
    join_columns: Sequence[str],
    fraction: float,
    seed: str = "sample#1",
) -> DataFrame:
    """Deterministic key-hash sample: keeps a row iff the md5 of its join
    key lands under ``fraction`` of the hash space. Applied to BOTH sides
    of a comparison, the same keys survive on each side, so the sampled
    compare is a true sub-compare — mismatch/unique-row RATES estimate the
    full run's (row counts scale by ``fraction``). The 100 TB smoke-diff:
    validate on 1% of key space in 1% of the time before committing to the
    full pass. Narrow filter, pushed to the scan; no shuffle."""
    key = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in join_columns]
    )
    bucket = F.conv(F.substring(F.md5(F.concat(key, F.lit(f"#{seed}"))), 1, 15), 16, 10).cast(
        "long"
    ) % 10000
    return df.filter(bucket < int(round(fraction * 10000)))


class ColumnStat(TypedDict):
    """Per-column statistics contract (ref ``base.py:40-53``)."""

    column: str
    match_column: str
    match_cnt: int
    unequal_cnt: int
    dtype1: str
    dtype2: str
    all_match: bool
    max_diff: float
    null_diff: int
    rel_tol: float
    abs_tol: float


Tolerance = Union[int, float, Mapping[str, float]]


def _ordered_unique(items: Sequence[str]) -> List[str]:
    """Insertion-ordered dedup (ref uses OrderedSet, ``spark.py:365-375``)."""
    seen = set()
    out = []
    for it in items:
        if it not in seen:
            seen.add(it)
            out.append(it)
    return out


def normalize_tolerance(tol: Tolerance, columns: Sequence[str], lower: bool) -> Dict[str, float]:
    """Resolve a scalar-or-dict tolerance spec to per-column floats.

    Parity: ref ``base.py:737-829`` — dict form requires a ``"default"`` key
    semantics via fallback 0; keys are case-folded when column names are.
    """
    if isinstance(tol, (int, float)):
        if tol < 0:
            raise ValueError("tolerance must be non-negative")
        return {c: float(tol) for c in columns}
    if not isinstance(tol, Mapping):
        raise TypeError(f"tolerance must be a number or a dict, got {type(tol)}")
    folded = {(k.lower() if lower else k): float(v) for k, v in tol.items()}
    for v in folded.values():
        if v < 0:
            raise ValueError("tolerance must be non-negative")
    unknown = [k for k in folded if k != "default" and k not in columns]
    if unknown:
        # a silently-ignored misspelled column would loosen nothing and the
        # user would never know (ref base.py:758-829 validates likewise)
        raise ValueError(f"tolerance dict names unknown columns: {unknown}")
    default = folded.get("default", 0.0)
    return {c: folded.get(c, default) for c in columns}


class SparkCompare:
    """Compare two Spark DataFrames joined on one or more key columns.

    Public API parity: ref ``spark.py:132-189`` constructor and the method
    surface of ``base.py:121-212`` (matches/subset/all_mismatch/
    sample_mismatch/report/...).

    Parameters mirror the reference: ``abs_tol``/``rel_tol`` accept a float or
    a per-column dict with a ``"default"`` key; ``ignore_spaces`` trims string
    values AND string join keys; ``ignore_case`` upper-cases compared string
    values (never join keys); ``cast_column_names_lower`` lower-cases all
    column names first (ref ``spark.py:161-173``).

    ``dup_order_by`` (extension): explicit ordering columns for duplicate-key
    ordinal pairing. The reference orders duplicates by
    ``monotonically_increasing_id`` (``spark.py:392-407``) which is
    partition-dependent; passing a deterministic ordering makes results
    reproducible across runs/cluster layouts.

    ``dup_join_on_ordinal`` (extension, hot-key escape hatch): by default
    the pairing ordinal enters the join as a range-pair residual condition
    (``o1 <= o2 AND o1 >= o2``) so the sort-merge join reuses the ordinal
    window's key partitioning — optimal for ordinary duplication (a few
    rows per key), but the residual is evaluated per key-group PAIR, i.e.
    O(k²) inside one task for a key duplicated k times. With a genuinely
    hot key (k ≳ 10⁴; AQE's skew split cannot help a FULL OUTER join) set
    this True: the ordinal becomes a real equi-join key, the hot key's
    rows spread across (key, ordinal) hash partitions, and the join is
    linear in k at the cost of one extra exchange per side. Same results
    either way — measured in SCALING.md §hot-key. The engine detects the
    condition itself: when the statistics pass observes a key at/over
    :data:`HOT_KEY_WARN_THRESHOLD` rows in the default mode it logs a
    warning naming this flag (see :meth:`_warn_if_hot_key`).
    """

    def __init__(
        self,
        spark: SparkSession,
        df1: DataFrame,
        df2: DataFrame,
        join_columns: Union[str, Sequence[str]],
        abs_tol: Tolerance = 0,
        rel_tol: Tolerance = 0,
        df1_name: str = "df1",
        df2_name: str = "df2",
        ignore_spaces: bool = False,
        ignore_case: bool = False,
        cast_column_names_lower: bool = True,
        custom_comparators: Optional[Sequence[BaseComparator]] = None,
        cache_intermediates: bool = False,
        dup_order_by: Optional[Sequence[str]] = None,
        assume_unique: bool = False,
        null_safe_join: bool = True,
        dup_join_on_ordinal: bool = False,
    ) -> None:
        self.spark = spark
        if df1_name == df2_name:
            raise ValueError("df1_name and df2_name must differ")
        self.df1_name = df1_name
        self.df2_name = df2_name
        self.ignore_spaces = ignore_spaces
        self.ignore_case = ignore_case
        self.cast_column_names_lower = cast_column_names_lower
        self.custom_comparators = list(custom_comparators or [])
        self.cache_intermediates = cache_intermediates
        self.assume_unique = assume_unique
        self.null_safe_join = null_safe_join
        self.dup_join_on_ordinal = dup_join_on_ordinal

        if isinstance(join_columns, (str, int, float)):
            join_columns = [str(join_columns)]
        self.join_columns = [
            str(c).lower() if cast_column_names_lower else str(c) for c in join_columns
        ]
        if not self.join_columns:
            raise ValueError("join_columns may not be empty")

        self.df1 = self._prep_df(df1, "df1")
        self.df2 = self._prep_df(df2, "df2")
        self._n = self._internal_names()

        self._dup_order_by = list(dup_order_by or [])
        # raw inputs kept for report display: the reference prints the
        # user-supplied scalar/dict verbatim (report.py:113-119)
        self.abs_tol_input = abs_tol
        self.rel_tol_input = rel_tol
        self.abs_tol = normalize_tolerance(
            abs_tol, self._compare_columns, cast_column_names_lower
        )
        self.rel_tol = normalize_tolerance(
            rel_tol, self._compare_columns, cast_column_names_lower
        )
        self._masked_columns: List[str] = []
        self._build()

    # ------------------------------------------------------------------ setup

    def _prep_df(self, df: DataFrame, which: str) -> DataFrame:
        if not isinstance(df, _DATAFRAME_TYPES):
            raise TypeError(
                f"{which} must be a pyspark.sql.DataFrame or "
                f"pyspark.sql.connect.dataframe.DataFrame, got {type(df)}"
            )
        if self.cast_column_names_lower:
            df = df.toDF(*[c.lower() for c in df.columns])
        if len(set(df.columns)) != len(df.columns):
            raise ValueError(f"{which} has duplicate column names after case folding")
        # columns differing only by case (ref tests/test_spark.py:2849):
        # even with lower-casing off, Spark's default case-INsensitive
        # resolver cannot reference them (AMBIGUOUS_REFERENCE mid-join) —
        # fail up front with an actionable message instead
        folded = [c.lower() for c in df.columns]
        if len(set(folded)) != len(folded) and (
            str(self.spark.conf.get("spark.sql.caseSensitive", "false")).lower()
            != "true"
        ):
            dupes = sorted({c for c in folded if folded.count(c) > 1})
            raise ValueError(
                f"{which} has columns differing only by case ({dupes}); "
                "enable spark.sql.caseSensitive or rename them before comparing"
            )
        missing = [c for c in self.join_columns if c not in df.columns]
        if missing:
            raise ValueError(f"{which} is missing join columns: {missing}")
        return df

    def _internal_names(self) -> Dict[str, str]:
        """Collision-proof engine-internal column names — the Spark analog
        of the reference's ``temp_column_name`` probe (``base.py:649-672``):
        the default names (``__dc_ordinal``, ``__present_lhs``, ``_merge``,
        …) are used unless an input column could collide, in which case a
        numbered variant is probed until free. Inputs may therefore own
        columns literally named ``_merge`` or ``__dc_ordinal`` — they are
        treated as ordinary compared data, never silently overwritten."""
        # probe case-INsensitively: Spark's default resolver folds case, so
        # a user column `_Merge` collides with the indicator alias `_merge`
        # (AMBIGUOUS_REFERENCE) even though the exact strings differ
        cols = {c.lower() for c in self.df1.columns} | {
            c.lower() for c in self.df2.columns
        }
        # ALSO probe the post-suffix forms each input column will take after
        # the internal rename: with df1_name="lhs" a user column `__present`
        # becomes `__present_lhs`, which would collide with the presence
        # marker added AFTER suffixing — so collisions must be checked
        # against what the columns are named at marker-attach time, not
        # just their raw input names
        join_lc = {j.lower() for j in self.join_columns}
        suffixed = set()
        for c in cols:
            if c in join_lc:
                suffixed.update((f"{c}__lhs", f"{c}__rhs"))
            else:
                suffixed.update(
                    (
                        f"{c}_{self.df1_name.lower()}",
                        f"{c}_{self.df2_name.lower()}",
                    )
                )
        cols |= suffixed
        t = 0
        while True:
            tag = "" if t == 0 else str(t + 1)
            names = {
                "idx": f"__dc{tag}_idx",
                "ordinal": f"__dc{tag}_ordinal",
                "present_lhs": f"__present{tag}_lhs",
                "present_rhs": f"__present{tag}_rhs",
                "merge": f"_merge{tag}",
                "ord": f"__dc{tag}_ord",
            }
            # candidates include the ordinal's join-suffixed forms — a join
            # column named `__dc_ordinal__lhs` would otherwise collide
            candidates = set(names.values()) | {
                f"{names['ordinal']}__lhs",
                f"{names['ordinal']}__rhs",
            }
            if not cols & candidates:
                return names
            t += 1

    @property
    def _intersect_columns(self) -> List[str]:
        """Columns present in both frames, in df1 order (ref ``spark.py:365-375``)."""
        cols2 = set(self.df2.columns)
        return [c for c in self.df1.columns if c in cols2]

    @property
    def _compare_columns(self) -> List[str]:
        return [c for c in self._intersect_columns if c not in self.join_columns]

    def intersect_columns(self) -> List[str]:
        return self._intersect_columns

    def df1_unq_columns(self) -> List[str]:
        cols2 = set(self.df2.columns)
        return [c for c in self.df1.columns if c not in cols2]

    def df2_unq_columns(self) -> List[str]:
        cols1 = set(self.df1.columns)
        return [c for c in self.df2.columns if c not in cols1]

    # ---------------------------------------------------------------- the plan

    def _with_ordinal(self, df: DataFrame) -> DataFrame:
        """Attach a 0-based per-key ordinal so the k-th duplicate on the left
        pairs with the k-th on the right (ref ``spark.py:386-412,1114-1170``).

        The reference string-casts keys and substitutes a ``'DATACOMPY_NULL'``
        sentinel for NULLs before grouping (``spark.py:1136-1147``); Spark
        windows already treat NULL as an ordinary partition value, so no
        sentinel (and no sentinel-collision probe) is needed here.
        """
        idx, ordinal = self._n["idx"], self._n["ordinal"]
        if self._dup_order_by:
            order = [F.col(c) for c in self._dup_order_by]
        else:
            df = df.withColumn(idx, F.monotonically_increasing_id())
            order = [F.col(idx)]
        w = Window.partitionBy(*[F.col(c) for c in self.join_columns]).orderBy(*order)
        df = df.withColumn(ordinal, F.row_number().over(w) - 1)
        return df.drop(idx)

    def _build(self) -> None:
        """Assemble the (lazy) comparison plan.

        Scale design vs the reference (``spark.py:328-412``): the reference
        runs a duplicate-key probe (two counts per side = extra shuffles +
        driver barriers) and only then decides whether to attach pairing
        ordinals. Here the ordinal is ALWAYS attached — for unique keys it is
        0 everywhere and the join is unchanged — and duplicate presence falls
        out of the single statistics aggregate. Crucially the ordinal enters
        the join as a range-pair condition (``o1 <= o2 AND o1 >= o2``) rather
        than an equality, which keeps it OUT of the hash-partitioning keys:
        the sort-merge join reuses the window's key-partitioning instead of
        re-shuffling on (keys, ordinal). Net cost of dup-safety: one
        in-partition sort, zero extra shuffles, zero extra actions.
        ``assume_unique=True`` skips the ordinal entirely (caller guarantees
        key uniqueness)."""
        df1, df2 = self.df1, self.df2
        n1, n2 = self.df1_name, self.df2_name
        ordinal = self._n["ordinal"]
        present = {"lhs": self._n["present_lhs"], "rhs": self._n["present_rhs"]}

        paired = not self.assume_unique
        if paired:
            df1 = self._with_ordinal(df1)
            df2 = self._with_ordinal(df2)

        # Internal rename: join keys get engine-private suffixes, value columns
        # get the public {col}_{df_name} suffixes (ref ``spark.py:429-448``).
        def suffixed(df: DataFrame, tag: str, public: str) -> DataFrame:
            # atomic select-based rename, NOT withColumnsRenamed: that API
            # folds its mapping sequentially, so a frame holding both `v`
            # and `v_df1` double-renames the freshly-suffixed `v` and the
            # join dies with AMBIGUOUS_REFERENCE. One projection applies
            # every rename against the ORIGINAL names (matching the
            # reference's pandas-merge suffixing: v -> v_df1,
            # v_df1 -> v_df1_df1).
            def new_name(c: str) -> str:
                if c in self.join_columns or c == ordinal:
                    return f"{c}__{tag}"
                return f"{c}_{public}"

            return df.select(
                *[df[c].alias(new_name(c)) for c in df.columns]
            ).withColumn(present[tag], F.lit(True))

        left = suffixed(df1, "lhs", n1)
        right = suffixed(df2, "rhs", n2)

        def key_expr(side: DataFrame, c: str, tag: str) -> Column:
            col = side[f"{c}__{tag}"]
            # trim decision is per-side: each frame may declare a different
            # dtype for the same join key (ref spark.py:416-427 trims each
            # side by its own schema)
            owner = self.df1 if tag == "lhs" else self.df2
            dt = owner.schema[c].dataType
            if self.ignore_spaces and isinstance(dt, _STRING_TYPES):
                # join keys are trimmed but never case-folded (ref spark.py:416-427)
                return F.trim(col)
            return col

        # Null-safe equality is the reference semantic (null keys pair
        # with null keys, spark.py:429-448) but its physical form —
        # (coalesce(k, 0), isnull(k)) join keys — disqualifies bucketed
        # scans AND stops the outer join from reusing the ordinal window's
        # plain-key partitioning (extra exchanges). With
        # null_safe_join=False the caller asserts keys are never null; and
        # when EVERY join key is declared non-nullable on BOTH schemas the
        # two predicates are provably equivalent, so the lowering is
        # auto-selected — same results, cheaper plan.
        keys_provably_non_null = all(
            (not self.df1.schema[c].nullable) and (not self.df2.schema[c].nullable)
            for c in self.join_columns
        )
        use_null_safe = self.null_safe_join and not keys_provably_non_null

        def key_eq(lc: Column, rc: Column) -> Column:
            return lc.eqNullSafe(rc) if use_null_safe else lc == rc

        cond = reduce(
            lambda a, b: a & b,
            [
                key_eq(key_expr(left, c, "lhs"), key_expr(right, c, "rhs"))
                for c in self.join_columns
            ],
        )
        if paired:
            ol, orr = left[f"{ordinal}__lhs"], right[f"{ordinal}__rhs"]
            if self.dup_join_on_ordinal:
                # plain equality: Catalyst's ExtractEquiJoinKeys lifts it
                # into the hash keys — hot keys fan out, extra exchange
                cond = cond & (ol == orr)
            else:
                # range-pair keeps the ordinal OUT of the hash keys so the
                # join reuses the window's partitioning (zero extra
                # exchanges); per-key residual cost is O(dups²)
                cond = cond & (ol <= orr) & (ol >= orr)
        outer = left.join(right, on=cond, how="full_outer")

        merge = (
            F.when(F.col(present["rhs"]).isNull(), F.lit("left_only"))
            .when(F.col(present["lhs"]).isNull(), F.lit("right_only"))
            .otherwise(F.lit("both"))
        )
        restored_keys = [
            F.when(
                F.col(present["lhs"]).isNotNull(), F.col(f"{c}__lhs")
            ).otherwise(F.col(f"{c}__rhs")).alias(c)
            for c in self.join_columns
        ]
        internal = {
            f"{k}__{t}"
            for k in list(self.join_columns) + [ordinal]
            for t in ("lhs", "rhs")
        } | set(present.values())
        value_cols = [c for c in outer.columns if c not in internal]
        extras = []
        if paired:
            # max pairing ordinal → duplicate detection, for free in the stats agg
            extras.append(
                F.greatest(
                    F.coalesce(F.col(f"{ordinal}__lhs"), F.lit(0)),
                    F.coalesce(F.col(f"{ordinal}__rhs"), F.lit(0)),
                ).alias(self._n["ord"])
            )
        else:
            extras.append(F.lit(0).alias(self._n["ord"]))
        outer = outer.select(
            *restored_keys,
            *[F.col(c) for c in value_cols],
            merge.alias(self._n["merge"]),
            *extras,
        )

        # Per-column match expressions — one boolean Column each, all attached
        # in a single withColumns batch (ref ``spark.py:549-570``).
        match_exprs = {}
        for c in self._compare_columns:
            match_exprs[f"{c}_match"] = F.when(
                F.col(self._n["merge"]) != "both", F.lit(None).cast("boolean")
            ).otherwise(
                columns_equal(
                    outer,
                    f"{c}_{n1}",
                    f"{c}_{n2}",
                    rel_tol=self.rel_tol[c],
                    abs_tol=self.abs_tol[c],
                    ignore_spaces=self.ignore_spaces,
                    ignore_case=self.ignore_case,
                    comparators=self.custom_comparators,
                )
            )
        outer = outer.withColumns(match_exprs)
        if self.cache_intermediates:
            outer = outer.persist()
            self._outer_persisted = True
        else:
            self._outer_persisted = False
        self._outer = outer

    @cached_property
    def _exceptions(self) -> DataFrame:
        """The cached *diff*: rows that are unique to one side or have at
        least one mismatching column. Report sampling and mismatch extraction
        make several passes — but only ever over these rows, so this is what
        gets persisted. At scale the diff is normally a tiny fraction of the
        join (the reference caches the full intersect frame instead,
        ``spark.py:532-537``)."""
        from pyspark import StorageLevel

        pred = (F.col(self._n["merge"]) != "both") | self._any_mismatch_pred()
        return self._outer.filter(pred).persist(StorageLevel.MEMORY_AND_DISK)

    def _ensure_cached(self) -> None:
        """Materialize the exceptions cache — and, when the statistics have
        not been computed yet either (the report flow), ride BOTH on one
        pass over the outer join: the statistics aggregate attaches to the
        cache-populate action as ``DataFrame.observe`` metrics instead of
        running as its own full-join aggregate (guide §2.4 — two ops over
        the same frame share one pass; r15). Every outer-join row flows
        through the CollectMetrics node on its way into the exceptions
        filter, so the observed aggregates see exactly the rows
        ``_stats``'s standalone aggregate would — identical values, one
        scan+join instead of two. Standalone stats reads (``matches()``
        with no report) keep the plain aggregate: it lets Catalyst prune
        columns the exceptions cache would have to materialize."""
        if "_exceptions" in self.__dict__:
            return
        if "_stats" not in self.__dict__:
            try:
                from pyspark.sql import Observation
            except ImportError:  # pragma: no cover — very old pyspark
                Observation = None
            if Observation is not None:
                from pyspark import StorageLevel

                obs = Observation()
                observed = self._outer.observe(obs, *self._stat_aggs())
                pred = (
                    F.col(self._n["merge"]) != "both"
                ) | self._any_mismatch_pred()
                exc = observed.filter(pred).persist(StorageLevel.MEMORY_AND_DISK)
                self.__dict__["_exceptions"] = exc
                exc.count()  # populate the cache; metrics collect in-flight
                stats = {k: (0 if v is None else v) for k, v in obs.get.items()}
                self._warn_if_hot_key(stats)
                self.__dict__["_stats"] = stats
                self._drop_unq_row_memos()
                return
        self._exceptions  # noqa: B018 — building the property persists it
        self._drop_unq_row_memos()

    def _drop_unq_row_memos(self) -> None:
        """Forget unique-row frames memoized BEFORE the exceptions cache
        existed: a standalone ``df1_unq_rows`` access binds to the raw
        outer join (prunable — the right choice without a cache), but once
        the persisted diff exists every later read should upgrade to it
        (r14 advice — the stale binding silently re-evaluated the join)."""
        for k in ("df1_unq_rows", "df2_unq_rows"):
            self.__dict__.pop(k, None)

    def cache_result(self) -> "SparkCompare":
        """Eagerly materialize the comparison for reuse-heavy sessions — the
        analog of the reference snowflake backend's ``cache_result``
        (``snowflake.py:438-441,541``). Persists the joined frame and the
        exceptions cache and runs both now, so every later read — reports,
        ``sample_mismatch``/``all_mismatch``, derived frames, stats — serves
        from memory/disk cache with zero re-scans of the inputs. Returns
        ``self`` for chaining."""
        from pyspark import StorageLevel

        if not self._outer_persisted:
            self._outer = self._outer.persist(StorageLevel.MEMORY_AND_DISK)
            self._outer_persisted = True
        self._outer.count()
        self._ensure_cached()
        self._exceptions.count()
        return self

    def explain(self, mode: str = "formatted") -> str:
        """The physical plan of the core comparison join, as a string — the
        operability hook for checking a compare's plan before running it at
        scale (is the join broadcast/sort-merge, are the scans pruned, did
        the bucketed zero-Exchange path engage). ``mode`` follows
        ``DataFrame.explain`` (``simple``/``extended``/``codegen``/
        ``cost``/``formatted``). Builds no job: planning only."""
        if hasattr(self._outer, "_jdf"):
            # the same JVM helper DataFrame.explain prints through,
            # returned instead of printed
            return self._outer._sc._jvm.PythonSQLUtils.explainString(
                self._outer._jdf.queryExecution(), mode
            )
        # Spark Connect: no JVM handle — capture the client-side print
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self._outer.explain(mode)
        return buf.getvalue()

    def uncache(self) -> None:
        """Release everything :meth:`cache_result` (or
        ``cache_intermediates``) pinned."""
        if self._outer_persisted:
            self._outer.unpersist()
            self._outer_persisted = False
        exc = self.__dict__.get("_exceptions")
        if exc is not None:
            exc.unpersist()
            if not self._masked_columns:
                # also forget the memoized frames (r14 advice): post-uncache
                # reads should re-plan from the prunable raw outer join, not
                # filter the now-unpersisted exceptions plan. Masked compares
                # keep their bindings — rebuilding from ``_outer`` would
                # resurrect unmasked values through the sample paths.
                self.__dict__.pop("_exceptions", None)
                self._drop_unq_row_memos()

    # ---------------------------------------------------------- derived frames

    def row_classes(self) -> DataFrame:
        """(join columns, row_class) for EVERY row of the comparison in one
        pass: ``left_only`` / ``right_only`` / ``both`` straight from the
        merge indicator (P3). Prefer this over unioning the three derived
        frames — each derived frame filters the same outer join, so a
        3-way union evaluates the join three times unless it was cached."""
        return self._outer.select(
            *self.join_columns, F.col(self._n["merge"]).alias("row_class")
        )

    def row_class_matrix(self) -> DataFrame:
        """Join columns + ``row_class`` + every ``{col}_match`` boolean in
        ONE pass over the outer join — the single-scan feed for per-key
        rollups (match-rate by key, duplicate-pair accounting). Match
        booleans are NULL for ``left_only``/``right_only`` rows, matching
        :attr:`intersect_rows` semantics on the ``both`` subset.

        Prefer this over combining :attr:`intersect_rows` with
        :attr:`df1_unq_rows`/:attr:`df2_unq_rows` in one query: each of
        those filters the same outer join, so an uncached combination
        re-evaluates the join (scan + shuffle + sort-merge) once per
        derived frame and then pays a fourth join to stitch the rollups
        back together. At 100 TB that is the difference between one
        key-partitioned pass and four."""
        return self._outer.select(
            *self.join_columns,
            F.col(self._n["merge"]).alias("row_class"),
            *[F.col(f"{c}_match") for c in self._compare_columns],
        )

    @cached_property
    def intersect_rows(self) -> DataFrame:
        """Rows present in both frames: join keys + suffixed value pairs +
        ``{col}_match`` booleans (ref ``spark.py:528,549-570``)."""
        cols = list(self.join_columns)
        for c in self._compare_columns:
            cols += [f"{c}_{self.df1_name}", f"{c}_{self.df2_name}", f"{c}_match"]
        for c in self.df1_unq_columns():
            cols.append(f"{c}_{self.df1_name}")
        for c in self.df2_unq_columns():
            cols.append(f"{c}_{self.df2_name}")
        return self._outer.filter(F.col(self._n["merge"]) == "both").select(*cols)

    def _unq_rows(self, side: str) -> DataFrame:
        tag, name, src = (
            ("left_only", self.df1_name, self.df1)
            if side == "df1"
            else ("right_only", self.df2_name, self.df2)
        )
        sel = []
        for c in src.columns:
            sel.append(
                F.col(c if c in self.join_columns else f"{c}_{name}").alias(c)
            )
        # unique rows are by definition exceptions → serve from the small
        # cache WHEN IT ALREADY EXISTS (report flow: _ensure_cached ran, the
        # persisted diff answers every sample). A standalone unique-rows
        # read should NOT build that cache: its populate pass evaluates
        # every {col}_match expression just to persist rows this query
        # filters on the merge indicator alone — reading the raw outer join
        # instead lets Catalyst PRUNE all match expressions from the plan
        # (r14; measured via the cmp_unique_rows A/B).
        src_df = (
            self._exceptions
            if "_exceptions" in self.__dict__
            else self._outer
        )
        return src_df.filter(F.col(self._n["merge"]) == tag).select(*sel)

    @cached_property
    def df1_unq_rows(self) -> DataFrame:
        """Rows only in df1, original column names (ref ``spark.py:510-522``)."""
        return self._unq_rows("df1")

    @cached_property
    def df2_unq_rows(self) -> DataFrame:
        return self._unq_rows("df2")

    # ------------------------------------------------------------- statistics

    def _maxdiff_capable(self, c: str) -> bool:
        dt1 = self.df1.schema[c].dataType
        dt2 = self.df2.schema[c].dataType
        ok = _NUMERIC_TYPES + _STRING_TYPES + (T.BooleanType,)
        return isinstance(dt1, ok) and isinstance(dt2, ok)

    def _stat_aggs(self) -> List[Column]:
        """The statistics aggregate expressions — consumed either as ONE
        standalone aggregate action (:attr:`_stats`) or as ``observe``
        metrics piggybacked on the exceptions-populate pass
        (:meth:`_ensure_cached`); both see every outer-join row, so the
        values are identical by construction."""
        both = F.col(self._n["merge"]) == "both"
        n1, n2 = self.df1_name, self.df2_name
        aggs = [
            F.sum(F.when(F.col(self._n["merge"]) == "left_only", 1).otherwise(0)).alias("__left_only"),
            F.sum(F.when(F.col(self._n["merge"]) == "right_only", 1).otherwise(0)).alias("__right_only"),
            F.sum(F.when(both, 1).otherwise(0)).alias("__both"),
            F.max(F.col(self._n["ord"])).alias("__max_ord"),
        ]
        match_cols = [F.col(f"{c}_match") for c in self._compare_columns]
        if match_cols:
            all_match = reduce(lambda a, b: a & b, match_cols)
        else:
            all_match = F.lit(True)
        aggs.append(
            F.sum(F.when(both & all_match, 1).otherwise(0)).alias("__rows_all_match")
        )
        for c in self._compare_columns:
            c1, c2 = F.col(f"{c}_{n1}"), F.col(f"{c}_{n2}")
            aggs.append(
                F.sum(F.when(both & F.col(f"{c}_match"), 1).otherwise(0)).alias(f"__match__{c}")
            )
            aggs.append(
                F.sum(
                    F.when(both & (c1.isNull() != c2.isNull()), 1).otherwise(0)
                ).alias(f"__nulldiff__{c}")
            )
            if self._maxdiff_capable(c):
                d1, d2 = c1.try_cast("double"), c2.try_cast("double")
                diff = F.abs(d1 - d2)
                # exclude NaN rows from max_diff (ref ``spark.py:1058-1060``)
                guarded = F.when(
                    both & d1.isNotNull() & d2.isNotNull() & ~F.isnan(d1) & ~F.isnan(d2),
                    diff,
                )
                aggs.append(F.max(guarded).alias(f"__maxdiff__{c}"))
        return aggs

    @cached_property
    def _stats(self) -> Dict[str, Any]:
        """THE single statistics action: one aggregate over the joined frame
        computes row classes, matching-row count, and per-column
        match/null-diff/max-diff — replacing the reference's per-column action
        loop (``spark.py:594-636``, A1+A3+A4 in SURVEY §2.4). In the report
        flow the same expressions arrive as ``observe`` metrics on the
        exceptions-populate pass instead (:meth:`_ensure_cached`), so this
        aggregate never runs there."""
        row = self._outer.agg(*self._stat_aggs()).collect()[0].asDict()
        stats = {k: (0 if v is None else v) for k, v in row.items()}
        self._warn_if_hot_key(stats)
        return stats

    def _warn_if_hot_key(self, stats: Dict[str, Any]) -> None:
        """Hot-join-key advisory (r13 verdict item 3): the pairing ordinal
        already measures per-key duplication, so the hottest key's row
        count (``__max_ord`` + 1) falls out of the single statistics pass
        for free. At/over :data:`HOT_KEY_WARN_THRESHOLD` rows on one key —
        with the default range-pair join mode — warn loudly: AQE cannot
        split a skewed FULL OUTER join, so that key serializes onto one
        task at ANY cluster size and the range-pair residual is O(k²)
        inside it. ``dup_join_on_ordinal=True`` is the engine's own
        mitigation (re-keys the join to (key, ordinal) — uniform by
        construction, linear in k). Advisory only: identical results
        either way; uniform keys (max ordinal 0) never get near the
        threshold, and the re-keyed mode is exempt because it already IS
        the mitigation."""
        hottest = int(stats.get("__max_ord", 0)) + 1
        if (
            self.assume_unique
            or self.dup_join_on_ordinal
            or hottest < HOT_KEY_WARN_THRESHOLD
        ):
            return
        msg = (
            f"hot join key detected: some join-key value has "
            f"{hottest:,} rows on one side. Spark's AQE skew "
            "split does not apply to FULL OUTER joins, so this key runs "
            "on a single task regardless of cluster size, and the "
            "default duplicate-pairing mode costs O(k²) within it. "
            "Pass dup_join_on_ordinal=True to SparkCompare to re-key the "
            "join on (key, ordinal) - rows of the hot key then spread "
            "uniformly across partitions (identical results, one extra "
            "exchange per side)."
        )
        LOG.warning(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=3)

    @property
    def hot_key_rows(self) -> int:
        """Rows carried by the HOTTEST join-key value on either side —
        observed from the pairing ordinals during the single statistics
        pass (zero extra work). At/over :data:`HOT_KEY_WARN_THRESHOLD`
        with the default join mode, :meth:`_warn_if_hot_key` has already
        logged the ``dup_join_on_ordinal=True`` advisory."""
        return int(self._stats["__max_ord"]) + 1

    @property
    def has_duplicates(self) -> bool:
        """True iff either side has duplicate join keys — observed from the
        pairing ordinals during the single statistics pass (the reference
        runs a dedicated two-count probe per side, ``spark.py:328-332``)."""
        return int(self._stats["__max_ord"]) > 0

    @property
    def df1_row_count(self) -> int:
        """Derived from the single-agg pass — the (possibly ordinal-paired)
        outer join is 1:1, so |df1| = left_only + both. No extra scan."""
        return int(self._stats["__left_only"]) + int(self._stats["__both"])

    @property
    def df2_row_count(self) -> int:
        return int(self._stats["__right_only"]) + int(self._stats["__both"])

    @property
    def df1_unq_rows_count(self) -> int:
        return int(self._stats["__left_only"])

    @property
    def df2_unq_rows_count(self) -> int:
        return int(self._stats["__right_only"])

    @property
    def intersect_rows_count(self) -> int:
        return int(self._stats["__both"])

    def count_matching_rows(self) -> int:
        """Intersect rows where every compared column matches
        (ref ``spark.py:659-679``)."""
        return int(self._stats["__rows_all_match"])

    @cached_property
    def column_stats(self) -> List[ColumnStat]:
        """Per-column stats over EVERY intersect column (ref
        ``spark.py:582-636``): join columns appear as always-matching entries
        (``match_cnt == row_cnt``, zero diffs — ``spark.py:588-600``), value
        columns from the single statistics aggregate. Reference quirks kept
        for parity: ``all_match`` additionally requires identical declared
        dtypes (``spark.py:625-630``), and for join-columns-only schemas the
        join-column row count includes the unique rows
        (``spark.py:589-596``)."""
        stats: List[ColumnStat] = []
        s = self._stats
        n_both = int(s["__both"])
        for c in self._intersect_columns:
            dtype1 = self.df1.schema[c].dataType.simpleString()
            dtype2 = self.df2.schema[c].dataType.simpleString()
            if c in self.join_columns:
                row_cnt = n_both
                if self.only_join_columns():
                    row_cnt += self.df1_unq_rows_count + self.df2_unq_rows_count
                match_cnt, unequal = row_cnt, 0
                max_diff, null_diff = 0.0, 0
                rel_tol = self.rel_tol.get(c, self.rel_tol.get("default", 0.0))
                abs_tol = self.abs_tol.get(c, self.abs_tol.get("default", 0.0))
            else:
                match_cnt = int(s[f"__match__{c}"])
                unequal = n_both - match_cnt
                max_diff = float(s.get(f"__maxdiff__{c}", 0) or 0)
                null_diff = int(s[f"__nulldiff__{c}"])
                rel_tol, abs_tol = self.rel_tol[c], self.abs_tol[c]
            stats.append(
                ColumnStat(
                    column=c,
                    match_column=f"{c}_match",
                    match_cnt=match_cnt,
                    unequal_cnt=unequal,
                    dtype1=dtype1,
                    dtype2=dtype2,
                    all_match=(unequal == 0) and (dtype1 == dtype2),
                    max_diff=max_diff,
                    null_diff=null_diff,
                    rel_tol=rel_tol,
                    abs_tol=abs_tol,
                )
            )
        return stats

    # ------------------------------------------------------------ check API

    def all_columns_match(self) -> bool:
        """Both unique-column sets empty (ref ``spark.py:638-646``)."""
        return not self.df1_unq_columns() and not self.df2_unq_columns()

    def all_rows_overlap(self) -> bool:
        """No rows unique to either side (ref ``spark.py:648-657``)."""
        return self.df1_unq_rows_count == 0 and self.df2_unq_rows_count == 0

    def intersect_rows_match(self) -> bool:
        """Non-empty intersection whose rows all match; empty → False
        (ref ``spark.py:681-686``)."""
        if self.intersect_rows_count == 0:
            return False
        return self.count_matching_rows() == self.intersect_rows_count

    def matches(self, ignore_extra_columns: bool = False) -> bool:
        """Ref ``spark.py:688-700``."""
        if not ignore_extra_columns and not self.all_columns_match():
            return False
        return self.all_rows_overlap() and self.intersect_rows_match()

    def subset(self) -> bool:
        """df2 ⊆ df1 (ref ``spark.py:702-718``)."""
        return (
            not self.df2_unq_columns()
            and self.df2_unq_rows_count == 0
            and self.intersect_rows_match()
        )

    def only_join_columns(self) -> bool:
        """Schema is exactly the join key on both sides (ref ``base.py:463-465``)."""
        jc = set(self.join_columns)
        return set(self.df1.columns) == jc and set(self.df2.columns) == jc

    @property
    def columns_with_mismatches(self) -> List[str]:
        """Non-join columns with any unequal value (ref ``base.py:467-490``)."""
        return [
            cs["column"]
            for cs in self.column_stats
            if cs["unequal_cnt"] > 0 and cs["column"] not in self.join_columns
        ]

    # -------------------------------------------------------------- mismatches

    def _any_mismatch_pred(self) -> Column:
        match_cols = [F.col(f"{c}_match") for c in self._compare_columns]
        if not match_cols:
            return F.lit(False)
        return ~reduce(lambda a, b: a & b, match_cols)

    def sample_mismatch(
        self, column: str, sample_count: int = 10, for_display: bool = False
    ) -> DataFrame:
        """First ``sample_count`` mismatching rows for one column
        (ref ``spark.py:720-791``). Join-columns-only schemas return the
        union of unique rows instead (ref ``spark.py:786-790``)."""
        if self.only_join_columns():
            return self.df1_unq_rows.union(self.df2_unq_rows).limit(sample_count)
        if column in self.join_columns:
            raise ValueError(f"{column} is a join column; cannot sample mismatches")
        n1, n2 = self.df1_name, self.df2_name
        out = (
            self._exceptions.filter(
                (F.col(self._n["merge"]) == "both") & ~F.col(f"{column}_match")
            )
            .select(*self.join_columns, f"{column}_{n1}", f"{column}_{n2}")
            .limit(sample_count)
        )
        if for_display:
            out = out.toDF(
                *self.join_columns, f"{column} ({n1})", f"{column} ({n2})"
            )
        return out

    def all_mismatch(self, ignore_matching_cols: bool = False) -> DataFrame:
        """Every intersect row with ≥1 mismatching column
        (ref ``spark.py:793-867``); ``ignore_matching_cols`` drops columns
        that matched everywhere."""
        if self.only_join_columns():
            return self.df1_unq_rows.union(self.df2_unq_rows)
        keep = self._compare_columns
        if ignore_matching_cols:
            mismatched = set(self.columns_with_mismatches)
            keep = [c for c in keep if c in mismatched]
        n1, n2 = self.df1_name, self.df2_name
        cols = list(self.join_columns)
        for c in keep:
            cols += [f"{c}_{n1}", f"{c}_{n2}"]
        return self._exceptions.filter(
            (F.col(self._n["merge"]) == "both") & self._any_mismatch_pred()
        ).select(*cols)

    # ------------------------------------------------------------ sensitive

    def hide_sensitive_columns(self, columns: Sequence[str]) -> None:
        """Mask values with ``'*******'`` in the three derived frames
        (ref ``spark.py:224-271``); unpersists any cached joined frame first
        so no unmasked partitions linger in executor memory."""
        cols = [
            c.lower() if self.cast_column_names_lower else c for c in columns
        ]
        bad = [c for c in cols if c in self.join_columns]
        if bad:
            raise ValueError(f"cannot mask join columns: {bad}")
        # force stats before masking so counts reflect real values
        _ = self._stats

        def mask(df: DataFrame, suffixes: Sequence[str]) -> DataFrame:
            targets = set()
            for c in cols:
                targets.add(c)
                for sfx in suffixes:
                    targets.add(f"{c}_{sfx}")
            return df.select(
                *[
                    F.lit(MASK_VALUE).alias(c) if c in targets else F.col(c)
                    for c in df.columns
                ]
            )

        # no unmasked partitions may linger in executor memory
        if self._outer_persisted:
            self._outer.unpersist()
            self._outer_persisted = False
        exc = self.__dict__.get("_exceptions")
        if exc is not None:
            exc.unpersist()
        else:
            exc = self._exceptions  # build lazily so we can mask it below
            exc.unpersist()
        # sample_mismatch/all_mismatch/report() all read _exceptions — mask it
        # too or sensitive values leak through those paths (ref
        # ``spark.py:720-791`` reads the masked intersect frame).
        from pyspark import StorageLevel

        self.__dict__["_exceptions"] = mask(
            exc, [self.df1_name, self.df2_name]
        ).persist(StorageLevel.MEMORY_AND_DISK)
        self.__dict__["intersect_rows"] = mask(
            self.intersect_rows, [self.df1_name, self.df2_name]
        )
        self.__dict__["df1_unq_rows"] = mask(self.df1_unq_rows, [])
        self.__dict__["df2_unq_rows"] = mask(self.df2_unq_rows, [])
        self._masked_columns = cols

    def reveal_sensitive_columns(self) -> None:
        """Undo masking by rebuilding the derived frames (ref ``base.py:445-461``
        does a full recompare; our frames are lazy so a rebuild is free)."""
        exc = self.__dict__.pop("_exceptions", None)
        if exc is not None:
            exc.unpersist()
        for k in ("intersect_rows", "df1_unq_rows", "df2_unq_rows"):
            self.__dict__.pop(k, None)
        self._masked_columns = []

    # ---------------------------------------------------------------- report

    def build_report_data(self, sample_count: int = 10, column_count: int = 10):
        from datacompy_spark.plans.report import build_report_data

        return build_report_data(self, sample_count=sample_count, column_count=column_count)

    def report(
        self,
        sample_count: int = 10,
        column_count: int = 10,
        html_file: Optional[str] = None,
        template_path: Optional[str] = None,
    ) -> str:
        """Render the human-readable comparison report (ref ``base.py:405-443``);
        ``template_path`` selects a custom Jinja2 template (ref ``base.py:493-533``)."""
        data = self.build_report_data(sample_count=sample_count, column_count=column_count)
        text = data.render(template_path=template_path)
        if html_file:
            with open(html_file, "w") as fh:
                fh.write(data.to_html(template_path))
        return text
