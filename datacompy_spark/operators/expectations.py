"""Declarative data-quality expectations (the dbt-test / Great-Expectations
core rule set) evaluated in ONE aggregation pass.

``expect`` compiles a list of rule dicts into a single-scan aggregate —
every row-level rule is a conditional integer sum, uniqueness is a distinct
count over a canonical string key — so checking N rules over a 100 TB table
costs one projection-pruned scan and one single-row aggregate, not N
passes. The result is a tidy per-rule verdict frame suitable for gating a
pipeline (CI-style) or diffing across snapshots.

Rule dicts (``rule`` selects the kind):

- ``{"rule": "not_null", "col": c}``
- ``{"rule": "unique", "cols": [c, ...]}`` — uniqueness of the STRING
  forms of the columns, combined through an injective per-part hash key
  (no in-band separator a data value could collide with; NULL is its own
  token, so NULL keys are compared too); supply a pre-computed key column
  for exotic types.
- ``{"rule": "accepted_values", "col": c, "values": [...]}``
- ``{"rule": "in_range", "col": c, "lo": x, "hi": y}`` (inclusive)
- ``{"rule": "matches_regex", "col": c, "pattern": p}`` — keep patterns in
  the Java∩RE2 common subset if oracle parity matters.

NULLs never count as violations for value rules (that is ``not_null``'s
job), matching dbt semantics.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _rule_name(rule: Dict) -> str:
    kind = rule["rule"]
    if kind == "unique":
        return f"unique({','.join(rule['cols'])})"
    if kind == "accepted_values":
        return f"accepted_values({rule['col']})"
    if kind == "in_range":
        return f"in_range({rule['col']},{rule['lo']},{rule['hi']})"
    if kind == "matches_regex":
        return f"matches_regex({rule['col']})"
    return f"{kind}({rule['col']})"


def _violation_expr(rule: Dict) -> Column:
    kind = rule["rule"]
    if kind == "not_null":
        return F.sum(F.when(F.col(rule["col"]).isNull(), 1).otherwise(0)).cast("long")
    if kind == "unique":
        key = _string_key([F.col(c) for c in rule["cols"]])
        return (F.count(F.lit(1)) - F.countDistinct(key)).cast("long")
    c = F.col(rule["col"])
    if kind == "accepted_values":
        bad = c.isNotNull() & ~c.isin(list(rule["values"]))
    elif kind == "in_range":
        bad = c.isNotNull() & ((c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"])))
    elif kind == "matches_regex":
        bad = c.isNotNull() & ~c.rlike(rule["pattern"])
    else:
        raise ValueError(f"unknown rule kind: {kind!r}")
    return F.sum(F.when(bad, 1).otherwise(0)).cast("long")


def _string_key(cols: Sequence[Column]) -> Column:
    """INJECTIVE composite key (functions/hashing.py::injective_key): a
    plain ``concat_ws``-style key would undercount distinct tuples
    whenever a value contains the separator."""
    from datacompy_spark.functions.hashing import injective_key

    return injective_key(list(cols))


def expect(df: DataFrame, rules: List[Dict]) -> DataFrame:
    """Evaluate ``rules`` over ``df`` in one aggregation pass; returns one
    row per rule: ``(rule, violations, total, passed)``."""
    if not rules:
        raise ValueError("expect: empty rule list")
    names = [_rule_name(r) for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"expect: duplicate rule names in {names}")
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        *[_violation_expr(r).alias(f"__v_{i}") for i, r in enumerate(rules)],
    )
    stack_args = ", ".join(
        "'" + n.replace("'", "''") + f"', __v_{i}" for i, n in enumerate(names)
    )
    return agg.select(
        F.expr(f"stack({len(rules)}, {stack_args}) as (rule, violations)"),
        F.col("total"),
    ).select("rule", "violations", "total", (F.col("violations") == 0).alias("passed"))


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _violation_sql(rule: Dict) -> str:
    kind = rule["rule"]
    if kind == "not_null":
        return f"sum(CASE WHEN {rule['col']} IS NULL THEN 1 ELSE 0 END)::BIGINT"
    if kind == "unique":
        from datacompy_spark.functions.hashing import injective_key_sql

        key = injective_key_sql(rule["cols"])
        return f"(count(*) - count(DISTINCT {key}))::BIGINT"
    c = rule["col"]
    if kind == "accepted_values":
        vals = ", ".join(_sql_literal(v) for v in rule["values"])
        bad = f"{c} IS NOT NULL AND {c} NOT IN ({vals})"
    elif kind == "in_range":
        bad = (
            f"{c} IS NOT NULL AND ({c} < {_sql_literal(rule['lo'])}"
            f" OR {c} > {_sql_literal(rule['hi'])})"
        )
    elif kind == "matches_regex":
        bad = f"{c} IS NOT NULL AND NOT regexp_matches({c}, {_sql_literal(rule['pattern'])})"
    else:
        raise ValueError(f"unknown rule kind: {kind!r}")
    return f"sum(CASE WHEN {bad} THEN 1 ELSE 0 END)::BIGINT"


def expect_sql(table: str, rules: List[Dict]) -> str:
    """DuckDB twin of :func:`expect` — the same one-pass aggregate, one
    UNION ALL branch per rule off the single aggregate row."""
    if not rules:
        raise ValueError("expect_sql: empty rule list")
    names = [_rule_name(r) for r in rules]
    aggs = ", ".join(f"{_violation_sql(r)} AS v_{i}" for i, r in enumerate(rules))
    branches = " UNION ALL ".join(
        f"SELECT {_sql_literal(n)} AS rule, v_{i} AS violations, total,"
        f" v_{i} = 0 AS passed FROM a"
        for i, n in enumerate(names)
    )
    return f"WITH a AS (SELECT count(*)::BIGINT AS total, {aggs} FROM {table})\n{branches}"
