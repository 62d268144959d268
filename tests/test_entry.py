"""Contract tests for ``__spark_entry__`` — the driver-facing surface.

The driver's correctness sweep canonicalizes each query's result with
pandas ``sort_values``/``factorize``, which raises ``TypeError: unhashable
type`` on array/map/struct columns (observed in round 7: ``cdc_delta`` and
``embedding_quantize`` ERR'd for two rounds while passing the builder's own
array-aware checker). These tests make the driver's constraint a permanent
local gate instead of a rediscovered-per-round gotcha.
"""

import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.fixture(scope="module")
def registry():
    return entry.queries()


def test_every_query_emits_only_atomic_columns(spark, sf_dir, registry):
    """No queries() entry may return array/map/struct columns.

    Schema-only: builds each plan (analysis, no job) at sf0.001. Operators
    may return arrays internally — the QUERY wrapper must serialize them
    (array_join / hash) with the identical expression in the oracle twin.
    """
    offenders = {}
    for name, q in registry.items():
        df = q(spark, sf_dir)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"queries() entries emit non-atomic columns (driver canonicalizer "
        f"cannot sort them): {offenders}"
    )


def test_oracle_sql_covers_every_query(registry):
    oracles = entry.oracle_sql()
    missing = [n for n in registry if n not in oracles]
    assert not missing, f"queries() entries without an oracle twin: {missing}"


def test_sweep_prefix_names_are_registered(registry):
    from datacompy_spark.queries import _SWEEP_FIRST

    unknown = [n for n in _SWEEP_FIRST if n not in registry]
    assert not unknown, f"_SWEEP_FIRST names not in the registry: {unknown}"


def test_entry_flagship_runs(spark):
    df = entry.entry(spark)
    assert df.columns
    assert df.count() >= 0
