"""Every registered oracle-checked query must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from kafka_cdc_hudi_spark.plans.catalog import FULL_REGISTRY as REGISTRY

from .conftest import SF_DIR
from .oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def _local_sql(name: str, sql: str) -> str:
    # some oracles bake per-scale-factor literals (trained artifacts);
    # the registry carries the driver's sf0.01 build — rebuild for the
    # local SF_DIR here
    from kafka_cdc_hudi_spark.plans.catalog import sf_dependent_sql_builders

    builder = sf_dependent_sql_builders().get(name)
    if builder is not None:
        return builder(SF_DIR) or sql
    return sql


ORACLE_CASES = [
    (n, fn, _local_sql(n, sql)) for n, (fn, sql) in REGISTRY.items() if sql is not None
]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_query_matches_oracle(spark, con, name, fn, sql):
    ok, msg = compare(fn(spark, SF_DIR), con, sql)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    for name, (fn, _sql) in REGISTRY.items():
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name}: no columns"


#: queries whose oracle pass was once vacuous (0 rows == 0 rows proves
#: nothing); their fixtures/thresholds are calibrated to stay non-empty
_MUST_BE_NONEMPTY = (
    "dedup_embedding_cosine",
    "customers_without_orders",
    "events_funnel_conversions",
    "q7_volume_shipping",
    "q18_large_volume_customers",
    "q22_sales_opportunity",
    "events_anomaly_zscore",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q15_top_supplier",
    "q20_excess_quantity_suppliers",
    "q21_last_shipper_blame",
)


@pytest.mark.parametrize("name", _MUST_BE_NONEMPTY)
def test_calibrated_queries_stay_nonvacuous(spark, name):
    fn, _sql = REGISTRY[name]
    assert fn(spark, SF_DIR).limit(1).count() == 1, f"{name}: vacuous again"


def test_normalize_handles_struct_nested_lists():
    """Canonicalization must handle array columns AND arrays nested inside
    structs (dicts) — struct<array> cells must become hashable/sortable
    tuples instead of raising on sort_values."""
    import pandas as pd

    from .oracle_harness import _normalize

    df = pd.DataFrame(
        {
            "id": [2, 1, 3],
            "s": [
                {"xs": [3, 4], "tag": "b"},
                {"xs": [1, 2], "tag": "a"},
                None,
            ],
            "arr": [[5, 6], [7, [8, 9]], None],
        }
    )
    out = _normalize(df)
    assert list(out.columns) == ["arr", "id", "s"]
    # rows sort by arr first: (5,6) [tag b], (7,(8,9)) [tag a], None last
    assert out["s"].iloc[0] == (("tag", "b"), ("xs", (3, 4)))
    assert out["s"].iloc[1] == (("tag", "a"), ("xs", (1, 2)))
    assert out["arr"].iloc[1] == (7, (8, 9))
    # deterministic: same input, same order
    assert _normalize(df).equals(out)


def test_reconciliation_exercises_all_outer_branches(spark):
    """The full-outer entry must actually produce all three null patterns —
    an all-'both' result would leave the outer join vacuously untested."""
    fn, _sql = REGISTRY["user_activity_reconciliation"]
    statuses = {r.status for r in fn(spark, SF_DIR).select("status").distinct().collect()}
    assert statuses == {"both", "events_only", "orders_only"}, statuses
