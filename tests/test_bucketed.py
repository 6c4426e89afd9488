"""Bucketed co-located joins: the join must plan WITHOUT exchanges, and
results must equal the plain (shuffled) join."""

import pytest
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.sinks.bucketed import read_bucketed, write_bucketed
from kafka_cdc_hudi_spark.sources.tables import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", ["o_orderkey"], 8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    o = read_bucketed(spark, "b_orders")
    l = read_bucketed(spark, "b_lineitem")
    # force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(l, "o_orderkey").select("o_orderkey", "o_totalprice", "l_quantity")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    plain = (
        o.join(l, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    bucketed = (
        read_bucketed(spark, "b_orders")
        .join(read_bucketed(spark, "b_lineitem"), "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {r["o_orderkey"]: (r["n"], r["q"]) for r in plain.collect()}
    b = {r["o_orderkey"]: (r["n"], r["q"]) for r in bucketed.collect()}
    assert a == b


def test_bucketed_groupby_avoids_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the storage partitioning."""
    l = read_bucketed(spark, "b_lineitem")
    agg = l.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
