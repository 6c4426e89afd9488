"""Skew-resistant salted top-k must agree with the direct window top-k."""

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.dedup import topk_per_key, topk_per_key_salted


def _skewed(spark):
    # key 0 is hot: 5000 rows; keys 1..9 have 50 each; seq unique
    hot = spark.range(5000).selectExpr("0 AS k", "id AS seq", "id % 97 AS score")
    cold = spark.range(450).selectExpr("1 + CAST(id / 50 AS INT) AS k", "10000 + id AS seq", "id % 31 AS score")
    return hot.unionByName(cold)


def test_salted_topk_matches_direct(spark):
    df = _skewed(spark)
    direct = topk_per_key(df, ["k"], "score", 5, tiebreakers=["seq"])
    salted = topk_per_key_salted(df, ["k"], "score", 5, tiebreakers=["seq"], salt_buckets=8)
    a = {tuple(r) for r in direct.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b
    assert direct.groupBy("k").count().filter(F.col("count") > 5).count() == 0


def test_salted_phase1_bounds_rows(spark):
    df = _skewed(spark)
    # phase-1 output is capped at k * salt_buckets rows per key
    from kafka_cdc_hudi_spark.operators.dedup import topk_per_key as tpk

    salt = F.pmod(F.hash(F.col("score"), F.col("seq")), F.lit(8)).alias("__salt")
    p1 = tpk(df.withColumn("__salt", salt), ["k", "__salt"], "score", 5, ["seq"])
    per_key = {r["k"]: r["count"] for r in p1.groupBy("k").count().collect()}
    assert per_key[0] <= 5 * 8
