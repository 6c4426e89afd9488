"""Sketch aggregations must land within documented error bounds of exact."""

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.plans.catalog_analytics import (
    events_hll_mergeable_rollup,
    events_hll_rollup_estimates,
    events_sketches,
    events_sketches_estimates,
)
from kafka_cdc_hudi_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_hll_mergeable_rollup_matches_exact_within_tolerance(spark):
    """Sketch-union rollup must land near the exact distinct count — the
    merge path (union of per-hour sketches) is what's under test, not just
    the base estimator."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in events_hll_rollup_estimates(spark, SF_DIR).collect()
    }
    e = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["nd"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("nd")).collect()
    }
    assert set(approx) == set(exact)
    for t, est in approx.items():
        assert abs(est - exact[t]) <= max(2, 0.05 * exact[t]), (t, est, exact[t])


def test_sketches_within_tolerance(spark):
    approx = {
        r["event_type"]: (r["approx_users"], [r["value_p50"], r["value_p95"]])
        for r in events_sketches_estimates(spark, SF_DIR).collect()
    }
    e = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: (r["nd"], r["p"])
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("p"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for t, (nd_a, q_a) in approx.items():
        nd_e, q_e = exact[t]
        assert abs(nd_a - nd_e) <= max(1, 0.05 * nd_e), f"{t}: HLL off {nd_a} vs {nd_e}"
        spread = max(1e-9, q_e[1] - q_e[0])
        for qa, qe in zip(q_a, q_e):
            assert abs(qa - qe) <= 0.1 * spread + 1e-6, f"{t}: quantile {qa} vs {qe}"


def test_sketch_catalog_entries_self_check_and_return_exact_columns(spark):
    """The registered queries must pass their in-query tolerance gates (a
    raise here = red driver row) and expose only exact-oracle-able columns."""
    s = events_sketches(spark, SF_DIR)
    assert s.columns == ["event_type", "n", "n_users", "min_value", "max_value"]
    assert s.count() > 0
    r = events_hll_mergeable_rollup(spark, SF_DIR)
    assert r.columns == ["event_type", "n_events", "n_hour_buckets"]
    assert r.count() > 0


def test_cms_overcount_one_sided_and_bounded(spark):
    """CMS structural guarantee: estimates never undercount, and with
    width 64 over ~150 keys the mean overcount stays far below the
    worst-case e/width * total bound."""
    from kafka_cdc_hudi_spark.plans.catalog_analytics import events_cms_heavy_hitters

    from .conftest import SF_DIR

    rows = events_cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows), "CMS undercounted"
    total = sum(r.exact_n for r in rows)
    mean_over = sum(r.overcount for r in rows) / len(rows)
    assert mean_over <= 2.72 / 64 * total, f"mean overcount {mean_over} above bound"


def test_kmv_estimate_accuracy(spark):
    """KMV accuracy: with k=64 the standard error is ~1/sqrt(k-2) ~= 13%;
    pin a 25% band (sf0.001 groups are all below k, where the sketch is
    EXACT by the n_obs < k rule — assert that too)."""
    from kafka_cdc_hudi_spark.plans.catalog_analytics import events_kmv_distinct_rollup

    from .conftest import SF_DIR

    rows = events_kmv_distinct_rollup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_obs < 64:
            assert r.kmv_est == float(r.exact_users), r
        else:
            assert abs(r.kmv_est - r.exact_users) <= 0.25 * r.exact_users, r


def test_histogram_quantile_merge_equals_direct(spark):
    """Mergeability: per-day histograms summed to per-type must equal the
    histogram built directly from all events in one pass (counts add
    exactly — the property that makes the sketch maintainable
    incrementally), and the derived quantile edges must bracket the true
    order statistic's bin."""
    from kafka_cdc_hudi_spark.plans.catalog_analytics import (
        _HQ_BINS,
        _HQ_WIDTH,
        events_histogram_quantile_estimates,
    )

    e = load_table(spark, SF_DIR, "events")
    bin_col = F.least(
        F.lit(_HQ_BINS - 1), F.greatest(F.lit(0), F.floor(F.col("value") / _HQ_WIDTH))
    ).cast("long")
    direct = {
        (r["event_type"], r["bin"]): r["cnt"]
        for r in e.groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    via_days = {
        (r["event_type"], r["bin"]): r["cnt"]
        for r in e.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type", bin_col.alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("cnt"))
        .collect()
    }
    assert direct == via_days

    for r in events_histogram_quantile_estimates(spark, SF_DIR).collect():
        # upper edges are on the bin grid and ordered
        assert r.p50_upper % _HQ_WIDTH == 0 and r.p95_upper % _HQ_WIDTH == 0
        assert r.p50_upper <= r.p95_upper


def test_ewma_forecast_semantics(spark):
    """First event per user has no forecast; a constant series forecasts
    itself exactly (weights renormalize, so truncation doesn't bias); and
    the fixture must be non-vacuous (nonzero residuals exist)."""
    from pyspark.sql import functions as F

    from kafka_cdc_hudi_spark.plans.catalog_streaming import events_ewma_forecast

    out = events_ewma_forecast(spark, SF_DIR).cache()
    try:
        firsts = out.groupBy("user_id").agg(F.min("event_id").alias("event_id"))
        # fixture event order: event_id ascends with ts per user, so the
        # min-id row is each user's first — it must carry NULL forecast
        nulls = out.join(firsts, ["user_id", "event_id"])
        assert nulls.filter(F.col("forecast").isNotNull()).count() == 0
        assert out.filter(F.col("forecast").isNotNull()).count() > 0
        assert out.filter(F.abs(F.col("resid")) > 0).count() > 0

        const = spark.createDataFrame(
            [(i, 1, None, 7.5) for i in range(20)],
            "event_id LONG, user_id LONG, pad STRING, value DOUBLE",
        ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60))
        import kafka_cdc_hudi_spark.plans.catalog_streaming as cs

        w = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
            "user_id"
        ).orderBy("ts", "event_id")
        # reuse the entry's filter by faking a load: inline the same math
        from kafka_cdc_hudi_spark.functions.timefns import epoch_micros
        num, den = F.lit(0.0), F.lit(0.0)
        for j in range(1, cs._EWMA_LAGS + 1):
            x = F.lag("value", j).over(w)
            wt = F.lit(2.0 ** -(j - 1))
            num = num + F.when(x.isNotNull(), x * wt).otherwise(F.lit(0.0))
            den = den + F.when(x.isNotNull(), wt).otherwise(F.lit(0.0))
        got = const.select(F.when(den > 0, num / den).alias("f")).collect()
        vals = {r.f for r in got if r.f is not None}
        assert vals == {7.5}, vals
    finally:
        out.unpersist()
