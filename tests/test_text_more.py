"""Distributed classifier training (naive Bayes) and corpus-weighting
entries: non-degeneracy and semantic invariants the value oracle alone
can't express (the oracle proves Spark == DuckDB; these prove the model
actually learned something)."""

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_nb_classifier_learns_above_majority(spark):
    """Training accuracy must clearly beat the majority-class rate — if the
    hashed features or the weight math degrade, accuracy collapses to the
    prior and this catches it even while Spark and DuckDB still agree."""
    from kafka_cdc_hudi_spark.plans.catalog_text import text_nb_classifier

    df = text_nb_classifier(spark, SF_DIR).cache()
    try:
        n = df.count()
        acc = df.agg(F.avg("correct")).collect()[0][0]
        majority = (
            df.groupBy("ypm").count().agg(F.max("count")).collect()[0][0] / n
        )
        assert acc >= majority + 0.15, f"acc {acc} vs majority {majority}"
        # both classes present (the label stays balanced enough to train on)
        assert df.select("ypm").distinct().count() == 2
        # prediction rule is internally consistent with the score
        bad = df.filter(
            ((F.col("score") > 0) & (F.col("pred") != 1))
            | ((F.col("score") <= 0) & (F.col("pred") != -1))
        ).count()
        assert bad == 0
    finally:
        df.unpersist()


def test_dsir_selection_enriches_target_domain(spark):
    """The importance-resampling selection must over-represent the target
    domain well beyond its base rate — the whole point of DSIR. Also pins
    the budget contract: exactly _DSIR_BUDGET selected unless boundary
    ties admit more."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _DSIR_BUDGET,
        dataset_dsir_weights,
    )

    df = dataset_dsir_weights(spark, SF_DIR).cache()
    try:
        n = df.count()
        n_sel = df.filter("selected = 1").count()
        assert n_sel >= _DSIR_BUDGET
        t_sel = df.filter("selected = 1").agg(F.sum("is_target")).collect()[0][0]
        t_all = df.agg(F.sum("is_target")).collect()[0][0]
        base_rate = t_all / n
        sel_rate = t_sel / n_sel
        assert sel_rate >= 2.5 * base_rate, f"{sel_rate} vs base {base_rate}"
    finally:
        df.unpersist()


def test_quality_funnel_is_monotone_and_nonvacuous(spark):
    """Cumulative gates can only shrink the survivor set, and the funnel
    must actually discriminate (the final stage keeps a strict, nonzero
    subset on the fixture)."""
    from kafka_cdc_hudi_spark.plans.catalog_text import pipeline_quality_funnel

    rows = sorted(
        pipeline_quality_funnel(spark, SF_DIR).collect(), key=lambda r: r.stage
    )
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    counts = [r.n_docs for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert 0 < counts[-1] < counts[0]
