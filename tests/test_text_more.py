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
