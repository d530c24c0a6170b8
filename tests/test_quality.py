"""Model-based quality classifier (functions/quality.py): hashed-BOW
logistic scoring must learn a BOW-separable planted label, emit
probabilities, refuse degenerate labels, and round-trip persistence."""

import os

import pytest
from pyspark.sql import functions as F

from faiss_spark.functions.quality import (
    QualityClassifierModel,
    train_quality_classifier,
)
from faiss_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def labeled(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    return docs.withColumn(
        "label", F.col("text").contains(" the ").cast("int")
    ).localCheckpoint()


def test_learns_planted_label(spark, labeled):
    train = labeled.filter("doc_id % 2 = 0")
    test = labeled.filter("doc_id % 2 = 1")
    m = train_quality_classifier(
        train, "label", num_features=1 << 12, max_iter=20
    )
    scored = m.score(test)
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    auc = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction"
    ).evaluate(
        scored.select(
            F.col("quality_score").alias("rawPrediction"),
            F.col("label").cast("double").alias("label"),
        )
    )
    assert auc >= 0.9
    lo, hi = scored.agg(
        F.min("quality_score"), F.max("quality_score")
    ).first()
    assert 0.0 <= lo <= hi <= 1.0
    # scoring keeps the input columns
    assert set(scored.columns) >= {"doc_id", "text", "quality_score"}


def test_score_is_map_only(spark, labeled):
    """The 100 TB contract: scoring shuffles nothing — no Exchange in
    the scored plan."""
    m = train_quality_classifier(
        labeled, "label", num_features=1 << 10, max_iter=5
    )
    plan = m.score(labeled)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_validation_errors(spark, labeled):
    with pytest.raises(ValueError, match="single class"):
        train_quality_classifier(
            labeled.withColumn("label", F.lit(0)), "label"
        )
    with pytest.raises(ValueError, match="binary 0/1"):
        train_quality_classifier(
            labeled.withColumn("label", F.col("doc_id") % 3), "label"
        )
    with pytest.raises(ValueError, match="num_features"):
        train_quality_classifier(labeled, "label", num_features=1)


def test_save_load_roundtrip(spark, labeled, tmp_path):
    m = train_quality_classifier(
        labeled, "label", num_features=1 << 10, max_iter=5
    )
    m.save(str(tmp_path / "q"))
    re = QualityClassifierModel.load(spark, str(tmp_path / "q"))
    assert re.num_features == m.num_features
    a = sorted(
        (r["doc_id"], round(r["quality_score"], 12))
        for r in m.score(labeled).select("doc_id", "quality_score").collect()
    )
    b = sorted(
        (r["doc_id"], round(r["quality_score"], 12))
        for r in re.score(labeled).select("doc_id", "quality_score").collect()
    )
    assert a == b
