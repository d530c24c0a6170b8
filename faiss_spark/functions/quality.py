"""Model-based document quality scoring — the fasttext-style linear
classifier step of published LM data pipelines (CCNet trains a language
model / classifier to rank crawl text against Wikipedia; GPT-3 and LLaMA
filter Common Crawl with a linear quality classifier over hashed bag-of-
words features). The heuristic rule sets (``gopher_quality_flags``,
``text_features``) catch structural junk; this learns a corpus-specific
notion of "looks like the reference corpus" from labeled examples —
typically weak labels (reference-corpus docs = 1, random crawl = 0).

Spark-first shape (the 100 TB posture):
- featurize: ``tokens`` (JVM codegen split) → ``HashingTF`` (JVM murmur3
  hashing into a fixed 2^18-dim sparse vector — no vocabulary to build,
  no shuffle, map-only);
- fit: ``pyspark.ml`` LogisticRegression — L-BFGS over treeAggregate
  gradient partials (map-side combine; the only driver state is the
  coefficient vector, ~2 MB at 2^18 features);
- score: map-only ``model.transform`` with broadcast coefficients; the
  corpus is never shuffled.

Reference parity note: the reference engine has no classifier — this is
part of the beyond-reference LLM-pipeline surface (SURVEY "training-data
pipeline" section), kept deliberately linear/hashed so it runs at corpus
scale without a vocabulary build or a Python hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faiss_spark.functions.text import tokens


@dataclass
class QualityClassifierModel:
    """Fitted hashed-BOW logistic scorer. ``score`` appends
    ``quality_score`` = P(label=1 | text) in [0, 1]; filtering policy
    (threshold or importance-sampling by score, the GPT-3 trick) is the
    caller's."""

    lr_model: "object"  # pyspark.ml LogisticRegressionModel
    num_features: int
    binary_tf: bool

    def _featurize(self, docs: DataFrame, text_col: str) -> DataFrame:
        from pyspark.ml.feature import HashingTF

        tf = HashingTF(
            inputCol="__toks",
            outputCol="features",
            numFeatures=self.num_features,
            binary=self.binary_tf,
        )
        return tf.transform(
            docs.withColumn("__toks", tokens(F.col(text_col)))
        ).drop("__toks")

    def score(
        self, docs: DataFrame, text_col: str = "text"
    ) -> DataFrame:
        """Input columns + ``quality_score`` (double). Map-only: hashed
        featurization and the broadcast-coefficient dot product both run
        executor-side; no shuffle, no Python."""
        feats = self._featurize(docs, text_col)
        out = self.lr_model.transform(feats)
        # probability of class 1; vector_to_array is the supported
        # JVM-side accessor (no UDF)
        from pyspark.ml.functions import vector_to_array

        return out.withColumn(
            "quality_score",
            vector_to_array(F.col("probability")).getItem(1),
        ).drop("features", "rawPrediction", "probability", "prediction")

    def save(self, path: str) -> "QualityClassifierModel":
        """Hadoop-FS path (pyspark.ml persistence + a small json
        sidecar via fsio — works on s3a://hdfs:// like every other
        index artifact)."""
        import os

        from pyspark.sql import SparkSession

        from faiss_spark.sources import fsio

        self.lr_model.write().overwrite().save(os.path.join(path, "lr"))
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "QualityClassifierModel.save needs an active SparkSession "
                "(fsio routes writes through the JVM's Hadoop FS so the "
                "artifact lands on the same object store as the model)."
            )
        fsio.write_json(
            spark,
            os.path.join(path, "_quality_meta.json"),
            {
                "num_features": int(self.num_features),
                "binary_tf": bool(self.binary_tf),
            },
        )
        return self

    @staticmethod
    def load(spark, path: str) -> "QualityClassifierModel":
        import os

        from pyspark.ml.classification import LogisticRegressionModel

        from faiss_spark.sources import fsio

        meta = fsio.read_json(spark, os.path.join(path, "_quality_meta.json"))
        return QualityClassifierModel(
            lr_model=LogisticRegressionModel.load(os.path.join(path, "lr")),
            num_features=meta["num_features"],
            binary_tf=meta["binary_tf"],
        )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    num_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
    binary_tf: bool = False,
) -> QualityClassifierModel:
    """Fit the hashed-BOW logistic quality scorer on labeled documents.

    ``label_col`` must be 0/1 (castable to double) — weak labels are the
    published pattern (reference-corpus docs vs random crawl). Raises on
    single-class input (the fit would be degenerate, not an error a 100 TB
    run should discover after an hour)."""
    from pyspark.ml.classification import LogisticRegression

    if num_features < 2:
        raise ValueError(
            f"num_features must be >= 2, got {num_features}"
        )
    labeled = docs.withColumn("label", F.col(label_col).cast("double"))
    classes = [
        r["label"]
        for r in labeled.select("label").distinct().limit(3).collect()
    ]
    if None in classes or not set(classes) <= {0.0, 1.0}:
        raise ValueError(
            f"label_col {label_col!r} must be binary 0/1 without nulls, "
            f"saw {sorted(classes, key=str)}"
        )
    if len(classes) < 2:
        raise ValueError(
            f"label_col {label_col!r} has a single class "
            f"({classes[0]!r}) — training needs both"
        )
    model = QualityClassifierModel(
        lr_model=None, num_features=num_features, binary_tf=binary_tf
    )
    feats = model._featurize(labeled, text_col)
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model.lr_model = lr.fit(feats.select("label", "features"))
    return model
