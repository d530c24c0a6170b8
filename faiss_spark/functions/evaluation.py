"""Result-quality metrics — SURVEY §2.J (reference contrib/evaluation.py).

All metrics are DataFrame joins/aggregations over exploded k-NN result
tables (qid, id, rank[, dist]) — the long form makes these one-liners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def knn_intersection_measure(res: DataFrame, truth: DataFrame, k: int) -> float:
    """Mean |res ∩ truth| / k per query (reference
    contrib/evaluation.py:14 knn_intersection_measure)."""
    r = res.filter(F.col("rank") <= k).select("qid", "id")
    t = truth.filter(F.col("rank") <= k).select("qid", "id")
    nq = t.select("qid").distinct().count()
    inter = r.join(t, ["qid", "id"], "inner").count()
    return inter / (nq * k)


def recall_at_r(res: DataFrame, truth: DataFrame, r: int) -> float:
    """1-recall@R: fraction of queries whose TRUE 1-NN appears in the
    result's top R (reference AutoTune.h:26-85 OneRecallAtRCriterion)."""
    nn1 = truth.filter(F.col("rank") == 1).select("qid", "id")
    hits = (
        res.filter(F.col("rank") <= r)
        .join(nn1, ["qid", "id"], "inner")
        .select("qid")
        .distinct()
        .count()
    )
    nq = nn1.count()
    return hits / nq


def range_pr(
    res: DataFrame, truth: DataFrame
) -> tuple[float, float]:
    """Precision/recall of a range-search result vs ground truth
    (reference contrib/evaluation.py:149 range_PR): both tables
    (qid, id)."""
    r = res.select("qid", "id").distinct()
    t = truth.select("qid", "id").distinct()
    tp = r.join(t, ["qid", "id"], "inner").count()
    n_res = r.count()
    n_truth = t.count()
    precision = tp / n_res if n_res else 1.0
    recall = tp / n_truth if n_truth else 1.0
    return precision, recall
