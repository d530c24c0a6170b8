"""Binary vector indexes: binarization + Hamming/Jaccard search.

Reference: IndexBinaryFlat (faiss/IndexBinaryFlat.h:20, brute-force
Hamming/Jaccard over packed bits), the fork's binary metric dispatch
(faiss/utils/binary_distances.h:51, METRIC_JACCARD/METRIC_HAMMING added at
faiss/MetricType.h:27-28), IndexLSH (faiss/IndexLSH.h:21 rotation + per-bit
binarization), IndexBinaryFromFloat (faiss/IndexBinaryFromFloat.h:26).

Representation: codes are ``array<bigint>`` of 32-bit words (word w holds
dims 32w+1..32w+32, bit j = dim value > threshold). 32-bit words keep
every arithmetic step exact in doubles, so the same expression runs
byte-identical on any SQL engine (the DuckDB oracle included) — and
XOR+bit_count stays whole-stage-codegen'd JVM work, no Python in the scan.

Distances (reference faiss/utils/hamming.h:113-170, binary_distances.h):
  hamming  = Σ_w popcount(a_w XOR b_w)           (smaller better)
  jaccard  = 1 − Σ popcount(a&b) / Σ popcount(a|b)   (smaller better;
             the reference's binary Jaccard *distance*)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WORD_BITS = 32


def signbit_code_expr(vec: Column, d: int, threshold: float = 0.0) -> Column:
    """Pure-SQL binarization: array of ceil(d/32) words, bit j of word w
    set iff vec[32w + j + 1] > threshold. (The IndexBinaryFromFloat path
    with a fixed component threshold.)"""
    nwords = (d + WORD_BITS - 1) // WORD_BITS

    def word_expr(lo: int, hi: int) -> Column:
        # closure factory: a default-arg lambda would change the arity
        # PySpark infers for the higher-order function
        return F.aggregate(
            F.sequence(F.lit(lo), F.lit(hi)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.when(
                F.element_at(vec, i) > threshold, F.pow(F.lit(2.0), i - lo)
            ).otherwise(F.lit(0.0)),
        ).cast("bigint")

    return F.array(
        *[
            word_expr(w * WORD_BITS + 1, min((w + 1) * WORD_BITS, d))
            for w in range(nwords)
        ]
    )


def hamming_expr(a: Column, b: Column) -> Column:
    """Σ_w popcount(a_w XOR b_w) — JVM bit ops, codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda s, v: s + v,
    )


def jaccard_dist_expr(a: Column, b: Column) -> Column:
    """1 − popcount(a&b)/popcount(a|b); 0 when both empty (faiss returns
    0 distance for two all-zero codes)."""
    inter = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0),
        lambda s, v: s + v,
    ).cast("double")
    union = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseOR(y))),
        F.lit(0),
        lambda s, v: s + v,
    ).cast("double")
    return F.when(union == 0.0, F.lit(0.0)).otherwise(1.0 - inter / union)


def binarize(
    df: DataFrame, d: int, id_col: str = "id", vec_col: str = "vec",
    threshold: float = 0.0, out_col: str = "code",
) -> DataFrame:
    """(id, code array<bigint>) sign-bit codes — single codegen'd scan."""
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        signbit_code_expr(F.col(vec_col), d, threshold).alias(out_col),
    )


def binarize_rotated(
    df: DataFrame, A: np.ndarray, id_col: str = "id", vec_col: str = "vec",
    out_col: str = "code",
) -> DataFrame:
    """LSH/ITQ binarization: rotate with broadcast A then take sign bits
    (reference IndexLSH rotate_data / ITQTransform). Pandas-UDF path since
    the rotation is a model artifact."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(A)

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        A_ = bc.value
        nbits = A_.shape[0]
        nwords = (nbits + WORD_BITS - 1) // WORD_BITS
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["vec"]).astype(np.float64)
            B = (X @ A_.T) > 0  # (n, nbits)
            pad = nwords * WORD_BITS - nbits
            if pad:
                B = np.concatenate([B, np.zeros((len(B), pad), bool)], axis=1)
            weights = (1 << np.arange(WORD_BITS, dtype=np.int64))
            words = (
                B.reshape(len(B), nwords, WORD_BITS).astype(np.int64) * weights
            ).sum(2)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(np.int64),
                    "code": list(words),
                }
            )

    src = df.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
    )
    return src.mapInPandas(do, schema="id bigint, code array<bigint>")


def _binary_knn(
    codes: DataFrame, qcodes: DataFrame, k: int, dist: Column = None
) -> DataFrame:
    """Broadcast-join + window top-k. Spark ≥3.5 plans the rank filter as
    WindowGroupLimit (partial per-partition limit before the shuffle), so
    the shuffled candidate set is ≤ partitions × nq × k — the same shape
    as the GEMM knn's merge stage."""
    joined = codes.crossJoin(F.broadcast(qcodes)).select(
        "qid", "id", dist.alias("dist")
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "dist", "rank")
    )


def hamming_knn(
    codes: DataFrame, qcodes: DataFrame, k: int,
    code_col: str = "code", qcode_col: str = "qcode",
) -> DataFrame:
    """Brute-force Hamming k-NN (reference hammings_knn_hc,
    faiss/utils/hamming.h:125). codes: (id, code); qcodes: (qid, qcode).
    dist is int bit count, returned as double for result-schema parity."""
    return _binary_knn(
        codes, qcodes, k,
        hamming_expr(F.col(code_col), F.col(qcode_col)).cast("double"),
    )


def jaccard_knn(
    codes: DataFrame, qcodes: DataFrame, k: int,
    code_col: str = "code", qcode_col: str = "qcode",
) -> DataFrame:
    """Brute-force binary-Jaccard k-NN (fork metric, reference
    faiss/utils/binary_distances.h:51, METRIC_JACCARD)."""
    return _binary_knn(
        codes, qcodes, k, jaccard_dist_expr(F.col(code_col), F.col(qcode_col))
    )


def hamming_range_search(
    codes: DataFrame, qcodes: DataFrame, radius: int,
    code_col: str = "code", qcode_col: str = "qcode",
) -> DataFrame:
    """All pairs with hamming < radius (reference hamming_range_search,
    faiss/utils/hamming.h:165)."""
    d = hamming_expr(F.col(code_col), F.col(qcode_col))
    return (
        codes.crossJoin(F.broadcast(qcodes))
        .select("qid", "id", d.cast("double").alias("dist"))
        .filter(F.col("dist") < radius)
    )
