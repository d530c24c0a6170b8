"""IVF (inverted-file) index: the partitioned-table pattern.

Reference: faiss/IndexIVF.h:33-122 (Level1Quantizer + IndexIVF),
faiss/IndexIVF.cpp:302-544 (search lifecycle, SURVEY §3.2),
contrib/ivf_tools.py:26-57 (big-batch search grouped by probed list — the
shape we use).

The faiss mapping onto Spark:

  train   Level1Quantizer::train_q1 = our KMeans on a seeded sample
          → centroids artifact (small, broadcastable).
  add     encode_vectors → (list_no, id, vec) → **Parquet partitioned by
          list_no** (reference ArrayInvertedLists/OnDiskInvertedLists ARE
          this layout, faiss/invlists/InvertedLists.h:30-111).
  search  stage A: coarse top-nprobe per query against broadcast
          centroids (= quantizer->search, IndexIVF.cpp:330).
          stage B: scan ONLY the probed partitions — the `list_no IN
          (cells)` filter becomes Catalyst **partition pruning**, which is
          exactly faiss's nprobe cell selection (IndexIVF.cpp:315-338)
          done by the planner instead of a hand-written loop.
          stage C: per-partition distance scan against just the queries
          probing that list (the ivf_tools big-batch shape), then the
          same small global top-k merge as operators/knn.py.

At 100 TB: the codes table is partition-pruned to nprobe/nlist of its
files; the probe set (qid → list_no) stays a broadcast; the only shuffle
is the final candidate merge. nprobe=nlist degenerates to exact search.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faiss_spark.kernels import (
    SIMILARITY_METRICS,
    TopKAccumulator,
    as_matrix,
    pairwise_distances,
)
from faiss_spark.operators.cluster import KMeans, KMeansModel


@dataclass
class IVFIndex:
    """A fitted IVF index = centroid artifact + partitioned codes table."""

    centroids: np.ndarray  # (nlist, d)
    metric: str
    path: str | None = None  # partitioned parquet location (if persisted)
    codes: DataFrame | None = None  # the (list_no, id, vec) table

    # ------------------------------------------------------------------ build
    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        metric: str = "l2",
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 20,
    ) -> "IVFIndex":
        """Fit the coarse quantizer (reference Level1Quantizer::train_q1,
        faiss/IndexIVF.h:49): k-means with k=nlist on a seeded sample."""
        km = KMeans(
            k=nlist, niter=niter, seed=seed, spherical=(metric == "cosine")
        ).fit(vectors, vec_col=vec_col)
        return IVFIndex(centroids=km.centroids, metric=metric)

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFIndex":
        """Encode + layout: assign each vector to its nearest centroid and
        (optionally) persist partitioned by list_no (reference
        encode_vectors + invlists->add_entries, faiss/IndexIVF.h:173;
        contrib/ivf_tools.py:9 add_preassigned)."""
        model = KMeansModel(
            centroids=self.centroids,
            k=len(self.centroids),
            d=self.centroids.shape[1],
            spherical=(self.metric == "cosine"),
        )
        assigned = model.assign(vectors, vec_col=vec_col, id_col=id_col).select(
            "id", F.col("cluster").alias("list_no")
        )
        codes = (
            vectors.select(
                F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
            )
            .join(assigned, "id")
            .select("list_no", "id", "vec")
        )
        if path is not None:
            codes.write.mode("overwrite").partitionBy("list_no").parquet(path)
            spark = vectors.sparkSession
            self._save_artifact(path)
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def _save_artifact(self, path: str) -> None:
        """Model artifact = JSON + npy next to the codes table (SURVEY §2.I:
        no faiss binary compat needed — write_index becomes this)."""
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "_centroids.npy"), self.centroids)
        with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
            json.dump(
                {
                    "metric": self.metric,
                    "nlist": int(len(self.centroids)),
                    "d": int(self.centroids.shape[1]),
                },
                f,
            )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFIndex":
        with open(os.path.join(path, "_ivf_meta.json")) as f:
            meta = json.load(f)
        return IVFIndex(
            centroids=np.load(os.path.join(path, "_centroids.npy")),
            metric=meta["metric"],
            path=path,
            codes=spark.read.parquet(path),
        )

    # ----------------------------------------------------------------- search
    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """IVF k-NN (reference IndexIVF::search, faiss/IndexIVF.cpp:302).

        Returns (qid, id, dist, rank). nprobe is clamped to nlist
        (IndexIVF.cpp:315). With nprobe == nlist results are exact."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        nlist = len(self.centroids)
        nprobe = min(nprobe, nlist)
        largest = self.metric in SIMILARITY_METRICS

        # stage A — coarse quantization on the driver (centroids and queries
        # are both small; this IS quantizer->search on the broadcast side)
        qpdf = queries.select(qid_col, qvec_col).toPandas()
        qids = qpdf[qid_col].to_numpy(dtype=np.int64)
        Q = as_matrix(qpdf[qvec_col])
        CD = pairwise_distances(Q, self.centroids, self.metric)
        order = np.argsort(-CD if largest else CD, axis=1, kind="stable")
        probes = order[:, :nprobe]  # (nq, nprobe)

        # invert: list_no -> local query indexes (the ivf_tools big-batch
        # regrouping, contrib/ivf_tools.py:26)
        probed_lists = sorted({int(c) for c in probes.ravel()})
        list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(len(qids)):
            for c in probes[qi]:
                list_to_q[int(c)].append(qi)
        bc = spark.sparkContext.broadcast(
            (qids, Q, {c: np.asarray(v, dtype=np.int64) for c, v in list_to_q.items()})
        )
        metric = self.metric

        # stage B — partition-pruned scan: Catalyst turns the IN-filter on
        # the partitioning column into reading only nprobe'd directories
        pruned = self.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qids_, Q_, l2q = bc.value
            acc: dict[int, TopKAccumulator] = {}
            touched: dict[int, np.ndarray] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for list_no, grp in pdf.groupby("list_no"):
                    qsel = l2q.get(int(list_no))
                    if qsel is None or len(qsel) == 0:
                        continue
                    X = as_matrix(grp["vec"])
                    ids = grp["id"].to_numpy(dtype=np.int64)
                    D = pairwise_distances(Q_[qsel], X, metric)
                    key = int(list_no)
                    if key not in acc:
                        acc[key] = TopKAccumulator(len(qsel), k, metric in SIMILARITY_METRICS)
                        touched[key] = qsel
                    acc[key].push(D, ids)
            for key, a in acc.items():
                qidx, nid, nd = a.emit()
                qsel = touched[key]
                yield pd.DataFrame(
                    {"qid": qids_[qsel[qidx]], "id": nid, "dist": nd}
                )

        candidates = pruned.select("list_no", "id", "vec").mapInPandas(
            scan, schema="qid bigint, id bigint, dist double"
        )

        # stage C — global merge (a vector can only appear in one list, so
        # no dedup needed; just re-rank the small candidate set)
        sort = [F.col("dist").desc() if largest else F.col("dist").asc(), F.col("id").asc()]
        w = Window.partitionBy("qid").orderBy(*sort)
        return (
            candidates.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "id", "dist", "rank")
        )
