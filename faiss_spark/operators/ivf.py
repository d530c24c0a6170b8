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

import hashlib
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
    arrow_i64,
    arrow_list_matrix,
    as_matrix,
    pairwise_distances,
)
from faiss_spark.operators.cluster import KMeans, KMeansModel
from faiss_spark.sources import fsio
from faiss_spark.operators.codecs import ProductQuantizerModel

#: ceiling on rows × d the driver-planned IVF search will collect for
#: probe assignment (~256 MB of float64 at the default); beyond it
#: IVFIndex.search transparently uses the search_preassigned join plan.
#: Module-level so deployments (and tests) can tune it.
MAX_DRIVER_QUERY_CELLS = 32_000_000


def _write_bucketed_codes(
    index, path: str, cols: tuple, prefix: str, nbuckets: int | None
):
    """Shared CLUSTERED BY (list_no) writer behind every index's
    ``save_bucketed`` (the reference's precomputed on-disk invlists
    grouping, invlists/OnDiskInvertedLists.h:60): the bucketed scan
    carries HashPartitioning(list_no), so the preassigned cogroups'
    corpus side becomes scan-only — zero exchanges per search. ``cols``
    is the index family's codes payload (raw ``vec``, SQ/PQ/AQ
    ``code``, PQR ``code, rcode``)."""
    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    spark = index.codes.sparkSession
    if nbuckets is None:
        nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    name = prefix + hashlib.md5(path.encode()).hexdigest()[:12]
    sel = index.codes.select(*cols)
    ddl = sel._jdf.schema().toDDL()
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        # pre-shuffling to the bucket hash keeps it one file per
        # bucket instead of (tasks × buckets) small files
        sel.repartition(nbuckets, "list_no")
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(nbuckets, "list_no")
        .saveAsTable(name)
    )
    index._save_artifact(spark, path)
    fsio.write_json(
        spark,
        os.path.join(path, "_bucket_meta.json"),
        {"nbuckets": int(nbuckets), "table": name, "ddl": ddl},
    )
    index.codes = spark.table(name)
    index.path = path
    return index


def _attach_codes_table(spark: SparkSession, path: str) -> DataFrame:
    """(Re)open a persisted codes location: the bucketed table when a
    ``_bucket_meta.json`` marker exists (grouping provable → cogroups
    skip the corpus exchange), plain partitioned parquet otherwise.
    Shared by every index family's ``load``."""
    bucket_meta = os.path.join(path, "_bucket_meta.json")
    if fsio.exists(spark, bucket_meta):
        return IVFIndex._bucketed_table(
            spark, path, fsio.read_json(spark, bucket_meta)
        )
    return spark.read.parquet(path)


def collect_queries_bounded(
    queries, qid_col: str, qvec_col: str, op: str, d: int | None = None,
    dtype=None, to_matrix=None, fallback=None,
):
    """Driver-side query materialization with a hard bound (the same
    MAX_DRIVER_QUERY_CELLS budget IVFIndex.search uses for its
    auto-fallback): driver-planned searches hold O(nq·d) floats plus
    per-query LUTs, so past the bound fail loudly with the scale-path
    guidance instead of silently OOMing the driver. Paths with a
    fully-distributed twin (IVFIndex.search → search_preassigned) fall
    back instead of raising.

    Collects ONE limited job and checks the collected length, so the
    rows that passed the bound check ARE the rows returned — a derived /
    nondeterministic query frame is never recomputed between check and
    collect. Callers that already know the dimensionality (every index
    carries it in its centroids/codebooks) pass ``d`` and skip the
    1-row dimension probe entirely. ``dtype`` picks the matrix dtype
    (default float64, the oracle-exact path); ``to_matrix`` overrides the
    column→matrix conversion entirely (binary indexes collect int64 word
    arrays, not float vectors) — this is the ONLY query-collect path in
    the repo (VERDICT r7 #5), so every driver-planned search family
    (brute-force, binary, NSG, IVF, fast-scan) shares the same one-job
    budget and the same actionable error. ``fallback`` (a zero-arg
    callable returning a DataFrame) switches overflow from raise to
    auto-fallback — the caller's distributed twin — and is returned
    verbatim; callers that pass it must type-check the result."""
    from faiss_spark.kernels import as_matrix as _as_matrix

    if d is None:
        first = (
            queries.select(F.size(F.col(qvec_col)).alias("d")).limit(1).first()
        )
        d = int(first["d"]) if first else 1
    max_rows = max(1, MAX_DRIVER_QUERY_CELLS // max(1, d))
    qpdf = queries.select(qid_col, qvec_col).limit(max_rows + 1).toPandas()
    if len(qpdf) > max_rows:
        if fallback is not None:
            return fallback()
        raise ValueError(
            f"{op}: query side exceeds the driver-planned bound "
            f"({max_rows} rows at d={d}). Chunk the queries "
            "(operators.knn.knn_chunked) or use a distributed plan "
            "(IVFIndex.search auto-falls-back to search_preassigned)."
        )
    if to_matrix is not None:
        Q = to_matrix(qpdf[qvec_col])
    elif dtype is not None:
        Q = _as_matrix(qpdf[qvec_col], dtype=dtype)
    else:
        Q = _as_matrix(qpdf[qvec_col])
    return qpdf[qid_col].to_numpy(np.int64), Q


def collect_query_frame_bounded(
    queries, qid_col: str, qvec_col: str, op: str, d: int | None = None,
    fallback=None,
):
    """pandas-frame variant of collect_queries_bounded — same one-job
    budget, actionable error, and optional distributed-twin ``fallback``
    — for callers that consume the raw column objects row-wise (the
    binary-hash probe builders)."""
    if d is None:
        first = (
            queries.select(F.size(F.col(qvec_col)).alias("d")).limit(1).first()
        )
        d = int(first["d"]) if first else 1
    max_rows = max(1, MAX_DRIVER_QUERY_CELLS // max(1, d))
    qpdf = queries.select(qid_col, qvec_col).limit(max_rows + 1).toPandas()
    if len(qpdf) > max_rows:
        if fallback is not None:
            return fallback()
        raise ValueError(
            f"{op}: query side exceeds the driver-planned bound "
            f"({max_rows} rows at d={d}). Chunk the queries "
            "(operators.knn.knn_chunked) or use a distributed plan "
            "(IVFIndex.search auto-falls-back to search_preassigned)."
        )
    return qpdf


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
        codes = self._encode_df(vectors, id_col=id_col, vec_col=vec_col)
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy("list_no").parquet(path)
            spark = vectors.sparkSession
            self._save_artifact(spark, path)
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def _encode_df(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> DataFrame:
        """Frozen-artifact encode: (list_no, id, vec) rows — the shared
        core of add() and the streaming incremental writer. keep_vec:
        the assignment map carries the vector through, so the
        encode+layout stage is map-only (no join-back shuffle of the
        100 TB vector table; the only exchange is the partitioned
        write)."""
        model = KMeansModel(
            centroids=self.centroids,
            k=len(self.centroids),
            d=self.centroids.shape[1],
            spherical=(self.metric == "cosine"),
        )
        return model.assign(
            vectors, vec_col=vec_col, id_col=id_col, keep_vec=True
        ).select(F.col("cluster").alias("list_no"), "id", "vec")

    def _save_artifact(self, spark, path: str) -> None:
        """Model artifact = JSON + npy next to the codes table (SURVEY §2.I:
        no faiss binary compat needed — write_index becomes this)."""
        fsio.write_npy(spark, os.path.join(path, "_centroids.npy"), self.centroids)
        fsio.write_json(spark, os.path.join(path, "_ivf_meta.json"), {
                    "metric": self.metric,
                    "nlist": int(len(self.centroids)),
                    "d": int(self.centroids.shape[1]),
                })

    def save(self, path: str) -> "IVFIndex":
        """write_index for an already-built index (reference
        faiss/index_io.h:38): persist the in-memory codes table to the
        partitioned layout + artifacts and re-point at the stored copy."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        self._save_artifact(spark, path)
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    def save_bucketed(self, path: str, nbuckets: int | None = None) -> "IVFIndex":
        """write_index into a CLUSTERED BY (list_no) layout — the
        reference's on-disk invlists (invlists/OnDiskInvertedLists.h:60,
        the precomputed grouping ``merge_to_ondisk`` materializes for the
        1T-scale pipeline, benchs/distributed_ondisk/README.md:139).

        The plain partitioned layout groups the FILES by list_no but
        Spark cannot prove the hash grouping, so every
        ``search_preassigned`` call re-exchanges the whole codes table
        into the cogroup. A bucketed table carries
        ``HashPartitioning(list_no)`` in its scan, the cogroup's
        ClusteredDistribution is already satisfied, and repeated
        big-batch searches become scan-only on the corpus side — at
        100 TB that is the difference between one corpus shuffle per
        search and zero (the probe side, which is the small side, still
        exchanges once)."""
        return _write_bucketed_codes(
            self, path, ("list_no", "id", "vec"), "ivf_codes_", nbuckets
        )

    @staticmethod
    def _bucketed_table(spark: SparkSession, path: str, bm: dict) -> DataFrame:
        """(Re)attach the bucketed codes table. The FILES are the durable
        artifact; the default in-memory catalog is session-scoped, so a
        fresh session recreates the table DDL over the same location."""
        name = bm["table"]
        key = bm.get("key", "list_no")  # NSG buckets by shard
        if not spark.catalog.tableExists(name):
            spark.sql(
                f"CREATE TABLE {name} ({bm['ddl']}) USING PARQUET "
                f"CLUSTERED BY ({key}) INTO {bm['nbuckets']} BUCKETS "
                f"LOCATION '{path}'"
            )
        return spark.table(name)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFIndex":
        meta = fsio.read_json(spark, os.path.join(path, "_ivf_meta.json"))
        bucket_meta = os.path.join(path, "_bucket_meta.json")
        if fsio.exists(spark, bucket_meta):
            codes = IVFIndex._bucketed_table(
                spark, path, fsio.read_json(spark, bucket_meta)
            )
        else:
            codes = spark.read.parquet(path)
        return IVFIndex(
            centroids=fsio.read_npy(spark, os.path.join(path, "_centroids.npy")),
            metric=meta["metric"],
            path=path,
            codes=codes,
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
        (IndexIVF.cpp:315). With nprobe == nlist results are exact.

        The probe plan is computed on the DRIVER (centroids × queries are
        both small in the intended regime); if the query side exceeds
        MAX_DRIVER_QUERY_CELLS / d rows, this automatically falls back to
        the fully-distributed ``search_preassigned`` join plan — the
        driver never materializes an unbounded query frame."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        d = self.centroids.shape[1]
        max_rows = max(1, MAX_DRIVER_QUERY_CELLS // max(1, d))
        # stage A — coarse quantization on the driver (centroids and queries
        # are both small in the intended regime). ONE limited collect; the
        # length of what came back decides driver-plan vs distributed
        # fallback, so the checked rows are exactly the planned rows even
        # for a nondeterministic query frame.
        qpdf = queries.select(qid_col, qvec_col).limit(max_rows + 1).toPandas()
        if len(qpdf) > max_rows:
            return search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            )
        nlist = len(self.centroids)
        nprobe = min(nprobe, nlist)
        largest = self.metric in SIMILARITY_METRICS
        qids = qpdf[qid_col].to_numpy(np.int64)
        Q = as_matrix(qpdf[qvec_col])
        CD = pairwise_distances(Q, self.centroids, self.metric)
        order = np.argsort(-CD if largest else CD, axis=1, kind="stable")
        probes = order[:, :nprobe]  # (nq, nprobe)
        return _scan_probed_lists(self.codes, qids, Q, probes, k, self.metric)


class IVFSearchStats:
    """Per-call IVF search statistics (reference IndexIVFStats,
    faiss/IndexIVF.h:42-55, populated by IVFlib's search_with_parameters,
    faiss/IVFlib.h:129-141). Backed by Spark accumulators: executors add
    as they scan, the driver reads after the result is materialized.

    nq: queries searched; ndis: distances computed (exact); list_scans:
    per-task (list, query-group) scans — equals lists-visited when each
    inverted list lands in one scan partition (the partitioned-parquet
    layout), an upper bound when a list spans several."""

    def __init__(self, spark, nq: int):
        sc = spark.sparkContext
        self.nq = nq
        self._acc_list_scans = sc.accumulator(0)
        self._acc_ndis = sc.accumulator(0)

    @property
    def list_scans(self) -> int:
        return self._acc_list_scans.value

    @property
    def ndis(self) -> int:
        return self._acc_ndis.value

    def as_dict(self) -> dict:
        return {"nq": self.nq, "list_scans": self.list_scans, "ndis": self.ndis}


def ivf_range_search(
    index,
    queries: DataFrame,
    radius: float,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    stats: IVFSearchStats | None = None,
) -> DataFrame:
    """IVF range search (reference IndexIVF::range_search,
    faiss/IndexIVF.cpp:715-781): probe the nprobe nearest cells per
    query, then emit every (qid, id, dist) in the scanned lists with
    dist < radius (similarity metrics: > radius). Fully map-side after
    the partition-pruned scan — candidates are never ranked, so there is
    NO shuffle at all. nprobe == nlist degenerates to exact
    range_search. A query side past the driver bound auto-falls-back to
    the fully-distributed ``range_search_preassigned`` cogroup plan
    (stats are driver-plan-only: the distributed twin raises if an
    IVFSearchStats out-param was requested)."""
    from faiss_spark.kernels import range_pairs

    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    spark = index.codes.sparkSession
    metric = index.metric
    largest = metric in SIMILARITY_METRICS
    nlist = len(index.centroids)
    nprobe = min(nprobe, nlist)

    def _distributed():
        if stats is not None:
            raise ValueError(
                "ivf_range_search: query side exceeds the driver-planned "
                "bound and stats were requested — the distributed "
                "range_search_preassigned plan does not populate "
                "IVFSearchStats; drop stats or chunk the queries."
            )
        return range_search_preassigned(
            index, queries, radius, nprobe=nprobe,
            qid_col=qid_col, qvec_col=qvec_col,
        )

    collected = collect_queries_bounded(
        queries, qid_col, qvec_col, "ivf_range_search",
        d=index.centroids.shape[1], fallback=_distributed,
    )
    if isinstance(collected, DataFrame):
        return collected
    qids, Q = collected
    CD = pairwise_distances(Q, index.centroids, metric)
    order = np.argsort(-CD if largest else CD, axis=1, kind="stable")
    probes = order[:, :nprobe]
    probed_lists = sorted({int(c) for c in probes.ravel()})
    list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
    for qi in range(len(qids)):
        for c in probes[qi]:
            list_to_q[int(c)].append(qi)
    bc = spark.sparkContext.broadcast(
        (qids, Q, {c: np.asarray(v, np.int64) for c, v in list_to_q.items()})
    )
    acc_scans = stats._acc_list_scans if stats is not None else None
    acc_ndis = stats._acc_ndis if stats is not None else None
    pruned = index.codes.filter(F.col("list_no").isin(probed_lists))

    def scan(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_vec_groups

        qids_, Q_, l2q = bc.value
        seen: set[int] = set()
        for list_no, X, ids in arrow_vec_groups(batches):
            qsel = l2q.get(list_no)
            if qsel is None or len(qsel) == 0:
                continue
            if acc_scans is not None and list_no not in seen:
                seen.add(list_no)
                acc_scans.add(len(qsel))
            if acc_ndis is not None:
                acc_ndis.add(int(len(qsel) * len(ids)))
            rq, rc, vals = range_pairs(
                np.ascontiguousarray(Q_[qsel]), X, metric, radius
            )
            if len(rq):
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids_[qsel[rq]], pa.int64()),
                        pa.array(ids[rc], pa.int64()),
                        pa.array(vals, pa.float64()),
                    ],
                    names=["qid", "id", "dist"],
                )

    return pruned.select("list_no", "id", "vec").mapInArrow(
        scan, schema="qid bigint, id bigint, dist double"
    )


def range_search_with_parameters(
    index,
    queries: DataFrame,
    radius: float,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> tuple[DataFrame, IVFSearchStats]:
    """Range-search twin of search_with_parameters (reference
    faiss/IVFlib.h:141 ``range_search_with_parameters`` — explicit params
    + IndexIVFStats out). Stats populate once the result materializes."""
    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    spark = index.codes.sparkSession
    stats = IVFSearchStats(spark, nq=queries.count())
    res = ivf_range_search(
        index, queries, radius, nprobe=nprobe, qid_col=qid_col,
        qvec_col=qvec_col, stats=stats,
    )
    return res, stats


def search_with_parameters(
    index,
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_codes: int | None = None,
) -> tuple[DataFrame, IVFSearchStats]:
    """IVF search under explicit parameters, returning (results, stats)
    (reference faiss/IVFlib.h:129-141 ``search_with_parameters`` /
    ``ivf_search_precomputed`` — the variant that outputs IndexIVFStats).

    max_codes (reference SearchParametersIVF / faiss/IndexIVF.h:69 and
    the scan loop's ``if (max_codes && ndis >= max_codes) break`` at
    IndexIVF.cpp:415): a per-query SCAN BUDGET — probe lists in
    nearest-first order and stop once the cumulative list sizes reach
    the budget (whole lists at a time, including the list that crosses
    the boundary, exactly the reference's post-check). Spark-first form:
    the reference enforces it inside the sequential scan loop; here the
    driver already plans probes per query, and per-list COUNTS are plan
    metadata (one cached aggregate), so the budget truncates the probe
    sets BEFORE the scan — the pruned plan never reads the partitions a
    sequential scan would have skipped, instead of reading and
    discarding. This is the SIFT1B "IMI2x12,PQ16 / max_codes=10000"
    serving knob (SURVEY §4 scan-budget row, benchs/README.md:122).

    The stats object reads Spark accumulators, so its counters are
    populated only after the returned DataFrame is materialized (count /
    collect / write) — the lazy-plan analogue of the reference's
    "stats filled during the call" contract."""
    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    spark = index.codes.sparkSession
    nlist = len(index.centroids)
    nprobe = min(nprobe, nlist)
    largest = index.metric in SIMILARITY_METRICS
    qids, Q = collect_queries_bounded(
        queries, qid_col, qvec_col, "search_with_parameters",
        d=index.centroids.shape[1],
    )
    CD = pairwise_distances(Q, index.centroids, index.metric)
    order = np.argsort(-CD if largest else CD, axis=1, kind="stable")
    probes = order[:, :nprobe]
    if max_codes is not None:
        sizes = _list_sizes(index)
        cum = np.cumsum(sizes[probes], axis=1)
        # keep list j iff the budget was not yet exhausted BEFORE it
        keep = np.concatenate(
            [np.ones((len(probes), 1), bool), cum[:, :-1] < max_codes], axis=1
        )
        probes = [probes[qi][keep[qi]] for qi in range(len(probes))]
    stats = IVFSearchStats(spark, nq=len(qids))
    res = _scan_probed_lists(
        index.codes, qids, Q, probes, k, index.metric, stats=stats
    )
    return res, stats


def _list_sizes(index) -> np.ndarray:
    """(nlist,) row counts of the codes table, cached on the index —
    plan metadata for the max_codes scan budget (one metadata-cheap
    aggregate over the partitioning column)."""
    cached = getattr(index, "_list_sizes_cache", None)
    if cached is not None and cached[0] is index.codes:
        return cached[1]
    nlist = getattr(index, "nlist", None) or len(index.centroids)
    sizes = np.zeros(nlist, np.int64)
    for r in index.codes.groupBy("list_no").count().collect():
        sizes[int(r["list_no"])] = int(r["count"])
    index._list_sizes_cache = (index.codes, sizes)
    return sizes


def _scan_probed_lists(
    codes: DataFrame,
    qids: np.ndarray,
    Q: np.ndarray,
    probes: np.ndarray,
    k: int,
    metric: str,
    stats: "IVFSearchStats | None" = None,
) -> DataFrame:
    """Stages B+C of the IVF search lifecycle, shared by every coarse
    quantizer (k-means IVFIndex, beam-search IVFRCQIndex): given the
    per-query probe lists, scan only those partitions and merge top-k."""
    spark = codes.sparkSession
    largest = metric in SIMILARITY_METRICS
    # invert: list_no -> local query indexes (the ivf_tools big-batch
    # regrouping, contrib/ivf_tools.py:26). probes may be ragged (a list
    # of per-query arrays) under the max_codes scan budget.
    if isinstance(probes, np.ndarray):
        flat = probes.ravel()
    elif len(probes):
        flat = np.concatenate([np.asarray(p) for p in probes])
    else:
        flat = np.empty(0, np.int64)
    probed_lists = sorted({int(c) for c in flat})
    list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
    for qi in range(len(qids)):
        for c in probes[qi]:
            list_to_q[int(c)].append(qi)
    bc = spark.sparkContext.broadcast(
        (qids, Q, {c: np.asarray(v, dtype=np.int64) for c, v in list_to_q.items()})
    )

    # stage B — partition-pruned scan: Catalyst turns the IN-filter on
    # the partitioning column into reading only nprobe'd directories
    pruned = codes.filter(F.col("list_no").isin(probed_lists))

    acc_scans = stats._acc_list_scans if stats is not None else None
    acc_ndis = stats._acc_ndis if stats is not None else None

    def scan(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_vec_groups

        qids_, Q_, l2q = bc.value
        acc: dict[int, TopKAccumulator] = {}
        touched: dict[int, np.ndarray] = {}
        for key, X, ids in arrow_vec_groups(batches):
            qsel = l2q.get(key)
            if qsel is None or len(qsel) == 0:
                continue
            if key not in acc:
                acc[key] = TopKAccumulator(len(qsel), k, metric in SIMILARITY_METRICS)
                # fused workspace scan path: per-list query block
                # bound once, distance tiles reused across batches
                acc[key].bind_queries(np.ascontiguousarray(Q_[qsel]), metric)
                touched[key] = qsel
                if acc_scans is not None:
                    acc_scans.add(len(qsel))
            if acc_ndis is not None:
                acc_ndis.add(int(len(qsel) * len(ids)))
            acc[key].push_block(X, ids)
        for key, a in acc.items():
            qidx, nid, nd = a.emit()
            qsel = touched[key]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids_[qsel[qidx]], pa.int64()),
                    pa.array(nid, pa.int64()),
                    pa.array(nd, pa.float64()),
                ],
                names=["qid", "id", "dist"],
            )

    candidates = pruned.select("list_no", "id", "vec").mapInArrow(
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


@dataclass
class IVFRCQIndex:
    """IVF whose coarse quantizer is an additive quantizer (reference
    ResidualCoarseQuantizer / LocalSearchCoarseQuantizer,
    faiss/IndexAdditiveQuantizer.h:161,193 — the `IVF65536(RQ…)` factory
    family): nlist = ksub^M virtual cells, assignment and probe selection
    by beam search over the M codebooks instead of an argmin over nlist
    materialized centroids.

    Why it matters at scale: a 100 TB corpus wants nlist ~ 2^16..2^20;
    training one k-means with k = nlist is the bottleneck the reference
    invented RCQ for. Here training is M small k-means, the centroid
    artifact is M·ksub·d floats (KBs, always broadcastable), and the add
    path is the same map-side Arrow batch as every other codec. The
    codes table layout, partition pruning, scan, and merge are IDENTICAL
    to IVFIndex — only stage A (probe selection) differs.

    L2 only, like the reference (AQ beam search minimizes squared L2).
    """

    cq: "ResidualCoarseQuantizerModel"
    metric: str = "l2"
    path: str | None = None
    codes: DataFrame | None = None

    @staticmethod
    def train(
        vectors: DataFrame,
        M: int = 2,
        nbits: int = 4,
        beam_factor: float = 4.0,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 15,
        lsq: bool = False,
    ) -> "IVFRCQIndex":
        from faiss_spark.operators.codecs import (
            LSCoarseQuantizer,
            ResidualCoarseQuantizer,
        )

        est = (LSCoarseQuantizer if lsq else ResidualCoarseQuantizer)(
            M=M, nbits=nbits, beam_factor=beam_factor, niter=niter, seed=seed
        )
        return IVFRCQIndex(cq=est.fit(vectors, vec_col=vec_col))

    @property
    def nlist(self) -> int:
        return self.cq.nlist

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFRCQIndex":
        """Beam-search assignment (distributed, no shuffle) + the same
        list_no-partitioned layout as IVFIndex.add. Empty virtual cells
        simply have no partition directory — exactly how faiss's RCQ IVF
        leaves most of its 2^16 invlists empty."""
        assigned = self.cq.assign(vectors, vec_col=vec_col, id_col=id_col).select(
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
            codes.repartition("list_no").write.mode("overwrite").partitionBy("list_no").parquet(path)
            spark = vectors.sparkSession
            fsio.write_npy(spark, os.path.join(path, "_rcq_codebooks.npy"), self.cq.codebooks)
            fsio.write_json(spark, os.path.join(path, "_rcq_meta.json"), {
                        "metric": self.metric,
                        "beam_factor": self.cq.beam_factor,
                        "nlist": self.nlist,
                    })
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def save(self, path: str) -> "IVFRCQIndex":
        """write_index for an already-built RCQ-coarse index."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        fsio.write_npy(spark, os.path.join(path, "_rcq_codebooks.npy"), self.cq.codebooks)
        fsio.write_json(spark, os.path.join(path, "_rcq_meta.json"), {
                    "metric": self.metric,
                    "beam_factor": self.cq.beam_factor,
                    "nlist": self.nlist,
                })
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFRCQIndex":
        from faiss_spark.operators.codecs import ResidualCoarseQuantizerModel

        meta = fsio.read_json(spark, os.path.join(path, "_rcq_meta.json"))
        return IVFRCQIndex(
            cq=ResidualCoarseQuantizerModel(
                codebooks=fsio.read_npy(spark, os.path.join(path, "_rcq_codebooks.npy")),
                beam_factor=meta["beam_factor"],
            ),
            metric=meta["metric"],
            path=path,
            codes=spark.read.parquet(path),
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """Stage A = ResidualCoarseQuantizer::search (beam of
        beam_factor·nprobe, keep the nprobe best cells per query);
        stages B+C shared with IVFIndex. A query side past the driver
        bound auto-falls-back to the distributed cogroup twin with the
        SAME beam assignment running executor-side."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        nprobe = min(nprobe, self.nlist)
        np_ = nprobe
        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFRCQIndex.search",
            d=self.cq.codebooks.shape[2],
            fallback=lambda: search_preassigned(
                self, queries, k, nprobe=np_,
                qid_col=qid_col, qvec_col=qvec_col,
                assign_payload=self.cq,
                assign_fn=lambda cq, Q: cq.search_np(Q, np_)[0],
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        probes, _ = self.cq.search_np(Q, nprobe)
        return _scan_probed_lists(self.codes, qids, Q, probes, k, self.metric)


@dataclass
class NestedCoarseRouter:
    """Coarse assignment through an arbitrary parenthesized SUB-INDEX
    over the centroids (reference index_factory.cpp:241-289: the factory
    builds `IVF<n>(<sub-description>)` with the sub-index as quantizer —
    e.g. `IVF1000(PQ16)` assigns via ADC over PQ-coded centroids, nested
    `IVF1000(IVF32,Flat)` routes through a two-level tree).

    The centroid table is driver-sized (nlist × d floats), so the
    sub-index here is its trained artifacts plus a vectorized assign
    over a broadcast copy — the Spark plan (partition-pruned list scan)
    is untouched; only stage A (probe selection) and the add-side
    assignment change, exactly the split the graph-routed `IVF<n>_NSG`
    family already uses.

    kinds:
      flat — exact argmin (``IVF<n>(Flat)`` ≡ plain ``IVF<n>``)
      pq   — ADC over PQ codes of the centroids (``IVF<n>(PQ<M>[x<b>])``)
      ivf  — two-level routing (``IVF<n>(IVF<m>,Flat)``): an inner
             k-means over the centroids; probes come from ranking the
             nearest inner cells' member centroids, nearest-cell-first,
             until nprobe are ranked. At nprobe = nlist every member is
             ranked exactly, so full probe == exact (the ★oracle hook).
    """

    kind: str  # "flat" | "pq" | "ivf"
    nlist: int
    d: int
    # raw (nlist, d) f64 table — None for kind="pq": ADC assignment reads
    # only the books + codes, and the reference's IVF<n>(PQ<M>) exists
    # precisely so the quantizer ships compressed — broadcasting the raw
    # table alongside would be a silent multi-GB executor copy at the
    # billion-scale nlist the grammar targets
    centroids: np.ndarray | None = None
    pq_books: np.ndarray | None = None  # (M, ksub, dsub)
    cent_codes: np.ndarray | None = None  # (nlist, M) int64
    inner_centroids: np.ndarray | None = None  # (k2, d)
    cent_cell: np.ndarray | None = None  # (nlist,) inner cell per centroid
    # kind == "lsh" (`IVF<n>(LSH[r][t])`, reference index_factory.cpp
    # sub-index parse → IndexLSH quantizer): cells ranked by Hamming
    # between sign codes of rotated projections
    lsh_proj: np.ndarray | None = None  # (d, nbits) or None (identity)
    lsh_thr: np.ndarray | None = None  # (nbits,) thresholds
    cent_bits: np.ndarray | None = None  # (nlist, nbits) bool

    @staticmethod
    def build(
        sub: tuple, centroids: np.ndarray, seed: int = 1234
    ) -> "NestedCoarseRouter":
        from faiss_spark.operators.codecs import _kmeans_np

        C = np.ascontiguousarray(centroids, np.float64)
        nlist, d = C.shape
        kind = sub[0]
        if kind == "flat":
            return NestedCoarseRouter(kind="flat", nlist=nlist, d=d, centroids=C)
        if kind == "pq":
            _, M, nbits = sub
            if d % M:
                raise ValueError(f"d={d} not divisible by sub-index PQ M={M}")
            dsub = d // M
            ksub = min(1 << nbits, len(C))
            books = np.empty((M, ksub, dsub), np.float64)
            codes = np.empty((len(C), M), np.int64)
            for m in range(M):
                books[m], codes[:, m] = _kmeans_np(
                    C[:, m * dsub : (m + 1) * dsub], ksub, 15, seed + m
                )
            # the raw centroid table is deliberately NOT retained (see
            # field comment): assignment is pure ADC over books + codes
            return NestedCoarseRouter(
                kind="pq", nlist=nlist, d=d, pq_books=books, cent_codes=codes
            )
        if kind == "ivf":
            _, k2 = sub
            inner, labels = _kmeans_np(C, min(int(k2), len(C)), 15, seed)
            return NestedCoarseRouter(
                kind="ivf", nlist=nlist, d=d, centroids=C,
                inner_centroids=inner, cent_cell=labels,
            )
        if kind == "lsh":
            # IndexLSH quantizer over the centroids (reference
            # index_factory.cpp:528-532 semantics at the sub-index
            # position): nbits = d sign bits; 'r' = seeded random
            # rotation, 't' = thresholds trained on the data the index
            # ranks (the centroids) — reference train_thresholds uses
            # the per-component mean
            _, rotate, train_thr = sub
            rng = np.random.default_rng(seed)
            proj = None
            Cp = C
            if rotate:
                A = rng.standard_normal((d, d))
                qmat, _ = np.linalg.qr(A)
                proj = qmat
                Cp = C @ proj
            thr = Cp.mean(0) if train_thr else np.zeros(d)
            # like the PQ kind, the raw table is not retained: ranking
            # is pure Hamming over the sign codes
            return NestedCoarseRouter(
                kind="lsh", nlist=nlist, d=d,
                lsh_proj=proj, lsh_thr=thr, cent_bits=(Cp > thr),
            )
        raise ValueError(f"unknown nested coarse kind {kind!r}")

    def assign_np(self, Q: np.ndarray, nprobe: int) -> np.ndarray:
        """(nq, nprobe) probe cells, the sub-index's own ranking."""
        Q = np.ascontiguousarray(Q, np.float64)
        nprobe = min(nprobe, self.nlist)
        if self.kind == "flat":
            D = pairwise_distances(Q, self.centroids, "l2")
            return np.argsort(D, axis=1, kind="stable")[:, :nprobe]
        if self.kind == "pq":
            books, codes = self.pq_books, self.cent_codes
            M, ksub, dsub = books.shape
            Qs = Q.reshape(len(Q), M, dsub)
            # per-query ADC LUTs over the centroid codes — the reference's
            # quantizer->search with an IndexPQ quantizer
            luts = (
                (Qs * Qs).sum(2)[:, :, None]
                + (books * books).sum(2)[None, :, :]
                - 2.0 * np.einsum("qmd,mkd->qmk", Qs, books)
            )
            D = np.zeros((len(Q), len(codes)), np.float64)
            for m in range(M):
                D += luts[:, m, codes[:, m]]
            return np.argsort(D, axis=1, kind="stable")[:, :nprobe]
        if self.kind == "lsh":
            Qp = Q @ self.lsh_proj if self.lsh_proj is not None else Q
            qb = Qp > self.lsh_thr
            # Hamming between query sign codes and centroid sign codes;
            # stable sort tie-breaks equal-radius cells by cell id
            D = (qb[:, None, :] != self.cent_bits[None, :, :]).sum(2)
            return np.argsort(D, axis=1, kind="stable")[:, :nprobe]
        # kind == "ivf": rank member centroids of the nearest inner
        # cells, nearest-cell-first, until nprobe are ranked exactly
        Din = pairwise_distances(Q, self.inner_centroids, "l2")
        inner_order = np.argsort(Din, axis=1, kind="stable")
        members = [
            np.flatnonzero(self.cent_cell == c)
            for c in range(len(self.inner_centroids))
        ]
        out = np.empty((len(Q), nprobe), np.int64)
        for qi in range(len(Q)):
            cand, tot = [], 0
            for c in inner_order[qi]:
                if len(members[c]) == 0:
                    continue
                cand.append(members[c])
                tot += len(members[c])
                if tot >= nprobe:
                    break
            cc = np.concatenate(cand)
            d = ((Q[qi][None, :] - self.centroids[cc]) ** 2).sum(1)
            out[qi] = cc[np.argsort(d, kind="stable")[:nprobe]]
        return out

    _ARRAY_FIELDS = (
        "centroids", "pq_books", "cent_codes", "inner_centroids",
        "cent_cell", "lsh_proj", "lsh_thr", "cent_bits",
    )

    def state(self) -> tuple[dict, dict]:
        """(arrays, meta) for write_index — npy/json artifacts only."""
        arrays = {
            f: getattr(self, f)
            for f in self._ARRAY_FIELDS
            if getattr(self, f) is not None
        }
        meta = {
            "router": "enum",
            "kind": self.kind,
            "nlist": self.nlist,
            "d": self.d,
            "arrays": sorted(arrays),
        }
        return arrays, meta

    @staticmethod
    def from_state(meta: dict, arrays: dict) -> "NestedCoarseRouter":
        return NestedCoarseRouter(
            kind=meta["kind"], nlist=meta["nlist"], d=meta["d"], **arrays
        )


@dataclass
class CompositeCoarseRouter:
    """Recursive nested coarse quantizer (reference index_factory.cpp
    parse_coarse_quantizer at :228,841 accepts ANY factory description;
    its own tests build ``IVF1000(IVF20,SQ4,Refine(SQ8)),Flat`` —
    tests/test_factory.py:154). The sub-grammar here recurses one level:
    ``[IVF<m>,]<codec>[,Refine(<codec>)|,RFlat]`` with codec ∈ {Flat,
    SQ4/6/8/fp16, PQ<M>[x<b>], LSH[r][t]} — deeper nesting refuses
    loudly at parse (depth > 2 would mis-build silently otherwise).

    Assignment mirrors the reference quantizer-with-refine search: an
    optional inner k-means gathers member centroids nearest-inner-cell-
    first until k_base = nprobe·k_factor candidates exist, the codec
    ranks them on DECODED reconstructions, and the refine codec (or the
    raw table for RFlat) re-ranks the survivors down to nprobe. At
    nprobe = nlist every stage saturates, so the probe set is total and
    full-probe search stays exact (the ★rcq_ivf_search property).

    Scale shape: the broadcast artifact is the CODED centroid table
    (SQ/PQ/LSH codes) plus tiny codebooks — the raw (nlist, d) table
    ships only when a stage genuinely needs it (Flat codec / RFlat)."""

    nlist: int
    d: int
    k_factor: int = 4
    # inner IVF level (None = scan all centroids)
    inner_centroids: np.ndarray | None = None
    cent_cell: np.ndarray | None = None
    # codec stage over the centroid table
    codec_kind: str = "flat"  # flat | sq | pq | lsh
    centroids: np.ndarray | None = None  # raw table (flat codec / RFlat only)
    sq_model: object | None = None
    sq_codes: np.ndarray | None = None  # (nlist, code_bytes) uint8
    pq_books: np.ndarray | None = None
    pq_codes: np.ndarray | None = None
    lsh_proj: np.ndarray | None = None
    lsh_thr: np.ndarray | None = None
    cent_bits: np.ndarray | None = None
    # refine stage: None | "flat" | "sq" | "pq"
    refine_kind: str | None = None
    ref_sq_model: object | None = None
    ref_sq_codes: np.ndarray | None = None
    ref_pq_books: np.ndarray | None = None
    ref_pq_codes: np.ndarray | None = None

    @staticmethod
    def _fit_codec(kind: tuple, C: np.ndarray, seed: int) -> dict:
        """Train one codec stage on the centroid table → field dict."""
        from faiss_spark.operators.codecs import (
            ScalarQuantizerModel,
            _kmeans_np,
        )

        if kind[0] == "flat":
            return {"centroids": C}
        if kind[0] == "sq":
            vmin = C.min(0)
            vdiff = C.max(0) - vmin
            m = ScalarQuantizerModel(vmin=vmin, vdiff=vdiff, bits=kind[1])
            return {"model": m, "codes": m.encode_np(C)}
        if kind[0] == "pq":
            _, M, nbits = kind
            if C.shape[1] % M:
                raise ValueError(
                    f"d={C.shape[1]} not divisible by sub-index PQ M={M}"
                )
            dsub = C.shape[1] // M
            ksub = min(1 << nbits, len(C))
            books = np.empty((M, ksub, dsub), np.float64)
            codes = np.empty((len(C), M), np.int64)
            for m_ in range(M):
                books[m_], codes[:, m_] = _kmeans_np(
                    C[:, m_ * dsub : (m_ + 1) * dsub], ksub, 15, seed + m_
                )
            return {"books": books, "codes": codes}
        raise ValueError(f"unknown composite codec {kind!r}")

    @staticmethod
    def build(
        spec: dict, centroids: np.ndarray, seed: int = 1234
    ) -> "CompositeCoarseRouter":
        from faiss_spark.operators.codecs import _kmeans_np

        C = np.ascontiguousarray(centroids, np.float64)
        nlist, d = C.shape
        r = CompositeCoarseRouter(nlist=nlist, d=d)
        if spec.get("inner_k"):
            inner, labels = _kmeans_np(
                C, min(int(spec["inner_k"]), nlist), 15, seed
            )
            r.inner_centroids, r.cent_cell = inner, labels
        codec = spec["codec"]
        r.codec_kind = codec[0]
        if codec[0] == "lsh":
            _, rotate, train_thr = codec
            rng = np.random.default_rng(seed)
            Cp = C
            if rotate:
                qmat, _ = np.linalg.qr(rng.standard_normal((d, d)))
                r.lsh_proj = qmat
                Cp = C @ qmat
            r.lsh_thr = Cp.mean(0) if train_thr else np.zeros(d)
            r.cent_bits = Cp > r.lsh_thr
        else:
            f = CompositeCoarseRouter._fit_codec(codec, C, seed)
            if codec[0] == "flat":
                r.centroids = C
            elif codec[0] == "sq":
                r.sq_model, r.sq_codes = f["model"], f["codes"]
            else:
                r.pq_books, r.pq_codes = f["books"], f["codes"]
        ref = spec.get("refine")
        if ref is not None:
            r.refine_kind = ref[0]
            if ref[0] == "flat":
                r.centroids = C  # RFlat re-ranks against the raw table
            else:
                f = CompositeCoarseRouter._fit_codec(ref, C, seed + 101)
                if ref[0] == "sq":
                    r.ref_sq_model, r.ref_sq_codes = f["model"], f["codes"]
                else:
                    r.ref_pq_books, r.ref_pq_codes = f["books"], f["codes"]
        return r

    @staticmethod
    def _adc_dists(q: np.ndarray, cand: np.ndarray, books: np.ndarray,
                   codes: np.ndarray) -> np.ndarray:
        """One query's ADC distances to the coded candidates — the
        single shared copy of the per-subspace LUT math (both stages and
        a future op-order fix stay in sync)."""
        M, ksub, dsub = books.shape
        qs = q.reshape(M, dsub)
        lut = (
            (qs * qs).sum(1)[:, None]
            + (books * books).sum(2)
            - 2.0 * np.einsum("md,mkd->mk", qs, books)
        )
        sub = codes[cand]
        return sum(lut[m, sub[:, m]] for m in range(M))

    # decode the query-independent coded tables at most once per
    # assign_np CALL (they were re-decoded per query row); cap the
    # hoist so a 2^20-cell router never materializes a raw-table-sized
    # decode inside an executor task — above the cap the per-candidate
    # subset decode is the scale-safe path
    _DECODE_HOIST_ELEMS = 1 << 22  # ≈ 32 MB f64

    def _hoisted(self) -> dict:
        out = {}
        if self.nlist * self.d <= self._DECODE_HOIST_ELEMS:
            if self.codec_kind == "sq":
                out["sq"] = self.sq_model.decode_np(self.sq_codes)
            if self.refine_kind == "sq":
                out["ref_sq"] = self.ref_sq_model.decode_np(self.ref_sq_codes)
        return out

    def _codec_dists(self, q: np.ndarray, cand: np.ndarray,
                     hoist: dict | None = None) -> np.ndarray:
        """Squared L2 (or Hamming for LSH) of one query against the
        DECODED candidate centroids — the base stage's ranking."""
        if self.codec_kind == "flat":
            return ((self.centroids[cand] - q) ** 2).sum(1)
        if self.codec_kind == "sq":
            dec = (hoist or {}).get("sq")
            X = (
                dec[cand]
                if dec is not None
                else self.sq_model.decode_np(self.sq_codes[cand])
            )
            return ((X - q) ** 2).sum(1)
        if self.codec_kind == "pq":
            return self._adc_dists(q, cand, self.pq_books, self.pq_codes)
        # lsh
        qp = q @ self.lsh_proj if self.lsh_proj is not None else q
        qb = qp > self.lsh_thr
        return (qb[None, :] != self.cent_bits[cand]).sum(1).astype(np.float64)

    def _refine_dists(self, q: np.ndarray, cand: np.ndarray,
                      hoist: dict | None = None) -> np.ndarray:
        if self.refine_kind == "flat":
            return ((self.centroids[cand] - q) ** 2).sum(1)
        if self.refine_kind == "sq":
            dec = (hoist or {}).get("ref_sq")
            X = (
                dec[cand]
                if dec is not None
                else self.ref_sq_model.decode_np(self.ref_sq_codes[cand])
            )
            return ((X - q) ** 2).sum(1)
        return self._adc_dists(q, cand, self.ref_pq_books, self.ref_pq_codes)

    def assign_np(self, Q: np.ndarray, nprobe: int) -> np.ndarray:
        """(nq, nprobe) probe cells under the composite ranking."""
        Q = np.ascontiguousarray(Q, np.float64)
        nprobe = min(nprobe, self.nlist)
        hoist = self._hoisted()
        k_base = (
            min(self.nlist, nprobe * self.k_factor)
            if self.refine_kind is not None
            else nprobe
        )
        if self.inner_centroids is not None:
            inner_order = np.argsort(
                pairwise_distances(Q, self.inner_centroids, "l2"),
                axis=1, kind="stable",
            )
            members = [
                np.flatnonzero(self.cent_cell == c)
                for c in range(len(self.inner_centroids))
            ]
        out = np.empty((len(Q), nprobe), np.int64)
        all_cells = np.arange(self.nlist)
        for qi in range(len(Q)):
            if self.inner_centroids is None:
                cand = all_cells
            else:
                pools, tot = [], 0
                for c in inner_order[qi]:
                    if len(members[c]) == 0:
                        continue
                    pools.append(members[c])
                    tot += len(members[c])
                    if tot >= k_base:
                        break
                cand = np.concatenate(pools)
            d_base = self._codec_dists(Q[qi], cand, hoist)
            order = np.argsort(d_base, kind="stable")
            if self.refine_kind is not None:
                top = cand[order[: min(k_base, len(cand))]]
                d_ref = self._refine_dists(Q[qi], top, hoist)
                out[qi] = top[np.argsort(d_ref, kind="stable")[:nprobe]]
            else:
                out[qi] = cand[order[:nprobe]]
        return out

    _ARRAY_FIELDS = (
        "inner_centroids", "cent_cell", "centroids", "sq_codes",
        "pq_books", "pq_codes", "lsh_proj", "lsh_thr", "cent_bits",
        "ref_sq_codes", "ref_pq_books", "ref_pq_codes",
    )

    def state(self) -> tuple[dict, dict]:
        """(arrays, meta) for write_index — npy/json artifacts only,
        like every other family (no pickles)."""
        arrays = {
            f: getattr(self, f)
            for f in self._ARRAY_FIELDS
            if getattr(self, f) is not None
        }
        meta = {
            "router": "composite",
            "nlist": self.nlist,
            "d": self.d,
            "k_factor": self.k_factor,
            "codec_kind": self.codec_kind,
            "refine_kind": self.refine_kind,
        }
        for name, m in (("sq", self.sq_model), ("ref_sq", self.ref_sq_model)):
            if m is not None:
                arrays[f"{name}_vmin"] = np.asarray(m.vmin)
                arrays[f"{name}_vdiff"] = np.asarray(m.vdiff)
                meta[f"{name}_bits"] = int(m.bits)
        meta["arrays"] = sorted(arrays)
        return arrays, meta

    @staticmethod
    def from_state(meta: dict, arrays: dict) -> "CompositeCoarseRouter":
        from faiss_spark.operators.codecs import ScalarQuantizerModel

        kw = {
            f: arrays[f]
            for f in CompositeCoarseRouter._ARRAY_FIELDS
            if f in arrays
        }
        for name, field in (("sq", "sq_model"), ("ref_sq", "ref_sq_model")):
            if f"{name}_bits" in meta:
                kw[field] = ScalarQuantizerModel(
                    vmin=arrays[f"{name}_vmin"],
                    vdiff=arrays[f"{name}_vdiff"],
                    bits=meta[f"{name}_bits"],
                )
        return CompositeCoarseRouter(
            nlist=meta["nlist"], d=meta["d"], k_factor=meta["k_factor"],
            codec_kind=meta["codec_kind"], refine_kind=meta["refine_kind"],
            **kw,
        )


@dataclass
class IVFNestedIndex:
    """IVF whose coarse quantizer is an arbitrary parenthesized
    sub-index (reference index_factory.cpp:241-289 — the generic
    `IVF<n>(<any sub-index>)` grammar the RCQ/LSQ special case belongs
    to). Flat codes; the codes-table layout, partition pruning, scan and
    merge are IDENTICAL to IVFIndex — stage A (probe selection) and the
    add-side assignment route through the sub-index instead of an exact
    argmin. L2 only (the quantizer contract minimizes squared L2).

    Why it matters at scale: with nlist ~ 2^20, exact assignment costs
    nq·nlist·d per batch; a PQ sub-index drops that to nq·M·ksub·(dsub +
    nlist/ksub-ish adds) and a nested IVF to nq·(k2 + nlist/k2)·d — the
    same reason the reference quantizes its quantizer at billion scale."""

    router: object  # NestedCoarseRouter | CompositeCoarseRouter
    metric: str = "l2"
    codes: DataFrame | None = None
    path: str | None = None

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        sub: tuple = ("flat",),
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 20,
    ) -> "IVFNestedIndex":
        """Coarse k-means (train_q1), then train the sub-index ON the
        centroids (the reference trains the parenthesized quantizer on
        the same data the centroids came from; here the centroids ARE
        its corpus, which is what it must rank)."""
        km = KMeans(k=nlist, niter=niter, seed=seed).fit(vectors, vec_col=vec_col)
        if sub[0] == "composite":
            # recursive sub-grammar (reference parse_coarse_quantizer)
            router = CompositeCoarseRouter.build(sub[1], km.centroids, seed=seed)
        else:
            router = NestedCoarseRouter.build(sub, km.centroids, seed=seed)
        return IVFNestedIndex(router=router)

    @property
    def nlist(self) -> int:
        return self.router.nlist

    @property
    def centroids(self) -> np.ndarray | None:
        """Raw coarse table; None for the PQ-routed variant (the router
        keeps only the compressed form — see NestedCoarseRouter)."""
        return self.router.centroids

    def add(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> "IVFNestedIndex":
        """Sub-index top-1 assignment, map-only (broadcast router, Arrow
        zero-copy in, original vec column passed through)."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(self.router)

        def do(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            r = bc.value
            f32_list = pa.list_(pa.float32())
            for ids, X, vec_arr in arrow_id_vec_blocks(batches):
                lists = r.assign_np(X, 1)[:, 0]
                if vec_arr.type != f32_list:
                    vec_arr = vec_arr.cast(f32_list)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(lists.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        vec_arr,
                    ],
                    names=["list_no", "id", "vec"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        self.codes = src.mapInArrow(
            do, schema="list_no int, id bigint, vec array<float>"
        )
        return self

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """Stage A = sub-index ranking; stages B+C shared with IVFIndex.
        A query side past the driver bound auto-falls-back to the
        distributed cogroup twin with the SAME router assignment
        running executor-side (the router state broadcasts whole — it
        is the compressed form the grammar exists for)."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        nprobe = min(nprobe, self.nlist)
        np_ = nprobe
        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFNestedIndex.search",
            d=self.router.d,
            fallback=lambda: search_preassigned(
                self, queries, k, nprobe=np_,
                qid_col=qid_col, qvec_col=qvec_col,
                assign_payload=self.router,
                assign_fn=lambda r, Q: r.assign_np(Q, np_),
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        probes = self.router.assign_np(Q, nprobe)
        return _scan_probed_lists(self.codes, qids, Q, probes, k, self.metric)

    def save(self, path: str) -> "IVFNestedIndex":
        """write_index: partitioned codes + the router's npy/json state
        (both router kinds — the enum NestedCoarseRouter and the
        recursive CompositeCoarseRouter serialize the same way)."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        arrays, meta = self.router.state()
        for name, arr in arrays.items():
            fsio.write_npy(
                spark, os.path.join(path, f"_nested_{name}.npy"),
                np.asarray(arr),
            )
        meta["metric"] = self.metric
        fsio.write_json(spark, os.path.join(path, "_nested_meta.json"), meta)
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFNestedIndex":
        meta = fsio.read_json(spark, os.path.join(path, "_nested_meta.json"))
        arrays = {
            name: fsio.read_npy(
                spark, os.path.join(path, f"_nested_{name}.npy")
            )
            for name in meta["arrays"]
        }
        cls = (
            CompositeCoarseRouter
            if meta["router"] == "composite"
            else NestedCoarseRouter
        )
        return IVFNestedIndex(
            router=cls.from_state(meta, arrays),
            metric=meta["metric"],
            codes=spark.read.parquet(path),
            path=path,
        )


@dataclass
class IVFPQIndex:
    """IVF + PQ-on-residuals — the reference's flagship composite
    (IndexIVFPQ, faiss/IndexIVFPQ.h:34-49; search lifecycle SURVEY §3.2).

    Layout: partitioned codes table (list_no, id, code BINARY) — the PQ
    code of the RESIDUAL x − centroid[list_no] (by_residual=true default,
    faiss/IndexIVFPQ.h:38). Artifacts: coarse centroids + PQ codebooks,
    both broadcast at search time.

    Search stage B builds one ADC lookup table per (query, probed list):
    LUT[m][j] = ‖(q − c_list)_m − codebook[m][j]‖² — computed vectorized
    for all probes of a partition at once, then gather-sum over codes
    (the scan_codes of faiss/IndexIVFPQ.cpp, numpy instead of SIMD).
    """

    centroids: np.ndarray  # (nlist, d)
    pq: ProductQuantizerModel
    codes: DataFrame | None = None
    path: str | None = None
    # lazy cache of the precomputed ADC term (see _precomputed_tables)
    _pct: np.ndarray | None = None
    _pct_key: tuple | None = None
    # reference gate (faiss/IndexIVFPQ.cpp precomputed_table_max_bytes,
    # default 2 GiB): above this, the full (nlist, M, ksub) table is
    # neither cached nor built — only the probed lists' rows are
    precomputed_table_max_bytes: int = 2 << 30

    def _precomputed_tables(self, probed_lists) -> dict[int, np.ndarray]:
        """THE standard IVFPQ optimization (reference
        faiss/IndexIVFPQ.h:49-141 use_precomputed_table /
        precompute_table): decompose the per-(query, list) ADC LUT

            ‖(q − c_l)_m − d_mk‖² = ‖q − c_l‖²·[per-query coarse dist]
                + (‖d_mk‖² + 2⟨c_lm, d_mk⟩)   [query-INDEPENDENT → this]
                − 2⟨q_m, d_mk⟩                [per-query, list-free]

        so search builds each (query, list) LUT with M·ksub adds instead
        of an M·ksub·dsub GEMM. Returns ONLY the probed lists' rows as a
        {list_no: (M, ksub)} dict — at billion-scale nlist the full table
        is multi-GB, and broadcasting it for an nprobe-lists search is
        the driver-allocation failure the reference's
        precomputed_table_max_bytes gate exists for: below the gate the
        full table is computed once and cached across searches; above
        it, rows are computed per-search for the probed lists only (the
        lazy per-list shape IMIPQIndex always uses). f64 to keep
        distances bit-comparable with the direct expansion up to
        summation order."""
        books = self.pq.codebooks
        M, ksub, dsub = books.shape
        probed = np.asarray(sorted(probed_lists), np.int64)
        full_bytes = len(self.centroids) * M * ksub * 8
        if full_bytes <= self.precomputed_table_max_bytes:
            # content digest, not a value-sum fingerprint: polysemous
            # reorder PERMUTES codebook rows, and a float sum of the same
            # values collides bit-exactly — the digest can't
            key = (books.shape, hash(books.tobytes()))
            if self._pct is None or self._pct_key != key:
                Cs = self.centroids.reshape(len(self.centroids), M, dsub)
                self._pct = (books * books).sum(2)[None, :, :] + 2.0 * np.einsum(
                    "lmd,mkd->lmk", Cs, books
                )
                self._pct_key = key
            sub = self._pct[probed]
        else:
            Cs = self.centroids[probed].reshape(len(probed), M, dsub)
            sub = (books * books).sum(2)[None, :, :] + 2.0 * np.einsum(
                "lmd,mkd->lmk", Cs, books
            )
        return {int(l): sub[i] for i, l in enumerate(probed)}

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        M: int = 8,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 20,
        pq_niter: int = 15,
        nbits: int = 8,
    ) -> "IVFPQIndex":
        """train_q1 (coarse k-means) then PQ on residuals of the training
        sample (reference IndexIVF::train + train_residual,
        faiss/IndexIVF.h:189)."""
        km = KMeans(k=nlist, niter=niter, seed=seed).fit(vectors, vec_col=vec_col)
        C = km.centroids
        # residuals of a seeded sample for PQ training
        from faiss_spark.operators.codecs import _sampled_matrix

        X = _sampled_matrix(vectors, vec_col, 65536, seed)
        d2 = (
            (X * X).sum(1)[:, None]
            + (C * C).sum(1)[None, :]
            - 2.0 * (X @ C.T)
        )
        resid = X - C[d2.argmin(1)]
        # train PQ codebooks on the residual sample (driver-side numpy)
        from faiss_spark.operators.codecs import _kmeans_np

        d = X.shape[1]
        if d % M:
            raise ValueError(f"d={d} not divisible by M={M}")
        dsub = d // M
        ksub = min(1 << nbits, len(resid))
        books = np.empty((M, ksub, dsub), np.float64)
        for m in range(M):
            books[m], _ = _kmeans_np(
                resid[:, m * dsub : (m + 1) * dsub], ksub, pq_niter, seed + m
            )
        return IVFPQIndex(centroids=C, pq=ProductQuantizerModel(codebooks=books))

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFPQIndex":
        """Encode: assign list, PQ-encode the residual, write partitioned
        (reference IndexIVFPQ::encode_vectors)."""
        spark = vectors.sparkSession
        codes = self._encode_df(vectors, id_col=id_col, vec_col=vec_col)
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy("list_no").parquet(path)
            self._save_artifact(spark, path)
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def _encode_df(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> DataFrame:
        """Frozen-artifact encode to (list_no, id, code) rows — map-only
        (Arrow-native input: zero-copy GEMM tiles, no per-row objects),
        shared by add() and the streaming incremental writer."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast((self.centroids, self.pq.codebooks))

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            C, books = bc.value
            pqm = ProductQuantizerModel(codebooks=books)
            cn = (C * C).sum(1)
            for ids, X, _ in arrow_id_vec_blocks(batches):
                d2 = (X * X).sum(1)[:, None] + cn[None, :] - 2.0 * (X @ C.T)
                lists = d2.argmin(1)
                codes = pqm.encode_np(X - C[lists])
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(lists.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(list(map(bytes, codes)), pa.binary()),
                    ],
                    names=["list_no", "id", "code"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        return src.mapInArrow(enc, schema="list_no int, id bigint, code binary")

    def _save_artifact(self, spark, path: str) -> None:
        fsio.write_npy(spark, os.path.join(path, "_ivfpq_centroids.npy"), self.centroids)
        fsio.write_npy(spark, os.path.join(path, "_ivfpq_codebooks.npy"), self.pq.codebooks)
        fsio.write_json(spark, os.path.join(path, "_ivfpq_meta.json"), {
                    "nlist": int(len(self.centroids)),
                    "d": int(self.centroids.shape[1]),
                    "M": int(self.pq.M),
                    "ksub": int(self.pq.ksub),
                })

    def save(self, path: str) -> "IVFPQIndex":
        """write_index (reference faiss/index_io.h:38): partitioned codes
        table + centroid/codebook artifacts — the train-once /
        search-many deployment shape."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        self._save_artifact(spark, path)
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    def save_bucketed(self, path: str, nbuckets: int | None = None) -> "IVFPQIndex":
        """write_index into the CLUSTERED BY (list_no) layout (see
        IVFIndex.save_bucketed) — repeated ``pq_search_preassigned``
        cogroups become scan-only on the codes side."""
        return _write_bucketed_codes(
            self, path, ("list_no", "id", "code"), "ivfpq_codes_", nbuckets
        )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFPQIndex":
        return IVFPQIndex(
            centroids=fsio.read_npy(spark, os.path.join(path, "_ivfpq_centroids.npy")),
            pq=ProductQuantizerModel(
                codebooks=fsio.read_npy(spark, os.path.join(path, "_ivfpq_codebooks.npy"))
            ),
            codes=_attach_codes_table(spark, path),
            path=path,
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
        polysemous_ht: int | None = None,
    ) -> DataFrame:
        """ADC search over the probed partitions (SURVEY §3.2 stage B).

        polysemous_ht: with polysemous-trained codebooks (reorder via
        codecs.PolysemousTraining().optimize_pq(idx.pq) BEFORE add), skip
        candidates whose code Hamming distance to the query's
        per-list RESIDUAL code exceeds ht — the in-IVF-list Hamming
        pre-filter of reference faiss/IndexIVFPQ.h:44 polysemous_ht /
        IndexIVFPQ.cpp QueryTables (the query is re-encoded against each
        probed list's centroid, exactly as the reference's per-list
        q_code). ht > M·8 keeps everything (strict hd < ht as the
        reference's IndexIVFPQ.cpp, so ht = M·8 can drop an all-bits-flipped
        candidate);
        tighter ht trades recall for scan-cost at 100 TB."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        nlist = len(self.centroids)
        nprobe = min(nprobe, nlist)

        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFPQIndex.search",
            d=self.centroids.shape[1],
            fallback=lambda: pq_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
                polysemous_ht=polysemous_ht,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        CD = pairwise_distances(Q, self.centroids, "l2")
        probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe]
        probed_lists = sorted({int(c) for c in probes.ravel()})
        list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(len(qids)):
            for c in probes[qi]:
                list_to_q[int(c)].append(qi)
        bc = spark.sparkContext.broadcast(
            (
                qids,
                Q,
                self.centroids,
                self.pq.codebooks,
                {c: np.asarray(v, np.int64) for c, v in list_to_q.items()},
                # probed rows only: the broadcast scales with nprobe-ish
                # coverage, never with nlist (ADVICE r9 — a billion-scale
                # nlist must not cost a multi-GB broadcast per search)
                self._precomputed_tables(probed_lists),
            )
        )
        k_ = k
        ht = polysemous_ht
        pruned = self.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_code_groups

            qids_, Q_, C, books, l2q, pct = bc.value
            M, ksub, dsub = books.shape
            pqm_ = ProductQuantizerModel(codebooks=books) if ht is not None else None
            pop8 = (
                np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)
                .sum(1)
                .astype(np.int64)
            )
            # term3 = −2⟨q_m, d_mk⟩: per QUERY, list-independent — built
            # lazily once per task for the queries this task touches
            # (np.empty pages are only materialized for rows written)
            t3 = np.empty((len(Q_), M, ksub), np.float64)
            have_t3 = np.zeros(len(Q_), bool)
            acc: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}

            def push(list_no: int, codes: np.ndarray, ids: np.ndarray) -> None:
                qsel = l2q.get(list_no)
                if qsel is None or len(qsel) == 0:
                    return
                codes = _pq_code_view(codes, M)
                need = qsel[~have_t3[qsel]]
                if len(need):
                    Qs = Q_[need].reshape(len(need), M, dsub)
                    t3[need] = -2.0 * np.einsum("qmd,mkd->qmk", Qs, books)
                    have_t3[need] = True
                # coarse term ‖q − c_l‖² + precomputed + per-query:
                # M·ksub adds per (query, list) — no per-probe GEMM
                R = Q_[qsel] - C[list_no][None, :]
                coarse = (R * R).sum(1)  # (nq_l,)
                luts = pct[list_no][None, :, :] + t3[qsel]
                # D[q, x] = coarse[q] + sum_m lut[q, m, code[x, m]] —
                # per-m accumulation, no (nq_l, n_codes, M) gather temp
                D = np.broadcast_to(
                    coarse[:, None], (len(qsel), len(codes))
                ).copy()
                for m in range(M):
                    D += luts[:, m, codes[:, m].astype(np.int64)]
                if pqm_ is not None:
                    # per-list residual query codes (the reference's
                    # QueryTables q_code), then per-byte popcount of
                    # q⊕x — candidates past ht drop out of the heap
                    qc = pqm_.encode_np(R)
                    ham = np.zeros(D.shape, np.int64)
                    for m in range(M):
                        ham += pop8[
                            np.bitwise_xor(qc[:, m][:, None], codes[None, :, m])
                        ]
                    # strict keep hd < ht, as the reference (IndexIVFPQ.cpp /
                    # IndexPQ.cpp `if (hd < ht)`); ht > M*8 keeps everything
                    D[ham >= ht] = np.inf
                if list_no not in acc:
                    acc[list_no] = TopKAccumulator(len(qsel), k_, largest=False)
                    qsels[list_no] = qsel
                acc[list_no].push(D, ids)

            for list_no_, codes_, ids_ in arrow_code_groups(batches):
                push(list_no_, codes_, ids_)
            for key, a in acc.items():
                qidx, nid, nd = a.emit()
                fin = np.isfinite(nd)  # polysemous-pruned slots are +inf
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids_[qsels[key][qidx[fin]]], pa.int64()),
                        pa.array(nid[fin], pa.int64()),
                        pa.array(nd[fin], pa.float64()),
                    ],
                    names=["qid", "id", "dist"],
                )

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )


def _preassigned_subshards(index: IVFIndex, max_cell_rows: int | None) -> dict:
    """Hot-cell detection for the cogroup search: {list_no: nsub} for
    every cell above ``max_cell_rows``. The cogroup hands a whole cell
    to ONE task (AQE cannot split a pandas group), so a pathological
    cell serializes the search and bounds task memory by the biggest
    cell — the same skew the dedup bucketed path already salts
    (dedup.py _hot_cell_shards). Detection runs only for FILE-BACKED
    indexes: the per-cell counts are then a column-pruned scan of the
    partition/bucket column (cheap at any scale, cached per index),
    whereas counting an unpersisted codes frame would re-run the whole
    assign GEMM — the r9 lesson. An in-memory index is bounded by what
    the session could materialize, so its cells can't reach the row
    counts this guards against."""
    if (
        max_cell_rows is None
        or getattr(index, "path", None) is None
        or index.codes is None
    ):
        return {}
    cache = getattr(index, "_subshard_cache", None)
    if cache is not None and cache[0] == max_cell_rows:
        return cache[1]
    counts = index.codes.groupBy("list_no").count().collect()  # nlist rows
    subs = {
        int(r["list_no"]): -(-int(r["count"]) // max_cell_rows)
        for r in counts
        if int(r["count"]) > max_cell_rows
    }
    index._subshard_cache = (max_cell_rows, subs)
    return subs


def search_preassigned(
    index: IVFIndex,
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
    assign_payload=None,
    assign_fn=None,
) -> DataFrame:
    """Fully-distributed big-batch IVF search (reference
    contrib/ivf_tools.py:26-57 search_preassigned; parallel_mode 2 of
    faiss/IndexIVF.h:109-122 — parallelize over (query, probe) pairs).

    Unlike IVFIndex.search (which plans probes on the driver — right when
    queries fit in one driver pandas frame), this variant never collects
    queries: the probe table is computed distributed and COGROUPED with
    the codes table on list_no. Use it when the query side is itself
    huge (e.g. knn-graph over the whole table at 100 TB):

      1. probe assignment: broadcast centroids, top-nprobe per query
         (mapInArrow, no shuffle)
      2. probes ⟂⟂ codes cogrouped on list_no (one shuffle of each side,
         hash-partitioned by cell — the ivf_tools regrouping as a
         cogroup instead of a driver dict); per cell, ONE numpy GEMM of
         the cell's queries × the cell's codes and a tie-safe per-query
         top-k — only ≤ k survivors per (query, cell) leave the task
      3. global window top-k over the nq·nprobe·k survivors.

    The r11 rewrite replaced a pair JOIN + per-pair JVM expression: that
    plan materialized BOTH 64-float vectors on every (query, candidate)
    row — nq·nprobe·(n/nlist) pairs ≈ 22 GB through the shuffle at the
    6M-row probe — and windowed all of them. Measured
    (tools/preassigned_probe.py, idle): 26.5 s → 2.76 s at 600k (9.6×);
    at 6M the old plan never finished a 10-minute budget, the cogroup
    plan takes 7.4 s (wall 2.67× for 10× rows under the √(2n) balance
    rule, per-unit throughput +18% — SCALE.md).

    r12 scale hardening:
      - codes side of the cogroup is SHUFFLE-FREE when the index was
        stored with ``IVFIndex.save_bucketed`` (CLUSTERED BY list_no —
        the scan itself proves the grouping, Spark elides the Exchange;
        plan-pinned in tests/test_plans.py). The plain partitioned
        layout still works, paying one corpus exchange per call.
      - hot cells (> ``max_cell_rows`` rows, file-backed indexes only —
        see _preassigned_subshards) are hash-split into sub-shards with
        the probes replicated per sub-shard, so a skewed list_no runs
        as ceil(|cell|/max_cell_rows) bounded tasks instead of one
        unbounded straggler. ``max_cell_rows=None`` disables.
    """
    metric = index.metric
    largest = metric in SIMILARITY_METRICS
    k_ = k

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import TopKAccumulator

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        # f64 with the exact pairwise_distances op order — dist values
        # match the driver-probed search / SQL oracle at the rounding
        # the oracle hashes. The accumulator's tiled push keeps scratch
        # ≈ 32 MB whatever the cell/query-group size (a hot cell under a
        # huge query side would otherwise materialize nq_cell × m_cell
        # doubles in one array — the cogroup is one task, AQE can't
        # split it)
        qids, Qg = _cand_queries(ptab)
        Xg = arrow_list_matrix(ctab.column("vec"))
        ids = arrow_i64(ctab.column("id"))
        acc = TopKAccumulator(len(Qg), k_, metric in SIMILARITY_METRICS)
        acc.bind_queries(Qg, metric)
        acc.push_block(Xg, ids)
        qidx, nid, nd = acc.emit()
        return _cand_table(qids[qidx], nid, nd)

    cands = _preassigned_cogrouped(
        index, queries, nprobe, qid_col, qvec_col, max_cell_rows, scan_cell,
        assign_payload=assign_payload, assign_fn=assign_fn,
    )
    return _window_topk(cands, k, largest)


def range_search_preassigned(
    index: IVFIndex,
    queries: DataFrame,
    radius: float,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Fully-distributed big-batch IVF RANGE search (reference
    IndexIVF::range_search_preassigned, faiss/IndexIVF.h:238,
    faiss/IndexIVF.cpp:730-827 — probes precomputed, scan parallelized
    over (query, probe) pairs).

    The range twin of :func:`search_preassigned`: same plan skeleton
    (map-side probe assignment with broadcast centroids, left-semi cell
    prune, probes⟂⟂codes cogrouped on list_no with hot-cell
    sub-sharding), but the per-cell scan emits EVERY (qid, id, dist)
    within the radius (similarity metrics: above it) through the tiled
    ``range_pairs`` kernel instead of keeping a top-k — and because
    inverted lists PARTITION the ids, no pair can appear twice, so
    there is NO global window: the plan ends map-only after the
    cogroup. That makes this strictly cheaper than the k-NN twin at
    equal probe volume — the natural 100 TB shape for radius joins
    (near-duplicate harvesting, contamination sweeps) where the query
    side is itself a huge DataFrame that must never collect.

    nprobe == nlist degenerates to the exact distributed range join
    (every cell scanned), which is how the oracle pins it.
    """
    metric = index.metric
    radius_ = float(radius)

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import range_pairs

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        qids, Qg = _cand_queries(ptab)
        Xg = arrow_list_matrix(ctab.column("vec"))
        rq, rc, vals = range_pairs(Qg, Xg, metric, radius_)
        return _cand_table(qids[rq], arrow_i64(ctab.column("id"))[rc], vals)

    return _preassigned_cogrouped(
        index, queries, nprobe, qid_col, qvec_col, max_cell_rows, scan_cell
    )


def _empty_cand_table():
    import pyarrow as pa

    return pa.table(
        {
            "qid": pa.array([], pa.int64()),
            "id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
        }
    )


def _cand_table(qids, ids, dists):
    import pyarrow as pa

    return pa.table(
        {
            "qid": pa.array(np.asarray(qids, np.int64), pa.int64()),
            "id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "dist": pa.array(np.asarray(dists, np.float64), pa.float64()),
        }
    )


def _cand_queries(ptab):
    """(qids int64, Q (n,d) f64) from a probe-side cogroup table."""
    from faiss_spark.kernels import arrow_i64, arrow_list_matrix

    return arrow_i64(ptab.column("qid")), arrow_list_matrix(ptab.column("vec"))


def _window_topk(cands: DataFrame, k: int, largest: bool) -> DataFrame:
    """Global per-query top-k over cogroup candidate rows — the shared
    merge tail of every preassigned k-NN twin (tie-break (dist, id),
    WindowGroupLimit-pushed on the JVM side)."""
    sort = [
        F.col("dist").desc() if largest else F.col("dist").asc(),
        F.col("id").asc(),
    ]
    w = Window.partitionBy("qid").orderBy(*sort)
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "dist", "rank")
    )


def _probe_table(
    queries: DataFrame,
    qid_col: str,
    qvec_col: str,
    assign_payload,
    assign_fn,
) -> DataFrame:
    """Distributed probe assignment shared by every preassigned search:
    broadcast the (small) quantizer state, map each query batch through
    ``assign_fn(payload, Q) -> (nq, p) int array | list of 1-D arrays``
    (ragged when a per-query budget like max_codes trims the probe set),
    and emit one (qid, vec, list_no) row per probe via Arrow take — no
    per-row Python objects (at 100 TB the query side is itself huge;
    this map is the whole plan's fan-out). ``assign_payload`` may
    already be a Broadcast (callers whose cell scan shares the same
    artifacts broadcast once and reuse the handle)."""
    from pyspark.broadcast import Broadcast

    spark = queries.sparkSession
    bc = (
        assign_payload
        if isinstance(assign_payload, Broadcast)
        else spark.sparkContext.broadcast(assign_payload)
    )

    def assign_probes(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_id_vec_blocks

        payload = bc.value
        f32_list = pa.list_(pa.float32())
        for qids, Q, vec_arr in arrow_id_vec_blocks(batches):
            order = assign_fn(payload, Q)
            if isinstance(order, np.ndarray):
                rep = np.repeat(
                    np.arange(len(qids)), order.shape[1]
                )
                cells = order.astype(np.int32).ravel()
            else:  # ragged probe sets (per-query scan budgets)
                lens = np.fromiter(
                    (len(o) for o in order), np.int64, len(order)
                )
                rep = np.repeat(np.arange(len(qids)), lens)
                cells = (
                    np.concatenate(order).astype(np.int32)
                    if len(rep)
                    else np.empty(0, np.int32)
                )
            # the declared output schema is array<float>; an array<double>
            # input (DataFrames built from Python floats) must cast before
            # the zero-copy pass-through, as imi_assign/KMeansModel.assign do
            if vec_arr.type != f32_list:
                vec_arr = vec_arr.cast(f32_list)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qids[rep], pa.int64()),
                    vec_arr.take(pa.array(rep, pa.int64())),
                    pa.array(cells, pa.int32()),
                ],
                names=["qid", "vec", "list_no"],
            )

    q = queries.select(
        F.col(qid_col).cast("bigint").alias("qid"), F.col(qvec_col).alias("vec")
    )
    return q.mapInArrow(
        assign_probes, schema="qid bigint, vec array<float>, list_no int"
    )


def _preassigned_cogrouped(
    index: IVFIndex,
    queries: DataFrame,
    nprobe: int,
    qid_col: str,
    qvec_col: str,
    max_cell_rows: int | None,
    scan_cell,
    assign_payload=None,
    assign_fn=None,
    code_cols: tuple = ("vec",),
) -> DataFrame:
    """Shared plan skeleton of the preassigned big-batch searches
    (k-NN top-k and range): distributed probe assignment, one left-semi
    cell prune, and the hot/cold cogroup on list_no, parameterized by
    the per-cell Arrow scan. Emits ``qid bigint, id bigint, dist
    double`` candidate rows; the k-NN caller windows them, the range
    caller returns them as-is.

    ``assign_fn(payload, Q) -> (nq, p) ndarray | list of 1-D arrays``
    overrides probe selection (RCQ beam, IMI product grid, nested
    routers…); the default is the k-means argsort every flat IVF uses.
    Callers MUST pass the exact same cell-selection their driver path
    computes — the fallback twins route through here precisely so
    driver and distributed arms probe identical cells."""
    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    if assign_fn is None:
        C = index.centroids
        metric = index.metric
        largest = index.metric in SIMILARITY_METRICS
        nprobe_ = min(nprobe, len(C))
        assign_payload = C

        def assign_fn(C_, Q):
            D = pairwise_distances(Q, C_, metric)
            return np.argsort(-D if largest else D, axis=1, kind="stable")[
                :, :nprobe_
            ]

    probes = _probe_table(queries, qid_col, qvec_col, assign_payload, assign_fn)
    codes = index.codes.select("list_no", "id", *code_cols)
    return cogrouped_cell_scan(index, probes, codes, max_cell_rows, scan_cell)


def cogrouped_cell_scan(
    index,
    probes: DataFrame,
    codes: DataFrame,
    max_cell_rows: int | None,
    scan_cell,
) -> DataFrame:
    """Generic cell-cogroup tail of the preassigned searches: left-semi
    cell prune + hot/cold cogroup on ``list_no``, parameterized by the
    per-cell scan. ``probes`` carries ``list_no`` plus whatever
    query payload the scan reads (float ``vec``, binary ``qcode``);
    ``codes`` likewise. Shared by the float k-NN/range twins, the coded
    (SQ/PQ/AQ) twins, and the binary Hamming twin
    (binary.binary_search_preassigned).

    The scan is Arrow-native (``applyInArrow``, r13 — VERDICT r12 #3):
    ``scan_cell(key, probe_table, code_table) -> pa.Table`` with columns
    (qid, id, dist). Replacing the per-cell pandas frames removed the
    row-object framing cost that made the range twin emit-bound
    (SCALE.md r12: 4.76× wall at 10× rows; the emitted pairs cross the
    cogroup boundary once per cell)."""
    # materialize ONCE: the probe table feeds both the cell-pruning
    # left-semi and the cogroup — re-executing probe assignment would pay
    # the centroid distance pass twice and, on a nondeterministic query
    # frame, could prune cells inconsistently with the cogroup's probe set
    probes = probes.localCheckpoint(eager=False)
    # selective-probe case: drop unprobed cells before they shuffle into
    # empty cogroups (left-semi on the small distinct-cell set)
    codes = codes.join(
        probes.select("list_no").distinct().hint("broadcast"),
        "list_no",
        "left_semi",
    )

    def cell_cogroup(p, c, keys):
        return (
            p.groupBy(*keys)
            .cogroup(c.groupBy(*keys))
            .applyInArrow(scan_cell, schema="qid bigint, id bigint, dist double")
        )

    subs = _preassigned_subshards(index, max_cell_rows)
    if not subs:
        cands = cell_cogroup(probes, codes, ["list_no"])
    else:
        # hot/cold split: cold cells keep the zero-corpus-shuffle cogroup
        # (bucketed layout) while each hot cell's CODES hash into nsub
        # sub-shards and its PROBES replicate to all of them — the group
        # key becomes (list_no, sub), so the hot cell runs as nsub tasks
        # bounded by ~max_cell_rows each. Exact: the sub-shards PARTITION
        # the cell's candidates, each emits its local top-k, and the
        # global window merges — identical to the unsplit scan.
        hot = sorted(subs)
        nsub_col = F.element_at(
            F.create_map(*[F.lit(v) for kv in subs.items() for v in kv]),
            F.col("list_no"),
        )
        is_hot = F.col("list_no").isin(hot)
        p_hot = probes.filter(is_hot).withColumn(
            "sub", F.explode(F.sequence(F.lit(0), nsub_col - 1))
        )
        c_hot = codes.filter(is_hot).withColumn(
            "sub", F.pmod(F.hash("id"), nsub_col).cast("int")
        )
        cands = cell_cogroup(
            probes.filter(~is_hot), codes.filter(~is_hot), ["list_no"]
        ).unionByName(cell_cogroup(p_hot, c_hot, ["list_no", "sub"]))
    return cands


@dataclass
class IVFSQIndex:
    """IVF + per-component scalar-quantized codes (reference
    IndexIVFScalarQuantizer, faiss/IndexScalarQuantizer.h:64): the codes
    table stores SQ bytes instead of raw floats — 4× smaller scan at
    SQ8 — and the per-list scan decodes on the fly before the distance
    GEMM (the reference's SQ InvertedListScanner does exactly this).

    ``coarse_q`` (a fitted ResidualCoarseQuantizerModel) swaps the
    k-means coarse quantizer for an additive one — the reference's
    ``IVF1024(RCQ2x5),SQ8`` factory form (its own
    tests/test_factory.py:254): assignment and probe selection become a
    beam search over the M tiny codebooks, so at nlist = 2^16..2^20 the
    broadcast artifact stays M·ksub·d floats instead of nlist·d. The
    codes table, partition pruning, and scan are unchanged (SQ decodes
    raw vectors — the list centroid never enters the distance)."""

    centroids: np.ndarray | None
    sq: "ScalarQuantizerModel"
    metric: str = "l2"
    codes: DataFrame | None = None
    path: str | None = None
    coarse_q: object | None = None  # ResidualCoarseQuantizerModel

    @property
    def nlist(self) -> int:
        return (
            self.coarse_q.nlist
            if self.coarse_q is not None
            else len(self.centroids)
        )

    @property
    def d(self) -> int:
        return (
            self.coarse_q.codebooks.shape[2]
            if self.coarse_q is not None
            else self.centroids.shape[1]
        )

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        bits: int = 8,
        metric: str = "l2",
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 20,
        rangestat: str = "minmax",
        rs_arg: float | None = None,
        coarse_q: object | None = None,
    ) -> "IVFSQIndex":
        from faiss_spark.operators.codecs import ScalarQuantizer

        if coarse_q is not None:
            # additive coarse (reference IVF<n>(RCQ<M>x<b>),SQ<b>): the
            # caller fits the RCQ/LSQ model; its beam is L2 — restrict
            # like the reference's quantizer contract
            if metric != "l2":
                raise ValueError(
                    "additive coarse quantizers rank by squared L2, "
                    f"got metric={metric!r}"
                )
            if coarse_q.nlist != nlist:
                raise ValueError(
                    f"coarse_q spans {coarse_q.nlist} virtual cells, "
                    f"expected nlist={nlist}"
                )
            km_centroids = None
        else:
            km = KMeans(
                k=nlist, niter=niter, seed=seed, spherical=(metric == "cosine")
            ).fit(vectors, vec_col=vec_col)
            km_centroids = km.centroids
        sq = ScalarQuantizer(
            bits=bits, rangestat=rangestat, rs_arg=rs_arg, seed=seed
        ).fit(vectors, vec_col=vec_col)
        return IVFSQIndex(
            centroids=km_centroids, sq=sq, metric=metric, coarse_q=coarse_q
        )

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFSQIndex":
        spark = vectors.sparkSession
        codes = self._encode_df(vectors, id_col=id_col, vec_col=vec_col)
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy("list_no").parquet(path)
            self._save_artifact(spark, path)
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def _encode_df(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> DataFrame:
        """Frozen-artifact encode to (list_no, id, code) rows — map-only,
        shared by add() and the streaming incremental writer. With an
        additive coarse, assignment is the beam over the broadcast
        codebooks (same map-only shape, no nlist·d artifact)."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(
            (
                self.centroids, self.coarse_q, self.sq.vmin, self.sq.vdiff,
                self.sq.bits, self.metric,
            )
        )

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks
            from faiss_spark.operators.codecs import ScalarQuantizerModel

            C, cq, vmin, vdiff, bits, metric = bc.value
            sqm = ScalarQuantizerModel(vmin=vmin, vdiff=vdiff, bits=bits)
            for ids, X, _ in arrow_id_vec_blocks(batches):
                if cq is not None:
                    lists = cq.assign_np(X)
                else:
                    D = pairwise_distances(X, C, metric)
                    lists = (
                        np.argmax(D, 1)
                        if metric in SIMILARITY_METRICS
                        else np.argmin(D, 1)
                    )
                codes = sqm.encode_np(X)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(lists.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(list(map(bytes, codes)), pa.binary()),
                    ],
                    names=["list_no", "id", "code"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        return src.mapInArrow(enc, schema="list_no int, id bigint, code binary")

    def _save_artifact(self, spark, path: str) -> None:
        meta = {
            "metric": self.metric,
            "bits": int(self.sq.bits),
            "variant": self.sq.variant,
        }
        if self.coarse_q is not None:
            fsio.write_npy(
                spark,
                os.path.join(path, "_ivfsq_rcq_codebooks.npy"),
                self.coarse_q.codebooks,
            )
            meta["coarse"] = {
                "beam_factor": self.coarse_q.beam_factor,
                "nbits_list": (
                    list(self.coarse_q.nbits_list)
                    if self.coarse_q.nbits_list is not None
                    else None
                ),
            }
        else:
            fsio.write_npy(
                spark, os.path.join(path, "_ivfsq_centroids.npy"), self.centroids
            )
        fsio.write_npy(spark, os.path.join(path, "_ivfsq_vmin.npy"), self.sq.vmin)
        fsio.write_npy(spark, os.path.join(path, "_ivfsq_vdiff.npy"), self.sq.vdiff)
        fsio.write_json(spark, os.path.join(path, "_ivfsq_meta.json"), meta)

    def save(self, path: str) -> "IVFSQIndex":
        """write_index: partitioned SQ codes + centroid/range artifacts."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        self._save_artifact(spark, path)
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    def save_bucketed(self, path: str, nbuckets: int | None = None) -> "IVFSQIndex":
        """write_index into the CLUSTERED BY (list_no) layout (see
        IVFIndex.save_bucketed) — repeated ``sq_search_preassigned``
        cogroups become scan-only on the codes side."""
        return _write_bucketed_codes(
            self, path, ("list_no", "id", "code"), "ivfsq_codes_", nbuckets
        )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFSQIndex":
        from faiss_spark.operators.codecs import ScalarQuantizerModel

        meta = fsio.read_json(spark, os.path.join(path, "_ivfsq_meta.json"))
        coarse_q = None
        centroids = None
        if meta.get("coarse"):
            from faiss_spark.operators.codecs import ResidualCoarseQuantizerModel

            cm = meta["coarse"]
            coarse_q = ResidualCoarseQuantizerModel(
                codebooks=fsio.read_npy(
                    spark, os.path.join(path, "_ivfsq_rcq_codebooks.npy")
                ),
                beam_factor=cm["beam_factor"],
                nbits_list=(
                    tuple(cm["nbits_list"]) if cm["nbits_list"] else None
                ),
            )
        else:
            centroids = fsio.read_npy(
                spark, os.path.join(path, "_ivfsq_centroids.npy")
            )
        return IVFSQIndex(
            centroids=centroids,
            coarse_q=coarse_q,
            sq=ScalarQuantizerModel(
                vmin=fsio.read_npy(spark, os.path.join(path, "_ivfsq_vmin.npy")),
                vdiff=fsio.read_npy(spark, os.path.join(path, "_ivfsq_vdiff.npy")),
                bits=meta["bits"],
                variant=meta["variant"],
            ),
            metric=meta["metric"],
            codes=_attach_codes_table(spark, path),
            path=path,
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """Same plan as IVFIndex.search; the scan decodes SQ bytes to a
        float block before the GEMM (asymmetric: queries stay exact).
        Probe selection under an additive coarse is the RCQ beam
        (reference ResidualCoarseQuantizer::search). A query side past
        the driver bound auto-falls-back to the fully-distributed
        ``sq_search_preassigned`` cogroup over the coded lists."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        nlist = self.nlist
        nprobe = min(nprobe, nlist)
        largest = self.metric in SIMILARITY_METRICS

        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFSQIndex.search", d=self.d,
            fallback=lambda: sq_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        if self.coarse_q is not None:
            probes, _ = self.coarse_q.search_np(Q, nprobe)
        else:
            CD = pairwise_distances(Q, self.centroids, self.metric)
            order = np.argsort(-CD if largest else CD, axis=1, kind="stable")
            probes = order[:, :nprobe]
        probed_lists = sorted({int(c) for c in probes.ravel()})
        list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(len(qids)):
            for c in probes[qi]:
                list_to_q[int(c)].append(qi)
        bc = spark.sparkContext.broadcast(
            (
                qids,
                Q,
                {c: np.asarray(v, np.int64) for c, v in list_to_q.items()},
                self.sq.vmin,
                self.sq.vdiff,
                self.sq.bits,
                self.sq.variant,
            )
        )
        metric = self.metric
        k_ = k
        pruned = self.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_code_groups
            from faiss_spark.operators.codecs import ScalarQuantizerModel

            qids_, Q_, l2q, vmin, vdiff, bits, variant = bc.value
            sqm = ScalarQuantizerModel(
                vmin=vmin, vdiff=vdiff, bits=bits, variant=variant
            )
            acc: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}
            for list_no, codes, ids in arrow_code_groups(batches):
                qsel = l2q.get(list_no)
                if qsel is None or len(qsel) == 0:
                    continue
                X = sqm.decode_np(codes)
                if list_no not in acc:
                    acc[list_no] = TopKAccumulator(
                        len(qsel), k_, metric in SIMILARITY_METRICS
                    )
                    acc[list_no].bind_queries(
                        np.ascontiguousarray(Q_[qsel]), metric
                    )
                    qsels[list_no] = qsel
                acc[list_no].push_block(X, ids)
            for key, a in acc.items():
                qidx, nid, nd = a.emit()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids_[qsels[key][qidx]], pa.int64()),
                        pa.array(nid, pa.int64()),
                        pa.array(nd, pa.float64()),
                    ],
                    names=["qid", "id", "dist"],
                )

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        sort = [
            F.col("dist").desc() if largest else F.col("dist").asc(),
            F.col("id").asc(),
        ]
        w = Window.partitionBy("qid").orderBy(*sort)
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )


def sq_search_preassigned(
    index: "IVFSQIndex",
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Fully-distributed big-batch search over SQ-CODED inverted lists —
    search_preassigned for IndexIVFScalarQuantizer (the reference's
    big-batch contrib path runs on any IndexIVF subclass; here the
    codes side of the cogroup carries SQ bytes, 4–8× smaller than raw
    f32 vectors, and each cell decodes on the fly before its GEMM —
    the SQ InvertedListScanner inside the cogroup).

    At 100 TB this is the preferred big-batch shape: the corpus-side
    payload through the exchange (or the bucketed scan) is the CODED
    table, so an SQ8 index moves a quarter of what the raw-vector
    cogroup moves at identical probe volume. Probe selection matches
    IVFSQIndex.search exactly — k-means argsort, or the RCQ/LSQ beam
    for an additive coarse (the fitted coarse model broadcasts whole:
    it is the same numpy state a driver-planned search holds)."""
    from faiss_spark.operators.codecs import ScalarQuantizerModel

    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    metric = index.metric
    largest = metric in SIMILARITY_METRICS
    nprobe_ = min(nprobe, index.nlist)
    vmin, vdiff, bits = index.sq.vmin, index.sq.vdiff, index.sq.bits
    variant = index.sq.variant
    k_ = k

    def assign_fn(payload, Q):
        C_, cq = payload
        if cq is not None:
            order, _ = cq.search_np(Q, nprobe_)
            return order
        D = pairwise_distances(Q, C_, metric)
        return np.argsort(-D if largest else D, axis=1, kind="stable")[
            :, :nprobe_
        ]

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import TopKAccumulator, arrow_binary_matrix

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        sqm = ScalarQuantizerModel(
            vmin=vmin, vdiff=vdiff, bits=bits, variant=variant
        )
        qids, Qg = _cand_queries(ptab)
        acc = TopKAccumulator(len(Qg), k_, largest)
        acc.bind_queries(Qg, metric)
        ids = arrow_i64(ctab.column("id"))
        raw = arrow_binary_matrix(ctab.column("code"))
        # decode in bounded chunks: a hot cell never holds its full
        # float expansion (decode inflates 4-8x over the stored bytes)
        d_out = Qg.shape[1]
        chunk = max(1, (1 << 22) // max(1, d_out))
        for s in range(0, len(ids), chunk):
            X = sqm.decode_np(raw[s:s + chunk])
            acc.push_block(X, ids[s:s + chunk])
        qidx, nid, nd = acc.emit()
        return _cand_table(qids[qidx], nid, nd)

    cands = _preassigned_cogrouped(
        index, queries, nprobe_, qid_col, qvec_col, max_cell_rows, scan_cell,
        assign_payload=(index.centroids, index.coarse_q),
        assign_fn=assign_fn, code_cols=("code",),
    )
    return _window_topk(cands, k, largest)


def _pq_code_view(raw: np.ndarray, M: int) -> np.ndarray:
    """(n, M) sub-code index matrix from the stored byte matrix: the
    code column stores ``ProductQuantizerModel.code_dtype`` bytes —
    1 byte per sub-code for ksub ≤ 256, 2 bytes (little-endian uint16)
    above (reference ProductQuantizer.h:30 bit-packs arbitrary widths;
    two whole bytes carry the same information here). Shared by every
    ADC scan so a >8-bit PQ decodes identically on the driver-planned
    and preassigned paths."""
    if raw.shape[1] == M:
        return raw
    if raw.shape[1] == 2 * M:
        return np.ascontiguousarray(raw).view(np.uint16)
    raise ValueError(
        f"code width {raw.shape[1]} matches neither 1- nor 2-byte "
        f"sub-codes for M={M}"
    )


def pq_search_preassigned(
    index,
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
    polysemous_ht: int | None = None,
    max_codes: int | None = None,
) -> DataFrame:
    """Fully-distributed big-batch ADC search over PQ-CODED inverted
    lists — search_preassigned for IndexIVFPQ and its IMI-coarse form
    (reference contrib/ivf_tools.py:26-57 is index-agnostic; the
    flagship 100 TB composite of benchs/distributed_ondisk/README.md is
    exactly this OPQ+IVF+PQ case — VERDICT r12 #1).

    Same cogroup skeleton as the float/SQ/binary twins
    (``cogrouped_cell_scan``: distributed probe assignment, left-semi
    cell prune, hot-cell sub-sharding, bucketed zero-corpus-shuffle
    layout via ``save_bucketed``), with the per-cell scan building the
    residual ADC LUT from the broadcast codebooks — the precomputed-term
    decomposition the driver path uses (IVFPQIndex._precomputed_tables):
    lut[q,m,j] = (‖d_mj‖² + 2⟨c_lm, d_mj⟩) − 2⟨q_m, d_mj⟩, plus the
    per-query coarse term ‖q − c_l‖². The codes side of the cogroup
    carries M bytes/row — cheaper through the exchange than even the SQ
    twin's 4–8×.

    Probe selection reuses the EXACT driver cell-selection: k-means L2
    argsort for IVFPQIndex, the IMI product-distance grid for
    IMIPQIndex (IMIIVFIndex._probe verbatim), including the
    ``max_codes`` nearest-first scan budget (ragged probe sets) and the
    in-scan ``polysemous_ht`` Hamming pre-filter."""
    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    is_imi = hasattr(index, "sub_centroids")
    nprobe_ = min(nprobe, index.nlist if is_imi else len(index.centroids))
    sizes = _list_sizes(index) if max_codes is not None else None
    k_ = k
    ht = polysemous_ht
    mc = max_codes
    # one broadcast feeds BOTH probe assignment and the cell scans —
    # coarse state + codebooks never ride in task closures
    bc = queries.sparkSession.sparkContext.broadcast(
        (
            index.sub_centroids if is_imi else index.centroids,
            index.pq.codebooks,
            sizes,
        )
    )

    def assign_fn(payload, Q):
        coarse_, _, sizes_ = payload
        if is_imi:
            order = IMIIVFIndex(sub_centroids=coarse_)._probe(Q, nprobe_)
        else:
            CD = pairwise_distances(Q, coarse_, "l2")
            order = np.argsort(CD, axis=1, kind="stable")[:, :nprobe_]
        if sizes_ is None:
            return order
        # nearest-first scan budget (reference IndexIVF.cpp:415
        # max_codes): cut once cumulative probed-list sizes reach the
        # budget, crossing list included — identical to the driver plan
        cum = np.cumsum(sizes_[order], axis=1)
        keep = np.concatenate(
            [np.ones((len(order), 1), bool), cum[:, :-1] < mc], axis=1
        )
        return [order[qi][keep[qi]] for qi in range(len(order))]

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import TopKAccumulator, arrow_binary_matrix

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        coarse, books, _ = bc.value
        list_no = key[0].as_py()
        qids, Qg = _cand_queries(ptab)
        nq = len(Qg)
        M, ksub, dsub = books.shape
        if is_imi:
            ks = coarse.shape[1]
            cent = np.concatenate(
                [coarse[0][list_no // ks], coarse[1][list_no % ks]]
            )
        else:
            cent = coarse[list_no]
        # per-(query, cell) LUT via the precomputed-term decomposition
        # (IVFPQIndex._precomputed_tables): one M·ksub·dsub einsum per
        # cell for the query-independent term, one per query group for
        # the −2⟨q_m, d_mk⟩ term — no per-code GEMM
        pct_row = (books * books).sum(2) + 2.0 * np.einsum(
            "md,mkd->mk", cent.reshape(M, dsub), books
        )
        t3 = -2.0 * np.einsum(
            "qmd,mkd->qmk", Qg.reshape(nq, M, dsub), books
        )
        luts = pct_row[None, :, :] + t3
        R = Qg - cent[None, :]
        coarse_d = (R * R).sum(1)
        ids = arrow_i64(ctab.column("id"))
        codes = _pq_code_view(arrow_binary_matrix(ctab.column("code")), M)
        if ht is not None:
            pqm = ProductQuantizerModel(codebooks=books)
            qc = pqm.encode_np(R)
            pop8 = (
                np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)
                .sum(1)
                .astype(np.int64)
            )
        acc = TopKAccumulator(nq, k_, largest=False)
        # gather-sum in bounded chunks: a hot cell never materializes
        # its full (nq, n_codes) distance block
        chunk = max(16, (1 << 22) // max(1, nq))
        for s in range(0, len(ids), chunk):
            cc = codes[s:s + chunk]
            D = np.broadcast_to(coarse_d[:, None], (nq, len(cc))).copy()
            for m in range(M):
                D += luts[:, m, cc[:, m].astype(np.int64)]
            if ht is not None:
                ham = np.zeros(D.shape, np.int64)
                for m in range(M):
                    ham += pop8[
                        np.bitwise_xor(qc[:, m][:, None], cc[None, :, m])
                    ]
                # strict hd < ht as the reference (IndexIVFPQ.cpp)
                D[ham >= ht] = np.inf
            acc.push(D, ids[s:s + chunk])
        qidx, nid, nd = acc.emit()
        fin = np.isfinite(nd)  # polysemous-pruned slots are +inf
        return _cand_table(qids[qidx[fin]], nid[fin], nd[fin])

    cands = _preassigned_cogrouped(
        index, queries, nprobe_, qid_col, qvec_col, max_cell_rows, scan_cell,
        assign_payload=bc, assign_fn=assign_fn,
        code_cols=("code",),
    )
    return _window_topk(cands, k, largest=False)


def aq_search_preassigned(
    index,
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Fully-distributed big-batch search over ADDITIVE-QUANTIZER-coded
    inverted lists — search_preassigned for IndexIVFAdditiveQuantizer
    (reference contrib/ivf_tools.py pattern over
    faiss/IndexIVFAdditiveQuantizer.h:26). Same cogroup skeleton as the
    SQ/PQ twins; the per-cell scan gather-sums the M codebook rows plus
    the list centroid (the AQ decode) in bounded chunks before the
    distance pass, honoring the index's '_N*' stored-norm search_type
    estimator exactly as the driver-planned scan does. Probe selection
    matches IVFAQIndex.search — metric argsort, or the RCQ/LSQ beam
    under an additive coarse."""
    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    metric = index.metric
    largest = metric in SIMILARITY_METRICS
    nprobe_ = min(nprobe, index.nlist)
    est = index.search_type is not None and metric == "l2"
    k_ = k
    bc = queries.sparkSession.sparkContext.broadcast(
        (
            index.centroids,
            index.coarse_q,
            index.rq.codebooks,
            index.norm_q if est else None,
        )
    )

    def assign_fn(payload, Q):
        C_, cq, _, _ = payload
        if cq is not None:
            order, _ = cq.search_np(Q, nprobe_)
            return order
        D = pairwise_distances(Q, C_, metric)
        return np.argsort(-D if largest else D, axis=1, kind="stable")[
            :, :nprobe_
        ]

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import TopKAccumulator, arrow_binary_matrix

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        C_, cq, books, norm_q = bc.value
        list_no = key[0].as_py()
        qids, Qg = _cand_queries(ptab)
        base = (
            cq.reconstruct_np(np.asarray([list_no]))[0]
            if cq is not None
            else C_[list_no]
        )
        ids = arrow_i64(ctab.column("id"))
        codes = _pq_code_view(
            arrow_binary_matrix(ctab.column("code")), books.shape[0]
        )
        acc = TopKAccumulator(len(Qg), k_, largest)
        if not est:
            acc.bind_queries(Qg, metric)
        # decode in bounded chunks: the gather-sum inflates the stored
        # M bytes to d·8, a hot cell never holds its full expansion
        chunk = max(1, (1 << 22) // max(1, Qg.shape[1]))
        for s in range(0, len(ids), chunk):
            cc = codes[s:s + chunk]
            X = np.broadcast_to(base, (len(cc), len(base))).astype(
                np.float64
            )
            for m in range(books.shape[0]):
                X = X + books[m][cc[:, m]]
            if est:
                n_raw = (X * X).sum(1)
                n_est = (
                    norm_q.quantize_np(n_raw)
                    if norm_q is not None
                    else np.zeros(len(X))
                )
                D = (
                    (Qg * Qg).sum(1)[:, None]
                    - 2.0 * (Qg @ X.T)
                    + n_est[None, :]
                )
                acc.push(D, ids[s:s + chunk])
            else:
                acc.push_block(X, ids[s:s + chunk])
        qidx, nid, nd = acc.emit()
        return _cand_table(qids[qidx], nid, nd)

    cands = _preassigned_cogrouped(
        index, queries, nprobe_, qid_col, qvec_col, max_cell_rows, scan_cell,
        assign_payload=bc, assign_fn=assign_fn, code_cols=("code",),
    )
    return _window_topk(cands, k, largest)


def pqr_search_preassigned(
    index,
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Fully-distributed big-batch IVFPQR codes-rerank search —
    search_preassigned for the reference's two-stage IndexIVFPQR
    (faiss/IndexIVFPQR.h:19) in its codes-only mode. The per-cell scan
    mirrors IVFPQRIndex._search_pqr_codes chunk for chunk: ADC estimate
    over the pq1 codes, per-chunk shortlist of k·k_factor, refine
    decode (pq1 + refine_pq gather-sum) for the shortlist union only,
    exact re-rank of the shortlist — the same ≥-reference-quality
    superset shortlist discipline, now over the cogroup so the query
    side never collects."""
    base = index.ivfpq
    if base.codes is None:
        raise ValueError("index has no codes table; call train() first")
    if index.refine_pq is None:
        raise ValueError(
            "pqr_search_preassigned needs a refine PQ; train with M_refine"
        )
    nprobe_ = min(nprobe, len(base.centroids))
    k_, kf = k, index.k_factor
    bc = queries.sparkSession.sparkContext.broadcast(
        (base.centroids, base.pq.codebooks, index.refine_pq.codebooks)
    )

    def assign_fn(payload, Q):
        CD = pairwise_distances(Q, payload[0], "l2")
        return np.argsort(CD, axis=1, kind="stable")[:, :nprobe_]

    def scan_cell(key, ptab, ctab):
        from faiss_spark.kernels import TopKAccumulator, arrow_binary_matrix

        if ptab.num_rows == 0 or ctab.num_rows == 0:
            return _empty_cand_table()
        C_, books1, books2 = bc.value
        pq1 = ProductQuantizerModel(codebooks=books1)
        pq2 = ProductQuantizerModel(codebooks=books2)
        M, _, dsub = books1.shape
        list_no = key[0].as_py()
        qids, Qg = _cand_queries(ptab)
        nq = len(Qg)
        codes1 = _pq_code_view(arrow_binary_matrix(ctab.column("code")), M)
        codes2 = _pq_code_view(
            arrow_binary_matrix(ctab.column("rcode")), books2.shape[0]
        )
        ids = arrow_i64(ctab.column("id"))
        R = Qg - C_[list_no][None, :]
        Rs = R.reshape(nq, M, dsub)
        luts = (
            (Rs * Rs).sum(2)[:, :, None]
            + (books1 * books1).sum(2)[None, :, :]
            - 2.0 * np.einsum("qmd,mkd->qmk", Rs, books1)
        )
        acc = TopKAccumulator(nq, k_, largest=False)
        chunk = max(16, (1 << 22) // max(1, nq))
        for s in range(0, len(ids), chunk):
            cc1, cc2 = codes1[s:s + chunk], codes2[s:s + chunk]
            D = np.zeros((nq, len(cc1)), np.float64)
            for m in range(M):
                D += luts[:, m, cc1[:, m].astype(np.int64)]
            ns = min(len(cc1), k_ * kf)
            if ns < len(cc1):
                short = np.argpartition(D, ns - 1, axis=1)[:, :ns]
            else:
                short = np.broadcast_to(np.arange(len(cc1)), (nq, len(cc1)))
            uni = np.unique(short.ravel())
            Y = pq1.decode_np(cc1[uni]) + pq2.decode_np(cc2[uni])
            pos = np.full(len(cc1), -1, np.int64)
            pos[uni] = np.arange(len(uni))
            DR = np.full_like(D, np.inf)
            for qi in range(nq):
                sel = short[qi]
                diff = R[qi][None, :] - Y[pos[sel]]
                DR[qi, sel] = (diff * diff).sum(1)
            acc.push(DR, ids[s:s + chunk])
        qidx, nid, nd = acc.emit()
        keep = np.isfinite(nd)
        return _cand_table(qids[qidx[keep]], nid[keep], nd[keep])

    cands = _preassigned_cogrouped(
        base, queries, nprobe_, qid_col, qvec_col, max_cell_rows, scan_cell,
        assign_payload=bc, assign_fn=assign_fn, code_cols=("code", "rcode"),
    )
    return _window_topk(cands, k, largest=False)


def imi_assign(
    vectors: DataFrame,
    sub_centroids: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
    keep_vec: bool = False,
) -> DataFrame:
    """Multi-index (IMI) coarse assignment (reference MultiIndexQuantizer,
    faiss/IndexPQ.h:139; factory "IMI2x<n>"): the coarse vocabulary is the
    PRODUCT of two half-space codebooks — nlist = k² cells from only 2k
    trained centroids. Cell id = argmin(first half) * k + argmin(second
    half). Broadcast sub-codebooks, per-half GEMM argmin, no shuffle.

    sub_centroids: (2, k, d/2) array. keep_vec=True also carries the
    vector through (the add() path — avoids a join-back shuffle)."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(sub_centroids)

    def do(batches):
        import pyarrow as pa

        from faiss_spark.kernels import arrow_id_vec_blocks

        C = bc.value
        _, k, dsub = C.shape
        f32_list = pa.list_(pa.float32())
        for ids, X, vec_arr in arrow_id_vec_blocks(batches):
            cells = np.zeros(len(X), np.int64)
            for h in range(2):
                sub = X[:, h * dsub : (h + 1) * dsub]
                d2 = (
                    (sub * sub).sum(1)[:, None]
                    + (C[h] * C[h]).sum(1)[None, :]
                    - 2.0 * (sub @ C[h].T)
                )
                cells = cells * k + d2.argmin(1)
            arrays = [
                pa.array(ids, pa.int64()),
                pa.array(cells.astype(np.int32), pa.int32()),
            ]
            names = ["id", "list_no"]
            if keep_vec:
                if vec_arr.type != f32_list:
                    vec_arr = vec_arr.cast(f32_list)
                arrays.append(vec_arr)
                names.append("vec")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    src = vectors.select(
        F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
    )
    schema = "id bigint, list_no int" + (", vec array<float>" if keep_vec else "")
    return src.mapInArrow(do, schema=schema)


@dataclass
class IMIIVFIndex:
    """IVFFlat with a MultiIndexQuantizer coarse — the factory "IMI2x<b>"
    form (reference faiss/index_factory.cpp:241-289 parse path,
    faiss/IndexPQ.h:139 MultiIndexQuantizer): nlist = 2^(2b) cells from
    two 2^b half-space codebooks. Coarse probing evaluates the PRODUCT
    distance d1[i] + d2[j] over cell (i, j) — the driver-side analogue of
    the reference's multi-index heap traversal — then the scan is the
    shared partition-pruned _scan_probed_lists plan. L2 only (as the
    reference's IMI)."""

    sub_centroids: np.ndarray  # (2, ksub, d/2)
    metric: str = "l2"
    codes: DataFrame | None = None

    @property
    def ksub(self) -> int:
        return self.sub_centroids.shape[1]

    @property
    def nlist(self) -> int:
        return self.ksub * self.ksub

    # duck-typed alias so shared helpers (search_with_parameters) that
    # read len(index.centroids) see the virtual cell count
    @property
    def centroids(self) -> np.ndarray:
        return np.empty((self.nlist, 0))

    @staticmethod
    def train(
        vectors: DataFrame,
        nbits: int,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 15,
    ) -> "IMIIVFIndex":
        sub = train_imi(vectors, 1 << nbits, vec_col=vec_col, seed=seed, niter=niter)
        return IMIIVFIndex(sub_centroids=sub)

    def add(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec",
        path: str | None = None,
    ):
        codes = imi_assign(
            vectors, self.sub_centroids, id_col=id_col, vec_col=vec_col,
            keep_vec=True,
        ).select("list_no", "id", "vec")
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy(
                "list_no"
            ).parquet(path)
            spark = vectors.sparkSession
            fsio.write_npy(spark, os.path.join(path, "_imi_sub_centroids.npy"), self.sub_centroids)
            fsio.write_json(spark, os.path.join(path, "_imi_meta.json"), {"metric": self.metric, "ksub": int(self.ksub)})
            self.codes = spark.read.parquet(path)
        else:
            self.codes = codes
        return self

    def save(self, path: str) -> "IMIIVFIndex":
        """write_index for an already-built IMI index."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        fsio.write_npy(spark, os.path.join(path, "_imi_sub_centroids.npy"), self.sub_centroids)
        fsio.write_json(spark, os.path.join(path, "_imi_meta.json"), {"metric": self.metric, "ksub": int(self.ksub)})
        self.codes = spark.read.parquet(path)
        return self

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IMIIVFIndex":
        meta = fsio.read_json(spark, os.path.join(path, "_imi_meta.json"))
        return IMIIVFIndex(
            sub_centroids=fsio.read_npy(spark, os.path.join(path, "_imi_sub_centroids.npy")),
            metric=meta["metric"],
            codes=spark.read.parquet(path),
        )

    def _probe(self, Q: np.ndarray, nprobe: int) -> np.ndarray:
        """Top-nprobe cells per query by product distance (reference
        MultiIndexQuantizer::search, faiss/IndexPQ.cpp multi-index heap)."""
        ksub, dsub = self.ksub, self.sub_centroids.shape[2]
        halves = []
        for h in range(2):
            sub = Q[:, h * dsub : (h + 1) * dsub]
            C = self.sub_centroids[h]
            halves.append(
                (sub * sub).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (sub @ C.T)
            )
        # (nq, ksub, ksub) product distances; cell = i * ksub + j
        cd = halves[0][:, :, None] + halves[1][:, None, :]
        flat = cd.reshape(len(Q), -1)
        nprobe = min(nprobe, flat.shape[1])
        part = np.argpartition(flat, nprobe - 1, axis=1)[:, :nprobe]
        # deterministic probe order: by (distance, cell)
        order = np.lexsort(
            (part, np.take_along_axis(flat, part, axis=1)), axis=1
        )
        return np.take_along_axis(part, order, axis=1)

    def search(
        self, queries: DataFrame, k: int, nprobe: int = 1,
        qid_col: str = "qid", qvec_col: str = "vec",
    ) -> DataFrame:
        """Product-distance probing + flat scan; a query side past the
        driver bound auto-falls-back to the distributed cogroup twin
        with the SAME `_probe` grid (or MIQ2 truncated grid — the
        subclass override rides along via type(self)) executor-side."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        cls = type(self)
        state = self._probe_state()
        np_ = nprobe
        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IMIIVFIndex.search",
            d=2 * self.sub_centroids.shape[2],
            fallback=lambda: search_preassigned(
                self, queries, k, nprobe=np_,
                qid_col=qid_col, qvec_col=qvec_col,
                assign_payload=state,
                assign_fn=lambda s, Q: cls(**s)._probe(Q, np_),
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        probes = self._probe(Q, nprobe)
        return _scan_probed_lists(self.codes, qids, Q, probes, k, self.metric)

    def _probe_state(self) -> dict:
        """Constructor kwargs that reproduce this coarse quantizer's
        `_probe` on an executor (no codes DataFrame — just the arrays)."""
        return {"sub_centroids": self.sub_centroids}


@dataclass
class MIQ2IVFIndex(IMIIVFIndex):
    """IVFFlat with a MultiIndexQuantizer2 coarse (reference
    faiss/IndexPQ.h:171 MultiIndexQuantizer2, IndexPQ.cpp:1000-1110): the
    per-half assignment is performed by ASSIGN SUB-INDEXES holding that
    half's ksub centroids, each returning only its top-k2 candidates
    (k2 = min(K, ksub) in the reference), and the product combination
    min-sums over the truncated k2×k2 grid instead of the full
    ksub×ksub one. With assign_k2 = ksub this is exactly
    MultiIndexQuantizer (pinned by the oracle entry); smaller k2 trades
    probe recall for an O((ksub/k2)²) smaller candidate grid — the knob
    that matters when ksub is 2^12+ at 1B-vector nlist. The per-half
    sub-index here is the exact flat search (one small GEMM against
    broadcast half-centroids); an approximate sub-index would slot into
    the same per-half top-k2 step, as in the reference's
    MultiIndexQuantizer2(d, nbits, assign_index_0, assign_index_1)."""

    assign_k2: int | None = None

    def _probe_state(self) -> dict:
        return {
            "sub_centroids": self.sub_centroids,
            "assign_k2": self.assign_k2,
        }

    @staticmethod
    def train(
        vectors: DataFrame,
        nbits: int,
        assign_k2: int | None = None,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 15,
    ) -> "MIQ2IVFIndex":
        sub = train_imi(vectors, 1 << nbits, vec_col=vec_col, seed=seed, niter=niter)
        # reference MultiIndexQuantizer2::train = MIQ train + add the
        # trained centroids to the per-half assign sub-indexes
        return MIQ2IVFIndex(sub_centroids=sub, assign_k2=assign_k2)

    def _probe(self, Q: np.ndarray, nprobe: int) -> np.ndarray:
        ksub, dsub = self.ksub, self.sub_centroids.shape[2]
        k2 = min(self.assign_k2 or ksub, ksub)
        ids_h, dis_h = [], []
        for h in range(2):
            sub = Q[:, h * dsub : (h + 1) * dsub]
            C = self.sub_centroids[h]
            D = (
                (sub * sub).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (sub @ C.T)
            )
            # the assign sub-index's top-k2 (deterministic (dist, id))
            part = np.argpartition(D, k2 - 1, axis=1)[:, :k2]
            pd_ = np.take_along_axis(D, part, axis=1)
            order = np.lexsort((part, pd_), axis=1)
            ids_h.append(np.take_along_axis(part, order, axis=1))
            dis_h.append(np.take_along_axis(pd_, order, axis=1))
        # min-sum over the truncated k2×k2 grid (MinSumK over pre-sorted
        # per-half lists in the reference; the grid is small enough here
        # to evaluate densely)
        cd = dis_h[0][:, :, None] + dis_h[1][:, None, :]
        cells = ids_h[0][:, :, None] * ksub + ids_h[1][:, None, :]
        flat_d = cd.reshape(len(Q), -1)
        flat_c = cells.reshape(len(Q), -1)
        nprobe = min(nprobe, flat_d.shape[1])
        part = np.argpartition(flat_d, nprobe - 1, axis=1)[:, :nprobe]
        order = np.lexsort(
            (
                np.take_along_axis(flat_c, part, axis=1),
                np.take_along_axis(flat_d, part, axis=1),
            ),
            axis=1,
        )
        sel = np.take_along_axis(part, order, axis=1)
        return np.take_along_axis(flat_c, sel, axis=1)


@dataclass
class IMIPQIndex:
    """IMI coarse + PQ-on-residual codes — the reference's classic
    billion-scale composite (factory "IMI2x<b>,PQ<M>", IndexIVFPQ over a
    MultiIndexQuantizer: index_factory.cpp:466; the SIFT1B/Deep1B
    "IMI2x12,PQ16" bench configuration). nlist = ksub² virtual cells
    from 2·ksub trained half-centroids; the full centroid of cell
    (i, j) is concat(c0_i, c1_j) and is RECONSTRUCTED where needed —
    the 2^(2b)×d centroid matrix is never materialized (at 2x12 / d=64
    it would be ~4 GB f64 per executor; the halves are ~4 MB).

    Assignment is separable (argmin over the product grid = per-half
    argmin → imi_assign's map-only pass); search probes by product
    distance (the IMI driver plan) and scans with per-list residual ADC
    LUTs, hoisting the query-independent ‖d‖²+2⟨c_l,d⟩ term per probed
    LIST inside the task (the IVFPQ precomputed-table decomposition,
    computed lazily per cell because materializing it for 2^(2b) cells
    is exactly what IMI exists to avoid)."""

    sub_centroids: np.ndarray  # (2, ksub, d/2)
    pq: ProductQuantizerModel
    codes: DataFrame | None = None
    path: str | None = None

    @property
    def ksub(self) -> int:
        return self.sub_centroids.shape[1]

    @property
    def nlist(self) -> int:
        return self.ksub * self.ksub

    def _cell_centroids(self, lists: np.ndarray) -> np.ndarray:
        """(n, d) centroids of the given cell ids, from the halves."""
        i, j = lists // self.ksub, lists % self.ksub
        return np.concatenate(
            [self.sub_centroids[0][i], self.sub_centroids[1][j]], axis=1
        )

    @staticmethod
    def train(
        vectors: DataFrame,
        nbits: int,
        M: int = 8,
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 15,
        pq_niter: int = 15,
        pq_nbits: int = 8,
    ) -> "IMIPQIndex":
        from faiss_spark.operators.codecs import _kmeans_np, _sampled_matrix

        sub = train_imi(vectors, 1 << nbits, vec_col=vec_col, seed=seed, niter=niter)
        idx = IMIPQIndex(sub_centroids=sub, pq=None)  # books next
        # PQ trained on residuals of a seeded sample (separable assign)
        X = _sampled_matrix(vectors, vec_col, 65536, seed)
        d = X.shape[1]
        if d % M:
            raise ValueError(f"d={d} not divisible by M={M}")
        dsub2 = sub.shape[2]
        cells = np.zeros(len(X), np.int64)
        for h in range(2):
            s = X[:, h * dsub2 : (h + 1) * dsub2]
            C = sub[h]
            d2 = (s * s).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (s @ C.T)
            cells = cells * idx.ksub + d2.argmin(1)
        resid = X - idx._cell_centroids(cells)
        dsub = d // M
        ksub_pq = min(1 << pq_nbits, len(resid))
        books = np.empty((M, ksub_pq, dsub), np.float64)
        for m in range(M):
            books[m], _ = _kmeans_np(
                resid[:, m * dsub : (m + 1) * dsub], ksub_pq, pq_niter, seed + m
            )
        idx.pq = ProductQuantizerModel(codebooks=books)
        return idx

    def _encode_df(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> DataFrame:
        """Map-only (list_no, id, code) encode — separable IMI assign +
        PQ residual code in one Arrow-native pass (shared by add and
        streaming)."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast((self.sub_centroids, self.pq.codebooks))
        ksub = self.ksub

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            sub_c, books = bc.value
            pqm = ProductQuantizerModel(codebooks=books)
            dsub2 = sub_c.shape[2]
            for ids, X, _ in arrow_id_vec_blocks(batches):
                cells = np.zeros(len(X), np.int64)
                for h in range(2):
                    s = X[:, h * dsub2 : (h + 1) * dsub2]
                    C = sub_c[h]
                    d2 = (
                        (s * s).sum(1)[:, None]
                        + (C * C).sum(1)[None, :]
                        - 2.0 * (s @ C.T)
                    )
                    cells = cells * ksub + d2.argmin(1)
                i, j = cells // ksub, cells % ksub
                cent = np.concatenate([sub_c[0][i], sub_c[1][j]], axis=1)
                codes = pqm.encode_np(X - cent)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cells.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(list(map(bytes, codes)), pa.binary()),
                    ],
                    names=["list_no", "id", "code"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        return src.mapInArrow(enc, schema="list_no int, id bigint, code binary")

    def add(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec",
        path: str | None = None,
    ) -> "IMIPQIndex":
        spark = vectors.sparkSession
        codes = self._encode_df(vectors, id_col=id_col, vec_col=vec_col)
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy(
                "list_no"
            ).parquet(path)
            self._save_artifact(spark, path)
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def _save_artifact(self, spark, path: str) -> None:
        fsio.write_npy(
            spark, os.path.join(path, "_imipq_sub_centroids.npy"), self.sub_centroids
        )
        fsio.write_npy(
            spark, os.path.join(path, "_imipq_codebooks.npy"), self.pq.codebooks
        )
        fsio.write_json(
            spark, os.path.join(path, "_imipq_meta.json"),
            {"ksub": int(self.ksub), "M": int(self.pq.M)},
        )

    def save(self, path: str) -> "IMIPQIndex":
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        self._save_artifact(spark, path)
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    def save_bucketed(self, path: str, nbuckets: int | None = None) -> "IMIPQIndex":
        """write_index into the CLUSTERED BY (list_no) layout (see
        IVFIndex.save_bucketed) — repeated ``pq_search_preassigned``
        cogroups become scan-only on the codes side."""
        return _write_bucketed_codes(
            self, path, ("list_no", "id", "code"), "imipq_codes_", nbuckets
        )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IMIPQIndex":
        return IMIPQIndex(
            sub_centroids=fsio.read_npy(
                spark, os.path.join(path, "_imipq_sub_centroids.npy")
            ),
            pq=ProductQuantizerModel(
                codebooks=fsio.read_npy(spark, os.path.join(path, "_imipq_codebooks.npy"))
            ),
            codes=_attach_codes_table(spark, path),
            path=path,
        )

    def search(
        self, queries: DataFrame, k: int, nprobe: int = 1,
        qid_col: str = "qid", qvec_col: str = "vec",
        polysemous_ht: int | None = None,
        max_codes: int | None = None,
    ) -> DataFrame:
        """Product-distance probing + per-list residual ADC scan.

        polysemous_ht and max_codes make this THE SIFT1B serving row
        (benchs/README.md:122 "IMI2x12,PQ16, nprobe=16, max_codes=10000,
        ht=48"): the per-list residual-code Hamming pre-filter of
        IndexIVFPQ.h:44 and the IndexIVF.cpp:415 scan budget (probes cut
        nearest-first once cumulative list sizes reach the budget,
        crossing list included — planned from cached per-list counts, so
        the pruned scan never reads the skipped partitions)."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IMIPQIndex.search",
            d=2 * self.sub_centroids.shape[2],
            fallback=lambda: pq_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
                polysemous_ht=polysemous_ht, max_codes=max_codes,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        probes = IMIIVFIndex(sub_centroids=self.sub_centroids)._probe(Q, nprobe)
        if max_codes is not None:
            sizes = _list_sizes(self)
            cum = np.cumsum(sizes[probes], axis=1)
            keep = np.concatenate(
                [np.ones((len(probes), 1), bool), cum[:, :-1] < max_codes],
                axis=1,
            )
            probes = [probes[qi][keep[qi]] for qi in range(len(probes))]
            probed_lists = sorted(
                {int(c) for p in probes for c in p}
            )
        else:
            probed_lists = sorted({int(c) for c in probes.ravel()})
        list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(len(qids)):
            for c in probes[qi]:
                list_to_q[int(c)].append(qi)
        bc = spark.sparkContext.broadcast(
            (
                qids,
                Q,
                self.sub_centroids,
                self.pq.codebooks,
                {c: np.asarray(v, np.int64) for c, v in list_to_q.items()},
            )
        )
        k_ = k
        ht = polysemous_ht
        ksub_c = self.ksub
        pruned = self.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_code_groups

            qids_, Q_, sub_c, books, l2q = bc.value
            M, ksub, dsub = books.shape
            dd = (books * books).sum(2)  # (M, ksub), hoisted per task
            pqm_ = ProductQuantizerModel(codebooks=books) if ht is not None else None
            pop8 = (
                np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)
                .sum(1)
                .astype(np.int64)
            )
            t3 = np.empty((len(Q_), M, ksub), np.float64)
            have_t3 = np.zeros(len(Q_), bool)
            acc: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}
            for list_no, codes, ids in arrow_code_groups(batches):
                qsel = l2q.get(list_no)
                if qsel is None or len(qsel) == 0:
                    continue
                need = qsel[~have_t3[qsel]]
                if len(need):
                    Qs = Q_[need].reshape(len(need), M, dsub)
                    t3[need] = -2.0 * np.einsum("qmd,mkd->qmk", Qs, books)
                    have_t3[need] = True
                codes = _pq_code_view(codes, M)
                i, j = list_no // ksub_c, list_no % ksub_c
                c = np.concatenate([sub_c[0][i], sub_c[1][j]])
                # per-LIST precomputed term (lazy — 2^(2b) cells are
                # never materialized up front)
                Cs = c.reshape(M, dsub)
                pct_l = dd + 2.0 * np.einsum("md,mkd->mk", Cs, books)
                R = Q_[qsel] - c[None, :]
                coarse = (R * R).sum(1)
                luts = pct_l[None, :, :] + t3[qsel]
                D = np.broadcast_to(
                    coarse[:, None], (len(qsel), len(codes))
                ).copy()
                for m in range(M):
                    D += luts[:, m, codes[:, m].astype(np.int64)]
                if pqm_ is not None:
                    # per-list residual query codes → Hamming prune
                    # (faiss/IndexIVFPQ.h:44 polysemous_ht)
                    qc = pqm_.encode_np(R)
                    ham = np.zeros(D.shape, np.int64)
                    for m in range(M):
                        ham += pop8[
                            np.bitwise_xor(qc[:, m][:, None], codes[None, :, m])
                        ]
                    # strict keep hd < ht, as the reference (IndexIVFPQ.cpp /
                    # IndexPQ.cpp `if (hd < ht)`); ht > M*8 keeps everything
                    D[ham >= ht] = np.inf
                if list_no not in acc:
                    acc[list_no] = TopKAccumulator(len(qsel), k_, largest=False)
                    qsels[list_no] = qsel
                acc[list_no].push(D, ids)
            for key, a in acc.items():
                qidx, nid, nd = a.emit()
                fin = np.isfinite(nd)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids_[qsels[key][qidx[fin]]], pa.int64()),
                        pa.array(nid[fin], pa.int64()),
                        pa.array(nd[fin], pa.float64()),
                    ],
                    names=["qid", "id", "dist"],
                )

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )


def train_imi(
    vectors: DataFrame,
    k: int,
    vec_col: str = "vec",
    seed: int = 1234,
    niter: int = 15,
) -> np.ndarray:
    """Train the two half-space codebooks of an IMI2x coarse quantizer:
    independent k-means per dimension half (reference MultiIndexQuantizer
    training). Returns (2, k, d/2)."""
    from faiss_spark.operators.codecs import _kmeans_np, _sampled_matrix

    X = _sampled_matrix(vectors, vec_col, 65536, seed)
    d = X.shape[1]
    if d % 2:
        raise ValueError(f"IMI needs even d, got {d}")
    dsub = d // 2
    out = np.empty((2, min(k, len(X)), dsub), np.float64)
    for h in range(2):
        C, _ = _kmeans_np(X[:, h * dsub : (h + 1) * dsub], k, niter, seed + h)
        out[h] = C
    return out


@dataclass
class IVFPQRIndex:
    """IVFPQ + re-rank — the IVFPQR pattern (reference
    faiss/IndexIVFPQR.h:19: a second refinement stage re-ranks k·k_factor
    ADC candidates). Two rerank modes:

    - ``rerank='raw'`` (default when a raw table exists): EXACT
      raw-vector distance via refine_search — strictly dominates the
      reference's PQR residual codes whenever the raw table is kept.
    - ``rerank='pqr_codes'``: the reference's own second-stage — a
      refine PQ (``M_refine`` sub-quantizers) trained on the SECOND
      level residual x − centroid − pq1_decode(code1) (reference
      IndexIVFPQR.cpp train_residual/add_core), stored as an extra
      ``rcode`` column of the codes table. At 100 TB this is the mode
      PQR exists for: the raw vectors are NOT kept, and the index is
      (M + M_refine) bytes/row instead of 4·d.

    pqr_codes search plan (one pass, partition-pruned, no raw-vector
    column anywhere): stage A probes on the driver; one Arrow-native scan
    per probed cell computes the ADC estimate for every code, shortlists
    the per-cell top k·k_factor by ADC (the reference shortlists the
    GLOBAL top k·k_factor — per-cell is a superset, so refined quality
    is ≥ the reference's), decodes pq1 + refine_pq for the shortlist
    only, and re-ranks by ‖(q − c) − (ŷ₁ + ŷ₂)‖²; then the global
    window top-k. Refine decode cost is O(k·k_factor·d) per
    (query, probed cell) — the reference's n_refine discipline
    (IndexIVFPQR.cpp:130-184)."""

    ivfpq: IVFPQIndex
    vectors: DataFrame | None = None
    k_factor: int = 4
    refine_pq: ProductQuantizerModel | None = None

    @staticmethod
    def train(
        vectors: DataFrame, nlist: int, M: int = 8, k_factor: int = 4,
        seed: int = 1234, M_refine: int | None = None,
        nbits_refine: int = 8, pq_niter: int = 15, vec_col: str = "vec",
        id_col: str = "id", **kw,
    ) -> "IVFPQRIndex":
        """Train coarse + PQ1 (+ refine PQ on 2nd-level residuals when
        M_refine is set), then encode. With M_refine the add pass writes
        (list_no, id, code, rcode) in ONE Arrow-native map pass — the raw vectors
        are never needed again after this pass."""
        base = IVFPQIndex.train(
            vectors, nlist=nlist, M=M, seed=seed, pq_niter=pq_niter,
            vec_col=vec_col, **kw,
        )
        if M_refine is None:
            base.add(vectors, id_col=id_col, vec_col=vec_col)
            return IVFPQRIndex(ivfpq=base, vectors=vectors, k_factor=k_factor)

        from faiss_spark.operators.codecs import _kmeans_np, _sampled_matrix

        # refine PQ trained on 2nd-level residuals of a seeded sample
        # (reference IndexIVFPQR.cpp:50-66 train_residual)
        C = base.centroids
        X = _sampled_matrix(vectors, vec_col, 65536, seed)
        d = X.shape[1]
        if d % M_refine:
            raise ValueError(f"d={d} not divisible by M_refine={M_refine}")
        d2 = (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
        lists = d2.argmin(1)
        r1 = X - C[lists]
        r2 = r1 - base.pq.decode_np(base.pq.encode_np(r1))
        dsub = d // M_refine
        ksub = min(1 << nbits_refine, len(r2))
        books = np.empty((M_refine, ksub, dsub), np.float64)
        for m in range(M_refine):
            books[m], _ = _kmeans_np(
                r2[:, m * dsub : (m + 1) * dsub], ksub, pq_niter, seed + 101 + m
            )
        idx = IVFPQRIndex(
            ivfpq=base, vectors=vectors, k_factor=k_factor,
            refine_pq=ProductQuantizerModel(codebooks=books),
        )
        idx._add_with_refine(vectors, id_col=id_col, vec_col=vec_col)
        return idx

    def _add_with_refine(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFPQRIndex":
        """Encode list assignment, PQ1 code AND refine code in one
        map-only pass (reference IndexIVFPQR::add_core: add_core_o keeps
        residual_2, refine_pq.compute_codes on it)."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(
            (self.ivfpq.centroids, self.ivfpq.pq.codebooks,
             self.refine_pq.codebooks)
        )

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            C, books1, books2 = bc.value
            pq1 = ProductQuantizerModel(codebooks=books1)
            pq2 = ProductQuantizerModel(codebooks=books2)
            cn = (C * C).sum(1)
            for ids, X, _ in arrow_id_vec_blocks(batches):
                d2 = (X * X).sum(1)[:, None] + cn[None, :] - 2.0 * (X @ C.T)
                lists = d2.argmin(1)
                r1 = X - C[lists]
                c1 = pq1.encode_np(r1)
                r2 = r1 - pq1.decode_np(c1)
                c2 = pq2.encode_np(r2)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(lists.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(list(map(bytes, c1)), pa.binary()),
                        pa.array(list(map(bytes, c2)), pa.binary()),
                    ],
                    names=["list_no", "id", "code", "rcode"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        codes = src.mapInArrow(
            enc, schema="list_no int, id bigint, code binary, rcode binary"
        )
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy(
                "list_no"
            ).parquet(path)
            codes = spark.read.parquet(path)
            self.ivfpq.path = path
        # IVFPQIndex.search selects (list_no, id, code) explicitly, so the
        # extra rcode column rides along harmlessly for ADC-only search
        self.ivfpq.codes = codes
        return self

    def search(
        self, queries: DataFrame, k: int, nprobe: int = 1,
        rerank: str | None = None, qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        if rerank is None:
            rerank = "raw" if self.vectors is not None else "pqr_codes"
        if rerank == "raw":
            from faiss_spark.operators.refine import refine_search

            if self.vectors is None:
                raise ValueError(
                    "rerank='raw' needs the raw-vector table; this index "
                    "was built codes-only — use rerank='pqr_codes'"
                )
            cands = self.ivfpq.search(
                queries, k * self.k_factor, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            )
            return refine_search(cands, self.vectors, queries, k)
        if rerank != "pqr_codes":
            raise ValueError(f"unknown rerank mode {rerank!r}")
        if self.refine_pq is None:
            raise ValueError(
                "rerank='pqr_codes' needs a refine PQ; train with M_refine"
            )
        return self._search_pqr_codes(queries, k, nprobe, qid_col, qvec_col)

    def _search_pqr_codes(
        self, queries: DataFrame, k: int, nprobe: int,
        qid_col: str, qvec_col: str,
    ) -> DataFrame:
        base = self.ivfpq
        if base.codes is None:
            raise ValueError("index has no codes table; call train() first")
        spark = base.codes.sparkSession
        nlist = len(base.centroids)
        nprobe = min(nprobe, nlist)
        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFPQRIndex.search",
            d=base.centroids.shape[1],
            fallback=lambda: pqr_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        CD = pairwise_distances(Q, base.centroids, "l2")
        probes = np.argsort(CD, axis=1, kind="stable")[:, :nprobe]
        probed_lists = sorted({int(c) for c in probes.ravel()})
        list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(len(qids)):
            for c in probes[qi]:
                list_to_q[int(c)].append(qi)
        bc = spark.sparkContext.broadcast(
            (
                qids, Q, base.centroids, base.pq.codebooks,
                self.refine_pq.codebooks,
                {c: np.asarray(v, np.int64) for c, v in list_to_q.items()},
            )
        )
        k_, kf = k, self.k_factor
        pruned = base.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_binary_matrix

            qids_, Q_, C, books1, books2, l2q = bc.value
            pq1 = ProductQuantizerModel(codebooks=books1)
            pq2 = ProductQuantizerModel(codebooks=books2)
            M, _, dsub = books1.shape
            acc: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}

            def groups():
                # two binary payloads per row (code, rcode) — same
                # group-bounds discipline as kernels.arrow_code_groups
                for b in batches:
                    if b.num_rows == 0:
                        continue
                    lists = np.asarray(
                        b.column(0).to_numpy(zero_copy_only=False), np.int64
                    )
                    ids_all = np.asarray(
                        b.column(1).to_numpy(zero_copy_only=False), np.int64
                    )
                    c1 = arrow_binary_matrix(b.column(2))
                    c2 = arrow_binary_matrix(b.column(3))
                    if lists[0] == lists[-1] and (lists == lists[0]).all():
                        yield int(lists[0]), c1, c2, ids_all
                        continue
                    order = np.argsort(lists, kind="stable")
                    sl = lists[order]
                    bounds = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1], True])
                    for st, en in zip(bounds[:-1], bounds[1:]):
                        rows = order[st:en]
                        yield int(sl[st]), c1[rows], c2[rows], ids_all[rows]

            for list_no, codes1, codes2, ids in groups():
                qsel = l2q.get(list_no)
                if qsel is None or len(qsel) == 0:
                    continue
                codes1 = _pq_code_view(codes1, M)
                codes2 = _pq_code_view(codes2, books2.shape[0])
                R = Q_[qsel] - C[list_no][None, :]
                Rs = R.reshape(len(R), M, dsub)
                luts = (
                    (Rs * Rs).sum(2)[:, :, None]
                    + (books1 * books1).sum(2)[None, :, :]
                    - 2.0 * np.einsum("qmd,mkd->qmk", Rs, books1)
                )
                D = np.zeros((len(R), len(codes1)), np.float64)
                for m in range(M):
                    D += luts[:, m, codes1[:, m].astype(np.int64)]
                # per-query ADC shortlist of this chunk
                s = min(len(codes1), k_ * kf)
                if s < len(codes1):
                    short = np.argpartition(D, s - 1, axis=1)[:, :s]
                else:
                    short = np.broadcast_to(
                        np.arange(len(codes1)), (len(R), len(codes1))
                    )
                # decode pq1 + refine for the union of shortlisted rows
                uni = np.unique(short.ravel())
                Y = pq1.decode_np(codes1[uni]) + pq2.decode_np(codes2[uni])
                pos = np.full(len(codes1), -1, np.int64)
                pos[uni] = np.arange(len(uni))
                # refined distances, shortlist only; everything else +inf
                DR = np.full_like(D, np.inf)
                for qi in range(len(R)):
                    sel = short[qi]
                    diff = R[qi][None, :] - Y[pos[sel]]
                    DR[qi, sel] = (diff * diff).sum(1)
                if list_no not in acc:
                    acc[list_no] = TopKAccumulator(len(qsel), k_, largest=False)
                    qsels[list_no] = qsel
                acc[list_no].push(DR, ids)
            for key, a in acc.items():
                qidx, nid, nd = a.emit()
                keep = np.isfinite(nd)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids_[qsels[key][qidx[keep]]], pa.int64()),
                        pa.array(nid[keep], pa.int64()),
                        pa.array(nd[keep], pa.float64()),
                    ],
                    names=["qid", "id", "dist"],
                )

        cands = pruned.select("list_no", "id", "code", "rcode").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("dist").asc(), F.col("id").asc()
        )
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )

    def save(self, path: str) -> "IVFPQRIndex":
        """write_index: the base IVFPQ layout (codes table including the
        rcode column when M_refine was used) + refine-PQ artifacts. The
        raw-vector table is deliberately NOT persisted — a reloaded index
        is codes-only and searches in the reference's own
        rerank='pqr_codes' mode (the 100 TB shape); re-attach ``vectors``
        after load to recover the exact raw rerank."""
        self.ivfpq.save(path)
        spark = self.ivfpq.codes.sparkSession
        if self.refine_pq is not None:
            fsio.write_npy(
                spark,
                os.path.join(path, "_ivfpqr_refine_codebooks.npy"),
                self.refine_pq.codebooks,
            )
        fsio.write_json(spark, os.path.join(path, "_ivfpqr_meta.json"), {"k_factor": int(self.k_factor)})
        return self

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFPQRIndex":
        meta = fsio.read_json(spark, os.path.join(path, "_ivfpqr_meta.json"))
        rp = os.path.join(path, "_ivfpqr_refine_codebooks.npy")
        refine = (
            ProductQuantizerModel(codebooks=fsio.read_npy(spark, rp))
            if fsio.exists(spark, rp)
            else None
        )
        return IVFPQRIndex(
            ivfpq=IVFPQIndex.load(spark, path),
            vectors=None,
            k_factor=meta["k_factor"],
            refine_pq=refine,
        )


@dataclass
class TwoLayerCodes:
    """Index2Layer (reference faiss/Index2Layer.h:29): IVFPQ-style codes
    stored FLAT — (id, list_no, code) without list partitioning — for
    random-access reconstruction (it exists in faiss to feed HNSW's
    storage). On Spark random access is a join on id, so the value here
    is the codec: reconstruct(id) = centroid[list_no] + pq_decode(code)."""

    centroids: np.ndarray
    pq: ProductQuantizerModel
    codes: DataFrame | None = None

    @staticmethod
    def from_ivfpq(idx: IVFPQIndex) -> "TwoLayerCodes":
        """Re-layout an IVFPQ index's codes flat (the reference builds
        Index2Layer from a trained IVFPQ the same way)."""
        return TwoLayerCodes(
            centroids=idx.centroids, pq=idx.pq,
            codes=idx.codes.select("id", "list_no", "code"),
        )

    def reconstruct(self, ids: list[int]) -> DataFrame:
        """Random-access decode: join on id, add back the cell centroid."""
        spark = self.codes.sparkSession
        bc = spark.sparkContext.broadcast((self.centroids, self.pq.codebooks))

        def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C, books = bc.value
            pqm = ProductQuantizerModel(codebooks=books)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                codes = np.stack([np.frombuffer(c, np.uint8) for c in pdf["code"]])
                X = pqm.decode_np(codes) + C[pdf["list_no"].to_numpy(np.int64)]
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy(np.int64),
                        "vec": list(X.astype(np.float32)),
                    }
                )

        sel = self.codes.filter(F.col("id").isin(ids))
        return sel.mapInPandas(dec, schema="id bigint, vec array<float>")


class IVFSpectralHash:
    """IVF + per-list spectral-hash binary codes scanned with Hamming
    (reference IndexIVFSpectralHash, faiss/IndexIVFSpectralHash.h:31-86,
    faiss/IndexIVFSpectralHash.cpp:70-207). The trained pipeline:

      1. a linear transform ``vt`` maps d → nbit dims (random rotation by
         default, PCA optionally — the reference's replace_vt hook);
      2. per-list thresholds ``trained`` per threshold_type:
         'global' (c = 0), 'centroid' (vt(centroid)), 'centroid_half'
         (vt(centroid) − period/4), 'median' (per-list per-bit median of
         the transformed training sample);
      3. periodic binarization (cpp:146 binarize_with_freq):
         bit_j = int64(floor((x_j − c_j) · 2/period)) & 1.

    The query code is list-DEPENDENT (scanner.set_list re-binarizes the
    query against each probed list's thresholds, cpp:244-258), so the
    probe table carries one qcode per (query, probed list)."""

    def __init__(
        self,
        centroids: np.ndarray,
        A: np.ndarray,
        b: np.ndarray | None,
        trained: np.ndarray | None,
        period: float,
        threshold_type: str = "global",
    ):
        self.centroids = centroids
        self.A = A  # (nbit, d) vt matrix
        self.b = b  # (nbit,) vt bias or None
        self.trained = trained  # (nlist, nbit) thresholds or None (global)
        self.period = period
        self.threshold_type = threshold_type
        self.codes: DataFrame | None = None

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        nbit: int | None = None,
        period: float = 1.0,
        threshold_type: str = "global",
        transform: str = "rr",
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 10,
    ) -> "IVFSpectralHash":
        from faiss_spark.operators.codecs import _sampled_matrix
        from faiss_spark.operators.transforms import (
            PCAMatrix,
            random_rotation_matrix,
        )

        if threshold_type not in ("global", "centroid", "centroid_half", "median"):
            raise ValueError(f"unknown threshold_type {threshold_type!r}")
        km = KMeans(k=nlist, niter=niter, seed=seed).fit(vectors, vec_col=vec_col)
        d = km.centroids.shape[1]
        nbit = nbit if nbit is not None else d
        if transform == "pca":
            m = PCAMatrix(d_out=nbit, seed=seed).fit(vectors, vec_col=vec_col)
            A, b = m.A, m.b
        elif transform == "pcar":
            m = PCAMatrix(d_out=nbit, random_rotation=True, seed=seed).fit(
                vectors, vec_col=vec_col
            )
            A, b = m.A, m.b
        elif transform == "itq":
            # reference parse '(ITQ|PCA|PCAR)<d'>,SH...' replace_vt with
            # ITQTransform(d, outdim, do_pca = d != outdim)
            # (index_factory.cpp:398-404): PCA to nbit when reducing,
            # then the ITQ sign-procrustes rotation — composed here on
            # the same driver sample the standalone estimators use
            X = _sampled_matrix(vectors, vec_col, 65536, seed)
            A0, b0, Xp = None, None, X
            if nbit != d:
                mu = X.mean(0)
                _, _, Vt = np.linalg.svd(X - mu, full_matrices=False)
                A0, b0 = Vt[:nbit], -(Vt[:nbit] @ mu)
                Xp = (X - mu) @ A0.T
            Xp = Xp - Xp.mean(0)
            R = random_rotation_matrix(Xp.shape[1], seed)
            for _ in range(50):
                B = np.sign(Xp @ R)
                B[B == 0] = 1.0
                U2, _, V2 = np.linalg.svd(Xp.T @ B, full_matrices=False)
                R = U2 @ V2
            A = R.T @ A0 if A0 is not None else R.T
            b = (R.T @ b0) if b0 is not None else None
        else:  # seeded random rotation, the reference default (cpp:36-39)
            if nbit > d:
                raise ValueError(f"nbit={nbit} > d={d} needs transform='pca'")
            A, b = random_rotation_matrix(d, seed)[:nbit], None
        trained = None
        if threshold_type in ("centroid", "centroid_half"):
            trained = km.centroids @ A.T
            if b is not None:
                trained = trained + b
            if threshold_type == "centroid_half":
                trained = trained - 0.25 * period
        elif threshold_type == "median":
            X = _sampled_matrix(vectors, vec_col, 65536, seed)
            d2 = (
                (X * X).sum(1)[:, None]
                + (km.centroids * km.centroids).sum(1)[None, :]
                - 2.0 * (X @ km.centroids.T)
            )
            lists = d2.argmin(1)
            Xt = X @ A.T + (b if b is not None else 0.0)
            trained = np.zeros((nlist, nbit))
            for lno in range(nlist):
                sel = Xt[lists == lno]
                if len(sel):
                    trained[lno] = np.median(sel, axis=0)
        return IVFSpectralHash(
            centroids=km.centroids, A=A, b=b, trained=trained,
            period=period, threshold_type=threshold_type,
        )

    def _binarize(self, Xt: np.ndarray, lists: np.ndarray) -> np.ndarray:
        """binarize_with_freq over transformed rows with each row's list
        thresholds (cpp:146-158)."""
        c = 0.0 if self.trained is None else self.trained[lists]
        freq = 2.0 / self.period
        return (np.floor((Xt - c) * freq).astype(np.int64)) & 1

    def add(self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"):
        from faiss_spark.operators.binary import _bits_to_words

        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(self)

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            idx = bc.value
            C = idx.centroids
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = as_matrix(pdf["vec"])
                d2 = (
                    (X * X).sum(1)[:, None]
                    + (C * C).sum(1)[None, :]
                    - 2.0 * (X @ C.T)
                )
                lists = d2.argmin(1)
                Xt = X @ idx.A.T + (idx.b if idx.b is not None else 0.0)
                words = _bits_to_words(idx._binarize(Xt, lists))
                yield pd.DataFrame(
                    {
                        "list_no": lists.astype(np.int32),
                        "id": pdf["id"].to_numpy(np.int64),
                        "code": list(words),
                    }
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        self.codes = src.mapInPandas(
            enc, schema="list_no int, id bigint, code array<bigint>"
        )
        return self

    def save(self, path: str) -> None:
        """Persist codes (partitioned by list) + model artifacts."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        fsio.write_npy(spark, os.path.join(path, "_sh_centroids.npy"), self.centroids)
        fsio.write_npy(spark, os.path.join(path, "_sh_A.npy"), self.A)
        if self.b is not None:
            fsio.write_npy(spark, os.path.join(path, "_sh_b.npy"), self.b)
        if self.trained is not None:
            fsio.write_npy(spark, os.path.join(path, "_sh_trained.npy"), self.trained)
        fsio.write_json(spark, os.path.join(path, "_sh_meta.json"), {"period": self.period, "threshold_type": self.threshold_type})

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFSpectralHash":
        meta = fsio.read_json(spark, os.path.join(path, "_sh_meta.json"))

        def opt(name):
            p = os.path.join(path, name)
            return fsio.read_npy(spark, p) if fsio.exists(spark, p) else None

        idx = IVFSpectralHash(
            centroids=fsio.read_npy(spark, os.path.join(path, "_sh_centroids.npy")),
            A=fsio.read_npy(spark, os.path.join(path, "_sh_A.npy")),
            b=opt("_sh_b.npy"),
            trained=opt("_sh_trained.npy"),
            period=meta["period"],
            threshold_type=meta["threshold_type"],
        )
        idx.codes = spark.read.parquet(path)
        return idx

    def search(
        self, queries: DataFrame, k: int, nprobe: int = 1,
        qid_col: str = "qid", qvec_col: str = "vec",
    ) -> DataFrame:
        """Coarse L2 probes + Hamming scan over binarized codes (JVM bit
        ops after the partition-pruned join). A query side past the
        driver bound auto-falls-back to ``sh_search_preassigned``,
        which builds the per-(query, probed-list) qcodes executor-side
        and joins without collecting."""
        from faiss_spark.operators.binary import _bits_to_words, hamming_expr

        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFSpectralHash.search",
            d=self.centroids.shape[1],
            fallback=lambda: sh_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        CD = pairwise_distances(Q, self.centroids, "l2")
        nprobe_ = min(nprobe, len(self.centroids))
        order = np.argsort(CD, axis=1, kind="stable")[:, :nprobe_]
        probed = sorted({int(c) for c in order.ravel()})
        Qt = Q @ self.A.T + (self.b if self.b is not None else 0.0)
        # per-(query, probed list) code: the scanner re-binarizes the query
        # against each list's thresholds (cpp:244-258)
        flat_lists = order.ravel()
        qwords = _bits_to_words(
            self._binarize(np.repeat(Qt, nprobe_, axis=0), flat_lists)
        )
        probe_rows = [
            (
                int(qids[i]),
                [int(w) for w in qwords[i * nprobe_ + j]],
                int(order[i, j]),
            )
            for i in range(len(qids))
            for j in range(nprobe_)
        ]
        probes = spark.createDataFrame(
            probe_rows, "qid bigint, qcode array<bigint>, list_no int"
        )
        pruned = self.codes.filter(F.col("list_no").isin(probed))
        joined = pruned.join(F.broadcast(probes), "list_no").select(
            "qid",
            "id",
            hamming_expr(F.col("code"), F.col("qcode")).cast("double").alias("dist"),
        )
        w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
        return (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "id", "dist", "rank")
        )


def sh_search_preassigned(
    index: "IVFSpectralHash",
    queries: DataFrame,
    k: int,
    nprobe: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """Distributed big-batch twin of IVFSpectralHash.search: probe
    selection AND the per-(query, probed-list) periodic binarization
    (the scanner.set_list re-binarization, cpp:244-258) run
    executor-side over broadcast artifacts, emitting the same
    (qid, qcode, list_no) probe rows the driver path builds — then the
    identical partition-pruned Hamming join, with the probe side
    shuffled on list_no instead of broadcast (the query side is huge by
    assumption)."""
    from faiss_spark.operators.binary import _bits_to_words, hamming_expr

    if index.codes is None:
        raise ValueError("index has no codes table; call add() first")
    spark = queries.sparkSession
    nprobe_ = min(nprobe, len(index.centroids))
    shell = IVFSpectralHash(
        centroids=index.centroids, A=index.A, b=index.b,
        trained=index.trained, period=index.period,
        threshold_type=index.threshold_type,
    )
    bc = spark.sparkContext.broadcast(shell)

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        idx = bc.value
        C = idx.centroids
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = as_matrix(pdf["vec"])
            CD = (
                (Q * Q).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (Q @ C.T)
            )
            order = np.argsort(CD, axis=1, kind="stable")[:, :nprobe_]
            Qt = Q @ idx.A.T + (idx.b if idx.b is not None else 0.0)
            qwords = _bits_to_words(
                idx._binarize(np.repeat(Qt, nprobe_, axis=0), order.ravel())
            )
            rep = np.repeat(np.arange(len(Q)), nprobe_)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(np.int64)[rep],
                    "qcode": [
                        [int(w) for w in row] for row in qwords
                    ],
                    "list_no": order.astype(np.int32).ravel(),
                }
            )

    q = queries.select(
        F.col(qid_col).cast("bigint").alias("qid"), F.col(qvec_col).alias("vec")
    )
    probes = q.mapInPandas(
        assign, schema="qid bigint, qcode array<bigint>, list_no int"
    ).localCheckpoint(eager=False)
    pruned = index.codes.join(
        probes.select("list_no").distinct().hint("broadcast"),
        "list_no",
        "left_semi",
    )
    joined = pruned.join(probes, "list_no").select(
        "qid",
        "id",
        hamming_expr(F.col("code"), F.col("qcode")).cast("double").alias("dist"),
    )
    return _window_topk(joined, k, largest=False)


@dataclass
class IVFAQIndex:
    """IVF + additive-quantizer (residual-quantizer) codes on residuals —
    the reference IndexIVFAdditiveQuantizer family
    (faiss/IndexIVFAdditiveQuantizer.h:26,64 — IVFRQ is the default
    variant; by_residual=true default there too).

    Layout is the standard partitioned-table pattern: codes table
    (list_no, id, code BINARY) where code = RQ beam-search encoding of
    x − centroid[list_no]. Search is asymmetric: the per-list scan
    gather-sums the M codebook rows (AdditiveQuantizer decode,
    faiss/impl/AdditiveQuantizer.h:25), re-adds the list centroid, and
    GEMMs against the exact queries — same plan shape (partition-pruned
    scan + one candidate merge) as IVFSQIndex, so the 100 TB posture is
    identical. Encode, scan and reconstruct are Arrow-native
    (mapInArrow + the shared zero-copy group helpers), like the other
    IVF families."""

    centroids: np.ndarray | None  # (nlist, d); None under an additive coarse
    # the additive codec — ResidualQuantizerModel (beam encode) or
    # LocalSearchQuantizerModel (ICM encode); both share the
    # encode_np/decode gather-sum surface the scan rides
    rq: object
    metric: str = "l2"
    codes: DataFrame | None = None
    path: str | None = None
    # '_N*' stored-norm search type (reference AdditiveQuantizer
    # search_type): None = ST_decompress (exact decoded distances);
    # "none" = ST_LUT_nonorm; else an AQNormQuantizer kind — the scan
    # then ranks by ‖q‖² − 2⟨q,x̂⟩ + N(‖x̂‖²)
    search_type: str | None = None
    norm_q: object | None = None
    # additive coarse quantizer (reference IVF<n>(RCQ<M>x<b>),RQ<spec> —
    # its own tests/test_residual_quantizer.py:586): a fitted
    # ResidualCoarseQuantizerModel replaces the k-means centroids;
    # residuals are against its VIRTUAL centroids (beam reconstruct)
    coarse_q: object | None = None

    @property
    def nlist(self) -> int:
        return (
            self.coarse_q.nlist
            if self.coarse_q is not None
            else len(self.centroids)
        )

    @property
    def d(self) -> int:
        return (
            self.coarse_q.codebooks.shape[2]
            if self.coarse_q is not None
            else self.centroids.shape[1]
        )

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int,
        M: int = 8,
        beam: int = 4,
        metric: str = "l2",
        vec_col: str = "vec",
        seed: int = 1234,
        niter: int = 20,
        rq_niter: int = 15,
        nbits: int | list = 8,
        lsq: bool = False,
        search_type: str | None = None,
        coarse_q: object | None = None,
    ) -> "IVFAQIndex":
        """train_q1 (coarse k-means, or a caller-fitted additive coarse)
        then RQ (greedy residual k-means) or LSQ (ICM + least-squares,
        ``lsq=True``) codebooks on residuals of the training sample
        (reference IndexIVFAdditiveQuantizer::train_residual;
        IVF<n>,LSQ<M>x<b> → IndexIVFLocalSearchQuantizer,
        index_factory.cpp:336-350)."""
        from faiss_spark.operators.codecs import (
            AQNormQuantizer,
            LocalSearchQuantizer,
            ResidualQuantizerModel,
            _kmeans_np,
            _normalize_nbits,
            _padded_books,
            _sampled_matrix,
        )

        if coarse_q is not None:
            if metric != "l2":
                raise ValueError(
                    "additive coarse quantizers rank by squared L2, "
                    f"got metric={metric!r}"
                )
            if coarse_q.nlist != nlist:
                raise ValueError(
                    f"coarse_q spans {coarse_q.nlist} virtual cells, "
                    f"expected nlist={nlist}"
                )
            C = None
            X = _sampled_matrix(vectors, vec_col, 65536, seed)
            assign = coarse_q.assign_np(X)
            resid = X - coarse_q.reconstruct_np(assign)
        else:
            km = KMeans(
                k=nlist, niter=niter, seed=seed, spherical=(metric == "cosine")
            ).fit(vectors, vec_col=vec_col)
            C = km.centroids
            X = _sampled_matrix(vectors, vec_col, 65536, seed)
            d2 = (
                (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
            )
            assign = d2.argmin(1)
            resid = X - C[assign]
        bits = _normalize_nbits(nbits, M)
        if lsq:
            if len(set(bits)) != 1:
                raise ValueError("LSQ takes one uniform bit width")
            codec = LocalSearchQuantizer(
                M=M, nbits=bits[0], niter_init=rq_niter, seed=seed
            ).fit_np(resid)
        else:
            books = []
            r = resid.copy()
            for m in range(M):
                ksub = min(1 << bits[m], len(resid))
                Cb, labels = _kmeans_np(r, ksub, rq_niter, seed + m)
                books.append(Cb)
                r = r - Cb[labels]
            codec = ResidualQuantizerModel(
                codebooks=_padded_books(books, X.shape[1]), beam=beam
            )
        norm_q = None
        if search_type not in (None, "none"):
            # reconstruction norms INCLUDE the centroid (the estimator's
            # ‖x̂‖² term is of the full reconstruction)
            base = (
                coarse_q.reconstruct_np(assign)
                if coarse_q is not None
                else C[assign]
            )
            Xh = base + codec.decode_np(codec.encode_np(resid))
            norm_q = AQNormQuantizer(search_type).fit_np((Xh * Xh).sum(1))
        return IVFAQIndex(
            centroids=C,
            rq=codec,
            metric=metric,
            search_type=search_type,
            norm_q=norm_q,
            coarse_q=coarse_q,
        )

    def add(
        self,
        vectors: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        path: str | None = None,
    ) -> "IVFAQIndex":
        spark = vectors.sparkSession
        codes = self._encode_df(vectors, id_col=id_col, vec_col=vec_col)
        if path is not None:
            codes.repartition("list_no").write.mode("overwrite").partitionBy("list_no").parquet(path)
            self._save_artifact(spark, path)
            self.codes = spark.read.parquet(path)
            self.path = path
        else:
            self.codes = codes
        return self

    def _encode_df(
        self, vectors: DataFrame, id_col: str = "id", vec_col: str = "vec"
    ) -> DataFrame:
        """Frozen-artifact encode to (list_no, id, code) rows — map-only,
        shared by add() and the streaming incremental writer."""
        spark = vectors.sparkSession
        bc = spark.sparkContext.broadcast(
            (self.centroids, self.coarse_q, self.rq, self.metric)
        )

        def enc(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_id_vec_blocks

            # the codec model travels whole: beam encode for RQ, ICM for
            # LSQ — _encode_df must use the codec's OWN encoder
            C, cq, rqm, metric = bc.value
            for ids, X, _ in arrow_id_vec_blocks(batches):
                if cq is not None:
                    # additive coarse: beam assign + residual against the
                    # VIRTUAL centroid (reconstruct of the assigned cell)
                    lists = cq.assign_np(X)
                    base = cq.reconstruct_np(lists)
                else:
                    D = pairwise_distances(X, C, metric)
                    lists = (
                        np.argmax(D, 1)
                        if metric in SIMILARITY_METRICS
                        else np.argmin(D, 1)
                    )
                    base = C[lists]
                codes = rqm.encode_np(X - base)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(lists.astype(np.int32), pa.int32()),
                        pa.array(ids, pa.int64()),
                        pa.array(list(map(bytes, codes)), pa.binary()),
                    ],
                    names=["list_no", "id", "code"],
                )

        src = vectors.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(vec_col).alias("vec")
        )
        return src.mapInArrow(enc, schema="list_no int, id bigint, code binary")

    def _save_artifact(self, spark, path: str) -> None:
        if self.coarse_q is not None:
            fsio.write_npy(
                spark,
                os.path.join(path, "_ivfaq_rcq_codebooks.npy"),
                self.coarse_q.codebooks,
            )
        else:
            fsio.write_npy(
                spark, os.path.join(path, "_ivfaq_centroids.npy"), self.centroids
            )
        fsio.write_npy(spark, os.path.join(path, "_ivfaq_codebooks.npy"), self.rq.codebooks)
        meta = {
            "metric": self.metric,
            "beam": int(getattr(self.rq, "beam", 4)),
            "codec": (
                "lsq" if type(self.rq).__name__ == "LocalSearchQuantizerModel"
                else "rq"
            ),
            "search_type": self.search_type,
        }
        if self.coarse_q is not None:
            meta["coarse"] = {
                "beam_factor": self.coarse_q.beam_factor,
                "nbits_list": (
                    list(self.coarse_q.nbits_list)
                    if self.coarse_q.nbits_list is not None
                    else None
                ),
            }
        if self.norm_q is not None:
            meta["norm"] = {
                "kind": self.norm_q.kind,
                "min": self.norm_q.norm_min,
                "max": self.norm_q.norm_max,
            }
            if self.norm_q.codebook is not None:
                fsio.write_npy(
                    spark,
                    os.path.join(path, "_ivfaq_norm_codebook.npy"),
                    self.norm_q.codebook,
                )
        fsio.write_json(spark, os.path.join(path, "_ivfaq_meta.json"), meta)

    def save(self, path: str) -> "IVFAQIndex":
        """write_index: partitioned RQ codes + centroid/codebook artifacts."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        self.codes.repartition("list_no").write.mode("overwrite").partitionBy(
            "list_no"
        ).parquet(path)
        self._save_artifact(spark, path)
        self.codes = spark.read.parquet(path)
        self.path = path
        return self

    @staticmethod
    def load(spark: SparkSession, path: str) -> "IVFAQIndex":
        from faiss_spark.operators.codecs import (
            AQNormQuantizer,
            LocalSearchQuantizerModel,
            ResidualQuantizerModel,
        )

        meta = fsio.read_json(spark, os.path.join(path, "_ivfaq_meta.json"))
        books = fsio.read_npy(spark, os.path.join(path, "_ivfaq_codebooks.npy"))
        if meta.get("codec") == "lsq":
            codec = LocalSearchQuantizerModel(codebooks=books)
        else:
            codec = ResidualQuantizerModel(codebooks=books, beam=meta["beam"])
        norm_q = None
        if meta.get("norm"):
            norm_q = AQNormQuantizer(meta["norm"]["kind"])
            norm_q.norm_min = meta["norm"]["min"]
            norm_q.norm_max = meta["norm"]["max"]
            if norm_q.kind not in ("float", "qint8", "qint4"):
                norm_q.codebook = fsio.read_npy(
                    spark, os.path.join(path, "_ivfaq_norm_codebook.npy")
                )
        coarse_q = None
        centroids = None
        if meta.get("coarse"):
            from faiss_spark.operators.codecs import ResidualCoarseQuantizerModel

            cm = meta["coarse"]
            coarse_q = ResidualCoarseQuantizerModel(
                codebooks=fsio.read_npy(
                    spark, os.path.join(path, "_ivfaq_rcq_codebooks.npy")
                ),
                beam_factor=cm["beam_factor"],
                nbits_list=(
                    tuple(cm["nbits_list"]) if cm["nbits_list"] else None
                ),
            )
        else:
            centroids = fsio.read_npy(
                spark, os.path.join(path, "_ivfaq_centroids.npy")
            )
        return IVFAQIndex(
            centroids=centroids,
            coarse_q=coarse_q,
            rq=codec,
            metric=meta["metric"],
            search_type=meta.get("search_type"),
            norm_q=norm_q,
            codes=spark.read.parquet(path),
            path=path,
        )

    def reconstruct(self, ids: DataFrame | None = None) -> DataFrame:
        """Decode stored codes back to approximate vectors:
        centroid[list_no] + Σ codebook[m][code[m]] (sa_decode)."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        bc = spark.sparkContext.broadcast(
            (self.centroids, self.coarse_q, self.rq.codebooks)
        )

        def dec(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_binary_matrix

            C, cq, books = bc.value
            for b in batches:
                if b.num_rows == 0:
                    continue
                lists = np.asarray(
                    b.column(0).to_numpy(zero_copy_only=False), np.int64
                )
                ids_ = np.asarray(
                    b.column(1).to_numpy(zero_copy_only=False), np.int64
                )
                codes = _pq_code_view(
                    arrow_binary_matrix(b.column(2)), books.shape[0]
                )
                X = (
                    cq.reconstruct_np(lists)
                    if cq is not None
                    else C[lists].astype(np.float64)
                )
                for m in range(books.shape[0]):
                    X += books[m][codes[:, m]]
                Xf = np.ascontiguousarray(X, np.float32)
                n, d = Xf.shape
                vec = pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
                    pa.array(Xf.ravel()),
                )
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids_, pa.int64()), vec], names=["id", "vec"]
                )

        src = self.codes
        if ids is not None:
            src = src.join(ids.select("id"), "id", "left_semi")
        return src.select("list_no", "id", "code").mapInArrow(
            dec, schema="id bigint, vec array<float>"
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = 1,
        qid_col: str = "qid",
        qvec_col: str = "vec",
    ) -> DataFrame:
        """Same partition-pruned plan as IVFSQIndex.search; the scan
        decodes AQ codes (gather-sum + centroid) before the GEMM. Under
        an additive coarse, probe selection is the RCQ beam and the
        per-list base vector is the virtual centroid's reconstruction."""
        if self.codes is None:
            raise ValueError("index has no codes table; call add() first")
        spark = self.codes.sparkSession
        nlist = self.nlist
        nprobe = min(nprobe, nlist)
        largest = self.metric in SIMILARITY_METRICS

        collected = collect_queries_bounded(
            queries, qid_col, qvec_col, "IVFAQIndex.search", d=self.d,
            fallback=lambda: aq_search_preassigned(
                self, queries, k, nprobe=nprobe,
                qid_col=qid_col, qvec_col=qvec_col,
            ),
        )
        if isinstance(collected, DataFrame):
            return collected
        qids, Q = collected
        if self.coarse_q is not None:
            probes, _ = self.coarse_q.search_np(Q, nprobe)
        else:
            CD = pairwise_distances(Q, self.centroids, self.metric)
            order = np.argsort(-CD if largest else CD, axis=1, kind="stable")
            probes = order[:, :nprobe]
        probed_lists = sorted({int(c) for c in probes.ravel()})
        list_to_q: dict[int, list[int]] = {c: [] for c in probed_lists}
        for qi in range(len(qids)):
            for c in probes[qi]:
                list_to_q[int(c)].append(qi)
        # '_N*' stored-norm estimator (reference AdditiveQuantizer
        # search_type): rank by ‖q‖² − 2⟨q,x̂⟩ + N(‖x̂‖²) instead of the
        # exact decoded distance. "none" (ST_LUT_nonorm) is N ≡ 0. IP
        # metric never uses the norm term (the LUT similarity is ⟨q,x̂⟩ —
        # identical to the exact path on decoded vectors).
        est = self.search_type is not None and self.metric == "l2"
        bc = spark.sparkContext.broadcast(
            (
                qids,
                Q,
                {c: np.asarray(v, np.int64) for c, v in list_to_q.items()},
                self.centroids,
                self.coarse_q,
                self.rq.codebooks,
                self.norm_q if est else None,
                est,
            )
        )
        metric = self.metric
        k_ = k
        pruned = self.codes.filter(F.col("list_no").isin(probed_lists))

        def scan(batches):
            import pyarrow as pa

            from faiss_spark.kernels import arrow_code_groups

            qids_, Q_, l2q, C, cq, books, norm_q, est_ = bc.value
            acc: dict[int, TopKAccumulator] = {}
            qsels: dict[int, np.ndarray] = {}
            for list_no, codes, ids in arrow_code_groups(batches):
                qsel = l2q.get(list_no)
                if qsel is None or len(qsel) == 0:
                    continue
                # AQ decode: gather-sum the M codebook rows + list centroid
                # (the virtual centroid's reconstruction under an
                # additive coarse — one decode per probed list)
                base = (
                    cq.reconstruct_np(np.asarray([list_no]))[0]
                    if cq is not None
                    else C[list_no]
                )
                codes = _pq_code_view(codes, books.shape[0])
                X = np.broadcast_to(
                    base, (len(codes), len(base))
                ).astype(np.float64)
                for m in range(books.shape[0]):
                    X = X + books[m][codes[:, m]]
                if list_no not in acc:
                    acc[list_no] = TopKAccumulator(
                        len(qsel), k_, metric in SIMILARITY_METRICS
                    )
                    if not est_:
                        acc[list_no].bind_queries(
                            np.ascontiguousarray(Q_[qsel]), metric
                        )
                    qsels[list_no] = qsel
                if est_:
                    n_raw = (X * X).sum(1)
                    n_est = (
                        norm_q.quantize_np(n_raw)
                        if norm_q is not None
                        else np.zeros(len(X))
                    )
                    Qs = np.ascontiguousarray(Q_[qsel], np.float64)
                    D = (
                        (Qs * Qs).sum(1)[:, None]
                        - 2.0 * (Qs @ X.T)
                        + n_est[None, :]
                    )
                    acc[list_no].push(D, ids)
                else:
                    acc[list_no].push_block(X, ids)
            for key, a in acc.items():
                qidx, nid, nd = a.emit()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(qids_[qsels[key][qidx]], pa.int64()),
                        pa.array(nid, pa.int64()),
                        pa.array(nd, pa.float64()),
                    ],
                    names=["qid", "id", "dist"],
                )

        cands = pruned.select("list_no", "id", "code").mapInArrow(
            scan, schema="qid bigint, id bigint, dist double"
        )
        sort = [
            F.col("dist").desc() if largest else F.col("dist").asc(),
            F.col("id").asc(),
        ]
        w = Window.partitionBy("qid").orderBy(*sort)
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_)
            .select("qid", "id", "dist", "rank")
        )
