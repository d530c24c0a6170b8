"""Incremental index maintenance with Structured Streaming — SURVEY §2.K.

Reference analogues: incremental ``add`` to a built index
(faiss/Index.h:107), on-disk invlist append
(faiss/invlists/OnDiskInvertedLists.h:83-104), and the sliding-window
invlist swap of tests/test_sliding_ivf.cpp.

Pattern: trained artifacts (centroids/codebooks) are FROZEN; a stream of
new vectors is encoded with the broadcast artifacts inside foreachBatch
and appended to the partitioned codes table. Searches against the table
see new data on their next run — the same contract as faiss's add (no
retrain). Compaction = rewrite partitions (merge_ondisk analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faiss_spark.operators.cluster import KMeansModel
from faiss_spark.operators.ivf import IVFIndex


def incremental_add_stream(
    index: IVFIndex,
    stream: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str = "id",
    vec_col: str = "vec",
    trigger_available_now: bool = True,
):
    """Attach a streaming writer that encodes each micro-batch with the
    index's frozen centroids and appends to its partitioned codes table.

    Returns the StreamingQuery (caller awaits/stops it)."""
    model = KMeansModel(
        centroids=index.centroids,
        k=len(index.centroids),
        d=index.centroids.shape[1],
        spherical=(index.metric == "cosine"),
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assigned = model.assign(batch_df, vec_col=vec_col, id_col=id_col).select(
            "id", F.col("cluster").alias("list_no")
        )
        codes = (
            batch_df.select(
                F.col(id_col).cast("bigint").alias("id"),
                F.col(vec_col).alias("vec"),
            )
            .join(assigned, "id")
            .select("list_no", "id", "vec")
        )
        codes.write.mode("append").partitionBy("list_no").parquet(path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_codes_table(spark, path: str, target_files_per_list: int = 1) -> None:
    """Rewrite the partitioned codes table to coalesce small append files
    (the merge_ondisk compaction analogue, reference contrib/ondisk.py:13)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    (
        df.repartition(target_files_per_list, "list_no")
        .write.mode("overwrite")
        .partitionBy("list_no")
        .parquet(tmp)
    )
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
