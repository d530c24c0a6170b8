"""Sharded batch NSG: connectivity, recall vs exact, shard-merge and
persistence (reference accuracy pattern: tests/test_index_accuracy.py /
tests/test_graph_based.py NSG rows)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_spark.operators.knn import knn
from faiss_spark.operators.nsg import NSGIndex


@pytest.fixture(scope="module")
def vectors(tables):
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def index(vectors):
    return NSGIndex.build(vectors, R=16, knn_k=24, nshards=2)


def test_nsg_recall_vs_exact(vectors, index):
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}
    got = {
        (r["qid"], r["id"])
        for r in index.search(queries, k=10, search_L=40).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall


def test_nsg_each_query_gets_k_and_self_first(vectors, index):
    queries = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    rows = index.search(queries, k=5, search_L=40).collect()
    from collections import Counter

    assert set(Counter(r["qid"] for r in rows).values()) == {5}
    top1 = {r["qid"]: r["id"] for r in rows if r["rank"] == 1}
    # each query is a database vector: the graph walk must find it
    assert all(top1[q] == q for q in top1)


def test_nsg_search_L_monotone(vectors, index):
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}

    def recall(L):
        got = {
            (r["qid"], r["id"])
            for r in index.search(queries, k=10, search_L=L).collect()
        }
        return len(got & truth) / len(truth)

    assert recall(10) <= recall(64) + 1e-9


def test_nsg_degree_bounded_and_connected(index):
    rows = index.table.select("shard", "id", "neighbors", "is_ep").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, nodes in by_shard.items():
        ids = {r["id"] for r in nodes}
        eps = [r["id"] for r in nodes if r["is_ep"]]
        assert len(eps) == 1
        adj = {r["id"]: [v for v in r["neighbors"]] for r in nodes}
        # neighbors stay inside the shard
        assert all(v in ids for nb in adj.values() for v in nb)
        # degree ≈ R (connectivity repair may exceed slightly)
        assert max(len(nb) for nb in adj.values()) <= 16 + 8
        # BFS from the enterpoint reaches every node
        seen = {eps[0]}
        stack = [eps[0]]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        assert seen == ids


def test_nsg_save_load_roundtrip(vectors, index, spark, tmp_path):
    path = str(tmp_path / "nsg")
    index.save(path)
    loaded = NSGIndex.load(spark, path)
    queries = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    a = {(r["qid"], r["rank"], r["id"]) for r in index.search(queries, 5).collect()}
    b = {(r["qid"], r["rank"], r["id"]) for r in loaded.search(queries, 5).collect()}
    assert a == b


# --------------------------------------------------- cell-routed sharding


@pytest.fixture(scope="module")
def cell_index(vectors):
    return NSGIndex.build(
        vectors, R=16, knn_k=24, nshards=4, sharding="cells", seed=5
    )


def test_nsg_cells_full_probe_matches_quality(vectors, cell_index):
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}
    got = {
        (r["qid"], r["id"])
        for r in cell_index.search(queries, k=10, search_L=40, nprobe=4).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9


def test_nsg_cells_nprobe_monotone_and_routed(vectors, cell_index):
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}

    def recall(nprobe):
        got = {
            (r["qid"], r["id"])
            for r in cell_index.search(
                queries, k=10, search_L=40, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4 = recall(1), recall(4)
    assert r1 <= r4 + 1e-9
    # the synthetic vectors are near-isotropic, so k-means cells capture
    # neighborhoods only weakly — but routed nprobe=1 (a quarter of the
    # shards) must still clearly beat the ~0.25 random-quarter baseline
    assert r1 >= 0.35, r1


def test_nsg_cells_requires_centroids_for_routing(vectors, index):
    queries = vectors.filter("id < 5").select(F.col("id").alias("qid"), "vec")
    with pytest.raises(ValueError):
        index.search(queries, k=5, nprobe=2)  # hash-sharded: no routing


def test_nsg_cells_save_load_keeps_routing(vectors, cell_index, spark, tmp_path):
    path = str(tmp_path / "nsg_cells")
    cell_index.save(path)
    loaded = NSGIndex.load(spark, path)
    assert loaded.centroids is not None
    queries = vectors.filter("id < 10").select(F.col("id").alias("qid"), "vec")
    a = {
        (r["qid"], r["rank"], r["id"])
        for r in cell_index.search(queries, 5, nprobe=2).collect()
    }
    b = {
        (r["qid"], r["rank"], r["id"])
        for r in loaded.search(queries, 5, nprobe=2).collect()
    }
    assert a == b


def test_nsg_cells_capacity_cap_splits_and_routes(vectors, spark, tmp_path):
    """max_shard_rows splits oversized cells into hash sub-shards; a
    probed cell searches all its sub-shards, so recall at full probe is
    unchanged and shard sizes respect the cap."""
    idx = NSGIndex.build(
        vectors, R=16, knn_k=24, nshards=2, sharding="cells",
        max_shard_rows=120, seed=5,
    )
    sizes = {
        r["shard"]: r["count"]
        for r in idx.table.groupBy("shard").count().collect()
    }
    assert idx.nshards == len(sizes) and idx.nshards > 2
    assert max(sizes.values()) <= 120
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}
    got = {
        (r["qid"], r["id"])
        for r in idx.search(queries, k=10, search_L=40, nprobe=2).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9
    # persistence keeps the sub-shard routing
    path = str(tmp_path / "nsg_capped")
    idx.save(path)
    loaded = NSGIndex.load(spark, path)
    assert loaded.cell_subs is not None
    b = {
        (r["qid"], r["rank"], r["id"])
        for r in loaded.search(queries, 5, nprobe=2).collect()
    }
    a = {
        (r["qid"], r["rank"], r["id"])
        for r in idx.search(queries, 5, nprobe=2).collect()
    }
    assert a == b


def test_beam_search_exhaustive_pool_is_exact():
    """With pool length ≥ shard size over a connected graph, the beam
    walk visits every node, so results must equal brute force exactly —
    and contain no duplicate ids (regression: adjacency padding once
    aliased node 0 in the visited-bitmap scatter, re-adding it forever)."""
    from faiss_spark.operators.nsg import _beam_search_all, _build_shard_graph

    rng = np.random.default_rng(5)
    n = 110
    X = rng.normal(size=(n, 16))
    adj, ep = _build_shard_graph(X, R=16, knn_k=24)
    Q = rng.normal(size=(50, 16))
    nid, _ = _beam_search_all(X, adj, ep, Q, k=10, search_L=2 * n)
    D = ((Q[:, None, :] - X[None]) ** 2).sum(2)
    truth = np.argsort(D, 1)[:, :10]
    for i in range(50):
        got = nid[i][nid[i] >= 0]
        assert len(set(got)) == len(got)
        assert set(got) == set(truth[i]), i


def test_binary_nsg_exact_hamming(tables, spark):
    """Binary NSG over packed codes: distances are exact Hamming
    integers and full-pool results match the brute-force Hamming knn
    (IndexBinaryHNSW capability, batch form)."""
    from faiss_spark.operators.binary import binarize, hamming_knn
    from faiss_spark.operators.nsg import binary_nsg_build, binary_nsg_search

    vecs = tables["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    nbits = 64
    codes = binarize(vecs, d=nbits).localCheckpoint()
    idx = binary_nsg_build(codes, nbits=nbits, R=16, knn_k=24, nshards=2)
    queries = codes.filter("id < 15").select(
        F.col("id").alias("qid"), "code"
    )
    got = binary_nsg_search(idx, queries, nbits=nbits, k=5, search_L=600)
    rows = got.collect()
    # distances are integral Hamming values
    assert all(abs(r["dist"] - round(r["dist"])) < 1e-6 for r in rows)
    truth = hamming_knn(
        codes, queries.withColumnRenamed("code", "qcode"), 5
    )
    # exhaustive pool: per-query distance multiset must match brute force
    from collections import defaultdict

    gd, td = defaultdict(list), defaultdict(list)
    for r in rows:
        gd[r["qid"]].append(round(r["dist"]))
    for r in truth.collect():
        td[r["qid"]].append(round(r["dist"]))
    for q in td:
        assert sorted(gd[q]) == sorted(td[q]), q


def test_nsg_pq_storage_recall_and_roundtrip(vectors, spark, tmp_path):
    """storage='pq': vectors live as PQ codes, the walk decodes per
    shard (IndexNSGPQ composition). Recall dips only by PQ quantization;
    persistence round-trips the codebooks."""
    idx = NSGIndex.build(
        vectors, R=16, knn_k=24, nshards=2, storage="pq", pq_m=16, seed=5
    )
    assert idx.pq_codebooks is not None
    assert "code" in idx.table.columns and "vec" not in idx.table.columns
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}
    got = {
        (r["qid"], r["id"])
        for r in idx.search(queries, k=10, search_L=40).collect()
    }
    assert len(got & truth) / len(truth) >= 0.5
    path = str(tmp_path / "nsg_pq")
    idx.save(path)
    loaded = NSGIndex.load(spark, path)
    assert loaded.pq_codebooks is not None
    a = {(r["qid"], r["rank"], r["id"]) for r in idx.search(queries, 5).collect()}
    b = {(r["qid"], r["rank"], r["id"]) for r in loaded.search(queries, 5).collect()}
    assert a == b


def test_nsg_sq_storage_exact_over_decoded_and_roundtrip(
    vectors, spark, tmp_path
):
    """storage='sq' (IndexNSGSQ, reference faiss/IndexNSG.h:90 /
    parse_IndexNSG SQ<b>): vectors live as scalar-quantized codes, the
    walk decodes per shard. With ONE shard and an exhaustive pool the
    result EQUALS brute-force knn over the decoded vectors — pins the
    decode path bit-for-bit, not just a recall bound. Persistence
    round-trips the (vmin, vdiff, bits) sidecar."""
    from faiss_spark.operators.codecs import ScalarQuantizer

    n = vectors.count()
    idx = NSGIndex.build(
        vectors, R=16, knn_k=24, nshards=1, storage="sq", sq_bits=8
    )
    assert idx.sq_model is not None and idx.pq_codebooks is None
    assert "code" in idx.table.columns and "vec" not in idx.table.columns
    queries = vectors.filter("id < 20").select(F.col("id").alias("qid"), "vec")
    # brute-force truth over the SAME decoded vectors (same SQ model:
    # minmax fit is deterministic)
    model = ScalarQuantizer(bits=8).fit(vectors)
    decoded = (
        model.decode(model.encode(vectors))
        .select("id", F.col("vec"))
    )
    truth = {
        (r["qid"], r["rank"], r["id"])
        for r in knn(decoded, queries, 10).collect()
    }
    got = {
        (r["qid"], r["rank"], r["id"])
        for r in idx.search(queries, k=10, search_L=n).collect()
    }
    assert got == truth
    path = str(tmp_path / "nsg_sq")
    idx.save(path)
    loaded = NSGIndex.load(spark, path)
    assert loaded.sq_model is not None
    assert loaded.sq_model.bits == 8
    a = {(r["qid"], r["rank"], r["id"]) for r in idx.search(queries, 5).collect()}
    b = {(r["qid"], r["rank"], r["id"]) for r in loaded.search(queries, 5).collect()}
    assert a == b


def test_nsg_sq_recall_close_to_flat(vectors):
    """SQ8 quantization noise should barely dent recall vs the flat
    index at the same parameters."""
    idx = NSGIndex.build(vectors, R=16, knn_k=24, nshards=2, storage="sq")
    queries = vectors.filter("id < 30").select(F.col("id").alias("qid"), "vec")
    truth = {(r["qid"], r["id"]) for r in knn(vectors, queries, 10).collect()}
    got = {
        (r["qid"], r["id"])
        for r in idx.search(queries, k=10, search_L=64).collect()
    }
    assert len(got & truth) / len(truth) >= 0.8


def test_nsg_collocated_scan_matches_groupby_and_skips_exchange(
    vectors, spark,
):
    """r13: build-fresh indexes are shard-collocated (every shard's rows
    sit in one partition of the build output), so search scans
    partition-wise with mapInArrow instead of paying a per-search
    groupBy Exchange+Sort over the corpus. Pins (a) exact result
    equality between the two routes, (b) the plan shape: the collocated
    route has exactly one fewer shard exchange, and none at all once the
    table is materialized, (c) save() drops the flag (a parquet scan may
    split a shard across tasks)."""
    import dataclasses

    def shard_exchanges(df):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        return plan.count("Exchange hashpartitioning(shard")

    idx = NSGIndex.build(
        vectors, R=8, knn_k=16, nshards=4, sharding="cells",
        max_shard_rows=400,
    )
    assert idx.shard_collocated
    idx.table = idx.table.localCheckpoint(eager=True)
    queries = vectors.filter("id < 40").select(F.col("id").alias("qid"), "vec")
    new = idx.search(queries, 5, search_L=24, nprobe=2)
    old_idx = dataclasses.replace(idx, shard_collocated=False)
    old = old_idx.search(queries, 5, search_L=24, nprobe=2)
    assert shard_exchanges(new) == 0
    assert shard_exchanges(old) == 1
    a = sorted(map(tuple, new.collect()))
    b = sorted(map(tuple, old.collect()))
    assert a == b and len(a) > 0


def test_nsg_save_clears_collocated_flag(vectors, spark, tmp_path):
    idx = NSGIndex.build(vectors, R=8, knn_k=16, nshards=2)
    assert idx.shard_collocated
    idx.save(str(tmp_path / "nsg_colloc"))
    assert not idx.shard_collocated
    loaded = NSGIndex.load(spark, str(tmp_path / "nsg_colloc"))
    assert not loaded.shard_collocated


def test_nsg_save_bucketed_keeps_collocated_scan(vectors, spark, tmp_path):
    """r14 (VERDICT r13 #4): save_bucketed persists CLUSTERED BY (shard),
    so a LOADED index keeps the partition-wise collocated scan — zero
    corpus shard-exchange per search — and the scan is provably bucketed
    (one task per bucket; autoBucketedScan is off in get_spark). Pins
    (a) result equality across build-fresh / saved / loaded / groupBy
    routes, (b) the flag surviving save_bucketed + load, (c) the plan:
    a bucketed FileScan and no shard exchange."""
    import dataclasses

    idx = NSGIndex.build(
        vectors, R=8, knn_k=16, nshards=4, sharding="cells",
        max_shard_rows=400,
    )
    queries = vectors.filter("id < 40").select(F.col("id").alias("qid"), "vec")
    ref = sorted(map(tuple, idx.search(queries, 5, search_L=24, nprobe=2).collect()))
    path = str(tmp_path / "nsg_bucketed")
    idx.save_bucketed(path)
    assert idx.shard_collocated
    saved = sorted(map(tuple, idx.search(queries, 5, search_L=24, nprobe=2).collect()))
    loaded = NSGIndex.load(spark, path)
    assert loaded.shard_collocated
    got = sorted(map(tuple, loaded.search(queries, 5, search_L=24, nprobe=2).collect()))
    grouped = dataclasses.replace(loaded, shard_collocated=False)
    via_groupby = sorted(
        map(tuple, grouped.search(queries, 5, search_L=24, nprobe=2).collect())
    )
    assert saved == ref and got == ref and via_groupby == ref and len(ref) > 0
    plan = loaded.table._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    search_plan = (
        loaded.search(queries, 5, search_L=24, nprobe=2)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
    )
    assert "Exchange hashpartitioning(shard" not in search_plan
