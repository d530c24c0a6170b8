"""Corpus-shaping operators: concat-and-chop packing layout and
temperature domain resampling (functions/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from faiss_spark.functions.corpus import (
    pack_sequences,
    rate_hex,
    temperature_sample,
    uniform_hex,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(120):
        src = f"s{i % 3}" if i < 108 else "rare"  # 36/36/36 vs 12 docs
        nwords = (i * 7) % 23 + 1
        rows.append((i, " ".join(f"w{j}" for j in range(nwords)), src))
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_pack_matches_sequential_reference(docs):
    budget = 16
    got = {
        r["id"]: (r["shard"], r["ntok"], r["bin_no"], r["offset"], r["n_bins"])
        for r in pack_sequences(docs, budget).collect()
    }
    rows = sorted(
        (r["source"], r["doc_id"], len(r["text"].split()))
        for r in docs.collect()
    )
    cum = {}
    for src, did, ntok in rows:
        c = cum.get(src, 0)
        exp_bin, exp_off = divmod(c, budget)
        exp_span = 0 if ntok == 0 else (c + ntok - 1) // budget - exp_bin + 1
        assert got[did] == (src, ntok, exp_bin, exp_off, exp_span), did
        cum[src] = c + ntok


def test_pack_tape_is_gapless_per_shard(docs):
    out = pack_sequences(docs, 16)
    per_shard = out.groupBy("shard").agg(
        F.sum("ntok").alias("tape"),
        F.max(F.col("bin_no") * 16 + F.col("offset") + F.col("ntok")).alias("end"),
    )
    for r in per_shard.collect():
        assert r["tape"] == r["end"]  # last token lands exactly at the tape length


def test_temperature_alpha1_is_uniform(docs):
    kept = temperature_sample(docs, alpha=1.0, target_frac=0.5)
    rates = {r["source"]: r["rate"] for r in kept.select("source", "rate").distinct().collect()}
    assert all(abs(v - 0.5) < 1e-9 for v in rates.values())


def test_temperature_upweights_small_domains(docs):
    kept = temperature_sample(docs, alpha=0.3, target_frac=0.5)
    rates = {r["source"]: r["rate"] for r in kept.select("source", "rate").distinct().collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    small = min(sizes, key=sizes.get)
    big = max(sizes, key=sizes.get)
    assert sizes[small] < sizes[big]  # fixture guarantees a size skew
    assert rates[small] > rates[big]


def test_temperature_deterministic_and_seeded(docs):
    a = sorted(r["doc_id"] for r in temperature_sample(docs, 0.5, 0.4, seed=1).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(docs, 0.5, 0.4, seed=1).collect())
    c = sorted(r["doc_id"] for r in temperature_sample(docs, 0.5, 0.4, seed=2).collect())
    assert a == b
    assert a != c  # a different seed draws a different subset


def test_rate_hex_boundaries(spark):
    df = spark.range(1).select(
        rate_hex(F.lit(1.0)).alias("one"),
        rate_hex(F.lit(0.0)).alias("zero"),
        rate_hex(F.lit(0.5)).alias("half"),
    )
    r = df.collect()[0]
    assert r["one"] == "g"  # accepts every 8-hex-digit draw
    assert r["zero"] == "00000000"  # accepts nothing
    assert r["half"] == "80000000"


def test_uniform_hex_matches_duckdb(spark):
    import duckdb

    s = spark.range(5).select(uniform_hex(F.col("id"), seed=3).alias("u")).collect()
    d = duckdb.sql(
        "SELECT substr(md5(concat(CAST(range AS VARCHAR), ':3')), 1, 8) AS u "
        "FROM range(5)"
    ).fetchall()
    assert [r["u"] for r in s] == [r[0] for r in d]


def test_assign_splits_partition_and_stability(docs):
    from faiss_spark.functions.corpus import assign_splits

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(docs, w, seed=5)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(rows.values()) <= {"train", "val", "test"}
    frac = sum(1 for v in rows.values() if v == "train") / len(rows)
    assert 0.6 < frac < 0.95  # 120 docs: loose band around 0.8
    # stability: a row's split never changes when OTHER rows are removed
    sub = assign_splits(docs.filter("doc_id % 2 = 0"), w, seed=5)
    for r in sub.collect():
        assert rows[r["doc_id"]] == r["split"]


def test_chunk_documents_reference(docs):
    from faiss_spark.functions.corpus import chunk_documents

    size, stride = 8, 6
    got = {}
    for r in chunk_documents(docs, size=size, stride=stride).collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_no"], r["start"], r["ntok"], r["chunk_fp"])
        )
    import hashlib

    for row in docs.collect():
        toks = row["text"].split()
        want = []
        cno = 0
        start = 0
        while start < len(toks):
            ct = toks[start : start + size]
            want.append(
                (
                    cno,
                    start,
                    len(ct),
                    hashlib.md5(" ".join(ct).encode()).hexdigest(),
                )
            )
            cno += 1
            start += stride
        assert got.get(row["doc_id"], []) == want, row["doc_id"]


def test_chunk_documents_empty_and_overlap(spark):
    from faiss_spark.functions.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b c d e")], "doc_id bigint, text string"
    )
    out = chunk_documents(df, size=4, stride=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    # doc 3: starts 0,2,4 -> chunks of 4,3,1 tokens
    assert [r["ntok"] for r in sorted(by_id[3], key=lambda r: r["chunk_no"])] == [4, 3, 1]
    # normalized-empty docs produce a single empty-string token ("" split)
    # on BOTH engines -- the cross-engine contract -- so one 1-token chunk
    for i in (1, 2):
        assert len(by_id.get(i, [])) == 1 and by_id[i][0]["ntok"] == 1


def test_chunk_documents_is_map_only(docs):
    """Chunking must be a pure scan: no exchange, no join — at 100 TB it
    is exactly one linear pass over the corpus."""
    from faiss_spark.functions.corpus import chunk_documents

    p = chunk_documents(docs, size=8, stride=6)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    assert "Join" not in p, p


def test_char_ngram_perplexity_matches_python(tables):
    """bpc from the distributed pipeline equals a direct python
    recomputation of -sum(log2 p)/n over the same normalized trigrams."""
    import math
    import re
    from collections import Counter

    from faiss_spark.functions.text import char_ngram_perplexity

    docs = tables["documents"].filter(F.col("doc_id") < 100)
    got = {r["id"]: (r["n_grams"], r["bpc"])
           for r in char_ngram_perplexity(docs).collect()}

    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    norm = {i: re.sub(r"\s+", " ", t.strip().lower()) for i, t in texts.items()}
    grams = {i: [s[j:j + 3] for j in range(len(s) - 2)]
             for i, s in norm.items() if len(s) >= 3}
    counts = Counter(g for gs in grams.values() for g in gs)
    total = sum(counts.values())
    for i, gs in grams.items():
        bpc = -sum(math.log2(counts[g] / total) for g in gs) / len(gs)
        assert got[i][0] == len(gs)
        assert abs(got[i][1] - bpc) < 1e-9, (i, got[i][1], bpc)
    assert set(got) == set(grams)


def test_char_ngram_perplexity_external_model_drops_oov(spark, tables):
    """Scoring under an EXTERNAL model: grams unseen by the model are
    dropped from the sum (the CCNet OOV convention), so a doc with no
    in-vocab grams yields no row."""
    from faiss_spark.functions.text import (
        char_ngram_counts,
        char_ngram_perplexity,
    )

    model = char_ngram_counts(tables["documents"].filter(F.col("doc_id") < 50))
    alien = spark.createDataFrame(
        [(1, "zzqqxx zzqqxx"), (2, "")], "doc_id long, text string"
    )
    rows = char_ngram_perplexity(alien, model=model).collect()
    ids = {r["id"] for r in rows}
    assert 2 not in ids  # empty doc: no grams at all


def test_shuffle_corpus_deterministic_permutation(docs):
    """(shard, pos) is a bijection onto shard-local prefixes, identical
    across re-runs and input partitionings, and epoch (seed) changes
    re-permute."""
    from faiss_spark.functions.corpus import shuffle_corpus

    a = shuffle_corpus(docs, num_shards=7, seed=0).select(
        "doc_id", "shard", "pos"
    )
    rows = a.collect()
    assert len(rows) == docs.count()
    # bijection: per shard, pos is exactly 0..n_s-1
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(7))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # determinism across re-run and across input partitioning
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()}
    repart = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_corpus(docs.repartition(13), num_shards=7, seed=0)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert {tuple(r) for r in rows} == again == repart
    # another seed = a different permutation (overwhelmingly)
    other = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_corpus(docs, num_shards=7, seed=1)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert other != again
    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_shards"):
        shuffle_corpus(docs, num_shards=0)


def test_shuffle_corpus_matches_duckdb(tables, oracle):
    """Hash-exact against the DuckDB twin (same md5 keys, same window)."""
    from faiss_spark.functions.corpus import shuffle_corpus
    from tests.conftest import duck_set, rows_set

    got = rows_set(
        shuffle_corpus(tables["documents"], num_shards=8, seed=3).select(
            "doc_id", "shard", "pos"
        )
    )
    expect = duck_set(
        oracle,
        """
        SELECT doc_id, shard,
               (ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) - 1)
                   AS pos
        FROM (
            SELECT doc_id,
                   md5(doc_id::VARCHAR || ':3') AS k,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':3'), 1, 8))::BIGINT
                       % 8 AS shard
            FROM documents
        )
        """,
    )
    assert got == expect


def test_shuffle_corpus_single_exchange(docs):
    """Plan: exactly one Exchange (hash on the shard key) + per-shard
    window sort — no global range partition."""
    from faiss_spark.functions.corpus import shuffle_corpus
    from tests.test_plans import plan

    p = plan(
        shuffle_corpus(docs.localCheckpoint(eager=True), num_shards=4),
        mode="simple",
    )
    assert p.count("Exchange") == 1, p
    assert "hashpartitioning(shard" in p, p
    assert "rangepartitioning" not in p.lower(), p


# ===================================================== fractional repetition


def test_repeat_corpus_counts_and_determinism(docs):
    """floor(r) copies + bernoulli(frac(r)) extra: every doc of a rate-2.5
    domain appears 2 or 3 times; a rate-0.5 domain 0 or 1; unlisted
    domains exactly once; decisions stable under repartitioning and the
    empirical mean tracks r."""
    from faiss_spark.functions.corpus import repeat_corpus

    rep = repeat_corpus(docs, {"s0": 2.5, "s1": 0.5}, seed=3)
    per_doc = {
        (r["doc_id"]): r["cnt"]
        for r in rep.groupBy("doc_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    for i, s in src.items():
        c = per_doc.get(i, 0)
        if s == "s0":
            assert c in (2, 3), (i, c)
        elif s == "s1":
            assert c in (0, 1), (i, c)
        else:
            assert c == 1, (i, c)
    n0 = sum(c for i, c in per_doc.items() if src[i] == "s0")
    assert 2 * 36 <= n0 <= 3 * 36
    # epochs are 0..copies-1
    eps = rep.filter(F.col("source") == "s0").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("e")
    )
    for r in eps.collect():
        assert r["e"] == list(range(len(r["e"])))
    again = repeat_corpus(
        docs.repartition(7), {"s0": 2.5, "s1": 0.5}, seed=3
    )
    a = sorted((r["doc_id"], r["epoch"]) for r in rep.select("doc_id", "epoch").collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in again.select("doc_id", "epoch").collect())
    assert a == b


def test_repeat_corpus_scalar_rate_and_validation(docs):
    from faiss_spark.functions.corpus import repeat_corpus

    assert repeat_corpus(docs, 2.0).count() == 2 * docs.count()
    with pytest.raises(ValueError, match="negative"):
        repeat_corpus(docs, {"s0": -1.0})


def test_repeat_corpus_is_map_only(docs):
    """Rates are literals — the corpus scan is one map-only stage (zero
    Exchange in the plan)."""
    from faiss_spark.functions.corpus import repeat_corpus
    from tests.test_plans import plan

    p = plan(
        repeat_corpus(
            docs.localCheckpoint(eager=True), {"s0": 1.5}
        ),
        mode="simple",
    )
    assert "Exchange" not in p, p


# ===================================================== token-budget sampling


def test_token_budget_two_level_cumsum_equals_global_window(docs):
    """The bucketed two-level running total must be BIT-IDENTICAL to the
    naive single-window-per-domain cumsum (the bucket is a prefix of the
    ordering key), and the kept set obeys the budget contract: every
    kept doc's preceding total < budget, and per domain the first
    crossing doc is kept, everything later dropped."""
    from pyspark.sql import Window

    from faiss_spark.functions.corpus import token_budget_sample, uniform_hex
    from faiss_spark.functions.text import token_count

    budget = 60
    got = token_budget_sample(docs, budget, seed=1)
    w = Window.partitionBy("source").orderBy(
        uniform_hex(F.col("doc_id"), 1), "doc_id"
    )
    naive = (
        docs.withColumn("n_tokens", token_count(F.col("text")).cast("bigint"))
        .withColumn(
            "cum_before",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint"),
        )
        .filter(F.col("cum_before") < budget)
    )
    a = sorted(
        (r["doc_id"], r["cum_before"])
        for r in got.select("doc_id", "cum_before").collect()
    )
    b = sorted(
        (r["doc_id"], r["cum_before"])
        for r in naive.select("doc_id", "cum_before").collect()
    )
    assert a == b and len(a) > 0
    assert all(c < budget for _, c in a)
    # per-domain token totals overshoot by strictly less than one doc
    tot = {
        r["source"]: (r["t"], r["n"])
        for r in got.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    }
    for s, (t, n) in tot.items():
        assert t >= budget or n == 36 or s == "rare", (s, t, n)


def test_token_budget_per_domain_budgets(docs):
    from faiss_spark.functions.corpus import token_budget_sample

    got = token_budget_sample(docs, {"s0": 30, "s1": 10**9}, seed=1)
    kept = {r["source"] for r in got.select("source").distinct().collect()}
    # unlisted domains have NULL budget -> nothing kept from them
    assert kept == {"s0", "s1"}
    # the huge budget keeps all of s1
    assert got.filter(F.col("source") == "s1").count() == 36


def test_token_budget_window_is_bucketed(docs):
    """Plan pin: the corpus-side running sum windows on (domain, bucket),
    never on the domain alone — the 100 TB straggler shape."""
    from faiss_spark.functions.corpus import token_budget_sample
    from tests.test_plans import plan

    p = plan(
        token_budget_sample(docs.localCheckpoint(eager=True), 60),
        mode="formatted",
    )
    import re

    wins = [
        ln for ln in p.splitlines() if "Window" in ln or "windowspec" in ln.lower()
    ]
    # every corpus-side Window partition spec that mentions n_tokens must
    # include the bucket column
    body = p.lower()
    assert "_bucket" in body, p


def test_importance_filter_semantics(spark, docs):
    """GPT-3 appendix-A importance filter: keep probability is
    (2-score)^(-alpha) — score 1 always kept, score 0 kept at ~2^-alpha;
    deterministic across runs; map-only (no Exchange); alpha guard."""
    import pytest
    from pyspark.sql import functions as F

    from faiss_spark.functions.corpus import importance_filter

    scored = docs.select(
        "doc_id",
        F.round(
            F.least(F.lit(1.0), F.length("text").cast("double") / 40.0), 9
        ).alias("quality_score"),
    ).localCheckpoint()
    kept = importance_filter(scored, alpha=9.0)
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in importance_filter(scored, alpha=9.0).select("doc_id").collect())
    assert a == b and len(a) > 0  # deterministic, non-empty
    # score==1 rows are ALWAYS kept
    ones = scored.filter("quality_score >= 1.0")
    kept_ones = importance_filter(ones, alpha=9.0)
    assert kept_ones.count() == ones.count()
    # keep_prob column matches the formula, and low scores are rarer
    row = kept.filter("quality_score >= 1.0").select("keep_prob").first()
    assert row["keep_prob"] == 1.0
    n_low = scored.filter("quality_score < 0.5").count()
    k_low = kept.filter("quality_score < 0.5").count()
    assert k_low < n_low  # strictly filtered at alpha=9
    # map-only plan
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="alpha"):
        importance_filter(scored, alpha=0)
