"""Corpus-level pipeline operators: context-window sequence packing and
temperature (domain-mixing) sampling.

These are the two corpus-shaping steps between "filtered documents" and
"training batches" in an LLM data pipeline:

* ``pack_sequences`` — concatenate-and-chop packing: documents, in a
  deterministic order within each shard, are laid end-to-end on a token
  tape and chopped into fixed ``budget``-token context windows (the
  GPT-style pretraining packing; documents may straddle window
  boundaries). The layout is a closed form over the running token total,
  so it is ONE window aggregation per shard — no sequential state, no
  driver loop, embarrassingly parallel across shards at 100 TB.

* ``temperature_sample`` — multinomial temperature resampling of domains
  (p_s ∝ n_s^alpha, the GPT-3/Pile domain-mixing rule): each document is
  kept iff a deterministic per-document uniform draw falls under its
  domain's acceptance rate. The domain statistics are a map-side
  aggregate over the grouping column (tiny: one row per domain) joined
  back by broadcast — the scan itself stays map-only.

Determinism discipline: the per-document uniform draw is the first 8 hex
chars of md5(id:seed) compared lexicographically against the rate
rendered as 8 lowercase hex digits — Spark's and DuckDB's md5 agree
byte-for-byte, and fixed-width lowercase-hex string comparison IS
numeric comparison, so the oracle reaches identical keep/drop decisions
with no float-boundary ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def uniform_hex(key: Column, seed: int = 0) -> Column:
    """Deterministic per-row uniform draw as 8 lowercase hex chars
    (uniform over [0, 2^32) — compare against `rate_hex` strings)."""
    return F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(seed)))), 1, 8)


def rate_hex(rate: Column) -> Column:
    """Render an acceptance rate in [0, 1] as the 8-digit lowercase hex
    threshold floor(rate * 2^32), for comparison against uniform_hex.
    rate >= 1 renders as 'ffffffff'+ sentinel 'g' so every draw passes."""
    scaled = F.floor(rate * F.lit(float(2**32))).cast("bigint")
    hexed = F.lpad(F.lower(F.hex(F.least(scaled, F.lit(2**32 - 1)))), 8, "0")
    # rate==1 must accept ALL draws, including 'ffffffff'; 'g' > any hex digit
    return F.when(scaled >= 2**32, F.lit("g")).otherwise(hexed)


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    ntok_col: Column | None = None,
) -> DataFrame:
    """Concat-and-chop packing layout: within each ``shard_col`` group,
    documents ordered by ``id_col`` are placed end-to-end on a token tape
    chopped into ``budget``-token windows.

    Returns one row per document:
      (id, shard, ntok, bin_no, offset, n_bins) where ``bin_no`` is the
      window holding the document's first token, ``offset`` the position
      of that token within the window, and ``n_bins`` how many windows
      the document spans (straddling documents span > 1).

    Scale shape: one window cumsum per shard — at 100 TB, shards are the
    parallelism unit (a skewed single global ordering would serialize;
    per-shard ordering is the standard layout contract). Empty documents
    (0 tokens) occupy no tape and report n_bins = 0.
    """
    ntok = ntok_col if ntok_col is not None else token_count(F.col(text_col))
    w = Window.partitionBy("shard").orderBy("id")
    # every integer output is bigint: cross-engine comparisons (and 100 TB
    # tapes, where cum_before overflows int32) need the wide type
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        ntok.cast("bigint").alias("ntok"),
    ).withColumn("cum_before", F.sum("ntok").over(w) - F.col("ntok"))
    return out.select(
        "id",
        "shard",
        "ntok",
        F.floor(F.col("cum_before") / budget).cast("bigint").alias("bin_no"),
        (F.col("cum_before") % budget).cast("bigint").alias("offset"),
        F.when(F.col("ntok") == 0, F.lit(0))
        .otherwise(
            F.floor((F.col("cum_before") + F.col("ntok") - 1) / budget)
            - F.floor(F.col("cum_before") / budget)
            + 1
        )
        .cast("bigint")
        .alias("n_bins"),
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row gets the
    split whose cumulative-weight interval contains its uniform draw
    (weights are normalized; interval edges rendered as hex thresholds,
    same draw discipline as temperature_sample — reproducible across
    runs, engines, and repartitions, and rows never migrate between
    splits when OTHER rows are added or removed). Map-only at any scale.

    Returns the input plus a ``split`` column."""
    names = list(weights)
    total = float(sum(weights.values()))
    edges = []
    acc = 0.0
    for name in names[:-1]:
        acc += float(weights[name]) / total
        edges.append(acc)
    u = uniform_hex(F.col(id_col), seed)
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(u < rate_hex(F.lit(edge)), F.lit(name)).otherwise(expr)
    return df.select("*", expr.alias("split"))


def temperature_sample(
    df: DataFrame,
    alpha: float,
    target_frac: float,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-resample domains: keep each document of domain s with
    probability r_s = min(1, target_frac * N * n_s^alpha / (sum_t n_t^alpha * n_s)),
    i.e. expected kept count per domain proportional to n_s^alpha with an
    overall expected keep fraction of ``target_frac``. alpha = 1
    reproduces uniform sampling; alpha < 1 up-weights small domains
    (the mixing rule used for multilingual/multi-source pretraining).

    Deterministic: document kept iff uniform_hex(id, seed) < rate_hex(r_s).
    Plan shape: tiny per-domain aggregate, broadcast back, map-only
    filter over the corpus — no corpus shuffle at any scale.

    Returns the input rows (all columns) plus the domain rate ``rate``
    rounded to 9 dp for inspection.
    """
    stats = df.groupBy(group_col).agg(F.count("*").alias("n_s"))
    tot = stats.agg(
        F.sum("n_s").alias("n_total"),
        F.sum(F.pow("n_s", F.lit(float(alpha)))).alias("wsum"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        group_col,
        # decisions are made on the 9-dp-ROUNDED rate (same discipline as
        # filter_corpus): the raw rate's last ulp depends on aggregation
        # order and libm, the rounded rate does not
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_frac))
                * F.col("n_total")
                * F.pow("n_s", F.lit(float(alpha)))
                / (F.col("wsum") * F.col("n_s")),
            ),
            9,
        ).alias("rate"),
    )
    joined = df.join(F.broadcast(rates), on=group_col)
    kept = joined.filter(
        uniform_hex(F.col(id_col), seed) < rate_hex(F.col("rate"))
    )
    return kept.select(*df.columns, "rate")


def importance_filter(
    df: DataFrame,
    alpha: float = 9.0,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """GPT-3-style importance filtering over a quality score (Brown et
    al. 2020 appendix A: a document is kept when ``np.random.pareto(α) >
    1 − document_score`` with α=9 — high-scoring documents are mostly
    kept, low-scoring ones survive with small probability, so the tail
    of the distribution is sampled rather than cliffed).

    Deterministic re-expression (no RNG state at 100 TB): the Pareto
    condition over a uniform draw u is ``(1−u)^(−1/α) − 1 > 1 − score``
    ⟺ ``u > 1 − (2 − score)^(−α)``, so a document is kept iff
    ``uniform_hex(id, seed) ≥ rate_hex(threshold)`` with ``threshold =
    round(1 − (2 − score)^(−α), 9)`` (the same 9-dp-rounded hex-compare
    discipline as temperature_sample — reproducible across engines and
    run orders). Per-document keep probability = (2 − score)^(−α):
    score 1 → always kept, score 0 → 2^(−α) ≈ 0.2% at α=9.

    Scores are clamped to [0, 1] (they are probabilities — e.g.
    ``QualityClassifierModel.score``'s ``quality_score``); null scores
    drop the row (filter semantics). Map-only: zero shuffles at any
    corpus size. Returns the input rows plus ``keep_prob`` (9 dp)."""
    if alpha <= 0:
        raise ValueError(f"importance_filter: alpha must be > 0, got {alpha}")
    score = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(score_col).cast("double")))
    keep_prob = F.round(F.pow(F.lit(2.0) - score, F.lit(-float(alpha))), 9)
    thresh = F.round(F.lit(1.0) - F.pow(F.lit(2.0) - score, F.lit(-float(alpha))), 9)
    return df.filter(
        uniform_hex(F.col(id_col), seed) >= rate_hex(thresh)
    ).select(*df.columns, keep_prob.alias("keep_prob"))


def chunk_documents(
    df: DataFrame,
    size: int = 128,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window document chunking — the shaping step between
    "documents" and "retrieval/training units" (RAG passage windows,
    long-doc pretraining slices): chunks of ``size`` tokens starting at
    0, stride, 2·stride, … while the start lies inside the document; the
    final chunk may be short, overlap is ``size − stride``.

    Returns one row per chunk:
      (id, chunk_no, start, ntok, chunk_fp) — all counters bigint,
      chunk_fp = md5 of the space-joined chunk tokens (carrying the text
      itself is a caller choice; the fingerprint keeps compared rows
      narrow and lets a dedup pass run per-chunk).

    Scale shape: pure codegen — tokenize + sequence + posexplode +
    slice, all JVM expressions, map-only (no shuffle at all); chunking
    100 TB is exactly a linear scan. Empty documents yield no chunks.

    ``stride`` defaults to ``size`` (non-overlapping). stride > size is
    rejected: it silently DROPS the tokens between chunks, which no
    chunking caller wants (a sampling pass should say so explicitly).
    """
    from .text import tokens

    if size <= 0:
        raise ValueError(f"chunk_documents: size must be positive, got {size}")
    if stride is None:
        stride = size
    if stride <= 0:
        raise ValueError(
            f"chunk_documents: stride must be positive, got {stride}"
        )
    if stride > size:
        raise ValueError(
            f"chunk_documents: stride ({stride}) > size ({size}) would drop "
            "tokens between chunks; overlap = size - stride must be >= 0"
        )
    toks = tokens(F.col(text_col))
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    e = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        toks.alias("tk"),
        F.posexplode(starts).alias("chunk_no", "start"),
    )
    ct = F.slice(F.col("tk"), F.col("start") + 1, F.lit(size))
    return e.select(
        "id",
        F.col("chunk_no").cast("bigint").alias("chunk_no"),
        F.col("start").cast("bigint").alias("start"),
        F.size(ct).cast("bigint").alias("ntok"),
        F.md5(F.concat_ws(" ", ct)).alias("chunk_fp"),
    )


def shuffle_corpus(
    df: DataFrame,
    num_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-data shuffle: every document gets a
    (shard, pos) address that is a pure function of (id, seed) — the
    reproducible epoch-shuffle step between "filtered corpus" and
    "training shards" (epoch e trains in order of seed+e; a re-run, a
    resumed job, or a different input partitioning all produce the SAME
    permutation, so data order is auditable).

    shard = first-32-bits of md5(id:seed) mod num_shards; pos = rank of
    the full md5 digest within the shard (doc id breaks the 2^-128
    collision tie, so the order is total). Returns the input columns
    plus (shard, pos).

    Scale shape: ONE hash shuffle keyed on the shard + a per-shard
    window sort — shards are independent, so sort parallelism =
    num_shards (pick it ≈ the output file count; thousands at 100 TB —
    a GLOBAL order-by would instead range-partition on the random key,
    which also scales but pins the output layout to Spark's sampler
    instead of a stable shard id the training job can address).
    """
    if num_shards <= 0:
        raise ValueError(
            f"shuffle_corpus: num_shards must be positive, got {num_shards}"
        )
    key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint"),
        F.lit(num_shards),
    )
    w = Window.partitionBy("shard").orderBy("_shuffle_key", id_col)
    return (
        df.withColumn("_shuffle_key", key)
        .withColumn("shard", shard)
        .withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("bigint"))
        .drop("_shuffle_key")
    )


def repeat_corpus(
    df: DataFrame,
    rates: "dict[str, float] | float",
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Fractional corpus repetition — the epoch up-/down-sampling step of
    a mixed-domain pretraining run (the Pile/DoReMi shape: "see domain s
    r_s times per epoch", r_s need not be an integer): a document in
    domain s appears floor(r_s) times, plus once more iff its
    deterministic uniform draw falls under frac(r_s). r_s < 1 is plain
    down-sampling; r_s = 0 drops the domain. Expected copies per doc =
    exactly r_s.

    Output = the input columns plus ``epoch`` (0-based copy index) —
    feed it to ``shuffle_corpus`` keyed on (id, epoch) to interleave the
    copies. Deterministic: same (id, seed) → same copy count under any
    input partitioning; the draw is the md5 hex discipline shared by
    ``temperature_sample`` (oracle-exact, no float boundaries).

    Scale shape: rates are a literal map (or one float) — the corpus
    scan is MAP-ONLY (per-row explode of a 0..reps-1 sequence, no join,
    no shuffle at any scale).
    """
    if not isinstance(rates, dict):
        rates = {None: float(rates)}
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"repeat_corpus: negative rate {r} for {s!r}")

    def parts(r: float) -> tuple[int, float]:
        base = int(r)
        return base, round(r - base, 9)

    if None in rates:
        base, frac = parts(rates[None])
        base_col = F.lit(base)
        frac_col = F.lit(frac)
    else:
        base_col, frac_col = F.lit(None), F.lit(None)
        for s, r in sorted(rates.items()):
            base, frac = parts(r)
            cond = F.col(group_col) == s
            base_col = F.when(cond, base).otherwise(base_col)
            frac_col = F.when(cond, frac).otherwise(frac_col)
        # domains absent from the map keep one copy (rate 1.0)
        base_col = F.coalesce(base_col, F.lit(1))
        frac_col = F.coalesce(frac_col, F.lit(0.0))
    extra = (
        uniform_hex(F.col(id_col), seed) < rate_hex(frac_col)
    ).cast("int")
    reps = (base_col + extra).cast("int")
    return (
        df.withColumn("_reps", reps)
        .filter(F.col("_reps") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_reps") - 1))
        )
        .drop("_reps")
    )


def token_budget_sample(
    df: DataFrame,
    budget: "dict[str, int] | int",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Deterministic token-budget subsampling — "take N tokens from each
    domain": documents are ranked by a per-doc uniform draw (a
    deterministic shuffle) and kept while the running token total of
    the documents AHEAD of them is under the domain's budget; the doc
    that crosses the budget is the last one kept (so the selection is
    never empty for a positive budget and overshoots by < 1 doc).
    Re-runs, resumes, and any input partitioning select the SAME set.

    Scale shape — the naive plan is a window over PARTITION BY source,
    one sequential task per domain (a straggler at 100 TB with few
    domains). Instead the running total is a TWO-LEVEL exact cumsum:
    the draw's first 2 hex chars bucket each domain into 256 slices;
    per-(domain, bucket) token sums are a tiny map-side aggregate whose
    exclusive prefix (computed on the 256-row-per-domain table) is
    broadcast back as each bucket's offset, and the corpus-side window
    runs per (domain, bucket) — 256× the parallelism, bit-identical to
    the global cumsum because the bucket is a PREFIX of the ordering
    key. Returns the input columns + (n_tokens, cum_before).
    """
    if isinstance(budget, dict):
        bcol = F.lit(None)
        for s, b in sorted(budget.items()):
            bcol = F.when(F.col(group_col) == s, F.lit(int(b))).otherwise(bcol)
        budget_col = bcol.cast("bigint")
    else:
        budget_col = F.lit(int(budget)).cast("bigint")
    draw = uniform_hex(F.col(id_col), seed)
    src = (
        df.withColumn("_draw", draw)
        .withColumn("_bucket", F.substring("_draw", 1, 2))
        .withColumn(
            "n_tokens", token_count(F.col(text_col)).cast("bigint")
        )
    )
    bucket_sums = src.groupBy(group_col, "_bucket").agg(
        F.sum("n_tokens").alias("_bsum")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        group_col,
        "_bucket",
        F.coalesce(F.sum("_bsum").over(woff), F.lit(0)).alias("_offset"),
    )
    win = Window.partitionBy(group_col, "_bucket").orderBy("_draw", id_col)
    joined = src.join(F.broadcast(offsets), on=[group_col, "_bucket"])
    out = (
        joined.withColumn(
            "cum_before",
            (
                F.col("_offset")
                + F.sum("n_tokens").over(win)
                - F.col("n_tokens")
            ).cast("bigint"),
        )
        .filter(F.col("cum_before") < budget_col)
        .drop("_draw", "_bucket", "_offset")
    )
    return out.select(*df.columns, "n_tokens", "cum_before")
