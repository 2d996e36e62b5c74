"""Training-dataset assembly operators: deterministic splits, stratified
sampling, weighted source mixing, and shard-shuffling.

These are the operations a 100 TB training-data pipeline runs AFTER
dedup/quality-scoring (operators/dedup.py, operators/text.py): carve
train/val/test, rebalance strata, mix corpora at target weights, and
produce a reproducibly-shuffled sharded layout for the trainer.

Design rules (all four operators):
- **Hash-deterministic, not RNG-based.** Every decision is a pure function
  of a row's stable key (md5 → integer bucket), so the same row lands in
  the same split/sample/shard on every run, on any cluster size, under
  any partitioning — and the assignment is expressible in ANSI SQL, which
  is what lets the driver oracle these queries exactly. `rand(seed)` has
  neither property (it is partition-order sensitive).
- **Narrow plans.** split/sample/mix add a projected column or filter —
  no shuffle at all. Only shard_shuffle shuffles, and it shuffles ONCE by
  shard id with a within-partition sort (`repartition(shard).
  sortWithinPartitions`) — never a global ORDER BY, whose single range-sort
  is the classic 100 TB anti-pattern when the trainer only needs
  *per-shard* order.
- md5 (not xxhash64/crc32) because both Spark and DuckDB expose the same
  bit-identical function, and 8 hex chars = 32 bits is plenty for bucket
  assignment. The JVM computes it vectorized; it is not a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of hash buckets used for fraction→bucket-threshold conversion.
#: 1e6 buckets keeps fraction resolution at 1e-6 while staying far from
#: the 2^32 space of the 8-hex-char prefix (no modulo bias worth caring
#: about: 2^32 % 1e6 leaves a relative skew of ~2e-4 on the last bucket).
BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "", n_buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from a row key.

    ``conv(substr(md5(key), 1, 8), 16, 10) % n_buckets`` — identical in
    DuckDB as ``CAST('0x' || substr(md5(key), 1, 8) AS UBIGINT) % n_buckets``.
    ``salt`` decorrelates independent decisions made from the same key
    (e.g. split assignment vs shard assignment).
    """
    s = F.concat(F.lit(salt), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def split_assign(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test-style assignment column.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any remainder
    falls into the LAST split). Assignment is by cumulative bucket ranges,
    so enlarging one split keeps every row of the smaller splits stable —
    the property that protects a held-out test set across dataset versions.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    bucket = hash_bucket(F.col(key), salt=salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(cum * BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (sampleBy, made
    reproducible and oracle-able). Strata absent from ``fractions`` keep
    ``default_fraction``. A pure filter: no shuffle, pushdown-friendly."""
    bucket = hash_bucket(F.col(key), salt=salt)
    threshold = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(int(frac * BUCKETS))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    threshold = (
        F.lit(int(default_fraction * BUCKETS))
        if threshold is None
        else threshold.otherwise(int(default_fraction * BUCKETS))
    )
    return df.filter(bucket < threshold)


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]],
    key: str,
    salt: str = "mix",
    src_col: str = "src",
) -> DataFrame:
    """Mix corpora at target inclusion rates: each source is independently
    hash-downsampled to its weight, tagged with ``src_col``, and unioned.

    Columns are aligned by name (``unionByName`` with missing columns as
    null), so heterogeneous corpora mix without manual schema glue. The
    union is a zero-shuffle plan — each source stays in its own partitions
    until whatever comes next."""
    if not sources:
        raise ValueError("sources must be non-empty")
    parts = []
    for name, (df, weight) in sources.items():
        # round(), not int(): computed weights (e.g. temperature_weights'
        # pow-math) sit arbitrarily close to bucket boundaries, and a SQL
        # oracle recomputing the same threshold must land on the same
        # integer — truncation flips on a 1-ulp difference, rounding
        # doesn't (0.3/0.9-style literals are unaffected)
        kept = df.filter(
            hash_bucket(F.col(key), salt=f"{salt}:{name}") < round(weight * BUCKETS)
        )
        parts.append(kept.withColumn(src_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Cluster-aware train/val/test split: near-duplicate documents NEVER
    straddle a split boundary.

    A plain per-row hash split leaks: two near-identical documents can land
    one in train, one in test, and the held-out metric silently measures
    memorization. Here the split key is the near-dup *cluster* id (the
    component's min doc id from ``dedup_clusters``; unpaired docs are their
    own cluster), so every member of a near-dup cluster receives the same
    assignment — the standard leakage guard a corpus pipeline runs after
    near-dup mining.

    ``pairs`` is the near-dup edge list (a, b) from ``ngram_jaccard_pairs``
    or ``lsh_candidate_pairs``+verify. Cost beyond the pair mining itself:
    one left join of the corpus against the (tiny — paired docs only)
    cluster table, then the same zero-shuffle bucket projection as
    ``split_assign``. The join key is the doc id on both sides and the
    cluster table is orders of magnitude smaller than the corpus, so AQE
    broadcasts it at runtime — no hint needed, no corpus shuffle.
    """
    from fhir_etl_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(pairs)
    grouped = df.join(
        clusters.withColumnRenamed("doc_id", key), key, "left"
    ).withColumn("_group_key", F.coalesce(F.col("cluster_id"), F.col(key)))
    return (
        split_assign(grouped, "_group_key", weights, salt=salt, out_col=out_col)
        .drop("_group_key", "cluster_id")
    )


def quota_cap(
    df: DataFrame,
    key_col: str,
    per_key: int,
    order_key: str,
    salt: str = "cap",
    pos_col: str | None = None,
) -> DataFrame:
    """Keep at most ``per_key`` rows per ``key_col`` value, chosen by
    deterministic hash order — the per-domain contribution cap of corpus
    curation (no single source may dominate the mix).

    Selection order is ``md5(salt || order_key)`` with the raw key as
    tiebreak, so the surviving subset is a pure function of row identity:
    stable under re-runs, repartitioning, and corpus growth *appends*
    (existing rows keep their hash rank; a new row displaces at most the
    current rank-``per_key`` row, never reshuffles the whole quota).

    Scale shape: rank-then-filter compiles to Spark's WindowGroupLimit —
    each map task pre-prunes to its local top-``per_key`` per key BEFORE
    the exchange, so the shuffle carries at most ``per_key`` rows per key
    per input partition, not the full corpus. A hot domain therefore costs
    bounded shuffle volume; the residual single-reducer rank over
    ``per_key × n_partitions`` rows is trivial. (Pinned by
    tests/test_plans.py.)
    """
    order = F.md5(
        F.concat(F.lit(salt), F.col(order_key).cast("string")).cast("binary")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(order.alias("_h"), order_key)
    ranked = df.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= per_key
    )
    if pos_col is None:
        return ranked.drop("_rank")
    return ranked.withColumnRenamed("_rank", pos_col)


def shard_shuffle(
    df: DataFrame,
    key: str,
    n_shards: int,
    salt: str = "shuffle",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global shuffle into ``n_shards`` ordered shards.

    Shard = hash bucket of the key; position = rank of the (re-salted)
    hash within the shard. One hash-partition shuffle + per-partition sort
    — the scale-path replacement for ``ORDER BY rand()``: at 1000
    executors each shard sorts locally, there is no global range exchange,
    and re-running on different cluster sizes yields byte-identical
    shards. Write with ``.write.partitionBy(shard_col)`` for the trainer.
    """
    shard = (hash_bucket(F.col(key), salt=salt) % n_shards).cast("int")
    order = F.md5(
        F.concat(F.lit(f"{salt}:pos"), F.col(key).cast("string")).cast("binary")
    )
    out = df.withColumn(shard_col, shard).withColumn("_order", order)
    # repartition to exactly n_shards so shard == output partition (clean
    # partitionBy writes); the Window reuses this exchange (its required
    # ClusteredDistribution is already satisfied) and adds only the
    # per-partition sort.
    out = out.repartition(n_shards, F.col(shard_col))
    from pyspark.sql.window import Window

    w = Window.partitionBy(shard_col).orderBy("_order", key)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("_order")


def quality_weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    scale: float = 1.0,
    salt: str = "qws",
) -> DataFrame:
    """Importance sampling with per-row keep probability ``scale *
    weight`` (clamped to [0,1]), decided by the row's deterministic hash
    bucket — a pure map-side filter, no shuffle, no RNG.

    The standard corpus-mixing move (quality-weighted upweighting by
    DOWN-sampling the bad tail rather than duplicating the good head):
    every row keeps independently with probability proportional to its
    quality weight, reproducibly across runs/cluster sizes, and the
    decision is ANSI-SQL-expressible for the oracle."""
    p = F.least(F.greatest(weight * scale, F.lit(0.0)), F.lit(1.0))
    keep = hash_bucket(F.col(id_col), salt=salt) < (p * BUCKETS).cast("long")
    return df.filter(keep)


def temperature_weights(
    sizes: dict[str, int], temperature: float = 1.0, cap: float = 1.0
) -> dict[str, float]:
    """Per-source inclusion rates from corpus sizes under temperature
    sampling (the multilingual/multi-source balancing rule of mBERT/XLM-R
    and data-mixture tuning): sampling probability p_i ∝ size_i^(1/T),
    converted to the per-source KEEP rate that realizes those
    probabilities in one pass over each corpus, scaled so the largest
    rate is ``cap`` (≤ 1 — hash filtering can drop rows, never duplicate
    them; up-sampling beyond 1× is the trainer's epoch loop's job).

    T=1 reproduces natural proportions (every rate = cap); T→∞ equalizes
    EXPECTED CONTRIBUTIONS (rate_i ∝ 1/size_i — every source contributes
    the same row count); T<1 sharpens toward the biggest sources. Pure
    driver-side arithmetic over the (tiny) size dict — feed the result to
    :func:`weighted_mix`."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n <= 0 for n in sizes.values()):
        raise ValueError("corpus sizes must be positive")
    total = sum(sizes.values())
    probs = {k: (n / total) ** (1.0 / temperature) for k, n in sizes.items()}
    z = sum(probs.values())
    # keep rate realizing p_i from a one-pass filter: expected rows kept
    # = rate_i * size_i ∝ p_i  ⇒  rate_i ∝ p_i / size_i
    rates = {k: (probs[k] / z) / sizes[k] for k in sizes}
    scale = cap / max(rates.values())
    return {k: r * scale for k, r in rates.items()}


def dsir_bucket_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR bucket log-ratio weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*), in integer micro-log units.

    DSIR scores raw documents by how much their hashed-n-gram profile looks
    like a TARGET corpus (here: the subset of ``df`` matching ``target``)
    relative to the RAW corpus (all of ``df``): fit two bag-of-hashed-ngrams
    multinomials with Laplace smoothing and weight each bucket by
    ``ln p_target(b) - ln p_raw(b)``. This module's variant quantizes each
    bucket weight to an integer number of MICRO-LOGS —
    ``round(1e6 * (ln(t_b+1) - ln(T+B) - ln(r_b+1) + ln(R+B)))`` — so that
    document scores (count-weighted SUMS of bucket weights, see
    :func:`dsir_importance`) live entirely in BIGINT: order-independent,
    overflow-safe, and bit-comparable across engines. The only float op is
    one ln per bucket over exactly-representable integer arguments, rounded
    at a 1e-6 grain — tests assert every bucket value sits far from a
    rounding boundary, which makes the quantization engine-stable even
    under 1-ulp libm differences.

    Output: ``(b, r, t, w_micro)`` — one row per bucket in [0, n_buckets),
    including empty buckets (they carry the pure smoothing weight). B rows
    total: broadcast-sized by construction, independent of corpus size.

    Scale shape: one explode over tokens feeding two partial-aggregated
    groupBys on the bucket id (B distinct keys — the exchange carries at
    most B rows per map task), then O(B) arithmetic. The 100 TB cost is
    the token scan, which is unavoidable and map-parallel.
    """
    spark = df.sparkSession
    from fhir_etl_spark.operators.text import tokens

    tokb = df.select(
        target.alias("__is_target"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(
        "__is_target",
        hash_bucket(F.col("tok"), salt=salt, n_buckets=n_buckets).alias("b"),
    )
    raw = tokb.groupBy("b").agg(F.count(F.lit(1)).alias("r"))
    tgt = (
        tokb.filter(F.col("__is_target"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    buckets = (
        spark.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(raw, "b", "left")
        .join(tgt, "b", "left")
        .select("b", F.coalesce("r", F.lit(0)).alias("r"), F.coalesce("t", F.lit(0)).alias("t"))
    )
    totals = buckets.agg(
        F.sum("r").alias("rt"), F.sum("t").alias("tt")
    )
    bb = float(n_buckets)
    # fixed term order (left-assoc, same shape in the oracle SQL): each ln
    # argument is an integer-valued double, exact by construction
    w = (
        F.log(F.col("t") + 1.0)
        - F.log(F.col("tt") + bb)
        - F.log(F.col("r") + 1.0)
        + F.log(F.col("rt") + bb)
    )
    return (
        buckets.crossJoin(F.broadcast(totals))
        .select("b", "r", "t", F.round(w * 1e6).cast("long").alias("w_micro"))
    )


def dsir_importance(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR importance scores in micro-log units.

    ``score_micro(d) = Σ_b c_d[b] * w_micro[b]`` — the document's hashed
    unigram counts dotted with :func:`dsir_bucket_weights`. Pure BIGINT:
    the sum is order-independent, so the score is exactly reproducible on
    any partitioning and any engine. Select the training subset by taking
    the top-k scores (deterministic ``(score desc, id)`` order) — the
    paper resamples with Gumbel noise; the deterministic variant keeps
    selection reproducible, which is what a 100 TB pipeline wants anyway.

    Plan: token explode → groupBy (id, b) with map-side partial
    aggregation → broadcast join against the B-row weight table →
    groupBy id. Documents with zero tokens score NULL→excluded (no
    profile to weigh); callers wanting them keep a left join on ids.
    """
    from fhir_etl_spark.operators.text import tokens

    weights = dsir_bucket_weights(
        df, target, text_col=text_col, n_buckets=n_buckets, salt=salt
    )
    dbc = (
        df.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("tok")
        )
        .select(
            id_col,
            hash_bucket(F.col("tok"), salt=salt, n_buckets=n_buckets).alias("b"),
        )
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        dbc.join(F.broadcast(weights.select("b", "w_micro")), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("w_micro")).alias("score_micro"))
    )


def token_budget_mix(
    df: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    max_epochs_micro: int = 3_000_000,
    source_col: str = "source",
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """Training-mixture token allocation (the GPT-3/Llama-style mixture
    table, solved the way a 100 TB pipeline has to: from aggregate
    counts, exactly): given integer mixture ``weights`` per source and a
    total ``token_budget``, compute per source

    - ``available_tokens`` — the corpus's whitespace tokens in that source
      (or, with ``count_col``, the sum of a precomputed per-row token
      count — e.g. exact BPE counts under a frozen vocab, the ds13 path:
      budget decisions priced in the tokens the TRAINER will actually
      see, not a whitespace proxy),
    - ``desired_tokens = (budget · w_s) DIV Σw`` — the target share,
    - ``epochs_micro = (desired · 10⁶) DIV available`` — how many passes
      over the source the target implies, CAPPED at ``max_epochs_micro``
      (the standard repetition guard: past a few epochs, repeated data
      stops helping and starts hurting),
    - ``allocated_tokens = min(desired, (available · cap) DIV 10⁶)`` and
      the resulting ``deficit_tokens``.

    Every value is BIGINT via integer DIV — bit-exact cross-engine, no
    float shares. Plan: one explode-free aggregate over the corpus
    (size(split) per doc, summed per source — map-side partial agg),
    then literal weight arithmetic on the ≤|sources| aggregate rows.
    Unknown sources (no weight entry) raise loudly at build time rather
    than silently getting weight 0.
    """
    if token_budget <= 0:
        raise ValueError("token_budget_mix: token_budget must be positive")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("token_budget_mix: weights must be non-negative, non-empty")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("token_budget_mix: weights must sum to a positive total")
    from fhir_etl_spark.operators.text import token_count

    per_row = F.col(count_col) if count_col is not None else token_count(text_col)
    avail = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(per_row).cast("long").alias("available_tokens"))
    )
    arms = " ".join(
        f"WHEN '{s}' THEN CAST({w} AS BIGINT)" for s, w in sorted(weights.items())
    )
    guarded_w = (
        f"CASE source {arms} "
        "ELSE CAST(raise_error(concat('token_budget_mix: no weight for source ', "
        "source)) AS BIGINT) END"
    )
    return (
        avail.selectExpr(
            "source",
            "available_tokens",
            f"{guarded_w} AS weight",
        )
        .selectExpr(
            "source",
            "available_tokens",
            "weight",
            f"(CAST({token_budget} AS BIGINT) * weight) DIV {total_w} AS desired_tokens",
        )
        .selectExpr(
            "source",
            "available_tokens",
            "weight",
            "desired_tokens",
            # a zero-token source must fail LOUDLY: Spark's DIV would
            # return NULL (silent) where DuckDB's // raises — the same
            # answer on neither side is an answer on neither side
            "CASE WHEN available_tokens = 0 THEN "
            "CAST(raise_error(concat('token_budget_mix: source ', source, "
            "' has zero available tokens')) AS BIGINT) "
            "ELSE least((desired_tokens * CAST(1000000 AS BIGINT)) "
            f"DIV available_tokens, CAST({max_epochs_micro} AS BIGINT)) "
            "END AS epochs_micro",
        )
        .selectExpr(
            "source",
            "available_tokens",
            "weight",
            "desired_tokens",
            "epochs_micro",
            "least(desired_tokens, (available_tokens * epochs_micro) "
            "DIV CAST(1000000 AS BIGINT)) AS allocated_tokens",
        )
        .selectExpr(
            "*",
            "desired_tokens - allocated_tokens AS deficit_tokens",
        )
    )


def cluster_cap_sample(
    clusters: DataFrame,
    quality: DataFrame,
    per_cluster: int,
    cluster_col: str = "cluster_id",
    id_col: str = "vec_id",
    quality_id_col: str = "doc_id",
    quality_col: str = "quality",
    pos_col: str = "pos",
) -> DataFrame:
    """Cluster-capped diversity sampling (the DataComp/SemDeDup-family
    curation move: cluster the corpus in embedding space, then cap each
    cluster's contribution, keeping its highest-quality members) — the
    semantic analogue of :func:`quota_cap`'s per-SOURCE cap. Dense
    near-duplicate regions collapse to their ``per_cluster`` best docs;
    sparse/diverse regions survive whole.

    ``clusters`` is (id, cluster) — e.g. similarity.kmeans_assign's
    output; ``quality`` is (id, score) — e.g. text.quality_score.
    Selection is (quality DESC, id ASC) per cluster: deterministic under
    any partitioning, append-monotone (a new doc displaces at most the
    rank-``per_cluster`` member of its own cluster).

    Scale shape: one key-shuffled join (both sides id-keyed; neither is
    corpus-wide text — ids + scalars only) and one rank-≤-k window that
    compiles to WindowGroupLimit (map tasks pre-prune to their local
    top-k per cluster before the exchange, so a degenerate mega-cluster
    costs bounded shuffle volume).
    """
    if per_cluster < 1:
        raise ValueError(f"per_cluster must be ≥ 1, got {per_cluster}")
    from pyspark.sql import Window

    joined = clusters.join(
        quality, clusters[id_col] == quality[quality_id_col]
    ).select(clusters[id_col], clusters[cluster_col], quality[quality_col])
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return (
        joined.withColumn(pos_col, F.row_number().over(w).cast("int"))
        .where(F.col(pos_col) <= per_cluster)
    )
