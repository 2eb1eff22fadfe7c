"""Deterministic sampling for training-data pipelines.

At 10^12 rows, `df.sample()` is unusable for anything that must be
reproducible or joinable across runs/tables (it depends on partition
layout and RNG seeding per task).  Hash-based sampling keys the
decision on the ROW CONTENT: the same (key, seed, rate) always selects
the same rows on any cluster, any partitioning, any engine — so an
eval holdout carved this way stays stable across reruns and can be
reproduced by any other system (the DuckDB oracle computes the same
md5 decision verbatim).

All pure built-ins; selection is a narrow filter (no shuffle), and the
per-stratum variant broadcasts only the rate table.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import ws_tokens


def _bucket(key: Column, seed: int, buckets: int = 1_000_000) -> Column:
    """Stable [0, buckets) bucket from the md5 of key+seed (md5 so the
    oracle can reproduce it; 15 hex chars = 60 bits, unbiased for
    bucket counts << 2^60)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), 1, 15),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_sample(
    df: DataFrame, key: str | Column, rate: float, seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli-by-content sample: keep a row iff
    bucket(key, seed) < rate * buckets. Same inputs -> same rows,
    independent of partitioning; a narrow filter that pushes down."""
    k = F.col(key) if isinstance(key, str) else key
    return df.where(_bucket(k, seed) < F.lit(round(rate * 1_000_000)))


def stratified_sample(
    df: DataFrame, key: str | Column, stratum: str | Column,
    rates: dict[str, float], default_rate: float = 0.0, seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-lang rates to
    rebalance a corpus): the rate table joins in as a broadcast; rows
    in strata without an entry fall back to ``default_rate``.

    Scale shape: one broadcast hash join + narrow filter — the corpus
    never shuffles, hot strata cost nothing extra.
    """
    k = F.col(key) if isinstance(key, str) else key
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    spark = df.sparkSession
    rate_rows = [(name, round(r * 1_000_000)) for name, r in sorted(rates.items())]
    rate_df = F.broadcast(
        spark.createDataFrame(rate_rows, "stratum_key string, keep_below int"))
    joined = df.withColumn("__stratum", s).join(
        rate_df, F.col("__stratum") == F.col("stratum_key"), "left")
    return (
        joined.where(
            _bucket(k, seed)
            < F.coalesce(F.col("keep_below"),
                         F.lit(round(default_rate * 1_000_000)))
        )
        .drop("__stratum", "stratum_key", "keep_below")
    )


def per_domain_cap(
    df: DataFrame,
    domain: str | Column,
    k: int,
    order_by: list[Column],
    salt_key: str | Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """RefinedWeb-style per-domain quota: keep at most ``k`` rows per
    domain, ranked by ``order_by`` (which must be a TOTAL order within
    a domain — end it with a unique id — or the cut is nondeterministic).
    Emits the kept rows plus their ``rank_in_domain``.

    Scale shape: a naive ``row_number() over (partition by domain)``
    funnels every row of a hot domain (at web scale a single host can
    hold 10^9 pages) through ONE task.  With ``salt_key`` set, a
    two-stage top-k runs instead: stage 1 ranks within
    (domain, md5-salt-bucket) and keeps only k rows per bucket —
    correct because the global per-domain top-k is a subset of the
    union of per-bucket top-ks — bounding any domain to k*n_salts rows
    before the real per-domain window.  The corpus shuffles once
    either way; the salt just splits hot keys across tasks.

    Measured nuance (BENCH/skew.py, 4M rows / 40%-hot domain): Spark
    4's WindowGroupLimit already caps the naive window's TASK HEAP at
    k rows per key, so at this scale the naive plan is actually
    FASTER (0.85 s vs 3.15 s — the salt pays an extra shuffle+window)
    and its hot task is not a straggler (max/median 1.09).  Salting
    earns its keep when one domain's ROW COUNT makes a single task's
    linear scan dominate wall clock (the 10^9-page host), not merely
    when the domain is hot — leave ``salt_key`` unset below that
    regime.
    """
    d = F.col(domain) if isinstance(domain, str) else domain
    out = df.withColumn("__dom", d)
    if salt_key is not None:
        sk = F.col(salt_key) if isinstance(salt_key, str) else salt_key
        out = out.withColumn("__salt", _bucket(sk, seed=0, buckets=n_salts))
        w1 = Window.partitionBy("__dom", "__salt").orderBy(*order_by)
        out = (
            out.withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .drop("__r1", "__salt")
        )
    w2 = Window.partitionBy("__dom").orderBy(*order_by)
    return (
        out.withColumn("rank_in_domain", F.row_number().over(w2))
        .where(F.col("rank_in_domain") <= k)
        .drop("__dom")
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    alpha: float = 1.0,
    n_buckets: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-document
    log-likelihood ratio between a TARGET unigram distribution (rows
    where ``is_target``) and the RAW corpus distribution, both
    Laplace-smoothed with ``alpha``.  Resampling the corpus with these
    weights (e.g. via ``hash_sample`` on a weight-derived rate) shifts
    it toward the target domain.

    weight(d) = mean over tokens t of
        ln((c_tgt(t)+a)/(T+aV)) - ln((c_raw(t)+a)/(R+aV))

    Scale shape: tokens are materialized once; target and raw counts
    come from ONE combinable groupBy (conditional sums, no second
    corpus pass); with ``n_buckets`` set, tokens hash into a fixed
    md5-bucket feature space so the per-feature log-ratio table is
    bounded (<= n_buckets rows) and re-enters as a BROADCAST join —
    the corpus never shuffles on the vocabulary.  The exact-token
    variant (n_buckets=None) shuffle-joins on token and exists for
    small-corpus / oracle work.  md5 bucketing (not xxhash) so the
    DuckDB oracle reproduces every weight.

    Emits (id, n_tokens, weight) for documents with >= 1 token.
    """
    did = F.col(id_col)
    toks = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        is_target.cast("boolean").alias("__tgt"),
        ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    ex = toks.select("id", "__tgt", F.explode("__toks").alias("token"))
    feat = (_bucket(F.col("token"), seed=1, buckets=n_buckets)
            if n_buckets else F.col("token")).alias("feat")
    ex = ex.select("id", "__tgt", feat)
    vocab = ex.groupBy("feat").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.count_if(F.col("__tgt")).alias("c_tgt"),
    # lazy reuse barrier (r6, guide §7.2): vocab feeds both the totals
    # aggregate and the ratio crossJoin — without it the corpus token
    # explode + groupBy executes twice. n_buckets rows, bounded.
    ).localCheckpoint(eager=False)
    totals = vocab.agg(
        F.sum("c_raw").alias("r_total"),
        F.sum("c_tgt").alias("t_total"),
        F.count(F.lit(1)).alias("v_size"),
    )
    ratio = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "feat",
            (F.log((F.col("c_tgt") + alpha)
                   / (F.col("t_total") + alpha * F.col("v_size")))
             - F.log((F.col("c_raw") + alpha)
                     / (F.col("r_total") + alpha * F.col("v_size")))
             ).alias("logratio"),
        )
    )
    if n_buckets:  # bounded feature space -> broadcast, corpus never shuffles
        ratio = F.broadcast(ratio)
    return (
        ex.join(ratio, "feat")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logratio"), round_to).alias("weight"),
        )
    )


def temperature_mix_rates(
    df: DataFrame,
    source: str | Column,
    tau: float = 0.7,
    weight: Column | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-pretraining
    recipe of Arivazhagan et al. 2019 / mT5, Xue et al. 2021): the
    target share of source i is p_i^tau / sum_j p_j^tau where p_i is
    its corpus mass; tau=1 keeps natural proportions, tau->0 moves
    toward uniform, upweighting the tail.  The per-source KEEP RATE is
    the target share over the natural share, normalized so the largest
    rate is 1.0 (pure downsampling — no row is ever repeated, matching
    the deterministic-filter sampling model of this module).

    Emits one row per source:
      (source, mass, natural_share, target_share, keep_rate)

    ``weight`` (default: row count) is the mass column — pass token
    counts to mix by tokens rather than documents.

    Scale shape: ONE combinable groupBy over the corpus; everything
    downstream is aggregate-sized (one row per source).  Feed the
    result's keep_rate into :func:`stratified_sample` — the rate table
    broadcasts, the corpus never shuffles.
    """
    s = F.col(source) if isinstance(source, str) else source
    w = F.lit(1).cast("double") if weight is None else weight.cast("double")
    mass = df.select(s.alias("source"), w.alias("__w")).groupBy(
        "source").agg(F.sum("__w").alias("mass"))
    total = F.sum("mass").over(Window.partitionBy())
    tpow = F.pow(F.col("mass") / total, F.lit(tau))
    tshare = tpow / F.sum(tpow).over(Window.partitionBy())
    nshare = F.col("mass") / total
    raw_rate = tshare / nshare
    max_rate = F.max(raw_rate).over(Window.partitionBy())
    return mass.select(
        "source",
        "mass",
        F.round(nshare, round_to).alias("natural_share"),
        F.round(tshare, round_to).alias("target_share"),
        F.round(raw_rate / max_rate, round_to).alias("keep_rate"),
    )


def shard_plan(
    df: DataFrame, key: str | Column, n_shards: int, seed: int = 42,
) -> DataFrame:
    """Deterministic training-order shard plan: a stable global shuffle
    materialized as ``(shard_id, pos)`` per document — the explicit
    read order a training data loader consumes (the Megatron/datatrove
    "shuffle once, write shards" step).

    The order key is content-keyed ``md5(key#seed)``, so the plan is
    byte-reproducible on any cluster, any partitioning, any engine
    (the DuckDB oracle recomputes it verbatim), and a different seed
    is a fresh epoch-level reshuffle of the same corpus.

    Scale shape: shard assignment is a narrow projection (hash mod
    n_shards — NOT ``ntile``, which would force ONE global sort of
    10^12 rows through a single ordering); ``pos`` ranks WITHIN each
    shard only, so the single shuffle partitions by shard_id and each
    shard sorts independently in parallel. The md5 key is uniform, so
    shards balance to +-O(sqrt n) rows with no planning pass; pick
    n_shards >= cluster cores so the per-shard sorts saturate the
    cluster and each stays executor-memory-sized.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    k = F.col(key) if isinstance(key, str) else key
    okey = F.md5(F.concat(k.cast("string"), F.lit(f"#{seed}")))
    out = df.withColumn("_okey", okey).withColumn(
        "shard_id",
        F.pmod(
            F.conv(F.substring(F.col("_okey"), 1, 15), 16, 10).cast("long"),
            F.lit(n_shards).cast("long"),
        ),
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_okey"),
                                               k.cast("string"))
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")).drop("_okey")


def execute_mix(
    df: DataFrame, rates: DataFrame, source_col: str = "source",
    key_col: str = "id", seed: int = 13,
) -> DataFrame:
    """EXECUTE a source-mixing recipe: apply
    :func:`temperature_mix_rates`' per-source keep_rate as the
    deterministic md5-bucket filter — the step that turns the rate
    table into an actual training mix.  Thresholds are integerized
    (round(rate * 1e6)) so the comparison is exact integer arithmetic,
    bucket-for-bucket reproducible by any engine.

    Scale shape: the rate table is aggregate-sized (one row per
    source) and BROADCASTS; the corpus takes one hash join + a codegen
    filter — it never shuffles.  Sources missing from the rate table
    keep everything (threshold defaults to the full bucket range)."""
    r = rates.select(
        F.col(source_col).alias("__mix_source"),
        F.round(F.col("keep_rate") * 1_000_000).cast("long")
        .alias("__thresh"))
    j = df.join(F.broadcast(r),
                df[source_col] == F.col("__mix_source"), "left") \
          .drop("__mix_source")
    keep = _bucket(F.col(key_col), seed) < \
        F.coalesce(F.col("__thresh"), F.lit(1_000_000))
    return j.where(keep).drop("__thresh")


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    splits: tuple = (("train", 0.90), ("val", 0.05), ("test", 0.05)),
    seed: int = 11,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a
    deterministic md5 bucket of the document's NEAR-DUP GROUP label
    (``groups`` = (node, grp) from dedup connected components;
    unpaired docs are their own group), never of the document itself —
    so two near-duplicate documents can NEVER land in different
    splits.  Splitting by doc hash leaks eval data into training
    through every near-dup pair; this is the standard fix (the same
    reason contamination_check exists), done at assignment time
    instead of audit time.

    Returns one row per split: (split, n_docs, n_groups, leak_groups)
    where ``leak_groups`` counts groups spanning >1 split — zero by
    construction, emitted so the invariant is ASSERTED in the output
    rather than assumed.

    Scale shape: one left join of the corpus ids against the
    (small) group table, integerized cumulative bucket thresholds
    (mixture_execute rule: exact integer compares, no float edges),
    two partial-aggregable rollups; the leak audit is aggregate-sized
    and re-enters as a broadcast scalar.
    """
    weights = [w for _, w in splits]
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {sum(weights)}")
    assigned = (
        df.select(F.col(id_col))
        .join(groups.withColumnRenamed("node", id_col), id_col, "left")
        .select(F.col(id_col),
                F.coalesce(F.col("grp"), F.col(id_col)).alias("grp"))
    )
    bk = _bucket(F.col("grp"), seed)
    expr = None
    cum = 0.0
    for name, wgt in splits[:-1]:
        cum += wgt
        bound = int(round(cum * 1_000_000))
        expr = (F.when if expr is None else expr.when)(
            bk < bound, F.lit(name))
    expr = (expr.otherwise(F.lit(splits[-1][0]))
            if expr is not None else F.lit(splits[-1][0]))
    # lazy reuse barrier (r6, guide §7.2): s feeds both the leak audit
    # and the per-split rollup — without it the group-assignment join
    # over the corpus executes twice. (id, grp, split) rows, narrow.
    s = assigned.select(id_col, "grp", expr.alias("split")) \
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    leak = (
        s.groupBy("grp").agg(F.countDistinct("split").alias("__ns"))
        .agg(F.coalesce(F.sum((F.col("__ns") > 1).cast("long")),
                        F.lit(0)).alias("leak_groups"))
    )
    roll = s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("grp").alias("n_groups"),
    )
    return roll.crossJoin(F.broadcast(leak))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 13,
    round_to: int = 6,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of size ``k``
    (Efraimidis & Spirakis 2006): each row draws u = uniform(0,1] and
    competes with key u^(1/w); the k largest keys are exactly a
    w-proportional sample without replacement — the one-pass,
    fully-distributed form of weighted subsampling (quality-weighted
    corpus thinning, importance-weighted eval draws).

    u is md5-derived from (id, seed) — 60 bits mapped to
    ((h+1) / 2^60) ∈ (0, 1] — so the draw is deterministic,
    engine-reproducible, and re-runnable (same seed → same sample;
    bump the seed for a fresh epoch).  Rows with weight <= 0 or NULL
    never enter (P=0 under the scheme; enforced explicitly so a zero
    weight cannot produce 1/0).

    Emits (id, weight, sample_key, rank), rank 1..k by key descending,
    ties broken on id.

    Scale shape: key computation is one codegen projection; the top-k
    is TakeOrderedAndProject (per-partition heap of k + driver merge
    of k rows — no global sort, no shuffle of the corpus); the rank
    window runs on the k-row result.
    """
    did, w = F.col(id_col), F.col(weight_col).cast("double")
    h = F.conv(F.substring(F.md5(F.concat(
        did.cast("string"), F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 60))
    key = F.pow(u, F.lit(1.0) / w)
    top = (
        df.where(w.isNotNull() & (w > 0))
        .select(did.alias("id"), w.alias("weight"), key.alias("__key"))
        .orderBy(F.desc("__key"), F.asc("id"))
        .limit(k)
    )
    return top.select(
        "id", "weight",
        F.round(F.col("__key"), round_to).alias("sample_key"),
        F.row_number().over(
            Window.orderBy(F.desc("__key"), F.asc("id"))).alias("rank"),
    )


def budget_threshold(
    df: DataFrame,
    score: Column,
    tokens: Column,
    budget_tokens: int,
    score_round: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Token-budget quality cut (the FineWeb-style curation decision:
    "keep the highest-quality documents until the training budget is
    full"): find the score threshold such that taking whole score
    buckets from the top down stays within ``budget_tokens``, and
    report the cut — one row: (budget_tokens, threshold_score,
    kept_docs, kept_tokens, utilization).

    Semantics: scores round to ``score_round`` decimals (the bucket
    granularity, which also bounds the under-fill: at most one
    bucket's tokens are left on the table); buckets are taken greedily
    in descending score order while the running token total stays
    <= budget; ``threshold_score`` is the lowest score taken, so the
    materialized keep-filter is ``score >= threshold_score``.  An
    over-budget top bucket yields an empty cut (kept 0, threshold
    NULL) rather than a partial bucket — deterministic and
    engine-independent.

    Scale shape: ONE partial-aggregable groupBy collapses the corpus
    to the score histogram (<= 10^score_round + 1 rows); the
    cumulative window and the final aggregate run on that
    aggregate-sized table (the heaps_profile precedent — a global
    window is fine over bucket-count rows, never over the corpus).
    """
    scored = df.select(F.round(score, score_round).alias("s"),
                       tokens.alias("tok"))
    hist = scored.groupBy("s").agg(
        F.sum("tok").alias("btok"),
        F.count(F.lit(1)).alias("bdocs"))
    w = Window.orderBy(F.desc("s"))
    cum = hist.select(
        "s",
        F.sum("btok").over(w).alias("cum_tok"),
        F.sum("bdocs").over(w).alias("cum_docs"))
    sel = cum.where(F.col("cum_tok") <= budget_tokens)
    z = F.lit(0).cast("bigint")
    return sel.agg(
        F.lit(budget_tokens).cast("bigint").alias("budget_tokens"),
        F.min("s").alias("threshold_score"),
        F.coalesce(F.max("cum_docs"), z).alias("kept_docs"),
        F.coalesce(F.max("cum_tok"), z).alias("kept_tokens"),
        F.round(F.coalesce(F.max("cum_tok"), z)
                / F.lit(float(budget_tokens)), round_to)
        .alias("utilization"))
