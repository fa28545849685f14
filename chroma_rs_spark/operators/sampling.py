"""Deterministic sampling & dataset splits (SURVEY.md §2.3 [EXT] —
training-data pipeline operators).

Both operators key off a content-independent hash bucket
(md5 of the id, first 8 hex chars, mod `buckets`), NOT `rand()`:

* reproducible — the same row lands in the same sample/split on every
  run, every engine, any partitioning (rand()-based sampling changes
  under retries and repartitioning, and cannot be oracle-checked);
* stable under growth — adding new rows never moves an existing row
  between splits, so a training set stays fixed while the corpus
  grows (the property curated-dataset pipelines actually need);
* map-side only — no shuffle, filters push down around it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chroma_rs_spark.operators.dedup import base_hash32
from chroma_rs_spark.plans.partitioning import maybe_broadcast

SAMPLE_BUCKETS = 10_000


def hash_bucket(id_col: str | Column, buckets: int = SAMPLE_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from the row id — engine-portable
    (the same md5-based hash the minhash family is built on).

    Granularity is 1/buckets (default 1e-4): fractions are realized as
    integer bucket cutoffs, so a nonzero fraction below half a bucket
    is rounded up to one bucket rather than silently sampling nothing.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (base_hash32(c.cast("string")) % buckets).cast("int")


def _cutoff(fraction: float) -> int:
    if fraction <= 0.0:
        return 0
    return max(1, int(round(fraction * SAMPLE_BUCKETS)))


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by id hash bucket."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(id_col) < _cutoff(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum fraction of rows (e.g. downsample dominant
    languages while keeping all of a rare one). Same hash-bucket
    construction as `deterministic_sample`, so it is reproducible,
    growth-stable, and map-side (the per-stratum cutoff is a CASE
    expression — no shuffle, no per-stratum pass)."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    strata = F.col(strata_col)
    cutoff = F.lit(_cutoff(default_fraction))
    for k, v in fractions.items():
        cutoff = F.when(strata == k, F.lit(_cutoff(v))).otherwise(cutoff)
    return df.filter(hash_bucket(id_col) < cutoff)


def dataset_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split with ~`weights` proportions.

    Weights must sum to 1 (±1e-9). Split boundaries are cumulative
    bucket ranges, so splits are disjoint and exhaustive.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col)
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        bound = int(round(acc * SAMPLE_BUCKETS))
        cond = bucket < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out, expr)


def split_contamination(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    train_split: str = "train",
) -> DataFrame:
    """Decontamination check: documents in any non-train split whose
    content fingerprint also occurs in the train split — the overlap a
    training pipeline must strip before an eval set means anything.

    Content identity is doc_fingerprint (min shingle hash,
    operators/text.py), so near-identical copies are caught, not just
    byte-equal ones. Plan shape: the split assignment is map-side
    (hash-bucket), the fingerprint is one groupBy(doc), and the leak
    test is one window keyed on fingerprint — at 100 TB that is a
    single hash shuffle of (fingerprint) rows, no corpus^2 anything.

    Returns (doc_id, split, fingerprint) for contaminated eval docs.
    """
    from pyspark.sql.window import Window

    from chroma_rs_spark.operators.text import doc_fingerprint

    if train_split not in weights:
        # an empty result must mean "no leaks", never a typo'd split
        # name silently matching nothing
        raise ValueError(
            f"train_split {train_split!r} is not a split name; "
            f"weights define {sorted(weights)}"
        )

    # dataset_split keeps the input columns, so text rides along
    sp = dataset_split(df, weights, id_col=id_col)
    fp = doc_fingerprint(df, id_col=id_col, text_col=text_col)
    # LEFT join + md5(text) fallback: docs too short to produce a
    # 5-gram shingle have no min-shingle fingerprint and an inner join
    # would silently exempt them from the leak check
    j = sp.join(fp, id_col, "left").select(
        id_col,
        "split",
        F.coalesce(F.col("fingerprint"), F.md5(F.col(text_col))).alias(
            "fingerprint"
        ),
    )
    # one window over the fingerprint instead of a second corpus-wide
    # aggregation + semi join: the shingle/fingerprint subtree is
    # evaluated once
    has_train = F.max(
        (F.col("split") == F.lit(train_split)).cast("int")
    ).over(Window.partitionBy("fingerprint"))
    return (
        j.withColumn("_ht", has_train)
        .where((F.col("split") != F.lit(train_split)) & (F.col("_ht") == 1))
        .select(id_col, "split", "fingerprint")
    )


def contaminated_ids(
    df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_split: str = "train",
    split_col: str = "split",
) -> DataFrame:
    """Just the ids of contaminated non-train documents — the exact
    set ``ngram_decontamination(...).filter(contaminated)`` selects,
    computed with strictly less work (round 14, guide §2.3/§2.4): a
    consumer that only DROPS contaminated docs (curate_corpus stage 8)
    needs membership, not per-doc gram counts, so the per-(doc, gram)
    distinct, the count aggregation and the join-back to the full
    non-train doc set all fall away. One semi join on the gram hash
    decides membership; dedup to one row per doc happens on the id
    alone. Equivalence: contaminated == (n_contaminated > 0) == "some
    n-gram of this non-train doc occurs in train" — precisely the semi
    join's predicate; gram-less docs (n_grams=0) are absent from the
    gram stream and were never contaminated. Pinned by
    tests/test_quality_decontam.py parity test.
    """
    from chroma_rs_spark.operators.dedup import (
        nonempty_tokens_col,
        shingles_col,
    )
    from chroma_rs_spark.plans import fan_out

    if split_col not in df.columns:
        raise ValueError(f"split_col {split_col!r} is not a column of df")
    # same fan-out + tokenize/shingle/md5 stream as the full operator
    src = fan_out(
        df.select(id_col, F.col(split_col).alias("split"), text_col),
        min_bytes=0,
    )
    grams = src.select(
        F.col(id_col),
        F.col("split"),
        F.explode(shingles_col(nonempty_tokens_col(text_col), n)).alias("_g"),
    ).select(id_col, "split", F.md5("_g").alias("_h"))
    train_grams = (
        grams.filter(F.col("split") == train_split).select("_h").distinct()
    )
    eval_grams = grams.filter(F.col("split") != train_split).select(
        id_col, "_h"
    )
    # same SHUFFLE_HASH rationale as the full operator: the size
    # estimate behind a Generate would let the planner auto-broadcast
    # a corpus-scaled gram set (measured maxResultSize failure)
    return (
        eval_grams.join(train_grams.hint("shuffle_hash"), "_h", "left_semi")
        .select(id_col)
        .distinct()
    )


def ngram_decontamination(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_split: str = "train",
    split_col: str | None = None,
) -> DataFrame:
    """Substring-level decontamination — the GPT-3/Brown et al. 2020
    (§C) method `split_contamination` cannot express: a non-train
    document is contaminated if any of its token n-grams (n=13 there
    and here) also occurs in the train split, catching PARTIAL overlap
    (a quoted paragraph, a shared boilerplate block) that whole-document
    fingerprints miss.

    Returns one row per NON-train document: (doc_id, split, n_grams,
    n_contaminated, contamination_ratio, contaminated), counting
    DISTINCT n-grams. Documents shorter than n tokens have no grams —
    n_grams=0, NULL ratio, contaminated=false (nothing to collide).

    Scale shape: grams hash with the engine's md5 family and shuffle on
    the GRAM key (md5-uniform — a boilerplate gram shared by millions
    of documents is ONE key on the train side because the train set is
    distinct-ed before the join, and the eval side distincts per
    (doc, gram), the same two-phase discipline as _span_doc_counts);
    the train-membership test is a semi join, counts are
    map-side-combinable. No broadcast assumption: the train gram set
    scales with the corpus and joins shuffled.

    Measured negative result (round-7): replacing the (doc, gram)
    distinct shuffle with an in-row array_distinct over the gram array
    (the line_dedup move) is 2x SLOWER here — interleaved best-of-7 at
    sf0.1: 1.01 s vs 2.11 s — because a doc carries ~90 thirteen-token
    gram strings and array_distinct evaluates interpreted per element;
    line_dedup wins the same trade with ~10 short lines per doc. The
    shuffle stays.
    """
    from chroma_rs_spark.operators.dedup import (
        nonempty_tokens_col,
        shingles_col,
    )

    # either derive the split here (weights) or decontaminate against a
    # caller-provided assignment (split_col — e.g. curate_corpus's
    # leakage-safe split, which an id-hash re-derivation would NOT match)
    if split_col is not None:
        if split_col not in df.columns:
            raise ValueError(
                f"split_col {split_col!r} is not a column of df"
            )
        sp = df.withColumn("split", F.col(split_col))
    else:
        if weights is None:
            raise ValueError(
                "ngram_decontamination: pass either weights or split_col"
            )
        if train_split not in weights:
            raise ValueError(
                f"train_split {train_split!r} is not a split name; "
                f"weights define {sorted(weights)}"
            )
        sp = dataset_split(df, weights, id_col=id_col)
    # fan the CPU-dense tokenize/shingle/md5 explode across cores: a
    # small-file scan otherwise runs it on ONE partition (the round-6
    # lesson, plans/partitioning.py); no-op at scale where the scan
    # already has >= cores partitions. Both gram branches share the
    # identical round-robin exchange, so the scan is ReusedExchange'd.
    from chroma_rs_spark.plans import fan_out

    src = fan_out(sp.select(id_col, "split", text_col), min_bytes=0)
    grams = src.select(
        F.col(id_col),
        F.col("split"),
        F.explode(shingles_col(nonempty_tokens_col(text_col), n)).alias("_g"),
    ).select(id_col, "split", F.md5("_g").alias("_h"))
    train_grams = (
        grams.filter(F.col("split") == train_split).select("_h").distinct()
    )
    eval_grams = grams.filter(F.col("split") != train_split).select(
        id_col, "split", "_h"
    ).distinct()
    # ONE aggregation for both counts (round-7): mark each distinct
    # eval gram by a left join against the train set (same _h-keyed
    # shuffle a semi join pays) and count total + marked in a single
    # per-doc groupBy — two fewer stages than separate totals/hits
    # aggregations joined back per doc
    # SHUFFLE_HASH pins the physical strategy: the optimizer's size
    # estimate for train_grams flows through a Generate (explode),
    # which does not scale the size stats, so at 100x corpora the
    # planner auto-broadcast a ~1.4 GB distinct-gram set and died on
    # spark.driver.maxResultSize (measured: 500k-doc curate stress,
    # stage 88). The docstring's no-broadcast contract is now enforced
    # in the plan, not assumed; shuffle-hash (not sort-merge) because
    # the gram sets need no sort order and the train side hashes
    # per-partition.
    per_doc = (
        eval_grams.join(
            train_grams.withColumn("_t", F.lit(1)).hint("shuffle_hash"),
            "_h",
            "left",
        )
        .groupBy(id_col, "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count("_t").cast("long").alias("n_contaminated"),
        )
    )
    base = sp.filter(F.col("split") != train_split).select(id_col, "split")
    return (
        base.join(per_doc.drop("split"), id_col, "left")
        # coalesce FIRST, derive ratio/flag from the coalesced columns:
        # a doc with grams but zero hits must get ratio 0.0, not the
        # NULL a raw n_contaminated would propagate
        .select(
            id_col,
            "split",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
        )
        .select(
            id_col,
            "split",
            "n_grams",
            "n_contaminated",
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.col("n_contaminated").cast("double") / F.col("n_grams"),
                    6,
                )
                + F.lit(0.0),
            ).alias("contamination_ratio"),
            (F.col("n_contaminated") > 0).alias("contaminated"),
        )
    )


def temperature_mixture_sample(
    df: DataFrame,
    total_fraction: float,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-rebalanced mixture sampling: keep ~`total_fraction`
    of the corpus with per-source rates chosen so the SAMPLED source
    distribution follows p_s ∝ n_s^alpha — the standard pretraining
    trick that upsamples small sources (alpha < 1 flattens the mix;
    alpha = 1 is proportional, i.e. plain uniform sampling).

    Per-source keep-rate: f_s = total_fraction * N * p_s / n_s, capped
    at 1. Selection reuses the deterministic id-hash buckets
    (hash_bucket), so membership is stable under corpus growth and
    engine-reproducible. The per-source stats are ONE aggregation
    broadcast back; the filter itself is map-side.

    The default alpha=0.5 computes n^alpha via sqrt, which is
    IEEE-correctly-rounded on every engine; arbitrary alpha uses pow,
    where a last-ulp difference between engines could flip a rate
    rounded exactly at a bucket boundary (rates are rounded to bucket
    granularity on both sides to make that window tiny).
    """
    if not 0.0 < total_fraction <= 1.0:
        raise ValueError("total_fraction must be in (0, 1]")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    # NULL sources form their own stratum instead of silently vanishing
    # at the equi-join (an inner join never matches NULL = NULL)
    src_key = F.coalesce(F.col(source_col).cast("string"), F.lit("\x00null"))
    df = df.withColumn("_src", src_key)
    stats = df.groupBy("_src").agg(F.count(F.lit(1)).alias("_ns"))
    if alpha == 0.5:
        pw = F.sqrt(F.col("_ns").cast("double"))
    else:
        pw = F.pow(F.col("_ns").cast("double"), F.lit(alpha))
    # _z folds in source-sorted order (not F.sum over doubles, whose
    # partial-agg order is engine/partitioning-dependent in the last
    # ulp) so the cutoff arithmetic is bit-reproducible
    tot = stats.agg(
        F.sum("_ns").alias("_n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_src").alias("s"), pw.alias("p")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("_z"),
    )
    # f_s = F * N * (ns^a / Z) / ns, as one fixed expression; cutoff in
    # integer buckets like deterministic_sample, with the same
    # round-up-to-one-bucket floor (a mathematically nonzero rate must
    # never silently sample nothing — the hash_bucket contract)
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "_src",
        F.least(
            F.greatest(
                F.round(
                    F.lit(total_fraction)
                    * F.col("_n").cast("double")
                    * (
                        (pw / F.col("_z"))
                        / F.col("_ns").cast("double")
                    )
                    * F.lit(float(SAMPLE_BUCKETS))
                ).cast("int"),
                F.lit(1),
            ),
            F.lit(SAMPLE_BUCKETS),
        ).alias("_cutoff"),
    )
    return (
        df.join(F.broadcast(rates), "_src")
        .where(hash_bucket(id_col) < F.col("_cutoff"))
        .drop("_cutoff", "_src")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    threshold: float = 0.5,
    sim_col: str = "est_jaccard",
    out: str = "split",
) -> DataFrame:
    """`dataset_split`, but leakage-safe: near-duplicate documents land
    in the SAME split, always.

    A plain id-hash split puts the two halves of a near-dup pair on
    opposite sides of the train/test boundary, leaking test content
    into training — the contamination `split_contamination` can only
    REPORT after the fact. This op prevents it structurally: documents
    are clustered on the candidate-pair graph (connected components of
    LSH near-dup pairs, operators/graph.py), and the split bucket is
    hashed from the CLUSTER id instead of the document id, so a whole
    duplicate cluster co-assigns. Singletons hash on their own id
    (cluster_id == doc_id), keeping the proportions of
    `dataset_split`'s id-hash behavior for the non-duplicated bulk.

    Scale shape: the clustering is the bounded-pair lazy union-find /
    star-contraction machinery of `dedup_clusters`; the split itself
    stays one map-side hash — no extra shuffle beyond the clustering.

    Returns (id, cluster_id, split).
    """
    from chroma_rs_spark.operators.graph import dedup_clusters

    clusters = dedup_clusters(
        docs,
        pairs,
        id_col=id_col,
        threshold=threshold,
        sim_col=sim_col,
        lazy_local=True,
    ).select(id_col, "cluster_id")
    # the assignment IS dataset_split, keyed on cluster_id — one
    # boundary arithmetic, so singleton assignment can never drift from
    # the plain id-hash split
    return dataset_split(clusters, weights, id_col="cluster_id", out=out).select(
        id_col, "cluster_id", out
    )


DSIR_BUCKETS = 10_000


def dsir_importance(
    df: DataFrame,
    target_filter: Column | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    top_k: int | None = None,
) -> DataFrame:
    """Data Selection with Importance Resampling — DSIR (Xie et al.,
    NeurIPS 2023, arXiv:2302.03169): score every document by how much
    more likely its hashed n-gram features are under a TARGET domain
    (the rows matching `target_filter`) than under the raw corpus, then
    optionally resample `top_k` documents without replacement via
    deterministic Gumbel-top-k.

    Features are the paper's: unigrams + token bigrams hashed into
    `buckets` buckets (10k there and here). Bucket models are add-1
    smoothed multinomials; the importance weight of a document is
    log w(d) = sum over its feature occurrences of
    log p_target(b) - log p_raw(b). Selection keys are
    log w + Gumbel noise, with the uniform drawn from the engine's
    md5 id hash instead of rand() — reproducible on any engine, any
    partitioning, the repo-wide sampling discipline (`hash_bucket`).

    Returns (id, n_feats, log_weight[, sel_key, selected]); the last
    two only when `top_k` is set. NULL/short texts with zero features
    keep their row with n_feats=0, NULL weight, never selected (the
    unscorable convention).

    Scale shape (100 TB): the bucket tables are BOUNDED by construction
    (<= `buckets` rows — broadcast unconditionally, unlike the
    unbounded vocab joins which gate their hint), occurrence rows
    collapse to per-doc bucket counts in ONE map-side-combinable pass
    (the raw token stream never reaches a shuffle — the per-doc score
    shuffles doc x touched-bucket count rows), and the log-probability
    fold runs in BUCKET order with multiplicity (cnt * lambda;
    array_sort + left fold, the lm_perplexity/bm25 float-order
    discipline) so weights are engine-reproducible bit-for-bit at
    round-6. Gumbel-top-k is one TakeOrderedAndProject, no global
    window.

    Caching contract: the function is LAZY (it runs no actions), so the
    persisted intermediates (the bucket-count table, and the scored
    table when `top_k` is set) cannot be unpersisted here — they must
    outlive the return for the caller's actions to reuse them. They are
    registered on the returned DataFrame; call
    ``release_dsir_cache(result)`` (or ``result.unpersist()`` on each
    handle in ``result._dsir_cached``) once the consuming actions are
    done to avoid accumulating cached RDDs in a long-lived session.
    """
    from chroma_rs_spark.operators.dedup import (
        base_hash32,
        nonempty_tokens_col,
        shingles_col,
    )
    from chroma_rs_spark.plans import fan_out

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    pred = F.expr(target_filter) if isinstance(target_filter, str) else target_filter
    toks = nonempty_tokens_col(text_col)
    src = fan_out(
        df.select(
            F.col(id_col), F.col(text_col), pred.alias("_is_t")
        ),
        min_bytes=0,
    )
    feats = src.select(
        F.col(id_col),
        F.col("_is_t"),
        F.explode(F.concat(toks, shingles_col(toks, 2))).alias("_f"),
    ).select(
        id_col,
        "_is_t",
        (base_hash32("_f") % F.lit(buckets)).alias("_b"),
    )
    # collapse the occurrence stream to per-doc BUCKET COUNTS first
    # (map-side-combinable; <= `buckets` rows per doc). Everything
    # downstream — the bucket models AND the per-doc score — reads this
    # table, so the tokenize+explode runs ONCE and the score shuffle
    # carries doc x touched-bucket rows instead of the raw token stream
    # (collect_list over occurrences had no partial aggregation — the
    # plan the r8 audit found executing the explode branch 4x with
    # zero exchange reuse, 1.9 s vs a 0.65 s oracle at sf0.1). The
    # per-doc fold runs in BUCKET order with multiplicity (cnt * lam),
    # same float-order discipline, mirrored in the oracle.
    bcounts = feats.groupBy(id_col, "_is_t", "_b").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # the count table feeds BOTH the bucket models and the per-doc
    # score; persist (spillable, lazy) so the explode chain executes
    # once — measured at sf0.1: the un-persisted form re-ran the
    # tokenize+explode branch 4x (zero exchange reuse across the
    # model/score/top-k consumers), 2.0 s warmed vs 0.65 s oracle
    bcounts = bcounts.persist()
    # one pass for both bucket models: raw count + target count per
    # bucket, map-side combinable; <= `buckets` result rows
    bstats = bcounts.groupBy("_b").agg(
        F.sum("_cnt").alias("_cr"),
        F.sum(F.when(F.col("_is_t"), F.col("_cnt")).otherwise(F.lit(0))).alias(
            "_ct"
        ),
    )
    # corpus totals derived FROM the bucket table, not a third pass
    # over the feature explode: one fewer full scan+tokenize branch
    totals = bstats.agg(
        F.sum("_cr").alias("_Nr"),
        F.sum("_ct").alias("_Nt"),
    )
    lam = (
        bstats.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            (
                F.log(
                    (F.col("_ct").cast("double") + F.lit(1.0))
                    / (F.col("_Nt").cast("double") + F.lit(float(buckets)))
                )
                - F.log(
                    (F.col("_cr").cast("double") + F.lit(1.0))
                    / (F.col("_Nr").cast("double") + F.lit(float(buckets)))
                )
            ).alias("_lam"),
        )
    )
    scored = (
        bcounts.join(F.broadcast(lam), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").cast("long").alias("n_feats"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_b"),
                        (F.col("_cnt").cast("double") * F.col("_lam")).alias(
                            "_w"
                        ),
                    )
                )
            ).alias("_l"),
        )
        .selectExpr(
            f"`{id_col}`",
            "n_feats",
            "round(aggregate(_l, 0.0D, (a, x) -> a + x._w), 6)"
            " + 0.0D AS log_weight",
        )
    )
    out = (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
            "log_weight",
        )
    )
    if top_k is None:
        out._dsir_cached = [bcounts]  # see docstring caching contract
        return out
    # the scored table is consumed twice below (the top-k scan and the
    # selection join); persist so the scoring chain executes once
    out = out.persist()
    # Gumbel-top-k resampling without replacement: u in (0,1) from the
    # md5 id hash (deterministic; +0.5 keeps u strictly inside (0,1))
    u = (base_hash32(F.col(id_col).cast("string")) + F.lit(0.5)) / F.lit(
        4294967296.0
    )
    sel_key = F.round(
        F.col("log_weight") - F.log(-F.log(u)), 6
    ) + F.lit(0.0)
    keyed = out.withColumn("sel_key", sel_key)
    chosen = (
        keyed.filter(F.col("sel_key").isNotNull())
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(int(top_k))
        .select(F.col(id_col), F.lit(True).alias("_sel"))
    )
    result = keyed.join(chosen, id_col, "left").select(
        id_col,
        "n_feats",
        "log_weight",
        "sel_key",
        F.coalesce("_sel", F.lit(False)).alias("selected"),
    )
    result._dsir_cached = [bcounts, out]  # see docstring caching contract
    return result


def release_dsir_cache(result: DataFrame, blocking: bool = False) -> None:
    """Unpersist the intermediates `dsir_importance` cached for its
    consumers (docstring caching contract). No-op on DataFrames that
    carry no cache registry."""
    for cached in getattr(result, "_dsir_cached", []):
        cached.unpersist(blocking=blocking)


TOKEN_BUDGET_BUCKETS = 64


def token_budget_sample(
    df: DataFrame,
    budget: int,
    budgets: dict[str, int] | None = None,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = TOKEN_BUDGET_BUCKETS,
) -> DataFrame:
    """Deterministic per-language token-budget sampling — the mixing
    step a pretraining pipeline runs after choosing proportions
    (`temperature_mixture_sample` picks WEIGHTS; this op realizes a
    TOKEN COUNT): within each language, documents are taken in md5-id
    order until the cumulative token count reaches the language's
    budget (`budgets[lang]`, else `budget`). The md5 order makes the
    sample reproducible, growth-stable (a new doc displaces only docs
    hashed after it) and engine-portable, like every sampler here.

    Returns (id, lang, n_tokens, cum_tokens, selected): `cum_tokens`
    is the running total INCLUDING this row, `selected` means
    cum_tokens <= budget — so a doc is kept iff it fits entirely.
    NULL text counts 0 tokens; NULL language forms its own group.

    Scale shape — a running sum per language is the textbook hot
    window (PARTITION BY lang routes an entire language through one
    task; 'en' at 100 TB is most of the corpus). The cumsum is
    therefore HIERARCHICAL: rows bucket by the leading 16 bits of
    their md5 (order-preserving: every hash in bucket b sorts before
    every hash in bucket b+1, ties stay in-bucket), the window runs
    per (lang, bucket) — hottest partition is |lang|/n_buckets — and
    bucket offsets come from a (langs x n_buckets)-row aggregate whose
    own exclusive prefix sum is computed on that tiny table and
    broadcast back. All-integer arithmetic end to end, so the result
    is bit-exact and partition-order independent.
    """
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col

    if budget < 0 or (budgets and any(v < 0 for v in budgets.values())):
        raise ValueError("token budgets must be >= 0")
    # explicit NULL test, not coalesce(size(...)): size(NULL) is -1
    # with ANSI off and NULL with ANSI on — this form is correct
    # under both (the r5 `_t IS NULL` convention)
    qty = (
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(nonempty_tokens_col(text_col)))
        .cast("long")
    )
    return _hierarchical_capped_cumsum(
        df,
        qty=qty,
        key_col=lang_col,
        id_col=id_col,
        cap=budget,
        caps=budgets,
        n_buckets=n_buckets,
        qty_out="n_tokens",
        cum_out="cum_tokens",
    )


def _hierarchical_capped_cumsum(
    df: DataFrame,
    qty: Column,
    key_col: str,
    id_col: str,
    cap: int,
    caps: dict[str, int] | None,
    n_buckets: int,
    qty_out: str,
    cum_out: str,
) -> DataFrame:
    """Shared scale shape of the budgeted samplers (`token_budget_sample`,
    `domain_cap_sample`): per-key running sum of `qty` in md5-id order,
    realized hierarchically — rows bucket on the leading 16 bits of the
    md5 (order-preserving slices), the window runs per (key, bucket) so
    the hottest partition is |key|/n_buckets, bucket offsets come from
    a (keys x n_buckets)-row broadcast aggregate. All-integer, bit-exact,
    partition-order independent. Returns (id, key, qty_out, cum_out,
    selected) with selected = cum_out <= caps.get(key, cap)."""
    from pyspark.sql.window import Window

    if not (1 <= n_buckets <= 65536 and 65536 % n_buckets == 0):
        raise ValueError(
            f"n_buckets must divide 65536 (got {n_buckets}): buckets are "
            "equal slices of the 16-bit md5 prefix"
        )
    width = 65536 // n_buckets
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.col(key_col).alias("_key"),
        qty.alias(qty_out),
        h.alias("_h"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") / F.lit(width))
        .cast("int")
        .alias("_bk"),
    )
    w_local = (
        Window.partitionBy("_key", "_bk")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum_local", F.sum(qty_out).over(w_local))
    # bucket totals: keys x n_buckets rows; exclusive prefix over the
    # tiny table, broadcast back — no key-wide window anywhere
    w_off = (
        Window.partitionBy("_key")
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("_key", "_bk")
        .agg(F.sum(qty_out).alias("_btot"))
        .withColumn(
            "_off", F.coalesce(F.sum("_btot").over(w_off), F.lit(0).cast("long"))
        )
        .select("_key", "_bk", "_off")
    )
    lim = F.lit(int(cap)).cast("long")
    for k, v in (caps or {}).items():
        lim = F.when(F.col("_key") == k, F.lit(int(v)).cast("long")).otherwise(
            lim
        )
    # null-safe on the key: a NULL key is a legitimate budget group
    # (its own window partition) and a plain equi-join would silently
    # drop every one of its rows
    off = offsets.select(
        F.col("_key").alias("_key2"),
        F.col("_bk").alias("_bk2"),
        "_off",
    )
    # size-gated hint, not F.broadcast: the offsets table is
    # |keys| x n_buckets rows and for domain_cap_sample the key is an
    # unbounded crawl-host domain — millions of hosts x 64 buckets must
    # degrade to a shuffled join (AQE can still auto-broadcast small
    # actuals), not fail at the 8 GB broadcast ceiling (ADVICE r7)
    return (
        local.join(
            maybe_broadcast(off),
            F.col("_key").eqNullSafe(F.col("_key2"))
            & (F.col("_bk") == F.col("_bk2")),
        )
        .select(
            id_col,
            F.col("_key").alias(key_col),
            qty_out,
            (F.col("_off") + F.col("_cum_local")).alias(cum_out),
            ((F.col("_off") + F.col("_cum_local")) <= lim).alias("selected"),
        )
    )


def domain_cap_sample(
    df: DataFrame,
    cap: int,
    caps: dict[str, int] | None = None,
    key_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = TOKEN_BUDGET_BUCKETS,
) -> DataFrame:
    """Per-domain document caps — the Dolma/FineWeb-style guard against
    any single source (domain, crawl host, dump) dominating the mix:
    within each `key_col` value, documents are taken in md5-id order
    until the domain has `caps.get(source, cap)` documents; the rest
    are rejected. The md5 order makes the sample reproducible and
    growth-stable, like every sampler here; a NULL source is its own
    capped group.

    Returns (id, source, cum_docs, selected) with `cum_docs` the
    1-based rank of the doc within its domain in md5-id order and
    `selected = cum_docs <= cap(source)`.

    Scale shape: identical to `token_budget_sample` (the shared
    hierarchical prefix sum — no domain-wide window; the hottest
    partition is |domain|/n_buckets even when one crawl host is most
    of the corpus).
    """
    if cap < 0 or (caps and any(v < 0 for v in caps.values())):
        raise ValueError("domain caps must be >= 0")
    return _hierarchical_capped_cumsum(
        df,
        qty=F.lit(1).cast("long"),
        key_col=key_col,
        id_col=id_col,
        cap=cap,
        caps=caps,
        n_buckets=n_buckets,
        qty_out="_one",
        cum_out="cum_docs",
    ).drop("_one")
