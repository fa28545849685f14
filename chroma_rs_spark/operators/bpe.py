"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016) and
application.

The scale insight that makes BPE trainable on a 100 TB corpus: the
algorithm only ever needs WORD FREQUENCIES, not the corpus. One
map-side-combinable groupBy collapses the token stream to a
vocabulary-sized (word, count) table, and every merge iteration runs
on that bounded table — weighted adjacent-pair counts (groupBy over
pairs-per-word x vocab rows), a 1-row argmax collect, and a map-side
merge rewrite. n_merges iterations = n_merges bounded passes over the
vocab table; the corpus itself is touched exactly once.

Symbol sequences are represented as WRAPPED STRINGS
(``\\x01a\\x02\\x01b\\x02…``) rather than arrays: applying a merge is
then one ``replace('\\x01a\\x02\\x01b\\x02' -> '\\x01ab\\x02')`` — and
because every symbol carries its own delimiters, consecutive matches
share no boundary characters, so the engine's left-to-right
non-overlapping replace IS the greedy BPE merge (``aaa`` merging
``(a,a)`` yields ``aa a``, never ``a aa``). Both Spark and DuckDB
replace with identical semantics, which is what makes the whole
training loop SQL-replayable as unrolled per-merge CTEs (the
knn_ivf_trained / quality_classifier oracle discipline) — a learned
tokenizer whose every merge decision is bit-checked across engines.

Determinism: the argmax tie-breaks on (count DESC, left ASC,
right ASC) — fully ordered, partition-independent. End-of-word is the
explicit ``</w>`` symbol (the original formulation), so learned merges
distinguish suffixes from prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# symbol wrappers: \x01 and \x02 never appear in whitespace-split
# tokens of any sane corpus; they make replace() boundary-safe (see
# module docstring). The end-of-word marker is a symbol like any other.
SYM_L = "\x01"
SYM_R = "\x02"
END_WORD = "</w>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt): the ONE corpus-wide pass — map-side combinable."""
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col

    return (
        df.select(F.explode(nonempty_tokens_col(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def _wrap_expr(word_col: str) -> str:
    """SQL expression: word -> wrapped char symbols + </w> marker."""
    return (
        f"concat(array_join(transform(sequence(1, length({word_col})),"
        f" i -> concat('{SYM_L}', substring({word_col}, i, 1), '{SYM_R}')),"
        f" ''), '{SYM_L}{END_WORD}{SYM_R}')"
    )


_PAIR_EXPR = (
    # wrapped string -> adjacent symbol pairs: strip outer wrappers,
    # split on the inner boundaries, zip with its own tail
    f"zip_with(slice(_syms_arr, 1, greatest(size(_syms_arr) - 1, 0)),"
    f" slice(_syms_arr, 2, greatest(size(_syms_arr) - 1, 0)),"
    f" (a, b) -> struct(a AS l, b AS r))"
)


def _syms_arr(col: str = "_s") -> F.Column:
    return F.expr(
        f"split(substring({col}, 2, length({col}) - 2), '{SYM_R}{SYM_L}')"
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 10,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus; returns
    [(left, right, pair_count), ...] in merge order. Stops early when
    the best remaining pair occurs fewer than `min_pair_count` times
    (weighted by word frequency).

    Per iteration: one groupBy over (pairs-per-word x vocab) rows, one
    1-row ordered collect, one map-side replace — all on the bounded
    word table (localCheckpoint'ed per merge, the curate lineage-cut
    discipline applied to a loop).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    vocab = _word_counts(df, text_col).select(
        F.col("_cnt"), F.expr(_wrap_expr("_w")).alias("_s")
    )
    # LAZY checkpoints throughout the loop (eager=False): each
    # iteration's 1-row argmax collect is the action that materializes
    # the latest vocab rewrite, so the lineage cut still lands every
    # iteration but costs ZERO extra jobs — the eager form paid one
    # materialization job per merge on top of the collect (2n+1 jobs
    # for n merges; lazy runs the identical work in n+1). The final
    # rewrite, which nothing consumes, is never materialized at all.
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            vocab.withColumn("_syms_arr", _syms_arr())
            .select(F.col("_cnt"), F.explode(F.expr(_PAIR_EXPR)).alias("_p"))
            .groupBy(F.col("_p.l").alias("_l"), F.col("_p.r").alias("_r"))
            .agg(F.sum("_cnt").alias("_c"))
            .orderBy(F.col("_c").desc(), F.col("_l"), F.col("_r"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["_c"]) < min_pair_count:
            break
        left, right, cnt = best[0]["_l"], best[0]["_r"], int(best[0]["_c"])
        merges.append((left, right, cnt))
        vocab = vocab.withColumn(
            "_s",
            F.replace(
                F.col("_s"),
                F.lit(f"{SYM_L}{left}{SYM_R}{SYM_L}{right}{SYM_R}"),
                F.lit(f"{SYM_L}{left}{right}{SYM_R}"),
            ),
        ).localCheckpoint(eager=False)
        # the superseded vocab checkpoint is unreferenced from here on;
        # Spark's ContextCleaner reclaims it
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Adds `out` (array<string> of BPE tokens, per word in document
    order, `</w>`-terminated subwords fused into their piece) and
    `{out}_n` (count) by applying the learned merges IN ORDER to every
    word — the same wrapped-string replaces as training, entirely
    map-side (zero shuffles, one codegen pass).

    NULL/empty documents keep their row with an empty array.
    """
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col
    from chroma_rs_spark.plans import fan_out

    word = _wrap_expr("w")
    for left, right, *_ in merges:
        esc_pair = (
            f"{SYM_L}{left}{SYM_R}{SYM_L}{right}{SYM_R}".replace("\\", "\\\\")
            .replace("'", "\\'")
        )
        esc_merged = f"{SYM_L}{left}{right}{SYM_R}".replace("\\", "\\\\").replace(
            "'", "\\'"
        )
        word = f"replace({word}, '{esc_pair}', '{esc_merged}')"
    # bind the per-word wrapped string via a 2-step transform (pure
    # HOFs, no correlated subquery), then strip wrappers and split
    # compute-bound codegen (len(merges) string replaces x every word's
    # wrapped form), not a byte-bound scan: a single-file corpus would
    # serialize the whole apply on one core under the default scan
    # gate — same 64 KB compute gate as the repetition kernels
    return (
        fan_out(df, min_bytes=64 << 10)
        .withColumn("_toks", nonempty_tokens_col(text_col))
        .withColumn(
            out,
            F.expr(
                f"flatten(transform(transform(coalesce(_toks, array()),"
                f" w -> {word}),"
                f" _ws -> split(substring(_ws, 2, length(_ws) - 2),"
                f" '{SYM_R}{SYM_L}')))"
            ),
        )
        .withColumn(f"{out}_n", F.size(F.col(out)).cast("long"))
        .drop("_toks")
    )
