"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.3 [EXT]).

Language ID (stopword-overlap heuristic), quality scoring, token
counting (whitespace + regex), and document fingerprinting (min-hash
over 5-gram shingles — a winnowing-style content fingerprint).

All pure JVM-side column expressions; every constant here is mirrored
verbatim in the suite's DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chroma_rs_spark.operators.dedup import shingles_col, tokens_col
from chroma_rs_spark.plans import maybe_broadcast

# Tiny per-language stopword lists (public common words). Order of
# LANGS is the deterministic tie-break for argmax.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "de": ["der", "die", "das", "und", "zu", "ein"],
    "es": ["el", "la", "de", "y", "que", "en"],
    "fr": ["le", "la", "de", "et", "un", "pour"],
    "zh": ["de", "le", "shi", "bu", "wo", "you"],
}
LANGS = list(STOPWORDS)

TOKEN_REGEX = "[a-zA-Z]+|[0-9]+"  # BPE-ish word/number pieces


def lang_scores(toks: Column) -> dict[str, Column]:
    uniq = F.array_distinct(toks)
    return {
        lang: F.size(
            F.array_intersect(uniq, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predict language by stopword overlap; deterministic tie-break
    by LANGS order. Returns (id, predicted_lang, lang_score)."""
    toks = tokens_col(text_col)
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    pred = F.when(scores[LANGS[0]] == best, F.lit(LANGS[0]))
    for lang in LANGS[1:]:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    pred = pred.otherwise(F.lit("unknown"))
    return df.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        best.cast("long").alias("lang_score"),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + regex token counts and char stats."""
    toks = tokens_col(text_col)
    n_ws = F.size(toks)
    return df.select(
        F.col(id_col),
        n_ws.cast("long").alias("n_tokens_ws"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)).cast("long").alias(
            "n_tokens_re"
        ),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            (F.length(text_col) - (n_ws - 1)).cast("double") / n_ws, 6
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: unique-token ratio, non-stopword
    ratio, and a length factor (saturating at 50 tokens)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    uniq_ratio = n_uniq.cast("double") / n
    stop_ratio = n_stop.cast("double") / n
    length_factor = F.least(n.cast("double") / 50.0, F.lit(1.0))
    score = F.round(
        0.5 * uniq_ratio + 0.3 * (1.0 - stop_ratio) + 0.2 * length_factor, 6
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_k: int = 5
) -> DataFrame:
    """Content fingerprint: lexicographic min of md5 over k-gram
    shingles (min-hash with one hash function — winnowing-style)."""
    from chroma_rs_spark.operators.dedup import exploded_shingles

    sh = exploded_shingles(df, id_col, text_col, shingle_k)
    return sh.groupBy(id_col).agg(
        F.min(F.md5(F.col("shingle"))).alias("fingerprint")
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-embedding step of an LLM ingestion pipeline.

    Chunk i covers tokens [i*stride, i*stride + chunk_size) with
    stride = chunk_size - overlap; the last chunk may be short, and a
    chunk fully contained in the previous one is never emitted.
    Entirely map-side (Generate over a sequence of starts — no
    shuffle); at 100 TB chunking is embarrassingly parallel and the
    output feeds straight into `embedding_udf` + `add_df`.

    Returns (id, chunk_idx, chunk_text, n_tokens).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # NULL text -> no chunks (otherwise greatest(NULL,1) fabricates one
    # junk start and a ('' , NULL) chunk row); mirrored in the oracle
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens_col(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - overlap, F.lit(1)) - 1,
        F.lit(stride),
    )
    # keep the token array as a Generate output attribute: split(text)
    # evaluates once per document and the array value is carried to
    # every chunk row, instead of re-tokenizing once per chunk
    ch = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_s"),
    )
    piece = F.slice(F.col("_toks"), F.col("_s") + 1, chunk_size)
    return ch.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term set.

    Shuffle-minimal by construction: term frequencies and document
    length are per-row HOFs over the token array (no explode), corpus
    statistics (N, avgdl, per-term document frequencies) are ONE
    global aggregation row broadcast back, and the score is a fixed
    expression tree summed in literal term order — so the double
    arithmetic is order-deterministic and engine-reproducible. At
    100 TB: one map pass + one scalar agg + one broadcast, no
    corpus-wide shuffle at any step.
    """
    if not terms:
        raise ValueError("bm25_scores: terms must be a non-empty list")
    # Everything below is built as parsed SQL expression STRINGS (the
    # measured plan-build technique from operators/dedup.py): the
    # composed-Column form of the per-term tf/df/score trees costs
    # hundreds of py4j round-trips per call. Double literals carry a D
    # suffix (bare 0.5 parses as DECIMAL in Spark SQL) and are
    # interpolated via repr() from the same Python floats the oracle
    # uses, so the parsed tree is operation-for-operation identical to
    # the old Column tree (and the arithmetic stays bit-reproducible).
    toks_sql = f"split({text_col}, ' ')"
    esc = [t.replace("\\", "\\\\").replace("'", "\\'") for t in terms]
    per_doc = df.select(
        F.col(id_col),
        F.expr(f"size({toks_sql})").alias("_dl"),
        *[
            F.expr(f"size(filter({toks_sql}, x -> x = '{t}'))").alias(f"_tf{i}")
            for i, t in enumerate(esc)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_N"),
        F.sum("_dl").alias("_sdl"),
        *[
            F.expr(f"sum(CAST(_tf{i} > 0 AS BIGINT))").alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = "(CAST(_sdl AS DOUBLE) / _N)"
    score_sql = " + ".join(
        f"(ln((_N - _df{i} + 0.5D) / (_df{i} + 0.5D) + 1.0D)"
        f" * (CAST(_tf{i} AS DOUBLE) * {k1 + 1.0!r}D"
        f" / (CAST(_tf{i} AS DOUBLE) + {k1!r}D * ({1.0 - b!r}D"
        f" + {b!r}D * _dl / {avgdl}))))"
        for i in range(len(terms))
    )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.expr(f"round({score_sql}, 6) + 0.0D").alias("bm25"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chop sequence packing: lay each group's documents
    end-to-end in a deterministic order and cut fixed token budgets —
    the standard pretraining batch-packing layout.

    Returns (doc_id, grp, n_tokens, start_offset, bin, offset_in_bin,
    fits): `bin` is the budget window the document STARTS in,
    `offset_in_bin` its position there, and `fits` whether it ends
    inside that window (false = it straddles the chop boundary).

    All-integer window arithmetic (one running-sum per group, ordered
    by id) — deterministic, engine-reproducible, and one shuffle keyed
    on the group column. At 100 TB the group is a date/source shard, so
    the running sum parallelizes across shards; a single giant group
    would need a range-partitioned two-pass rank (same pattern as the
    distributed percentile note in suite/relational.py).

    Engine-reproducibility hardening (the ROWS frame makes every
    output row depend on the exact sort order, so every cross-engine
    ordering degree of freedom must be pinned):
    * NULL text tokenizes as the empty string (0 tokens) instead of
      engine-specific NULL propagation;
    * sort order is (id, n_tokens) with explicit NULLS FIRST — Spark
      defaults ASC to NULLS FIRST while DuckDB defaults to NULLS LAST,
      and the n_tokens tie-break makes the cumsum insensitive to how
      engines order duplicate ids (two rows tying on both keys are
      interchangeable, so the output SET is identical either way).
    """
    from pyspark.sql.window import Window as W

    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.size(F.split(text, " "))
    )
    w = (
        W.partitionBy("grp")
        .orderBy(
            F.col(id_col).asc_nulls_first(),
            F.col("n_tokens").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, -1)
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        toks.cast("long").alias("n_tokens"),
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = base.withColumn("start_offset", start).select(
        id_col,
        "grp",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / budget).cast("long").alias("bin"),
        (F.col("start_offset") % budget).alias("offset_in_bin"),
        (
            (F.col("start_offset") % budget) + F.col("n_tokens") <= budget
        ).alias("fits"),
    )
    return out


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (public
    rules from the Gopher/MassiveText filtering literature): repeated
    content is the strongest single signal of boilerplate/spam in web
    corpora.

    Returns (doc_id, n_tokens, dup_token_frac, top_token_frac,
    dup_bigram_frac, top_bigram_char_frac):
    * dup_token_frac — fraction of token OCCURRENCES beyond each
      token's first (1 - |distinct|/|tokens|);
    * top_token_frac — fraction of occurrences held by the most
      frequent token (ties: lexicographically smallest);
    * dup_bigram_frac — same construction over 2-gram shingles;
    * top_bigram_char_frac — fraction of DOCUMENT CHARACTERS covered
      by occurrences of the most frequent 2-gram (len(bigram) x count
      / len(text) — the Gopher formulation).

    Physical shape: ONE vectorized Arrow pass (mapInPandas) — per-doc
    Counter tallies plus exact HALF_UP round-6 (decimal.Decimal on the
    exact binary double, the same java.math.BigDecimal HALF_UP
    Spark's round() applies, so results stay bit-matchable against
    the SQL oracle — pinned by tests). Measured 3x faster at sf0.1
    than the pure-DataFrame formulation (two explode+groupBy frequency
    tables, two row_number windows, three joins ≈ six exchanges, or a
    shuffle-free interpreted-HOF run-length fold): per-document string
    tallying is exactly the shape Arrow-batched Python does best, the
    same justification as the IVF local top-k and media-decode passes.
    At 100 TB the pass stays embarrassingly parallel — no shuffle at
    all, |docs| rows in, |docs| rows out.

    Drops NULL-text docs (no token rows — the inner-join semantics of
    the frequency-table formulation, mirrored by the SQL oracle).
    """
    import pandas as pd

    from chroma_rs_spark.plans import fan_out

    schema = (
        f"{id_col} long, n_tokens long, dup_token_frac double, "
        "top_token_frac double, dup_bigram_frac double, "
        "top_bigram_char_frac double"
    )

    def signals(batches):
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")

        def r6(v: float) -> float:
            # exact binary -> decimal HALF_UP at 6 dp ≡ Spark round(x, 6)
            return float(Decimal(v).quantize(six, ROUND_HALF_UP)) + 0.0

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                toks = text.split(" ")
                n = len(toks)
                ct = Counter(toks)
                top_tc = max(ct.values())
                bgs = [
                    toks[i] + " " + toks[i + 1] for i in range(n - 1)
                ]
                if bgs:
                    cb = Counter(bgs)
                    best_c, best_b = 0, ""
                    for b_, c in sorted(cb.items()):
                        if c > best_c:  # ties: lexicographically smallest
                            best_c, best_b = c, b_
                    dup_b = r6(1.0 - len(cb) / len(bgs))
                    top_b = r6(len(best_b) * best_c / len(text))
                else:
                    dup_b, top_b = 0.0, 0.0
                rows.append(
                    (
                        doc_id,
                        n,
                        r6(1.0 - len(ct) / n),
                        r6(top_tc / n),
                        dup_b,
                        top_b,
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col,
                        "n_tokens",
                        "dup_token_frac",
                        "top_token_frac",
                        "dup_bigram_frac",
                        "top_bigram_char_frac",
                    ],
                )

    # compute-bound Python kernel (per-doc Counter passes), not a
    # byte-bound scan: a sub-MB corpus file serializes the whole kernel
    # on one core under the default 16 MB scan gate (measured: 1.25 s
    # single-core at sf0.1). The gate here is 64 KB, deliberately BELOW
    # the 256 KB spread_compute threshold: the optimizer's estimate is
    # compressed-file bytes scaled by projection (254 KB for the 5000-
    # doc sf0.1 corpus — 3% under that threshold), while the kernel's
    # cost tracks DECOMPRESSED text x 9 n-gram passes; 64 KB still
    # leaves pytest-sized fixtures unshuffled.
    return fan_out(
        df.select(id_col, text_col), min_bytes=64 << 10
    ).mapInPandas(signals, schema=schema)


# portable regexes: character classes + bounded quantifiers only, so
# Java regex (Spark) and RE2 (DuckDB) agree on every match
PII_EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_LONG_DIGITS_REGEX = "[0-9]{6,}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails and long digit runs (phone/account/ID numbers) —
    the baseline PII pass every training-data pipeline runs before
    anything ships. Returns (doc_id, n_emails, n_long_digits,
    scrubbed_md5, changed): counts of redactions, an md5 fingerprint
    of the scrubbed text (hash-comparable without shipping the text
    back), and whether anything changed.

    Pure map-side regexp column expressions — no shuffle, no Python.
    The patterns avoid lookaround/backreferences so Java regex and
    DuckDB's RE2 produce identical matches.
    """
    email_scrubbed = F.regexp_replace(F.col(text_col), PII_EMAIL_REGEX, "<EMAIL>")
    scrubbed = F.regexp_replace(email_scrubbed, PII_LONG_DIGITS_REGEX, "<NUM>")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_REGEX), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        # count digit runs on the email-scrubbed INTERMEDIATE, so every
        # counted run corresponds to a <NUM> token in the output (a run
        # inside an email is already consumed by <EMAIL> and must not
        # be double-counted)
        F.size(
            F.regexp_extract_all(
                email_scrubbed, F.lit(PII_LONG_DIGITS_REGEX), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_long_digits"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        (scrubbed != F.col(text_col)).alias("changed"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF (the sklearn
    formulation, public: idf = ln((1 + N) / (1 + df)) + 1) — the
    classic salient-term extractor for corpus exploration and keyword
    labeling. Returns (doc_id, rank, term, tfidf) with round-6 scores
    and (score desc, term asc) determinism.

    Shape: one explode -> per-(doc, term) counts; df per term is a
    map-side-combinable groupBy(term) count over the tf table,
    broadcast back to the scoring rows. A count window OVER term is
    measurably ~0.1 s faster at sf0.1 (one shuffle carries rows and
    counts) but a window has NO partial aggregation: every (doc, term)
    row for a term must co-reside in one partition, so on a
    Zipf-distributed vocabulary a stop-word's partition holds
    |docs-containing-"the"| rows — a single-reducer scale-killer at
    100 TB. The groupBy shuffles per-partition PARTIAL counts (tiny,
    uniform) and the resulting vocabulary table (|V| rows, ≪ corpus)
    broadcasts, so no full-row shuffle keys on term at all; were the
    vocabulary ever to exceed broadcast size the same plan degrades
    gracefully to a shuffled equi-join AQE can skew-split. ln is
    cross-engine-stable only to 1 ulp (tests/test_rounding_boundaries
    .py), so scores are rounded to 6 dp before ranking, like every
    score in the engine.
    """
    from pyspark.sql.window import Window as W

    tok = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    # `+ 0 * max(_tf)` is a no-op on the value (tf >= 1, never NULL)
    # that keeps _tf referenced so column pruning cannot rewrite this
    # branch's (doc, term) pre-aggregate into a bare distinct — with
    # the pre-aggregate intact the subtree canonicalizes identically
    # to the tf branch and the (doc, term) shuffle is computed once
    # and reused, not re-executed (measured ~35% off the join at
    # sf0.1; at scale it halves the heavy stage).
    dfreq = tf.groupBy("term").agg(
        (F.count(F.lit(1)) + F.lit(0) * F.max("_tf")).alias("_df")
    )
    # corpus size as a broadcast 1-row aggregate, not a driver action —
    # the plan stays lazy and the scalar rides into the idf expression.
    # count(1), not countDistinct: id_col is the corpus primary key
    # (duplicate ids are rejected at add-time, collection.py A1), and
    # count(1) is a single-stage map-side-combinable agg where
    # countDistinct expands to two aggregation stages.
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    idf = F.log(
        (F.lit(1.0) + F.col("_n").cast("double"))
        / (F.lit(1.0) + F.col("_df").cast("double"))
    ) + F.lit(1.0)
    scored = (
        # size-gated hint (ADVICE r6): an explicit broadcast is honored
        # unconditionally, so a web-scale vocabulary would OOM instead
        # of degrading — hint only under the estimate gate, shuffled
        # equi-join (with AQE runtime auto-broadcast) otherwise
        tf.join(maybe_broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            (F.round(F.col("_tf").cast("double") * idf, 6) + F.lit(0.0)).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long").alias("rank"), "term", "tfidf")
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, n_distinct_chars, entropy_bits): Shannon entropy
    of each document's character distribution — the classic cheap
    junk detector (near-zero bits = one repeated character, ~4-4.5
    bits = natural language, >5 with a wide charset = random/binary
    spill). Complements quality_score's token-level ratios with a
    sub-token signal.

    Shape: per-row — the per-doc char histogram is computed entirely
    within the row as a run-length fold over the document's SORTED
    CODEPOINTS (equal codepoints are adjacent after the sort, so one
    in-order `aggregate` pass emits the (codepoint, count) list
    already sorted; UTF-8 binary string order equals codepoint order,
    so this is the same ordering the former struct sort produced and
    the fold stays bit-equal — int sort/equality just skips per-char
    UTF8String allocation, measured ~17% off the fold). The former
    explode-per-position form shuffled one row per CHARACTER of the
    corpus to a groupBy(doc, char) — correct and unskewed, but
    |corpus chars| shuffle rows where none are needed. The only data
    movement left is an UNCONDITIONAL fan-out of the input docs
    (min_bytes=0): the fold does ~1000x more CPU per scan byte than a
    scan-bound query (measured ~2 s of fold per 255 KB of compressed
    text), so the repartition's cost — proportional to those scan
    bytes — is always negligible against the parallelism it buys
    (measured 1.97 s -> 0.32 s at sf0.1); once the scan already has
    >= cores partitions, fan_out is a no-op. The per-doc sum of p*log2(p) terms runs over
    the CODEPOINT-SORTED count list via an in-order `aggregate` fold,
    so the float accumulation order is engine-independent (the bm25
    discipline); log2 is 1-ulp stable cross-engine, hence round-6
    like every score in the engine.

    NULL/empty documents have no character distribution: they keep
    their row (the signal table stays 1:1 with the corpus) with
    n_chars=0, n_distinct_chars=0 and entropy_bits NULL — the engine's
    unscorable convention (same as cosine on a zero-norm vector), not
    a fabricated one-character distribution.
    """
    from chroma_rs_spark.plans.partitioning import fan_out

    # run-length encode the sorted codepoint array in one fold:
    # accumulator carries (emitted runs, current codepoint, current run
    # length); the finish lambda flushes the last run. Runs come out
    # codepoint-sorted — the same ordering
    # array_sort(collect_list(struct(_c, _n))) gave the former shuffled
    # form (UTF-8 binary == codepoint order), so the entropy fold below
    # is bit-equal.
    rle = (
        "aggregate(array_sort(transform(split(`%s`, ''), c -> ascii(c))),"
        " named_struct("
        "  'cs', CAST(array() AS ARRAY<STRUCT<_cp: INT, _n: BIGINT>>),"
        "  'p', CAST(NULL AS INT), 'r', CAST(0 AS BIGINT)),"
        " (acc, x) -> IF(acc.p IS NOT NULL AND x = acc.p,"
        "  named_struct('cs', acc.cs, 'p', acc.p, 'r', acc.r + 1),"
        "  named_struct("
        "   'cs', IF(acc.p IS NULL, acc.cs,"
        "    array_append(acc.cs, named_struct('_cp', acc.p, '_n', acc.r))),"
        "   'p', x, 'r', CAST(1 AS BIGINT))),"
        " acc -> IF(acc.p IS NULL, acc.cs,"
        "  array_append(acc.cs, named_struct('_cp', acc.p, '_n', acc.r)))"
        ")" % text_col
    )
    # empty/NULL docs get a NULL histogram inline (split('', '')
    # yields [''], a fabricated 1-char run) — no filter + re-attach
    # join needed now that nothing aggregates
    per_doc = fan_out(df.select(id_col, text_col), min_bytes=0).selectExpr(
        f"`{id_col}`",
        f"CASE WHEN length(`{text_col}`) > 0 THEN {rle} END AS _cs",
    )
    # `_cs IS NULL` is tested directly (not via size()'s NULL
    # propagation, which returns -1 under spark.sql.ansi.enabled=false)
    # so the unscorable convention is config-independent
    return per_doc.selectExpr(
        f"`{id_col}`",
        "CASE WHEN _cs IS NULL THEN CAST(0 AS BIGINT)"
        " ELSE aggregate(_cs, CAST(0 AS BIGINT), (acc, x) -> acc + x._n)"
        " END AS n_chars",
        "CASE WHEN _cs IS NULL THEN 0 ELSE size(_cs) END"
        " AS n_distinct_chars",
        "round(-aggregate(_cs, 0.0D, (acc, x) ->"
        " acc + (CAST(x._n AS DOUBLE) /"
        " aggregate(_cs, CAST(0 AS BIGINT), (a2, y) -> a2 + y._n))"
        " * log2(CAST(x._n AS DOUBLE) /"
        " aggregate(_cs, CAST(0 AS BIGINT), (a2, y) -> a2 + y._n))), 6)"
        " + 0.0D AS entropy_bits",
    )


def _span_occurrences(
    df: DataFrame,
    span_tokens: int,
    stride: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, span_pos, span_hash): the L-token span occurrences both
    duplicate-span operators count over — ONE definition so the
    detailed and summary views can never disagree about what a span is.

    Span start positions are CONTENT-DEFINED anchors, not fixed
    strides: position i anchors iff hash(token[i]) % stride == 0 (the
    winnowing/CDC trick — Schleimer et al., SIGMOD 2003; rsync). A
    fixed `i % stride == 0` grid only matches duplicated regions whose
    copies start at offsets congruent mod stride — ~(stride-1)/stride
    of misaligned duplicates are invisible to it. Content anchors are
    alignment-INVARIANT: a duplicated region carries its anchor
    positions with it, so both copies hash the same spans wherever
    they sit. Expected anchor density 1/stride; a duplicated region of
    L+k tokens is detected unless its first k+1 tokens contain no
    anchor (probability (1-1/stride)^(k+1) under hash uniformity).
    stride=1 anchors every position (exact mode).
    """
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col
    from chroma_rs_spark.plans.partitioning import fan_out

    # unconditional fan-out: winnowing anchors + per-span md5 hashing
    # are CPU-dense per scan byte (the char_entropy rationale); a
    # small single-file corpus must still use every core, and once the
    # scan has >= cores partitions this is a no-op
    base = fan_out(df.select(id_col, text_col), min_bytes=0).select(
        F.col(id_col), nonempty_tokens_col(text_col).alias("_t")
    ).filter(F.size("_t") >= span_tokens)
    anchor = (
        f"conv(substring(md5(element_at(_t, i + 1)), 1, 8), 16, 10)"
        f" % {stride} = 0"
    )
    return base.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(filter(sequence(0, size(_t) - {span_tokens}),"
                f" i -> {anchor}),"
                f" i -> struct(CAST(i AS BIGINT) AS span_pos,"
                f" md5(array_join(slice(_t, i + 1, {span_tokens}), ' '))"
                " AS span_hash))"
            )
        ).alias("_s"),
    ).select(id_col, F.col("_s.span_pos"), F.col("_s.span_hash"))


def duplicate_spans(
    df: DataFrame,
    span_tokens: int = 20,
    stride: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_pos, span_hash, n_docs): occurrences of exact
    L-token spans that appear in >= `min_docs` DISTINCT documents —
    the exact-substring-dedup primitive of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL 2022), which
    minhash/simhash (document-level) and n-gram Jaccard (set-level)
    cannot express: those score whole documents, this localizes the
    duplicated REGIONS so a pipeline can cut spans instead of dropping
    documents.

    Spark shape instead of the paper's suffix array: content-anchored
    L-token spans hashed in one map pass (`_span_occurrences` —
    anchor sampling is alignment-invariant, unlike a fixed stride
    grid), then exact distinct-document counts per span via distinct
    (hash, doc) pairs + a map-side-combinable groupBy (skew-safe even
    for a boilerplate span present in millions of documents — see
    _span_doc_counts), joined back to the occurrences.

    Tokens are the engine-wide convention: non-empty split tokens.
    Documents shorter than `span_tokens` produce no rows.
    """
    occ = _span_occurrences(df, span_tokens, stride, id_col, text_col)
    counts = _span_doc_counts(occ, id_col)
    return occ.join(counts, "span_hash").filter(
        F.col("n_docs") >= min_docs
    ).select(id_col, "span_pos", "span_hash", "n_docs")


def _span_doc_counts(occ: DataFrame, id_col: str) -> DataFrame:
    """(span_hash, n_docs): exact distinct-document count per span.

    Shaped as `plans.skew.count_distinct_twophase` — distinct
    (hash, doc) pairs -> groupBy(hash) count — rather than a
    dense_rank window: both are exact, but a window over the
    span_hash partition cannot split a skewed key (a boilerplate span
    present in 1M documents becomes one reducer's sort), while the
    distinct shuffles on the PAIR key (uniform) and the count is a
    map-side-combinable aggregate; the join back to occurrences is a
    plain equi-join AQE's skew-join splitting can handle. Using the
    shared helper wires the skew module into the declared span rows
    (duplicate_span_stats / remove_duplicate_spans)."""
    from chroma_rs_spark.plans.skew import count_distinct_twophase

    return count_distinct_twophase(occ, "span_hash", id_col, out="_n_docs").select(
        "span_hash", F.col("_n_docs").cast("long").alias("n_docs")
    )


def duplicate_span_stats(
    df: DataFrame,
    span_tokens: int = 20,
    stride: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_ratio): per-document summary
    of `duplicate_spans` — the curation signal (what fraction of this
    document is exact-duplicated text elsewhere in the corpus).
    Documents with no spans (shorter than `span_tokens` tokens, NULL
    text, or no content anchors) keep their row with zero counts and
    NULL ratio — the engine's unscorable convention."""
    occ = _span_occurrences(df, span_tokens, stride, id_col, text_col)
    counts = _span_doc_counts(occ, id_col)
    per_doc = (
        occ.join(counts, "span_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup_spans"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("long")
            .alias("n_dup_spans"),
            F.when(
                F.col("n_spans") > 0,
                F.round(
                    F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6
                )
                + F.lit(0.0),
            ).alias("dup_ratio"),
        )
    )


def lm_perplexity(
    df: DataFrame,
    k_smooth: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, avg_logp, perplexity): per-document unigram
    language-model perplexity under a corpus-trained add-k-smoothed LM
    — the CCNet-style quality filter (Wenzek et al., "CCNet: Extracting
    High Quality Monolingual Datasets", LREC 2020 — there a wiki-trained
    KenLM; here the corpus's own unigram model, which already separates
    natural-frequency text from gibberish and boilerplate):
    p(tok) = (count(tok) + k) / (N + k*V), avg_logp = mean ln p over
    the document's tokens, perplexity = exp(-avg_logp).

    Shapes: token counts are a map-side-combinable groupBy over the
    token stream, broadcast back to the occurrence rows — NOT a count
    window over a token-keyed shuffle: a window has no partial
    aggregation, and on the Zipf token distribution this operator
    exists to filter (100 TB pretraining corpora) the most frequent
    token is ~5% of the entire token stream landing in ONE partition.
    The groupBy shuffles per-partition partial counts (uniform, tiny)
    and the vocabulary (V rows ≪ corpus) broadcasts, so occurrence
    rows never shuffle on the token key; corpus totals (N, V) are a
    broadcast 1-row aggregate; the per-doc score folds
    ln-probabilities in POSITION order (array_sort + left fold — the
    bm25/centroid float-order discipline), so scores are
    engine-reproducible bit-for-bit, rounded to 6 like every score.

    NULL/empty documents keep their row with n_tokens=0 and NULL
    scores — the unscorable convention.
    """
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col
    from chroma_rs_spark.plans.partitioning import fan_out

    # unconditional fan-out of the doc scan before the tokenize +
    # posexplode (CPU-dense per scan byte; no-op once the scan has
    # >= cores partitions). The tokenize runs once per consumer
    # (vocabulary build + scoring join) by design: recomputing a
    # map-side split is cheaper at 100 TB than caching a corpus-sized
    # token stream, and the r8 sub-plan profile measured the local
    # cost of the duplicate at ~0.3 s of a 1.2 s row — exchange
    # dispatch floor, not compute, dominates here.
    tok = fan_out(df.select(id_col, text_col), min_bytes=0).select(
        F.col(id_col),
        F.posexplode(nonempty_tokens_col(text_col)).alias("_pos", "_tok"),
    )
    logp = F.log(
        (F.col("_cnt").cast("double") + F.lit(float(k_smooth)))
        / (
            F.col("_N").cast("double")
            + F.lit(float(k_smooth)) * F.col("_V").cast("double")
        )
    )
    vocab = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    # corpus totals derived FROM the vocabulary table (N = sum of
    # counts, V = rows — the same integers), not a second aggregate
    # over the token stream
    totals = vocab.agg(
        F.sum("_cnt").alias("_N"),
        F.count(F.lit(1)).alias("_V"),
    )
    scored = (
        # size-gated hint — same rationale as tfidf_topk's dfreq join
        tok.join(maybe_broadcast(vocab), "_tok")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), logp.alias("_lp")))
            ).alias("_l"),
        )
        .selectExpr(
            f"`{id_col}`",
            "n_tokens",
            "round(aggregate(_l, 0.0D, (a, x) -> a + x._lp)"
            " / n_tokens, 6) + 0.0D AS avg_logp",
        )
        .withColumn(
            "perplexity", F.round(F.exp(-F.col("avg_logp")), 6) + F.lit(0.0)
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            "avg_logp",
            "perplexity",
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    span_tokens: int = 20,
    stride: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_tokens_removed, clean_text): the CUT
    operation of substring-level dedup — every duplicated span is
    removed from every document EXCEPT its globally-first occurrence
    (min (doc_id, span_pos)), which Lee et al. (ACL 2022) measure as
    strictly better than dropping whole near-dup documents.

    Built on `_span_occurrences`' content-anchored spans; the keeper
    per span is a map-side-combinable min of the (doc, pos) struct. A
    token is cut iff some removal interval of its document covers it
    AND no KEEPER interval does: keeper occurrences are inviolate, so
    an overlapping removal from a DIFFERENT duplicated span can never
    erode the one copy of a span the operation promises to preserve
    (every duplicated span's full content survives at its keeper).
    Both probes are exists() over the doc's bounded start lists — no
    interval merging needed. Cleaned text reassembles as the
    space-join of surviving tokens (the engine's tokenized-text
    convention); NULL-text docs keep NULL, empty docs keep ''.
    """
    occ = _span_occurrences(df, span_tokens, stride, id_col, text_col)
    counts = _span_doc_counts(occ, id_col)
    dup = occ.join(counts, "span_hash").filter(F.col("n_docs") >= min_docs)
    keeper = dup.groupBy("span_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("span_pos"))).alias("_k")
    )
    tagged = dup.join(keeper, "span_hash").withColumn(
        "_is_keeper",
        (F.col(id_col) == F.col(f"_k.{id_col}"))
        & (F.col("span_pos") == F.col("_k.span_pos")),
    )
    starts = tagged.groupBy(id_col).agg(
        F.collect_set(
            F.when(~F.col("_is_keeper"), F.col("span_pos"))
        ).alias("_starts"),
        F.collect_set(
            F.when(F.col("_is_keeper"), F.col("span_pos"))
        ).alias("_keeps"),
    )
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col
    from chroma_rs_spark.plans.partitioning import fan_out

    # same unconditional fan-out rationale as _span_occurrences: the
    # exists()-probe filter over every token is CPU-dense per scan byte
    base = fan_out(df.select(id_col, text_col), min_bytes=0).select(
        F.col(id_col), nonempty_tokens_col(text_col).alias("_t")
    )
    return (
        base.join(starts, id_col, "left")
        .selectExpr(
            f"`{id_col}`",
            # NULL-text docs are detected on `_t IS NULL` directly, not
            # via size()'s NULL propagation: size(NULL) is NULL only
            # under ANSI mode and -1 with spark.sql.ansi.enabled=false,
            # which would silently emit n_tokens=-1 instead of NULL
            "CASE WHEN _t IS NULL THEN NULL ELSE size(_t) END AS _n",
            "filter(transform(_t, (x, i) -> struct(i AS p, x AS tk)),"
            f" y -> _starts IS NULL"
            f" OR NOT exists(_starts, s -> y.p >= s AND y.p < s + {span_tokens})"
            f" OR exists(_keeps, s -> y.p >= s AND y.p < s + {span_tokens})"
            ") AS _kept",
        )
        .selectExpr(
            f"`{id_col}`",
            "CAST(_n AS BIGINT) AS n_tokens",
            "CAST(_n - size(_kept) AS BIGINT) AS n_tokens_removed",
            "CASE WHEN _n IS NULL THEN NULL"
            " ELSE array_join(transform(_kept, y -> y.tk), ' ') END"
            " AS clean_text",
        )
    )


# Gopher quality-rule thresholds (Rae et al., "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", 2021, §A1.1 —
# public). Every constant is mirrored verbatim in the suite oracle.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
# the paper's "must contain >= 2 of" list
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
    stopword_hits, passes): the Gopher repetition-free quality rules
    (Rae et al. 2021 §A1.1) — the standard cheap pre-filter a
    pretraining pipeline runs before the expensive dedup/perplexity
    stages. A document passes iff its word count, mean word length,
    symbol-to-word ratio ('#' and '...'), alphabetic-word fraction and
    stop-word presence all sit inside the published thresholds.

    Entirely per-row (map-side, zero shuffle): counts and the mean
    word length come from size()/aggregate folds over the shared
    non-empty tokenization; ratios are rounded to 6 like every score.
    NULL/empty docs keep their row with zeros and passes=false (a
    document with no words fails the word-count rule by definition —
    NOT the unscorable convention, because the rule set itself
    assigns empty documents a verdict).
    """
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col

    toks = nonempty_tokens_col(text_col)
    base = df.select(
        F.col(id_col),
        F.coalesce(toks, F.array()).alias("_t"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
    ).select(
        id_col,
        "_t",
        F.size("_t").cast("long").alias("n_words"),
        # '#' occurrences + '...' occurrences (non-overlapping, the
        # regexp_extract_all convention both engines share)
        (
            F.size(F.regexp_extract_all(F.col("_txt"), F.lit("#"), F.lit(0)))
            + F.size(
                F.regexp_extract_all(F.col("_txt"), F.lit("\\.\\.\\."), F.lit(0))
            )
        )
        .cast("long")
        .alias("_n_symbols"),
    )
    scored = base.selectExpr(
        f"`{id_col}`",
        "n_words",
        "CASE WHEN n_words > 0 THEN round(aggregate(_t, CAST(0 AS BIGINT),"
        " (a, x) -> a + length(x)) / CAST(n_words AS DOUBLE), 6) + 0.0D"
        " END AS mean_word_len",
        "CASE WHEN n_words > 0 THEN"
        " round(CAST(_n_symbols AS DOUBLE) / n_words, 6) + 0.0D"
        " END AS symbol_ratio",
        "CASE WHEN n_words > 0 THEN round(size(filter(_t,"
        " x -> x rlike '[a-zA-Z]')) / CAST(n_words AS DOUBLE), 6) + 0.0D"
        " END AS alpha_word_frac",
        "CAST(size(array_intersect(array_distinct(_t), array({})))"
        " AS BIGINT) AS stopword_hits".format(
            ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
        ),
    )
    passes = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
    )
    return scored.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_frac",
        "stopword_hits",
        F.coalesce(passes, F.lit(False)).alias("passes"),
    )


# Gopher repetition-filter thresholds (Rae et al. 2021, Table A1) — a
# document is removed when ANY fraction exceeds its cap.
GOPHER_REP_MAX_DUP_LINE_FRAC = 0.30
GOPHER_REP_MAX_DUP_PARA_FRAC = 0.30
GOPHER_REP_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_REP_MAX_DUP_PARA_CHAR_FRAC = 0.20
GOPHER_REP_MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_REP_MAX_DUP_NGRAM_CHAR_FRAC = {
    5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
}


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The OTHER half of the Gopher filter: the repetition rules of
    Rae et al. 2021 Table A1 (`gopher_quality` implements the quality
    half). Thirteen fractions, a document fails when any exceeds its
    published cap:

    * dup_line_frac / dup_para_frac — fraction of line / paragraph
      occurrences beyond each unit's first (units are trimmed,
      non-empty; lines split on \\n, paragraphs on \\n\\n);
    * dup_line_char_frac / dup_para_char_frac — characters in those
      beyond-first occurrences over characters in all occurrences;
    * top_{2,3,4}gram_char_frac — len(gram)·count of the most frequent
      n-gram (ties: lexicographically smallest) over len(text), the
      `repetition_signals` top-bigram construction generalized;
    * dup_{5..10}gram_char_frac — characters of token positions
      covered by ANY occurrence of a within-doc duplicated n-gram,
      each character counted once (the paper's "taking care not to
      count characters more than once"), over len(text).

    Tokens are the non-empty single-space split (the corpus-wide
    convention); grams join with ' '. NULL text keeps its row with
    n_tokens=0, NULL fractions and passes=false (unscorable fails
    closed — the gopher_quality/c4 precedent); EMPTY text measures 0.0
    everywhere and passes (no repetition to measure — the word-count
    rule that fails empties lives in gopher_quality).

    Physical shape: ONE vectorized Arrow pass (mapInPandas over
    fan_out), per-doc Counter tallies + a coverage bitmap — zero
    shuffle, |docs| in / |docs| out, the same measured-faster
    rationale as `repetition_signals`. Rounding is the exact-binary
    decimal HALF_UP at 6 dp that matches both engines.
    """
    import pandas as pd

    from chroma_rs_spark.plans import fan_out

    frac_cols = (
        ["dup_line_frac", "dup_line_char_frac", "dup_para_frac",
         "dup_para_char_frac"]
        + [f"top_{n}gram_char_frac" for n in (2, 3, 4)]
        + [f"dup_{n}gram_char_frac" for n in range(5, 11)]
    )
    schema = (
        f"{id_col} long, n_tokens long, "
        + ", ".join(f"{c} double" for c in frac_cols)
        + ", passes boolean"
    )
    top_caps = dict(GOPHER_REP_MAX_TOP_NGRAM_CHAR_FRAC)
    dup_caps = dict(GOPHER_REP_MAX_DUP_NGRAM_CHAR_FRAC)
    unit_caps = (
        GOPHER_REP_MAX_DUP_LINE_FRAC,
        GOPHER_REP_MAX_DUP_LINE_CHAR_FRAC,
        GOPHER_REP_MAX_DUP_PARA_FRAC,
        GOPHER_REP_MAX_DUP_PARA_CHAR_FRAC,
    )

    def signals(batches):
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")

        def r6(v: float) -> float:
            return float(Decimal(v).quantize(six, ROUND_HALF_UP)) + 0.0

        def dup_unit_fracs(units: list[str]) -> tuple[float, float]:
            total = len(units)
            if total == 0:
                return 0.0, 0.0
            ct = Counter(units)
            dup_units = total - len(ct)
            dup_chars = sum((c - 1) * len(u) for u, c in ct.items())
            tot_chars = sum(c * len(u) for u, c in ct.items())
            return r6(dup_units / total), r6(dup_chars / tot_chars)

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    rows.append(
                        (doc_id, 0) + (None,) * len(frac_cols) + (False,)
                    )
                    continue
                toks = [t for t in text.split(" ") if t]
                n = len(toks)
                lines = [x for x in
                         (s.strip() for s in text.split("\n")) if x]
                paras = [x for x in
                         (s.strip() for s in text.split("\n\n")) if x]
                dl, dlc = dup_unit_fracs(lines)
                dp, dpc = dup_unit_fracs(paras)
                fracs = [dl, dlc, dp, dpc]
                ok = (
                    dl <= unit_caps[0] and dlc <= unit_caps[1]
                    and dp <= unit_caps[2] and dpc <= unit_caps[3]
                )
                grams_at = {
                    nn: [" ".join(toks[i:i + nn]) for i in range(n - nn + 1)]
                    for nn in (2, 3, 4, 5, 6, 7, 8, 9, 10)
                }
                for nn in (2, 3, 4):
                    grams = grams_at[nn]
                    if grams:
                        cb = Counter(grams)
                        best_c, best_g = 0, ""
                        for g_, c in sorted(cb.items()):
                            if c > best_c:  # ties: smallest gram
                                best_c, best_g = c, g_
                        f = r6(len(best_g) * best_c / len(text))
                    else:
                        f = 0.0
                    fracs.append(f)
                    ok = ok and f <= top_caps[nn]
                for nn in range(5, 11):
                    grams = grams_at[nn]
                    if grams:
                        cg = Counter(grams)
                        covered = bytearray(n)
                        for i, g_ in enumerate(grams):
                            if cg[g_] >= 2:
                                covered[i:i + nn] = b"\x01" * nn
                        cov = sum(
                            len(t) for t, c in zip(toks, covered) if c
                        )
                        f = r6(cov / len(text))
                    else:
                        f = 0.0
                    fracs.append(f)
                    ok = ok and f <= dup_caps[nn]
                rows.append((doc_id, n, *fracs, ok))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[id_col, "n_tokens", *frac_cols, "passes"],
                )

    # compute-bound Python kernel (per-doc Counter passes), not a
    # byte-bound scan: a sub-MB corpus file serializes the whole kernel
    # on one core under the default 16 MB scan gate (measured: 1.25 s
    # single-core at sf0.1). The gate here is 64 KB, deliberately BELOW
    # the 256 KB spread_compute threshold: the optimizer's estimate is
    # compressed-file bytes scaled by projection (254 KB for the 5000-
    # doc sf0.1 corpus — 3% under that threshold), while the kernel's
    # cost tracks DECOMPRESSED text x 9 n-gram passes; 64 KB still
    # leaves pytest-sized fixtures unshuffled.
    return fan_out(
        df.select(id_col, text_col), min_bytes=64 << 10
    ).mapInPandas(signals, schema=schema)


# C4 cleaning thresholds (Raffel et al. JMLR 2020 §2.2) — line word
# minimum, page sentence minimum, and the terminal punctuation set.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINALS = (".", "!", "?", '"')


def c4_filters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The C4 line/page cleaning heuristics (Raffel et al., JMLR 2020
    §2.2 — the cleaning pass that produced C4 from Common Crawl):
    keep a line iff it (a) ends in a terminal punctuation mark,
    (b) has >= 5 words, (c) does not contain the word "javascript"
    (case-insensitive); drop the whole page iff the kept text has
    fewer than 3 sentences, contains "lorem ipsum", or contains "{".

    Returns (id, n_lines, n_lines_kept, n_sentences, has_lorem_ipsum,
    has_brace, passes, text_clean). `n_sentences` counts terminal
    marks in the KEPT lines (the line filter guarantees each kept
    line contributes at least one). NULL text keeps its row with NULL
    stats and passes=false (a page with no text has no 3 sentences —
    the rule set itself assigns the verdict, like gopher_quality).

    Entirely per-row (map-side, zero shuffle): every rule is a
    filter/aggregate fold over split(text, '\\n') inside the scan —
    at 100 TB this runs at parquet-read speed with no exchange.
    """
    nl = "\n"
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.split(F.col(text_col), nl).alias("_lines"),
    )
    term = ", ".join("'" + t.replace("'", "''") + "'" for t in C4_TERMINALS)
    # word count via split-on-space-runs of the trimmed line: equal to
    # the filter-empties count on every non-empty trimmed line, and 1
    # vs 0 on an all-space line — indistinguishable under the >= 5
    # threshold — without a second interpreted lambda nested per line
    kept = F.expr(
        "filter(_lines, x -> substring(trim(x), -1, 1) IN ({term})"
        " AND size(split(trim(x), ' +'))"
        " >= {mw} AND NOT lower(x) LIKE '%javascript%')".format(
            term=term, mw=C4_MIN_LINE_WORDS
        )
    )
    # `_kept` lands as its own projection on purpose: referencing the
    # filter() expression from both size() and array_join() re-ran the
    # whole interpreted per-line lambda twice per row (measured 1.45x
    # the single-evaluation wall); an alias used twice is kept, not
    # inlined, by CollapseProject
    scored = base.withColumn("_kept", kept).select(
        id_col,
        "_txt",
        F.when(F.col("_txt").isNotNull(), F.size("_lines"))
        .cast("long")
        .alias("n_lines"),
        F.when(F.col("_txt").isNotNull(), F.size("_kept"))
        .cast("long")
        .alias("n_lines_kept"),
        F.when(
            F.col("_txt").isNotNull(), F.array_join("_kept", nl)
        ).alias("text_clean"),
    )
    n_sent = F.when(
        F.col("_txt").isNotNull(),
        F.size(
            F.regexp_extract_all(
                F.col("text_clean"), F.lit("[.!?\"]"), F.lit(0)
            )
        ),
    ).cast("long")
    has_lorem = F.lower(F.col("_txt")).contains("lorem ipsum")
    has_brace = F.col("_txt").contains("{")
    out = scored.select(
        id_col,
        "n_lines",
        "n_lines_kept",
        n_sent.alias("n_sentences"),
        F.coalesce(has_lorem, F.lit(False)).alias("has_lorem_ipsum"),
        F.coalesce(has_brace, F.lit(False)).alias("has_brace"),
        (
            F.coalesce(n_sent >= C4_MIN_SENTENCES, F.lit(False))
            & ~F.coalesce(has_lorem, F.lit(False))
            & ~F.coalesce(has_brace, F.lit(False))
        ).alias("passes"),
        "text_clean",
    )
    return out


def canonicalize_url(
    url,
    tracking_params: tuple[str, ...] = (
        "utm_source", "utm_medium", "utm_campaign", "utm_term",
        "utm_content", "gclid", "fbclid", "ref",
    ),
) -> Column:
    """Canonical form of a URL for URL-level dedup — the FIRST dedup
    stage of the public curation pipelines (RefinedWeb §3.2 dedupes by
    URL before touching content; CCNet groups by URL): two crawls of
    the same page must collapse to one key even when the fetch URLs
    differ by host case, a fragment, tracking parameters, default
    ports, or query-parameter order.

    Steps (pure JVM column expressions — regexp/split/array built-ins,
    zero UDFs, no shuffle):
      1. trim; drop the fragment (#...),
      2. lowercase the scheme and host (NOT the path — paths are
         case-sensitive on most origins),
      3. drop default ports (:80 for http, :443 for https),
      4. drop tracking query parameters (utm_*, gclid, fbclid, ref by
         default), sort the survivors lexicographically (parameter
         order is transport noise), drop an empty query entirely,
      5. collapse an empty path to "/" and strip ONE trailing slash
         from a non-root path ("/a/" == "/a"; root keeps its slash).

    NULL in -> NULL out. Inputs WITHOUT a scheme are returned
    trimmed/defragmented but otherwise untouched (no scheme means no
    reliable host/path split — refuse to guess). The dedup that
    follows is an exact hash-groupBy on the canonical string
    (`url_dedup`), map-side combinable like every exact dedup here.
    """
    u = F.col(url) if isinstance(url, str) else url
    u0 = F.regexp_replace(F.trim(u), r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u0, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(u0, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path_q = F.regexp_replace(rest, r"^[^/?]*", "")
    raw_path = F.regexp_extract(path_q, r"^([^?]*)", 1)
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    path = F.when(
        path != "/", F.regexp_replace(path, r"/$", "")
    ).otherwise(path)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.split(p, "=").getItem(0).isin(*tracking_params),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", u0).otherwise(canon)


def bigram_perplexity(
    df: DataFrame,
    train_frac: float = 0.5,
    alpha: float = 0.4,
    k_smooth: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_transitions, n_backoff, avg_logscore, perplexity):
    per-document bigram language-model quality score under stupid
    backoff (Brants et al., "Large Language Models in Machine
    Translation", EMNLP 2007 — the backoff scheme built FOR
    distributed web-scale counts: no discounting pass, no
    normalization, just raw count ratios with a fixed backoff
    penalty). This is the bigram upgrade of `lm_perplexity`'s
    CCNet-style unigram filter: word-order gibberish ("the of and a
    in") that a unigram model scores as perfectly natural gets a low
    bigram score.

    The model is trained on a deterministic held-in half of the corpus
    (`hash_bucket(id) < train_frac` — the same md5 bucket construction
    as `deterministic_sample`, so the split is reproducible and
    growth-stable) and scores EVERY document. Training on a subset is
    what CCNet does (wiki-trained KenLM scoring Common Crawl) and is
    what keeps the backoff branch meaningful: a model trained on the
    scored corpus itself has seen every bigram by construction.

    Per transition (w1 -> w2), position order:
      seen in train:  S = count(w1 w2) / count(w1)
      unseen:         S = alpha * (count(w2) + k) / (N + k * V)
    avg_logscore = mean ln S over the document's size-1 transitions,
    perplexity = exp(-avg_logscore). Stupid-backoff scores are not
    probabilities (the point — Brants et al. §3), so "perplexity" here
    is the same monotone quality statistic, not a true LM perplexity.

    Scale shapes (mirrors `lm_perplexity`, audited there):
    - bigram + unigram counts are map-side-combinable groupBys over
      the TRAIN half's token stream — never a count window (the
      hottest bigram of a 100 TB crawl is ~1% of all transitions in
      one partition if windowed).
    - transition rows join the count tables on their token keys with
      the size-gated `maybe_broadcast` hint (a 100 TB corpus's bigram
      vocabulary does NOT fit in a broadcast; the gate degrades to a
      shuffled join with AQE skew-split on the zipf-hot keys).
    - corpus totals (N, V) are one broadcast 1-row aggregate.
    - the per-doc score folds ln-scores in POSITION order (array_sort
      + left fold — the bm25/centroid float-order discipline), so
      scores are engine-reproducible bit-for-bit, rounded to 6.

    Documents with < 2 tokens (incl. NULL/empty) keep their row with
    n_transitions = n_backoff = 0 and NULL scores — the unscorable
    convention.
    """
    from chroma_rs_spark.operators.dedup import nonempty_tokens_col
    from chroma_rs_spark.operators.sampling import _cutoff, hash_bucket
    from chroma_rs_spark.plans.partitioning import fan_out

    if not 0.0 < train_frac <= 1.0:
        raise ValueError(f"train_frac must be in (0, 1], got {train_frac}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    cut = _cutoff(train_frac)

    # unconditional fan-out of the doc scan before tokenize + explode
    # (CPU-dense per scan byte), exactly as in lm_perplexity
    base = fan_out(df.select(id_col, text_col), min_bytes=0).select(
        F.col(id_col), nonempty_tokens_col(text_col).alias("_t")
    )
    is_train = hash_bucket(id_col) < F.lit(cut)

    # train-half token stream -> unigram counts + totals (map-side
    # combinable groupBy; 1-row broadcast totals)
    train_tok = base.filter(is_train).select(F.explode("_t").alias("_tok"))
    uni = train_tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    # totals derived FROM the unigram table, not a second pass over the
    # train token explode (the lm_perplexity round-8 fix applied here):
    # N = sum of counts, V = vocabulary rows — integer-exact, so
    # bit-identical to aggregating the raw stream, one fewer
    # tokenize+explode branch
    totals = uni.agg(
        # coalesce: an EMPTY train half must yield N = 0 (the
        # unscorable guard below tests _N == 0), not NULL
        F.coalesce(F.sum("_c"), F.lit(0).cast("long")).alias("_N"),
        F.count(F.lit(1)).alias("_V"),
    )

    # every document's transitions with 0-based position:
    # zip(t[0:n-1], t[1:n]) — pure array expressions, no shuffle
    trans_expr = (
        "zip_with(slice(_t, 1, greatest(size(_t) - 1, 0)),"
        " slice(_t, 2, greatest(size(_t) - 1, 0)),"
        " (a, b) -> struct(a AS w1, b AS w2))"
    )
    trans = base.select(
        F.col(id_col), F.posexplode(F.expr(trans_expr)).alias("_pos", "_bg")
    ).select(id_col, "_pos", F.col("_bg.w1").alias("_w1"), F.col("_bg.w2").alias("_w2"))

    # train-half bigram counts (reuses the transition derivation so the
    # train counts and the scored transitions can never disagree)
    bg = (
        base.filter(is_train)
        .select(F.explode(F.expr(trans_expr)).alias("_bg"))
        .select(F.col("_bg.w1").alias("_w1"), F.col("_bg.w2").alias("_w2"))
        .groupBy("_w1", "_w2")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )

    seen = F.col("_cb").isNotNull()
    # an EMPTY train half (tiny corpus / extreme train_frac) has no
    # model: every transition must be NULL-unscorable, not the
    # Infinity that log(x / 0.0) yields — the div-by-zero class ANSI
    # doesn't catch because the denominator is a double
    log_s = F.when(F.col("_N") == 0, F.lit(None).cast("double")).when(
        seen, F.log(F.col("_cb").cast("double") / F.col("_c1").cast("double"))
    ).otherwise(
        F.log(
            F.lit(float(alpha))
            * (
                (F.coalesce(F.col("_c2"), F.lit(0)).cast("double") + F.lit(float(k_smooth)))
                / (
                    F.col("_N").cast("double")
                    + F.lit(float(k_smooth)) * F.col("_V").cast("double")
                )
            )
        )
    )
    scored = (
        trans.join(maybe_broadcast(bg), ["_w1", "_w2"], "left")
        .join(
            maybe_broadcast(uni.select(F.col("_tok").alias("_w1"), F.col("_c").alias("_c1"))),
            "_w1",
            "left",
        )
        .join(
            maybe_broadcast(uni.select(F.col("_tok").alias("_w2"), F.col("_c").alias("_c2"))),
            "_w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.sum(F.when(seen, F.lit(0)).otherwise(F.lit(1)))
            .cast("long")
            .alias("n_backoff"),
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), log_s.alias("_lp")))
            ).alias("_l"),
        )
        .selectExpr(
            f"`{id_col}`",
            "n_transitions",
            "n_backoff",
            "round(aggregate(_l, 0.0D, (a, x) -> a + x._lp)"
            " / n_transitions, 6) + 0.0D AS avg_logscore",
        )
        .withColumn(
            "perplexity", F.round(F.exp(-F.col("avg_logscore")), 6) + F.lit(0.0)
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_transitions", F.lit(0).cast("long")).alias(
                "n_transitions"
            ),
            F.coalesce("n_backoff", F.lit(0).cast("long")).alias("n_backoff"),
            "avg_logscore",
            "perplexity",
        )
    )


# decode order matters: '&amp;' LAST, so literal escapes survive as
# text ("&amp;lt;" -> "&lt;", not "<") — the standard single-pass rule
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

# block-level elements whose close tag ends a text line (C4's unit of
# filtering is the LINE; inline tags like <a>/<b> must NOT split lines)
_HTML_BLOCK_CLOSE = (
    "p|div|li|ul|ol|h[1-6]|tr|table|blockquote|pre|section|article|"
    "header|footer|figure|figcaption|nav|aside|title|head|body|html"
)


def html_extract_text(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    out: str = "text",
) -> DataFrame:
    """Adds `out`: the visible text of a raw HTML page — the stage-0
    step every C4/CCNet-style crawl pipeline runs before any quality
    or dedup operator (Raffel et al. 2020 §2.2 start from
    WET-extracted text; this is that extraction for raw WARC HTML).

    Pipeline (pure column expressions — regexp_replace/replace only,
    zero UDFs, so the whole operator is one map-side whole-stage
    codegen pass over the scan):
      1. strip comments `<!-- -->` and whole script/style/noscript
         blocks (lazy dot-all match — `1 < 2` inside a script cannot
         leak into the text or break tag stripping)
      2. close tags of block-level elements (and <br>/<hr>) become
         newlines — C4's line structure; inline tags (<a>, <b>) do not
         split lines
      3. every remaining tag drops to a space
      4. the 7 standard named/numeric entities decode, `&amp;` last so
         literal escapes survive as text
      5. whitespace normalizes: space runs collapse, blank lines drop,
         edges trim
    Regexes are Java/RE2-portable (lazy quantifiers + inline (?is)
    flags, no backreferences) — the pii_scrub discipline, so the DuckDB
    oracle replays them verbatim. Malformed HTML degrades, never
    throws: an unterminated `<` with no closing `>` survives as text.
    NULL html stays NULL.
    """
    c = F.col(html_col)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    for tag in ("script", "style", "noscript"):
        # per-tag passes on purpose: a fused alternation would let
        # </style> close an open <script> (raw-text elements only end
        # at their OWN close tag)
        c = F.regexp_replace(c, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ")
    # br/hr and block closes share the "\n" replacement: one pass
    c = F.regexp_replace(
        c, rf"(?is)<(?:br|hr)\s*/?\s*>|</(?:{_HTML_BLOCK_CLOSE})\s*>", "\n"
    )
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # whitespace normalization, 3 passes (was 5 — each regexp_replace
    # is a full scan + string realloc, so pass count is the cost):
    # 1. any whitespace run containing a newline -> one "\n"
    # 2. remaining horizontal runs -> one space
    # 3. both edges in one alternation
    # equivalent to the old collapse / " ?\n ?" / "\n+" chain: after
    # the old space-collapse, a \n-bearing run is alternating single
    # spaces and newlines, which its two passes also reduce to "\n"
    c = F.regexp_replace(c, "[ \t\r\f]*\n[ \t\n\r\f]*", "\n")
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    return df.withColumn(out, c)


def url_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """URL-level exact dedup: one row per input doc with its canonical
    URL and `keep` = True iff the doc is the min-id representative of
    its canonical-URL group (the same keeper rule as `exact_dedup`).
    NULL / scheme-less-unparseable URLs canonicalize to themselves and
    dedup within their own group; NULL urls are all kept (no key).

    Scale shape: one map-side canonicalization expression + one
    hash-groupBy window-free keeper (min over a partial-aggregable
    struct), identical to the exact-dedup plan audited at 100 TB.
    """
    canon = canonicalize_url(url_col)
    with_key = docs.withColumn("canonical_url", canon)
    keeper = (
        with_key.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(F.col(id_col)).alias("_keep_id"))
    )
    return (
        with_key.join(keeper, "canonical_url", "left")
        .select(
            F.col(id_col),
            F.col(url_col),
            "canonical_url",
            F.when(F.col("canonical_url").isNull(), F.lit(True))
            .otherwise(F.col(id_col) == F.col("_keep_id"))
            .alias("keep"),
        )
    )


# unicode script ranges, Java/RE2-portable \x{...} classes (probed
# identical in both engines); order = dominance tie-break priority
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", r"[A-Za-z\x{00C0}-\x{024F}]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
    ("arabic", r"[\x{0600}-\x{06FF}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]"),
    ("digit", "[0-9]"),
)


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, {script}_frac ..., dominant_script): per-document
    unicode-script composition — the multilingual curation signal the
    n-gram `lang_id` heuristic cannot give (it only ranks known
    languages; a Cyrillic document scores garbage against every Latin
    profile instead of announcing itself). Fractions are counts over
    total code points, rounded 6; `dominant_script` is the largest
    class, ties resolved by SCRIPT_RANGES order, NULL when no class
    matches (whitespace/punctuation-only) or the text is NULL/empty.

    Entirely map-side column expressions (regexp_count per class —
    zero shuffles, one codegen pass); the \\x{...} range classes are
    probed identical between Java regex and RE2, so the oracle replays
    them verbatim.
    """
    n = F.length(F.col(text_col))
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat))
        for name, pat in SCRIPT_RANGES
    }
    m = F.greatest(*counts.values())
    dominant = F.when((n.isNull()) | (n == 0) | (m == 0), F.lit(None))
    for name, _ in SCRIPT_RANGES:
        dominant = dominant.when(counts[name] == m, F.lit(name))
    cols = [
        F.col(id_col),
        F.coalesce(n, F.lit(0)).cast("long").alias("n_chars"),
    ]
    for name, _ in SCRIPT_RANGES:
        cols.append(
            F.when(
                n.isNull() | (n == 0), F.lit(None).cast("double")
            )
            .otherwise(
                F.round(counts[name].cast("double") / n.cast("double"), 6)
            )
            .alias(f"{name}_frac")
        )
    cols.append(dominant.alias("dominant_script"))
    return df.select(*cols)


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style unicode normalization (Wenzek et al. 2020 §3.1 —
    the canonical key computed BEFORE hashing in paragraph/line dedup
    pipelines): returns per document

    * ``nfc_text`` — unicode NFC canonical composition (decomposed
      `e` + U+0301 and precomposed `é` hash apart; every public web
      corpus mixes both);
    * ``folded_text`` — the dedup key: NFC, then accent-fold (NFD →
      drop Mn combining marks — the utf8proc `strip_accents` rule),
      then ASCII-whitespace collapse (`[ \\t\\n\\r\\f\\v]+` → one
      space, trimmed). The class is deliberately ASCII-only so both
      engines agree on NBSP/ZWSP (preserved, not collapsed);
    * ``nfc_changed`` / ``fold_changed`` — audit booleans (how much of
      the corpus the normalizer actually touched);
    * ``n_chars_folded`` — code-point length of the dedup key.

    NULL-text docs are dropped (the frequency-table inner-join
    convention the rest of the text family uses).

    Physical shape: ONE vectorized Arrow pass (mapInPandas over the
    compute-gated fan_out) — unicodedata.normalize is pure per-row
    CPU with zero cross-doc state, the exact kernel class
    repetition_signals documents; no shuffle, |docs| in → |docs| out.
    Parity with the DuckDB oracle (nfc_normalize / strip_accents,
    both utf8proc) is probed over decomposed, precomposed, ligature,
    fullwidth, NBSP and ZWSP cases in tests.
    """
    import pandas as pd

    from chroma_rs_spark.plans import fan_out

    # the id field keeps the INPUT's type (string collection ids and
    # long testdata doc_ids both pass through untouched) — hardcoding
    # `long` here made string-id corpora fail at Arrow conversion
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, nfc_text string, folded_text string, "
        "nfc_changed boolean, fold_changed boolean, n_chars_folded long"
    )

    def kernel(batches):
        import re as _re
        import unicodedata as _ud

        ws = _re.compile(r"[ \t\n\r\f\v]+")

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                nfc = _ud.normalize("NFC", text)
                folded = "".join(
                    c
                    for c in _ud.normalize("NFD", nfc)
                    if _ud.category(c) != "Mn"
                )
                folded = ws.sub(" ", folded).strip()
                rows.append(
                    (
                        doc_id,
                        nfc,
                        folded,
                        nfc != text,
                        folded != nfc,
                        len(folded),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col,
                        "nfc_text",
                        "folded_text",
                        "nfc_changed",
                        "fold_changed",
                        "n_chars_folded",
                    ],
                )

    # 64 KB compute gate, same rationale as repetition_signals: the
    # kernel cost tracks decompressed text, not the optimizer's
    # compressed-bytes estimate.
    return fan_out(
        df.select(id_col, text_col), min_bytes=64 << 10
    ).mapInPandas(kernel, schema=schema)
