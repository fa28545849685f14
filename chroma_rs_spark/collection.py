"""Item-level collection operations (SURVEY.md §2.2 A1-A15).

These are the `api/v1/collections/{id}/...` item endpoints of the API
the reference client targets (not materialized in the reference's own
code — src/collection.rs:4-22 is a passive struct; see SURVEY.md §0).

Functions take (engine, collection, ...) and are surfaced as bound
methods on `Collection` via `Collection.__getattr__`.

Storage: each collection is a Parquet dataset with the fixed item
schema  id STRING, embedding ARRAY<FLOAT>, embedding_norm DOUBLE,
document STRING, metadata MAP<STRING,STRING>.  The `embedding_norm`
column is precomputed at add-time — the batch "vector index build"
(BASELINE.md north star) that makes cosine queries cheap at scale.

Mutation model (SURVEY.md §7 hard-part (a)): Parquet has no row-level
update, so upsert/update/delete are read-modify-overwrite with a
temp-dir swap. This is NOT transactional under concurrent writers —
at production scale you'd swap the format for Delta/Iceberg and keep
this API identical; the logical plans below don't change.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chroma_rs_spark.catalog import Collection, Engine
from chroma_rs_spark.errors import (
    DimensionMismatchError,
    DuplicateIDError,
    EngineError,
    IDNotFoundError,
    InvalidFilterError,
)
from chroma_rs_spark.filters import compile_where, compile_where_document
from chroma_rs_spark.functions.vector import l2_norm
from chroma_rs_spark.operators.knn import knn_exact

ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("embedding_norm", T.DoubleType(), True),
        T.StructField("document", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

INCLUDE_COLS = {
    "embeddings": "embedding",
    "documents": "document",
    "metadatas": "metadata",
}

# Physical hive-partition column of a partitioned collection (value of
# the registry's `partition_by` metadata key). Internal: never shown to
# callers — read paths drop it after the pruning filter is applied.
PARTITION_COL = "_part"


# -- helpers ------------------------------------------------------------


def _partition_key(engine: Engine, coll: Collection) -> str | None:
    return engine._registry_row(coll.id).get("partition_by")


def _has_parquet(path: str) -> bool:
    """Any parquet file at the top level or inside one level of hive
    partition directories (the only two layouts we write: `_part=` for
    partitioned collections, `cell=` for the IVF-PQ code tier) —
    bounded depth, so the driver-side check stays O(directories), not
    O(files in the whole tree)."""
    with os.scandir(path) as it:
        subdirs = []
        for e in it:
            if e.is_file() and e.name.endswith(".parquet"):
                return True
            if e.is_dir() and "=" in e.name and not e.name.startswith("."):
                subdirs.append(e.path)
    for d in subdirs:
        with os.scandir(d) as it:
            if any(e.is_file() and e.name.endswith(".parquet") for e in it):
                return True
    return False


def items_df(
    engine: Engine, coll: Collection, keep_partition_col: bool = False
) -> DataFrame:
    """The collection's items as a DataFrame (empty if nothing added)."""
    partitioned = _partition_key(engine, coll) is not None
    # NB StructType.add mutates in place — build a fresh StructType
    schema = (
        T.StructType(
            ITEM_SCHEMA.fields + [T.StructField(PARTITION_COL, T.StringType(), True)]
        )
        if partitioned
        else ITEM_SCHEMA
    )
    path = engine.data_path(coll.id)
    _recover_interrupted_overwrite(path)
    if os.path.isdir(path) and _has_parquet(path):
        df = engine.spark.read.schema(schema).parquet(path)
    else:
        df = engine.spark.createDataFrame([], schema)
    if partitioned and not keep_partition_col:
        df = df.drop(PARTITION_COL)
    return df


def _partition_pred(where: dict | None, key: str | None) -> Column | None:
    """Partition-pruning conjunct implied by a `where` filter.

    Conservative: direct equality / $eq / $in on the partition key
    produce a prune, recursing through $and (any one branch's value
    set is a valid superset of the surviving rows) and $or (every
    branch must constrain the key; the prune is the union of their
    value sets). Anything else scans all partitions. The conjunct is
    redundant with the compiled metadata predicate — it exists solely
    so Catalyst sees a filter on the partition column and skips
    directories at file listing time.

    Values that hive cannot round-trip (empty string — written as the
    __HIVE_DEFAULT_PARTITION__ directory and read back as null — and
    the sentinel itself) disable pruning rather than silently dropping
    the rows the metadata predicate would match.
    """
    vals = _partition_values(where, key)
    if not vals:
        return None
    # Non-string comparands stand down: the stored directory name comes
    # from the map's string value (str(3) -> '3') while str() of the
    # comparand may differ (str(3.0) -> '3.0'), and the compiled
    # metadata predicate compares after a numeric CAST — a mismatched
    # prune conjunct would silently drop matching rows.
    if any(not isinstance(x, str) for x in vals):
        return None
    svals = [str(x) for x in vals]
    if any(v in ("", "__HIVE_DEFAULT_PARTITION__") for v in svals):
        return None
    return F.col(PARTITION_COL).isin(svals)


def _partition_values(where: dict | None, key: str | None) -> list | None:
    """Value set the partition key is restricted to by `where`, or None
    if the filter does not constrain it."""
    if where is None or key is None:
        return None
    v = where.get(key)
    if isinstance(v, dict):
        if set(v) == {"$eq"}:
            return [v["$eq"]]
        if set(v) == {"$in"}:
            return list(v["$in"])
    elif isinstance(v, (str, int, float, bool)):
        return [v]
    if "$and" in where:
        for branch in where["$and"]:
            vals = _partition_values(branch, key)
            if vals is not None:
                return vals
    if "$or" in where:
        union: list = []
        for branch in where["$or"]:
            vals = _partition_values(branch, key)
            if vals is None:
                return None  # one unconstrained branch defeats the prune
            union.extend(vals)
        return union
    return None


def _write(
    engine: Engine, coll: Collection, df: DataFrame, path: str, mode: str
) -> None:
    """Write items, partitioning the layout when the collection is
    partitioned (the partition value is derived from the metadata map,
    so data and layout cannot disagree)."""
    key = _partition_key(engine, coll)
    if key is None:
        df.write.mode(mode).parquet(path)
        return
    if PARTITION_COL in df.columns:
        df = df.drop(PARTITION_COL)
    df = df.withColumn(PARTITION_COL, F.element_at(F.col("metadata"), F.lit(key)))
    df.write.mode(mode).partitionBy(PARTITION_COL).parquet(path)


def _meta_str(v: object) -> str:
    """Canonical string form for a metadata value — the same form the
    where-DSL compiler coerces comparands to (filters._coerce), so
    stored values and filter literals always meet in one encoding.

    Scalars use their JSON text (so `true`/`1`/`1.5` cast cleanly in
    filter comparisons); nested dicts/lists use canonical JSON
    (sorted keys, no whitespace) — machine-recoverable with
    `decode_meta_value`, mirroring the reference's schemaless JSON
    metadata (reference src/collection.rs:8, client.rs:359) within the
    engine's MAP<STRING,STRING> storage."""
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (dict, list)):
        from chroma_rs_spark.filters import canonical_json

        return canonical_json(v)
    return str(v)


def decode_meta_value(s: str | None) -> object:
    """Typed accessor for a stored metadata value: the inverse of
    `_meta_str` wherever the encoding is unambiguous. JSON numbers,
    booleans, null, objects and arrays decode to their Python types;
    anything else (including bare strings, which are stored raw) comes
    back unchanged. A string that LOOKS like a number (stored from the
    Python string "1") is indistinguishable from the number by design —
    the caller's expected type (like the where-DSL comparand) is the
    tie-break, exactly as in the reference's schemaless JSON model."""
    if s is None:
        return None
    t = s.strip()
    if not t:
        return s
    if t in ("true", "false", "null") or t[0] in "-0123456789[{":
        try:
            return json.loads(t)
        except ValueError:
            return s
    return s


def _items_from_args(
    engine: Engine,
    ids: Sequence[str],
    embeddings: Sequence[Sequence[float]] | None,
    documents: Sequence[str] | None,
    metadatas: Sequence[dict] | None,
) -> DataFrame:
    n = len(ids)
    embeddings = embeddings if embeddings is not None else [None] * n
    documents = documents if documents is not None else [None] * n
    metadatas = metadatas if metadatas is not None else [None] * n
    if not (len(embeddings) == len(documents) == len(metadatas) == n):
        raise EngineError("ids/embeddings/documents/metadatas length mismatch")
    rows = [
        (
            str(i),
            [float(x) for x in e] if e is not None else None,
            None,
            d,
            # metadata is stored as map<string,string>; booleans MUST
            # serialize as the same lowercase form compile_where's
            # _coerce produces (filters.py), or where={'flag': True}
            # would silently match nothing against a stored 'True'
            # `is not None`, not truthiness: an explicit empty dict is
            # a real (empty) metadata map, distinct from "no metadata"
            {k: _meta_str(v) for k, v in m.items()} if m is not None else None,
        )
        for i, e, d, m in zip(ids, embeddings, documents, metadatas)
    ]
    df = engine.spark.createDataFrame(rows, ITEM_SCHEMA)
    return df.withColumn("embedding_norm", l2_norm("embedding"))


def _check_batch_ids_unique(ids: Sequence[str], op: str) -> None:
    """Duplicate ids within one mutation batch corrupt the unique-id
    invariant: upsert would union one row per duplicate, update's
    left join would multiply existing rows. add() has always raised;
    every id-batch mutation shares the rule."""
    if len(set(ids)) != len(ids):
        raise DuplicateIDError(f"duplicate ids within {op}() batch")


def _check_dim(engine: Engine, coll: Collection, df: DataFrame) -> None:
    row = engine._registry_row(coll.id)
    dims = [
        r[0]
        for r in df.select(F.size("embedding").alias("d"))
        .where(F.col("d") >= 0)
        .distinct()
        .collect()
    ]
    if not dims:
        return
    if len(dims) > 1:
        raise DimensionMismatchError(f"mixed embedding dims in add: {sorted(dims)}")
    if row.get("dim") is None:
        engine._update_registry_row(coll.id, dim=int(dims[0]))
    elif int(dims[0]) != int(row["dim"]):
        raise DimensionMismatchError(
            f"expected dim {row['dim']}, got {dims[0]}"
        )


def _recover_interrupted_overwrite(path: str, cleanup: bool = False) -> None:
    """Finish (or roll back) an _overwrite interrupted between its two
    renames, so a crash can never lose the collection.

    Completeness of the temp dir is judged by Spark's own _SUCCESS
    commit marker (written only after every task of the job committed):
    * path missing + complete tmp  -> promote tmp (the new state won).
    * path missing + old           -> restore old (the write died
      mid-flight; the previous state is the only complete one).
    * path present                 -> the swap finished; stale tmp/old
      are leftovers from the final cleanup step.

    `cleanup` (writers only) also deletes stale tmp/old when the live
    dir is present. READERS must pass the default False: with a live
    dir in place a tmp dir is just as likely a concurrent single
    writer's in-flight output, and deleting it from a read path would
    break the writer — violating the single-writer-with-safe-readers
    contract. A reader only ever intervenes when the live dir is
    MISSING (post-crash, when by definition no writer survived).
    """
    tmp, old = path + ".__tmp", path + ".__old"
    if not os.path.isdir(path):
        # The renames are best-effort and idempotent: a "missing" live
        # dir can also be a healthy writer observed inside its
        # two-rename window, or another reader may win the same
        # recovery race — in both cases the loser's os.replace raises
        # (FileNotFound/NotADir) AFTER someone made path live again,
        # which is exactly the healed state this function wants.
        if os.path.isdir(tmp) and os.path.isfile(os.path.join(tmp, "_SUCCESS")):
            try:
                os.replace(tmp, path)
            except OSError:
                if not os.path.isdir(path):
                    raise
        elif os.path.isdir(old):
            try:
                os.replace(old, path)
            except OSError:
                if not os.path.isdir(path):
                    raise
        if os.path.isdir(path):
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
    elif cleanup:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)


def _overwrite(engine: Engine, coll: Collection, df: DataFrame) -> None:
    """Read-modify-overwrite via atomic temp-dir swap: the new state is
    fully written (and _SUCCESS-committed) beside the live dir, then two
    directory renames swap it in. Every crash window is covered by
    _recover_interrupted_overwrite on the next read — the collection is
    always either the complete old state or the complete new state.
    Concurrent WRITERS are still undefined behavior (single-writer
    contract, SURVEY §7 hard part (a)); readers are safe throughout.
    """
    path = engine.data_path(coll.id)
    _recover_interrupted_overwrite(path, cleanup=True)
    tmp = path + ".__tmp"
    _write(engine, coll, df, tmp, "overwrite")
    old = path + ".__old"
    if os.path.isdir(path):
        os.replace(path, old)
    try:
        os.replace(tmp, path)
    except FileNotFoundError:
        # A concurrent reader's _recover_interrupted_overwrite saw the
        # live dir missing inside this rename window and promoted the
        # committed tmp itself — the disk already holds exactly the
        # state this rename was about to produce, so the writer
        # succeeds rather than crashing spuriously.
        if not (
            os.path.isdir(path)
            and os.path.isfile(os.path.join(path, "_SUCCESS"))
        ):
            raise
    shutil.rmtree(old, ignore_errors=True)


def _predicate(
    where: dict | None, where_document: dict | None, ids: Sequence[str] | None
) -> Column | None:
    preds = []
    if ids is not None:
        preds.append(F.col("id").isin([str(i) for i in ids]))
    if where is not None:
        preds.append(compile_where(where))
    if where_document is not None:
        preds.append(compile_where_document(where_document))
    if not preds:
        return None
    combined = preds[0]
    for p in preds[1:]:
        combined = combined & p
    return combined


# -- A1 add / A2 upsert / A3 update ------------------------------------


def _collection_embedder(coll: Collection):
    """(embed_batch, dim) for the collection's registered
    `embedding_function` metadata name, or None when unset — the
    Chroma attach-an-EmbeddingFunction analogue (reference
    src/client.rs:97 carries the collection metadata map this name
    lives in)."""
    name = (coll.metadata or {}).get("embedding_function")
    if name is None:
        return None
    from chroma_rs_spark.functions.embedding import resolve_embedder

    try:
        return resolve_embedder(str(name))
    except KeyError as e:
        raise EngineError(str(e)) from e


def _auto_embed(coll, embeddings, documents):
    """Chroma auto-embed contract, shared by add/upsert/update: when
    embeddings are omitted but documents given and the collection
    names an embedding_function, embed the documents (update thereby
    RE-embeds on document change, Chroma's behavior); NULL documents
    stay NULL-embedded."""
    if embeddings is not None or documents is None:
        return embeddings
    emb = _collection_embedder(coll)
    if emb is None:
        return embeddings
    embed_batch, _dim = emb
    # embed only the non-None documents and scatter results back: a
    # custom register_embedder model (the advertised integration
    # point) must never see None, even though None docs stay
    # NULL-embedded regardless
    docs = list(documents)
    present = [i for i, d in enumerate(docs) if d is not None]
    out: list[list[float] | None] = [None] * len(docs)
    if present:
        mat = embed_batch([docs[i] for i in present])
        for i, row in zip(present, mat):
            out[i] = [float(x) for x in row]
    return out


def add(
    engine: Engine,
    coll: Collection,
    ids: Sequence[str],
    embeddings: Sequence[Sequence[float]] | None = None,
    documents: Sequence[str] | None = None,
    metadatas: Sequence[dict] | None = None,
) -> int:
    """Append items; duplicate ids (in batch or existing) error (A1).

    Chroma auto-embed contract: when `embeddings` is omitted but
    `documents` given AND the collection metadata names an
    `embedding_function`, the documents are embedded with it — the
    same embedder query(query_texts=...) resolves, so stored and probe
    vectors live in one space."""
    embeddings = _auto_embed(coll, embeddings, documents)
    new = _items_from_args(engine, ids, embeddings, documents, metadatas)
    if len(set(ids)) != len(ids):
        raise DuplicateIDError("duplicate ids within add() batch")
    existing = items_df(engine, coll)
    # left-semi against existing ids: cheap (id-only columns; Catalyst
    # prunes the rest) and shuffle-free when `new` is broadcastable.
    dup = new.join(existing.select("id"), "id", "left_semi").count()
    if dup:
        raise DuplicateIDError(f"{dup} ids already exist in collection")
    _check_dim(engine, coll, new)
    _write(engine, coll, new, engine.data_path(coll.id), "append")
    return len(ids)


def add_df(engine: Engine, coll: Collection, df: DataFrame) -> None:
    """Bulk add from a DataFrame already in item shape (batch path).

    Columns: id, embedding[, document][, metadata]. This is the 100 TB
    ingestion path — no driver-side lists, just a distributed write.
    """
    cols = set(df.columns)
    out = df.select(
        F.col("id").cast("string").alias("id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
        l2_norm("embedding").alias("embedding_norm"),
        (F.col("document") if "document" in cols else F.lit(None).cast("string")).alias(
            "document"
        ),
        (
            F.col("metadata")
            if "metadata" in cols
            else F.lit(None).cast("map<string,string>")
        ).alias("metadata"),
    )
    _check_dim(engine, coll, out)
    _write(engine, coll, out, engine.data_path(coll.id), "append")


def upsert(
    engine: Engine,
    coll: Collection,
    ids: Sequence[str],
    embeddings: Sequence[Sequence[float]] | None = None,
    documents: Sequence[str] | None = None,
    metadatas: Sequence[dict] | None = None,
) -> int:
    """Add-or-replace by id (A2): anti-join existing, union new.
    Auto-embeds documents when the collection names an
    embedding_function (the add() contract)."""
    _check_batch_ids_unique(ids, "upsert")
    embeddings = _auto_embed(coll, embeddings, documents)
    new = _items_from_args(engine, ids, embeddings, documents, metadatas)
    _check_dim(engine, coll, new)
    existing = items_df(engine, coll)
    kept = existing.join(F.broadcast(new.select("id")), "id", "left_anti")
    _overwrite(engine, coll, kept.unionByName(new))
    return len(ids)


def update(
    engine: Engine,
    coll: Collection,
    ids: Sequence[str],
    embeddings: Sequence[Sequence[float]] | None = None,
    documents: Sequence[str] | None = None,
    metadatas: Sequence[dict] | None = None,
) -> int:
    """Patch columns by id (A3): column-wise coalesce of new over old.

    Raises IDNotFoundError if any patch id is absent — the left join
    below silently drops such patch rows, so without the check a
    caller could not tell a no-op from a successful update.
    """
    _check_batch_ids_unique(ids, "update")
    embeddings = _auto_embed(coll, embeddings, documents)
    patch = _items_from_args(engine, ids, embeddings, documents, metadatas)
    if embeddings is not None:
        # a patch may replace embeddings — same dim discipline as add
        _check_dim(engine, coll, patch)
    existing = items_df(engine, coll)
    missing = [
        r["id"]
        for r in patch.select("id")
        .join(existing.select("id"), "id", "left_anti")
        .collect()
    ]
    if missing:
        raise IDNotFoundError(
            f"update() ids not in collection: {sorted(missing)[:10]}"
            + ("..." if len(missing) > 10 else "")
        )
    p = patch.select(
        F.col("id"),
        F.col("embedding").alias("_e"),
        F.col("embedding_norm").alias("_en"),
        F.col("document").alias("_d"),
        F.col("metadata").alias("_m"),
    )
    merged = (
        existing.join(F.broadcast(p), "id", "left")
        .select(
            "id",
            F.coalesce("_e", "embedding").alias("embedding"),
            F.coalesce("_en", "embedding_norm").alias("embedding_norm"),
            F.coalesce("_d", "document").alias("document"),
            F.coalesce("_m", "metadata").alias("metadata"),
        )
    )
    _overwrite(engine, coll, merged)
    return len(ids)


# -- A4 delete ----------------------------------------------------------


def delete(
    engine: Engine,
    coll: Collection,
    ids: Sequence[str] | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
) -> None:
    pred = _predicate(where, where_document, ids)
    if pred is None:
        raise InvalidFilterError("delete() requires ids and/or where/where_document")
    existing = items_df(engine, coll)
    # NB delete keeps the complement, so the partition-pruning conjunct
    # of `where` does NOT apply (~pred must scan every partition).
    # coalesce: a NULL predicate (metadata NULL / key absent / document
    # NULL) means the row did NOT match the delete filter — it must be
    # KEPT. Bare ~NULL is NULL, which filter() drops: silent
    # over-deletion of every non-matching-by-NULL row.
    _overwrite(
        engine, coll, existing.filter(~F.coalesce(pred, F.lit(False)))
    )


# -- A5 get / A6 count / A7 peek ---------------------------------------


def get(
    engine: Engine,
    coll: Collection,
    ids: Sequence[str] | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    limit: int | None = None,
    offset: int = 0,
    include: Sequence[str] = ("documents", "metadatas"),
) -> DataFrame:
    """Filtered retrieval with pagination + projection (A5, A15).

    Projection (`include`) happens first so Catalyst prunes Parquet
    columns; ordering by id makes pagination deterministic.
    """
    df = items_df(engine, coll, keep_partition_col=True)
    pred = _predicate(where, where_document, ids)
    if pred is not None:
        df = df.filter(pred)
    ppred = _partition_pred(where, _partition_key(engine, coll))
    if ppred is not None:
        df = df.filter(ppred)
    df = df.drop(PARTITION_COL)
    cols = ["id"] + [INCLUDE_COLS[i] for i in include if i in INCLUDE_COLS]
    df = df.select(*cols).orderBy("id")
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df


def count(engine: Engine, coll: Collection) -> int:
    return items_df(engine, coll).count()


def peek(engine: Engine, coll: Collection, limit: int = 10) -> DataFrame:
    return items_df(engine, coll).orderBy("id").limit(limit)


# -- A8 query (KNN) -----------------------------------------------------




def _atomic_index_write(
    df: DataFrame, path: str, partition_by: str | None = None
) -> None:
    """Persist a tiny index artifact with the same crash discipline as
    the data dir: write fully (and _SUCCESS-committed) into a temp dir,
    then one rename swap — a crash mid-build leaves the OLD index
    intact instead of a deleted-or-partial directory that a later load
    would silently zero-fill."""
    tmp = path + ".__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)
    if not os.path.isfile(os.path.join(tmp, "_SUCCESS")):
        raise EngineError(f"index write did not commit: {tmp}")
    # same two-rename discipline as _overwrite: the old index is parked,
    # never destroyed before the new one is in place, so every crash
    # window leaves a complete index recoverable by
    # _recover_interrupted_overwrite (which the loaders run).
    old = path + ".__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(path):
        os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _committed_index_dir(path: str) -> bool:
    """An index dir is loadable iff Spark's commit marker is present —
    a partial directory must read as ABSENT (transient retrain /
    explicit rebuild), never as a silently truncated artifact. A crash
    between _atomic_index_write's two renames is healed first (promote
    the committed tmp, else restore the parked old index)."""
    _recover_interrupted_overwrite(path)
    return (
        os.path.isdir(path)
        and os.path.isfile(os.path.join(path, "_SUCCESS"))
        and _has_parquet(path)
    )


IVF_INDEX_DIR = "ivf_index"


def build_ivf_index(
    engine: Engine,
    coll: Collection,
    n_centroids: int = 16,
    max_iter: int = 5,
) -> str:
    """Train and PERSIST the collection's IVF centroid index: k-means
    over the stored embeddings (operators/ivf.py:train_centroids_kmeans
    — deterministic: md5-ordered seeds, fixed-point M-step), written as
    a tiny (label, pos, centroid) parquet next to the collection data.
    This is the index-build-once contract: `query(index="ivf")` reads
    the persisted matrix instead of training per query. Raises
    ValueError when fewer than `n_centroids` clusters survive training
    (degenerate/duplicated data) — never hands back a smaller index
    than asked for.

    Item-to-cell assignment is NOT persisted: queries assign rows to
    cells at search time (one vectorized Arrow pass, operators/ivf.py),
    so items added after the build remain searchable — a stale index
    only degrades cell balance/recall, never drops data. At 100 TB
    you would additionally persist the assignment as a bucketing
    column; the centroid artifact and search plan stay identical.
    """
    from chroma_rs_spark.operators.ivf import train_centroids_kmeans

    df = items_df(engine, coll).filter(F.col("embedding").isNotNull())
    cents = train_centroids_kmeans(
        df,
        n_centroids=n_centroids,
        max_iter=max_iter,
        item_id="id",
        item_emb="embedding",
    )
    rows = [
        (int(lab), int(pos), float(v))
        for lab, vec in cents
        for pos, v in enumerate(vec)
    ]
    path = os.path.join(engine.collection_dir(coll.id), IVF_INDEX_DIR)
    _atomic_index_write(
        engine.spark.createDataFrame(
            rows, "label INT, pos INT, centroid DOUBLE"
        ).coalesce(1),
        path,
    )
    return path


def _load_ivf_index(
    engine: Engine, coll: Collection
) -> list[tuple[int, list[float]]] | None:
    path = os.path.join(engine.collection_dir(coll.id), IVF_INDEX_DIR)
    if not _committed_index_dir(path):
        return None
    # k x dim rows — tiny by contract (the persisted index artifact)
    by_label: dict[int, dict[int, float]] = {}
    for r in engine.spark.read.parquet(path).collect():
        by_label.setdefault(int(r["label"]), {})[int(r["pos"])] = float(
            r["centroid"]
        )
    return [
        (lab, [d[p] for p in sorted(d)]) for lab, d in sorted(by_label.items())
    ]


def compact(
    engine: Engine,
    coll: Collection,
    target_file_mb: int = 128,
) -> int:
    """Rewrite the collection's data files into ~target_file_mb
    parquet files and return the new file count — the maintenance op
    a micro-batch ingest (streaming/ingest.py) needs: every
    `availableNow` trigger appends its own small files, and a
    collection that has absorbed thousands of tiny appends scans with
    thousands of tiny tasks. Compaction is a pure physical rewrite
    (same rows, same schema) through the crash-safe temp-dir swap, so
    a crash mid-compact can never lose data and readers stay correct
    throughout (single-writer contract, as for every mutation).

    File count comes from the live directory's actual bytes (what the
    optimizer's sizeInBytes also reads), so the target adapts to the
    collection's real width. At 100 TB this is the same operation —
    executed per partition directory if the collection is partitioned.
    """
    path = engine.data_path(coll.id)
    _recover_interrupted_overwrite(path, cleanup=True)
    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, fn))
    n_files = max(1, -(-total // (target_file_mb << 20)))  # ceil div
    df = items_df(engine, coll)
    if _partition_key(engine, coll) is not None:
        # partitioned layout: repartition BY the partition value so each
        # value's rows land in few tasks — a round-robin repartition
        # would emit up to n_files files PER partition directory (every
        # task holds every value), multiplying small files instead of
        # merging them
        df = df.repartition(
            n_files, F.element_at(F.col("metadata"), F.lit(_partition_key(engine, coll)))
        )
    else:
        df = df.repartition(n_files)
    _overwrite(engine, coll, df)
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for fn in files
        if fn.endswith(".parquet")
    )


PQ_INDEX_DIR = "pq_index"


def _unit_vectors(df: DataFrame) -> DataFrame:
    """(id, embedding) with unit-normalized double vectors — the ADC
    candidate domain for cosine collections (cosine ranking ≡ L2 on
    unit vectors). Zero-norm vectors become NULL (unscorable under
    cosine; pq_encode drops NULLs, matching the exact path's filter).
    Candidate-stage only: the final ranking always re-scores exactly
    on the raw vectors."""
    from chroma_rs_spark.functions.vector import l2_norm

    return df.select(
        "id",
        "embedding",
        l2_norm("CAST(embedding AS ARRAY<DOUBLE>)").alias("_n"),
    ).selectExpr(
        "id",
        "CASE WHEN _n = 0.0D THEN NULL"
        " ELSE transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x / _n)"
        " END AS embedding",
    )


def build_pq_index(
    engine: Engine,
    coll: Collection,
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    sample_size: int = 4096,
) -> str:
    """Train and PERSIST the collection's product-quantization
    codebooks (operators/pq.py) as a tiny (m, code, pos, value)
    parquet next to the collection data — the same index-build-once
    contract as build_ivf_index. Cosine collections train on
    unit-normalized vectors (ADC candidates then rank by cosine);
    l2 collections train on raw vectors. Item codes are NOT persisted:
    queries encode at search time, so late-added items stay searchable
    (at 100 TB you would additionally materialize the codes column —
    the codebook artifact and search plan stay identical)."""
    from chroma_rs_spark.operators.pq import train_pq_codebooks

    metric = (coll.metadata or {}).get("hnsw:space", "l2")
    if metric not in ("l2", "cosine"):
        raise EngineError(
            f"index='pq' supports l2/cosine collections; hnsw:space is {metric!r}"
        )
    df = items_df(engine, coll).filter(F.col("embedding").isNotNull())
    src = _unit_vectors(df) if metric == "cosine" else df
    books = train_pq_codebooks(
        src,
        m=m,
        k=k,
        max_iter=max_iter,
        sample_size=sample_size,
        item_id="id",
        item_emb="embedding",
    )
    rows = [
        (mi, ci, pos, float(books[mi, ci, pos]))
        for mi in range(books.shape[0])
        for ci in range(books.shape[1])
        for pos in range(books.shape[2])
    ]
    path = os.path.join(engine.collection_dir(coll.id), PQ_INDEX_DIR)
    # a materialized codes table encodes against the PREVIOUS codebooks:
    # with a larger new m it would crash ADC (codes[:, mi] out of range),
    # with a smaller (or same!) m it would silently rank garbage
    # candidates — invalidate BEFORE the new index swaps in, so a crash
    # anywhere in this window leaves codes absent (queries re-encode on
    # the fly, correct under whichever codebook generation survives).
    # The parked/tmp remnants go too: _recover_interrupted_overwrite
    # would otherwise resurrect a prior-generation codes dir.
    codes_path = os.path.join(engine.collection_dir(coll.id), PQ_CODES_DIR)
    for stale in (codes_path, codes_path + ".__old", codes_path + ".__tmp"):
        shutil.rmtree(stale, ignore_errors=True)
        if os.path.exists(stale):
            # this deletion is the ONLY guard against same-m stale codes
            # silently ranking garbage — a failed rmtree must be loud
            raise EngineError(
                f"build_pq_index: could not invalidate stale codes {stale}"
            )
    _atomic_index_write(
        engine.spark.createDataFrame(
            rows, "m INT, code INT, pos INT, value DOUBLE"
        ).coalesce(1),
        path,
    )
    return path


def stats(engine: Engine, coll: Collection) -> dict:
    """Operational snapshot of a collection: row count, physical bytes
    and file count of the data dir (the compaction signal), registered
    dim/partition key, and which index artifacts are present and
    committed — the numbers an operator needs before deciding to
    compact(), build_*_index() or materialize_pq_codes()."""
    path = engine.data_path(coll.id)
    n_files = 0
    n_bytes = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(root, fn))
    row = engine._registry_row(coll.id)
    cdir = engine.collection_dir(coll.id)
    return {
        "count": count(engine, coll),
        "data_files": n_files,
        "data_bytes": n_bytes,
        "dim": row.get("dim"),
        "partition_by": row.get("partition_by"),
        "ivf_index": _committed_index_dir(os.path.join(cdir, IVF_INDEX_DIR)),
        "pq_index": _committed_index_dir(os.path.join(cdir, PQ_INDEX_DIR)),
        "pq_codes": _committed_index_dir(os.path.join(cdir, PQ_CODES_DIR)),
        "ivfpq_index": _ivfpq_index_committed(cdir),
        "ivfpq_codes": _committed_index_dir(
            os.path.join(cdir, IVFPQ_CODES_DIR)
        ),
    }


PQ_CODES_DIR = "pq_codes"


def materialize_pq_codes(engine: Engine, coll: Collection) -> str:
    """Encode every CURRENT item against the persisted PQ codebooks and
    persist the (id, codes) table — the 100 TB production step the
    build_pq_index docstring defers: with codes materialized, a query
    scans |corpus| x m bytes of codes instead of re-encoding raw
    vectors per query; items added later are encoded on the fly and
    unioned at query time, and updated embeddings only degrade their
    own ADC candidate ranks until the next materialize (the exact
    re-scoring stage always uses current vectors). Requires a
    persisted index (`build_pq_index` first)."""
    from chroma_rs_spark.operators.pq import pq_encode

    books = _load_pq_index(engine, coll)
    if books is None:
        raise EngineError("materialize_pq_codes requires build_pq_index first")
    metric = (coll.metadata or {}).get("hnsw:space", "l2")
    src = items_df(engine, coll).filter(F.col("embedding").isNotNull())
    enc_src = _unit_vectors(src) if metric == "cosine" else src
    path = os.path.join(engine.collection_dir(coll.id), PQ_CODES_DIR)
    _atomic_index_write(
        pq_encode(enc_src, books, item_id="id", item_emb="embedding",
                  id_type="string"),
        path,
    )
    return path


def _load_pq_codes(
    engine: Engine, coll: Collection, expected_m: int | None = None
) -> DataFrame | None:
    path = os.path.join(engine.collection_dir(coll.id), PQ_CODES_DIR)
    if not _committed_index_dir(path):
        return None
    codes = engine.spark.read.schema("id string, codes array<int>").parquet(path)
    if expected_m is not None:
        # defense-in-depth against codes encoded under different
        # codebooks (build_pq_index also deletes the dir on rebuild):
        # rows whose code length disagrees with the loaded codebooks' m
        # read as ABSENT, so the query path's left_anti union re-encodes
        # them on the fly instead of crashing or ranking garbage.
        codes = codes.filter(F.size("codes") == F.lit(int(expected_m)))
    return codes


def _load_pq_index(engine: Engine, coll: Collection):
    import numpy as np

    path = os.path.join(engine.collection_dir(coll.id), PQ_INDEX_DIR)
    if not _committed_index_dir(path):
        return None
    rows = engine.spark.read.parquet(path).collect()
    m = max(r["m"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    sub = max(r["pos"] for r in rows) + 1
    books = np.zeros((m, k, sub), dtype=np.float64)
    for r in rows:
        books[r["m"], r["code"], r["pos"]] = r["value"]
    return books


IVFPQ_INDEX_DIR = "ivfpq_index"


def _ivfpq_index_committed(cdir: str) -> bool:
    """Both composite-index tables committed, after healing a crashed
    root-level promote (build_ivfpq_index swaps the whole generation in
    one rename, so centroids/codebooks can never mix generations)."""
    root = os.path.join(cdir, IVFPQ_INDEX_DIR)
    _recover_interrupted_overwrite(root)
    return _committed_index_dir(
        os.path.join(root, "centroids")
    ) and _committed_index_dir(os.path.join(root, "codebooks"))


def _ivfpq_residuals(
    unit: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """(id, resid): each unit vector's residual against its assigned
    cell centroid — the PQ training/encoding domain of the composite
    index (operators/pq.py:ivfpq_adc_topk_df does the same subtraction
    inline at search time; training codebooks on the same residual
    distribution is what makes the codes tight)."""
    from chroma_rs_spark.operators.ivf import assign_cells

    spark = unit.sparkSession
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
        "cell INT, cvec ARRAY<DOUBLE>",
    )
    assigned = assign_cells(
        unit.filter(F.col("embedding").isNotNull()), cents
    )
    return assigned.join(F.broadcast(cent_df), "cell").select(
        "id",
        F.expr(
            "zip_with(CAST(embedding AS ARRAY<DOUBLE>), cvec,"
            " (x, y) -> x - y)"
        ).alias("resid"),
    )


def build_ivfpq_index(
    engine: Engine,
    coll: Collection,
    n_centroids: int = 16,
    max_iter: int = 5,
    m: int = 8,
    k: int = 16,
    pq_max_iter: int = 10,
    sample_size: int = 4096,
) -> str:
    """Train and PERSIST the collection's composite IVF-PQ index
    (cosine collections only — the coarse quantizer is the cosine
    assignment): k-means centroids over UNIT-normalized vectors, then
    PQ codebooks over the RESIDUALS against those centroids (Jégou et
    al. TPAMI 2011 — residuals concentrate near the origin, so the
    codebook budget spends its resolution where the data lives).
    Both artifacts are tiny and land under one directory as two
    committed parquet tables; `query(index="ivfpq")` reads them
    instead of training per query. Same non-persistence rule as the
    other indexes: item cells/codes are derived at search time, so
    late-added items stay searchable.

    COMPATIBILITY NOTE (round 12): the coarse quantizer now trains on
    the same deterministic `sample_size` subsample as the PQ codebooks
    (it previously saw the full corpus). For corpora larger than
    `sample_size` a default-argument REBUILD of a pre-round-12 index
    therefore produces different (not worse — see RECALL.md) centroids
    and cell assignments; pass `sample_size` >= the corpus row count
    to reproduce the old full-corpus centroids bit-for-bit."""
    from chroma_rs_spark.operators.ivf import train_centroids_kmeans
    from chroma_rs_spark.operators.pq import train_pq_codebooks

    metric = (coll.metadata or {}).get("hnsw:space", "l2")
    if metric != "cosine":
        raise EngineError(
            f"index='ivfpq' supports cosine collections only; this "
            f"collection's hnsw:space is {metric!r}"
        )
    src = items_df(engine, coll).filter(F.col("embedding").isNotNull())
    unit = _unit_vectors(src).filter(F.col("embedding").isNotNull())
    cents = train_centroids_kmeans(
        unit,
        n_centroids=n_centroids,
        max_iter=max_iter,
        item_id="id",
        item_emb="embedding",
        # coarse quantizer trains on the deterministic sample too —
        # the round-12 scale proof measured full-corpus Lloyd's at
        # 637 s for 409.6k x 64 cells vs ~4 s sampled, and a sampled
        # coarse quantizer is the standard billion-scale build
        sample_size=sample_size,
    )
    # Sample BEFORE the residual computation: train_pq_codebooks takes
    # the sample_size rows with the smallest (md5(id), id), so taking
    # the same rows here first selects the IDENTICAL training set
    # (bit-identical codebooks) while the assign-cells expression — the
    # encode chain's hottest term — runs on sample_size rows instead of
    # the whole corpus (the round-12 scale proof measured the
    # difference at 409.6k rows x 64 cells: ~370 s -> seconds).
    unit_sample = (
        unit.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(int(sample_size))
        .localCheckpoint()
    )
    books = train_pq_codebooks(
        _ivfpq_residuals(unit_sample, cents),
        m=m,
        k=k,
        max_iter=pq_max_iter,
        sample_size=sample_size,
        item_id="id",
        item_emb="resid",
    )
    root = os.path.join(engine.collection_dir(coll.id), IVFPQ_INDEX_DIR)
    cent_rows = [
        (int(lab), int(pos), float(v))
        for lab, vec in cents
        for pos, v in enumerate(vec)
    ]
    book_rows = [
        (mi, ci, pos, float(books[mi, ci, pos]))
        for mi in range(books.shape[0])
        for ci in range(books.shape[1])
        for pos in range(books.shape[2])
    ]
    # a materialized codes table encodes against the PREVIOUS artifact:
    # invalidate BEFORE the new index swaps in (the build_pq_index
    # rationale — same-shape stale codes would silently rank garbage)
    codes_path = os.path.join(engine.collection_dir(coll.id), IVFPQ_CODES_DIR)
    for stale in (codes_path, codes_path + ".__old", codes_path + ".__tmp"):
        shutil.rmtree(stale, ignore_errors=True)
        if os.path.exists(stale):
            raise EngineError(
                f"build_ivfpq_index: could not invalidate stale codes {stale}"
            )
    # Both tables promote in ONE root-level rename. Per-table atomic
    # swaps were only safe on FIRST build (either-absent reads as
    # absent); on a REBUILD both dirs are already committed, so a crash
    # between two independent swaps left a fully-committed
    # mixed-generation index (new codebooks + old centroids) that
    # _load_ivfpq_index would load — silent recall loss. Writing both
    # tables under one temp root with a root _SUCCESS marker and
    # promoting with the same two-rename discipline as _overwrite
    # makes centroids and codebooks a single generation forever.
    _recover_interrupted_overwrite(root, cleanup=True)
    tmp = root + ".__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    engine.spark.createDataFrame(
        book_rows, "m INT, code INT, pos INT, value DOUBLE"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "codebooks")
    )
    engine.spark.createDataFrame(
        cent_rows, "label INT, pos INT, centroid DOUBLE"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "centroids")
    )
    for sub in ("codebooks", "centroids"):
        if not os.path.isfile(os.path.join(tmp, sub, "_SUCCESS")):
            raise EngineError(f"ivfpq index write did not commit: {tmp}/{sub}")
    # root-level commit marker: _recover_interrupted_overwrite judges a
    # parked tmp complete by _SUCCESS at its top level
    with open(os.path.join(tmp, "_SUCCESS"), "w"):
        pass
    old = root + ".__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(root):
        os.replace(root, old)
    try:
        os.replace(tmp, root)
    except FileNotFoundError:
        # Same reader-promotion race as _overwrite: stats() /
        # _load_ivfpq_index run _recover_interrupted_overwrite as
        # readers, and one that observed the live dir missing inside
        # this two-rename window promoted the committed tmp itself.
        # The disk already holds exactly the intended state.
        if not (
            os.path.isdir(root)
            and os.path.isfile(os.path.join(root, "_SUCCESS"))
        ):
            raise
    shutil.rmtree(old, ignore_errors=True)
    return root


IVFPQ_CODES_DIR = "ivfpq_codes"


def materialize_ivfpq_codes(engine: Engine, coll: Collection) -> str:
    """Encode every CURRENT item against the persisted composite index
    and persist the (id, cell, codes) table — the IVF-PQ scan tier
    (SCALE.md: 3.2 TB of codes standing in for 100 TB of raw vectors).
    Same contract as materialize_pq_codes: late-added items are encoded
    on the fly and unioned at query time; updated embeddings only
    degrade their own candidate ranks until the next materialize (the
    exact re-scoring stage always reads current vectors). Requires
    build_ivfpq_index first."""
    from chroma_rs_spark.operators.pq import ivfpq_codes_df

    loaded = _load_ivfpq_index(engine, coll)
    if loaded is None:
        raise EngineError(
            "materialize_ivfpq_codes requires build_ivfpq_index first"
        )
    cents, books = loaded
    src = items_df(engine, coll).filter(F.col("embedding").isNotNull())
    unit = _unit_vectors(src).filter(F.col("embedding").isNotNull())
    path = os.path.join(engine.collection_dir(coll.id), IVFPQ_CODES_DIR)
    # hive-partitioned BY CELL: a query touches n_probe cells, so the
    # probed-cell filter the query path applies prunes to n_probe of
    # n_cells directories at file-listing time — at 100 TB the code
    # scan reads n_probe/k_cells of the 3.2 TB tier before a byte moves
    _atomic_index_write(
        ivfpq_codes_df(unit, books, cents, item_id="id"),
        path,
        partition_by="cell",
    )
    return path


def _load_ivfpq_codes(
    engine: Engine, coll: Collection, expected_m: int | None = None
) -> DataFrame | None:
    path = os.path.join(engine.collection_dir(coll.id), IVFPQ_CODES_DIR)
    if not _committed_index_dir(path):
        return None
    codes = engine.spark.read.schema(
        "id string, cell int, codes array<int>"
    ).parquet(path)
    if expected_m is not None:
        # rows encoded under different codebooks read as ABSENT so the
        # query path re-encodes them on the fly (the _load_pq_codes
        # defense; build_ivfpq_index also deletes the dir on rebuild)
        codes = codes.filter(F.size("codes") == F.lit(int(expected_m)))
    return codes


def _load_ivfpq_index(engine: Engine, coll: Collection):
    """(centroids, codebooks) or None unless BOTH tables committed."""
    import numpy as np

    cdir = engine.collection_dir(coll.id)
    if not _ivfpq_index_committed(cdir):
        return None
    root = os.path.join(cdir, IVFPQ_INDEX_DIR)
    cpath = os.path.join(root, "centroids")
    bpath = os.path.join(root, "codebooks")
    by_label: dict[int, dict[int, float]] = {}
    for r in engine.spark.read.parquet(cpath).collect():
        by_label.setdefault(int(r["label"]), {})[int(r["pos"])] = float(
            r["centroid"]
        )
    cents = [
        (lab, [d[p] for p in sorted(d)]) for lab, d in sorted(by_label.items())
    ]
    rows = engine.spark.read.parquet(bpath).collect()
    m = max(r["m"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    sub = max(r["pos"] for r in rows) + 1
    books = np.zeros((m, k, sub), dtype=np.float64)
    for r in rows:
        books[r["m"], r["code"], r["pos"]] = r["value"]
    return cents, books


def query(
    engine: Engine,
    coll: Collection,
    query_embeddings: Sequence[Sequence[float]] | None = None,
    n_results: int = 10,
    where: dict | None = None,
    where_document: dict | None = None,
    include: Sequence[str] = ("documents", "metadatas", "distances"),
    index: str = "exact",
    n_probe: int = 4,
    oversample: int = 4,
    query_texts: Sequence[str] | None = None,
) -> DataFrame:
    """Batch KNN over the collection under its `hnsw:space` metric.

    `index="exact"` (default) scans every item — exact results under
    l2/ip/cosine. `index="ivf"` (cosine collections only) searches the
    `n_probe` nearest cells of the persisted IVF centroid index
    (`build_ivf_index`), training a transient in-memory index when
    none is persisted (reads never write; call build_ivf_index to
    persist); approximate by design — recall grows with n_probe.
    `index="pq"` ranks an ADC-oversampled candidate pool exactly;
    `index="ivfpq"` (cosine only) generates that pool from residual
    codes in the `n_probe` nearest cells (build_ivfpq_index persists
    the composite artifact) — both re-score exactly, so approximation
    affects recall only. All paths share the filter pushdown (where /
    where_document / partition pruning run before the distance work).

    Returns (query_id, rank, id, distance[, document][, metadata]).

    `query_texts` (Chroma parity): embed the probe strings with the
    collection's registered `embedding_function` — exactly one of
    query_texts / query_embeddings must be given; texts on a
    collection without a registered embedder error loudly.
    """
    if (query_texts is None) == (query_embeddings is None):
        raise EngineError(
            "query: exactly one of query_embeddings / query_texts required"
        )
    if query_texts is not None:
        emb = _collection_embedder(coll)
        if emb is None:
            raise EngineError(
                "query_texts requires the collection metadata to name an "
                "embedding_function (e.g. {'embedding_function': 'hash64'})"
            )
        embed_batch, _dim = emb
        mat = embed_batch(list(query_texts))
        query_embeddings = [[float(x) for x in row] for row in mat]
    metric = (coll.metadata or {}).get("hnsw:space", "l2")
    # probe vectors must match the registered collection dim — a wrong
    # length would otherwise score a silent prefix (unrolled distance)
    # or NULL-out every pair, returning plausible-but-wrong or empty
    # results instead of the loud error add() enforces on the way in
    reg_dim = engine._registry_row(coll.id).get("dim")
    if reg_dim is not None:
        bad = [len(q) for q in query_embeddings if len(q) != int(reg_dim)]
        if bad:
            raise DimensionMismatchError(
                f"query embeddings of dim {sorted(set(bad))} against a "
                f"dim-{reg_dim} collection"
            )
    df = items_df(engine, coll, keep_partition_col=True)
    pred = _predicate(where, where_document, None)
    if pred is not None:
        df = df.filter(pred)
    ppred = _partition_pred(where, _partition_key(engine, coll))
    if ppred is not None:
        df = df.filter(ppred)
    df = df.drop(PARTITION_COL)
    if index == "ivf":
        if metric != "cosine":
            raise EngineError(
                f"index='ivf' supports cosine collections only; this "
                f"collection's hnsw:space is {metric!r}"
            )
        from chroma_rs_spark.operators.ivf import ivf_topk, train_centroids_kmeans

        cents = _load_ivf_index(engine, coll)
        if cents is None:
            # genuinely TRANSIENT: train in memory, do NOT write — a
            # read path must not mutate collection storage (concurrent
            # first queries would race the overwrite, and read-only
            # storage would fail a plain query). Persisting is the
            # caller's explicit build_ivf_index call.
            cents = train_centroids_kmeans(
                items_df(engine, coll).filter(F.col("embedding").isNotNull()),
                item_id="id",
                item_emb="embedding",
                strict=False,
            )
        qlist = [
            (i, [float(x) for x in q]) for i, q in enumerate(query_embeddings)
        ]
        result = ivf_topk(
            df,
            k=n_results,
            n_probe=n_probe,
            item_id="id",
            item_emb="embedding",
            precollected=(cents, qlist),
            item_id_type="string",
        ).select(
            F.col("query_id").cast("int").alias("query_id"),
            "rank",
            F.col("neighbor_id").alias("id"),
            "distance",
        )
    elif index == "pq":
        if metric not in ("l2", "cosine"):
            raise EngineError(
                f"index='pq' supports l2/cosine collections; this "
                f"collection's hnsw:space is {metric!r}"
            )
        import math

        from chroma_rs_spark.operators.pq import (
            pq_adc_topk,
            pq_encode,
            train_pq_codebooks,
        )

        src = df.filter(F.col("embedding").isNotNull())
        enc_src = _unit_vectors(src) if metric == "cosine" else src
        books = _load_pq_index(engine, coll)
        if books is None:
            # transient, like the IVF path: reads never write. Subspace
            # count adapts to the collection dim (largest m ≤ 8 that
            # divides it) — build_pq_index is the place to choose m
            # explicitly.
            dim = len(query_embeddings[0]) if query_embeddings else 1
            m_eff = next(mi for mi in range(min(8, dim), 0, -1) if dim % mi == 0)
            books = train_pq_codebooks(
                enc_src, m=m_eff, item_id="id", item_emb="embedding"
            )
        qlist = []
        for i, q in enumerate(query_embeddings):
            qv = [float(x) for x in q]
            if metric == "cosine":
                n = math.sqrt(sum(x * x for x in qv)) or 1.0
                qv = [x / n for x in qv]
            qlist.append((i, qv))
        # codes: the persisted codes table when materialized
        # (materialize_pq_codes) — late-added items are encoded on the
        # fly and unioned, so a stale codes table degrades nothing but
        # freshness of the candidate ADC distances for new rows; with
        # no codes table every current item is encoded per query.
        codes = _load_pq_codes(engine, coll, expected_m=books.shape[0])
        if codes is None:
            codes = pq_encode(
                enc_src, books, item_id="id", item_emb="embedding",
                id_type="string",
            )
        else:
            # restrict the persisted (full-corpus) codes to the rows the
            # caller's where-filter kept, so the ADC candidate top-k runs
            # over MATCHING docs only — otherwise a selective filter
            # starves the pool (fewer than n_results returned while
            # matching neighbors exist). Mirrors the no-codes path,
            # which only ever encodes the filtered rows. Freshness
            # joins run on BARE id columns (the round-12 ivfpq-path
            # lesson: joining through enc_src forces the interpreted
            # unit-normalize over the whole corpus per query), and the
            # late-id set — bounded by contract to adds since the last
            # materialize — broadcasts so only late rows normalize.
            cur_ids = src.select("id")
            persisted_ids = codes.select("id")
            late_ids = cur_ids.join(persisted_ids, "id", "left_anti")
            codes = codes.join(cur_ids, "id", "left_semi")
            late = enc_src.join(F.broadcast(late_ids), "id", "left_semi")
            codes = codes.unionByName(
                pq_encode(
                    late, books, item_id="id", item_emb="embedding",
                    id_type="string",
                )
            )
        # ADC proposes an oversampled candidate pool; the pool is then
        # re-scored EXACTLY by the same knn_exact plan the exact path
        # runs (collection metric, stored norms, rounded doubles), so
        # returned distances are bit-identical to exact-path distances
        # and approximation affects recall only. Where-filters prune the
        # codes BEFORE candidate selection (semi-join above), so the
        # pool always comes from matching docs.
        cand = pq_adc_topk(
            codes,
            books,
            qlist,
            k=int(n_results) * int(oversample),
            id_type="string",
        )
        pool = cand.select("id").distinct()
        # the pool is bounded driver-side (<= n_queries * n_results *
        # oversample ids) — broadcast it, or the rescore semi-join
        # shuffles the FULL corpus (embeddings included) against a
        # few hundred ids (round-12 scale-proof finding)
        sub = df.join(F.broadcast(pool), "id", "left_semi")
        queries = engine.spark.createDataFrame(
            [(i, [float(x) for x in q]) for i, q in enumerate(query_embeddings)],
            "query_id INT, query_embedding ARRAY<DOUBLE>",
        )
        result = knn_exact(
            sub,
            queries,
            k=n_results,
            metric=metric,
            item_id="id",
            item_emb="embedding",
            item_norm="embedding_norm" if metric == "cosine" else None,
            # dim=None ON PURPOSE (unlike the exact path): the pool is
            # <= n_results*oversample rows, so the interpreted HOF fold
            # costs nothing — while the unrolled form, FUSED with the
            # semi-join candidate chain and the top-k sort into one
            # whole-stage processNext(), blows janino's method limit
            # and silently drops the stage to interpreted anyway
            # (measured: 4 codegen failures per pq/ivfpq query at
            # dim=64). Bit-identical doubles either way (the knn_exact
            # contract).
            dim=None,
        )
    elif index == "ivfpq":
        if metric != "cosine":
            raise EngineError(
                f"index='ivfpq' supports cosine collections only; this "
                f"collection's hnsw:space is {metric!r}"
            )
        import math

        from chroma_rs_spark.operators.ivf import train_centroids_kmeans
        from chroma_rs_spark.operators.pq import (
            ivfpq_adc_topk_df,
            train_pq_codebooks,
        )

        src = df.filter(F.col("embedding").isNotNull())
        unit = _unit_vectors(src).filter(F.col("embedding").isNotNull())
        loaded = _load_ivfpq_index(engine, coll)
        if loaded is None:
            # transient, like the ivf/pq paths: reads never write
            cents = train_centroids_kmeans(
                unit, item_id="id", item_emb="embedding", strict=False
            )
            dim = len(query_embeddings[0]) if query_embeddings else 1
            m_eff = next(
                mi for mi in range(min(8, dim), 0, -1) if dim % mi == 0
            )
            books = train_pq_codebooks(
                _ivfpq_residuals(unit, cents),
                m=m_eff,
                item_id="id",
                item_emb="resid",
            )
        else:
            cents, books = loaded
        qrows = []
        for i, q in enumerate(query_embeddings):
            qv = [float(x) for x in q]
            n = math.sqrt(sum(x * x for x in qv)) or 1.0
            qrows.append((i, [x / n for x in qv]))
        probes = engine.spark.createDataFrame(
            qrows, "query_id INT, query_embedding ARRAY<DOUBLE>"
        )
        # the materialized scan tier when present (materialize_ivfpq_
        # codes): restrict to the caller's filtered rows, encode only
        # late-added items on the fly — the pq-path codes discipline
        codes = None
        if loaded is not None:
            from chroma_rs_spark.operators.pq import (
                ivfpq_codes_df,
                ivfpq_probe_cells,
            )

            persisted = _load_ivfpq_codes(
                engine, coll, expected_m=books.shape[0]
            )
            if persisted is not None:
                # late-add freshness runs on the FULL id column first;
                # the probed-cell prune then narrows the persisted scan
                # to n_probe of n_cells hive directories (the codes
                # table is partitioned BY cell) before any code bytes
                # move. Pruning after the anti-join keeps non-probed
                # items out of the "late" set (they'd be re-encoded for
                # nothing — their cells carry no LUT rows anyway).
                # Round-12 restructure (the 100x scale-proof findings):
                # every freshness join runs on BARE id columns — the
                # old shape anti/semi-joined through `unit`, whose
                # zero-norm CASE forced the interpreted l2_norm HOF
                # over the whole corpus per query batch. The late-id
                # set is bounded by contract (adds since the last
                # materialize), so it broadcasts and the normalize
                # transform runs on late rows only (Spark's
                # PushDownLeftSemiAntiJoin moves the semi below the
                # projection).
                cur_ids = src.select("id")
                late_ids = cur_ids.join(
                    persisted.select("id"), "id", "left_anti"
                )
                late = unit.join(F.broadcast(late_ids), "id", "left_semi")
                probed_cells = [
                    r["cell"]
                    for r in ivfpq_probe_cells(
                        probes, cents, n_probe=n_probe
                    )
                    .select("cell")
                    .distinct()
                    .collect()
                ]
                # the current-ids semi keeps where-filtered / deleted
                # rows out of the candidate pool (pool starvation
                # guard); ids only — codes carry no embeddings
                pruned = persisted.filter(
                    F.col("cell").isin(probed_cells)
                ).join(cur_ids, "id", "left_semi")
                codes = pruned.unionByName(
                    ivfpq_codes_df(late, books, cents, item_id="id")
                )
        # ADC over residual codes proposes an oversampled pool from the
        # probed cells only; the pool is re-scored EXACTLY by the same
        # knn_exact plan the exact path runs (pq-path discipline), so
        # approximation affects recall only, never returned distances.
        cand = ivfpq_adc_topk_df(
            unit,
            books,
            cents,
            n_probe=n_probe,
            k=int(n_results) * int(oversample),
            probes=probes,
            item_id="id",
            item_emb="embedding",
            codes=codes,
        )
        pool = cand.select(F.col("neighbor_id").alias("id")).distinct()
        # bounded pool -> broadcast (same rationale as the pq path)
        sub = df.join(F.broadcast(pool), "id", "left_semi")
        queries = engine.spark.createDataFrame(
            [
                (i, [float(x) for x in q])
                for i, q in enumerate(query_embeddings)
            ],
            "query_id INT, query_embedding ARRAY<DOUBLE>",
        )
        result = knn_exact(
            sub,
            queries,
            k=n_results,
            metric=metric,
            item_id="id",
            item_emb="embedding",
            item_norm="embedding_norm",
            # dim=None on purpose — the pq-path rationale above
            dim=None,
        )
    elif index != "exact":
        raise EngineError(
            f"unknown index {index!r}; use 'exact', 'ivf', 'pq' or 'ivfpq'"
        )
    else:
        queries = engine.spark.createDataFrame(
            [(i, [float(x) for x in q]) for i, q in enumerate(query_embeddings)],
            "query_id INT, query_embedding ARRAY<DOUBLE>",
        )
        result = knn_exact(
            df,
            queries,
            k=n_results,
            metric=metric,
            item_id="id",
            item_emb="embedding",
            # the add-time norm "index" (maintained by update/upsert):
            # one stored norm per item instead of one recompute per
            # (item, query) pair; same doubles, bit-identical results
            item_norm="embedding_norm" if metric == "cosine" else None,
            # the probe vectors' length is the collection dim (enforced
            # against the registry at add time) — unrolled codegen
            # distance instead of the interpreted HOF fold
            dim=len(query_embeddings[0]) if query_embeddings else None,
        )
    out_cols = ["query_id", "rank", "id"]
    if "distances" in include:
        out_cols.append("distance")
    extra = [INCLUDE_COLS[i] for i in include if i in INCLUDE_COLS]
    if extra:
        result = result.join(df.select("id", *extra), "id", "left")
    return result.select(*out_cols, *extra).orderBy("query_id", "rank")


def query_diverse(
    engine: Engine,
    coll: Collection,
    query_embeddings: Sequence[Sequence[float]],
    n_results: int = 10,
    lam: float = 0.7,
    pool: int | None = None,
    where: dict | None = None,
    where_document: dict | None = None,
    include: Sequence[str] = ("documents", "metadatas", "distances"),
) -> DataFrame:
    """Diversified KNN on the collection surface — Maximal-Marginal-
    Relevance re-ranking (operators/similarity.py:mmr_topk) over an
    exact candidate pool, so near-duplicate stored items stop crowding
    the result list. `lam` trades relevance against diversity (1.0
    degenerates to plain query(index="exact")); `pool` defaults to
    4 * n_results candidates, clamped to mmr_topk's MMR_MAX_POOL so a
    large n_results degrades to a shallower (still >= n_results)
    candidate pool instead of raising — an EXPLICIT over-cap pool
    still raises, since that caller asked for a collect bound the
    greedy stage cannot honor. Cosine collections only (the MMR
    pairwise term is the engine's round-6 cosine). Filters push down
    exactly like query(): where / where_document / partition pruning
    run before any distance work.

    Returns (query_id, rank, id, distance, mmr_score[, document]
    [, metadata])."""
    metric = (coll.metadata or {}).get("hnsw:space", "l2")
    if metric != "cosine":
        raise EngineError(
            f"query_diverse supports cosine collections only; this "
            f"collection's hnsw:space is {metric!r}"
        )
    if not query_embeddings:
        raise EngineError("query_diverse: query_embeddings required")
    from chroma_rs_spark.operators.similarity import MMR_MAX_POOL, mmr_topk

    if int(n_results) > MMR_MAX_POOL:
        raise EngineError(
            f"query_diverse: n_results must be <= {MMR_MAX_POOL} (the "
            f"MMR greedy stage is bounded by MMR_MAX_POOL candidates)"
        )

    df = items_df(engine, coll, keep_partition_col=True)
    pred = _predicate(where, where_document, None)
    if pred is not None:
        df = df.filter(pred)
    ppred = _partition_pred(where, _partition_key(engine, coll))
    if ppred is not None:
        df = df.filter(ppred)
    df = df.drop(PARTITION_COL)
    probes = engine.spark.createDataFrame(
        [(i, [float(x) for x in q]) for i, q in enumerate(query_embeddings)],
        "query_id INT, query_embedding ARRAY<DOUBLE>",
    )
    result = mmr_topk(
        df,
        probes,
        k=int(n_results),
        pool=(
            int(pool)
            if pool is not None
            else min(4 * int(n_results), MMR_MAX_POOL)
        ),
        lam=lam,
        item_id="id",
        item_emb="embedding",
    )
    out_cols = ["query_id", "rank", "id"]
    if "distances" in include:
        out_cols += ["distance", "mmr_score"]
    extra = [INCLUDE_COLS[i] for i in include if i in INCLUDE_COLS]
    if extra:
        result = result.join(df.select("id", *extra), "id", "left")
    return result.select(*out_cols, *extra).orderBy("query_id", "rank")


def find_duplicates(
    engine: Engine,
    coll: Collection,
    method: str = "exact",
    threshold: float = 0.7,
) -> DataFrame:
    """Duplicate detection ON THE COLLECTION SURFACE — the bridge from
    the reference's vector-DB API to the pipeline dedup operators, so
    a collection user never hand-wires `items_df` into them. Every
    item keeps its row in every method (NULL documents / embeddings
    are unscorable, never duplicates — keep=True with NULL evidence):

    * ``"exact"``     — byte-identical documents; returns (id,
      text_sha, n_copies, keep), keep = min-id representative
      (`exact_dedup`); NULL-document items get NULL sha/copies.
    * ``"minhash"``   — near-duplicate TEXT via the banded MinHash
      pair list at `threshold` est_jaccard; returns (id, keep).
    * ``"simhash"``   — near-duplicate TEXT via banded-Hamming SimHash
      fingerprints (hamming ≤ 3 of 32 bits, complete by pigeonhole);
      returns (id, keep). `threshold` is unused by this method.
    * ``"embedding"`` — near-duplicate VECTORS via the banded cosine
      miner at `threshold` (`cosine_pairs_bucketed`, the no-collect
      path — string ids are fine here); returns (id, keep).

    For the pair-based methods, keep = "no above-threshold partner
    with a smaller id" — the deterministic greedy keeper. On clique-
    shaped duplicate groups (near-identical copies, the overwhelmingly
    common case) this equals the connected-component keeper; on chain-
    shaped groups it keeps more than one representative, which is the
    conservative direction for data retention. Collection ids are
    STRINGS, so ordering is lexicographic — the documented pagination
    contract — and the integral-id CC machinery (`dedup_clusters`)
    stays available for numeric-id corpora via the operators module.
    """
    df = items_df(engine, coll)
    if method == "exact":
        from chroma_rs_spark.operators.dedup import exact_dedup

        # exact_dedup inner-joins on sha2(document): a NULL document
        # (embedding-only item — catalog fills documents=[None]) would
        # silently vanish; left-join its row back as unscorable
        scored = exact_dedup(
            df.filter(F.col("document").isNotNull()).select("id", "document"),
            id_col="id",
            text_col="document",
        )
        return (
            df.select("id")
            .join(scored, "id", "left")
            .select(
                "id",
                "text_sha",
                "n_copies",
                F.coalesce("keep", F.lit(True)).alias("keep"),
            )
        )
    if method == "minhash":
        from chroma_rs_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            df.select("id", "document"), id_col="id", text_col="document"
        ).filter(F.col("est_jaccard") >= F.lit(float(threshold)))
    elif method == "embedding":
        from chroma_rs_spark.operators.similarity import cosine_pairs_bucketed

        pairs = cosine_pairs_bucketed(
            df.select(F.col("id"), F.col("embedding")),
            threshold=threshold,
            id_col="id",
            emb_col="embedding",
        ).select("id_a", "id_b")
    elif method == "simhash":
        from chroma_rs_spark.operators.dedup import simhash_near_pairs

        pairs = simhash_near_pairs(
            df.filter(F.col("document").isNotNull()).select(
                "id", "document"
            ),
            id_col="id",
            text_col="document",
        ).select("id_a", "id_b")
    else:
        raise ValueError(
            f"find_duplicates: unknown method {method!r} "
            "(expected 'exact', 'minhash', 'simhash', or 'embedding')"
        )
    # greedy keeper: a row is a duplicate iff some above-threshold
    # partner has a smaller id (id_a < id_b by construction, so id_b
    # is always the loser of its pair)
    losers = pairs.select(F.col("id_b").alias("id")).distinct()
    return (
        df.select("id")
        .join(losers.withColumn("_lose", F.lit(True)), "id", "left")
        .select(
            "id", F.coalesce(~F.col("_lose"), F.lit(True)).alias("keep")
        )
    )


def find_duplicates_against(
    engine: Engine,
    coll: Collection,
    other: Collection,
    method: str = "exact",
    threshold: float = 0.7,
) -> DataFrame:
    """Cross-collection duplicate detection: for every item of `coll`,
    is it a (near-)duplicate of ANYTHING in `other`? The API form of
    the daily-crawl question the streaming ingest answers per batch
    (stream_dedup_ingest's "corpus wins" rule): `other` is the
    accumulated reference corpus, `coll` the new snapshot, and an item
    matching the reference is marked keep=False. coll-internal
    duplicates are deliberately NOT considered — run find_duplicates
    for those; composing both verdicts is the full ingest policy.

    Methods mirror find_duplicates: "exact" (byte-identical documents;
    returns id, text_sha, keep), "minhash" (banded near-dup text at
    `threshold` est_jaccard), "embedding" (banded cosine at
    `threshold`); the pair methods return (id, keep). Unscorable items
    (NULL document / embedding) keep their rows with keep=True.

    Scale shape: exact is one semi-join on sha2 (map-side hashes,
    shuffle carries distinct hashes only); minhash mines through
    `incremental_minhash_pairs` against `other`'s band index — the
    persisted-index form, so only same-bucket pairs involving the NEW
    side are ever generated and the reference corpus is never
    re-paired against itself; embedding unions the two collections
    through the no-collect banded cosine miner (reference-vs-reference
    candidates are generated and discarded — acceptable while the
    miner is self-join-shaped; the minhash path's index form is the
    one to mirror if this ever dominates). The two collections
    may share id strings — ids are namespace-prefixed (n:/o:) before
    any pair generation, so cross pairs are unambiguous.
    """
    df = items_df(engine, coll)
    ref = items_df(engine, other)
    if method == "exact":
        scored = df.filter(F.col("document").isNotNull()).select(
            "id", F.sha2(F.col("document"), 256).alias("text_sha")
        )
        ref_sha = (
            ref.filter(F.col("document").isNotNull())
            .select(F.sha2(F.col("document"), 256).alias("text_sha"))
            .distinct()
        )
        hit = scored.join(ref_sha, "text_sha", "left_semi").select(
            "id", F.lit(False).alias("_keep")
        )
        return (
            df.select("id")
            .join(scored, "id", "left")
            .join(hit, "id", "left")
            .select(
                "id",
                "text_sha",
                F.coalesce("_keep", F.lit(True)).alias("keep"),
            )
        )
    if method == "minhash":
        from chroma_rs_spark.operators.dedup import (
            incremental_minhash_pairs,
            minhash_band_index,
        )

        new_docs = df.filter(F.col("document").isNotNull()).select(
            F.concat(F.lit("n:"), F.col("id")).alias("id"), "document"
        )
        idx = minhash_band_index(
            ref.filter(F.col("document").isNotNull()).select(
                F.concat(F.lit("o:"), F.col("id")).alias("id"), "document"
            ),
            id_col="id",
            text_col="document",
        )
        pairs = incremental_minhash_pairs(
            new_docs, idx, id_col="id", text_col="document"
        ).filter(
            F.col("vs_corpus")
            & (F.col("est_jaccard") >= F.lit(float(threshold)))
        )
    elif method == "embedding":
        from chroma_rs_spark.operators.similarity import cosine_pairs_bucketed

        tagged = (
            df.filter(F.col("embedding").isNotNull())
            .select(
                F.concat(F.lit("n:"), F.col("id")).alias("id"), "embedding"
            )
            .unionByName(
                ref.filter(F.col("embedding").isNotNull()).select(
                    F.concat(F.lit("o:"), F.col("id")).alias("id"),
                    "embedding",
                )
            )
        )
        pairs = cosine_pairs_bucketed(
            tagged, threshold=threshold, id_col="id", emb_col="embedding"
        ).select("id_a", "id_b")
    elif method == "simhash":
        from chroma_rs_spark.operators.dedup import simhash_near_pairs

        tagged = (
            df.filter(F.col("document").isNotNull())
            .select(
                F.concat(F.lit("n:"), F.col("id")).alias("id"), "document"
            )
            .unionByName(
                ref.filter(F.col("document").isNotNull()).select(
                    F.concat(F.lit("o:"), F.col("id")).alias("id"),
                    "document",
                )
            )
        )
        pairs = simhash_near_pairs(
            tagged, id_col="id", text_col="document"
        ).select("id_a", "id_b")
    else:
        raise ValueError(
            f"find_duplicates_against: unknown method {method!r} "
            "(expected 'exact', 'minhash', 'simhash', or 'embedding')"
        )
    # cross pairs only — EXACTLY one n:-side member (an n:-vs-n: pair
    # is a coll-internal duplicate, explicitly out of scope here); the
    # n: member's unprefixed id is the loser ("corpus wins" — the
    # reference side never loses)
    a_new = F.col("id_a").startswith("n:")
    b_new = F.col("id_b").startswith("n:")
    losers = (
        pairs.filter(a_new != b_new)
        .select(F.when(a_new, F.col("id_a")).otherwise(F.col("id_b")).alias("_p"))
        .select(F.expr("substring(_p, 3)").alias("id"))
        .distinct()
        .withColumn("_lose", F.lit(True))
    )
    return (
        df.select("id")
        .join(losers, "id", "left")
        .select("id", F.coalesce(~F.col("_lose"), F.lit(True)).alias("keep"))
    )
