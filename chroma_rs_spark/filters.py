"""`where` / `where_document` filter-DSL compiler (SURVEY.md §2.2 A13-A14).

Compiles the Chroma filter dicts into `pyspark.sql.Column` predicate
trees. Because the output is a plain Column expression, Catalyst can
push the predicate into the Parquet scan (PushedFilters) — the filter
DSL costs nothing extra at 100 TB.

Grammar (public Chroma API surface):

    where := {field: value}                       # implicit $eq
           | {field: {op: value}}                 # op in $eq $ne $gt $gte $lt $lte $in $nin
           | {"$and": [where, ...]} | {"$or": [where, ...]}

    where_document := {"$contains": str} | {"$not_contains": str}
                    | {"$and": [...]} | {"$or": [...]}

Metadata lives in a MAP<STRING,STRING> column, so comparison values
drive casts: numeric comparands cast the map value to DOUBLE, booleans
compare against 'true'/'false' strings (hard-part (b), SURVEY.md §7).
A custom `resolver` lets the same DSL run against real typed columns
(the driver tables) instead of a metadata map.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from chroma_rs_spark.errors import InvalidFilterError

_COMPARISON_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin"}
_LOGICAL_OPS = {"$and", "$or"}

Resolver = Callable[[str, object], Column]


def metadata_resolver(metadata_col: str = "metadata") -> Resolver:
    """Resolve a field to `metadata[field]`, cast per comparand type."""

    def resolve(field: str, comparand: object) -> Column:
        raw = F.col(metadata_col)[field]
        sample = comparand[0] if isinstance(comparand, (list, tuple)) and comparand else comparand
        if isinstance(sample, bool):
            return raw  # compare against 'true'/'false' strings
        if isinstance(sample, (int, float)):
            return raw.cast("double")
        # dict (or nested-list) comparands compare against the stored
        # canonical JSON text — no cast
        return raw

    return resolve


def column_resolver(field: str, comparand: object) -> Column:
    """Resolve a field to a real typed column (driver tables)."""
    return F.col(field)


def canonical_json(value: object) -> str:
    """THE canonical JSON text for nested metadata values — the single
    encoding both the storage path (collection._meta_str) and the
    filter comparand path (_coerce below) must produce, byte for byte,
    or nested-equality filters silently stop matching stored values.
    Sorted keys, compact separators, default ensure_ascii."""
    import json

    return json.dumps(value, sort_keys=True, separators=(",", ":"))


def _coerce(value: object) -> object:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (dict, list)):
        # nested comparands meet the stored canonical JSON encoding
        # as exact string equality
        return canonical_json(value)
    return value


def _compile_comparison(field: str, op: str, value: object, resolver: Resolver) -> Column:
    col = resolver(field, value)
    if op in ("$in", "$nin"):
        if not isinstance(value, (list, tuple)) or not value:
            raise InvalidFilterError(f"{op} requires a non-empty list, got {value!r}")
        vals = [_coerce(v) for v in value]
        return col.isin(vals) if op == "$in" else ~col.isin(vals)
    value = _coerce(value)
    if op == "$eq":
        return col == value
    if op == "$ne":
        return col != value
    if op == "$gt":
        return col > value
    if op == "$gte":
        return col >= value
    if op == "$lt":
        return col < value
    if op == "$lte":
        return col <= value
    raise InvalidFilterError(f"unknown operator {op!r}")


def compile_where(where: dict, resolver: Resolver | None = None) -> Column:
    """Compile a `where` dict to a Column predicate."""
    if resolver is None:
        resolver = metadata_resolver()
    if not isinstance(where, dict) or not where:
        raise InvalidFilterError(f"where must be a non-empty dict, got {where!r}")
    preds: list[Column] = []
    for key, value in where.items():
        if key in _LOGICAL_OPS:
            if not isinstance(value, list) or not value:
                raise InvalidFilterError(f"{key} requires a non-empty list")
            subs = [compile_where(sub, resolver) for sub in value]
            combined = subs[0]
            for sub in subs[1:]:
                combined = (combined & sub) if key == "$and" else (combined | sub)
            preds.append(combined)
        elif key.startswith("$"):
            raise InvalidFilterError(f"unknown operator {key!r}")
        elif isinstance(value, dict):
            if len(value) != 1:
                raise InvalidFilterError(
                    f"field expression must have exactly one operator, got {value!r}"
                )
            ((op, operand),) = value.items()
            if op not in _COMPARISON_OPS:
                raise InvalidFilterError(f"unknown operator {op!r}")
            preds.append(_compile_comparison(key, op, operand, resolver))
        else:
            preds.append(_compile_comparison(key, "$eq", value, resolver))
    combined = preds[0]
    for p in preds[1:]:
        combined = combined & p
    return combined


def compile_where_document(where_document: dict, document_col: str = "document") -> Column:
    """Compile a `where_document` dict to a Column predicate."""
    if not isinstance(where_document, dict) or not where_document:
        raise InvalidFilterError(
            f"where_document must be a non-empty dict, got {where_document!r}"
        )
    preds: list[Column] = []
    for key, value in where_document.items():
        if key in _LOGICAL_OPS:
            if not isinstance(value, list) or not value:
                raise InvalidFilterError(f"{key} requires a non-empty list")
            subs = [compile_where_document(sub, document_col) for sub in value]
            combined = subs[0]
            for sub in subs[1:]:
                combined = (combined & sub) if key == "$and" else (combined | sub)
            preds.append(combined)
        elif key == "$contains":
            preds.append(F.col(document_col).contains(value))
        elif key == "$not_contains":
            preds.append(~F.col(document_col).contains(value))
        else:
            raise InvalidFilterError(f"unknown where_document operator {key!r}")
    combined = preds[0]
    for p in preds[1:]:
        combined = combined & p
    return combined
