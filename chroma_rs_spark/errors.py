"""Exception hierarchy.

Mirrors the reference error taxonomy (`ChromaClientError`,
reference src/error.rs:3-17 — UrlParse/Request/Response/ResponseParse/
ResponseStatus/Preflight) re-shaped for an in-process engine: network
variants collapse away and collection/filter/dimension errors become
first-class (SURVEY.md §2.1 R13).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class PreflightError(EngineError):
    """Engine invariants not satisfied (warehouse missing/unreadable).

    Analogue of the reference's fail-fast pre-flight check
    (reference src/client.rs:37-52).
    """


class CollectionExistsError(EngineError):
    """create_collection on a name that already exists (client.rs:94-133)."""


class CollectionNotFoundError(EngineError):
    """get/delete/modify on a missing collection (client.rs:136-157)."""


class InvalidFilterError(EngineError):
    """Malformed `where` / `where_document` dict (SURVEY.md §2.2 A13-A14)."""


class DimensionMismatchError(EngineError):
    """Embedding dimensionality differs from the collection's fixed dim."""


class DuplicateIDError(EngineError):
    """`add` with ids that already exist in the collection (A1)."""


class ResetDisabledError(EngineError):
    """reset() called without allow_reset=True (client.rs:261-282)."""


class IDNotFoundError(EngineError):
    """`update` with ids that don't exist in the collection (A3) —
    a silent no-op patch would otherwise be indistinguishable from a
    successful one."""
