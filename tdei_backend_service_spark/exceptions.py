"""Typed user-facing error taxonomy + Spark error classification.

Reference: Postgres SQLSTATE codes are mapped to typed exceptions with
user-readable messages, scrubbing internal ``source.``/``target.``
prefixes (/root/reference/src/service/base/osw-backend-abstract.ts:242-263;
/root/reference/src/database/data-source.ts:51-76; exception types
/root/reference/src/exceptions/db/database-exceptions.ts:1-37).

Here the engine's analogues are Catalyst AnalysisExceptions and UDF
errors; ``classify_spark_error`` maps them onto the same categories so
callers (and the job response message) see stable, friendly text.
"""

from __future__ import annotations

import re

from .core.compiler import InputException

__all__ = ["InputException", "UndefinedColumnError", "QuerySyntaxError",
           "AmbiguousColumnError", "EngineError", "classify_spark_error"]


class UndefinedColumnError(ValueError):
    """42703 undefined_column equivalent (database-exceptions.ts)."""


class QuerySyntaxError(ValueError):
    """42601 syntax_error equivalent."""


class AmbiguousColumnError(ValueError):
    """42702 ambiguous_column equivalent."""


class EngineError(RuntimeError):
    """Everything else (the reference's generic DatabaseError)."""


def _scrub(msg: str) -> str:
    """Remove internal prefixes/backticks from user-visible messages —
    the reference strips 'source.'/'target.' the same way
    (osw-backend-abstract.ts:252-257)."""
    msg = re.sub(r"\b(source|target|t|s)_", "", msg)
    return msg.replace("`", "'")


def classify_spark_error(exc: Exception) -> Exception:
    """Map a Spark exception to the typed taxonomy. Returns (not raises)
    the translated exception so callers control the raise site."""
    name = type(exc).__name__
    text = str(exc)
    if isinstance(exc, (InputException, UndefinedColumnError,
                        QuerySyntaxError, AmbiguousColumnError)):
        return exc
    if name == "AnalysisException" or "[UNRESOLVED_COLUMN" in text:
        if "UNRESOLVED_COLUMN" in text or "cannot be resolved" in text:
            m = re.search(r"name `([^`]+)`", text)
            col = m.group(1) if m else "unknown"
            return UndefinedColumnError(_scrub(f"column '{col}' does not exist"))
        if "AMBIGUOUS" in text:
            return AmbiguousColumnError(_scrub(text.splitlines()[0]))
        if "PARSE_SYNTAX_ERROR" in text or "ParseException" in name:
            return QuerySyntaxError(_scrub(text.splitlines()[0]))
        return EngineError(_scrub(text.splitlines()[0]))
    if name == "ParseException":
        return QuerySyntaxError(_scrub(text.splitlines()[0]))
    return EngineError(_scrub(text.splitlines()[0] if text else name))
