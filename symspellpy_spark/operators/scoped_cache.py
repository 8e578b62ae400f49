"""Generation-scoped persist: flat storage for repeated operator calls.

Operators like ``lookup_batch`` / ``lookup_compound_batch`` persist an
intermediate relation that feeds several joins of ONE logical result
(a diamond). A bare ``persist()`` leaks: the CacheManager holds the
relation until explicit unpersist, so a long-lived driver accretes one
cached relation per call. ``localCheckpoint()`` is no better here — its
blocks are only context-cleaned on JVM GC of the RDD, which in practice
never fires for these plans (measured: entries survive repeated
``System.gc()``), and an unpersisted checkpoint cannot recompute.

``persist_scoped`` keeps the last ``keep`` generations per (session,
scope) and unpersists older ones (non-blocking). Unpersisting a
persisted-but-still-referenced DataFrame is SAFE: it silently falls
back to lineage recomputation, so a caller that held an old result and
materializes it late gets correct (just uncached) results. Storage
therefore stays O(keep), not O(calls).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

__all__ = ["persist_scoped", "release_scope", "release_all"]

_LIVE: dict[tuple[int, str], deque[DataFrame]] = {}


def persist_scoped(df: DataFrame, scope: str, keep: int = 2) -> DataFrame:
    """Persist ``df``; unpersist generations older than ``keep`` calls
    in the same (session, scope)."""
    key = (id(df.sparkSession), scope)
    out = df.persist()
    q = _LIVE.setdefault(key, deque())
    q.append(out)
    while len(q) > keep:
        old = q.popleft()
        try:
            old.unpersist(False)
        except Exception:
            pass  # session already stopped
    return out


def release_scope(scope: str) -> None:
    """Unpersist every generation of ``scope`` across sessions."""
    for key in [k for k in _LIVE if k[1] == scope]:
        q = _LIVE.pop(key)
        for df in q:
            try:
                df.unpersist(False)
            except Exception:
                pass


def release_all() -> None:
    for scope in {k[1] for k in list(_LIVE)}:
        release_scope(scope)
