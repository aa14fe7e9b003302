"""Session-scoped memo registry: discover and evict the package's
per-``SparkSession`` caches.

Many operators memoize derived state per session — persisted
DataFrames (`graph._PR_EDGES_CACHE`, `dedup._SIGS_STATE`), persisted
index directories (`ivf._MERGED_IVF_INDEX_DIR`), small driver-side
lists (`refshape._REF_QVEC_CACHE`). The memo dicts key on the
``SparkSession`` object (alone or as the first tuple element), which
is the right lifetime for the repo's bench/test sessions but means a
long-lived multi-corpus session pins every cached relation in executor
memory forever, and entries for stopped sessions are never released
(ADVICE r8, graph.py:531).

A ``WeakKeyDictionary`` would NOT fix this: the cached DataFrames hold
a strong reference back to their session, so value → key keeps the
weak key alive — the classic WeakKeyDictionary cycle. The honest fix
is an explicit eviction hook, which this module provides without
touching the 40+ memo sites: caches are DISCOVERED by the package's
own naming convention (module-level ``dict`` named ``_*CACHE`` /
``_*STATE`` / ``_*MEMO`` / ``_*DIR`` in an imported package module).

Usage::

    from gpu_accelerated_vector_indexing_spark.memo import clear_session_caches
    clear_session_caches(spark)                  # one session's state
    clear_session_caches(all_sessions=True)      # every STOPPED session

OWNERSHIP CONTRACT (ADVICE r9): a ``_*DIR`` memo entry must be the
EXCLUSIVE owner of the directory path it holds — eviction rmtrees it.
Every such entry in this package holds a ``tempfile.mkdtemp`` created
by (and only reachable through) that memo; do not store shared or
caller-owned paths in a convention-named memo dict. The all-sessions
form is explicit-opt-in and skips sessions that are still running (a
live session may be mid-query over its memoized relations and temp
layouts); purge a live session by passing it directly.
"""

from __future__ import annotations

import re
import sys
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_PACKAGE = __name__.rsplit(".", 1)[0]
_MEMO_NAME = re.compile(r"^_[A-Z0-9_]*(CACHE|STATE|MEMO|DIR)$")


def _memo_dicts() -> list[dict]:
    """Every module-level memo dict in already-imported package modules.

    Only IMPORTED modules are scanned — a cache that was never imported
    cannot hold entries, so there is nothing to miss.
    """
    out: list[dict] = []
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith(_PACKAGE):
            continue
        for attr, val in list(vars(mod).items()):
            if _MEMO_NAME.match(attr) and isinstance(val, dict):
                out.append(val)
    return out


# Every persisted-state directory this package creates is a
# tempfile.mkdtemp with this prefix — the marker that makes it safe for
# eviction to reclaim the disk (a _*DIR memo entry is the ONLY handle
# to its directory; popping it without deleting would leak one full
# index copy per build/clear cycle).
_TEMP_DIR_PREFIX = "gpu_accelerated_vector_indexing_"


def _unpersist(value: Any) -> None:
    """Release storage held by a memo VALUE: DataFrames (or tuples/
    lists of them) unpersist; package-prefixed temp-dir path strings
    (persisted index/state layouts) are deleted from disk. Other
    values (float lists, ints) need no release."""
    import os
    import shutil

    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        if isinstance(item, DataFrame):
            try:
                item.unpersist()
            except Exception:
                # session already stopped — JVM-side storage is gone
                pass
        elif (
            isinstance(item, str)
            and os.path.basename(item).startswith(_TEMP_DIR_PREFIX)
            and os.path.isdir(item)
        ):
            shutil.rmtree(item, ignore_errors=True)


def _key_session(key: Any) -> Any:
    """The session a memo key belongs to (keys are either the session
    itself or a tuple whose first element is the session)."""
    if isinstance(key, tuple) and key:
        return key[0]
    return key


def _is_stopped(session: Any) -> bool:
    """True when a session is provably stopped — its executor storage
    is already released and its temp layouts can have no in-flight
    readers. Classic sessions expose the JVM context (None after
    ``spark.stop()``); Spark Connect sessions expose a client-closed
    flag. An UNRECOGNIZED session type is assumed LIVE (the sweep must
    never yank state out from under a session it can't classify —
    purge those explicitly)."""
    try:
        return session.sparkContext._jsc is None  # classic
    except Exception:
        pass
    try:
        return bool(session.client.is_closed)  # Spark Connect
    except Exception:
        return False


def clear_session_caches(
    spark: SparkSession | None = None, *, all_sessions: bool = False
) -> int:
    """Evict (and unpersist) every memoized entry belonging to
    ``spark``. Returns the number of entries evicted.

    Call this between corpora in a long-lived session, or after
    ``spark.stop()`` to drop the now-dead driver-side references.

    The sweep form (``all_sessions=True``, ADVICE r9: explicit opt-in,
    not a default-argument accident) evicts entries of STOPPED sessions
    only — a live session may be mid-query over its memoized relations
    and temp directories, so bulk cleanup never deletes state out from
    under one; pass each live session explicitly to purge it.
    """
    if spark is None and not all_sessions:
        raise ValueError(
            "pass the SparkSession to evict, or all_sessions=True to sweep "
            "every stopped session's state (deletes their temp index layouts)"
        )
    evicted = 0
    for cache in _memo_dicts():
        for key in list(cache.keys()):
            sess = _key_session(key)
            if spark is not None:
                if sess is not spark:
                    continue
            elif (
                # duck-typed: classic AND Connect sessions (different
                # classes) both expose read/sql; non-session keys fall
                # through and stay evictable as before
                hasattr(sess, "read")
                and hasattr(sess, "sql")
                and not _is_stopped(sess)
            ):
                continue
            _unpersist(cache.pop(key))
            evicted += 1
    return evicted
