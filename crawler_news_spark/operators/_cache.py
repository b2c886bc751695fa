"""Session-scoped persist hygiene for composite operators.

Near-dup pipelines persist skinny intermediates (signature tables, exploded
fingerprints) that must stay cached until the *caller's* action runs — the
operator cannot unpersist before returning its lazy DataFrame.  Without any
bookkeeping, repeated invocations in one session accumulate executor storage
until LRU eviction (ADVICE r02).

:func:`claim` gives each operator a named cache slot: persisting a new
DataFrame under a tag first unpersists whatever the previous invocation left
there, so steady-state storage is one generation per operator, not one per
call.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# slots are keyed by (session, tag) so two SparkSessions sharing the module
# never release each other's generations, and guarded by a lock for
# concurrent jobs (ADVICE r03).  Contract unchanged within one session:
# an operator's result must be actioned before the SAME operator is invoked
# again on that session, else the earlier lazy result loses its cache.
_live: dict[tuple[int, str], list[DataFrame]] = {}
_lock = threading.Lock()


def _key(tag: str, df: DataFrame) -> tuple[int, str]:
    return (id(df.sparkSession), tag)


def claim(tag: str, *dfs: DataFrame) -> tuple[DataFrame, ...]:
    """Persist ``dfs`` under ``tag``, releasing the tag's previous generation
    for the same SparkSession."""
    with _lock:
        old_gen = _live.pop(_key(tag, dfs[0]), [])
        _live[_key(tag, dfs[0])] = [df.persist() for df in dfs]
    for old in old_gen:
        try:
            old.unpersist()
        except Exception:
            pass  # session of the old generation may already be gone
    return dfs if len(dfs) > 1 else dfs[0]


def release(tag: str, session_id: int | None = None) -> None:
    """Release ``tag``'s slots — all sessions' when ``session_id`` is None."""
    with _lock:
        keys = [k for k in _live if k[1] == tag and session_id in (None, k[0])]
        gens = [df for k in keys for df in _live.pop(k)]
    for old in gens:
        try:
            old.unpersist()
        except Exception:
            pass


def release_all() -> None:
    with _lock:
        gens = [df for v in _live.values() for df in v]
        _live.clear()
    for old in gens:
        try:
            old.unpersist()
        except Exception:
            pass
