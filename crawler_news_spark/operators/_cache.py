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

from pyspark.sql import DataFrame

_live: dict[str, list[DataFrame]] = {}


def claim(tag: str, *dfs: DataFrame) -> tuple[DataFrame, ...]:
    """Persist ``dfs`` under ``tag``, releasing the tag's previous generation."""
    for old in _live.pop(tag, []):
        try:
            old.unpersist()
        except Exception:
            pass  # session of the old generation may already be gone
    _live[tag] = [df.persist() for df in dfs]
    return dfs if len(dfs) > 1 else dfs[0]


def release(tag: str) -> None:
    for old in _live.pop(tag, []):
        try:
            old.unpersist()
        except Exception:
            pass


def release_all() -> None:
    for tag in list(_live):
        release(tag)
