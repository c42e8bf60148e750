"""Scoped cache tracking for engine-owned persisted intermediates.

Several pipelines persist shared intermediates for diamond reuse (minhash
shingle tables, the star schema's staging table). In a long single-session
run — e.g. the correctness gate executing the whole registry back-to-back —
stale blocks from a prior query measurably degrade later ones, so each
registry entry must start cache-clean.

``spark.catalog.clearCache()`` is the wrong tool for that: it nukes EVERY
cached relation in the session, including caches a host application
created for its own reasons. Instead, engine code persists through
:func:`tracked_persist`, and the registry wrapper calls
:func:`release_tracked` — unpersisting exactly the blocks this engine
created and nothing else. A host session's unrelated caches survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for scoped release.

    Drop-in for ``df.persist(level)`` in any engine code whose cached
    blocks should not outlive the current registry entry.
    """
    persisted = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(persisted)
    return persisted


def release_tracked() -> None:
    """Unpersist every engine-tracked DataFrame (best-effort, idempotent).

    Called by the registry's ``@query`` wrapper before each entry runs, so
    one entry's persisted intermediates never skew the next entry's
    memory budget — without touching host-session caches the engine does
    not own.
    """
    tracked, _TRACKED[:] = _TRACKED[:], []
    for df in tracked:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped / block already evicted
