"""Multi-sink fan-out (reference D1: ``datacrawler.py:244-339``).

The reference dispatches every fetched page to each enabled sink's
worker queue.  Spark-first: materialize the transformed frame once
(``persist``) and run N independent writes against it — each write is
a full job over cached partitions, so the source is scanned exactly
once regardless of sink count (the reference's whole page-caching
apparatus collapses into one ``persist()``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def fan_out(
    df: DataFrame,
    sinks: dict[str, Callable[[DataFrame], None]],
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> dict[str, Exception | None]:
    """Write ``df`` to every sink; returns per-sink error (None = ok).

    A failing sink does not block the others — matching the reference's
    independent sink workers (worker.py:46-78 lifecycle isolation).
    """
    if len(sinks) > 1:
        df = df.persist(storage_level)
    results: dict[str, Exception | None] = {}
    try:
        for name, write in sinks.items():
            try:
                write(df)
                results[name] = None
            except Exception as exc:  # noqa: BLE001 - sink isolation
                results[name] = exc
    finally:
        if len(sinks) > 1:
            df.unpersist()
    return results
