"""JSON file sink (reference K4: ``jsonworker.py``).

The reference writes one local file with configurable open-mode, a
header/footer pair, and comma separators — i.e. a JSON *array* file —
or plain JSON-objects-per-line.  Spark-first: the default is JSONL via
``df.write.json`` (scales to any size, one file per partition);
``array_format=True`` reproduces the reference's exact array layout for
small exports via ``toLocalIterator`` (documented as driver-bound,
jsonworker.py:18-25,33-44).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Bulk JSONL write — the scale path (one file per partition)."""
    df.write.mode(mode).json(path)


def write_json_array_file(
    df: DataFrame,
    path: str,
    header: str = "[",
    footer: str = "]",
    separator: str = ",\n",
) -> int:
    """Reference-parity single-file JSON array (K4 header/footer/comma
    semantics, jsonworker.py:33-44).  Driver-bound by design — use only
    for small exports; ``write_jsonl`` is the distributed path.

    Returns the number of records written.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    serialized = df.select(F.to_json(F.struct(*df.columns)).alias("j"))
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write(header)
        for row in serialized.toLocalIterator():
            if n:
                f.write(separator)
            f.write(row["j"])
            n += 1
        f.write(footer)
    return n
