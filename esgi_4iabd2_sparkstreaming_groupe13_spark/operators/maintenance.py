"""Table maintenance — the operational companions of streaming sinks.

``compact_directory``: micro-batch appends accumulate thousands of
small files (one+ per batch per partition); listing and opening them
dominates read cost long before data volume does. Compaction rewrites
a directory to ~target-sized files and swaps it in (write to sibling
temp dir → rename old → rename new → drop old). Each rename is
atomic, but the swap is two renames, so there is a brief window where
``path`` does not exist; a reader that lists during that window sees
a missing directory (never a half-written mix of layouts). A crash
between the renames is recovered by the in-process restore handler;
an out-of-process crash leaves the data intact under the ``__old_``
sibling name. True single-rename atomicity needs a manifest/table
format (Delta/Iceberg) rather than a bare directory.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import SparkSession


def compact_directory(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    target_file_bytes: int = 128 << 20,
) -> dict[str, int]:
    """Rewrite a sink directory into ~``target_file_bytes`` files.

    Returns {"files_before", "files_after", "rows"}. The data is read
    with schema inference OFF only for parquet (self-describing); JSON
    dirs are read as-is (sinks we compact were written by this engine,
    so every file shares one schema).
    """
    p = Path(path)
    files_before = sum(1 for f in p.rglob("*") if f.is_file() and not f.name.startswith(("_", ".")))
    total_bytes = sum(
        f.stat().st_size
        for f in p.rglob("*")
        if f.is_file() and not f.name.startswith(("_", "."))
    )
    df = spark.read.format(fmt).load(path)
    rows = df.count()
    n_files = max(1, round(total_bytes / target_file_bytes))

    tmp = str(p.with_name(f"{p.name}__compact_{uuid.uuid4().hex[:8]}"))
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)

    old = str(p.with_name(f"{p.name}__old_{uuid.uuid4().hex[:8]}"))
    p.rename(old)
    try:
        Path(tmp).rename(p)
    except BaseException:
        # second rename failed → put the original layout back so the
        # live path never stays missing; the compacted tmp dir remains
        # for inspection/retry
        Path(old).rename(p)
        raise
    shutil.rmtree(old)

    files_after = sum(
        1 for f in p.rglob("*") if f.is_file() and not f.name.startswith(("_", "."))
    )
    return {"files_before": files_before, "files_after": files_after, "rows": rows}
