"""Replay producer — Spark-native rebuild of the reference's batch
emitter (``MainProducer.scala:77-124`` + ``FileSender.scala:75-140``).

The reference collects every batch to the driver and writes rows with
a PrintWriter, re-running a single-partition global ``row_number``
window per batch — O(n·batches) work, driver-memory bound (SURVEY §4
anti-patterns). The rebuild:

1. sorts ONCE by event time (O1) and assigns each row a batch number
   with the scale-safe two-pass global index (windows.global_row_index
   — range partition + local row_number + broadcast offsets; no
   single-partition stage);
2. writes ALL batches in ONE executor-side job, partitioned by
   ``batch_no`` (`partitionBy` → one directory per batch, written in
   parallel);
3. paces the *visibility* of batches, not their computation: files are
   moved into the consumer's watched directory on the emission
   schedule. Moving a file is O(1) metadata work — the driver never
   touches row data.

At demo scale each batch is additionally coalesced to one file to
match the reference's one-file-per-batch NDJSON contract
(``taxi-batch-batch{N}-{ts}.json``, ``FileSender.scala:117-119``).
"""

from __future__ import annotations

import datetime
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.caching import release_cached
from ..operators.windows import global_row_index

#: Marker filename for the "source loaded but zero valid rows" failure
#: (``MainProducer.scala:56-72``). Scripts watching the reference's
#: data dir for this file keep working against the rebuild.
ERROR_MARKER_NAME = "ERROR_NO_DATA_FOUND.txt"


def write_no_data_marker(output_dir: str, source_desc: str) -> str:
    """Drop the reference's no-data error marker and return its path.

    Mirrors ``MainProducer.scala:56-72``: a human-readable .txt with
    the failing source and a timestamp. ``.txt`` is invisible to the
    consumer (the JSON dir source globs ``*.json``)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / ERROR_MARKER_NAME
    marker.write_text(
        "Erreur lors du chargement des données: Aucune donnée valide trouvée\n"
        f"Fichier source: {source_desc}\n"
        f"Date et heure: {datetime.datetime.now().isoformat()}\n"
        "Vérifiez que le fichier CSV est au bon format et que le schéma "
        "est correctement défini.\n"
    )
    return str(marker)


def write_empty_batch_marker(output_dir: str, batch_no: int) -> str:
    """Drop the reference's empty-batch marker and return its path
    (``FileSender.scala:85-109``: ``empty-batch{N}-{ts}.txt``)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    marker = out / f"empty-batch{batch_no}-{stamp}.txt"
    marker.write_text(
        f"Batch #{batch_no} était vide - Aucune donnée à écrire\n"
    )
    return str(marker)


def append_batch_debug(
    debug_file: str, batch_no: int, json_lines: list[str]
) -> None:
    """K5 producer debug tap (``FileSender.scala:31-67``): append the
    reference's exact block format — ``===== BATCH #N (M messages)
    =====`` header, then ``take(5).mkString("\\n").take(1000)``
    semantics faithfully reproduced: the first 5 messages JOINED and
    truncated to 1000 chars TOTAL (so a long message can be cut
    mid-line, exactly as the reference does), the ``... (plus de
    données)`` marker only when more than 5 messages exist, footer,
    blank line. The dashboard sidebar tails this file
    (``taxi_dashboard.py:107-117`` ↔ ``dashboard_app.py
    --debug-file``)."""
    header = f"===== BATCH #{batch_no} ({len(json_lines)} messages) ====="
    if json_lines:
        content = "\n".join(json_lines[:5])[:1000]
        if len(json_lines) > 5:
            content += "\n... (plus de données)"
    else:
        content = "BATCH VIDE - Aucun message à envoyer!"
    footer = "=" * 38
    p = Path(debug_file)
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("a", encoding="utf-8") as f:
        f.write(f"{header}\n{content}\n{footer}\n\n")


def stage_batches(
    df: DataFrame,
    stage_dir: str,
    batch_size: int,
    order_cols: list[str] | None = None,
) -> int:
    """Phase 1+2: batch assignment + one parallel partitioned write.
    Returns the number of batches staged."""
    order_cols = order_cols or ["tpep_pickup_datetime"]
    indexed = global_row_index(df, order_cols, index_col="_idx")
    batched = indexed.withColumn(
        "batch_no", ((F.col("_idx") - 1) / batch_size).cast("long")
    ).drop("_idx")
    # Demo-scale contract: one NDJSON file per batch → coalesce within
    # each partition dir. At real scale drop the repartition and let
    # each batch be many files.
    (
        batched.repartition("batch_no")
        .write.mode("overwrite")
        .partitionBy("batch_no")
        .json(stage_dir)
    )
    n = batched.select(F.max("batch_no")).first()[0]
    # global_row_index pins its (_pid, rank) frame in executor storage
    # (tracked persist); the staging write + max() above were its last
    # consumers, so release it before the long-lived pacing loop
    release_cached()
    return int(n) + 1 if n is not None else 0


def publish_batches(
    stage_dir: str,
    output_dir: str,
    interval_seconds: float = 0.0,
    file_prefix: str = "taxi-batch",
    max_batches: int | None = None,
    debug_file: str | None = None,
) -> list[str]:
    """Phase 3: move staged batch files into the consumer's watched
    directory on the pacing schedule (driver-side metadata ops only).
    Returns the published file paths in emission order."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    published: list[str] = []
    batch_dirs = sorted(
        Path(stage_dir).glob("batch_no=*"),
        key=lambda p: int(p.name.split("=")[1]),
    )
    if max_batches is not None:
        batch_dirs = batch_dirs[:max_batches]
    for bdir in batch_dirs:
        n = int(bdir.name.split("=")[1])
        stamp = time.strftime("%Y%m%d_%H%M%S")
        parts = sorted(bdir.glob("part-*.json")) or sorted(bdir.glob("part-*"))
        if not parts:
            # Reference parity (FileSender.scala:85-109): an empty batch
            # publishes a .txt marker instead of silently skipping.
            if debug_file is not None:
                append_batch_debug(debug_file, n, [])
            published.append(write_empty_batch_marker(output_dir, n))
            continue
        if debug_file is not None:
            # demo-scale tap (debug is opt-in, off by default): read the
            # staged NDJSON lines driver-side before the rename
            lines = [
                ln
                for part in parts
                for ln in part.read_text(encoding="utf-8").splitlines()
                if ln.strip()
            ]
            append_batch_debug(debug_file, n, lines)
        for i, part in enumerate(parts):
            suffix = f"-{i}" if len(parts) > 1 else ""
            dest = out / f"{file_prefix}-batch{n}{suffix}-{stamp}.json"
            # shutil.move is an O(1) rename on the same filesystem (the
            # normal layout: stage and output dirs share a volume) and
            # falls back to copy+unlink across filesystems — either way
            # the staged copy is gone, so demo storage isn't doubled.
            shutil.move(str(part), str(dest))
            published.append(str(dest))
        if interval_seconds > 0:
            time.sleep(interval_seconds)
    return published


def replay_to_ndjson(
    df: DataFrame,
    stage_dir: str,
    output_dir: str,
    batch_size: int = 10,
    interval_seconds: float = 0.0,
    order_cols: list[str] | None = None,
    max_batches: int | None = None,
    debug_file: str | None = None,
) -> list[str]:
    """End-to-end replay: stage once, publish paced. The streaming
    consumer (processor.start_consumer) tails ``output_dir``.

    Zero valid input rows drops the reference's
    ``ERROR_NO_DATA_FOUND.txt`` marker in ``output_dir`` and raises
    (``MainProducer.scala:56-72``). ``debug_file`` enables the K5
    producer tap (``sent_batches.txt`` blocks the dashboard sidebar
    tails)."""
    n_batches = stage_batches(df, stage_dir, batch_size, order_cols)
    if n_batches == 0:
        write_no_data_marker(output_dir, source_desc=str(df))
        raise RuntimeError("no valid rows found in the source data")
    return publish_batches(
        stage_dir,
        output_dir,
        interval_seconds,
        max_batches=max_batches,
        debug_file=debug_file,
    )
