"""Streaming distribution-drift monitor — score every micro-batch's
feature distribution against a FROZEN reference histogram (PSI,
``operators/validate.py``) and append a per-batch report; a shifted
batch fires the ``on_shift`` hook (alerting / retrain trigger) but is
NOT blocked — drift is a property of the stream, not a defect of the
rows, so the data still flows (contrast ``quality_gate``, which
quarantines: a failed validation means the rows themselves are bad).

Reference counts are frozen once from the training corpus
(``freeze_reference_bins``) and ride as literals — monitoring never
re-reads the reference. Reports are one Spark-written text directory
per batch id, overwritten on crash-replay (the quality-gate report
idempotence contract).
"""

from __future__ import annotations

import json
import sys
from typing import Callable

from pyspark.sql import DataFrame

from ..operators.validate import PSI_SHIFT_THRESHOLD, psi_vs_reference


def drift_monitored_batch(
    on_batch: Callable[[DataFrame, int], None],
    value_col: str,
    bin_edges: list[float],
    ref_counts: list[int],
    report_dir: str,
    threshold: float = PSI_SHIFT_THRESHOLD,
    on_shift: Callable[[int, float], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap a ``foreachBatch`` body with the PSI drift monitor.

    Per non-empty micro-batch: ONE narrow scan into a ≤B+1-row
    partial aggregate scores PSI vs the frozen reference; the
    (batch_id, n, psi, shifted) report writes through the Spark
    writer stack to ``report_dir/b<N>`` (same-filesystem, replay-
    overwritten); then the wrapped body runs unconditionally. The
    batch is persisted around the monitor + body so a file-source
    micro-batch is read from disk once.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        try:
            row = psi_vs_reference(
                batch_df, value_col, bin_edges, ref_counts, threshold
            ).collect()[0]
            report = json.dumps(
                {
                    "batch_id": batch_id,
                    "n": row["n"],
                    "psi": row["psi"],
                    "shifted": bool(row["shifted"]),
                }
            )
            spark = batch_df.sparkSession
            (
                spark.createDataFrame([(report,)], ["report"])
                .coalesce(1)
                .write.mode("overwrite")
                .text(f"{report_dir}/b{batch_id}")
            )
            # the alert hook fires BEFORE the wrapped body (a failing
            # sink must not suppress the drift alert — the alert is
            # most valuable exactly when downstream is unhealthy) and
            # is exception-isolated (a failing alert path — Slack 500,
            # network timeout — must never fail the micro-batch: that
            # would block exactly the drifted data the module contract
            # says flows through)
            if row["shifted"] and on_shift is not None:
                try:
                    on_shift(batch_id, row["psi"])
                except Exception as exc:  # noqa: BLE001
                    print(
                        f"drift_monitored_batch: on_shift failed for "
                        f"batch {batch_id}: {exc!r}",
                        file=sys.stderr,
                    )
            on_batch(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return process
