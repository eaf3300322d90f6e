"""Streaming observability — a ``StreamingQueryListener`` that turns
the engine's per-micro-batch progress events into a queryable metrics
table (the operational surface the reference exposes only as console
noise; its ``sent_batches.txt`` debug tap records producer-side sends,
``MainProducer.scala`` — this is the consumer-side mirror, structured).

Why a listener and not log scraping: Spark already computes per-batch
input rows, processing rate, and per-phase durations for every
streaming query; the listener receives them push-style on the driver
with no extra jobs, no polling, and no executor-side cost. At 100 TB /
1000-executor scale this is the ONLY free way to watch a pipeline —
any pull-based metric query would itself schedule work.

The buffer is a bounded deque (default 10k batches) so a long-running
consumer cannot grow driver memory without bound; ``snapshot_df``
materializes the buffer as a DataFrame for the same dashboards that
read the batch tables.
"""

from __future__ import annotations

import json
from collections import deque
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

#: Spark-side schema of ``snapshot_df`` (kept explicit so an empty
#: buffer still yields a stable schema — driver-contract rule).
METRICS_SCHEMA = (
    "query_id string, batch_id long, num_input_rows long, "
    "process_rate double, trigger_ms long, state_rows long"
)


@dataclass(frozen=True)
class BatchMetric:
    query_id: str
    batch_id: int
    num_input_rows: int
    process_rate: float
    trigger_ms: int
    state_rows: int


class BatchMetricsListener(StreamingQueryListener):
    """Collects one :class:`BatchMetric` per micro-batch progress
    event across ALL queries on the session (filter by ``query_id``
    downstream). Register with ``spark.streams.addListener``; always
    ``removeListener`` when done (tests do) — listeners outlive the
    queries they watch."""

    def __init__(self, capacity: int = 10_000) -> None:
        self.buffer: deque[BatchMetric] = deque(maxlen=capacity)

    # -- StreamingQueryListener interface ---------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        # event.progress is a StreamingQueryProgress; go through the
        # JSON form — it is the documented stable surface and avoids
        # Py4J round-trips per field on the listener thread.
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        self.buffer.append(
            BatchMetric(
                query_id=str(p.get("id", "")),
                batch_id=int(p.get("batchId", -1)),
                num_input_rows=int(p.get("numInputRows", 0)),
                process_rate=float(p.get("processedRowsPerSecond", 0.0)),
                trigger_ms=int(
                    (p.get("durationMs") or {}).get("triggerExecution", 0)
                ),
                state_rows=sum(
                    int(s.get("numRowsTotal", 0)) for s in state
                ),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- read side --------------------------------------------------
    def snapshot_df(self, spark: SparkSession) -> DataFrame:
        """The buffered metrics as a DataFrame (stable schema even
        when empty). The buffer is bounded and driver-local; this is
        a createDataFrame over O(batches) tiny rows, not a scan."""
        rows = [
            (
                m.query_id,
                m.batch_id,
                m.num_input_rows,
                m.process_rate,
                m.trigger_ms,
                m.state_rows,
            )
            for m in list(self.buffer)
        ]
        return spark.createDataFrame(rows, schema=METRICS_SCHEMA)

    def totals(self) -> dict[str, float]:
        """Driver-side rollup for quick assertions/alerts."""
        rows = sum(m.num_input_rows for m in self.buffer)
        ms = sum(m.trigger_ms for m in self.buffer)
        return {
            "batches": float(len(self.buffer)),
            "rows": float(rows),
            "trigger_ms": float(ms),
            "rows_per_sec": (rows / (ms / 1000.0)) if ms else 0.0,
        }
