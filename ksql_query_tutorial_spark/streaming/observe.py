"""Streaming pipeline observability: per-micro-batch SLIs without a
second job.

The reference's operational story is console inspection of sink topics
(``README.md:333-351`` — run a consumer, eyeball the rows). At 100 TB
that becomes real telemetry: every production streaming pipeline needs
per-batch input volume, event-time freshness, and data-quality
counters, and it must get them WITHOUT a shadow aggregation reading
the stream twice. Spark's native answer is ``DataFrame.observe`` —
accumulator-backed metric expressions evaluated inline as rows flow
through the plan (zero extra scans, zero shuffles, negligible cost) —
surfaced per micro-batch in ``StreamingQueryProgress.observedMetrics``.

Two pieces:

- :func:`with_ingest_metrics` — attach the standard ingest SLI set to
  any streaming (or batch) DataFrame: row count, null-key count, and
  min/max event time. Composable: call once per pipeline stage with
  distinct names.
- :class:`ProgressLog` — a ``StreamingQueryListener`` that captures
  every progress event (batch id, input rows, observed metrics,
  event-time watermark) into a plain list for assertion/export. The
  replay tests drive it through a real ``FileStreamSource`` run.

Scale design: ``observe`` metrics are Spark accumulators — merged on
the driver per batch, constant size, independent of partition count;
the listener is driver-side only. Nothing here adds a jobs/stage to
the query.
"""

from __future__ import annotations

from collections import deque
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_ingest_metrics(
    df: DataFrame,
    name: str = "ingest",
    key_col: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Attach inline SLI counters to ``df`` under metric set ``name``.

    Emits per batch: ``rows`` (input volume), ``null_keys`` (rows whose
    ``key_col`` is NULL — the malformed-record counter), ``min_ts`` /
    ``max_ts`` (event-time span — freshness and disorder read-out).
    Metrics appear in ``observedMetrics[name]`` of each progress event
    (and in ``df.observe``'s batch API equivalently).
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    if key_col is not None:
        metrics.append(
            F.sum(
                F.when(F.col(key_col).isNull(), 1).otherwise(0)
            ).cast("long").alias("null_keys")
        )
    if ts_col is not None:
        metrics.append(F.min(ts_col).alias("min_ts"))
        metrics.append(F.max(ts_col).alias("max_ts"))
    return df.observe(name, *metrics)


class ProgressLog(StreamingQueryListener):
    """Driver-side progress capture: one dict per micro-batch with the
    batch id, input row count, event-time watermark, and every
    observed-metrics row — the exportable telemetry record a
    monitoring agent would ship.

    Retention is bounded: ``batches`` is a ``deque(maxlen=max_batches)``
    (default 10,000 ≈ 2.8h of a seconds-trigger stream), so a
    session-wide listener on a long-running persistent query cannot
    grow driver memory without bound — old records are evicted oldest-
    first, exactly like a metrics agent's ring buffer. A monitoring
    exporter should drain (copy + clear) within the window; tests that
    need every batch of a short replay are far under the cap.

    Usage::

        log = ProgressLog()
        spark.streams.addListener(log)
        ... run the query ...
        spark.streams.removeListener(log)
        log.batches  # deque([{"batchId": 0, "numInputRows": 2, ...}, ...])
    """

    def __init__(self, max_batches: int = 10_000) -> None:
        self.batches: deque[dict[str, Any]] = deque(maxlen=max_batches)
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        p = event.progress
        rec: dict[str, Any] = {
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "watermark": (p.eventTime or {}).get("watermark"),
            "observed": {
                name: dict(row.asDict())
                for name, row in (p.observedMetrics or {}).items()
            },
        }
        self.batches.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        self.terminated.append(str(event.id))
