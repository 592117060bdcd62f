"""Exactly-once delivery to non-transactional sinks: the idempotent
``foreachBatch`` wrapper.

Structured Streaming's contract is exactly-once STATE but
at-least-once SINK delivery for ``foreachBatch``: after a failure the
restarted query re-runs the last uncommitted micro-batch, and a sink
with no transaction support (a REST endpoint, a plain directory, a
topic without EOS producers) receives it twice. The reference's
topology leans on Kafka for this; an engine whose sinks are files/JDBC
needs the standard recipe Spark's own docs prescribe: make the write
idempotent by keying it on ``(query_id, batch_id)`` and skipping
batches already marked committed.

:func:`idempotent_foreach_batch` wraps a write function with a
marker-file ledger (one empty file per committed batch id under
``ledger_dir``). Marker creation is atomic (``O_CREAT|O_EXCL``), the
marker is written only AFTER the write function returns, and a replay
of a committed batch is a silent no-op — the at-least-once delivery
collapses to exactly-once as long as the write itself is all-or-
nothing per batch (write to a temp location, move into place — the
pattern :func:`write_batch_parquet` implements).

Scale note: the ledger is one tiny file per micro-batch, listed never
and probed by exact name — O(1) per batch regardless of history; on a
real deployment ``ledger_dir`` sits next to the checkpoint on the same
fault domain.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    ledger_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap ``write_fn(batch_df, batch_id)`` so each batch id commits
    at most once: skip if the batch's marker exists, write, then mark.

    Crash windows: a crash BEFORE the marker re-runs the write (the
    write function must be batch-atomic); a crash AFTER the marker
    skips the replay — exactly the two halves of the exactly-once
    argument. Markers are created with O_EXCL so two racing attempts
    (a zombie executor-side driver plus its replacement) cannot both
    think they committed.
    """
    os.makedirs(ledger_dir, exist_ok=True)

    def _wrapped(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"committed-{batch_id}")
        if os.path.exists(marker):
            return
        write_fn(batch_df, batch_id)
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)

    return _wrapped


def write_batch_parquet(out_dir: str) -> Callable[[DataFrame, int], None]:
    """A batch-atomic parquet writer for :func:`idempotent_foreach_batch`:
    each batch lands in its own ``batch=<id>`` directory written via
    Spark's committed output protocol (all-or-nothing per directory),
    so a re-run before the marker simply overwrites the same directory.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    return _write
