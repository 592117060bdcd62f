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
marker-file ledger (one empty file per committed ``(query_id,
batch_id)`` under ``ledger_dir``). Marker creation is atomic
(``O_CREAT|O_EXCL``), the marker is written only AFTER the write
function returns, and a replay of a committed batch is a silent no-op
— the at-least-once delivery collapses to exactly-once as long as the
write itself is all-or-nothing per batch (write to a temp location,
move into place — the pattern :func:`write_batch_parquet` implements).

Ledger lifecycle and scale notes:

- The ledger is one tiny file per micro-batch, listed never and probed
  by exact name — O(1) per batch regardless of history; on a real
  deployment ``ledger_dir`` sits next to the checkpoint on the same
  fault domain.
- Markers are keyed ``<query_id>-<batch_id>`` when ``query_id`` is
  given, so one ``ledger_dir`` may be shared by multiple queries.
  WITHOUT a ``query_id`` the ledger is valid for exactly ONE
  query+checkpoint lifetime: batch ids restart at 0 when the
  checkpoint is reset, so the ledger must be reset together with the
  checkpoint or fresh batches would be silently skipped as replays.
- Compaction: a year-long query at a 1s trigger accrues ~31M marker
  files. Only the markers at or above the checkpoint's last committed
  batch id are load-bearing (Spark never replays below it), so a
  maintenance job may delete markers older than the checkpoint's
  commit log horizon; the probe cost itself never grows.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    ledger_dir: str,
    query_id: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap ``write_fn(batch_df, batch_id)`` so each batch id commits
    at most once: skip if the batch's marker exists, write, then mark.

    ``query_id`` namespaces the marker (``<query_id>-<batch_id>``) so
    several queries can share one ``ledger_dir``; omit it only when the
    ledger is private to a single query+checkpoint lifetime (see module
    docstring — a reset checkpoint restarts batch ids at 0 and MUST be
    accompanied by a ledger reset).

    Crash windows: a crash BEFORE the marker re-runs the write (the
    write function must be batch-atomic); a crash AFTER the marker
    skips the replay — exactly the two halves of the exactly-once
    argument. Markers are created with O_EXCL; when two attempts race
    (a zombie driver plus its replacement) both may run the
    batch-atomic write, and the loser of the marker create treats
    ``FileExistsError`` as "already committed" and returns — the
    duplicate write is benign by the batch-atomicity contract, and
    neither racer dies.
    """
    os.makedirs(ledger_dir, exist_ok=True)
    prefix = f"{query_id}-" if query_id is not None else ""

    def _wrapped(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"committed-{prefix}{batch_id}")
        if os.path.exists(marker):
            return
        write_fn(batch_df, batch_id)
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # Lost a marker race: the other attempt committed the same
            # (query_id, batch_id). Its write and ours are the same
            # batch-atomic content — semantically already committed.
            return
        os.close(fd)

    return _wrapped


def write_batch_parquet(out_dir: str) -> Callable[[DataFrame, int], None]:
    """A batch-atomic parquet writer for :func:`idempotent_foreach_batch`:
    each batch is written to a hidden temp directory
    (``.batch=<id>.<nonce>.inprogress`` — dot-prefixed, so Spark/parquet
    file listing never sees it) and then moved into its final
    ``batch=<id>`` directory with a single ``os.rename``.

    Readers therefore observe ``batch=<id>`` either absent or complete
    — never partially written. A crash mid-write leaves only a hidden
    temp directory (invisible to readers, overwritten-then-collected on
    replay); a crash between a previous partial attempt's rename and
    the ledger marker is impossible because the rename IS the last step
    before the marker. The one non-atomic window is a replay of a batch
    whose directory already exists (rename cannot clobber a non-empty
    directory, so the stale directory is removed first): that window
    only opens for a batch the ledger has NOT marked committed, which
    readers must not consume yet by the exactly-once protocol.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(out_dir, f"batch={batch_id}")
        tmp = os.path.join(
            out_dir, f".batch={batch_id}.{uuid.uuid4().hex[:8]}.inprogress"
        )
        batch_df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(final):
            # Uncommitted leftover from a crashed attempt (the marker
            # for this batch id does not exist, or we wouldn't be here).
            shutil.rmtree(final)
        os.rename(tmp, final)
        # Sweep this batch's own orphaned temp dirs from prior crashed
        # attempts (exact-prefix match only — O(#entries) listdir, run
        # once per replay, never on the happy path's hot loop).
        stale_prefix = f".batch={batch_id}."
        for name in os.listdir(out_dir):
            if name.startswith(stale_prefix) and name.endswith(".inprogress"):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    return _write
