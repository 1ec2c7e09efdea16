"""Viewer streaming sink (SURVEY §2 S9): per-response JSON events with
a stable row index, spooled per partition.

The reference streams each parsed response to a hosted viewer service
as it lands, keyed by session id + response idx (reference:
client.py:26-155, base_request_processor / online:631). Restated for
Spark: executors must not funnel telemetry through the driver, so the
sink is a `foreachPartition` spool — every partition writes its rows
as JSONL events to a deterministically-named file under the session
directory, and the session manifest tracks the reference's STARTED →
INPROGRESS → COMPLETED/FAILED lifecycle. A hosted viewer would be
wired by POSTing each spool batch from the executor (the same seam;
no network in this container), keeping the on-disk layout as the
events-with-idx contract.

Delivery semantics: each partition writes to a temp file and
atomically renames to `responses_<partitionId>.jsonl` on success —
a retried or speculative task attempt overwrites rather than
duplicates (last successful attempt wins), matching the exactly-once
discipline of the repo's other sinks. Each `stream_responses` call
spools into its own `batch_NNNN/` subdirectory, so its return value
counts exactly the rows it streamed even when a session accumulates
multiple batches.

Scale note: one file per partition, no driver collect and no shuffle —
the only cross-node traffic a real deployment would add is the HTTP
POST itself. Row idx is only synthesized when the caller asks
(`ensure_idx`); pipelines that already carry `doc_id`/`url` skip it.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ViewerSession:
    """Lifecycle + spool directory for one viewer session."""

    STARTED = "STARTED"
    INPROGRESS = "INPROGRESS"
    COMPLETED = "COMPLETED"
    FAILED = "FAILED"

    def __init__(self, root_dir: str, metadata: dict | None = None):
        self.session_id = uuid.uuid4().hex
        self.dir = os.path.join(root_dir, self.session_id)
        os.makedirs(self.dir, exist_ok=True)
        self._n_batches = 0
        self._write_manifest(self.STARTED, metadata or {})

    def _write_manifest(self, status: str, metadata: dict | None = None):
        path = os.path.join(self.dir, "session.json")
        manifest = {"session_id": self.session_id, "status": status}
        if metadata is not None:
            manifest["metadata"] = metadata
        elif os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                manifest["metadata"] = json.load(f).get("metadata", {})
        with open(path, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def stream_responses(
        self,
        df: DataFrame,
        idx_col: str | None = None,
        ensure_idx: bool = False,
    ) -> int:
        """Spool every row as a viewer event; returns THIS call's
        event count."""
        self._write_manifest(self.INPROGRESS)
        if ensure_idx and idx_col is None:
            idx_col = "__viewer_idx"
            # monotonically_increasing_id is partition-local-contiguous:
            # stable, no extra pass, fine as a viewer ordering key.
            df = df.withColumn(idx_col, F.monotonically_increasing_id())
        batch_dir = os.path.join(self.dir, f"batch_{self._n_batches:04d}")
        self._n_batches += 1
        os.makedirs(batch_dir, exist_ok=True)
        cols = df.columns
        key = idx_col
        # event count via an accumulator, not a driver-side listdir of
        # the spool: on a multi-node cluster each executor's files land
        # on ITS OWN filesystem, so the driver's listing would see only
        # its local partitions and happily report 0/partial as
        # COMPLETED. Accumulator updates inside an action are applied
        # once per successful task, so retries don't double-count.
        acc = df.sparkSession.sparkContext.accumulator(0)

        def spool(rows):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx else 0
            final = os.path.join(batch_dir, f"responses_{pid:05d}.jsonl")
            tmp = f"{final}.attempt-{uuid.uuid4().hex[:8]}"
            n = 0
            try:
                with open(tmp, "w", encoding="utf-8") as f:
                    for row in rows:
                        d = row.asDict(recursive=True)
                        event = {
                            "idx": d.get(key) if key else None,
                            "response_data": {c: d[c] for c in cols if c != key},
                        }
                        f.write(
                            json.dumps(event, default=str, sort_keys=True) + "\n"
                        )
                        n += 1
            except BaseException:
                # a task attempt that dies mid-write must not leave its
                # .attempt-* spool file on the executor's disk forever —
                # read_events ignores them, but retries accumulate orphans
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                raise
            if n:
                os.replace(tmp, final)  # atomic: retries overwrite
            else:
                os.remove(tmp)
            acc.add(n)

        try:
            df.foreachPartition(spool)
        except Exception:
            self._write_manifest(self.FAILED)
            raise
        n_events = acc.value
        self._write_manifest(self.COMPLETED)
        return n_events

    def read_events(self) -> list[dict]:
        """All events across every batch of the session, batch order
        then partition order."""
        events = []
        for batch in sorted(os.listdir(self.dir)):
            bdir = os.path.join(self.dir, batch)
            if not batch.startswith("batch_") or not os.path.isdir(bdir):
                continue
            for fn in sorted(os.listdir(bdir)):
                if not (fn.startswith("responses_") and fn.endswith(".jsonl")):
                    continue
                with open(os.path.join(bdir, fn), encoding="utf-8") as f:
                    events.extend(json.loads(line) for line in f)
        return events
