"""Run-level fingerprinting — the reference's cache key, re-derived.

Reference semantics (reference: llm/llm.py:147-172 + proven in
tests/unittests/test_caching.py:12-96): fingerprint = hash(dataset
fingerprint, prompt-fn source, model, params); same fingerprint ⇒ whole
run is a cache hit. Ours: hash(input identity, config JSON, code
version). Code-hash granularity is per-release (documented SURVEY §7.3)
— the reference hashes the dill-pickled closure instead.
"""

from __future__ import annotations

import hashlib
import os

from curator_spark.config import QualityConfig


def input_identity(path: str) -> str:
    """Stable identity of an input directory: sorted (name, size) pairs."""
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            fp = os.path.join(root, f)
            entries.append(f"{os.path.relpath(fp, path)}:{os.path.getsize(fp)}")
    return ";".join(sorted(entries))


def run_fingerprint(input_path: str, cfg: QualityConfig) -> str:
    h = hashlib.sha256()
    h.update(input_identity(input_path).encode())
    h.update(b"\x00")
    h.update(cfg.stable_json().encode())
    return h.hexdigest()[:16]
