"""curator_spark — a from-scratch PySpark-native data-curation engine.

Re-expresses the query/data-processing capabilities of the reference
(`baladithyab/curator`, a single-node asyncio bulk-inference library;
see /root/reference and SURVEY.md) as an idiomatic Spark engine:

- DataFrame/Catalyst logical plans for every relational capability the
  reference has (scans, projections, filters, anti-join resume,
  aggregations, unions — SURVEY.md §2).
- Arrow-vectorized pandas UDFs for the "expensive batched map" at the
  heart of the reference (its offline vLLM path,
  reference: src/bespokelabs/curator/request_processor/offline/
  vllm_offline_request_processor.py:41-53,167-201), retargeted at the
  web-scale quality-filter workload: language-ID, n-gram perplexity,
  heuristic rules, PII/toxicity scrubbing.
- Run-level fingerprint caching + row/bucket-level resume
  (reference: llm/llm.py:147-172, base_request_processor.py:609-651)
  via a snapshot-manifest table layer (`pipeline/snapshot.py`).
"""

__version__ = "0.1.0"
