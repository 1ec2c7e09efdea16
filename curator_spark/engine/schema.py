"""Declared StructTypes for every table in the system.

The reference infers Arrow schemas from whatever dicts `parse` emits
(reference: request_processor/base_request_processor.py:454-489); we
declare fixed schemas instead (SURVEY.md §1.2 mapping decision) — at
10^12 rows schema drift is an outage, not a convenience.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table (BASELINE.json input_hint shape).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SCRUB_COUNTS = T.StructType(
    [
        T.StructField("emails", T.LongType(), True),
        T.StructField("ids", T.LongType(), True),
        T.StructField("phones", T.LongType(), True),
        T.StructField("toxic", T.LongType(), True),
    ]
)

# Pipeline output (analog of GenericResponse-derived dataset,
# reference: types/generic_response.py:28-52).
PAGES_OUT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("lang_pred", T.StringType(), True),
        T.StructField("lang_score", T.DoubleType(), True),
        T.StructField("perplexity", T.DoubleType(), True),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("drop_reason", T.StringType(), True),
        T.StructField("scrubbed_text", T.StringType(), True),
        T.StructField("scrub_counts", SCRUB_COUNTS, True),
    ]
)

# Per-bucket lineage/counters (analog of OnlineStatusTracker counters,
# reference: status_tracker/online_status_tracker.py:46-95).
METRICS = T.StructType(
    [
        T.StructField("run_fingerprint", T.StringType(), False),
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("docs_seen", T.LongType(), False),
        T.StructField("docs_kept", T.LongType(), False),
        T.StructField("docs_dropped", T.LongType(), False),
        T.StructField("dropped_by_rule", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("scrub_counts", SCRUB_COUNTS, True),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

# Quarantine table (analog of failed_requests.jsonl,
# reference: base_request_processor.py:508-537).
FAILED_ROWS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)
