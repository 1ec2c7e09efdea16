"""Hard cases for the code-execution stage: process-tree timeout and
partial-output capture (review follow-ups)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from curator_spark.stages.codeexec import code_execute


def test_timeout_kills_grandchildren_and_keeps_partial_stdout(spark):
    # program prints diagnostics, forks a pipe-holding child, then
    # hangs: a naive kill of program.py would leave the grandchild
    # holding stdout and block the stage forever.
    code = (
        "import subprocess, sys, time\n"
        "print('diag-line', flush=True)\n"
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(60)'])\n"
        "time.sleep(60)\n"
    )
    df = spark.createDataFrame([("g", code)], ["id", "code"])
    t0 = time.monotonic()
    row = code_execute(df, input_col=None, timeout=3.0).collect()[0]
    wall = time.monotonic() - t0
    out = row["execution_output"]
    assert out["message"] == "timeout"
    assert wall < 30, f"stage hung {wall:.0f}s past the 3s timeout"
    assert out["stdout"] is not None and "diag-line" in out["stdout"]


def test_rerun_hub_layout_removes_stale_shards(spark, tmp_path):
    from curator_spark.sources.hub_sink import push_to_hub_layout
    import os

    repo = str(tmp_path / "repo")
    df6 = spark.range(60).repartition(6)
    push_to_hub_layout(df6, repo, "u/d")
    df2 = spark.range(10).repartition(2)
    m = push_to_hub_layout(df2, repo, "u/d")
    names = sorted(os.listdir(os.path.join(repo, "data")))
    n = m["n_shards"]
    assert names == [f"train-{i:05d}-of-{n:05d}.parquet" for i in range(n)]
    assert spark.read.parquet(os.path.join(repo, "data")).count() == 10


def test_viewer_two_batches_counts_per_call(spark, tmp_path):
    from curator_spark.sources.viewer_sink import ViewerSession

    a = spark.createDataFrame([(i, "a") for i in range(10)], ["doc_id", "r"])
    b = spark.createDataFrame([(i, "b") for i in range(4)], ["doc_id", "r"])
    sess = ViewerSession(str(tmp_path))
    assert sess.stream_responses(a, idx_col="doc_id") == 10
    assert sess.stream_responses(b, idx_col="doc_id") == 4
    assert len(sess.read_events()) == 14
