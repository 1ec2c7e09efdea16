"""End-to-end composition of the round-4 operators: a miniature
code-data curation run — agent loop generates code (M4), the code
executor runs it (P11), failures are filtered relationally, and the
survivors land in a hub-layout dataset repo (S8) with the run spooled
to a viewer session (S9). Mirrors the reference's generate → execute →
validate → publish shape (code_executor examples + push_to_hub) as one
Spark DAG: every stage is a map or filter on the same partitioning —
no shuffle until the final sharded write."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from curator_spark.sources.hub_sink import push_to_hub_layout
from curator_spark.sources.viewer_sink import ViewerSession
from curator_spark.stages.agent import SparkAgent, run_multiturn
from curator_spark.stages.codeexec import code_execute


def test_codegen_curation_pipeline(spark, tmp_path):
    def coder(history):
        task = history[0]["content"]
        n = int(task.split(":")[1])
        if n % 4 == 3:  # every 4th task yields broken code
            return "```python\nprint(undefined_var)\n``` [DONE]"
        return f"```python\nprint({n} * 7)\n``` [DONE]"

    def reviewer(history):
        return "looks good"

    seeds = spark.createDataFrame(
        [(i, f"task:{i}") for i in range(8)], ["task_id", "seed_message"]
    ).repartition(4)

    convs = run_multiturn(
        seeds,
        seeder=SparkAgent("reviewer", reviewer),
        partner=SparkAgent("coder", coder),
        max_length=3,
    )
    assert convs.where(~F.col("done")).isEmpty()

    # pull the generated program out of the coder's (final) message
    coded = convs.withColumn(
        "code",
        F.regexp_extract(
            F.element_at("history", -1)["content"],
            r"```python\n([\s\S]*?)\n```",
            1,
        ),
    )
    executed = code_execute(coded, timeout=10.0)

    ok = executed.where(F.col("execution_output.message") == "success")
    bad = executed.where(F.col("execution_output.message") != "success")
    assert bad.count() == 2  # tasks 3 and 7
    assert {r["task_id"] for r in bad.collect()} == {3, 7}

    curated = ok.select(
        "task_id",
        "code",
        # trim() strips only spaces; the trailing newline needs a regexp
        F.regexp_replace(F.col("execution_output.stdout"), r"\s+$", "")
        .alias("output"),
    )
    got = {r["task_id"]: r["output"] for r in curated.collect()}
    assert got == {i: str(i * 7) for i in range(8) if i % 4 != 3}

    # publish survivors + spool the run for the viewer
    repo = str(tmp_path / "repo")
    manifest = push_to_hub_layout(curated, repo, "user/code-tasks")
    assert manifest["n_shards"] >= 1
    assert os.path.exists(manifest["card_path"])
    assert spark.read.parquet(os.path.join(repo, "data")).count() == 6

    sess = ViewerSession(str(tmp_path / "viewer"))
    assert sess.stream_responses(curated, idx_col="task_id") == 6
