"""True crash-resume: SIGKILL a pipeline process mid-stage-write, then
rerun and assert the output is complete and exactly-once.

test_resume_cache simulates interruption with max_buckets (a clean
stop at a commit boundary); this test kills the JVM+driver with
SIGKILL while the staged parquet write is in flight — the torn state
the two-phase commit exists for: an un-manifested stage dir must be
invisible to readers, must not confuse the resumed run, and is left
for `expire_snapshots`' age-gated orphan GC.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from curator_spark.pipeline.run import QualityPipeline

N_ROWS = 30_000

_CHILD = """
import sys; sys.path.insert(0, {repo!r})
from curator_spark.engine.session import get_spark
from curator_spark.pipeline.run import QualityPipeline
spark = get_spark("crash-child", cores=4)
spark.sparkContext.setLogLevel("ERROR")
QualityPipeline({out!r}).run(spark, {pages!r})
"""


def test_sigkill_mid_stage_write_then_resume(spark, tmp_path):
    from curator_spark.engine.synth import write_pages

    pages = str(tmp_path / "pages")
    write_pages(spark, pages, N_ROWS)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD.format(repo=repo, out=out, pages=pages)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait for the staged write to START (a stage dir appears under
    # data/), then SIGKILL immediately — the write takes seconds, so
    # the kill lands mid-flight. If the child somehow finishes first
    # (or dies before staging), the assertions below still hold; the
    # mid-write-specific ones are gated on what we actually observed.
    data_dir = os.path.join(out, "data")
    deadline = time.time() + 300
    staged = False
    while time.time() < deadline and child.poll() is None:
        if os.path.isdir(data_dir) and os.listdir(data_dir):
            staged = True
            break
        time.sleep(0.05)
    manifests_at_kill = (
        os.listdir(os.path.join(out, "_manifests"))
        if os.path.isdir(os.path.join(out, "_manifests")) else []
    )
    child.send_signal(signal.SIGKILL)
    child.wait()
    killed_mid_write = staged and not manifests_at_kill

    # resume in-process: same input + config => same fingerprint
    pipe = QualityPipeline(out)
    res = pipe.run(spark, pages)
    df = pipe.read_output(spark, res.fingerprint)
    assert df.count() == N_ROWS
    assert df.select("url").distinct().count() == N_ROWS

    if killed_mid_write:
        # nothing was committed before the kill, so the resumed run
        # did real work, and the torn stage dir is still on disk —
        # invisible to readers, awaiting age-gated orphan GC
        assert not res.cached and len(res.buckets_processed) > 0
        committed = {
            os.path.basename(os.path.normpath(p))
            for c in pipe.table.active_commits()
            for p in (
                [c["data"]] if c.get("data")
                else [pt["path"] for pt in c.get("parts", [])]
            )
        }
        orphans = [
            d for d in os.listdir(data_dir)
            if d not in committed
            and os.path.isdir(os.path.join(data_dir, d))
        ]
        assert orphans, "expected the killed run's torn stage dir"


_CHILD_INC = """
import sys; sys.path.insert(0, {repo!r})
from curator_spark.engine.session import get_spark
from curator_spark.pipeline.run import QualityPipeline
from curator_spark.pipeline.snapshot import SnapshotTable
spark = get_spark("crash-child-inc", cores=4)
spark.sparkContext.setLogLevel("ERROR")
QualityPipeline({out!r}).run_incremental(spark, SnapshotTable({intab!r}))
"""


def test_sigkill_mid_incremental_slice_then_resume(spark, tmp_path):
    """SIGKILL an incremental slice mid-stage-write: the rerun must
    resume the SAME pinned slice (watermark untouched — a crash can
    never skip rows), the appended rows land exactly once, and the
    lineage chains."""
    import pyspark.sql.functions as F

    from curator_spark.engine.synth import generate_pages
    from curator_spark.pipeline.snapshot import SnapshotTable

    intab = SnapshotTable(str(tmp_path / "in_tab"))
    intab.append(generate_pages(spark, 8_000), {"crawl": "c0"})
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # bootstrap slice completes in-process
    pipe = QualityPipeline(out)
    r0 = pipe.run_incremental(spark, intab)
    assert r0.docs_seen == 8_000

    extra = generate_pages(spark, 20_000).withColumn(
        "url", F.concat(F.lit("https://c1.example/"), F.col("url"))
    )
    intab.append(extra, {"crawl": "c1"})

    data_dir = os.path.join(out, "data")
    before = set(os.listdir(data_dir))
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD_INC.format(repo=repo, out=out, intab=intab.root)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 300
    staged = False
    while time.time() < deadline and child.poll() is None:
        if set(os.listdir(data_dir)) - before:
            staged = True
            break
        time.sleep(0.05)
    n_manifests_at_kill = len(os.listdir(os.path.join(out, "_manifests")))
    child.send_signal(signal.SIGKILL)
    child.wait()
    # bootstrap committed exactly one manifest; none for the new slice
    killed_mid_write = staged and n_manifests_at_kill == 1

    res = pipe.run_incremental(spark, intab)
    if killed_mid_write:
        assert not res.cached and res.docs_seen == 20_000
    df = pipe.table.read(spark)
    assert df.count() == 28_000
    assert df.select("url").distinct().count() == 28_000
    st = pipe.incremental_state(intab)
    assert [s["complete"] for s in st] == [True, True]
    assert st[1]["since"] == st[0]["to"]
    assert pipe.run_incremental(spark, intab).cached
