"""P11 code-execution stage: subprocess semantics (success / error /
timeout / file capture) through the mapInPandas path, mirroring the
reference backend contract (multiprocessing_backend.py:34-88)."""

from __future__ import annotations

from curator_spark.stages.codeexec import code_execute


def test_code_execute_success_error_timeout_files(spark):
    rows = [
        ("ok", "import sys\nprint(sys.stdin.read().upper())", "hello"),
        ("err", "import sys\nsys.exit(3)", ""),
        ("boom", "raise ValueError('bad')", ""),
        ("slow", "import time\ntime.sleep(30)", ""),
        ("mkfile", "open('out.txt','w').write('x')\nprint('made')", ""),
    ]
    df = spark.createDataFrame(rows, ["id", "code", "code_input"])
    out = {
        r["id"]: r["execution_output"].asDict()
        for r in code_execute(df.repartition(5), timeout=5.0).collect()
    }

    assert out["ok"]["message"] == "success"
    assert out["ok"]["stdout"].strip() == "HELLO"
    assert out["ok"]["exit_code"] == 0

    assert out["err"]["message"] == "error"
    assert out["err"]["exit_code"] == 3
    assert "exit status 3" in out["err"]["error"]

    assert out["boom"]["message"] == "error"
    assert "ValueError" in out["boom"]["stderr"]

    assert out["slow"]["message"] == "timeout"
    assert "timed out" in out["slow"]["error"]

    assert out["mkfile"]["message"] == "success"
    assert out["mkfile"]["files"] == ["out.txt"]
    assert out["mkfile"]["stdout"].strip() == "made"


def test_code_execute_keeps_input_columns_and_partitioning(spark):
    df = spark.createDataFrame(
        [(i, f"print({i} * 2)") for i in range(8)], ["idx", "code"]
    ).repartition(4)
    res = code_execute(df, input_col=None, timeout=5.0)
    # pure map stage: the only exchange is the caller's repartition —
    # results ride the same partition as their input row
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Repartition") == 1
    got = {r["idx"]: r["execution_output"]["stdout"].strip() for r in res.collect()}
    assert got == {i: str(i * 2) for i in range(8)}
