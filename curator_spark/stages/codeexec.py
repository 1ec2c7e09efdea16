"""Per-row code execution as a Spark map stage (SURVEY §2 P11).

The reference executes user-supplied code per row in a pooled
subprocess backend with timeout + capture of stdout/stderr/created
files (reference: code_executor/code_executor.py:98-182,
code_execution_backend/multiprocessing_backend.py:34-88,
code_formatter.py:16-34). Restated for Spark: the *cluster* is the
process pool. `code_execute` is a pure `mapInPandas` stage — each
Spark task walks its Arrow batch and runs one sandboxed interpreter
per row (fresh temp cwd, stdin = `code_input`, wall-clock timeout,
RLIMIT_AS memory cap, file-creation capture). Parallelism comes from
partitioning, not a driver-side pool: 1000 executors = 1000
concurrent sandboxes with zero coordination, and the stage never
shuffles (results ride the same partition as their input row).

Executing arbitrary code is inherently a trust decision; the caps
here (address-space limit, timeout, temp-dir cwd, no network setup)
mirror the reference's multiprocessing backend — they bound resource
use of *trusted-but-buggy* generated code, they are not a security
boundary. The docker/e2b/ray isolation backends of the reference
(code_execution_backend/docker_backend.py, e2b_backend.py) are
deployment concerns outside a Spark stage: on a real cluster the
executor container IS the sandbox.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Mirrors the reference's CodeExecutionOutput (code_executor/types.py):
# message ∈ {success, timeout, error}; files = names created in the cwd.
CODE_EXEC_SCHEMA = StructType(
    [
        StructField("message", StringType()),
        StructField("stdout", StringType()),
        StructField("stderr", StringType()),
        StructField("error", StringType()),
        StructField("exit_code", IntegerType()),
        StructField("files", ArrayType(StringType())),
        StructField("exec_sec", DoubleType()),
    ]
)


def _run_one(code: str, code_input: str, timeout: float, mem_mb: int) -> dict:
    """Execute one row's program in a fresh interpreter + temp cwd."""
    with tempfile.TemporaryDirectory(prefix="curator_exec_") as d:
        prog = os.path.join(d, "program.py")
        with open(prog, "w", encoding="utf-8") as f:
            f.write(code or "")

        def _limits():  # executed in the child, pre-exec
            try:
                import resource

                cap = mem_mb * 1024 * 1024
                resource.setrlimit(resource.RLIMIT_AS, (cap, cap))
            except Exception:
                pass  # platform without RLIMIT_AS: timeout still bounds

        t0 = time.monotonic()
        proc = None
        try:
            # start_new_session: the program runs as its own process
            # GROUP, so the timeout path can killpg the whole tree — a
            # plain kill of program.py leaves forked grandchildren
            # holding the stdout/stderr pipes, and the subsequent
            # communicate() would block forever (defeating the
            # wall-clock bound, the one job this stage has).
            proc = subprocess.Popen(
                [sys.executable, "program.py"],
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=d,
                preexec_fn=_limits if os.name == "posix" else None,
                start_new_session=os.name == "posix",
            )
            try:
                stdout, stderr = proc.communicate(
                    input=code_input or "", timeout=timeout
                )
            except subprocess.TimeoutExpired as te:
                import signal

                try:
                    if os.name == "posix":
                        os.killpg(proc.pid, signal.SIGKILL)
                    else:
                        proc.kill()
                except ProcessLookupError:
                    pass
                # partial output up to the kill still matters — it is
                # exactly the diagnostic a hung generated program left
                # behind (reference returns it too).
                proc.wait()
                stdout = te.stdout if isinstance(te.stdout, str) else (
                    te.stdout.decode("utf-8", "replace") if te.stdout else None
                )
                stderr = te.stderr if isinstance(te.stderr, str) else (
                    te.stderr.decode("utf-8", "replace") if te.stderr else None
                )
                return {
                    "message": "timeout",
                    "stdout": stdout,
                    "stderr": stderr,
                    "error": f"Execution timed out after {timeout}s",
                    "exit_code": None,
                    "files": [],
                    "exec_sec": round(time.monotonic() - t0, 4),
                }
            created = sorted(
                f for f in os.listdir(d) if f != "program.py"
            )
            rc = proc.returncode
            return {
                "message": "success" if rc == 0 else "error",
                "stdout": stdout,
                "stderr": stderr,
                "error": None if rc == 0 else f"exit status {rc}",
                "exit_code": int(rc),
                "files": created,
                "exec_sec": round(time.monotonic() - t0, 4),
            }
        except Exception as e:  # spawn failure, MemoryError mid-read, ...
            # reap the tree if the failure happened after a successful
            # spawn (e.g. communicate() raising): a long-lived executor
            # must not accumulate orphan interpreters with open pipes
            if proc is not None and proc.poll() is None:
                import signal

                try:
                    if os.name == "posix":
                        os.killpg(proc.pid, signal.SIGKILL)
                    else:
                        proc.kill()
                except ProcessLookupError:
                    pass
                proc.wait()
            return {
                "message": "error",
                "stdout": None,
                "stderr": None,
                "error": str(e),
                "exit_code": None,
                "files": [],
                "exec_sec": round(time.monotonic() - t0, 4),
            }


def code_execute(
    df: DataFrame,
    code_col: str = "code",
    input_col: str | None = "code_input",
    timeout: float = 10.0,
    mem_mb: int = 512,
    out_col: str = "execution_output",
) -> DataFrame:
    """Append `out_col` (CODE_EXEC_SCHEMA struct) to every row.

    Subprocess spawn dominates per-row cost, so rows run sequentially
    within a task and concurrently across tasks — `repartition(n)`
    upstream is the throughput knob, exactly like sizing the
    reference's ProcessPoolExecutor (multiprocessing_backend.py:20).
    """
    in_schema = df.schema
    out_schema = StructType(
        in_schema.fields + [StructField(out_col, CODE_EXEC_SCHEMA)]
    )
    has_input = input_col is not None and input_col in df.columns

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [
                _run_one(
                    row[code_col],
                    row[input_col] if has_input else "",
                    timeout,
                    mem_mb,
                )
                for _, row in pdf.iterrows()
            ]
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(run_batches, schema=out_schema)
