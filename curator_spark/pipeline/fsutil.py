"""URI-aware filesystem helpers for paths that may live on SHARED
storage (s3://, hdfs://, file:) rather than the driver's local disk.

Why this exists: the pipeline's two-phase commit stages data at
`CuratedTable.stage_dir()`. For the local manifest store that is a
plain local path and os.* calls are correct; for the Iceberg adapter
it is a shared URI every executor can reach (catalog.py
`IcebergTable.stage_dir`) — and against such a URI `os.path.isdir()`
is always False and `os.walk()` yields nothing. Left unrouted, three
silent failures follow on a real cluster: the quarantine partition is
never relocated (failed-extraction rows get COMMITTED into the output
table and `failed_rows` reads 0, defeating `require_all_rows`), the
has-parquet probe sees no files (every run takes the zero-data
bookkeeping branch — whole runs swallowed), and stage cleanup no-ops.
The same pattern breaks `fingerprint.input_identity` (a remote input
hashes to the EMPTY identity, so two different s3 inputs under one
config share a fingerprint and the second run resumes as "cached")
and the streaming config pin (written to a junk local path, so a
restart from another driver host silently re-pins).

Routing rule: a path with NO scheme keeps byte-identical os.*
behavior (JVM-free — unit tests and the sandbox store never touch
py4j); any schemed path (including file:) goes through Hadoop's
FileSystem API — the same connector stack Spark itself writes
through, so any URI Spark can write, these helpers can list, rename,
and delete. `file:` deliberately takes the Hadoop route so the remote
code path is exercisable in local-mode tests (tests/test_fsutil.py).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import SparkSession


def is_local_path(path: str) -> bool:
    """True for plain (scheme-less) local paths. Windows drive letters
    are out of scope (this codebase targets POSIX clusters)."""
    return urlparse(path).scheme == ""


def _require_spark(spark: SparkSession | None, path: str) -> SparkSession:
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"a SparkSession is required to reach non-local path {path!r}"
        )
    return spark


def _jfs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, qualified Path) for a URI. Resolution uses
    the session's hadoopConfiguration, so fs.s3a.* / hdfs credentials
    configured for Spark apply here identically."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession | None, path: str) -> bool:
    if is_local_path(path):
        return os.path.exists(path)
    spark = _require_spark(spark, path)
    fs, jpath = _jfs(spark, path)
    return bool(fs.exists(jpath))


def rename(spark: SparkSession | None, src: str, dst: str) -> None:
    """Move src to dst; raises if the move did not happen (Hadoop's
    rename reports failure — e.g. an existing destination — by
    returning False, which os.rename would have raised for)."""
    if is_local_path(src) and is_local_path(dst):
        os.rename(src, dst)
        return
    spark = _require_spark(spark, src)
    fs, jsrc = _jfs(spark, src)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise OSError(f"rename failed: {src!r} -> {dst!r}")


def delete(spark: SparkSession | None, path: str) -> None:
    """Recursive delete, ignore-missing (shutil.rmtree(ignore_errors)
    semantics)."""
    if is_local_path(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    spark = _require_spark(spark, path)
    fs, jpath = _jfs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def has_file_with_suffix(
    spark: SparkSession | None, root: str, suffix: str
) -> bool:
    """True iff any file under `root` (recursive) ends with `suffix`.
    Short-circuits on the first hit — on an object store this is one
    LIST page in the common case, not a full-tree walk."""
    if is_local_path(root):
        return any(
            f.endswith(suffix)
            for _, _, fs in os.walk(root)
            for f in fs
        )
    spark = _require_spark(spark, root)
    fs, jpath = _jfs(spark, root)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            return True
    return False


def listing(spark: SparkSession | None, root: str) -> list[str]:
    """Recursive file listing as "relpath:size:mtime" strings — the
    shape `fingerprint.input_identity` hashes. Hidden/underscore
    basenames (_SUCCESS, .crc) are skipped, matching the local walk.
    Local paths report mtime_ns; Hadoop reports milliseconds — the
    two branches are never compared to each other (an input is
    addressed by one consistent path form), and coarser mtime only
    ever over-invalidates within a branch, never serves stale output.
    """
    if is_local_path(root):
        entries = []
        for r, _dirs, files in os.walk(root):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                fp = os.path.join(r, f)
                st = os.stat(fp)
                entries.append(
                    f"{os.path.relpath(fp, root)}:{st.st_size}:{st.st_mtime_ns}"
                )
        return entries
    spark = _require_spark(spark, root)
    fs, jpath = _jfs(spark, root)
    if not fs.exists(jpath):
        return []
    base = fs.makeQualified(jpath).toString().rstrip("/") + "/"
    entries = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if p.getName().startswith(("_", ".")):
            continue
        full = p.toString()
        rel = full[len(base):] if full.startswith(base) else full
        entries.append(
            f"{rel}:{st.getLen()}:{st.getModificationTime()}"
        )
    return entries


def read_text(spark: SparkSession | None, path: str) -> str | None:
    """Whole-file UTF-8 read; None when the file does not exist."""
    if is_local_path(path):
        try:
            with open(path, encoding="utf-8") as fh:
                return fh.read()
        except FileNotFoundError:
            return None
    spark = _require_spark(spark, path)
    fs, jpath = _jfs(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # commons-io ships with every Spark distribution (a core Spark
        # dependency); py4j returns byte[] as Python bytes
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text_atomic(
    spark: SparkSession | None, path: str, text: str
) -> None:
    """Write-then-rename so readers never observe a torn file. On
    object stores rename is copy+delete, but the PUT of the temp
    object is itself atomic, so the visible-at-`path` content is still
    all-or-nothing."""
    if is_local_path(path):
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    spark = _require_spark(spark, path)
    fs, _ = _jfs(spark, path)
    jvm = spark._jvm
    tmp = path + ".tmp"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    jdst = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(jdst):
        fs.delete(jdst, False)  # HDFS rename refuses to clobber
    if not fs.rename(jtmp, jdst):
        raise OSError(f"atomic write rename failed: {tmp!r} -> {path!r}")
