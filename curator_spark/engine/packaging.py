"""Ship the curator_spark package to executor Python workers.

Programmatic analog of `spark-submit --py-files curator_spark.zip`
(the north rule's deployment shape): zip the package once per driver
process and addPyFile it so every executor worker can unpickle the
pandas UDFs regardless of its cwd/PYTHONPATH. On a real cluster you'd
pass the same zip (plus the model .npz via --files/SparkFiles) on the
submit command line — see cli.py.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

import curator_spark

_SHIPPED: dict[str, str] = {}  # applicationId -> shipped zip path


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(curator_spark.__file__))
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="curator_spark_pyfiles_")
    zip_path = os.path.join(dest_dir, "curator_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "curator_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return zip_path


def ship_package(spark) -> None:
    # already shipped externally (spark-submit --py-files): the package
    # itself is imported out of the submitted zip — nothing to do, and
    # addPyFile of a same-named zip would be rejected.
    if ".zip" in os.path.abspath(curator_spark.__file__):
        return
    sc = spark.sparkContext
    # applicationId, not id(sc): a stopped context's id() can be reused
    # by the next SparkContext allocation, which would silently skip
    # shipping the zip to the new context's executors.
    key = sc.applicationId
    if key in _SHIPPED:
        return
    zip_path = build_pyfiles_zip()
    try:
        sc.addPyFile(zip_path)
    except Exception as e:  # same-name file already registered on this sc
        if "already" not in str(e).lower():
            raise
    _SHIPPED[key] = zip_path
