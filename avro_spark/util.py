"""Runtime utilities."""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile


def ensure_workers(spark) -> None:
    """Ship the avro_spark package to executor Python workers.

    Functions referenced from pandas UDFs are pickled *by module reference*
    (cloudpickle), so executors must be able to ``import avro_spark``. When
    the package was imported from a plain directory (not an installed
    distribution), executors spawned with a different working directory can't
    — this zips the package once per session and registers it with
    ``SparkContext.addPyFile``. Idempotent and cheap; called automatically by
    every operator that uses a Python UDF.
    """
    sc = spark.sparkContext
    flag = "_avro_spark_shipped"
    if getattr(sc, flag, False):
        return
    import avro_spark

    pkg_dir = os.path.dirname(os.path.abspath(avro_spark.__file__))
    sources: list[tuple[str, str]] = []  # (abs path, archive name)
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(root, fn)
            rel = os.path.join("avro_spark", os.path.relpath(full, pkg_dir))
            sources.append((full, rel))
    sources.sort(key=lambda p: p[1])
    # Key the archive by package content, not just version: addPyFile
    # entries shadow PYTHONPATH on executors, so a stale cached zip would
    # silently ship OLD code to every worker after any source change.
    digest = hashlib.sha256()
    for full, rel in sources:
        digest.update(rel.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"avro_spark-{avro_spark.__version__}-{digest.hexdigest()[:16]}.zip",
    )
    if not os.path.exists(zpath):
        tmp = f"{zpath}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full, rel in sources:
                zf.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    setattr(sc, flag, True)
