"""PySpark worker daemon that preloads the heavy Python libraries.

``pyspark.daemon`` forks one worker process per task slot; each FRESH
worker normally pays the numpy/pandas/pyarrow import on its first
batch (measured on the bench box: ~1.5 s user + ~3.0 s sys PER
PROCESS, so the first Arrow-UDF stage of a session costs ~3 s wall
across 32 workers before any real work happens — charged to whatever
operator runs first).

Importing the libraries HERE, in the daemon parent before the fork
loop starts, lets every forked worker inherit the fully initialized
modules through copy-on-write memory at ~zero cost (guide §4:
heavyweight init once per process, never per task).  Selected via
``spark.python.daemon.module`` in :mod:`gxdindexer_spark.session`;
behaviour after the preload is exactly ``pyspark.daemon`` — this
module delegates to its ``manager()`` loop.

Best-effort by design: a worker environment without one of the
libraries just skips it (the engine's own UDFs would fail later
anyway if they actually needed it), and a worker environment where
this module is not importable at all should simply not set the conf
(see the PYTHONPATH guard in ``session.get_spark``).
"""

from __future__ import annotations

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.parquet",
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
):
    try:  # pragma: no cover - exercised in forked daemon, not pytest
        importlib.import_module(_mod)
    except Exception:
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
