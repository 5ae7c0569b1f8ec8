"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``flights_etl_pipeline_spark``; this file only
adapts it to the contract.

The adapter also makes the package importable on Spark's *Python
workers*, not just the driver: mapInPandas / applyInPandasWithState
functions and the custom Python DataSource are cloudpickled BY REFERENCE
to their module, so a worker spawned by a driver whose cwd/PYTHONPATH
does not include this repo would raise ModuleNotFoundError. Every
callable returned here first ships the package zip to the session via
``sparkContext.addPyFile`` (once per SparkContext) -- the same mechanism
a real cluster deployment uses (``spark-submit --py-files``).
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from flights_etl_pipeline_spark.plans import queries as _q

_PKG_ZIP: str | None = None
_PREPARED: set[int] = set()


def _pkg_zip() -> str:
    """Zip the package once per process (pure-python, zipimport-able)."""
    global _PKG_ZIP
    if _PKG_ZIP is None or not os.path.exists(_PKG_ZIP):
        fd, path = tempfile.mkstemp(suffix=".zip", prefix="flights_pkg_")
        os.close(fd)
        root = os.path.join(_REPO_DIR, "flights_etl_pipeline_spark")
        with zipfile.ZipFile(path, "w") as z:
            for dirpath, _dirs, files in os.walk(root):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, _REPO_DIR))
        _PKG_ZIP = path
    return _PKG_ZIP


def _prepare(spark: SparkSession) -> None:
    """Ship the package to this session's Python workers (idempotent)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _PREPARED:
        return
    try:
        sc.addPyFile(_pkg_zip())
    except Exception:
        # e.g. identical path added twice across sessions sharing a
        # context -- workers already have the package either way
        pass
    _PREPARED.add(key)


def _wrap(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prepare(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from flights_etl_pipeline_spark.plans.queries_core import pricing_summary

    _prepare(spark)
    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
