"""Driver-contract regression: the grading driver imports
``__spark_entry__.py`` by file path from an arbitrary cwd with no
PYTHONPATH. Queries whose functions execute on Python workers
(mapInPandas, applyInPandasWithState, custom Python DataSource) are
cloudpickled BY REFERENCE to the package, so the package must reach the
workers via addPyFile -- a driver-side sys.path fix is not enough. This
test runs one such query in a clean subprocess to pin the contract.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
qs = mod.queries()
# a mapInPandas query: fails with ModuleNotFoundError on the workers
# unless the entry adapter ships the package zip
n = qs["multimodal_features"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("WORKER_IMPORT_OK", n)
"""


def test_python_worker_queries_run_from_foreign_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    script = _SCRIPT.format(entry=os.path.join(REPO, "__spark_entry__.py"))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WORKER_IMPORT_OK" in proc.stdout


_SCRIPT_R2 = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
qs = mod.queries()
# round-2 surfaces with extra session coupling: WITH RECURSIVE through
# the SQL parser + createOrReplaceTempView, and semi/anti-join chains --
# all under the driver's DEFAULT session (ANSI on, no custom confs)
for name in ("loyalty_balance_recursive", "q21_single_return_supplier",
             "llm_corpus_pipeline", "revenue_holt_winters_recursive",
             "merge_apply_changelog"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, (name, n)
print("R2_CONTRACT_OK")
"""


def test_round2_query_styles_run_under_driver_session(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    script = _SCRIPT_R2.format(entry=os.path.join(REPO, "__spark_entry__.py"))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "R2_CONTRACT_OK" in proc.stdout
