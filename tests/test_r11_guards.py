"""Round-11 guard mechanisms (round-10 ADVICE items).

Pins the Neyman-allocation zero-total-weight guard: when EVERY stratum
is constant (all per-stratum variances 0, hence every allocation
weight 0), both engines must allocate 0 rows per stratum instead of
dividing by zero (DuckDB ``//`` errors; Spark ``DIV`` returns NULL).
"""
from __future__ import annotations

import duckdb
import pandas as pd

from flights_etl_pipeline_spark.plans.queries_ml import (
    NEYMAN_SQL,
    neyman_stratified_sample,
)


def test_neyman_all_constant_strata_allocates_zero(spark, tmp_path):
    # two strata, each internally constant -> sigma_h = 0 -> w_q = 0
    # for both -> tw = 0: the degenerate input the guard exists for
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "source": ["a", "a", "b", "b"],
            "n_chars": [100, 100, 250, 250],
        }
    )
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)

    rows = neyman_stratified_sample(spark, str(tmp_path)).collect()
    assert {r["source"] for r in rows} == {"a", "b"}
    assert all(r["w_q"] == 0 for r in rows)
    assert all(r["n_alloc"] == 0 for r in rows)
    assert all(r["n_sampled"] == 0 for r in rows)
    assert all(r["mean_chars_sampled"] is None for r in rows)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    got = con.execute(NEYMAN_SQL).fetchall()
    assert len(got) == 2
    # columns: source, n_total, w_q, n_alloc, n_sampled, mean_chars
    assert all(r[2] == 0 and r[3] == 0 and r[4] == 0 for r in got)
