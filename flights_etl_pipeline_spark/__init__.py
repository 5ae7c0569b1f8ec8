"""PySpark-native analytics engine with the query/data-processing
capabilities of TrungTechh/Flights-Etl-Pipeline (reference read-only at
/root/reference/), rebuilt Spark-first per SURVEY.md.

The reference is a medallion-architecture batch ETL (CSV -> Postgres ->
bronze -> silver -> gold/star-schema, ~470 LoC of PySpark across 4 jobs,
mnt/airflow/dags/scripts/*.py). This package re-expresses every operator in
SURVEY.md section 2 as idiomatic modern PySpark (DataFrame/SQL, Catalyst,
AQE), fixes the reference's nine documented defects (SURVEY.md section 2.10),
and adds the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) the 100 TB north star needs.

Layout:
  session.py    SparkSession factory (AQE on, UTC, Arrow)
  sources/      S1-S10: readers (jdbc/csv/parquet, path probe, watermark),
                sinks (partitioned append, saveAsTable)
  functions/    scalar/array/text/vector column expressions (U1/U2 as
                built-ins, P5/P7/P8 array ops, minhash/simhash, cosine)
  operators/    silver/gold/warehouse stages, dedup, simsearch, text,
                multimodal, event windows
  plans/        queries registry (feeds __spark_entry__), pipeline runner
  streaming/    Structured Streaming mapping of the incremental pattern
"""

__version__ = "0.1.0"
