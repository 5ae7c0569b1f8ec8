"""Query plans: the registry feeding ``__spark_entry__`` and the
medallion pipeline runner replacing the reference's Airflow DAG."""
