"""Pipeline-stage operators: bronze/silver/gold/warehouse plus the
training-data extras (dedup, simsearch, multimodal, text)."""
