"""PySpark-native analytics engine with the query and data-processing
capabilities of ``Code-Yudico/etl-neotel-sql-automation``.

The reference (``/root/reference/main.py``) is a single-file batch ETL
pipeline (extract CSV reports -> pandas transform -> SQL Server load).
This package re-expresses its capabilities — and the relational /
LLM-data-pipeline operators a 100 TB engine needs — as idiomatic
Spark SQL / DataFrame programs:

- ``functions``  — the scalar-coercion library (time->minutes, int/float
  with 0 defaults, day-first dates, name cleaning); reference
  main.py:386-528.
- ``schema``     — the two target schemas + rename maps; main.py:110-183,
  1375-1441.
- ``conform``    — the normalize->rename->pad->project->coerce pipeline
  (main.py:1207-1308) as one reusable DataFrame operator.
- ``io_sources`` — encoding/delimiter-robust CSV, Excel bridge, landing
  dirs; main.py:1311-1368.
- ``io_sinks``   — idempotent date-partitioned sinks (parquet dynamic
  partition overwrite; JDBC staging writer); main.py:1500-1632.
- ``pipeline``   — end-to-end ETL orchestration; main.py:1639-1708.
- ``ops``        — LLM-data-pipeline operators: dedup, similarity search,
  text analysis, multimodal columns.
- ``streaming``  — Structured Streaming replacements for the reference's
  hand-rolled polling loops; main.py:280-347.
"""

__version__ = "0.1.0"
