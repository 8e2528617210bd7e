"""advisorydatapipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system ``Idanconley123/advisoryDataPipeline``
(an advisory/CVE batch ETL pipeline: ingest -> enrich -> state-machine),
built Spark-first:

- Declarative DataFrame / Spark SQL plans; Catalyst + AQE pick physical
  strategies (no hand-scheduling).
- Schema-enforced IO with the reference's "missing path => empty relation"
  bootstrap contract (reference: pipeline_libs/spark/spark_utils.py:158-161).
- Native (codegen-friendly) implementations of the reference's Python-UDF
  state machine, with UDF-parity variants kept for the oracle.
- Beyond-reference operators for large-scale training-data pipelines:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing.

Designed for a 1000-executor cluster at ~100 TB; tested on local[*].
"""

__version__ = "0.1.0"
