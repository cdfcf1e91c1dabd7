"""spark-ipl-analytics: a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
rkshthg/AWS-IPL-Data-Pipeline (a pandas/AWS medallion ETL over IPL cricket
ball-by-ball data) on idiomatic Spark: explicit schemas, DataFrame/SQL
declarative plans optimized by Catalyst, window functions instead of
stateful row loops, broadcast joins instead of dict lookups, and
Structured Streaming instead of Lambda/Glue event chaining.

Layout:
  session    - SparkSession factory tuned for local[N] and cluster use
  schemas    - explicit StructType contracts per medallion layer
  functions/ - scalar/event-parse/fuzzy column expression builders
  plans/     - bronze/silver/gold medallion transform plans
  operators/ - dedup, similarity search (LSH/IVF), as-of/range join,
               text analysis, multimodal plumbing, skew salting (the
               100 TB training-data toolkit)
  sources/   - readers/writers (CSV/JSONL/Parquet/Delta-gated) with
               partition-predicate overwrite semantics; bucketed tables
               for exchange-free co-located joins
  streaming/ - file-source incremental pipeline (foreachBatch medallion),
               watermarked event-time windows, applyInPandasWithState
               keyed running state
"""

__version__ = "0.1.0"
