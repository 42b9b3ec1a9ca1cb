"""feldera_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Feldera incremental compute engine
(reference: feldera/feldera, surveyed in SURVEY.md).

Architecture (Spark-first, NOT a port):

- Relations are plain Spark DataFrames; Catalyst handles logical
  optimization (SURVEY §4.1 — every reference HEP rule is stock Catalyst).
- Change streams are DataFrames with a ``__weight`` LongType column
  (Z-set encoding, reference ``crates/dbsp/src/algebra/zset.rs``).
- Batch mode evaluates views directly; incremental mode applies delta
  rules per operator (``feldera_spark.streaming.incremental``).
- Operators Spark lacks natively (as-of join, recursive views, ...)
  live in ``feldera_spark.operators``.
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) live in ``feldera_spark.datapipe``.
"""

__version__ = "0.1.0"

from feldera_spark.session import get_spark  # noqa: F401
