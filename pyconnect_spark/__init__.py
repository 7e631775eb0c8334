"""pyconnect_spark — a PySpark-native analytics & connector engine.

A from-scratch re-expression of the capabilities of real-digital/pyconnect
(a Kafka-Connect-like Python connector framework, see /root/reference) on
Apache Spark:

- the reference's connector/streaming semantics (source -> topic,
  topic -> sink, commit-after-flush at-least-once delivery) mapped onto
  Structured Streaming + checkpoints (``pyconnect_spark.streaming``);
- a batch relational operator surface (scan/filter/join/agg/window/set-ops,
  declared-query contract in ``pyconnect_spark.operators.relational``);
- LLM-data-pipeline operators: dedup (exact/minhash/simhash/jaccard),
  similarity search, text analysis, multimodal column plumbing
  (``pyconnect_spark.operators.{dedup,similarity,text,multimodal}``);
- Avro schema inference + Confluent wire-format helpers
  (``pyconnect_spark.functions.avro``), config layer
  (``pyconnect_spark.config``).

Everything is DataFrame/SQL-first: plans are declared, Catalyst/AQE picks
the physical strategy; Python touches data only through Arrow-batched
pandas UDFs where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from pyconnect_spark.session import get_spark  # noqa: F401
from pyconnect_spark.catalog import TABLES, load_tables  # noqa: F401
from pyconnect_spark.functions.sqlfuncs import register_sql_functions  # noqa: F401
