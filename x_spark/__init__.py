"""x_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL framework (blackslender/x, "pyzzle";
see SURVEY.md), plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layers
------
- ``x_spark.sources``    connector registry (parquet catalog, file readers,
                         Delta when available)
- ``x_spark.plans``      declarative job configs + lifecycle runner
                         (the reference's YAML job model)
- ``x_spark.operators``  write/merge/recon ops + LLM-data-pipeline ops
- ``x_spark.functions``  column-level helpers (portable hashing, vectors,
                         text metrics)
- ``x_spark.streaming``  Structured Streaming equivalents for the events
                         table
"""

from x_spark.session import get_session  # noqa: F401
from x_spark.plans.etl import init_etl_job  # noqa: F401
from x_spark.operators.recon import init_recon_job  # noqa: F401
from x_spark.errors import JobConfigException  # noqa: F401

__version__ = "0.1.0"
