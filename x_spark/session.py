"""SparkSession construction tuned for this engine.

Defaults follow the public Spark performance guidance: AQE on (runtime
re-planning, skew-join handling, partition coalescing), shuffle
partitions sized to the machine rather than the 200 default, Arrow
enabled for any pandas interchange, UTC session timezone so timestamp
semantics match the DuckDB oracle.

On a real cluster these same configs apply; only ``master`` and the
memory knobs change. Nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet dynamic partition overwrite — the Spark-native equivalent of
    # Delta's replaceWhere for partition-scoped overwrite (SURVEY §2.2 W2).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # the txlog Python DataSource implements pushFilters(); Spark
    # refuses to initialize such readers unless pushdown is enabled
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "x_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Return the active session or build one with engine defaults.

    Mirrors the reference's reliance on ``SparkSession.getActiveSession()``
    (etl/parent.py:92) but can bootstrap its own local session when none
    exists (the reference assumes Databricks provides one).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master.startswith("local"):
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    for k, v in _DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver testdata table (TESTDATA.md) as a DataFrame.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as long nanos and convert to a
    microsecond timestamp (bit-identical to DuckDB's ns->us cast for
    this data). The conf is a runtime SQL conf, so this works in any
    caller-provided session.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dtype == "timestamp_ntz":
            # Spark 4.1+ reads TIMESTAMP(NANOS) natively as NTZ; the
            # session timezone is pinned UTC, so this cast is exact and
            # keeps `ts` usable for watermarks/unix_micros (both reject
            # TIMESTAMP_NTZ).
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
