"""Bucketed-table co-located join: pre-bucketing both sides of a
recurring join on its key eliminates the per-query shuffle — the
at-rest layout strategy for 100 TB fact/fact joins (SURVEY §4 /
pyspark guide). The test pins the plan property: bucketed join has NO
shuffle exchange; the same join unbucketed has two.
"""

from pyspark.sql import functions as F


def _count_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_avoids_shuffle(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("okey"), (F.col("id") % 97).alias("ototal")
    )
    lines = spark.range(0, 8000).select(
        (F.col("id") % 2000).alias("okey"), (F.col("id") % 13).alias("qty")
    )
    nb = 8
    (orders.write.bucketBy(nb, "okey").sortBy("okey").saveAsTable("b_orders"))
    (lines.write.bucketBy(nb, "okey").sortBy("okey").saveAsTable("b_lines"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = spark.table("b_orders").join(spark.table("b_lines"), "okey")
        assert _count_exchanges(bucketed) == 0
        unbucketed = orders.join(lines, "okey")
        assert _count_exchanges(unbucketed) >= 2
        # same result either way
        assert bucketed.count() == unbucketed.count() == 8000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
