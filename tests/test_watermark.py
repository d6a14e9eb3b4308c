"""Watermark semantics: late rows are dropped once the watermark has
passed their window — demonstrated deterministically with two
micro-batches (file mtimes order the batches, one file per trigger).
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _write(path: str, minutes: list[int], mtime: int) -> None:
    ts = pd.to_datetime(
        [f"2024-01-01 {m // 60:02d}:{m % 60:02d}:00" for m in minutes]
    ).astype("datetime64[us]")
    table = pa.Table.from_pandas(
        pd.DataFrame({"ts": ts, "v": list(range(len(minutes)))}),
        preserve_index=False,
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    # Spark filters late rows against the watermark of the PREVIOUS
    # batch boundary (SPARK-24634 two-watermark design: late-filter lags
    # eviction by one batch), so the drop needs three batches:
    # batch 0 advances event time to 100min (watermark 90min),
    # batch 1 lets that watermark become the late-filter bound,
    # batch 2 delivers the late row at 5min -> dropped.
    _write(str(src / "a.parquet"), [2, 50, 100], mtime=1_000)
    _write(str(src / "b.parquet"), [101], mtime=2_000)
    _write(str(src / "c.parquet"), [5, 106], mtime=3_000)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("wm_test").collect()
    rows = {r.start.strftime("%H:%M"): r.n for r in out}
    # [0,10) emitted once with ONLY the on-time row — the 5min row
    # arrived after the late-filter watermark passed its window
    assert rows.get("00:00") == 1
    assert len(out) == len(rows)  # append mode: no window emitted twice
    # [50,60) closed and emitted; [100,110) still open at termination
    assert rows.get("00:50") == 1
    assert "01:40" not in rows
    # the state operator actually counted a watermark drop
    dropped = sum(
        so["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1
