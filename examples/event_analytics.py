#!/usr/bin/env python
"""Event-analytics walkthrough over the events table: ordered funnel,
retention cohorts, the minute→hour→day rollup cascade, anomaly tiers
(robust median/MAD outliers, CUSUM drift detection, interpolated
gap-fill), and a streaming twin of the tumbling-window aggregate
drained with availableNow.
Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyconnect_spark.catalog import load_table
from pyconnect_spark.operators.extended import x39
from pyconnect_spark.operators.timeseries import ts06, ts07, ts09, ts17, ts18
from pyconnect_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-event-analytics", cores=8)

    print("== funnel (view -> click -> purchase) ==")
    ts06(spark, sf_dir).show()

    print("== retention cohorts (first 5 cohorts) ==")
    ts07(spark, sf_dir).orderBy("cohort_date", "day_offset").show(5)

    print("== rollup cascade: day-level from minute partials ==")
    ts09(spark, sf_dir).orderBy("day", "event_type").show(10)

    print("== anomaly tiers: robust outliers (median/MAD) per type ==")
    x39(spark, sf_dir).orderBy("event_type").show()

    print("== drift: one-sided CUSUM over hourly means ==")
    ts18(spark, sf_dir).orderBy("event_type").show()

    print("== gap-fill: linear interpolation on the hourly grid (sample) ==")
    ts17(spark, sf_dir).filter(F.col("interpolated")).orderBy(
        "event_type", "slot_start"
    ).show(5)

    print("== streaming twin: tumbling 5-min counts via availableNow ==")
    tmp = tempfile.mkdtemp(prefix="example-events-")
    try:
        staged = os.path.join(tmp, "events")
        load_table(spark, sf_dir, "events").repartition(4).write.parquet(staged)
        schema = spark.read.parquet(staged).schema
        q = (
            spark.readStream.schema(schema)
            .parquet(staged)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("example_stream")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.sql(
            "SELECT window.start, event_type, n FROM example_stream "
            "ORDER BY start, event_type"
        ).show(8)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
