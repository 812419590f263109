"""Profile the streaming throughput probe across pipeline configs.

Round-9 (VERDICT r8 task 4): the driver's streaming number drifted
133.0k (r7) -> 93.7k rows/s (r8) on unchanged code. This harness runs
the same generator -> watermark -> 1 s window -> memory sink pipeline
under a matrix of the knobs that matter (rate-source partitions, state
partitions, trigger interval) and reports per-batch rates (median /
mean / best) so the drift can be attributed: a CODE regression shifts
every config; CONTENTION shows up as high batch-rate variance at
identical configs.

Usage: python tools/stream_profile.py [seconds_per_run]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIELDS = [
    {"name": "id", "type": "string"},
    {"name": "event_type", "type": "string"},
    {"name": "amount", "type": "double"},
    {"name": "quantity", "type": "int"},
]


def run_probe(
    spark,
    target_rps: int,
    seconds: float,
    rate_partitions: int | None,
    state_parts: int,
    trigger_s: int,
) -> dict:
    from pyspark.sql import functions as F

    from pipegen_spark.generator.synthetic import avro_field_value
    from pipegen_spark.streaming.filesource import state_partitions

    with state_partitions(spark, n=state_parts):
        reader = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", target_rps)
        )
        if rate_partitions is not None:
            reader = reader.option("numPartitions", rate_partitions)
        base = reader.load()
        cols = [
            avro_field_value(f, F.col("value"), 42 + i).alias(f["name"])
            for i, f in enumerate(FIELDS)
        ]
        stream = base.select(F.col("timestamp").alias("_emit_ts"), *cols)
        agg = (
            stream.withWatermark("_emit_ts", "2 seconds")
            .groupBy(F.window("_emit_ts", "1 second"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("amount").alias("amt"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(f"profile_{int(time.time() * 1000)}")
            .outputMode("update")
            .trigger(processingTime=f"{trigger_s} seconds")
            .start()
        )
        try:
            time.sleep(seconds)
            progress = list(q.recentProgress)
        finally:
            spark.sparkContext.setLogLevel("FATAL")
            try:
                q.stop()
            finally:
                spark.sparkContext.setLogLevel("ERROR")
    rates = [
        1000.0 * int(p["numInputRows"]) / max(float(p["batchDuration"]), 1.0)
        for p in progress[1:]
        if int(p["numInputRows"]) > 0
    ]
    if not rates:
        return {"batches": 0}
    return {
        "batches": len(rates),
        "median_rps": round(statistics.median(rates), 1),
        "mean_rps": round(statistics.fmean(rates), 1),
        "best_rps": round(max(rates), 1),
        "worst_rps": round(min(rates), 1),
    }


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    from pipegen_spark.session import get_spark

    spark = get_spark()
    # warm the streaming machinery once (state store, codegen)
    run_probe(spark, 50_000, 4, None, 8, 1)

    matrix = [
        # (label, rate_partitions, state_parts, trigger_s)
        ("baseline r8 (rate=default, state=8, 1s)", None, 8, 1),
        ("rate=8", 8, 8, 1),
        ("rate=4", 4, 8, 1),
        ("state=4", None, 4, 1),
        ("rate=8 state=4", 8, 4, 1),
        ("trigger=2s", None, 8, 2),
        ("rate=8 trigger=2s", 8, 8, 2),
    ]
    out = {}
    for label, rp, sp, tr in matrix:
        r = run_probe(spark, 50_000, seconds, rp, sp, tr)
        out[label] = r
        print(f"{label}: {json.dumps(r)}", flush=True)
    # repeat baseline to expose run-to-run variance at identical config
    r = run_probe(spark, 50_000, seconds, None, 8, 1)
    out["baseline repeat"] = r
    print(f"baseline repeat: {json.dumps(r)}", flush=True)


if __name__ == "__main__":
    main()
