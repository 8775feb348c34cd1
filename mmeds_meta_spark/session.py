"""SparkSession factory tuned for the engine.

Local testing runs ``local[N]``; the same configs are what we would ship on
a multi-executor cluster: AQE on (runtime re-planning, skew-join handling,
partition coalescing), a shuffle-partition count sized to the cluster, and
Arrow for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of cores the driver/harness gives us; shuffle partitions follow.
_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "mmeds-meta-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard configs.

    At 100 TB the only values that change are ``shuffle.partitions`` (sized
    to ~2-3x total cluster cores) and ``maxPartitionBytes``; everything else
    (AQE, skew handling, Arrow, UTC session TZ) is scale-independent.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    n = cpus or _CPUS
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is BYTE-targeted; a CPU-dense stage over
        # byte-light rows can be coalesced down to a serial handful of
        # partitions.  Global floor sweeps were measured this round
        # (64k / 256k / 1m at sf0.1): no single floor wins — smaller
        # floors fix the CPU-dense stages (simjoin −2.4 s) but tax every
        # many-tiny-stage fixpoint/funnel with extra task overhead
        # (headline +1.8 s at 256k) — so the default stays the stock 1m
        # and the known CPU-dense spots pin their parallelism
        # structurally (e.g. simjoin's pre-groupBy repartition, which
        # shares the aggregation exchange).  The env knob remains for
        # cluster-side experimentation.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Some driver data generations encoded events.ts as TIMESTAMP(NANOS);
        # this flag makes such files readable (as long ns) instead of erroring.
        # It is a no-op for µs timestamps.  Consumers never assume either
        # encoding — they dispatch on dtype via functions/event_time.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bench.py sets SPARK_GRAFT_NO_PROGRESS: its stdout must carry
        # exactly one JSON line, and the console-progress '\r' frames
        # share stdout (they broke the driver's BENCH_r06 tail parse)
        .config(
            "spark.ui.showConsoleProgress",
            "false" if os.environ.get("SPARK_GRAFT_NO_PROGRESS") else "true",
        )
        .getOrCreate()
    )
