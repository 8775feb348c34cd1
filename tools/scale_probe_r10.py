"""Round-10 scaling probes (round-9 verdict #6 + #4 done-criteria).

1. **Host-vocabulary axis for the web family.**  Earlier probes
   duplicated documents, which grows edge WEIGHTS but not |hosts|;
   harmonic centrality's min-plus distance relation is the one plan
   whose state is quadratic in a DATA-DEPENDENT vocabulary.  Here the
   host vocabulary itself grows (1x/8x/64x distinct hosts) with a
   hub-skewed synthetic graph fed through the ``edges=`` passthrough —
   measuring both wall time and the materialized distance-relation row
   count so the knee (or its absence) is visible in STATE, not just
   seconds.
2. **KM blocked-fold linearity at T = 10⁵ distinct durations** (the
   round-9 verdict's #4 done-criterion): synthetic lifetimes with 10⁴
   vs 10⁵ distinct integer-hour durations through
   ``km_from_lifetimes`` — the round-9 per-row collect_list form was
   quadratic in T; the blocked fold must scale ~linearly.

Usage: python tools/scale_probe_r10.py
Prints markdown rows for SCALE_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

import pyspark.sql.functions as F  # noqa: E402

from mmeds_meta_spark.operators.web import (  # noqa: E402
    web_host_harmonic,
    web_host_harmonic_hll,
    web_host_pagerank,
)
from mmeds_meta_spark.operators.stats import km_from_lifetimes  # noqa: E402
from mmeds_meta_spark.session import get_spark  # noqa: E402

HOST_SCALES = (1_000, 8_000, 64_000)
EDGES_PER_HOST = 8  # mean out-degree; hub gets ~3% of all edges


def synth_host_edges(spark, n_hosts: int):
    """Hub-skewed host graph: every host links to EDGES_PER_HOST
    deterministic targets; ~30% of hosts also link to a global hub —
    the same inlink-skew shape as the gated synthetic workload, at a
    chosen vocabulary size."""
    e = (
        spark.range(n_hosts * EDGES_PER_HOST)
        .selectExpr(
            f"concat('h', id div {EDGES_PER_HOST}) AS src_host",
            f"CASE WHEN id % 10 < 3 THEN 'hub'"
            f" ELSE concat('h', (id * 7 + 11) % {n_hosts}) END AS dst_host",
        )
        .filter("src_host <> dst_host")
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    return e


def probe_web(spark):
    # "state rows" is the materialized distance-relation cardinality for
    # harmonic (Σ n_reach = |{(u,v): d(u→v) ≤ hops}| — the quantity that
    # is quadratic in a data-dependent vocabulary) and |edges| for
    # pagerank (its per-iteration state is |edges|-bounded by design).
    print("\n| op | hosts | edges | wall (min of 2) | state rows |")
    print("|---|---|---|---|---|")
    for n in HOST_SCALES:
        edges = synth_host_edges(spark, n)
        n_edges = edges.count()
        for name, fn in (
            ("web_host_pagerank", web_host_pagerank),
            ("web_host_harmonic", web_host_harmonic),
            ("web_host_harmonic_hll", web_host_harmonic_hll),
        ):
            walls = []
            state = n_edges
            for _ in range(2):
                t0 = time.time()
                out = fn(spark, "unused", edges=edges)
                if name == "web_host_harmonic":
                    state = out.agg(F.sum("n_reach")).collect()[0][0]
                elif name == "web_host_harmonic_hll":
                    # sketch state: ≤ |hosts| × 256 sparse register rows
                    state = out.count() * 256
                else:
                    out.count()
                walls.append(time.time() - t0)
            print(
                f"| {name} | {n:,} | {n_edges:,} |"
                f" {min(walls):.2f} s | {state:,} |"
            )
        edges.unpersist()


def probe_km(spark):
    print("\n| op | distinct durations T | wall (min of 2) |")
    print("|---|---|---|")
    for t_card in (10_000, 100_000):
        # one user per duration hour: T distinct durations, T users
        life = spark.range(t_card).selectExpr(
            "id AS user_id",
            "CAST(0 AS LONG) AS t0",
            "(id + 1) * 3600000000 AS tn",
            "CASE WHEN id % 3 = 0 THEN (id + 1) * 3600000000 END AS tp",
        )
        walls = []
        for _ in range(2):
            t0 = time.time()
            n = km_from_lifetimes(life).count()
            walls.append(time.time() - t0)
        assert n == t_card
        print(f"| d18 km_from_lifetimes | {t_card:,} | {min(walls):.2f} s |")


if __name__ == "__main__":
    spark = get_spark()
    probe_web(spark)
    probe_km(spark)
