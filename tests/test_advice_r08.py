"""Round-8 advice regressions: engine parity and well-defined empties
off the happy path.

1. ``w18_markov_removal`` on a feed whose transitions never contain the
   hardcoded start state ('view'): Spark's
   ``element_at(x, array_position(sts, 'view'))`` would raise on
   position 0 while the DuckDB oracle's final ``f.state = 'view'`` join
   just returns zero rows — both engines must now degrade to an empty
   result.
2. Batch-keyed parquet stores (streaming twins) probed BEFORE the first
   micro-batch commits: ``spark.read.parquet`` on an empty directory
   raises unable-to-infer-schema; the shared ``read_store`` helper must
   return an EMPTY relation with the pinned schema instead, for every
   store reader.
3. ``d2_jaccard_beta`` must not leave an entry in the session cache
   manager (the old ``.cache()`` was never unpersisted, leaking storage
   blocks across bench passes / pipeline_core_metrics invocations).
"""

from __future__ import annotations

import duckdb

from mmeds_meta_spark.operators import registry

REG = registry()


def _events_sf(spark, tmp_path_factory, types, name):
    """A tiny sf dir whose events feed uses only ``types``."""
    d = tmp_path_factory.mktemp(name)
    rows = [
        (i, f"2024-01-0{1 + i % 7} 0{i % 10}:00:00", i % 5, types[i % len(types)], float(i), "{}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts_s AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_markov_removal_without_start_state(spark, tmp_path_factory):
    # no 'view' events at all -> start state absent from the transition
    # matrix -> both engines must yield ZERO rows (not a runtime error)
    sf = _events_sf(
        spark, tmp_path_factory, ["click", "cart", "purchase", "search"], "nostart"
    )
    spec = REG["w18_markov_removal"]
    s_rows = spec.spark(spark, sf).collect()
    assert s_rows == []
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    assert con.sql(spec.oracle).fetchall() == []


def test_markov_removal_still_exact_with_start_state(spark, tmp_path_factory):
    # the guard must not change behavior when 'view' IS present
    sf = _events_sf(
        spark, tmp_path_factory, ["view", "click", "cart", "purchase"], "withstart"
    )
    spec = REG["w18_markov_removal"]
    df = spec.spark(spark, sf)
    s = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    rel = con.sql(spec.oracle)
    assert [c.lower() for c in rel.columns] == [c.lower() for c in df.columns]
    d = sorted(tuple(r) for r in rel.fetchall())
    assert s == d
    assert s, "expected at least one removable state"


def test_read_store_empty_is_well_defined(spark, tmp_path):
    from mmeds_meta_spark.streaming._store import read_store

    # directory absent
    df = read_store(spark, str(tmp_path / "nope"), "pos BIGINT")
    assert df.columns == ["pos"] and df.collect() == []
    # directory present but no committed batch partition yet
    (tmp_path / "store").mkdir()
    df2 = read_store(spark, str(tmp_path / "store"), "a STRING, b BIGINT")
    assert df2.columns == ["a", "b"] and df2.collect() == []


def test_all_store_readers_survive_unfed_store(spark, tmp_path):
    from mmeds_meta_spark.streaming.anomaly import store_baseline
    from mmeds_meta_spark.streaming.decon_bloom import bloom_store_bits
    from mmeds_meta_spark.streaming.diversity import diversity_store_counts
    from mmeds_meta_spark.streaming.export import export_manifest_from_store
    from mmeds_meta_spark.streaming.mixture import mixture_store_counts
    from mmeds_meta_spark.streaming.quantile import hist_store_counts
    from mmeds_meta_spark.streaming.sketches import cms_store_counters

    probes = [
        bloom_store_bits,
        diversity_store_counts,
        export_manifest_from_store,
        mixture_store_counts,
        hist_store_counts,
        cms_store_counters,
        store_baseline,
    ]
    for fn in probes:
        out = fn(spark, str(tmp_path / fn.__name__))
        assert out.collect() == [], fn.__name__


def test_read_store_roundtrips_a_fed_store(spark, tmp_path):
    from mmeds_meta_spark.streaming._store import read_store

    store = tmp_path / "fed"
    spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT").coalesce(
        1
    ).write.parquet(str(store / "batch_id=0"))
    spark.createDataFrame([(3, 30)], "k INT, v INT").coalesce(1).write.parquet(
        str(store / "batch_id=1")
    )
    got = sorted(
        tuple(r) for r in read_store(spark, str(store), "k INT, v BIGINT").collect()
    )
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_jaccard_beta_leaves_no_cache_entry(spark):
    spark.catalog.clearCache()
    REG["d2_jaccard_beta"].spark(spark, "/root/testdata/sf0.001").collect()
    # the old .cache() registered the feats plan in the session cache
    # manager and never unpersisted it; localCheckpoint leaves the cache
    # manager untouched
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
