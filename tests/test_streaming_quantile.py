"""Streaming histogram-quantile store: batch bit-identity + clamping."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sketches import (
    hist_bin_counts,
    hist_quantiles_from_counts,
    hist_values,
)
from mmeds_meta_spark.streaming.quantile import (
    hist_store_counts,
    hist_store_quantiles,
    init_hist_store,
    start_streaming_hist,
)


def test_streaming_matches_batch_bit_identical(spark, tmp_path):
    """Two micro-batches through the store == one batch pass, exactly."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    # two plain files → two availableNow micro-batches (the file source
    # lists files, not directories)
    for name, pred in (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1")):
        out = tmp_path / f"half_{name}"
        ev.where(pred).coalesce(1).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, feed / f"{name}.parquet")

    vals = hist_values(ev)
    bounds = vals.groupBy("grp").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    store = str(tmp_path / "store")
    init_hist_store(bounds, store)

    q = start_streaming_hist(spark, str(feed), store, str(tmp_path / "ck"))
    q.awaitTermination(180)

    batch = {
        (r.grp, r.p): r
        for r in hist_quantiles_from_counts(hist_bin_counts(vals, bounds), bounds).collect()
    }
    stream = {(r.grp, r.p): r for r in hist_store_quantiles(spark, store).collect()}
    assert set(stream) == set(batch) and batch
    for k, b in batch.items():
        s = stream[k]
        assert s.n == b.n
        assert s.est == b.est  # bit-identical, not approximately equal
        assert s.err_bound == b.err_bound

    # the merged store is the exact linear sum of the two batch partials
    merged = {
        (r.grp, r.bin): r.c for r in hist_store_counts(spark, store).collect()
    }
    direct = {
        (r.grp, r.bin): r.c for r in hist_bin_counts(vals, bounds).collect()
    }
    assert merged == direct


def test_pinned_domain_clamps_out_of_range(spark, tmp_path):
    """Values outside the pinned domain land in the edge bins (bounded
    state) instead of growing the counter table."""
    rows = [(i, "a", float(v)) for i, v in enumerate([-5.0, 0.0, 1.0, 2.0, 99.0])]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    # pin [0, 2] in micro-units: -5.0 clamps to bin 0, 99.0 to bin 63
    bounds = spark.createDataFrame([("a", 0, 2_000_000)], "grp string, lo long, hi long")
    counts = {r.bin: r.c for r in hist_bin_counts(hist_values(ev), bounds).collect()}
    assert sum(counts.values()) == 5
    assert min(counts) >= 0 and max(counts) == 63
    assert counts[0] == 2  # -5.0 clamped + 0.0 in-range
    assert counts[63] >= 1  # 99.0 clamped into the top edge bin
