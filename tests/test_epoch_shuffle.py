"""Epoch shuffle: permutation, determinism, and epoch-independence."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sampling import (
    _EPOCH_SHARDS,
    _EPOCHS,
    sample_epoch_shuffle,
)


def test_each_epoch_is_a_permutation(spark):
    docs = {r.doc_id for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id").collect()}
    rows = sample_epoch_shuffle(spark, SF_SMOKE).collect()
    assert len(rows) == len(docs) * _EPOCHS
    for e in range(_EPOCHS):
        ep = [r for r in rows if r.epoch == e]
        # every doc exactly once per epoch
        assert {r.doc_id for r in ep} == docs
        # positions are dense 0..n-1 within each shard
        for s in range(_EPOCH_SHARDS):
            poss = sorted(r.pos for r in ep if r.shard == s)
            assert poss == list(range(len(poss)))


def test_epochs_differ_and_rerun_is_identical(spark):
    a = sample_epoch_shuffle(spark, SF_SMOKE).collect()
    b = sample_epoch_shuffle(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_epoch = {}
    for r in a:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.pos)
    e0, e1 = by_epoch[0], by_epoch[1]
    # the two epochs are different permutations (some doc moves)
    assert any(e0[d] != e1[d] for d in e0)
