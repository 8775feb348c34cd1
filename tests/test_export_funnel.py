"""pipeline_export_funnel: stage invariants + independent pure-Python
recomputation of the packing, sharding, and checksum arithmetic.

The funnel's contract is that pack/shuffle/shard are content-preserving:
doc count, BPE token total, and the 60-bit order-independent checksum
must be IDENTICAL on every stage row.  The recomputation trusts Spark
only for the BPE token counts (covered by test_bpe.py and the
text_bpe_token_count oracle) and re-derives everything downstream —
bucket assignment, md5-order packing, batch shuffle keys, shard bytes,
fingerprints — in plain Python.
"""

from __future__ import annotations

import hashlib

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.pipeline import _EXP_EPOCH, _FP_MOD
from mmeds_meta_spark.operators.sampling import (
    _EPOCH_SHARDS,
    _PACK_BUCKETS,
    _PACK_BUDGET,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _expected(docs, tok):
    """docs: {doc_id: text}; tok: {doc_id: n_bpe_tokens} (docs with >=1 word)."""
    buckets: dict[int, list[int]] = {}
    for doc_id in tok:
        b = int(_md5(str(doc_id))[:2], 16) % _PACK_BUCKETS
        buckets.setdefault(b, []).append(doc_id)
    batch_of: dict[int, tuple[int, int]] = {}
    for b, ids in buckets.items():
        ids.sort(key=lambda i: (_md5(str(i)), i))
        cum = 0
        for i in ids:
            batch_of[i] = (b, cum // _PACK_BUDGET)
            cum += tok[i]
    checksum = 0
    shards = set()
    for doc_id, (b, k) in batch_of.items():
        bk = _md5(f"{_EXP_EPOCH}:{b}:{k}")
        shards.add(int(bk[:2], 16) % _EPOCH_SHARDS)
        fp = int(_md5(f"{doc_id}:{_md5(docs[doc_id])}:{tok[doc_id]}")[:15], 16)
        checksum = (checksum + fp) % _FP_MOD
    return {
        "n_docs": len(tok),
        "n_bpe_tokens": sum(tok.values()),
        "checksum": checksum,
        "n_batches": len(set(batch_of.values())),
        "n_shards": len(shards),
    }


def test_export_funnel_invariants_and_recomputation(spark):
    from mmeds_meta_spark.operators import registry

    reg = registry()
    rows = sorted(
        reg["pipeline_export_funnel"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage_name for r in rows] == [
        "tokenize",
        "pack",
        "shuffle_shard",
        "manifest",
    ]
    # content-preservation invariant: identical on every stage row
    assert len({r.n_docs for r in rows}) == 1
    assert len({r.n_bpe_tokens for r in rows}) == 1
    assert len({r.checksum for r in rows}) == 1
    assert 0 <= rows[0].checksum < _FP_MOD

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    tok = {
        r.doc_id: r.n_bpe_tokens
        for r in reg["text_bpe_token_count"].spark(spark, SF_SMOKE).collect()
    }
    exp = _expected(docs, tok)
    assert rows[0].n_docs == exp["n_docs"]
    assert rows[0].n_bpe_tokens == exp["n_bpe_tokens"]
    assert rows[0].checksum == exp["checksum"]
    assert rows[0].n_units == exp["n_docs"]          # tokenize: doc units
    assert rows[1].n_units == exp["n_batches"]       # pack: batch units
    assert rows[2].n_units == exp["n_shards"]        # shuffle: shard units
    assert rows[3].n_units == 1                      # manifest
    # units strictly compress through the funnel at fixture scale
    assert rows[0].n_units > rows[1].n_units > rows[2].n_units >= rows[3].n_units
