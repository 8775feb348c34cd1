"""Decontamination quality: measured per-modality detection rates on a
planted-leak fixture (the decon mirror of test_ann_recall /
test_dedup_recall — round-7 verdict item 7).

The exactness oracles prove the decon plans are deterministic; this
suite proves the MODALITY CLAIMS are measured, turning
pipeline_decontam_report's agreement column into a calibrated
instrument:

* exact copies         → n-gram ∧ fuzzy-MinHash ∧ Bloom all catch them;
* light paraphrases    → the surface modalities still catch them
  (≥80% of 2-gram shingles survive 3 token substitutions in 40);
* HEAVY paraphrases    → zero shared 2-grams: every surface modality
  must MISS them, and the embedding modality must catch them — the
  documented reason decon_embedding_cosine exists;
* clean docs           → no modality flags them (Bloom's one-sided
  false-positive rate is negligible at this filter load).

Benchmark membership follows each operator's deterministic stand-in:
doc_id ≡ 0 (mod 101) for n-gram/Bloom, mod 7 for fuzzy — bench ids here
are multiples of 707 so ONE fixture serves all three; corpus ids avoid
both moduli.  vec_id ≡ 0 (mod 50) for the embedding side.
"""

from __future__ import annotations

import pytest

from mmeds_meta_spark.operators import registry

REG = registry()

_B1 = [f"alpha{i:02d}" for i in range(40)]
_B2 = [f"bravo{i:02d}" for i in range(40)]
_B3 = [f"civic{i:02d}" for i in range(40)]


def _light(toks):
    # 3 spaced substitutions in 40 tokens: kills ≤6 of 39 bigrams
    out = list(toks)
    for j, pos in enumerate((5, 18, 31)):
        out[pos] = f"subst{j}"
    return out


def _heavy(toks):
    # same "meaning" slot-for-slot, zero shared surface vocabulary
    return [f"para_{t}" for t in toks]


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("deconrecall")
    benches = {707: _B1, 1414: _B2, 2121: _B3}
    exact = {9: _B1, 10: _B2, 11: _B3}
    light = {12: _light(_B1), 13: _light(_B2), 15: _light(_B3)}
    heavy = {16: _heavy(_B1), 17: _heavy(_B2), 18: _heavy(_B3)}
    clean = {19: [f"delta{i:02d}" for i in range(40)],
             20: [f"echo{i:02d}" for i in range(40)],
             22: [f"forte{i:02d}" for i in range(40)]}
    rows = []
    for group in (benches, exact, light, heavy, clean):
        for doc_id, toks in group.items():
            text = " ".join(toks)
            rows.append((doc_id, text, "xx", "srcR", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    # embeddings: bench at vec_id % 50 == 0; planted leaks (ids 1-9) sit
    # next to their bench vector; clean (ids 11-13) are orthogonal
    dim = 64

    def vec(axis, eps):
        v = [0.05] * dim
        v[axis] = 1.0
        v[(axis + 1) % dim] = eps
        return [float(x) for x in v]

    erows = []
    for k, bid in enumerate((50, 100, 150)):
        erows.append((bid, vec(k, 0.0), 0))           # bench
        for j in range(3):                             # exact/light/heavy stand-ins
            erows.append((1 + 3 * k + j, vec(k, 0.1 * (j + 1)), 1))
    for j, cid in enumerate((11, 12, 13)):
        erows.append((cid, vec(20 + j, 0.0), 2))       # clean: far axes
    spark.createDataFrame(
        erows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


EXACT, LIGHT, HEAVY, CLEAN = {9, 10, 11}, {12, 13, 15}, {16, 17, 18}, {19, 20, 22}


def _flagged(spark, name, sf):
    return {r.doc_id for r in REG[name].spark(spark, sf).collect()}


def test_ngram_modality_rates(spark, planted_sf):
    got = _flagged(spark, "decon_ngram_overlap", planted_sf)
    assert EXACT <= got, "exact copies must all be caught"
    assert LIGHT <= got, "light paraphrases keep >=80% shingles"
    assert not (HEAVY & got), "no shared 2-grams -> surface modality blind"
    assert not (CLEAN & got)


def test_fuzzy_modality_rates(spark, planted_sf):
    got = _flagged(spark, "decon_fuzzy_minhash", planted_sf)
    assert EXACT <= got
    # exact-Jaccard >= 0.5 after 3 substitutions (~0.73): all three
    assert LIGHT <= got
    assert not (HEAVY & got)
    assert not (CLEAN & got)


def test_bloom_modality_rates(spark, planted_sf):
    got = _flagged(spark, "decon_bloom_filter", planted_sf)
    assert EXACT <= got
    assert LIGHT <= got
    assert not (HEAVY & got)
    assert not (CLEAN & got)


def test_embedding_modality_catches_heavy_paraphrase(spark, planted_sf):
    rows = REG["decon_embedding_cosine"].spark(spark, planted_sf).collect()
    flagged = {r.vec_id for r in rows if r.is_contaminated}
    planted = set(range(1, 10))
    assert planted <= flagged, "every planted paraphrase vector must be caught"
    assert not ({11, 12, 13} & flagged), "clean vectors stay clean"


def test_agreement_counts_calibrated(spark, planted_sf):
    """The composed report's agreement column reflects the measured
    modality physics: exact copies and light paraphrases carry FULL
    surface agreement (3/3 modalities), heavy paraphrases and clean
    docs never appear (zero surface modalities fire)."""
    rep = {
        r.doc_id: r
        for r in REG["pipeline_decontam_report"].spark(spark, planted_sf).collect()
    }
    for doc_id in EXACT | LIGHT:
        r = rep[doc_id]
        assert r.n_modalities == 3, (doc_id, r)
        assert r.ngram_hit and r.bloom_hit and r.fuzzy_hit
    assert not ((HEAVY | CLEAN) & set(rep)), "surface-blind docs must not appear"
