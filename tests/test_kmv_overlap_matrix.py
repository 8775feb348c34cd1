"""KMV overlap matrix: saturation-branch exactness + corpus invariants."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.sketches import _K, sketch_kmv_overlap_matrix


def _shingles(text):
    t = text.split(" ")
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_saturated_sample_is_exact(spark, tmp_path):
    """Fewer than k distinct shingles → the estimates ARE set arithmetic."""
    rows = [
        (1, "alpha a b c d e", "en", "s1", 15),
        (2, "alpha a b c x y", "en", "s2", 15),  # shares 'alpha a b', 'a b c'
        (3, "p q r s t u", "en", "s3", 11),  # disjoint from s1/s2
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf_fixture")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    by_src = {r[3]: _shingles(r[1]) for r in rows}
    out = {(r.src_a, r.src_b): r for r in sketch_kmv_overlap_matrix(spark, d).collect()}
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for (a, b), r in out.items():
        union = by_src[a] | by_src[b]
        inter = by_src[a] & by_src[b]
        assert len(union) < _K  # saturated: exact branch must be taken
        assert r.n_pair_sample == len(union)
        assert r.n_both == len(inter)
        assert r.est_union == float(len(union))
        assert r.est_intersection == float(len(inter))
        exp_j = round(len(inter) / len(union), 6) if union else 0.0
        assert r.est_jaccard == exp_j
    assert out[("s1", "s2")].n_both == 2
    assert out[("s1", "s3")].n_both == 0


def test_corpus_invariants(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_src = docs.select("source").distinct().count()
    rows = sketch_kmv_overlap_matrix(spark, SF_SMOKE).collect()
    assert len(rows) == n_src * (n_src - 1) // 2  # every unordered pair once
    for r in rows:
        assert r.src_a < r.src_b
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.n_both <= r.n_pair_sample
        assert r.est_intersection <= r.est_union
