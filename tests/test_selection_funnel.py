"""Selection funnel: monotone survivors, stage-3 = min(K, eligible)."""

from __future__ import annotations

from conftest import SF_SMOKE

from mmeds_meta_spark.operators.pipeline import _SEL_K, pipeline_selection_funnel
from mmeds_meta_spark.operators.sampling import _DSIR_TARGET


def test_selection_funnel_shape(spark):
    rows = {r.stage: r for r in pipeline_selection_funnel(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    names = [rows[i].stage_name for i in range(4)]
    assert names == ["raw", "lang", "quality", "dsir_topk"]
    docs = [rows[i].n_docs for i in range(4)]
    toks = [rows[i].n_tokens for i in range(4)]
    assert docs[0] >= docs[1] >= docs[2] >= docs[3]  # cumulative funnel
    assert toks[0] >= toks[1] >= toks[2] >= toks[3]
    assert rows[0].pct_of_raw == 1.0
    assert rows[3].pct_of_raw <= rows[2].pct_of_raw

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert docs[0] == d.count()
    en = d.filter("lang = 'en'")
    assert docs[1] == en.count()
    # stage 3 keeps exactly min(K, eligible): eligible = stage-2 survivors
    # that are DSIR candidates (non-target source)
    elig_ub = en.filter(f"source <> '{_DSIR_TARGET}'").count()
    assert docs[3] <= min(_SEL_K, docs[2], elig_ub)
    assert docs[3] > 0
