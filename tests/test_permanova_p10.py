"""D4 PERMANOVA + P10 WHERE-clause guard."""

from __future__ import annotations

import pytest

from mmeds_meta_spark.functions import permanova
from mmeds_meta_spark.operators.diversity import d2_bray_curtis
from mmeds_meta_spark.plans.query import extract_columns_from_where

from conftest import SF_SMOKE


def test_permanova_separated_groups(spark):
    # two tight, well-separated clusters → large F, tiny p
    rows, groups = [], []
    for i in range(6):
        for j in range(i + 1, 6):
            same = (i < 3) == (j < 3)
            rows.append((f"s{i}", f"s{j}", 0.05 if same else 0.9))
    for i in range(6):
        groups.append((f"s{i}", "A" if i < 3 else "B"))
    d = spark.createDataFrame(rows, "ua string, ub string, distance double")
    g = spark.createDataFrame(groups, "sample_id string, grp string")
    res = permanova(d, g, n_permutations=199, seed=1)
    assert res.pseudo_f > 10
    assert res.p_value <= 0.11  # only C(6,3)=20 distinct label splits
    assert res.n_samples == 6 and res.n_groups == 2


def test_permanova_on_real_braycurtis(spark):
    d = d2_bray_curtis(spark, SF_SMOKE).withColumnRenamed("bray_curtis", "distance")
    ids = d.selectExpr("ua AS sample_id").union(d.selectExpr("ub")).distinct()
    g = ids.selectExpr("sample_id", "CASE WHEN sample_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp")
    res = permanova(d, g, n_permutations=99, seed=2)
    # random labels → no real structure expected
    assert 0.0 < res.p_value <= 1.0
    assert res.n_groups == 2


def test_where_guard_accepts_reference_shapes():
    assert extract_columns_from_where('PrimaryInvestigator = "Amy Poehler"') == [
        "PrimaryInvestigator"
    ]
    assert extract_columns_from_where("A = 1 AND B != 'x' OR C <= 5") == ["A", "B", "C"]


@pytest.mark.parametrize(
    "bad",
    [
        "A BETWEEN 1 AND 2",
        "A LIKE 'x%'",
        "A IN (1, 2)",
        "1 = ; DROP TABLE x",
    ],
)
def test_where_guard_rejects(bad):
    with pytest.raises(ValueError):
        extract_columns_from_where(bad)
