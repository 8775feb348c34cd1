"""D4 — PERMANOVA (reference rules/diversity_analysis.smk:91-102,
`qiime diversity beta-group-significance --p-method permanova`).

The pairwise distance matrix is computed DISTRIBUTED (the D2 Bray-Curtis
plan); the permutation loop runs driver-side over the collected matrix —
a sample×sample matrix is small even when the underlying data is 100 TB
(n_samples² doubles, not n_reads), which is exactly why the reference
could shell out to scikit-bio for this step.  Seeded → reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PermanovaResult:
    pseudo_f: float
    p_value: float
    n_permutations: int
    n_samples: int
    n_groups: int


def _pseudo_f(dist_sq: np.ndarray, groups: np.ndarray) -> float:
    """Anderson (2001) pseudo-F from squared distances."""
    n = dist_sq.shape[0]
    labels = np.unique(groups)
    a = len(labels)
    sst = dist_sq[np.triu_indices(n, 1)].sum() / n
    ssw = 0.0
    for g in labels:
        idx = np.where(groups == g)[0]
        if len(idx) < 2:
            continue
        sub = dist_sq[np.ix_(idx, idx)]
        ssw += sub[np.triu_indices(len(idx), 1)].sum() / len(idx)
    ssa = sst - ssw
    return (ssa / (a - 1)) / (ssw / (n - a))


def permanova(
    distances: DataFrame,
    sample_groups: DataFrame,
    *,
    n_permutations: int = 999,
    seed: int = 42,
    max_samples: int = 2048,
) -> PermanovaResult:
    """``distances``: (ua, ub, distance) pairwise rows (ua < ub);
    ``sample_groups``: (sample_id, group).  Returns pseudo-F and the
    permutation p-value (count of permuted F ≥ observed, +1/+1 corrected).

    ``max_samples`` bounds the driver materialization (capped limit +
    raise, as in :func:`mmeds_meta_spark.functions.pcoa.pcoa`).
    """
    max_pairs = max_samples * (max_samples - 1) // 2
    pairs = distances.limit(max_pairs + 1).collect()
    if len(pairs) > max_pairs:
        raise ValueError(
            f"permanova: > {max_pairs} pairwise rows (max_samples={max_samples}); "
            "block the pair space or raise max_samples explicitly"
        )
    groups_rows = {r[0]: r[1] for r in sample_groups.collect()}
    ids = sorted({r[0] for r in pairs} | {r[1] for r in pairs})
    pos = {s: i for i, s in enumerate(ids)}
    n = len(ids)
    d2 = np.zeros((n, n))
    for r in pairs:
        i, j = pos[r[0]], pos[r[1]]
        d2[i, j] = d2[j, i] = float(r[2]) ** 2
    groups = np.array([groups_rows[s] for s in ids])
    if len(np.unique(groups)) < 2:
        raise ValueError(
            f"PERMANOVA needs >= 2 groups; got {len(np.unique(groups))} "
            f"over {n} samples"
        )
    observed = _pseudo_f(d2, groups)
    rng = np.random.default_rng(seed)
    hits = 0
    for _ in range(n_permutations):
        if _pseudo_f(d2, rng.permutation(groups)) >= observed:
            hits += 1
    return PermanovaResult(
        pseudo_f=float(observed),
        p_value=(hits + 1) / (n_permutations + 1),
        n_permutations=n_permutations,
        n_samples=n,
        n_groups=len(np.unique(groups)),
    )
