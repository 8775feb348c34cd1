"""D2 (ordination half) — Principal Coordinates Analysis over a pairwise
distance DataFrame (reference: qiime diversity pcoa, consumed by
summary.py:156-167).

Distances are computed DISTRIBUTED (the Bray-Curtis plan); the
eigendecomposition runs driver-side on the n_samples × n_samples Gower
matrix — like PERMANOVA, driver work scales with samples², never with
the underlying reads.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PcoaResult:
    sample_ids: list
    coordinates: np.ndarray        # (n_samples, n_axes)
    eigenvalues: np.ndarray        # (n_axes,)
    explained: np.ndarray          # fraction of positive-eigenvalue mass


def pcoa(distances: DataFrame, *, n_axes: int = 3, max_samples: int = 2048) -> PcoaResult:
    """Classical MDS: double-center −D²/2, eigendecompose, keep the top
    positive axes.  ``distances``: (ua, ub, distance) with ua < ub.

    ``max_samples`` bounds the driver materialization: the collect is
    capped at max_samples·(max_samples−1)/2 + 1 rows (Spark stops early),
    and anything beyond raises instead of silently OOMing the driver —
    callers at scale must pre-block their pair space."""
    max_pairs = max_samples * (max_samples - 1) // 2
    pairs = distances.limit(max_pairs + 1).collect()
    if len(pairs) > max_pairs:
        raise ValueError(
            f"pcoa: > {max_pairs} pairwise rows (max_samples={max_samples}); "
            "block the pair space or raise max_samples explicitly"
        )
    ids = sorted({r[0] for r in pairs} | {r[1] for r in pairs})
    pos = {s: i for i, s in enumerate(ids)}
    n = len(ids)
    d2 = np.zeros((n, n))
    for r in pairs:
        i, j = pos[r[0]], pos[r[1]]
        d2[i, j] = d2[j, i] = float(r[2]) ** 2
    # Gower centering: B = -1/2 · J D² J,  J = I − 11ᵀ/n
    j = np.eye(n) - np.ones((n, n)) / n
    b = -0.5 * j @ d2 @ j
    vals, vecs = np.linalg.eigh(b)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    keep = min(n_axes, int((vals > 1e-12).sum()))
    coords = vecs[:, :keep] * np.sqrt(np.maximum(vals[:keep], 0.0))
    pos_mass = vals[vals > 0].sum()
    explained = vals[:keep] / pos_mass if pos_mass > 0 else np.zeros(keep)
    return PcoaResult(ids, coords, vals[:keep], explained)
