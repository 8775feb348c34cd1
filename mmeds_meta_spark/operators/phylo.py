"""Tree-based diversity: Faith's PD + unweighted/weighted UniFrac.

The reference computes these through QIIME2 (``faith_pd`` and UniFrac in
rules/diversity_analysis.smk:5-75) against a phylogenetic tree built by
mafft/fasttree (rules/process_sequencing_data.smk:72-89).  SURVEY §2.10
deferred them for lack of a tree; here the engine supplies the missing
piece natively: the tree is modeled as a *branch-membership relation*
``(sample, branch, descendant-count)`` and every metric becomes plain
joins + integer aggregation — the representation a 100 TB run needs
anyway, because a real tree's branches are just another table.

Tree construction (deterministic, identical in both engines): a feature's
root-path is the first 3 hex nibbles of ``md5(feature)``; its branches are
the 3 proper prefixes (internal edges, shared between features with a
common prefix) plus one leaf edge per feature.  Branch length is an
integer in 1..256 derived from ``md5(branch_id)`` — so lengths, sums, and
every UniFrac numerator/denominator are exact integers and the single
final division is bit-identical across Spark and DuckDB.

* Faith's PD(sample)    = Σ length over branches with ≥1 present descendant.
* unweighted UniFrac    = (T_a + T_b − 2·S) / (T_a + T_b − S)
                          with T = per-sample branch-length total and
                          S = shared-branch length — the same
                          decomposition trick as Bray-Curtis, so only
                          co-occurring branches ever join.
* weighted UniFrac      = Σ_b len·|c_a/N_a − c_b/N_b| rewritten as
                          integers:  (Σ_common len·|c_a·N_b − c_b·N_a|
                          + N_b·(W_a−SC_a) + N_a·(W_b−SC_b)) / (N_a·N_b).

Scale: membership is 4 rows per (sample, feature) — linear; pair
generation is branch-inverted-index within a sample block (never a dense
matrix); at 100 TB the block key becomes the study/cohort partition.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..testdata import table as _t
from . import QuerySpec

_DEPTH = 3  # internal-edge prefix nibbles per feature
_BLOCK = 40  # pairwise operators: samples 0.._BLOCK-1 (as d2_bray_curtis)
_HEX = "0123456789abcdef"


def _len_expr(dialect: str, branch: str) -> str:
    """Integer branch length 1..256 from md5(branch): value of the first
    two hex nibbles + 1.  Portable: instr (Spark) / strpos (DuckDB)."""
    pos = "instr" if dialect == "spark" else "strpos"
    n1 = f"({pos}('{_HEX}', substr(md5({branch}), 1, 1)) - 1)"
    n2 = f"({pos}('{_HEX}', substr(md5({branch}), 2, 1)) - 1)"
    return f"({n1} * 16 + {n2} + 1)"


def _branch_array(feature: str) -> list[str]:
    """The 4 branch ids (3 shared prefixes + 1 leaf edge) of a feature."""
    return [
        f"concat('p', substr(md5({feature}), 1, {k}))" for k in range(1, _DEPTH + 1)
    ] + [f"concat('L', {feature})"]


def _cov(
    spark: SparkSession,
    sf: str,
    *,
    block: int | None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(user_id, branch, len, cb): per-sample branch coverage — cb is the
    total abundance under the branch, len its integer length.  Pass a
    pre-computed (and ideally cached) ``counts`` (user_id, event_type, c)
    to share ONE events scan across several metrics (the qiime
    core-metrics pattern: one feature table feeds every distance)."""
    if counts is None:
        ev = _t(spark, sf, "events")
        if block is not None:
            ev = ev.filter(F.col("user_id") < block)
        counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    mem = counts.select(
        "user_id",
        "c",
        F.explode(F.array(*[F.expr(b) for b in _branch_array("event_type")])).alias(
            "branch"
        ),
    )
    return (
        mem.groupBy("user_id", "branch")
        .agg(F.expr("SUM(c)").alias("cb"))
        .withColumn("len", F.expr(_len_expr("spark", "branch")).cast("long"))
    )


def _cov_sql(*, block: int | None) -> str:
    where = f"WHERE user_id < {block}" if block is not None else ""
    branches = ", ".join(_branch_array("event_type"))
    return f"""
  counts AS (
    SELECT user_id, event_type, COUNT(*) AS c FROM events {where}
    GROUP BY user_id, event_type
  ), mem AS (
    SELECT user_id, c, unnest([{branches}]) AS branch FROM counts
  ), cov AS (
    SELECT user_id, branch, SUM(c) AS cb,
           CAST({_len_expr('duck', 'branch')} AS BIGINT) AS len
    FROM mem GROUP BY user_id, branch
  )
"""


# ---------------------------------------------------------------------------
# Faith's PD  (qiime diversity alpha --p-metric faith_pd)
# ---------------------------------------------------------------------------


def d1_faith_pd(spark: SparkSession, sf: str) -> DataFrame:
    """PD = Σ branch length over the sample's covered branches.  One
    narrow 4-way branch expansion + one groupBy — linear, no pairs."""
    cov = _cov(spark, sf, block=None)
    return cov.groupBy("user_id").agg(
        F.expr("COUNT(*)").alias("n_branches"),
        F.expr("SUM(len)").cast("long").alias("pd"),
    )


_FAITH_SQL = f"""
WITH {_cov_sql(block=None)}
SELECT user_id, COUNT(*) AS n_branches, CAST(SUM(len) AS BIGINT) AS pd
FROM cov GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# unweighted UniFrac — presence/absence branch overlap
# ---------------------------------------------------------------------------


def d2_unifrac_unweighted(
    spark: SparkSession,
    sf: str,
    *,
    block: int = _BLOCK,
    counts: DataFrame | None = None,
) -> DataFrame:
    """UF(a,b) = (Ta + Tb − 2S) / (Ta + Tb − S): only shared branches join
    (branch-inverted index); unshared mass comes from the per-sample
    totals — integers throughout, one exact final division.

    cov is eagerly checkpointed: it is block-bounded (≤ block × branches
    rows) and consumed by differently-pruned subplans that would
    otherwise each re-scan events (no exchange reuse across pruned
    copies); the composed plan STATES the reuse rather than restating
    the subtree per consumer, and — unlike .cache() — a long-lived
    session never accumulates orphaned storage blocks."""
    cov = _cov(spark, sf, block=block, counts=counts)
    cov = cov.localCheckpoint(eager=True)
    tot = cov.groupBy("user_id").agg(F.expr("SUM(len)").alias("t"))
    a = cov.select(F.col("user_id").alias("ua"), "branch", F.col("len").alias("la"))
    # shuffle-hash: branch keys are few and fat (every sample covers most
    # branches), so SMJ would sort the full pair expansion (see dedup.py's
    # band join for the measured 3-4x pattern)
    b = cov.select(F.col("user_id").alias("ub"), "branch").hint("shuffle_hash")
    shared = (
        a.join(b, "branch")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.expr("SUM(la)").alias("s"))
    )
    ta = tot.select(F.col("user_id").alias("ua"), F.col("t").alias("ta"))
    tb = tot.select(F.col("user_id").alias("ub"), F.col("t").alias("tb"))
    return (
        ta.crossJoin(tb)
        .filter(F.col("ua") < F.col("ub"))
        .join(F.broadcast(shared), ["ua", "ub"], "left")
        .fillna(0, subset=["s"])
        .select(
            "ua",
            "ub",
            F.expr("CAST(ta + tb - 2 * s AS DOUBLE) / (ta + tb - s)").alias(
                "unifrac_u"
            ),
        )
    )


_UF_U_SQL = f"""
WITH {_cov_sql(block=_BLOCK)},
tot AS (
  SELECT user_id, SUM(len) AS t FROM cov GROUP BY user_id
), shared AS (
  SELECT a.user_id AS ua, b.user_id AS ub, SUM(a.len) AS s
  FROM cov a JOIN cov b ON a.branch = b.branch AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT ta.user_id AS ua, tb.user_id AS ub,
       CAST(ta.t + tb.t - 2 * COALESCE(s, 0) AS DOUBLE)
       / (ta.t + tb.t - COALESCE(s, 0)) AS unifrac_u
FROM tot ta
JOIN tot tb ON ta.user_id < tb.user_id
LEFT JOIN shared ON ua = ta.user_id AND ub = tb.user_id
"""


# ---------------------------------------------------------------------------
# weighted UniFrac — abundance-weighted branch differences
# ---------------------------------------------------------------------------


def d2_unifrac_weighted(
    spark: SparkSession,
    sf: str,
    *,
    block: int = _BLOCK,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Σ_b len·|c_a/N_a − c_b/N_b| with the rationals cleared: every term
    is an integer until the single final division by N_a·N_b.  cov
    handling mirrors the unweighted variant: eagerly checkpointed (never
    .cache() — a long-lived session would leak the storage blocks)."""
    cov = _cov(spark, sf, block=block, counts=counts)
    cov = cov.localCheckpoint(eager=True)
    # N = total abundance per sample; W = Σ len·cb (the branch-weighted mass)
    nt = cov.filter(F.col("branch").startswith("L")).groupBy("user_id").agg(
        F.expr("SUM(cb)").alias("n")
    )
    wt = cov.groupBy("user_id").agg(
        F.expr("SUM(CAST(len AS DECIMAL(38,0)) * cb)").alias("w")
    )
    na = nt.select(F.col("user_id").alias("ua"), F.col("n").alias("na"))
    nb = nt.select(F.col("user_id").alias("ub"), F.col("n").alias("nb"))
    a = cov.select(F.col("user_id").alias("ua"), "branch", F.col("len").alias("la"), F.col("cb").alias("ca"))
    # shuffle-hash: same few-fat-keys rationale as the unweighted variant
    b = cov.select(F.col("user_id").alias("ub"), "branch", F.col("cb").alias("cb2")).hint("shuffle_hash")
    common = (
        a.join(b, "branch")
        .filter(F.col("ua") < F.col("ub"))
        .join(F.broadcast(na), "ua")
        .join(F.broadcast(nb), "ub")
        .groupBy("ua", "ub")
        .agg(
            # cb·N products are DECIMAL(38,0) BEFORE multiplying: at corpus
            # scale count×total exceeds 2^63 and non-ANSI long arithmetic
            # would wrap silently (the oracle's HUGEINT would not).
            F.expr(
                "SUM(CAST(la AS DECIMAL(38,0)) * ABS(CAST(ca AS DECIMAL(38,0)) * nb"
                " - CAST(cb2 AS DECIMAL(38,0)) * na))"
            ).alias("ncommon"),
            F.expr("SUM(CAST(la AS DECIMAL(38,0)) * ca)").alias("sca"),
            F.expr("SUM(CAST(la AS DECIMAL(38,0)) * cb2)").alias("scb"),
        )
    )
    wa = wt.select(F.col("user_id").alias("ua"), F.col("w").alias("wa"))
    wb = wt.select(F.col("user_id").alias("ub"), F.col("w").alias("wb"))
    return (
        na.crossJoin(nb)
        .filter(F.col("ua") < F.col("ub"))
        .join(wa, "ua")
        .join(wb, "ub")
        .join(F.broadcast(common), ["ua", "ub"], "left")
        .fillna(0, subset=["ncommon", "sca", "scb"])
        .select(
            "ua",
            "ub",
            F.expr(
                "CAST(ncommon + CAST(nb AS DECIMAL(38,0)) * (wa - sca)"
                " + CAST(na AS DECIMAL(38,0)) * (wb - scb) AS DOUBLE)"
                " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
            ).alias("unifrac_w"),
        )
    )


_UF_W_SQL = f"""
WITH {_cov_sql(block=_BLOCK)},
nt AS (
  SELECT user_id, SUM(cb) AS n FROM cov WHERE branch LIKE 'L%' GROUP BY user_id
), wt AS (
  SELECT user_id, SUM(CAST(len AS HUGEINT) * cb) AS w FROM cov GROUP BY user_id
), common AS (
  SELECT a.user_id AS ua, b.user_id AS ub,
         SUM(CAST(a.len AS HUGEINT) * ABS(CAST(a.cb AS HUGEINT) * nb.n
                                          - CAST(b.cb AS HUGEINT) * na.n)) AS ncommon,
         SUM(CAST(a.len AS HUGEINT) * a.cb) AS sca,
         SUM(CAST(a.len AS HUGEINT) * b.cb) AS scb
  FROM cov a
  JOIN cov b ON a.branch = b.branch AND a.user_id < b.user_id
  JOIN nt na ON na.user_id = a.user_id
  JOIN nt nb ON nb.user_id = b.user_id
  GROUP BY 1, 2
)
SELECT na.user_id AS ua, nb.user_id AS ub,
       CAST(COALESCE(ncommon, 0) + CAST(nb.n AS HUGEINT) * (wa.w - COALESCE(sca, 0))
            + CAST(na.n AS HUGEINT) * (wb.w - COALESCE(scb, 0)) AS DOUBLE)
       / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS unifrac_w
FROM nt na
JOIN nt nb ON na.user_id < nb.user_id
JOIN wt wa ON wa.user_id = na.user_id
JOIN wt wb ON wb.user_id = nb.user_id
LEFT JOIN common ON ua = na.user_id AND ub = nb.user_id
"""


# ---------------------------------------------------------------------------
# Real-tree variants: same metrics through the Newick loader
# (sources/newick.py) + the generic branch-relation algebra
# (functions/tree_metrics.py).  The demo tree is a fixed 5-leaf Newick over
# the event_type domain with INTEGER branch lengths, so every intermediate
# is an exact integer in doubles (< 2^53) and the Spark/DuckDB results are
# bit-identical; real fasttree float-length trees run through the exact
# same code path (pytest-verified against hand-computed fixtures).
# ---------------------------------------------------------------------------

_NEWICK_DEMO = "((click:2,view:1)0.83:3,(purchase:4,signup:2)0.91:1,error:5);"


def _demo_membership_rows() -> list[tuple[str, float, str, bool]]:
    from ..sources.newick import membership_rows, parse_newick

    return membership_rows(parse_newick(_NEWICK_DEMO))


def _demo_feats(
    spark: SparkSession,
    sf: str,
    *,
    block: int | None,
    counts: DataFrame | None = None,
) -> DataFrame:
    if counts is not None:
        # re-key the shared (user_id, event_type, c) relation; filtering
        # on the group key AFTER the agg equals filtering the input
        if block is not None:
            counts = counts.filter(F.col("user_id") < block)
        return counts.select(
            F.col("user_id").alias("sample"),
            F.col("event_type").alias("feature"),
            F.col("c").cast("double").alias("count"),
        )
    ev = _t(spark, sf, "events")
    if block is not None:
        ev = ev.filter(F.col("user_id") < block)
    return ev.groupBy(
        F.col("user_id").alias("sample"), F.col("event_type").alias("feature")
    ).agg(F.count("*").cast("double").alias("count"))


def d1_faith_pd_newick(
    spark: SparkSession, sf: str, *, counts: DataFrame | None = None
) -> DataFrame:
    """Faith's PD against a REAL parsed Newick tree (D1 closure: the
    reference's rooted_tree artifact, rules/process_sequencing_data.smk:
    75-92, is now ingestible instead of only the synthetic relation)."""
    from ..functions.tree_metrics import faith_pd, tree_cov
    from ..sources.newick import read_newick

    cov = tree_cov(
        _demo_feats(spark, sf, block=None, counts=counts),
        read_newick(spark, _NEWICK_DEMO),
    )
    return faith_pd(cov).select(
        F.col("sample").alias("user_id"), "n_branches", "pd"
    )


def d2_unifrac_weighted_newick(
    spark: SparkSession, sf: str, *, block: int = _BLOCK
) -> DataFrame:
    """Weighted UniFrac against a REAL parsed Newick tree — the D2 closure
    twin of :func:`d1_faith_pd_newick`."""
    from ..functions.tree_metrics import tree_cov, unifrac_weighted
    from ..sources.newick import read_newick

    # cov is block-bounded and read by 5 differently-pruned consumers
    # (nt/wt/a/b/common) — checkpoint it or each re-scans events
    cov = tree_cov(
        _demo_feats(spark, sf, block=block), read_newick(spark, _NEWICK_DEMO)
    ).localCheckpoint(eager=True)
    return unifrac_weighted(cov).select(
        F.col("sa").alias("ua"), F.col("sb").alias("ub"), "unifrac_w"
    )


def d2_unifrac_unweighted_newick(
    spark: SparkSession, sf: str, *, block: int = _BLOCK
) -> DataFrame:
    """Unweighted UniFrac against the SAME parsed Newick tree the weighted
    variant uses (rules/diversity_analysis.smk:5-40 computes both metrics
    over one rooted tree) — presence/absence branch overlap via the
    branch-inverted-index decomposition, no dense matrix."""
    from ..functions.tree_metrics import tree_cov, unifrac_unweighted
    from ..sources.newick import read_newick

    # cov feeds tot + both sides of the shared-branch join — checkpoint
    # the block-bounded relation or each consumer re-scans events
    cov = tree_cov(
        _demo_feats(spark, sf, block=block), read_newick(spark, _NEWICK_DEMO)
    ).localCheckpoint(eager=True)
    return unifrac_unweighted(cov).select(
        F.col("sa").alias("ua"), F.col("sb").alias("ub"), "unifrac_u"
    )


def _demo_membership_values() -> str:
    return ",\n    ".join(
        f"('{b}', {ln!r}, '{leaf}', {str(is_l).upper()})"
        for b, ln, leaf, is_l in _demo_membership_rows()
    )


def _newick_cov_sql(*, block: int | None) -> str:
    where = f"WHERE user_id < {block}" if block is not None else ""
    return f"""
  membership(branch, length, leaf, is_leaf_edge) AS (VALUES
    {_demo_membership_values()}
  ), counts AS (
    SELECT user_id AS sample, event_type AS feature,
           CAST(COUNT(*) AS DOUBLE) AS cnt
    FROM events {where} GROUP BY 1, 2
  ), cov AS (
    SELECT c.sample, m.branch, SUM(c.cnt) AS cb, MIN(m.length) AS len,
           BOOL_OR(m.is_leaf_edge) AS is_leaf_edge
    FROM counts c JOIN membership m ON c.feature = m.leaf
    GROUP BY 1, 2
  )
"""


_FAITH_NEWICK_SQL = f"""
WITH {_newick_cov_sql(block=None)}
SELECT sample AS user_id, COUNT(*) AS n_branches, SUM(len) AS pd
FROM cov GROUP BY sample
"""

_UF_U_NEWICK_SQL = f"""
WITH {_newick_cov_sql(block=_BLOCK)},
present AS (
  SELECT DISTINCT sample, branch, len FROM cov
), tot AS (
  SELECT sample, SUM(len) AS t FROM present GROUP BY sample
), shared AS (
  SELECT a.sample AS ua, b.sample AS ub, SUM(a.len) AS s
  FROM present a JOIN present b ON a.branch = b.branch AND a.sample < b.sample
  GROUP BY 1, 2
)
SELECT ta.sample AS ua, tb.sample AS ub,
       (ta.t + tb.t - 2 * COALESCE(s, 0))
       / (ta.t + tb.t - COALESCE(s, 0)) AS unifrac_u
FROM tot ta
JOIN tot tb ON ta.sample < tb.sample
LEFT JOIN shared ON ua = ta.sample AND ub = tb.sample
"""

_UF_W_NEWICK_SQL = f"""
WITH {_newick_cov_sql(block=_BLOCK)},
nt AS (
  SELECT sample, SUM(cb) AS n FROM cov WHERE is_leaf_edge GROUP BY sample
), wt AS (
  SELECT sample, SUM(len * cb) AS w FROM cov GROUP BY sample
), common AS (
  SELECT a.sample AS ua, b.sample AS ub,
         SUM(a.len * ABS(a.cb * nb.n - b.cb * na.n)) AS ncommon,
         SUM(a.len * a.cb) AS sca,
         SUM(a.len * b.cb) AS scb
  FROM cov a
  JOIN cov b ON a.branch = b.branch AND a.sample < b.sample
  JOIN nt na ON na.sample = a.sample
  JOIN nt nb ON nb.sample = b.sample
  GROUP BY 1, 2
)
SELECT na.sample AS ua, nb.sample AS ub,
       (COALESCE(ncommon, 0) + nb.n * (wa.w - COALESCE(sca, 0))
        + na.n * (wb.w - COALESCE(scb, 0))) / (na.n * nb.n) AS unifrac_w
FROM nt na
JOIN nt nb ON na.sample < nb.sample
JOIN wt wa ON wa.sample = na.sample
JOIN wt wb ON wb.sample = nb.sample
LEFT JOIN common ON ua = na.sample AND ub = nb.sample
"""


# ---------------------------------------------------------------------------
# d9 — Mantel test: correlation between two sample-distance relations
# ---------------------------------------------------------------------------


def _fold(col: str) -> str:
    """Pinned-order float fold over the block-bounded pair list: the pair
    distances are doubles (exact integer ratios, but still doubles), and
    float addition is order-sensitive — so every Mantel moment is folded
    over pairs sorted by (ua, ub) on BOTH engines."""
    return (
        f"aggregate(array_sort(collect_list(struct(ua, ub, {col}))),"
        f" CAST(0 AS DOUBLE), (acc, p) -> acc + p.{col})"
    )


_N_PERM = 199  # vegan::mantel default is 999; 199 keeps the gate fast


def _perm_seed(
    spark: SparkSession,
    samples: DataFrame,
    n_perm: int,
    *,
    include_identity: bool = False,
) -> DataFrame:
    """(k, sample, image): K deterministic sample permutations as a
    relation — permutation k maps the samples sorted by id onto the
    samples sorted by ``md5(k || ':' || sample)`` (ties by sample), so
    Spark and DuckDB generate byte-identical permutations with plain
    window functions, no RNG.  ``include_identity`` prepends k = 0 as
    the identity mapping (for observed-statistic-through-the-same-plan
    patterns)."""
    ks = spark.range(1, n_perm + 1).select(F.col("id").alias("k"))
    base = ks.crossJoin(samples)
    o_rank = base.withColumn(
        "r", F.expr("row_number() OVER (PARTITION BY k ORDER BY sample)")
    )
    m_rank = base.withColumn(
        "r",
        F.expr(
            "row_number() OVER (PARTITION BY k ORDER BY"
            " md5(concat(CAST(k AS STRING), ':', CAST(sample AS STRING))), sample)"
        ),
    ).select("k", "r", F.col("sample").alias("image"))
    perm = o_rank.join(m_rank, ["k", "r"]).select("k", "sample", "image")
    if include_identity:
        ident = samples.select(
            F.lit(0).cast("long").alias("k"), "sample", F.col("sample").alias("image")
        )
        perm = ident.union(perm)
    return perm


def mantel_permutation_test(
    x_pairs: DataFrame, y_pairs: DataFrame, *, n_perm: int = _N_PERM
) -> DataFrame:
    """Mantel r between two pairwise-distance relations PLUS the
    one-sided permutation p-value, all in one Catalyst plan.

    ``x_pairs``/``y_pairs``: (ua, ub, x|y) with ua < ub covering every
    sample pair (symmetric matrices in canonical-pair form).  The K
    permutations are a deterministic seed relation — permutation k maps
    the samples sorted by id onto the samples sorted by
    ``md5(k || ':' || sample)`` — so Spark and DuckDB generate
    byte-identical permutations with plain window functions, no RNG.
    Y is relabeled through the permutation (Y_k[a,b] = Y[πk(a),πk(b)]:
    two image lookups + one canonical-pair join back into Y), and the
    y-dependent moments are refolded per k in pinned (ua, ub) order;
    x-side moments are permutation-invariant and computed once.  p =
    (#{r_k ≥ r_obs} + 1)/(K + 1), the same +1/+1 correction as
    functions/permanova.py:45.

    Scale: pairs are block²/2 rows and perms add ×K on THAT bounded
    relation (never corpus-scale); the perm seed is samples × K rows,
    broadcast into the image lookups."""
    # EAGER: consumed by obs + the sample dimension + the K perm branches —
    # the lazy form re-expanded the full x/y distance subtrees into every
    # consumer (the d4/d16 plan-re-expansion disease)
    p = (
        x_pairs.join(y_pairs, ["ua", "ub"])
        .withColumn("xx", F.expr("x * x"))
        .withColumn("yy", F.expr("y * y"))
        .withColumn("xy", F.expr("x * y"))
        .localCheckpoint(eager=True)
    )
    spark = p.sparkSession
    obs = p.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr(_fold("x")).alias("sx"),
        F.expr(_fold("y")).alias("sy"),
        F.expr(_fold("xx")).alias("sxx"),
        F.expr(_fold("yy")).alias("syy"),
        F.expr(_fold("xy")).alias("sxy"),
    ).select(
        "n_pairs",
        "sx",
        "sxx",
        F.expr(
            "(n_pairs * sxy - sx * sy)"
            " / SQRT((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy))"
        ).alias("mantel_r"),
    )
    samples = (
        p.select(F.col("ua").alias("sample"))
        .union(p.select("ub"))
        .distinct()
    )
    # samples×K bounded rows, consumed by BOTH image-lookup broadcasts —
    # checkpoint so the seed's window sort runs once, not per side
    perm = _perm_seed(spark, samples, n_perm).localCheckpoint(eager=True)
    ks = spark.range(1, n_perm + 1).select(F.col("id").alias("k"))
    pa = perm.select(
        "k", F.col("sample").alias("ua"), F.col("image").alias("ia")
    )
    pb = perm.select(
        "k", F.col("sample").alias("ub"), F.col("image").alias("ib")
    )
    # Y's canonical-pair lookup table rides the p checkpoint (p carries the
    # y column for exactly the pair set the contract guarantees y_pairs
    # covers) instead of re-executing the whole y-metric subtree a second
    # time
    yk = p.select(
        F.col("ua").alias("ya"), F.col("ub").alias("yb"), F.col("y").alias("py")
    )
    permuted = (
        p.select("ua", "ub", "x")
        .crossJoin(ks)  # 1 column, n_perm rows — replicate the pair block
        .join(F.broadcast(pa), ["k", "ua"])
        .join(F.broadcast(pb), ["k", "ub"])
        .join(
            F.broadcast(yk),
            (F.least("ia", "ib") == F.col("ya"))
            & (F.greatest("ia", "ib") == F.col("yb")),
        )
        .select("k", "ua", "ub", "x", "py")
    )
    per_k = permuted.groupBy("k").agg(
        F.expr(_fold("py")).alias("sy"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(ua, ub, py))),"
            " CAST(0 AS DOUBLE), (acc, q) -> acc + q.py * q.py)"
        ).alias("syy"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(ua, ub, x, py))),"
            " CAST(0 AS DOUBLE), (acc, q) -> acc + q.x * q.py)"
        ).alias("sxy"),
    )
    r_perm = per_k.crossJoin(F.broadcast(obs)).select(
        F.expr(
            "(n_pairs * sxy - sx * sy)"
            " / SQRT((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy))"
        ).alias("r_k"),
        "mantel_r",
    )
    hits = r_perm.agg(
        F.expr("SUM(CASE WHEN r_k >= mantel_r THEN 1 ELSE 0 END)").alias("h")
    )
    return obs.crossJoin(hits).select(
        "n_pairs",
        "mantel_r",
        F.expr(f"CAST(h + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
        F.lit(n_perm).cast("long").alias("n_perm"),
    )


def d9_mantel_test(spark: SparkSession, sf: str) -> DataFrame:
    """Mantel test between the Bray-Curtis and weighted-UniFrac distance
    relations over the same sample block: the Pearson r of the two
    metrics across all sample pairs — "do taxonomic and phylogenetic
    distances agree?" — WITH the permutation p-value (vegan::mantel's
    full surface: statistic + one-sided significance under sample
    relabeling, 199 permutations, +1/+1 corrected like
    functions/permanova.py:45).

    COMPOSITION: consumes the d2_bray_curtis and d2_unifrac_weighted
    relations directly and runs statistic + permutations in ONE Catalyst
    plan (see :func:`mantel_permutation_test`).  Mantel is inherently
    pairwise, so it lives on the same bounded sample block as the inputs
    — the pair list is block² rows, never corpus-scale.  All moments use
    pinned-order folds; every closing expression is one arithmetic tree
    on identical doubles → bit-identical across engines."""
    from .diversity import d2_bray_curtis

    # ONE events scan feeds both metrics (qiime core-metrics: one feature
    # table -> every distance): the block-bounded counts relation is
    # checkpointed and shared, saving a full corpus scan per metric
    counts = (
        _t(spark, sf, "events")
        .filter(F.col("user_id") < _BLOCK)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    bc = d2_bray_curtis(spark, sf, counts=counts).select(
        "ua", "ub", F.col("bray_curtis").alias("x")
    )
    uf = d2_unifrac_weighted(spark, sf, counts=counts).select(
        "ua", "ub", F.col("unifrac_w").alias("y")
    )
    return mantel_permutation_test(bc, uf)


def d4_permanova(
    spark: SparkSession, sf: str, *, n_perm: int = _N_PERM
) -> DataFrame:
    """D4 — PERMANOVA fully IN-PLAN: Anderson (2001) pseudo-F over the
    Bray-Curtis distance relation plus the permutation p-value, with the
    permutation loop as a relation instead of a driver-side numpy loop
    (functions/permanova.py keeps the collected-matrix variant for API
    parity with scikit-bio; this operator is the same test at engine
    scale — reference rules/diversity_analysis.smk:91-102,
    ``qiime diversity beta-group-significance --p-method permanova``).

    Decomposition on the pair relation (no n×n matrix ever):
    SST = Σ_{all pairs} d²/n, SSW = Σ_g Σ_{pairs within g} d²/n_g,
    F = ((SST−SSW)/(a−1)) / (SSW/(n−a)).  Group sizes are permutation-
    invariant (labels are relabeled by a bijection), so each permutation
    only re-selects WHICH pairs are within-group — one broadcast image
    join per side, exactly the :func:`mantel_permutation_test` seed
    pattern, with k = 0 as the identity so the observed F runs through
    the IDENTICAL expression tree as every permuted F (bit-identical
    comparisons on both engines).  All d² sums are pinned-order folds.

    Groups: user_id % 3 — the deterministic 3-cohort split the other
    demo operators use.  p-value is +1/+1 corrected, one-sided."""
    from .diversity import d2_bray_curtis

    # EAGER checkpoint: consumed by sst + the K+1 perm branches + the
    # sample-dimension relations.  The former lazy checkpoint left the
    # whole Bray-Curtis subtree in the logical plan, so every consumer
    # re-expanded it — 222 exchanges / 128 scans in the audited physical
    # plan (the exact disease d16_permdisp was cured of in round 7);
    # eager truncation collapses it to a handful over the pair-bounded
    # materialization (r12: 2.96 → ~2.3 s min at sf0.1, same rows).
    p = (
        d2_bray_curtis(spark, sf)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=True)
    )
    samples = (
        p.select(F.col("ua").alias("sample"))
        .union(p.select("ub"))
        .distinct()
        .localCheckpoint(eager=True)  # n bounded rows; scal + ng + perm read it
    )
    scal = samples.agg(F.count("*").alias("n"))
    ng = samples.groupBy((F.col("sample") % 3).alias("g")).agg(
        F.count("*").alias("n_g")
    )
    agrp = ng.agg(F.count("*").alias("a"))
    sst = p.crossJoin(F.broadcast(scal)).groupBy("n").agg(
        (F.expr(_fold("dd")) / F.col("n")).alias("sst")
    )
    perm = _perm_seed(spark, samples, n_perm, include_identity=True)
    ks = spark.range(0, n_perm + 1).select(F.col("id").alias("k"))
    pa = perm.select("k", F.col("sample").alias("ua"), (F.col("image") % 3).alias("ga"))
    pb = perm.select("k", F.col("sample").alias("ub"), (F.col("image") % 3).alias("gb"))
    within = (
        p.crossJoin(ks)
        .join(F.broadcast(pa), ["k", "ua"])
        .join(F.broadcast(pb), ["k", "ub"])
        .filter(F.col("ga") == F.col("gb"))
        .select("k", F.col("ga").alias("g"), "ua", "ub", "dd")
    )
    ssq = within.groupBy("k", "g").agg(F.expr(_fold("dd")).alias("ssq"))
    ssw = (
        ssq.join(F.broadcast(ng), "g")
        .select("k", "g", (F.col("ssq") / F.col("n_g")).alias("v"))
        .groupBy("k")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(g, v))),"
                " CAST(0 AS DOUBLE), (acc, q) -> acc + q.v)"
            ).alias("ssw")
        )
    )
    f = (
        ssw.crossJoin(F.broadcast(sst))
        .crossJoin(F.broadcast(agrp))
        .select(
            "k",
            F.expr(
                "((sst - ssw) / CAST(a - 1 AS DOUBLE)) / (ssw / CAST(n - a AS DOUBLE))"
            ).alias("f"),
        )
        # K+1 rows, consumed by obs AND hits — without the truncation each
        # consumer re-expands the whole K+1×pairs permutation-join chain
        # (the d16_permdisp discipline)
        .localCheckpoint(eager=True)
    )
    obs = f.filter(F.col("k") == 0).select(F.col("f").alias("pseudo_f"))
    hits = (
        f.crossJoin(F.broadcast(obs))
        .agg(
            F.expr(
                "SUM(CASE WHEN k > 0 AND f >= pseudo_f THEN 1 ELSE 0 END)"
            ).alias("h")
        )
    )
    return (
        scal.crossJoin(agrp)
        .crossJoin(obs)
        .crossJoin(hits)
        .select(
            F.col("n").cast("long").alias("n_samples"),
            F.col("a").cast("long").alias("n_groups"),
            "pseudo_f",
            F.expr(f"CAST(h + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
            F.lit(n_perm).cast("long").alias("n_perm"),
        )
    )


def d10_anosim(
    spark: SparkSession, sf: str, *, n_perm: int = _N_PERM
) -> DataFrame:
    """D10 — ANOSIM fully in-plan: Clarke (1993) R statistic over the
    Bray-Curtis distance relation plus the permutation p-value — the
    alternate ``--p-method`` of the same qiime call the reference runs
    (``qiime diversity beta-group-significance``,
    rules/diversity_analysis.smk:101; PERMANOVA is the default method,
    gated as :func:`d4_permanova`).

    R = (r̄_between − r̄_within) / (M/2) over the mid-ranks of all
    M = n(n−1)/2 pairwise distances.  The ranks are computed ONCE —
    they are permutation-invariant (relabeling only re-selects which
    pairs are within-group) — with a TWO-PHASE distributed mid-rank
    instead of a single-partition global window: per distinct distance
    value, mid-rank = (# strictly smaller values) + (ties+1)/2, built
    from per-bucket running sums (``FLOOR(d*1024)`` buckets, parallel
    windows) plus a ≤1025-row broadcast bucket-offset relation.  The
    same two-phase scan is the shape a 1000-executor global rank needs;
    nothing here is driver-side.  Mid-ranks are kept ×2 (``mr2``) so
    every sum is exact BIGINT arithmetic; per-permutation state is ONE
    within-group sum (between = permutation-invariant total − within).
    k = 0 is the identity relabeling, so the observed R runs through
    the identical expression tree as every permuted R.

    Groups: user_id % 3 (the deterministic 3-cohort demo split).
    p-value is +1/+1 corrected, one-sided."""
    from .diversity import d2_bray_curtis

    p = (
        d2_bray_curtis(spark, sf)
        .select("ua", "ub", F.col("bray_curtis").alias("d"))
        # EAGER: rank build + pair probe each re-expanded the Bray-Curtis
        # subtree under the lazy form (d4/d16 plan-re-expansion disease)
        .localCheckpoint(eager=True)
    )
    dist = p.groupBy("d").agg(F.count("*").cast("long").alias("cnt")).withColumn(
        "b", F.expr("CAST(FLOOR(d * 1024) AS BIGINT)")
    )
    in_b = dist.withColumn(
        "cum_in",
        F.expr(
            "sum(cnt) OVER (PARTITION BY b ORDER BY d"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt"
        ),
    )
    off = (
        dist.groupBy("b")
        .agg(F.sum("cnt").alias("bc"))
        .withColumn(
            "off",
            F.expr(
                "sum(bc) OVER (ORDER BY b"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bc"
            ),
        )
        .select("b", "off")
    )
    ranked = in_b.join(F.broadcast(off), "b").select(
        "d", F.expr("2 * (off + cum_in) + cnt + 1").alias("mr2")
    )
    pr = (
        p.join(ranked, "d")
        .select("ua", "ub", "mr2")
        .localCheckpoint(eager=True)  # totals + K+1 perm branches
    )
    tot = pr.agg(F.count("*").cast("long").alias("m"), F.sum("mr2").alias("t2"))
    samples = (
        pr.select(F.col("ua").alias("sample")).union(pr.select("ub")).distinct()
    )
    nsamp = samples.agg(F.count("*").cast("long").alias("n_samples"))
    agrp = samples.agg(
        F.expr("CAST(COUNT(DISTINCT sample % 3) AS BIGINT)").alias("a")
    )
    # samples×(K+1) bounded rows, consumed by both image broadcasts
    perm = _perm_seed(spark, samples, n_perm, include_identity=True).localCheckpoint(
        eager=True
    )
    ks = spark.range(0, n_perm + 1).select(F.col("id").alias("k"))
    pa = perm.select(
        "k", F.col("sample").alias("ua"), (F.col("image") % 3).alias("ga")
    )
    pb = perm.select(
        "k", F.col("sample").alias("ub"), (F.col("image") % 3).alias("gb")
    )
    within = (
        pr.crossJoin(ks)
        .join(F.broadcast(pa), ["k", "ua"])
        .join(F.broadcast(pb), ["k", "ub"])
        .filter(F.col("ga") == F.col("gb"))
        .groupBy("k")
        .agg(F.sum("mr2").alias("s2w"), F.count("*").cast("long").alias("nw"))
    )
    r = (
        within.crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.expr(
                "((CAST(t2 - s2w AS DOUBLE) / CAST(2 * (m - nw) AS DOUBLE))"
                " - (CAST(s2w AS DOUBLE) / CAST(2 * nw AS DOUBLE)))"
                " / (CAST(m AS DOUBLE) / 2)"
            ).alias("r"),
        )
        # K+1 rows, consumed by obs AND hits (the d16 discipline)
        .localCheckpoint(eager=True)
    )
    obs = r.filter(F.col("k") == 0).select(F.col("r").alias("anosim_r"))
    hits = r.crossJoin(F.broadcast(obs)).agg(
        F.expr("SUM(CASE WHEN k > 0 AND r >= anosim_r THEN 1 ELSE 0 END)").alias(
            "h"
        )
    )
    return (
        nsamp.crossJoin(agrp)
        .crossJoin(obs)
        .crossJoin(hits)
        .select(
            "n_samples",
            F.col("a").alias("n_groups"),
            "anosim_r",
            F.expr(f"CAST(h + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
            F.lit(n_perm).cast("long").alias("n_perm"),
        )
    )


def d4_permanova_pairwise(
    spark: SparkSession, sf: str, *, n_perm: int = 99
) -> DataFrame:
    """D4 — the ``--p-pairwise`` half of beta-group-significance
    (rules/diversity_analysis.smk:101): for every unordered pair of
    groups, PERMANOVA restricted to that pair's samples, each pair with
    its OWN permutation family — one row (g1, g2, n_samples, pseudo_f,
    p_value, n_perm) per pair, exactly what qiime's pairwise table
    reports.

    The group-pair dimension ``gp`` rides the whole plan as a column:
    subset membership is a 3-row broadcast (``gpairs``) joined against
    the samples, the permutation seed ranks PARTITION BY (gp, k) with
    the md5 mix keyed on (gp, k, sample) so families are independent
    across pairs, and each (gp, k) slice relabels only within its
    subset (image % 3 stays inside {g1, g2} because permutations are
    subset bijections).  Group sizes and SST are permutation-invariant
    per gp; within-group d² sums are pinned-order folds.  a = 2 always,
    so F = (SST − SSW) / (SSW / (n − 2))."""
    from .diversity import d2_bray_curtis

    p = (
        d2_bray_curtis(spark, sf)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        # EAGER: the gp-subset probes re-expanded the Bray-Curtis subtree
        # under the lazy form
        .localCheckpoint(eager=True)
    )
    s = (
        p.select(F.col("ua").alias("sample"))
        .union(p.select("ub"))
        .distinct()
        .select("sample", (F.col("sample") % 3).alias("g"))
    )
    gs = s.select("g").distinct()
    gpairs = (
        gs.alias("x")
        .join(gs.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(
            F.col("x.g").alias("g1"),
            F.col("y.g").alias("g2"),
            F.concat_ws("_", "x.g", "y.g").alias("gp"),
        )
    )
    mem = (
        F.broadcast(gpairs)
        .join(s, (F.col("g") == F.col("g1")) | (F.col("g") == F.col("g2")))
        .select("gp", "sample", "g")
        .localCheckpoint(eager=True)  # seed + two probe joins + sizes
    )
    ng = mem.groupBy("gp", "g").agg(F.count("*").cast("long").alias("n_g"))
    nsub = mem.groupBy("gp").agg(F.count("*").cast("long").alias("n"))
    sub = (
        p.join(mem.select("gp", F.col("sample").alias("ua")), "ua")
        .join(mem.select("gp", F.col("sample").alias("ub")).alias("mb"), ["gp", "ub"])
        .select("gp", "ua", "ub", "dd")
        .localCheckpoint(eager=True)  # SST + K+1 perm branches
    )
    sst = (
        sub.groupBy("gp")
        .agg(F.expr(_fold("dd")).alias("sdd"))
        .join(F.broadcast(nsub), "gp")
        .select("gp", "n", (F.col("sdd") / F.col("n")).alias("sst"))
    )
    ks = spark.range(1, n_perm + 1).select(F.col("id").alias("k"))
    base = mem.crossJoin(F.broadcast(ks))
    o_rank = base.withColumn(
        "r", F.expr("row_number() OVER (PARTITION BY gp, k ORDER BY sample)")
    ).select("gp", "k", "sample", "r")
    m_rank = base.withColumn(
        "r",
        F.expr(
            "row_number() OVER (PARTITION BY gp, k ORDER BY"
            " md5(concat(gp, ':', CAST(k AS STRING), ':',"
            " CAST(sample AS STRING))), sample)"
        ),
    ).select("gp", "k", "r", F.col("g").alias("gi"))
    ident = mem.select(
        "gp", F.lit(0).cast("long").alias("k"), "sample", F.col("g").alias("gi")
    )
    perm = ident.union(
        o_rank.join(m_rank, ["gp", "k", "r"]).select("gp", "k", "sample", "gi")
    )
    pa = perm.select("gp", "k", F.col("sample").alias("ua"), F.col("gi").alias("ga"))
    pb = perm.select("gp", "k", F.col("sample").alias("ub"), F.col("gi").alias("gb"))
    within = (
        sub.join(F.broadcast(pa), ["gp", "ua"])
        .join(F.broadcast(pb), ["gp", "k", "ub"])
        .filter(F.col("ga") == F.col("gb"))
        .select("gp", "k", F.col("ga").alias("g"), "ua", "ub", "dd")
    )
    ssq = within.groupBy("gp", "k", "g").agg(F.expr(_fold("dd")).alias("ssq"))
    ssw = (
        ssq.join(F.broadcast(ng), ["gp", "g"])
        .select("gp", "k", "g", (F.col("ssq") / F.col("n_g")).alias("v"))
        .groupBy("gp", "k")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(g, v))),"
                " CAST(0 AS DOUBLE), (acc, q) -> acc + q.v)"
            ).alias("ssw")
        )
    )
    f = (
        ssw.join(F.broadcast(sst), "gp")
        .select(
            "gp",
            "k",
            F.expr("(sst - ssw) / (ssw / CAST(n - 2 AS DOUBLE))").alias("f"),
        )
        # gp×(K+1) rows, consumed by obs AND hits (the d16 discipline)
        .localCheckpoint(eager=True)
    )
    obs = f.filter(F.col("k") == 0).select("gp", F.col("f").alias("pseudo_f"))
    hits = (
        f.join(F.broadcast(obs), "gp")
        .groupBy("gp")
        .agg(
            F.expr(
                "SUM(CASE WHEN k > 0 AND f >= pseudo_f THEN 1 ELSE 0 END)"
            ).alias("h")
        )
    )
    return (
        F.broadcast(gpairs)
        .join(nsub, "gp")
        .join(obs, "gp")
        .join(hits, "gp")
        .select(
            F.col("g1").cast("long").alias("g1"),
            F.col("g2").cast("long").alias("g2"),
            F.col("n").alias("n_samples"),
            "pseudo_f",
            F.expr(f"CAST(h + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
            F.lit(n_perm).cast("long").alias("n_perm"),
        )
    )


def _permanova_pairwise_sql(n_perm: int = 99) -> str:
    from .diversity import _D2_SQL

    def duck_fold(col: str) -> str:
        return f"list_reduce(list({col} ORDER BY ua, ub), (acc, v) -> acc + v)"

    return f"""
WITH bc AS ({_D2_SQL}),
p AS (
  SELECT ua, ub, bray_curtis * bray_curtis AS dd FROM bc
), s AS (
  SELECT sample, sample % 3 AS g FROM (
    SELECT ua AS sample FROM p UNION SELECT ub FROM p
  )
), gpairs AS (
  SELECT x.g AS g1, y.g AS g2,
         CAST(x.g AS VARCHAR) || '_' || CAST(y.g AS VARCHAR) AS gp
  FROM (SELECT DISTINCT g FROM s) x JOIN (SELECT DISTINCT g FROM s) y
    ON x.g < y.g
), mem AS (
  SELECT gp, sample, g FROM gpairs JOIN s ON s.g = g1 OR s.g = g2
), ng AS (
  SELECT gp, g, CAST(COUNT(*) AS BIGINT) AS n_g FROM mem GROUP BY gp, g
), nsub AS (
  SELECT gp, CAST(COUNT(*) AS BIGINT) AS n FROM mem GROUP BY gp
), sub AS (
  SELECT ma.gp, p.ua, p.ub, p.dd
  FROM p
  JOIN mem ma ON ma.sample = p.ua
  JOIN mem mb ON mb.gp = ma.gp AND mb.sample = p.ub
), sst AS (
  SELECT gp, {duck_fold('dd')} / ANY_VALUE(n) AS sst, ANY_VALUE(n) AS n
  FROM sub JOIN nsub USING (gp) GROUP BY gp
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT gp, k, sample, g FROM mem CROSS JOIN ks
), o_rank AS (
  SELECT gp, k, sample,
         row_number() OVER (PARTITION BY gp, k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT gp, k, g AS gi,
         row_number() OVER (PARTITION BY gp, k ORDER BY
           md5(gp || ':' || CAST(k AS VARCHAR) || ':' ||
               CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), perm AS (
  SELECT gp, CAST(0 AS BIGINT) AS k, sample, g AS gi FROM mem
  UNION ALL
  SELECT o.gp, o.k, o.sample, m.gi
  FROM o_rank o JOIN m_rank m ON o.gp = m.gp AND o.k = m.k AND o.r = m.r
), within AS (
  SELECT sub.gp, pa.k, pa.gi AS g, sub.ua, sub.ub, sub.dd
  FROM sub
  JOIN perm pa ON pa.gp = sub.gp AND pa.sample = sub.ua
  JOIN perm pb ON pb.gp = sub.gp AND pb.k = pa.k AND pb.sample = sub.ub
  WHERE pa.gi = pb.gi
), ssq AS (
  SELECT gp, k, g, {duck_fold('dd')} AS ssq FROM within GROUP BY gp, k, g
), ssw AS (
  SELECT gp, k,
         list_reduce(list(ssq / n_g ORDER BY g), (acc, v) -> acc + v) AS ssw
  FROM ssq JOIN ng USING (gp, g) GROUP BY gp, k
), f AS (
  SELECT gp, k, (sst - ssw) / (ssw / CAST(n - 2 AS DOUBLE)) AS f
  FROM ssw JOIN sst USING (gp)
), obs AS (
  SELECT gp, f AS pseudo_f FROM f WHERE k = 0
), hits AS (
  SELECT gp, SUM(CASE WHEN k > 0 AND f >= pseudo_f THEN 1 ELSE 0 END) AS h
  FROM f JOIN obs USING (gp) GROUP BY gp
)
SELECT CAST(g1 AS BIGINT) AS g1, CAST(g2 AS BIGINT) AS g2,
       n AS n_samples, pseudo_f,
       CAST(h + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM gpairs JOIN nsub USING (gp) JOIN obs USING (gp) JOIN hits USING (gp)
"""


def d11_alpha_group_significance(
    spark: SparkSession, sf: str, *, n_perm: int = _N_PERM
) -> DataFrame:
    """D11 — alpha-group-significance fully in-plan: Kruskal-Wallis H of
    the per-sample Shannon alpha-diversity vector across the cohort
    split, plus a permutation p-value (reference
    rules/diversity_analysis.smk:88, ``qiime diversity
    alpha-group-significance``, which runs Kruskal-Wallis on the alpha
    vector grouped by a metadata column).

    Unlike :func:`~.diversity.d6_kruskal_wallis` (H + df only, features
    as groups), this runs over the D1 alpha vector and adds the
    permutation p the qiime visualization reports.  Mid-ranks of the n
    alpha values are computed ONCE with the same two-phase distributed
    scan as :func:`d10_anosim` (width_bucket buckets over the value
    range since Shannon is unbounded above, per-bucket parallel running
    sums + a ≤1025-row broadcast offset relation) and kept ×2 (``mr2``,
    exact BIGINT).  Ranks and group sizes are permutation-invariant;
    each of the K+1 relabelings (k = 0 = identity) only re-buckets which
    samples feed which group rank-sum — one broadcast image join.  The
    Σ_g R_g²/n_g fold is pinned in group order so both engines add the
    three doubles identically.  Tie correction matches d6."""
    from .diversity import d1_shannon_diversity

    alpha = (
        d1_shannon_diversity(spark, sf)
        .select(F.col("user_id").alias("sample"), F.col("shannon").alias("v"))
        # EAGER: rank build + perm probe each re-expanded the Shannon
        # subtree under the lazy form
        .localCheckpoint(eager=True)
    )
    vt = alpha.groupBy("v").agg(F.count("*").cast("long").alias("t"))
    bounds = vt.agg(F.min("v").alias("vlo"), F.max("v").alias("vhi"))
    vb = vt.crossJoin(F.broadcast(bounds)).withColumn(
        "b",
        F.when(F.col("vlo") == F.col("vhi"), F.lit(1)).otherwise(
            F.least(F.lit(1024), F.expr("width_bucket(v, vlo, vhi, 1024)"))
        ),
    )
    in_b = vb.withColumn(
        "cum_in",
        F.expr(
            "sum(t) OVER (PARTITION BY b ORDER BY v"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t"
        ),
    )
    off = (
        vb.groupBy("b")
        .agg(F.sum("t").alias("bc"))
        .withColumn(
            "off",
            F.expr(
                "sum(bc) OVER (ORDER BY b"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bc"
            ),
        )
        .select("b", "off")
    )
    ranked = in_b.join(F.broadcast(off), "b").select(
        "v", F.expr("2 * (off + cum_in) + t + 1").alias("mr2")
    )
    av = (
        alpha.join(ranked, "v")
        .select("sample", "mr2")
        .localCheckpoint(eager=True)  # totals + K+1 perm branches
    )
    ng = av.groupBy((F.col("sample") % 3).alias("g")).agg(
        F.count("*").cast("long").alias("n_g")
    )
    scal = av.agg(F.count("*").cast("long").alias("n"))
    agrp = ng.agg(F.count("*").cast("long").alias("a"))
    ties = vt.agg(
        F.expr("SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)").alias("tie_sum")
    )
    samples = av.select("sample")
    perm = _perm_seed(spark, samples, n_perm, include_identity=True)
    rg = (
        av.join(
            F.broadcast(perm.select("k", "sample", (F.col("image") % 3).alias("g"))),
            "sample",
        )
        .groupBy("k", "g")
        .agg(F.sum("mr2").alias("r2"))
    )
    sumr2n = (
        rg.join(F.broadcast(ng), "g")
        .select(
            "k",
            "g",
            F.expr("CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / n_g / 4").alias("v"),
        )
        .groupBy("k")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(g, v))),"
                " CAST(0 AS DOUBLE), (acc, q) -> acc + q.v)"
            ).alias("sum_r2n")
        )
    )
    h = (
        sumr2n.crossJoin(F.broadcast(scal))
        .crossJoin(F.broadcast(ties))
        .select(
            "k",
            F.expr(
                "(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_r2n - 3.0 * (n + 1))"
                " / (1.0 - CAST(tie_sum AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * n * n - n))"
            ).alias("h"),
        )
        # K+1 rows, consumed by obs AND hits (the d16 discipline)
        .localCheckpoint(eager=True)
    )
    obs = h.filter(F.col("k") == 0).select(F.col("h").alias("h_stat"))
    hits = h.crossJoin(F.broadcast(obs)).agg(
        F.expr("SUM(CASE WHEN k > 0 AND h >= h_stat THEN 1 ELSE 0 END)").alias("hh")
    )
    return (
        scal.crossJoin(agrp)
        .crossJoin(obs)
        .crossJoin(hits)
        .select(
            F.col("n").alias("n_samples"),
            F.col("a").alias("n_groups"),
            F.expr("ROUND(h_stat, 6)").alias("h_stat"),
            F.expr("CAST(a - 1 AS BIGINT)").alias("df"),
            F.expr(f"CAST(hh + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
            F.lit(n_perm).cast("long").alias("n_perm"),
        )
    )


def _alpha_gs_sql(n_perm: int = _N_PERM) -> str:
    from .diversity import _D1_SQL

    return f"""
WITH d1 AS ({_D1_SQL}),
alpha AS (
  SELECT user_id AS sample, shannon AS v FROM d1
), vt AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM alpha GROUP BY v
), ranked AS (
  -- mid-rank ×2 from the value-level CDF; DuckDB is single-node so a
  -- global window is fine here — the Spark side's two-phase bucketed
  -- scan computes the same C(v) = (# smaller) by construction
  SELECT v, 2 * (SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS mr2
  FROM vt
), av AS (
  SELECT sample, mr2 FROM alpha JOIN ranked USING (v)
), ng AS (
  SELECT sample % 3 AS g, CAST(COUNT(*) AS BIGINT) AS n_g FROM av GROUP BY 1
), scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM av
), agrp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS a FROM ng
), ties AS (
  SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_sum FROM vt
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT k, sample FROM ks CROSS JOIN (SELECT sample FROM av) samples
), o_rank AS (
  SELECT k, sample,
         row_number() OVER (PARTITION BY k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT k, sample AS image,
         row_number() OVER (PARTITION BY k ORDER BY
           md5(CAST(k AS VARCHAR) || ':' || CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), permk AS (
  SELECT o.k, o.sample, m.image
  FROM o_rank o JOIN m_rank m ON o.k = m.k AND o.r = m.r
), perm AS (
  SELECT CAST(0 AS BIGINT) AS k, sample, sample AS image FROM av
  UNION ALL SELECT k, sample, image FROM permk
), rg AS (
  SELECT k, image % 3 AS g, SUM(mr2) AS r2
  FROM av JOIN perm USING (sample)
  GROUP BY k, image % 3
), sumr2n AS (
  SELECT k, list_reduce(
           list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / n_g / 4 ORDER BY g),
           (acc, x) -> acc + x) AS sum_r2n
  FROM rg JOIN ng USING (g) GROUP BY k
), h AS (
  SELECT k,
         (12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_r2n - 3.0 * (n + 1))
         / (1.0 - CAST(tie_sum AS DOUBLE)
            / (CAST(n AS DOUBLE) * n * n - n)) AS h
  FROM sumr2n CROSS JOIN scal CROSS JOIN ties
), obs AS (
  SELECT h AS h_stat FROM h WHERE k = 0
), hits AS (
  SELECT SUM(CASE WHEN k > 0 AND h >= h_stat THEN 1 ELSE 0 END) AS hh
  FROM h CROSS JOIN obs
)
SELECT n AS n_samples, a AS n_groups, ROUND(h_stat, 6) AS h_stat,
       CAST(a - 1 AS BIGINT) AS df,
       CAST(hh + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM scal CROSS JOIN agrp CROSS JOIN obs CROSS JOIN hits
"""


def _anosim_sql(n_perm: int = _N_PERM) -> str:
    from .diversity import _D2_SQL

    return f"""
WITH bc AS ({_D2_SQL}),
p AS (
  SELECT ua, ub, bray_curtis AS d FROM bc
), dist AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(FLOOR(d * 1024) AS BIGINT) AS b
  FROM p GROUP BY d
), in_b AS (
  SELECT d, cnt, b,
         SUM(cnt) OVER (PARTITION BY b ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cum_in
  FROM dist
), boff AS (
  SELECT b, SUM(bc) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bc AS off
  FROM (SELECT b, SUM(cnt) AS bc FROM dist GROUP BY b)
), ranked AS (
  SELECT d, 2 * (off + cum_in) + cnt + 1 AS mr2 FROM in_b JOIN boff USING (b)
), pr AS (
  SELECT p.ua, p.ub, mr2 FROM p JOIN ranked USING (d)
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, SUM(mr2) AS t2 FROM pr
), samples AS (
  SELECT ua AS sample FROM pr UNION SELECT ub FROM pr
), nsamp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_samples FROM samples
), agrp AS (
  SELECT CAST(COUNT(DISTINCT sample % 3) AS BIGINT) AS a FROM samples
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT k, sample FROM ks CROSS JOIN samples
), o_rank AS (
  SELECT k, sample,
         row_number() OVER (PARTITION BY k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT k, sample AS image,
         row_number() OVER (PARTITION BY k ORDER BY
           md5(CAST(k AS VARCHAR) || ':' || CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), permk AS (
  SELECT o.k, o.sample, m.image
  FROM o_rank o JOIN m_rank m ON o.k = m.k AND o.r = m.r
), perm AS (
  SELECT CAST(0 AS BIGINT) AS k, sample, sample AS image FROM samples
  UNION ALL SELECT k, sample, image FROM permk
), within AS (
  SELECT pa.k, SUM(mr2) AS s2w, CAST(COUNT(*) AS BIGINT) AS nw
  FROM pr
  JOIN perm pa ON pa.sample = pr.ua
  JOIN perm pb ON pb.k = pa.k AND pb.sample = pr.ub
  WHERE pa.image % 3 = pb.image % 3
  GROUP BY pa.k
), rstat AS (
  SELECT k, ((CAST(t2 - s2w AS DOUBLE) / CAST(2 * (m - nw) AS DOUBLE))
           - (CAST(s2w AS DOUBLE) / CAST(2 * nw AS DOUBLE)))
           / (CAST(m AS DOUBLE) / 2) AS r
  FROM within CROSS JOIN tot
), obs AS (
  SELECT r AS anosim_r FROM rstat WHERE k = 0
), hits AS (
  SELECT SUM(CASE WHEN k > 0 AND r >= anosim_r THEN 1 ELSE 0 END) AS h
  FROM rstat CROSS JOIN obs
)
SELECT n_samples, a AS n_groups, anosim_r,
       CAST(h + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM nsamp CROSS JOIN agrp CROSS JOIN obs CROSS JOIN hits
"""


def _permanova_sql(n_perm: int = _N_PERM) -> str:
    from .diversity import _D2_SQL

    def duck_fold(col: str) -> str:
        return f"list_reduce(list({col} ORDER BY ua, ub), (acc, v) -> acc + v)"

    return f"""
WITH bc AS ({_D2_SQL}),
p AS (
  SELECT ua, ub, bray_curtis * bray_curtis AS dd FROM bc
), samples AS (
  SELECT ua AS sample FROM p UNION SELECT ub FROM p
), scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM samples
), ng AS (
  SELECT sample % 3 AS g, CAST(COUNT(*) AS BIGINT) AS n_g
  FROM samples GROUP BY 1
), agrp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS a FROM ng
), sst AS (
  SELECT (SELECT {duck_fold('dd')} FROM p) / n AS sst FROM scal
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT k, sample FROM ks CROSS JOIN samples
), o_rank AS (
  SELECT k, sample,
         row_number() OVER (PARTITION BY k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT k, sample AS image,
         row_number() OVER (PARTITION BY k ORDER BY
           md5(CAST(k AS VARCHAR) || ':' || CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), permk AS (
  SELECT o.k, o.sample, m.image
  FROM o_rank o JOIN m_rank m ON o.k = m.k AND o.r = m.r
), perm AS (
  SELECT CAST(0 AS BIGINT) AS k, sample, sample AS image FROM samples
  UNION ALL SELECT k, sample, image FROM permk
), within AS (
  SELECT pa.k, pa.image % 3 AS g, p.ua, p.ub, p.dd
  FROM p
  JOIN perm pa ON pa.sample = p.ua
  JOIN perm pb ON pb.k = pa.k AND pb.sample = p.ub
  WHERE pa.image % 3 = pb.image % 3
), ssq AS (
  SELECT k, g, {duck_fold('dd')} AS ssq FROM within GROUP BY k, g
), ssw AS (
  SELECT k, list_reduce(list(ssq / n_g ORDER BY g), (acc, v) -> acc + v) AS ssw
  FROM ssq JOIN ng USING (g) GROUP BY k
), f AS (
  SELECT k, ((sst - ssw) / CAST(a - 1 AS DOUBLE))
           / (ssw / CAST(n - a AS DOUBLE)) AS f
  FROM ssw CROSS JOIN sst CROSS JOIN agrp CROSS JOIN scal
), obs AS (
  SELECT f AS pseudo_f FROM f WHERE k = 0
), hits AS (
  SELECT SUM(CASE WHEN k > 0 AND f >= pseudo_f THEN 1 ELSE 0 END) AS h
  FROM f CROSS JOIN obs
)
SELECT n AS n_samples, a AS n_groups, pseudo_f,
       CAST(h + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM scal CROSS JOIN agrp CROSS JOIN obs CROSS JOIN hits
"""


def _mantel_sql(n_perm: int = _N_PERM) -> str:
    from .diversity import _D2_SQL

    def duck_fold(col: str) -> str:
        return f"list_reduce(list({col} ORDER BY ua, ub), (acc, v) -> acc + v)"

    # list_reduce without init seeds acc with the first element; Spark's
    # aggregate seeds 0.0 — identical doubles because 0.0 + x == x exactly
    # and the remaining additions run in the same (ua, ub) order.
    r_expr = (
        "(n_pairs * sxy - sx * sy)"
        " / SQRT((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy))"
    )
    return f"""
WITH bc AS ({_D2_SQL}),
uf AS ({_UF_W_SQL}),
p AS (
  SELECT bc.ua, bc.ub, bray_curtis AS x, unifrac_w AS y,
         bray_curtis * bray_curtis AS xx, unifrac_w * unifrac_w AS yy,
         bray_curtis * unifrac_w AS xy
  FROM bc JOIN uf USING (ua, ub)
), obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         {duck_fold('x')} AS sx, {duck_fold('y')} AS sy,
         {duck_fold('xx')} AS sxx, {duck_fold('yy')} AS syy,
         {duck_fold('xy')} AS sxy
  FROM p
), obs_r AS (
  SELECT n_pairs, sx, sxx, {r_expr} AS mantel_r FROM obs
), samples AS (
  SELECT ua AS sample FROM p UNION SELECT ub FROM p
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT k, sample FROM ks CROSS JOIN samples
), o_rank AS (
  SELECT k, sample,
         row_number() OVER (PARTITION BY k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT k, sample AS image,
         row_number() OVER (PARTITION BY k ORDER BY
           md5(CAST(k AS VARCHAR) || ':' || CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), perm AS (
  SELECT o.k, o.sample, m.image
  FROM o_rank o JOIN m_rank m ON o.k = m.k AND o.r = m.r
), permuted AS (
  SELECT ks.k, p.ua, p.ub, p.x, yk.unifrac_w AS py
  FROM p
  CROSS JOIN ks
  JOIN perm pa ON pa.k = ks.k AND pa.sample = p.ua
  JOIN perm pb ON pb.k = ks.k AND pb.sample = p.ub
  JOIN uf yk ON yk.ua = LEAST(pa.image, pb.image)
            AND yk.ub = GREATEST(pa.image, pb.image)
), per_k AS (
  SELECT k,
         {duck_fold('py')} AS sy,
         {duck_fold('py * py')} AS syy,
         {duck_fold('x * py')} AS sxy
  FROM permuted GROUP BY k
), r_perm AS (
  SELECT {r_expr} AS r_k, mantel_r FROM per_k CROSS JOIN obs_r
), hits AS (
  SELECT SUM(CASE WHEN r_k >= mantel_r THEN 1 ELSE 0 END) AS h FROM r_perm
)
SELECT n_pairs, mantel_r,
       CAST(h + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM obs_r CROSS JOIN hits
"""


# ---------------------------------------------------------------------------
# D14 — alpha-correlation (Spearman + permutation p)
# ---------------------------------------------------------------------------


def _midrank2(vals: DataFrame) -> DataFrame:
    """(sample, v) → (sample, mr2): doubled mid-ranks (exact BIGINT) via
    the d10/d11 two-phase distributed scan — per-bucket parallel running
    sums over width_bucket value buckets + a ≤1025-row broadcast offset
    relation; no global single-partition window."""
    vt = vals.groupBy("v").agg(F.count("*").cast("long").alias("t"))
    bounds = vt.agg(F.min("v").alias("vlo"), F.max("v").alias("vhi"))
    vb = vt.crossJoin(F.broadcast(bounds)).withColumn(
        "b",
        F.when(F.col("vlo") == F.col("vhi"), F.lit(1)).otherwise(
            F.least(F.lit(1024), F.expr("width_bucket(v, vlo, vhi, 1024)"))
        ),
    )
    in_b = vb.withColumn(
        "cum_in",
        F.expr(
            "sum(t) OVER (PARTITION BY b ORDER BY v"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t"
        ),
    )
    off = (
        vb.groupBy("b")
        .agg(F.sum("t").alias("bc"))
        .withColumn(
            "off",
            F.expr(
                "sum(bc) OVER (ORDER BY b"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bc"
            ),
        )
        .select("b", "off")
    )
    ranked = in_b.join(F.broadcast(off), "b").select(
        "v", F.expr("2 * (off + cum_in) + t + 1").alias("mr2")
    )
    return vals.join(ranked, "v").select("sample", "mr2")


def d14_alpha_correlation(
    spark: SparkSession, sf: str, *, n_perm: int = _N_PERM
) -> DataFrame:
    """D14 — ``qiime diversity alpha-correlation``: Spearman rank
    correlation between the per-sample Shannon alpha vector and a
    numeric covariate (here sampling depth = events per sample — the
    depth column every alpha-correlation run includes), WITH the
    two-sided permutation p-value the qiime visualization reports.
    Completes the alpha-significance surface beside
    :func:`d11_alpha_group_significance` (categorical) —
    rules/diversity_analysis.smk:77-88's correlation sibling.

    Exactness: both variables convert to doubled mid-ranks (exact
    BIGINT, the d10/d11 two-phase scan); every Spearman moment is an
    exact DECIMAL(38,0) sum of rank integers, so ρ is ONE identical
    double expression on exact inputs (all magnitudes ≪ 2⁵³ here — the
    w11 split-double idiom stands by for larger n).  Ranks and the
    x-side moments are permutation-invariant; each of the K+1
    relabelings recomputes only Σ rx(s)·ry(π(s)) — one broadcast image
    join — and p = (#{|ρ_k| ≥ |ρ|} + 1)/(K + 1).

    Scale: everything runs on the n-sample alpha vector (never
    corpus-scale); the K+1 branches share one shuffled rank relation."""
    from .diversity import d1_shannon_diversity

    alpha = d1_shannon_diversity(spark, sf).select(
        F.col("user_id").alias("sample"), F.col("shannon").alias("v")
    )
    depth = (
        _t(spark, sf, "events")
        .groupBy(F.col("user_id").alias("sample"))
        .agg(F.expr("CAST(COUNT(*) AS DOUBLE)").alias("v"))
    )
    ax = _midrank2(alpha).select("sample", F.col("mr2").alias("rx"))
    ay = _midrank2(depth).select("sample", F.col("mr2").alias("ry"))
    av = ax.join(ay, "sample").localCheckpoint(eager=False)
    mom = av.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("SUM(CAST(rx AS DECIMAL(38,0)))").alias("sx"),
        F.expr("SUM(CAST(ry AS DECIMAL(38,0)))").alias("sy"),
        F.expr("SUM(CAST(rx AS DECIMAL(38,0)) * rx)").alias("sxx"),
        F.expr("SUM(CAST(ry AS DECIMAL(38,0)) * ry)").alias("syy"),
    )
    samples = av.select("sample")
    perm = _perm_seed(spark, samples, n_perm, include_identity=True)
    ryi = av.select(F.col("sample").alias("image"), F.col("ry").alias("ryi"))
    sxyk = (
        av.select("sample", "rx")
        .join(F.broadcast(perm), "sample")
        .join(F.broadcast(ryi), "image")
        .groupBy("k")
        .agg(F.expr("SUM(CAST(rx AS DECIMAL(38,0)) * ryi)").alias("sxy"))
    )
    rho = sxyk.crossJoin(F.broadcast(mom)).select(
        "k",
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
            " * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))"
        ).alias("r"),
    )
    obs = rho.filter(F.col("k") == 0).select(F.col("r").alias("rho"))
    hits = rho.crossJoin(F.broadcast(obs)).agg(
        F.expr("SUM(CASE WHEN k > 0 AND ABS(r) >= ABS(rho) THEN 1 ELSE 0 END)").alias("hh")
    )
    return (
        mom.select("n")
        .crossJoin(obs)
        .crossJoin(hits)
        .select(
            F.col("n").alias("n_samples"),
            F.expr("ROUND(rho, 6)").alias("spearman_rho"),
            F.expr(f"CAST(hh + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
            F.lit(n_perm).cast("long").alias("n_perm"),
        )
    )


def _alpha_corr_sql(n_perm: int = _N_PERM) -> str:
    from .diversity import _D1_SQL

    def ranked(src: str, out: str) -> str:
        return f"""{out} AS (
  SELECT sample, mr2 FROM {src} JOIN (
    SELECT v, 2 * (SUM(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1 AS mr2
    FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM {src} GROUP BY v)
  ) USING (v)
)"""

    return f"""
WITH d1 AS ({_D1_SQL}),
alpha AS (
  SELECT user_id AS sample, shannon AS v FROM d1
), depth AS (
  SELECT user_id AS sample, CAST(COUNT(*) AS DOUBLE) AS v
  FROM events GROUP BY user_id
), {ranked("alpha", "axr")},
{ranked("depth", "ayr")},
av AS (
  SELECT a.sample, a.mr2 AS rx, b.mr2 AS ry
  FROM axr a JOIN ayr b USING (sample)
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
         SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
         SUM(CAST(ry AS HUGEINT) * ry) AS syy
  FROM av
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT k, sample FROM ks CROSS JOIN (SELECT sample FROM av) samples
), o_rank AS (
  SELECT k, sample,
         row_number() OVER (PARTITION BY k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT k, sample AS image,
         row_number() OVER (PARTITION BY k ORDER BY
           md5(CAST(k AS VARCHAR) || ':' || CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), permk AS (
  SELECT o.k, o.sample, m.image
  FROM o_rank o JOIN m_rank m ON o.k = m.k AND o.r = m.r
), perm AS (
  SELECT CAST(0 AS BIGINT) AS k, sample, sample AS image FROM av
  UNION ALL SELECT k, sample, image FROM permk
), sxyk AS (
  SELECT k, SUM(CAST(a.rx AS HUGEINT) * i.ry) AS sxy
  FROM av a JOIN perm p ON a.sample = p.sample
  JOIN av i ON p.image = i.sample
  GROUP BY k
), rho AS (
  SELECT k,
         CAST(n * sxy - sx * sy AS DOUBLE)
         / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
            * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS r
  FROM sxyk CROSS JOIN mom
), obs AS (
  SELECT r AS rho FROM rho WHERE k = 0
), hits AS (
  SELECT SUM(CASE WHEN k > 0 AND ABS(r) >= ABS(rho) THEN 1 ELSE 0 END) AS hh
  FROM rho CROSS JOIN obs
)
SELECT n AS n_samples, ROUND(rho, 6) AS spearman_rho,
       CAST(hh + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM mom CROSS JOIN obs CROSS JOIN hits
"""


# ---------------------------------------------------------------------------
# D13 — Procrustes comparison of two ordinations
# ---------------------------------------------------------------------------


def d13_procrustes(spark: SparkSession, sf: str, *, n_iter: int | None = None) -> DataFrame:
    """Procrustes analysis between the Bray-Curtis and weighted-UniFrac
    PCoA ordinations — "do the two distance metrics place the samples
    the same way?" (``qiime diversity procrustes-analysis`` /
    vegan::procrustes, the companion qiime surface to the gated Mantel
    test, over the SAME two metrics d9 correlates).

    Both 2-D ordinations come from the in-plan power-iteration engine
    (diversity._pcoa_core) fed by ONE shared cached counts relation (the
    d9 pattern).  Each configuration is centered and scaled to unit
    Frobenius norm; the optimal-rotation residual uses the CLOSED-FORM
    2×2 SVD trace norm: with A = X̂ᵀŶ = [[a,b],[c,d]],
    Q = ‖((a+d)/2, (c−b)/2)‖, R = ‖((a−d)/2, (c+b)/2)‖,
    σ₁+σ₂ = (Q+R) + |Q−R|, and M² = 1 − (σ₁+σ₂)² (reflections allowed,
    scikit-bio convention).  Every reduction is a pinned-order fold and
    every closing expression is one identical double tree — bit-equal
    across engines.

    Scale shape: two bounded-block PCoA runs (matvec joins over the pair
    relation, n-row vector broadcasts) + five n-row moment folds; the
    2×2 SVD is arithmetic, never a linalg call."""
    from .diversity import _BC_BLOCK, _pcoa_core, _pinned, d2_bray_curtis

    iters = n_iter if n_iter is not None else _pcoa_iters()
    counts = (
        _t(spark, sf, "events")
        .filter(F.col("user_id") < _BC_BLOCK)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    bc = (
        d2_bray_curtis(spark, sf, counts=counts)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=False)
    )
    uf = (
        d2_unifrac_weighted(spark, sf, counts=counts)
        .select("ua", "ub", F.expr("unifrac_w * unifrac_w").alias("dd"))
        .localCheckpoint(eager=False)
    )

    def coords(core: DataFrame) -> DataFrame:
        # EAGER checkpoint: the ordination feeds FOUR downstream consumers
        # (mean agg, centering, norm agg, unit scaling), and hat feeds the
        # moment join on top — without truncation the 24-step power chains
        # re-expand ~8x into the moment plan (592 exchanges / 20 s at
        # sf0.1, the round-6 verdict's top perf target).  40 bounded rows;
        # the same fix took text_ccnet_buckets from 24 -> 8 exchanges.
        return core.select(
            "i",
            F.expr("SQRT(GREATEST(lam, 0.0)) * u1").alias("c1"),
            F.expr("SQRT(GREATEST(lam2, 0.0)) * u2").alias("c2"),
        ).localCheckpoint(eager=True)

    def unitize(cfg: DataFrame):
        mx = cfg.agg(
            F.expr(_pinned("c1", "i")).alias("s1"),
            F.expr(_pinned("c2", "i")).alias("s2"),
            F.count("*").cast("long").alias("n"),
        )
        cen = cfg.crossJoin(F.broadcast(mx)).select(
            "i",
            F.expr("c1 - s1 / n").alias("x1"),
            F.expr("c2 - s2 / n").alias("x2"),
        )
        ss = cen.select(
            "i", "x1", "x2", F.expr("x1 * x1 + x2 * x2").alias("q")
        ).agg(F.expr(_pinned("q", "i")).alias("ss"))
        hat = cen.crossJoin(F.broadcast(ss)).select(
            "i",
            F.expr("x1 / SQRT(ss)").alias("x1"),
            F.expr("x2 / SQRT(ss)").alias("x2"),
        ).localCheckpoint(eager=True)  # 40 unit-scaled rows, 4 moment uses
        return hat, mx.select("n")

    # The two ordination chains are INDEPENDENT until the moment join —
    # each is a serial ladder of bounded eager checkpoints (adjacency /
    # axis-1 / axis-2 / coords / unit-scale), so submitting them from
    # two driver threads lets the second chain's jobs back-fill the
    # executor slots the first chain's 1-to-40-row barrier jobs leave
    # idle (the overlap-independent-jobs pattern; job descriptions and
    # plans are unchanged, results bit-identical — only the submission
    # order differs).  Measured r12: 3.0 → ~2.2 s at sf0.1.
    with ThreadPoolExecutor(max_workers=2) as pool:
        fx = pool.submit(lambda: unitize(coords(_pcoa_core(bc, iters))))
        fy = pool.submit(lambda: unitize(coords(_pcoa_core(uf, iters))))
        xh, nrel = fx.result()
        yh, _ = fy.result()
    yh = yh.select("i", F.col("x1").alias("y1"), F.col("x2").alias("y2"))
    mom = (
        xh.join(yh, "i")
        .select(
            "i",
            F.expr("x1 * y1").alias("paa"),
            F.expr("x1 * y2").alias("pab"),
            F.expr("x2 * y1").alias("pba"),
            F.expr("x2 * y2").alias("pbb"),
        )
        .agg(
            F.expr(_pinned("paa", "i")).alias("a"),
            F.expr(_pinned("pab", "i")).alias("b"),
            F.expr(_pinned("pba", "i")).alias("c"),
            F.expr(_pinned("pbb", "i")).alias("d"),
        )
    )
    qr = mom.select(
        F.expr(
            "SQRT(((a + d) / 2) * ((a + d) / 2) + ((c - b) / 2) * ((c - b) / 2))"
        ).alias("qq"),
        F.expr(
            "SQRT(((a - d) / 2) * ((a - d) / 2) + ((c + b) / 2) * ((c + b) / 2))"
        ).alias("rr"),
    ).select(F.expr("(qq + rr) + ABS(qq - rr)").alias("t"))
    return qr.crossJoin(F.broadcast(nrel)).select(
        F.col("n").alias("n_samples"),
        F.expr("ROUND(t, 6)").alias("trace_sigma"),
        F.expr("ROUND(1 - t * t, 6)").alias("m2"),
    )


def _pcoa_iters() -> int:
    from .diversity import _PCOA_ITERS

    return _PCOA_ITERS


def pipeline_core_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """The core-metrics bundle composed as ONE plan — the engine twin of
    the reference's end-to-end analysis chain (``qiime diversity
    core-metrics-phylogenetic``, rules/diversity_analysis.smk:5-40,
    which emits every alpha metric and distance matrix in one run):
    observed features, Shannon, Pielou evenness, chao1, Good's
    coverage, and Faith's PD (over the real parsed Newick tree) over
    samples, plus ALL FOUR distance matrices the bundle emits — jaccard,
    Bray-Curtis, weighted and unweighted UniFrac — over sample pairs — each summarized as (n_units, mean, min, max).

    One plan, ONE events scan: every branch — five alpha metrics and
    all four distance matrices — derives from a single eagerly
    checkpointed (user_id, event_type, c) counts relation, so the
    PHYSICAL plan states the reuse instead of restating ten copies of
    the count subtree and leaning on runtime ReuseExchange (round-7
    verdict item 5; same fix as d16_permdisp's 92 → 8 exchanges).  The
    summary is ONE groupBy(metric) whose mean is a pinned-order fold
    over the unit key — identical doubles in identical order on both
    engines.  Evenness-undefined samples (a single feature) are
    excluded from that metric's units on both engines."""
    from .diversity import (
        d1_shannon_diversity,
        d2_bray_curtis,
        d2_jaccard_beta,
        d15_chao1_coverage,
        d17_pielou_evenness,
    )

    ev = _t(spark, sf, "events")
    # the shared feature table: bounded by |samples|×|event types| rows
    cnts = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    blocked = cnts.filter(F.col("user_id") < _BLOCK)

    def alpha(df: DataFrame, col: str, metric: str) -> DataFrame:
        return df.select(
            F.lit(metric).alias("metric"),
            F.expr("CAST(user_id AS STRING)").alias("k"),
            F.col(col).cast("double").alias("v"),
        )

    def beta(df: DataFrame, col: str, metric: str) -> DataFrame:
        return df.select(
            F.lit(metric).alias("metric"),
            F.expr("concat(CAST(ua AS STRING), ':', CAST(ub AS STRING))").alias("k"),
            F.col(col).cast("double").alias("v"),
        )

    # sh and ch are sample-bounded (one row per sample) and each feeds
    # TWO metric branches — checkpoint so the plan states that reuse too.
    # The two checkpoints are INDEPENDENT consumers of the cnts
    # checkpoint, so their materialization jobs are submitted from two
    # driver threads (the d13_procrustes overlap pattern, guide §2.6):
    # plans and results are bit-identical, only the submission order
    # differs.
    with ThreadPoolExecutor(max_workers=2) as pool:
        fsh = pool.submit(
            lambda: d1_shannon_diversity(spark, sf, counts=cnts).localCheckpoint(
                eager=True
            )
        )
        fch = pool.submit(
            lambda: d15_chao1_coverage(spark, sf, counts=cnts).localCheckpoint(
                eager=True
            )
        )
        sh = fsh.result()
        ch = fch.result()
    parts = [
        alpha(sh, "n_features", "observed_features"),
        alpha(sh, "shannon", "shannon"),
        alpha(
            d17_pielou_evenness(spark, sf, counts=cnts).filter(
                F.col("pielou_evenness").isNotNull()
            ),
            "pielou_evenness",
            "pielou_evenness",
        ),
        alpha(ch, "chao1", "chao1"),
        alpha(ch, "goods_coverage", "goods_coverage"),
        alpha(d1_faith_pd_newick(spark, sf, counts=cnts), "pd", "faith_pd"),
        beta(d2_jaccard_beta(spark, sf, counts=cnts), "jaccard_dist", "jaccard"),
        beta(d2_bray_curtis(spark, sf, counts=blocked), "bray_curtis", "bray_curtis"),
        beta(d2_unifrac_weighted(spark, sf, counts=blocked), "unifrac_w", "unifrac_w"),
        beta(
            d2_unifrac_unweighted(spark, sf, counts=blocked),
            "unifrac_u",
            "unifrac_u",
        ),
    ]
    u = parts[0]
    for x in parts[1:]:
        u = u.unionAll(x)
    return u.groupBy("metric").agg(
        F.count("*").cast("long").alias("n_units"),
        F.expr(
            "ROUND(aggregate(array_sort(collect_list(struct(k, v))),"
            " CAST(0 AS DOUBLE), (acc, q) -> acc + q.v) / COUNT(*), 6)"
        ).alias("mean_value"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
    )


def _core_metrics_sql() -> str:
    from .diversity import _D2_SQL, _D2J_SQL, _D15_SQL, _D17_SQL
    from .diversity import _D1_SQL as _D1

    return f"""
WITH sh AS ({_D1}),
ev AS ({_D17_SQL}),
ch AS ({_D15_SQL}),
fa AS ({_FAITH_NEWICK_SQL}),
jc AS ({_D2J_SQL}),
bc AS ({_D2_SQL}),
uf AS ({_UF_W_SQL}),
ufu AS ({_UF_U_SQL}),
m AS (
  SELECT 'observed_features' AS metric, CAST(user_id AS VARCHAR) AS k,
         CAST(n_features AS DOUBLE) AS v FROM sh
  UNION ALL
  SELECT 'shannon', CAST(user_id AS VARCHAR), shannon FROM sh
  UNION ALL
  SELECT 'pielou_evenness', CAST(user_id AS VARCHAR), pielou_evenness
  FROM ev WHERE pielou_evenness IS NOT NULL
  UNION ALL
  SELECT 'chao1', CAST(user_id AS VARCHAR), chao1 FROM ch
  UNION ALL
  SELECT 'goods_coverage', CAST(user_id AS VARCHAR), goods_coverage FROM ch
  UNION ALL
  SELECT 'faith_pd', CAST(user_id AS VARCHAR), CAST(pd AS DOUBLE) FROM fa
  UNION ALL
  SELECT 'jaccard', CAST(ua AS VARCHAR) || ':' || CAST(ub AS VARCHAR),
         jaccard_dist FROM jc
  UNION ALL
  SELECT 'bray_curtis', CAST(ua AS VARCHAR) || ':' || CAST(ub AS VARCHAR),
         bray_curtis FROM bc
  UNION ALL
  SELECT 'unifrac_w', CAST(ua AS VARCHAR) || ':' || CAST(ub AS VARCHAR),
         unifrac_w FROM uf
  UNION ALL
  SELECT 'unifrac_u', CAST(ua AS VARCHAR) || ':' || CAST(ub AS VARCHAR),
         unifrac_u FROM ufu
)
SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_units,
       ROUND(list_reduce(list(v ORDER BY k), (acc, x) -> acc + x)
             / COUNT(*), 6) AS mean_value,
       MIN(v) AS min_value, MAX(v) AS max_value
FROM m GROUP BY metric
"""


def d16_permdisp(
    spark: SparkSession, sf: str, *, n_perm: int = _N_PERM
) -> DataFrame:
    """D16 — PERMDISP (Anderson 2006, homogeneity of multivariate
    dispersions): the THIRD ``--p-method`` of qiime's
    beta-group-significance surface (rules/diversity_analysis.smk:91-102
    alongside the gated permanova and anosim).  PERMANOVA asks "are the
    group CENTROIDS apart?"; PERMDISP asks "are the group SPREADS
    different?" — a significant PERMANOVA with a significant PERMDISP
    may be a dispersion artifact, which is why qiime runs both.

    Statistic: samples are placed by the in-plan PCoA ordination
    (diversity._pcoa_core over Bray-Curtis — the centroid variant of
    scikit-bio's permdisp, over the top-2 axes; scikit-bio's default
    spatial-median variant needs an iterative Weiszfeld solve the
    2-axis demo doesn't warrant), each sample's dispersion z_i is its
    Euclidean distance to its group centroid, and F is the one-way
    ANOVA F over the z vector.  The permutation p relabels groups with
    the shared md5-seeded bijection relation (k = 0 is the identity, so
    the observed F runs through the IDENTICAL expression tree as every
    permuted F).

    Scale shape: the ordination is the bounded-block array form (three
    1-row checkpoint jobs); the permutation grid is n·(K+1) rows with
    (K+1)·a-row centroid/group-stat relations broadcast back; every sum
    is a pinned-order fold, so both engines add identical doubles
    identically.  Groups: sample % 3 (the demo cohort convention)."""
    from .diversity import _PCOA_ITERS, _pcoa_core, _pinned, d2_bray_curtis

    p = (
        d2_bray_curtis(spark, sf)
        .select("ua", "ub", F.expr("bray_curtis * bray_curtis").alias("dd"))
        .localCheckpoint(eager=False)
    )
    coords = (
        _pcoa_core(p, _PCOA_ITERS)
        .select(
            F.col("i").alias("sample"),
            F.expr("SQRT(GREATEST(lam, 0.0)) * u1").alias("c1"),
            F.expr("SQRT(GREATEST(lam2, 0.0)) * u2").alias("c2"),
        )
        .localCheckpoint(eager=True)  # n bounded rows, K+1 consumers
    )
    samples = coords.select("sample")
    scal = samples.agg(F.count("*").alias("n"))
    agrp = samples.select((F.col("sample") % 3).alias("g")).distinct().agg(
        F.count("*").alias("a")
    )
    perm = _perm_seed(spark, samples, n_perm, include_identity=True)
    pts = (
        perm.select("k", "sample", (F.col("image") % 3).alias("g"))
        .join(F.broadcast(coords), "sample")
        # n·(K+1) bounded rows feeding cent AND z — without truncation the
        # perm-grid windows re-expand into every downstream branch (audited
        # at 92 exchanges before this checkpoint)
        .localCheckpoint(eager=True)
    )
    cent = pts.groupBy("k", "g").agg(
        (F.expr(_pinned("c1", "sample")) / F.count("*")).alias("m1"),
        (F.expr(_pinned("c2", "sample")) / F.count("*")).alias("m2"),
    )
    z = pts.join(F.broadcast(cent), ["k", "g"]).select(
        "k",
        "g",
        "sample",
        F.expr(
            "SQRT((c1 - m1) * (c1 - m1) + (c2 - m2) * (c2 - m2))"
        ).alias("z"),
    )
    z = z.localCheckpoint(eager=True)  # n·(K+1) rows, 2 consumers
    gstat = z.groupBy("k", "g").agg(
        F.expr(_pinned("z", "sample")).alias("sz"),
        F.count("*").cast("long").alias("n_g"),
    ).localCheckpoint(eager=True)  # (K+1)·a rows, 3 consumers
    resid = (
        z.join(F.broadcast(gstat), ["k", "g"])
        .select(
            "k",
            "g",
            "sample",
            F.expr("(z - sz / n_g) * (z - sz / n_g)").alias("r2"),
        )
        .groupBy("k", "g")
        .agg(F.expr(_pinned("r2", "sample")).alias("wg"))
    )
    # the grand mean must be a per-k scalar available INSIDE the between
    # fold: compute it in a first pass, then fold with it joined in
    gm = gstat.groupBy("k").agg(
        (F.expr(_pinned("sz", "g")) / F.sum("n_g")).alias("gm")
    )
    between = (
        gstat.join(F.broadcast(gm), "k")
        .select(
            "k",
            "g",
            F.expr("n_g * (sz / n_g - gm) * (sz / n_g - gm)").alias("bg"),
        )
        .groupBy("k")
        .agg(F.expr(_pinned("bg", "g")).alias("between"))
    )
    within = resid.groupBy("k").agg(F.expr(_pinned("wg", "g")).alias("within"))
    f = (
        between.join(within, "k")
        .crossJoin(F.broadcast(scal))
        .crossJoin(F.broadcast(agrp))
        .select(
            "k",
            F.expr(
                "(between / CAST(a - 1 AS DOUBLE))"
                " / (within / CAST(n - a AS DOUBLE))"
            ).alias("f"),
        )
        .localCheckpoint(eager=True)  # K+1 rows, 3 consumers (obs, hits×2)
    )
    obs = f.filter(F.col("k") == 0).select(F.col("f").alias("f_disp"))
    hits = f.crossJoin(F.broadcast(obs)).agg(
        F.expr("SUM(CASE WHEN k > 0 AND f >= f_disp THEN 1 ELSE 0 END)").alias("h")
    )
    return (
        scal.crossJoin(agrp)
        .crossJoin(obs)
        .crossJoin(hits)
        .select(
            F.col("n").cast("long").alias("n_samples"),
            F.col("a").cast("long").alias("n_groups"),
            F.expr("ROUND(f_disp, 6)").alias("f_disp"),
            F.expr(f"CAST(h + 1 AS DOUBLE) / {n_perm + 1}").alias("p_value"),
            F.lit(n_perm).cast("long").alias("n_perm"),
        )
    )


def _permdisp_sql(n_perm: int = _N_PERM) -> str:
    from .diversity import _D2_SQL, _pcoa_ctes, _PCOA_ITERS

    def duck_fold(col: str, by: str) -> str:
        return f"list_reduce(list({col} ORDER BY {by}), (acc, v) -> acc + v)"

    return f"""
WITH xdist AS MATERIALIZED (
  SELECT ua, ub, bray_curtis AS dist FROM ({_D2_SQL})
),
{_pcoa_ctes(_PCOA_ITERS, "x")},
coords AS MATERIALIZED (
  SELECT v1.i AS sample,
         SQRT(GREATEST((SELECT lam FROM xl1), 0.0)) * v1.x AS c1,
         SQRT(GREATEST((SELECT lam2 FROM xl2), 0.0)) * v2.x AS c2
  FROM xv1 v1 JOIN xv2 v2 ON v1.i = v2.i
), samples AS (
  SELECT sample FROM coords
), scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM samples
), agrp AS (
  SELECT CAST(COUNT(DISTINCT sample % 3) AS BIGINT) AS a FROM samples
), ks AS (
  SELECT CAST(range AS BIGINT) AS k FROM range(1, {n_perm + 1})
), base AS (
  SELECT k, sample FROM ks CROSS JOIN samples
), o_rank AS (
  SELECT k, sample,
         row_number() OVER (PARTITION BY k ORDER BY sample) AS r
  FROM base
), m_rank AS (
  SELECT k, sample AS image,
         row_number() OVER (PARTITION BY k ORDER BY
           md5(CAST(k AS VARCHAR) || ':' || CAST(sample AS VARCHAR)), sample) AS r
  FROM base
), permk AS (
  SELECT o.k, o.sample, m.image
  FROM o_rank o JOIN m_rank m ON o.k = m.k AND o.r = m.r
), perm AS (
  SELECT CAST(0 AS BIGINT) AS k, sample, sample AS image FROM samples
  UNION ALL SELECT k, sample, image FROM permk
), pts AS MATERIALIZED (
  SELECT p.k, p.sample, p.image % 3 AS g, c.c1, c.c2
  FROM perm p JOIN coords c USING (sample)
), cent AS (
  SELECT k, g, {duck_fold('c1', 'sample')} / COUNT(*) AS m1,
         {duck_fold('c2', 'sample')} / COUNT(*) AS m2
  FROM pts GROUP BY k, g
), z AS MATERIALIZED (
  SELECT p.k, p.g, p.sample,
         SQRT((c1 - m1) * (c1 - m1) + (c2 - m2) * (c2 - m2)) AS z
  FROM pts p JOIN cent USING (k, g)
), gstat AS MATERIALIZED (
  SELECT k, g, {duck_fold('z', 'sample')} AS sz,
         CAST(COUNT(*) AS BIGINT) AS n_g
  FROM z GROUP BY k, g
), resid AS (
  SELECT k, g, {duck_fold('r2', 'sample')} AS wg
  FROM (
    SELECT z.k, z.g, z.sample, (z.z - sz / n_g) * (z.z - sz / n_g) AS r2
    FROM z JOIN gstat USING (k, g)
  ) GROUP BY k, g
), gm AS (
  SELECT k, {duck_fold('sz', 'g')} / SUM(n_g) AS gm FROM gstat GROUP BY k
), between_k AS (
  SELECT k, {duck_fold('bg', 'g')} AS between
  FROM (
    SELECT g1.k, g1.g, n_g * (sz / n_g - gm) * (sz / n_g - gm) AS bg
    FROM gstat g1 JOIN gm USING (k)
  ) GROUP BY k
), within_k AS (
  SELECT k, {duck_fold('wg', 'g')} AS within FROM resid GROUP BY k
), f AS (
  SELECT k, (between / CAST(a - 1 AS DOUBLE))
          / (within / CAST(n - a AS DOUBLE)) AS f
  FROM between_k JOIN within_k USING (k)
  CROSS JOIN scal CROSS JOIN agrp
), obs AS (
  SELECT f AS f_disp FROM f WHERE k = 0
), hits AS (
  SELECT SUM(CASE WHEN k > 0 AND f >= f_disp THEN 1 ELSE 0 END) AS h
  FROM f CROSS JOIN obs
)
SELECT n AS n_samples, a AS n_groups, ROUND(f_disp, 6) AS f_disp,
       CAST(h + 1 AS DOUBLE) / {n_perm + 1} AS p_value,
       CAST({n_perm} AS BIGINT) AS n_perm
FROM scal CROSS JOIN agrp CROSS JOIN obs CROSS JOIN hits
"""


def _procrustes_sql() -> str:
    from .diversity import _D2_SQL, _fold_sql, _pcoa_ctes, _PCOA_ITERS

    fold = _fold_sql

    def unit(pre: str, out1: str, out2: str) -> str:
        return f"""{pre}c0 AS (
  SELECT v1.i,
         SQRT(GREATEST((SELECT lam FROM {pre}l1), 0.0)) * v1.x AS c1,
         SQRT(GREATEST((SELECT lam2 FROM {pre}l2), 0.0)) * v2.x AS c2
  FROM {pre}v1 v1 JOIN {pre}v2 v2 ON v1.i = v2.i
), {pre}mx AS (
  SELECT {fold('c1', 'i')} AS s1, {fold('c2', 'i')} AS s2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM {pre}c0
), {pre}cen AS (
  SELECT i, c1 - (SELECT s1 FROM {pre}mx) / (SELECT n FROM {pre}mx) AS x1,
         c2 - (SELECT s2 FROM {pre}mx) / (SELECT n FROM {pre}mx) AS x2
  FROM {pre}c0
), {pre}ssq AS (
  SELECT {fold('q', 'i')} AS ss
  FROM (SELECT i, x1 * x1 + x2 * x2 AS q FROM {pre}cen)
), {pre}hat AS (
  SELECT i, x1 / SQRT((SELECT ss FROM {pre}ssq)) AS {out1},
         x2 / SQRT((SELECT ss FROM {pre}ssq)) AS {out2}
  FROM {pre}cen
)"""

    return f"""
WITH xdist AS MATERIALIZED (
  SELECT ua, ub, bray_curtis AS dist FROM ({_D2_SQL})
),
{_pcoa_ctes(_PCOA_ITERS, "x")},
ydist AS MATERIALIZED (
  SELECT ua, ub, unifrac_w AS dist FROM ({_UF_W_SQL})
),
{_pcoa_ctes(_PCOA_ITERS, "y")},
{unit("x", "x1", "x2")},
{unit("y", "y1", "y2")},
pj AS (
  SELECT xhat.i, x1 * y1 AS paa, x1 * y2 AS pab, x2 * y1 AS pba, x2 * y2 AS pbb
  FROM xhat JOIN yhat ON xhat.i = yhat.i
), mm AS (
  SELECT {fold('paa', 'i')} AS a, {fold('pab', 'i')} AS b,
         {fold('pba', 'i')} AS c, {fold('pbb', 'i')} AS d
  FROM pj
), qr AS (
  SELECT SQRT(((a + d) / 2) * ((a + d) / 2) + ((c - b) / 2) * ((c - b) / 2)) AS qq,
         SQRT(((a - d) / 2) * ((a - d) / 2) + ((c + b) / 2) * ((c + b) / 2)) AS rr
  FROM mm
), tt AS (
  SELECT (qq + rr) + ABS(qq - rr) AS t FROM qr
)
SELECT (SELECT n FROM xmx) AS n_samples,
       ROUND(t, 6) AS trace_sigma,
       ROUND(1 - t * t, 6) AS m2
FROM tt
"""


QUERIES: dict[str, QuerySpec] = {
    "d14_alpha_correlation": QuerySpec(
        d14_alpha_correlation,
        _alpha_corr_sql(),
        "D-family rules/diversity_analysis.smk:77-88 sibling (qiime diversity "
        "alpha-correlation): Spearman on exact doubled mid-ranks + two-sided "
        "permutation p",
    ),
    "d13_procrustes": QuerySpec(
        d13_procrustes,
        _procrustes_sql(),
        "beyond-reference qiime surface (diversity procrustes-analysis): "
        "Bray-Curtis vs weighted-UniFrac ordinations, closed-form 2x2 SVD trace norm",
    ),
    "d4_permanova": QuerySpec(
        d4_permanova,
        _permanova_sql(),
        "D4 rules/diversity_analysis.smk:91-102 (beta-group-significance permanova): "
        "pseudo-F + permutation p fully in-plan, 199 md5-seeded relabelings",
    ),
    "d4_permanova_pairwise": QuerySpec(
        d4_permanova_pairwise,
        _permanova_pairwise_sql(),
        "D4 rules/diversity_analysis.smk:101 (--p-pairwise): per-group-pair "
        "PERMANOVA, each pair with its own in-plan 99-permutation family",
    ),
    "d11_alpha_group_significance": QuerySpec(
        d11_alpha_group_significance,
        _alpha_gs_sql(),
        "D11 rules/diversity_analysis.smk:88 (alpha-group-significance): "
        "Kruskal-Wallis over the D1 Shannon vector, two-phase mid-ranks, "
        "199 in-plan permutations",
    ),
    "pipeline_core_metrics": QuerySpec(
        pipeline_core_metrics,
        _core_metrics_sql(),
        "D-family composition (qiime core-metrics, smk:5-40): six alpha "
        "metrics (incl. faith_pd over the parsed Newick tree) + all four "
        "distance matrices summarized in ONE plan with "
        "shared count subtrees and pinned-order mean folds",
    ),
    "d16_permdisp": QuerySpec(
        d16_permdisp,
        _permdisp_sql(),
        "D16 rules/diversity_analysis.smk:91-102 (beta-group-significance, "
        "permdisp p-method — the third and last): Anderson 2006 dispersion "
        "F over in-plan PCoA distances-to-centroid + 199 permutations",
    ),
    "d10_anosim": QuerySpec(
        d10_anosim,
        _anosim_sql(),
        "D10 rules/diversity_analysis.smk:101 (beta-group-significance, anosim "
        "p-method): Clarke R over two-phase distributed mid-ranks + 199 "
        "in-plan permutations",
    ),
    "d9_mantel_test": QuerySpec(
        d9_mantel_test,
        _mantel_sql(),
        "beyond-reference: Mantel matrix correlation (Bray-Curtis vs weighted UniFrac; "
        "vegan::mantel companion to D2/D4), pinned-order moment folds",
    ),
    "d1_faith_pd": QuerySpec(
        d1_faith_pd, _FAITH_SQL, "D1 rules/diversity_analysis.smk:42-75 (faith_pd)"
    ),
    "d1_faith_pd_newick": QuerySpec(
        d1_faith_pd_newick,
        _FAITH_NEWICK_SQL,
        "D1 via real Newick ingest: rules/process_sequencing_data.smk:72-89 tree artifact",
    ),
    "d2_unifrac_weighted_newick": QuerySpec(
        d2_unifrac_weighted_newick,
        _UF_W_NEWICK_SQL,
        "D2 via real Newick ingest: rules/diversity_analysis.smk:5-40 on a parsed tree",
    ),
    "d2_unifrac_unweighted_newick": QuerySpec(
        d2_unifrac_unweighted_newick,
        _UF_U_NEWICK_SQL,
        "D2 via real Newick ingest: rules/diversity_analysis.smk:5-40 "
        "(unweighted UniFrac over the SAME parsed tree as the weighted variant)",
    ),
    "d2_unifrac_unweighted": QuerySpec(
        d2_unifrac_unweighted,
        _UF_U_SQL,
        "D2 rules/diversity_analysis.smk:5-40 (unweighted UniFrac)",
    ),
    "d2_unifrac_weighted": QuerySpec(
        d2_unifrac_weighted,
        _UF_W_SQL,
        "D2 rules/diversity_analysis.smk:5-40 (weighted UniFrac)",
    ),
}
