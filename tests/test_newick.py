"""Newick loader + real-tree diversity metrics.

Parity targets: the reference's rooted fasttree artifact
(rules/process_sequencing_data.smk:75-92) consumed by faith_pd/UniFrac
(rules/diversity_analysis.smk:5-75).  The small fixtures here are
hand-computed; the 10-leaf fixture is cross-checked against an
independent brute-force implementation written straight from the metric
definitions (no engine code reuse).
"""

from __future__ import annotations

import math

import pytest

from mmeds_meta_spark.sources.newick import (
    NewickParseError,
    membership_rows,
    parse_newick,
    read_newick,
)

# ((A:1,B:2)x:4,(C:3)y:5);  — the worked example used throughout
_SMALL = "((A:1,B:2)x:4,(C:3)y:5);"


def test_parse_structure():
    root = parse_newick(_SMALL)
    assert len(root.children) == 2
    x, y = root.children
    assert x.name == "x" and x.length == 4.0
    assert [c.name for c in x.children] == ["A", "B"]
    assert [c.length for c in x.children] == [1.0, 2.0]
    assert y.name == "y" and y.length == 5.0 and y.children[0].name == "C"


def test_parse_quoted_comment_underscore_scientific():
    root = parse_newick("('a ''b'':c'[comment]:1e-2,d_e:2.5)r;")
    q, d = root.children
    assert q.name == "a 'b':c" and q.length == pytest.approx(0.01)
    assert d.name == "d e" and d.length == 2.5
    assert root.name == "r"


def test_parse_fasttree_support_labels():
    # fasttree writes support values as internal labels
    root = parse_newick("((A:0.1,B:0.2)0.95:0.3,C:0.4);")
    assert root.children[0].name == "0.95"


def test_parse_errors():
    for bad in ["(A:1,B:2)", "((A:1,B:2;", "(A:1,'B:2);", "(A:x)z;"]:
        with pytest.raises(NewickParseError):
            parse_newick(bad)


def test_membership_rows_small():
    rows = set(membership_rows(parse_newick(_SMALL)))
    assert rows == {
        ("0", 4.0, "A", False),
        ("0", 4.0, "B", False),
        ("0.0", 1.0, "A", True),
        ("0.1", 2.0, "B", True),
        ("1", 5.0, "C", False),
        ("1.0", 3.0, "C", True),
    }


def _features(spark, counts: dict[tuple[str, str], int]):
    return spark.createDataFrame(
        [(s, f, float(c)) for (s, f), c in counts.items()],
        "sample string, feature string, count double",
    )


def test_faith_pd_hand_computed(spark):
    """s1 covers A,B → branches {0,0.0,0.1}: PD = 4+1+2 = 7.
    s2 covers B,C → {0,0.1,1,1.0}: PD = 4+2+5+3 = 14."""
    from mmeds_meta_spark.functions.tree_metrics import faith_pd, tree_cov

    feats = _features(spark, {("s1", "A"): 3, ("s1", "B"): 1, ("s2", "B"): 2, ("s2", "C"): 5})
    got = {r.sample: (r.n_branches, r.pd) for r in faith_pd(
        tree_cov(feats, read_newick(spark, _SMALL))
    ).collect()}
    assert got == {"s1": (3, 7.0), "s2": (4, 14.0)}


def test_unifrac_hand_computed(spark):
    """Same coverage as above.
    unweighted: Ta=7, Tb=14, shared branches {0,0.1} → S=6
      → (7+14−12)/(7+14−6) = 9/15 = 0.6
    weighted: Na=4, Nb=7; per-branch |ca/Na − cb/Nb|·len:
      0   (cb under x: a=4, b=2):  4·|4/4 − 2/7|  = 20/7
      0.0 (A: a=3, b=0):           1·|3/4 − 0|    = 3/4
      0.1 (B: a=1, b=2):           2·|1/4 − 2/7|  = 2/28
      1   (y: a=0, b=5):           5·|0 − 5/7|    = 25/7
      1.0 (C: a=0, b=5):           3·|0 − 5/7|    = 15/7
      total = 20/7 + 3/4 + 1/14 + 25/7 + 15/7 = 6²⁄₇ + 0.75 + 1/14 ≈ 7.392857142857143
    """
    from mmeds_meta_spark.functions.tree_metrics import (
        tree_cov,
        unifrac_unweighted,
        unifrac_weighted,
    )

    feats = _features(spark, {("s1", "A"): 3, ("s1", "B"): 1, ("s2", "B"): 2, ("s2", "C"): 5})
    cov = tree_cov(feats, read_newick(spark, _SMALL)).cache()
    (u,) = unifrac_unweighted(cov).collect()
    assert (u.sa, u.sb) == ("s1", "s2")
    assert u.unifrac_u == pytest.approx(0.6)
    (w,) = unifrac_weighted(cov).collect()
    expected = 20 / 7 + 3 / 4 + 1 / 14 + 25 / 7 + 15 / 7
    assert w.unifrac_w == pytest.approx(expected)


def _brute_force(newick: str, counts: dict[tuple[str, str], int]):
    """Independent implementation straight from the definitions."""
    rows = membership_rows(parse_newick(newick))
    samples = sorted({s for s, _ in counts})
    # branch → (length, set of leaves)
    bl: dict[str, float] = {}
    leaves: dict[str, set] = {}
    for b, ln, leaf, _ in rows:
        bl[b] = ln
        leaves.setdefault(b, set()).add(leaf)
    cov = {
        s: {
            b: sum(counts.get((s, leaf), 0) for leaf in ls)
            for b, ls in leaves.items()
        }
        for s in samples
    }
    pd = {
        s: sum(bl[b] for b, c in cov[s].items() if c > 0) for s in samples
    }
    n = {s: sum(counts.get((s, leaf), 0) for leaf in {l for ls in leaves.values() for l in ls}) for s in samples}
    uu, uw = {}, {}
    for i, sa in enumerate(samples):
        for sb in samples[i + 1:]:
            shared = sum(
                bl[b] for b in bl if cov[sa][b] > 0 and cov[sb][b] > 0
            )
            ta, tb = pd[sa], pd[sb]
            uu[sa, sb] = (ta + tb - 2 * shared) / (ta + tb - shared)
            uw[sa, sb] = sum(
                bl[b] * abs(cov[sa][b] / n[sa] - cov[sb][b] / n[sb])
                for b in bl
                if cov[sa][b] > 0 or cov[sb][b] > 0
            )
    return pd, uu, uw


def test_ten_leaf_against_brute_force(spark):
    """10-leaf caterpillar-ish tree with float lengths + 4 samples:
    engine output must match the definition-level brute force."""
    from mmeds_meta_spark.functions.tree_metrics import (
        faith_pd,
        tree_cov,
        unifrac_unweighted,
        unifrac_weighted,
    )

    leaves = [f"L{i}" for i in range(10)]
    nwk = (
        "(((L0:0.11,L1:0.07)0.9:0.31,(L2:0.05,(L3:0.17,L4:0.13)0.8:0.23)0.7:0.19)0.6:0.41,"
        "((L5:0.29,L6:0.02)0.5:0.37,(L7:0.08,(L8:0.12,L9:0.06)0.4:0.14)0.3:0.22)0.2:0.03);"
    )
    counts = {}
    for si in range(4):
        for li, leaf in enumerate(leaves):
            c = (si * 7 + li * 3) % 5  # deterministic, some zeros
            if c:
                counts[(f"s{si}", leaf)] = c
    pd_exp, uu_exp, uw_exp = _brute_force(nwk, counts)

    feats = _features(spark, counts)
    cov = tree_cov(feats, read_newick(spark, nwk)).cache()
    pd_got = {r.sample: r.pd for r in faith_pd(cov).collect()}
    assert pd_got.keys() == pd_exp.keys()
    for s in pd_exp:
        assert pd_got[s] == pytest.approx(pd_exp[s]), s
    for r in unifrac_unweighted(cov).collect():
        assert r.unifrac_u == pytest.approx(uu_exp[r.sa, r.sb]), (r.sa, r.sb)
    for r in unifrac_weighted(cov).collect():
        assert r.unifrac_w == pytest.approx(uw_exp[r.sa, r.sb]), (r.sa, r.sb)
    assert not any(math.isnan(v) for v in pd_got.values())


def test_read_newick_from_file(spark, tmp_path):
    p = tmp_path / "tree.nwk"
    p.write_text(_SMALL + "\n")
    assert read_newick(spark, str(p)).count() == 6


# ---------------------------------------------------------------------------
# property-based: random trees round-trip through serialize → parse
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


def _tree_strategy():
    """Random rooted trees as nested (children, name, length) tuples."""
    leaf = st.tuples(
        st.just(()),
        st.text(alphabet="ABCDEFGHij0123456789", min_size=1, max_size=6),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    )
    return st.recursive(
        leaf,
        lambda kids: st.tuples(
            st.lists(kids, min_size=1, max_size=4),
            st.text(alphabet="xyz0.", max_size=4),
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
        ).map(lambda t: (tuple(t[0]), t[1], t[2])),
        max_leaves=12,
    )


def _serialize(node) -> str:
    kids, name, length = node
    if not kids:
        return f"{name}:{length!r}"
    inner = ",".join(_serialize(k) for k in kids)
    return f"({inner}){name}:{length!r}"


def _expected_rows(node, path=""):
    kids, name, length = node
    rows = []
    if not kids:
        if path:
            rows.append((path, float(length), name, True))
        return rows, [name]
    leaves = []
    for i, k in enumerate(kids):
        sub_rows, sub_leaves = _expected_rows(k, f"{path}.{i}" if path else str(i))
        rows.extend(sub_rows)
        leaves.extend(sub_leaves)
    if path:
        rows.extend((path, float(length), leaf, False) for leaf in leaves)
    return rows, leaves


@settings(max_examples=60, deadline=None)
@given(_tree_strategy())
def test_newick_roundtrip_property(tree):
    kids, name, length = tree
    if not kids:  # a bare leaf is not a tree; wrap it
        tree = ((tree,), "r", 0.0)
    text = f"({','.join(_serialize(k) for k in tree[0])}){tree[1]};"
    got = membership_rows(parse_newick(text))
    expected, _ = _expected_rows((tuple(tree[0]), tree[1], 0.0))
    assert sorted(got) == sorted(expected)


def test_convert_underscores_opt_out(spark):
    """Feature IDs with literal underscores survive when callers opt out
    (scikit-bio's convert_underscores=False)."""
    from mmeds_meta_spark.sources.newick import parse_newick

    t = "(OTU_1:0.1,OTU_2:0.2):0.0;"
    default = parse_newick(t)
    assert [c.name for c in default.children] == ["OTU 1", "OTU 2"]
    kept = parse_newick(t, convert_underscores=False)
    assert [c.name for c in kept.children] == ["OTU_1", "OTU_2"]
