"""Newick tree reader → the branch-membership relation the tree metrics eat.

The reference builds a rooted phylogenetic tree with mafft/fasttree and
midpoint-root (rules/process_sequencing_data.smk:72-89) and feeds it to
faith_pd / UniFrac (rules/diversity_analysis.smk:5-75).  The engine's
tree metrics (operators/phylo.py) run on a *branch-membership relation* —
one row per (branch, descendant leaf) — because at 100 TB a tree's edges
are just another (small, broadcastable) table.  This module closes the
gap between the two: it parses a real ``tree.nwk`` (fasttree output
shape: branch lengths, internal support labels, quoted names allowed)
into that relation, driver-side.

Driver-side parsing is the right scale call: the tree has one leaf per
*feature* (ASV/OTU — thousands to low millions), not per data row, so
the membership table is |edges| × avg-depth rows — megabytes, built once
and broadcast; the 100 TB side (the feature table) never leaves Spark.

Output relation (``branch_membership``):
    branch  string  — stable edge id (root-path of child indexes)
    length  double  — the edge's branch length (0.0 when absent)
    leaf    string  — one descendant leaf name
    is_leaf_edge boolean — the edge directly above the leaf itself

Joining features_long (sample, feature, count) on feature == leaf and
aggregating per (sample, branch) yields exactly the ``cov`` relation of
operators/phylo.py, now with real lengths; the metric algebra
(functions/tree_metrics.py) is shared.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


@dataclass
class _Node:
    name: str = ""
    length: float = 0.0
    children: list["_Node"] = field(default_factory=list)


class NewickParseError(ValueError):
    pass


def parse_newick(text: str, *, convert_underscores: bool = True) -> _Node:
    """Recursive-descent parse of one Newick string → root node.

    Supports: nested groups, leaf/internal labels (fasttree writes support
    values as internal labels), ``:length`` suffixes, single-quoted names
    with ``''`` escapes, whitespace/newlines.  Comments ``[...]`` are
    stripped (NHX-style payloads are ignored, not preserved).

    ``convert_underscores``: unquoted-label ``_`` → space, the Newick
    standard (and scikit-bio's default).  Callers whose feature IDs carry
    literal underscores pass ``False`` — otherwise the feature == leaf
    join in tree_cov silently drops their abundances.
    """
    s = text.strip()
    i = 0
    n = len(s)

    def skip_ws(i: int) -> int:
        while i < n and (s[i].isspace() or s[i] == "["):
            if s[i] == "[":  # bracket comment — skip to its close
                j = s.find("]", i + 1)
                if j == -1:
                    raise NewickParseError("unterminated [comment]")
                i = j + 1
            else:
                i += 1
        return i

    def parse_label(i: int) -> tuple[str, int]:
        i = skip_ws(i)
        if i < n and s[i] == "'":
            out, i = [], i + 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":  # '' escape
                        out.append("'")
                        i += 2
                        continue
                    return "".join(out), i + 1
                out.append(s[i])
                i += 1
            raise NewickParseError("unterminated quoted label")
        j = i
        while j < n and s[j] not in "(),:;[" and not s[j].isspace():
            j += 1
        # underscores are space stand-ins in unquoted Newick labels
        label = s[i:j]
        return (label.replace("_", " ") if convert_underscores else label), j

    def parse_node(i: int) -> tuple[_Node, int]:
        i = skip_ws(i)
        node = _Node()
        if i < n and s[i] == "(":
            i += 1
            while True:
                child, i = parse_node(i)
                node.children.append(child)
                i = skip_ws(i)
                if i < n and s[i] == ",":
                    i += 1
                    continue
                if i < n and s[i] == ")":
                    i += 1
                    break
                raise NewickParseError(f"expected ',' or ')' at offset {i}")
        node.name, i = parse_label(i)
        i = skip_ws(i)
        if i < n and s[i] == ":":
            num_start = i = skip_ws(i + 1)
            j = num_start
            while j < n and (s[j].isdigit() or s[j] in "+-.eE"):
                j += 1
            try:
                node.length = float(s[num_start:j])
            except ValueError as e:
                raise NewickParseError(f"bad branch length at offset {num_start}") from e
            i = j
        return node, i

    root, i = parse_node(0)
    i = skip_ws(i)
    if i >= n or s[i] != ";":
        raise NewickParseError("missing trailing ';'")
    return root


MEMBERSHIP_SCHEMA = T.StructType(
    [
        T.StructField("branch", T.StringType(), False),
        T.StructField("length", T.DoubleType(), False),
        T.StructField("leaf", T.StringType(), False),
        T.StructField("is_leaf_edge", T.BooleanType(), False),
    ]
)


def membership_rows(root: _Node) -> list[tuple[str, float, str, bool]]:
    """Flatten a parsed tree into (branch, length, leaf, is_leaf_edge) rows.

    Branch id = the root-path of child ordinals ("0.2.1"): stable under
    re-parsing the same file, independent of labels (fasttree internal
    labels are support values, not unique names).  The root itself has no
    edge above it and contributes no rows (its length, if any, is
    conventionally ignored — every leaf would carry it equally).
    """
    rows: list[tuple[str, float, str, bool]] = []

    def walk(node: _Node, path: str) -> list[str]:
        if not node.children:
            leaf = node.name
            if path:  # the edge directly above the leaf
                rows.append((path, node.length, leaf, True))
            return [leaf]
        leaves: list[str] = []
        for k, child in enumerate(node.children):
            leaves.extend(walk(child, f"{path}.{k}" if path else str(k)))
        if path:  # internal edge: one row per descendant leaf
            rows.extend((path, node.length, leaf, False) for leaf in leaves)
        return leaves

    walk(root, "")
    return rows


def read_newick(
    spark: SparkSession, path_or_text: str, *, convert_underscores: bool = True
) -> DataFrame:
    """Branch-membership DataFrame from a ``.nwk`` file path or a literal
    Newick string.  Small by construction (edges × depth) — callers
    broadcast it into the feature-table join.  ``convert_underscores``
    forwards to :func:`parse_newick` (pass False when feature IDs carry
    literal underscores)."""
    if path_or_text.lstrip().startswith("(") and path_or_text.rstrip().endswith(";"):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    return spark.createDataFrame(
        membership_rows(parse_newick(text, convert_underscores=convert_underscores)),
        MEMBERSHIP_SCHEMA,
    )
