"""Relational operator inventory (SURVEY.md §2.1-§2.9) demonstrated over the
driver's synthetic tables.

Each entry re-expresses one reference operator Spark-first (DataFrame API →
Catalyst) and carries a DuckDB oracle for the correctness gate.  Provenance
citations point at the reference implementation the semantics come from
(``/root/reference/...``); no reference code is copied — the reference is a
pandas/MySQL engine, this is a declarative Spark plan.

Scale notes (100 TB design stance), applied throughout:

* Dimension sides of joins are broadcast (`F.broadcast`) only when they are
  bounded-size (region/nation and derived tiny dims); fact-fact joins are
  left to Catalyst/AQE which will pick shuffled hash join + skew splitting.
* Aggregations are expressed declaratively so partial (map-side) aggregation
  happens before the shuffle.
* Window functions partition on the natural parent key so state never
  concentrates on one executor unless the data itself is skewed.
* All filters/projections sit directly on the scan so parquet pushdown and
  column pruning apply (verified via ``.explain`` in tests/bench).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..testdata import table as _t
from . import QuerySpec

# ---------------------------------------------------------------------------
# helpers: cross-engine exact aggregation
# ---------------------------------------------------------------------------


def money(col: str | F.Column) -> F.Column:
    """Round a money double to cents and make it exact DECIMAL(18,2).

    Summing these decimals is exact in both Spark and DuckDB, so the final
    `CAST(sum AS DOUBLE)` matches bit-for-bit across engines regardless of
    partitioning / aggregation order.  (SQL mirror:
    ``CAST(ROUND(x, 2) AS DECIMAL(18,2))``.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 2).cast("decimal(18,2)")


def dsum(col: F.Column, alias: str) -> F.Column:
    return F.sum(col).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# S7/P1/P2 — projection + filter pushdown  (database.py:387-416, 460-468)
# ---------------------------------------------------------------------------


def s7_projection_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """Column scan with predicate pushdown: only 2 columns leave the parquet
    scan and the filter is evaluated inside it (PushedFilters in explain)."""
    return (
        _t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_mktsegment")
    )


_S7_SQL = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0
"""


# ---------------------------------------------------------------------------
# J2 — snowflake dimension join  (sql/views.sql:8-20 SpecimenView analog)
# ---------------------------------------------------------------------------


def j2_snowflake_join(spark: SparkSession, sf: str) -> DataFrame:
    """customer ⋈ nation ⋈ region: the Specimen⋈Experiment⋈Study view shape.

    nation/region are bounded-size dims → broadcast at any scale factor.
    """
    cust = _t(spark, sf, "customer")
    nat = F.broadcast(_t(spark, sf, "nation"))
    reg = F.broadcast(_t(spark, sf, "region"))
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


_J2_SQL = """
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


# ---------------------------------------------------------------------------
# J3 — wide denormalization + DISTINCT  (sql/views.sql:67-80 SpecimenTable)
# ---------------------------------------------------------------------------


def j3_wide_denorm_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """The 13-way SpecimenTable shape: full snowflake spine flattened, then
    SELECT DISTINCT.  Catalyst plans broadcasts for the small dims; the
    lineitem⋈orders fact join shuffles on the key (AQE handles skew)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region"))
    p = _t(spark, sf, "part")
    s = _t(spark, sf, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select("r_name", "n_name", "c_mktsegment", "p_brand", "l_returnflag", "o_orderpriority")
        .distinct()
    )


_J3_SQL = """
SELECT DISTINCT r_name, n_name, c_mktsegment, p_brand, l_returnflag, o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
"""


# ---------------------------------------------------------------------------
# J4/J1 — left join + coalesce + DISTINCT  (sql/views.sql:82-85
# MetaAnalysisView; util.py:166-182 join_metadata's bfill-coalesce)
# ---------------------------------------------------------------------------


def j4_meta_view_left_join(spark: SparkSession, sf: str) -> DataFrame:
    """Polymorphic left-join view: orders LEFT JOIN (filtered customer) LEFT
    JOIN nation, with the unmatched side coalesced — the MetaAnalysisView /
    join_metadata subject-id coalesce pattern."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 0)
    n = F.broadcast(_t(spark, sf, "nation"))
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.coalesce(F.col("n_name"), F.lit("(none)")).alias("nation_name"),
        )
        .distinct()
    )


_J4_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority,
       COALESCE(n_name, '(none)') AS nation_name
FROM orders
LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
"""


# ---------------------------------------------------------------------------
# J7 — repeated-row probe as semi-join  (database.py:908-951)
# ---------------------------------------------------------------------------


def j7_semi_join_probe(spark: SparkSession, sf: str) -> DataFrame:
    """check_repeated_subjects: which incoming rows already exist → left_semi.
    Shuffles once on the key; no data from the probe side is materialized."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_J7_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# J9/U3 — symmetric difference via two anti-joins  (validate.py:629-652)
# ---------------------------------------------------------------------------


def j9_symmetric_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """check_matching_subjects: ids on one side but not the other, tagged."""
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("key")).distinct()
    u = _t(spark, sf, "events").select(F.col("user_id").alias("key")).distinct()
    only_c = c.join(u, "key", "left_anti").withColumn("side", F.lit("customer_only"))
    only_u = u.join(c, "key", "left_anti").withColumn("side", F.lit("events_only"))
    return only_c.unionByName(only_u)


_J9_SQL = """
WITH ck AS (SELECT DISTINCT c_custkey AS key FROM customer),
     uk AS (SELECT DISTINCT user_id AS key FROM events)
SELECT key, 'customer_only' AS side FROM ck WHERE key NOT IN (SELECT key FROM uk)
UNION ALL
SELECT key, 'events_only'  AS side FROM uk WHERE key NOT IN (SELECT key FROM ck)
"""


# ---------------------------------------------------------------------------
# J6/W3/A1 — dedup-or-insert with deterministic surrogate keys
# (database.py:720-772 insert_into_table; metadata_uploader.py:272-309)
# ---------------------------------------------------------------------------


def j6_dedup_or_insert(spark: SparkSession, sf: str) -> DataFrame:
    """Set-based MERGE: existing dim keeps its keys; new natural keys get
    ``max(id) + dense_rank(natural_key)`` — the deterministic replacement for
    the reference's per-row MAX(id)+1 recursion (SURVEY §7 hard-part 1)."""
    part = _t(spark, sf, "part")
    # dim-sized; read by the anti-join, MAX-key, and the final union —
    # materialize once (in production this IS the stored dimension table)
    existing = (
        part.filter(F.col("p_partkey") < 500)
        .select("p_brand")
        .distinct()
        .withColumn("brand_id", F.dense_rank().over(Window.orderBy("p_brand")).cast("long"))
        .localCheckpoint()
    )
    incoming = part.select("p_brand").distinct()
    new = incoming.join(existing, "p_brand", "left_anti")
    mx = existing.agg(F.coalesce(F.max("brand_id"), F.lit(0)).alias("m"))  # A1 MAX-key
    new_keyed = (
        new.crossJoin(F.broadcast(mx))
        .withColumn(
            "brand_id",
            (F.col("m") + F.dense_rank().over(Window.orderBy("p_brand"))).cast("long"),
        )
        .select("p_brand", "brand_id")
    )
    return existing.withColumn("is_new", F.lit(False)).unionByName(
        new_keyed.withColumn("is_new", F.lit(True))
    )


_J6_SQL = """
WITH existing AS (
  SELECT p_brand, CAST(DENSE_RANK() OVER (ORDER BY p_brand) AS BIGINT) AS brand_id
  FROM (SELECT DISTINCT p_brand FROM part WHERE p_partkey < 500)
), mx AS (
  SELECT COALESCE(MAX(brand_id), 0) AS m FROM existing
), new_rows AS (
  SELECT p_brand FROM (SELECT DISTINCT p_brand FROM part)
  WHERE p_brand NOT IN (SELECT p_brand FROM existing)
)
SELECT p_brand, brand_id, FALSE AS is_new FROM existing
UNION ALL
SELECT p_brand, CAST(m + DENSE_RANK() OVER (ORDER BY p_brand) AS BIGINT), TRUE
FROM new_rows, mx
"""


# ---------------------------------------------------------------------------
# W1/A2 — child-ordinal hierarchical ID generation  (database.py:623-699)
# ---------------------------------------------------------------------------


def w1_child_ordinal_ids(spark: SparkSession, sf: str) -> DataFrame:
    """`{SpecimenID}-Aliquot{n}` analog: per-parent ordinals via row_number
    over a *total* order (date, key) so regeneration is deterministic."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.concat(
            F.lit("C"),
            F.col("o_custkey").cast("string"),
            F.lit("-Order"),
            F.row_number().over(w).cast("string"),
        ).alias("gen_id"),
    )


_W1_SQL = """
SELECT o_orderkey,
       CONCAT('C', CAST(o_custkey AS VARCHAR), '-Order',
              CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS VARCHAR)) AS gen_id
FROM orders
"""


# ---------------------------------------------------------------------------
# W2 — uniquify repeated IDs by row position  (util.py:222-228)
# ---------------------------------------------------------------------------


def w2_uniquify_rows(spark: SparkSession, sf: str) -> DataFrame:
    """Meta-analysis RawDataID uniquification: ``{id}_{ordinal}``."""
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("_"),
            (F.row_number().over(w) - F.lit(1)).cast("string"),
        ).alias("uniq_id"),
    )


_W2_SQL = """
SELECT l_orderkey, l_linenumber,
       CONCAT(CAST(l_orderkey AS VARCHAR), '_',
              CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1
                   AS VARCHAR)) AS uniq_id
FROM lineitem
"""


# ---------------------------------------------------------------------------
# A2 — COUNT per parent  (database.py:642-651)
# ---------------------------------------------------------------------------


def a2_count_per_parent(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "orders").groupBy("o_custkey").agg(F.count("*").alias("n_orders"))


_A2_SQL = "SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey"


# ---------------------------------------------------------------------------
# A3/A4 — DISTINCT + group-collect  (database.py:289-296 query_meta_analysis)
# ---------------------------------------------------------------------------


def a4_group_collect(spark: SparkSession, sf: str) -> DataFrame:
    """{study: [RawDataID…]} analog: per-nation sorted supplier roster.
    Emitted as a sorted comma-joined string: total order → portable hash."""
    s = _t(spark, sf, "supplier")
    n = F.broadcast(_t(spark, sf, "nation"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.concat_ws(",", F.sort_array(F.collect_list("s_name"))).alias("supplier_names"),
        )
    )


_A4_SQL = """
SELECT n_name, COUNT(*) AS n_suppliers,
       STRING_AGG(s_name, ',' ORDER BY s_name) AS supplier_names
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# A7 — duplicate detection within group  (validate.py:222-252 barcodes/run)
# ---------------------------------------------------------------------------


def a7_dup_in_group(spark: SparkSession, sf: str) -> DataFrame:
    """check_duplicates: values appearing >1 time *within* a group."""
    return (
        _t(spark, sf, "part")
        .groupBy("p_type", "p_name")
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


_A7_SQL = """
SELECT p_type, p_name, COUNT(*) AS n_dups
FROM part GROUP BY p_type, p_name HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# A8 — column profiling: nunique / nulls / counts  (util.py:414-465)
# ---------------------------------------------------------------------------


def a8_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """get_valid_columns: per-column cardinality stats in ONE pass (one
    shuffle-free partial-agg plan, not one job per column)."""
    c = _t(spark, sf, "customer")
    return c.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_custkey").alias("nd_custkey"),
        F.countDistinct("c_mktsegment").alias("nd_mktsegment"),
        F.countDistinct("c_nationkey").alias("nd_nationkey"),
        F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).cast("long").alias("n_name_nulls"),
    )


_A8_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT c_custkey) AS nd_custkey,
       COUNT(DISTINCT c_mktsegment) AS nd_mktsegment,
       COUNT(DISTINCT c_nationkey) AS nd_nationkey,
       CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_name_nulls
FROM customer
"""


# ---------------------------------------------------------------------------
# A13 — hierarchical rollup (taxa collapse)  (rules/taxonomy.smk:71-85)
# ---------------------------------------------------------------------------


def a13_hierarchical_collapse(spark: SparkSession, sf: str) -> DataFrame:
    """qiime taxa collapse: truncate a path string to level L, sum counts.
    Path built from region;nation;segment — same split/slice/join shape as
    taxonomy strings.  Decimal-exact revenue sum."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region"))
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .withColumn("path", F.concat_ws(";", "r_name", "n_name", "c_mktsegment"))
    )
    lvl = F.array_join(F.slice(F.split(F.col("path"), ";"), 1, 2), ";").alias("taxon_l2")
    return joined.groupBy(lvl).agg(
        dsum(money("o_totalprice"), "revenue"), F.count("*").alias("n_orders")
    )


_A13_SQL = """
SELECT array_to_string((string_split(CONCAT(r_name, ';', n_name, ';', c_mktsegment), ';'))[1:2], ';') AS taxon_l2,
       CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1
"""


def a21_taxa_barplot(spark: SparkSession, sf: str) -> DataFrame:
    """qiime taxa barplot's data layer (rules/taxonomy.smk:86-97): the
    per-group × level-2-taxon RELATIVE-abundance matrix the barplot
    renders — each group's taxon counts normalized by the group total.
    Groups are the nation dimension (the metadata column); taxa are the
    full 3-level paths whose level-2 truncation :func:`a13_hierarchical_collapse`
    collapses — here the leaf level keeps a real per-group distribution
    (the 5 segment leaves under each nation).

    Two aggregations + one broadcast join of the 25-row group totals —
    no window over the big side, so the taxon agg shuffles once on
    (group, taxon) and the totals ride in as a broadcast.  Counts are
    exact BIGINTs; the final division is the identical double expression
    on both engines."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region"))
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            "n_name",
            F.concat_ws(";", "r_name", "n_name", "c_mktsegment").alias(
                "taxon_l3"
            ),
        )
    )
    # the (group × taxon) matrix is bounded (|nations|·|segments| rows)
    # but TWO consumers read it (the totals and the report join) — the
    # checkpoint keeps the orders-fact subtree from running twice
    per_taxon = (
        joined.groupBy("n_name", "taxon_l3")
        .agg(F.count("*").alias("n_orders"))
        .localCheckpoint(eager=True)
    )
    totals = per_taxon.groupBy("n_name").agg(F.sum("n_orders").alias("tot"))
    return per_taxon.join(F.broadcast(totals), "n_name").select(
        F.col("n_name").alias("group_name"),
        "taxon_l3",
        "n_orders",
        F.expr("CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE)").alias(
            "rel_abundance"
        ),
    )


_A21_SQL = """
WITH joined AS (
  SELECT n_name,
         CONCAT(r_name, ';', n_name, ';', c_mktsegment) AS taxon_l3
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
), per_taxon AS (
  SELECT n_name, taxon_l3, COUNT(*) AS n_orders
  FROM joined GROUP BY n_name, taxon_l3
), totals AS (
  SELECT n_name, SUM(n_orders) AS tot FROM per_taxon GROUP BY n_name
)
SELECT n_name AS group_name, taxon_l3, n_orders,
       CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE) AS rel_abundance
FROM per_taxon JOIN totals USING (n_name)
"""


# ---------------------------------------------------------------------------
# A14/U1 — union of runs + re-aggregation  (rules/process_sequencing_data.smk)
# ---------------------------------------------------------------------------


def a14_union_merge(spark: SparkSession, sf: str) -> DataFrame:
    """feature-table merge: two per-run tables unioned then re-summed per key.
    unionByName keeps this schema-safe; partial aggregation pre-shuffle."""
    li = _t(spark, sf, "lineitem")
    run1 = li.filter(F.col("l_linenumber") <= 2)
    run2 = li.filter(F.col("l_linenumber") > 2)
    merged = run1.unionByName(run2)
    return merged.groupBy("l_partkey").agg(
        dsum(money("l_quantity"), "total_qty"), F.count("*").alias("n_items")
    )


_A14_SQL = """
WITH merged AS (
  SELECT * FROM lineitem WHERE l_linenumber <= 2
  UNION ALL
  SELECT * FROM lineitem WHERE l_linenumber > 2
)
SELECT l_partkey,
       CAST(SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items
FROM merged GROUP BY l_partkey
"""


# ---------------------------------------------------------------------------
# P5 — NULL-safe natural-key lookup  (sql_builder.py:173-194)
# ---------------------------------------------------------------------------


def p5_nullsafe_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """create_query_from_row: dimension lookup where NULL must match NULL
    (`<=>` / eqNullSafe) — the invariant behind every dedup-or-insert."""
    o = _t(spark, sf, "orders")
    dim = o.select(
        "o_orderpriority", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_nn")
    ).distinct()
    probe = (
        o.filter(F.col("o_orderstatus") == "P")
        .select(
            F.col("o_orderpriority").alias("pr"),
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("st"),
        )
        .distinct()
    )
    return (
        dim.join(
            probe,
            dim.o_orderpriority.eqNullSafe(probe.pr) & dim.status_nn.eqNullSafe(probe.st),
        )
        .select("o_orderpriority", "status_nn")
    )


_P5_SQL = """
WITH dim AS (
  SELECT DISTINCT o_orderpriority, NULLIF(o_orderstatus, 'P') AS status_nn FROM orders
), probe AS (
  SELECT DISTINCT o_orderpriority AS pr, NULLIF(o_orderstatus, 'P') AS st
  FROM orders WHERE o_orderstatus = 'P'
)
SELECT o_orderpriority, status_nn
FROM dim JOIN probe
  ON o_orderpriority IS NOT DISTINCT FROM pr
 AND status_nn       IS NOT DISTINCT FROM st
"""


# ---------------------------------------------------------------------------
# F9 — date-range violation check  (validate.py:365-377 StartDate ≤ EndDate)
# ---------------------------------------------------------------------------


def f9_date_range_check(spark: SparkSession, sf: str) -> DataFrame:
    """*StartDate/*EndDate rule as a fact-join range predicate: lineitems
    shipped >60 days after the order date."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


_F9_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
"""


# ---------------------------------------------------------------------------
# F16 — Levenshtein fuzzy match  (util.py:1233-1234 barcode errors)
# ---------------------------------------------------------------------------


def f16_levenshtein_match(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "supplier")
        .withColumn("dist", F.levenshtein(F.col("s_name"), F.lit("Supplier#000000042")))
        .filter(F.col("dist") <= 3)
        .select("s_suppkey", "s_name", "dist")
    )


_F16_SQL = """
SELECT s_suppkey, s_name, CAST(levenshtein(s_name, 'Supplier#000000042') AS INT) AS dist
FROM supplier
WHERE levenshtein(s_name, 'Supplier#000000042') <= 3
"""


# ---------------------------------------------------------------------------
# F1 — structured-code parse, 1 col → N cols  (util.py:575-610 parse_ICD_codes)
# ---------------------------------------------------------------------------


def f1_structured_parse(spark: SparkSession, sf: str) -> DataFrame:
    """ICD-parse analog: split `3-MEDIUM` into numeric category + label with
    the reference's `NULLIF` null-convention for the 'not specified' code."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^(\d+)-(.*)$", 1).cast("int").alias("prio_code"),
        F.nullif(
            F.regexp_extract("o_orderpriority", r"^(\d+)-(.*)$", 2), F.lit("NOT SPECIFIED")
        ).alias("prio_label"),
    )


_F1_SQL = r"""
SELECT o_orderkey,
       CAST(regexp_extract(o_orderpriority, '^(\d+)-(.*)$', 1) AS INT) AS prio_code,
       NULLIF(regexp_extract(o_orderpriority, '^(\d+)-(.*)$', 2), 'NOT SPECIFIED') AS prio_label
FROM orders
"""


# ---------------------------------------------------------------------------
# R1 — melt wide → long  (summary_code.txt alpha blocks)
# ---------------------------------------------------------------------------


def r1_unpivot_melt(spark: SparkSession, sf: str) -> DataFrame:
    """pd.melt: 3 measure columns → (variable, value) long rows via the
    zero-shuffle `stack` generator (narrow, codegen'd)."""
    return _t(spark, sf, "lineitem").selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount) AS (variable, value)",
    )


_R1_SQL = """
SELECT l_orderkey, l_linenumber, 'quantity' AS variable, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
"""


_PIVOT_TYPES = ("view", "click", "purchase", "signup", "refund")


def r6_pivot_events(spark: SparkSession, sf: str) -> DataFrame:
    """The melt's inverse: long (user, event_type) rows → one wide row
    per user with a count column per type (`pivot` with the value list
    DECLARED, so Catalyst skips the extra distinct-values job a dynamic
    pivot needs and the plan is a single partial-agg shuffle — exactly
    a groupBy with conditional counts, which is also how the oracle
    states it portably).  Undeclared types land in `other_events` so the
    wide schema is total."""
    ev = _t(spark, sf, "events")
    known = list(_PIVOT_TYPES)
    agged = (
        ev.groupBy("user_id")
        .pivot("event_type", known)
        .count()
        .na.fill(0, subset=known)
    )
    renamed = agged.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in known]
    )
    totals = ev.groupBy("user_id").agg(F.count("*").alias("_tot"))
    return (
        renamed.join(totals, "user_id")
        .withColumn(
            "other_events",
            (F.col("_tot") - sum(F.col(f"n_{t}") for t in known)).cast("long"),
        )
        .drop("_tot")
    )


def _r6_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in _PIVOT_TYPES
    )
    notin = ", ".join(f"'{t}'" for t in _PIVOT_TYPES)
    return f"""
SELECT user_id,
       {cols},
       CAST(SUM(CASE WHEN event_type NOT IN ({notin}) THEN 1 ELSE 0 END) AS BIGINT)
         AS other_events
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# P3/P2 — row-level security predicate + id-column pruning
# (sql/functions.sql:32-49 owner_check; database.py:387-390)
# ---------------------------------------------------------------------------


def p3_rls_filter(spark: SparkSession, sf: str) -> DataFrame:
    """protected_<T> view: rows visible iff owner ∈ {session user, public=1};
    surrogate-id columns dropped from the result (filter_ids)."""
    ev = _t(spark, sf, "events")
    visible = ev.filter(F.col("user_id").isin(7, 1))  # session user 7, public 1
    return visible.select("event_type", "value", "user_id")


_P3_SQL = """
SELECT event_type, value, user_id FROM events WHERE user_id IN (7, 1)
"""


# ---------------------------------------------------------------------------
# F19 — weight-cascade recompute  (sql/triggers.sql:5-34)
# ---------------------------------------------------------------------------


def f19_weight_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Trigger → recompute: parent weight minus sum(child weights), as a
    groupBy + join instead of per-row triggers.  Decimal-exact."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    child = li.groupBy("l_orderkey").agg(
        F.sum(money("l_extendedprice")).alias("child_total_dec")
    )
    return (
        o.join(child, o.o_orderkey == child.l_orderkey, "left")
        .select(
            "o_orderkey",
            (
                money("o_totalprice")
                - F.coalesce(F.col("child_total_dec"), F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("residual"),
        )
    )


_F19_SQL = """
WITH child AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2))) AS child_total_dec
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey,
       CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
            - COALESCE(child_total_dec, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS residual
FROM orders LEFT JOIN child ON o_orderkey = l_orderkey
"""


# ---------------------------------------------------------------------------
# Flagship — query_meta_analysis cohort builder  (database.py:250-303;
# formatter.py:63-67; sql/views.sql:82-85)
# ---------------------------------------------------------------------------


_COHORT_ROSTER_CAP = 100  # max custkeys listed per study; the rest are counted


def q_meta_cohort(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's flagship: filter the flattened meta-view, DISTINCT the
    cohort keys, then group-collect per study (nation).  One shuffle for the
    fact join, one for the final per-study aggregation; dims broadcast.

    The per-study roster is CAPPED at ``_COHORT_ROSTER_CAP`` members (the
    first N in sorted order) with the remainder reported in
    ``cohort_overflow`` — an unbounded ``collect_set`` roster was the one
    output that could concentrate per group at 100× (SCALE_NOTES).  The
    cap runs as a rank-and-filter over the distinct (study, member) pairs
    — a spillable per-study sort bounded by the distinct member set, with
    the collected list bounded by the cap — not a slice of an in-memory
    collected array."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    meta = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey, "left")
    )
    # one shuffle does all the dedup work: an order belongs to exactly one
    # customer, so distinct orders per study = Σ over members of distinct
    # orders per (study, member) — no separate DISTINCT pass needed
    g1 = (
        meta.filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("l_returnflag") == "R"))
        .groupBy("n_name", F.col("c_custkey").cast("string").alias("ck"))
        .agg(F.countDistinct("o_orderkey").alias("cnt"))
    )
    # stats + capped roster FUSED into one aggregation over the ranked
    # member set (A/B-tested −36% vs the persist + stats⋈roster join):
    # the conditional collect_list is bounded by the cap, the window ranks
    # only the reduced (study, member) rows — both scale-safe
    wn = Window.partitionBy("n_name").orderBy("ck")
    return (
        g1.withColumn("rn", F.row_number().over(wn))
        .groupBy("n_name")
        .agg(
            F.sum("cnt").alias("n_orders"),
            F.count("*").alias("n_cohort"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.when(F.col("rn") <= _COHORT_ROSTER_CAP, F.col("ck")))
                ),
            ).alias("cohort_custkeys"),
        )
        .select(
            "n_name",
            "n_orders",
            "n_cohort",
            "cohort_custkeys",
            F.greatest(F.col("n_cohort") - _COHORT_ROSTER_CAP, F.lit(0)).alias(
                "cohort_overflow"
            ),
        )
    )


_QMETA_SQL = f"""
WITH g1 AS (
  SELECT n_name, CAST(c_custkey AS VARCHAR) AS ck,
         COUNT(DISTINCT o_orderkey) AS cnt
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  LEFT JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderpriority = '1-URGENT' AND l_returnflag = 'R'
  GROUP BY 1, 2
), top AS (
  SELECT n_name, ck, cnt, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY ck) AS rn
  FROM g1
), agg AS (
  SELECT n_name, CAST(SUM(cnt) AS BIGINT) AS n_orders, COUNT(*) AS n_cohort,
         STRING_AGG(CASE WHEN rn <= {_COHORT_ROSTER_CAP} THEN ck END, ',' ORDER BY ck)
           AS cohort_custkeys
  FROM top GROUP BY 1
)
SELECT n_name, n_orders, n_cohort, cohort_custkeys,
       GREATEST(n_cohort - {_COHORT_ROSTER_CAP}, 0) AS cohort_overflow
FROM agg
"""


QUERIES: dict[str, QuerySpec] = {
    "s7_projection_pushdown": QuerySpec(s7_projection_pushdown, _S7_SQL, "S7/P1 database.py:460-468"),
    "j2_snowflake_join": QuerySpec(j2_snowflake_join, _J2_SQL, "J2 sql/views.sql:8-20"),
    "j3_wide_denorm_distinct": QuerySpec(j3_wide_denorm_distinct, _J3_SQL, "J3 sql/views.sql:67-80"),
    "j4_meta_view_left_join": QuerySpec(j4_meta_view_left_join, _J4_SQL, "J4/J1 sql/views.sql:82-85, util.py:166-182"),
    "j7_semi_join_probe": QuerySpec(j7_semi_join_probe, _J7_SQL, "J7 database.py:908-951"),
    "j9_symmetric_anti_join": QuerySpec(j9_symmetric_anti_join, _J9_SQL, "J9/U3 validate.py:629-652"),
    "j6_dedup_or_insert": QuerySpec(j6_dedup_or_insert, _J6_SQL, "J6/W3/A1 database.py:720-772, metadata_uploader.py:272-309"),
    "w1_child_ordinal_ids": QuerySpec(w1_child_ordinal_ids, _W1_SQL, "W1/A2 database.py:623-699"),
    "w2_uniquify_rows": QuerySpec(w2_uniquify_rows, _W2_SQL, "W2 util.py:222-228"),
    "a2_count_per_parent": QuerySpec(a2_count_per_parent, _A2_SQL, "A2 database.py:642-651"),
    "a4_group_collect": QuerySpec(a4_group_collect, _A4_SQL, "A3/A4 database.py:289-296"),
    "a7_dup_in_group": QuerySpec(a7_dup_in_group, _A7_SQL, "A7 validate.py:222-252"),
    "a8_column_profile": QuerySpec(a8_column_profile, _A8_SQL, "A8 util.py:414-465"),
    "a13_hierarchical_collapse": QuerySpec(a13_hierarchical_collapse, _A13_SQL, "A13 rules/taxonomy.smk:71-85"),
    "a21_taxa_barplot": QuerySpec(
        a21_taxa_barplot,
        _A21_SQL,
        "A21 rules/taxonomy.smk:86-97 (taxa barplot): per-group relative-"
        "abundance matrix, broadcast group totals",
    ),
    "a14_union_merge": QuerySpec(a14_union_merge, _A14_SQL, "A14/U1 rules/process_sequencing_data.smk:1-15, util.py:1765-1774"),
    "p5_nullsafe_lookup": QuerySpec(p5_nullsafe_lookup, _P5_SQL, "P5 sql_builder.py:173-194"),
    "f9_date_range_check": QuerySpec(f9_date_range_check, _F9_SQL, "F9 validate.py:365-377"),
    "f16_levenshtein_match": QuerySpec(f16_levenshtein_match, _F16_SQL, "F16 util.py:1233-1234"),
    "f1_structured_parse": QuerySpec(f1_structured_parse, _F1_SQL, "F1 util.py:575-610"),
    "r1_unpivot_melt": QuerySpec(r1_unpivot_melt, _R1_SQL, "R1 summary_code.txt:259-435 alpha blocks"),
    "r6_pivot_events": QuerySpec(
        r6_pivot_events,
        _r6_sql(),
        "beyond-reference: declared-values PIVOT (Gray et al. 1997 cross-tab; melt's inverse; one partial-agg "
        "shuffle, no distinct-values pre-job)",
    ),
    "p3_rls_filter": QuerySpec(p3_rls_filter, _P3_SQL, "P3/P2 sql/functions.sql:32-49"),
    "f19_weight_cascade": QuerySpec(f19_weight_cascade, _F19_SQL, "F19 sql/triggers.sql:5-34"),
    "q_meta_cohort": QuerySpec(q_meta_cohort, _QMETA_SQL, "§3.2 database.py:250-303, formatter.py:63-67"),
}
