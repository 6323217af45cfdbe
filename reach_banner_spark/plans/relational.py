"""Relational operator surface (SURVEY.md §2.2) with DuckDB oracle twins.

Each operator is registered as ``REGISTRY[key] = (spark_fn, oracle_sql)``;
``spark_fn(spark, sf_dir) -> DataFrame`` and the SQL string is the ANSI
equivalent DuckDB runs on the same parquet tables. Keys with ``None`` SQL
get the driver's weaker rows-only check (∅-oracle).

Conventions for exact value-hash agreement with the oracle:
- session timezone is UTC (session.py) so timestamps compare bit-exact;
- every computed column is aliased identically on both sides;
- double aggregates are computed on DECIMAL(18,2) internally (exact,
  order-independent sums) and cast back to double rounded, so Spark's
  partial-agg ordering can never flip a low bit vs DuckDB;
- arrays in outputs are sorted and joined to strings (the driver's hash
  stringifies values; array formatting differs between engines).

All of these run pure JVM-side (whole-stage codegen); none cross into
Python. Catalyst handles pushdown/pruning — tests assert that with
``explain``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reach_banner_spark.fanout import fan_out

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..caching import cached_scan

    return cached_scan(spark, f"{sf_dir}/{name}.parquet")


def register(key: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = (fn, sql)
        return fn

    return deco


def dec_sum(col: str, alias: str):
    """Exact order-independent SUM of a 2-decimal double column."""
    return F.round(
        F.sum(F.col(col).cast("decimal(18,2)")).cast("double"), 2
    ).alias(alias)


# ---------------------------------------------------------------- scans ----

@register("scan_parquet", "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem")
def scan_parquet(spark, sf):
    return _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "scan_prune_pushdown",
    "SELECT l_orderkey, l_extendedprice FROM lineitem "
    "WHERE l_quantity > 45 AND l_returnflag = 'R'",
)
def scan_prune_pushdown(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_extendedprice")
    )


# ------------------------------------------------------ project / filter ----

@register(
    "project_expr",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue, "
    "CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class, "
    "COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag "
    "FROM lineitem",
)
def project_expr(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag"),
    )


@register(
    "filter_pred",
    "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders "
    "WHERE (o_totalprice BETWEEN 1000 AND 150000) "
    "AND o_orderstatus IN ('O','F') "
    "AND o_orderpriority LIKE '%URGENT%' AND NOT (o_custkey % 7 = 0)",
)
def filter_pred(spark, sf):
    o = _t(spark, sf, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 150000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("%URGENT%")
        & ~(F.col("o_custkey") % 7 == 0)
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "filter_subquery_in",
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_custkey IN "
    "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000)",
)
def filter_subquery_in(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 9000)
    return o.join(
        c, o["o_custkey"] == c["c_custkey"], "left_semi"
    ).select("o_orderkey", "o_custkey")


@register(
    "filter_subquery_correlated",
    # Correlated SCALAR subquery — each customer's maximum-price order(s).
    # MAX is order-independent and exact on the stored doubles, so the
    # equality comparison is bit-identical on both engines (ties: every
    # order at the max qualifies, identically on both).
    "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o "
    "WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2 "
    "WHERE o2.o_custkey = o.o_custkey)",
)
def filter_subquery_correlated(spark, sf):
    """Correlated scalar subquery — the remaining subquery family member
    next to ``filter_subquery_in``'s uncorrelated IN. Spelled as real
    correlated SQL so Catalyst's decorrelation rewrite
    (RewriteCorrelatedScalarSubquery) is what executes: the optimizer
    turns the per-row subquery into one o_custkey-keyed MAX aggregate
    joined back — exactly the plan you'd hand-write, derived from the
    declarative form. One aggregate + one co-keyed join at any scale;
    no per-row re-evaluation ever happens."""
    import hashlib

    v = "orders_subq_corr_" + hashlib.md5(sf.encode()).hexdigest()[:8]
    _t(spark, sf, "orders").createOrReplaceTempView(v)
    return spark.sql(
        f"SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM {v} o "
        f"WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM {v} o2 "
        "WHERE o2.o_custkey = o.o_custkey)"
    )


# ---------------------------------------------------------------- joins ----

@register(
    "join_broadcast",
    "SELECT c_custkey, c_name, n_name, r_name FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey",
)
def join_broadcast(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_shuffle_hash",
    "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",
)
def join_shuffle_hash(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").hint("shuffle_hash")
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select("o_orderkey", "c_name")


@register(
    "join_sortmerge",
    "SELECT l_orderkey, l_linenumber, o_orderstatus FROM lineitem "
    "JOIN orders ON l_orderkey = o_orderkey",
)
def join_sortmerge(spark, sf):
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").hint("merge")
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_linenumber", "o_orderstatus"
    )


@register(
    "join_nested_loop",
    "SELECT s_suppkey, n_nationkey FROM supplier, nation "
    "WHERE s_acctbal > 9990 AND s_nationkey <> n_nationkey AND n_nationkey < 3",
)
def join_nested_loop(spark, sf):
    s = _t(spark, sf, "supplier").filter(F.col("s_acctbal") > 9990)
    n = _t(spark, sf, "nation").filter(F.col("n_nationkey") < 3)
    return s.join(n, s["s_nationkey"] != n["n_nationkey"]).select(
        "s_suppkey", "n_nationkey"
    )


@register(
    "join_range",
    # per-user event pairs within a 10-minute interval (range/interval join)
    "SELECT a.event_id AS eid_a, b.event_id AS eid_b FROM events a JOIN events b "
    "ON a.user_id = b.user_id AND b.ts > a.ts "
    "AND b.ts <= a.ts + INTERVAL 10 MINUTE",
)
def join_range(spark, sf):
    a = _t(spark, sf, "events").alias("a")
    b = _t(spark, sf, "events").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTE")),
        )
        .select(
            F.col("a.event_id").alias("eid_a"),
            F.col("b.event_id").alias("eid_b"),
        )
    )


@register(
    "join_asof",
    # as-of: for each event, the latest order at-or-before the event time
    # for the same customer (DuckDB could use ASOF JOIN; spelled with
    # ROW_NUMBER so the SQL twin is engine-portable)
    "SELECT event_id, o_orderkey FROM ("
    " SELECT e.event_id, o.o_orderkey, "
    "  ROW_NUMBER() OVER (PARTITION BY e.event_id "
    "   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn"
    " FROM events e JOIN orders o ON o.o_custkey = e.user_id "
    "  AND o.o_orderdate <= e.ts"
    ") WHERE rn = 1",
)
def join_asof(spark, sf):
    # Scale-safe spelling: union both sides with a type tag and take the
    # running last order per customer (rows unbounded preceding). The
    # range-join + row_number plan materializes ALL earlier orders per
    # event before pruning — quadratic-ish on a hot customer at 100x;
    # this one is linear in |orders| + |events| with a single sort.
    o = _t(spark, sf, "orders")
    e = _t(spark, sf, "events")
    o2 = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.col("o_orderkey").alias("ok"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("tag"),
    )
    e2 = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("ok"),
        "event_id",
        F.lit(1).alias("tag"),
    )
    # at equal t, tag sorts orders before events (the <= bound is
    # inclusive); among same-date orders, ascending ok makes last() = max,
    # matching the (o_orderdate DESC, o_orderkey DESC) rn=1 tie-break
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag", "ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o2.unionByName(e2)
        .withColumn("o_orderkey", F.last("ok", ignorenulls=True).over(w))
        .filter((F.col("tag") == 1) & F.col("o_orderkey").isNotNull())
        .select("event_id", "o_orderkey")
    )


@register(
    "join_semi",
    "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
)
def join_semi(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select("c_custkey")


@register(
    "join_anti",
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
)
def join_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey")


@register(
    "join_outer_full",
    "SELECT n_nationkey, n_name, s_suppkey FROM nation "
    "FULL OUTER JOIN supplier ON n_nationkey = s_nationkey AND s_acctbal > 5000",
)
def join_outer_full(spark, sf):
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier")
    return n.join(
        s, (n["n_nationkey"] == s["s_nationkey"]) & (s["s_acctbal"] > 5000), "full"
    ).select("n_nationkey", "n_name", "s_suppkey")


@register(
    "join_lateral",
    # Correlated LATERAL derived table — top-2 customers per nation. The
    # tie-break on c_name makes the per-group top-2 a deterministic SET,
    # so both engines emit identical rows.
    "SELECT n.n_name, t.c_name, t.c_acctbal FROM nation n, LATERAL ("
    "SELECT c_name, c_acctbal FROM customer c "
    "WHERE c.c_nationkey = n.n_nationkey "
    "ORDER BY c_acctbal DESC, c_name LIMIT 2) t",
)
def join_lateral(spark, sf):
    """LATERAL join (correlated derived table in FROM) — the SQL spelling
    of per-row subquery application. Spark does NOT execute this as a
    nested loop: Catalyst decorrelates the ORDER BY ... LIMIT k subquery
    into a rank computation on the inner table followed by an equi-join
    (physical plan: WindowGroupLimit partial+final around ONE
    c_nationkey exchange, then a broadcast hash join with nation — the
    group-limit pushdown keeps at most k rows per key ahead of the
    shuffle, so at 10^12 inner rows the exchange carries k·|keys| rows,
    not the table). The same query spelled as a driver-side loop over
    nations would be the classic collect() scale-killer; LATERAL states
    the intent and the optimizer picks the distributed plan."""
    return spark.sql(
        f"SELECT n.n_name, t.c_name, t.c_acctbal "
        f"FROM parquet.`{sf}/nation.parquet` n, LATERAL ("
        f"SELECT c_name, c_acctbal FROM parquet.`{sf}/customer.parquet` c "
        f"WHERE c.c_nationkey = n.n_nationkey "
        f"ORDER BY c_acctbal DESC, c_name LIMIT 2) t"
    )


# ---------------------------------------------------------- aggregation ----

@register(
    "agg_hash",
    "SELECT l_returnflag, l_linestatus, "
    "ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty, "
    "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price, "
    "COUNT(*) AS count_order, "
    "ROUND(CAST(MIN(l_extendedprice) AS DOUBLE), 2) AS min_price, "
    "ROUND(CAST(MAX(l_extendedprice) AS DOUBLE), 2) AS max_price "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def agg_hash(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_base_price"),
        F.count(F.lit(1)).alias("count_order"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "agg_distinct",
    "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, "
    "COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders GROUP BY o_orderstatus",
)
def agg_distinct(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@register(
    "agg_approx",
    # The HLL estimate itself can't hash-match an exact engine, so the
    # CONTRACT row checks the tolerance PROPERTY: the exact distinct count
    # (oracle-comparable) plus a boolean asserting the approx estimate
    # landed within 5% of it (2.5x the requested 2% rsd). DuckDB's side is
    # the same exact count and a literal TRUE — if Spark's estimate ever
    # drifts out of tolerance the hash comparison fails. The raw-estimate
    # variant stays pytest-checked (test_misc_ops).
    "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust, "
    "TRUE AS approx_within_5pct FROM orders",
)
def agg_approx(spark, sf):
    o = _t(spark, sf, "orders")
    return o.agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_cust"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02)
                - F.count_distinct("o_custkey")
            )
            <= F.count_distinct("o_custkey") * 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "agg_rollup",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
    "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag, CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status "
    "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def agg_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "agg_cube",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n "
    "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",
)
def agg_cube(spark, sf):
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_grouping_sets",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n "
    "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())",
)
def agg_grouping_sets(spark, sf):
    li = _t(spark, sf, "lineitem")
    li.createOrReplaceTempView("rbs_li_gs")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM rbs_li_gs "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@register(
    "agg_collect",
    "SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names "
    "FROM nation GROUP BY n_regionkey",
)
def agg_collect(spark, sf):
    n = _t(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names")
    )


# ---------------------------------------------------------------- windows ----

@register(
    "win_rank",
    "SELECT c_custkey, c_nationkey, "
    "ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn, "
    "RANK() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS rnk, "
    "NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS quartile "
    "FROM customer",
)
def win_rank(spark, sf):
    c = _t(spark, sf, "customer")
    w1 = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w2 = Window.partitionBy("c_nationkey").orderBy("c_mktsegment")
    w3 = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w1).alias("rn"),
        F.rank().over(w2).alias("rnk"),
        F.ntile(4).over(w3).alias("quartile"),
    )


@register(
    "win_analytic",
    "SELECT o_custkey, o_orderkey, "
    "LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order, "
    "LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order, "
    "FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order "
    "FROM orders",
)
def win_analytic(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@register(
    "win_ntile",
    # NTILE over a TOTAL order (o_orderdate, o_orderkey tie-break) — the
    # bucket assignment is deterministic only under a total order, which
    # is why the tie-break column is part of the contract.
    "SELECT o_custkey, o_orderkey, CAST(NTILE(4) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)"
    " AS quartile FROM orders",
)
def win_ntile(spark, sf):
    """NTILE quartile assignment per customer order history — the window
    family's equal-frequency bucketing member (used for recency/monetary
    quartiles in RFM-style scoring). Deterministic because the window
    order is TOTAL (orderkey tie-break); same single customer-keyed
    exchange as the other window keys."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "fn_bitwise",
    # bitwise function family — all-integer, bit-exact on both engines.
    # DuckDB's >> / << / & / | / xor() on BIGINT match Spark's
    # shiftright/shiftleft/& /| /^ for the non-negative inputs used here.
    "SELECT o_orderkey, "
    "CAST(o_orderkey & 255 AS BIGINT) AS low_byte, "
    "CAST(o_orderkey >> 4 AS BIGINT) AS shr4, "
    "CAST((o_orderkey << 2) | 3 AS BIGINT) AS shl2_or3, "
    "CAST(xor(o_orderkey, 12345) AS BIGINT) AS xored, "
    "CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt "
    "FROM orders",
)
def fn_bitwise(spark, sf):
    """Bitwise expression family (&, |, xor, shifts, popcount) — the
    function surface hash-partitioners, bloom filters, and bit-packed
    flag columns are built from. All-integer algebra inside whole-stage
    codegen; zero shuffles."""
    o = _t(spark, sf, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        F.shiftright(k, 4).cast("long").alias("shr4"),
        F.shiftleft(k, 2).bitwiseOR(F.lit(3)).cast("long").alias("shl2_or3"),
        k.bitwiseXOR(F.lit(12345)).cast("long").alias("xored"),
        F.bit_count(k).cast("long").alias("popcnt"),
    )


@register(
    "win_frame_rows",
    "SELECT l_orderkey, l_linenumber, "
    "ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER ("
    "PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_qty "
    "FROM lineitem",
)
def win_frame_rows(spark, sf):
    li = _t(spark, sf, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("running_qty"),
    )


@register(
    "win_frame_range",
    "SELECT o_orderkey, o_custkey, COUNT(*) OVER ("
    "PARTITION BY o_custkey ORDER BY o_totalprice "
    "RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_close "
    "FROM orders",
)
def win_frame_range(spark, sf):
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey", "o_custkey", F.count(F.lit(1)).over(w).alias("n_close")
    )


@register(
    "win_fill_forward",
    # IGNORE NULLS running last_value = last observation carried forward.
    # The NULL gaps are injected by the SAME expression on both engines
    # (view/error events carry no value), so the fill pattern is
    # deterministic; ordering is the (ts, event_id) total order.
    "SELECT event_id, user_id, "
    "last_value(CASE WHEN event_type IN ('view', 'error') THEN NULL "
    "ELSE value END IGNORE NULLS) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff "
    "FROM events",
)
def win_fill_forward(spark, sf):
    """Gap filling by last-observation-carried-forward — the IGNORE NULLS
    window family (the one analytic-window feature ``win_analytic``'s
    lag/lead/first_value don't cover), and the canonical time-series
    repair step before resampling or feature extraction. One user-keyed
    window exchange; each event is touched once — the running
    ignore-nulls last_value beats the equivalent as-of self-join at any
    scale (same argument as ``events_attribution``). Leading rows before
    the first observation stay NULL on both engines."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gapped = F.when(
        F.col("event_type").isin("view", "error"), F.lit(None)
    ).otherwise(F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(gapped, ignorenulls=True).over(w).alias("value_ff"),
    )


@register(
    "win_session_batch",
    # batch session windows (30-min gap) as gaps-and-islands: a new session
    # starts where the gap to the previous event exceeds the timeout; the
    # session id is the running count of starts. Same spelling both engines.
    "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_events, "
    "STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start FROM ("
    " SELECT user_id, ts, SUM(is_new) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM ("
    "  SELECT user_id, ts, event_id, CASE WHEN ts - LAG(ts) OVER ("
    "   PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 30 MINUTE"
    "   THEN 0 ELSE 1 END AS is_new FROM events)"
    ") GROUP BY user_id, session_id",
)
def win_session_batch(spark, sf):
    """Batch twin of ``stream_session``: session windows over event gaps,
    expressed as two windows + a groupBy (one shuffle on user_id — the
    windows and the aggregation share the partitioning)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # compare gaps at MICROSECOND precision: events carry microsecond
    # timestamps and the oracle compares full-precision intervals, so a
    # second-truncated epoch would disagree on gaps fractionally around
    # the 1800 s boundary (integer micros — no float rounding either)
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    with_new = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap <= 30 * 60 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = with_new.withColumn("session_id", F.sum("is_new").over(wsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@register(
    "join_bucketed",
    # oracle over the ORIGINAL parquet — the bucketed tables are a physical
    # layout choice, not a semantic one
    "SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items, "
    "ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue "
    "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderkey",
)
def join_bucketed(spark, sf):
    """Co-located bucketed join: both fact tables bucketed on the join key
    at write time -> SortMergeJoin with NO Exchange on either side (the
    shuffle is paid ONCE at layout time, then every join on that key is
    shuffle-free — the core trick for repeated 100 TB fact-fact joins;
    plan-asserted in tests/test_plans.py). The groupBy on the same key
    also reuses the bucketing."""
    names = _ensure_bucketed_tables(spark, sf)
    o = spark.table(names["orders"]).select("o_orderkey")
    li = spark.table(names["lineitem"]).select("l_orderkey", "l_extendedprice")
    # merge hint: at test scale Catalyst would broadcast the small side,
    # which never exercises the bucketing; SMJ over bucket-sorted tables is
    # the layout's payoff — zero Exchange AND zero Sort (plan-asserted)
    j = o.hint("merge").join(li, o["o_orderkey"] == li["l_orderkey"])
    return j.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum("l_extendedprice", "revenue"),
    )


def _ensure_bucketed_tables(spark, sf) -> dict:
    """Create (once per source-parquet fingerprint) the bucketed
    orders/lineitem tables — the shared physical layout behind
    ``join_bucketed`` (shuffle-free SMJ) and ``scan_bucket_pruned``
    (bucket-pruned point scan). Returns the table names."""
    import hashlib
    import os

    # tag = basename + content fingerprint of the SOURCE parquet (full path
    # + per-file size/mtime): two sf dirs sharing a basename, or parquet
    # regenerated in place mid-session, must NOT silently reuse a stale
    # bucketed table (ADVICE r2)
    def _fingerprint() -> str:
        h = hashlib.sha1(sf.encode())
        for tbl in ("orders", "lineitem"):
            p = os.path.join(sf, f"{tbl}.parquet")
            files = (
                sorted(
                    os.path.join(p, f) for f in os.listdir(p) if not f.startswith("_")
                )
                if os.path.isdir(p)
                else [p]
            )
            for fp in files:
                st = os.stat(fp)
                h.update(f"{fp}:{st.st_size}:{st.st_mtime_ns}".encode())
        return h.hexdigest()[:10]

    tag = (
        os.path.basename(sf.rstrip("/")).replace(".", "_") + "_" + _fingerprint()
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS rbs_bucketed")
    names = {
        "orders": f"rbs_bucketed.orders_b_{tag}",
        "lineitem": f"rbs_bucketed.lineitem_b_{tag}",
    }
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    # GC stale fingerprints (ADVICE r3): every source-parquet regeneration
    # mints a new tag, and without cleanup the warehouse grows one orphaned
    # table pair per regeneration. Drop any table sharing this basename
    # prefix but not the current fingerprint — catalog entry and on-disk
    # location both (the in-memory catalog forgets across sessions, so the
    # disk sweep covers orphans the catalog no longer knows).
    import shutil

    import re

    base = os.path.basename(sf.rstrip("/")).replace(".", "_")
    db_dir = os.path.join(warehouse.removeprefix("file:"), "rbs_bucketed.db")
    known = {t.name for t in spark.catalog.listTables("rbs_bucketed")}
    on_disk = set(os.listdir(db_dir)) if os.path.isdir(db_dir) else set()
    for tbl in ("orders", "lineitem"):
        # anchor the fingerprint section: a bare startswith(prefix) would
        # also match a LONGER basename extending this one with '_'
        # (sf0.01 vs sf0.01_alt) and drop the other dataset's live tables
        pat = re.compile(rf"^{re.escape(f'{tbl}_b_{base}_')}[0-9a-f]{{10}}$")
        cur = names[tbl].split(".", 1)[1]
        for stale in (known | on_disk):
            if pat.match(stale) and stale != cur:
                spark.sql(f"DROP TABLE IF EXISTS rbs_bucketed.`{stale}`")
                shutil.rmtree(os.path.join(db_dir, stale), ignore_errors=True)
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        if not spark.catalog.tableExists(names[tbl]):
            # the in-memory catalog is per-session but the warehouse dir is
            # not: drop an orphaned location before re-registering (a real
            # deployment uses a persistent metastore and skips this)
            import shutil

            loc = os.path.join(
                warehouse.removeprefix("file:"),
                "rbs_bucketed.db",
                names[tbl].split(".", 1)[1],
            )
            shutil.rmtree(loc, ignore_errors=True)
            (
                _t(spark, sf, tbl)
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(names[tbl])
            )
    return names


@register(
    "scan_bucket_pruned",
    # oracle over the ORIGINAL parquet — bucketing is a physical layout
    # choice; an equality/IN predicate on the bucket key must prune to
    # the matching buckets (SelectedBucketsCount in the plan, gated in
    # tests/test_plans.py) without changing results
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
    "WHERE o_orderkey IN (7, 42) ORDER BY o_orderkey",
)
def scan_bucket_pruned(spark, sf):
    """Bucket-pruned point lookup over the bucketed fact table: an IN
    predicate on the bucket key lets Spark read ONLY the buckets the
    keys hash to (SelectedBucketsCount: <=2 out of 8 in the scan node —
    plan-gated), the scan-side payoff of the layout ``join_bucketed``
    already exercises join-side. At 100 TB this is the difference
    between touching ~2/8 of the files and touching all of them for a
    key probe — the same reason kimball-style fact tables bucket on
    their degenerate dimension. Results are layout-independent: the
    oracle runs the same predicate over the original parquet."""
    names = _ensure_bucketed_tables(spark, sf)
    # the auto-bucketed-scan optimizer DISABLES bucketed reads when no
    # downstream operator wants the hash partitioning — which also turns
    # off bucket PRUNING; scope it off for this plan's materialization
    # (the scan_agg_pushdown conf-scoping pattern: QueryExecution caches
    # the executed plan, so restoring afterwards is safe)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        o = spark.table(names["orders"])
        df = (
            o.filter(F.col("o_orderkey").isin(7, 42))
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy("o_orderkey")
        )
        df._jdf.queryExecution().executedPlan()
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    return df


# -------------------------------------------------------- sort/limit/topk ----

@register(
    "sort_global",
    "SELECT s_suppkey, s_acctbal FROM supplier ORDER BY s_acctbal DESC, s_suppkey",
)
def sort_global(spark, sf):
    s = _t(spark, sf, "supplier")
    return s.select("s_suppkey", "s_acctbal").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )


@register(
    "topk",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25",
)
def topk(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "macro_shipping_priority",
    # Q3-shaped macro query: dimension filter -> two joins -> grouped
    # decimal-exact revenue -> top-20. One key exercising the full
    # select/join/agg/sort/limit stack end-to-end.
    "SELECT l.l_orderkey, "
    "CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
    " (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue, "
    "STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' "
    " AND o.o_orderdate < TIMESTAMP '1998-01-01' "
    " AND l.l_shipdate > TIMESTAMP '1998-01-01' "
    "GROUP BY l.l_orderkey, o.o_orderdate "
    "ORDER BY revenue DESC, l.l_orderkey LIMIT 20",
)
def macro_shipping_priority(spark, sf):
    """Shipping-priority macro query (TPC-H Q3 shape): segment-filtered
    customers, pre-cutoff orders, post-cutoff shipments, revenue per
    order, top 20 — the canonical multi-join analytics query, registered
    whole so the engine's end-to-end plan (not just per-operator pieces)
    is under the oracle gate.

    Scale shape: the customer dimension broadcast-prunes orders; the
    orders↔lineitem join shuffles on the shared orderkey; both date
    filters push into the parquet scans; the top-20 runs as
    TakeOrderedAndProject (per-partition heaps + single merge — never a
    global sort). Revenue is an exact DECIMAL sum (order-independent),
    rounded to double only at the boundary; ordering reads the rounded
    alias on BOTH engines so the limit boundary cannot diverge."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    # round the exact DECIMAL sum, THEN cast (scale-4 sums can land on
    # .xx50 ties; Spark's double round() goes through shortest-repr)
    rev = (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------- set ops ----

@register(
    "set_union_all",
    "SELECT c_nationkey AS nationkey FROM customer "
    "UNION ALL SELECT s_nationkey AS nationkey FROM supplier",
)
def set_union_all(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


@register(
    "set_union_distinct",
    "SELECT c_nationkey AS nationkey FROM customer "
    "UNION SELECT s_nationkey AS nationkey FROM supplier",
)
def set_union_distinct(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    "SELECT c_nationkey AS nationkey FROM customer "
    "INTERSECT SELECT s_nationkey AS nationkey FROM supplier",
)
def set_intersect(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    "SELECT c_nationkey AS nationkey FROM customer "
    "EXCEPT SELECT s_nationkey AS nationkey FROM supplier",
)
def set_except(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "set_intersect_all",
    # Multiset semantics: keeps min(multiplicity) per value — the bag
    # counterpart of set_intersect (distinct semantics).
    "SELECT c_nationkey AS nationkey FROM customer "
    "INTERSECT ALL SELECT s_nationkey AS nationkey FROM supplier",
)
def set_intersect_all(spark, sf):
    """INTERSECT ALL — bag intersection preserving duplicate counts.
    Spark plans this as an aggregate of per-side counts + generate (one
    shuffle on the value), not a join; multiplicities are what make it
    distinct from ``set_intersect``."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "set_except_all",
    # Multiset difference: multiplicity(left) - multiplicity(right),
    # floored at zero per value.
    "SELECT c_nationkey AS nationkey FROM customer "
    "EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier",
)
def set_except_all(spark, sf):
    """EXCEPT ALL — bag difference preserving residual duplicate counts."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "agg_conditional",
    # Conditional-aggregate family (SQL FILTER clause / count_if /
    # bool_and / bool_or). The filtered SUM runs on DECIMAL(18,2)
    # internally (order-independent) per the module convention; the
    # double-literal comparisons (0.05 / 0.07) evaluate identically on
    # both engines because both compare the same stored double to the
    # same constant.
    "SELECT l_returnflag, "
    "CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk, "
    "ROUND(CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) "
    "FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE), 2) AS rev_discounted, "
    "BOOL_AND(l_quantity > 0) AS all_positive, "
    "BOOL_OR(l_tax > 0.07) AS any_high_tax "
    "FROM lineitem GROUP BY l_returnflag",
)
def agg_conditional(spark, sf):
    """Conditional aggregates — count_if, filtered SUM, bool_and/bool_or.
    All partial-aggregable (map-side combine), one hash exchange on the
    group key; the predicate evaluation stays in whole-stage codegen."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).cast("long").alias("n_bulk"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("l_discount") > 0.05,
                        F.col("l_extendedprice").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            ).cast("double"),
            2,
        ).alias("rev_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
    )


@register(
    "agg_mode",
    # Deterministic MODE per group: most frequent o_orderstatus per
    # priority, ties broken by min status — a total preference order, so
    # the answer is engine-independent (DuckDB's native mode() has
    # unspecified ties; spelling the window makes the contract explicit).
    "WITH cnt AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n "
    "FROM orders GROUP BY o_orderpriority, o_orderstatus), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
    "ORDER BY n DESC, o_orderstatus) AS rn FROM cnt) "
    "SELECT o_orderpriority, o_orderstatus AS mode_status, "
    "CAST(n AS BIGINT) AS mode_count FROM r WHERE rn = 1",
)
def agg_mode(spark, sf):
    """Per-group mode with a pinned tie-break (count DESC, value ASC).
    The window runs over the group×value COUNT table (dimension-sized,
    not the fact table), so the only fact-scale work is one partial
    aggregate — the standard scalable mode recipe."""
    o = _t(spark, sf, "orders")
    cnt = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), F.col("o_orderstatus")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("n").cast("long").alias("mode_count"),
        )
    )


@register(
    "agg_stats_corr",
    # Pearson correlation + population covariance from EXACT integer
    # sufficient statistics: x = floor(quantity), y = floor(price*100)
    # (floor, not round — floor of a double is unambiguous on both
    # engines); the five sums are exact (HUGEINT in DuckDB, DECIMAL(38,0)
    # in Spark), each is cast to double (correctly rounded, same bits),
    # and corr/cov are FIXED IEEE op sequences spelled identically on
    # both engines — the events_anomaly composed-op float rule. Native
    # corr()/covar_pop() are NOT used: their streaming accumulation order
    # differs per engine and per partitioning.
    "WITH b AS (SELECT l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT) AS x,"
    " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem), "
    "s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    " CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(x) AS DOUBLE) AS sx, "
    " CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(x * x) AS DOUBLE) AS sxx, "
    " CAST(SUM(y * y) AS DOUBLE) AS syy, CAST(SUM(x * y) AS DOUBLE) AS sxy "
    " FROM b GROUP BY l_returnflag) "
    "SELECT l_returnflag, n_rows AS n, "
    "printf('%.6f', ROUND((n * sxy - sx * sy) / "
    " (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)) AS corr, "
    "printf('%.6f', ROUND((n * sxy - sx * sy) / (n * n), 6)) AS cov_pop "
    "FROM s WHERE n * sxx > sx * sx AND n * syy > sy * sy",
)
def agg_stats_corr(spark, sf):
    """Per-group Pearson correlation and population covariance — the
    statistics-aggregate family (corr / covar_pop / stddev are all
    derivable from these five sums), computed the scale-correct way: one
    partial+final aggregation of exact integer sufficient statistics
    (map-side combine carries five numbers per group), then constant-time
    double algebra on the group table. Zero-variance groups are excluded
    by the same double comparison on both engines (same inputs, same
    single compare). The Spark sums accumulate in DECIMAL so sum(y*y)
    can't overflow BIGINT at large SF (DuckDB's HUGEINT twin). The scan
    rides a fan_out rebalance (column pruning pushes the 3-column
    projection below the exchange; the decimal partial aggregation is
    the per-row cost)."""
    li = fan_out(_t(spark, sf, "lineitem"), "l_orderkey")
    dec = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    x, y = dec(F.floor("l_quantity")), dec(F.floor(F.col("l_extendedprice") * 100))
    s = (
        li.select(F.col("l_returnflag"), x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("x").alias("dsx"),
            F.sum("y").alias("dsy"),
            F.sum(F.col("x") * F.col("x")).alias("dsxx"),
            F.sum(F.col("y") * F.col("y")).alias("dsyy"),
            F.sum(F.col("x") * F.col("y")).alias("dsxy"),
        )
    )
    n = F.col("n_rows").cast("double")
    sx, sy = F.col("dsx").cast("double"), F.col("dsy").cast("double")
    sxx, syy = F.col("dsxx").cast("double"), F.col("dsyy").cast("double")
    sxy = F.col("dsxy").cast("double")
    num = n * sxy - sx * sy
    corr = num / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return (
        s.filter((n * sxx > sx * sx) & (n * syy > sy * sy))
        .select(
            "l_returnflag",
            F.col("n_rows").alias("n"),
            F.format_string("%.6f", F.round(corr, 6)).alias("corr"),
            F.format_string("%.6f", F.round(num / (n * n), 6)).alias("cov_pop"),
        )
    )


@register(
    "win_distribution",
    # percent_rank = (rank-1)/(n-1) and cume_dist = n_le/n are each ONE
    # correctly-rounded IEEE division of exact integers when the window
    # order is TOTAL (o_orderkey tie-break) — bit-exact on both engines
    # per the repo float rule (single exactly-rounded op).
    "SELECT o_orderpriority, o_orderkey, "
    "PERCENT_RANK() OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice, o_orderkey) AS pct_rank, "
    "CUME_DIST() OVER (PARTITION BY o_orderpriority "
    "ORDER BY o_totalprice, o_orderkey) AS cum_dist "
    "FROM orders",
)
def win_distribution(spark, sf):
    """Distribution window family (percent_rank / cume_dist) — the
    normalized-rank members used for percentile bucketing and CDF
    features. One priority-keyed exchange shared by both functions."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@register(
    "fn_regexp",
    # Regexp function family. Patterns kept inside the RE2 ∩ java.util.regex
    # common subset (character classes, groups, anchors — no backrefs or
    # lookaround) so both engines match identically; DuckDB needs the
    # explicit 'g' flag to mirror Spark's replace-all semantics.
    "SELECT o_orderkey, o_orderpriority, "
    "regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 2) AS prio_word, "
    "CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS BIGINT) AS prio_num, "
    "regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g') AS devoweled, "
    "regexp_matches(o_orderpriority, '^[12]-') AS is_top2 "
    "FROM orders",
)
def fn_regexp(spark, sf):
    """Regexp expression family (extract group, extract+cast, replace-all,
    match) — zero shuffles, all inside whole-stage codegen."""
    o = _t(spark, sf, "orders")
    p = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.regexp_extract(p, "([0-9]+)-([A-Z]+)", 2).alias("prio_word"),
        F.regexp_extract(p, "([0-9]+)", 1).cast("long").alias("prio_num"),
        F.regexp_replace(p, "[AEIOU]", "_").alias("devoweled"),
        p.rlike("^[12]-").alias("is_top2"),
    )


@register(
    "fn_url",
    # URL decomposition. The corpus has no URL column, so one is
    # synthesized by the SAME expression on both engines (pii_scrub
    # precedent); DuckDB has no parse_url, so its twin extracts the
    # components with anchored regexes over the identical string.
    "WITH u AS (SELECT c_custkey, 'https://' || lower(c_mktsegment) || "
    "'.example.com/u/' || CAST(c_custkey AS VARCHAR) || '?ref=' || "
    "CAST(c_nationkey AS VARCHAR) || '&p=' || "
    "CAST(c_custkey % 7 AS VARCHAR) AS url FROM customer) "
    "SELECT c_custkey, url, "
    "regexp_extract(url, '^https://([^/]+)/', 1) AS host, "
    "regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path, "
    "regexp_extract(url, '\\?(.*)$', 1) AS query, "
    "regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param "
    "FROM u",
)
def fn_url(spark, sf):
    """URL parsing family (``parse_url`` HOST/PATH/QUERY + keyed query
    parameter) — the log/clickstream-ingest string family next to
    ``fn_regexp``/``fn_json``. Spark side uses the builtin parse_url
    (JVM java.net parsing, codegen-friendly); the oracle decomposes the
    same synthesized URL with regexes. Zero shuffles, pure projection."""
    c = _t(spark, sf, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower("c_mktsegment"),
        F.lit(".example.com/u/"),
        F.col("c_custkey").cast("string"),
        F.lit("?ref="),
        F.col("c_nationkey").cast("string"),
        F.lit("&p="),
        (F.col("c_custkey") % 7).cast("string"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


@register(
    "fn_struct",
    # Struct family: pack, nested access, struct-returning expressions.
    # The driver hash stringifies values and engines format structs
    # differently, so outputs are the UNPACKED fields — the struct lives
    # inside the expression tree (pack -> compare -> unpack), which is
    # what the family actually has to prove.
    # DuckDB's least() has no STRUCT overload, so the struct-min is a
    # CASE over the struct '<' comparison (same lexicographic order).
    "SELECT o_orderkey, "
    "CAST(greatest(struct_extract(s, 'p'), 500000.0) AS DOUBLE) AS p_floor, "
    "struct_extract(s, 'k') AS k_out, "
    "struct_extract(CASE WHEN s < {'p': CAST(100000.0 AS DOUBLE), "
    "'k': CAST(0 AS BIGINT)} THEN s ELSE {'p': CAST(100000.0 AS DOUBLE), "
    "'k': CAST(0 AS BIGINT)} END, 'p') "
    "AS p_cap FROM (SELECT o_orderkey, "
    "{'p': o_totalprice, 'k': o_orderkey} AS s FROM orders) t",
)
def fn_struct(spark, sf):
    """Struct expression family — named_struct construction, field
    extraction, and struct-valued comparisons (greatest/least compare
    lexicographically field-by-field, the same ordering
    ``agg_argminmax`` exploits inside aggregates). Zero shuffles; the
    nested type exists only inside the projection, proving construction
    and access compose without ever materializing a nested column in
    the output (the engines' struct FORMATTING differs; their struct
    SEMANTICS must not)."""
    o = _t(spark, sf, "orders")
    s = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    cap = F.struct(
        F.lit(100000.0).alias("p"), F.lit(0).cast("long").alias("k")
    )
    return o.select(
        "o_orderkey",
        F.greatest(s.getField("p"), F.lit(500000.0)).alias("p_floor"),
        s.getField("k").alias("k_out"),
        F.least(s, cap).getField("p").alias("p_cap"),
    )


@register(
    "fn_try",
    # Error-safe function family: TRY_ semantics yield NULL instead of
    # runtime failure. DuckDB has no try_divide — NULLIF spells the same
    # zero-guard; try_cast exists on both.
    "SELECT o_orderkey, "
    "o_totalprice / NULLIF(o_orderkey % 10, 0) AS safe_div, "
    "TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast, "
    "TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num "
    "FROM orders",
)
def fn_try(spark, sf):
    """Error-safe expression family (``try_divide`` / ``try_cast``) —
    the ANSI-mode survival kit: malformed input produces NULL rows
    instead of failing a 10^12-row job at task 999,997 of a million (the
    operational reason TRY_ variants exist). Division by zero and an
    unparseable cast both degrade to NULL identically on both engines;
    the parseable prefix cast proves TRY doesn't blunt correct inputs.
    Whole-stage codegen projection; the only exchange is the fan_out
    rebalance — the failing try_cast pays the JVM exception path per row
    (~10 s single-threaded at sf1.0, measured), so the map stage must
    not ride a one-row-group scan split."""
    o = fan_out(_t(spark, sf, "orders"), "o_orderkey")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), F.col("o_orderkey") % 10
        ).alias("safe_div"),
        F.col("o_orderpriority").try_cast("long").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("long").alias("prio_num"),
    )


@register(
    "pivot",
    "SELECT l_returnflag, "
    "CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS st_O, "
    "CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS st_F "
    "FROM lineitem GROUP BY l_returnflag",
)
def pivot_q(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0)).alias("st_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("st_F"),
    )


@register(
    "unpivot",
    "SELECT n_nationkey, k AS metric, v AS val FROM ("
    " SELECT n_nationkey, 'nation' AS k, CAST(n_nationkey AS BIGINT) AS v FROM nation"
    " UNION ALL"
    " SELECT n_nationkey, 'region' AS k, CAST(n_regionkey AS BIGINT) AS v FROM nation)",
)
def unpivot_q(spark, sf):
    n = _t(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        F.col("n_nationkey").cast("long").alias("nation"),
        F.col("n_regionkey").cast("long").alias("region"),
    ).unpivot("n_nationkey", ["nation", "region"], "metric", "val")


# ------------------------------------------------------ scalar fn families ----

@register(
    "fn_string",
    "SELECT doc_id, LOWER(text) AS lo, UPPER(lang) AS up, "
    "TRIM(source) AS src, SUBSTRING(text, 1, 10) AS head10, "
    "LENGTH(text) AS len, "
    "REGEXP_REPLACE(text, '[0-9]+', '#', 'g') AS nodigits, "
    "LEVENSHTEIN(lang, 'en') AS lev, "
    "CONCAT_WS('|', lang, source) AS tag "
    "FROM documents",
)
def fn_string(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.lower("text").alias("lo"),
        F.upper("lang").alias("up"),
        F.trim("source").alias("src"),
        F.substring("text", 1, 10).alias("head10"),
        F.length("text").cast("long").alias("len"),
        F.regexp_replace("text", "[0-9]+", "#").alias("nodigits"),
        F.levenshtein("lang", F.lit("en")).cast("long").alias("lev"),
        F.concat_ws("|", "lang", "source").alias("tag"),
    )


@register(
    "fn_date",
    "SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate) AS yr, "
    "EXTRACT(MONTH FROM o_orderdate) AS mo, "
    "STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start, "
    "DATEDIFF('day', CAST('2024-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS days_since, "
    "STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due "
    "FROM orders",
)
def fn_date(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due"),
    )


@register(
    "fn_math",
    "SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 1) AS r1, "
    "ABS(l_discount - 0.05) AS adelta, "
    "ROUND(POW(l_quantity, 2), 4) AS q2, "
    "ROUND(LN(l_extendedprice + 1), 6) AS lnp, "
    "CAST(l_orderkey % 97 AS BIGINT) AS m97 "
    "FROM lineitem",
)
def fn_math(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("adelta"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("q2"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("lnp"),
        (F.col("l_orderkey") % 97).cast("long").alias("m97"),
    )


@register(
    "fn_array",
    "SELECT doc_id, words[1] AS first_word, len(words) AS n_words, "
    "list_contains(words, 'data') AS has_data, "
    "array_to_string(list_sort(list_distinct(words[1:4])), ' ') AS head_sorted "
    "FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)",
)
def fn_array(spark, sf):
    d = _t(spark, sf, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.element_at(words, 1).alias("first_word"),
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "data").alias("has_data"),
        F.array_join(F.array_sort(F.array_distinct(F.slice(words, 1, 4))), " ").alias(
            "head_sorted"
        ),
    )


@register(
    "agg_median",
    # exact interpolated median (continuous quantile). Inputs are
    # INTEGRAL quantities, so every interpolated median is a dyadic
    # rational (x.0 or x.5) and the double is bit-exact on both engines —
    # no float-format contract needed.
    "SELECT l_returnflag, "
    "quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS med_qty, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_returnflag",
)
def agg_median(spark, sf):
    """Exact (non-approximate) median per group — ``percentile`` with
    linear interpolation, the same continuous-quantile definition DuckDB's
    ``quantile_cont`` uses. Restricted to integral inputs so the
    interpolated value is dyadic-exact (house float rule: never hash raw
    doubles whose low bits an engine could round differently).

    Scale shape: Spark's ``percentile`` is a true aggregate with partial
    merge (per-partition digests, one final exchange) — unlike a global
    sort-based median, it never materializes the sorted column."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(CAST(l_quantity AS BIGINT), 0.5D)").alias("med_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "sketch_hll_merge",
    # Mergeability property contract (agg_approx pattern): per-group HLL
    # sketches are built independently, UNIONED, and the merged estimate
    # must land within 5% of the exact global distinct count — the
    # re-aggregatable-rollup property that lets 100 TB pipelines keep
    # per-partition/per-day sketches and answer global questions without
    # rescanning. Oracle side: the same exact counts and a literal TRUE.
    "SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_parts, "
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_cust, "
    "TRUE AS merged_within_5pct FROM orders",
)
def sketch_hll_merge(spark, sf):
    """Mergeable distinct-count sketches (Apache DataSketches HLL): build
    one sketch PER GROUP (as a per-partition/per-day rollup would), union
    the sketch column, and check the merged estimate against the exact
    global distinct count. ``agg_approx`` pins the one-shot estimate;
    this key pins MERGEABILITY — the property that makes sketch rollups
    composable (union-then-estimate == estimate-over-union), which is the
    entire reason a 100 TB pipeline stores sketches instead of raw keys.

    Scale shape: both layers are partial-merge aggregates (fixed-size
    sketch state per group, one exchange per layer on tiny keys); the
    exact twin rides the same scan and exists only as the property's
    reference."""
    o = _t(spark, sf, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_group.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = o.agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_cust")
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        F.col("n_parts").cast("long").alias("n_parts"),
        "exact_cust",
        (
            F.abs(F.col("est") - F.col("exact_cust"))
            <= F.col("exact_cust") * 0.05
        ).alias("merged_within_5pct"),
    )


@register(
    "agg_percentile_approx",
    # Same tolerance-property contract as agg_approx: the sketch estimate
    # can't hash-match an exact engine, so the row carries the EXACT p75
    # (integral inputs + dyadic fraction 0.75 -> the interpolated value is
    # dyadic-exact on both engines, the agg_median argument) plus a
    # boolean asserting the approx estimate landed within 2 quantity
    # units of it. DuckDB emits the same exact value and a literal TRUE.
    "SELECT l_returnflag, "
    "quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75_qty, "
    "TRUE AS approx_within_2, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_returnflag",
)
def agg_percentile_approx(spark, sf):
    """Approximate percentile (Greenwald-Khanna sketch) next to its exact
    counterpart — the sketch family's quantile member, completing
    ``agg_approx`` (HLL distinct). The exact value is the oracle-checked
    payload; the boolean pins the sketch's error bound, so a Spark-side
    accuracy regression fails the hash comparison.

    Scale shape: both aggregates are partial-merge (per-partition GK
    sketches / percentile digests, one final exchange on the 3-value
    group key). At 100 TB the approx side is the one you'd run — fixed
    sketch memory per group vs the exact digest's value-domain growth —
    which is why the key measures its error against the exact twin."""
    li = _t(spark, sf, "lineitem")
    exact = F.expr("percentile(CAST(l_quantity AS BIGINT), 0.75D)")
    approx = F.expr(
        "approx_percentile(CAST(l_quantity AS BIGINT), 0.75D, 10000)"
    )
    return li.groupBy("l_returnflag").agg(
        exact.alias("p75_qty"),
        (F.abs(approx.cast("double") - exact) <= 2.0).alias(
            "approx_within_2"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# Count-min sketch geometry + the shared md5-derived bucket arithmetic.
# The depth row-hashes are 2-hex-char SLICES of ONE md5 per word (slice r
# covers hex chars [2r+1, 2r+2] — disjoint, so the rows are independent
# draws from the same 128-bit hash; the standard one-hash-many-slices
# family, same as the minhash band construction). Pure integer algebra
# both engines evaluate identically (instr over a hex alphabet; no
# hex-to-int cast, which DuckDB lacks).
_CMS_DEPTH = 4
_CMS_WIDTH = 64
_CMS_PROBES = ["data", "query", "table", "join", "filter", "spark", "stream", "row"]
_CMS_HEX = "0123456789abcdef"


def _cms_bucket_col(h, r: int):
    """Bucket of slice ``r`` of an md5-hex column ``h`` (r is a python
    int, so the substring positions are literals)."""
    c1 = F.instr(F.lit(_CMS_HEX), F.substring(h, 2 * r + 1, 1)) - 1
    c2 = F.instr(F.lit(_CMS_HEX), F.substring(h, 2 * r + 2, 1)) - 1
    return (c1 * 16 + c2) % _CMS_WIDTH


def _cms_bucket_sql(r_expr: str, word_expr: str) -> str:
    h = f"md5({word_expr})"
    return (
        f"(((instr('{_CMS_HEX}', substr({h}, 2 * {r_expr} + 1, 1)) - 1) * 16 + "
        f"instr('{_CMS_HEX}', substr({h}, 2 * {r_expr} + 2, 1)) - 1) "
        f"% {_CMS_WIDTH})"
    )


@register(
    "sketch_cms",
    # Same-value oracle (not just a tolerance property): the sketch is
    # deterministic given the hash family, so DuckDB rebuilds the exact
    # counter matrix and the exact min-over-rows estimates.
    "WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS word "
    "FROM documents), "
    f"rws AS (SELECT unnest(generate_series(0, {_CMS_DEPTH - 1})) AS r), "
    "probes AS (SELECT unnest(["
    + ", ".join(f"'{w}'" for w in _CMS_PROBES)
    + "]) AS word), "
    "counters AS (SELECT r, "
    + _cms_bucket_sql("r", "word")
    + " AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt "
    "FROM toks CROSS JOIN rws GROUP BY 1, 2), "
    "est AS (SELECT p.word, MIN(COALESCE(c.cnt, 0)) AS cms_est "
    "FROM probes p CROSS JOIN rws r LEFT JOIN counters c "
    "ON c.r = r.r AND c.bucket = " + _cms_bucket_sql("r.r", "p.word") + " "
    "GROUP BY p.word), "
    "exact AS (SELECT p.word, CAST(COUNT(t.word) AS BIGINT) AS exact_n "
    "FROM probes p LEFT JOIN toks t ON t.word = p.word GROUP BY p.word) "
    "SELECT e.word, exact_n, cms_est, cms_est >= exact_n AS is_overestimate "
    "FROM exact e JOIN est USING (word)",
)
def sketch_cms(spark, sf):
    """Count-min sketch as pure DataFrame algebra — the frequency member
    of the sketch family (``agg_approx``/``sketch_hll_merge`` cover
    distinct-count). A CMS is a depth×width counter matrix; here it is a
    (r, bucket) -> count table built by ONE partial-merge aggregation
    over tokens×depth, which makes mergeability structural: per-source
    counter tables summed elementwise equal the direct build (the rollup
    below does exactly that merge), because the cells are plain SUMs.
    Point estimates for the probe words are min-over-depth of their
    cells, computed by broadcasting the tiny counter matrix
    (depth·width = 256 rows regardless of corpus size) into the probe
    side. Spark's builtin ``count_min_sketch`` agg emits an opaque
    binary with no SQL reader; spelling the sketch relationally keeps
    the estimate queryable, the merge a GROUP BY, and the whole path in
    whole-stage codegen. The only corpus-scale work is the token scan;
    everything downstream is O(depth·width + probes). The scan rides a
    fan_out rebalance (one-row-group test file)."""
    d = fan_out(_t(spark, sf, "documents"), "doc_id")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    # hashing is factored to the DISTINCT-word grain weighted by count
    # (the bpe_train discipline): the only corpus-scale pass is the word
    # count; md5 runs ONCE per (source, word) and the depth buckets are
    # slices of that one hash, exploded as a literal-position array (no
    # depth crossJoin). per-source sketches first (the per-partition/
    # per-day rollup a pipeline would store), then merged: cells are
    # sums, so merge == re-aggregate. Measured 2.6 -> ~1 s at sf0.1.
    def bucket_arr(word_col):
        h = F.md5(word_col)
        return F.array(
            *[_cms_bucket_col(h, r) for r in range(_CMS_DEPTH)]
        )

    wc = toks.groupBy("source", "word").agg(F.count(F.lit(1)).alias("cnt"))
    per_source = (
        wc.select(
            "source", "cnt", F.posexplode(bucket_arr(F.col("word"))).alias("r", "bucket")
        )
        .groupBy("source", "r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    counters = per_source.groupBy("r", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    probes = spark.createDataFrame(
        [(w,) for w in _CMS_PROBES], ["word"]
    ).select("word", F.posexplode(bucket_arr(F.col("word"))).alias("r", "bucket"))
    est = (
        probes.join(F.broadcast(counters), ["r", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
    exact = (
        spark.createDataFrame([(w,) for w in _CMS_PROBES], ["word"])
        .join(toks, "word", "left")
        .groupBy("word")
        .agg(F.count("source").alias("exact_n"))
    )
    return exact.join(est, "word").select(
        "word",
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("is_overestimate"),
    )


@register(
    "agg_argminmax",
    # argmin/argmax without a window: max/min of a (value, key) struct is
    # the lexicographic extreme, so the unique key column makes the
    # result a deterministic single row per group. Oracle spells the
    # same semantics as rank-1 rows under the matching total orders.
    "WITH mx AS (SELECT l_returnflag, l_orderkey AS max_price_order, "
    "l_extendedprice AS max_price FROM (SELECT l_returnflag, l_orderkey, "
    "l_extendedprice, ROW_NUMBER() OVER (PARTITION BY l_returnflag "
    "ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rn FROM lineitem) "
    "WHERE rn = 1), "
    "mn AS (SELECT l_returnflag, l_orderkey AS min_price_order FROM "
    "(SELECT l_returnflag, l_orderkey, ROW_NUMBER() OVER "
    "(PARTITION BY l_returnflag ORDER BY l_extendedprice ASC, "
    "l_orderkey ASC) AS rn FROM lineitem) WHERE rn = 1) "
    "SELECT mx.l_returnflag, max_price_order, max_price, min_price_order "
    "FROM mx JOIN mn ON mx.l_returnflag = mn.l_returnflag",
)
def agg_argminmax(spark, sf):
    """argmax/argmin as ONE partial-merge aggregation — max/min over a
    (value, tie-break-key) struct. The builtin ``max_by`` leaves ties
    undefined; packing the unique key INTO the comparison makes the
    answer a total-order extreme, deterministic across engines, runs,
    and partitionings. Versus the window spelling (the oracle's): no
    per-group sort, no rank materialization — fixed-size struct state
    per group map-side, one exchange on the 3-value group key. At 100 TB
    that is the difference between a sort of the fact table and a
    partial aggregate."""
    li = _t(spark, sf, "lineitem")
    mx = F.max(
        F.struct(
            F.col("l_extendedprice").alias("p"), F.col("l_orderkey").alias("k")
        )
    )
    mn = F.min(
        F.struct(
            F.col("l_extendedprice").alias("p"), F.col("l_orderkey").alias("k")
        )
    )
    return li.groupBy("l_returnflag").agg(
        mx.getField("k").alias("max_price_order"),
        mx.getField("p").alias("max_price"),
        mn.getField("k").alias("min_price_order"),
    )


@register(
    "agg_bitmap_distinct",
    # Exact distinct counting via mergeable bitmaps: every key sets one
    # bit in a bucketed bitmap; bitmaps OR-merge (order-independent, like
    # the HLL union but EXACT), so the oracle is the plain COUNT DISTINCT
    # the bitmap plan must reproduce bit-for-bit.
    "SELECT o_orderpriority, "
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust "
    "FROM orders GROUP BY o_orderpriority",
)
def agg_bitmap_distinct(spark, sf):
    """Exact distinct count as a two-level BITMAP aggregation — the
    scalable exact counterpart to ``sketch_hll_merge``'s estimate: each
    custkey sets bit ``bitmap_bit_position`` of bucket
    ``bitmap_bucket_number`` (fixed 4KB bitmaps), per-(group, bucket)
    bitmaps OR-merge map-side, and the distinct count is the SUM of
    per-bucket popcounts. Both aggregation levels are partial-merge with
    fixed-size state, and OR is order-independent — so unlike
    COUNT(DISTINCT) (which keeps a per-group value SET and re-shuffles
    the value domain), the shuffled state is bounded by groups x touched
    buckets regardless of key cardinality. That re-aggregatable layout
    (store per-partition/per-day bitmaps, OR + popcount to answer any
    rollup exactly) is the lakehouse pattern for exact distinct at
    100 TB; this key pins that the bitmap plan reproduces the exact
    count."""
    o = _t(spark, sf, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("bkt"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm")
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).alias("n_cust")
    )


@register(
    "join_null_safe",
    # Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    # each other instead of vanishing. The NULL keys are injected by the
    # SAME expression on both engines (every 7th supplier / every 5th
    # customer loses its nation).
    "WITH s AS (SELECT s_suppkey, CASE WHEN s_suppkey % 7 = 0 THEN NULL "
    "ELSE s_nationkey END AS nk FROM supplier), "
    "c AS (SELECT c_custkey, CASE WHEN c_custkey % 5 = 0 THEN NULL "
    "ELSE c_nationkey END AS nk FROM customer) "
    "SELECT s.s_suppkey, c.c_custkey "
    "FROM s JOIN c ON s.nk IS NOT DISTINCT FROM c.nk",
)
def join_null_safe(spark, sf):
    """Null-safe equality join — the join-family member standard equi-join
    semantics can't express (NULL = NULL is NULL, so nulled keys silently
    drop; ``<=>`` matches them). Spark plans ``eqNullSafe`` as a regular
    hash join with the null-safe comparator, so it keeps the equi-join
    physical strategies (here: broadcast) rather than degrading to a
    nested loop — the property worth pinning, since the NULL bucket is
    also the classic skew key at scale (all NULLs co-locate; the salting
    discipline of ``join_skew_salted`` applies when it grows hot).
    The customer probe side rides a fan_out rebalance: the NULL-bucket
    match multiplies rows in the probe task, and the one-row-group scan
    split would otherwise generate the whole output on one core."""
    s = _t(spark, sf, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("s_nationkey"))
        .alias("nk"),
    )
    c = fan_out(_t(spark, sf, "customer"), "c_custkey").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    return s.join(c, s["nk"].eqNullSafe(c["nk"])).select(
        "s_suppkey", "c_custkey"
    )


@register(
    "join_fuzzy_name",
    # Fuzzy self-join: every customer-name pair within Levenshtein
    # distance 1. The oracle is the DEFINITION (full pairwise
    # levenshtein over the n^2 cross join — fine at oracle scale);
    # the Spark side must reach the identical pair set through
    # SymSpell deletion-neighborhood blocking, which is provably
    # complete for distance <= 1.
    "SELECT a.c_custkey AS k1, b.c_custkey AS k2, "
    "a.c_name AS n1, b.c_name AS n2, "
    "CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist "
    "FROM customer a JOIN customer b ON a.c_name < b.c_name "
    "AND levenshtein(a.c_name, b.c_name) <= 1",
)
def join_fuzzy_name(spark, sf, shuffle_cutoff: int | None = None):
    """Fuzzy string self-join (edit distance <= 1) via SymSpell
    deletion-neighborhood blocking — the join-family member for
    approximate keys (typo'd names, OCR'd ids): a cartesian
    levenshtein is O(n^2) and dead at scale, but distance <= 1 implies
    the two strings SHARE a member of their deletion neighborhoods
    (delete-at-most-one-char variant sets: a substitution at i meets
    at both-deleted-i; an insert/delete meets at the shorter string;
    equality is excluded by the n1 < n2 dedup order) — so an equi-join
    on variants finds every true pair, and the exact ``levenshtein``
    verify above the join removes the false candidates (two strings
    can share a variant at distance 2, e.g. 'ab'/'ba'). The
    LSH-candidate-verify shape, for edit distance.

    Scale shape: each side explodes to length+1 variants, keyed by
    ``xxhash64`` of the variant (8 bytes through the shuffle instead
    of the string — hash collisions only ADD candidates, which the
    exact verify then drops, so hashing is semantically free); one
    equi-join shuffle bounded by the variant table, a distinct on the
    surviving key pairs, and a JVM levenshtein verify. No cartesian
    product anywhere (plan-gated).

    r6: the candidate join and distinct carry ONLY (custkey, vh) —
    16 bytes a row instead of two 18-char names per row (guide §2.3 /
    §8: decide with small rows, attach payloads once at the end);
    names re-attach via two broadcast joins against the customer dim
    and the exact levenshtein verify runs on the deduped pair set only.

    r6b: the blocking key is now POSITION-QUALIFIED. For equal-length
    strings, distance <= 1 is EXACTLY "their deletions at the SAME
    position agree" (delete(a,i) = delete(b,i) <=> a and b agree
    everywhere except possibly i), so keying the deletion variant with
    its position admits no distance-2 candidates at all — the
    position-free SymSpell key admitted every pair whose deletions met
    at DIFFERENT positions (e.g. 'ab...'/'ba...'), ~60% of the 8M
    candidates, each paying join+distinct+verify for nothing. For
    length±1 pairs, the shorter string must EQUAL a deletion of the
    longer, which a second, near-empty join of the variant stream
    against the full-name hashes covers (completeness: a substitution
    meets at its own position; an insert/delete means shorter =
    delete(longer, i)). Hash collisions only ADD candidates (the
    verify drops them), so xxhash64 keys stay semantically free.
    The variant explode rides a fan_out rebalance (one-row-group scan
    split otherwise serializes it). Measured 66 s (r5) -> ~5 s (r6
    position-free) -> ~2.9 s (position-qualified) on a 150k-name
    sf1.0-shaped staging."""
    c = fan_out(
        _t(spark, sf, "customer").select("c_custkey", "c_name"),
        "c_custkey",
    )
    deletions = F.expr(
        "transform(sequence(1, length(c_name)), "
        "i -> concat(substring(c_name, 1, i - 1), "
        "substring(c_name, i + 1, length(c_name))))"
    )
    # The variant table is derived per consumer rather than materialized:
    # re-running the scan+explode+hash (~0.3 s/pass at 150k names) keeps
    # all 32 cores busy, where a localCheckpoint/persist barrier
    # serializes the pipeline on one materialization (measured +1.2 s).
    v = c.select(
        "c_custkey",
        F.posexplode(deletions).alias("pos", "var"),
    ).select("c_custkey", "pos", F.xxhash64("var").alias("vh"))
    va = v.select(F.col("c_custkey").alias("ka"), "pos", "vh")
    vb = v.select(F.col("c_custkey").alias("kb"), "pos", "vh")
    # ONE tiny aggregate over the name-length domain (bounded by max
    # string length — a safe driver collect, the module's size-gate
    # discipline) feeds two data-adaptive decisions:
    # (a) join strategy: size estimates see only the pre-explode scan,
    #     so above the cutoff the planner would BROADCAST the exploded
    #     variant side through the driver (BuildLeft — measured 1.5 s+
    #     at 150k names); the pinned shuffled-hash is the honest 100 TB
    #     plan there, while small corpora keep the (genuinely faster)
    #     broadcast that the planner picks unhinted;
    # (b) the cross-length branch can only match name pairs whose
    #     lengths differ by EXACTLY 1 — uniform-length corpora (all
    #     TPC-H name columns) skip the branch's two exchanges entirely.
    import os as _os

    len_prof = (
        _t(spark, sf, "customer")
        .groupBy(F.length("c_name").alias("len"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_names = sum(r["n"] for r in len_prof)
    lens = sorted(r["len"] for r in len_prof if r["len"] is not None)
    if shuffle_cutoff is None:
        shuffle_cutoff = int(
            _os.environ.get("RBS_FUZZY_SHUFFLE_CUTOFF", "50000")
        )
    _pin = (
        (lambda df: df.hint("shuffle_hash"))
        if n_names > shuffle_cutoff
        else (lambda df: df)
    )
    # ka < kb keeps exactly ONE orientation per shared variant (variant
    # sharing is symmetric), halving the rows the distinct dedups
    same_len = (
        va.join(_pin(vb), ["pos", "vh"])
        .where(F.col("ka") < F.col("kb"))
        .select(F.col("ka").alias("lk"), F.col("kb").alias("gk"))
    )
    need_cross = any(b - a == 1 for a, b in zip(lens, lens[1:]))
    if need_cross:
        full = _t(spark, sf, "customer").select(
            F.col("c_custkey").alias("kb"), F.xxhash64("c_name").alias("vh")
        )
        cross_len = (
            v.select(F.col("c_custkey").alias("ka"), "vh")
            .join(_pin(full), "vh")
            .where(F.col("ka") != F.col("kb"))
            .select(
                F.least("ka", "kb").alias("lk"),
                F.greatest("ka", "kb").alias("gk"),
            )
        )
        pairs = same_len.union(cross_len).distinct()
    else:
        pairs = same_len.distinct()
    dim = _t(spark, sf, "customer").select("c_custkey", "c_name")
    named = (
        pairs.join(
            F.broadcast(dim.select(F.col("c_custkey").alias("lk"), F.col("c_name").alias("ln"))),
            "lk",
        )
        .join(
            F.broadcast(dim.select(F.col("c_custkey").alias("gk"), F.col("c_name").alias("gn"))),
            "gk",
        )
        .where(F.col("ln") != F.col("gn"))
    )
    oriented = named.select(
        F.when(F.col("ln") < F.col("gn"), F.col("lk")).otherwise(F.col("gk")).alias("k1"),
        F.when(F.col("ln") < F.col("gn"), F.col("gk")).otherwise(F.col("lk")).alias("k2"),
        F.least("ln", "gn").alias("n1"),
        F.greatest("ln", "gn").alias("n2"),
    )
    return oriented.withColumn(
        "dist", F.levenshtein("n1", "n2").cast("int")
    ).where(F.col("dist") <= 1)


@register(
    "fn_higher_order",
    # higher-order array functions (SQL lambdas): filter / transform /
    # aggregate, including the BINARY (element, index) transform — DuckDB
    # indexes 1-based, Spark 0-based, hence (i - 1). All-integer algebra,
    # so both engines agree bit-exact with no float contract needed.
    "WITH g AS (SELECT l_orderkey, "
    " list_sort(list(CAST(l_quantity AS BIGINT))) AS qs "
    " FROM lineitem GROUP BY l_orderkey) "
    "SELECT l_orderkey, "
    "CAST(len(list_filter(qs, x -> x >= 25)) AS BIGINT) AS n_big, "
    "CAST(COALESCE(list_sum(list_transform(list_filter(qs, x -> x >= 25),"
    " x -> x * x)), 0) AS BIGINT) AS sum_sq_big, "
    "CAST(COALESCE(list_sum(list_transform(qs, (x, i) -> x * (i - 1))), 0)"
    " AS BIGINT) AS idx_weighted FROM g",
)
def fn_higher_order(spark, sf):
    """Higher-order function family over grouped arrays: ``filter``,
    unary ``transform``, the binary (element, index) ``transform``, and
    ``aggregate`` (left fold) — the lambda surface Catalyst evaluates
    JVM-side with zero Python. The binary-transform leg exists on purpose:
    PySpark picks the (element, index) form from the LAMBDA'S ARITY, and
    a default argument counts toward arity (the kg_random_walks pitfall —
    a `lambda n, t=t:` silently binds t to the index), so this key pins
    the correct arity-2 behavior against the oracle.

    Scale shape: one groupBy shuffle builds the per-order array (bounded
    by lines-per-order, ~7 max in TPC-H); every lambda then runs
    inside whole-stage codegen over the collected arrays."""
    li = _t(spark, sf, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.col("l_quantity").cast("long"))
        ).alias("qs")
    )
    big = F.filter("qs", lambda x: x >= 25)
    zero = F.lit(0).cast("long")
    return g.select(
        "l_orderkey",
        F.size(big).cast("long").alias("n_big"),
        F.aggregate(
            F.transform(big, lambda x: x * x), zero, lambda a, b: a + b
        ).alias("sum_sq_big"),
        F.aggregate(
            F.transform("qs", lambda x, i: x * i.cast("long")),
            zero,
            lambda a, b: a + b,
        ).alias("idx_weighted"),
    )


@register(
    "fn_generator",
    # Generator family: POSEXPLODE_OUTER — ordinal position + OUTER
    # semantics (a doc whose filtered array is empty still emits one row,
    # with NULL pos/word) in one generator. DuckDB twin: two zipped
    # unnests (same-length lists zip element-wise) over a CASE that maps
    # the empty array to [NULL]; NULL - 1 = NULL reproduces the NULL pos.
    "WITH a AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    " w -> LENGTH(w) > 6) AS arr FROM documents) "
    "SELECT doc_id, "
    "unnest(CASE WHEN LEN(arr) = 0 THEN [NULL] "
    " ELSE generate_series(1, LEN(arr)) END) - 1 AS pos, "
    "unnest(CASE WHEN LEN(arr) = 0 THEN [NULL] ELSE arr END) AS word "
    "FROM a",
)
def fn_generator(spark, sf):
    """Generator (table-function) family: ``posexplode_outer`` — the
    ordinal-emitting, null-preserving member. OUTER matters for
    provenance joins (a document with no matches must survive the
    explode to be LEFT-JOIN-visible downstream); POS matters wherever
    order inside the array is data (token positions, frame indices).
    One narrow Generate operator inside the scan stage — no shuffle."""
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: F.length(w) > 6).alias("arr"),
    )
    return d.select(
        "doc_id",
        F.posexplode_outer("arr").alias("pos", "word"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


@register(
    "fn_json",
    "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k "
    "FROM events",
)
def fn_json(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "fn_map",
    # map semantics exercised Spark-side; oracle checks the flattened result
    "SELECT event_id, 'k' AS key, CAST(json_extract(props, '$.k') AS BIGINT) AS val "
    "FROM events",
)
def fn_map(spark, sf):
    e = _t(spark, sf, "events")
    m = F.map_from_arrays(
        F.array(F.lit("k")),
        F.array(F.get_json_object("props", "$.k").cast("long")),
    )
    return e.select(
        "event_id",
        F.explode(m).alias("key", "val"),
    )


@register(
    "fn_conditional",
    # Conditional expression family: CASE, COALESCE, NULLIF, LEAST,
    # GREATEST, IF, and the NVL2 shape (DuckDB has no nvl2, so the oracle
    # spells the equivalent CASE — semantics, not surface, are the
    # contract). All-integer algebra, bit-exact on both engines.
    "WITH q AS (SELECT l_orderkey, l_linenumber, "
    " CAST(l_quantity AS BIGINT) AS qty FROM lineitem) "
    "SELECT l_orderkey, l_linenumber, "
    "CASE WHEN qty >= 30 THEN 'bulk' WHEN qty >= 10 THEN 'mid' "
    " ELSE 'small' END AS band, "
    "CAST(COALESCE(NULLIF(qty % 5, 0), -1) AS BIGINT) AS mod5_nz, "
    "CAST(LEAST(qty, 25) AS BIGINT) AS capped, "
    "CAST(GREATEST(qty, 5) AS BIGINT) AS floored, "
    "CASE WHEN NULLIF(qty % 7, 0) IS NOT NULL THEN 'nz' ELSE 'z' END "
    " AS nvl2_tag, "
    "IF(qty % 2 = 0, 'even', 'odd') AS parity "
    "FROM q",
)
def fn_conditional(spark, sf):
    """Conditional / null-handling expression family — CASE chains,
    COALESCE, NULLIF, LEAST/GREATEST, IF, NVL2. The whole family folds
    into whole-stage codegen (zero shuffles, zero Python); NULLIF and
    NVL2 are exercised through a value that is genuinely NULL on a
    deterministic subset of rows so the null paths execute, not just
    parse. All-integer inputs keep both engines bit-exact."""
    q = _t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    mod5 = F.nullif(F.col("qty") % 5, F.lit(0))
    return q.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("qty") >= 30, "bulk")
        .when(F.col("qty") >= 10, "mid")
        .otherwise("small")
        .alias("band"),
        F.coalesce(mod5, F.lit(-1)).cast("long").alias("mod5_nz"),
        F.least(F.col("qty"), F.lit(25)).cast("long").alias("capped"),
        F.greatest(F.col("qty"), F.lit(5)).cast("long").alias("floored"),
        F.expr("nvl2(nullif(qty % 7, 0), 'nz', 'z')").alias("nvl2_tag"),
        F.expr("if(qty % 2 = 0, 'even', 'odd')").alias("parity"),
    )


@register(
    "fn_encode",
    # Binary codec family: hex (uppercase both engines), base64 (RFC 4648,
    # unchunked both engines), MD5 / SHA-256 (lowercase hex digests), and
    # byte length. DuckDB's base64/length work on BLOB, hence encode().
    "SELECT p_partkey, "
    "hex(p_name) AS hx, "
    "base64(encode(p_name)) AS b64, "
    "md5(p_name) AS h_md5, "
    "sha256(p_name) AS h_sha256, "
    "CAST(octet_length(encode(p_name)) AS BIGINT) AS n_bytes "
    "FROM part",
)
def fn_encode(spark, sf):
    """Binary encode/digest function family — hex, base64, MD5, SHA-256,
    octet length. These are the building blocks every deterministic
    sampling / sharding / fingerprinting key on this surface leans on
    (sample_hash, shuffle_shard, doc_fingerprint), pinned here as a
    family of their own: output case and chunking conventions agree
    across engines (uppercase hex, unchunked RFC 4648 base64, lowercase
    hex digests — probed, not assumed). Pure projection inside
    whole-stage codegen; cost is linear in scanned bytes."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.hex("p_name").alias("hx"),
        F.base64(F.col("p_name").cast("binary")).alias("b64"),
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.octet_length("p_name").cast("long").alias("n_bytes"),
    )


@register(
    "agg_histogram",
    # Fixed-width histogram with cumulative counts. The bin key is exact
    # integer arithmetic end-to-end: price -> DECIMAL(18,2) -> integer
    # cents -> integer division by the $10k bin width, so no float ever
    # decides a bin boundary on either engine.
    "WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 "
    " AS BIGINT) AS cents FROM lineitem), "
    "b AS (SELECT cents // 1000000 AS bin, CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(MIN(cents) AS BIGINT) AS min_cents, "
    " CAST(MAX(cents) AS BIGINT) AS max_cents "
    " FROM c GROUP BY 1) "
    "SELECT CAST(bin AS BIGINT) AS bin, "
    "CAST(bin * 1000000 AS BIGINT) AS lo_cents, n, min_cents, max_cents, "
    "CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n "
    "FROM b",
)
def agg_histogram(spark, sf):
    """Fixed-width histogram of extended price in $10k bins with a
    cumulative-count column — the profiling aggregate every engine's
    ``summarize``/``describe`` path runs. Binning is exact-integer
    (decimal cents, integer division), so bin membership can never
    diverge across engines on a boundary value.

    Scale shape: one (map-side combinable) aggregation keyed on the bin,
    then a running sum over the BIN table — the only unpartitioned
    window in the plan sits over a dimension-sized input (number of
    bins), never over facts."""
    c = _t(spark, sf, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    b = c.groupBy(F.expr("cents div 1000000").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return b.select(
        F.col("bin").cast("long").alias("bin"),
        (F.col("bin") * 1000000).cast("long").alias("lo_cents"),
        "n",
        "min_cents",
        "max_cents",
        F.sum("n").over(w).cast("long").alias("cum_n"),
    )


# --- Bloom filter ----------------------------------------------------------
# m = 4096 bits (3 md5-hex chars per slice), k = 4 hash functions — all four
# positions are slices of ONE md5, the sketch_cms hashing discipline. The
# member set is intentionally sparse (every 10th urgent customer) so the
# filter stays far from saturation at the test SFs; m is a fixed sketch
# parameter (the point of a Bloom filter: membership state is m bits
# regardless of key cardinality — resize m, not the plan, as n grows).
_BLOOM_K = 4
_BLOOM_M = 4096


def _bloom_pos_col(h, r: int):
    """Bit position of slice ``r`` (python int) of an md5-hex column."""
    c1 = F.instr(F.lit(_CMS_HEX), F.substring(h, 3 * r + 1, 1)) - 1
    c2 = F.instr(F.lit(_CMS_HEX), F.substring(h, 3 * r + 2, 1)) - 1
    c3 = F.instr(F.lit(_CMS_HEX), F.substring(h, 3 * r + 3, 1)) - 1
    return ((c1 * 16 + c2) * 16 + c3) % _BLOOM_M


def _bloom_pos_sql(r: int, key_expr: str) -> str:
    h = f"md5({key_expr})"
    return (
        f"((((instr('{_CMS_HEX}', substr({h}, {3 * r + 1}, 1)) - 1) * 16 + "
        f"instr('{_CMS_HEX}', substr({h}, {3 * r + 2}, 1)) - 1) * 16 + "
        f"instr('{_CMS_HEX}', substr({h}, {3 * r + 3}, 1)) - 1) "
        f"% {_BLOOM_M})"
    )


@register(
    "sketch_bloom",
    # Same-value oracle: the filter is deterministic given the hash
    # family, so DuckDB rebuilds the exact bit set and every per-customer
    # hit/miss — including which non-members false-positive.
    "WITH mem AS (SELECT DISTINCT o_custkey AS k FROM orders "
    " WHERE o_orderpriority = '1-URGENT' AND o_custkey % 10 = 0), "
    "bits AS (SELECT DISTINCT pos FROM (SELECT unnest(["
    + ", ".join(_bloom_pos_sql(r, "CAST(k AS STRING)") for r in range(_BLOOM_K))
    + "]) AS pos FROM mem)), "
    "p AS (SELECT c_custkey, "
    + ", ".join(
        f"{_bloom_pos_sql(r, 'CAST(c_custkey AS STRING)')} AS p{r}"
        for r in range(_BLOOM_K)
    )
    + " FROM customer), "
    "f AS (SELECT c_custkey, "
    + " AND ".join(f"(p{r} IN (SELECT pos FROM bits))" for r in range(_BLOOM_K))
    + " AS bloom_hit, "
    "c_custkey IN (SELECT k FROM mem) AS is_member FROM p) "
    "SELECT c_custkey, bloom_hit, is_member, "
    "bloom_hit AND NOT is_member AS false_pos FROM f",
)
def sketch_bloom(spark, sf):
    """Bloom-filter membership as pure DataFrame algebra — the third
    mergeable sketch on the surface (CMS = counts, HLL = cardinality,
    Bloom = membership). Build: hash each member key into k = 4 bit
    positions (three hex chars each of ONE md5) and keep the DISTINCT
    set-bit table (≤ m = 4096 rows — the fixed-size state that makes
    Bloom filters shippable as broadcast runtime filters; union of two
    filters = OR of bit sets, so per-partition build + merge is exact).
    Probe: every customer tests all k positions against the bit set.
    One-sided error pinned by construction: members always hit; the
    oracle reproduces the exact false-positive set, not just a rate.

    Scale shape: member build is one distinct + explode bounded by m;
    the probe side pays NO shuffle — the bit set rides in as a broadcast
    1-row sorted array and each probe is k array_contains lookups inside
    codegen. At 100 TB this exact plan is how join pruning ships a small
    dimension's key set to a fact scan."""
    mem = bloom_members(_t(spark, sf, "orders"))
    bits = bloom_bit_positions(mem)
    # fan_out: the probe side pays one md5 + k position extractions per
    # row, serialized by the one-row-group scan split otherwise
    return bloom_probe(
        fan_out(_t(spark, sf, "customer"), "c_custkey"), bits, mem
    )


def bloom_members(o: DataFrame) -> DataFrame:
    """The demo filter's member keys (sparse deterministic subset of
    urgent customers) — shared with ``stream_bloom``, which derives the
    SAME member set per micro-batch (filter semantics live once)."""
    return (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_custkey") % 10 == 0)
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )


def bloom_bit_positions(mem: DataFrame) -> DataFrame:
    """Distinct set-bit positions of a member-key table — the Bloom
    filter's whole state (≤ m rows). OR of two filters == union-distinct
    of their position tables, which is why the streaming twin can merge
    per-batch builds exactly."""
    hm = F.md5(F.col("k").cast("string"))
    return mem.select(
        F.explode(
            F.array(*[_bloom_pos_col(hm, r) for r in range(_BLOOM_K)])
        ).alias("pos")
    ).distinct()


def bloom_probe(c: DataFrame, bits: DataFrame, mem: DataFrame) -> DataFrame:
    """Probe every customer against a set-bit table (broadcast as ONE
    sorted array row) and label with ground-truth membership — shared
    by ``sketch_bloom`` and ``stream_bloom`` so hit semantics live
    once."""
    bits_arr = bits.agg(F.array_sort(F.collect_list("pos")).alias("bits"))
    hc = F.md5(F.col("c_custkey").cast("string"))
    probe = c.select(
        "c_custkey",
        *[_bloom_pos_col(hc, r).alias(f"p{r}") for r in range(_BLOOM_K)],
    ).crossJoin(F.broadcast(bits_arr))
    hit = F.array_contains("bits", F.col("p0"))
    for r in range(1, _BLOOM_K):
        hit = hit & F.array_contains("bits", F.col(f"p{r}"))
    withm = probe.join(
        F.broadcast(mem), probe["c_custkey"] == mem["k"], "left"
    )
    return withm.select(
        "c_custkey",
        hit.alias("bloom_hit"),
        F.col("k").isNotNull().alias("is_member"),
        (hit & F.col("k").isNull()).alias("false_pos"),
    )


@register(
    "fn_editdistance",
    # Levenshtein distance between each part name and its predecessor
    # under the total p_partkey order — the fuzzy-matching primitive
    # entity resolution leans on. Integer-exact on both engines.
    "WITH s AS (SELECT p_partkey, p_name, "
    "LAG(p_name) OVER (ORDER BY p_partkey) AS prev_name FROM part) "
    "SELECT p_partkey, "
    "CAST(levenshtein(p_name, prev_name) AS BIGINT) AS dist, "
    "CAST(LENGTH(p_name) AS BIGINT) AS len_a, "
    "CAST(LENGTH(prev_name) AS BIGINT) AS len_b "
    "FROM s WHERE prev_name IS NOT NULL",
)
def fn_editdistance(spark, sf):
    """Edit-distance function family: Levenshtein between adjacent part
    names (the fuzzy string-similarity primitive behind dictionary
    linking's verify step — here pinned as a standalone expression so
    both engines' dynamic-programming implementations agree exactly).
    The window pairs each name with its predecessor, so the workload is
    one distance per row, not a quadratic pair set.

    Scale shape: one window over the PART dimension (dimension-scale by
    construction — fact-side fuzzy matching goes through the blocked
    linking operators, never a global order); distance evaluates inside
    codegen, cost O(len²) per row on bounded-length names."""
    p = _t(spark, sf, "part")
    w = Window.orderBy("p_partkey")
    s = p.select(
        "p_partkey",
        "p_name",
        F.lag("p_name").over(w).alias("prev_name"),
    ).where(F.col("prev_name").isNotNull())
    return s.select(
        "p_partkey",
        F.levenshtein("p_name", "prev_name").cast("long").alias("dist"),
        F.length("p_name").cast("long").alias("len_a"),
        F.length("prev_name").cast("long").alias("len_b"),
    )


@register(
    "agg_moments",
    # Skewness / excess kurtosis from EXACT integer power sums (n, s1..s4
    # all BIGINT-exact: qty <= 50 so s4 fits easily), finished by a FIXED
    # sequence of correctly-rounded IEEE ops — +,-,*,/ and sqrt only
    # (sqrt(m2)*m2 replaces pow(m2,1.5): libm pow is NOT correctly
    # rounded and could differ across engines; sqrt is). Identical
    # expression trees on both sides, then ROUND/%.6f.
    "WITH s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1, "
    " CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2, "
    " CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3, "
    " CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4 "
    " FROM lineitem GROUP BY l_returnflag) "
    "SELECT l_returnflag, n, "
    "printf('%.6f', ROUND(CAST(s1 AS DOUBLE) / n, 6)) AS mean, "
    "printf('%.6f', ROUND("
    " (CAST(s3 AS DOUBLE) / n "
    "  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n) "
    "  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) "
    " / (SQRT(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) "
    "    * (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))), 6)) AS skewness, "
    "printf('%.6f', ROUND("
    " (CAST(s4 AS DOUBLE) / n "
    "  - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n) "
    "  + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n) "
    "  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) "
    " / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) "
    "    * (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))) "
    " - 3, 6)) AS excess_kurtosis "
    "FROM s",
)
def agg_moments(spark, sf):
    """Higher statistical moments (mean, skewness, excess kurtosis) per
    return flag — the distribution-shape profile next to agg_stats_corr.
    Built-in skewness()/kurtosis() accumulate floats in partition order
    (nondeterministic across engines AND runs), so this key computes the
    moments from EXACT INTEGER power sums — the mergeable-state spelling
    (n, Σx, Σx², Σx³, Σx⁴ combine across partitions losslessly, the same
    reason events_anomaly keeps integer stats) — and finishes with a
    fixed IEEE op sequence: only +,-,*,/ and sqrt (each correctly
    rounded; pow is deliberately avoided), spelled identically on both
    engines, so every emitted %.6f string is reproducible bit-for-bit.

    Scale shape: ONE map-side-combinable aggregation; the moment algebra
    runs on the flag-count-sized rollup."""
    q = F.col("l_quantity").cast("long")
    s = _t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3").cast("double") / F.col("n")
    r4 = F.col("s4").cast("double") / F.col("n")
    m2 = r2 - m1 * m1
    skew = (r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1) / (F.sqrt(m2) * m2)
    kurt = (r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1) / (
        m2 * m2
    ) - 3
    fmt = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return s.select(
        "l_returnflag",
        "n",
        fmt(m1).alias("mean"),
        fmt(skew).alias("skewness"),
        fmt(kurt).alias("excess_kurtosis"),
    )


@register(
    "fn_mask",
    # Data-masking expression family over the customer dimension: the
    # default class map (upper->X, lower->x, digit->n, other kept), a
    # custom class map (other chars replaced too), and tail-preserving
    # redaction (mask all but the last 4 chars). The oracle spells the
    # same class maps as global regexp_replace chains — names are ASCII
    # so the character classes agree exactly.
    "SELECT c_custkey, "
    "regexp_replace(regexp_replace(regexp_replace(c_name, "
    " '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') "
    " AS masked_default, "
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_name, "
    " '[^A-Za-z0-9]', '*', 'g'), '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), "
    " '[0-9]', '#', 'g') AS masked_custom, "
    "regexp_replace(regexp_replace(regexp_replace("
    "  LEFT(c_name, LENGTH(c_name) - 4), "
    " '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') "
    " || RIGHT(c_name, 4) AS masked_keep_tail "
    "FROM customer",
)
def fn_mask(spark, sf):
    """Masking function family — the PII-redaction expressions a
    governed lakehouse applies in view definitions (column-level masking
    policies compile to exactly these): Spark's builtin ``mask()`` with
    the default and a custom character-class map, plus tail-preserving
    redaction (everything but the last 4 characters — the
    account-number display rule). Complements ``pii_scrub`` (which
    detects and redacts patterns in free text; this masks structured
    columns wholesale). The oracle re-spells each class map as a chain
    of global regexp replacements — on ASCII the two definitions agree
    character-for-character, pinning the builtin's semantics.

    Scale shape: zero-shuffle projection over the dimension; every
    expression runs inside whole-stage codegen (masking policies must
    not tax the scan)."""
    c = _t(spark, sf, "customer")
    name = F.col("c_name")
    head = F.expr("substring(c_name, 1, length(c_name) - 4)")
    return c.select(
        "c_custkey",
        F.mask(name).alias("masked_default"),
        F.mask(
            name, F.lit("U"), F.lit("l"), F.lit("#"), F.lit("*")
        ).alias("masked_custom"),
        F.concat(
            F.mask(head),
            F.expr("substring(c_name, length(c_name) - 3, 4)"),
        ).alias("masked_keep_tail"),
    )


@register(
    "win_running_distinct",
    # Running COUNT(DISTINCT) over an expanding per-user frame: DuckDB
    # runs the distinct aggregate natively in the window; Spark spells
    # it as size(collect_set() OVER) — integer-exact on both engines
    # under the TOTAL (ts, event_id) frame order.
    "SELECT event_id, user_id, "
    "CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id "
    " ORDER BY ts, event_id "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    " AS n_types_seen "
    "FROM events",
)
def win_running_distinct(spark, sf):
    """Running distinct count over an expanding window — 'how many
    distinct event types has this user touched so far' at every event,
    the feature-breadth curve personalization models consume and the
    window family's distinct-aggregate member (the frame keys cannot be
    pre-aggregated away, unlike ``agg_distinct``). Spark has no native
    DISTINCT window aggregate; ``size(collect_set() OVER ...)`` is the
    standard spelling and stays JVM-side.

    Scale shape: ONE user-keyed exchange + sort serves the whole frame;
    per-row state is the type set, bounded by the event-type domain
    (tiny), so the expanding frame never spills; output is fact-sized
    but a pure projection of the sorted partition."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")
        .alias("n_types_seen"),
    )


@register(
    "fn_variant",
    # VARIANT expression family (Spark 4's semi-structured type) over the
    # events props JSON: typed path extraction, string extraction, a
    # missing-path TRY probe, and the inferred variant schema. The oracle
    # twins each via DuckDB JSON operators; the schema string is the
    # constant OBJECT<k: BIGINT> because every props row is {"k": N}.
    "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_int, "
    "props->>'$.k' AS k_str, "
    "CAST(NULL AS BIGINT) AS k_missing, "
    "'OBJECT<k: BIGINT>' AS var_schema "
    "FROM events",
)
def fn_variant(spark, sf):
    """VARIANT function family — Spark 4's answer to open semi-structured
    columns (the engine-native replacement for stringly-typed JSON):
    ``parse_json`` into VARIANT once, then typed ``variant_get`` path
    extraction, ``try_variant_get`` for absent paths (NULL, not error —
    the fn_try discipline), and ``schema_of_variant`` introspection. A
    lakehouse ingesting heterogeneous event payloads stores exactly this
    shape; the oracle pins each member against DuckDB's JSON operators.

    Scale shape: projection plus the fan_out rebalance (the VARIANT
    encode/decode is the per-row cost and must not ride a one-row-group
    scan split); a real table would store the VARIANT binary so
    parse_json happens once at ingest."""
    e = fan_out(_t(spark, sf, "events"), "event_id")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.schema_of_variant(v).alias("var_schema"),
    )


@register(
    "agg_listagg",
    # listagg WITHIN GROUP (ORDER BY a DIFFERENT column) — the ordered
    # string aggregation agg_collect's sort_array spelling cannot
    # express (it can only sort by the collected value itself). Order is
    # TOTAL (acctbal DESC, name), so the string is deterministic.
    "SELECT n_nationkey, string_agg(s_name, ',' "
    " ORDER BY s_acctbal DESC, s_name) AS names_by_bal "
    "FROM supplier JOIN nation ON n_nationkey = s_nationkey "
    "GROUP BY n_nationkey",
)
def agg_listagg(spark, sf):
    """Ordered string aggregation (SQL:2016 LISTAGG, new in Spark 4.0)
    with a WITHIN GROUP order on a DIFFERENT column than the one being
    concatenated — suppliers per nation ordered richest-first. This is
    the member of the collect family ``agg_collect`` cannot reach:
    ``array_join(sort_array(collect_list(x)))`` sorts by x itself,
    while LISTAGG's within-group order is arbitrary (here acctbal).
    Deterministic because the order is TOTAL (name tie-break).

    Scale shape: ONE nation-keyed partial+final aggregation (listagg
    merges per-partition buffers); the nation join is broadcast-sized.
    Group payloads are bounded by suppliers-per-nation — the same
    consideration as any collect: use only where groups are bounded."""
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    j = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    return j.groupBy("n_nationkey").agg(
        F.expr(
            "listagg(s_name, ',') within group (order by s_acctbal desc, s_name)"
        ).alias("names_by_bal")
    )


@register(
    "basket_pairs",
    # Market-basket co-occurrence with lift over lineitem orders: pair
    # support counts are exact integers from the DISTINCT (order, part)
    # table's self-join (p1 < p2 canonical orientation); lift =
    # cnt·N / (cnt1·cnt2) is ONE division of exact-integer doubles under
    # the %.6f rule; global top-100 under the TOTAL
    # (cnt DESC, p1, p2) order.
    "WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
    "n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders "
    " FROM i), "
    "pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM i "
    " GROUP BY 1), "
    "pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, "
    " CAST(COUNT(*) AS BIGINT) AS pair_cnt FROM i a "
    " JOIN i b ON b.l_orderkey = a.l_orderkey "
    "  AND b.l_partkey > a.l_partkey GROUP BY 1, 2) "
    "SELECT p1, p2, pair_cnt, "
    "printf('%.6f', ROUND(CAST(pair_cnt * n.n_orders AS DOUBLE) / "
    " CAST(c1.cnt * c2.cnt AS DOUBLE), 6)) AS lift "
    "FROM pairs CROSS JOIN n "
    "JOIN pc c1 ON c1.l_partkey = p1 JOIN pc c2 ON c2.l_partkey = p2 "
    "ORDER BY pair_cnt DESC, p1, p2 LIMIT 100",
)
def basket_pairs(spark, sf):
    """Market-basket analysis — co-purchased part pairs with lift, the
    association-rule head (Apriori's 2-itemset pass) every retail
    analytics engine ships and the same pair+lift algebra
    ``kg_cooccur_lift`` applies to entity mentions, here over the
    transactional schema. Counts are exact; lift is one
    correctly-rounded division; top-100 under a total order.

    Scale shape (r6b): ONE order-keyed aggregation builds the sorted
    per-order part SET in-row (collect_set dedups map-side, so the only
    fact-grain exchange carries partial basket buffers); pairs are
    generated by an in-row i<j explode over the sorted array — bounded
    by Σ basket_size² exactly like the old self-join, but with ZERO
    join and two fewer 6M-row exchanges (the old plan paid a distinct
    exchange plus both self-join sides). Baskets are small and bounded
    (the kg_two_hop discipline), so the per-row pair array is tiny.
    Per-part supports explode from the SAME basket table (in-row
    distinct makes the count an order count); the global top-100 is
    TakeOrderedAndProject, no full sort. The basket table is
    localCheckpoint'ed — three consumers (n_orders, supports, pairs)
    would each re-derive the fact aggregation otherwise."""
    li = _t(spark, sf, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint()
    )
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    pc = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pair_structs = F.expr(
        "flatten(transform(ps, (x, j) -> "
        "transform(slice(ps, j + 2, size(ps)), "
        "y -> named_struct('p1', x, 'p2', y))))"
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
    )
    c1 = pc.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("cnt1"))
    c2 = pc.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("cnt2"))
    lift = (F.col("pair_cnt") * F.col("n_orders")).cast("double") / (
        F.col("cnt1") * F.col("cnt2")
    ).cast("double")
    return (
        pairs.crossJoin(F.broadcast(n))
        # broadcast the part-dimension support lookups (~16 B x parts):
        # size misestimates otherwise pick SMJ and sort+shuffle the
        # 11M-row pair table TWICE (plan-audited at sf1.0)
        .join(F.broadcast(c1), "p1")
        .join(F.broadcast(c2), "p2")
        .select(
            "p1",
            "p2",
            "pair_cnt",
            F.format_string("%.6f", F.round(lift, 6)).alias("lift"),
        )
        .orderBy(F.desc("pair_cnt"), "p1", "p2")
        .limit(100)
    )


@register(
    "fn_collation",
    # Collation-aware string semantics (Spark 4 collations): equality,
    # prefix, and containment under case-insensitive collations, twinned
    # in the oracle by explicit lower() algebra — on this ASCII corpus
    # UTF8_LCASE/UNICODE_CI comparisons and lower()-normalized binary
    # comparisons agree exactly, which is precisely the semantic the key
    # pins. Booleans mix true/false across rows (segment-dependent).
    "SELECT c_custkey, "
    "lower(c_mktsegment) = 'building' AS eq_ci, "
    "CASE WHEN lower(c_mktsegment) LIKE 'auto%' THEN TRUE ELSE FALSE END "
    " AS sw_ci, "
    "CASE WHEN lower(c_name) LIKE '%customer%' THEN TRUE ELSE FALSE END "
    " AS has_ci "
    "FROM customer",
)
def fn_collation(spark, sf):
    """Collation function family (new in Spark 4.0) — string comparison
    under a named collation instead of binary code-point order:
    case-insensitive equality (UTF8_LCASE) and ICU-backed prefix /
    containment (UNICODE_CI). The feature a multilingual lakehouse uses
    so WHERE name = 'müller' matches without scattering lower() over
    every predicate. The oracle re-spells each comparison as explicit
    lower() algebra — equal on ASCII by definition of the collation,
    pinning the builtin's semantics where the two models coincide.

    Scale shape: zero-shuffle projection, codegen-resident; collation
    comparison is a scan-level expression exactly like the binary
    comparison it replaces."""
    c = _t(spark, sf, "customer")
    lc = lambda col, coll: F.collate(F.col(col), coll)  # noqa: E731
    lit = lambda s, coll: F.collate(F.lit(s), coll)  # noqa: E731
    return c.select(
        "c_custkey",
        (lc("c_mktsegment", "UTF8_LCASE") == lit("building", "UTF8_LCASE"))
        .alias("eq_ci"),
        F.startswith(
            lc("c_mktsegment", "UTF8_LCASE"), lit("AUTO", "UTF8_LCASE")
        ).alias("sw_ci"),
        F.contains(
            lc("c_name", "UNICODE_CI"), lit("CUSTOMER", "UNICODE_CI")
        ).alias("has_ci"),
    )


@register(
    "macro_market_share",
    # TPC-H Q8-shaped market-share macro: for the ASIA customer market
    # restricted to ECONOMY parts, each supplier nation's share of each
    # order-year's revenue. Revenue is exact integer 1e-4 currency units
    # (DECIMAL(18,2) price × (1 − DECIMAL(18,2) discount) has scale 4;
    # ×10000 is integral), sums are exact BIGINTs, the share is ONE
    # division of exact-integer doubles under the %.6f rule.
    "WITH rev AS (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, "
    " sn.n_name AS supp_nation, "
    " CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "  (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_e4 "
    " FROM lineitem "
    " JOIN orders ON o_orderkey = l_orderkey "
    " JOIN customer ON c_custkey = o_custkey "
    " JOIN nation cn ON cn.n_nationkey = c_nationkey "
    " JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA' "
    " JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY' "
    " JOIN supplier ON s_suppkey = l_suppkey "
    " JOIN nation sn ON sn.n_nationkey = s_nationkey), "
    "a AS (SELECT CAST(o_year AS BIGINT) AS o_year, supp_nation, "
    " CAST(SUM(rev_e4) AS BIGINT) AS nation_rev FROM rev GROUP BY 1, 2), "
    "t AS (SELECT o_year, CAST(SUM(nation_rev) AS BIGINT) AS total_rev "
    " FROM a GROUP BY 1) "
    "SELECT a.o_year, a.supp_nation, a.nation_rev, "
    "printf('%.6f', ROUND(CAST(a.nation_rev AS DOUBLE) / t.total_rev, 6)) "
    " AS mkt_share "
    "FROM a JOIN t ON t.o_year = a.o_year",
)
def macro_market_share(spark, sf):
    """Market-share macro query (the TPC-H Q8 'national market share'
    shape): within the ASIA customer market for ECONOMY parts, each
    supplier nation's share of yearly revenue — the end-to-end query
    that exercises the FULL join graph (both fact tables + all five
    dimensions, nation twice under different roles). Revenue stays in
    exact integer 1e-4 units so every aggregate is exact and the share
    is one correctly-rounded division.

    Scale shape: lineitem⋈orders is the one fact-fact shuffle (orderkey
    co-partitioned); customer arrives pre-joined to its
    nation⋈region(ASIA) dimensions and joins orders on custkey (at this
    SF AQE broadcasts it; at 100 TB it co-partitions on custkey — the
    filter already dropped 4/5 of customers); part(ECONOMY), supplier,
    and both nation roles are broadcast dimensions, so no second
    fact-scale exchange exists; the share rollup runs on the
    years × nations table."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    p = _t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf, "supplier")
    asia_cust = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == "ASIA")),
                    n["n_regionkey"] == r["r_regionkey"],
                ).select("n_nationkey")
            ),
            c["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    rev_e4 = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        * 10000
    ).cast("long")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(asia_cust, o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            rev_e4.alias("rev_e4"),
        )
    )
    a = rev.groupBy("o_year", "supp_nation").agg(
        F.sum("rev_e4").cast("long").alias("nation_rev")
    )
    t = a.groupBy(F.col("o_year").alias("t_year")).agg(
        F.sum("nation_rev").cast("long").alias("total_rev")
    )
    return a.join(F.broadcast(t), a["o_year"] == F.col("t_year")).select(
        "o_year",
        "supp_nation",
        "nation_rev",
        F.format_string(
            "%.6f",
            F.round(
                F.col("nation_rev").cast("double") / F.col("total_rev"), 6
            ),
        ).alias("mkt_share"),
    )


@register(
    "macro_local_supplier_volume",
    # TPC-H Q5-shaped macro: revenue per nation from orders where the
    # customer and the supplier sit in the SAME nation of one region,
    # for one order-date year. Revenue is the exact DECIMAL sum rounded
    # to double only at the output boundary (shipping-priority rule).
    "SELECT n.n_name AS nation, "
    "CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
    " (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    " AND c.c_nationkey = s.s_nationkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name = 'ASIA' "
    " AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
    " AND o.o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY n.n_name",
)
def macro_local_supplier_volume(spark, sf):
    """Local-supplier-volume macro (TPC-H Q5 shape): yearly revenue per
    nation counting only orders whose customer and supplier share that
    nation — the classic star-join with a cross-dimension equality
    (c_nationkey = s_nationkey) that only materializes AFTER both fact
    joins, exercising join-residual handling end-to-end.

    Scale shape: lineitem⋈orders is the one fact-fact shuffle (orderkey
    co-partitioned); customer joins orders on custkey carrying its
    nationkey; supplier and the nation⋈region(ASIA) dims broadcast, so
    the same-nation residual folds into the broadcast join condition
    and no additional fact-scale exchange exists. The date filter
    pushes into the orders scan; the final rollup is nation-sized."""
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = (
        _t(spark, sf, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", F.col("n_name").alias("nation"))
    )
    # round the exact DECIMAL sum, THEN cast (scale-4 sums can land on
    # .xx50 ties; Spark's double round() goes through shortest-repr)
    rev = (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == F.col("n_nationkey"))
        .groupBy("nation")
        .agg(rev)
    )


@register(
    "macro_returned_items",
    # TPC-H Q10-shaped macro: top-20 customers by revenue lost to
    # returned items in one quarter. Exact DECIMAL revenue; the sort
    # reads the ROUNDED alias on both engines so the limit boundary
    # cannot diverge; acctbal emitted as exact integer cents.
    "SELECT c.c_custkey, c.c_name, "
    "CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
    " (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue, "
    "CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents, "
    "n.n_name AS nation "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "WHERE l.l_returnflag = 'R' "
    " AND o.o_orderdate >= TIMESTAMP '1996-07-01' "
    " AND o.o_orderdate < TIMESTAMP '1996-10-01' "
    "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name "
    "ORDER BY revenue DESC, c.c_custkey LIMIT 20",
)
def macro_returned_items(spark, sf):
    """Returned-item report macro (TPC-H Q10 shape): the 20 customers
    who returned the most revenue in a quarter — the canonical
    churn-investigation query (filter both facts → join → customer
    rollup → top-k).

    Scale shape: the returnflag filter pushes into the lineitem scan
    and the quarter filter into orders (both visible as PushedFilters);
    lineitem⋈orders shuffles on orderkey; the customer rollup keys
    custkey (one exchange); nation broadcasts; the top-20 runs as
    TakeOrderedAndProject — per-partition heaps, never a global sort.
    c_acctbal rides the GROUP BY as a key (functionally dependent on
    custkey) so no second aggregate is needed."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    # round the exact DECIMAL sum, THEN cast (scale-4 sums can land on
    # .xx50 ties; Spark's double round() goes through shortest-repr)
    rev = (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(rev)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal") * 100).cast("long").alias(
                "acctbal_cents"
            ),
            "nation",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "macro_promo_share",
    # TPC-H Q14-shaped macro: the month's share of revenue from PROMO
    # parts. Revenue stays in exact integer 1e-4 currency units (the Q8
    # rule); the share is ONE division of exact-integer doubles
    # (numerator pre-scaled by 100 as an exact BIGINT) under ROUND + the
    # %.6f formatted-string rule.
    "WITH rev AS (SELECT "
    " CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo, "
    " CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "  (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_e4 "
    " FROM lineitem JOIN part ON p_partkey = l_partkey "
    " WHERE l_shipdate >= TIMESTAMP '1996-09-01' "
    "  AND l_shipdate < TIMESTAMP '1996-10-01') "
    "SELECT CAST(SUM(is_promo * rev_e4) AS BIGINT) AS promo_rev_e4, "
    "CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4, "
    "printf('%.6f', ROUND(CAST(100 * SUM(is_promo * rev_e4) AS DOUBLE) / "
    " SUM(rev_e4), 6)) AS promo_pct "
    "FROM rev",
)
def macro_promo_share(spark, sf):
    """Promotion-effect macro (TPC-H Q14 shape): what percentage of one
    month's revenue came from promotional parts — the
    conditional-aggregate-over-a-join pattern (CASE inside SUM) every
    marketing dashboard runs.

    Scale shape: the ship-month filter pushes into the lineitem scan;
    part broadcasts (the only join); the whole query is then ONE
    partial+final aggregate to a single row — no shuffle wider than the
    two-column partials. Both sums stay exact integers so the percent
    is one correctly-rounded IEEE division on both engines."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = _t(spark, sf, "part").select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_promo"),
    )
    rev_e4 = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        * 10000
    ).cast("long")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select("is_promo", rev_e4.alias("rev_e4"))
        .agg(
            F.sum(F.col("is_promo") * F.col("rev_e4"))
            .cast("long")
            .alias("promo_rev_e4"),
            F.sum("rev_e4").cast("long").alias("total_rev_e4"),
        )
        .select(
            "promo_rev_e4",
            "total_rev_e4",
            F.format_string(
                "%.6f",
                F.round(
                    (F.lit(100) * F.col("promo_rev_e4")).cast("double")
                    / F.col("total_rev_e4"),
                    6,
                ),
            ).alias("promo_pct"),
        )
    )


@register(
    "merge_upsert",
    # MERGE INTO semantics (the lakehouse upsert) spelled as its
    # relational definition — a full-outer join of target and source on
    # the merge key, matched rows updated, source-only rows inserted,
    # target-only rows kept. Target = customer; source = the per-custkey
    # order-spend rollup (exact integer cents), plus a shifted-key slice
    # (custkey % 7 == 0, +10M) that is guaranteed not-matched so the
    # INSERT branch is non-trivial at every SF. Money stays exact:
    # ROUND(price*100) per order row is within 1 ulp of an integer on
    # both engines, sums are BIGINTs.
    "WITH src0 AS (SELECT o_custkey AS k, "
    " CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "  AS spend_cents FROM orders GROUP BY 1), "
    "src AS (SELECT k, spend_cents FROM src0 "
    " UNION ALL SELECT k + 10000000, spend_cents FROM src0 WHERE k % 7 = 0) "
    "SELECT COALESCE(c.c_custkey, s.k) AS c_custkey, "
    "COALESCE(c.c_name, 'Customer#NEW-' || CAST(s.k AS VARCHAR)) AS c_name, "
    "COALESCE(c.c_mktsegment, 'NEW') AS c_mktsegment, "
    "CASE WHEN s.k IS NULL "
    " THEN CAST(ROUND(c.c_acctbal * 100) AS BIGINT) "
    " ELSE s.spend_cents END AS acctbal_cents, "
    "CASE WHEN c.c_custkey IS NULL THEN 'INSERT' "
    " WHEN s.k IS NULL THEN 'KEEP' ELSE 'UPDATE' END AS action "
    "FROM customer c FULL OUTER JOIN src s ON s.k = c.c_custkey",
)
def merge_upsert(spark, sf):
    """MERGE INTO (upsert) — the #1 lakehouse mutation, re-expressed as
    the full-outer-join algebra every copy-on-write engine (Delta,
    Iceberg, Hudi) lowers it to: WHEN MATCHED THEN UPDATE (account
    balance := latest order spend), WHEN NOT MATCHED BY SOURCE THEN
    KEEP, WHEN NOT MATCHED BY TARGET THEN INSERT. The output IS the
    post-merge table plus the per-row action tag (the row-level audit
    column a CDC-aware merge emits).

    Scale shape: the source rollup shuffles orders once on its natural
    key; the merge itself is ONE full-outer join on c_custkey — at
    100 TB both sides hash-partition on the merge key (this is exactly
    the shuffle a real MERGE pays before rewriting files), and AQE
    handles the skewed-key case. No window, no second fact-scale
    exchange; money is exact integer cents end-to-end."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    src0 = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend_cents")
    )
    src = src0.unionByName(
        src0.filter(F.col("k") % 7 == 0).select(
            (F.col("k") + 10000000).alias("k"), "spend_cents"
        )
    )
    m = c.join(src, src["k"] == c["c_custkey"], "full_outer")
    return m.select(
        F.coalesce(c["c_custkey"], src["k"]).alias("c_custkey"),
        F.coalesce(
            c["c_name"],
            F.concat(F.lit("Customer#NEW-"), src["k"].cast("string")),
        ).alias("c_name"),
        F.coalesce(c["c_mktsegment"], F.lit("NEW")).alias("c_mktsegment"),
        F.when(
            src["k"].isNull(),
            F.round(c["c_acctbal"] * 100).cast("long"),
        )
        .otherwise(src["spend_cents"])
        .alias("acctbal_cents"),
        F.when(c["c_custkey"].isNull(), F.lit("INSERT"))
        .when(src["k"].isNull(), F.lit("KEEP"))
        .otherwise(F.lit("UPDATE"))
        .alias("action"),
    )


@register(
    "fn_xml",
    # XML parse family oracled as a ROUND-TRIP: Spark builds an XML
    # string from the part columns, parses it back with from_xml +
    # the xpath family, and must recover the original values exactly.
    # The oracle states the recovered values directly — any escaping,
    # parsing, or type-coercion defect on the Spark side breaks the
    # hash. p_name is [a-z ]+ and p_size a small int, so no XML
    # entity escaping is exercised (by construction, not by luck).
    "SELECT p_partkey, p_partkey AS key_rt, p_name AS name_rt, "
    "CAST(p_size AS BIGINT) AS size_rt, "
    "CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS BIGINT) "
    " AS n_words FROM part",
)
def fn_xml(spark, sf):
    """XML function family — ``from_xml`` (schema-ful element parse),
    ``xpath_long`` on an attribute, ``xpath`` (node-set extraction →
    array cardinality). Semi-structured XML feeds (SOAP/legacy B2B,
    sitemap/feed crawls) are a real ingest format for a 100 TB corpus
    engine; the family is pinned as a round-trip so the oracle needs no
    XML support of its own: build → parse → recover must be the
    identity on the generating columns.

    Scale shape: projection plus the fan_out rebalance. The XML
    build/parse is JVM-side (no Python); a full document parse per row
    is the dominant cost, so the round-trip goes through ONE from_xml
    whose schema also recovers the key attribute (attributePrefix '_'),
    instead of re-parsing the same document three times through the
    xpath family — measured 28 s -> 0.6 s at sf1.0 together with the
    fan_out (the one-row-group scan split had serialized the parse)."""
    p = fan_out(_t(spark, sf, "part"), "p_partkey")
    xml = F.concat(
        F.lit('<part key="'),
        F.col("p_partkey"),
        F.lit('"><name>'),
        F.col("p_name"),
        F.lit("</name><size>"),
        F.col("p_size"),
        F.lit("</size></part>"),
    )
    w = p.withColumn("xml", xml)
    parsed = w.withColumn(
        "s", F.from_xml("xml", "_key BIGINT, name STRING, size BIGINT")
    )
    return parsed.select(
        "p_partkey",
        F.col("s._key").alias("key_rt"),
        F.col("s.name").alias("name_rt"),
        F.col("s.size").alias("size_rt"),
        # one text node per word after a JVM-side re-tokenization of the
        # recovered (round-tripped) name
        F.size(
            F.split(F.col("s.name"), " ")
        ).cast("long").alias("n_words"),
    )


# ------------------------------------------------ TPC-H macro batch 2 ----
# The remaining classic report shapes expressible over this schema
# (no commitdate/receiptdate/shipmode/phone columns exist, so Q4/Q22
# are re-based on shipdate lateness and nationkey country codes; the
# join/agg/subquery SHAPE — the thing that exercises the engine — is
# preserved). SURVEY.md §2.2 macro family; [K] TPC-H spec shapes.


@register(
    "macro_pricing_summary",
    # TPC-H Q1 shape: the canonical full-scan pricing rollup. All sums
    # are exact (BIGINT quantities / DECIMAL currency; the 3-factor
    # charge stays within DECIMAL(38) via narrow input precisions);
    # averages are ONE IEEE division of exact integers under the
    # ROUND + %.6f formatted-string rule.
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
    "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) "
    " AS sum_base_price, "
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    " (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) "
    " AS sum_disc_price, "
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    " (1 - CAST(l_discount AS DECIMAL(4,2))) * "
    " (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge, "
    "printf('%.6f', ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) "
    " / COUNT(*), 6)) AS avg_qty, "
    "printf('%.6f', ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS "
    " DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / (100 * COUNT(*)), 6)) "
    " AS avg_price, "
    "printf('%.6f', ROUND(CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) "
    " * 100 AS BIGINT)) AS DOUBLE) / (100 * COUNT(*)), 6)) AS avg_disc, "
    "COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' "
    "GROUP BY l_returnflag, l_linestatus",
)
def macro_pricing_summary(spark, sf):
    """Pricing-summary report macro (TPC-H Q1 shape): the canonical
    near-full-scan rollup — per (returnflag, linestatus): quantity,
    base/discounted/charged revenue, three averages, and row count.
    THE reference query for scan + partial-aggregate throughput.

    Scale shape: one pruned scan (6 columns of 11, shipdate filter
    pushed), partial+final hash aggregate onto a 6-group key — the
    shuffle carries six rows per map task. Exactness: quantities are
    integral doubles summed as BIGINT; currency sums use DECIMAL with
    narrow input precisions so even the 3-factor charge product
    (12,2)x(4,2)x(4,2) -> (22,6) stays exact; each average is one
    correctly-rounded IEEE division of exact integers, so Spark's
    partial-agg order can never flip a bit vs the oracle."""
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01"
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    qty = F.col("l_quantity").cast("long")
    fmt6 = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("long").alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(price * (F.lit(1) - disc)), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), 2
            )
            .cast("double")
            .alias("sum_charge"),
            F.sum((price * 100).cast("long")).alias("_price_cents"),
            F.sum((disc * 100).cast("long")).alias("_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            fmt6(
                F.col("sum_qty").cast("double") / F.col("count_order")
            ).alias("avg_qty"),
            fmt6(
                F.col("_price_cents").cast("double")
                / (F.lit(100) * F.col("count_order"))
            ).alias("avg_price"),
            fmt6(
                F.col("_disc_cents").cast("double")
                / (F.lit(100) * F.col("count_order"))
            ).alias("avg_disc"),
            "count_order",
        )
    )


@register(
    "macro_order_priority",
    # TPC-H Q4 shape: per-priority count of one quarter's orders with
    # at least one LATE lineitem (shipped >60 days after the order —
    # the schema has no commit/receipt dates, so lateness re-bases the
    # EXISTS correlation on shipdate vs orderdate).
    "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
    " AND o_orderdate < TIMESTAMP '1996-04-01' "
    " AND EXISTS (SELECT 1 FROM lineitem l "
    "  WHERE l.l_orderkey = o.o_orderkey "
    "   AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
    "GROUP BY o_orderpriority",
)
def macro_order_priority(spark, sf):
    """Order-priority-checking macro (TPC-H Q4 shape): how many of one
    quarter's orders, per priority class, had at least one line shipped
    more than 60 days after ordering — the canonical correlated-EXISTS
    report (here spelled as a LEFT SEMI join with a non-equi residual).

    Scale shape: the quarter filter pushes into the orders scan (one
    quarter of the fact); the semi join shuffles both sides on
    orderkey and short-circuits per match (no row multiplication, no
    dedup needed — the reason EXISTS beats JOIN+DISTINCT at scale);
    the rollup output is 5 rows. The lateness comparison is exact
    integer-microsecond timestamp arithmetic on both engines."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"]
                > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "macro_volume_shipping",
    # TPC-H Q7 shape: bilateral shipping volume between a small nation
    # set, by supplier nation x customer nation x ship year. Revenue is
    # the exact DECIMAL sum rounded at the boundary.
    "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
    "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
    "CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
    " (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue "
    "FROM lineitem l "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
    "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
    "WHERE s.s_nationkey < 4 AND c.c_nationkey < 4 "
    " AND s.s_nationkey <> c.c_nationkey "
    " AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
    " AND l.l_shipdate < TIMESTAMP '1998-01-01' "
    "GROUP BY sn.n_name, cn.n_name, CAST(year(l.l_shipdate) AS BIGINT)",
)
def macro_volume_shipping(spark, sf):
    """Volume-shipping macro (TPC-H Q7 shape): two years of trade
    revenue between distinct nations of a small set, broken down by
    supplier nation x customer nation x ship year — the classic
    bilateral-flow report with a cross-dimension inequality.

    Scale shape: the supplier-nation filter prunes lineitem THROUGH the
    broadcast supplier join before the fact-fact shuffle, and the
    customer-nation filter prunes orders through its broadcast customer
    join — so the one orderkey exchange moves only qualifying rows.
    The s<>c inequality is a residual on broadcast-joined columns
    (never a shuffle key); both nation name lookups broadcast; the
    rollup is (nations^2 x years)-sized."""
    sn = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    s = _t(spark, sf, "supplier").filter(F.col("s_nationkey") < 4).select(
        "s_suppkey", "s_nationkey"
    )
    c = _t(spark, sf, "customer").filter(F.col("c_nationkey") < 4).select(
        "c_custkey", "c_nationkey"
    )
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    # round the exact DECIMAL sum, THEN cast (scale-4 sums can land on
    # .xx50 ties; Spark's double round() goes through shortest-repr)
    rev = (
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(rev)
    )


@register(
    "macro_cust_distribution",
    # TPC-H Q13 shape: the customer-order-count histogram, with the
    # filter folded into the LEFT JOIN condition so zero-order
    # customers survive into the c_count=0 bucket.
    "SELECT c_count, COUNT(*) AS custdist FROM ("
    " SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count "
    " FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
    "  AND o.o_orderpriority <> '4-NOT SPECIFIED' "
    " GROUP BY c.c_custkey) GROUP BY c_count",
)
def macro_cust_distribution(spark, sf):
    """Customer-distribution macro (TPC-H Q13 shape): the histogram of
    customers by how many (non-'4-NOT SPECIFIED') orders they placed —
    the canonical count-of-counts / two-level aggregation, with the
    subtlety that the priority filter must live in the JOIN CONDITION
    (not a WHERE) so customers with zero qualifying orders keep their
    LEFT-join row and land in the c_count=0 bucket.

    Scale shape: orders pre-filters and pre-AGGREGATES to (custkey,
    cnt) before the join — the left join then joins two custkey-keyed
    sides (one exchange each) with no row multiplication; the outer
    count-of-counts groups a customer-sized table onto a ~30-value
    key. COUNT(o_orderkey) counts non-null matches only, reproduced on
    the Spark side by coalescing the pre-agg count to 0."""
    c = _t(spark, sf, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.join(per_cust, c["c_custkey"] == F.col("ck"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "macro_small_qty_revenue",
    # TPC-H Q17 shape: revenue locked in small-quantity lines of one
    # brand. The correlated "qty < 0.2 * avg(qty per part)" is spelled
    # as the EXACT integer inequality 5*qty*cnt < sum_qty, so no float
    # average ever exists to diverge between engines.
    "WITH pa AS (SELECT l_partkey AS pk, "
    "  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq, "
    "  COUNT(*) AS cq "
    " FROM lineitem JOIN part ON p_partkey = l_partkey "
    " WHERE p_brand = 'Brand#11' GROUP BY l_partkey) "
    "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) "
    " AS DOUBLE) AS small_qty_price, COUNT(*) AS n_lines "
    "FROM lineitem JOIN pa ON l_partkey = pk "
    "WHERE 5 * CAST(l_quantity AS BIGINT) * cq < sq",
)
def macro_small_qty_revenue(spark, sf):
    """Small-quantity-order revenue macro (TPC-H Q17 shape): total
    price of one brand's lineitems whose quantity is below 20% of that
    part's average quantity — the canonical correlated scalar-subquery
    report, decorrelated into a per-part aggregate joined back to the
    fact.

    Scale shape: the brand filter prunes part (broadcast) and through
    it the lineitem scan; the per-part aggregate and the join back
    both key l_partkey, so AQE reuses one exchange; the per-part stats
    table is brand-sized (~80 parts) and broadcasts back onto the
    fact. Exactness: qty < 0.2*avg(qty) is rewritten as
    5*qty*cnt < sum (all BIGINTs) — no float average exists."""
    p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    li = _t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pa = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sq"),
        F.count(F.lit(1)).alias("cq"),
    )
    return (
        brand_lines.join(F.broadcast(pa), F.col("l_partkey") == F.col("pk"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("cq")
            < F.col("sq")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("small_qty_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "macro_top_spenders",
    # TPC-H Q18 shape: large-volume orders (HAVING sum(qty) > 180) with
    # their customers, top-20 under a total order. Quantities are exact
    # BIGINTs; totalprice emitted as exact cents.
    "WITH big AS (SELECT l_orderkey AS ok, "
    "  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
    " FROM lineitem GROUP BY l_orderkey "
    " HAVING SUM(CAST(l_quantity AS BIGINT)) > 180) "
    "SELECT c.c_custkey, c.c_name, o.o_orderkey, "
    "CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents, "
    "sum_qty "
    "FROM big JOIN orders o ON o.o_orderkey = big.ok "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "ORDER BY sum_qty DESC, o.o_orderkey LIMIT 20",
)
def macro_top_spenders(spark, sf):
    """Large-volume-customer macro (TPC-H Q18 shape): the 20 biggest
    orders by total quantity with their customers — the canonical
    HAVING-subquery-drives-the-join report.

    Scale shape: the lineitem rollup keys orderkey (one fact exchange)
    and the HAVING filter collapses it to a tiny survivor set BEFORE
    any join — the survivors then BROADCAST onto orders, customer
    broadcasts too, and the top-20 runs as TakeOrderedAndProject
    (per-partition heaps under the deterministic (sum_qty DESC,
    orderkey) total order — orderkey breaks all ties)."""
    big = (
        _t(spark, sf, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o["o_orderkey"] == F.col("ok"))
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "macro_disjunctive_revenue",
    # TPC-H Q19 shape: revenue under a 3-branch disjunction of
    # (brand, size-range, quantity-range) conjunctions — the predicate
    # shape that defeats naive pushdown.
    "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    " (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue, "
    "COUNT(*) AS n_lines "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
    "   AND l_quantity BETWEEN 1 AND 11) "
    " OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20 "
    "   AND l_quantity BETWEEN 10 AND 20) "
    " OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 "
    "   AND l_quantity BETWEEN 20 AND 30)",
)
def macro_disjunctive_revenue(spark, sf):
    """Discounted-revenue macro (TPC-H Q19 shape): revenue from three
    disjoint (brand, size, quantity) market segments — the canonical
    disjunctive-predicate query, where each OR branch mixes columns
    from BOTH join sides so the predicate can only be evaluated as a
    join residual.

    Scale shape: Catalyst derives the implied single-side prefilters
    (quantity BETWEEN 1 AND 30 on lineitem; the brand IN-list and
    size BETWEEN 1 AND 25 on part) and pushes them into the scans —
    the classic OR-expansion win; part broadcasts; the full
    disjunction evaluates as the BHJ residual; the output is one
    row of exact-DECIMAL revenue."""
    li = _t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    seg = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(
            F.broadcast(p), (li["l_partkey"] == p["p_partkey"]) & seg
        ).agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "macro_idle_customers",
    # TPC-H Q22 shape: per-nation count + balance of above-average-
    # balance customers DORMANT since 1999 (no phone column exists, so
    # the country-code IN-list re-bases on nationkey; the NOT EXISTS
    # anti-join re-bases on recent orders — every customer has SOME
    # order in this corpus). The above-average cut is the exact integer
    # inequality cents*n > sum_cents — no float average exists.
    "WITH pool AS (SELECT c_custkey, c_nationkey, "
    "  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents "
    " FROM customer WHERE c_nationkey BETWEEN 10 AND 16), "
    "stat AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS s, COUNT(*) AS n "
    " FROM pool WHERE bal_cents > 0) "
    "SELECT c_nationkey, COUNT(*) AS numcust, "
    "CAST(SUM(bal_cents) AS BIGINT) AS totbal_cents "
    "FROM pool, stat "
    "WHERE bal_cents * n > s "
    " AND NOT EXISTS (SELECT 1 FROM orders o "
    "  WHERE o.o_custkey = pool.c_custkey "
    "   AND o.o_orderdate >= TIMESTAMP '1999-01-01') "
    "GROUP BY c_nationkey",
)
def macro_idle_customers(spark, sf):
    """Global-sales-opportunity macro (TPC-H Q22 shape): per nation of
    a 7-nation set, the count and total balance of customers whose
    balance beats the set's positive-balance average but who placed no
    order since 1999 — scalar-subquery threshold + NOT EXISTS in one
    report.

    Scale shape: the nationkey IN-range pushes into the customer scan;
    the global (sum, count) is a one-row aggregate cross-joined back
    (broadcast NLJ of one row — free); the anti join shuffles on
    custkey against the date-pruned orders scan; the rollup is
    7 rows. Exactness: balances live as exact cents BIGINTs and the
    average cut is cents*n > sum — integer algebra on both engines."""
    pool = (
        _t(spark, sf, "customer")
        .filter(F.col("c_nationkey").between(10, 16))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    stat = pool.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("long").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    recent = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(stat))
        .filter(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(recent, pool["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").cast("long").alias("totbal_cents"),
        )
    )


# ------------------------------------------------- data-layout family ----
# Lakehouse table-maintenance operators: schema evolution across file
# generations, hidden file-metadata columns, small-file compaction, and
# ANALYZE-style column profiling. At 100 TB these are the daily-driver
# maintenance jobs (OPTIMIZE / ANALYZE / schema-drift reads) that sit
# next to the query surface. Staged inputs live under /tmp/rbs_layout_*
# keyed by sf-dir basename with a _DONE marker (CLAUDE.md cache rule).


def _layout_dir(sf: str, tag: str) -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"rbs_layout_{tag}_{os.path.basename(sf.rstrip('/'))}",
    )


def _stage_evolved(sf: str) -> str:
    """Two parquet generations of the documents table: generation A
    (doc_id < 250) was written BEFORE the `source` column existed;
    generation B carries it. Staged with pyarrow directly from the
    testdata parquet — no Spark job, fully deterministic."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = _layout_dir(sf, "evo")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        t = pq.read_table(
            f"{sf}/documents.parquet", columns=["doc_id", "lang", "source"]
        )
        os.makedirs(out, exist_ok=True)
        a = t.filter(pc.less(t["doc_id"], 250)).select(["doc_id", "lang"])
        b = t.filter(pc.greater_equal(t["doc_id"], 250))
        pq.write_table(a, os.path.join(out, "gen_a.parquet"))
        pq.write_table(b, os.path.join(out, "gen_b.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return out


@register(
    "scan_schema_evolution",
    # Schema-drift read: the old generation's rows surface NULL for the
    # column added later — stated directly from the documents view.
    "SELECT doc_id, lang, "
    "CASE WHEN doc_id < 250 THEN NULL ELSE source END AS source "
    "FROM documents",
)
def scan_schema_evolution(spark, sf):
    """Schema-evolution scan: one read over parquet files written at
    different schema generations (a column added mid-corpus — the
    normal state of any table that has lived a year). Spark's
    ``mergeSchema`` reconciles the footers; old files surface NULL for
    the new column. The oracle re-states the expected rows from the
    unified view, so a green row proves the merged read end-to-end.

    Scale shape: schema merge happens at PLANNING time over file
    footers (listing cost, not data cost); the scan itself stays a
    normal pruned columnar read — at 100 TB you pay footer listing
    once, not a table rewrite, which is the point of evolution-aware
    readers."""
    path = _stage_evolved(sf)
    return (
        spark.read.option("mergeSchema", True)
        .parquet(path)
        .select("doc_id", "lang", "source")
    )


def _stage_sharded(sf: str) -> str:
    """The documents table as 4 known-name parquet shards
    (docs_<doc_id%4>.parquet) — the layout for metadata-column tests
    and the compaction input."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = _layout_dir(sf, "shard4")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        t = pq.read_table(
            f"{sf}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"],
        )
        os.makedirs(out, exist_ok=True)
        for i in range(4):
            # doc_id % 4 spelled as & 3 (this pyarrow has no pc.mod)
            part = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 3), i))
            pq.write_table(part, os.path.join(out, f"docs_{i}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return out


@register(
    "scan_metadata",
    # Hidden-metadata rollup: per physical file, row count + payload
    # sum. The staged layout makes file membership a pure function of
    # doc_id, so the oracle states it from the logical view.
    "SELECT 'docs_' || CAST(doc_id % 4 AS VARCHAR) || '.parquet' AS file_name, "
    "COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
    "FROM documents GROUP BY 1",
)
def scan_metadata(spark, sf):
    """File-metadata scan: Spark's hidden ``_metadata`` struct exposes
    the physical provenance (file name/size/mtime) of every row — the
    primitive behind incremental-ingest bookkeeping ("which files did
    these rows come from"), bad-file forensics, and file-grain
    dedup/GC at lake scale.

    Scale shape: ``_metadata.file_name`` is a constant per scanned
    file materialized by the reader (no data cost); the rollup groups
    a files-sized key. The oracle proves the file attribution, not
    just the counts, because the staged shard membership is a pure
    function of doc_id."""
    path = _stage_sharded(sf)
    return (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_name").alias("file_name"), "n_chars")
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@register(
    "compact_small_files",
    # Compaction preserves content exactly; the oracle checks content,
    # pytest checks the physical file count collapsed 16 -> 2.
    "SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM documents",
)
def compact_small_files(spark, sf):
    """Small-file compaction (OPTIMIZE): rewrite a 16-shard directory
    into 2 right-sized files and read the result back — THE table-
    maintenance job at lake scale, where millions of ingest-grain
    files destroy scan planning long before they hurt scan IO.

    Scale shape: ``coalesce(2)`` compacts WITHOUT a shuffle (each
    output task concatenates whole input splits — the correct
    primitive for bin-packing compaction; ``repartition`` would pay a
    full exchange for placement no one asked for). Content is proven
    unchanged by the oracle; the 16 -> 2 physical collapse is pinned
    by pytest. Idempotent per (sf, pid): the output dir is swapped
    atomically so re-runs and concurrent sessions never read a
    half-written directory."""
    import os
    import shutil
    import tempfile

    src = _stage_sharded(sf)
    out = _layout_dir(sf, "compact_out")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        tmp = tempfile.mkdtemp(
            prefix=f"rbs_layout_compact_stage_{os.getpid()}_"
        )
        stage = os.path.join(tmp, "data")
        (
            spark.read.parquet(src)
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(stage)
        )
        with open(os.path.join(stage, "_DONE"), "w") as f:
            f.write("ok")
        if not os.path.exists(done):
            try:
                os.rename(stage, out)
            except OSError:
                pass  # another session won the swap; theirs is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(out).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "table_profile",
    # ANALYZE-style column statistics. The oracle spells it as four
    # per-column scans; the Spark side computes all columns in ONE
    # pass and unpivots. min/max emitted as strings (engine-neutral).
    "SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows, "
    " COUNT(*) - COUNT(l_orderkey) AS n_null, "
    " COUNT(DISTINCT l_orderkey) AS n_distinct, "
    " CAST(MIN(l_orderkey) AS VARCHAR) AS min_val, "
    " CAST(MAX(l_orderkey) AS VARCHAR) AS max_val FROM lineitem "
    "UNION ALL SELECT 'l_quantity', COUNT(*), "
    " COUNT(*) - COUNT(l_quantity), COUNT(DISTINCT l_quantity), "
    " CAST(CAST(MIN(l_quantity) AS BIGINT) AS VARCHAR), "
    " CAST(CAST(MAX(l_quantity) AS BIGINT) AS VARCHAR) FROM lineitem "
    "UNION ALL SELECT 'l_returnflag', COUNT(*), "
    " COUNT(*) - COUNT(l_returnflag), COUNT(DISTINCT l_returnflag), "
    " MIN(l_returnflag), MAX(l_returnflag) FROM lineitem "
    "UNION ALL SELECT 'l_shipdate', COUNT(*), "
    " COUNT(*) - COUNT(l_shipdate), COUNT(DISTINCT l_shipdate), "
    " strftime(MIN(l_shipdate), '%Y-%m-%d'), "
    " strftime(MAX(l_shipdate), '%Y-%m-%d') FROM lineitem",
)
def table_profile(spark, sf):
    """Table-statistics profile (ANALYZE): per column — row count,
    null count, exact distinct count, min, max — the stats a
    cost-based optimizer and a data-quality monitor both live on.

    Scale shape (r6): one independent single-distinct aggregate per
    column, unioned — each subtree's parquet scan prunes to ITS column
    (columnar: total bytes read ≈ the one-scan spelling) and a single
    COUNT DISTINCT plans as a two-level partial aggregate with
    map-side dedup, so low-cardinality columns collapse before the
    exchange. The previous one-pass spelling ran four distincts
    through Catalyst's Expand — 5x map-side row multiplication and a
    wide multi-column hash state, measured 9.1 s vs 0.9 s at sf1.0.
    The four subtrees run as one job and back-fill each other's task
    tails (guide §2.6). For approximate profiles at petabyte scale
    swap COUNT DISTINCT for the HLL sketches already on this surface
    (sketch_hll_merge); this key pins the exact contract. min/max emit
    as strings so one schema carries every column type."""
    li = _t(spark, sf, "lineitem")

    def col_profile(col: str, mn, mx):
        return li.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        ).select(
            "col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val"
        )

    return (
        col_profile(
            "l_orderkey",
            F.min("l_orderkey").cast("string"),
            F.max("l_orderkey").cast("string"),
        )
        .unionAll(
            col_profile(
                "l_quantity",
                F.min("l_quantity").cast("long").cast("string"),
                F.max("l_quantity").cast("long").cast("string"),
            )
        )
        .unionAll(
            col_profile(
                "l_returnflag", F.min("l_returnflag"), F.max("l_returnflag")
            )
        )
        .unionAll(
            col_profile(
                "l_shipdate",
                F.date_format(F.min("l_shipdate"), "yyyy-MM-dd"),
                F.date_format(F.max("l_shipdate"), "yyyy-MM-dd"),
            )
        )
    )


@register(
    "macro_forecast_revenue",
    # TPC-H Q6 shape: the forecasting-revenue-change slice — one pushed
    # filter + one aggregate. The discount band compares exact CENTS
    # (ROUND(d*100) BIGINT) because 0.05/0.07 are not dyadic and the
    # engines parse those literals into different types.
    "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    " CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue, "
    "COUNT(*) AS n_lines FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    " AND l_shipdate < TIMESTAMP '1997-01-01' "
    " AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
    " AND l_quantity < 24",
)
def macro_forecast_revenue(spark, sf):
    """Forecasting-revenue-change macro (TPC-H Q6 shape): how much
    revenue a discount-band/quantity slice of one ship-year carries —
    the canonical scan-dominated aggregate (no join at all), the query
    that measures pure filter+scan throughput.

    Scale shape: the date and quantity predicates push into the
    parquet scan; the discount band is evaluated on exact cents (the
    acctbal-cents precedent: 0.05 is not a dyadic double, so a raw
    BETWEEN on doubles would hinge on each engine's literal typing);
    the whole query then collapses in the map-side partial aggregate —
    the shuffle moves one row per task."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.round(F.col("l_discount") * 100)
        .cast("long")
        .between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "macro_top_supplier",
    # TPC-H Q15 shape: the supplier(s) with the quarter's maximum
    # revenue — the view + scalar-MAX-subquery pattern. Revenue stays
    # in exact integer 1e-4 units so the max-equality cannot be a
    # float comparison.
    "WITH sr AS (SELECT l_suppkey AS sk, "
    "  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "   (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) "
    "   AS BIGINT) AS rev_e4 "
    " FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "  AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
    "SELECT s.s_suppkey, s.s_name, sr.rev_e4 AS total_rev_e4 "
    "FROM supplier s JOIN sr ON s.s_suppkey = sr.sk "
    "WHERE sr.rev_e4 = (SELECT MAX(rev_e4) FROM sr)",
)
def macro_top_supplier(spark, sf):
    """Top-supplier macro (TPC-H Q15 shape): the supplier(s) whose
    quarter revenue equals the maximum over all suppliers — the
    view-then-scalar-subquery pattern, kept as an EQUALITY against MAX
    (not a top-1 limit) so genuine ties all surface, exactly as the
    spec demands.

    Scale shape: the quarter filter pushes into the scan; the per-
    supplier rollup is the one fact exchange; the MAX is a one-row
    aggregate broadcast back (crossJoin of one row); supplier
    broadcasts for the name lookup. Revenue lives in exact integer
    1e-4 currency units end-to-end, so the max-equality is integer
    comparison on both engines."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev_e4 = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        * 10000
    ).cast("long")
    sr = li.select(
        F.col("l_suppkey").alias("sk"), rev_e4.alias("r")
    ).groupBy("sk").agg(F.sum("r").cast("long").alias("rev_e4"))
    mx = sr.agg(F.max("rev_e4").alias("mx"))
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        sr.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("mx"))
        .join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev_e4").alias("total_rev_e4"))
    )


@register(
    "agg_weighted_stats",
    # Quantity-weighted price statistics per returnflag. Mean and
    # variance are derived from three EXACT integer/decimal moments
    # (W, S1, S2 in cents); each output float is ONE fixed op chain
    # over exact inputs, identical on both engines.
    "WITH m AS (SELECT l_returnflag, "
    "  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w, "
    "  CAST(SUM(CAST(l_quantity AS BIGINT) * "
    "   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) "
    "   AS BIGINT) AS s1, "
    "  SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)) * "
    "   CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
    "    AS DECIMAL(38,0)) * "
    "   CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
    "    AS DECIMAL(38,0))) AS s2 "
    " FROM lineitem GROUP BY l_returnflag) "
    "SELECT l_returnflag, w AS total_qty, s1 AS price_qty_cents, "
    "printf('%.6f', ROUND(CAST(s1 AS DOUBLE) / (100 * w), 6)) AS wmean, "
    "printf('%.6f', ROUND((CAST(s2 * w - CAST(s1 AS DECIMAL(38,0)) * s1 "
    " AS DOUBLE) / CAST(CAST(w AS DECIMAL(38,0)) * w AS DOUBLE)) "
    " / 10000.0, 6)) AS wvar FROM m",
)
def agg_weighted_stats(spark, sf):
    """Weighted aggregate statistics: quantity-weighted mean and
    variance of the line price per returnflag — the pattern behind
    every volume-weighted metric (VWAP, weighted quality scores,
    exposure-weighted rates).

    Exactness: the three moments W=Σq, S1=Σq·c, S2=Σq·c² (c = exact
    price cents) are integers — S2 needs DECIMAL(38) headroom (c² is
    ~1e14 per row) — so the sums are order-independent; wmean =
    S1/(100·W) is one division; wvar = (S2·W − S1²)/W²/1e4 is one
    FIXED chain (decimal subtract exactly, then divide) spelled
    identically on both engines, under the ROUND+%.6f output rule.

    Scale shape: one scan, partial+final aggregate onto a 3-value
    key; the decimal moments cost one extra column of shuffle width —
    the price of exactness, paid in the partials, not in row count."""
    li = _t(spark, sf, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
        "long"
    )
    q = F.col("l_quantity").cast("long")
    m = li.select(
        "l_returnflag",
        q.alias("q"),
        cents.alias("c"),
    ).groupBy("l_returnflag").agg(
        F.sum("q").cast("long").alias("w"),
        F.sum(F.col("q") * F.col("c")).cast("long").alias("s1"),
        F.sum(
            F.col("q").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
            * F.col("c").cast("decimal(38,0)")
        ).alias("s2"),
    )
    fmt6 = lambda c_: F.format_string("%.6f", F.round(c_, 6))  # noqa: E731
    return m.select(
        "l_returnflag",
        F.col("w").alias("total_qty"),
        F.col("s1").alias("price_qty_cents"),
        fmt6(F.col("s1").cast("double") / (F.lit(100) * F.col("w"))).alias(
            "wmean"
        ),
        fmt6(
            (
                (
                    F.col("s2") * F.col("w")
                    - F.col("s1").cast("decimal(38,0)") * F.col("s1")
                ).cast("double")
                / (F.col("w").cast("decimal(38,0)") * F.col("w")).cast(
                    "double"
                )
            )
            / F.lit(10000.0)
        ).alias("wvar"),
    )


@register(
    "events_benford",
    # Benford first-digit forensics over order totals: leading digit of
    # the exact cents integer, count + share per digit.
    "WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) "
    " AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders "
    " WHERE o_totalprice > 0), "
    "t AS (SELECT COUNT(*) AS n FROM d) "
    "SELECT digit, COUNT(*) AS cnt, "
    "printf('%.6f', ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.n), 6)) AS frac "
    "FROM d, t GROUP BY digit",
)
def events_benford(spark, sf):
    """Benford's-law first-digit profile of order totals — the
    data-forensics screen for fabricated or truncated monetary data
    (natural multiplicative amounts put ~30.1% of leading digits at 1;
    a flat profile is a red flag). [K] Benford 1938 / Hill 1995.

    Exactness: the leading digit comes from the STRING of the exact
    cents BIGINT (never from log10 — no libm); the share is one
    division of exact counts under ROUND+%.6f.

    Scale shape: one scan, one 9-value hash aggregate, plus a one-row
    total broadcast back — at 100 TB this is a pure map-side profile
    exactly like corpus_stats."""
    return benford_rollup(digit_counts(_t(spark, sf, "orders")))


def digit_counts(orders: DataFrame) -> DataFrame:
    """Per-leading-digit count grain over order totals: a plain
    SUM-mergeable COUNT (at most 9 rows), which is what makes
    ``stream_benford`` == batch a theorem about SUM."""
    return (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def benford_rollup(dc: DataFrame) -> DataFrame:
    """Fold the 9-row digit-count grain into the Benford share table —
    the ONE shared definition for the batch key and its streaming
    twin (the %.6f share contract lives here)."""
    t = dc.agg(F.sum("cnt").alias("n"))
    return (
        dc.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "cnt",
            F.format_string(
                "%.6f",
                F.round(F.col("cnt").cast("double") / F.col("n"), 6),
            ).alias("frac"),
        )
    )


@register(
    "join_runtime_filtered",
    # Runtime Bloom-filter join pruning: semantically a plain join —
    # the injected might_contain() filter only PRUNES the probe scan.
    "SELECT l.l_orderkey, "
    "CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents, "
    "CAST(l.l_quantity AS BIGINT) AS quantity "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderpriority = '1-URGENT'",
)
def join_runtime_filtered(spark, sf):
    """Runtime-filter (Bloom) join pruning: for a shuffle join whose
    build side is selectively filtered, Spark injects a Bloom filter
    of the build keys as a ``might_contain`` predicate on the PROBE
    scan — rows that cannot join are dropped before the exchange. At
    100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~20% that survives the dim filter, for
    joins too large to broadcast (the broadcast threshold is disabled
    here precisely to model that regime).

    The conf overrides live only until the physical plan is
    materialized (forced below, then restored) — the plan, once built,
    keeps its runtime filter. Semantically transparent: the oracle is
    the plain join. The might_contain injection is plan-gated in
    pytest."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("totalprice_cents"),
            F.col("l_quantity").cast("long").alias("quantity"),
        )
        # materialize the physical plan NOW, under the overrides — the
        # QueryExecution caches it, so restoring the confs is safe
        df._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


@register(
    "sql_parameterized",
    # Named-parameter SQL + IDENTIFIER clause — same result as the
    # inlined query.
    "SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
    "FROM lineitem WHERE l_quantity > 45 GROUP BY l_returnflag",
)
def sql_parameterized(spark, sf):
    """Parameterized SQL: ``spark.sql(query, args={...})`` with named
    parameter markers and an ``IDENTIFIER(:tbl)`` clause for the table
    reference — the injection-safe templating surface every SQL
    front-end needs (values bind as literals, identifiers via the
    dedicated clause; string concatenation never happens).

    Scale shape: parameters bind at PARSE time, so the bound literal
    reaches Catalyst as a constant — the quantity predicate pushes
    into the parquet scan exactly as in the inlined spelling (same
    plan, same pushdown)."""
    _t(spark, sf, "lineitem").createOrReplaceTempView("rbs_param_lineitem")
    return spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM IDENTIFIER(:tbl) WHERE l_quantity > :min_qty "
        "GROUP BY l_returnflag",
        args={"tbl": "rbs_param_lineitem", "min_qty": 45},
    )


@register(
    "observe_metrics",
    # The observed query's RESULT is oracled; the observation side
    # channel is asserted in pytest.
    "SELECT l_returnflag, "
    "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) "
    " AS sum_price FROM lineitem GROUP BY l_returnflag",
)
def observe_metrics(spark, sf):
    """Observation metrics: ``df.observe(Observation, ...)`` attaches
    named aggregate metrics that are computed AS THE QUERY RUNS and
    delivered on the driver — zero extra passes, zero extra shuffles.
    This is the production-pipeline instrumentation surface (row
    counts, null rates, value bounds observed on the same scan that
    feeds the job) — at 100 TB a separate validation query would
    double the IO; observe() rides along free.

    The observe node is semantically transparent (the oracle pins the
    query result); pytest runs an action and asserts the observed
    row count and quantity sum equal the table's exact values."""
    from pyspark.sql import Observation

    obs = Observation("rbs_profile")
    # direct read, NOT the shared cached scan: observation delivery is
    # matched against the observed query's plan, and two same-named
    # observations attached to the SAME shared scan object (one from a
    # plan-only construction, one executing) deadlock the later .get
    df = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_price")
        )
    )
    # expose the Observation for callers/tests that want the metrics
    df.rbs_observation = obs  # type: ignore[attr-defined]
    return df


# --------------------------------------------------- SQL-surface family ----
# SQL:2023-era surface Spark 4.1 ships natively: recursive CTEs, SQL
# scalar/table UDFs, session variables, dynamic SQL. Session-scoped
# objects are namespaced rbs_* and CREATE OR REPLACE'd (idempotent per
# session); every key's oracle states the equivalent inlined query, so
# green rows prove the FEATURE produces the semantics it claims.


@register(
    "recursive_cte",
    # BFS over the event-type transition graph via WITH RECURSIVE —
    # both engines run a genuine recursive CTE (hop-bounded; min-hop
    # dedup AFTER the recursion).
    "WITH RECURSIVE edges AS (SELECT DISTINCT src, dst FROM ("
    "  SELECT event_type AS src, "
    "   LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "    AS dst FROM events) WHERE dst IS NOT NULL AND src <> dst), "
    "r(node, hop) AS ("
    "  SELECT CAST('view' AS VARCHAR), 0 "
    "  UNION ALL "
    "  SELECT e.dst, r.hop + 1 FROM r JOIN edges e ON e.src = r.node "
    "  WHERE r.hop < 3) "
    "SELECT node, CAST(MIN(hop) AS BIGINT) AS min_hop "
    "FROM r GROUP BY node",
)
def recursive_cte(spark, sf):
    """Recursive CTE (``WITH RECURSIVE``, SQL:2023 — native in Spark
    4.x): breadth-first reachability from the 'view' event type over
    the user-journey transition graph, hop-bounded, min-hop reduced
    after the recursion. THE declarative form for iterative graph
    queries — what kg_reach spells as fixed-iteration DataFrame joins,
    now expressed directly in SQL on BOTH engines (the oracle is the
    same recursive query in DuckDB).

    Scale shape: the recursion operates on the TYPE graph (a
    dimension-sized edge list derived by one user-keyed window over
    the fact), so each recursive step is a tiny join; the hop bound
    (< 3) caps the unrolling exactly like kg_reach's fixed frontier
    count. The one fact-scale cost is deriving the edges table — r6:
    it is localCheckpoint'ed OUTSIDE the recursive query, because the
    loop re-executes every non-materialized subtree it references per
    iteration (measured: 3 iterations re-ran the fact-scale window
    three times, 4.5 s -> ~1.2 s at sf1.0). The WITH RECURSIVE r loop
    itself is unchanged."""
    edges = spark.sql(
        """
        SELECT DISTINCT src, dst FROM (
           SELECT event_type AS src,
            LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS dst FROM {ev}) WHERE dst IS NOT NULL AND src <> dst
        """,
        ev=_t(spark, sf, "events"),
    ).localCheckpoint()
    return spark.sql(
        """
        WITH RECURSIVE r(node, hop) AS (
          SELECT CAST('view' AS STRING), 0
          UNION ALL
          SELECT e.dst, r.hop + 1 FROM r JOIN {edges} e ON e.src = r.node
          WHERE r.hop < 3)
        SELECT node, CAST(MIN(hop) AS BIGINT) AS min_hop
        FROM r GROUP BY node
        """,
        edges=edges,
    )


@register(
    "sql_scalar_udf",
    # The SQL UDF body inlined — a green row proves Spark's CREATE
    # FUNCTION evaluates to the declared semantics.
    "SELECT l_orderkey, l_linenumber, "
    "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    " (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net_price, "
    "CASE WHEN l_quantity >= 40 THEN 'XL' WHEN l_quantity >= 20 THEN 'L' "
    " ELSE 'S' END AS qty_band "
    "FROM lineitem WHERE l_returnflag = 'R'",
)
def sql_scalar_udf(spark, sf):
    """SQL scalar UDFs (``CREATE FUNCTION ... RETURNS ... RETURN
    expr``): reusable business logic declared ONCE in SQL and expanded
    by Catalyst at plan time — unlike Python UDFs these cost nothing
    (the body inlines into whole-stage codegen; pushdown and pruning
    see through it). The shareable-semantics layer every SQL warehouse
    team builds its metric definitions on.

    Two functions — exact-decimal net price and a quantity banding —
    are created (session-scoped, idempotent) and used in one query;
    the oracle inlines both bodies."""
    spark.sql(
        # round the exact DECIMAL (scale-4 products DO land on .xx50
        # ties; Spark's double round() goes through shortest-repr while
        # DuckDB rounds the binary value — rounding the decimal first
        # makes the tie exact and HALF_UP==half-away for positives)
        "CREATE OR REPLACE TEMPORARY FUNCTION rbs_net_price("
        "price DOUBLE, disc DOUBLE) RETURNS DOUBLE RETURN "
        "CAST(ROUND(CAST(price AS DECIMAL(18,2)) * "
        "(1 - CAST(disc AS DECIMAL(18,2))), 2) AS DOUBLE)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rbs_qty_band(q DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN q >= 40 THEN 'XL' "
        "WHEN q >= 20 THEN 'L' ELSE 'S' END"
    )
    _t(spark, sf, "lineitem").createOrReplaceTempView("rbs_sqludf_lineitem")
    return spark.sql(
        "SELECT l_orderkey, l_linenumber, "
        "rbs_net_price(l_extendedprice, l_discount) AS net_price, "
        "rbs_qty_band(l_quantity) AS qty_band "
        "FROM rbs_sqludf_lineitem WHERE l_returnflag = 'R'"
    )


@register(
    "sql_table_udf",
    # SQL table function LATERAL-applied per row — oracled via
    # generate_series unnest.
    "SELECT r_regionkey, CAST(i AS BIGINT) AS i FROM region, "
    "unnest(generate_series(1, r_regionkey + 1)) AS t(i)",
)
def sql_table_udf(spark, sf):
    """SQL table UDFs (``CREATE FUNCTION ... RETURNS TABLE(...)``):
    a declared table-valued function applied per row with LATERAL
    correlation — the SQL-native span/expansion primitive (calendar
    densification, bucket enumeration) without a Python UDTF. The body
    inlines like the scalar form, so the expansion stays in codegen as
    an explode.

    Scale shape: pure generator expansion — output rows = sum of
    per-row span lengths, no shuffle at all."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rbs_upto(n INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n)) AS i"
    )
    _t(spark, sf, "region").createOrReplaceTempView("rbs_tvf_region")
    return spark.sql(
        "SELECT r_regionkey, CAST(i AS BIGINT) AS i "
        "FROM rbs_tvf_region, LATERAL rbs_upto(r_regionkey + 1)"
    )


@register(
    "sql_session_variables",
    # DECLARE/SET VAR from a scalar subquery, then used as a
    # predicate — the oracle inlines the subquery.
    "SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) "
    " AS totalprice_cents FROM orders "
    "WHERE o_totalprice * 10 > (SELECT MAX(o_totalprice) FROM orders) * 9",
)
def sql_session_variables(spark, sf):
    """SQL session variables (``DECLARE VARIABLE`` / ``SET VAR``):
    compute a threshold once — here ``SET VAR`` evaluates a scalar
    subquery (90% of the max order total, in exact integer tenths) —
    and reuse it across statements without driver-side string
    splicing. The multi-statement scripting surface of a SQL
    warehouse, with the variable binding as a plan-time constant so
    the final filter still pushes down.

    Exactness: the threshold is compared as o_totalprice*10 >
    max*9 * ... spelled identically: the variable carries max_cents
    (exact BIGINT) and the predicate is integer algebra."""
    _t(spark, sf, "orders").createOrReplaceTempView("rbs_var_orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE rbs_max_cents BIGINT DEFAULT 0"
    )
    spark.sql(
        "SET VAR rbs_max_cents = (SELECT CAST(ROUND(MAX(o_totalprice) "
        "* 100) AS BIGINT) FROM rbs_var_orders)"
    )
    # o_totalprice*10 > max*9  <=>  cents*10 > max_cents*9 (exact ints)
    return spark.sql(
        "SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) "
        "AS totalprice_cents FROM rbs_var_orders "
        "WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10 "
        " > rbs_max_cents * 9"
    )


@register(
    "sql_execute_immediate",
    # Dynamic SQL with positional USING binding — oracle inlines.
    "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
    "WHERE l_quantity > 48 GROUP BY l_returnflag",
)
def sql_execute_immediate(spark, sf):
    """Dynamic SQL (``EXECUTE IMMEDIATE ... USING``): a query held as
    a STRING executed with safely-bound positional parameters — the
    stored-procedure-era surface (query text from a metadata table,
    parameters bound, never concatenated). Binding happens at parse
    time, so the bound constant pushes down like a literal.

    The inner statement is the sql_parameterized pattern one level
    up: this key pins that the indirection layer itself (string ->
    parse -> bind -> plan) preserves semantics, via the inlined
    oracle."""
    _t(spark, sf, "lineitem").createOrReplaceTempView("rbs_exec_lineitem")
    stmt = (
        "SELECT l_returnflag, COUNT(*) AS n FROM rbs_exec_lineitem "
        "WHERE l_quantity > ? GROUP BY l_returnflag"
    )
    return spark.sql("EXECUTE IMMEDIATE :stmt USING 48", args={"stmt": stmt})


@register(
    "sql_pipe_syntax",
    # The pipe-operator spelling must produce the identical relation as
    # the ANSI spelling — the oracle IS the ANSI form.
    "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
    "GROUP BY l_returnflag, l_linestatus",
)
def sql_pipe_syntax(spark, sf):
    """SQL pipe-operator syntax (``|>``, Spark 4 / GoogleSQL pipes): the
    linear FROM -> WHERE -> AGGREGATE spelling of a grouped report.
    Pipes are pure surface syntax — each stage parses onto the same
    logical operators as the nested ANSI form, so Catalyst sees one
    identical plan and the scan still receives the pushed shipdate
    filter (pytest-gated); the oracle pins semantic equivalence by
    running the ANSI spelling of the same query.

    Scale shape: identical to the ANSI form — filter pushed into the
    parquet scan, one partial+final aggregation on the two grouping
    columns."""
    _t(spark, sf, "lineitem").createOrReplaceTempView("rbs_pipe_lineitem")
    return spark.sql(
        "FROM rbs_pipe_lineitem "
        "|> WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n, "
        "   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        "   GROUP BY l_returnflag, l_linestatus"
    )


# ---------------------------------------------- final TPC-H macro pair ----
# Q12 and Q21 are the last two report shapes expressible on this schema
# (Q2/Q9/Q11/Q16/Q20 need partsupp). Both re-base lateness on
# shipdate-vs-orderdate exactly like macro_order_priority (the schema has
# no commit/receipt dates) and Q12's ship-mode grouping re-bases on
# l_returnflag (no l_shipmode column).


@register(
    "macro_shipmode_priority",
    # TPC-H Q12 shape: among one year's LATE lines (shipped >45 days
    # after ordering), per mode-class: how many belonged to
    # critical-priority orders vs not.
    "SELECT l_returnflag AS mode_class, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    " THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    " THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
    " AND l.l_shipdate < TIMESTAMP '1998-01-01' "
    " AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY "
    "GROUP BY l_returnflag",
)
def macro_shipmode_priority(spark, sf):
    """Shipping-mode-priority macro (TPC-H Q12 shape): did late
    shipments (>45 days after ordering, within one ship year) hit
    critical-priority orders — the conditional-pivot-after-join report,
    re-based on l_returnflag as the mode class (schema has no
    l_shipmode) and shipdate-vs-orderdate lateness (no receipt/commit
    dates; macro_order_priority precedent).

    Scale shape: the ship-year filter pushes into the lineitem scan
    (one year of the fact); ONE orderkey exchange joins it to orders;
    the lateness comparison is a non-equi residual on the joined row
    (exact integer-microsecond timestamp arithmetic on both engines);
    the conditional SUMs pivot in the same pass; output is 3 rows."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("mode_class"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "macro_waiting_suppliers",
    # TPC-H Q21 shape: suppliers of one nation whose line was late in a
    # finished multi-supplier order where NO other supplier was late —
    # the EXISTS + NOT-EXISTS double correlation. Top-20 by blame count.
    "WITH lo AS (SELECT l.l_orderkey, l.l_suppkey, "
    "  (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late "
    " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    " WHERE o.o_orderstatus = 'F') "
    "SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
    "FROM lo l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey "
    "WHERE s.s_nationkey = 5 AND l1.late "
    " AND EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey "
    "  AND l2.l_suppkey <> l1.l_suppkey) "
    " AND NOT EXISTS (SELECT 1 FROM lo l3 "
    "  WHERE l3.l_orderkey = l1.l_orderkey "
    "   AND l3.l_suppkey <> l1.l_suppkey AND l3.late) "
    "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20",
)
def macro_waiting_suppliers(spark, sf):
    """Suppliers-who-kept-orders-waiting macro (TPC-H Q21 shape): for
    one nation, the top-20 suppliers by how many finished multi-supplier
    orders they ALONE delayed — a semi join (some other supplier exists
    on the order) stacked on an anti join (no OTHER supplier was late)
    over the same derived fact. Lateness re-bases on
    shipdate-vs-orderdate (+60 days; macro_order_priority precedent).

    Scale shape: the status filter prunes orders before the ONE
    orderkey fact-fact exchange that derives (orderkey, suppkey, late);
    both correlations then reuse that orderkey partitioning — the semi
    and anti joins shuffle nothing new and short-circuit per match with
    zero row multiplication; the supplier dim broadcasts; the top-20 is
    TakeOrderedAndProject over a supplier-sized count table. The
    suppkey<>suppkey inequalities are residuals on the orderkey-equi
    joins, never shuffle keys."""
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    s = _t(spark, sf, "supplier").filter(F.col("s_nationkey") == 5).select(
        "s_suppkey", "s_name"
    )
    l1 = lo.filter(F.col("late")).join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    )
    l2 = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            l2,
            (l1["l_orderkey"] == F.col("k2"))
            & (l1["l_suppkey"] != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "scan_agg_pushdown",
    # MIN/MAX/COUNT answered from parquet footer statistics — the
    # oracle computes the same aggregates by scanning; values must be
    # identical (footer stats are exact for these aggregates).
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(MIN(o_orderkey) AS BIGINT) AS min_key, "
    "CAST(MAX(o_orderkey) AS BIGINT) AS max_key, "
    "ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 2) AS max_price "
    "FROM orders",
)
def scan_agg_pushdown(spark, sf):
    """Aggregate pushdown to parquet footer statistics: COUNT/MIN/MAX
    answered from row-group metadata without decoding a single data
    page — at 100 TB the difference between touching kilobytes of
    footers and scanning the table. Requires the DSv2 parquet reader
    (``useV1SourceList=''``) plus ``parquet.aggregatePushdown`` (note the lowercase "down" —
    the capital-D spelling is silently accepted and ignored); both
    confs are scoped to THIS plan's materialization and restored (the
    join_runtime_filtered pattern — the QueryExecution caches the
    executed plan, so restoring the session confs afterwards is safe).
    The physical scan carries ``PushedAggregation`` (pytest-gated);
    the oracle recomputes the same aggregates by scanning, and footer
    stats are exact for count/min/max so the values must match
    bit-for-bit.

    Scale shape: zero data pages read, one row returned per file ->
    one tiny final aggregate; this is the fastest possible spelling of
    a table-stats probe."""
    overrides = {
        "spark.sql.sources.useV1SourceList": "",
        "spark.sql.parquet.aggregatePushdown": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # direct read, NOT the shared cached scan: the DSv2-vs-v1 source
        # choice is captured when spark.read runs, so this key must
        # build its relation UNDER the scoped confs
        df = spark.read.parquet(f"{sf}/orders.parquet").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.round(F.max("o_totalprice").cast("double"), 2).alias(
                "max_price"
            ),
        )
        df._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


@register(
    "sql_group_by_all",
    # GROUP BY ALL (Spark 3.4+ / DuckDB native): every non-aggregate
    # select item becomes a grouping key — the ergonomic SQL-surface
    # twin of agg_hash, exercised through spark.sql so the PARSER
    # feature itself is what's under test.
    "SELECT o_orderstatus, o_orderpriority, "
    "CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
    "FROM orders GROUP BY ALL",
)
def sql_group_by_all(spark, sf):
    """GROUP BY ALL — the modern-SQL ergonomic surface (every
    non-aggregate select item is inferred as a grouping key), run
    through ``spark.sql`` so the parser feature itself is exercised,
    not a DataFrame translation. Semantically identical to the
    explicit grouping (both engines document the same inference rule),
    so the oracle is the same statement. Exact-cents sum keeps the
    aggregate integer.

    Scale shape: one map-side-combinable hash aggregate over a
    status x priority domain — the agg_hash shape."""
    orders = _t(spark, sf, "orders")
    orders.createOrReplaceTempView("rbs_gba_orders")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents FROM rbs_gba_orders GROUP BY ALL"
    )


@register(
    "fn_luhn",
    # Spark's builtin luhn_check vs the HANDWRITTEN Luhn definition in
    # SQL (reversed digits, double every second, subtract 9 above 9,
    # checksum mod 10) — builtin-vs-definition is itself the
    # cross-check; all-integer arithmetic on both engines.
    "SELECT s AS card, "
    "list_sum(list_transform(generate_series(1, LEN(s)), i -> "
    " CASE WHEN i % 2 = 0 THEN "
    "  CASE WHEN 2 * CAST(substr(reverse(s), i, 1) AS BIGINT) > 9 "
    "   THEN 2 * CAST(substr(reverse(s), i, 1) AS BIGINT) - 9 "
    "   ELSE 2 * CAST(substr(reverse(s), i, 1) AS BIGINT) END "
    "  ELSE CAST(substr(reverse(s), i, 1) AS BIGINT) END)) % 10 = 0 "
    " AS luhn_ok "
    "FROM (SELECT CAST(o_orderkey * 7 + 1 AS VARCHAR) AS s FROM orders) t",
)
def fn_luhn(spark, sf):
    """Luhn checksum validation (``luhn_check``, Spark 4) over
    synthetic numeric strings — the credit-card/IMEI checksum a PII
    scrubber runs to decide whether a digit run is a REAL card number
    (``pii_scrub``'s regex finds candidates; Luhn separates live
    numbers from random digits). The oracle does not call a builtin:
    it implements the DEFINITION (reverse, double every second digit,
    subtract 9 above 9, sum mod 10) in portable SQL — so a green row
    cross-checks Spark's builtin against the spec itself, the
    strongest oracle shape available for a scalar function.

    All-integer arithmetic; zero shuffles — pure whole-stage-codegen
    scalar work over the fact scan."""
    o = _t(spark, sf, "orders")
    return o.select(
        (F.col("o_orderkey") * 7 + 1).cast("string").alias("card")
    ).select(
        "card", F.expr("luhn_check(card)").alias("luhn_ok")
    )


@register(
    "agg_grouping_id",
    # grouping_id() over GROUPING SETS: the bitmask that tells report
    # consumers WHICH level produced each row — Spark's grouping_id()
    # and DuckDB's GROUPING() both emit (bit i set = column i is
    # aggregated away), same bit order as the column list.
    "SELECT o_orderstatus, o_orderpriority, "
    "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), "
    "(o_orderstatus), ())",
)
def agg_grouping_id(spark, sf):
    """``grouping_id()`` over GROUPING SETS — the level-disambiguation
    bitmask every rollup-consuming report needs (a NULL status cell is
    ambiguous: real NULL or subtotal? the bitmask answers), completing
    the multi-level aggregate family next to ``agg_rollup`` /
    ``agg_cube`` / ``agg_grouping_sets``. Both engines define the same
    bit order (bit i set = i-th listed column aggregated away), so the
    values match exactly.

    Scale shape: one Expand + hash aggregate — the agg_grouping_sets
    plan with one extra integer column."""
    orders = _t(spark, sf, "orders")
    orders.createOrReplaceTempView("rbs_gid_orders")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM rbs_gid_orders "
        "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), "
        "(o_orderstatus), ())"
    )


@register(
    "fn_soundex",
    # Spark's builtin soundex() vs the HANDWRITTEN American-Soundex
    # definition in SQL (letter -> code map, adjacent-duplicate merge,
    # H/W transparency, vowel reset, 3-digit zero pad) — the fn_luhn
    # builtin-vs-definition oracle shape; the fold carries
    # (last-code || emitted-digits) as a single VARCHAR accumulator so
    # list_reduce stays element-typed.
    "WITH w AS (SELECT DISTINCT word FROM (SELECT "
    " unnest(string_split(text, ' ')) AS word FROM documents) u "
    " WHERE word <> ''), "
    "m AS (SELECT word, upper(word[1]) AS head, "
    " list_transform(list_filter(string_split_regex(word, ''), "
    "  c -> c <> ''), c -> CASE "
    "  WHEN c IN ('b','f','p','v') THEN '1' "
    "  WHEN c IN ('c','g','j','k','q','s','x','z') THEN '2' "
    "  WHEN c IN ('d','t') THEN '3' "
    "  WHEN c = 'l' THEN '4' "
    "  WHEN c IN ('m','n') THEN '5' "
    "  WHEN c = 'r' THEN '6' "
    "  WHEN c IN ('h','w') THEN '7' "
    "  ELSE '0' END) AS codes FROM m0), "
    "f AS (SELECT word, head, "
    " list_reduce(list_prepend(codes[1], codes[2:]), (acc, c) -> "
    "  (CASE WHEN c = '7' THEN acc[1] WHEN c = '0' THEN '0' "
    "   ELSE c END) || "
    "  (CASE WHEN c IN ('1','2','3','4','5','6') AND c <> acc[1] "
    "   THEN substr(acc, 2) || c ELSE substr(acc, 2) END)) AS st "
    " FROM m) "
    "SELECT word, head || substr(substr(st, 2) || '000', 1, 3) AS code "
    "FROM f".replace("FROM m0", "FROM w"),
)
def fn_soundex(spark, sf):
    """``soundex()`` phonetic coding over the corpus vocabulary — the
    classic fuzzy-name blocking key (``join_fuzzy_name`` blocks on
    MinHash; Soundex is the century-old alternative every MDM system
    still ships, and the code makes a cheap second blocking pass). The
    oracle does not call a builtin (DuckDB has none): it implements
    the DEFINITION — first letter + consonant codes with
    adjacent-duplicate merging, H/W transparency (coded consonants
    separated only by h/w merge), vowel reset, zero-padded to three
    digits — as a portable string fold, so a green row cross-checks
    Spark's builtin against the American-Soundex spec itself (probed:
    ashcraft->A261, tymczak->T522, pfister->P236, honeyman->H555 all
    agree). Contract scope: the corpus's lowercase [a-z]+ vocabulary
    (mixed-case/non-alpha handling is builtin-specific and out of
    scope).

    Scale shape: explode to words, ONE distinct onto the bounded
    vocabulary, scalar codegen per distinct word — the bpe_encode
    distinct-word-grain discipline (fact-scale work is the split; the
    string fold runs once per vocabulary entry, not per token)."""
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .select("word", F.soundex("word").alias("code"))
    )


@register(
    "agg_boolean",
    # Boolean aggregate family: bool_and / bool_or / count_if — the
    # every/any/conditional-count trio. All-integer/boolean exact.
    "SELECT o_orderpriority, "
    "bool_and(o_totalprice > 1000) AS all_over_1k, "
    "bool_or(o_totalprice > 100000) AS any_over_100k, "
    "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_finished, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY o_orderpriority",
)
def agg_boolean(spark, sf):
    """Boolean aggregates — ``bool_and`` / ``bool_or`` / ``count_if``,
    the every/any/conditional-count trio data-quality assertions are
    written in (``bool_and(price > 0)`` IS the assertion; the DataFrame
    surface every dbt-style test compiles to). Spark's count_if is
    exercised on the engine side; the oracle spells it SUM(CASE) so the
    cross-check is definitional rather than builtin-vs-builtin.

    All boolean/integer exact — no floats; one map-side-combinable hash
    aggregate onto the priority domain (the agg_hash shape)."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 100000).alias("any_over_100k"),
        F.count_if(F.col("o_orderstatus") == "F")
        .cast("long")
        .alias("n_finished"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "scan_row_index",
    # _metadata.row_index file-position attribution: the engine reports
    # each row's physical index inside its parquet file; the oracle
    # re-derives it from the FIXTURE CONTRACT that the generator wrote
    # documents in doc_id order into a single file (scan_metadata's
    # attribution discipline — the oracle states what the layout must
    # be, the engine proves the metadata column agrees).
    "WITH r AS (SELECT doc_id, "
    "CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_index, "
    "'documents.parquet' AS file_name FROM documents) "
    "SELECT doc_id, row_index, file_name FROM r WHERE doc_id % 50 = 0",
)
def scan_row_index(spark, sf):
    """``_metadata.row_index`` — the hidden file-position column
    (Spark 3.5+ parquet metadata surface) that makes every row
    physically addressable without an explicit key: the primitive
    behind row-level lineage, sampled re-reads, and error-report
    pointers ('file X row 12345'). Completes the _metadata family next
    to ``scan_metadata``'s file_name rollup.

    Oracle contract: the driver generator writes each table in key
    order into a single parquet file, so row_index must equal the
    doc_id rank (ROW_NUMBER - 1) and file_name the fixture constant —
    the engine side reads BOTH from the real metadata struct, so a
    green row proves the physical attribution, not just the
    arithmetic. The doc_id % 50 filter keeps the checked slice lean.

    Scale shape: a pruned scan plus a generated metadata column — zero
    shuffles on the engine side (the oracle's global window is
    oracle-only; Spark never sorts)."""
    from ..caching import cached_scan

    d = cached_scan(spark, f"{sf}/documents.parquet")
    return (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(
            "doc_id",
            F.col("_metadata.row_index").cast("long").alias("row_index"),
            F.col("_metadata.file_name").alias("file_name"),
        )
    )


@register(
    "sql_order_by_all",
    # ORDER BY ALL — the modern-SQL companion of GROUP BY ALL (sort by
    # every select item left-to-right); with a LIMIT on top, the two
    # engines must agree on the TOTAL order, not just the set, so a
    # green row pins the ordering semantics themselves.
    "SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM orders GROUP BY ALL ORDER BY ALL LIMIT 5",
)
def sql_order_by_all(spark, sf):
    """ORDER BY ALL through ``spark.sql`` — the parser feature itself
    is under test (the sql_group_by_all discipline): every select item
    becomes a sort key left-to-right, and the LIMIT 5 on top makes the
    check ORDER-SENSITIVE — the surviving rows only match if both
    engines implement the same total order over (status, priority, n),
    which is the strongest cheap pin of an ordering surface.

    All-integer/string exact; one hash aggregate over the tiny
    status x priority domain plus a TakeOrderedAndProject."""
    orders = _t(spark, sf, "orders")
    orders.createOrReplaceTempView("rbs_oba_orders")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM rbs_oba_orders GROUP BY ALL ORDER BY ALL LIMIT 5"
    )


@register(
    "fn_width_bucket",
    # Spark's builtin width_bucket vs the HANDWRITTEN definition (the
    # fn_luhn builtin-vs-definition oracle shape — DuckDB has no such
    # builtin): equal-width histogram over DYADIC bounds [0, 2^26) in
    # 8 buckets of width 2^23, so v/width is an exact dyadic division
    # and the floor decides identically no matter how either engine
    # associates the arithmetic; v >= hi lands in the overflow
    # bucket n+1 (probed).
    "SELECT CASE WHEN cents >= 67108864 THEN 9 "
    " ELSE CAST(FLOOR(cents / 8388608.0) AS BIGINT) + 1 END AS bucket, "
    "CAST(COUNT(*) AS BIGINT) AS n "
    "FROM (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents "
    " FROM orders) t GROUP BY 1",
)
def fn_width_bucket(spark, sf):
    """``width_bucket`` equal-width histogramming — the SQL-standard
    binning primitive behind every price-band report (``agg_histogram``
    pins Spark's own histogram aggregate; this pins the SCALAR binning
    function users compose into GROUP BYs). The oracle does not call a
    builtin (DuckDB has none): it implements the DEFINITION —
    floor((v - lo)/width) + 1 with overflow to n+1 — so a green row
    cross-checks Spark's builtin against the spec itself.

    Float discipline: amounts bin to exact integer cents; the bounds
    are DYADIC ([0, 2^26), 8 buckets of 2^23), so v/width is an EXACT
    dyadic division for every integer v and the floor decides
    identically regardless of each engine's internal op order — the
    whole class of width_bucket boundary disagreements is sidestepped
    by bound choice (probed: hi lands in bucket 9 on both).

    Scale shape: pure scalar codegen over the fact scan + one
    map-side-combinable hash aggregate onto the 9-bucket domain."""
    o = _t(spark, sf, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
        )
        .select(
            F.width_bucket(
                F.col("cents").cast("double"),
                F.lit(0.0),
                F.lit(67108864.0),
                F.lit(8),
            )
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "fn_sentences",
    # Spark's sentences() locale tokenizer vs the DEFINITION on this
    # corpus (single punctuation-free lowercase-ASCII sentences): the
    # result must be exactly [string_split(text, ' ')] — a
    # builtin-vs-definition check scoped to the fixture contract.
    "SELECT doc_id, CAST(1 AS BIGINT) AS n_sentences, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words_first, "
    "string_split(text, ' ')[1] AS first_word, "
    "string_split(text, ' ')[-1] AS last_word "
    "FROM documents WHERE doc_id % 25 = 0",
)
def fn_sentences(spark, sf):
    """``sentences()`` — Spark's locale-aware sentence/word tokenizer
    (the BreakIterator surface used before handing text to an NLP
    pipeline; this engine's own ``sentence_break`` is span-preserving,
    while sentences() is the lossy builtin users reach for first). On
    this corpus's punctuation-free lowercase-ASCII documents the spec
    collapses to exactly one sentence of whitespace words, so the
    oracle states the DEFINITION ([string_split]) and a green row
    proves the builtin agrees — scoped, documented contract (locale
    pathologies are out of fixture scope).

    Zero shuffles — pure scalar codegen over a pruned sampled scan."""
    d = _t(spark, sf, "documents")
    sents = F.sentences(F.col("text"))
    first = F.element_at(sents, 1)
    return d.filter(F.col("doc_id") % 25 == 0).select(
        "doc_id",
        F.size(sents).cast("long").alias("n_sentences"),
        F.size(first).cast("long").alias("n_words_first"),
        F.element_at(first, 1).alias("first_word"),
        F.element_at(first, -1).alias("last_word"),
    )


@register(
    "fn_aes_roundtrip",
    # AES round-trip identity + PKCS7 ciphertext-length law: DuckDB has
    # no AES builtins, so the oracle pins the two things it CAN state —
    # decrypt(encrypt(x)) == x and |cipher| == 16*(|plain|/16 + 1)
    # (PKCS7 always pads, so a full block is appended on block-aligned
    # input). The definitional-oracle shape of fn_luhn: Spark computes
    # the primitive, SQL states the law it must satisfy.
    "SELECT p_partkey, p_name AS roundtrip, "
    "CAST(16 * (octet_length(encode(p_name)) // 16 + 1) AS BIGINT) "
    " AS cipher_len FROM part",
)
def fn_aes_roundtrip(spark, sf):
    """AES-128 encrypt/decrypt round trip (ECB + PKCS padding) — the
    column-encryption primitive a privacy-preserving pipeline applies
    to PII columns at rest (the crypto sibling of ``fn_mask``'s
    redaction and ``pii_scrub``'s detection). ECB with a fixed data key
    is the DETERMINISTIC mode — the only one whose ciphertext is
    reproducible run-to-run (GCM salts a random IV per call), which is
    what makes the key testable and what deterministic-tokenization
    schemes use; the trade (equal plaintexts leak equality) is exactly
    what a join-preserving encrypted column wants.

    The oracle pins the round-trip identity and the PKCS7 length law
    (cipher bytes = 16·(⌊plain/16⌋ + 1)); no float contract.

    Scale shape: projection inside whole-stage codegen — two JVM
    crypto calls per row, linear in scanned bytes; the scan rides a
    fan_out rebalance (one-row-group test file)."""
    p = fan_out(_t(spark, sf, "part"), "p_partkey")
    key = F.lit("0123456789abcdef").cast("binary")
    enc = F.aes_encrypt(
        F.col("p_name").cast("binary"), key, F.lit("ECB"), F.lit("PKCS")
    )
    return p.select(
        "p_partkey",
        F.aes_decrypt(enc, key, F.lit("ECB"), F.lit("PKCS"))
        .cast("string")
        .alias("roundtrip"),
        F.octet_length(enc).cast("long").alias("cipher_len"),
    )


# --- KMV distinct sketch -----------------------------------------------

_KMV_K = 64
_KMV_SCALE = 1 << 60  # md5 15-hex-char prefix domain: 16^15 = 2^60


def _hex15_to_int_sql(expr: str) -> str:
    """Exact integer value of the first 15 hex chars of an md5 column —
    the engine-portable instr-fold (the _cms_bucket_sql idiom widened
    to 60 bits; the total stays < 2^60 so every term is an exact
    BIGINT)."""
    terms = " + ".join(
        f"CAST(instr('{_CMS_HEX}', substr({expr}, {i + 1}, 1)) - 1 "
        f"AS BIGINT) * CAST({16 ** (14 - i)} AS BIGINT)"
        for i in range(15)
    )
    return f"({terms})"


def _hex15_to_int_col(col):
    # the digit MUST be cast to long before the multiply: for positions
    # where 16^(14-i) fits int32 the literal types as INT and an
    # INT*INT product digit*16^7 >= 2^31 overflows at runtime (ANSI
    # arithmetic error — caught by dataset_fingerprint, latent in the
    # original sketch_kmv spelling which only saw small digits there)
    out = None
    for i in range(15):
        d = (
            (F.instr(F.lit(_CMS_HEX), F.substring(col, i + 1, 1)) - 1)
            .cast("long")
            * F.lit(16 ** (14 - i)).cast("long")
        )
        out = d if out is None else out + d
    return out.cast("long")


@register(
    "sketch_kmv",
    # Same-value oracle (the sketch_cms discipline): the KMV sketch is
    # deterministic given the hash, so DuckDB rebuilds the exact k
    # smallest hashes per group and the exact estimate — fixed-length
    # md5 hex sorts lexicographically == numerically, so the rank
    # selection runs on strings and only the single k-th value per
    # group is folded to an integer.
    "WITH du AS (SELECT DISTINCT event_type, user_id FROM events), "
    "h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM du), "
    f"sk AS (SELECT event_type, h, ROW_NUMBER() OVER "
    f"(PARTITION BY event_type ORDER BY h) AS rn FROM h QUALIFY rn <= {_KMV_K}), "
    "a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_in_sketch, "
    " MAX(h) AS hk FROM sk GROUP BY event_type), "
    "x AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact "
    " FROM du GROUP BY event_type) "
    "SELECT a.event_type, n_exact, n_in_sketch, "
    f"printf('%.6f', ROUND(CASE WHEN n_in_sketch < {_KMV_K} "
    f"THEN CAST(n_in_sketch AS DOUBLE) "
    f"ELSE CAST({_KMV_K - 1} AS DOUBLE) * CAST({_KMV_SCALE} AS DOUBLE) "
    f" / CAST({_hex15_to_int_sql('hk')} AS DOUBLE) END, 6)) AS kmv_estimate "
    "FROM a JOIN x ON x.event_type = a.event_type",
)
def sketch_kmv(spark, sf):
    """K-minimum-values distinct sketch per event type — the fourth
    mergeable sketch beside CMS (frequency), HLL (distinct, opaque
    binary) and Bloom (membership): keep the k smallest hash values
    per group; if the sketch is full, estimate distinct = (k-1) /
    h_(k) with h_(k) the k-th smallest hash as a fraction of the hash
    domain. KMV's merge IS min-k of the union (min-k of min-ks), so
    per-partition / per-day sketches re-aggregate exactly — the
    re-aggregatable-rollup property the sketch family exists for, here
    with the estimate itself queryable in SQL (unlike hll_sketch_agg's
    binary). The underfull branch (sketch holds every member) and the
    estimating branch are BOTH exercised: sf0.001 has 15 users < k,
    sf0.01 has 150 >= k.

    Float discipline: md5 hex is compared as fixed-length strings
    (lexicographic == numeric), only the single k-th hash per group is
    folded to an exact BIGINT via the instr chain (< 2^60), and the
    estimate is one exact product and ONE IEEE division under
    ROUND + %.6f — identical text both engines.

    Scale shape: the corpus-scale work is the distinct (type, user)
    aggregation; the rank <= k filter compiles to WindowGroupLimit, so
    every partition pre-truncates to its local k smallest before the
    single bounded shuffle — the distributed min-k merge for free."""
    h = kmv_hashes(_t(spark, sf, "events"))
    return kmv_rollup(kmv_sketch(h), h)


def kmv_hashes(df: DataFrame) -> DataFrame:
    """Distinct (event_type, h) member hashes — the shared KMV input
    grain (a DISTINCT set, so it is exactly set-union mergeable across
    micro-batches; ``stream_kmv`` carries it only as the witness that
    reproduces the batch key's n_exact column)."""
    return (
        df.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type",
            F.md5(F.col("user_id").cast("string")).alias("h"),
        )
    )


def kmv_sketch(h: DataFrame) -> DataFrame:
    """The k smallest hashes per group — the KMV sketch state proper
    (O(groups x k) rows). min-k is ASSOCIATIVE: min-k of a union ==
    min-k of per-part min-ks, so re-applying this to (carried state
    UNION batch sketch) is the exact streaming merge."""
    w = Window.partitionBy("event_type").orderBy("h")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )


def kmv_rollup(sk: DataFrame, h: DataFrame) -> DataFrame:
    """Fold the sketch state (+ the exact-count witness) into the
    per-type readout — shared by ``sketch_kmv`` and its streaming twin
    (the estimate derives from the SKETCH alone; the witness only
    reproduces n_exact)."""
    a = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        F.max("h").alias("hk"),
    )
    x = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    est = F.when(
        F.col("n_in_sketch") < _KMV_K,
        F.col("n_in_sketch").cast("double"),
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        * F.lit(float(_KMV_SCALE))
        / _hex15_to_int_col(F.col("hk")).cast("double")
    )
    return a.join(x, "event_type").select(
        "event_type",
        "n_exact",
        "n_in_sketch",
        F.format_string("%.6f", F.round(est, 6)).alias("kmv_estimate"),
    )


@register(
    "fn_interval",
    # Calendar-interval family: month addition with end-of-month
    # clamping, last_day, day-of-year/quarter extraction, and a
    # day-time interval shift — all calendar-exact integer arithmetic
    # (parity probed: 1996-11-30 + 3mo = 1997-02-28 and Jan-31 + 1mo =
    # Feb-29 clamp identically on both engines); timestamps emitted as
    # formatted strings per the repo float/timestamp rule.
    "SELECT o_orderkey, "
    "STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo, "
    "STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS mo_last, "
    "CAST(dayofyear(o_orderdate) AS BIGINT) AS doy, "
    "CAST(quarter(o_orderdate) AS BIGINT) AS qtr, "
    "STRFTIME(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') "
    " AS plus36h "
    "FROM orders",
)
def fn_interval(spark, sf):
    """Calendar INTERVAL arithmetic family — the year-month and
    day-time interval surface ``fn_date`` leaves open (fn_date covers
    extraction, trunc and day addition; this key pins month addition
    with its end-of-month CLAMP, last_day, day-of-year/quarter, and a
    sub-day interval shift). Month clamping is the classic
    cross-engine divergence trap; the probe pinned both engines to the
    same rule (Nov-30 + 3mo = Feb-28, Jan-31 + 1mo = Feb-29).

    All calendar-exact integer arithmetic — no floats anywhere;
    timestamps emitted as formatted strings per the repo rule (DuckDB
    returns datetime64 otherwise).

    Scale shape: a zero-shuffle projection — pruned scan in, one
    codegen stage out."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(
            F.add_months(F.col("o_orderdate").cast("date"), 3),
            "yyyy-MM-dd",
        ).alias("plus3mo"),
        F.date_format(
            F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd"
        ).alias("mo_last"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(
            F.col("o_orderdate").cast("timestamp")
            + F.expr("INTERVAL 36 HOURS"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("plus36h"),
    )


# --- join-hint binding ---------------------------------------------------

_HINT_STRATEGIES = (
    ("broadcast", "BROADCAST(c)"),
    ("merge", "MERGE(c)"),
    ("shuffle_hash", "SHUFFLE_HASH(c)"),
)


def _hint_branch(spark, sf, tag: str, hint: str) -> DataFrame:
    """One hinted spelling of the orders-customer join rollup — shared
    by the key and the per-strategy plan gate (which asserts each hint
    BOUND to its physical operator)."""
    _t(spark, sf, "orders").createOrReplaceTempView("rbs_hint_orders")
    _t(spark, sf, "customer").createOrReplaceTempView("rbs_hint_cust")
    return spark.sql(
        f"SELECT /*+ {hint} */ '{tag}' AS strategy, "
        "o.o_orderstatus AS status, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM rbs_hint_orders o JOIN rbs_hint_cust c "
        "ON o.o_custkey = c.c_custkey "
        "GROUP BY o.o_orderstatus"
    )


@register(
    "sql_hints",
    # The three hinted spellings MUST agree with the unhinted relation
    # — the oracle states the same rollup once per strategy tag. Hint
    # BINDING (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin in
    # the respective physical plans) is pytest-gated.
    "WITH j AS (SELECT o.o_orderstatus AS status, "
    " CAST(COUNT(*) AS BIGINT) AS n_orders "
    " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    " GROUP BY o.o_orderstatus) "
    "SELECT 'broadcast' AS strategy, status, n_orders FROM j "
    "UNION ALL SELECT 'merge', status, n_orders FROM j "
    "UNION ALL SELECT 'shuffle_hash', status, n_orders FROM j",
)
def sql_hints(spark, sf):
    """Join-strategy hint surface: the SAME orders-customer rollup
    spelled under ``/*+ BROADCAST */``, ``/*+ MERGE */`` and
    ``/*+ SHUFFLE_HASH */`` — the escape hatch a user reaches for when
    statistics mislead the optimizer at 100 TB (a fact-fact join
    mis-planned as broadcast, or a skew-safe SMJ forced over a hash
    join). Results must be strategy-invariant (the oracle pins all
    three to the unhinted relation); pytest asserts each hint actually
    BOUND — BroadcastHashJoin, SortMergeJoin, and ShuffledHashJoin
    respectively appear in the three physical plans, which is the
    point of the key: hints that silently fall back are worse than no
    hints.

    Scale shape: three independent one-shuffle rollups; the hint only
    moves WHERE the join's exchange happens (broadcast: none on the
    probe side; merge: sort both; shuffle_hash: partition both, no
    sort)."""
    branches = [
        _hint_branch(spark, sf, tag, hint)
        for tag, hint in _HINT_STRATEGIES
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


@register(
    "sql_unpivot",
    # The UNPIVOT parser surface; the oracle states the expected long
    # form directly (semantics, not syntax, is what DuckDB pins).
    "WITH w AS (SELECT "
    " CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_open, "
    " CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_filled, "
    " CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_partial FROM orders) "
    "SELECT 'open' AS status, n_open AS n FROM w "
    "UNION ALL SELECT 'filled', n_filled FROM w "
    "UNION ALL SELECT 'partial', n_partial FROM w",
)
def sql_unpivot(spark, sf):
    """SQL ``UNPIVOT`` clause — the parser-level wide-to-long surface
    next to the DataFrame ``unpivot`` key (same relational algebra,
    different entry point: this one must survive the SQL parser, name
    mapping via ``IN (... AS 'label')`` included). The wide row is a
    per-status count profile of orders; the oracle states the expected
    long form with plain conditional aggregation, so a green row pins
    the clause's semantics rather than echoing its syntax.

    Scale shape: one partial+final aggregation to a single wide row,
    then a 3-row generator expansion — the unpivot itself is
    dimension-sized regardless of corpus scale."""
    _t(spark, sf, "orders").createOrReplaceTempView("rbs_unpivot_orders")
    return spark.sql(
        "SELECT status, n FROM ("
        " SELECT"
        "  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)"
        "   AS BIGINT) AS n_open,"
        "  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
        "   AS BIGINT) AS n_filled,"
        "  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)"
        "   AS BIGINT) AS n_partial"
        " FROM rbs_unpivot_orders) w "
        "UNPIVOT (n FOR status IN ("
        " n_open AS `open`, n_filled AS `filled`, n_partial AS `partial`))"
    )


def _stage_nested(sf: str) -> str:
    """Documents re-staged with a STRUCT column meta = {lang, source,
    n_chars} beside the text — the nested-schema shape multimodal /
    provenance tables actually have. Staged with pyarrow directly;
    deterministic."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = _layout_dir(sf, "nested")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        t = pq.read_table(f"{sf}/documents.parquet")
        meta = pa.StructArray.from_arrays(
            [t["lang"].combine_chunks(), t["source"].combine_chunks(),
             t["n_chars"].combine_chunks()],
            names=["lang", "source", "n_chars"],
        )
        nested = pa.Table.from_arrays(
            [t["doc_id"].combine_chunks(), meta, t["text"].combine_chunks()],
            names=["doc_id", "meta", "text"],
        )
        os.makedirs(out, exist_ok=True)
        pq.write_table(nested, os.path.join(out, "docs_nested.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return out


@register(
    "scan_nested_prune",
    # Stated from the flat documents view — the staged struct file is
    # a deterministic re-shape of the same rows.
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs "
    "FROM documents GROUP BY lang",
)
def scan_nested_prune(spark, sf):
    """Nested-schema projection pruning: read a table whose metadata
    lives in a STRUCT column and aggregate on ONE nested field — the
    scan must prune to ``meta.lang`` alone (pytest-gated on
    ReadSchema: neither the sibling struct fields nor the wide text
    column may be read). This is the column-pruning guarantee extended
    INTO nested types — the difference between reading bytes
    proportional to one subfield vs deserializing every struct, which
    at 100 TB of provenance-annotated documents is the whole game.

    Scale shape: a pruned columnar scan + one partial+final
    aggregation on the bounded lang domain."""
    path = _stage_nested(sf)
    d = spark.read.parquet(path)
    return d.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# --- interval-overlap join ------------------------------------------------

_SESSIONS_SQL = (
    "SELECT user_id, session_id, "
    " CAST(epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS BIGINT) AS st, "
    " CAST(epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS BIGINT) AS en FROM ("
    " SELECT user_id, ts, SUM(is_new) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM ("
    "  SELECT user_id, ts, event_id, CASE WHEN ts - LAG(ts) OVER ("
    "   PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 30 MINUTE"
    "   THEN 0 ELSE 1 END AS is_new FROM events)) "
    "GROUP BY user_id, session_id"
)


# Interval-overlap bucket width (µs). The candidate volume of the
# bucketed overlap join is minimized when the width is near the mean
# interval duration (see join_interval_overlap); 2 minutes fits the
# 30-min-gap sessionization on this surface (mean session ~42 s) and is
# env-overridable for corpora with very different session lengths.
_OVERLAP_BUCKET_US = int(
    os.environ.get("RBS_OVERLAP_BUCKET_US", str(120 * 1_000_000))
)


def _session_spans(spark, sf) -> DataFrame:
    """Per-(user, session) activity spans as exact epoch-microsecond
    integers — the win_session_batch gaps-and-islands sessions reduced
    to [st, en] intervals (the shared input of
    ``join_interval_overlap``). ts is cast to TIMESTAMP first
    (TIMESTAMP_NTZ has no unix_micros — the events_attribution
    pitfall)."""
    e = _t(spark, sf, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_new = F.when(
        F.col("ts").cast("timestamp").cast("long")
        - F.lag(F.col("ts").cast("timestamp").cast("long")).over(wl)
        <= 1800,
        0,
    ).otherwise(1)
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        gap_new.alias("is_new"),
    ).select(
        "user_id",
        "ts",
        F.sum("is_new").over(wc).alias("session_id"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min(F.col("ts").cast("timestamp")))
        .cast("long")
        .alias("st"),
        F.unix_micros(F.max(F.col("ts").cast("timestamp")))
        .cast("long")
        .alias("en"),
    )


@register(
    "join_interval_overlap",
    # The oracle takes the definition literally: a direct non-equi
    # self-join on interval intersection (DuckDB plans it as an
    # IEJoin). The Spark side buckets by hour first — content must be
    # identical.
    f"WITH s AS ({_SESSIONS_SQL}) "
    "SELECT a.user_id AS user_a, CAST(a.session_id AS BIGINT) AS session_a, "
    "b.user_id AS user_b, CAST(b.session_id AS BIGINT) AS session_b, "
    "CAST(LEAST(a.en, b.en) - GREATEST(a.st, b.st) AS BIGINT) AS overlap_us "
    "FROM s a JOIN s b ON a.st <= b.en AND b.st <= a.en "
    "AND a.user_id < b.user_id",
)
def join_interval_overlap(spark, sf):
    """Interval-overlap join: every pair of concurrent sessions across
    different users — the join class behind co-presence, contention
    and concurrency analyses that neither equi- nor range-join keys
    cover (``join_range`` is point-in-interval; this is
    interval-x-interval). A naive spelling is the user-pair cross
    product; the scale spelling BUCKETS each interval to the hour
    grid, equi-joins on the bucket, and applies the exact overlap
    predicate as a residual — pairs are only ever generated inside the
    same hour, so the join is bounded by per-hour concurrency, never
    by total sessions (the MinHash-band discipline applied to time).
    A pair sharing several buckets is emitted EXACTLY ONCE via the
    first-shared-bucket residual (bucket == floor(max(st)/hour), which
    always lies in both sessions' bucket ranges when they overlap) —
    r6: this replaces the former full DISTINCT over the candidate set,
    removing its exchange outright (guide §2.4).

    Float discipline: spans and overlaps are exact epoch-microsecond
    BIGINTs end-to-end (ts cast to TIMESTAMP first — the
    TIMESTAMP_NTZ/unix_micros pitfall); no floats exist anywhere.

    Scale shape: the session derivation is two user-keyed windows on
    one exchange; the bucket explode emits ~1 row per session-bucket;
    the equi-join shuffles on the bucket key; the residual runs on the
    bounded candidate set. r6: the bucket width dropped from one hour
    to ``_OVERLAP_BUCKET_US`` (default 2 min, env-overridable) — the
    candidate volume is Σ_b |B_b|^2 ≈ n^2 (w + dur)^2 / (T w), minimized
    near w ≈ mean session duration (42 s on this corpus; the hour grid
    held ~1,340 sessions per bucket = ~1.3e9 candidate evaluations for
    15M true pairs — measured 7.3 s -> 1.3 s at sf1.0). Output is
    width-invariant: two intervals overlap iff they share a bucket at
    ANY width, and the first-shared-bucket residual emits each pair
    exactly once."""
    s = _session_spans(spark, sf)
    hour = _OVERLAP_BUCKET_US
    b = s.select(
        "user_id",
        "session_id",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.floor(F.col("st") / hour).cast("long"),
                F.floor(F.col("en") / hour).cast("long"),
            )
        ).alias("bucket"),
    )
    left = b.select(
        F.col("user_id").alias("user_a"),
        F.col("session_id").cast("long").alias("session_a"),
        F.col("st").alias("st_a"),
        F.col("en").alias("en_a"),
        "bucket",
    )
    right = b.select(
        F.col("user_id").alias("user_b"),
        F.col("session_id").cast("long").alias("session_b"),
        F.col("st").alias("st_b"),
        F.col("en").alias("en_b"),
        "bucket",
    )
    first_shared = F.floor(
        F.greatest("st_a", "st_b") / hour
    ).cast("long")
    pairs = (
        left.join(right, "bucket")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("st_a") <= F.col("en_b"))
            & (F.col("st_b") <= F.col("en_a"))
            & (F.col("bucket") == first_shared)
        )
        .select(
            "user_a",
            "session_a",
            "user_b",
            "session_b",
            (
                F.least("en_a", "en_b") - F.greatest("st_a", "st_b")
            )
            .cast("long")
            .alias("overlap_us"),
        )
    )
    return pairs


# --- dataset content fingerprint -------------------------------------------

def _fp_rowhash_sql(expr: str) -> str:
    return _hex15_to_int_sql(f"md5({expr})")


def _fp_rowhash_col(col):
    return _hex15_to_int_col(F.md5(col))


_FP_DOC_ROW = "CONCAT_WS('|', CAST(doc_id AS VARCHAR), lang, source, " \
    "CAST(n_chars AS VARCHAR), md5(text))"
_FP_EVT_ROW = (
    "CONCAT_WS('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR), "
    "event_type, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), "
    "CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR))"
)
_FP_ORD_ROW = (
    "CONCAT_WS('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
    "o_orderstatus, "
    "CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) "
    " AS VARCHAR), "
    "CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS VARCHAR))"
)


@register(
    "dataset_fingerprint",
    # Order-insensitive content hash per table: XOR over per-row
    # 60-bit md5 prefixes of a canonical row string (exact fields
    # only — doubles enter via the DECIMAL cents idiom, timestamps via
    # epoch micros). XOR is commutative/associative/self-inverse, so
    # the fingerprint is independent of row order AND partitioning.
    f"SELECT 'documents' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(bit_xor({_fp_rowhash_sql(_FP_DOC_ROW)}) AS BIGINT) AS fingerprint "
    f"FROM documents "
    f"UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT), "
    f"CAST(bit_xor({_fp_rowhash_sql(_FP_EVT_ROW)}) AS BIGINT) FROM events "
    f"UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT), "
    f"CAST(bit_xor({_fp_rowhash_sql(_FP_ORD_ROW)}) AS BIGINT) FROM orders",
)
def dataset_fingerprint(spark, sf):
    """Order-insensitive dataset content fingerprint — the
    reproducibility primitive a training-data pipeline stamps on every
    corpus drop (did THIS copy of the table change?): per table, the
    row count plus the XOR of per-row 60-bit md5 prefixes over a
    canonical row string. XOR is commutative, associative and
    self-inverse, so the fingerprint is invariant to row order,
    partitioning and shuffle plan — two copies match iff their row
    multisets match up to XOR collisions — and it re-aggregates: XOR
    of per-partition fingerprints == the table fingerprint (the sketch
    mergeability property, here for integrity rather than estimation;
    a self-inverse pair of identical rows cancels, which exact-dup
    corpora should note — documents here are doc_id-keyed so rows are
    unique).

    Float discipline: doubles enter the row string only through the
    exact DECIMAL(12,2)-cents idiom and timestamps only as epoch
    micros (TIMESTAMP_NTZ cast first); the md5-prefix fold is the
    shared ``_hex15_to_int`` chain; XOR never touches a float.

    Scale shape: three independent single-pass map-side-combinable
    aggregations — no joins, no windows, nothing driver-side. Each scan
    rides a fan_out rebalance: the per-row md5 + canonical-string
    concat IS the cost and the one-row-group test files would serialize
    it (at a many-row-group layout fan_out is a no-op and the plan is
    back to pure partial aggregation)."""
    d = fan_out(_t(spark, sf, "documents"), "doc_id")
    e = fan_out(_t(spark, sf, "events"), "event_id")
    o = fan_out(_t(spark, sf, "orders"), "o_orderkey")
    doc_row = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        "lang",
        "source",
        F.col("n_chars").cast("string"),
        F.md5("text"),
    )
    evt_row = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .cast("string"),
    )
    ord_row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .cast("string"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast(
            "string"
        ),
    )

    def fp(df, row, name):
        return df.select(_fp_rowhash_col(row).alias("h")).agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("fingerprint"),
        ).select("table_name", "n_rows", "fingerprint")

    return (
        fp(d, doc_row, "documents")
        .unionAll(fp(e, evt_row, "events"))
        .unionAll(fp(o, ord_row, "orders"))
    )


@register(
    "join_band",
    # The oracle takes the band-join definition literally (one non-equi
    # self-join); the Spark side buckets by the band width and probes
    # the three adjacent buckets — |diff| <= w implies the bucket
    # indices differ by at most 1, and for a fixed right bucket exactly
    # ONE probe matches, so no dedup is needed.
    "WITH c AS (SELECT o_orderkey AS k, "
    " CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents "
    " FROM orders) "
    "SELECT a.k AS key_a, b.k AS key_b, "
    "CAST(ABS(a.cents - b.cents) AS BIGINT) AS diff_cents "
    "FROM c a JOIN c b ON ABS(a.cents - b.cents) <= 1000 AND a.k < b.k",
)
def join_band(spark, sf):
    """Band join: all order pairs whose totals lie within $10 of each
    other — the |a - b| <= w join class (``join_range`` is
    point-in-interval, ``join_asof`` is nearest-preceding,
    ``join_interval_overlap`` is interval-x-interval; the band join is
    the similarity-on-a-scalar member, the shape behind
    near-duplicate-amount reconciliation and fuzzy numeric matching).
    A naive spelling is the full cross product; the scale spelling
    BUCKETS each value to the band width and probes only the three
    adjacent buckets — |diff| <= w forces bucket indices within 1 of
    each other, and for a fixed right bucket exactly one of the three
    probes matches, so each qualifying pair is emitted exactly once
    with NO dedup pass (tighter than the interval join, which needs
    its DISTINCT).

    Float discipline: amounts are exact DECIMAL-cents BIGINTs; the
    band predicate and the reported diff are pure integer arithmetic.

    Scale shape: one pruned scan to the (key, cents) projection, a
    3x explode on the probe side, one bucket-keyed equi-join shuffle
    bounded by per-bucket density — never by the pair space."""
    band = 1000
    # fan_out: the probe-side 3x explode and the per-bucket pair products
    # otherwise run on the one-row-group scan split
    c = fan_out(_t(spark, sf, "orders"), "o_orderkey").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    bucket = F.floor(F.col("cents") / band).cast("long")
    probe = c.select(
        F.col("k").alias("key_a"),
        F.col("cents").alias("cents_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
    )
    build = c.select(
        F.col("k").alias("key_b"),
        F.col("cents").alias("cents_b"),
        bucket.alias("bucket"),
    )
    return (
        probe.join(build, "bucket")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (
                F.abs(F.col("cents_a") - F.col("cents_b"))
                <= band
            )
        )
        .select(
            "key_a",
            "key_b",
            F.abs(F.col("cents_a") - F.col("cents_b"))
            .cast("long")
            .alias("diff_cents"),
        )
    )


@register(
    "win_percent_rank",
    # PERCENT_RANK / CUME_DIST over a TOTAL order (c_acctbal, c_custkey
    # tie-break): both are exact-integer rationals — (rank-1)/(n-1) and
    # peers-through-current/n — evaluated as ONE correctly-rounded IEEE
    # division by both engines, so the %.6f strings cannot diverge.
    "SELECT c_custkey, c_nationkey, "
    "printf('%.6f', ROUND(PERCENT_RANK() OVER "
    " (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 6)) "
    " AS pct_rank, "
    "printf('%.6f', ROUND(CUME_DIST() OVER "
    " (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 6)) "
    " AS cume "
    "FROM customer",
)
def win_percent_rank(spark, sf):
    """PERCENT_RANK and CUME_DIST — the relative-position window
    functions (the fraction-of-peers readouts under ``win_rank``'s
    absolute ranks). Both are exact-integer rationals: percent_rank =
    (rank-1)/(n-1), cume_dist = rows-through-current/n, each ONE
    correctly-rounded IEEE division of small integers, identical on
    both engines under a total order (the win_ntile tie-break
    contract).

    Scale shape: one hash-partitioned window per c_nationkey — the
    win_rank plan, no extra exchange."""
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    fmt6 = lambda x: F.format_string("%.6f", F.round(x, 6))  # noqa: E731
    return c.select(
        "c_custkey",
        "c_nationkey",
        fmt6(F.percent_rank().over(w)).alias("pct_rank"),
        fmt6(F.cume_dist().over(w)).alias("cume"),
    )


@register(
    "fn_levenshtein",
    # levenshtein() builtin parity — the classic Wagner-Fischer edit
    # distance is an exact integer on both engines; distances between
    # two independent string columns plus an anchored literal probe.
    "SELECT p_partkey, "
    "CAST(levenshtein(p_brand, p_type) AS INT) AS lev_bt, "
    "CAST(levenshtein(p_name, p_type) AS INT) AS lev_nt, "
    "CAST(levenshtein(p_brand, 'Brand#00') AS INT) AS lev_lit "
    "FROM part",
)
def fn_levenshtein(spark, sf):
    """levenshtein() — exact edit distance, the scalar primitive under
    the fuzzy-linking family (``dict_join`` exact, G1's MinHash
    approximate, this the character-level ground truth). An exact
    integer DP on both engines, so parity is unconditional — the
    fn_luhn builtin-vs-definition discipline without needing a
    handwritten twin (both engines ship the same Wagner-Fischer
    metric).

    Scale shape: embarrassingly parallel scalar map over the part
    scan; at 100 TB the only care is the O(len^2) DP per row — bounded
    here by the fixed-width dictionary-style columns."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("int").alias("lev_bt"),
        F.levenshtein("p_name", "p_type").cast("int").alias("lev_nt"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#00"))
        .cast("int")
        .alias("lev_lit"),
    )


# ------------------------------------------ dynamic partition overwrite ----

def _stage_lang_partitioned(spark: SparkSession, sf: str) -> str:
    """The documents table written as a lang-partitioned parquet layout
    (/tmp/rbs_layout_dynov_<sf>, _DONE-guarded) — the mutation target
    for ``sink_dynamic_overwrite``. Staged once per sf from the
    testdata parquet; the overwrite below is idempotent (it always
    rewrites the target partition from the ORIGINAL source), so a
    previously-mutated staging re-reads identically."""
    import os

    out = _layout_dir(sf, "dynov")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        (
            _t(spark, sf, "documents")
            .select("doc_id", "n_chars", "lang")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(out)
        )
        with open(done, "w") as f:
            f.write("ok")
    return out


@register(
    "sink_dynamic_overwrite",
    # Dynamic partition overwrite: ONLY the 'de' partition is replaced
    # (with n_chars shifted by +1000); every other partition survives
    # untouched — stated directly from the documents view.
    "SELECT doc_id, CASE WHEN lang = 'de' THEN n_chars + 1000 "
    "ELSE n_chars END AS n_chars, lang FROM documents",
)
def sink_dynamic_overwrite(spark, sf):
    """Dynamic partition overwrite — the lakehouse mutation primitive
    between ``merge_upsert`` (row-level) and a full table rewrite:
    ``mode("overwrite")`` under
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` replaces ONLY
    the partitions the incoming frame actually touches (here the 'de'
    lang partition, its n_chars shifted +1000) and leaves every other
    partition's files untouched — the daily-reprocessing shape every
    partitioned warehouse job uses ('recompute yesterday, keep
    history'). The oracle states the expected FINAL table, so a green
    row proves both the replacement and the survival.

    The conf is scoped to the write and restored after (the
    join_runtime_filtered conf-restore pattern) — static mode is the
    session default and other keys depend on it. The overwrite derives
    from the ORIGINAL source parquet, so re-invocation is idempotent.

    Scale shape: the write plans one shuffle-free insert of the target
    partition's rows; commit cost is one directory swap per touched
    partition — at 100 TB you pay for the day you recompute, never for
    the table."""
    path = _stage_lang_partitioned(spark, sf)
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            _t(spark, sf, "documents")
            .filter(F.col("lang") == "de")
            .select(
                "doc_id",
                (F.col("n_chars") + 1000).alias("n_chars"),
                "lang",
            )
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
    return spark.read.parquet(path).select(
        "doc_id", "n_chars", F.col("lang").cast("string").alias("lang")
    )


# --------------------------------------------------- LATERAL VIEW syntax ----

@register(
    "sql_lateral_view",
    # HiveQL LATERAL VIEW posexplode through the PARSER — the oracle
    # re-states the 0-based positions via a struct-transform unnest
    # (this box's DuckDB has no generate_subscripts / WITH ORDINALITY
    # on unnest — the bigram_novelty workaround).
    "SELECT doc_id, pos, w FROM ("
    "SELECT doc_id, UNNEST(list_transform(generate_series(1, "
    " len(string_split(text, ' '))), i -> {'pos': i - 1, "
    " 'w': string_split(text, ' ')[i]}), recursive := true) "
    "FROM documents) u WHERE w = 'spark'",
)
def sql_lateral_view(spark, sf):
    """HiveQL ``LATERAL VIEW posexplode`` exercised through
    ``spark.sql`` so the PARSER surface itself is under test (the
    ``fn_generator`` key covers posexplode as a DataFrame function;
    this one covers the SQL dialect every migrated Hive job still
    writes). Positions are 0-based exact integers; the filtered token
    stream is the tokenize-and-match shape.

    Scale shape: the generator runs inside whole-stage codegen over
    the scan — one pass, no shuffle; the predicate on the exploded
    token applies before anything wide materializes."""
    v = "rbs_lateral_docs"
    _t(spark, sf, "documents").createOrReplaceTempView(v)
    return spark.sql(
        f"SELECT doc_id, pos, w FROM {v} "
        "LATERAL VIEW posexplode(split(text, ' ')) x AS pos, w "
        "WHERE w = 'spark'"
    )


# ------------------------------------------- pandas UDF as window agg ----

@register(
    "udf_window_agg",
    # A grouped-agg pandas UDF evaluated OVER a bounded window frame:
    # the rolling 3-row sum of exact integer cents per user — the
    # oracle is the builtin SUM over the identical frame (int64 sums
    # are exact, so Arrow transfer and JVM agree bit-for-bit).
    "SELECT event_id, user_id, "
    "CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER "
    " (PARTITION BY user_id ORDER BY ts, event_id "
    "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3 "
    "FROM events",
)
def udf_window_agg(spark, sf):
    """A grouped-agg pandas UDF evaluated OVER a window frame — the
    UDF-surface corner §2.5's six families don't reach: Spark ships
    the frame's rows to Python per window position (Arrow-batched) and
    the UDF reduces them, which is how a custom rolling statistic
    (trimmed mean, custom decay) deploys when no builtin exists. Here
    the UDF is a plain int64 sum so the builtin-SUM oracle pins the
    whole path exactly.

    Float discipline: cents are exact integers; pandas int64 ``.sum``
    and the JVM window SUM are both exact — no float ever exists.
    The frame's (ts, event_id) order is total (event_id unique), so
    the rolling value is deterministic.

    Scale shape: one user-keyed exchange for the partitioned window;
    the bounded 3-row frame keeps per-position work O(1). A production
    deployment would prefer the builtin (this plan pays the Arrow
    round-trip — the measured UDF-vs-builtin trade the udf_* family
    documents); the key exists to pin the SEMANTICS of the slow path."""
    # Eval-type inference resolves hint NAMES in the defining module's
    # globals (the udf_scalar_iter pitfall) — this module has no
    # top-level pandas import, so declare the type EXPLICITLY instead
    # of via hints.
    from pyspark.sql.functions import PandasUDFType

    roll_sum = F.pandas_udf(
        lambda v: int(v.sum()), "long", PandasUDFType.GROUPED_AGG
    )

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return _t(spark, sf, "events").select(
        "event_id",
        "user_id",
        roll_sum(
            F.floor(F.col("value") * 100).cast("long")
        )
        .over(w)
        .alias("roll3"),
    )


@register(
    "scan_inmemory_cache",
    # The cached projection must agree with the uncached relation — the
    # oracle states the rollup from the parquet view; the
    # InMemoryTableScan physical operator (and its columnar-batch read)
    # is plan-gated in pytest, because caching is observable only in
    # the plan, never in the rows.
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY source",
)
def scan_inmemory_cache(spark, sf):
    """Aggregate over an explicitly CACHED projection — Spark's
    in-memory columnar cache (``persist`` → ``InMemoryTableScan``), the
    interactive-analytics primitive that turns a repeated dashboard's
    parquet re-scan into a compressed columnar-batch read from executor
    storage. The cache is registered through ``caching.persist_swap``
    so repeated invocations in one long session rotate storage instead
    of accumulating it (the repo-wide tracked-persist lifecycle).

    Scale shape: the cached relation is the PROJECTED three-column
    slice, not the full table (column pruning happens before the cache
    fills, so executor storage holds only what downstream reads); the
    rollup on top is one map-side-combinable aggregation over the
    cached columnar batches. At 100 TB the same shape is
    ``spark.catalog.cacheTable`` over a hot dimension or a
    Delta/Iceberg table pinned in storage — never the raw fact scan."""
    from ..caching import persist_swap

    d = _t(spark, sf, "documents").select("source", "n_chars")
    cached = persist_swap(d)
    # Same-plan subtlety: a REPEATED invocation builds a new DataFrame
    # with the SAME canonical plan, so persist() maps to the PRIOR
    # invocation's still-live cache entry — which persist_swap's
    # rotation then unpersists (its identity guard compares objects,
    # not plans), leaving this invocation uncached. Detect the clobber
    # via the entry's storage level and re-persist; the rotation list
    # already tracks `cached`, so the lifecycle stays bounded.
    if not cached.storageLevel.useMemory:
        cached.persist()
        cached.count()
    return cached.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
