"""The delegated-SQL surface (SURVEY.md §2.B), one query per feature family.

Each query exercises a DataFusion-4.0-era capability the reference exposes
(projection/filter/group-by/sort/limit/scalar functions) or a Spark superset
the rebuild deliberately lifts (joins, windows, set ops, rollup, subqueries —
README.md:119 blocks joins in the reference; SURVEY.md §2.B recommends lifting
the restriction).

Performance notes live next to each query: what should broadcast, what the
expected plan shape is.  All implementations are pure DataFrame API — Catalyst
handles pushdown/pruning; nothing here collects or loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .registry import load, register


@register(
    "q01_pricing_summary",
    headline=True,
    tags=("agg", "filter", "sort"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filter → hash agg → sort.

    Plan: parquet scan with PushedFilters on l_shipdate + ReadSchema of 6
    columns, partial/final hash aggregate around one exchange on the 2 group
    keys (low cardinality → AQE coalesces post-shuffle partitions)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_filter_in_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE surface: LIKE prefix, BETWEEN, IN-list — all pushed to the scan.
    Driver-checked via the ``filterin_*`` branches of ``q27_shape_suite``
    (folded in round 4 to free a correctness-window slot)."""
    p = load(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_type").like("ECO%")
            & F.col("p_size").between(5, 30)
            & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#17", "Brand#25")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_brand")
    )


@register(
    "q03_top_revenue_orders",
    headline=True,
    tags=("join", "agg", "sort", "limit"),
    oracle="""
SELECT o.o_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped join+topN.  customer is a dim → broadcast; lineitem
    never shuffles for the join, only for the final ordered limit (TakeOrdered
    — no global sort)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    bldg_orders = broadcast(
        o.join(broadcast(c), o.o_custkey == c.c_custkey).select("o_orderkey")
    )
    return (
        li.join(bldg_orders, li.l_orderkey == bldg_orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_revenue",
    headline=True,
    tags=("join", "agg"),
    oracle="""
SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join.  region/nation/supplier broadcast (tiny dims);
    lineitem⨝orders is the only shuffle join (both large) — at 100 TB those
    two would be co-bucketed on orderkey to eliminate it."""
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    dim = broadcast(
        s.join(broadcast(n.join(broadcast(r), n.n_regionkey == r.r_regionkey)),
               s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q06_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (no global sort).

    Folded into the q27 labeled suite (round 4) to free a driver-window slot
    for d07/d08; the shape stays oracle-checked via its ``sortlimit_*``
    labels there."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q07_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + MIN/MAX/AVG (expand + two-phase agg).
    Driver-checked via the ``distinct_*`` branches of ``q27_shape_suite``
    (folded in round 4)."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("c_mktsegment")
    )


def q08_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter.  Driver-checked via the
    ``having_*`` branches of ``q27_shape_suite`` (folded in round 4)."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .where(F.col("n_customers") > 50)
        .orderBy("c_nationkey")
    )


@register(
    "q09_window_rank",
    headline=True,
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 2
""",
)
def q09_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (ROW_NUMBER per partition) — top-2 orders per
    customer.  One shuffle on o_custkey; AQE handles skewed customers."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 2)
    )


@register(
    "q10_window_running",
    tags=("window",),
    oracle="""
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           AS running_value,
       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
FROM events
WHERE user_id < 20
""",
)
def q10_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + LAG with explicit ROWS frame (superset of the
    reference's window support — DataFusion 4.0 had no custom frames)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") < 20)
        .select(
            "user_id",
            "ts",
            "value",
            F.round(F.sum("value").over(frame), 6).alias("running_value"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
    )


@register(
    "q11_union_set_ops",
    tags=("setop",),
    oracle="""
SELECT src, COUNT(*) AS n FROM (
  SELECT 'customer' AS src, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier' AS src, s_nationkey AS nationkey FROM supplier
) GROUP BY src
UNION ALL
SELECT 'intersect' AS src, COUNT(*) AS n FROM (
  SELECT DISTINCT c_nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey FROM supplier
)
ORDER BY src
""",
)
def q11_union_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + INTERSECT (the reference's engine had UNION ALL only;
    INTERSECT/EXCEPT are the documented superset)."""
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"), F.col("s_nationkey").alias("nationkey")
    )
    unions = c.unionByName(s).groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        load(spark, sf_dir, "customer")
        .select("c_nationkey")
        .distinct()
        .intersect(load(spark, sf_dir, "supplier").select("s_nationkey").distinct())
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect").alias("src"), "n")
    )
    return unions.unionByName(inter).orderBy("src")


def q12_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math/string surface (DataFusion 4.0 built-ins → same names in
    pyspark.sql.functions), plus CASE/CAST.

    Folded into the q27 labeled suite (round 5) to free a driver-window
    slot for m01_pii_redact; every computed column stays oracle-checked via
    the ``scalar_*`` labels there (string outputs ride in the label, numeric
    outputs in the value)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.upper("n_name").alias("name_upper"),
        F.lower(F.substring("n_name", 1, 3)).alias("name_prefix"),
        F.length("n_name").alias("name_len"),
        F.concat(F.col("n_name"), F.lit("#"), F.col("n_regionkey").cast("string")).alias(
            "tagged"
        ),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("padded"),
        F.replace(F.col("n_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.reverse("n_name").alias("rev"),
        F.round(F.sqrt(F.col("n_nationkey").cast("double")), 6).alias("sqrt_key"),
        F.abs(F.col("n_nationkey") - 12).alias("abs_diff"),
        (F.col("n_nationkey") % 5).alias("mod5"),
        F.when(F.col("n_regionkey").isin(1, 2), F.lit("west"))
        .otherwise(F.lit("rest"))
        .alias("hemi"),
    )


def q13_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: date_trunc + year extraction + monthly rollup.

    Folded into the q27 labeled suite (round 5) to free a driver-window
    slot for t04_bm25; stays oracle-checked via its ``month_*`` labels
    there."""
    o = load(spark, sf_dir, "orders")
    return (
        o.where(F.year("o_orderdate") == 1997)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("month_revenue"),
        )
        .orderBy("order_month")
    )


def q14_anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (EXISTS / NOT EXISTS).

    Folded into the q27 labeled suite (round 5) to free a driver-window
    slot for g02_gopher_repetition (q27's q43/q44 already pin the
    semi/anti family); stays oracle-checked via its ``semianti_*``
    labels there."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_orders").alias("kind"), "n")
    )
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("kind"), "n")
    )
    return anti.unionByName(semi).orderBy("kind")


def q15_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (not in DataFusion 4.0 — documented superset).

    Folded into the q27 labeled suite (round 5) to free a driver-window
    slot for c02_lm_perplexity (q27's q31/q33 already pin scalar
    subqueries); stays oracle-checked via its ``scalarsub_*`` labels
    there."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("__q15_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_rich
        FROM __q15_customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM __q15_customer)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "q16_rollup_cube",
    tags=("agg",),
    oracle="""
SELECT src, o_orderstatus, o_orderpriority, n FROM (
  SELECT 'rollup' AS src, o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
  UNION ALL
  SELECT 'cube' AS src, o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
) ORDER BY src, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q16_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP + CUBE in one labeled union (superset: DataFusion 4.0
    had no grouping sets; one driver-checked entry covers both shapes)."""
    o = load(spark, sf_dir, "orders")
    rolled = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("rollup").alias("src"), "o_orderstatus", "o_orderpriority", "n")
    )
    cubed = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("cube").alias("src"), "o_orderstatus", "o_orderpriority", "n")
    )
    return rolled.unionByName(cubed).orderBy(
        "src",
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )


@register(
    "q17_salted_agg",
    tags=("agg", "skew"),
    oracle="""
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS value_sum,
       ROUND(MIN(value), 6) AS value_min, ROUND(MAX(value), 6) AS value_max
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q17_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation — result must equal the plain
    group-by (the oracle *is* the plain group-by)."""
    from ..functions.skew import salted_aggregate

    out = salted_aggregate(
        load(spark, sf_dir, "events"),
        keys=["event_type"],
        aggs={
            "n": ("event_id", "count"),
            "_s": ("value", "sum"),
            "_mn": ("value", "min"),
            "_mx": ("value", "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round("_s", 4).alias("value_sum"),
        F.round("_mn", 6).alias("value_min"),
        F.round("_mx", 6).alias("value_max"),
    ).orderBy("event_type")


@register(
    "q18_string_functions",
    tags=("scalar",),
    oracle="""
SELECT n_nationkey,
       split_part(n_name, ' ', 1) AS first_word,
       strpos(n_name, 'A') AS a_pos,
       translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels,
       repeat(substr(n_name, 1, 2), 2) AS doubled_prefix,
       regexp_extract(n_name, '([A-Z]+)', 1) AS leading_caps,
       regexp_replace(n_name, '[AEIOU]', '_', 'g') AS masked,
       chr(65 + (n_nationkey % 26)) AS letter,
       md5(n_name) AS name_md5,
       sha256(n_name) AS name_sha256,
       to_hex(n_nationkey) AS key_hex
FROM nation
""",
)
def q18_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface (DataFusion 4.0 built-in family: split_part,
    strpos, translate, repeat, regexp_*, chr, md5/sha2, to_hex)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.split_part(F.col("n_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr(F.col("n_name"), "A").alias("a_pos"),
        F.translate(F.col("n_name"), "AEIOU", "aeiou").alias("lowered_vowels"),
        F.repeat(F.substring("n_name", 1, 2), 2).alias("doubled_prefix"),
        F.regexp_extract(F.col("n_name"), "([A-Z]+)", 1).alias("leading_caps"),
        F.regexp_replace(F.col("n_name"), "[AEIOU]", "_").alias("masked"),
        F.chr(F.lit(65) + (F.col("n_nationkey") % 26)).alias("letter"),
        F.md5(F.col("n_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("name_sha256"),
        F.hex(F.col("n_nationkey")).alias("key_hex"),
    )


def q19_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended math surface (abs/trig/exp/log/power/sign/trunc family).

    Folded into the q27 labeled suite (round 5) to free a driver-window
    slot for m02_decontamination; every one of the twelve math outputs
    stays oracle-checked via its ``math_*`` labels there."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.round(F.sin(F.col("p_retailprice") / 100.0), 6).alias("sin_v"),
        F.round(F.cos(F.col("p_retailprice") / 100.0), 6).alias("cos_v"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 6).alias("atan2_v"),
        F.round(F.exp(F.col("p_size") / 50.0), 6).alias("exp_v"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("ln_v"),
        F.round(F.log10(F.col("p_retailprice") + 1.0), 6).alias("log10_v"),
        F.round(F.log2(F.col("p_retailprice") + 1.0), 6).alias("log2_v"),
        F.round(F.pow(F.col("p_size"), 1.5), 6).alias("pow_v"),
        F.signum(F.col("p_size") - 25).cast("long").alias("sign_v"),
        F.col("p_retailprice").cast("long").alias("trunc_v"),
        F.ceil("p_retailprice").cast("long").alias("ceil_v"),
        F.floor("p_retailprice").cast("long").alias("floor_v"),
    )


@register(
    "q20_pivot",
    tags=("agg", "pivot"),
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (orderstatus → columns); fixed value list keeps the schema
    static — the form that scales (dynamic pivots need a driver-side distinct
    pass)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
        .orderBy("o_orderpriority")
    )


def q21_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE (superset of the reference: DataFusion 4.0 had no
    grouping sets)."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "z04_approx_sketches",
    tags=("agg", "sketch"),
    oracle=None,  # HLL/quantile sketches are engine-specific — rows-only check
)
def q22_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches: HLL distinct counts + approximate percentiles —
    the constant-memory path for 100 TB cardinality/quantile estimation."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        # Serialized to JSON for the driver: its canonicalizer sorts values
        # with pandas, which cannot hash list cells. The typed array form
        # stays available via percentile_approx directly.
        F.to_json(
            F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
        ).alias("price_quantiles"),
        F.count(F.lit(1)).alias("exact_rows"),
    )


@register(
    "q23_window_family",
    tags=("window",),
    oracle="""
SELECT user_id, event_id,
       NTILE(4)       OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST()    OVER w, 6) AS cume,
       LEAD(event_id, 1)  OVER w AS next_event,
       FIRST_VALUE(event_id) OVER w AS first_event,
       LAST_VALUE(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_event,
       NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS second_event,
       RANK()       OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM events
WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q23_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete DataFusion-4.0 window-function family (SURVEY.md §2.B:
    row_number/rank/dense_rank/percent_rank/cume_dist/ntile/lag/lead/
    first/last/nth_value) in one pass — a single shuffle on user_id serves
    every function."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.lead("event_id", 1).over(w).alias("next_event"),
            F.first("event_id").over(w).alias("first_event"),
            F.last("event_id").over(full).alias("last_event"),
            F.nth_value("event_id", 2).over(full).alias("second_event"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
    )


def q24_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (TPC-H Q4 shape) — planned as
    left-semi + left-anti hash joins on l_orderkey (no row explosion; the
    semi/anti build side carries only the key).  Driver-checked via the
    ``exists_*`` branches of ``q27_shape_suite`` (folded in round 4)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
  AND NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    )


@register(
    "q25_array_map_functions",
    tags=("scalar", "collection"),
    oracle="""
SELECT n_nationkey,
       len(toks) AS n_tokens,
       list_sort(toks)[1] AS first_token,
       array_to_string(list_reverse_sort(toks), '|') AS rev_joined,
       list_contains(toks, 'THE') AS has_the,
       len(list_distinct(toks)) AS n_distinct
FROM (SELECT n_nationkey, string_split(n_name, ' ') AS toks FROM nation)
""",
)
def q25_array_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family (size/sort/contains/distinct/join) — the
    collection surface DataFusion 4.0 lacked (SURVEY.md §2.B 'rudimentary
    array()'); all JVM-side codegen'd expressions."""
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.split("n_name", " ").alias("toks")
    )
    return n.select(
        "n_nationkey",
        F.size("toks").alias("n_tokens"),
        F.element_at(F.array_sort("toks"), 1).alias("first_token"),
        F.array_join(F.reverse(F.array_sort("toks")), "|").alias("rev_joined"),
        F.array_contains("toks", "THE").alias("has_the"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )


@register(
    "q26_registered_udf",
    tags=("udf",),
    oracle="""
SELECT s_suppkey,
       len(s_name) + s_nationkey AS weird_score,
       upper(substr(s_name, 1, 3)) AS prefix
FROM supplier
""",
)
def q26_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registration surface (a documented superset: the reference exposes
    none, SURVEY.md §2.B UDF row).  A vectorized pandas UDF registered via
    ``spark.udf.register`` and invoked from SQL — Arrow-batched, usable in any
    step of a BuzzQuery."""
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def weird_score(name, key):  # no annotations (local pandas import)
        return name.str.len() + key

    spark.udf.register("weird_score", weird_score)
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
SELECT s_suppkey,
       weird_score(s_name, s_nationkey) AS weird_score,
       upper(substring(s_name, 1, 3)) AS prefix
FROM supplier
"""
    )


def q27_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-table join with cross-nation filter and per-year
    revenue.  Plan: lineitem (the fact) joins every dimension via broadcast —
    zero fact-table shuffles before the final group-by."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (F.col("n1_key") < 3)
            & (F.col("n2_key") < 3)
            & (F.col("n1_key") != F.col("n2_key"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q28_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional-sum ratio per year over a
    4-table join — exercises CASE-inside-aggregate and ratio-of-aggregates."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part").where(F.col("p_size") < 20)
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("l_year"),
            volume.alias("volume"),
            (F.col("s_nationkey") % 5).alias("supp_key_region"),
        )
        .groupBy("l_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_key_region") == 0, F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("l_year")
    )


def q29_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram via LEFT OUTER join —
    COUNT(col) vs COUNT(*) null semantics on the outer side, then a second
    aggregation over the first's output."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q30_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery — plans as a
    semi-join against the aggregated key set, then the 3-table join + top-N."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 50
"""
    )


def q31_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery per part.

    Implemented decorrelated (the plan Catalyst would produce anyway): the
    per-part 0.2*AVG(quantity) is a map-side-partial aggregate over lineitem,
    then a broadcast-able join back — one lineitem scan pass per relation, no
    per-row re-scan.  At 100 TB the threshold relation has |part| rows, far
    below the fact, so the second join stays broadcast."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select("p_partkey")
    thresh = (
        li.groupBy("l_partkey")
        .agg((0.2 * F.avg("l_quantity")).alias("qty_thresh"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(thresh), li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q32_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio over a date-windowed join.

    The shipdate window is pushed to the lineitem scan (PushedFilters), part
    is a broadcast dim; single-row output, no shuffle beyond the final agg."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_revenue")
        )
    )


def q33_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar MAX subquery selecting the top
    supplier(s).

    The revenue relation is aggregated once and reused for both the max and
    the final join (no recompute: it is tiny — |supplier| rows — so the scalar
    max and the equality filter are both driver-side-cheap; the revenue is
    rounded to 2dp BEFORE the max comparison so float summation order cannot
    flip the winner between engines)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(F.broadcast(revenue), F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q34_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across both join
    sides.

    Catalyst extracts the common join key and pushes the per-side residuals:
    the part scan keeps only the 3 brands (IN pushed to the scan via OR
    factoring), lineitem keeps the quantity hull; the cross-side OR evaluates
    post-join.  part stays a broadcast dim."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


def q39_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted to this schema (no partsupp table — lineitem is
    the part-supplier relation): per small part, the supplier(s) achieving the
    minimum unit cost, via a correlated MIN subquery.  Decorrelated to one
    aggregate + broadcast join back (the plan Catalyst produces for the SQL
    form); unit cost division is IEEE-identical across engines, so the
    equality is exact."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size") < 5).select("p_partkey")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    costs = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_suppkey", unit
    )
    mins = costs.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        costs.join(
            F.broadcast(mins),
            (costs.l_partkey == F.col("m_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .dropDuplicates(["l_partkey", "l_suppkey"])
        .orderBy("l_partkey", "l_suppkey")
    )


def q40_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per (nation, year) profit over a 5-table join with a
    LIKE part filter; supply cost proxied by retail price (no partsupp).
    lineitem joins every dimension broadcast — zero fact shuffles before the
    group-by."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    # Sum in integer CENTS: the per-row product is bit-identical in any IEEE
    # engine, and a BIGINT sum is exact and order-independent — unlike
    # ROUND(SUM(double), 2), whose last-ulp summation-order noise (~1e-3 at
    # these magnitudes) straddles rounding boundaries between engines.
    profit_cents = F.round(profit * 100).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit_cents).alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q41_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned items in
    one quarter — 4-table join, date-window filter pushed to both fact scans,
    top-N after one aggregation."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q42_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute bucket,
    excluding one brand and suppliers from a NOT IN subquery (negative
    balance stands in for the complaints filter)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
"""
    )


def q43_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers that shipped an
    outsized share of the filtered part family (part-name IN subquery inside
    a grouped-HAVING IN subquery, threshold from a scalar subquery)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'a%')
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > (SELECT 0.001 * SUM(l2.l_quantity) FROM lineitem l2)
)
ORDER BY s.s_suppkey
"""
    )


def q44_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on a multi-supplier
    order — suppliers whose late line (shipped >60 days after order date) was
    the ONLY late line on a finished multi-supplier order.  No
    commit/receipt dates in this schema, so lateness is shipdate vs
    orderdate."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                    ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""
    )


@register(
    "q27_shape_suite",
    tags=("join", "agg", "subquery", "suite"),
    oracle="""
SELECT label, value FROM (
  SELECT 'volume_' || supp_nation || '_' || cust_nation || '_'
           || CAST(l_year AS VARCHAR) AS label,
         CAST(revenue AS DOUBLE) AS value
  FROM (
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM o.o_orderdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
        AND n1.n_nationkey <> n2.n_nationkey
    )
    GROUP BY supp_nation, cust_nation, l_year
  ) t27
  UNION ALL
  SELECT 'mkt_share_' || CAST(l_year AS VARCHAR) AS label,
         CAST(mkt_share AS DOUBLE) AS value
  FROM (
    SELECT l_year, ROUND(SUM(CASE WHEN supp_key_region = 0 THEN volume ELSE 0 END)
                         / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             s.s_nationkey % 5 AS supp_key_region
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size < 20
    )
    GROUP BY l_year
  ) t28
  UNION ALL
  SELECT 'custdist_' || CAST(c_count AS VARCHAR) AS label,
         CAST(custdist AS DOUBLE) AS value
  FROM (
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
  ) t29
  UNION ALL
  SELECT 'large_order_' || CAST(o_orderkey AS VARCHAR) AS label,
         CAST(total_qty AS DOUBLE) AS value
  FROM (
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
  ) t30
  UNION ALL
  SELECT 'small_qty_avg_yearly' AS label, CAST(avg_yearly AS DOUBLE) AS value
  FROM (
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
  ) t31
  UNION ALL
  SELECT 'promo_revenue' AS label, CAST(promo_revenue AS DOUBLE) AS value
  FROM (
    SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-03-01 00:00:00'
  ) t32
  UNION ALL
  SELECT 'top_supplier_' || CAST(s_suppkey AS VARCHAR) AS label,
         CAST(total_revenue AS DOUBLE) AS value
  FROM (
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
  ) t33
  UNION ALL
  SELECT 'disjunctive_revenue' AS label, CAST(revenue AS DOUBLE) AS value
  FROM (
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
  ) t34
  UNION ALL
  SELECT 'min_cost_' || CAST(l_partkey AS VARCHAR) || '_'
           || CAST(l_suppkey AS VARCHAR) AS label,
         CAST(unit_cost AS DOUBLE) AS value
  FROM (
    SELECT DISTINCT l.l_partkey, l.l_suppkey,
           ROUND(l.l_extendedprice / l.l_quantity, 4) AS unit_cost
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size < 5
      AND l.l_extendedprice / l.l_quantity = (
        SELECT MIN(l2.l_extendedprice / l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
  ) t39
  UNION ALL
  SELECT 'profit_' || nation || '_' || CAST(o_year AS VARCHAR) AS label,
         CAST(profit_cents AS DOUBLE) AS value
  FROM (
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * p.p_retailprice * l.l_quantity) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
  ) t40
  UNION ALL
  SELECT 'returns_' || CAST(c_custkey AS VARCHAR) AS label,
         CAST(revenue AS DOUBLE) AS value
  FROM (
    SELECT c.c_custkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
  ) t41
  UNION ALL
  SELECT 'suppcnt_' || p_brand || '_' || CAST(p_size AS VARCHAR) AS label,
         CAST(supplier_cnt AS DOUBLE) AS value
  FROM (
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
  ) t42
  UNION ALL
  SELECT 'excess_' || CAST(s_suppkey AS VARCHAR) AS label,
         CAST(s_suppkey AS DOUBLE) AS value
  FROM (
    SELECT s.s_suppkey
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'a%')
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > (SELECT 0.001 * SUM(l2.l_quantity) FROM lineitem l2)
    )
  ) t43
  UNION ALL
  SELECT 'waiting_' || s_name AS label, CAST(numwait AS DOUBLE) AS value
  FROM (
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                        ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
  ) t44
  UNION ALL
  SELECT 'sortlimit_' || CAST(o_orderkey AS VARCHAR) AS label,
         CAST(o_totalprice AS DOUBLE) AS value
  FROM (
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
  ) t45
  UNION ALL
  SELECT 'priority_high_' || linestatus AS label,
         CAST(high_line_count AS DOUBLE) AS value
  FROM (
    SELECT l.l_linestatus AS linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
  ) t46
  UNION ALL
  SELECT 'priority_low_' || linestatus AS label,
         CAST(low_line_count AS DOUBLE) AS value
  FROM (
    SELECT l.l_linestatus AS linestatus,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
  ) t47
  UNION ALL
  SELECT 'filterin_n_' || p_brand AS label, CAST(n_parts AS DOUBLE) AS value
  FROM (
    SELECT p_brand, COUNT(*) AS n_parts FROM part
    WHERE p_type LIKE 'ECO%' AND p_size BETWEEN 5 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#17', 'Brand#25')
    GROUP BY p_brand
  ) t48
  UNION ALL
  SELECT 'filterin_min_' || p_brand AS label, CAST(min_size AS DOUBLE) AS value
  FROM (
    SELECT p_brand, MIN(p_size) AS min_size FROM part
    WHERE p_type LIKE 'ECO%' AND p_size BETWEEN 5 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#17', 'Brand#25')
    GROUP BY p_brand
  ) t49
  UNION ALL
  SELECT 'filterin_max_' || p_brand AS label, CAST(max_size AS DOUBLE) AS value
  FROM (
    SELECT p_brand, MAX(p_size) AS max_size FROM part
    WHERE p_type LIKE 'ECO%' AND p_size BETWEEN 5 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#17', 'Brand#25')
    GROUP BY p_brand
  ) t50
  UNION ALL
  SELECT 'having_' || CAST(c_nationkey AS VARCHAR) AS label,
         CAST(n_customers AS DOUBLE) AS value
  FROM (
    SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
    GROUP BY c_nationkey HAVING COUNT(*) > 50
  ) t51
  UNION ALL
  SELECT 'exists_' || o_orderpriority AS label,
         CAST(order_count AS DOUBLE) AS value
  FROM (
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
  ) t52
  UNION ALL
  SELECT 'distinct_n_' || c_mktsegment AS label, CAST(n_nations AS DOUBLE) AS value
  FROM (
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations
    FROM customer GROUP BY c_mktsegment
  ) t53
  UNION ALL
  SELECT 'distinct_avg_' || c_mktsegment AS label, CAST(avg_bal AS DOUBLE) AS value
  FROM (
    SELECT c_mktsegment, ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment
  ) t54
  UNION ALL
  SELECT 'distinct_min_' || c_mktsegment AS label, CAST(min_bal AS DOUBLE) AS value
  FROM (
    SELECT c_mktsegment, ROUND(MIN(c_acctbal), 2) AS min_bal
    FROM customer GROUP BY c_mktsegment
  ) t55
  UNION ALL
  SELECT 'distinct_max_' || c_mktsegment AS label, CAST(max_bal AS DOUBLE) AS value
  FROM (
    SELECT c_mktsegment, ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_mktsegment
  ) t56
  UNION ALL
  SELECT 'q4exists_' || o_orderpriority AS label, CAST(order_count AS DOUBLE) AS value
  FROM (
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
  ) t57
  UNION ALL
  SELECT 'semianti_no_orders' AS label, CAST(COUNT(*) AS DOUBLE) AS value
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  UNION ALL
  SELECT 'semianti_with_orders' AS label, CAST(COUNT(*) AS DOUBLE) AS value
  FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  UNION ALL
  SELECT 'scalarsub_' || c_mktsegment AS label, CAST(n_rich AS DOUBLE) AS value
  FROM (
    SELECT c_mktsegment, COUNT(*) AS n_rich
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
  ) t58
  UNION ALL
  SELECT 'scalar_upper_' || UPPER(n_name) AS label,
         CAST(LENGTH(n_name) AS DOUBLE) AS value FROM nation
  UNION ALL
  SELECT 'scalar_prefix_' || LOWER(SUBSTR(n_name, 1, 3)) AS label,
         ROUND(SQRT(CAST(n_nationkey AS DOUBLE)), 6) AS value FROM nation
  UNION ALL
  SELECT 'scalar_tagged_' || n_name || '#' || CAST(n_regionkey AS VARCHAR) AS label,
         CAST(ABS(n_nationkey - 12) AS DOUBLE) AS value FROM nation
  UNION ALL
  SELECT 'scalar_snake_' || REPLACE(n_name, ' ', '_') AS label,
         CAST(MOD(n_nationkey, 5) AS DOUBLE) AS value FROM nation
  UNION ALL
  SELECT 'scalar_rev_' || REVERSE(n_name) AS label,
         CAST(LPAD(CAST(n_nationkey AS VARCHAR), 4, '0') AS DOUBLE) AS value
  FROM nation
  UNION ALL
  SELECT 'scalar_hemi_' || CASE WHEN n_regionkey IN (1, 2) THEN 'west'
                                ELSE 'rest' END AS label,
         CAST(n_nationkey AS DOUBLE) AS value FROM nation
  UNION ALL
  SELECT 'month_n_' || CAST(MONTH(order_month) AS VARCHAR) AS label,
         CAST(n_orders AS DOUBLE) AS value
  FROM (
    SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders
    FROM orders WHERE YEAR(o_orderdate) = 1997 GROUP BY 1
  ) t59
  UNION ALL
  SELECT 'month_rev_' || CAST(MONTH(order_month) AS VARCHAR) AS label,
         CAST(month_revenue AS DOUBLE) AS value
  FROM (
    SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
           ROUND(SUM(o_totalprice), 4) AS month_revenue
    FROM orders WHERE YEAR(o_orderdate) = 1997 GROUP BY 1
  ) t60
  UNION ALL
  SELECT 'math_' || m.name || '_' || CAST(p_partkey AS VARCHAR) AS label,
         m.value AS value
  FROM (SELECT * FROM part WHERE p_partkey <= 200) p, LATERAL (
    SELECT unnest(['sin', 'cos', 'atan2', 'exp', 'ln', 'log10', 'log2',
                   'pow', 'sign', 'trunc', 'ceil', 'floor']) AS name,
           unnest([ROUND(SIN(p_retailprice / 100.0), 6),
                   ROUND(COS(p_retailprice / 100.0), 6),
                   ROUND(ATAN2(CAST(p_size AS DOUBLE), 10.0), 6),
                   ROUND(EXP(p_size / 50.0), 6),
                   ROUND(LN(p_retailprice + 1.0), 6),
                   ROUND(LOG10(p_retailprice + 1.0), 6),
                   ROUND(LOG2(p_retailprice + 1.0), 6),
                   ROUND(POW(p_size, 1.5), 6),
                   CAST(SIGN(p_size - 25) AS DOUBLE),
                   CAST(TRUNC(p_retailprice) AS DOUBLE),
                   CAST(CEIL(p_retailprice) AS DOUBLE),
                   CAST(FLOOR(p_retailprice) AS DOUBLE)]) AS value
  ) m
) ORDER BY label
""",
)
def q27_shape_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixteen TPC-H shapes (Q7 volume shipping, Q8 market share, Q13
    order-count distribution, Q18 large-quantity, Q17 correlated-AVG, Q14
    promo ratio, Q15 top supplier, Q19 disjunctive filter, Q2 min-cost
    supplier, Q9 product profit, Q10 returned items, Q16 supplier-part
    counts, Q20 nested-IN excess shippers, Q21 EXISTS/NOT-EXISTS waiting
    orders, plus — folded in round 4 to free driver-window slots for
    d07/d08 — the former q06 sort/limit and q36 Q12 priority-count shapes,
    and — folded in round 5 for f01 — the former q04 Q4 EXISTS histogram)
    in one labeled (label, value) union so every shape stays
    driver-checked within the 50-row correctness window.  Each component
    keeps its own standalone function (q27_volume_shipping ..
    q44_waiting_orders) and its broadcast-dim plan (q44's fact-to-fact anti
    join is deliberately SortMergeJoin — neither side broadcasts at scale);
    the union is append-only — no extra shuffle beyond the components'."""

    def lv(df: DataFrame, label_col, value_col) -> DataFrame:
        return df.select(
            label_col.alias("label"), F.col(value_col).cast("double").alias("value")
        )

    def multi_lv(df: DataFrame, pairs) -> DataFrame:
        """Several labeled branches off ONE execution of ``df`` — an
        explode of (label, value) structs, so a component contributing
        multiple measures (q02's count/min/max, q07's aggregate family,
        q36's high/low counts) runs its joins and aggregations once
        instead of once per branch."""
        arr = F.array(
            *[
                F.struct(
                    label.alias("label"),
                    F.col(c).cast("double").alias("value"),
                )
                for label, c in pairs
            ]
        )
        return df.select(F.explode(arr).alias("_s")).select("_s.label", "_s.value")

    parts = [
        lv(
            q27_volume_shipping(spark, sf_dir),
            F.concat(
                F.lit("volume_"),
                F.col("supp_nation"),
                F.lit("_"),
                F.col("cust_nation"),
                F.lit("_"),
                F.col("l_year").cast("string"),
            ),
            "revenue",
        ),
        lv(
            q28_market_share(spark, sf_dir),
            F.concat(F.lit("mkt_share_"), F.col("l_year").cast("string")),
            "mkt_share",
        ),
        lv(
            q29_order_count_distribution(spark, sf_dir),
            F.concat(F.lit("custdist_"), F.col("c_count").cast("string")),
            "custdist",
        ),
        lv(
            q30_large_quantity_orders(spark, sf_dir),
            F.concat(F.lit("large_order_"), F.col("o_orderkey").cast("string")),
            "total_qty",
        ),
        lv(q31_small_qty_revenue(spark, sf_dir), F.lit("small_qty_avg_yearly"), "avg_yearly"),
        lv(q32_promo_revenue(spark, sf_dir), F.lit("promo_revenue"), "promo_revenue"),
        lv(
            q33_top_supplier(spark, sf_dir),
            F.concat(F.lit("top_supplier_"), F.col("s_suppkey").cast("string")),
            "total_revenue",
        ),
        lv(q34_disjunctive_filter(spark, sf_dir), F.lit("disjunctive_revenue"), "revenue"),
        lv(
            q39_min_cost_supplier(spark, sf_dir),
            F.concat(
                F.lit("min_cost_"),
                F.col("l_partkey").cast("string"),
                F.lit("_"),
                F.col("l_suppkey").cast("string"),
            ),
            "unit_cost",
        ),
        lv(
            q40_product_profit(spark, sf_dir),
            F.concat(
                F.lit("profit_"),
                F.col("nation"),
                F.lit("_"),
                F.col("o_year").cast("string"),
            ),
            "profit_cents",
        ),
        lv(
            q41_returned_items(spark, sf_dir),
            F.concat(F.lit("returns_"), F.col("c_custkey").cast("string")),
            "revenue",
        ),
        lv(
            q42_supplier_part_counts(spark, sf_dir),
            F.concat(
                F.lit("suppcnt_"),
                F.col("p_brand"),
                F.lit("_"),
                F.col("p_size").cast("string"),
            ),
            "supplier_cnt",
        ),
        lv(
            q43_excess_shippers(spark, sf_dir),
            F.concat(F.lit("excess_"), F.col("s_suppkey").cast("string")),
            "s_suppkey",
        ),
        lv(
            q44_waiting_orders(spark, sf_dir),
            F.concat(F.lit("waiting_"), F.col("s_name")),
            "numwait",
        ),
        lv(
            q06_sort_limit(spark, sf_dir),
            F.concat(F.lit("sortlimit_"), F.col("o_orderkey").cast("string")),
            "o_totalprice",
        ),
        multi_lv(
            q36_priority_counts(spark, sf_dir),
            [
                (F.concat(F.lit("priority_high_"), F.col("linestatus")), "high_line_count"),
                (F.concat(F.lit("priority_low_"), F.col("linestatus")), "low_line_count"),
            ],
        ),
        multi_lv(
            q02_filter_in_like_between(spark, sf_dir),
            [
                (F.concat(F.lit("filterin_n_"), F.col("p_brand")), "n_parts"),
                (F.concat(F.lit("filterin_min_"), F.col("p_brand")), "min_size"),
                (F.concat(F.lit("filterin_max_"), F.col("p_brand")), "max_size"),
            ],
        ),
        lv(
            q08_having(spark, sf_dir),
            F.concat(F.lit("having_"), F.col("c_nationkey").cast("string")),
            "n_customers",
        ),
        lv(
            q24_exists_subquery(spark, sf_dir),
            F.concat(F.lit("exists_"), F.col("o_orderpriority")),
            "order_count",
        ),
        lv(
            q04_priority_exists(spark, sf_dir),
            F.concat(F.lit("q4exists_"), F.col("o_orderpriority")),
            "order_count",
        ),
        lv(
            q14_anti_semi_join(spark, sf_dir),
            F.concat(F.lit("semianti_"), F.col("kind")),
            "n",
        ),
        lv(
            q15_subquery(spark, sf_dir),
            F.concat(F.lit("scalarsub_"), F.col("c_mktsegment")),
            "n_rich",
        ),
        multi_lv(
            q07_distinct_agg(spark, sf_dir),
            [
                (F.concat(F.lit("distinct_n_"), F.col("c_mktsegment")), "n_nations"),
                (F.concat(F.lit("distinct_avg_"), F.col("c_mktsegment")), "avg_bal"),
                (F.concat(F.lit("distinct_min_"), F.col("c_mktsegment")), "min_bal"),
                (F.concat(F.lit("distinct_max_"), F.col("c_mktsegment")), "max_bal"),
            ],
        ),
        # former q12 scalar singleton (folded round 5 for m01): string
        # outputs ride in the label, numeric outputs in the value, so every
        # scalar function stays hash-checked
        multi_lv(
            q12_scalar_functions(spark, sf_dir),
            [
                (F.concat(F.lit("scalar_upper_"), F.col("name_upper")), "name_len"),
                (F.concat(F.lit("scalar_prefix_"), F.col("name_prefix")), "sqrt_key"),
                (F.concat(F.lit("scalar_tagged_"), F.col("tagged")), "abs_diff"),
                (F.concat(F.lit("scalar_snake_"), F.col("snake")), "mod5"),
                (F.concat(F.lit("scalar_rev_"), F.col("rev")), "padded"),
                (F.concat(F.lit("scalar_hemi_"), F.col("hemi")), "n_nationkey"),
            ],
        ),
        # former q13 datetime singleton (folded round 5 for t04)
        multi_lv(
            q13_datetime(spark, sf_dir).withColumn(
                "m", F.month("order_month").cast("string")
            ),
            [
                (F.concat(F.lit("month_n_"), F.col("m")), "n_orders"),
                (F.concat(F.lit("month_rev_"), F.col("m")), "month_revenue"),
            ],
        ),
        # former q19 math singleton (folded round 5 for m02): all twelve
        # math-function outputs as labeled branches keyed by part key
        multi_lv(
            q19_math_functions(spark, sf_dir).withColumn(
                "k", F.col("p_partkey").cast("string")
            ),
            [
                (F.concat(F.lit(f"math_{name}_"), F.col("k")), f"{name}_v")
                for name in (
                    "sin", "cos", "atan2", "exp", "ln", "log10",
                    "log2", "pow", "sign", "trunc", "ceil", "floor",
                )
            ],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("label")


@register(
    "q35_dormant_customers",
    tags=("subquery", "anti", "agg"),
    oracle="""
SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(acctbal), 4) AS totacctbal
FROM (
  SELECT c.c_nationkey AS cntrycode, c.c_acctbal AS acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def q35_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders — scalar AVG subquery + NOT EXISTS anti join over a filtered
    subset (every customer has *some* order in the testdata, so the
    NOT EXISTS is restricted to '1-URGENT' to keep the anti join
    non-trivial).

    The global average is a one-row broadcast; the anti join shuffles only the
    distinct o_custkey set (aggregated before the join, far smaller than
    orders).  Expressed in SQL to exercise the scalar-subquery + NOT EXISTS
    parser surface end-to-end."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(acctbal), 4) AS totacctbal
FROM (
  SELECT c.c_nationkey AS cntrycode, c.c_acctbal AS acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0)
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
ORDER BY cntrycode
"""
    )


def q36_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts split by a priority class over a
    year-windowed fact/dim join — CASE-in-SUM with IN / NOT IN lists.

    Folded into the q27 labeled suite (round 4) to free a driver-window slot
    for d07/d08; the shape stays oracle-checked via its ``priority_*``
    labels there."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


@register(
    "q37_nation_value_share",
    tags=("join", "subquery", "agg"),
    oracle="""
WITH nation_value AS (
  SELECT n.n_name, ROUND(SUM(s.s_acctbal), 4) AS nation_acctbal
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name, nation_acctbal
FROM nation_value
WHERE nation_acctbal > (SELECT 0.04 * SUM(nation_acctbal) FROM nation_value)
ORDER BY nation_acctbal DESC, n_name
""",
)
def q37_nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a fraction of the global
    total — a HAVING threshold that is itself a scalar aggregate.

    The grouped relation is |nation|-sized, so the global total and the
    threshold filter are a broadcast of one row; no second pass over the
    fact."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    nation_value = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("s_acctbal"), 4).alias("nation_acctbal"))
    )
    total = nation_value.agg((0.04 * F.sum("nation_acctbal")).alias("thresh"))
    return (
        nation_value.join(F.broadcast(total), F.col("nation_acctbal") > F.col("thresh"))
        .select("n_name", "nation_acctbal")
        .orderBy(F.col("nation_acctbal").desc(), "n_name")
    )


@register(
    "q38_percentiles",
    tags=("agg",),
    oracle="""
SELECT l_returnflag,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS median_price,
       ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q38_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — Spark
    `percentile()` ≡ ANSI PERCENTILE_CONT.

    Exact percentile is a sort-based aggregate: fine at dim-group cardinality;
    for 100 TB-scale high-cardinality groups the engine's approx sketch
    (q22_approx_sketches) is the scale path — this entry pins the exact
    semantics."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority histogram of orders having at least one
    late-shipping lineitem — correlated EXISTS planned as a left-semi join
    (lineitem is pre-filtered by the pushed date hull before the semi join,
    so the big side never carries non-candidate rows into the shuffle).

    Folded into the q27 labeled suite (round 5) to free a driver-window slot
    for f01_top_fraction (the shape duplicated q27's q44 EXISTS family); it
    stays oracle-checked via its ``q4exists_*`` labels there."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""
    )
