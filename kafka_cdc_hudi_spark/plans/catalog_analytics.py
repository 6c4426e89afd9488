"""Oracle-checked analytics queries over the merged/test tables (SURVEY §7 M6).

The reference has no analytics surface of its own (its tables are queried by
downstream engines once in Hudi); this is the M6 north-star extension: the
standard relational operator set — joins (broadcast + shuffle), group-by
aggregation, event-time bucketing, window top-k — expressed DataFrame-first
so Catalyst drives the physical plan.

Determinism contract with the DuckDB oracle: every floating aggregate is
computed as SUM(CAST(x AS DECIMAL(25,6))) then CAST to DOUBLE — decimal sums
are exact and order-independent, and the final decimal->double cast is the
same value in both engines, so value hashes match bit-for-bit. Plain
double SUMs would differ in last-ulp between engines/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.numeric import DEC, dsum as _dsum
from kafka_cdc_hudi_spark.functions.timefns import epoch_micros, epoch_seconds
from kafka_cdc_hudi_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-by with derived measures.
    Plan goals: shipdate filter + 7-col pruning pushed to parquet scan,
    partial aggregation map-side, single shuffle on the 4-group key."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            (F.sum(F.col("l_discount").cast(DEC)).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS {DEC})) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + deterministic top-10.
    customer is small -> broadcast; orders join lineitem shuffles on
    orderkey once (the agg reuses that partitioning)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with dimension broadcast chain + group-by.
    region/nation/supplier/customer are all broadcast; only
    orders><lineitem shuffles."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global agg — the predicate-pushdown
    showcase (all three filters reach the parquet scan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


Q6_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS {DEC})) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time bucketed aggregation (batch shape of a streaming
    tumbling-window agg) over the events stream table."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum("value", "sum_value"),
        )
    )


EVENTS_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer (WindowGroupLimit prunes
    to running top-3 before the sort on Spark >= 3.5)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


TOPK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank_in_cust
FROM orders
QUALIFY rank_in_cust <= 3
"""


def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global stats per event_type: distinct users, min/max/sum (O6 count
    generalized)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        _dsum("value", "sum_value"),
    )


EVENTS_TYPE_STATS_SQL = f"""
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value, MAX(value) AS max_value,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-chain dimension rollup: customer -> nation -> region."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), _dsum("c_acctbal", "sum_acctbal"))
    )


CUSTOMERS_PER_REGION_SQL = f"""
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS sum_acctbal
FROM customer, nation, region
WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY r_name
"""


def global_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: the count aggregate, as one row over two fact tables."""
    e = load_table(spark, sf_dir, "events")
    l = load_table(spark, sf_dir, "lineitem")
    return e.agg(F.count("*").alias("n_events")).crossJoin(
        l.agg(F.count("*").alias("n_lineitem"))
    )


GLOBAL_COUNTS_SQL = """
SELECT (SELECT COUNT(*) FROM events) AS n_events,
       (SELECT COUNT(*) FROM lineitem) AS n_lineitem
"""


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (event_type, user bucket) with subtotal and
    grand-total rows — one Expand + single shuffle in Spark."""
    e = load_table(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 4).alias("user_bucket")
    return (
        e.select("event_type", bucket, "value")
        .rollup("event_type", "user_bucket")
        .agg(F.count("*").alias("n"), _dsum("value", "sum_value"))
    )


EVENTS_ROLLUP_SQL = f"""
SELECT event_type, user_id % 4 AS user_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, user_bucket)
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no COMPLETED ('F') order. The filter is on
    the build side, so the pushed-down predicate shrinks the anti-join input
    before the shuffle (at scale: one shuffled left-anti, no row explosion).

    The synthetic fixture gives every customer at least one order, which
    made the unfiltered version a vacuous 0-row oracle — the status slice
    keeps the answer non-empty at every driver scale factor."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
)
"""


def events_user_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user cumulative sum + previous-event gap (lag) — the
    ordered-window analytics shape; one shuffle on user_id, sorted once for
    both window functions."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(cum).cast("double").alias("cum_value"),
        (
            epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
        ).alias("secs_since_prev"),
    )


EVENTS_USER_CUMSUM_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS {DEC})) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value,
       epoch(ts) - lag(epoch(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS secs_since_prev
FROM events
"""


#: HLL++ relative standard deviation for the sketch queries; the in-query
#: self-checks allow 5x this (plus a small absolute slack for tiny groups)
SKETCH_HLL_RSD = 0.02


def events_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregations per event_type: HyperLogLog++ distinct users and
    approximate value quantiles — the constant-memory estimators a 100 TB
    aggregation uses where exact distinct/percentile would shuffle the full
    key/value set.

    Self-checking (estimates aren't SQL-reproducible): the HLL estimate must
    land within 5x rsd of the in-query exact countDistinct and the quantile
    sketch values must be ordered and inside [min, max], else this RAISES and
    the driver records a red row instead of a silent rows-only pass. The
    returned columns are all exact, so the DuckDB oracle does a full
    value-hash check. Production callers use the sketch pass alone (one
    aggregation, no exact distinct); the exact comparison here is the
    correctness harness, cheap at driver scale."""
    agg = events_sketches_estimates(spark, sf_dir)
    tol = F.greatest(F.lit(5 * SKETCH_HLL_RSD) * F.col("n_users"), F.lit(3.0))
    bad = agg.filter(
        (F.abs(F.col("approx_users") - F.col("n_users")) > tol)
        | (F.col("value_p50") < F.col("min_value"))
        | (F.col("value_p50") > F.col("value_p95"))
        | (F.col("value_p95") > F.col("max_value"))
    ).take(1)
    if bad:
        raise AssertionError(f"events_sketches estimate out of tolerance: {bad[0]}")
    return agg.select("event_type", "n", "n_users", "min_value", "max_value")


def events_sketches_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimate-bearing sketch aggregation (HLL distinct + quantile
    sketch next to the exact columns) — the production frame; accuracy is
    asserted against exact in tests/test_sketches.py and in-query by
    :func:`events_sketches`."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=SKETCH_HLL_RSD).alias("approx_users"),
            F.countDistinct("user_id").alias("n_users"),
            F.percentile_approx("value", [0.5, 0.95], 10_000).alias("_pcts"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "approx_users",
            "n_users",
            F.element_at("_pcts", 1).alias("value_p50"),
            F.element_at("_pcts", 2).alias("value_p95"),
            "min_value",
            "max_value",
            "n",
        )
    )


EVENTS_SKETCHES_SQL = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events
GROUP BY event_type
"""


def events_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel sequence detection: purchases preceded (per user, in order)
    by a view then a click, with view->purchase within 24 hours — counted per
    day (horizon calibrated to the synthetic fixture: within 1 h the
    funnel matched nothing at any SF). One shuffle on user_id; the three running ``last(...ignorenulls)``
    windows share a single sort, so sequence detection costs one ordered
    pass regardless of funnel depth (no self-joins, no row explosion —
    the win over the naive N-way join formulation of funnels)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def last_ts_of(t: str):
        return F.last(
            F.when(F.col("event_type") == t, F.col("ts")), ignorenulls=True
        ).over(w)

    flagged = e.select(
        "event_id", "user_id", "ts", "event_type",
        last_ts_of("view").alias("v_ts"),
        last_ts_of("click").alias("c_ts"),
    ).filter(F.col("event_type") == "purchase")
    conv = flagged.filter(
        F.col("v_ts").isNotNull()
        & F.col("c_ts").isNotNull()
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("c_ts") <= F.col("ts"))
        & ((epoch_seconds("ts") - epoch_seconds("v_ts")) <= 86400.0)
    )
    return (
        conv.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").alias("n_conversions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_FUNNEL_SQL = """
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ts,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_ts
  FROM events
)
SELECT date_trunc('day', ts) AS day,
       COUNT(*) AS n_conversions,
       COUNT(DISTINCT user_id) AS n_users
FROM flagged
WHERE event_type = 'purchase'
  AND v_ts IS NOT NULL AND c_ts IS NOT NULL
  AND v_ts <= c_ts AND c_ts <= ts
  AND epoch(ts) - epoch(v_ts) <= 86400.0
GROUP BY 1
"""


def orders_price_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank windows (percent_rank + cume_dist): each order's price
    standing within its priority class — the remaining ordered-window
    access functions the catalog didn't yet exercise. Both are pure
    functions of the value-ranked position, so results are engine-exact
    ((rank-1)/(n-1) and peers/n, one division each). One shuffle + sort on
    the priority key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


ORDERS_PRICE_PCTRANK_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
         AS price_pct_rank,
       cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
         AS price_cume_dist
FROM orders
"""


def events_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type — the financial candlestick
    primitive, i.e. first/last-in-group by event time (arg_min/arg_max
    semantics) alongside plain extremes. Open/close resolve via
    max-of-struct over the exact (epoch_micros, event_id) ordering —
    deterministic under ties, one shuffle, map-side combine (no window
    sort)."""
    from kafka_cdc_hudi_spark.functions.timefns import epoch_millis

    e = load_table(spark, sf_dir, "events")
    # collision-free scalar ordering: millis * 2^20 + event_id (same
    # composite-long trick as the partial-update fold; DuckDB's arg_min
    # takes only scalar keys)
    ordk = epoch_millis("ts") * F.lit(1048576) + F.col("event_id")
    k = F.struct(ordk.alias("o"), F.col("value").alias("v"))
    return (
        e.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("value"),
            k.alias("k"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min(F.col("k")).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.col("k")).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


EVENTS_DAILY_OHLC_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       arg_min(value, epoch_ms(ts) * 1048576 + event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, epoch_ms(ts) * 1048576 + event_id) AS close,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


#: co-occurrence support floor: pairs must appear in at least this many
#: orders (keeps the output the interesting head, not the noise tail)
_PART_COOC_MIN_SUPPORT = 2


def parts_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis over order lines: part pairs bought together
    with support and exact-ppm lift (the cross-sell/recommendation
    primitive on the RETAIL side, complementing the event-type
    co-occurrence on the behavioral side). The pair join is bounded by
    parts-per-order (~4 in the fixture, never corpus-sized); one orderkey
    shuffle feeds both the pair self-join and the per-part supports; lift
    is integer-exact ((pair/n) / (a/n * b/n) in ppm)."""
    l = load_table(spark, sf_dir, "lineitem")
    per_order = l.select("l_orderkey", "l_partkey").distinct()
    a = per_order.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = per_order.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_together"))
        .filter(F.col("n_together") >= _PART_COOC_MIN_SUPPORT)
    )
    support = per_order.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    totals = per_order.agg(F.countDistinct("l_orderkey").alias("n_all"))
    sa = support.select(F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_a"))
    sb = support.select(F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .join(F.broadcast(totals))
        .select(
            "part_a",
            "part_b",
            "n_together",
            "n_a",
            "n_b",
            F.expr("1000000 * n_together * n_all div (n_a * n_b)").alias("lift_ppm"),
        )
    )


PARTS_COOCCURRENCE_SQL = f"""
WITH per_order AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_together
  FROM per_order a JOIN per_order b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_PART_COOC_MIN_SUPPORT}),
support AS (SELECT l_partkey, COUNT(*) AS n_orders FROM per_order GROUP BY 1),
totals AS (SELECT COUNT(DISTINCT l_orderkey) AS n_all FROM per_order)
SELECT part_a, part_b, n_together,
       sa.n_orders AS n_a, sb.n_orders AS n_b,
       (1000000 * n_together * n_all) // (sa.n_orders * sb.n_orders) AS lift_ppm
FROM pairs
JOIN support sa ON pairs.part_a = sa.l_partkey
JOIN support sb ON pairs.part_b = sb.l_partkey
CROSS JOIN totals
"""

#: deterministic weighted-sampling keep count
_WSAMPLE_K = 100


def dataset_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling: keep the K documents with the
    smallest hash-priority ``h div weight`` (weight = token count), so
    longer documents are proportionally more likely to survive — the
    reproducible, RNG-free cousin of A-Res reservoir sampling (an exact
    integer priority rather than u^(1/w); the bias curve differs slightly
    but the estimator property — monotone weight preference with a fixed
    hash — is what pipelines actually rely on for stable reruns). One
    projection + one global top-K (rank over a single ordering —
    WindowGroupLimit prunes per partition before the final merge)."""
    from kafka_cdc_hudi_spark.functions.textfns import tokens

    d = load_table(spark, sf_dir, "documents")
    weight = F.greatest(F.size(tokens("text")).cast("long"), F.lit(1).cast("long"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|ws_v1"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    base = d.select("doc_id", weight.alias("weight"), h.alias("h")).select(
        "doc_id", "weight", F.expr("h div weight").alias("priority")
    )
    w = Window.orderBy("priority", "doc_id")
    return (
        base.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _WSAMPLE_K)
        .select("doc_id", "weight", "priority", "rank")
    )


def _wsample_sql() -> str:
    from kafka_cdc_hudi_spark.functions.textfns import TOKEN_SPLIT_RE

    toks = (
        f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         greatest(CAST(len({toks}) AS BIGINT), 1) AS weight,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|ws_v1'), 1, 15)) AS BIGINT) AS h
  FROM documents)
SELECT doc_id, weight, h // weight AS priority,
       CAST(row_number() OVER (ORDER BY h // weight, doc_id) AS INT) AS rank
FROM base
QUALIFY rank <= {_WSAMPLE_K}
"""


DATASET_WEIGHTED_SAMPLE_SQL = _wsample_sql()


def user_activity_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN reconciliation — the audit shape that finds ids
    present on only one side of two systems (event emitters vs order
    placers; the fixture shares one id space). The one join type the
    catalog didn't yet exercise; classification is null-pattern-driven.
    One shuffle per aggregate + the outer join on the shared key."""
    # asymmetric slices: every fixture id appears on both sides unsliced,
    # which would leave the outer join's null branches vacuously untested —
    # compare PURCHASE activity against URGENT orders so each side drops
    # a different id subset and all three statuses occur
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    ev = e.groupBy(F.col("user_id").alias("id")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    od = o.groupBy(F.col("o_custkey").alias("id")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    status = (
        F.when(F.col("n_events").isNull(), "orders_only")
        .when(F.col("n_orders").isNull(), "events_only")
        .otherwise("both")
    )
    return ev.join(od, "id", "full_outer").select(
        "id",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        status.alias("status"),
    )


USER_ACTIVITY_RECONCILIATION_SQL = """
WITH ev AS (SELECT user_id AS id, COUNT(*) AS n_events FROM events
            WHERE event_type = 'purchase' GROUP BY 1),
od AS (SELECT o_custkey AS id, COUNT(*) AS n_orders FROM orders
       WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
SELECT COALESCE(ev.id, od.id) AS id,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(n_orders, 0) AS n_orders,
       CASE WHEN n_events IS NULL THEN 'orders_only'
            WHEN n_orders IS NULL THEN 'events_only'
            ELSE 'both' END AS status
FROM ev FULL OUTER JOIN od ON ev.id = od.id
"""


def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics: extract a field from the JSON ``props``
    payload column at query time (schema-on-read — no upfront parse
    column) and aggregate it per event type. get_json_object stays fully
    codegen'd; integer sums are exact."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


EVENTS_PROPS_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(k) AS n_with_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


#: KMV sketch size (k smallest hashes kept) and the 60-bit hash space
_KMV_K = 64
_KMV_SPACE = 16 ** 15  # = 2^60, the md5-prefix domain


def events_kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch with a mergeable rollup: per
    (event_type, hour) keep the 64 smallest user-id hashes, merge hours by
    re-taking the 64 smallest of the union, estimate distinct users per
    type as (k-1) * SPACE / kth_smallest. The deterministic-sketch twin of
    `events_cms_heavy_hitters`: unlike HLL's opaque binary sketches, KMV
    over salted md5 is exactly reproducible, so the ESTIMATES carry the
    value oracle (accuracy vs exact is separately pinned in
    tests/test_sketches.py).

    Plan: distinct (type, hour, hash) -> WindowGroupLimit prunes each
    partition to its local 64 smallest pre-shuffle -> the merge re-ranks
    type-wide (second WindowGroupLimit) -> tiny per-type agg joined with
    the exact countDistinct for the comparison columns. The float estimate
    is ONE multiply + ONE divide on exactly-representable operands —
    engine-identical."""
    e = load_table(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    cells = e.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour"), h
    ).distinct()
    w1 = Window.partitionBy("event_type", "hour").orderBy("h")
    hour_kmv = (
        cells.withColumn("r", F.row_number().over(w1)).filter(F.col("r") <= _KMV_K)
    )
    merged = hour_kmv.select("event_type", "h").distinct()
    w2 = Window.partitionBy("event_type").orderBy("h")
    kmv = merged.withColumn("r", F.row_number().over(w2)).filter(F.col("r") <= _KMV_K)
    est = kmv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max("h").alias("kth"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_obs",
            "kth",
            F.when(F.col("n_obs") < _KMV_K, F.col("n_obs").cast("double"))
            .otherwise(
                F.lit(float(_KMV_K - 1)) * F.lit(float(_KMV_SPACE)) / F.col("kth").cast("double")
            )
            .alias("kmv_est"),
        )
    )


EVENTS_KMV_SQL = f"""
WITH cells AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events),
hour_kmv AS (
  SELECT event_type, h FROM cells
  QUALIFY row_number() OVER (PARTITION BY event_type, hour ORDER BY h) <= {_KMV_K}),
merged AS (SELECT DISTINCT event_type, h FROM hour_kmv),
kmv AS (
  SELECT event_type, h FROM merged
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {_KMV_K}),
est AS (
  SELECT event_type, COUNT(*) AS n_obs, MAX(h) AS kth FROM kmv GROUP BY 1),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users FROM events GROUP BY 1)
SELECT event_type, exact_users, n_obs, kth,
       CASE WHEN n_obs < {_KMV_K} THEN CAST(n_obs AS DOUBLE)
            ELSE CAST({_KMV_K - 1} AS DOUBLE) * CAST({_KMV_SPACE} AS DOUBLE)
                 / CAST(kth AS DOUBLE) END AS kmv_est
FROM est JOIN exact USING (event_type)
"""


#: count-min sketch geometry: depth rows (independent hash functions) x
#: width buckets. Error bound: overcount <= e/width * total with
#: probability 1 - e^-depth; the sketch is 4*64 counters regardless of key
#: cardinality.
_CMS_DEPTH, _CMS_WIDTH = 4, 64


def _cms_bucket(key: F.Column) -> F.Column:
    """Row bucket for the (depth, key) pair — salted md5, the same
    deterministic hash family the split/sample operators use. Expects a
    ``depth`` column in scope."""
    salted = F.concat(F.col("depth").cast("string"), F.lit("|"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint") % _CMS_WIDTH
    )


def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation per user — the mergeable
    heavy-hitters primitive: the sketch is depth x width counters that add
    across partitions/days (store the cells, merge by summing, estimate
    any key's frequency later without the raw events). Unlike HLL, CMS is
    fully deterministic given its hash family, so the ESTIMATES themselves
    carry the DuckDB value oracle — no tolerance band needed; the
    one-sided overcount guarantee (est >= exact) is pinned in
    tests/test_sketches.py.

    Plan: build = one explode(depth) + one (depth, bucket) shuffle into
    256 cells; probe = per-user exact agg (one shuffle) + broadcast join
    against the tiny cell table + min over depths."""
    e = load_table(spark, sf_dir, "events")
    depths = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
    cells = (
        e.select("user_id", F.explode(depths).alias("depth"))
        .select("depth", _cms_bucket(F.col("user_id")).alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    users = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = users.select(
        "user_id", "exact_n", F.explode(depths).alias("depth")
    ).select("user_id", "exact_n", "depth", _cms_bucket(F.col("user_id")).alias("bucket"))
    est = (
        probes.join(F.broadcast(cells), ["depth", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
    )


EVENTS_CMS_SQL = f"""
WITH d AS (SELECT unnest(range(0, {_CMS_DEPTH})) AS depth),
pairs AS (
  SELECT depth,
         CAST(('0x' || substring(md5(depth || '|' || user_id), 1, 15)) AS BIGINT)
           % {_CMS_WIDTH} AS bucket
  FROM events, d),
cells AS (SELECT depth, bucket, COUNT(*) AS cell_n FROM pairs GROUP BY 1, 2),
users AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1),
probes AS (
  SELECT user_id, exact_n, depth,
         CAST(('0x' || substring(md5(depth || '|' || user_id), 1, 15)) AS BIGINT)
           % {_CMS_WIDTH} AS bucket
  FROM users, d),
est AS (
  SELECT user_id, exact_n, MIN(cell_n) AS cms_est
  FROM probes JOIN cells USING (depth, bucket)
  GROUP BY 1, 2)
SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overcount FROM est
"""


def events_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch maintenance: per-(hour, event_type) HLL sketches of
    distinct users, then re-aggregated to per-type estimates by sketch
    UNION — without rescanning the events. This is the 100 TB pattern for
    incremental distinct-count maintenance: store the fine-grained sketch
    table once (constant bytes per bucket), answer any coarser rollup by
    merging sketches instead of re-shuffling raw user ids.

    Self-checking: the merged-sketch estimate must land within 10% (+small
    absolute slack) of the exact per-type countDistinct, else this RAISES
    (red driver row, not a silent rows-only pass). Returned columns are the
    exact ones, fully oracle-checked; accuracy is additionally bounded in
    tests/test_sketches.py. Production callers keep the estimate column and
    skip the exact comparison — that is the whole point of the pattern."""
    e = load_table(spark, sf_dir, "events")
    rolled = events_hll_rollup_estimates(spark, sf_dir)
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    bad = (
        rolled.join(exact, "event_type")
        .filter(
            F.abs(F.col("approx_users") - F.col("exact_users"))
            > F.greatest(F.lit(0.10) * F.col("exact_users"), F.lit(3.0))
        )
        .take(1)
    )
    if bad:
        raise AssertionError(f"events_hll_mergeable_rollup estimate out of tolerance: {bad[0]}")
    return rolled.select("event_type", "n_events", "n_hour_buckets").orderBy("event_type")


def events_hll_rollup_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimate-bearing mergeable rollup (per-hour HLL sketches unioned
    to per-type estimates) — the production frame; accuracy is asserted in
    tests/test_sketches.py and in-query by
    :func:`events_hll_mergeable_rollup`."""
    e = load_table(spark, sf_dir, "events")
    per_hour = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"), F.count("*").alias("n"))
    return per_hour.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n").alias("n_events"),
        F.count("*").alias("n_hour_buckets"),
    )


EVENTS_HLL_ROLLUP_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT date_trunc('hour', ts)) AS n_hour_buckets
FROM events
GROUP BY event_type
ORDER BY event_type
"""


#: histogram-quantile sketch params: 64 equi-width bins of width 8 over
#: value in [0, 512) (top bin clamps) — constant bytes per (bucket, type)
_HQ_BINS, _HQ_WIDTH = 64, 8


def events_histogram_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable quantile sketch: per-(day, event_type) fixed-bin
    histograms (the stored fine-grained sketch table), merged to per-type
    histograms by ADDING bin counts — never rescanning raw events — then
    p50/p95 read off the merged bins. The quantile member of the sketch
    family next to HLL (distinct), CMS (heavy hitters) and KMV: at 100 TB
    the per-bucket histogram is constant-size state a streaming pipeline
    maintains incrementally, and any coarser rollup (per week, per type,
    global) is a counts-sum.

    Estimator: the upper edge of the first bin whose cumulative count
    reaches ceil(q * n), with ceil done in EXACT INTEGER arithmetic
    ((19n + 19) // 20 for p95) — deterministic, so unlike the HLL entry
    the estimates themselves carry a full value oracle, not just a
    tolerance self-check."""
    e = load_table(spark, sf_dir, "events")
    bin_col = F.least(
        F.lit(_HQ_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") / _HQ_WIDTH)),
    ).cast("long")
    # stage 1: the stored sketch table (sparse histogram rows)
    per_day = (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
            bin_col.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # stage 2: merge = sum counts (plus bucket bookkeeping)
    merged = per_day.groupBy("event_type", "bin").agg(F.sum("cnt").alias("cnt"))
    totals = merged.groupBy("event_type").agg(F.sum("cnt").alias("n_events"))
    n_days = per_day.groupBy("event_type").agg(
        F.countDistinct("day").alias("n_day_buckets")
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = (
        merged.withColumn("cum", F.sum("cnt").over(w))
        .join(totals, "event_type")
    )
    # exact-integer rank thresholds: ceil(n/2), ceil(19n/20)
    est = cum.groupBy("event_type", "n_events").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("n_events"), F.col("bin"))
        ).alias("_b50"),
        F.min(
            F.when(
                F.col("cum") * 20 >= F.col("n_events") * 19, F.col("bin")
            )
        ).alias("_b95"),
    )
    return (
        est.join(n_days, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_day_buckets",
            ((F.col("_b50") + 1) * _HQ_WIDTH).cast("double").alias("p50_upper"),
            ((F.col("_b95") + 1) * _HQ_WIDTH).cast("double").alias("p95_upper"),
        )
        .orderBy("event_type")
    )


def events_histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-checking wrapper (same contract as events_hll_mergeable_rollup):
    the bin-derived estimates must land within TWO bin widths of the exact
    interpolated percentiles, else this RAISES. Two, not one: the
    estimator returns the upper edge of the bin holding the ceil(q*n)-th
    order statistic, while ``percentile()`` interpolates between order
    statistics and can land in the adjacent bin. The returned estimate
    columns are themselves fully value-oracled (deterministic integer bin
    algebra), which the HLL/CMS entries cannot offer."""
    est = events_histogram_quantile_estimates(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("x50"),
        F.expr("percentile(value, 0.95)").alias("x95"),
    )
    bad = (
        est.join(exact, "event_type")
        .filter(
            (F.abs(F.col("p50_upper") - F.col("x50")) > 2 * _HQ_WIDTH)
            | (F.abs(F.col("p95_upper") - F.col("x95")) > 2 * _HQ_WIDTH)
        )
        .take(1)
    )
    if bad:
        raise AssertionError(
            f"histogram quantile estimate out of tolerance: {bad[0]}"
        )
    return est


EVENTS_HISTOGRAM_QUANTILE_SQL = f"""
WITH b AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         least({_HQ_BINS - 1}, greatest(0, CAST(floor(value / {_HQ_WIDTH}) AS BIGINT))) AS bin,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2, 3
),
m AS (SELECT event_type, bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_events FROM m GROUP BY 1),
d AS (SELECT event_type, COUNT(DISTINCT day) AS n_day_buckets FROM b GROUP BY 1),
c AS (
  SELECT m.event_type, m.bin, t.n_events,
         SUM(m.cnt) OVER (PARTITION BY m.event_type ORDER BY m.bin) AS cum
  FROM m JOIN t ON m.event_type = t.event_type
),
est AS (
  SELECT event_type, n_events,
         MIN(CASE WHEN cum * 2 >= n_events THEN bin END) AS b50,
         MIN(CASE WHEN cum * 20 >= n_events * 19 THEN bin END) AS b95
  FROM c GROUP BY 1, 2
)
SELECT est.event_type, est.n_events, d.n_day_buckets,
       CAST((b50 + 1) * {_HQ_WIDTH} AS DOUBLE) AS p50_upper,
       CAST((b95 + 1) * {_HQ_WIDTH} AS DOUBLE) AS p95_upper
FROM est JOIN d ON est.event_type = d.event_type
ORDER BY est.event_type
"""


def range_join_post_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: every event within 2 hours after a purchase
    by the same user. Bucketed equi-join scale path — see
    operators/temporal.py:range_join (a naive inequality join would plan
    as a nested loop)."""
    from kafka_cdc_hudi_spark.operators.temporal import range_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    out = range_join(
        e.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        start_col="start_ts",
        end_col="end_ts",
    )
    return out.select("event_id", "user_id", "ts", "purchase_id", "start_ts", "end_ts")


RANGE_JOIN_SQL = """
SELECT l.event_id, l.user_id, l.ts, r.purchase_id, r.start_ts, r.end_ts
FROM events l
JOIN (
  SELECT user_id, event_id AS purchase_id, ts AS start_ts,
         ts + INTERVAL 2 HOUR AS end_ts
  FROM events WHERE event_type = 'purchase'
) r ON l.user_id = r.user_id AND l.ts >= r.start_ts AND l.ts < r.end_ts
"""


def big_orders_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: LEFT SEMI join against an aggregated subquery —
    orders whose lineitems total > 250 qty. The semi join keeps orders
    columns only (no duplication from multiple matches) and Spark pushes it
    as a build-side-dedup'd hash join."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


BIG_ORDERS_SEMI_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
"""


#: fixed pivot columns — explicit values keep the output schema stable (and
#: skip the extra distinct-values job Spark runs for an open pivot)
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def events_pivot_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts, one column per event type. Explicit
    value list -> single shuffle, no distinct-scan."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


EVENTS_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user bucket): all 4 grouping combinations in
    one Expand + single shuffle."""
    e = load_table(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 2).alias("user_bucket")
    return (
        e.select("event_type", bucket)
        .cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n"))
    )


EVENTS_CUBE_SQL = """
SELECT event_type, user_id % 2 AS user_bucket, COUNT(*) AS n
FROM events
GROUP BY CUBE (event_type, user_bucket)
"""


def active_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: users active in the first half of the window vs the
    second — intersect minus except, tagged and unioned."""
    e = load_table(spark, sf_dir, "events")
    mid = F.lit("2024-01-16").cast("timestamp")
    first = e.filter(F.col("ts") < mid).select("user_id").distinct()
    second = e.filter(F.col("ts") >= mid).select("user_id").distinct()
    both = first.intersect(second).withColumn("cohort", F.lit("both_halves"))
    only_first = first.exceptAll(second).withColumn("cohort", F.lit("first_only"))
    only_second = second.exceptAll(first).withColumn("cohort", F.lit("second_only"))
    return both.unionByName(only_first).unionByName(only_second)


ACTIVE_USER_SET_OPS_SQL = """
WITH f AS (SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-16'),
s AS (SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-16')
SELECT user_id, 'both_halves' AS cohort FROM (SELECT user_id FROM f INTERSECT SELECT user_id FROM s)
UNION ALL
SELECT user_id, 'first_only' FROM (SELECT user_id FROM f EXCEPT SELECT user_id FROM s)
UNION ALL
SELECT user_id, 'second_only' FROM (SELECT user_id FROM s EXCEPT SELECT user_id FROM f)
"""


def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event annotated with the user's most recent
    click (backward-inclusive). One shuffle+sort per user_id — see
    operators/temporal.py for why this beats a range join at scale."""
    from kafka_cdc_hudi_spark.operators.dedup import latest_per_key
    from kafka_cdc_hudi_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = latest_per_key(
        e.filter(F.col("event_type") == "click").select("user_id", "ts", "value"),
        ["user_id", "ts"],
        order_col="value",  # deterministic pick among same-timestamp clicks
    )
    return asof_join(
        e.select("event_id", "user_id", "ts", "event_type"),
        clicks,
        on=["user_id"],
    )


ASOF_JOIN_SQL = """
WITH r AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) = 1
)
SELECT l.event_id, l.user_id, l.ts, l.event_type,
       r.ts AS asof_ts, r.value AS asof_value
FROM events l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi join + priority rollup —
    orders in a quarter with at least one lineitem shipped late (>60 days
    after the order date; the fixture lacks commit/receipt dates, so late
    shipment is the adapted existence predicate). The semi join build side
    is projected to (l_orderkey, l_shipdate) only; one shuffle on orderkey,
    then a tiny agg on the 5 priorities."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    lineitem filter (returnflag='R') pushed to the scan; orders><lineitem
    shuffles on orderkey; customer+nation broadcast; deterministic top-20
    via WindowGroupLimit-free global orderBy+limit (tiny result)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE-sum classification after a join —
    high/low-priority order counts per linestatus for a ship-year (the
    fixture lacks l_shipmode, so linestatus is the grouping leg). The CASE
    aggregates fold map-side; one shuffle on the tiny group key."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: single-row conditional ratio over a join — promo
    revenue share for one month. part is broadcast; the ratio is computed
    from two exact decimal sums in one aggregation pass."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast(DEC))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                             THEN CAST(l_extendedprice * (1 - l_discount) AS {DEC})
                             ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active week, distinct
    actives counted per subsequent week offset. Two shuffles total — one
    to find each user's cohort (min-agg, map-side partial), one for the
    (cohort, offset) distinct-user count; the user->cohort side is a
    broadcast at dimension scale and a shuffle join at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = e.select("user_id", week.alias("week")).distinct()
    return (
        active.join(first, "user_id")
        .withColumn("week_offset", (F.datediff("week", "cohort_week") / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


EVENTS_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


# -- TPC-H plan-shape completions (Q7/Q13/Q18/Q19/Q22 adapted to the ----------
# -- fixture schemas: no o_comment/c_phone/p_container/partsupp columns) ------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair revenue by ship year.
    Two aliases of the same dimension (nation as supplier-side and
    customer-side) both broadcast; lineitem><orders shuffles once on
    orderkey, everything downstream is broadcast-chained. The OR of the
    two (supp, cust) orientations is evaluated post-join on broadcast
    columns — no second shuffle."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    # two trading blocs, both orientations (the original uses two single
    # nations; single-pair volumes in the fixture are too thin to stay
    # non-vacuous at every SF, blocs of 3 are dense at all of them)
    bloc_a = ("NATION_1", "NATION_2", "NATION_3")
    bloc_b = ("NATION_10", "NATION_11", "NATION_12")
    pair = (
        F.col("supp_nation").isin(*bloc_a) & F.col("cust_nation").isin(*bloc_b)
    ) | (F.col("supp_nation").isin(*bloc_b) & F.col("cust_nation").isin(*bloc_a))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND n2.n_name IN ('NATION_10', 'NATION_11', 'NATION_12'))
    OR (n1.n_name IN ('NATION_10', 'NATION_11', 'NATION_12')
          AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer distribution INCLUDING
    zero-order customers — the left-outer-join-then-histogram pattern.
    (The original excludes orders by o_comment pattern; the fixture has no
    comment column, so the excluded class is '1-URGENT' priority.)
    One shuffle joins customer with filtered orders on custkey, the
    per-custkey count reuses that partitioning, and the histogram agg
    moves at most one row per distinct count value per partition."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""

#: Q18 quantity threshold — ~99th percentile of per-order quantity sums in
#: the fixture (qty/order p99 ~= 270), so the result is non-empty yet
#: selective at every SF
_Q18_MIN_QTY = 250


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate used as a join filter
    (large-volume orders). The lineitem agg and the orders join share the
    orderkey partitioning — one shuffle; the surviving order set is tiny
    (>threshold ~= top 1%), so AQE broadcasts it into orders; customer is
    a broadcast dim."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) > {_Q18_MIN_QTY})
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY 1, 2, 3, 4, 5
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand/size from part, quantity from lineitem).
    part broadcasts; the disjunction evaluates post-join in one codegen
    stage. The common `l_quantity <= 30` envelope is ALSO stated as a
    conjunct so a derivable range predicate reaches the lineitem scan even
    though the full disjunction can't be pushed."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 30)
    p = load_table(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q19_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem, part
WHERE l_partkey = p_partkey AND l_quantity <= 30
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a share-of-total per group — conditional aggregation
    over a multi-dimension join slice (orders of ASIA customers for ECONOMY
    parts, 1996-97), the NATION_1-3 supplier bloc's volume share per order
    year (bloc, not single nation — q7's calibration: single-nation slices
    go empty at sf0.001).
    Two nation roles again (customer side restricts via region, supplier
    side names the numerator); every dimension broadcasts, lineitem><orders
    is the only shuffle, and the share is one conditional-decimal-sum
    aggregation — no second pass, no self-join. Decimal sums -> one double
    division keeps the ratio bit-identical cross-engine."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    target_vol = F.when(
        F.col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3"), vol
    ).otherwise(F.lit(0).cast(DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(target_vol).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
                     THEN CAST(l_extendedprice * (1 - l_discount) AS {DEC})
                     ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE)
         AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS total_volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group aggregate used as a correlated threshold
    (lines below 20% of their part's average quantity). Decorrelated the
    way Catalyst would: one partkey agg over lineitem, joined back on
    partkey — the agg and the probe share the partkey partitioning, so the
    subquery costs ONE extra shuffle-free stage; the part dimension
    broadcast-filters both sides. The threshold is decimal-exact
    (sum/count then one double multiply), so the flagged set and the final
    sum hash-match cross-engine."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    avg_q = (
        l.groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*")).alias(
                "avg_qty"
            )
        )
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_q, l.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = f"""
WITH avg_q AS (
  SELECT l_partkey AS t_partkey,
         CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_q ON t_partkey = l_partkey
WHERE p_brand = 'Brand#5' AND l_quantity < 0.2 * avg_qty
"""


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery feeding a filter, plus
    an anti join (rich customers with no COMPLETED order, per nation — the
    fixture has no c_phone, so nationkey stands in for the country code,
    and every customer has >=1 order so the anti join is against the 'F'
    status slice, same calibration as customers_without_orders).
    The scalar avg is one tiny agg broadcast into the filter; the anti
    join shuffles on custkey only for the filtered (small) build side —
    AQE converts it to broadcast-anti at dimension scale. Decimal avg ->
    double on both engines, so the threshold compare is bit-identical."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum("c_acctbal", "totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_nationkey
"""


# -- pipeline data-quality surface --------------------------------------------


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout — the two-proportion z-test every product
    pipeline runs: users are split into variants by a salted
    deterministic hash (never ``user_id % 2`` — ids correlate with
    signup cohorts), per-user conversion is a SCALE-FREE metric (purchase
    share above the 1/5 uniform expectation — ">= 1 purchase" saturates
    to 100% as events-per-user grows with SF and degenerates the pooled
    variance), and the one-row readout carries exact integer exposures/
    conversions/ppm rates plus the pooled z statistic (NULL when pooled
    p is degenerate, guarded identically in both dialects). The z is the
    only float and both dialects compute it with the identical
    IEEE-double expression tree, so even it is hash-oracled. One scan +
    one user agg + one 1-row agg; at 100 TB the user agg's map-side
    combine makes shuffle volume ~users, not ~events."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) * 5
            > F.count(F.lit(1))
        )
        .cast("int")
        .alias("conv")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|ab_v1"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    a = u.withColumn("is_a", (bucket == 0).cast("long"))
    s = a.agg(
        F.sum("is_a").alias("n_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
        F.sum(F.col("is_a") * F.col("conv")).alias("conv_a"),
        F.sum((1 - F.col("is_a")) * F.col("conv")).alias("conv_b"),
    )
    z = (
        "CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL"
        " ELSE (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) END"
    )
    return s.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("conv_a * 1000000 DIV n_a").alias("rate_a_ppm"),
        F.expr("conv_b * 1000000 DIV n_b").alias("rate_b_ppm"),
        F.expr(z).alias("z_score"),
    )


EVENTS_AB_TEST_SQL = """
WITH u AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
                   > COUNT(*) THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
a AS (
  SELECT CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || '|ab_v1'), 1, 15))
                   AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS is_a,
         conv
  FROM u
),
s AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b,
         CAST(SUM(is_a * conv) AS BIGINT) AS conv_a,
         CAST(SUM((1 - is_a) * conv) AS BIGINT) AS conv_b
  FROM a
)
SELECT n_a, n_b, conv_a, conv_b,
       CAST((conv_a * 1000000) // n_a AS BIGINT) AS rate_a_ppm,
       CAST((conv_b * 1000000) // n_b AS BIGINT) AS rate_b_ppm,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL
            ELSE (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) END AS z_score
FROM s
"""


def events_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style table profile in ONE scan: row count, per-column null
    counts, exact distinct cardinalities, min/max ranges, and derived
    constraint verdicts (pk uniqueness, completeness). The multi-distinct
    agg plans as a single pass with Expand (3 distinct groups) — the
    standard profile plan; at 100 TB you'd swap exact distincts for the
    HLL sketch variant (events_sketches) and keep this exact pass for
    audits."""
    e = load_table(spark, sf_dir, "events")

    def nulls(c: str):
        return F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")

    return e.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.countDistinct("event_id")).alias("n_event_id_dupes"),
        nulls("ts"),
        nulls("user_id"),
        nulls("event_type"),
        nulls("value"),
        nulls("props"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ).withColumns(
        {
            "pk_unique": F.col("n_event_id_dupes") == 0,
            "value_complete": F.col("nulls_value") == 0,
        }
    )


EVENTS_DATA_PROFILE_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(*) - COUNT(DISTINCT event_id) AS n_event_id_dupes,
       COUNT(CASE WHEN ts IS NULL THEN 1 END) AS nulls_ts,
       COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS nulls_user_id,
       COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS nulls_event_type,
       COUNT(CASE WHEN value IS NULL THEN 1 END) AS nulls_value,
       COUNT(CASE WHEN props IS NULL THEN 1 END) AS nulls_props,
       COUNT(DISTINCT event_type) AS n_event_types,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       MIN(ts) AS min_ts,
       MAX(ts) AS max_ts,
       COUNT(*) - COUNT(DISTINCT event_id) = 0 AS pk_unique,
       COUNT(CASE WHEN value IS NULL THEN 1 END) = 0 AS value_complete
FROM events
"""

#: z-score threshold — calibrated on the fixture's per-type value tails
#: (|z| > 2.5 flags ~2-3% of events at every SF, non-vacuous and selective)
_ZSCORE_FLAG = 2.5


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging: per event_type moments in one
    agg pass, broadcast back, flag |z| > threshold. Moments come from
    EXACT decimal sums (sum and sum-of-squares), so mean/variance — and
    therefore every z — are bit-identical across engines and
    partitionings; the flagged subset hash-matches. Two scans of events
    but only ONE shuffle (the tiny per-type moment agg); the join back is
    a broadcast."""
    e = load_table(spark, sf_dir, "events")
    sq = (F.col("value") * F.col("value")).cast(DEC)
    stats = (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("s"),
            F.sum(sq).alias("s2"),
        )
        .withColumn("mean", F.col("s").cast("double") / F.col("n"))
        .withColumn(
            "var",
            F.col("s2").cast("double") / F.col("n") - F.col("mean") * F.col("mean"),
        )
        .select("event_type", "mean", "var")
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.col("var") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > _ZSCORE_FLAG)
        .select("event_id", "event_type", "value", "z")
    )


EVENTS_ANOMALY_ZSCORE_SQL = f"""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*) AS mean,
         CAST(SUM(CAST(value * value AS {DEC})) AS DOUBLE) / COUNT(*)
           - (CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*))
             * (CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(*)) AS var
  FROM events GROUP BY event_type
)
SELECT event_id, event_type, value, (value - mean) / sqrt(var) AS z
FROM events JOIN stats USING (event_type)
WHERE var > 0 AND abs((value - mean) / sqrt(var)) > {_ZSCORE_FLAG}
"""


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles by the NEAREST-RANK method: p50/p90/p99
    of value per event_type are actual data elements selected at rank
    ``ceil(p*n)``, not interpolated — interpolation arithmetic is the one
    place exact-percentile implementations differ across engines, so
    element selection is the determinism-safe contract (the approximate
    path for 100-TB interactive use is events_sketches' KLL quantiles).

    One shuffle + per-group sort (the same Window sort the top-k family
    pays); rank predicates collapse to three element picks per group."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = e.select("event_type", "value", "event_id").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(Window.partitionBy("event_type")))

    def pick(p: float):
        # nearest-rank: smallest rn >= ceil(p*n)
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("value"))
        )

    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        pick(0.5).alias("p50"),
        pick(0.9).alias("p90"),
        pick(0.99).alias("p99"),
    )


EVENTS_VALUE_PERCENTILES_SQL = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       MAX(n) AS n_events,
       MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
FROM r
GROUP BY event_type
"""


def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-analytics pass: per customer
    recency (latest order date), frequency (order count), monetary (exact
    decimal total), then quintile scores via ``ntile`` with a full
    deterministic ordering (metric + custkey tiebreak, so both engines
    assign identical tiles). One shuffle for the per-customer agg; the
    three ntile windows run over the already-small customer aggregate —
    global ntile is a single-partition sort, fine at dimension scale; if
    the entity table itself outgrows one partition, the scale path is
    boundary-based scoring (quantile thresholds from the sketch family)
    instead of exact global ranking."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        _dsum("o_totalprice", "monetary"),
    )
    tile = lambda col, desc: F.ntile(5).over(  # noqa: E731
        Window.orderBy(
            (F.col(col).desc() if desc else F.col(col).asc()),
            F.col("o_custkey").asc(),
        )
    )
    return per_cust.select(
        F.col("o_custkey").alias("custkey"),
        "last_order",
        "frequency",
        "monetary",
        tile("last_order", True).alias("r_score"),
        tile("frequency", True).alias("f_score"),
        tile("monetary", True).alias("m_score"),
    )


CUSTOMERS_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey AS custkey, last_order, frequency, monetary,
       CAST(ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS INT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
FROM per_cust
"""


def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU: exact distinct actives over trailing 1/7/28-day
    windows per observation day — the canonical engagement rollup.
    Shape: reduce to distinct (day, user) FIRST (the only fact-sized
    shuffle), then a bounded 28x explode attributes each active day to
    the windows it can serve, and one conditional-distinct agg (single
    Expand pass) produces all three horizons at once — no per-horizon
    re-scan, no self-join range explosion. Observation days are
    restricted to days with data (left-semi against the day set)."""
    e = load_table(spark, sf_dir, "events")
    day_user = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    days = day_user.select("day").distinct()
    x = day_user.select(
        "day", "user_id", F.explode(F.sequence(F.lit(0), F.lit(27))).alias("k")
    ).select(
        F.date_add(F.col("day"), F.col("k")).alias("obs_day"), "user_id", "k"
    )
    x = x.join(days.withColumnRenamed("day", "obs_day"), "obs_day", "left_semi")
    # timestamp output: pandas renders DATE cells differently per engine,
    # timestamps identically (same convention as the cohort entries)
    x = x.withColumn("obs_day", F.col("obs_day").cast("timestamp"))
    return x.groupBy("obs_day").agg(
        F.countDistinct(F.when(F.col("k") == 0, F.col("user_id"))).alias("dau"),
        F.countDistinct(F.when(F.col("k") < 7, F.col("user_id"))).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    )


EVENTS_ACTIVE_ROLLING_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
x AS (
  SELECT du.day + CAST(k AS INT) AS obs_day, du.user_id, k
  FROM du, LATERAL unnest(range(0, 28)) t(k)
)
SELECT CAST(obs_day AS TIMESTAMP) AS obs_day,
       COUNT(DISTINCT CASE WHEN k = 0 THEN user_id END) AS dau,
       COUNT(DISTINCT CASE WHEN k < 7 THEN user_id END) AS wau,
       COUNT(DISTINCT user_id) AS mau
FROM x
WHERE obs_day IN (SELECT day FROM days)
GROUP BY 1
"""


def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users exhibit both (plus each type's user count and
    the Jaccard overlap) — the association-mining primitive. Shape: reduce
    to distinct (user, type) FIRST, then the pair join runs per user over
    that tiny per-user type set (<= |type vocabulary|, here 5) — the
    self-join is bounded by vocabulary^2 per user, never |events|^2; the
    final pair agg moves one row per (user, pair). Jaccard = |both| /
    (|a| + |b| - |both|) from exact integer counts."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("a.event_type") < F.col("b.event_type")))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    pa = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    pb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


EVENTS_TYPE_COOCCURRENCE_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
per_type AS (SELECT event_type, COUNT(*) AS n_users FROM ut GROUP BY 1)
SELECT type_a, type_b, n_both,
       pa.n_users AS n_a, pb.n_users AS n_b,
       CAST(n_both AS DOUBLE) / (pa.n_users + pb.n_users - n_both) AS jaccard
FROM pairs
JOIN per_type pa ON pa.event_type = type_a
JOIN per_type pb ON pb.event_type = type_b
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each ordered pair of
    event types, how often a user's event of type A is IMMEDIATELY
    followed by one of type B, with the row-normalized transition
    probability — the sequence-model / next-action primitive (ordered
    time-adjacent bigrams, vs the set-overlap co-occurrence entry).
    One shuffle + per-user time sort for ``lag``, a vocabulary-sized pair
    agg, and a broadcast join against per-source totals; probability is
    one exact long/long double division."""
    e = load_table(spark, sf_dir, "events")
    us = epoch_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    bigrams = (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = bigrams.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return bigrams.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
    )


EVENTS_MARKOV_SQL = """
WITH b AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM (
    SELECT user_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS from_type,
           event_type AS to_type
    FROM events
  )
  WHERE from_type IS NOT NULL
  GROUP BY 1, 2
),
t AS (SELECT from_type, SUM(n) AS n_from FROM b GROUP BY 1)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n_from AS BIGINT) AS n_from,
       CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
FROM b JOIN t USING (from_type)
"""


# --------------------------------------------------------------------------
# TPC-H completion set (q2/q9/q11/q15/q16/q20/q21) — the seven shapes the
# fixture schema previously lacked driver entries for. The fixture has no
# partsupp table and no commit/receipt dates, so q2/q9/q11/q16/q20 derive
# their supply relation from lineitem and q21 blames the LAST-shipping
# supplier instead of the late-delivering one; each adaptation is noted on
# the query. With these, all 22 TPC-H query shapes are implemented.
# --------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery (cheapest supplier per part).
    Adapted: no partsupp — the supply relation is the min observed unit
    price (l_extendedprice/l_quantity, an exactly-rounded IEEE division so
    both engines agree bit-for-bit) per (part, supplier) from lineitem,
    restricted to EUROPE suppliers. Plan: per-(part,supp) agg -> per-part
    min -> equality join-back, ALL sharing the partkey partitioning (one
    shuffle); supplier/nation/region and part are broadcast dims."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = load_table(spark, sf_dir, "lineitem")
    supply = (
        l.join(F.broadcast(s.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # rename the group key before the self-join: supply and cheapest share
    # lineage, and an un-renamed l_partkey == l_partkey resolves to the SAME
    # attribute (trivially true) instead of a join condition
    cheapest = (
        supply.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "ck_partkey")
    )
    return (
        supply.join(
            cheapest,
            (F.col("l_partkey") == F.col("ck_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .drop("ck_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
    )


Q2_SQL = """
WITH supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem, supplier, nation, region
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY 1, 2),
cheapest AS (SELECT partkey, MIN(unit_cost) AS min_cost FROM supply GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_cost
FROM supply, cheapest, part, supplier, nation
WHERE supply.partkey = cheapest.partkey AND supply.unit_cost = cheapest.min_cost
  AND supply.partkey = p_partkey AND supply.suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND p_type = 'STANDARD'
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: multi-join profit rollup by (nation, order year).
    Adapted: no partsupp, so the cost term is 0.6 * p_retailprice *
    l_quantity instead of ps_supplycost * l_quantity (same expression
    shape, documented constant margin). lineitem><orders shuffles once on
    orderkey; part (name-filtered), supplier, nation all broadcast; the
    profit measure folds in one decimal-sum pass."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(profit, "sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS {DEC})) AS DOUBLE) AS sum_profit
FROM lineitem, orders, part, supplier, nation
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
GROUP BY 1, 2
"""

#: Q11 importance multiple: a part is "important" if its slice value
#: exceeds this multiple of the AVERAGE per-part slice value. Relative to
#: the average (not an absolute fraction of the total, which inverts
#: selectivity as the part count grows with SF), so the cut stays selective
#: yet non-empty at every scale factor.
_Q11_AVG_MULTIPLE = 1.5


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group value with a scalar-subquery HAVING (parts
    whose inventory value exceeds a fraction of the total). Adapted: no
    partsupp — value is the discounted revenue per part shipped by ASIA
    suppliers. One shuffle for the per-part agg; the slice total is a
    1-row aggregate broadcast into the filter (same shape as q22's scalar
    avg); supplier/nation/region broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    sliced = l.join(
        F.broadcast(s.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = sliced.groupBy("l_partkey").agg(_dsum(rev, "part_value"))
    avg_val = per_part.agg(
        (F.sum(F.col("part_value").cast(DEC)).cast("double") / F.count("*")).alias(
            "avg_part_value"
        )
    )
    return (
        per_part.join(F.broadcast(avg_val))
        .filter(F.col("part_value") > F.col("avg_part_value") * _Q11_AVG_MULTIPLE)
        .select("l_partkey", "part_value")
    )


Q11_SQL = f"""
WITH sliced AS (
  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem, supplier, nation, region
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = 'ASIA'),
per_part AS (
  SELECT l_partkey, CAST(SUM(CAST(rev AS {DEC})) AS DOUBLE) AS part_value
  FROM sliced GROUP BY 1)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS {DEC})) AS DOUBLE) / COUNT(*)
                    FROM per_part) * {_Q11_AVG_MULTIPLE!r}
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view-style revenue-per-supplier aggregate joined
    against its own MAX (the top supplier, ties preserved). Both the
    per-supplier agg and the 1-row max are decimal-sum exact, so the
    equality join on the double revenue is deterministic in both engines.
    One shuffle (suppkey agg); the max is broadcast; supplier broadcast."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("max_revenue"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, s_acctbal, total_revenue
FROM revenue, supplier
WHERE l_suppkey = s_suppkey
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

#: Q16 supplier blacklist: the "customer complaints" proxy — suppliers in
#: the bottom acctbal band are excluded via an anti-join (balances are
#: ~uniform on [0, 10k] at every SF, so the band stays ~20% of suppliers)
_Q16_COMPLAINT_BAL = 2000.0


def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier-variety count per part attribute triple
    with a NOT-IN supplier blacklist. Adapted: the part-supplier relation
    comes from lineitem, and "complaint" suppliers are the low-acctbal
    band. Plan: broadcast anti-join removes blacklisted suppliers before
    the shuffle; part is a broadcast dim; the COUNT(DISTINCT suppkey)
    expands once on the (brand, type, size) key."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < _Q16_COMPLAINT_BAL
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < {_Q16_COMPLAINT_BAL!r})
GROUP BY 1, 2, 3
"""


def q20_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers flagged by a quantity-threshold subquery
    over their shipped parts (the availqty > 0.5 * shipped-qty pattern).
    Adapted: no partsupp — a (supplier, part) pair is "excess" when its
    1996 shipped quantity of widget parts exceeds 2x the average pair
    quantity, a self-scaling threshold (absolute cutoffs invert selectivity
    as SF grows). Plan: one shuffle for the pair agg; the scalar avg is
    broadcast into the filter; the surviving supplier set semi-joins the
    AFRICA supplier dim (broadcast)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pairs = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(_dsum("l_quantity", "pair_qty"))
    )
    avg_qty = pairs.agg(
        (F.sum(F.col("pair_qty").cast(DEC)).cast("double") / F.count("*")).alias("avg_pair_qty")
    )
    excess = (
        pairs.join(F.broadcast(avg_qty))
        .filter(F.col("pair_qty") > F.col("avg_pair_qty") * 2.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


Q20_SQL = f"""
WITH pairs AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS pair_qty
  FROM lineitem, part
  WHERE l_partkey = p_partkey AND p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2)
SELECT s_name, s_acctbal
FROM supplier, nation, region
WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'AFRICA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM pairs
    WHERE pair_qty > (SELECT CAST(SUM(CAST(pair_qty AS {DEC})) AS DOUBLE) / COUNT(*)
                      FROM pairs) * 2.0)
"""


def q21_last_shipper_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the exists/not-exists dual over a fact self-
    reference (suppliers solely responsible for holding up multi-supplier
    'F' orders). Adapted: the fixture has no commit/receipt dates, so
    "kept the order waiting" = this supplier's latest line shipped LAST in
    the order and no other supplier shipped that late. Plan: the per-order
    and per-(order, supplier) aggregates and their recombination all share
    the orderkey partitioning — one fact shuffle total; the final per-
    supplier count is a tiny agg joined against the AMERICA supplier
    broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    f = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = f.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.max("smax").alias("omax"),
        F.count(F.lit(1)).alias("nsupp"),
    )
    joined = per_supp.join(per_order, "l_orderkey")
    at_max = joined.filter(F.col("smax") == F.col("omax"))
    cmax = at_max.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_at_max"))
    blamed = (
        at_max.filter(F.col("nsupp") > 1)
        .join(cmax, "l_orderkey")
        .filter(F.col("n_at_max") == 1)
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
    )


Q21_SQL = """
WITH f AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_supp AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax FROM f GROUP BY 1, 2),
per_order AS (
  SELECT l_orderkey, MAX(smax) AS omax, COUNT(*) AS nsupp FROM per_supp GROUP BY 1),
at_max AS (
  SELECT ps.l_orderkey, ps.l_suppkey, po.nsupp
  FROM per_supp ps JOIN per_order po USING (l_orderkey)
  WHERE ps.smax = po.omax),
cmax AS (SELECT l_orderkey, COUNT(*) AS n_at_max FROM at_max GROUP BY 1),
blamed AS (
  SELECT am.l_suppkey
  FROM at_max am JOIN cmax USING (l_orderkey)
  WHERE am.nsupp > 1 AND cmax.n_at_max = 1)
SELECT s_name, COUNT(*) AS numwait
FROM blamed, supplier, nation, region
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'AMERICA'
GROUP BY 1
"""


ANALYTICS_QUERIES: dict[str, tuple] = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_part_supplier_variety": (q16_part_supplier_variety, Q16_SQL),
    "q20_excess_quantity_suppliers": (q20_excess_quantity_suppliers, Q20_SQL),
    "q21_last_shipper_blame": (q21_last_shipper_blame, Q21_SQL),
    "events_type_cooccurrence": (events_type_cooccurrence, EVENTS_TYPE_COOCCURRENCE_SQL),
    "events_markov_transitions": (events_markov_transitions, EVENTS_MARKOV_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "events_active_users_rolling": (events_active_users_rolling, EVENTS_ACTIVE_ROLLING_SQL),
    "events_value_percentiles": (events_value_percentiles, EVENTS_VALUE_PERCENTILES_SQL),
    "customers_rfm_segments": (customers_rfm_segments, CUSTOMERS_RFM_SQL),
    "events_data_profile": (events_data_profile, EVENTS_DATA_PROFILE_SQL),
    "events_ab_test": (events_ab_test, EVENTS_AB_TEST_SQL),
    "events_anomaly_zscore": (events_anomaly_zscore, EVENTS_ANOMALY_ZSCORE_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "asof_join_last_click": (asof_join_last_click, ASOF_JOIN_SQL),
    "events_rollup": (events_rollup, EVENTS_ROLLUP_SQL),
    "customers_without_orders": (customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL),
    "events_user_cumsum": (events_user_cumsum, EVENTS_USER_CUMSUM_SQL),
    "events_pivot_user_counts": (events_pivot_user_counts, EVENTS_PIVOT_SQL),
    "events_cube": (events_cube, EVENTS_CUBE_SQL),
    "active_user_set_ops": (active_user_set_ops, ACTIVE_USER_SET_OPS_SQL),
    "big_orders_semi_join": (big_orders_semi_join, BIG_ORDERS_SEMI_SQL),
    "range_join_post_purchase": (range_join_post_purchase, RANGE_JOIN_SQL),
    "events_sketches": (events_sketches, EVENTS_SKETCHES_SQL),
    "events_cms_heavy_hitters": (events_cms_heavy_hitters, EVENTS_CMS_SQL),
    "orders_price_percentile_rank": (orders_price_percentile_rank, ORDERS_PRICE_PCTRANK_SQL),
    "events_kmv_distinct_rollup": (events_kmv_distinct_rollup, EVENTS_KMV_SQL),
    "user_activity_reconciliation": (
        user_activity_reconciliation,
        USER_ACTIVITY_RECONCILIATION_SQL,
    ),
    "events_props_json_stats": (events_props_json_stats, EVENTS_PROPS_JSON_SQL),
    "parts_cooccurrence": (parts_cooccurrence, PARTS_COOCCURRENCE_SQL),
    "dataset_weighted_sample": (dataset_weighted_sample, DATASET_WEIGHTED_SAMPLE_SQL),
    "events_daily_ohlc": (events_daily_ohlc, EVENTS_DAILY_OHLC_SQL),
    "events_retention_cohorts": (events_retention_cohorts, EVENTS_RETENTION_SQL),
    "events_hll_mergeable_rollup": (events_hll_mergeable_rollup, EVENTS_HLL_ROLLUP_SQL),
    "events_histogram_quantile_rollup": (
        events_histogram_quantile_rollup,
        EVENTS_HISTOGRAM_QUANTILE_SQL,
    ),
    "events_funnel_conversions": (events_funnel_conversions, EVENTS_FUNNEL_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q12_priority_by_linestatus": (q12_priority_by_linestatus, Q12_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "events_hourly_agg": (events_hourly_agg, EVENTS_HOURLY_SQL),
    "topk_orders_per_customer": (topk_orders_per_customer, TOPK_ORDERS_SQL),
    "events_type_stats": (events_type_stats, EVENTS_TYPE_STATS_SQL),
    "customers_per_region": (customers_per_region, CUSTOMERS_PER_REGION_SQL),
    "global_counts": (global_counts, GLOBAL_COUNTS_SQL),
}
