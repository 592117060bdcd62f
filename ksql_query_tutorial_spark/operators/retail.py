"""Warehouse feature-engineering over the order tables: RFM customer
segmentation and market-basket co-purchase lift.

Both are the classic "derive training features from the fact tables"
ops a commerce pipeline feeds to downstream models — the relational
twins of the corpus ops (RFM ↔ quality scoring, basket lift ↔
co-occurrence PMI).

Scale design:
- ``rfm_segments``: ONE full-data exchange (the per-customer rollup);
  the date horizon and the three quintile-boundary rows are tiny
  aggregates broadcast back over the customer table. Quintile scores
  come from comparisons against interpolated ``percentile`` boundaries
  (Spark ``percentile`` == DuckDB ``quantile_cont``, the q26 parity),
  NOT from an ``ntile`` window — ntile global-sorts the whole customer
  table through one task; boundary comparison is embarrassingly
  parallel and gives identical buckets up to boundary ties.
- ``basket_pairs``: the self-join is keyed on the order id, so both
  sides share one exchange (ReusedExchange on the same scan) and pair
  fan-out is bounded by items-per-order² — never corpus-quadratic.
  Per-item counts are a bounded aggregate broadcast for the lift
  denominator. ``min_pair_count`` prunes the long tail before the
  join with the counts table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Recency / Frequency / Monetary quintile scores per customer.

    Recency is days from the customer's last order to the corpus-wide
    latest order date; frequency is the order count; monetary the
    total spend. Each metric is scored 1-5 by comparison against its
    own interpolated quintile boundaries (score = 1 + #boundaries
    strictly below the value; recency scores 5 for the most RECENT
    customers). ``segment`` concatenates r, f, m — "555" is the best
    customer.

    Returns ``custkey, recency_days, n_orders, total_spend (rounded
    6), r_score, f_score, m_score, segment``.
    """
    per_cust = (
        orders.groupBy(F.col(cust_col).alias("custkey"))
        .agg(
            F.max(F.col(date_col).cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(amount_col), 6).alias("total_spend"),
        )
    )
    horizon = orders.agg(
        F.max(F.col(date_col).cast("date")).alias("__maxd")
    )
    with_rec = per_cust.crossJoin(F.broadcast(horizon)).select(
        "custkey",
        F.datediff(F.col("__maxd"), F.col("last_order")).cast("long").alias(
            "recency_days"
        ),
        "n_orders",
        "total_spend",
    )

    qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    bounds = with_rec.agg(
        F.expr(f"percentile(recency_days, {qs})").alias("rb"),
        F.expr(f"percentile(n_orders, {qs})").alias("fb"),
        F.expr(f"percentile(total_spend, {qs})").alias("mb"),
    )

    def score(col: str, bcol: str) -> F.Column:
        s = F.lit(1)
        for i in range(1, 5):
            s = s + F.when(
                F.col(col).cast("double") > F.element_at(F.col(bcol), i), 1
            ).otherwise(0)
        return s.cast("int")

    scored = with_rec.crossJoin(F.broadcast(bounds)).select(
        "custkey",
        "recency_days",
        "n_orders",
        "total_spend",
        # recency inverts: small days-since = high score
        (F.lit(6) - score("recency_days", "rb")).cast("int").alias("r_score"),
        score("n_orders", "fb").alias("f_score"),
        score("total_spend", "mb").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws("", "r_score", "f_score", "m_score"),
    )


def basket_pairs(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_pair_count: int = 2,
) -> DataFrame:
    """Co-purchase pair counts + lift over order baskets: for parts a <
    b bought in the same order, ``lift = P(a,b) / (P(a)·P(b))`` with
    probabilities over the order universe — the association-rule
    screen (and the retail twin of corpus_cooccurrence's PMI).

    Scale design — two rewrites were A/B-measured and REJECTED, so
    this keeps the straightforward shape deliberately: (1) a C(k, 2)
    in-codegen pair expansion over per-order item arrays (the
    graph.copurchase_edges shape) ran ~25% slower — unlike the
    support-filtered edge case, every consumer here (order count,
    item counts, pairs) needs a different reduction of the basket,
    so the collect_set aggregation is pure overhead; (2) persist()-ing
    the distinct basket to kill the audit-visible triple scan ran
    ~40% slower — the self-join already recycles the distinct's
    exchange via ReusedExchange, the extra consumers re-run only
    narrow two-column scans, and the cache materialization serializes
    a sub-second query. The expensive shuffle is thus executed once
    either way; the repeated work is the most parallel, prefetchable
    stage (pruned scans). The r7 scan-audit A/B re-confirmed the
    persist rejection at two scales: 1.50× at sf0.1, 1.93× at sf1
    (STRESS.md r7 scan-audit burn-down).

    Returns ``item_a, item_b, n_orders_pair, n_a, n_b, lift (rounded
    6)`` for pairs seen in ≥ ``min_pair_count`` orders.
    """
    basket = lineitem.select(
        F.col(order_col).alias("oid"), F.col(item_col).alias("item")
    ).distinct()
    n_orders = basket.groupBy().agg(
        F.countDistinct("oid").alias("__n")
    )
    item_counts = basket.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(b, (F.col("a.oid") == F.col("b.oid"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders_pair"))
        .filter(F.col("n_orders_pair") >= min_pair_count)
    )
    return (
        pairs.join(
            F.broadcast(item_counts.withColumnRenamed("item", "item_a")
                        .withColumnRenamed("n_item", "n_a")),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.withColumnRenamed("item", "item_b")
                        .withColumnRenamed("n_item", "n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a", "item_b", "n_orders_pair", "n_a", "n_b",
            F.round(
                F.col("n_orders_pair").cast("double")
                * F.col("__n").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


def fulfillment_cycle(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Order fulfillment cycle-time analytics: per order-month, the
    distribution of days from order date to first and last line-item
    shipment — the operations-dashboard rollup behind SLA tracking
    (and the relational sibling of the event-analytics rollups).

    Plan: the per-order ship bounds are ONE orderkey-keyed aggregate
    over lineitem; the join back to orders is orderkey-equi (AQE picks
    broadcast or sort-merge by size); the monthly rollup's exchange
    carries |months| cells of integer-day partials — exact sums, so
    the averages are order-independent.

    Returns ``month, n_orders, avg_days_first_ship,
    avg_days_last_ship, max_days_last_ship`` per order month.
    """
    bounds = lineitem.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
    )
    joined = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("odate"),
    ).join(bounds, "okey")
    d_first = F.datediff("first_ship", "odate").cast("long")
    d_last = F.datediff("last_ship", "odate").cast("long")
    return (
        joined.groupBy(F.date_trunc("month", "odate").cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg(d_first), 6).alias("avg_days_first_ship"),
            F.round(F.avg(d_last), 6).alias("avg_days_last_ship"),
            F.max(d_last).alias("max_days_last_ship"),
        )
    )


def top_customers_per_nation(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    n: int = 3,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-``n`` customers by lifetime revenue per nation — the
    canonical top-k-per-group analytic, built as a HIERARCHICAL top-k
    so no single task ever sorts a whole nation's customers.

    Plan: one custkey-keyed revenue rollup over orders (map-side
    partials), an equi-join to the customer dim on the same key, a
    broadcast of the 25-row nation dim, then TWO bounded rank windows:
    first within (nation, salt) — ``salt_buckets``× smaller sorts, and
    the overall top-n per nation provably survives every salt split —
    then a final rank over the <= n·salt_buckets survivors per nation.
    At 100 TB the per-window sort is |customers| / (25·salt_buckets)
    rows instead of |customers| / 25. Revenue is rounded to 6 BEFORE
    ranking and custkey breaks ties, so order is total and
    engine-independent.

    Returns ``nation, rank, custkey, c_name, revenue, n_orders``.
    """
    from pyspark.sql import Window

    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    cust = customer.select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_nationkey"
    )
    dim = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation"),
        )
    )
    joined = rev.join(cust, "custkey").join(dim, "c_nationkey")
    salted = joined.withColumn(
        "_salt", F.pmod(F.xxhash64("custkey"), F.lit(salt_buckets))
    )
    w_local = Window.partitionBy("nation", "_salt").orderBy(
        F.desc("revenue"), F.asc("custkey")
    )
    cand = (
        salted.withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= n)
    )
    w_final = Window.partitionBy("nation").orderBy(
        F.desc("revenue"), F.asc("custkey")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rank") <= n)
        .select("nation", "rank", "custkey", "c_name", "revenue", "n_orders")
    )


def revenue_pareto(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue-concentration (Pareto) report per region: how much of
    the revenue the top decile of customers carries, and how few
    customers cover 80% of it.

    Plan: revenue collapses to ONE row per customer (custkey rollup,
    map-side partials) before anything orders-sized touches a window;
    nation+region are broadcast onto the customer dim; the running
    share is a cumulative window over the per-region CUSTOMER
    aggregate, ordered totally (rounded revenue desc, custkey). The
    region totals come from max(cum) — the cumulative sum's own final
    value — so Spark and the oracle sum in the IDENTICAL order and the
    doubles agree bitwise; the 5-row totals broadcast back for the
    threshold comparison. At extreme scale the per-region window input
    is |customers|/|regions| rows (already 3-4 orders of magnitude
    below the fact table); range-partitioned prefix sums (the
    pack_sequences pattern) are the documented next step if that ever
    dominates.

    Returns ``region, n_customers, total_revenue, top_decile_share,
    n_for_80pct, pct_for_80pct`` (shares rounded 6).
    """
    from pyspark.sql import Window

    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 6).alias("revenue")
    )
    geo = (
        customer.select(F.col("c_custkey").alias("custkey"), "c_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .join(
            F.broadcast(
                region.select(
                    F.col("r_regionkey").alias("n_regionkey"),
                    F.col("r_name").alias("region"),
                )
            ),
            "n_regionkey",
        )
        .select("custkey", "region")
    )
    per_cust = rev.join(geo, "custkey")
    w = Window.partitionBy("region").orderBy(F.desc("revenue"), F.asc("custkey"))
    ranked = per_cust.select(
        "region",
        "revenue",
        F.row_number().over(w).alias("rnk"),
        F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    stats = ranked.groupBy("region").agg(
        F.max("cum").alias("total"), F.count(F.lit(1)).alias("n_customers")
    )
    joined = ranked.join(F.broadcast(stats), "region")
    return (
        joined.groupBy("region", "total", "n_customers")
        .agg(
            F.max(
                F.when(
                    F.col("rnk") == F.floor((F.col("n_customers") + 9) / 10),
                    F.col("cum"),
                )
            ).alias("_top_rev"),
            F.sum(
                F.when(
                    F.col("cum") - F.col("revenue") < F.lit(0.8) * F.col("total"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_for_80pct"),
        )
        .select(
            "region",
            "n_customers",
            F.round("total", 6).alias("total_revenue"),
            F.round(F.col("_top_rev") / F.col("total"), 6).alias(
                "top_decile_share"
            ),
            "n_for_80pct",
            F.round(
                F.col("n_for_80pct") / F.col("n_customers").cast("double"), 6
            ).alias("pct_for_80pct"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    limit: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: revenue of not-yet-shipped orders for one market
    segment, top-N by revenue — the classic filtered
    dim ⋈ fact ⋈ fact rollup.

    Scale design: the segment filter lands on the customer scan
    (pushed predicate) and the filtered dim is explicitly broadcast, so
    the orders join is shuffle-free; the date filters land on both fact
    scans (partition-prunable on a date-partitioned layout). The only
    exchange is the (orderkey, date, priority) rollup — keyed by
    orderkey, so partial aggregation collapses each order's lineitems
    map-side. Top-N is ``ORDER BY + LIMIT`` → TakeOrderedAndProject
    (per-partition heaps + driver merge of N rows), never a global
    sort.
    """
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    o = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
        .orderBy(
            F.col("revenue").desc(), "o_orderdate", "l_orderkey"
        )
        .limit(limit)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def order_count_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str | None = "5-LOW",
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers — the left-join + double-aggregate
    idiom (a histogram over a grouped count).

    Scale design: the per-customer count is the only full-data
    exchange; the second aggregate runs over |customers| rows keyed on
    a count value whose cardinality is tiny (max orders per customer),
    so its exchange is negligible and partial aggregation collapses it
    map-side. The left join preserves customers with no orders — an
    inner join + COALESCE would silently drop the zero bucket.
    """
    o = orders
    if exclude_priority is not None:
        o = o.filter(F.col("o_orderpriority") != exclude_priority)
    per_cust = (
        customer.join(
            o.select("o_custkey", "o_orderkey"),
            customer.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def revenue_delta(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    discount_lo: float = 0.05,
    discount_hi: float = 0.07,
    max_quantity: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: the one-row what-if revenue delta from
    eliminating a discount band in a date window — the pure
    filter-and-aggregate scan anchor.

    Scale design: every predicate reaches the parquet scan (pushed
    filters on date, discount, quantity), the scan reads only the
    three referenced columns, and the aggregate carries ONE cell of
    partials — wall time tracks raw IO at any corpus size.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= discount_lo)
            & (F.col("l_discount") <= discount_hi)
            & (F.col("l_quantity") < max_quantity)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue_delta"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


def winsorized_stats(
    orders: DataFrame,
    group_col: str = "o_orderpriority",
    amount_col: str = "o_totalprice",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> DataFrame:
    """Per-group winsorized amount statistics: clip each group's
    amounts at its own interpolated [lo_q, hi_q] percentiles and
    report raw vs winsorized means plus the clip count — the robust
    aggregate that keeps a few fat-finger orders from dominating a
    revenue mean.

    Scale design: group percentiles are ONE grouped aggregate
    (|groups| rows — Spark ``percentile`` == DuckDB ``quantile_cont``,
    the q26/RFM parity) broadcast back onto the fact table; the final
    rollup is a second grouped aggregate on the same key, so partial
    aggregation absorbs both passes map-side. No windows, no sorts.
    """
    amounts = orders.select(
        F.col(group_col).alias("grp"), F.col(amount_col).alias("amt")
    )
    bounds = amounts.groupBy("grp").agg(
        F.expr(f"percentile(amt, {lo_q}D)").alias("p_lo"),
        F.expr(f"percentile(amt, {hi_q}D)").alias("p_hi"),
    )
    clipped = amounts.join(F.broadcast(bounds), "grp").select(
        "grp",
        "amt",
        "p_lo",
        "p_hi",
        F.greatest(F.least(F.col("amt"), F.col("p_hi")), F.col("p_lo"))
        .alias("wamt"),
    )
    return (
        clipped.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.min("p_lo"), 6).alias("p_lo"),
            F.round(F.min("p_hi"), 6).alias("p_hi"),
            F.round(F.avg("amt"), 6).alias("mean_raw"),
            F.round(F.avg("wamt"), 6).alias("mean_winsorized"),
            F.sum(
                F.when(F.col("amt") != F.col("wamt"), 1).otherwise(0)
            ).cast("long").alias("n_clipped"),
        )
        .orderBy(group_col)
    )


def cohort_ltv(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Cohort lifetime-value curves: customers are cohorted by the
    month of their FIRST order; each (cohort, month-offset) cell
    reports active customers, revenue, and the running cumulative
    revenue per cohort member — the repeat-purchase economics readout
    behind retention-based LTV forecasts.

    Scale design: one customer-keyed exchange derives the cohort month
    (min over the customer's orders, map-side partials) and is joined
    back BROADCAST (|customers| cohort rows are the bounded side at
    fixture scale; at true 100 TB flip to a shuffle join — the key is
    the customer id either way); the (cohort, offset) rollup and the
    cumulative window then run over |months|² cells, so the window's
    single-task input is calendar-bounded, never order rows.

    Returns ``cohort_month, month_offset, n_customers, revenue,
    cum_revenue_per_customer`` (floats rounded 6) ordered by cohort,
    offset.
    """
    month = F.date_trunc("MONTH", F.col(date_col)).cast("date")
    first = (
        orders.groupBy(F.col(cust_col).alias("__c"))
        .agg(F.min(month).alias("cohort_month"))
    )
    offs = F.months_between(month, F.col("cohort_month")).cast("int")
    cells = (
        orders.join(
            F.broadcast(first), orders[cust_col] == F.col("__c")
        )
        .groupBy("cohort_month", offs.alias("month_offset"))
        .agg(
            F.countDistinct(cust_col).cast("long").alias("n_customers"),
            F.sum(amount_col).alias("__rev"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # cohort size == n_customers at offset 0 (every member's first
    # order lands there by construction) — a window over the bounded
    # cells table, NOT a second pass over orders (scan-audit r5: this
    # was the third orders scan)
    wc = Window.partitionBy("cohort_month")
    cohort_n = F.max(
        F.when(F.col("month_offset") == 0, F.col("n_customers"))
    ).over(wc)
    return (
        cells.withColumn("__cohort_n", cohort_n)
        .select(
            "cohort_month",
            "month_offset",
            "n_customers",
            F.round(F.col("__rev"), 6).alias("revenue"),
            F.round(
                F.sum("__rev").over(w) / F.col("__cohort_n"), 6
            ).alias("cum_revenue_per_customer"),
        )
        .orderBy("cohort_month", "month_offset")
    )


def returned_revenue_top_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter (returnflag = 'R'), with their nation — the
    churn-risk/fraud review list.

    Scale design: the return and date filters are pushed to the two
    fact scans; lineitem⋈orders shuffles on the order key; the
    per-customer rollup re-keys once; customer and nation dims ride
    broadcast joins AFTER the rollup (|customers-in-window| rows, not
    lineitems). Top-N via TakeOrderedAndProject.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    o = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_return_items"),
        )
    )
    return (
        per_cust.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
            per_cust.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.col("n_name").alias("nation"),
            "revenue",
            "n_return_items",
        )
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(limit)
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with customer detail — the HAVING-then-join-back
    pattern (aggregate a fact table, filter on the aggregate, rejoin
    the survivors to their dimensions).

    Scale design: the per-order rollup is ONE lineitem exchange with
    map-side partials; the HAVING filter collapses it to the rare
    heavy tail BEFORE any join, so AQE sees a tiny build side and
    broadcasts it into orders, then the (tiny) result into customer —
    neither sf-scaled dimension is ever shuffled against the full
    fact. l_quantity is integral in TPC-H, so the threshold compare
    is exact in both engines.
    """
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "orderkey")
    )


def open_order_backlog(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Open-order backlog over time: how many orders were open (placed
    but not fully shipped) on each day, per order priority — the
    interval-concurrency question behind capacity planning and SLA
    dashboards.

    Scale design: intervals never explode into per-day rows. Each
    order becomes exactly TWO delta events (+1 on its start day, -1
    the day after its last shipment); the (priority, day) rollup is
    bounded by |priorities| x |calendar days|, and the running sum
    that reconstructs the open count is a window over that bounded
    cell table — the same cell-table-window shape as cohort_ltv. The
    lineitem last-ship rollup is one order-keyed exchange with
    map-side partials.
    """
    span = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship")
    )
    iv = orders.join(span, orders.o_orderkey == span.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("start_day"),
        "last_ship",
    )
    # explode, not unionAll-of-two-selects: a union re-executes the
    # orders⋈lineitem interval pipeline per branch (r7)
    deltas = iv.select(
        "priority",
        F.explode(
            F.array(
                F.struct(
                    F.col("start_day").alias("day"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.date_add("last_ship", 1).alias("day"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("priority", "e.day", "e.delta")
    cells = deltas.groupBy("priority", "day").agg(
        F.sum("delta").cast("long").alias("delta_net")
    )
    running = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "priority",
        "day",
        "delta_net",
        F.sum("delta_net").over(running).cast("long").alias("open_orders"),
    ).orderBy("priority", "day")


EQUIDEPTH_PRE_BIN_WIDTH = 5000.0
EQUIDEPTH_QS = (0.25, 0.5, 0.75)


def equidepth_price_bins(
    orders: DataFrame,
    pre_bin_width: float = EQUIDEPTH_PRE_BIN_WIDTH,
) -> DataFrame:
    """Equi-depth (quartile) binning of order value per priority via a
    bounded pre-bin CDF — the scale-safe quantile-discretizer.

    Contrast with ``rfm_segments``: that one uses exact ``percentile``
    boundaries, whose aggregation state is O(distinct values per
    group) — fine for bounded groups, a memory hazard on a 100 TB
    fact column. Here the state is bounded by construction: a
    fixed-width pre-bin rollup (|value range| / width cells per
    group, map-side partials), a cumulative window over that bounded
    cell table to find the bucket containing each quartile, and bin
    assignment by INTEGER comparison of ``floor(value/width)``
    against the boundary bucket ids (broadcast, |groups| rows) — no
    float-edge ambiguity, identical in ANSI SQL. Boundaries are exact
    to pre-bin granularity; depth balance degrades gracefully with
    wider pre-bins.
    """
    w = float(pre_bin_width)
    fv = F.floor(F.col("o_totalprice") / F.lit(w)).cast("long")
    pre = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"), fv.alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cum_w = (
        Window.partitionBy("priority")
        .orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("priority")
    cdf = pre.select(
        "priority",
        "pb",
        F.sum("n").over(cum_w).alias("cum"),
        F.sum("n").over(tot_w).alias("total"),
    )
    bounds = cdf.groupBy("priority").agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.lit(q) * F.col("total"), F.col("pb"))
            ).alias(f"b{i}")
            for i, q in enumerate(EQUIDEPTH_QS, start=1)
        ]
    )
    binned = orders.join(
        F.broadcast(bounds),
        orders.o_orderpriority == bounds.priority,
    ).withColumn(
        "bin",
        sum(
            (fv > F.col(f"b{i}")).cast("int")
            for i in range(1, len(EQUIDEPTH_QS) + 1)
        ),
    )
    return (
        binned.groupBy("priority", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
        .orderBy("priority", "bin")
    )


def customer_spend_ranks(
    customer: DataFrame,
    orders: DataFrame,
) -> DataFrame:
    """Per-segment customer spend ranking suite: rank, dense_rank,
    percent_rank, and cume_dist over lifetime spend within each market
    segment — the full ordered-analytic surface (beyond the row_number
    / lag / moving-frame ops elsewhere) in one keyed window.

    Scale design: the per-customer rollup is one exchange; all four
    rank functions share ONE segment-keyed window sort (a single
    Window node), so the sort cost is paid once and no partition holds
    more than a segment's customers. Ties rank identically in any
    engine because the order key is (spend, custkey) — total order,
    no nondeterministic tie-break.
    """
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("spend"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    per_cust = spend.join(
        customer.select("c_custkey", "c_mktsegment"),
        spend.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend").desc(), F.col("c_custkey")
    )
    return per_cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("custkey"),
        "spend",
        "n_orders",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("dense_rnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("segment", "rnk")


def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose shipped revenue over a
    quarter equals the global maximum — tie-safe (every supplier at
    the max is returned, the reference Q15 semantics, NOT a LIMIT 1).

    Scale design: the date filter is pushed to the lineitem scan; the
    per-supplier rollup is ONE exchange with map-side partials; the
    global max over that |suppliers|-row table is a 1-row aggregate
    broadcast back via an equality cross-filter (BroadcastNestedLoop
    over a single row — constant cost), so the fact table is never
    re-scanned and nothing global-sorts. The supplier dim joins
    broadcast AFTER the max filter (≥1 surviving rows). Revenue is
    rounded to 4dp BEFORE the max compare so the equality is on the
    same value both engines hash.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    rev = (
        lineitem.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("__max_rev"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "total_revenue",
        )
        .orderBy("suppkey")
    )


def rich_inactive_customers(
    customer: DataFrame,
    orders: DataFrame,
    since: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q22 shape: per market segment, customers whose account
    balance beats the positive-balance average but who have placed no
    order since the cutoff — the lapsed-high-value outreach report
    (scalar-subquery threshold + NOT EXISTS anti join + rollup).

    Scale design: the threshold is a 1-row aggregate cross-joined in
    (broadcast nested loop over one row); the NOT EXISTS is a LEFT
    ANTI join shuffling only (custkey) pairs — the recency cutoff and
    the key projection are both pushed to the orders scan, so the
    anti probe carries one column of the recent slice only; the final
    segment rollup is ≤|segments| cells with map-side partials. The
    threshold is rounded to 4dp so both engines compare against the
    identical constant.
    """
    thr = customer.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("__avg_bal")
    )
    cand = (
        customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    inactive = cand.join(
        recent,
        cand.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        inactive.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
        .orderBy("segment")
    )


def promo_revenue_share(
    part: DataFrame,
    lineitem: DataFrame,
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: per ship month, the percentage of revenue that
    came from promotional parts — the marketing-effect time series
    (join + conditional-share aggregate).

    Scale design: lineitem⋈part is an equi-join on the part key; part
    is projected to (key, type) at the scan so the build side is two
    columns (broadcastable while the part dim fits, shuffle-join with
    AQE beyond). The month rollup aggregates the joined rows once with
    map-side partials; the share is computed inside the same aggregate
    (sum(CASE)/sum), no second pass, no window.
    """
    li = lineitem.select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    )
    p = part.select("p_partkey", "p_type")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == promo_type, F.col("__rev")).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy("ship_month")
        .agg(
            F.round(F.sum(promo), 4).alias("promo_revenue"),
            F.round(F.sum("__rev"), 4).alias("total_revenue"),
            F.round(100.0 * F.sum(promo) / F.sum("__rev"), 6).alias(
                "promo_pct"
            ),
        )
        .orderBy("ship_month")
    )


def nation_trade_flows(
    supplier: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between every (supplier nation,
    customer nation) pair per ship year — the cross-border trade-flow
    matrix (two independent dimension paths meeting at the fact row).

    Scale design: the date filter is pushed to the lineitem scan; the
    supplier path (supplier⋈nation, pre-joined dim-side — |suppliers|
    rows, 2 columns) broadcasts into the fact; the customer path joins
    orders on the order key (fact-to-fact, one shuffle each) then
    broadcasts customer⋈nation the same way. The final rollup is
    ≤|nations|²·|years| cells with map-side partials — the output is
    bounded no matter the fact scale.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    li = lineitem.filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    )
    n = nation.select("n_nationkey", "n_name")
    supp_n = supplier.join(
        F.broadcast(n), supplier.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = customer.join(
        F.broadcast(n), customer.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = orders.select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_n), o.o_custkey == cust_n.c_custkey)
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            F.round(F.sum("__rev"), 4).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


DISJUNCTIVE_BANDS = (
    # (brand, min_size, max_size, min_qty, max_qty)
    ("Brand#12", 1, 15, 1.0, 21.0),
    ("Brand#23", 10, 30, 10.0, 30.0),
    ("Brand#34", 20, 50, 20.0, 40.0),
)


def disjunctive_band_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    bands: tuple = DISJUNCTIVE_BANDS,
) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR-of-ANDs predicate over
    joined fact+dim attributes (three brand/size/quantity bands) —
    the classic disjunctive-pushdown stress: each disjunct constrains
    BOTH sides of the join, per band.

    Scale design: the union of the per-side implications is pushed to
    each scan (quantity range to lineitem, brand/size union to part —
    visible as PushedFilters), the join is a single equi-join on the
    part key with the 2-column part projection broadcast, and the full
    OR evaluates post-join inside codegen. One aggregate row per band
    (bounded output), map-side partials.
    """
    qty_lo = min(b[3] for b in bands)
    qty_hi = max(b[4] for b in bands)
    brands = [b[0] for b in bands]
    li = lineitem.filter(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = part.filter(F.col("p_brand").isin(brands)).select(
        "p_partkey", "p_brand", "p_size"
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band_col = F.lit(None).cast("string")
    for brand, size_lo, size_hi, b_qlo, b_qhi in reversed(bands):
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= size_lo)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= b_qlo)
            & (F.col("l_quantity") <= b_qhi)
        )
        band_col = F.when(cond, F.lit(brand)).otherwise(band_col)
    return (
        joined.withColumn("band", band_col)
        .filter(F.col("band").isNotNull())
        .groupBy("band")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy("band")
    )


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    lag_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders of a quarter
    had at least one line shipped more than ``lag_days`` after the
    order date — the fulfillment-SLA breach report (EXISTS with a
    correlated non-equi predicate).

    Scale design: the quarter filter is pushed to the orders scan; the
    EXISTS compiles to a LEFT SEMI join on the order key — the probe
    short-circuits at the first matching line per order and carries
    only (l_orderkey, l_shipdate); the correlated ``l_shipdate >
    o_orderdate + lag`` comparison rides the semi join as an extra
    condition evaluated in codegen. The rollup output is bounded at
    |priorities| cells with map-side partials.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    o = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > o.o_orderdate + F.expr(f"INTERVAL {int(lag_days)} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("priority")
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per nation of one region, the revenue of the
    year's order lines where the supplier and the ordering customer
    share that nation — the "local fulfillment volume" report (the
    classic 6-table join with a same-nation equality tying the two
    dimension paths together).

    Scale design: the year filter is pushed to the orders scan and the
    nation⋈region dimension path (≤|nations| rows after the region
    filter) broadcasts into BOTH the customer and supplier paths. The
    two fact-fact joins (orders⋈customer is fact-dim but
    customer-proportional; lineitem⋈orders) shuffle on their keys once
    each; the supplier side joins broadcast (bounded dim) with the
    same-nation constraint evaluated inside the join condition, so no
    post-join filter re-materializes the row. Output is ≤|nations|
    cells, map-side partials.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    n = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    c = customer.join(
        F.broadcast(n), customer.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("__c_nk"), "n_name")
    o = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    s = supplier.select("s_suppkey", "s_nationkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    )
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == F.col("__c_nk")),
        )
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("__rev"), 4).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


def national_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_7",
    region_name: str = "ASIA",
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: per order year, the share of one region's
    revenue in a part type that was supplied by the target nation —
    the national-market-share trend (share computed INSIDE one
    aggregate, no second pass).

    Scale design: the part-type filter cuts the fact at its scan via
    the broadcast part join (2-column build side); the customer path
    restricts to the region through the broadcast nation⋈region dim;
    the supplier path broadcasts (suppkey → nation name). The only
    full-width shuffles are lineitem⋈orders and orders⋈customer on
    their keys. The target-nation share is a sum(CASE)/sum in the same
    |years|-cell rollup — the fact is aggregated exactly once.
    """
    n = nation.select("n_nationkey", "n_name")
    region_nk = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = customer.join(
        F.broadcast(region_nk), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey")
    s = supplier.join(
        F.broadcast(n), supplier.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    p = part.filter(F.col("p_type") == part_type).select("p_partkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__rev"),
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey, "left_semi")
    )
    tgt = F.when(
        F.col("supp_nation") == target_nation, F.col("__rev")
    ).otherwise(F.lit(0.0))
    return (
        joined.groupBy("order_year")
        .agg(
            F.round(F.sum(tgt), 4).alias("target_revenue"),
            F.round(F.sum("__rev"), 4).alias("total_revenue"),
            F.round(F.sum(tgt) / F.sum("__rev"), 6).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


COST_FACTOR = 0.6


def supplier_nation_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_token: str = "red",
    cost_factor: float = COST_FACTOR,
) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year over
    the parts whose name contains a token — the product-line profit
    ledger. The reference schema prices cost off partsupp; this corpus
    has no partsupp table, so cost is proxied as ``cost_factor *
    p_retailprice * l_quantity`` (same shape: a per-part attribute
    priced into every matching line).

    Scale design: the name-token filter cuts the fact through the
    broadcast part join (build side carries key + retailprice only);
    the supplier⋈nation path broadcasts; the single full shuffle is
    lineitem⋈orders on the order key (orders projected to key + year).
    Output is |nations|·|years| cells, map-side partials.
    """
    p = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    n = nation.select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(n), supplier.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    o = orders.select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("order_year")
    )
    li = lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        cost_factor
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", "order_year")
        .agg(
            F.round(F.sum(amount), 4).alias("profit"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy("nation", "order_year")
    )


SHIP_LAG_BANDS = (30, 90)  # day boundaries: fast / normal / slow


def ship_lag_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    bands: tuple = SHIP_LAG_BANDS,
) -> DataFrame:
    """TPC-H Q12 shape: per ship-lag band (days between order and
    ship), how many lines belonged to high-priority vs low-priority
    orders — the logistics-mode audit re-expressed over ship lag
    (this corpus has no l_shipmode column; the lag band plays the
    mode's role as the grouping attribute).

    Scale design: the ship-date window is pushed to the lineitem scan;
    the single shuffle is lineitem⋈orders on the order key with orders
    projected to (key, priority, date); the band CASE and the priority
    CASE both fold into the same |bands|-cell rollup with map-side
    partials — one pass, no window.
    """
    lo = F.lit(date_from).cast("timestamp")
    hi = F.lit(date_to).cast("timestamp")
    li = lineitem.filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select("l_orderkey", "l_shipdate")
    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    b_fast, b_slow = int(bands[0]), int(bands[1])
    band = (
        F.when(lag <= b_fast, F.lit(f"1_under_{b_fast}d"))
        .when(lag <= b_slow, F.lit(f"2_under_{b_slow}d"))
        .otherwise(F.lit(f"3_over_{b_slow}d"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("lag_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_priority_lines"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_priority_lines"
            ),
        )
        .orderBy("lag_band")
    )


def small_quantity_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    brand: str = "Brand#23",
    qty_factor: float = 0.5,
) -> DataFrame:
    """TPC-H Q17 shape: weekly-averaged revenue of the brand's order
    lines whose quantity is below ``qty_factor`` of that part's average
    quantity — the small-lot pricing probe (correlated per-part scalar
    threshold).

    Scale design: the brand filter cuts the fact through the broadcast
    part join (1-column build side), so BOTH passes touch only the
    brand's lines; the per-part average is a bounded rollup (≤ brand
    part count rows) broadcast back as the threshold — the correlated
    subquery never re-scans the fact per row, and no per-part window
    sort happens. Averages are rounded to 4dp so both engines compare
    against the identical threshold. Output is one row.
    """
    p = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), lineitem.l_partkey == p.p_partkey
    ).select("p_partkey", "l_quantity", "l_extendedprice")
    thr = li.groupBy("p_partkey").agg(
        F.round(F.avg("l_quantity"), 4).alias("__avg_qty")
    )
    small = li.join(
        F.broadcast(thr.withColumnRenamed("p_partkey", "__pk")),
        (F.col("p_partkey") == F.col("__pk"))
        & (F.col("l_quantity") < F.lit(qty_factor) * F.col("__avg_qty")),
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 52.0, 4).alias("weekly_revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def sole_late_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    lag_days: int = 90,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers of one nation who were the ONLY late
    shipper on a multi-supplier order — the supplier-reliability
    blacklist (EXISTS another supplier + NOT EXISTS another late
    supplier, per order).

    Scale design (r7, second pass): instead of the reference's two
    correlated self-joins (semi + anti over the fact), ONE rollup over
    the joined fact computes everything both quantifiers need —
    distinct supplier count AND the distinct-late-supplier SET
    (bounded by suppliers-per-order, single-digit on any order
    stream); the quantifier pair becomes ``n_suppliers >= 2 AND
    size(late_set) = 1`` and the sole late supplier is just the set's
    element, so the pre-r7 second fact branch (late candidates
    re-derived from the join and semi-joined back) disappears — the
    fact pipeline runs ONCE. The supplier dim (nation-filtered)
    broadcasts onto the per-order survivors, which are one row per
    order, matching the EXISTS semantics of the oracle without a
    distinct. Local timing is flat (2.1s either way at sf0.1 —
    AQE stage reuse already shared the duplicated fact exchange at
    runtime); the single-branch plan is the durable win: on a cluster
    the pre-r7 second branch re-scanned lineitem+orders before its
    first exchange, and the rollup loses one countDistinct Expand.
    """
    o = orders.select("o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(lag_days)} DAYS")
        ).alias("__late"),
    )
    # size(collect_set) instead of countDistinct (r9 optimization):
    # mixing countDistinct with another aggregate makes Catalyst plan an
    # Expand (x2 of the joined fact) + a two-phase distinct rewrite; the
    # set aggregate is already being built for __late_set, so reading
    # the distinct-supplier count off a second collect_set keeps ONE
    # ObjectHashAggregate over the fact with no Expand — identical
    # semantics (both ignore NULLs; suppliers-per-order is single-digit
    # bounded, so the set buffer is tiny at any scale).
    per_order = joined.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("__n_supp"),
        F.collect_set(
            F.when(F.col("__late"), F.col("l_suppkey"))
        ).alias("__late_set"),
    )
    sole = per_order.filter(
        (F.col("__n_supp") >= 2) & (F.size("__late_set") == 1)
    ).select(
        "l_orderkey", F.col("__late_set")[0].alias("__late_supp")
    )
    s = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    waiting = sole.join(
        F.broadcast(s), F.col("__late_supp") == s.s_suppkey
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


def delete_impact(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    every: int = 50,
) -> DataFrame:
    """Right-to-be-forgotten cascade impact: given a deterministic
    tombstone set (every ``every``-th customer key — standing in for
    the deletion-request table a privacy pipeline consumes), the row
    count and erased monetary value per entity that a cascading delete
    would touch: the customers themselves, their orders, and those
    orders' line items.

    Scale design: the tombstone set (|customers|/every keys, one
    column) broadcasts into the orders semi join; the lineitem cascade
    is a second semi join keyed on the surviving order keys (one
    shuffle — order keys of deleted customers are fact-proportional,
    not broadcastable at scale). Each entity contributes ONE aggregate
    row; the final result is a 3-row union. Semi joins never widen the
    fact rows, and nothing is collected to the driver.
    """
    tomb = customer.filter(
        F.col("c_custkey") % F.lit(int(every)) == 0
    ).select("c_custkey")
    o = orders.join(
        F.broadcast(tomb),
        orders.o_custkey == tomb.c_custkey,
        "left_semi",
    )
    li = lineitem.join(
        o.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    c_row = tomb.agg(
        F.lit("customer").alias("entity"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.lit(None).cast("double").alias("erased_value"),
    )
    o_row = o.agg(
        F.lit("orders").alias("entity"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 4).alias("erased_value"),
    )
    li_row = li.agg(
        F.lit("lineitem").alias("entity"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 4).alias("erased_value"),
    )
    return c_row.unionAll(o_row).unionAll(li_row).orderBy("entity")


PRICE_SCALE = 10_000


def min_cost_supplier(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    part_type: str = "LARGE",
    scale: int = PRICE_SCALE,
) -> DataFrame:
    """TPC-H Q2 shape: for every part of one type, the region's
    supplier(s) offering the lowest observed unit price — tie-safe
    (every supplier at the minimum returns, the Q2 correlated-min
    semantics). The reference prices off partsupp; this corpus has no
    partsupp, so the offer price is each supplier's average observed
    ``l_extendedprice / l_quantity`` for the part.

    Scale design: the part-type filter cuts the fact through the
    broadcast part join; the region's suppliers broadcast via the
    nation⋈region path. Per-row unit prices are quantized to ``scale``
    integers (per-row float division is bit-portable; cross-row SUMS
    are not) so the per-(part, supplier) average is an exact int64 sum
    finished by one rounded division, and the per-part minimum —
    a second bounded rollup over the (part, supplier) cells — compares
    the identical 6dp values in both engines. No window sort, no
    correlated rescan of the fact.

    Returns ``partkey, s_name, unit_price`` ordered by part, supplier.
    """
    p = part.filter(F.col("p_type") == part_type).select("p_partkey")
    sup_r = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == region_name)
                    ),
                    nation.n_regionkey == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    q = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(float(scale))
        + F.lit(0.5)
    ).cast("long")
    offers = (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .join(F.broadcast(sup_r), lineitem.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("p_partkey").alias("partkey"), "s_name")
        .agg(
            F.round(
                F.sum(q).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(float(scale))),
                6,
            ).alias("unit_price")
        )
    )
    best = offers.groupBy(F.col("partkey").alias("__pk")).agg(
        F.min("unit_price").alias("__min_price")
    )
    return (
        offers.join(
            best,
            (F.col("partkey") == F.col("__pk"))
            & (F.col("unit_price") == F.col("__min_price")),
        )
        .select("partkey", "s_name", "unit_price")
        .orderBy("partkey", "s_name")
    )


def supplier_part_relationship(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    exclude_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q16 shape: per (brand, size band), how many distinct
    suppliers have shipped such parts — excluding one part type and a
    derived supplier blacklist (negative account balance, the
    complaints-list analog), i.e. the NOT IN subquery shape.

    Scale design: the relationship set is a DISTINCT over (brand,
    band, supplier) — one exchange with map-side dedup partials; the
    part attributes arrive through the broadcast part join (the type
    exclusion pushed to the part scan as <>), and the blacklist is a
    broadcast LEFT ANTI (NOT IN with non-null semantics). The final
    rollup's countDistinct rides the already-distinct exchange.

    Returns ``p_brand, size_band, n_suppliers`` ordered by brand,
    band.
    """
    band = (F.floor(F.col("p_size") / 10) * 10).cast("int")
    p = part.filter(F.col("p_type") != exclude_type).select(
        "p_partkey", "p_brand", band.alias("size_band")
    )
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .select("p_brand", "size_band", "l_suppkey")
        .distinct()
    )
    kept = rel.join(
        F.broadcast(bad),
        rel.l_suppkey == bad.s_suppkey,
        "left_anti",
    )
    return (
        kept.groupBy("p_brand", "size_band")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
        .orderBy("p_brand", "size_band")
    )


REORDER_BUCKETS = (7, 30, 90)  # day boundaries


def reorder_intervals(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    buckets: tuple = REORDER_BUCKETS,
) -> DataFrame:
    """Repeat-purchase cadence: the distribution of day gaps between
    each customer's consecutive orders, bucketed — the
    replenishment-cycle readout behind reorder-reminder timing.

    Scale design: ONE customer-keyed window sort computes the lag
    (customers are the natural partition key; per-customer order
    counts bound the sort buffers), gaps are exact integer day diffs
    (total order (date, orderkey) makes same-date ties deterministic),
    and the bucket rollup is ≤|buckets|+1 cells with exact integer-sum
    averages.

    Returns ``gap_bucket, n_gaps, avg_gap_days (rounded 4)`` ordered
    by bucket label.
    """
    w = Window.partitionBy(cust_col).orderBy(
        F.col("__d"), F.col("o_orderkey")
    )
    gaps = (
        orders.select(
            cust_col,
            "o_orderkey",
            F.col(date_col).cast("date").alias("__d"),
        )
        .withColumn("__prev", F.lag("__d").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.datediff("__d", "__prev").cast("long").alias("gap"))
    )
    b = sorted(int(x) for x in buckets)
    label = F.lit(f"4_over_{b[-1]}d")
    for i, hi in enumerate(reversed(b)):
        label = F.when(
            F.col("gap") <= hi, F.lit(f"{len(b) - i}_under_{hi}d")
        ).otherwise(label)
    return (
        gaps.groupBy(label.alias("gap_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.round(
                F.sum("gap").cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_gap_days"),
        )
        .orderBy("gap_bucket")
    )


def dominant_part_suppliers(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    name_token: str = "red",
    year: int = 1996,
    share: float = 0.5,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominated some token-named
    part's shipments in a year (their quantity exceeds ``share`` of
    the part's total) — the nested aggregated-IN screen (the
    reference's availqty > ½·shipped test re-based on shipped
    volumes; no partsupp table in this corpus).

    Scale design: the name-token filter cuts the fact through the
    broadcast part join and the year window is pushed to the lineitem
    scan; ONE (part, supplier) rollup feeds both sides of the
    dominance test — per-part totals are a window SUM over the
    bounded rollup cells (never a second fact pass), and the
    aggregated IN collapses to a semi join of the supplier dim
    against the distinct dominant supplier keys.

    Returns ``s_suppkey, s_name, n_dominated_parts`` ordered by
    supplier key.
    """
    lo = F.lit(f"{year}-01-01").cast("timestamp")
    hi = F.lit(f"{year + 1}-01-01").cast("timestamp")
    p = part.filter(F.col("p_name").contains(name_token)).select("p_partkey")
    cells = (
        lineitem.filter(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
    )
    w = Window.partitionBy("p_partkey")
    dominant = (
        cells.withColumn("__total", F.sum("__qty").over(w))
        .filter(F.col("__qty") > F.lit(share) * F.col("__total"))
        .groupBy("l_suppkey")
        .agg(F.countDistinct("p_partkey").cast("long").alias(
            "n_dominated_parts"
        ))
    )
    return (
        supplier.join(
            dominant, supplier.s_suppkey == dominant.l_suppkey
        )
        .select("s_suppkey", "s_name", "n_dominated_parts")
        .orderBy("s_suppkey")
    )


def yoy_monthly_growth(
    lineitem: DataFrame,
) -> DataFrame:
    """Year-over-year monthly revenue growth: each calendar month's
    shipped revenue against the same month one year earlier — the
    classic comparable-period readout.

    Scale design: ONE (year, month) rollup over the fact with map-side
    partials (revenue summed exactly, rounded once); the YoY pairing
    is a lag window over the ≤|years|·12-cell table partitioned by
    month-of-year — bounded, never a fact self-join. Growth is NULL
    for the first observed year of each month.

    Returns ``ship_year, ship_month, revenue, prev_year_revenue,
    yoy_pct (rounded 4)`` ordered by year, month.
    """
    cells = (
        lineitem.groupBy(
            F.year("l_shipdate").cast("long").alias("ship_year"),
            F.month("l_shipdate").cast("long").alias("ship_month"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("ship_month").orderBy("ship_year")
    prev = F.lag("revenue").over(w)
    prev_year = F.lag("ship_year").over(w)
    # only a CONSECUTIVE prior year is a comparable period
    comparable = F.when(
        prev_year == F.col("ship_year") - 1, prev
    )
    return (
        cells.withColumn("prev_year_revenue", comparable)
        .withColumn(
            "yoy_pct",
            F.round(
                100.0
                * (F.col("revenue") - F.col("prev_year_revenue"))
                / F.col("prev_year_revenue"),
                4,
            ),
        )
        .orderBy("ship_year", "ship_month")
    )


def nation_rank_movers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    year_a: int = 1996,
    year_b: int = 1997,
) -> DataFrame:
    """Nation revenue-rank movers between two years: each nation's
    order-revenue rank in year A vs year B and the delta — the
    league-table movement report.

    Scale design: the two-year window is pushed to the orders scan;
    ONE per-nation rollup with the two years as conditional sums (a
    single fact pass — no per-year branch re-scans); both rank
    windows run over the ≤|nations| cell table. Ranks are defined
    among nations with revenue in BOTH years. Revenue is rounded
    before ranking so both engines rank identical values; ties break
    by nation name inside the rank's total order.

    Returns ``nation, rank_a, rank_b, rank_change, revenue_a,
    revenue_b`` ordered by rank_b, nation.
    """
    lo = F.lit(f"{year_a}-01-01").cast("timestamp")
    hi = F.lit(f"{year_b + 1}-01-01").cast("timestamp")
    o = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select(
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("__yr"),
        "o_totalprice",
    )
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.when(F.col("__yr") == year_a, F.col("o_totalprice"))),
                4,
            ).alias("revenue_a"),
            F.round(
                F.sum(F.when(F.col("__yr") == year_b, F.col("o_totalprice"))),
                4,
            ).alias("revenue_b"),
        )
        .filter(
            F.col("revenue_a").isNotNull() & F.col("revenue_b").isNotNull()
        )
    )
    wa = Window.orderBy(F.col("revenue_a").desc(), F.col("nation"))
    wb = Window.orderBy(F.col("revenue_b").desc(), F.col("nation"))
    return (
        wide.withColumn("rank_a", F.row_number().over(wa).cast("long"))
        .withColumn("rank_b", F.row_number().over(wb).cast("long"))
        .select(
            "nation",
            "rank_a",
            "rank_b",
            (F.col("rank_a") - F.col("rank_b")).cast("long").alias(
                "rank_change"
            ),
            "revenue_a",
            "revenue_b",
        )
        .orderBy("rank_b", "nation")
    )


def lead_time_scorecard(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Supplier lead-time reliability scorecard: per supplier, the
    mean and standard deviation of order→ship lag — variance is what
    breaks promise dates, so the scorecard ranks consistency, not just
    speed.

    Scale design: one lineitem⋈orders shuffle (orders projected to
    key + date) feeds a per-supplier rollup of EXACT integer moments —
    lag days are integers, so Σx and Σx² accumulate exactly in int64
    and the sample variance finishes as one double expression per
    supplier (order-independent, engine-portable; a running-double
    stddev would be neither). Supplier dim broadcasts after the
    rollup. Output is |suppliers| rows.

    Returns ``s_suppkey, s_name, n_lines, avg_lag_days,
    stddev_lag_days`` (rounded 4; stddev NULL for single-line
    suppliers) ordered by supplier key.
    """
    o = orders.select("o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(lag).alias("__s1"),
            F.sum(lag * lag).alias("__s2"),
        )
    )
    n = F.col("n_lines").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    return (
        cells.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            cells.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_lines",
            F.round(s1 / n, 4).alias("avg_lag_days"),
            F.when(F.col("n_lines") > 1, F.round(F.sqrt(var), 4)).alias(
                "stddev_lag_days"
            ),
        )
        .orderBy("s_suppkey")
    )


def revenue_concentration_hhi(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Market-concentration index per nation: the Herfindahl–Hirschman
    index of customer revenue shares (Σ share²; 1 = one customer owns
    the market, 1/n = perfectly even) plus the top-customer share —
    the concentration-risk readout.

    Scale design: ONE (nation, customer) rollup over orders (customer
    join carries only the nation key, nation dim broadcasts), then a
    per-nation reduction over the bounded cells: HHI = Σrev² / (Σrev)²
    over per-customer revenues ROUNDED to 4dp first, so both engines
    square and sum identical values. No window; the top share is a
    max over the same cells.

    Returns ``nation, n_customers, total_revenue, hhi, top_share``
    (rounded 6) ordered by nation.
    """
    o = orders.select("o_custkey", "o_totalprice")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("__rev"))
    )
    return (
        cells.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("__rev"), 4).alias("total_revenue"),
            F.round(
                F.sum(F.col("__rev") * F.col("__rev"))
                / (F.sum("__rev") * F.sum("__rev")),
                6,
            ).alias("hhi"),
            F.round(F.max("__rev") / F.sum("__rev"), 6).alias("top_share"),
        )
        .orderBy("nation")
    )


def reorder_survival(
    orders: DataFrame,
    customer: DataFrame,
) -> DataFrame:
    """Kaplan–Meier survival curve of customer reorder gaps per market
    segment — "what fraction of customers have NOT yet reordered t
    days after an order", the churn-analysis staple that handles
    censoring correctly: the gap from each customer's LAST order to
    the corpus end is an incomplete observation (the customer may
    still reorder) and must enter the at-risk denominator without
    counting as an event, or the curve is biased pessimistic.

    Estimator: with d_t events and n_t at risk at gap t,
    ``S(t) = Π_{u ≤ t} (1 − d_u/n_u)`` — computed as
    ``exp(Σ ln(1 − d/n))`` over event cells, with an explicit
    exhausted-risk-set flag (d = n → S = 0) so neither engine
    evaluates ln(0).

    Scale design: one customer-keyed window builds the gaps, one
    doc-keyed join attaches the segment, and everything after the
    (segment, gap) rollup runs over BOUNDED cells — |segments| ×
    |distinct day gaps| — so the per-segment cumulative windows sort
    cells, not orders. The corpus end date is a one-row broadcast
    (the PageRank ``n`` pattern), not a driver collect.

    Returns ``mktsegment, gap_days, n_at_risk, n_events, n_censored,
    survival`` (rounded 6) for event cells (d > 0), ordered by
    (segment, gap).
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    end = orders.groupBy().agg(
        F.max("o_orderdate").alias("__end")
    )
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("__next", F.lead("o_orderdate", 1).over(w))
        .crossJoin(F.broadcast(end))
        .select(
            "o_custkey",
            F.datediff(
                F.coalesce(F.col("__next"), F.col("__end")),
                F.col("o_orderdate"),
            ).cast("long").alias("gap_days"),
            F.col("__next").isNotNull().cast("int").alias("__event"),
        )
    )
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    cells = (
        gaps.join(seg, "o_custkey")
        .groupBy("mktsegment", "gap_days")
        .agg(
            F.sum("__event").cast("long").alias("n_events"),
            F.sum(1 - F.col("__event")).cast("long").alias("n_censored"),
        )
    )
    cw = Window.partitionBy("mktsegment").orderBy("gap_days")
    before = (
        F.coalesce(
            F.sum(F.col("n_events") + F.col("n_censored")).over(
                cw.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(
        Window.partitionBy("mktsegment")
    )
    staged = cells.select(
        "mktsegment",
        "gap_days",
        "n_events",
        "n_censored",
        (total - before).cast("long").alias("n_at_risk"),
    )
    d = F.col("n_events").cast("double")
    n = F.col("n_at_risk").cast("double")
    lnf = F.when(F.col("n_events") == 0, F.lit(0.0)).otherwise(
        F.when(F.col("n_events") < F.col("n_at_risk"), F.log(1.0 - d / n))
    )
    zf = F.when(
        (F.col("n_events") > 0) & (F.col("n_events") >= F.col("n_at_risk")),
        1,
    ).otherwise(0)
    cum = cw.rowsBetween(Window.unboundedPreceding, 0)
    curved = staged.withColumn(
        "__lns", F.sum(F.coalesce(lnf, F.lit(0.0))).over(cum)
    ).withColumn("__dead", F.sum(zf).over(cum))
    return (
        curved.filter(F.col("n_events") > 0)
        .select(
            "mktsegment",
            "gap_days",
            "n_at_risk",
            "n_events",
            "n_censored",
            F.round(
                F.when(F.col("__dead") > 0, F.lit(0.0)).otherwise(
                    F.exp(F.col("__lns"))
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("mktsegment", "gap_days")
    )


def on_time_wilson(
    orders: DataFrame,
    lineitem: DataFrame,
    suppliers: DataFrame,
    on_time_days: int = 45,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Supplier on-time rate ranked by the Wilson score lower bound —
    the correct small-sample ranking: a 2/2 supplier must NOT outrank
    a 96/100 one, which a raw rate sort does and the Wilson interval's
    lower bound fixes (the same estimator review-ranking systems use).
    On-time = the line shipped within ``on_time_days`` of the order
    date.

    Every Wilson input is an exact integer pair (n, k) plus constants,
    so the bound is engine-reproducible with no float-sum ordering
    concerns.

    Scale design: ONE orderkey-keyed join projects only the order
    date; the per-supplier rollup collapses to a |suppliers|-row frame
    (map-side partials) before the broadcast name join and the
    closed-form interval arithmetic.

    Returns one row per supplier: ``s_suppkey, s_name, n_lines,
    n_ontime, rate, wilson_lb`` (floats rounded 6), ordered by
    supplier key.
    """
    o = orders.select("o_orderkey", "o_orderdate")
    lines = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o, lineitem.l_orderkey == o.o_orderkey
    )
    on_time = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        <= on_time_days
    ).cast("long")
    per_supp = lines.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(on_time).cast("long").alias("n_ontime"),
    )
    n = F.col("n_lines").cast("double")
    p = F.col("n_ontime").cast("double") / n
    z2 = F.lit(z * z)
    zl = F.lit(z)
    center = p + z2 / (F.lit(2.0) * n)
    margin = zl * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    wilson_lb = (center - margin) / (F.lit(1.0) + z2 / n)
    return (
        per_supp.join(
            F.broadcast(suppliers.select("s_suppkey", "s_name")),
            per_supp.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name", "n_lines", "n_ontime",
            F.round(p, 6).alias("rate"),
            F.round(wilson_lb, 6).alias("wilson_lb"),
        )
        .orderBy("s_suppkey")
    )


def weibull_delay_fit(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Parametric reliability fit of the fulfillment delay: estimate
    Weibull shape k and scale λ for the positive ship lag
    (``l_shipdate − o_orderdate`` in days) by median-rank regression —
    OLS of ``ln(−ln(1−F))`` on ``ln(lag)`` — the classic probability-
    plot method. Shape k > 1 means wear-in (delays concentrate around
    the scale, a healthy pipeline); k < 1 means infant-mortality-style
    heavy tails (many quick ships plus a long straggler tail). The
    nonparametric banded view is :func:`ship_lag_priority`; this is
    the two-parameter summary a capacity model consumes.

    Grouped-tie plotting positions: integer day lags tie heavily, so
    each distinct lag v plots once at its cumulative rank,
    ``F(v) = cum_n(v)/(n+1)`` (mean-rank convention, never 1), and
    the regression weights each point by its tie count — equivalent to
    giving every tied observation its group's position. Negative and
    zero lags (synthetic backdated rows) are excluded: a Weibull
    support is (0, ∞).

    Numeric reproducibility: counts and cumulative counts are exact
    BIGINTs; ln/OLS run once per DISTINCT lag on those integers
    (counts-into-ln convention), output doubles rounded 6.

    Scale design: one orderkey-keyed join exchange (the Q12/Q21
    shape), then a groupBy(lag) that collapses to a calendar-bounded
    frame — distinct integer lags are bounded by the date-range span,
    NOT data volume, so the cumulative window and the closed-form
    weighted OLS run on a few-thousand-row frame at any scale (the
    single-partition window is over that bounded frame only).

    Returns one row: ``n, n_lags, shape_k, scale_lambda, median_days,
    r2`` (median = λ·(ln 2)^{1/k}; doubles rounded 6).
    """
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    per_lag = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(lag.alias("lag"))
        .filter(F.col("lag") >= 1)
        .groupBy("lag")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cum_w = Window.orderBy("lag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pts = per_lag.select(
        "lag",
        "cnt",
        F.sum("cnt").over(cum_w).alias("cum"),
    )
    n_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pts = pts.withColumn("__n", F.sum("cnt").over(n_w))
    x = F.log(F.col("lag").cast("double"))
    fv = F.col("cum").cast("double") / (F.col("__n").cast("double") + 1)
    y = F.log(-F.log(F.lit(1.0) - fv))
    w = F.col("cnt").cast("double")
    moments = pts.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
        F.sum(w).alias("__sw"),
        F.sum(w * x).alias("__sx"),
        F.sum(w * y).alias("__sy"),
        F.sum(w * x * x).alias("__sxx"),
        F.sum(w * y * y).alias("__syy"),
        F.sum(w * x * y).alias("__sxy"),
    )
    sw = F.col("__sw")
    cov = F.col("__sxy") - F.col("__sx") * F.col("__sy") / sw
    varx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / sw
    vary = F.col("__syy") - F.col("__sy") * F.col("__sy") / sw
    k = cov / varx
    intercept = (F.col("__sy") - k * F.col("__sx")) / sw
    lam = F.exp(-intercept / k)
    import math

    return moments.select(
        "n",
        "n_lags",
        F.round(k, 6).alias("shape_k"),
        F.round(lam, 6).alias("scale_lambda"),
        F.round(
            lam * F.pow(F.lit(math.log(2.0)), F.lit(1.0) / k), 6
        ).alias("median_days"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )
