package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational analytics — the query engine the reference's import
  * pipeline feeds (its BigQuery side). TPC-H-shaped, all expressed
  * declaratively so Catalyst handles pushdown/pruning/join selection.
  *
  * Oracle-parity conventions (see SURVEY.md §6):
  *  - money crosses the compare boundary as BIGINT integer scaled
  *    units (cents), never DECIMAL: per-row exact decimal → long,
  *    then integer sums (associative, engine-exact, hash-portable);
  *  - every integer output is LongType (DuckDB row_number/len are
  *    BIGINT, DuckDB sum(int) is HUGEINT — cast both sides);
  *  - every result has a total order.
  */
object Analytics {

  /** Money at the compare boundary: per-row exact decimal scaled to
    * integer units (cents at scale 2), as BIGINT. Integer sums are
    * associative and engine-exact; DECIMAL reprs are not portable
    * across the result-hash boundary (trailing-zero/float-coercion
    * differences), so no query ships a DECIMAL output column. */
  private def cents(c: Column, scale: Int): Column =
    (c.cast(s"decimal(18,$scale)") * lit(math.pow(10, scale).toLong)).cast("long")

  /** Exact money sum in integer scaled units — deterministic at any
    * parallelism (per-row exact decimal → long, then integer sum). */
  private def csum(c: Column, scale: Int): Column = sum(cents(c, scale))

  /** TPC-H Q1: pricing summary report. 8 aggregates, group by flags. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        csum(col("l_quantity"), 2).as("sum_qty"),
        csum(col("l_extendedprice"), 2).as("sum_base_price"),
        csum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        csum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3: shipping priority — customer ⋈ orders ⋈ lineitem,
    * revenue per order, top 10. The customer side is NOT broadcast-
    * hinted: customer is fact-sized (grows with SF), so a forced hint
    * would OOM at 100×; AQE broadcasts it at small SF on its own and
    * falls back to shuffle join at scale. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(csum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: revenue by nation for one region+year.
    * Only the truly fixed-size dims (nation/region) carry broadcast
    * hints; customer/supplier scale with the data, so their join
    * strategy is left to AQE (broadcast at small SF, shuffle at 100×). */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(csum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6: forecast revenue change — selective filter + single agg.
    * The whole predicate reaches the parquet scan (PushedFilters). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(csum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
  }

  /** Window functions: per-supplier running quantity + row numbers.
    * l_quantity joins the order spec: the testdata contains duplicate
    * (orderkey, linenumber) rows, and a running sum is only
    * engine-portable when the order is total over every column that
    * feeds the sum (fully-identical tied rows commute; different
    * quantities must not). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).cast("long").as("rn"),
        sum(cents(col("l_quantity"), 2))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Top-k rows per group (rank ≤ 3 orders per customer by price). */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice"), 2).as("price"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** ROLLUP aggregation over status × priority. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           csum(col("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first)
  }

  /** Left-semi + left-anti joins: customers with orders > 400k
    * (EXISTS) and suppliers with no lineitem this year (NOT EXISTS),
    * unioned with a tag column. */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    val withBig = cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey").as("key"), lit("has_big_order").as("tag"))
    val supp = Tables.supplier(spark, dir)
    val recent = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
    val idleSupp = supp.join(recent, col("s_suppkey") === col("l_suppkey"), "left_anti")
      .select(col("s_suppkey").as("key"), lit("idle_supplier").as("tag"))
    withBig.unionAll(idleSupp).orderBy(col("tag"), col("key"))
  }

  /** Correlated scalar subqueries (decorrelated by Catalyst into
    * aggregated joins): orders priced above 1.5× their customer's
    * average. The comparison is all-integer/decimal
    * (2·cnt·price > 3·sum) so no float average crosses the oracle
    * boundary. Also exercises the spark.sql parser path. */
  def qCorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
        |FROM orders_v o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
        |      (SELECT COUNT(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |    > 3 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |           FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Set operations with distinct semantics: BUILDING-segment
    * customers ∩ big-order customers ∖ negative-balance customers. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bigOrder = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000).select(col("o_custkey").as("c_custkey"))
    val negative = Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 0).select("c_custkey")
    building.intersect(bigOrder).except(negative).orderBy("c_custkey")
  }

  /** Same result as [[qTopkPerGroup]] through the custom
    * TopKPerKeyPlan/Exec operator (bounded per-key heaps, no window
    * sort) — the oracle that checks the window form also checks the
    * custom physical operator. */
  def qTopkNative(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice"), 2).as("price"))
    graft.plans.TopKPerKey.topKPerKey(ord,
        Seq("o_custkey"),
        Seq("price" -> false, "o_orderkey" -> true), 3)
      .orderBy("o_custkey", "rk")
  }

  /** Full outer join with null sides: a customer subset vs per-key
    * order totals — left-only, right-only, and matched rows all
    * present, sentinel-free (nullable output, deterministic order on
    * the coalesced key). */
  def qJoinTypes(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_custkey") < 700)
      .select(col("c_custkey"), col("c_name"))
    val totals = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(csum(col("o_totalprice"), 2).as("total"))
    cust.join(totals, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("total"))
      .orderBy(coalesce(col("c_custkey"), col("o_custkey")),
        col("c_custkey").asc_nulls_first)
  }

  /** Time-range window frames: per-user trailing-1-hour event count
    * and value sum (RANGE frame over event-time micros). */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    e.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("cnt_1h"),
        sum(cents(col("value"), 2)).over(w).as("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  /** Salted fact-fact join (Skew.saltedJoin) — result must equal the
    * plain join, so the oracle is the plain SQL join: validates that
    * the hot-key detect/salt/replicate/drop pipeline is
    * distribution-only. Threshold 5 marks orderkeys with 6-7 lineitems
    * "hot" (~20% here) so both the salted and constant-salt branches
    * are exercised by the gate; production thresholds are far higher
    * and mark a broadcast-small set. */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_quantity"), 2).as("qty"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"),
        cents(col("o_totalprice"), 2).as("total"))
    Skew.saltedJoin(li, ord, "l_orderkey", 8, hotThreshold = 5L)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Pivot: order counts by status × priority, priorities as columns
    * (explicit value list keeps the schema static and plannable). */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val p = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .count()
    p.select(col("o_orderstatus") +:
        priorities.zipWithIndex.map { case (v, i) =>
          coalesce(col(s"`$v`"), lit(0L)).as(s"p${i + 1}") }: _*)
      .orderBy("o_orderstatus")
  }

  /** CUBE with grouping indicators — all four aggregation levels in
    * one pass (partial-aggregated expansion, no re-scan per level). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Unpivot (melt): wide per-part numeric columns to (attr, value)
    * rows — schema-evolution-friendly long form. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .selectExpr("p_partkey",
        "CAST(p_size AS DOUBLE) AS size_v", "p_retailprice AS price_v")
      .unpivot(Array(col("p_partkey")),
        Array(col("size_v"), col("price_v")), "attr", "val")
      .select(col("p_partkey"), col("attr"),
        cents(col("val"), 2).as("val"))
      .orderBy("p_partkey", "attr")
  }

  /** Ordered string aggregation: per-nation sorted roster of supplier
    * names (deterministic: sort before join). */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy("s_nationkey")
  }

  /** Exact percentiles (type-7 linear interpolation in both engines):
    * median and p90 of quantity per return flag. */
  def qPercentile(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5D)").as("p50"),
        expr("percentile(l_quantity, 0.9D)").as("p90"))
      .orderBy("l_returnflag")
  }

  /** Explicit GROUPING SETS (beyond rollup/cube): per-status totals,
    * per-priority totals, and the grand total in one pass — Catalyst
    * expands to a single partial-aggregated Expand, no re-scan per
    * set. SQL path (the DataFrame API has no grouping-sets surface). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** NTILE quartiles: per return flag, quantity quartile boundaries
    * (count, min, max per quartile) over a fully-deterministic order.
    *
    * Scale shape (r12 rework of the r11 straggler): the naive form —
    * `ntile(4) OVER (PARTITION BY l_returnflag ORDER BY ...)` — funnels
    * the whole fact table through a 3-partition sort window, i.e. three
    * straggler tasks at 100×. But the output only aggregates per
    * (flag, quartile), and the NTILE order key's value domain is tiny
    * (quantity is integral 1..50), so NOTHING per-row is needed: a
    * map-side-combinable groupBy(flag, qty) count, a window over the
    * ~50 bucket rows per flag for cumulative offsets, and the exact
    * NTILE rank→tile formula (first n%4 tiles get n/4+1 rows, the rest
    * n/4) applied to each bucket's rank span [off+1, off+cnt]. A bucket
    * straddling a tile boundary is exploded into the ≤4 tiles it spans
    * with exact row counts. Tie-break columns (l_orderkey,
    * l_linenumber) only permute rows WITHIN a qty bucket, which never
    * moves a row across a (qty → tile-count) boundary, so the result is
    * bit-identical to the sort-window form at any scale. */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    // cents() is monotonic in l_quantity, so bucket order by qty is the
    // same rank order the oracle computes over l_quantity
    val counts = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents(col("l_quantity"), 2).as("qty"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(count(lit(1)).as("cnt"))
    val wB = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
    counts
      .withColumn("off", coalesce(
        sum(col("cnt")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // NTILE(4): big = n%4 leading tiles of size small+1, then size small
      .selectExpr("l_returnflag", "qty", "cnt", "off",
        "n % 4 AS big", "n DIV 4 AS small")
      // tile of this bucket's first and last rank (ranks off+1 .. off+cnt)
      .withColumn("q_lo", expr(
        """CASE WHEN off + 1 <= big * (small + 1)
          |     THEN off DIV (small + 1) + 1
          |     ELSE big + (off - big * (small + 1)) DIV small + 1 END"""
          .stripMargin.replace("\n", " ")))
      .withColumn("q_hi", expr(
        """CASE WHEN off + cnt <= big * (small + 1)
          |     THEN (off + cnt - 1) DIV (small + 1) + 1
          |     ELSE big + (off + cnt - 1 - big * (small + 1)) DIV small + 1 END"""
          .stripMargin.replace("\n", " ")))
      .withColumn("quartile", explode(expr("sequence(q_lo, q_hi)")))
      // rank span of this tile, intersected with the bucket's span
      .withColumn("t_lo", expr(
        """CASE WHEN quartile <= big
          |     THEN (quartile - 1) * (small + 1) + 1
          |     ELSE big * (small + 1) + (quartile - 1 - big) * small + 1 END"""
          .stripMargin.replace("\n", " ")))
      .withColumn("t_hi", expr(
        "t_lo + (CASE WHEN quartile <= big THEN small + 1 ELSE small END) - 1"))
      .withColumn("rows_in",
        expr("LEAST(off + cnt, t_hi) - GREATEST(off + 1, t_lo) + 1"))
      .groupBy(col("l_returnflag"), col("quartile"))
      .agg(sum(col("rows_in")).as("n"), min(col("qty")).as("min_qty"),
        max(col("qty")).as("max_qty"))
      .orderBy("l_returnflag", "quartile")
  }

  /** LATERAL correlated subquery (top-1-per-row without a window):
    * each customer's single most expensive order via CROSS JOIN
    * LATERAL — Catalyst decorrelates the LIMIT 1 subquery into a
    * ranked join, the plan shape a dependent nested loop would
    * never survive at scale. */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lat")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_lat")
    spark.sql(
      """SELECT c_custkey, t.o_orderkey,
        |  CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
        |FROM customer_lat,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Window value functions: lag/lead/first_value over the totalized
    * per-supplier shipment order (the summed/peeked column joins the
    * order spec — duplicate rows exist in the data and neighbor
    * values are only portable under a total order). */
  def qWindowLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("qty"))
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), cents(col("l_quantity"), 2).as("qty"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("qty"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("qty"), 1).over(w).as("prev_qty"),
        lead(col("qty"), 1).over(w).as("next_qty"),
        first_value(col("qty")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_qty"))
      .orderBy("l_suppkey", "rn")
  }

  /** Pure interval join — NO equality key, the case Spark would plan
    * as a broadcast-nested-loop: every high-value purchase opens a
    * 30-minute window; count the clicks (any user) landing inside it.
    * Re-expressed as an equality join by time-bucketing: the bucket
    * width equals the window length, so each window overlaps at most 2
    * buckets (one explode row each) and each point belongs to exactly
    * 1 — the O(n·m) loop becomes a shuffle join on bucket ids with a
    * residual range predicate, which scales linearly and AQE-balances.
    * Windows with zero clicks survive via the final left join. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 1800000000L // 30 min in micros = bucket width
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
    val wins = e.filter(col("event_type") === "purchase" && col("value") >= 95)
      .select(col("event_id").as("purchase_id"), col("us").as("lo"),
        (col("us") + W).as("hi"))
    val winBuckets = wins.selectExpr("purchase_id", "lo", "hi",
      s"explode(sequence(lo DIV ${W}L, (hi - 1) DIV ${W}L)) AS bk")
    val clicks = e.filter(col("event_type") === "click")
      .selectExpr("event_id AS click_id", "us", s"us DIV ${W}L AS bk")
    val counted = winBuckets.join(clicks, "bk")
      .filter(col("us") >= col("lo") && col("us") < col("hi"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_clicks"))
    wins.select("purchase_id")
      .join(counted, Seq("purchase_id"), "left")
      .select(col("purchase_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("purchase_id")
  }

  /** Fixed-width numeric histogram of extended price (5000-wide
    * buckets) — one partial-aggregated pass, the profiling query
    * behind every data-quality dashboard. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .selectExpr("CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket",
        "l_extendedprice")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        csum(col("l_extendedprice"), 2).as("total_cents"))
      .selectExpr("bucket", "bucket * 5000 AS lo", "(bucket + 1) * 5000 AS hi",
        "n", "total_cents")
      .orderBy("bucket")

  /** Approximate percentile (GK sketch) vs exact — same contract
    * pattern as [[qApproxDistinct]]: the sketch value is
    * engine-specific, but the algorithm guarantees rank error ≤ 1%
    * at accuracy 100, so "approx p50 lies between exact p49 and
    * exact p51" is a deterministic boolean any engine can check. */
  def qApproxQuantile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5D, 100)").as("approx_p50"),
        expr("percentile(l_quantity, 0.49D)").as("p49"),
        expr("percentile(l_quantity, 0.51D)").as("p51"))
      .select(col("l_returnflag"), col("p49"), col("p51"),
        (col("approx_p50") >= col("p49") && col("approx_p50") <= col("p51"))
          .cast("long").as("within_bound"))
      .orderBy("l_returnflag")

  /** Approximate distinct (HLL) vs exact. The estimate itself is
    * engine-specific, but the CONTRACT is not: the output folds the
    * HLL value into a deterministic accuracy bit, which any engine can
    * oracle-check. rsd is pinned at 0.02 and the band at 6% (= 3 sigma)
    * so the bit stays trivially 1 with real margin at ANY SF — a 1-2
    * sigma band would make the oracle hash hostage to one legitimate
    * HLL deviation at an untested scale. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
           countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) * 100 <= col("exact_parts") * 6)
          .cast("long").as("within_band"))
      .orderBy(col("l_returnflag"))
  }

  /** EXACT distinct-count under key skew, staged explicitly: phase 1
    * deduplicates (event_type, user_id) pairs — that shuffle is keyed
    * on the PAIR, so a hot event_type's rows spread across partitions
    * by user_id and partial aggregation combines map-side — and
    * phase 2 counts survivors per key, where every group is already
    * collapsed to one row per distinct value. Spark's COUNT(DISTINCT)
    * plans the same two-aggregate shape through Expand, but the
    * explicit staging is what composes when the pipeline needs the
    * deduplicated pairs AGAIN downstream (e.g. a per-day rollup over
    * the same distinct set reuses phase 1 instead of re-expanding) —
    * the shape a 100 TB unique-users job actually ships. */
  def qDistinctSkew(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .groupBy(col("event_type"))
      // COUNT(user_id), not COUNT(*): COUNT(DISTINCT x) ignores NULLs
      // in both engines, but a pre-distinct isNotNull FILTER would
      // also drop an event_type whose user_ids are ALL null — the
      // oracle still emits that group with 0. distinct() collapses
      // the nulls to one row per group, which count(col) then skips.
      .agg(count(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** Z-ORDER clustering audit — the multi-dimensional data-layout
    * technique behind data-skipping file pruning: interleave the bits
    * of two scan dimensions (customer bucket, order day-of-month
    * bucket, 4 bits each) into one z-key, range-bucket rows by its
    * high bits (zkey >> 4 IS a fixed-boundary range partitioning into
    * 16 z-squares), and report each bucket's min/max span in BOTH
    * dimensions. Under z-order every bucket spans ≤ 4 of 16 values in
    * EACH dimension, so a predicate on EITHER dimension prunes ~3/4
    * of buckets from file min/max stats alone; a 1-D sort gets that
    * for one dimension and nothing for the other. At scale the z-key
    * feeds `repartitionByRange(zkey).sortWithinPartitions(zkey)`
    * before the warehouse write; the audit here is the layout-quality
    * check a table-maintenance job runs after compaction. */
  def layoutZorder(spark: SparkSession, dir: String): DataFrame = {
    def bit(c: Column, i: Int): Column =
      shiftright(c, i).bitwiseAND(lit(1L))
    val dims = Tables.orders(spark, dir)
      .select((col("o_custkey") % 16).as("cb"),
        ((dayofmonth(col("o_orderdate")) - 1).cast("long") % 16).as("db"))
    val zkey = (0 until 4).map { i =>
      bit(col("cb"), i) * lit(1L << (2 * i + 1)) +
        bit(col("db"), i) * lit(1L << (2 * i))
    }.reduce(_ + _)
    dims.select(col("cb"), col("db"), zkey.as("zkey"))
      .groupBy(shiftright(col("zkey"), 4).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("cb")).as("cb_min"), max(col("cb")).as("cb_max"),
        min(col("db")).as("db_min"), max(col("db")).as("db_max"))
      .orderBy("zbucket")
  }

  /** Interval union per key (gaps-and-islands): each event opens a
    * 5-minute activity interval; overlapping/adjacent intervals merge,
    * and the output is each user's island count and total covered
    * seconds — the interval-algebra primitive behind billing meters,
    * uptime/SLA windows, and session coverage. ONE shuffle on the
    * key, then two per-key windows (running max-end marks island
    * starts, running sum numbers them) and two aggregates; all
    * integer seconds. Tie rows are identical (same s, e), so island
    * numbering is order-stable at any parallelism. Skew note: a
    * pathologically hot key serializes its own window — at 100 TB the
    * standard fix composes here (pre-split hot keys by day, union the
    * day boundaries through a second merge pass). */
  def qIntervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "unix_seconds(ts) AS s", "unix_seconds(ts) + 300 AS e")
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    val islands = iv
      .withColumn("pme", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("pme").isNull || col("s") > col("pme"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("is_"), max(col("e")).as("ie"))
    islands.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ie") - col("is_")).as("covered_sec"))
      .orderBy("user_id")
  }

  /** Ordered funnel-sequence match (MATCH_RECOGNIZE-lite): per user,
    * the earliest signup → first click STRICTLY AFTER it (arrival
    * order) → first purchase strictly after that. The naive form is
    * two self-joins on an inequality (quadratic per hot user); this is
    * the single-sort form: ONE shuffle on user_id, then three chained
    * running-min windows over the same (us, event_id) order — each
    * stage's qualifier reads the PRECEDING-rows frame of the stage
    * before it, so "after" is arrival-order-strict and tie-safe at any
    * parallelism. Per-user state is O(1); a hot user costs one sorted
    * pass, never a pairwise product. */
  def qSequenceMatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val staged = e
      .withColumn("s_q", when(col("event_type") === "signup", col("us")))
      .withColumn("s_prev", min(col("s_q")).over(prev))
      .withColumn("c_q", when(col("event_type") === "click" &&
        col("s_prev").isNotNull, col("us")))
      .withColumn("c_prev", min(col("c_q")).over(prev))
      .withColumn("p_q", when(col("event_type") === "purchase" &&
        col("c_prev").isNotNull, col("us")))
    staged.groupBy(col("user_id"))
      .agg(min(col("s_q")).as("signup_us"),
        min(col("c_q")).as("click_us"),
        min(col("p_q")).as("purchase_us"))
      .withColumn("stage",
        when(col("purchase_us").isNotNull, 3L)
          .when(col("click_us").isNotNull, 2L)
          .when(col("signup_us").isNotNull, 1L).otherwise(0L))
      .orderBy("user_id")
  }

  /** Funnel conversion-latency summary — the product-analytics read
    * on top of [[qSequenceMatch]]: over users who completed
    * signup → click → purchase, the count, exact integer lower-median
    * (rank-selected under a (latency, user_id) total order, the same
    * engine-exact median as the corpus QA ops), min and max of
    * signup→purchase latency in micros. The converted set is
    * funnel-completion-sized, so the single global ranking window is
    * survivor-sized, never event-volume-sized. */
  def qFunnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val conv = qSequenceMatch(spark, dir)
      .filter(col("stage") === 3)
      .select(col("user_id"), (col("purchase_us") - col("signup_us")).as("conv_us"))
    conv
      .withColumn("rn", row_number().over(
        Window.partitionBy().orderBy(col("conv_us"), col("user_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .agg(count(lit(1)).as("n_converted"),
        min(when(col("rn") === expr("(n + 1) DIV 2"), col("conv_us"))).as("med_conv_us"),
        min(col("conv_us")).as("min_conv_us"),
        max(col("conv_us")).as("max_conv_us"))
  }

  /** Pareto frontier (2-D skyline) of orders — cheapest-and-most-
    * recent: rows no other row beats on BOTH price (minimize) and
    * order date (maximize). The naive form is a quadratic NOT EXISTS
    * self-join (the oracle states exactly that, as the definition);
    * this is the two-phase linear decomposition that scales: skyline
    * is distributive over ANY partition of the data (a global skyline
    * point must be a skyline point of its own bucket), so phase 1
    * computes per-bucket skylines in parallel — each bucket one sort,
    * two running-max windows over (price ASC) — and phase 2 re-runs
    * the same window pair globally over the few survivors.
    * Dominated iff a strictly-cheaper row has date ≥ mine (window
    * over RANGE ..-1) or a cheaper-or-equal row has date > mine
    * (window over RANGE ..CURRENT). Integer cents/micros. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), cents(col("o_totalprice"), 2).as("price_c"),
      // parquet ms-timestamps surface as TIMESTAMP_NTZ; unix_micros
      // needs the session-TZ (UTC) instant
      unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"))
    def survivors(in: DataFrame, parts: Seq[Column]): DataFrame = {
      val base = Window.partitionBy(parts: _*).orderBy(col("price_c"))
      in.withColumn("m_lt", max(col("date_us")).over(
          base.rangeBetween(Window.unboundedPreceding, -1)))
        .withColumn("m_le", max(col("date_us")).over(
          base.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter((col("m_lt").isNull || col("m_lt") < col("date_us")) &&
          col("m_le") <= col("date_us"))
        .select(col("o_orderkey"), col("price_c"), col("date_us"))
    }
    val local = survivors(
      o.withColumn("bucket", col("o_orderkey") % 16), Seq(col("bucket")))
    survivors(local, Seq.empty).orderBy("price_c", "o_orderkey")
  }

  /** Per-partition column statistics — the data-skipping index a
    * lakehouse maintains (parquet footer min/max, ANALYZE ndv/null
    * counts): for each month partition of orders × each tracked
    * column, min/max (stringified), exact distinct count, null count,
    * row count. Shape (r13): a map-side `stack` unpivot to
    * (month, column, value) — one narrow row per tracked cell — then
    * a TWO-LEVEL distinct: level 1 groups by (month, column, value)
    * with map-side partial aggregation (low-NDV columns collapse to
    * their value domain before the shuffle), level 2 rolls the
    * distinct-value table up to one row per (month, column). This
    * replaces the r12 multi-`countDistinct` groupBy, whose Catalyst
    * rewrite replicated the fact scan ×5 through an Expand — the one
    * plan in the repo that would not survive 100× (the ANALYZE pass
    * runs on EVERY table). PlanSpec pins "no Expand over the fact
    * scan". Numeric columns carry their BIGINT value alongside the
    * canonical string group key so min/max stay numerically ordered
    * (`coalesce(CAST(min(v_n)), min(v_s))`); nulls group to one
    * level-1 row whose count is the column's null count, and
    * `count(v_s)` at level 2 counts exactly the non-null distinct
    * values — countDistinct semantics, no Expand. Output is
    * months×columns-sized at any SF. Feeds partition pruning: a
    * filter on any tracked column consults this table to skip whole
    * months. */
  def layoutColumnStats(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("part_month"),
      col("o_orderstatus"), col("o_orderpriority"), col("o_custkey"),
      cents(col("o_totalprice"), 2).as("price_c"))
    // unpivot: (month, column, string group key, numeric sort key).
    // CAST(long AS STRING) is injective, so distinct-v_s = distinct
    // values; v_n is NULL for genuinely-string columns.
    val vals = o.selectExpr("part_month",
      """stack(4,
        |'o_orderstatus',   o_orderstatus,             CAST(NULL AS BIGINT),
        |'o_orderpriority', o_orderpriority,           CAST(NULL AS BIGINT),
        |'o_custkey',       CAST(o_custkey AS STRING), CAST(o_custkey AS BIGINT),
        |'o_totalprice_c',  CAST(price_c AS STRING),   price_c
        |) AS (col_name, v_s, v_n)""".stripMargin.replace("\n", " "))
    // level 1: one row per distinct (month, column, value), carrying
    // its multiplicity (null values collapse to one row = null count)
    val lvl1 = vals.groupBy(col("part_month"), col("col_name"), col("v_s"))
      .agg(count(lit(1)).as("cnt"), min(col("v_n")).as("v_n"))
    // level 2: distinct-value table → per-(month, column) stats row
    lvl1.groupBy(col("part_month"), col("col_name"))
      .agg(
        coalesce(min(col("v_n")).cast("string"), min(col("v_s"))).as("min_s"),
        coalesce(max(col("v_n")).cast("string"), max(col("v_s"))).as("max_s"),
        count(col("v_s")).as("ndv"),
        sum(when(col("v_s").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        sum(col("cnt")).as("n_rows"))
      .select(col("part_month"), col("col_name"), col("min_s"), col("max_s"),
        col("ndv"), col("n_null"), col("n_rows"))
      .orderBy("part_month", "col_name")
  }

  /** The 100 TB-honest ANALYZE variant of [[layoutColumnStats]]
    * (r12 verdict item 1's second half): per month × column, the HLL
    * `approx_count_distinct` estimate computed in ONE pass — four
    * sketches ride one map-side-combined aggregate with NO Expand and
    * NO per-value shuffle (sketch buffers are constant-size; shuffle
    * volume is months × 4 sketches at any SF), which is the plan an
    * ANALYZE that runs on EVERY table at 100 TB actually ships; the
    * exact two-level-distinct table joins in only to FOLD the
    * engine-specific estimate into the portable contract bit
    * (|approx − exact| ≤ max(6% · exact, 2) — the [[qApproxDistinct]]
    * convention plus an absolute slack of 2 for tiny cardinalities,
    * where the relative band is sub-integer and HLL's discrete
    * register jitter can legitimately miss by one; rsd pinned at 0.02
    * so the 6% band is a full 3 sigma everywhere it is the binding
    * one — wide enough that no single legitimate deviation at an
    * untested SF can flip the oracle bit). A deployment keeps the
    * sketch path; the exact path here is the auditor. */
  def layoutColumnStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("part_month"),
      col("o_orderstatus"), col("o_orderpriority"), col("o_custkey"),
      cents(col("o_totalprice"), 2).as("price_c"))
    val approx = o.groupBy(col("part_month")).agg(
        approx_count_distinct(col("o_orderstatus"), 0.02).as("a_status"),
        approx_count_distinct(col("o_orderpriority"), 0.02).as("a_prio"),
        approx_count_distinct(col("o_custkey"), 0.02).as("a_cust"),
        approx_count_distinct(col("price_c"), 0.02).as("a_price"))
      .selectExpr("part_month",
        """stack(4,
          |'o_orderstatus',   a_status,
          |'o_orderpriority', a_prio,
          |'o_custkey',       a_cust,
          |'o_totalprice_c',  a_price) AS (col_name, approx_ndv)"""
          .stripMargin.replace("\n", " "))
    val exact = layoutColumnStats(spark, dir)
      .select(col("part_month"), col("col_name"), col("ndv"))
    approx.join(exact, Seq("part_month", "col_name"))
      .select(col("part_month"), col("col_name"), col("ndv"),
        (abs(col("approx_ndv") - col("ndv")) * 100 <= col("ndv") * 6 ||
          abs(col("approx_ndv") - col("ndv")) <= 2)
          .cast("long").as("within_band"))
      .orderBy("part_month", "col_name")
  }

  /** CUSUM control chart over the daily order-count series — the
    * drift detector a pipeline health monitor runs on ingest volume
    * (Page's cumulative-sum test; [[qChangepoint]] finds the single
    * biggest level shift, CUSUM raises ALARMS online as soon as
    * cumulative drift exceeds a threshold). The textbook recurrence
    * `pos_t = max(0, pos_{t-1} + x_t − ref − slack)` is RECURSIVE and
    * window-inexpressible — but the reflection identity
    * `pos_t = S_t − min(0, min_{i≤t} S_i)` (S = running sum of
    * deviations) turns it into two stock windows: a running sum and a
    * running min, both partitioned by YEAR and ordered by day. So the
    * whole detector is calendar-bounded windowed arithmetic — no
    * fold, no collect, no global window — and every quantity is an
    * integer (per-year lower-median reference, slack = ref/20,
    * threshold = ref/4), so the oracle replay is exact. Output: one
    * row per year with the reference, both one-sided alarm counts,
    * and the max CUSUM excursions. */
  def qCusumAlarm(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("yr", year(col("d")).cast("long"))
    val wRank = Window.partitionBy(col("yr")).orderBy(col("cnt"), col("d"))
    val wYear = Window.partitionBy(col("yr"))
    val wCum = Window.partitionBy(col("yr")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_days", count(lit(1)).over(wYear))
      .withColumn("ref",
        max(when(col("rn") === expr("(n_days + 1) DIV 2"), col("cnt"))).over(wYear))
      .withColumn("slack", expr("GREATEST(ref DIV 20, 1)"))
      .withColumn("h", expr("GREATEST(ref DIV 4, 1)"))
      .withColumn("sp", sum(col("cnt") - col("ref") - col("slack")).over(wCum))
      .withColumn("sn", sum(col("ref") - col("cnt") - col("slack")).over(wCum))
      .withColumn("pos", col("sp") - least(min(col("sp")).over(wCum), lit(0L)))
      .withColumn("neg", col("sn") - least(min(col("sn")).over(wCum), lit(0L)))
    scored.groupBy(col("yr"))
      .agg(count(lit(1)).as("n_days"),
        min(col("ref")).as("ref_daily"),
        min(col("slack")).as("slack"),
        min(col("h")).as("threshold"),
        sum(when(col("pos") > col("h"), 1L).otherwise(0L)).as("alarms_pos"),
        sum(when(col("neg") > col("h"), 1L).otherwise(0L)).as("alarms_neg"),
        max(col("pos")).as("max_pos"),
        max(col("neg")).as("max_neg"))
      .orderBy("yr")
  }

  /** One table's contribution to the catalog-wide ANALYZE sweep: the
    * [[layoutColumnStats]] stack-unpivot + two-level distinct, with
    * the table name, partition key, and tracked columns parameterized
    * (`stackSql` rows are `'col', string_value, numeric_value`
    * triples; the input must already expose a STRING `part_key`).
    * Same plan as the single-table pass — map-side Generate, no
    * Expand, low-NDV columns collapse to their value domain before
    * the shuffle. */
  private def tableColumnStats(df: DataFrame, tableName: String,
                               nCols: Int, stackSql: String): DataFrame = {
    val vals = df.selectExpr("part_key",
      s"stack($nCols, $stackSql) AS (col_name, v_s, v_n)")
    val lvl1 = vals.groupBy(col("part_key"), col("col_name"), col("v_s"))
      .agg(count(lit(1)).as("cnt"), min(col("v_n")).as("v_n"))
    lvl1.groupBy(col("part_key"), col("col_name"))
      .agg(
        coalesce(min(col("v_n")).cast("string"), min(col("v_s"))).as("min_s"),
        coalesce(max(col("v_n")).cast("string"), max(col("v_s"))).as("max_s"),
        count(col("v_s")).as("ndv"),
        sum(when(col("v_s").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        sum(col("cnt")).as("n_rows"))
      .select(lit(tableName).as("table_name"), col("part_key"), col("col_name"),
        col("min_s"), col("max_s"), col("ndv"), col("n_null"), col("n_rows"))
  }

  /** Catalog-wide ANALYZE sweep (VERDICT r13 item 5): the
    * [[layoutColumnStats]] pass run over EVERY major table —
    * orders/lineitem by month partition, customer as one unpartitioned
    * table, documents by source — unioned into the single stats table
    * a lakehouse catalog actually maintains. Each branch is the same
    * Expand-free shape (stack unpivot → two-level distinct with
    * map-side partials); the union is plan-level, so Spark schedules
    * the four table scans independently and nothing joins until the
    * months×columns-sized outputs concatenate. At 100 TB this is the
    * nightly stats job: per-table cost is one scan + a
    * value-domain-sized shuffle, and adding a table to the sweep is
    * one more `tableColumnStats` line, not a new plan shape. */
  def layoutStatsSweep(spark: SparkSession, dir: String): DataFrame =
    // session-cached: the exact sweep is also the AUDITOR the sketch
    // variant joins against, and its output is (tables × partitions ×
    // columns)-sized — catalog stats, not data
    graft.Caches.sharedCheckpoint(spark, s"layout.sweep:$dir") {
      layoutStatsSweepBuild(spark, dir)
    }

  // ONE definition of each swept table's (part_key + tracked columns)
  // projection, consumed by BOTH the exact sweep and the sketch
  // variant — a column/scale change in one place keeps the contract
  // join's key space aligned instead of silently dropping cells
  // Deliberately NOT spread (r17, measured and REJECTED): splitting
  // the rsd=0.02 HLL partial aggregation across 32 short tasks
  // de-warms the JIT on the ~1,500-buffer-column update path
  // (4 sketches × ~384 long words at p=12) — the same 600k-row
  // partial burned 22-25 s CPU post-spread (787 s in one deopt-storm
  // run, 27 s wall) vs ~2 s wall in the single long task where the
  // loop compiles hot. Event-log evidence: stage "time in aggregation
  // build" 787,735 ms over 32 tasks, records read 600,000, zero
  // spill/fetch — pure de-optimized compute. At production split
  // counts each task is row-group-sized (millions of rows), the
  // method warms per task, and no spread is needed either.
  private def sweepOrders(spark: SparkSession, dir: String): DataFrame =
    sweepOrdersOf(Tables.orders(spark, dir))

  private def sweepOrdersOf(base: DataFrame): DataFrame =
    base.select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("string").as("part_key"),
      col("o_orderstatus"), col("o_orderpriority"), col("o_custkey"),
      cents(col("o_totalprice"), 2).as("price_c"))

  private def sweepLineitem(spark: SparkSession, dir: String): DataFrame =
    sweepLineitemOf(Tables.lineitem(spark, dir))

  private def sweepLineitemOf(base: DataFrame): DataFrame =
    base.select(
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("string").as("part_key"),
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("long").as("qty"),
      cents(col("l_extendedprice"), 2).as("eprice_c"))

  private def sweepCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      lit("ALL").as("part_key"), col("c_mktsegment"),
      col("c_nationkey").cast("long").as("nationkey"),
      cents(col("c_acctbal"), 2).as("acctbal_c"))

  private def sweepDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      coalesce(col("source"), lit("?")).as("part_key"),
      col("lang"), col("doc_id"), col("n_chars"))

  private def layoutStatsSweepBuild(spark: SparkSession, dir: String): DataFrame = {
    // EXACT build only: spread the two big fact branches — the
    // stack(×4) Generate + count/min/max partial aggregation has
    // NARROW codegen'd buffers (unlike the approx side's HLL sketches,
    // whose spread was measured and rejected above), so parallelizing
    // the single-split scan pays. The approx side keeps the unspread
    // sweep* projections.
    val orders = sweepOrdersOf(Tables.spread(spark, dir, "orders", "o_orderkey"))
    val li = sweepLineitemOf(Tables.spread(spark, dir, "lineitem", "l_orderkey"))
    val cust = sweepCustomer(spark, dir)
    val docs = sweepDocuments(spark, dir)
    tableColumnStats(orders, "orders", 4,
      """'o_orderstatus',   o_orderstatus,             CAST(NULL AS BIGINT),
        |'o_orderpriority', o_orderpriority,           CAST(NULL AS BIGINT),
        |'o_custkey',       CAST(o_custkey AS STRING), CAST(o_custkey AS BIGINT),
        |'o_totalprice_c',  CAST(price_c AS STRING),   price_c""".stripMargin.replace("\n", " "))
      .unionAll(tableColumnStats(li, "lineitem", 4,
        """'l_returnflag',     l_returnflag,            CAST(NULL AS BIGINT),
          |'l_linestatus',     l_linestatus,            CAST(NULL AS BIGINT),
          |'l_quantity',       CAST(qty AS STRING),     qty,
          |'l_extendedprice_c', CAST(eprice_c AS STRING), eprice_c""".stripMargin.replace("\n", " ")))
      .unionAll(tableColumnStats(cust, "customer", 3,
        """'c_mktsegment', c_mktsegment,              CAST(NULL AS BIGINT),
          |'c_nationkey',  CAST(nationkey AS STRING), nationkey,
          |'c_acctbal_c',  CAST(acctbal_c AS STRING), acctbal_c""".stripMargin.replace("\n", " ")))
      .unionAll(tableColumnStats(docs, "documents", 3,
        """'lang',    lang,                     CAST(NULL AS BIGINT),
          |'doc_id',  CAST(doc_id AS STRING),   doc_id,
          |'n_chars', CAST(n_chars AS STRING),  n_chars""".stripMargin.replace("\n", " ")))
      .orderBy("table_name", "part_key", "col_name")
  }

  /** The sketch half of the catalog-wide ANALYZE (completing VERDICT
    * r13 item 5 end-to-end): per table ONE map-side-combined pass of
    * HLL `approx_count_distinct(rsd = 0.02)` sketches — no Expand, no
    * per-value shuffle, shuffle volume = partitions × columns of
    * constant-size sketch buffers at ANY SF (this is the plan the
    * nightly 100 TB stats job actually ships; [[layoutStatsSweep]]'s
    * exact two-level pass is its auditor, joined in only to fold each
    * estimate into the portable |approx − exact| ≤ max(6%, 2)
    * contract bit — the [[layoutColumnStatsApprox]] convention at
    * 3 sigma). */
  def layoutStatsSweepApprox(spark: SparkSession, dir: String): DataFrame = {
    def branch(df: DataFrame, table: String,
               cols: Seq[(String, String)]): DataFrame = {
      val aggs = cols.map { case (alias, c) =>
        approx_count_distinct(col(c), 0.02).as(s"a_$alias") }
      val stackRows = cols.map { case (alias, _) => s"'$alias', a_$alias" }
        .mkString(", ")
      df.groupBy(col("part_key"))
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr("part_key",
          s"stack(${cols.size}, $stackRows) AS (col_name, approx_ndv)")
        .select(lit(table).as("table_name"), col("part_key"),
          col("col_name"), col("approx_ndv"))
    }
    val orders = sweepOrders(spark, dir)
    val li = sweepLineitem(spark, dir)
    val cust = sweepCustomer(spark, dir)
    val docs = sweepDocuments(spark, dir)
    val approx =
      branch(orders, "orders", Seq(
        "o_orderstatus" -> "o_orderstatus", "o_orderpriority" -> "o_orderpriority",
        "o_custkey" -> "o_custkey", "o_totalprice_c" -> "price_c"))
      .unionAll(branch(li, "lineitem", Seq(
        "l_returnflag" -> "l_returnflag", "l_linestatus" -> "l_linestatus",
        "l_quantity" -> "qty", "l_extendedprice_c" -> "eprice_c")))
      .unionAll(branch(cust, "customer", Seq(
        "c_mktsegment" -> "c_mktsegment", "c_nationkey" -> "nationkey",
        "c_acctbal_c" -> "acctbal_c")))
      .unionAll(branch(docs, "documents", Seq(
        "lang" -> "lang", "doc_id" -> "doc_id", "n_chars" -> "n_chars")))
    val exact = layoutStatsSweep(spark, dir)
      .select(col("table_name"), col("part_key"), col("col_name"), col("ndv"))
    approx.join(exact, Seq("table_name", "part_key", "col_name"))
      .select(col("table_name"), col("part_key"), col("col_name"), col("ndv"),
        (abs(col("approx_ndv") - col("ndv")) * 100 <= col("ndv") * 6 ||
          abs(col("approx_ndv") - col("ndv")) <= 2)
          .cast("long").as("within_band"))
      .orderBy("table_name", "part_key", "col_name")
  }

  /** Small-file compaction planner — the OPTIMIZE/maintenance step a
    * 100 TB lakehouse runs continuously: the file listing (here one
    * "file" per ship-date day of lineitem, sized by its real string
    * payload) is grouped into target-size compaction bins by
    * cumulative-byte division — exactly how Spark's own file-scan
    * coalescing packs splits. The file inventory is aggregated
    * DISTRIBUTED (one groupBy day, map-side partials over the raw
    * rows); only the day-level inventory (thousands of rows at any
    * scale — it is partition-count-sized) flows through the single
    * global cumulative window, and the emitted plan is what the
    * rewrite job executes bin-by-bin. Integer bytes throughout. */
  def layoutCompactionPlan(spark: SparkSession, dir: String,
                           targetBytes: Long = 1L << 16): DataFrame = {
    val files = Tables.lineitem(spark, dir)
      .groupBy((year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 +
        dayofmonth(col("l_shipdate"))).cast("long").as("file_key"))
      .agg(count(lit(1)).as("n_rows"),
        // deterministic size model: fixed 64B/row + real var-width payload
        (sum(length(col("l_returnflag")) + length(col("l_linestatus")))
          + count(lit(1)) * 64L).as("bytes"))
    val w = Window.orderBy(col("file_key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      // integer DIV, not `/`: long / long is double division in Spark
      .selectExpr("file_key", "n_rows", "bytes",
        s"cum_before DIV ${targetBytes}L AS bin_id",
        s"cum_before % ${targetBytes}L AS bin_offset")
      .orderBy("file_key")
  }

  /** Clustering-depth histogram — the layout-health metric behind
    * "should OPTIMIZE/recluster run" (Delta/Iceberg call it clustering
    * or overlap depth): files written in ship-date ingest order carry
    * min/max stats on the QUERY key (`l_orderkey`); a point predicate
    * on that key must open every file whose [min,max] covers the
    * point, so the overlap DEPTH at a key value IS the file-open
    * amplification there. The classic interval sweep (same shape as
    * [[qSessionOverlap]], at file grain): each file's key range emits
    * +1 at min and −1 at max+1 (half-open — touching ranges don't
    * overlap), boundaries order globally, running sum = depth over
    * [boundary, next boundary); the histogram rolls up per depth the
    * segment count, covered key units, and share of the covered
    * domain in bp. depth≈1 everywhere ⇒ clustered (skipping prunes
    * to ~1 file); depth≈n_files ⇒ the key is unclustered and every
    * probe reads everything — schedule the recluster. The sweep runs
    * over FILE-COUNT-sized metadata (two rows per file — this is the
    * stats table a lakehouse keeps per file, never the data), so the
    * single global window is days-sized at any data scale; the only
    * data-sized pass is the min/max-per-file aggregate feeding it. */
  def layoutClusterDepth(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.lineitem(spark, dir)
      .groupBy((year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 +
        dayofmonth(col("l_shipdate"))).cast("long").as("file_key"))
      .agg(min(col("l_orderkey")).as("rmin"),
        max(col("l_orderkey")).as("rmax"))
    // both sweep endpoints explode from the ONE min/max aggregate —
    // a unionAll of two selects over `files` would re-plan the
    // aggregate per branch and scan the fact twice
    val pts = files.select(explode(array(
        struct(col("rmin").as("p"), lit(1L).as("d")),
        struct((col("rmax") + 1).as("p"), lit(-1L).as("d")))).as("pt"))
      .select(col("pt.p"), col("pt.d"))
      .groupBy(col("p")).agg(sum(col("d")).as("d"))
    val wG = Window.orderBy(col("p"))
    val segs = pts
      .withColumn("depth", sum(col("d")).over(
        wG.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_p", lead(col("p"), 1).over(wG))
      .filter(col("depth") > 0 && col("next_p").isNotNull)
      .select(col("depth"), (col("next_p") - col("p")).as("span"))
    // the covered-domain total folds over the DEPTH-LEVEL histogram
    // (a handful of rows) — a separate aggregate branch would re-run
    // the whole sweep pipeline, scanning the fact a second time
    segs.groupBy(col("depth"))
      .agg(count(lit(1)).as("n_segments"), sum(col("span")).as("span_keys"))
      .withColumn("covered", sum(col("span_keys")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .selectExpr("depth", "n_segments", "span_keys",
        "(span_keys * 10000) DIV covered AS span_bp")
      .orderBy("depth")
  }

  /** Max-concurrency interval analytics — the sweep-line complement
    * of [[qIntervalUnion]] (same 5-minute activity intervals): per
    * user, the PEAK number of simultaneously-open intervals. The
    * classic sweep: every interval contributes a +1 at its start and
    * a −1 at its end, order endpoints (−1 before +1 at the same
    * instant — half-open [s,e) intervals touch without overlapping),
    * running sum = live depth, max = answer. ONE shuffle on the user
    * key; the window is per-user, never global. The same shape prices
    * concurrent-session licensing, peak connection counts, and
    * decoder-pool contention. */
  def qSessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "unix_seconds(ts) AS s", "unix_seconds(ts) + 300 AS e")
    val pts = iv.selectExpr("user_id", "s AS p", "CAST(1 AS BIGINT) AS d")
      .unionAll(iv.selectExpr("user_id", "e AS p", "CAST(-1 AS BIGINT) AS d"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("p"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("depth", sum(col("d")).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("depth")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
      .orderBy("user_id")
  }

  /** Heavy hitters per group through the [[graft.functions.SpaceSavingAgg]]
    * Misra–Gries summary — constant memory per group where the exact
    * form shuffles every distinct key (the sketch behind hot-key
    * detection at unbounded cardinality; `Skew.saltedJoin`'s
    * pre-aggregate works because TPC-H keys fit — a 100 TB stream's
    * don't). cap = 2 over the 3-valued status column forces real MG
    * evictions in every buffer and real cut-merges across partials;
    * the MG theorem guarantees any status with > 1/(cap+1) of its
    * month survives, so the gate joins the EXACT heavy set (the
    * oracle) against sketch membership — a dropped guaranteed key
    * loses a row and fails the hash. Counts come from the exact side;
    * only membership crosses the boundary (sketch counters are
    * order-dependent by construction). */
  def qHeavyHitters(spark: SparkSession, dir: String, cap: Int = 2): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("part_month"),
      col("o_orderstatus"))
    val sketch = o.groupBy(col("part_month"))
      .agg(graft.functions.SpaceSavingAgg.heavyKeys(col("o_orderstatus"), cap).as("keys"))
      .selectExpr("part_month", "explode(keys) AS o_orderstatus")
      .withColumn("in_sketch", lit(1L))
    val counts = o.groupBy(col("part_month"), col("o_orderstatus"))
      .agg(count(lit(1)).as("freq"))
    val totals = o.groupBy(col("part_month")).agg(count(lit(1)).as("n_rows"))
    counts.join(totals, "part_month")
      .filter(col("freq") * (cap + 1) > col("n_rows"))
      .join(sketch, Seq("part_month", "o_orderstatus"))
      .select(col("part_month"), col("o_orderstatus"), col("freq"),
        col("n_rows"), col("in_sketch"))
      .orderBy("part_month", "o_orderstatus")
  }

  /** Cumulative-unique-users curve per event type — the "distinct so
    * far" dashboard metric, staged so NO hot global window exists:
    * running count-distinct is not distributive, but first-seen flags
    * are — each (type, user) collapses to its first-event day
    * map-side (well-distributed two-column key), days aggregate to
    * new-user counts, and the only cumulative window runs over the
    * per-DAY summary (days × types rows — bounded at any corpus
    * size). The naive form (running distinct over a per-type window)
    * would put the whole table through ~5 window partitions. */
  def qRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("event_type", "user_id", "unix_micros(ts) AS us")
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(col("us")).as("first_us"))
      .selectExpr("event_type", "first_us DIV 86400000000 AS day")
    val daily = firstDay.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy("event_type", "day")
  }

  /** Zone-map data-skipping evaluation — the measured answer to "is
    * this layout worth it": per 16 ship-date-range buckets (width
    * buckets over [min,max] from one broadcast 1-row aggregate — no
    * global sort), a zone map (min/max ship-date micros + row count),
    * then four range predicates evaluated AGAINST THE ZONE MAPS ONLY:
    * buckets whose [min,max] is disjoint from the predicate are
    * skipped, survivors bill their full row count. This is exactly
    * how parquet row-group pruning and lakehouse file skipping cost a
    * clustered layout (the evaluation loop behind Delta/Iceberg
    * OPTIMIZE decisions, and the measurable half of
    * [[layoutZorder]]'s clustering claim). Output: per predicate, the
    * bucket/skip counts and rows scanned — 4 rows at any scale. */
  def layoutSkippingEval(spark: SparkSession, dir: String): DataFrame = {
    // l_shipdate arrives TIMESTAMP_NTZ; session is pinned UTC, so the
    // cast to the instant type is identity and matches epoch_us
    val li = Tables.lineitem(spark, dir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("sd"))
    val bounds = li.agg(min(col("sd")).as("lo"), max(col("sd")).as("hi"))
    val zones = li.crossJoin(broadcast(bounds))
      .selectExpr("sd", "(sd - lo) * 16 DIV (hi - lo + 1) AS bucket")
      .groupBy(col("bucket"))
      .agg(min(col("sd")).as("zmin"), max(col("sd")).as("zmax"),
        count(lit(1)).as("n_rows"))
    // predicate table: [plo, phi) half-open micro ranges
    def us(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    // finite sentinels for the unbounded ends (0 / 2100-01-01) so the
    // oracle can write them as plain timestamp literals
    val preds = Seq(
      (1L, us("1997-01-01"), us("2100-01-01")),
      (2L, 0L, us("1993-06-01")),
      (3L, us("1994-01-01"), us("1995-01-01")),
      (4L, us("1998-09-01"), us("2100-01-01")))
    val pdf = spark.createDataFrame(preds).toDF("pred_id", "plo", "phi")
    zones.crossJoin(broadcast(pdf))
      .selectExpr("pred_id", "n_rows",
        // zone [zmin,zmax] disjoint from [plo,phi) ⇒ skip
        "CAST(CASE WHEN zmax < plo OR zmin >= phi THEN 1 ELSE 0 END AS BIGINT) AS skipped")
      .groupBy(col("pred_id"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("skipped")).as("n_skipped"),
        sum(expr("CASE WHEN skipped = 0 THEN n_rows ELSE 0 END")).as("rows_scanned"))
      .orderBy("pred_id")
  }

  /** Z-ORDER clustering quality (the Delta ZORDER BY / Iceberg
    * sort-order story — MULTI-dimensional file skipping, where a
    * linear sort gives perfect pruning on its sort key and none on
    * any other column): both dims normalize to 8-bit rank cells
    * (`x·256 DIV (max+1)` — closed-form, no window, identical in the
    * oracle), the z-value INTERLEAVES their bits (the Morton curve),
    * and files are modeled as 64 equal z-ranges (`z DIV 1024`) vs 64
    * equal partkey ranges (`px DIV 4`) for the linear layout. For a
    * 1/16-keyspace probe on EACH dim, the ledger counts the files a
    * zone-map scan must touch under each layout: linear touches ~4 on
    * its own key and nearly all on the other; z-order touches ~8 ON
    * BOTH — the balanced skipping that makes the rewrite worth paying
    * once when queries filter on two dims. One map-side pass partial-
    * aggregates to the ≤64×64 (file_lin, file_z) cell grid; the four
    * conditional distinct-counts run over that bounded grid (the
    * Expand sits ABOVE the aggregate, never on the scan — the
    * layout_column_stats lesson). */
  def layoutZorderCluster(spark: SparkSession, dir: String): DataFrame = {
    val zBits = (0 until 8).map(i =>
      s"(shiftleft(shiftright(px, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(sx, $i) & 1, ${2 * i + 1}))").mkString(" + ")
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val bounds = li.agg(max("l_partkey").as("mp"), max("l_suppkey").as("ms"))
    val cells = li.crossJoin(broadcast(bounds))
      .selectExpr(
        "CAST(l_partkey * 256 DIV (mp + 1) AS BIGINT) AS px",
        "CAST(l_suppkey * 256 DIV (ms + 1) AS BIGINT) AS sx")
      .selectExpr("px", "sx", s"($zBits) AS z")
      .selectExpr("px DIV 4 AS file_lin", "z DIV 1024 AS file_z",
        "CASE WHEN px BETWEEN 16 AND 31 THEN 1 ELSE 0 END AS pp",
        "CASE WHEN sx BETWEEN 16 AND 31 THEN 1 ELSE 0 END AS ps")
      .groupBy("file_lin", "file_z")
      .agg(sum(col("pp")).as("np"), sum(col("ps")).as("ns"))
    cells.agg(
      countDistinct(when(col("np") > 0, col("file_lin"))).as("flp"),
      countDistinct(when(col("ns") > 0, col("file_lin"))).as("fls"),
      countDistinct(when(col("np") > 0, col("file_z"))).as("fzp"),
      countDistinct(when(col("ns") > 0, col("file_z"))).as("fzs"),
      sum(col("np")).as("rp"), sum(col("ns")).as("rs"))
      .selectExpr(
        """stack(4,
          |  'linear', 'partkey', flp, rp,
          |  'linear', 'suppkey', fls, rs,
          |  'zorder', 'partkey', fzp, rp,
          |  'zorder', 'suppkey', fzs, rs
          |) AS (layout, probe, files_touched, rows_matched)"""
          .stripMargin.replace("\n", " "))
      .selectExpr("layout", "probe",
        "CAST(files_touched AS BIGINT) AS files_touched",
        "CAST(rows_matched AS BIGINT) AS rows_matched")
      .orderBy("layout", "probe")
  }

  /** ANALYZE → PRUNE, closed end-to-end (VERDICT r14 item 7): the
    * prune decisions for lineitem-by-month are computed FROM
    * [[layoutStatsSweep]]'s catalog output — the same stats table the
    * nightly ANALYZE writes — not from hand-built zone maps (the
    * [[layoutSkippingEval]] model). Each lineitem month partition
    * carries (from the sweep) its row count and its l_quantity
    * min/max; predicates are evaluated against the CATALOG alone, in
    * two dimensions: month-range predicates prune on the partition
    * key, quantity-range predicates prune on the column min/max — and
    * the report shows what a layout owner needs to see: date
    * predicates skip most partitions, quantity predicates skip NONE
    * (quantity is uniform within every month — don't cluster on it)
    * except the vacuous > 50 probe, which the stats prove empty
    * without touching a single row. Per (predicate, dimension): parts
    * considered / skipped, and the rows the surviving partitions
    * would scan. The stats rows are catalog-sized (months × columns);
    * nothing here rescans the fact table. */
  def layoutPruneFromStats(spark: SparkSession, dir: String): DataFrame = {
    val zones = layoutStatsSweep(spark, dir)
      .filter(col("table_name") === "lineitem" && col("col_name") === "l_quantity")
      .selectExpr("CAST(part_key AS BIGINT) AS pmonth",
        "CAST(min_s AS BIGINT) AS qmin", "CAST(max_s AS BIGINT) AS qmax",
        "n_rows")
    // predicate catalog: [plo, phi) half-open, month ints for the
    // partition dimension, quantities for the column dimension
    val preds = Seq(
      (1L, "part_month", 199701L, 210001L),
      (2L, "part_month", 0L, 199306L),
      (3L, "part_month", 199401L, 199501L),
      (4L, "part_month", 199809L, 210001L),
      (5L, "l_quantity", 1L, 10L),
      (6L, "l_quantity", 45L, 51L),
      (7L, "l_quantity", 51L, 1000L))
    val pdf = spark.createDataFrame(preds).toDF("pred_id", "dim", "plo", "phi")
    zones.crossJoin(broadcast(pdf))
      .selectExpr("pred_id", "dim", "n_rows",
        """CAST(CASE WHEN dim = 'part_month'
          |  THEN CASE WHEN pmonth < plo OR pmonth >= phi THEN 1 ELSE 0 END
          |  ELSE CASE WHEN qmax < plo OR qmin >= phi THEN 1 ELSE 0 END
          |END AS BIGINT) AS skipped""".stripMargin.replace("\n", " "))
      .groupBy(col("pred_id"), col("dim"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("skipped")).as("n_skipped"),
        sum(expr("CASE WHEN skipped = 0 THEN n_rows ELSE 0 END")).as("rows_scanned"))
      .orderBy("pred_id")
  }

  /** The [[graft.plans.TopKRewriteRule]] under the gate: the query is
    * written in the PLAIN DataFrame window idiom — `row_number()
    * .over(partitionBy(part).orderBy(...)) <= 2` — and the optimizer
    * (armed on an isolated `newSession` so no other gate query's plan
    * is perturbed) rewrites it to the bounded-heap
    * [[graft.plans.TopKPerKeyPlan]]: no per-group sort, O(keys·k)
    * state, one exchange on the key. The oracle checks the REWRITTEN
    * plan's rows against the window definition in SQL — a wrong
    * rewrite fails the hash; the spec additionally asserts the
    * physical plan really is the heap operator and that the un-armed
    * session agrees row-for-row. */
  def qTopkRewrite(spark: SparkSession, dir: String): DataFrame = {
    val s2 = spark.newSession()
    graft.plans.TopKRewrite.enable(s2)
    val li = Tables.lineitem(s2, dir).select(
      col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    li.withColumn("rk", row_number().over(
        Window.partitionBy("l_partkey")
          .orderBy(col("ship_us").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rk") <= 2)
      .withColumn("rk", col("rk").cast("long"))
      .orderBy("l_partkey", "rk")
  }

  /** Calendar gap-fill + forward-fill — the time-series resample every
    * metrics warehouse runs before charting or joining daily series:
    * per user, the LAST observed event value of each active day
    * (total-ordered by (ts, event_id)) is carried forward across the
    * user's silent days. The calendar explode is bounded by each
    * user's OWN [first, last] active-day span — never the corpus
    * span — so a 100 TB corpus of short-lived users stays linear; the
    * fill window partitions by user (no global window) and the
    * per-day close is a plain max(struct) aggregate with map-side
    * partials, not a sort. Fixed-point cents end to end. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      cents(col("value"), 2).as("v_c"))
    val daily = e.groupBy(col("user_id"), col("day"))
      .agg(max(struct(col("us"), col("event_id"), col("v_c")))
        .getField("v_c").as("close_c"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_c", last(col("close_c"), ignoreNulls = true)
        .over(Window.partitionBy("user_id").orderBy("day")))
      .withColumn("is_observed", col("close_c").isNotNull.cast("long"))
      .select(col("user_id"), col("day"), col("filled_c"), col("is_observed"))
      .orderBy("user_id", "day")
  }

  /** Modal value per group — the categorical-dictionary audit (which
    * entry dominates each group, and by how much): per order
    * priority, the most frequent order month with smallest-month
    * tie-break. Shape: one groupBy to count, one max(struct) to pick
    * the winner — both fully map-side-combining; no window, no sort
    * until the final group-count-sized ordering. The (count, -key)
    * struct-max is the distributed argmax idiom: associative, so it
    * holds under any partitioning. */
  def qModePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("priority"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"))
    o.groupBy(col("priority"), col("ym")).agg(count(lit(1)).as("n"))
      .groupBy(col("priority"))
      .agg(max(struct(col("n"), (-col("ym")).as("neg_ym"))).as("m"),
        sum(col("n")).as("n_total"))
      .select(col("priority"), (-col("m.neg_ym")).as("mode_ym"),
        col("m.n").as("mode_n"), col("n_total"))
      .orderBy("priority")
  }

  /** Hierarchy closure by pointer doubling — WITH RECURSIVE for a
    * distributed engine: the customer key space forms a binary-tree
    * org chart (parent(k) = k DIV 2) and the query materializes every
    * (node, ancestor, distance) pair, then reports each ancestor's
    * subtree size and depth. Naive iteration walks one level per
    * round (depth rounds); pointer doubling composes the closure with
    * itself, so round r covers every distance ≤ 2^(r-1) — 6 rounds
    * reach depth 32, enough for 2^33 nodes. Each round is one
    * equi-join + distinct (both shuffle on flat longs), and each
    * round's result is lazily checkpointed so the self-referential
    * plan does not double per round (same release discipline as
    * [[graft.dedup.Dedup.componentsFromPairs]]). */
  def qAncestorClosure(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("node"))
    var c = nodes.filter(col("node") >= 2)
      .select(col("node"), expr("node DIV 2").as("anc"), lit(1L).as("d"))
      .localCheckpoint(false)
    // Exact-frontier doubling (r17 optimization): joining the full
    // closure against itself generates every depth-d pair once per
    // split point (d−1 ways) and needs a table-wide distinct each
    // round. Joining against ONLY the depth-exactly-2^(k-1) slice
    // generates each new pair exactly once — in a tree the node at
    // depth d−2^(k-1) above `node` is unique — and new depths all
    // exceed the current maximum, so union is disjoint and the
    // per-round distinct exchange disappears (guide §2.4). Depth
    // coverage after round k is 2^k, identical to the old loop.
    for (k <- 1 to 5) {
      val f = c.filter(col("d") === (1L << (k - 1)))
      val j = c.as("a").join(f.as("b"), col("a.anc") === col("b.node"))
        .select(col("a.node").as("node"), col("b.anc").as("anc"),
          (col("a.d") + col("b.d")).as("d"))
      c = c.unionAll(j).localCheckpoint(false)
    }
    c.groupBy(col("anc"))
      .agg(count(lit(1)).as("n_desc"), max(col("d")).as("max_depth"))
      .orderBy("anc")
  }

  /** Last-touch marketing attribution — each purchase is credited to
    * the channel (click payload `k mod 4`) of the most recent
    * preceding click in the same user's stream; purchases with no
    * prior click land in channel -1. The carry-forward is one
    * `last(..., ignoreNulls)` window partitioned BY USER (funnel-
    * style: bounded by a user's history, never the corpus), and the
    * rollup is an ordinary map-side-combining groupBy — the exact
    * shape that scales to a 100 TB event log shuffled once on
    * user_id. Revenue in integer cents. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      cents(col("value"), 2).as("v_c"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("lck",
        last(when(col("event_type") === "click", col("k")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel", coalesce(col("lck") % 4, lit(-1L)))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v_c")).as("revenue_c"))
      .orderBy("channel")
  }

  /** Audience overlap by BITMAP set algebra — the ClickHouse/Doris
    * technique for exact distinct-set operations at scale: each event
    * type's user set becomes per-chunk 32-bit bitmaps (chunk =
    * user DIV 32; 32-bit masks in a BIGINT keep the shift in the
    * positive range on every engine), |A| is a popcount sum, and
    * |A ∩ B| is popcount(AND) summed over the chunk-aligned join —
    * set intersection WITHOUT re-touching raw rows or a
    * distinct-pair shuffle. Work after the first distinct is
    * (keyspace/32)-sized; the pairwise join fans out types² per
    * chunk, bounded by the type count. Exact Jaccard in bp. */
  def qBitmapSetops(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .selectExpr("event_type", "user_id DIV 32 AS chunk",
        "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT)) AS m")
    val bm = e.groupBy(col("event_type"), col("chunk"))
      .agg(expr("bit_or(m)").as("bm"))
    val sizes = bm.groupBy(col("event_type"))
      .agg(sum(expr("bit_count(bm)")).cast("long").as("n"))
    val overlap = bm.as("a").join(bm.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(sum(expr("bit_count(a.bm & b.bm)")).cast("long").as("n_overlap"))
    overlap
      .join(sizes.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
      .join(sizes.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_overlap"),
        expr("n_overlap * 10000 DIV (n_a + n_b - n_overlap)").as("jaccard_bp"))
      .orderBy("type_a", "type_b")
  }

  /** Year-over-year growth — the seasonality-corrected BI read every
    * revenue dashboard leads with: monthly order revenue beside the
    * SAME month one year earlier, and the growth in basis points.
    * The lag-12 lookup is a lag(1) window partitioned by
    * MONTH-OF-YEAR (12 partitions over the months-count-sized rollup
    * — never a self-join, never data-sized); growth_bp uses the
    * non-negative-offset floor division (numerator may be negative;
    * DuckDB `//` floors where Spark DIV truncates — the offset keeps
    * both above zero, the documented [[Ann.dimStats]] idiom). */
  def qYoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        cents(col("o_totalprice"), 2).as("v_c"))
      .groupBy(col("y"), col("m")).agg(sum(col("v_c")).as("rev_c"))
    val w = Window.partitionBy("m").orderBy("y")
    m.withColumn("py", lag(col("y"), 1).over(w))
      .withColumn("prev_rev_c",
        when(col("py") === col("y") - 1, lag(col("rev_c"), 1).over(w)))
      .drop("py")
      .withColumn("growth_bp", expr(
        "((rev_c - prev_rev_c) * 10000 + prev_rev_c * 1000000) DIV prev_rev_c - 1000000"))
      .orderBy("y", "m")
  }

  /** Cohort retention matrix — the full product-analytics triangle
    * [[graft.streaming.Streams.retention]]'s single week-1 read is a
    * slice of: users cohorted by first-seen week, each later week's
    * active share of the cohort in bp. Shape: (user, week) collapses
    * to distinct pairs map-side, one join against the user-count-
    * sized first-seen table, then everything is cohort×offset-sized.
    * Week 0 is by construction 10000 bp — kept in the output as the
    * self-check row. */
  def qRetentionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 604800000000").as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week")).agg(count(lit(1)).as("n_cohort"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_no"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .withColumn("retained_bp", expr("n_active * 10000 DIV n_cohort"))
      .select(col("cohort_week"), col("week_no"), col("n_active"),
        col("n_cohort"), col("retained_bp"))
      .orderBy("cohort_week", "week_no")
  }

  /** CUSUM changepoint detection on the per-type daily value series —
    * where did the level shift: the classic cumulative-deviation
    * statistic S_d = Σ_{i≤d} (r_i − mean), kept EXACT by scaling
    * (r_i·n_days − total, all integers — no float mean), with the
    * changepoint = argmax |S_d| (earliest day on ties, via the
    * associative max(struct) argmax). Everything after the first
    * aggregate is DAY-COUNT-sized: the raw events collapse to (type,
    * day) partial-aggregated rows, the CUSUM window partitions by
    * event type over those ~30 rows, and the report is one row per
    * type. At 100 TB the only data-sized cost is the first groupBy. */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir).select(
        col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        cents(col("value"), 2).as("v_c"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v_c")).as("r"))
    val w = Window.partitionBy("event_type")
    val wc = w.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("total", sum(col("r")).over(w))
      .withColumn("cusum_sc", sum(col("r") * col("n_days")).over(wc) -
        col("total") * row_number().over(w.orderBy("day")))
      .groupBy(col("event_type"))
      .agg(max(struct(abs(col("cusum_sc")).as("a"), (-col("day")).as("nd")))
          .as("m"),
        max(col("n_days")).as("n_days"))
      .select(col("event_type"), (-col("m.nd")).as("cp_day"),
        col("m.a").as("max_abs_cusum_sc"), col("n_days"))
      .orderBy("event_type")
  }

  /** Exponential-decay engagement score, EXACT: the batch oracle of
    * every streaming decayed-counter sketch. Half-life = 1 day, so an
    * event's weight is 2^-(age_days); scaling by 2^span keeps the
    * whole sum in the integer domain (weight = cents << days-since-
    * corpus-min, a left shift both engines compute exactly) — no
    * floating-point exp(), no cross-engine ulp drift. One groupBy
    * over events (map-side partials) plus a broadcast 1-row anchor;
    * the span here is ≤ 30 days so shifts stay < 2^62 — a longer
    * retention would bucket ages first (documented bound, asserted
    * by the spec). */
  def qDecayedSum(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      cents(col("value"), 2).as("v_c"))
    val anchor = e.agg(min(col("day")).as("mind"))
    e.crossJoin(broadcast(anchor))
      .withColumn("wv", expr("shiftleft(v_c, CAST(day - mind AS INT))"))
      .groupBy(col("user_id"))
      .agg(sum(col("wv")).as("score_sh"), count(lit(1)).as("n_events"))
      .orderBy(col("score_sh").desc, col("user_id"))
  }

  /** Behavioral transition matrix — the first-order Markov read of the
    * event stream: for every consecutive (prev → next) event-type pair
    * within a user's timeline, the transition count and its row-share
    * in integer basis points. One lag window partitioned by user (the
    * same per-key shuffle every sessionizer pays — never a global
    * order), then a type-pair-sized aggregate; the row totals come
    * from a window over the AGGREGATED matrix (|types|² rows,
    * partitioned by from_type), so the event scan runs exactly once —
    * a totals join-back would re-execute the whole lag lineage. */
  def qTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .selectExpr("from_type", "to_type", "n", "n * 10000 DIV n_from AS bp")
      .orderBy("from_type", "to_type")
  }

  /** Time-BOUNDED funnel — [[qSequenceMatch]]'s stages with a
    * transition deadline: a click only advances the funnel if it lands
    * within [[FunnelWindowUs]] of the MOST RECENT prior signup, and a
    * purchase within the deadline of the most recent prior qualifying
    * click (the "did the campaign convert within the session" read —
    * the unbounded form counts a purchase a month later). Same
    * execution shape as the unbounded funnel: one per-user window
    * partition carrying running MAX of the previous stage's qualifying
    * timestamps (running max, not min, because the deadline binds to
    * the latest opportunity), then one per-user aggregate. */
  val FunnelWindowUs: Long = 30L * 60 * 1000 * 1000
  def qFunnelWindowed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val staged = e
      .withColumn("s_q", when(col("event_type") === "signup", col("us")))
      .withColumn("s_last", max(col("s_q")).over(prev))
      .withColumn("c_q", when(col("event_type") === "click" &&
        col("s_last").isNotNull &&
        col("us") - col("s_last") <= FunnelWindowUs, col("us")))
      .withColumn("c_last", max(col("c_q")).over(prev))
      .withColumn("p_q", when(col("event_type") === "purchase" &&
        col("c_last").isNotNull &&
        col("us") - col("c_last") <= FunnelWindowUs, col("us")))
    staged.groupBy(col("user_id"))
      .agg(min(col("s_q")).as("signup_us"),
        min(col("c_q")).as("wclick_us"),
        min(col("p_q")).as("wpurchase_us"))
      .withColumn("stage",
        when(col("wpurchase_us").isNotNull, 3L)
          .when(col("wclick_us").isNotNull, 2L)
          .when(col("signup_us").isNotNull, 1L).otherwise(0L))
      .orderBy("user_id")
  }

  /** A/B lift report — the experiment read on deterministic hash
    * arms: users split by key parity (reproducible at any
    * parallelism, the same property as the corpus split hashes),
    * conversion = did the user ever purchase. One row: arm sizes,
    * converter counts, per-arm conversion in bp, RELATIVE lift of B
    * over A in bp (offset floor-division so a negative lift agrees
    * across engines), and the odds ratio in bp. Two distinct-user
    * aggregates and a 2-row pivot — event volume is touched exactly
    * once per side at any scale. */
  def qAbLift(spark: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("arm", pmod(col("user_id"), lit(2)))
    val conv = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("c", lit(1L))
    arms.join(conv, Seq("user_id"), "left")
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("c"), lit(0L))).as("k"))
      .agg(max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 0, col("k"))).as("conv_a"),
        max(when(col("arm") === 1, col("k"))).as("conv_b"))
      .selectExpr("n_a", "n_b", "conv_a", "conv_b",
        "conv_a * 10000 DIV n_a AS conv_a_bp",
        "conv_b * 10000 DIV n_b AS conv_b_bp",
        "((conv_b * n_a - conv_a * n_b) * 10000 + 10000 * GREATEST(conv_a * n_b, 1)) DIV GREATEST(conv_a * n_b, 1) - 10000 AS lift_bp",
        "(conv_b * (n_a - conv_a)) * 10000 DIV GREATEST(conv_a * (n_b - conv_b), 1) AS odds_ratio_bp")
  }

  /** Cohort funnel — conversion by signup week: [[qSequenceMatch]]'s
    * per-user stages rolled up by the week the user's funnel OPENED
    * (first signup), the "did onboarding quality drift" read. The
    * per-user frame is funnel-survivor-sized; the report is
    * week-count-sized. */
  def qCohortFunnel(spark: SparkSession, dir: String): DataFrame =
    qSequenceMatch(spark, dir)
      .filter(col("signup_us").isNotNull)
      .withColumn("week", expr("signup_us DIV 604800000000"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_signup"),
        sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n_clicked"),
        sum(when(col("stage") === 3, 1L).otherwise(0L)).as("n_purchased"))
      .selectExpr("week", "n_signup", "n_clicked", "n_purchased",
        "n_purchased * 10000 DIV n_signup AS conv_bp")
      .orderBy("week")

  /** Top user paths — the "how do sessions start" read of path
    * analysis: each user's first three event types (by time,
    * event_id tie-break) concatenated into a path signature, ranked
    * by user count. One per-user window (row_number ≤ 3 collapses
    * map-side via the rank pushdown), the path assembled with three
    * conditional MINs in a single per-user aggregate — no
    * collect_list buffers, no order-sensitive array aggregation at
    * the compare boundary. Top 20 via TakeOrdered, never a global
    * sort. */
  def qTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(min(when(col("rn") === 1, col("event_type"))).as("t1"),
        min(when(col("rn") === 2, col("event_type"))).as("t2"),
        min(when(col("rn") === 3, col("event_type"))).as("t3"))
      .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** Exact quartile thresholds of a BIGINT column WITHOUT a global
    * ranking window — the same two-level decomposition as
    * `dlp_quantile_bucketing` (DlpQueries.scala:148): rows rank inside
    * value-range buckets (partitioned window), bucket offsets come
    * from a bucket-count-sized cumulative (bounded by the value
    * domain, never the row count), and the three (n+1)·q DIV 4 order
    * statistics fall out of one aggregate. Returns a 1-row frame
    * (q1/q2/q3) meant to be broadcast. */
  /** Exact per-dimension quartiles over an unpivoted (dim, v, tie)
    * frame, one fused two-level rank pass for ALL dimensions: rows
    * rank inside (dim, value-bucket) partitions, bucket offsets come
    * from a dim-partitioned cumulative over the bucket counts, and
    * the result is one row per dim. Identical rank/threshold math to
    * the former per-dimension `exactQuartiles` (same bucket widths,
    * same tie column) — fusing the three probe plan-trees into one
    * cut q_rfm_segments' measured ~1 MB task binaries × 12 stages to
    * a third (guide §1.2: per-task work after the algorithm). */
  private def exactQuartilesByDim(long: DataFrame): DataFrame = {
    val c = long.withColumn("b", col("v").divide(col("w")).cast("long"))
    val wIn = Window.partitionBy(col("dim"), col("b")).orderBy(col("v"), col("tie"))
    val wB = Window.partitionBy(col("dim")).orderBy(col("b"))
    val offs = c.groupBy(col("dim"), col("b")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt"))
        .over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("cnt")
    c.withColumn("rb", row_number().over(wIn))
      .join(broadcast(offs), Seq("dim", "b"))
      .withColumn("rn", col("off") + col("rb"))
      .groupBy(col("dim"))
      .agg(
        min(when(col("rn") === expr("GREATEST((n + 1) DIV 4, 1)"), col("v"))).as("q1"),
        min(when(col("rn") === expr("GREATEST((n + 1) DIV 2, 1)"), col("v"))).as("q2"),
        min(when(col("rn") === expr("GREATEST((3 * (n + 1)) DIV 4, 1)"), col("v"))).as("q3"))
  }

  /** RFM customer segmentation — recency / frequency / monetary
    * quartile coding, the classic CRM cut. The per-customer triple is
    * one orders aggregate; each dimension's quartile thresholds come
    * from [[exactQuartiles]] (two-level rank — no global window over
    * the customer population, which at 100 TB is itself billions of
    * rows); the final coding is three broadcast 1-row joins and a
    * segment-sized rollup (≤ 64 segments). Bucket 4 = highest raw
    * value in every dimension (so r=1 is the MOST recent buyers). */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    // the customer-sized RFM core feeds FOUR consumers (three quartile
    // probes + the final coding) — session-persist it once, or every
    // consumer re-runs the orders scan and shuffle
    val rfm = graft.Caches.sharedCheckpoint(spark, s"analytics.rfm:$dir") {
      val o = Tables.orders(spark, dir).select(
        col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        cents(col("o_totalprice"), 2).as("price_c"))
      val anchor = o.agg(max(col("day")).as("maxd"))
      o.crossJoin(broadcast(anchor))
        .groupBy(col("o_custkey"))
        .agg(min(col("maxd") - col("day")).as("recency_d"),
          count(lit(1)).as("frequency"),
          sum(col("price_c")).as("monetary_c"))
    }
    // one fused probe: unpivot the three dimensions (with their former
    // per-probe bucket widths 16 / 4 / 2^20) and rank them all in a
    // single two-level pass — thresholds are bit-identical to the
    // three separate probes, the plan is one tree instead of three
    val longDims = rfm.selectExpr("o_custkey AS tie",
      """stack(3,
        | 'r', recency_d,  CAST(16 AS BIGINT),
        | 'f', frequency,  CAST(4 AS BIGINT),
        | 'm', monetary_c, CAST(1048576 AS BIGINT)) AS (dim, v, w)"""
        .stripMargin.replace("\n", " "))
    val thr = exactQuartilesByDim(longDims)
      .groupBy()
      .agg(
        min(when(col("dim") === "r", col("q1"))).as("r1"),
        min(when(col("dim") === "r", col("q2"))).as("r2"),
        min(when(col("dim") === "r", col("q3"))).as("r3"),
        min(when(col("dim") === "f", col("q1"))).as("f1"),
        min(when(col("dim") === "f", col("q2"))).as("f2"),
        min(when(col("dim") === "f", col("q3"))).as("f3"),
        min(when(col("dim") === "m", col("q1"))).as("m1"),
        min(when(col("dim") === "m", col("q2"))).as("m2"),
        min(when(col("dim") === "m", col("q3"))).as("m3"))
    def bucket(v: String, t1: String, t2: String, t3: String) =
      s"CASE WHEN $v <= $t1 THEN 1 WHEN $v <= $t2 THEN 2 WHEN $v <= $t3 THEN 3 ELSE 4 END"
    rfm.crossJoin(broadcast(thr))
      .selectExpr("o_custkey", "monetary_c",
        s"CAST(${bucket("recency_d", "r1", "r2", "r3")} * 100 + " +
          s"${bucket("frequency", "f1", "f2", "f3")} * 10 + " +
          s"${bucket("monetary_c", "m1", "m2", "m3")} AS BIGINT) AS segment")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("monetary_c")).as("sum_monetary_c"))
      .orderBy("segment")
  }

  /** Customer cross-shopping spread — the supplier-diversification
    * histogram a marketplace reads for loyalty/concentration: per
    * customer the distinct suppliers (and supplier nations) bought
    * from, rolled up by supplier count with the multi-nation share.
    * One fact-scale join, one customer-grain distinct aggregate, a
    * histogram-sized rollup. */
  def qSupplierSpread(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("s_nationkey")).as("n_nations"))
    per.groupBy(col("n_suppliers"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_nations") >= 2, 1L).otherwise(0L)).as("n_multi_nation"))
      .selectExpr("CAST(n_suppliers AS BIGINT) AS n_suppliers", "n_customers",
        "n_multi_nation",
        "(n_multi_nation * 10000) DIV n_customers AS multi_nation_bp")
      .orderBy("n_suppliers")
  }

  /** Rolling-origin forecast backtest — the evaluation loop every
    * forecasting deployment runs before trusting a model: the naive
    * seasonal-free baseline (mean of the prior 4 weeks) predicts each
    * week's revenue, and the report shows actual, predicted, absolute
    * error, and error bp per backtest origin. Exact integer cents
    * throughout (the 4-week mean is one DIV). The window runs over
    * the WEEKLY aggregate — one row per calendar week, bounded by the
    * time domain, never the order count (whitelisted global window,
    * the `ingest_backfill_plan` class). */
  def qForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000000").as("week"),
        cents(col("o_totalprice"), 2).as("c"))
      .groupBy(col("week")).agg(sum(col("c")).as("rev_c"))
    val wW = Window.orderBy(col("week")).rowsBetween(-4, -1)
    weekly
      .withColumn("s4", sum(col("rev_c")).over(wW))
      .withColumn("pred_c", expr("s4 DIV 4"))
      .withColumn("n_hist", count(col("rev_c")).over(wW))
      .filter(col("n_hist") === 4)
      .selectExpr("week", "rev_c", "pred_c",
        "ABS(rev_c - pred_c) AS abs_err_c",
        "(ABS(rev_c - pred_c) * 10000) DIV rev_c AS err_bp")
      .orderBy("week")
  }

  /** 7-day rolling return rate — the short-horizon retention read
    * next to [[qRetentionMatrix]]'s weekly cohorts: per active day,
    * the share of that day's users seen again within the next 7 days.
    * The "returned" set is exact via a bounded range self-join of the
    * user-day grain (each user-day matches ≤ 7 future own-days;
    * DISTINCT collapses multi-return) — never a sliding-window
    * distinct. */
  def qReturnRate(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
      .distinct()
    val ret = ud.as("a").join(ud.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") > col("a.day") && col("b.day") <= col("a.day") + 7)
      .select(col("a.user_id").as("user_id"), col("a.day").as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_returned"))
    ud.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      .join(ret, Seq("day"), "left")
      .selectExpr("day", "n_active",
        "COALESCE(n_returned, 0) AS n_returned",
        "(COALESCE(n_returned, 0) * 10000) DIV n_active AS return_bp")
      .orderBy("day")
  }

  /** DAU/MAU stickiness — the engagement ratio every activity report
    * leads with: per observed day, distinct daily actives, distinct
    * trailing-28-day actives, and DAU/MAU in bp. The trailing
    * distinct is EXACT without a sliding-window distinct (which no
    * engine does distributively): each (user, active-day) row
    * contributes itself to the 28 observation days it stays "monthly
    * active" for — a bounded ×28 explode of the user-day grain — and
    * the per-observation-day distinct collapses the multi-activity
    * overlap. Work is 28 · |user-days|, shuffled once on the
    * observation day. */
  def qDauMau(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
      .distinct()
    val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val mau = ud.selectExpr("user_id", "explode(sequence(day, day + 27)) AS day")
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "day")
      .selectExpr("day", "dau", "mau", "(dau * 10000) DIV mau AS stickiness_bp")
      .orderBy("day")
  }

  /** Day-of-week seasonality profile per event type — the weekly-
    * pattern read behind capacity planning and anomaly baselines:
    * counts and within-type share bp per (type, dow), with the
    * deviation from the uniform 1/7. Day-of-week derives from the
    * epoch-day integer ((day + 4) % 7, day 0 = Thursday) — never an
    * engine date-part function, whose week-start conventions differ.
    * One types×7-sized aggregate with the type total carried by a
    * window over the aggregated frame. */
  def qDowProfile(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(spark, dir)
      .selectExpr("event_type",
        "(unix_micros(ts) DIV 86400000000 + 4) % 7 AS dow")
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"))
    val wT = Window.partitionBy(col("event_type"))
    g.withColumn("tot", sum(col("n")).over(wT))
      .selectExpr("event_type", "dow", "n",
        "(n * 10000) DIV tot AS share_bp",
        "ABS((n * 10000) DIV tot - 1428) AS dev_bp")
      .orderBy("event_type", "dow")
  }

  /** Order-to-ship latency percentiles per order priority — the SLA
    * read of fulfilment: exact p50/p90 of datediff(shipdate,
    * orderdate) in days, rank-selected per priority under the
    * two-level bucket decomposition (rows rank inside 16-day
    * value-range buckets partitioned by (priority, bucket); offsets
    * come from a per-priority cumulative over the bucket list, which
    * is bounded by the latency DOMAIN, never the row count). One
    * fact-scale join, one window pass, a 5-row report. */
  def qShipLatency(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority AS prio", "l_orderkey", "l_linenumber",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS days")
      .withColumn("b", expr("days DIV 16"))
    val wIn = Window.partitionBy(col("prio"), col("b"))
      .orderBy(col("days"), col("l_orderkey"), col("l_linenumber"))
    val ranked = d.withColumn("rb", row_number().over(wIn))
    val wB = Window.partitionBy(col("prio")).orderBy(col("b"))
    val offs = d.groupBy(col("prio"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("cnt")
    ranked.join(broadcast(offs), Seq("prio", "b"))
      .withColumn("rn", col("off") + col("rb"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_lines"),
        min(when(col("rn") === expr("GREATEST((n + 1) DIV 2, 1)"), col("days"))).as("p50_days"),
        min(when(col("rn") === expr("GREATEST((9 * (n + 1)) DIV 10, 1)"), col("days"))).as("p90_days"),
        max(col("days")).as("max_days"))
      .select(col("prio").as("o_orderpriority"), col("n_lines"),
        col("p50_days"), col("p90_days"), col("max_days"))
      .orderBy("o_orderpriority")
  }

  /** Growth accounting of the event stream — the weekly
    * new/retained/resurrected/churned decomposition every activity
    * dashboard runs (the "quick ratio" inputs): per user-week of
    * activity, classify by the user's previous active week (none →
    * new; w−1 → retained; earlier → resurrected), and attribute churn
    * to week w+1 whenever the next active week is not w+1. One
    * user-grain distinct, one per-user lag/lead window over ACTIVE
    * WEEKS (bounded by the user's distinct active weeks, not events),
    * one week-sized rollup; churn rolls up from the same frame via an
    * unpivot so the stream is scanned once. */
  def qGrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) DIV 604800000000 AS week")
      .distinct()
    val wU = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val tagged = uw
      .withColumn("prev_w", lag(col("week"), 1).over(wU))
      .withColumn("next_w", lead(col("week"), 1).over(wU))
      .selectExpr("week", "user_id",
        """CASE WHEN prev_w IS NULL THEN 'new'
          |     WHEN prev_w = week - 1 THEN 'retained'
          |     ELSE 'resurrected' END AS kind""".stripMargin.replace("\n", " "),
        "CASE WHEN next_w IS NULL OR next_w > week + 1 THEN week + 1 END AS churn_week")
    val active = tagged.groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("kind") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("kind") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("kind") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val churned = tagged.filter(col("churn_week").isNotNull)
      .groupBy(col("churn_week").as("week"))
      .agg(count(lit(1)).as("n_churned"))
    active.join(churned, Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("week")
  }

  /** Count-min sketch bias audit (Cormode & Muthukrishnan 2005) over
    * per-user event counts: a depth-4 × width-64 CMS built with the
    * portable md5 hash family, read back for the exact top-10 users —
    * estimate, exact count, and the overestimate in bp. The sketch is
    * deliberately narrow so the one-sided collision bias is VISIBLE:
    * this is the table that prices sketch width before replacing an
    * exact group-by at 100 TB. Build = one explode(depth) + one
    * (4·64)-cell aggregate (fixed size at any scale — the whole point
    * of the sketch); readback joins the 256-cell table onto the
    * top-10 probe set only. */
  def qCountminAudit(spark: SparkSession, dir: String): DataFrame = {
    // Decode the first two md5 HEX DIGITS to their 0..15 values and
    // take the byte % 64 — all 64 buckets reachable, uniform. (The r11
    // form used ascii() of the hex chars: ascii*256 % 64 == 0, so the
    // first char contributed nothing and only 16 buckets were live —
    // a width-16 sketch sold as width-64.) instr/strpos is 1-based in
    // both Spark and DuckDB, hence the -1s.
    def bucketSql(d: Int) = {
      def hex(i: Int) =
        s"(instr('0123456789abcdef', substring(md5(CAST($d AS STRING) || ':' || CAST(user_id AS STRING)), $i, 1)) - 1)"
      s"CAST((${hex(1)} * 16 + ${hex(2)}) % 64 AS BIGINT)"
    }
    val ev = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val sketch = ev
      .select(explode(expr(
        s"array(${(0 until 4).map(d => s"named_struct('d', CAST($d AS BIGINT), 'b', ${bucketSql(d)})").mkString(", ")})"
      )).as("c"))
      .select(col("c.d").as("d"), col("c.b").as("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(10)
    val probes = exact
      .select(col("user_id"), col("n_exact"), explode(expr(
        s"array(${(0 until 4).map(d => s"named_struct('d', CAST($d AS BIGINT), 'b', ${bucketSql(d)})").mkString(", ")})"
      )).as("c"))
      .select(col("user_id"), col("n_exact"), col("c.d").as("d"), col("c.b").as("b"))
    probes.join(broadcast(sketch), Seq("d", "b"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .selectExpr("user_id", "n_exact", "n_est",
        "((n_est - n_exact) * 10000) DIV n_exact AS over_bp")
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  /** Market-basket affinity over order contents — the co-purchase
    * lift report (the level-2 Apriori read): part pairs that share an
    * order, with support, per-part confidence in bp, and lift in
    * micro-units (n_ab·N/(n_a·n_b), exponent-free PMI — the same
    * integer statistic as text_cooccurrence's collocations). Pair
    * fan-out is basket-bounded: the self-join is an equality join on
    * the order key, so an order with m parts emits m(m−1)/2 rows —
    * bounded by basket size, NEVER part-vocabulary-quadratic. Part
    * frequencies attach by key join (the part dimension grows with
    * scale — no forced broadcast); top 50 via TakeOrdered. */
  def qBasketPairs(spark: SparkSession, dir: String): DataFrame = {
    val b = graft.Caches.sharedCheckpoint(spark, s"analytics.basket:$dir") {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
    }
    val partN = b.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
    val nOrders = b.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    b.as("a").join(b.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(partN.select(col("l_partkey").as("part_a"), col("n_p").as("n_a")), "part_a")
      .join(partN.select(col("l_partkey").as("part_b"), col("n_p").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .selectExpr("part_a", "part_b", "n_ab", "n_a", "n_b",
        "(n_ab * 10000) DIV n_a AS conf_a_bp",
        "(n_ab * n_orders * 1000000) DIV (n_a * n_b) AS lift_u")
      .orderBy(col("n_ab").desc, col("lift_u").desc, col("part_a"), col("part_b"))
      .limit(50)
  }

  /** PageRank over the supplier↔customer trade graph, three exact
    * integer power iterations (Page et al. 1999; damping 0.85 as the
    * rational 85/100, teleport mass 0.15 as 150 000 micro-units).
    * Edges are the DISTINCT (supplier, customer) trade relationships
    * out of lineitem⋈orders, symmetrized, so the walk genuinely mixes
    * instead of draining into the bipartite sink side. Per-edge
    * contribution is r DIV deg — all-BIGINT, so fold order and
    * division agree across engines and parallelism.
    *
    * Scale shape: this is the Pregel shape without Pregel — each
    * iteration is ONE shuffle of the edge list on dst (join with the
    * rank table, partial-aggregated sum), the edge list + degree
    * attach persist once across all three rounds, and the rank table
    * stays node-sized. No iteration-count-dependent lineage blowup:
    * three rounds is the default power-iteration budget (rank ordering
    * stabilizes long before values converge — the property ranking
    * consumers rely on). Top 20 via TakeOrdered, never a global sort.
    *
    * Cost model (for bench triage): wall-time ≈ build (edge distinct +
    * symmetrize + degree agg, paid once per session via the shared
    * cache) + rounds × (node-sized rank⋈degree join + one edge-list
    * shuffle on dst + node-sized persist). `rounds` is the knob: a
    * timing regression that scales with rounds is iteration cost, one
    * that doesn't is a build/plan regression. Default 3 = the gate's
    * oracle contract — changing it changes results by design. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame =
    qPagerankWith(spark, dir, rounds = 3)

  def qPagerankWith(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    // edge list and degree table persist SEPARATELY: attaching deg
    // onto every edge row would pay an extra table-wide shuffle in the
    // build, when the per-node contribution r DIV deg only needs the
    // NODE-sized (rank ⋈ degree) join — edges then join one small
    // contribution table per round (broadcastable here; co-partitioned
    // on src at cluster scale)
    val edges = graft.Caches.sharedCheckpoint(spark, s"analytics.tradegraph:$dir") {
      // r13 (r12 verdict item 10): collapse lineitem to DISTINCT
      // (l_orderkey, l_suppkey) BEFORE the orders join — the distinct
      // partially aggregates map-side, so the join input shrinks by
      // the per-order line fan-out factor and the post-join distinct
      // only dedups across orders
      val e0 = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        // parity encoding (r12, was +1_000_000 which aliases once the
        // customer table passes 1M rows ~ SF 7): customers take even
        // ids (key*2), suppliers odd (key*2+1) — collision-free at any
        // scale factor, and node_type reads back as node_id % 2
        .select((col("l_suppkey") * 2L + 1L).as("src"),
          (col("o_custkey").cast("long") * 2L).as("dst"))
        .distinct()
      // symmetrize in ONE pass: a self-union reads (and recomputes)
      // the join+distinct lineage once per branch; the explode emits
      // both directions from a single scan
      e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }
    val deg = graft.Caches.sharedCheckpoint(spark, s"analytics.tradedeg:$dir") {
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    }
    val nodes = Tables.customer(spark, dir)
      .select((col("c_custkey").cast("long") * 2L).as("node_id"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey").cast("long") * 2L + 1L).as("node_id")))
    var r = nodes.select(col("node_id"), lit(1000000L).as("r"))
    for (i <- 1 to rounds) {
      val prev = r
      // each round's rank frame persists (node-sized): without it the
      // final plan nests every earlier round and the edge join
      // re-executes 1+2+3 times — the iterative-lineage blowup this
      // loop's docstring promises away
      r = graft.Caches.sharedCheckpoint(spark, s"analytics.pagerank.r$i:$dir") {
        val contrib = prev.join(deg, prev("node_id") === deg("src"))
          .selectExpr("src", "r DIV deg AS c")
        val s = edges.join(contrib, "src")
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
          .select(col("dst").as("node_id"), col("s"))
        nodes.join(s, Seq("node_id"), "left")
          .selectExpr("node_id", "CAST(150000 + (85 * COALESCE(s, 0)) DIV 100 AS BIGINT) AS r")
      }
    }
    r.join(deg.select(col("src").as("node_id"), col("deg")), Seq("node_id"), "left")
      .selectExpr("node_id",
        "CASE WHEN node_id % 2 = 1 THEN 'supplier' ELSE 'customer' END AS node_type",
        "COALESCE(deg, 0) AS degree", "r AS rank_u")
      .orderBy(col("rank_u").desc, col("node_id"))
      .limit(20)
  }

  /** Gini coefficient of customer spend per market segment — the
    * inequality read of revenue concentration, in exact integer
    * arithmetic via the rank-sum identity
    * G = (2·Σ i·xᵢ − (n+1)·Σ x) / (n·Σ x) with i the 1-based
    * ascending rank. Ranks come from the SAME two-level decomposition
    * as `dlp_quantile_bucketing`: rows rank inside $10k spend-range
    * buckets (partitioned window), bucket offsets from a
    * bucket-count-sized cumulative — never a global or
    * segment-global ORDER-BY window. Tie ranks are consumed as a
    * permutation of the same index set, so Σ i·xᵢ is tie-order
    * invariant. The final division is staged (denominator pre-scaled
    * DIV 10000) so the numerator never exceeds Σ i·x ≈ n²·x̄ — no
    * 10⁴ blowup before the divide — and the rank-weighted sum itself
    * runs over dollars, not cents (see the inline r12 note), which
    * holds Σ i·x inside Int64 to ~SF 500 at <1 bp cost. */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice"), 2).as("sp"))
      .groupBy(col("o_custkey")).agg(sum(col("sp")).as("spend"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("segment"), col("o_custkey"), col("spend"))
      .withColumn("b", expr("spend DIV 1000000"))
    val wIn = Window.partitionBy(col("segment"), col("b"))
      .orderBy(col("spend"), col("o_custkey"))
    val bc = x.groupBy(col("segment"), col("b")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.partitionBy(col("segment")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bc.withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("segment"), col("b"), col("off"))
    // The rank-weighted sum runs over DOLLARS (spend DIV 100), not
    // cents (r12 overflow fix): t ~ n²·x̄ per segment, and in cents
    // that exceeds Int64 around SF 100 (~3M customers/segment) with a
    // silent non-ANSI wrap on BOTH sides of the differential gate. The
    // 100× pre-scale moves the wrap point past SF ~500 and costs <1 bp
    // on a basis-point statistic; ranks still come from exact cents, and
    // the reported total_spend stays exact cents. ScaleSpec asserts the
    // headroom bound on the corpus so a future re-scale is loud.
    x.withColumn("rin", row_number().over(wIn).cast("long"))
      .join(off, Seq("segment", "b"))
      .withColumn("i", col("off") + col("rin"))
      .withColumn("spend_d", expr("spend DIV 100"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("total_spend"),
        sum(col("spend_d")).as("total_d"),
        sum(col("i") * col("spend_d")).as("t"))
      .selectExpr("segment", "n_customers", "total_spend",
        "(2 * t - (n_customers + 1) * total_d) DIV GREATEST((n_customers * total_d) DIV 10000, 1) AS gini_bp")
      .orderBy("segment")
  }

  /** Benford first-digit audit of order totals — the classic
    * fabricated-data screen: observed leading-digit shares vs the
    * Benford expectation log₁₀(1+1/d), shipped as the nine CONSTANT
    * basis-point values (3010…458) so no engine ever evaluates a
    * logarithm. The leading digit is taken lexically from the
    * floored integer total (string head, never float log10 — exact
    * and engine-identical). One row-count-sized aggregate, a 9-row
    * broadcast of expectations, total order by digit. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val expMap = "map(1,3010,2,1761,3,1249,4,969,5,792,6,669,7,580,8,512,9,458)"
    val d = Tables.orders(spark, dir)
      .filter(col("o_totalprice") >= 1)
      .selectExpr("CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS digit")
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = d.agg(sum(col("n")).as("tot"))
    d.crossJoin(broadcast(tot))
      .selectExpr("digit", "n",
        "(n * 10000) DIV tot AS obs_bp",
        s"CAST(element_at($expMap, CAST(digit AS INT)) AS BIGINT) AS exp_bp")
      .selectExpr("digit", "n", "obs_bp", "exp_bp",
        "ABS(obs_bp - exp_bp) AS dev_bp")
      .orderBy("digit")
  }

  /** Herfindahl–Hirschman concentration of supplier revenue per
    * nation — the market-structure read procurement risk teams run:
    * HHI = Σ share² over suppliers, shares in basis points (10000 =
    * monopoly), revenue in exact integer cents of the discounted
    * price. Two nation-partitioned aggregates (supplier revenue, then
    * the HHI rollup) and a broadcast nation-name attach — no windows,
    * no per-nation sorts; shares divide against a nation total
    * carried on the row by a 25-row broadcast join. */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("rev_c"))
      .groupBy(col("l_suppkey")).agg(sum(col("rev_c")).as("rev"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
    val tot = rev.groupBy(col("s_nationkey")).agg(sum(col("rev")).as("tot"))
    rev.join(broadcast(tot), "s_nationkey")
      .selectExpr("s_nationkey", "(rev * 10000) DIV tot AS share_bp")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("share_bp") * col("share_bp")).as("sq"),
        max(col("share_bp")).as("top_share_bp"))
      .withColumn("hhi", expr("sq DIV 10000"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_suppliers"), col("hhi"), col("top_share_bp"))
      .orderBy("n_name")
  }

  /** Lorenz-curve top-share concentration (the Pareto "what do the top
    * 1/5/10/20% of customers hold" read next to [[qGini]]'s single
    * coefficient): customers rank ascending by lifetime spend via the
    * SAME two-level bucket decomposition as qGini (in-bucket
    * partitioned windows + a bucket-count-sized offset cumulative —
    * never a global data-sized sort), the top-k cut for each
    * percentile is rank arithmetic (k = max(n·p DIV 100, 1)), and all
    * four percentiles fold as conditional sums in ONE aggregate pass.
    * Shares divide in dollars (the qGini r12 overflow rule: cents ×
    * 10⁴ would pass Int64 around SF 100); reported spend stays exact
    * cents. The only global window runs over bucket-count rows
    * (spend-domain-bounded — whitelisted in PlanSpec with the other
    * two-level users). */
  def qLorenzTopshare(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice"), 2).as("sp"))
      .groupBy(col("o_custkey")).agg(sum(col("sp")).as("spend"))
      .withColumn("b", expr("spend DIV 1000000"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("spend"), col("o_custkey"))
    val bc = x.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val off = bc.withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("b"), col("off"))
    val stats = x.agg(count(lit(1)).as("n"),
      sum(col("spend")).as("total_c"), sum(expr("spend DIV 100")).as("total_d"))
    val ranked = x.withColumn("rin", row_number().over(wIn).cast("long"))
      .join(broadcast(off), Seq("b"))
      .withColumn("rn", col("off") + col("rin"))
      .crossJoin(broadcast(stats))
    def cut(p: Int) = s"GREATEST((n * $p) DIV 100, 1)"
    val one = ranked.agg(
      max(col("n")).as("n"), max(col("total_d")).as("total_d"),
      sum(expr(s"IF(rn > n - ${cut(1)}, 1, 0)")).as("n1"),
      sum(expr(s"IF(rn > n - ${cut(1)}, spend, 0)")).as("s1"),
      sum(expr(s"IF(rn > n - ${cut(1)}, spend DIV 100, 0)")).as("d1"),
      sum(expr(s"IF(rn > n - ${cut(5)}, 1, 0)")).as("n5"),
      sum(expr(s"IF(rn > n - ${cut(5)}, spend, 0)")).as("s5"),
      sum(expr(s"IF(rn > n - ${cut(5)}, spend DIV 100, 0)")).as("d5"),
      sum(expr(s"IF(rn > n - ${cut(10)}, 1, 0)")).as("n10"),
      sum(expr(s"IF(rn > n - ${cut(10)}, spend, 0)")).as("s10"),
      sum(expr(s"IF(rn > n - ${cut(10)}, spend DIV 100, 0)")).as("d10"),
      sum(expr(s"IF(rn > n - ${cut(20)}, 1, 0)")).as("n20"),
      sum(expr(s"IF(rn > n - ${cut(20)}, spend, 0)")).as("s20"),
      sum(expr(s"IF(rn > n - ${cut(20)}, spend DIV 100, 0)")).as("d20"))
    one.selectExpr(
        """stack(4, 1L, n1, s1, d1, 5L, n5, s5, d5,
          |10L, n10, s10, d10, 20L, n20, s20, d20)
          |AS (top_pct, n_top, top_spend, top_d)""".stripMargin.replace("\n", " "),
        "total_d")
      .selectExpr("top_pct", "n_top", "top_spend",
        "(top_d * 10000) DIV total_d AS share_bp")
      .orderBy("top_pct")
  }

  /** Calendar-lag autocorrelation of daily revenue (lags 1–7 days) —
    * the weekly-cycle fingerprint a forecasting pipeline checks before
    * choosing seasonal terms (a spike at lag 7 = strong day-of-week
    * structure, cf. [[qDowProfile]]'s direct read): deviations from
    * the truncated mean in integer THOUSANDS of dollars (the qGini
    * overflow rule squared — Σdev²·10⁴ must fit Int64, which cents or
    * even dollars break once daily revenue passes ~$10⁷),
    * autocovariance over calendar-day pairs (d, d+k) both present,
    * normalized by the full-series variance in bp. The series is
    * calendar-bounded (one row per day at ANY scale factor), so the
    * lag self-join and both aggregates are fixed-size; only the
    * day-rollup scan scales with data. Division truncates toward zero
    * on both engines (oracle wraps DuckDB's floor `//` in the
    * sign-safe CASE). */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val day = Tables.orders(spark, dir)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
        cents(col("o_totalprice"), 2).as("sp"))
      .groupBy(col("dn")).agg(sum(expr("sp DIV 100000")).as("rev_k"))
    val stats = day.agg(count(lit(1)).as("n"), sum(col("rev_k")).as("s"))
    val dev = graft.Caches.sharedCheckpoint(spark, s"analytics.dailydev:$dir") {
      day.crossJoin(broadcast(stats))
        .selectExpr("dn", "rev_k - (s DIV n) AS dev")
    }
    val varr = dev.agg(sum(col("dev") * col("dev")).as("v"))
    val lagged = dev.select(explode(expr("sequence(1L, 7L)")).as("k"),
        col("dn"), col("dev"))
      .join(dev.select(col("dn").as("dn2"), col("dev").as("dev2")),
        col("dn") + col("k") === col("dn2"))
    lagged.groupBy(col("k").as("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("dev") * col("dev2")).as("acov"))
      .crossJoin(broadcast(varr))
      .selectExpr("lag", "n_pairs", "(acov * 10000) DIV v AS ac_bp")
      .orderBy("lag")
  }

  /** Nation trade balance over the supplier→customer revenue flow —
    * the import/export matrix read: per nation, revenue its suppliers
    * EXPORT (sold to other nations' customers), revenue its customers
    * IMPORT (bought from other nations' suppliers), domestic flow,
    * and the net balance in exact cents. One fact-scale join chain
    * (lineitem⋈orders, then nation-key attaches via customer and
    * supplier — PLAIN key joins, because both dimensions grow with
    * the scale factor and a forced broadcast would OOM the executors
    * past ~SF 100; AQE still picks broadcast when they are actually
    * small), one nation×nation-bounded rollup unioned into
    * per-nation exports/imports — the matrix never exceeds 625 rows
    * at any scale factor. */
  def qTradeBalance(spark: SparkSession, dir: String): DataFrame = {
    val flow = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("rev"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir)
        .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT) AS sn"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir)
        .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS cn"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("sn"), col("cn")).agg(sum(col("rev")).as("rev"))
    val perNation = flow
      .groupBy(col("sn").as("nk"))
      .agg(sum(when(col("sn") =!= col("cn"), col("rev")).otherwise(0L)).as("exports"),
        sum(when(col("sn") === col("cn"), col("rev")).otherwise(0L)).as("domestic"))
      .join(flow.groupBy(col("cn").as("nk"))
        .agg(sum(when(col("sn") =!= col("cn"), col("rev")).otherwise(0L)).as("imports")),
        Seq("nk"), "full")
    perNation
      .join(broadcast(Tables.nation(spark, dir)
        .selectExpr("CAST(n_nationkey AS BIGINT) AS nk", "n_name")), "nk")
      .selectExpr("n_name",
        "COALESCE(exports, 0) AS exports", "COALESCE(imports, 0) AS imports",
        "COALESCE(domestic, 0) AS domestic",
        "COALESCE(exports, 0) - COALESCE(imports, 0) AS balance")
      .orderBy("n_name")
  }

  /** Weekly revenue volatility via median absolute deviation — the
    * robust dispersion read next to [[qChangepoint]]'s level shifts
    * (MAD ignores the single outlier weeks that wreck a stddev):
    * weekly revenue in exact whole dollars, the median week and the
    * median |deviation| both rank-selected from the CALENDAR-bounded
    * weekly series (never a data-sized sort), volatility =
    * mad·10⁴ DIV median in bp. One fact-scale rollup to weeks; every
    * frame after it is week-count-sized (whitelisted global windows
    * like the other time-domain frames). */
  def qWeeklyVolatility(spark: SparkSession, dir: String): DataFrame = {
    val wk = Tables.orders(spark, dir)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000000").as("wn"),
        cents(col("o_totalprice"), 2).as("sp"))
      .groupBy(col("wn")).agg(sum(expr("sp DIV 100")).as("rev_d"))
    def medianOf(d: DataFrame, c: String): DataFrame = {
      val w = Window.orderBy(col(c), col("wn"))
      d.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("rn") === expr("GREATEST((n + 1) DIV 2, 1)"))
        .select(col(c).as("m"))
    }
    val med = medianOf(wk, "rev_d")
    val dev = wk.crossJoin(broadcast(med))
      .selectExpr("wn", "rev_d", "ABS(rev_d - m) AS ad", "m")
    val mad = medianOf(dev.select(col("wn"), col("ad")), "ad")
      .select(col("m").as("mad"))
    dev.agg(count(lit(1)).as("n_weeks"), max(col("m")).as("median_d"))
      .crossJoin(broadcast(mad))
      .selectExpr("n_weeks", "median_d", "mad AS mad_d",
        "(mad * 10000) DIV GREATEST(median_d, 1) AS volatility_bp")
  }

  /** Open-order backlog aging — the fulfilment-ops WIP report ("how
    * old is what we still owe, and how much money is sitting in each
    * age band"): open orders ('O' status) aged in days against the
    * corpus high-water orderdate, bucketed in 90-day quarters capped
    * at 8+ (bounded output), with order count, exact cents value, and
    * the value share per band in bp. The status filter pushes to the
    * scan; the high-water mark is a 1-row broadcast; one bounded
    * histogram + share rollup after a map-side age computation. */
  def qBacklogAging(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
        cents(col("o_totalprice"), 2).as("sp"))
    val hw = o.agg(max(col("dn")).as("hw"))
    val hist = o.crossJoin(broadcast(hw))
      .groupBy(expr("LEAST((hw - dn) DIV 90, 8)").as("age_quarters"))
      .agg(count(lit(1)).as("n_orders"), sum(col("sp")).as("value_cents"),
        sum(expr("sp DIV 100")).as("value_d"))
    val tot = hist.agg(sum(col("value_d")).as("tot"))
    hist.crossJoin(broadcast(tot))
      .selectExpr("age_quarters", "n_orders", "value_cents",
        "(value_d * 10000) DIV tot AS value_share_bp")
      .orderBy("age_quarters")
  }

  /** Customer lifespan / survival histogram — the duration read under
    * every churn model (how long does a customer relationship last,
    * first order to last): per customer the lifespan in months (month
    * indices are exact integers), rolled up per lifespan value with
    * the survival share (customers lasting ≥ that many months) in bp.
    * One customer-grain min/max aggregate, a histogram-sized rollup,
    * and the suffix-cumulative over lifespan VALUES — bounded by the
    * calendar-month domain at any scale (whitelisted global window,
    * like the other time-domain frames). */
  def qCustomerLifespan(spark: SparkSession, dir: String): DataFrame = {
    val span = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT)").as("m"))
      .groupBy(col("o_custkey"))
      .agg((max(col("m")) - min(col("m"))).as("lifespan_months"))
    val hist = span.groupBy(col("lifespan_months"))
      .agg(count(lit(1)).as("n_customers"))
    val wS = Window.orderBy(col("lifespan_months").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wT = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("n_surviving", sum(col("n_customers")).over(wS))
      .withColumn("tot", sum(col("n_customers")).over(wT))
      .selectExpr("lifespan_months", "n_customers", "n_surviving",
        "(n_surviving * 10000) DIV tot AS surviving_bp")
      .orderBy("lifespan_months")
  }

  /** ABC inventory classification of parts by revenue (the Pareto
    * cousin of [[qLorenzTopshare]], cut by MASS instead of head-count:
    * A = parts covering the first 80% of revenue, B = next 15%, C =
    * the tail): parts rank DESCENDING by exact discounted revenue via
    * the two-level bucket decomposition, the cumulative revenue prefix
    * comes from in-bucket cumsums plus bucket-offset revenue totals
    * (both bucket-domain-bounded — never a global data sort), and the
    * class test compares whole-dollar cumulatives (rev is exact 10⁻⁴
    * units, so the prefix runs on rev DIV 10⁴ — cum_d·100 and
    * share·10⁴ stay Int64-safe to ~SF 400). Output is the 3-row
    * class rollup with part counts, exact cents, and share bp. */
  def qAbcClass(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("rc"))
      .groupBy(col("l_partkey")).agg(sum(col("rc")).as("rev"))
      .withColumn("b", expr("rev DIV 100000000"))
    val wIn = Window.partitionBy(col("b"))
      .orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val bc = x.groupBy(col("b"))
      .agg(sum(expr("rev DIV 10000")).as("brev_d"))
    val wOff = Window.orderBy(col("b").desc).rowsBetween(Window.unboundedPreceding, -1)
    val off = bc.withColumn("off_d", coalesce(sum(col("brev_d")).over(wOff), lit(0L)))
      .select(col("b"), col("off_d"))
    val tot = x.agg(sum(expr("rev DIV 10000")).as("total_d"), sum(col("rev")).as("total_c"))
    x.withColumn("cum_in_d", sum(expr("rev DIV 10000")).over(wIn))
      .join(broadcast(off), Seq("b"))
      .withColumn("cum_d", col("off_d") + col("cum_in_d"))
      .crossJoin(broadcast(tot))
      .selectExpr("rev",
        """CASE WHEN cum_d * 100 <= total_d * 80 THEN 'A'
          |     WHEN cum_d * 100 <= total_d * 95 THEN 'B'
          |     ELSE 'C' END AS abc_class""".stripMargin.replace("\n", " "),
        "total_d")
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("revenue"),
        sum(expr("rev DIV 10000")).as("rev_d"), max(col("total_d")).as("total_d"))
      .selectExpr("abc_class", "n_parts", "revenue",
        "(rev_d * 10000) DIV total_d AS share_bp")
      .orderBy("abc_class")
  }

  /** Duplicate-order screen — the payments-audit query every AP team
    * runs ("same customer, same amount, same day"): orders grouped on
    * the (custkey, exact cents, epoch-day) triple, reported as the
    * group-size histogram (how many singletons / pairs / triples...)
    * with the order share per size in bp. One map-side-combinable
    * triple-keyed aggregate, one histogram-sized rollup, a 1-row
    * broadcast — no windows, no joins; at 100 TB the triple key
    * partitions evenly (day spreads the hot customers). */
  def qDuplicateOrders(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice"), 2).as("sp"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"))
      .groupBy(col("o_custkey"), col("sp"), col("dn"))
      .agg(count(lit(1)).as("n"))
    val hist = g.groupBy(col("n").as("group_size"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_orders"))
    val tot = hist.agg(sum(col("n_orders")).as("tot"))
    hist.crossJoin(broadcast(tot))
      .selectExpr("group_size", "n_groups", "n_orders",
        "(n_orders * 10000) DIV tot AS share_bp")
      .orderBy("group_size")
  }

  /** Inter-order gap distribution — the purchase-cadence histogram
    * behind replenishment and churn-risk models ("how long between a
    * customer's consecutive orders"): per-customer consecutive order
    * gaps in days via a customer-partitioned lag window (per-customer
    * order counts are small and scale-stable), bucketed into weeks
    * capped at 12+ (bounded output at any scale), with the share per
    * bucket in bp against a 1-row broadcast total — no global window
    * anywhere. Same-day repeat orders land in bucket 0 regardless of
    * tie order, so the histogram is tie-order invariant. */
  def qInterorderGap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("dn"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"))
      .withColumn("gap_days", col("dn") - lag(col("dn"), 1).over(w))
      .filter(col("gap_days").isNotNull)
    val hist = gaps
      .groupBy(expr("LEAST(gap_days DIV 7, 12)").as("gap_weeks"))
      .agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum(col("n")).as("tot"))
    hist.crossJoin(broadcast(tot))
      .selectExpr("gap_weeks", "n", "(n * 10000) DIV tot AS share_bp")
      .orderBy("gap_weeks")
  }

  /** Cohort LTV curve — cumulative revenue per acquisition cohort by
    * account age (the revenue companion to [[qRetentionMatrix]]'s
    * activity counts): cohort = month of a customer's FIRST order
    * (month index y·12+(m−1), exact integer), age = months since, and
    * per (cohort, age) the month's revenue, the running cumulative,
    * and cumulative LTV per cohort customer in cents. One
    * customer-grain min, one (cohort, age) rollup, a cohort-sized
    * count join, and a cumulative window partitioned per cohort over
    * ≤ calendar-months rows — every post-scan frame is
    * month-domain-bounded at any scale factor. */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT)").as("m"),
        cents(col("o_totalprice"), 2).as("sp"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cm"))
    val rev = o.join(first, "o_custkey")
      .groupBy(col("cm"), (col("m") - col("cm")).as("age"))
      .agg(sum(col("sp")).as("rev"))
    val csize = first.groupBy(col("cm")).agg(count(lit(1)).as("n_customers"))
    val w = Window.partitionBy(col("cm")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.join(broadcast(csize), Seq("cm"))
      .withColumn("cum_rev", sum(col("rev")).over(w))
      .selectExpr(
        "concat(CAST(cm DIV 12 AS STRING), '-', lpad(CAST(cm % 12 + 1 AS STRING), 2, '0')) AS cohort_month",
        "age", "n_customers", "rev", "cum_rev",
        "cum_rev DIV n_customers AS ltv_cents")
      .orderBy("cohort_month", "age")
  }

  /** Exact-integer OLS trend per order priority — the detrending
    * read run BEFORE [[qAutocorr]]'s seasonality terms and
    * [[qForecastBacktest]]'s rolling baseline: which priority class
    * is structurally growing? Slope of daily revenue (k$, the
    * [[qAutocorr]] overflow unit) against the day index by the exact
    * normal-equation form slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * — every Σ an Int64 over integers, no float means (tie-order
    * invariant, partitioning invariant). Day index is anchored at
    * the global min day (slope is shift-invariant; one broadcast
    * 1-row anchor), so x is calendar-bounded (~2.5k) and n·Σxy stays
    * inside Int64 to ~SF 10⁵. The micro-k$/day report CANNOT scale
    * the numerator by 10⁶ first (that caps at ~SF 7): it uses the
    * exact split-division identity trunc(num·10⁶/den) = q·10⁶ +
    * trunc(r·10⁶/den) with q = num DIV den, r = num − q·den — r is
    * denominator-bounded and den is CALENDAR-only (~n⁴/12 ≈ 2.8e12),
    * so every intermediate stays in Int64 at any revenue scale. The
    * oracle mirrors Spark's truncating DIV with the [[qAutocorr]]
    * sign CASE and derives r from q (never `%`, whose floor-vs-trunc
    * pairing differs across engine versions). ONE data-sized groupBy
    * to (priority, day) partials; the regression itself runs over
    * ≤ 5 × calendar-days rows. */
  def qOlsTrend(spark: SparkSession, dir: String): DataFrame = {
    // persisted at the (priority, day) grain (≤ 5 × calendar days):
    // the anchor min and the regression both read it, so the fact
    // table is scanned once, not once per pass
    val daily = graft.Caches.sharedCheckpoint(spark, s"analytics.prioDaily:$dir") {
      Tables.orders(spark, dir)
        .select(col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
          cents(col("o_totalprice"), 2).as("sp"))
        .groupBy(col("o_orderpriority"), col("dn"))
        .agg(sum(expr("sp DIV 100000")).as("y"))
    }
    val anchor = daily.agg(min(col("dn")).as("d0"))
    daily.crossJoin(broadcast(anchor))
      .selectExpr("o_orderpriority", "dn - d0 AS x", "y")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .selectExpr("o_orderpriority", "n_days", "sy AS total_rev_k",
        "n_days * sxy - sx * sy AS num", "n_days * sxx - sx * sx AS den")
      .selectExpr("o_orderpriority", "n_days", "total_rev_k",
        "num DIV den AS q", "num - (num DIV den) * den AS r", "den")
      .selectExpr("o_orderpriority", "n_days", "total_rev_k",
        "q * 1000000 + (r * 1000000) DIV den AS slope_micro_k")
      .orderBy("o_orderpriority")
  }

  /** Max drawdown of the daily revenue series per order priority —
    * the worst peak-to-trough collapse, the risk statistic read next
    * to [[qWeeklyVolatility]]'s dispersion and [[qChangepoint]]'s
    * level shifts (volatility says how NOISY the series is; drawdown
    * says how far it actually FELL from its best day, the number an
    * SLA or revenue-at-risk review quotes). Per priority: the daily
    * exact-cents series, its running peak (one ordered window over
    * calendar-sized partitions), each day's drawdown
    * (peak − rev)·10⁴ DIV peak in bp, rolled up to the maximum with
    * the FIRST day it was touched (min-day tie-break via one
    * min(struct) aggregate — no second argmax pass). Reuses the
    * shared (priority, day) rollup, so the fact table is not
    * re-scanned when [[qOlsTrend]] ran first; all windows partition
    * by priority over ≤ calendar-days rows. */
  def qMaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Caches.sharedCheckpoint(spark, s"analytics.prioDailyC:$dir") {
      Tables.orders(spark, dir)
        .select(col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
          cents(col("o_totalprice"), 2).as("sp"))
        .groupBy(col("o_orderpriority"), col("dn"))
        .agg(sum(col("sp")).as("rev_c"))
    }
    val wP = Window.partitionBy(col("o_orderpriority")).orderBy(col("dn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak_c", max(col("rev_c")).over(wP))
      .selectExpr("o_orderpriority", "dn", "peak_c",
        "((peak_c - rev_c) * 10000) DIV peak_c AS dd_bp")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_days"),
        max(col("peak_c")).as("peak_rev_c"),
        min(struct((-col("dd_bp")).as("ndd"), col("dn").as("dn"))).as("worst"))
      .selectExpr("o_orderpriority", "n_days", "peak_rev_c",
        "-worst.ndd AS max_dd_bp", "worst.dn AS dd_day")
      .orderBy("o_orderpriority")
  }

  /** Wald–Wolfowitz runs test on the daily revenue series — the
    * randomness screen behind trend/seasonality claims (before
    * [[qChangepoint]] flags a shift or [[qOlsTrend]] fits a slope,
    * ask whether the above/below-median pattern could be noise: far
    * FEWER runs than expected means clumping/trend, far MORE means
    * oscillation): the series folds to above-median signs, runs count
    * sign changes, and the classic expectation E[R] = 1 + 2·n₁·n₀/n
    * reports in exact centi-units next to the observed count — the
    * signed delta is the test statistic's numerator, integer-exact
    * (the variance's square root is left to the reader: this repo
    * ships no float columns across the gate). Median by exact rank
    * selection, signs + one lag window over the CALENDAR-sized
    * series (the [[qWeeklyVolatility]] time-domain whitelist), one
    * summary row out. */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
        cents(col("o_totalprice"), 2).as("sp"))
      .groupBy(col("dn")).agg(sum(col("sp")).as("rev"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("rev"), col("dn"))).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("GREATEST((n + 1) DIV 2, 1)"))
      .select(col("rev").as("m"))
    val signs = daily.crossJoin(broadcast(med))
      .selectExpr("dn", "CASE WHEN rev > m THEN 1L ELSE 0L END AS s")
    val wD = Window.orderBy(col("dn"))
    signs
      .withColumn("chg",
        when(lag(col("s"), 1).over(wD).isNull, 1L)
          .when(lag(col("s"), 1).over(wD) =!= col("s"), 1L).otherwise(0L))
      .agg(count(lit(1)).as("n_days"),
        sum(col("s")).as("n_above"),
        sum(expr("1L - s")).as("n_below"),
        sum(col("chg")).as("n_runs"))
      .selectExpr("n_days", "n_above", "n_below", "n_runs",
        "100 + (200 * n_above * n_below) DIV n_days AS e_runs_c",
        "n_runs * 100 - (100 + (200 * n_above * n_below) DIV n_days) AS delta_c")
  }

  /** Discount-elasticity profile — the promo-effectiveness read
    * behind TPC-H Q6's what-if ("the revenue increase if discounts
    * were eliminated" presumes demand holds; this table shows what
    * quantity actually DID at each discount level): per discount
    * point, line count, exact total/average quantity (centi-units),
    * exact discounted revenue in cents via the integer identity
    * price·(100 − d) DIV 100 applied per ROW (each line's discount
    * is a whole-percent point, so the product is exact before the
    * DIV), and each level's share of total revenue in bp. One
    * map-side-combined aggregate over a 2-column scan into a
    * ≤ 11-row rollup; the share folds over the tiny result with one
    * unpartitioned window. */
  def qDiscountElasticity(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .select(cents(col("l_discount"), 2).as("disc_pct"),
        cents(col("l_quantity"), 2).as("qty_c"),
        cents(col("l_extendedprice"), 2).as("price_c"))
      .selectExpr("disc_pct", "qty_c",
        "(price_c * (100 - disc_pct)) DIV 100 AS rev_c")
      .groupBy(col("disc_pct"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty_c")).as("qty_c"),
        sum(col("rev_c")).as("rev_c"))
      .withColumn("tot", sum(col("rev_c")).over(wAll))
      .selectExpr("disc_pct", "n_lines", "qty_c",
        "qty_c DIV n_lines AS avg_qty_c", "rev_c",
        "(rev_c * 10000) DIV tot AS rev_share_bp")
      .orderBy("disc_pct")
  }

  /** Order fan-out distribution — lines-per-order histogram, the
    * denormalization planner's first read (the join multiplicity
    * between the header and line tables decides shuffle sizing,
    * skew exposure, and whether a pre-aggregated line rollup is
    * worth materializing; an order with 10× the typical fan-out is
    * also the first place a duplicated extract shows up): lines
    * count per order (one map-side-combined aggregate on the join
    * key), then the fan-out histogram with each level's order share
    * and LINE share in bp — the two shares read differently under
    * skew, which is the point. Histogram-sized output (TPC-H fan-out
    * tops out at 7); the share fold is one window over those rows. */
  def qOrderLinecountDist(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("tot_o", sum(col("n_orders")).over(wAll))
      .withColumn("tot_l", sum(col("n_orders") * col("n_lines")).over(wAll))
      .selectExpr("n_lines", "n_orders",
        "(n_orders * 10000) DIV tot_o AS order_share_bp",
        "(n_orders * n_lines * 10000) DIV tot_l AS line_share_bp")
      .orderBy("n_lines")
  }

  /** Relative standing inside a group via the native rank-ratio window
    * functions — `percent_rank` ((rank−1)/(n−1)) and `cume_dist`
    * (rows ≤ current / n), the two normalized-rank forms a
    * league-table or compensation-band reader wants that `ntile`'s
    * equal-width tiles cannot express (ties share a percent_rank;
    * a tile boundary splits them arbitrarily). Top-decile suppliers
    * by lifetime revenue within their nation: supplier-grain revenue
    * rollup (one map-side-combined aggregate over the fact table),
    * then the two ratio windows partitioned by nation over
    * DIMENSION-grain rows (suppliers — bounded by the supplier
    * table, never by lineitem; the q_ntile lesson). Both ratios are
    * one IEEE division of exact integers, scaled to bp with a
    * round() both engines compute identically on the same double. */
  def qPercentRank(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), cents(col("l_extendedprice"), 2).as("p"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("p")).as("rev_c"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long").as("nation"))
    val wN = Window.partitionBy(col("nation")).orderBy(col("rev_c"))
    sup.join(rev, sup("s_suppkey") === rev("l_suppkey"), "left")
      .select(col("nation"), col("s_suppkey"),
        coalesce(col("rev_c"), lit(0L)).as("rev_c"))
      .withColumn("pr_raw", percent_rank().over(wN))
      .withColumn("cd_raw", cume_dist().over(wN))
      .selectExpr("nation", "s_suppkey", "rev_c",
        "CAST(round(pr_raw * 10000) AS BIGINT) AS pr_bp",
        "CAST(round(cd_raw * 10000) AS BIGINT) AS cd_bp")
      // top decile by cume_dist — inclusive of ties and of singleton
      // nations (cd=1 there), so the cut is non-empty at any SF
      .where(col("cd_bp") >= 9000)
      .orderBy("nation", "rev_c", "s_suppkey")
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands decomposition (day − dense_rank is constant
    * within an unbroken run), the engagement statistic behind
    * habit/retention dashboards that DAU/MAU and retention matrices
    * both miss (a user active 7 days STRAIGHT is a different user
    * from one active 7 scattered days). Distinct (user, day) grid
    * (map-side combine), island id via one USER-partitioned window
    * (user-grain partitions — maximal parallelism, no skew beyond a
    * single user's calendar, which is bounded), streak lengths per
    * island, max per user, then the corpus-level histogram: per
    * longest-streak length, how many users and their total active
    * days. Histogram-sized output at any SF. */
  def qStreaks(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("dn"))
    Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("dn"))
      .distinct()
      .withColumn("isl", col("dn") - dense_rank().over(wU))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest"), sum(col("len")).as("active_days"))
      .groupBy(col("longest"))
      .agg(count(lit(1)).as("n_users"), sum(col("active_days")).as("user_days"))
      .orderBy("longest")
  }

  /** Weighted median unit price per return flag (weight = quantity):
    * the "typical dollar's price" rather than the typical line's —
    * the robust center a pricing review wants when line sizes vary
    * 50×. Exact two-level decomposition, never a fact-sized sort:
    * level 1 buckets price into $100 cells (price-RANGE-bounded cell
    * count, SF-independent) and cumsums bucket weights per flag over
    * those bounded rows to locate the single bucket containing the
    * lower weighted median (smallest x with 2·cumW(x) ≥ W); level 2
    * re-aggregates ONLY that bucket's distinct price values (≤ 10⁴
    * cent values per bucket, bounded) with the level-1 offset to find
    * the exact crossing value. Both windows run over bounded-cardinality
    * rows at any SF — the same machinery as dlp_quantile_bucketing. */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val vals = graft.Caches.sharedCheckpoint(spark, s"analytics.wmedVals:$dir") {
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"),
          cents(col("l_extendedprice"), 2).as("price_c"),
          cents(col("l_quantity"), 2).as("w"))
        .groupBy(col("l_returnflag"), col("price_c"))
        .agg(sum(col("w")).as("w"))
        .withColumn("b", expr("price_c DIV 10000"))
    }
    val wB = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
    val buckets = vals
      .groupBy(col("l_returnflag"), col("b"))
      .agg(sum(col("w")).as("wb"))
      .withColumn("cum", sum(col("wb")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("wb")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val target = buckets
      .where(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(struct(col("b"), (col("cum") - col("wb")).as("off"),
        col("tot").as("tot"))).as("t"))
      .selectExpr("l_returnflag", "t.b AS tb", "t.off AS off", "t.tot AS tot")
    val wV = Window.partitionBy(col("l_returnflag")).orderBy(col("price_c"))
    vals.as("l").join(broadcast(target.withColumnRenamed("l_returnflag", "tf")),
        col("l.l_returnflag") === col("tf") && col("l.b") === col("tb"))
      .select(col("l.l_returnflag"), col("price_c"), col("w"), col("off"), col("tot"))
      .withColumn("cum", col("off") + sum(col("w")).over(
        wV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("price_c")).as("wmedian_price_c"), min(col("tot")).as("total_w"))
      .selectExpr("l_returnflag", "total_w", "wmedian_price_c")
      .orderBy("l_returnflag")
  }

  /** Chi-square independence audit of order priority × order status —
    * the contingency screen behind any "priority predicts lifecycle"
    * claim, in EXACT integer math: observed cell counts (one
    * 15-cell aggregate), marginals folded back as windows over the
    * cell rows (never a second scan), floored expectation
    * e = (rowSum·colSum) DIV n, and each cell's contribution
    * ((o−e)²·10⁶) DIV e in micro-units — deterministic on both
    * engines because every step is integer (the floored-expectation
    * form is documented; d is bounded by the cell count so d²·10⁶
    * holds in Int64 to ~SF 10⁴). The statistic Σ contrib is folded
    * onto each row by a 15-row global window. */
  def qChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wP = Window.partitionBy(col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wS = Window.partitionBy(col("o_orderstatus"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("obs"))
      .withColumn("rs", sum(col("obs")).over(wP))
      .withColumn("cs", sum(col("obs")).over(wS))
      .withColumn("n", sum(col("obs")).over(wAll))
      .selectExpr("o_orderpriority", "o_orderstatus", "obs",
        "(rs * cs) DIV n AS exp_f")
      .selectExpr("o_orderpriority", "o_orderstatus", "obs", "exp_f",
        "((obs - exp_f) * (obs - exp_f) * 1000000) DIV GREATEST(exp_f, 1) AS contrib_micro")
      .withColumn("chi2_micro", sum(col("contrib_micro")).over(wAll))
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  /** 7-day rolling median of daily revenue per order priority — the
    * robust smoother read next to [[qWeeklyVolatility]]'s dispersion
    * (a single flash-sale day drags a moving AVERAGE for a week; the
    * moving median shrugs it off). Daily exact-cents rollup (one
    * map-side-combined aggregate), then an exact windowed median
    * over ROWS 6 PRECEDING per priority — windows run over one row
    * per (priority, day), calendar-bounded at any SF. Exactness
    * trick: median(2·rev) of an even frame is mid-pair SUM (integer)
    * and of an odd frame is 2·mid — always integral, so the
    * interpolating `percentile`/`median` of both engines agree
    * bit-for-bit and the boundary stays BIGINT. */
  def qMovingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Caches.sharedCheckpoint(spark, s"analytics.prioDailyC:$dir") {
      Tables.orders(spark, dir)
        .select(col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
          cents(col("o_totalprice"), 2).as("sp"))
        .groupBy(col("o_orderpriority"), col("dn"))
        .agg(sum(col("sp")).as("rev_c"))
    }
    val w7 = Window.partitionBy(col("o_orderpriority")).orderBy(col("dn"))
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("med2", expr("percentile(rev_c * 2, 0.5)").over(w7))
      .withColumn("n_in", count(lit(1)).over(w7))
      .selectExpr("o_orderpriority", "dn", "rev_c",
        "n_in", "CAST(med2 AS BIGINT) AS med2_c")
      .orderBy("o_orderpriority", "dn")
  }

  /** Month-of-year seasonal index of order revenue — the seasonality
    * read a forecast or capacity plan takes BEFORE trusting any
    * trend ([[qOlsTrend]]) or change claim ([[qChangepoint]]): per
    * calendar month (pooled across years), order count, exact-cents
    * revenue, revenue share bp, and the seasonal index in bp
    * (rev·12·10⁴ DIV total — par = 10000, a 10500 December is a 5%
    * hot month). One map-side-combined aggregate into a ≤12-row
    * rollup; the corpus total arrives by broadcast cross join (the
    * qOlsTrend anchor pattern), never a global window. */
  def qSeasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .select(month(col("o_orderdate").cast("timestamp")).cast("long").as("m"),
        cents(col("o_totalprice"), 2).as("sp"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_orders"), sum(col("sp")).as("rev_c"))
    val total = monthly.agg(sum(col("rev_c")).as("tot"))
    monthly.crossJoin(broadcast(total))
      .selectExpr("m AS month", "n_orders", "rev_c",
        "(rev_c * 10000) DIV tot AS share_bp",
        "(rev_c * 120000) DIV tot AS index_bp")
      .orderBy("month")
  }

  /** Median-absolute-deviation outlier screen on the daily revenue
    * series per priority — the robust alarm rule ([[qMaxDrawdown]]
    * says how far it fell; MAD says which days were ABNORMAL without
    * letting the abnormal days inflate their own yardstick, the
    * classic z-score failure): exact lower rank-median of the daily
    * series, deviations |rev − med|, exact lower rank-median of the
    * deviations (same machinery), then the 3·MAD outlier count and
    * the worst day via one min(struct) argmax. All rank windows run
    * over one row per (priority, day) — calendar-bounded at any SF;
    * the two median tables are priority-sized broadcasts. */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Caches.sharedCheckpoint(spark, s"analytics.prioDailyC:$dir") {
      Tables.orders(spark, dir)
        .select(col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
          cents(col("o_totalprice"), 2).as("sp"))
        .groupBy(col("o_orderpriority"), col("dn"))
        .agg(sum(col("sp")).as("rev_c"))
    }
    // exact lower rank-median of `v` per priority (the qRunsTest rule)
    def rankMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val wR = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col(v), col("dn"))
      val wN = Window.partitionBy(col("o_orderpriority"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      df.withColumn("rn", row_number().over(wR))
        .withColumn("n", count(lit(1)).over(wN))
        .where(col("rn") === expr("greatest((n + 1) DIV 2, 1)"))
        .select(col("o_orderpriority").as("mp"), col(v).as(out))
    }
    val med = rankMedian(daily, "rev_c", "med_c")
    val dev = daily.join(broadcast(med), col("o_orderpriority") === col("mp"))
      .selectExpr("o_orderpriority", "dn", "rev_c", "med_c",
        "abs(rev_c - med_c) AS dev_c")
    val mad = rankMedian(dev, "dev_c", "mad_c")
      .withColumnRenamed("mp", "mp2")
    dev.join(broadcast(mad), col("o_orderpriority") === col("mp2"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_days"), min(col("med_c")).as("med_c"),
        min(col("mad_c")).as("mad_c"),
        sum(when(col("dev_c") > col("mad_c") * 3, 1L).otherwise(0L)).as("n_outliers"),
        min(struct((-col("dev_c")).as("nd"), col("dn").as("dn"))).as("worst"))
      .selectExpr("o_orderpriority", "n_days", "med_c", "mad_c",
        "n_outliers", "worst.dn AS worst_dn", "-worst.nd AS worst_dev_c")
      .orderBy("o_orderpriority")
  }

  /** Degree distribution of the part–supplier bipartite graph — the
    * graph-shape read before any join-strategy or graph-algorithm
    * choice on relationship data ([[qPagerank]] and
    * dedup_triangle_count assume degrees are sane; this table is
    * where a crawler loop or feed duplication first shows as a
    * degree spike): distinct (part, supplier) edges once, then each
    * side's degree histogram with node share bp. Two key aggregates
    * per side over the deduplicated edge list, share fold partitioned
    * by side over HISTOGRAM-sized rows; output is bounded by the
    * distinct-degree domain at any SF. */
  def qDegreeDist(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.Caches.sharedCheckpoint(spark, s"analytics.psEdges:$dir") {
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
    }
    def side(name: String, key: String): DataFrame =
      edges.groupBy(col(key))
        .agg(count(lit(1)).as("degree"))
        .groupBy(col("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .selectExpr(s"'$name' AS side", "degree", "n_nodes")
    val wS = Window.partitionBy(col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    side("part", "l_partkey").unionAll(side("supplier", "l_suppkey"))
      .withColumn("tot", sum(col("n_nodes")).over(wS))
      .selectExpr("side", "degree", "n_nodes",
        "(n_nodes * 10000) DIV tot AS node_share_bp")
      .orderBy("side", "degree")
  }

  /** Spearman rank correlation between supplier revenue and supplier
    * line volume, per nation — the monotone-association read that
    * survives the heavy tail Pearson drowns in (one mega-supplier
    * drags a product-moment r; ranks don't care): per supplier, exact
    * lifetime revenue (cents) and line count out of one fact rollup,
    * both ranked inside the nation by row_number with the supplier
    * key as the deterministic tiebreak (documented distinct-rank
    * Spearman — ties take adjacent ranks, not midranks, so both
    * engines agree exactly), then ρ in bp from the classic
    * ρ = 1 − 6·Σd²/(n(n²−1)) with every step Int64 (numerator
    * 60000·Σd² stays inside Int64 to n ≈ 77k suppliers/nation —
    * ~SF 190 — and is non-negative, so no negative division ever
    * reaches a compare boundary). Nations with fewer than 2 suppliers
    * drop (ρ is undefined on a single rank — at sf0.001's 10-supplier
    * toy scale that is every nation; from sf0.01 up the table is
    * populated). Rank windows run over SUPPLIER (dimension) grain
    * partitioned by nation — the q_percent_rank rule: the fact table
    * rolls up to dim grain BEFORE any window. */
  def qSpearmanRho(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice"), 2)).as("rev_c"),
        count(lit(1)).as("vol"))
      // supplier grows with SF — no forced broadcast; AQE picks the
      // strategy (the q_trade_balance lesson)
      .join(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
    val wRev = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("rev_c").desc, col("l_suppkey"))
    val wVol = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("vol").desc, col("l_suppkey"))
    perSupp
      .withColumn("r_rev", row_number().over(wRev).cast("long"))
      .withColumn("r_vol", row_number().over(wVol).cast("long"))
      .groupBy(col("s_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum((col("r_rev") - col("r_vol")) * (col("r_rev") - col("r_vol"))).as("sum_d2"))
      .filter(col("n_suppliers") >= 2)
      .selectExpr("nation", "n_suppliers", "sum_d2",
        "10000 - (60000 * sum_d2) DIV (n_suppliers * (n_suppliers * n_suppliers - 1)) AS rho_bp")
      .orderBy("nation")
  }

  /** Bowley (quartile) skewness of the daily revenue series per
    * priority — the robust asymmetry read next to [[qMadOutliers]]'s
    * robust dispersion (MAD says how wide the typical day wanders;
    * Bowley says which WAY the tail leans, without a single flash-sale
    * day owning a third moment): Q1/Q2/Q3 rank-selected from the
    * shared daily rollup at ranks ⌈n/4⌉ / ⌈n/2⌉-lower / ⌈3n/4⌉ (exact
    * integer rank rules mirrored on both engines), skew in bp =
    * ((Q3 + Q1 − 2·Q2)·10⁴) / (Q3 − Q1) computed sign-safely (the
    * numerator CAN be negative; both engines divide only the absolute
    * value and re-attach the sign, per the §6 negative-division rule).
    * All windows run over one row per (priority, day) — calendar-
    * bounded at any SF. */
  def qBowleySkew(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Caches.sharedCheckpoint(spark, s"analytics.prioDailyC:$dir") {
      Tables.orders(spark, dir)
        .select(col("o_orderpriority"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
          cents(col("o_totalprice"), 2).as("sp"))
        .groupBy(col("o_orderpriority"), col("dn"))
        .agg(sum(col("sp")).as("rev_c"))
    }
    val wR = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("rev_c"), col("dn"))
    val wN = Window.partitionBy(col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("rn", row_number().over(wR).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("rq1", expr("(n + 3) DIV 4"))
      .withColumn("rq2", expr("(n + 1) DIV 2"))
      .withColumn("rq3", expr("(3 * n + 3) DIV 4"))
      .filter(col("rn") === col("rq1") || col("rn") === col("rq2") ||
        col("rn") === col("rq3"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_days"),
        max(when(col("rn") === col("rq1"), col("rev_c"))).as("q1_c"),
        max(when(col("rn") === col("rq2"), col("rev_c"))).as("q2_c"),
        max(when(col("rn") === col("rq3"), col("rev_c"))).as("q3_c"))
      .selectExpr("o_orderpriority", "n_days", "q1_c", "q2_c", "q3_c",
        """CASE WHEN q3_c = q1_c THEN 0L
          |  WHEN q3_c + q1_c - 2 * q2_c < 0
          |    THEN -(((2 * q2_c - q3_c - q1_c) * 10000) DIV (q3_c - q1_c))
          |  ELSE ((q3_c + q1_c - 2 * q2_c) * 10000) DIV (q3_c - q1_c)
          |END AS skew_bp""".stripMargin)
      .orderBy("o_orderpriority")
  }

  /** Year-over-year order-priority mix shift (total-variation
    * distance) — the composition-drift alarm behind every
    * segmentation claim (a cohort comparison across years silently
    * assumes the MIX held still; TVD is the one number that says by
    * how much it didn't — it is exactly the fraction of orders that
    * would have to change priority to reproduce last year's mix):
    * per (year, priority), order count and share bp (share windows
    * over the ≤5-row priority domain inside each year), prior-year
    * share by one lag over the year axis partitioned BY priority,
    * then the year rollup Σ|Δshare| DIV 2. Every window runs over the
    * year × priority domain (≤ 5 rows per partition — SF-independent);
    * TVD sums absolute values, so nothing negative meets a division. */
  def qMixShift(spark: SparkSession, dir: String): DataFrame = {
    val mix = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val wY = Window.partitionBy(col("yr"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wP = Window.partitionBy(col("o_orderpriority")).orderBy(col("yr"))
    mix
      .withColumn("n_year", sum(col("n")).over(wY))
      .withColumn("share_bp", expr("(n * 10000) DIV n_year"))
      .withColumn("prev_bp", lag(col("share_bp"), 1).over(wP))
      .filter(col("prev_bp").isNotNull)
      .groupBy(col("yr"))
      .agg(max(col("n_year")).as("n_orders"),
        count(lit(1)).as("n_priorities"),
        sum(abs(col("share_bp") - col("prev_bp"))).as("abs_shift"))
      .selectExpr("yr AS year", "n_orders", "n_priorities",
        "abs_shift DIV 2 AS tvd_bp")
      .orderBy("year")
  }

  /** Gini–Simpson diversity of the part-brand mix each nation's
    * suppliers ship — the assortment-concentration read (a nation
    * whose suppliers push one brand is a supply-chain risk even when
    * volume looks healthy): per (nation, brand) line counts out of
    * one fact⋈part⋈supplier rollup, then per nation
    * diversity_bp = 10⁴ − (10⁴·Σnᵢ²) DIV N² (probability two random
    * lines share a brand, complemented) and the inverse-Simpson
    * effective brand count ×100 = (100·N²) DIV Σnᵢ². No logs anywhere
    * — Simpson is the diversity index that stays in exact integer
    * math (the §6 rule that keeps every compare boundary BIGINT).
    * Int64 bound: 10⁴·N² with N = lines/nation ≈ 24M at SF 100 →
    * 5.8×10¹⁸, safe to ~SF 120 (documented like q_gini's dollar
    * bound; past that, scale N to thousands first). lineitem⋈part is
    * a fact-fact shuffle join on the part key (both grow with SF — no
    * forced broadcast, the q_trade_balance lesson); the brand rollup
    * reduces to ≤ 25 nations × 25 brands before anything else. */
  def qSimpsonDiversity(spark: SparkSession, dir: String): DataFrame = {
    val mix = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir)
        .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT) AS nation"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), col("p_brand"))
      .agg(count(lit(1)).as("n"))
    mix.groupBy(col("nation"))
      .agg(sum(col("n")).as("n_lines"),
        count(lit(1)).as("n_brands"),
        sum(col("n") * col("n")).as("sum_sq"))
      .selectExpr("nation", "n_lines", "n_brands",
        "10000 - (10000 * sum_sq) DIV (n_lines * n_lines) AS diversity_bp",
        "(100 * n_lines * n_lines) DIV sum_sq AS eff_brands_x100")
      .orderBy("nation")
  }

  /** Price–volume–mix bridge between two full shipment years (1996 →
    * 1997), per brand — the FP&A decomposition of WHY revenue moved:
    * with unit price p = rev_c DIV qty per (brand, year) (integer
    * cents — the floor is reconciled below, never hidden),
    * Δrev = q₀·Δp (price effect) + p₀·Δq (volume effect) + Δp·Δq
    * (cross term) + residual, where the residual is DEFINED as
    * Δrev − the three effects, so the bridge reconciles EXACTLY in
    * integer arithmetic — the floor error of the two unit-price DIVs
    * lands in `resid_c` where an auditor can see it, instead of
    * silently unbalancing the waterfall. Brands missing a year drop
    * (no Δ to decompose). One fact⋈part shuffle join, one 25-row
    * brand-year rollup, then a self-join of the two year slices on
    * brand — every post-rollup stage is domain-bounded (≤25 brands)
    * at any SF. Int64: p·q ≈ 1.5×10⁵ cents × 8.6×10⁷ units/brand at
    * SF 100 ≈ 1.3×10¹³ — five orders of magnitude of headroom. */
  def qPriceVolumeMix(spark: SparkSession, dir: String,
                      yr0: Int = 1996, yr1: Int = 1997): DataFrame = {
    val yrc = year(col("l_shipdate")).cast("long")
    Tables.lineitem(spark, dir)
      .filter(year(col("l_shipdate")).isin(yr0, yr1))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      // ONE conditional-aggregation pass pivots both years out of a
      // single fact scan (a per-year slice-and-self-join would scan
      // the 2-year window twice for the same 25-row result)
      .groupBy(col("p_brand"))
      .agg(
        sum(when(yrc === yr0, cents(col("l_extendedprice"), 2)).otherwise(0L)).as("rev0"),
        sum(when(yrc === yr0, col("l_quantity").cast("long")).otherwise(0L)).as("qty0"),
        sum(when(yrc === yr1, cents(col("l_extendedprice"), 2)).otherwise(0L)).as("rev1"),
        sum(when(yrc === yr1, col("l_quantity").cast("long")).otherwise(0L)).as("qty1"))
      // brands missing a year have no Δ to decompose (and no unit
      // price) — same drop the oracle's inner year-join performs
      .filter(col("qty0") > 0 && col("qty1") > 0)
      .withColumn("p0", expr("rev0 DIV qty0"))
      .withColumn("p1", expr("rev1 DIV qty1"))
      .selectExpr("p_brand",
        "rev1 - rev0 AS rev_delta_c",
        "qty0 * (p1 - p0) AS price_eff_c",
        "p0 * (qty1 - qty0) AS volume_eff_c",
        "(p1 - p0) * (qty1 - qty0) AS cross_eff_c",
        "(rev1 - rev0) - qty0 * (p1 - p0) - p0 * (qty1 - qty0)" +
          " - (p1 - p0) * (qty1 - qty0) AS resid_c")
      .orderBy("p_brand")
  }

  /** New-vs-repeat revenue split per month — the acquisition-
    * dependence read [[qGrowthAccounting]] doesn't give (that one
    * counts USERS new/retained/churned; a business can retain every
    * user and still be acquisition-dependent if newcomers carry the
    * basket): per month, order revenue split between each customer's
    * FIRST-EVER order and everything after, with the repeat share in
    * bp. First-order resolution is one customer-grain min-reduce
    * (order date + orderkey as the deterministic same-day tiebreak,
    * folded as a single min(struct) so "first" is one total order,
    * not two independent mins), joined back on the customer key —
    * customer-sized broadcast candidate at low SF, AQE's call at
    * high (no forced broadcast; the dim grows with SF). Output is
    * calendar-bounded (one row per month with orders). */
  def qNewVsRepeat(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
        cents(col("o_totalprice"), 2).as("rev_c"))
    val first = o.groupBy(col("o_custkey").as("fc"))
      .agg(min(struct(col("dn"), col("o_orderkey"))).as("f"))
      .select(col("fc"), col("f.o_orderkey").as("first_key"))
    o.join(first, col("o_custkey") === col("fc"))
      .withColumn("mo", expr("dn DIV 30"))
      .groupBy(col("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderkey") === col("first_key"), col("rev_c"))
          .otherwise(0L)).as("new_rev_c"),
        sum(when(col("o_orderkey") =!= col("first_key"), col("rev_c"))
          .otherwise(0L)).as("repeat_rev_c"))
      .selectExpr("CAST(mo * 30 AS BIGINT) AS month_start_dn", "n_orders",
        "new_rev_c", "repeat_rev_c",
        "(repeat_rev_c * 10000) DIV (new_rev_c + repeat_rev_c) AS repeat_share_bp")
      .orderBy("month_start_dn")
  }

  /** Two-sample Kolmogorov–Smirnov distance between the 1996 and 1997
    * order-total distributions, on $100-binned ECDFs — the
    * distribution-shift test behind every "did the basket change?"
    * question ([[qMixShift]] reads a 5-category mix; KS reads a
    * CONTINUOUS distribution, and its D statistic is the max ECDF
    * gap, located at a specific spend level): per bin (totalprice
    * cents DIV 10⁴ — a value-DOMAIN-bounded ~5.5k-row axis at any
    * SF), both years' counts, ECDF gap in exact cross-multiplied
    * integer form |c₁·n₂ − c₂·n₁| (no per-bin division — the floors
    * would eat the max), D_bp = max·10⁴ DIV (n₁·n₂) (Int64 to
    * n₁·n₂·10⁴ ≤ 9.2×10¹⁸ ≈ SF 150, documented). Binning makes the
    * cumulative window run over the BIN domain, not the fact table —
    * the q_ntile lesson; exact for the binned ECDF, and the bin width
    * is the documented resolution of the test. Ties on D break to the
    * smallest bin. */
  def qKsBinned(spark: SparkSession, dir: String,
                yr0: Int = 1996, yr1: Int = 1997): DataFrame = {
    val yrc = year(col("o_orderdate")).cast("long")
    val bins = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")).isin(yr0, yr1))
      // integer DIV, not double divide-then-cast: a correctly-rounded
      // double quotient can land ON an integer the true quotient sits
      // just under once operands outgrow 2^53 — the bin must floor
      // exactly at any scale, like the oracle's `//`
      .select(yrc.as("yr"), cents(col("o_totalprice"), 2).as("c"))
      .selectExpr("yr", "c DIV 10000 AS bin")
      .groupBy(col("bin"))
      .agg(sum(when(col("yr") === yr0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("yr") === yr1, 1L).otherwise(0L)).as("c2"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum1", sum(col("c1")).over(wCum))
      .withColumn("cum2", sum(col("c2")).over(wCum))
      .crossJoin(broadcast(bins.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))))
      .withColumn("gap", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .orderBy(col("gap").desc, col("bin"))
      .limit(1)
      .selectExpr("n1", "n2", "CAST(bin AS BIGINT) AS ks_bin",
        "(gap * 10000) DIV (n1 * n2) AS ks_bp")
  }

  /** Stationary distribution of the event-type Markov chain —
    * [[qTransitionMatrix]] gives the one-step mix; the steady state
    * answers "where does traffic SETTLE" (the long-run share each
    * event type commands if users keep walking the chain — the
    * equilibrium load profile a capacity planner actually needs):
    * same lag rollup to the k×k transition matrix in row-floored bp,
    * then `rounds` quantized power-iteration steps
    * π′_j = (Σ_i π_i·P_ij) DIV 10⁴ in pure Int64 — every floor is
    * part of the DOCUMENTED recurrence, mirrored step-for-step in
    * the oracle's unrolled CTE chain, so both engines land on the
    * identical fixed point (quantized mass may leak a few bp per
    * step; `pi0_bp` and the final mass are both emitted so the leak
    * is auditable, never hidden). Everything after the one fact
    * rollup is domain-bounded (k ≤ 5 states, k² matrix) — the
    * iteration joins move k-row frames, rounds×3 tiny stages, the
    * honest [[qPagerank]] shape on a bounded domain. */
  def qMarkovSteady(spark: SparkSession, dir: String,
                    rounds: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val tm = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .selectExpr("from_type", "to_type", "n", "(n * 10000) DIV n_from AS p_bp")
    val states = tm.select(col("from_type").as("state"))
      .unionAll(tm.select(col("to_type")))
      .distinct()
    val init = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("k"),
        min(col("state")).as("first"))))
      .selectExpr("state",
        "10000 DIV k + CASE WHEN state = first THEN 10000 % k ELSE 0 END AS pi_bp")
    var pi = init
    (1 to rounds).foreach { _ =>
      pi = pi.join(tm.select(col("from_type"), col("to_type"), col("p_bp")),
          col("state") === col("from_type"))
        .groupBy(col("to_type"))
        .agg(sum(col("pi_bp") * col("p_bp")).as("num"))
        .selectExpr("to_type AS state", "num DIV 10000 AS pi_bp")
    }
    val nOut = tm.groupBy(col("from_type").as("state"))
      .agg(sum(col("n")).as("n_out"))
    // r13 (advice): LEFT-join the iterated π back onto the full state
    // list — a state receiving zero mass in the final round still
    // appears with steady_bp = 0 instead of silently dropping, so the
    // output row set is the state domain, never data-dependent
    init.select(col("state"), col("pi_bp").as("pi0_bp"))
      .join(pi.select(col("state"), col("pi_bp").as("steady_raw")),
        Seq("state"), "left_outer")
      .join(nOut, Seq("state"), "left_outer")
      .selectExpr("state AS event_type", "pi0_bp",
        "COALESCE(steady_raw, 0) AS steady_bp",
        "COALESCE(n_out, 0) AS n_out")
      .orderBy("event_type")
  }

  /** Winsorized mean of order totals per priority — the robust
    * LOCATION statistic beside [[qMadOutliers]]' robust dispersion
    * (a handful of mega-orders drags the raw mean; clamping at exact
    * p5/p95 ranks reports what the typical book looks like, and the
    * raw mean ships alongside so the gap IS the tail's weight): exact
    * rank selection via the two-level bucket-rank decomposition
    * ([[qShipLatency]]'s machinery — in-bucket row_number windows
    * partitioned by (priority, $10k value bucket) + broadcast bucket
    * offsets; NEVER a priority-partitioned table-sized sort window,
    * the q_ntile lesson), bounds at ranks max(1, 5(n+1) DIV 100) and
    * min(n, 95(n+1) DIV 100), then one clamped-sum pass over the fact
    * with the 5-row bounds table broadcast. Two fact passes total —
    * the price of exact rank bounds at any SF. */
  def qWinsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
        cents(col("o_totalprice"), 2).as("c"))
      .withColumn("b", expr("c DIV 1000000"))
    val wIn = Window.partitionBy(col("prio"), col("b"))
      .orderBy(col("c"), col("o_orderkey"))
    val wB = Window.partitionBy(col("prio")).orderBy(col("b"))
    val offs = o.groupBy(col("prio"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("cnt")
    val bounds = o.withColumn("rb", row_number().over(wIn))
      .join(broadcast(offs), Seq("prio", "b"))
      .withColumn("rn", col("off") + col("rb"))
      .groupBy(col("prio"))
      .agg(max(col("n")).as("n"),
        min(when(col("rn") === expr("GREATEST((5 * (n + 1)) DIV 100, 1)"), col("c"))).as("lo_c"),
        min(when(col("rn") === expr("LEAST((95 * (n + 1)) DIV 100, n)"), col("c"))).as("hi_c"))
    o.join(broadcast(bounds), Seq("prio"))
      .groupBy(col("prio"))
      .agg(max(col("n")).as("n_orders"),
        max(col("lo_c")).as("lo_c"), max(col("hi_c")).as("hi_c"),
        sum(least(greatest(col("c"), col("lo_c")), col("hi_c"))).as("wsum"),
        sum(col("c")).as("rsum"))
      .selectExpr("prio AS o_orderpriority", "n_orders", "lo_c", "hi_c",
        "wsum DIV n_orders AS winsor_mean_c", "rsum DIV n_orders AS raw_mean_c")
      .orderBy("o_orderpriority")
  }

  /** Shipment-spread histogram — fulfillment FRAGMENTATION per order
    * ([[qOrderLinecountDist]] reads how many lines an order has; this
    * reads how long the order stays OPEN shipping them — the
    * split-shipment cost driver): per order, the day span between its
    * first and last shipped line (one fact min/max reduce on the
    * order key — single-line orders span 0), joined to priority,
    * rolled to a (priority × week-bucket) histogram with share bp
    * inside the priority (share windows over HISTOGRAM-sized rows —
    * the span domain is calendar-bounded at any SF). */
  def qShipSpread(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000000").as("dn"))
      .groupBy(col("l_orderkey"))
      .agg((max(col("dn")) - min(col("dn"))).as("span_days"),
        count(lit(1)).as("n_lines"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
    val wP = Window.partitionBy(col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spans.groupBy(col("o_orderpriority"), expr("span_days DIV 7").as("week_bucket"))
      .agg(count(lit(1)).as("n_orders"), sum(col("n_lines")).as("n_lines"))
      .withColumn("tot", sum(col("n_orders")).over(wP))
      .selectExpr("o_orderpriority", "CAST(week_bucket AS BIGINT) AS week_bucket",
        "n_orders", "n_lines", "(n_orders * 10000) DIV tot AS share_bp")
      .orderBy("o_orderpriority", "week_bucket")
  }

  /** A/B experiment sizing — the design-side companion to
    * [[qAbLift]]'s measurement (lift tells you what an experiment
    * SAW; power analysis tells you how long the NEXT one must run
    * before silence means anything): baseline conversion p taken
    * from the observed view→purchase rate (the
    * [[graft.streaming.Streams.absenceTimeout]] definition — purchase
    * strictly within 30 min of the view), then for each target
    * relative lift r ∈ {1%, 2%, 5%, 10%}, the per-arm sample size
    * n = 2(z_{α/2}+z_β)²·p(1−p)/δ² at the standard α=5% two-sided /
    * 80% power point — 2(1.96+0.84)² = 15.68 EXACTLY, so the whole
    * formula clears to n = (1568·p_bp·(10⁴−p_bp)) DIV (100·δ_bp²)
    * in pure Int64 (numerator ≤ 3.9×10¹⁰), plus the days to fill
    * both arms at the observed daily view rate. One fact rollup to a
    * 1-row baseline (broadcast), 4-row output at any SF. */
  def qAbPowerPlan(spark: SparkSession, dir: String): DataFrame = {
    // the baseline conversion IS the absence-timeout definition — one
    // shared core (Streams.viewConversions), not a hand-synced copy
    val base = graft.streaming.Streams.viewConversions(spark, dir)
      .withColumnRenamed("converted", "conv")
      .agg(count(lit(1)).as("n_views"), sum(col("conv")).as("n_conv"),
        (max(expr("vus DIV 86400000000")) - min(expr("vus DIV 86400000000")) + 1)
          .as("n_days"))
      .selectExpr("n_views", "n_conv", "n_days",
        "(n_conv * 10000) DIV n_views AS p_bp",
        "n_views DIV n_days AS views_per_day")
    spark.range(1)
      .selectExpr("explode(CAST(array(100, 200, 500, 1000) AS ARRAY<BIGINT>)) AS lift_bp")
      .crossJoin(broadcast(base))
      .selectExpr("lift_bp", "p_bp", "views_per_day",
        "(p_bp * lift_bp) DIV 10000 AS delta_bp")
      .filter(col("delta_bp") > 0)
      .selectExpr("lift_bp", "p_bp", "delta_bp",
        "(1568 * p_bp * (10000 - p_bp)) DIV (100 * delta_bp * delta_bp) AS n_per_arm",
        "views_per_day")
      .selectExpr("lift_bp", "p_bp", "delta_bp", "n_per_arm",
        "(2 * n_per_arm + views_per_day - 1) DIV views_per_day AS days_needed")
      .orderBy("lift_bp")
  }
}
