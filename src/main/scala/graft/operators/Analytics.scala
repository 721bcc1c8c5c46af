package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-table analytical queries over the star schema — the "Kibana
  * dashboard at warehouse scale" capability tier (SURVEY §2.8): large
  * fact-fact and fact-dimension joins, grouped aggregation, top-k.
  *
  * These are the headline bench queries: they exercise exactly the physical
  * properties that matter at 100 TB —
  *   - fixed-size dimension joins (region: 5 rows, nation: 25 rows) carry
  *     explicit `broadcast()` hints — their cardinality is a constant of
  *     the schema, so the hint is safe at any scale factor;
  *   - sf-scaling relations (customer, supplier, part) get NO explicit
  *     hint: an explicit hint overrides AQE's size statistics, so a
  *     forced broadcast that is convenient at sf0.1 becomes an OOM at
  *     100×. AQE/`autoBroadcastJoinThreshold` picks BroadcastHashJoin
  *     while they fit and degrades to a shuffled join when they don't —
  *     PlanSpec locks the BHJ choice at fixture scale so the fast plan is
  *     still provably chosen where it is correct;
  *   - the one genuinely large join (orders ⋈ lineitem) is a shuffle
  *     hash-join on the natural key, with both filters pushed below the
  *     join into the parquet scans (`PushedFilters` in `.explain`);
  *   - aggregates are partially applied map-side before the group-by
  *     exchange; top-k is TakeOrderedAndProject (no global sort);
  *   - AQE coalesces post-shuffle partitions and handles skew at runtime.
  *
  * Money sums go through DECIMAL(18,4) ([[Relational.sumExact]]) so results
  * are exact and shuffle-order-independent across engines.
  */
object Analytics {

  private def rev = col("l_extendedprice").cast("decimal(18,4)") *
    (lit(1) - col("l_discount").cast("decimal(18,4)"))

  /** TPC-H Q3-style shipping priority: top-10 unshipped orders by revenue
    * for one market segment. */
  def shippingPriority(s: SparkSession, d: String,
                       segment: String = "BUILDING",
                       cutoff: String = "1998-03-15"): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === segment)
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit(cutoff))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit(cutoff))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier volume: revenue per nation within one
    * region and date window, where supplier and customer share the nation. */
  def localSupplierVolume(s: SparkSession, d: String,
                          region: String = "ASIA",
                          from: String = "1996-01-01",
                          until: String = "1998-01-01"): DataFrame = {
    val reg = Tables.region(s, d).filter(col("r_name") === region)
    val nat = Tables.nation(s, d)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
    val sup = Tables.supplier(s, d)
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q10-style returned-item report: top-k customers by revenue
    * lost to returns in one quarter. Plan shape: the date filter pushes
    * into the orders scan and the returnflag filter into the lineitem
    * scan BEFORE the fact-fact join; customer and nation are broadcast
    * dims; decimal-exact revenue; TakeOrderedAndProject for the top-k. */
  def returnedItemReport(s: SparkSession, d: String,
                         from: String = "1996-01-01",
                         until: String = "1996-04-01",
                         k: Int = 20): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** Revenue per part brand, top-k — part is a dimension that scales with
    * sf, so join strategy is left to AQE/threshold (BHJ while it fits). */
  def topBrandsByRevenue(s: SparkSession, d: String, k: Int = 5): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("p_brand").asc)
      .limit(k)

  /** Order-priority count histogram in a date window (TPC-H Q4 flavor,
    * EXISTS rewritten as a left-semi join — no row duplication, and the
    * semi-join short-circuits on first match). */
  def orderPriorityCount(s: SparkSession, d: String,
                         from: String = "1996-01-01",
                         until: String = "1996-07-01"): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
    // no distinct() on the probe side: the semi join dedups by construction,
    // and a pre-distinct would be a second full shuffle of the fact table
    val late = Tables.lineitem(s, d).select("l_orderkey")
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Customer yearly spend roll-up over the orders fact table — exact
    * decimal sums with map-side partial aggregation; the single shuffle is
    * on the composite (customer, year) grouping key. */
  def customerYearlySpend(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("order_year"))
      .agg(Relational.sumExact(col("o_totalprice")).as("spend"),
        count(lit(1)).as("n_orders"))

  /** TPC-H Q14-style promotion effect: the revenue share of PROMO-type
    * parts in one ship-month, as a single percentage. The date filter
    * pushes into the lineitem scan; part (sf-scaling) joins with NO hint —
    * AQE picks BHJ while it fits; both conditional sums are decimal-exact
    * partial aggregates feeding ONE 1-row reduction. */
  def promoRevenue(s: SparkSession, d: String,
                   from: String = "1996-03-01",
                   until: String = "1996-04-01"): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
    li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"), rev)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double"), 6).as("promo_revenue_pct"))
  }

  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * exceeds a threshold, with their customer. Plan shape: the HAVING
    * pre-aggregates lineitem on its natural key BEFORE any join — the
    * survivor set (large orders) is tiny, so the orders/customer joins run
    * over a filtered fact, and AQE sizes them at runtime. Top-k is
    * TakeOrderedAndProject. */
  def largeOrders(s: SparkSession, d: String, minQty: Double = 300.0,
                  k: Int = 20): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
        .as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q6-style forecasting revenue change: the revenue a given
    * discount band would have added in one ship-year. ZERO joins and ZERO
    * group keys — all three filters push into the parquet scan
    * (`PushedFilters`), the decimal product partially aggregates map-side,
    * and one row crosses the wire: the cheapest possible 100 TB shape. */
  def revenueChange(s: SparkSession, d: String, yearFrom: String = "1996-01-01",
                    yearUntil: String = "1997-01-01", discLo: Double = 0.05,
                    discHi: Double = 0.07, maxQty: Double = 24.0): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(yearFrom) &&
        col("l_shipdate") < lit(yearUntil) &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < maxQty)
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
        col("l_discount").cast("decimal(18,4)")).cast("double")
        .as("revenue_change"))

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly N orders (N = 0 included — the LEFT join is
    * the point of Q13). Two shuffles, both shrinking: the c_custkey
    * left-join+count (map-side partial counts on the orders side), then a
    * rollup whose key space is the distinct order-count range (~tens of
    * rows). Customer is the probe side — never broadcast (it scales). */
  def customerOrderDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15-style top supplier(s): the supplier(s) whose quarterly
    * revenue equals the maximum — ties INCLUDED, as in the spec (no
    * LIMIT-1 shortcut). The revenue table aggregates lineitem once on
    * s_suppkey; the max is ONE row broadcast back (a scalar-subquery
    * analog), and supplier joins on the tiny winner set. */
  def topSupplier(s: SparkSession, d: String,
                  from: String = "1996-01-01",
                  until: String = "1996-04-01"): DataFrame = {
    val supRev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).cast("double").as("total_revenue"))
    val top = supRev.agg(max(col("total_revenue")).as("mx"))
    supRev.join(broadcast(top), col("total_revenue") === col("mx"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q22-style lapsed high-balance customers: customers whose
    * balance exceeds the positive-balance average and who placed NO order
    * on/after `lapsedSince`, rolled up by nation (the fixtures carry no
    * phone country code, and every fixture customer has ordered at least
    * once, so "never ordered" would be vacuous — "gone quiet since a
    * cutoff" is the same plan shape and the more realistic churn
    * question). The average is ONE broadcast row; the lapse test is a
    * LEFT ANTI join against the date-filtered orders key projection (the
    * date filter pushes into the orders scan) — no row duplication, no
    * distinct pass; decimal-exact balance sums. */
  def lapsedHighBalance(s: SparkSession, d: String,
                        lapsedSince: String = "1999-01-01"): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(lapsedSince))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,4)")).cast("double")
          .as("totacctbal"))
  }

  /** TPC-H Q12-flavored shipping-lag report (the fixtures carry no
    * l_shipmode/commitdate, so the two-class split is late-vs-on-time by
    * ship lag): per order priority, how many lineitems shipped more than
    * `lateDays` after the order date. One orders⋈lineitem shuffle join on
    * the natural key (both sides projected to 2-3 columns at the scan),
    * conditional counts partially aggregated map-side, priority-sized
    * result. */
  def shipLagByPriority(s: SparkSession, d: String,
                        lateDays: Int = 90): DataFrame =
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(datediff(col("l_shipdate"), col("o_orderdate")) > lateDays,
          1L).otherwise(0L)).as("late_lines"),
        sum(when(datediff(col("l_shipdate"), col("o_orderdate")) > lateDays,
          0L).otherwise(1L)).as("ontime_lines"))
}
