package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
    // fact side projected + spread (scan-parallelism floor, no-op at
    // scale): the broadcast-join probe and decimal partial agg otherwise
    // run inside the single-row-group fixture's one-task scan stage
    Dedup.spreadByKey(
        Tables.lineitem(s, d).select(col("l_partkey"), col("l_extendedprice"),
          col("l_discount")), "l_partkey")
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

  /** TPC-H Q7-style volume shipping: bilateral trade revenue between two
    * nations by ship-year. The nation filter is applied to the 2-row
    * nation slice FIRST and pushed through supplier/customer BEFORE either
    * touches a fact table — the fact joins then carry only the ~2/25 of
    * suppliers/customers that can possibly qualify. nation is a
    * schema-constant 25 rows (broadcast safe at any sf); supplier/customer
    * scale, so their joins carry no hint (AQE sizes them). The pair
    * disjunction runs post-join on two tiny dimension columns. */
  def nationVolume(s: SparkSession, d: String,
                   nationA: String = "NATION_3", nationB: String = "NATION_7",
                   from: String = "1996-01-01",
                   until: String = "1998-01-01"): DataFrame = {
    val n = Tables.nation(s, d)
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8-style national market share: of all revenue a region's
    * customers spent on one part type, the fraction supplied by one
    * nation, per order-year. The region's nation set (≤25 rows) broadcasts
    * into customer; the part-type filter shrinks part before the fact
    * join; both conditional sums are decimal partial aggregates feeding a
    * year-sized reduction. The share divides two exact decimal sums as
    * doubles, rounded to 6dp — shuffle-order-independent. */
  def marketShare(s: SparkSession, d: String,
                  nation: String = "NATION_2", region: String = "ASIA",
                  ptype: String = "ECONOMY",
                  from: String = "1996-01-01",
                  until: String = "1998-01-01"): DataFrame = {
    val regionNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select(
        col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === ptype)
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(from) &&
            col("o_orderdate") < lit(until))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === nation, rev)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(rev).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue that
    * would be lost by refusing orders below 20% of a part's mean order
    * quantity, for one brand+type. The correlated scalar subquery becomes
    * a per-part aggregate JOINED BACK on the part key: the brand/type
    * filter shrinks both sides to ~1/150 of parts before any shuffle, the
    * per-part mean is decimal-exact, and the filtered lineitem slice is
    * aggregated once on l_partkey and reused for both the cutoff and the
    * final sum (no second corpus scan). */
  def smallQtyRevenue(s: SparkSession, d: String,
                      brand: String = "Brand#11", ptype: String = "SMALL",
                      factor: Double = 0.2): DataFrame = {
    val pk = Tables.part(s, d)
      .filter(col("p_brand") === brand && col("p_type") === ptype)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(pk, col("l_partkey") === col("p_partkey"))
    val cutoff = li.groupBy(col("l_partkey").as("cut_partkey"))
      .agg((lit(factor) *
        (Relational.sumExact(col("l_quantity")) / count(lit(1))))
        .as("qty_cut"))
    li.join(cutoff, col("l_partkey") === col("cut_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg((Relational.sumExact(col("l_extendedprice")) / lit(7.0))
        .as("avg_yearly"))
  }

  /** TPC-H Q19-style discounted revenue over a three-branch disjunctive
    * brand/size/quantity predicate. The predicate spans both tables, so no
    * single branch pushes into a scan — but the brand disjunction's
    * part-side implicant (`p_brand IN (...)`) shrinks the build side, and
    * the join stays a plain equi-join on l_partkey with the residual
    * disjunction evaluated post-join in codegen. */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val branch1 = col("p_brand") === "Brand#12" &&
      col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
    val branch2 = col("p_brand") === "Brand#21" &&
      col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
    val branch3 = col("p_brand") === "Brand#5" &&
      col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .join(Tables.part(s, d)
          .filter(col("p_brand").isin("Brand#12", "Brand#21", "Brand#5"))
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(rev).cast("double").as("revenue"))
  }

  /** Revenue by nation × order-year with ROLLUP subtotals (per-nation
    * totals + grand total) — the standard drill-down report head. Scale
    * shape: `rollup` plans an Expand that MULTIPLIES input rows by the
    * grouping-set count, so it must never run over the fact table; here
    * the fact is first aggregated once to (nation, year) DECIMAL cells —
    * one orders-sized shuffle — and the rollup expands only the ~25×7
    * cell table. Decimal sums re-aggregate exactly, so the subtotal rows
    * equal a direct rollup of the base table in any engine. */
  def revenueRollup(s: SparkSession, d: String): DataFrame = {
    val custNation = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val cells = Tables.orders(s, d)
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev_dec"))
    cells.rollup(col("n_name"), col("o_year"))
      .agg(sum(col("rev_dec")).cast("double").as("revenue"))
      .select(col("n_name"), col("o_year"), col("revenue"))
  }

  /** TPC-H Q21-style waiting suppliers (adapted: the fixtures carry no
    * commit/receipt dates, so "kept the order waiting" is the returns
    * flag — the sole supplier whose lines came back 'R' in a
    * multi-supplier finalized order). The classic form is THREE lineitem
    * self-joins (join + EXISTS + NOT EXISTS); here all three collapse
    * into ONE aggregate over the order key — per order: the distinct
    * supplier count (EXISTS), the set of 'R' suppliers (NOT EXISTS ⇔ set
    * size 1), and the 'R' line count (the contribution) — then one
    * shrinking rollup per supplier. One fact shuffle instead of three. */
  def waitingSuppliers(s: SparkSession, d: String, k: Int = 20): DataFrame =
    waitingSuppliersFrom(Tables.lineitem(s, d), Tables.orders(s, d),
      Tables.supplier(s, d), k)

  /** [[waitingSuppliers]] over explicit frames — the property-testable
    * core (GraftProperties pits it against a literal three-join form on
    * random histories). */
  def waitingSuppliersFrom(lineitem: DataFrame, orders: DataFrame,
                           supplier: DataFrame, k: Int): DataFrame = {
    val li = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(
        size(collect_set(col("l_suppkey"))).as("n_supp"),
        collect_set(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("r_supps"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r_rows"))
      .filter(col("n_supp") > 1 && size(col("r_supps")) === 1)
      .select(element_at(col("r_supps"), 1).as("suppkey"), col("r_rows"))
    perOrder.groupBy(col("suppkey"))
      .agg(sum(col("r_rows")).as("nw"))
      .join(supplier, col("suppkey") === col("s_suppkey"))
      // the oracle groups by NAME; re-roll the (tiny) per-supplier survivor
      // set on s_name so a duplicate name can never diverge from it
      .groupBy(col("s_name"))
      .agg(sum(col("nw")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(k)
  }

  // --------------------------------------------------------------------- //
  // The five remaining TPC-H patterns (Q2/Q9/Q11/Q16/Q20), adapted to the
  // fixture schema: the fixtures carry no `partsupp` table, so the
  // part↔supplier relation comes from `lineitem`'s (l_partkey, l_suppkey)
  // pairs and ps_supplycost/ps_availqty become unit-price/shipped-quantity
  // analogs. The PLAN shapes — correlated min join-back, global-share
  // HAVING against a 1-row aggregate, anti-join exclusion, semi-join
  // chains — are the original queries' shapes, which is what matters for
  // the 100 TB design audit.
  // --------------------------------------------------------------------- //

  /** TPC-H Q2-style min-cost supplier: for each part of one size+type,
    * the region's supplier(s) offering the lowest unit price. The
    * correlated `= (SELECT min ...)` becomes a per-part aggregate joined
    * back on the part key (map-side partial min — no window sort). The
    * unit price is a PER-ROW double division, identical IEEE arithmetic in
    * Spark and DuckDB, so the min-selection equality join is exact — no
    * accumulation, no tolerance needed. Part/supplier shrink by their
    * filters before any fact shuffle; only nation/region broadcast. */
  def minCostSupplier(s: SparkSession, d: String, maxSize: Int = 25,
                      ptype: String = "SMALL", region: String = "EUROPE",
                      k: Int = 100): DataFrame = {
    val regionNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_size") <= maxSize && col("p_type") === ptype)
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val minCost = offers.groupBy(col("p_partkey").as("mc_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    offers
      .join(minCost, col("p_partkey") === col("mc_partkey") &&
        col("unit_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), round(col("unit_cost"), 6).as("unit_cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(k)
  }

  /** TPC-H Q9-style product-line profit by supplier nation and order year
    * (profit = shipped revenue, the fixture's supplycost-free analog).
    * The part-name keyword filter shrinks the part side before the fact
    * join; nation broadcasts; the one fact shuffle is the final
    * (nation, year) aggregation with decimal partials. */
  def profitByNationYear(s: SparkSession, d: String,
                         kw: String = "widget"): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").contains(kw))
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(rev).cast("double").as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)

  /** TPC-H Q11-style important parts: parts whose shipped value from one
    * nation's suppliers exceeds a fraction of that nation's total. The
    * global total is a 1-row decimal aggregate cross-joined (broadcast by
    * construction); the share comparison stays in EXACT decimals on both
    * sides — a double boundary can't flip membership vs the oracle. */
  def importantParts(s: SparkSession, d: String,
                     nation: String = "NATION_5",
                     frac: Double = 0.001): DataFrame = {
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === nation)
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val slice = Tables.lineitem(s, d)
      .join(supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
    val perPart = slice.groupBy(col("l_partkey"))
      .agg(sum(rev).as("value_dec"))
    val total = slice.agg(sum(rev).as("total_dec"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_dec") >
        col("total_dec") * lit(frac).cast(DecimalType(10, 6)))
      .select(col("l_partkey"),
        col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  /** TPC-H Q16-style part-supplier relationship census: distinct supplier
    * count per (brand, type, size) descriptor, excluding one brand and
    * excluding negative-balance suppliers (the fixture's "complaints"
    * analog — Q16's NOT IN becomes a broadcast-able anti join on the
    * small excluded-supplier set). The distinct pairs come from lineitem;
    * countDistinct's partial dedup keeps the shuffle at pair granularity,
    * never row granularity. */
  def partSupplierCounts(s: SparkSession, d: String,
                         excludeBrand: String = "Brand#1",
                         maxSize: Int = 20): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, d)
          .filter(col("p_brand") =!= excludeBrand &&
            col("p_size") <= maxSize)
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)

  /** TPC-H Q20-style dominant shippers: suppliers who shipped more than
    * `frac` of some keyword-part's total volume in a year window (the
    * availqty > ½·shipped analog), restricted to one nation. Two
    * aggregates over the SAME filtered slice — per (part, supplier) and
    * per part — then an exact-decimal share comparison, a distinct
    * supplier set, and a semi-join into the supplier dim. Exactly Q20's
    * nested-IN chain, as shrinking joins. */
  def excessShippers(s: SparkSession, d: String, kw: String = "small",
                     nation: String = "NATION_3", frac: Double = 0.3,
                     from: String = "1996-01-01",
                     until: String = "1997-01-01"): DataFrame = {
    val slice = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .join(Tables.part(s, d).filter(col("p_name").startsWith(kw))
          .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast(DecimalType(18, 4)).as("qty"))
    val perPair = slice.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("pair_qty"))
    val perPart = slice.groupBy(col("l_partkey").as("pp_partkey"))
      .agg(sum(col("qty")).as("part_qty"))
    val dominant = perPair
      .join(perPart, col("l_partkey") === col("pp_partkey"))
      .filter(col("pair_qty") >
        col("part_qty") * lit(frac).cast(DecimalType(10, 6)))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === nation)
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name").asc)
  }

  /** Seasonal-naive forecast scorecard: hourly event counts on a held-out
    * day forecast by the hour-of-day mean over all prior days, with the
    * absolute percentage error per hour — the baseline every ops
    * dashboard needs before anything fancier ("is current traffic
    * abnormal FOR THIS HOUR?"; the forecast twin of the z-score panel).
    * One (date, hour) aggregation of the fact stream is the only
    * fact-sized shuffle; the 24-row model and 24-row test day join at the
    * end. The hourly mean averages OBSERVED (date, hour) cells — a
    * decimal-exact sum of BIGINT counts over the cell count, so the 6dp
    * value is partition-order-exact and DuckDB-identical. */
  def seasonalForecast(s: SparkSession, d: String,
                       testDate: String = "2024-01-30"): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val model = hourly.filter(col("day") < lit(testDate))
      .groupBy(col("h").as("mh"))
      .agg(round(sum(col("n").cast(DecimalType(18, 0))).cast("double") /
        count(lit(1)), 6).as("forecast"))
    hourly.filter(col("day") === lit(testDate))
      .select(col("h"), col("n").as("actual"))
      .join(model, col("h") === col("mh"))
      .select(col("h"), col("actual"), col("forecast"),
        round(abs(col("actual") - col("forecast")) / col("actual"), 6)
          .as("ape"))
      .orderBy(col("h"))
  }
}
