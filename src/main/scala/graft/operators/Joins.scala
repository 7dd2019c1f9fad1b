package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Equi-join queries over the driver's star schema — the "real joins" layer
  * the reference lacks (SURVEY.md §2.3: the FTL table is denormalized, so
  * joins only appear in the engine build). Shapes follow the classic TPC-H
  * patterns since the testdata is TPC-H-ish.
  *
  * Scale design notes (the part that matters at 100 TB):
  *   - dimension tables (region 5 rows, nation 25) are ALWAYS broadcast —
  *     `broadcast()` hints pin it rather than trusting the 10 MB autoBroadcast
  *     threshold at cluster configs we don't control;
  *   - customer/orders/lineitem joins are shuffle joins on the key; we do NOT
  *     hint those — AQE picks SMJ vs shuffled-hash from runtime sizes, and at
  *     100 TB a forced broadcast would OOM the executors;
  *   - filters are applied BEFORE joins so Catalyst pushes them into the
  *     parquet scan (PushedFilters) and the join inputs shrink first;
  *   - aggregations sit on top of the join keys where possible so the shuffle
  *     for the join is reused by the aggregate (same hash partitioning).
  */
object Joins {

  /** TPC-H Q1 shape: pricing summary over lineitem alone — the canonical
    * map-side-combined aggregate; no join, included as the bench anchor. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // rounded on BOTH sides (here and in the oracle SQL): double
        // summation is order-dependent, and a distributed sum will not
        // bit-match a sequential one (SURVEY.md §7.3-1)
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: top unshipped orders by revenue for one market
    * segment. customer⋈orders⋈lineitem with pre-join filters; the
    * (filtered) customer side is small → broadcast into orders, then one
    * shuffle join with lineitem on orderkey. */
  def shippingPriority(s: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey")).limit(n)
  }

  /** TPC-H Q5 shape: revenue per nation for one region and date window —
    * the 5-way join chain. region and nation broadcast (tiny, always);
    * customer⋈orders⋈lineitem shuffle on their keys. */
  def regionRevenue(s: SparkSession, dir: String, region: String = "ASIA"): DataFrame = {
    val nat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** TPC-H Q10 shape: revenue lost to returned items per customer, top n.
    * orders⋈lineitem(R-flagged) shuffle join; nation broadcast. */
  def returnedRevenue(s: SparkSession, dir: String, n: Int = 20): DataFrame = {
    // pre-aggregate revenue per ORDER before touching orders: the fact
    // rows collapse map-side-combined to ≤|orders| partials, and the
    // aggregate's exchange on l_orderkey doubles as the join's required
    // partitioning (no extra shuffle) — the orders join then carries one
    // row per returned order instead of one per returned line item
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("order_rev"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("order_rev")), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey")).limit(n)
  }

  /** TPC-H Q18 shape: large-quantity orders — HAVING over a grouped join
    * feeding a second join. The HAVING-filtered key set is small →
    * broadcast back against orders/customer. */
  def largeOrders(s: SparkSession, dir: String, minQty: Double = 250.0): DataFrame = {
    val big = Tables.lineitem(s, dir).groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(s, dir)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("total_qty"), asc("o_orderkey"))
  }

  /** TPC-H Q12 shape: conditional aggregation over a join — per priority
    * class, high/low line counts. One shuffle join + one tiny aggregate. */
  def shipmodePriority(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "N")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_cnt"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_cnt"))
      .orderBy("l_linestatus")

  /** Full-outer join: per-date order counts vs per-date lineitem ship
    * counts — dates present on either side survive with zero-filled
    * gaps. Exercises the outer-join null-handling path. */
  def orderVsShipCalendar(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir).groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val shp = Tables.lineitem(s, dir).groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(count(lit(1)).as("n_ships"))
    ord.join(shp, Seq("d"), "full_outer")
      .select(col("d"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"))
      .orderBy("d")
  }

  /** Top-n per group over a join: each customer's 3 highest-value orders —
    * the rank-window-after-join pattern; the window is partitioned by
    * customer so it parallelizes. */
  def topOrdersPerCustomer(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
      .select(col("c_custkey"), col("c_name"), col("rnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_custkey", "rnk")
  }

  /** Left-semi: customers having at least one urgent order, counted per
    * market segment. The semi-join keeps only the probe side — no row
    * explosion, and the urgent-orders key set is deduped inside the join. */
  def urgentCustomers(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q13 shape: customer order-count distribution. Left outer join
    * keeps zero-order customers (count(o_orderkey) = 0 for them — count
    * of a NULL column, not count(*)); two stacked aggregates. At scale
    * (both sides large) the join is SMJ on custkey and the first groupBy
    * reuses its partitioning, exchange-free; at small SF AQE broadcasts
    * customer and the groupBy shuffles once — both plans are the right
    * one for their input sizes. The second aggregate reduces to
    * |distinct order counts| rows. */
  def customerOrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(s, dir).select("c_custkey")
      .join(Tables.orders(s, dir).select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
    counts.groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q14 shape: promotion revenue share in one shipping quarter.
    * lineitem filtered FIRST (pushes the date range into the scan), then
    * a broadcast join with part, then a one-row conditional-sum ratio —
    * at any scale: one scan, one broadcast, no shuffle at all (the final
    * agg is a single global reduce). */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(
        lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          / sum(rev), 6).as("promo_revenue_pct"))
  }

  /** TPC-H Q15 shape: top supplier(s) by one quarter's revenue. The
    * per-supplier aggregate shuffles once on suppkey; the max is a
    * window over that already-small relation (never a second scan), and
    * ALL suppliers achieving the max are kept — Q15's tie semantics. */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val w = Window.partitionBy()
    revenue.withColumn("max_rev", max("total_revenue").over(w))
      .filter(col("total_revenue") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Left-anti: customers with no open ('P') orders, per market segment —
    * the NOT EXISTS pattern as one anti-join instead of a subquery scan. */
  def noOpenOrderCustomers(s: SparkSession, dir: String): DataFrame = {
    val open = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "P").select("o_custkey")
    Tables.customer(s, dir)
      .join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q4 shape: order counts per priority where EXISTS a qualifying
    * lineitem (returned, standing in for the reference's late-delivery
    * predicate — this testdata has no commit/receipt dates). The EXISTS
    * is a left-semi join: the orders side never duplicates however many
    * 'R' lines an order has, and the lineitem side carries only the join
    * key through the shuffle. */
  def priorityReturns(s: SparkSession, dir: String): DataFrame = {
    val ret = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-07-01"))
      .join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q7 shape: bilateral trade volume — revenue between one pair
    * of (supplier nation, customer nation), both directions, by year.
    * Two independent nation lookups (aliased dims) hang off supplier and
    * customer. The disjunctive nation-PAIR predicate can only be applied
    * after both lookups, but its two-nation IMPLICATION — each side's
    * nation ∈ {A, B} — pushes all the way down: both dim chains start
    * from the 2-row filtered nation table, so only ~2/|nations| of
    * customers and suppliers survive their lookups, the supplier
    * broadcast prunes lineitem map-side, and the one big shuffle
    * (lineitem⋈orders) moves the pruned sliver of both facts instead of
    * their entirety (the h08 "filters travel down the bigger side" rule;
    * this is the standard Q7 plan). The residual pair filter above the
    * joins then only removes same-nation (A,A)/(B,B) rows. */
  def nationVolume(s: SparkSession, dir: String,
                   nationA: String = "NATION_3", nationB: String = "NATION_8"): DataFrame = {
    val nat2 = Tables.nation(s, dir)
      .filter(col("n_name").isin(nationA, nationB))
    val supN = Tables.supplier(s, dir)
      .join(broadcast(nat2), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = Tables.customer(s, dir)
      .join(broadcast(nat2), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      .join(custN, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "cust_nation")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
              (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q17 shape: revenue from small-quantity lines of one brand's
    * parts, where "small" is a PER-PART correlated threshold (half that
    * part's average quantity). The correlated scalar subquery becomes a
    * self-aggregate + equi-join on partkey: the brand's part keys
    * broadcast into both branches so the per-part average is computed
    * over only the brand's lines (not all parts), and the avg⋈lines join
    * shuffles both sides on l_partkey — co-partitioned, AQE-sized.
    * l_quantity is integer-valued, so avg = exact integer sum / count on
    * every engine — the threshold compare cannot flap (SURVEY.md §7.3-1). */
  def smallQtyRevenue(s: SparkSession, dir: String, brand: String = "Brand#3"): DataFrame = {
    val pk = Tables.part(s, dir).filter(col("p_brand") === brand).select("p_partkey")
    val brandLines = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
    val halfAvg = brandLines.groupBy("l_partkey")
      .agg((avg("l_quantity") * 0.5).as("half_avg"))
    brandLines.join(halfAvg, Seq("l_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(round(sum("l_extendedprice") / 7.0, 4).as("avg_yearly"))
  }

  /** TPC-H Q19 shape: revenue under an OR of (brand, size-range,
    * quantity-range) conjunctions. The join condition mixes the equi key
    * with the disjunction; Catalyst extracts l_partkey = p_partkey into
    * a BroadcastHashJoin and leaves the disjunction as the join residual
    * — one lineitem scan, no shuffle, and each conjunct's part-side
    * predicates still prune the broadcast build side. */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    val cond = col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40)))
    li.join(broadcast(p), cond)
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
  }

  /** TPC-H Q21 shape: suppliers who were the SOLE returner in
    * multi-supplier finished orders — "EXISTS another supplier AND NOT
    * EXISTS another returner" restated as PER-ORDER COUNTS: an order
    * counts for supplier s iff its distinct-returner set is exactly
    * {s} and it has ≥ 2 distinct suppliers. The r14 semi+anti form
    * scanned lineitem THREE times (probe + both build sides) and paid
    * three lineitem-scale exchanges + sorts into two SortMergeJoins;
    * this form is ONE scan and one lineitem-sliver exchange into a
    * (order, supplier) aggregate (map-side partials collapse duplicate
    * return lines), then per-order counts over the already-aggregated
    * pairs. Row-for-row equal to the join form: a `sole` row (o, s)
    * existed iff returners(o) = {s} (anti leg) and |suppliers(o)| ≥ 2
    * (semi leg: some x ≠ s supplies o), and its countDistinct(orderkey)
    * is this form's one-row-per-qualifying-order count; `max(when(ret))`
    * of a singleton returner set IS that returner. Oracle hash-identical
    * (r15). */
  def soleReturnedSupplier(s: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val fOrders = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val lf = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_returnflag")
      .join(fOrders, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
    val perSupp = lf.groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("ret"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(sum("ret").as("n_ret"), count(lit(1)).as("n_supp"),
        max(when(col("ret") === 1, col("l_suppkey"))).as("sole_supp"))
    perOrder.filter(col("n_ret") === 1 && col("n_supp") >= 2)
      .groupBy(col("sole_supp").as("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_name")).limit(n)
  }

  /** TPC-H Q22 shape: idle rich customers — balance above the global
    * positive-balance average (scalar aggregate, broadcast as a 1-row
    * frame into a theta join: no collect, stays one lazy plan) and no
    * open orders (anti join), rolled up per nation. */
  def idleRichCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey", "c_acctbal")
    val threshold = cust.filter(col("c_acctbal") > 0).agg(avg("c_acctbal").as("avg_bal"))
    val open = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "P").select("o_custkey")
    cust.join(broadcast(threshold), col("c_acctbal") > col("avg_bal"))
      .join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q2 shape: min-cost supplier per part. This schema has no
    * partsupp, so lineitem plays the part↔supplier price list: cost =
    * min(l_extendedprice) per (part, supplier). For the filtered parts
    * (one size+type sliver) and one region's suppliers, keep the
    * supplier(s) achieving each part's regional minimum — the correlated
    * MIN subquery as a window over the grouped relation.
    *
    * Scale shape: part-filter and supplier-filter both broadcast into
    * the ONE lineitem scan (the fact table is touched once, with both
    * prunes applied); the (part, supp) aggregate shuffles on a composite
    * key, and the per-part min is a window partitioned by partkey over
    * that already-reduced relation — never a second scan or self-join of
    * the fact table. Q2's ORDER BY (acctbal DESC) with deterministic
    * key tie-breaks. */
  def minCostSupplier(s: SparkSession, dir: String, region: String = "EUROPE",
                      size: Int = 15, ptype: String = "STANDARD", n: Int = 20): DataFrame = {
    val pk = Tables.part(s, dir)
      .filter(col("p_size") === size && col("p_type") === ptype)
      .select("p_partkey")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val cost = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("l_extendedprice").as("supply_cost"))
    val w = Window.partitionBy("l_partkey")
    cost.withColumn("min_cost", min("supply_cost").over(w))
      .filter(col("supply_cost") === col("min_cost"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), round(col("supply_cost"), 2).as("supply_cost"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
      .limit(n)
  }

  /** TPC-H Q6 shape: the forecasting-revenue-change scan — one filter,
    * one global sum, zero joins and zero shuffles beyond the final
    * single-row reduce. Matters at scale precisely because of what is
    * NOT in the plan: all three predicates reach the parquet scan as
    * PushedFilters (min/max row-group pruning on shipdate), and the
    * aggregate is a map-side partial + 1-row final. */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"))

  /** TPC-H Q8 shape: national market share — of all revenue flowing to
    * one region's customers for one part type, the fraction supplied by
    * one nation, per year. The conditional-sum ratio form (no
    * self-join): every row carries its supplier nation, so share =
    * sum(when)/sum per year group. part (filtered) and the two dim
    * lookups broadcast; orders⋈lineitem is the single big shuffle. */
  def marketShare(s: SparkSession, dir: String, nation: String = "NATION_3",
                  region: String = "ASIA", ptype: String = "STANDARD"): DataFrame = {
    val pk = Tables.part(s, dir).filter(col("p_type") === ptype).select("p_partkey")
    val custR = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    // region semi-filter applied to ORDERS before the fact join: the
    // custkey shuffle then moves |orders| rows, not the joined
    // lineitem×orders relation — filters travel down the bigger side
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      .join(custR, col("o_custkey") === col("c_custkey"), "left_semi")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(when(col("supp_nation") === nation, rev).otherwise(lit(0.0)))
        / sum(rev), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape: product-line profit per (supplier nation, year).
    * No partsupp → profit omits supply cost: sum(extprice·(1−disc))
    * over parts whose name carries the product line. The LIKE-filtered
    * part keys broadcast into lineitem (the only fact-table prune
    * available for a mid-string pattern — no scan pushdown for '%x%'),
    * nation broadcast; one shuffle for orders (year) + one for the
    * final (nation, year) aggregate. */
  def productProfit(s: SparkSession, dir: String, namePart: String = "widget"): DataFrame = {
    val pk = Tables.part(s, dir)
      .filter(col("p_name").contains(namePart)).select("p_partkey")
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q11 shape: important parts — per-part shipped value for one
    * nation's suppliers, kept where the part's value exceeds a fraction
    * of the nation's total. The HAVING-over-global-aggregate is the h22
    * pattern again: the 1-row total broadcast into a theta join, never a
    * collect. The per-part aggregate and the total share one scan of the
    * nation-pruned lines via a cached-free diamond: Spark recomputes the
    * sliver twice, which at 100 TB is still cheaper than caching the
    * fact table — the nation prune (1/25) is applied at scan time on
    * both branches. */
  def importantParts(s: SparkSession, dir: String, nation: String = "NATION_5",
                     fraction: Double = 0.002): DataFrame = {
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val lines = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
    val perPart = lines.groupBy("l_partkey").agg(sum("l_extendedprice").as("value"))
    val total = lines.agg((sum("l_extendedprice") * fraction).as("threshold"))
    perPart.join(broadcast(total), col("value") > col("threshold"))
      .select(col("l_partkey").as("p_partkey"), round(col("value"), 2).as("value"))
      .orderBy(desc("value"), asc("p_partkey"))
  }

  /** TPC-H Q16 shape: supplier breadth per (brand, size) — how many
    * distinct suppliers ship each part class, excluding one brand and
    * excluding deadbeat suppliers (negative balance — the NOT IN
    * "complaints" analog, executed as a broadcast anti-join, NOT a
    * NOT-IN nested loop). The part↔supplier relationship comes from
    * lineitem (no partsupp); countDistinct dedups the many lines per
    * pair. The excluded-supplier set is dim-sized → broadcast anti; the
    * distinct-count aggregate is the one real shuffle. */
  def partsSupplierBreadth(s: SparkSession, dir: String, excludeBrand: String = "Brand#5",
                           maxSize: Int = 10): DataFrame = {
    val pf = Tables.part(s, dir)
      .filter(col("p_brand") =!= excludeBrand && col("p_size") <= maxSize)
      .select("p_partkey", "p_brand", "p_size")
    val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_size"))
  }

  /** TPC-H Q20 shape: suppliers with surplus stock of a promoted part
    * line — here: one nation's suppliers who shipped more than
    * `minQty` units of some 'red%' part in one year. The semi-join
    * CHAIN (nation → supplier ← qualifying shipments ← red parts) runs
    * innermost-out: red part keys broadcast into the lineitem scan, the
    * (supp, part) HAVING aggregate reduces to qualifying suppliers, and
    * the final supplier join is semi — each supplier emitted once no
    * matter how many parts qualified it. */
  def promoStockSuppliers(s: SparkSession, dir: String, nation: String = "NATION_3",
                          namePrefix: String = "red", minQty: Double = 40.0): DataFrame = {
    val pk = Tables.part(s, dir)
      .filter(col("p_name").startsWith(namePrefix)).select("p_partkey")
    val qualified = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > minQty)
      .select("l_suppkey")
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }
}
