package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Relational/OLAP query suite over the TPC-H-ish tables — engine
  * breadth beyond the reference's tick surface (SURVEY.md §2.3).
  *
  * Conventions (SURVEY.md §4): money sums go through DECIMAL(12,2)
  * casts (inputs are 2-dp doubles) so sums are exact and engine-
  * independent, then surface as doubles; integer aggregates cast to
  * long to match DuckDB's BIGINT.
  *
  * Scale posture: dimension tables broadcast (region/nation/customer at
  * TPC-H proportions); fact-fact joins shuffle on their join key only
  * after pushed-down filters; AQE handles skew at 100 TB.
  */
object Relational {
  private val dec = DecimalType(12, 2)
  private def d(c: String) = col(c).cast(dec)
  private val one = lit(1).cast(dec)

  /** TPC-H Q1-style pricing summary. */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    val disc = one - d("l_discount")
    val charge = d("l_extendedprice") * disc * (one + d("l_tax"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d("l_quantity")).cast("double").as("sum_qty"),
        sum(d("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(d("l_extendedprice") * disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(d("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(d("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(d("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-style shipping-priority revenue: 3-way join, customer side
    * broadcast after its segment filter.
    */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Star join through region→nation→customer→orders→lineitem (Q5-ish):
    * the dimension chain broadcasts, the fact join shuffles once.
    */
  def q5(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Semi-join: customers having at least one big order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Anti-join: customers who never placed a big order. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Scalar-subquery pattern: parts priced above the global average
    * (global aggregate broadcast back, no window-over-everything).
    */
  def aboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val avgPrice = p.agg(avg(col("p_retailprice")).as("global_avg"))
    p.crossJoin(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("global_avg"))
      .select(col("p_partkey"), col("p_retailprice"))
      .orderBy("p_partkey")
  }

  /** Exact distinct-count per group (tick surface: distinct users). */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type").as("symbol"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("symbol")

  /** TPC-H Q6-style forecasting revenue change: tight pushed-down
    * filter + single global sum, the canonical scan-bound query.
    */
  def q6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(sum(d("l_extendedprice") * d("l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q12-style priority split by line status: fact-fact join +
    * conditional aggregation.
    */
  def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_count"))
      .orderBy("l_linestatus")

  /** TPC-H Q14-style promo revenue share: broadcast part join +
    * conditional / total aggregate ratio.
    */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val rev = d("l_extendedprice") * (one - d("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(dec))).cast("double") /
        sum(rev).cast("double"), 6).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18-style large-volume customers: HAVING over a grouped
    * fact, then dimension joins.
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(d("l_quantity")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 150.0)
    bigOrders
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Window-function suite: rank/dense_rank/ntile/first_value per
    * symbol with a total order (price desc, event_id) so every engine
    * assigns identical rows to identical buckets.
    */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPrice = Window.partitionBy(col("symbol"))
      .orderBy(col("price").desc, col("event_id"))
    val byTime = Window.partitionBy(col("symbol"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.ticks(spark, dir)
      .select(col("event_id"), col("symbol"),
        rank().over(byPrice).cast("long").as("price_rank"),
        dense_rank().over(byPrice).cast("long").as("price_dense_rank"),
        ntile(4).over(byPrice).cast("long").as("price_quartile"),
        first(col("price")).over(byTime).as("first_price"))
      .orderBy("event_id")
  }

  /** Scalar string/date function suite — row-level breadth check. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("h"),
        upper(substring(col("event_type"), 1, 3)).as("sym3"),
        length(col("props")).cast("long").as("props_len"),
        concat_ws("|", col("event_type"), col("user_id")).as("tag"),
        (col("user_id") % 7L).as("user_mod"))
      .orderBy("event_id")

  /** Exact interpolated percentiles per symbol (matches DuckDB
    * quantile_cont). At 100 TB the approximate path is
    * `percentile_approx` / t-digest — exposed separately so the exact
    * variant stays oracle-checkable.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.ticks(spark, dir)
      .groupBy(col("symbol"))
      .agg(
        round(expr("percentile(price, 0.25)"), 4).as("p25"),
        round(expr("percentile(price, 0.5)"), 4).as("p50"),
        round(expr("percentile(price, 0.9)"), 4).as("p90"),
        round(expr("percentile(price, 0.99)"), 4).as("p99"))
      .orderBy("symbol")

  /** Rollup: per (symbol, day) + per symbol + grand total. Grouped-out
    * keys surface as 'ALL' sentinels so the output is null-free
    * (SURVEY.md §4).
    */
  def rollupDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.ticks(spark, dir)
      .rollup(col("symbol"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("volume")).as("volume"))
      .select(
        coalesce(col("symbol"), lit("ALL")).as("symbol_g"),
        coalesce(date_format(col("day"), "yyyy-MM-dd"), lit("ALL")).as("day_g"),
        col("n_ticks"), col("volume"))
      .orderBy("symbol_g", "day_g")

  /** Full cube over (symbol, day) — every grouping-set combination,
    * including the day-only marginals rollup cannot produce.
    */
  def cubeDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.ticks(spark, dir)
      .cube(col("symbol"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("volume")).as("volume"))
      .select(
        coalesce(col("symbol"), lit("ALL")).as("symbol_g"),
        coalesce(date_format(col("day"), "yyyy-MM-dd"), lit("ALL")).as("day_g"),
        col("n_ticks"), col("volume"))
      .orderBy("symbol_g", "day_g")

  /** Set operators over user cohorts: INTERSECT (clicked ∧ purchased)
    * and EXCEPT (clicked ∧ never errored), tagged and unioned. Spark
    * plans both as aggregate + semi/anti join — same single-shuffle
    * shape as the explicit joins.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.ticks(spark, dir)
    def users(sym: String) =
      t.filter(col("symbol") === sym).select(col("volume").as("user_id")).distinct()
    users("click").intersect(users("purchase"))
      .withColumn("set_op", lit("click_and_buy"))
      .union(users("click").except(users("error"))
        .withColumn("set_op", lit("click_no_error")))
      .orderBy("set_op", "user_id")
  }

  /** TPC-H Q4-shape: EXISTS subquery — orders in a window having at
    * least one returned line item, counted per priority. Plans as a
    * left-semi join (the fact side never duplicates), then a tiny
    * aggregation.
    */
  def q4(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q7-shape: volume shipped between two geography cohorts per
    * year — a 7-way join where every dimension chain
    * (nation→region, twice) broadcasts and the only shuffles are the
    * fact joins on orderkey, plus the symmetric disjunctive cohort
    * filter. Cohorts are REGIONS (5 nations each) so every scale
    * factor of the synthetic data populates both directions.
    */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    def geo(nk: String, rn: String) = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as(nk), col("r_name").as(rn))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(geo("s_nk", "supp_region")), col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_region"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(geo("c_nk", "cust_region")), col("c_nationkey") === col("c_nk"))
      .select(col("c_custkey"), col("cust_region"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
        (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_region", "cust_region", "l_year")
  }

  /** TPC-H Q10-shape: revenue lost to returned items per customer, top
    * 20 — fact join + group + TakeOrderedAndProject.
    */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q13-shape: customer order-count distribution — LEFT OUTER
    * join (customers with zero orders must appear), per-customer count,
    * then a histogram over the counts. Two aggregations, the second
    * over an already-tiny table.
    */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q19-shape: disjunction of conjunctive brand/size/quantity
    * ranges — the predicate-pushdown stress case (the shared
    * `l_partkey = p_partkey` equi-condition must still plan as a hash
    * join, with the OR-of-ANDs evaluated as a post-join filter, not a
    * nested loop).
    */
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      .agg(sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q2-shape: cheapest supplier per part (correlated min-per-
    * group, decorrelated as `min(struct(price, suppkey))` over the
    * part×supplier aggregate + broadcast join-back) — no per-part
    * subquery execution. The struct-min IS the window-rank-1 row
    * (lexicographic (avg_price, suppkey) min = ORDER BY avg_price,
    * suppkey LIMIT 1 per part) but aggregates with map-side partials
    * instead of shuffling and SORTING every (part, supplier) row — at
    * 100 TB the sort is the cost, and rank=1 prunes nothing until
    * after it.
    */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(d("l_extendedprice")).cast("double") /
        count(lit(1)).cast("double")).as("avg_price"))
    ps.groupBy(col("l_partkey"))
      .agg(min(struct(col("avg_price"), col("l_suppkey"))).as("best"))
      .select(col("l_partkey"), col("best.l_suppkey").as("l_suppkey"),
        col("best.avg_price").as("avg_price"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"), col("avg_price"))
      .orderBy("l_partkey")
      .limit(100)
  }

  /** TPC-H Q15-shape: the top supplier(s) by revenue — an aggregated
    * revenue view compared against its own MAX (scalar subquery over an
    * aggregate). Exact decimal sums make the double equality safe.
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double")
        .as("total_revenue"))
      // r19: the revenue view feeds BOTH its own MAX and the compare —
      // column pruning made the two consumers re-derive it from two
      // full lineitem scans (audit: lineitem×2). The view is
      // supplier-sized, so one localCheckpoint computes it once
      // (the bm25 counter-table precedent); the scalar-subquery shape
      // of the query is unchanged.
      .localCheckpoint()
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-shape: revenue from small-quantity orders — lineitems
    * below half their part's average quantity (correlated scalar
    * average, decorrelated as an aggregate + join-back).
    */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val avgQty = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg((sum(d("l_quantity")).cast("double") /
        count(lit(1)).cast("double")).as("avg_qty"))
    Tables.lineitem(spark, dir)
      .join(avgQty, "l_partkey")
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((sum(d("l_extendedprice")).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21-shape: combined EXISTS ∧ NOT-EXISTS correlation —
    * suppliers with at least one returned line item who never shipped
    * a top-band-priced item. One left-semi + one left-anti join, both
    * on the same fact key. (The synthetic data is uniformly dense per
    * supplier, so the NOT-EXISTS threshold sits inside the narrow
    * per-supplier max-price band to stay selective-but-nonempty at
    * every SF.)
    */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    Tables.supplier(spark, dir)
      .join(li.filter(col("l_returnflag") === "R"),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(li.filter(col("l_extendedprice") > 104700.0),
        col("s_suppkey") === col("l_suppkey"), "left_anti")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q22-shape: well-funded customers who never ordered — a
    * scalar-subquery threshold (average positive balance) plus an
    * anti join, aggregated per market segment.
    */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 450000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q8-shape: national market share — the revenue fraction one
    * supplier nation holds of a region's market for a part type, per
    * order year. Dimension chain (part, supplier→nation,
    * customer→nation→region) broadcasts; the lineitem↔orders fact join
    * is the one shuffle. The share division happens in double AFTER
    * exact decimal sums, rounded to 6 for engine parity.
    */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
    val suppNation = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custRegion = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val rev = d("l_extendedprice") * (one - d("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0).cast(dec)))
          .cast("double") /
        sum(rev).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-shape: product-line profit by supplier nation and year.
    * No partsupp table in this schema, so supply cost is proxied as
    * 90% of `p_retailprice` per unit — the plan shape (fact joined to
    * two broadcast dims, two-level group-by, profit = revenue − cost)
    * is Q9's. Revenue and cost are summed as exact decimals separately,
    * then combined in double with a fixed op order both engines mirror.
    */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), d("p_retailprice").as("p_cost"))
    val suppNation = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(d("l_extendedprice") * (one - d("l_discount"))).cast("double") -
        lit(0.9) * sum(col("p_cost") * d("l_quantity")).cast("double"))
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11-shape: important stock — parts whose inventory value
    * (proxied as the extended-price volume supplied by one nation's
    * suppliers; no partsupp table) exceeds a fixed fraction of that
    * nation's grand total. The grand total is a scalar aggregate
    * broadcast back over the per-part aggregate — no window over the
    * whole table.
    */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val suppIn = Tables.supplier(spark, dir)
      // NATION_8 has suppliers at every SF (the 10-supplier sf0.001
      // universe covers only 10 of the 25 nations)
      .join(Tables.nation(spark, dir).filter(col("n_name") === "NATION_8"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, dir)
      .join(broadcast(suppIn), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(d("l_extendedprice")).cast("double").as("value"))
    val total = perPart.agg(sum(col("value").cast(dec)).cast("double").as("total"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value") > lit(0.001) * col("total"))
      .select(col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q16-shape: supplier diversity per part attribute — distinct
    * suppliers per (brand, type, size) over the lineitem↔part join,
    * excluding a brand, a size band, and a NOT-IN supplier blocklist
    * (negative balance ≈ "complaints"; anti join against a broadcast
    * dim, never a per-row subquery).
    */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = Tables.supplier(spark, dir).filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("int").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q20-shape: suppliers with excess supply — EUROPE suppliers
    * who shipped, for some filtered part, more than 30% of that part's
    * total 1997 demand (nested aggregate threshold; availqty proxied by
    * the supplier's own shipped quantity, no partsupp table). Both
    * aggregates group the same filtered fact slice; the qualifying set
    * reaches `supplier` as a semi join.
    */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"), "left_semi")
    // ONE pass over the filtered fact: per-(supplier, part) all-time
    // quantity plus a conditional 1997 slice, then per-part 1997
    // demand as a window sum OVER the aggregate — a second tiny
    // shuffle of the aggregated table, never a second fact scan (a
    // separate groupBy+join re-derivation loses exchange reuse to
    // column pruning and scans lineitem twice; exact decimal sums
    // survive the two-level formulation). The `total_qty > 0` gate
    // keeps the original inner-join-on-demand semantics: parts with
    // no 1997 shipments qualify nobody.
    import org.apache.spark.sql.expressions.Window
    val suppPart = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(d("l_quantity")).cast("double").as("supp_qty"),
        sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
          d("l_quantity")).otherwise(lit(0).cast(dec)))
          .cast("double").as("supp_qty_97"))
    val qualifying = suppPart
      .withColumn("total_qty",
        sum(col("supp_qty_97").cast(dec))
          .over(Window.partitionBy("l_partkey")).cast("double"))
      .filter(col("total_qty") > 0.0 &&
        col("supp_qty") > lit(0.3) * col("total_qty"))
      .select(col("l_suppkey"))
    val euroSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
    euroSupp.join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** Conditional aggregation (pivot-style status counts per priority). */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        count(lit(1)).as("n"),
        sum(d("o_totalprice")).cast("double").as("total_price"))
      .orderBy("o_orderpriority")

  /** Distribution window functions: percent_rank / cume_dist / a
    * full-frame nth_value over a unique (price, key) order — the
    * ranking surface beyond rank/dense_rank/ntile in the base window
    * suite. The unique tie-break makes every rank deterministic; the
    * rank quotients are identical double ops on both engines.
    *
    * Scale shape (r10): `o_orderpriority` has ≤5 values, so a direct
    * `Window.partitionBy(priority)` would drain ~1/5 of ALL orders
    * through one sort task at 100 TB. Instead the global rank is built
    * on the count-band scaffold (the vocabCoverage/chunked-prefix
    * pattern): rows band by price range, rank WITHIN (priority, band)
    * — bounded partitions — and per-band counts roll into exclusive
    * prefix offsets on a tiny (|priorities|×|bands|)-row table whose
    * join back is unhinted (AQE broadcasts at test SF, degrades to a
    * shuffle join at 100 TB). rank = band offset + intra-band
    * row_number is exactly the single-sort rank; with the unique
    * (price, orderkey) order, percent_rank = (rank−1)/(n−1) and
    * cume_dist = rank/n — the same IEEE divisions of exact integers
    * both engines' built-ins evaluate. nth_value(3) over the full
    * frame is just the rank-3 row's price per priority, joined back.
    */
  def windowExtras(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(spark, dir).filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("band", floor(col("o_totalprice") / 100.0).cast("long"))
    val bandW = Window.partitionBy("o_orderpriority", "band")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked0 = base.withColumn("rn", row_number().over(bandW).cast("long"))
    // per-(priority, band) counts → exclusive running offsets + totals;
    // the windows here run over the tiny counts aggregate, not the fact
    val counts = base.groupBy(col("o_orderpriority"), col("band"))
      .agg(count(lit(1)).as("c"))
    val offW = Window.partitionBy("o_orderpriority").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum(col("c")).over(offW), lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("o_orderpriority")))
      .select(col("o_orderpriority").as("p"), col("band").as("b"),
        col("off"), col("n"))
    val withRank = ranked0.join(offsets,
        ranked0("o_orderpriority") === offsets("p") &&
          ranked0("band") === offsets("b"))
      .withColumn("rank", col("off") + col("rn"))
    val third = withRank.filter(col("rank") === 3L)
      .select(col("o_orderpriority").as("tp"),
        col("o_totalprice").as("tprice"))
    withRank.join(third, withRank("o_orderpriority") === third("tp"), "left")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(when(col("n") > 1L, (col("rank") - 1L).cast("double") /
          (col("n") - 1L).cast("double")).otherwise(0.0), 6).as("pr"),
        round(col("rank").cast("double") / col("n").cast("double"), 6).as("cd"),
        coalesce(col("tprice"), lit(-1.0)).as("third_price"))
      .orderBy("o_orderkey")
  }

  /** Explicit GROUPING SETS — the general form rollup/cube are sugar
    * for: (returnflag, linestatus), the linestatus marginal rollup
    * cannot produce, and the grand total, in ONE aggregation pass
    * (Spark plans a single Expand + partial/final aggregate — the fact
    * is scanned once, not once per set). The grouping level surfaces
    * via per-column `grouping()` flags, which both engines define.
    */
  def groupingSetsPricing(spark: SparkSession, dir: String): DataFrame = {
    // r19: partial-aggregate BEFORE the Expand (guide §2.3 "aggregate
    // before you shuffle"). GROUPING SETS replays its input once per
    // set — 3× here — so the old plan pushed every fact row through
    // the decimal casts and partial aggregate three times. Decimal
    // sums and counts are associative and exact, so aggregating to the
    // tiny (returnflag, linestatus) table first and running the SAME
    // grouping sets over it is value-identical (oracle hash unchanged)
    // while the Expand now multiplies |flag×status| rows, not the
    // fact table — the shape that survives 100 TB.
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("pn"),
        sum(d("l_quantity")).as("pqty"),
        sum(d("l_extendedprice")).as("pprice"))
    base.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("g_level"),
        sum(col("pn")).as("n"),
        sum(col("pqty")).cast("double").as("sum_qty"),
        sum(col("pprice")).cast("double").as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag_g"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus_g"),
        col("g_level"), col("n"), col("sum_qty"), col("sum_price"))
      .orderBy("g_level", "returnflag_g", "linestatus_g")
  }

  /** NEW r10: revenue concentration (Pareto report) — the share of
    * total order revenue carried by the top 1% / 10% of customers.
    * The global customer rank by revenue uses the count-band scaffold
    * (band = floor(rev/1000); band is MONOTONE in revenue, so
    * (band desc, rev desc, custkey) is exactly the (rev desc, custkey)
    * total order and the oracle's single ROW_NUMBER matches): ranks
    * come from bounded per-band windows plus a tiny prefix-offset
    * table — no global customer sort. Threshold indices are exact
    * integer ceilings ((n+99) div 100); shares are RAW quotients of
    * exact decimal sums (engine-exact ≤15 sig digits — the turnover
    * residual class).
    */
  def paretoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(sum(d("o_totalprice")).cast(dec).as("rev"))
    val banded = c.withColumn("band", floor(col("rev") / 1000).cast("long"))
    val bandW = Window.partitionBy("band")
      .orderBy(col("rev").desc, col("o_custkey"))
    val ranked0 = banded.withColumn("rn", row_number().over(bandW).cast("long"))
    val counts = banded.groupBy(col("band")).agg(count(lit(1)).as("c"))
    val offW = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum(col("c")).over(offW), lit(0L)))
      .select(col("band").as("b2"), col("off"))
    val ranked = ranked0.join(offsets, col("band") === col("b2"))
      .select(col("rev"), (col("off") + col("rn")).as("rk"))
    val tot = ranked.agg(count(lit(1)).as("n_customers"),
      sum(col("rev")).cast(DecimalType(38, 2)).as("total_rev"))
    val z = lit(0).cast(dec)
    ranked.crossJoin(broadcast(tot))
      .withColumn("k1", expr("(n_customers + 99) div 100"))
      .withColumn("k10", expr("(n_customers + 9) div 10"))
      .groupBy(col("n_customers"), col("total_rev"), col("k1"), col("k10"))
      .agg(
        sum(when(col("rk") <= col("k1"), col("rev")).otherwise(z))
          .cast(DecimalType(38, 2)).as("top1_rev"),
        sum(when(col("rk") <= col("k10"), col("rev")).otherwise(z))
          .cast(DecimalType(38, 2)).as("top10_rev"))
      .select(col("n_customers"),
        col("total_rev").cast("double").as("total_rev"),
        // ANSI ÷0 guard: an all-zero-revenue tape must yield NULL
        // shares, not a throw (DuckDB maps the same case to NULL)
        when(col("total_rev") =!= 0,
          col("top1_rev").cast("double") / col("total_rev").cast("double"))
          .as("top1pct_share"),
        when(col("total_rev") =!= 0,
          col("top10_rev").cast("double") / col("total_rev").cast("double"))
          .as("top10pct_share"))
  }

  /** NEW r10b: customer LTV cohort triangle — revenue per
    * (first-order month, months-since-first) cell, the lifetime-value
    * view every subscription/commerce dashboard carries. Month
    * arithmetic is exact integers (year·12+month); revenue is an
    * exact decimal sum over one double cast. The per-customer cohort
    * table joins back unhinted (AQE broadcasts at test SF, shuffles
    * at scale).
    */
  def ltvCohort(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      to_date(col("o_orderdate")).as("od"), d("o_totalprice").as("price"))
    // r19: cohort month as a window min over the one o_custkey
    // partitioning instead of a separate per-customer aggregate joined
    // back — the two consumers pruned different columns, so the old
    // plan scanned orders TWICE and paid the join's second exchange.
    // min-over-partition is exact (same rows, same min); customers are
    // high-cardinality, so the window task sizing is per-customer
    // order counts — fine at scale.
    o.withColumn("cohort_month",
        trunc(min(col("od")).over(Window.partitionBy("o_custkey")), "month"))
      .withColumn("month_offset",
        ((year(col("od")) * 12 + month(col("od"))) -
          (year(col("cohort_month")) * 12 + month(col("cohort_month"))))
          .cast("long"))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(count_distinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy("cohort_month", "month_offset")
  }

  /** NEW r10b: market-basket pair affinity — the k part pairs most
    * often co-ordered (ORDER-key self-join with part_a < part_b; the
    * shared subplan keeps ONE exchange, per-order pair expansion is
    * bounded by items-per-order so the blowup is linear in orders,
    * not quadratic in parts). Counter shuffle + TakeOrdered top-k
    * with a (count desc, pair) total order.
    */
  def basketPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    // r19: pair generation WITHOUT the fact self-join. The old plan
    // shuffled the distinct (order, part) table twice and built a
    // 600k-row broadcast (AQE's pick at sf0.1 — at 100 TB that join
    // degrades to a second full fact shuffle). One exchange to the
    // per-order sorted part set, then pairs explode from the ≤|basket|²
    // per-order array: sorted-set order makes x < y exactly the old
    // a.l_partkey < b.l_partkey condition — identical pair multiset,
    // identical counts, oracle hash unchanged. Baskets are bounded
    // (≤7 parts/order in TPC-H-shaped data), so the per-row lambda is
    // constant work, and the fact now crosses the network once.
    val baskets = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    // r20 (the r19 verdict's What's-wrong #1): the per-order pair
    // lambda is O(|basket|²) INSIDE one row — a single adversarial
    // order with 10⁵ distinct parts would be a 10¹⁰-pair bomb in one
    // task (the §2.5 skew class moved from the join into the lambda).
    // Guard it with the prune-proof assert_true-in-filter pattern
    // (bpeVocab r16): 4096 parts/order caps a row at ~8.4M pairs —
    // three orders of magnitude above any TPC-H-shaped basket (≤7),
    // and failing loudly beats silently truncating pair counts.
    val maxBasket = 4096
    baskets
      .filter(isnull(assert_true(size(col("parts")) <= maxBasket,
        lit(s"basket_pairs: an order exceeds $maxBasket distinct parts — " +
          "per-order pair explosion would be quadratic; pre-split or cap " +
          "the basket upstream"))))
      .select(explode(expr(
        "flatten(transform(parts, (x, i) -> " +
          "transform(slice(parts, i + 2, size(parts)), " +
          "y -> struct(x AS part_a, y AS part_b))))")).as("pr"))
      .select(col("pr.part_a").as("part_a"), col("pr.part_b").as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(desc("n_orders"), col("part_a"), col("part_b"))
      .limit(k)
  }

  /** UNPIVOT: the per-returnflag measure sums melted into long-form
    * (measure, value) rows — the wide→long reshape every BI export
    * needs. Aggregation happens FIRST (exact decimal sums, one
    * shuffle); the unpivot then expands only the 3-row aggregate, so
    * at 100 TB the reshape is free.
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(d("l_quantity")).cast("double").as("sum_qty"),
        sum(d("l_extendedprice")).cast("double").as("sum_price"),
        sum(d("l_discount")).cast("double").as("sum_disc"),
        sum(d("l_tax")).cast("double").as("sum_tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc"), col("sum_tax")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")

  /** NEW r12: skyline (Pareto frontier) of orders on (order date ↑,
    * total price ↑): an order survives iff no other order is at least
    * as recent AND at least as expensive with one strict — the classic
    * two-attribute dominance query, distributed WITHOUT an all-pairs
    * join: per-date maxima (one fact shuffle on the bounded date key)
    * + a strictly-later suffix max over the tiny date table, then a
    * broadcast-back semi-filter (AQE-chosen, unhinted). All compares
    * run on exact decimals. kept ⟺ price = dmax(date) ∧ price >
    * max(dmax over later dates) — same-date same-price ties all
    * survive (neither dominates).
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"),
        d("o_totalprice").as("p"))
    val dmax = o.groupBy(col("odate")).agg(max(col("p")).as("dmax"))
    val later = Window.orderBy(col("odate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sfx = dmax.withColumn("later_max", max(col("dmax")).over(later))
    o.join(sfx, "odate")
      .filter(col("p") === col("dmax") &&
        (col("later_max").isNull || col("p") > col("later_max")))
      .select(col("o_orderkey"), col("odate"),
        col("p").cast("double").as("o_totalprice"))
      .orderBy("o_orderkey")
  }
}
