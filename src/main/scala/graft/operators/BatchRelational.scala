package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch relational operators (SURVEY.md §2.2–§2.7), expressed as declarative
  * DataFrame plans so Catalyst picks the physical strategy.
  *
  * Scale notes (100 TB):
  *  - Aggregations are two-phase (partial + final HashAggregate) automatically.
  *  - Dimension joins (region/nation/supplier/part ≪ fact tables) broadcast —
  *    `broadcast()` is explicit where the dim side is provably small so the
  *    plan never degrades to a shuffled join when stats are missing.
  *  - Doubles that flow to the correctness oracle are rounded at the END of
  *    each aggregation chain (never mid-plan), so plans stay fully pushed-down.
  */
object BatchRelational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** TPC-H Q1 shape: pushdown filter + 2-phase hash agg + sort.
    * Ref: flink-table-planner-blink BatchExecHashAggregate / BatchExecSort. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Inner join chain over the star schema with dimension broadcast.
    * Ref: HashJoinOperator.java:58 / BatchExecHashJoin.scala:53. */
  def joinInner(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")

  /** Left outer join keeping customers with no orders.
    * Ref: SortMergeJoinOperator.java:62 (all join types). */
  def joinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total"))
      .orderBy("c_custkey")

  /** Full outer join on aggregated sides (exercises null-padding both ways). */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val bySupp = t(s, dir, "lineitem").groupBy(col("l_suppkey").as("k"))
      .agg(count(lit(1)).as("li_cnt"))
    val supp = t(s, dir, "supplier").select(col("s_suppkey").as("k2"), col("s_acctbal"))
    bySupp.join(supp, col("k") === col("k2"), "full")
      .select(coalesce(col("k"), col("k2")).as("suppkey"),
              coalesce(col("li_cnt"), lit(0L)).as("li_cnt"),
              round(coalesce(col("s_acctbal"), lit(0.0)), 2).as("acctbal"))
      .orderBy("suppkey")
  }

  /** Left-semi join = SQL EXISTS. Ref: HashJoinOperator semi mode. */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 100000),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Left-anti join = SQL NOT EXISTS. Ref: HashJoinOperator anti mode. */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Cartesian product (tiny × tiny). Ref: BatchExecNestedLoopJoin.scala:45. */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  /** Theta (non-equi) join → broadcast nested loop.
    * Ref: NestedLoopJoinCodeGenerator.scala. */
  def joinTheta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") < col("n_nationkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_gt"))
      .orderBy("s_suppkey")

  /** Aggregate with DISTINCT (Expand-based rewrite).
    * Ref: SplitAggregateRule.scala / distinct-agg decomposition. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(col("l_partkey")).as("n_part"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Statistical aggregates. Ref: aggfunctions + WindowAggregateReduceFunctionsRule. */
  def aggStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_samp"),
        round(var_pop(col("l_quantity")), 6).as("v_pop"),
        round(var_samp(col("l_quantity")), 6).as("v_samp"),
        round(min(col("l_quantity")), 2).as("min_q"),
        round(max(col("l_quantity")), 2).as("max_q"))
      .orderBy("l_linestatus")

  /** GROUPING SETS via rollup + grouping_id.
    * Ref: DecomposeGroupingSetsRule.scala:205. */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
           count(lit(1)).as("cnt"),
           grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** CUBE. Ref: same decomposition family. */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
           round(sum("o_totalprice"), 2).as("total"),
           grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** LISTAGG with deterministic element order.
    * Ref: aggfunctions/ListAggFunction. Spark: sort_array(collect_list). */
  def aggListagg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("n_regionkey")

  /** Exact percentiles (linear interpolation over the sorted values — the
    * same definition as DuckDB quantile_cont, so the oracle is exact). */
  def aggPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"))
      .orderBy("l_returnflag")

  /** COLLECT / MULTISET aggregation: the value multiset per group,
    * canonicalized by sorting (ref: aggfunctions CollectAggFunction). */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(
        // serialized to a comma-joined string: the driver's pandas hash
        // compare can't sort array cells, and bigint→string is format-stable
        // across Spark and DuckDB
        array_join(sort_array(collect_list(col("s_suppkey"))).cast("array<string>"), ",").as("supps"),
        array_join(sort_array(collect_set(col("s_nationkey"))).cast("array<string>"), ",").as("nk_set"))
      .orderBy("s_nationkey")

  /** SUM0 semantics (empty group → 0 not NULL): coalesce(sum, 0).
    * Ref: aggfunctions/Sum0AggFunction. */
  def aggSum0(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 450000),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("sum0_total"),
           count(col("o_orderkey")).as("cnt"))
      .orderBy("c_mktsegment")

  // ---- Set operations (§2.7) -------------------------------------------

  private def custKeys(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
  private def custKeys2(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").where(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("k"))

  def setUnionAll(s: SparkSession, dir: String): DataFrame =
    custKeys(s, dir).union(custKeys2(s, dir))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt")).orderBy("k")

  def setUnion(s: SparkSession, dir: String): DataFrame =
    custKeys(s, dir).union(custKeys2(s, dir)).distinct().orderBy("k")

  def setIntersect(s: SparkSession, dir: String): DataFrame =
    custKeys(s, dir).intersect(custKeys2(s, dir)).orderBy("k")

  def setIntersectAll(s: SparkSession, dir: String): DataFrame =
    custKeys(s, dir).intersectAll(custKeys2(s, dir))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt")).orderBy("k")

  def setExcept(s: SparkSession, dir: String): DataFrame =
    custKeys(s, dir).except(custKeys2(s, dir)).orderBy("k")

  def setExceptAll(s: SparkSession, dir: String): DataFrame =
    custKeys(s, dir).exceptAll(custKeys2(s, dir))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt")).orderBy("k")

  // ---- Sort / limit / Top-N / dedup (§2.6) -----------------------------

  /** ORDER BY + LIMIT → TakeOrderedAndProject (no full sort at scale).
    * Ref: SortLimitOperator.java:39. */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))

  /** Top-N per group: ROW_NUMBER + filter (WindowGroupLimit pushdown in Spark 3.5+).
    * Ref: rank/AppendOnlyTopNFunction.java:48 (batch analog BatchExecRank). */
  def topNPerGroup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
              round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Keep-first dedup per key ordered by (time, id).
    * Ref: deduplicate/RowTimeDeduplicateFunction.java:33. */
  def dedupFirst(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy("user_id")
  }

  /** Keep-last dedup per key (ROW_NUMBER over ts DESC). */
  def dedupLast(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy("user_id")
  }

  // ---- Over windows, batch (§2.5) --------------------------------------

  /** ROWS BETWEEN n PRECEDING AND CURRENT ROW running aggregates.
    * Ref: BatchExecOverAggregate.scala:59 + over/frame classes. */
  def overRows(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4).as("run_sum"),
        round(avg("value").over(w.rowsBetween(-2, 0)), 6).as("mavg3"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run_cnt"))
      .orderBy("user_id", "event_id")
  }

  /** RANK / DENSE_RANK / NTILE / PERCENT_RANK family. */
  def overRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy("c_mktsegment", "rn")
  }

  /** LEAD / LAG with defaults. Ref: aggfunctions LeadLag. */
  def overLeadLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        lag(col("event_id"), 1, -1L).over(w).as("prev_id"),
        lead(col("event_id"), 1, -1L).over(w).as("next_id"))
      .orderBy("user_id", "event_id")
  }

  /** RANGE BETWEEN frame on a numeric ordering column. */
  def overRange(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
      .rangeBetween(-2, 0)
    t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        count(lit(1)).over(w).as("n_close"))
      .orderBy("p_brand", "p_partkey")
  }

  // ---- Correlate / UNNEST (§2.2) ---------------------------------------

  /** UNNEST(split(...)) — lateral explode. Ref: LogicalUnnestRule.scala:41,
    * CorrelateCodeGenerator.scala. */
  def unnestWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** VALUES literal rows. Ref: ValuesCodeGenerator.scala. */
  def valuesScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "tag").orderBy("id")
  }

  /** Typed coGroup (§2.3 row 19; ref DataStream.coGroup / CoGroupFunction):
    * both sides' rows for a key arrive as two iterators in one function —
    * here customers × their orders, emitting per-customer order stats that
    * need BOTH iterators at once (count above the customer's own balance).
    * Physically one co-partitioned shuffle per side, like the reference's
    * CoGroupOperator. */
  def coGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    case class CustRow(c_custkey: Long, c_acctbal: Double)
    case class OrdRow(o_custkey: Long, o_totalprice: Double)
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
    val ords = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
    cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) {
      (key, cs, os) =>
        val c = cs.toSeq
        if (c.isEmpty) Iterator.empty // orders with no customer: drop
        else {
          val bal = c.head._2
          val prices = os.map(_._2).toSeq
          Iterator.single((key, prices.length.toLong,
            prices.count(_ > bal * 50).toLong,
            math.rint(prices.sum * 100) / 100))
        }
    }.toDF("c_custkey", "n_orders", "n_above", "total")
      .orderBy("c_custkey")
  }
}
