package graft.operators

import graft.Tables
import graft.functions.ZValue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout operators — the write-side half of scan efficiency
  * at 100 TB. The reference's FileSystem/Hive sinks write arrival order and
  * prune only on partition directories
  * (flink-table/flink-table-runtime-blink/.../filesystem/FileSystemTableSink.java);
  * these operators produce layouts whose FILE-level min/max footer stats
  * prune on data columns too:
  *
  *   - [[zorderCells]]: z-order (Morton) clustering of a two-column key —
  *     range-partition + sort by the interleaved key and every output file
  *     gets a tight bounding box in BOTH dimensions (LayoutSpec measures
  *     the box shrinkage against a one-column sort on real files).
  *   - [[bucketJoin]]: Spark bucketed tables as the engine's co-located
  *     join surface — both sides pre-hashed into the same bucket count at
  *     WRITE time, so the repeated daily join runs with ZERO exchange on
  *     either side (PlanSpec pins exactly one Exchange in the whole query:
  *     the final aggregation). This is the Spark-native answer to the
  *     reference's co-located partitioning
  *     (flink-runtime/.../io/network/partition/ — wired per-job there,
  *     persisted in the table layout here).
  */
object Layout {

  /** Z-order cell summary over part(p_size, floor(p_retailprice) & 1023):
    * per 1024-wide z-cell, the exact two-dimensional bounding box. The
    * oracle replays the interleave bit-for-bit; tight min/max spans per
    * cell ARE the pruning guarantee the layout exists for. */
  def zorderCells(s: SparkSession, dir: String): DataFrame = {
    val xy = Tables(s, dir, "part").select(
      col("p_size").cast("int").as("x"),
      expr("cast(floor(p_retailprice) as int) & 1023").as("y"))
    xy.withColumn("z", ZValue.zValue(col("x"), col("y")))
      .groupBy(expr("shiftright(z, 10)").as("zcell"))
      .agg(count(lit(1)).as("cnt"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy("zcell")
  }

  /** Bucketed-table names are keyed by the source dir so one JVM serving
    * several corpora (tests, bench reps) never reuses a stale layout; the
    * write then happens ONCE per (process, dir) — exactly the production
    * contract, where the layout is written once and the nightly join reads
    * it for free (bench min-of-N reflects the join, not the rewrite). */
  def bucketTableNames(dir: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    (s"graft_buckets.orders_b_$tag", s"graft_buckets.customer_b_$tag")
  }

  /** Write both join sides as 16-bucket tables hashed on the join key,
    * then run the join off the bucketed layout. The join itself needs no
    * exchange (bucket-pruned SortMergeJoin; MERGE hint keeps the plan on
    * the bucketed path instead of a broadcast that would hide the
    * demonstration); only the final group-by shuffles its ≤5 rows. */
  def bucketJoin(s: SparkSession, dir: String): DataFrame = {
    val (ordersT, customerT) = bucketTableNames(dir)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
    if (!s.catalog.tableExists(ordersT))
      Tables(s, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(16, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ordersT)
    if (!s.catalog.tableExists(customerT))
      Tables(s, dir, "customer")
        .write.mode("overwrite")
        .bucketBy(16, "c_custkey").sortBy("c_custkey")
        .saveAsTable(customerT)
    s.sql(
      s"""SELECT /*+ MERGE(c) */ c.c_mktsegment,
        |  count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS sum_price
        |FROM $ordersT o
        |JOIN $customerT c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
  }

  val sql: Map[String, String] = Map(
    "q_layout_zorder" ->
      """WITH xy AS (SELECT p_size AS x,
        |   CAST(floor(p_retailprice) AS INT) & 1023 AS y FROM part),
        |zz AS (SELECT x, y, CAST(list_sum(list_transform(range(0, 16), i ->
        |   (((x >> i) & 1)::BIGINT << (2*i)) + (((y >> i) & 1)::BIGINT << (2*i + 1))))
        |   AS BIGINT) AS z FROM xy)
        |SELECT z >> 10 AS zcell, count(*) AS cnt,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        |FROM zz GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bucket_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
