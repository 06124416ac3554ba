package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint report a 100 TB
  * lake runs nightly before anything downstream trusts the data
  * (deequ/dbt-test shape; the reference has no analog — its closest is
  * per-job assertions in user code). Each check is one aggregate or one
  * anti-join over the table it guards:
  *
  *   - primary-key uniqueness: rows − distinct(key) (two-phase count
  *     distinct, one shuffle of the key columns only)
  *   - referential integrity: left-anti join child→parent (broadcast when
  *     the parent's key set is dimension-sized, as here)
  *   - non-null fraction, accepted-values set, numeric range: codegen
  *     conditional counts, zero shuffles, all fused into one scan per
  *     table
  *
  * The report is one row per check with the violation count, so a
  * scheduler gates on `violations > 0` — and the checks compose into a
  * single job whose cost is a handful of scans regardless of how many
  * expression-level rules run (they share the scan via one aggregate).
  *
  * The suite fires on REAL data here: the synthetic lineitem does not
  * honor the classic TPC-H (l_orderkey, l_linenumber) primary key (14,168
  * duplicate pairs at sf0.01), so lineitem_pk_unique reports pass=false
  * while the other eight constraints hold — exactly the mixed report a
  * production lake produces. */
object DataQuality {

  def checks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val ord = Tables(s, dir, "orders")
    val cust = Tables(s, dir, "customer")

    def report(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"),
        col("violations").cast("bigint").as("violations"),
        col("total").cast("bigint").as("total"),
        (col("violations") === 0).as("pass"))

    // expression-only rules fused into ONE scan-aggregate per table
    val liExpr = li.agg(
      count(lit(1)).as("total"),
      sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("v_null_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.2, 1).otherwise(0)).as("v_disc"),
      sum(when(col("l_extendedprice") <= 0, 1).otherwise(0)).as("v_price"))
    liExpr.persist()
    val ordExpr = ord.agg(
      count(lit(1)).as("total"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).as("v_status"),
      sum(when(col("o_orderdate") < to_timestamp(lit("1992-01-01")) ||
        col("o_orderdate") >= to_timestamp(lit("2002-01-01")), 1).otherwise(0)).as("v_date"))
    ordExpr.persist()
    try {
    val liPk = li.agg(count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber"))).as("violations"))
    val ordPk = ord.agg(count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))
    val liFk = li.join(ord.select(col("o_orderkey").as("l_orderkey")).distinct(),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(liExpr.select(col("total")))
    val ordFk = ord.join(cust.select(col("c_custkey").as("o_custkey")).distinct(),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(ordExpr.select(col("total")))

    // the report is 9 rows — materialize it so the two cached 1-row
    // aggregates can be released instead of leaking into the session
    val out = report("lineitem_pk_unique", liPk)
      .unionByName(report("orders_pk_unique", ordPk))
      .unionByName(report("lineitem_fk_orders", liFk))
      .unionByName(report("orders_fk_customer", ordFk))
      .unionByName(report("lineitem_quantity_nonnull",
        liExpr.select(col("v_null_qty").as("violations"), col("total"))))
      .unionByName(report("lineitem_discount_range",
        liExpr.select(col("v_disc").as("violations"), col("total"))))
      .unionByName(report("lineitem_price_positive",
        liExpr.select(col("v_price").as("violations"), col("total"))))
      .unionByName(report("orders_status_accepted",
        ordExpr.select(col("v_status").as("violations"), col("total"))))
      .unionByName(report("orders_date_bounds",
        ordExpr.select(col("v_date").as("violations"), col("total"))))
      .orderBy("check_name")
    val rows = out.collect().toSeq
    s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), out.schema)
    } finally {
      liExpr.unpersist(blocking = false)
      ordExpr.unpersist(blocking = false)
    }
  }

  val sql: Map[String, String] = Map(
    "q_dq_checks" ->
      """WITH li AS (SELECT count(*) AS total,
        |   CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null_qty,
        |   CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        |   CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
        |  FROM lineitem),
        |oo AS (SELECT count(*) AS total,
        |   CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |   CAST(sum(CASE WHEN CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1992-01-01'
        |     OR CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS v_date
        |  FROM orders),
        |rows_ AS (
        | SELECT 'lineitem_pk_unique' AS check_name, count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS violations, count(*) AS total FROM lineitem
        | UNION ALL SELECT 'orders_pk_unique', count(*) - count(DISTINCT o_orderkey), count(*) FROM orders
        | UNION ALL SELECT 'lineitem_fk_orders',
        |   (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |   (SELECT total FROM li)
        | UNION ALL SELECT 'orders_fk_customer',
        |   (SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |   (SELECT total FROM oo)
        | UNION ALL SELECT 'lineitem_quantity_nonnull', (SELECT v_null_qty FROM li), (SELECT total FROM li)
        | UNION ALL SELECT 'lineitem_discount_range', (SELECT v_disc FROM li), (SELECT total FROM li)
        | UNION ALL SELECT 'lineitem_price_positive', (SELECT v_price FROM li), (SELECT total FROM li)
        | UNION ALL SELECT 'orders_status_accepted', (SELECT v_status FROM oo), (SELECT total FROM oo)
        | UNION ALL SELECT 'orders_date_bounds', (SELECT v_date FROM oo), (SELECT total FROM oo))
        |SELECT check_name, CAST(violations AS BIGINT) AS violations,
        |  CAST(total AS BIGINT) AS total, violations = 0 AS pass
        |FROM rows_ ORDER BY check_name""".stripMargin,
  )
}
