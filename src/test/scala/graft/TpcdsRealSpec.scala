package graft

import graft.tpcds.{TpcdsData, TpcdsReal}

/** Real-TPC-DS suite: generator determinism and schema invariants (the
  * query results themselves are oracle-checked per-round by the driver's
  * DuckDB compare; these specs pin what the oracle can't see). */
class TpcdsRealSpec extends SparkSpec {

  test("generation is deterministic and idempotent across ensure() calls") {
    val root = TpcdsData.ensure(spark, sf)
    val a = spark.table("store_sales").selectExpr(
      "CAST(sum(pmod(xxhash64(ss_item_sk, ss_ticket_number, ss_net_paid), 1000000007)) AS BIGINT)")
      .head.getLong(0)
    // second ensure() hits the _SUCCESS marker — no regeneration, same data
    assert(TpcdsData.ensure(spark, sf) === root)
    val b = spark.table("store_sales").selectExpr(
      "CAST(sum(pmod(xxhash64(ss_item_sk, ss_ticket_number, ss_net_paid), 1000000007)) AS BIGINT)")
      .head.getLong(0)
    assert(a === b)
  }

  test("the 24-table schema is complete and every table is non-empty") {
    TpcdsData.ensure(spark, sf)
    assert(TpcdsData.tableNames.size === 24)
    TpcdsData.tableNames.foreach { t =>
      assert(spark.table(t).count() > 0, s"$t is empty")
    }
  }

  test("date_dim is the real 1900-2100 calendar keyed by Julian day number") {
    TpcdsData.ensure(spark, sf)
    val d = spark.sql(
      """SELECT d_date_sk, d_date, d_year, d_moy, d_dom, d_month_seq FROM date_dim
        |WHERE d_date = DATE'2000-01-01'""".stripMargin).head
    assert(d.getLong(0) === 2451545L) // the textbook JDN of 2000-01-01
    assert(d.getInt(2) === 2000 && d.getInt(3) === 1 && d.getInt(4) === 1)
    assert(d.getInt(5) === 1200) // (2000-1900)*12
    assert(spark.table("date_dim").count() === 73049)
  }

  test("returns refund real sales: every sr (ticket, item) join hits ss") {
    TpcdsData.ensure(spark, sf)
    val srRows = spark.table("store_returns").count()
    val hits = spark.sql(
      """SELECT count(*) FROM store_returns sr JOIN store_sales ss
        |ON ss.ss_ticket_number = sr.sr_ticket_number
        |AND ss.ss_item_sk = sr.sr_item_sk""".stripMargin).head.getLong(0)
    assert(hits >= srRows, s"$hits joined rows for $srRows returns")
  }

  test("every query text parses and plans in Spark") {
    TpcdsData.ensure(spark, sf)
    TpcdsReal.texts.foreach { case (name, text) =>
      // analysis (resolution + type-check) without execution
      val plan = spark.sql(text).queryExecution.optimizedPlan
      assert(plan != null, name)
    }
  }

  test("plan quality: dimensions broadcast, facts shuffle — the star-join shape") {
    TpcdsData.ensure(spark, sf)
    // q3: fact store_sales joined to two small dims — Catalyst must pick
    // broadcast-hash joins for both (no shuffle of the fact for a dim join)
    val plan = spark.sql(TpcdsReal.texts("q3")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in q3 plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), "cartesian product in a star join")
    // q25 (triple-fact + 3 date_dim + 2 dims): every dim side broadcast,
    // fact-fact joins are hash/sort-merge on their keys
    val p25 = spark.sql(TpcdsReal.texts("q25")).queryExecution.executedPlan.toString
    assert(p25.contains("BroadcastHashJoin"), "q25 lost its dim broadcasts")
    assert(!p25.contains("CartesianProduct"), "cartesian product in q25")
  }

  test("oracle texts bind every table to the versioned parquet path") {
    val d = TpcdsReal.duck("q1")
    assert(d.contains(TpcdsData.OraclePath))
    assert(d.contains("read_parquet"))
    // WITH-merge: the query's own CTE must survive behind the prelude
    assert(d.contains("customer_total_return AS ("))
  }
}
