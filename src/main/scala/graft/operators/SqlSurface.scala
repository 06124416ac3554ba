package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL / DDL surface (SURVEY.md §2.11, §3.1): the reference's primary API
  * is SQL text through the Blink planner; here the same query text runs
  * through `spark.sql` over views registered in the session catalog
  * (CREATE TEMP VIEW = the catalog path; Tables.registerAll is the
  * TableDescriptor-style registration SURVEY.md §2.11 prescribes instead of
  * a parser fork). The SQL string is dialect-shared: the DuckDB oracle runs
  * the IDENTICAL text, so this also pins parser semantics.
  */
object SqlSurface {

  /** TPC-H Q3-shaped 3-table join via raw SQL text. */
  val q3Sql: String =
    """SELECT o_orderkey, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_items
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey ORDER BY sum_qty DESC, o_orderkey LIMIT 10""".stripMargin

  /** Correlated scalar subquery via raw SQL (§4.1 subquery rewrite — Spark
    * plans it as a join; identical text runs on DuckDB). */
  val subquerySql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  def q3(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q3Sql)
  }

  def correlatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(subquerySql)
  }

  val sql: Map[String, String] = Map(
    "q_sql_q3" -> q3Sql,
    "q_sql_subquery" -> subquerySql,
  )
}
