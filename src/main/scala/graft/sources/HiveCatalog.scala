package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-catalog proof (SURVEY §2.11; ref flink-connectors/
  * flink-connector-hive/ — HiveCatalog registering tables in a Hive
  * metastore that both engines resolve through). Spark ships the same
  * integration built-in: `enableHiveSupport()` backs the session catalog
  * with a HiveExternalCatalog over an embedded-Derby metastore (the
  * sandbox deployment; production points the same code at a remote
  * metastore URI).
  *
  * The query exercises the full verb surface END-TO-END against the
  * metastore — CREATE DATABASE, saveAsTable into the warehouse, SHOW
  * TABLES, DESCRIBE, metastore-resolved SELECT, DROP — not just config.
  */
object HiveCatalog {

  /** Metastore-registered copy of `nation`, queried through the catalog.
    * Table name is per-app so concurrent JVMs (tests + Verify) sharing a
    * warehouse root never collide. */
  def hiveCatalog(s: SparkSession, dir: String): DataFrame = {
    // check the SharedState's actual catalog, not the conf string — the
    // string is per-session and a sibling session built without
    // enableHiveSupport can shadow it while the shared catalog stays Hive
    val catClass = s.sharedState.externalCatalog.unwrapped.getClass.getName
    require(catClass.contains("HiveExternalCatalog"),
      s"expected HiveExternalCatalog, got $catClass")
    val tbl = "graft_hive.nation_cat_" +
      java.lang.Integer.toHexString(s.sparkContext.applicationId.hashCode & 0x7fffffff)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_hive")
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    Tables(s, dir, "nation").write.mode("overwrite").saveAsTable(tbl)
    // catalog verbs resolved by the metastore, not a temp-view registry
    val shown = s.sql("SHOW TABLES IN graft_hive").collect()
    require(shown.exists(_.getString(1) == tbl.split("\\.")(1)),
      s"SHOW TABLES did not list $tbl")
    require(s.sql(s"DESCRIBE TABLE $tbl").collect()
      .exists(_.getString(0) == "n_regionkey"), "DESCRIBE missing column")
    val out = s.sql(
      s"""SELECT n_regionkey, count(*) AS cnt, min(n_name) AS first_nation
         |FROM $tbl GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    val materialized = out.localCheckpoint(true) // read before dropping
    s.sql(s"DROP TABLE $tbl")
    materialized
  }

  val sql: Map[String, String] = Map(
    "q_hive_catalog" ->
      """SELECT n_regionkey, count(*) AS cnt, min(n_name) AS first_nation
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
  )
}
