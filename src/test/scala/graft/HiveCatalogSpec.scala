package graft

/** Hive catalog end-to-end (SURVEY §2.11; ref flink-connector-hive):
  * the session catalog is a real HiveExternalCatalog over an embedded
  * Derby metastore, and tables registered through it resolve across
  * sessions of the same metastore. */
class HiveCatalogSpec extends SparkSpec {

  test("session catalog is Hive-backed (HiveExternalCatalog over Derby)") {
    // the SharedState catalog is the authority; the conf STRING is
    // per-session and can be shadowed by a sibling non-hive builder
    assert(spark.sharedState.externalCatalog.unwrapped.getClass.getName
      .contains("HiveExternalCatalog"))
  }

  test("metastore round-trip: CREATE DATABASE / saveAsTable / SHOW / DESCRIBE / SELECT / DROP") {
    val out = graft.sources.HiveCatalog.hiveCatalog(spark, sf)
    val rows = out.collect()
    assert(rows.length === 5) // five regions
    assert(rows.map(_.getLong(1)).sum === 25L) // 25 nations
    // the table was dropped after the read; catalog must not list it
    assert(!spark.sql("SHOW TABLES IN graft_hive").collect()
      .exists(_.getString(1).startsWith("nation_cat_")))
  }

  test("a second session of the same metastore sees catalog writes (shared catalog)") {
    val tbl = "graft_hive.cross_session_probe"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_hive")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Tables(spark, sf, "region").write.saveAsTable(tbl)
    val s2 = spark.newSession()
    assert(s2.sql(s"SELECT count(*) AS c FROM $tbl").head.getLong(0) === 5L)
    spark.sql(s"DROP TABLE $tbl")
  }
}
