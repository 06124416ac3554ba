package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library deployment path: a session built with GraftExtensions has
  * every custom function and the AsOfJoin strategy available from plain
  * SQL, no per-session register calls. */
class ExtensionsSpec extends AnyFunSuite {

  test("extension-built session exposes custom functions in SQL") {
    // detach any suite-shared session so the builder creates a fresh one
    // (extensions only apply at session construction)
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        // match SparkSpec's catalog: if this suite runs FIRST in the JVM
        // it creates the SharedState every later suite inherits — a
        // non-hive builder here would pin InMemoryCatalog for the run
        .enableHiveSupport()
        .config("spark.hadoop.javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=${SparkSpec.warehouseDir}-metastore;create=true")
        .config("spark.sql.warehouse.dir", SparkSpec.warehouseDir)
        .getOrCreate()
      val row = s.sql(
        """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       is_digit('123') AS g, is_alpha('abc') AS a,
          |       hash_code('abc') AS h,
          |       size(minhash32(array('x'))) AS mh,
          |       simhash60(array('x')) >= 0 AS sh""".stripMargin).head()
      assert(row.getDouble(0) === 11.0)
      assert(row.getBoolean(1) && row.getBoolean(2))
      assert(row.getInt(3) === "abc".hashCode)
      assert(row.getInt(4) === 32)
      assert(row.getBoolean(5))
      val agg = s.sql("SELECT sum0(v) AS s FROM (SELECT CAST(NULL AS DOUBLE) AS v)").head()
      assert(!agg.isNullAt(0) && agg.getDouble(0) === 0.0)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
