package graft

import graft.sources.DdlSql

/** CREATE TABLE DDL surface: parse units + metadata-driven execution. */
class DdlSqlSpec extends SparkSpec {

  test("parses name, PK, watermark, and WITH options into a descriptor") {
    val d = DdlSql.parse(DdlSql.ddlFor("/data/sf"))
    assert(d.name === "events_ddl")
    assert(d.path === "/data/sf/events.parquet")
    assert(d.primaryKey === Seq("user_id"))
    assert(d.watermarkCol === Some("ts"))
    assert(d.watermarkDelay === "1 hour")
    assert(d.tsNanosAsLong)
  }

  test("rejects non-filesystem connectors and malformed statements") {
    intercept[IllegalArgumentException](DdlSql.parse("CREATE VIEW v AS SELECT 1"))
    intercept[IllegalArgumentException](DdlSql.parse(
      "CREATE TABLE t (a BIGINT) WITH ('connector' = 'kafka', 'path' = '/x')"))
    intercept[IllegalArgumentException](DdlSql.parse(
      "CREATE TABLE t (a BIGINT) WITH ('connector' = 'filesystem')")) // no path
  }

  test("composite PRIMARY KEY and missing watermark parse correctly") {
    val d = DdlSql.parse(
      """CREATE TABLE t (a BIGINT, b STRING, PRIMARY KEY (a, b) NOT ENFORCED)
        |WITH ('connector' = 'filesystem', 'path' = '/p')""".stripMargin)
    assert(d.primaryKey === Seq("a", "b"))
    assert(d.watermarkCol === None)
  }

  test("DDL-registered table dedups by its declared PK and rowtime") {
    val viaDdl = DdlSql.ddlDedup(spark, sf).collect().map(_.toSeq)
    // twin of the programmatic descriptor query — must agree exactly
    import graft.sources.{Descriptors, TableDescriptor}
    val d = TableDescriptor("events_prog", s"$sf/events.parquet",
      primaryKey = Seq("user_id"), watermarkCol = Some("ts"), tsNanosAsLong = true)
    import org.apache.spark.sql.functions.col
    val expected = Descriptors.dedupByPk(spark, d, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy("user_id").collect().map(_.toSeq)
    assert(viaDdl === expected)
    assert(viaDdl.nonEmpty)
    // the view is registered in the catalog under its DDL name
    assert(spark.catalog.tableExists("events_ddl"))
  }
}
