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

  test("catalog verbs: CREATE VIEW / SHOW TABLES / DESCRIBE / DROP") {
    DdlSql.execute(spark, DdlSql.ddlFor(sf))
    DdlSql.execute(spark,
      "CREATE OR REPLACE VIEW v_types AS SELECT DISTINCT event_type FROM events_ddl")
    val shown = DdlSql.execute(spark, "SHOW TABLES")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(shown.get("events_ddl").contains("TABLE"))
    assert(shown.get("v_types").contains("VIEW"))
    // DESCRIBE surfaces the PK + WATERMARK metadata Spark schemas can't hold
    val desc = DdlSql.execute(spark, "DESCRIBE events_ddl")
      .collect().map(r => r.getString(0) -> (r.getString(3), r.getString(4))).toMap
    assert(desc("user_id")._1 === "PRI")
    assert(desc("ts")._2.startsWith("WATERMARK"))
    // the view answers queries until dropped
    assert(DdlSql.execute(spark, "SELECT count(*) AS c FROM v_types").head.getLong(0) > 0)
    DdlSql.execute(spark, "DROP VIEW v_types")
    assert(!DdlSql.execute(spark, "SHOW TABLES")
      .collect().map(_.getString(0)).contains("v_types"))
    intercept[Exception] { DdlSql.execute(spark, "DESCRIBE v_types") }
  }

  test("computed column + WATERMARK text parse; DESCRIBE shows the expression and delay") {
    val ddl =
      s"""CREATE TABLE events_cc (
         |  event_id BIGINT, ts TIMESTAMP(3), value DOUBLE,
         |  value_bucket AS CAST(FLOOR(value / 100) AS BIGINT),
         |  WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
         |) WITH ('connector' = 'filesystem', 'path' = '$sf/events.parquet',
         |        'format' = 'parquet', 'timestamp.nanos' = 'true')""".stripMargin
    val d = DdlSql.parse(ddl)
    assert(d.computedCols === Seq("value_bucket" -> "CAST(FLOOR(value / 100) AS BIGINT)"))
    assert(d.watermarkCol === Some("ts") && d.watermarkDelay === "10 second")
    DdlSql.execute(spark, ddl)
    val desc = DdlSql.execute(spark, "DESCRIBE events_cc")
      .collect().map(r => r.getString(0) -> (r.getString(4), r.getString(5))).toMap
    assert(desc("ts")._1 === "WATERMARK 10 second")
    assert(desc("value_bucket")._2 === "CAST(FLOOR(value / 100) AS BIGINT)")
    // the computed column is real data on the registered view
    val buckets = spark.table("events_cc").select("value_bucket").distinct().collect()
    assert(buckets.nonEmpty)
    DdlSql.execute(spark, "DROP TABLE events_cc")
  }

  test("CREATE TABLE LIKE: merge strategies and their conflict errors") {
    DdlSql.execute(spark, DdlSql.ddlFor(sf))
    // INCLUDING ALL (default): full inheritance, extra options merge
    DdlSql.execute(spark, "CREATE TABLE like_all () WITH () LIKE events_ddl")
    val all = DdlSql.execute(spark, "DESCRIBE like_all")
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(all("user_id") == "PRI")
    // INCLUDING CONSTRAINTS + a second PK is an error
    val e1 = intercept[IllegalArgumentException] {
      DdlSql.execute(spark,
        "CREATE TABLE like_pk (PRIMARY KEY (event_id) NOT ENFORCED) WITH () LIKE events_ddl")
    }
    assert(e1.getMessage.contains("PRIMARY KEY"))
    // INCLUDING OPTIONS + conflicting path is an error
    val e2 = intercept[IllegalArgumentException] {
      DdlSql.execute(spark,
        "CREATE TABLE like_opt () WITH ('path' = '/elsewhere') LIKE events_ddl")
    }
    assert(e2.getMessage.contains("OVERWRITING OPTIONS"))
    // OVERWRITING is rejected for CONSTRAINTS
    val e3 = intercept[IllegalArgumentException] {
      DdlSql.execute(spark,
        "CREATE TABLE like_bad () WITH () LIKE events_ddl (OVERWRITING CONSTRAINTS)")
    }
    assert(e3.getMessage.contains("OVERWRITING is not supported"))
    // EXCLUDING ALL drops PK and watermark
    val excl = DdlSql.parseLike(
      s"CREATE TABLE like_none () WITH ('connector'='filesystem','format'='parquet'," +
        s"'path'='$sf/events.parquet') LIKE events_ddl (EXCLUDING ALL)",
      _ => DdlSql.parse(DdlSql.ddlFor(sf)))
    assert(excl.primaryKey.isEmpty && excl.watermarkCol.isEmpty)
    DdlSql.execute(spark, "DROP TABLE like_all")
  }

  test("SHOW VIEWS and SHOW FUNCTIONS list this layer's registrations") {
    DdlSql.execute(spark, "CREATE VIEW showviews_probe AS SELECT 1 AS one")
    val views = DdlSql.execute(spark, "SHOW VIEWS").collect().map(_.getString(0))
    assert(views.contains("showviews_probe"))
    DdlSql.execute(spark,
      "CREATE FUNCTION showfn_probe AS 'graft.functions.IsDigitExpr'")
    val fns = DdlSql.execute(spark, "SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(fns.contains("showfn_probe"))
    DdlSql.execute(spark, "DROP FUNCTION showfn_probe")
    DdlSql.execute(spark, "DROP VIEW showviews_probe")
  }

  test("EXPLAIN returns the physical plan rows") {
    graft.Tables.registerAll(spark, sf)
    val plan = DdlSql.execute(spark,
      "EXPLAIN PLAN FOR SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("Scan parquet"))
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
