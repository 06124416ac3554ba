package graft

import graft.sources.CdcFormats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge semantics of the CDC JSON formats, mirrored from the reference's
  * format tests (DebeziumJsonSerDeSchemaTest / CanalJsonSerDeSchemaTest /
  * MaxwellJsonSerDerTest in flink-formats/flink-json): tombstone skip,
  * update pair emission order, partial-`old` backfill, foreign-table
  * filtering, DDL skip, unknown-op error vs ignore, null-before error. */
class CdcFormatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("weight", DoubleType)))

  private def raw(rows: (String, Long)*): DataFrame =
    rows.toSeq.toDF("value", "offset")

  test("debezium: insert/update/delete kinds and order, tombstone skipped") {
    val log = raw(
      ("""{"before":null,"after":{"id":1,"name":"a","weight":1.5},"op":"c","ts_ms":10}""", 0L),
      ("""{"before":null,"after":{"id":2,"name":"b","weight":2.0},"op":"r","ts_ms":11}""", 1L),
      ("""{"before":{"id":1,"name":"a","weight":1.5},"after":{"id":1,"name":"a2","weight":1.6},"op":"u","ts_ms":12}""", 2L),
      ("", 3L), // tombstone
      ("""{"before":{"id":2,"name":"b","weight":2.0},"after":null,"op":"d","ts_ms":13}""", 4L))
    val out = CdcFormats.debeziumChangelog(log, schema)
      .orderBy("offset", "kind").collect()
    assert(out.map(_.getAs[String]("kind")).toSeq ==
      Seq("+I", "+I", "+U", "-U", "-D"))
    val updAfter = out.find(_.getAs[String]("kind") == "+U").get
    assert(updAfter.getAs[String]("name") == "a2")
    val del = out.find(_.getAs[String]("kind") == "-D").get
    assert(del.getAs[Long]("id") == 2L && del.getAs[Double]("weight") == 2.0)
  }

  test("debezium: schema-include envelope unwraps payload") {
    val log = raw(
      ("""{"schema":{"type":"struct"},"payload":{"before":null,"after":{"id":7,"name":"x","weight":0.5},"op":"c","ts_ms":99}}""", 0L))
    val out = CdcFormats.debeziumChangelog(log, schema, schemaInclude = true).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id") == 7L &&
      out.head.getAs[Long]("ts_ms") == 99L)
  }

  test("debezium: null before on update raises (REPLICA IDENTITY hint); unknown op raises unless ignored") {
    val badUpd = raw(
      ("""{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"u","ts_ms":1}""", 0L))
    val e = intercept[Exception] {
      CdcFormats.debeziumChangelog(badUpd, schema).collect()
    }
    assert(e.getMessage.contains("REPLICA IDENTITY"))
    val badOp = raw(
      ("""{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"z","ts_ms":1}""", 0L))
    intercept[Exception] { CdcFormats.debeziumChangelog(badOp, schema).collect() }
    assert(CdcFormats.debeziumChangelog(badOp, schema, ignoreParseErrors = true)
      .collect().isEmpty)
  }

  test("canal: array batching, partial-old backfill, table filter, DDL skip") {
    val log = raw(
      ("""{"data":[{"id":1,"name":"a","weight":1.0},{"id":2,"name":"b","weight":2.0}],"old":null,"type":"INSERT","database":"d","table":"t","ts":1}""", 0L),
      // old has ONLY the changed column (weight) — id/name must backfill
      ("""{"data":[{"id":1,"name":"a","weight":9.0}],"old":[{"weight":1.0}],"type":"UPDATE","database":"d","table":"t","ts":2}""", 1L),
      ("""{"data":[{"id":5,"name":"z","weight":0.1}],"old":null,"type":"INSERT","database":"d","table":"OTHER","ts":3}""", 2L),
      ("""{"data":null,"old":null,"type":"CREATE","database":"d","table":"t","ts":4}""", 3L),
      ("""{"data":[{"id":2,"name":"b","weight":2.0}],"old":null,"type":"DELETE","database":"d","table":"t","ts":5}""", 4L))
    val out = CdcFormats.canalChangelog(log, schema, database = Some("d"),
      table = Some("t")).orderBy("offset", "kind").collect()
    assert(out.map(_.getAs[String]("kind")).toSeq ==
      Seq("+I", "+I", "+U", "-U", "-D"))
    val before = out.find(_.getAs[String]("kind") == "-U").get
    assert(before.getAs[Long]("id") == 1L &&
      before.getAs[String]("name") == "a" &&
      before.getAs[Double]("weight") == 1.0) // old value, not backfilled
    assert(!out.exists(_.getAs[Long]("id") == 5L)) // foreign table dropped
  }

  test("maxwell: single-row envelope with partial old") {
    val log = raw(
      ("""{"data":{"id":3,"name":"m","weight":5.0},"old":null,"type":"insert","database":"d","table":"t","ts":1}""", 0L),
      ("""{"data":{"id":3,"name":"m2","weight":5.0},"old":{"name":"m"},"type":"update","database":"d","table":"t","ts":2}""", 1L))
    val out = CdcFormats.maxwellChangelog(log, schema).orderBy("offset", "kind").collect()
    assert(out.map(_.getAs[String]("kind")).toSeq == Seq("+I", "+U", "-U"))
    val before = out.find(_.getAs[String]("kind") == "-U").get
    assert(before.getAs[String]("name") == "m" &&
      before.getAs[Double]("weight") == 5.0) // weight backfilled from data
  }

  test("materialize: keep-last per key, retractions drop keys, +U outranks -U at same offset") {
    val log = raw(
      ("""{"before":null,"after":{"id":1,"name":"a","weight":1.0},"op":"c","ts_ms":1}""", 0L),
      ("""{"before":{"id":1,"name":"a","weight":1.0},"after":{"id":1,"name":"a2","weight":2.0},"op":"u","ts_ms":2}""", 1L),
      ("""{"before":null,"after":{"id":2,"name":"b","weight":3.0},"op":"c","ts_ms":3}""", 2L),
      ("""{"before":{"id":2,"name":"b","weight":3.0},"after":null,"op":"d","ts_ms":4}""", 3L))
    val state = CdcFormats.materialize(
      CdcFormats.debeziumChangelog(log, schema), Seq("id")).collect()
    assert(state.length == 1)
    assert(state.head.getAs[Long]("id") == 1L &&
      state.head.getAs[String]("name") == "a2" &&
      state.head.getAs[Double]("weight") == 2.0)
  }
}
