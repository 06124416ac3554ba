package graft

import graft.sources.CdcFormats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Cross-batch ordering semantics of the streaming CDC merge: the target is
  * offset-ordered (last-writer-wins by log position, with delete
  * tombstones), so a key's events split across micro-batches in the WRONG
  * arrival order still converge to the log's final state. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  test("delete arriving before its insert leaves the key dead (tombstone wins)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val raw = in.toDF().toDF("value", "offset")
    val changelog = CdcFormats.debeziumChangelog(raw, CdcFormats.payload)

    @volatile var current: Option[DataFrame] = None
    val q = changelog.writeStream.outputMode("append")
      .option("checkpointLocation", s"/tmp/graft-cdcspec/${System.nanoTime()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val acts = batch.groupBy(col("o_orderkey"))
          .agg(max_by(struct(col("offset"), col("kind"), col("o_totalprice")),
            struct(col("offset"), (col("kind") === "+U").cast("int"))).as("w"))
          .select(col("o_orderkey"), col("w.offset").as("offset"),
            (col("w.kind") =!= "-D").as("alive"),
            col("w.o_totalprice").as("o_totalprice"))
        val merged = current match {
          case None => acts
          case Some(prev) => prev.unionByName(acts)
            .groupBy(col("o_orderkey"))
            .agg(max_by(struct(col("offset"), col("alive"), col("o_totalprice")),
              col("offset")).as("w"))
            .select(col("o_orderkey"), col("w.offset").as("offset"),
              col("w.alive").as("alive"), col("w.o_totalprice").as("o_totalprice"))
        }
        current = Some(merged.localCheckpoint(true))
        ()
      }.start()

    def dbz(key: Long, op: String, price: Double, off: Long): (String, Long) = {
      val row = s"""{"o_orderkey":$key,"o_custkey":1,"o_orderstatus":"O","o_totalprice":$price}"""
      val (b, a) = op match {
        case "c" => ("null", row)
        case "d" => (row, "null")
        case _ => (row, row)
      }
      (s"""{"before":$b,"after":$a,"op":"$op","ts_ms":$off}""", off)
    }

    // batch 1: key 1's DELETE (offset 12) arrives before its insert;
    //          key 2 inserted normally
    in.addData(dbz(1L, "d", 10.0, 12L), dbz(2L, "c", 20.0, 20L))
    q.processAllAvailable()
    // batch 2: key 1's INSERT (offset 10) arrives late — must NOT resurrect;
    //          key 2 updated
    in.addData(dbz(1L, "c", 10.0, 10L), dbz(2L, "u", 25.0, 21L))
    q.processAllAvailable()
    q.stop()

    val fin = current.get.where(col("alive")).collect()
    assert(fin.map(_.getAs[Long]("o_orderkey")).toSet == Set(2L))
    assert(fin.head.getAs[Double]("o_totalprice") == 25.0)
  }
}
