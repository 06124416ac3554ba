package graft

import org.apache.spark.sql.functions._

/** State Processor API analog (graft.sources.StateRead): the state-metadata
  * listing is the reference's SavepointMetadata — operator inventory, store
  * names, partition counts, batch range — and the statestore scan must agree
  * with what the job itself emitted. */
class StateReadSpec extends SparkSpec {

  test("state-metadata lists the stateful operator; statestore agrees with the sink") {
    val ckpt = s"/tmp/graft-stateread/spec-${System.nanoTime()}"
    val agg = graft.streaming.StreamSource.eventsWithSentinel(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("state_spec_agg")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()

    val meta = spark.read.format("state-metadata").load(ckpt).collect()
    assert(meta.length == 1)
    val m = meta.head
    assert(m.getAs[String]("operatorName") == "stateStoreSave")
    assert(m.getAs[String]("stateStoreName") == "default")
    assert(m.getAs[Int]("numPartitions") == 4)

    val state = spark.read.format("statestore").load(ckpt)
      .select(col("key.user_id").as("user_id"), col("value.count").as("cnt"))
    val sink = spark.table("state_spec_agg")
    // state IS the final answer: same key set, same counts
    assert(state.join(sink, Seq("user_id"))
      .where(state("cnt") =!= sink("cnt")).isEmpty)
    assert(state.count() == sink.count())
  }
}
