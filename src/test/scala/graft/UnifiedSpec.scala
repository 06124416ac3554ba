package graft

import graft.streaming.Unified

/** FLIP-140 analog: ONE DataFrame-typed function is the program; the input
  * decides the execution mode. The oracle already value-checks the batch
  * run — this pins the FLIP's core promise: batch and streaming executions
  * of the SAME function object produce identical rows. */
class UnifiedSpec extends SparkSpec {

  test("the same pipeline function yields identical rows in batch and streaming execution") {
    val batch = Unified.batchRun(spark, sf).collect().toSeq
    val stream = Unified.streamRun(spark, sf).collect().toSeq
    assert(batch.nonEmpty)
    assert(batch === stream)
  }

  test("the stream-only construct (withWatermark) is eliminated on bounded input") {
    val plan = Unified.batchRun(spark, sf).queryExecution.optimizedPlan.toString
    assert(!plan.contains("EventTimeWatermark"), plan.take(500))
  }
}
