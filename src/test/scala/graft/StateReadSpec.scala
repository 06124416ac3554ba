package graft

import org.apache.spark.sql.functions._

/** State Processor API analog (graft.sources.StateRead): the state-metadata
  * listing is the reference's SavepointMetadata — operator inventory, store
  * names, partition counts, batch range — and the statestore scan must agree
  * with what the job itself emitted. */
class StateReadSpec extends SparkSpec {

  test("custom flatMapGroupsWithState state decodes through the statestore reader") {
    val ckpt = s"/tmp/graft-stateread/spec-fmgws-${System.nanoTime()}"
    val ds = graft.streaming.StreamSource.eventsTypedWithSentinel(spark, sf)
    val out = graft.streaming.StatefulOps.changelogNormalize(ds)
    val q = out.writeStream.format("memory").queryName("state_spec_fmgws")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()

    // the operator's LastRow(ts, event_id) state surfaces as a struct —
    // the savepoint-reader contract for CUSTOM keyed state, not just
    // built-in aggs
    val state = spark.read.format("statestore").load(ckpt)
    val fields = state.schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val names = flattenNames(fields)
    assert(names.exists(_.contains("event_id")), s"state schema: $fields")
    val n = state.selectExpr("key.*").where(col("value").isNotNull).count()
    // one state row per real user + the sentinel key
    val users = spark.table("state_spec_fmgws")
      .select("user_id").distinct().count()
    assert(n >= users, s"state rows $n < users $users")
  }

  test("queryable state: point lookups against a LIVE query's keyed state") {
    // The reference's flink-queryable-state serves key lookups against a
    // RUNNING job's keyed state (KeyedStream.java:1034 asQueryableState +
    // QueryableStateClient). Spark-first analog: state-store versions are
    // immutable per committed batch, so a batch statestore scan against the
    // ACTIVE query's checkpoint is a consistent point-in-time read — no
    // stop, no savepoint. The query stays running across both lookups and
    // the second lookup observes exactly the extra batch.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ckpt = s"/tmp/graft-stateread/spec-live-${System.nanoTime()}"
    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("user_id", "value")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"), sum("value").as("s"))
    val q = agg.writeStream.format("memory").queryName("state_spec_live")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      in.addData((1L, 10.0), (1L, 5.0), (2L, 7.0))
      q.processAllAvailable()
      assert(q.isActive, "query must be live for the first lookup")
      val lookup1 = spark.read.format("statestore").load(ckpt)
        .select(col("key.user_id").as("u"), col("value.count").as("c"))
        .where(col("u") === 1L).collect()
      assert(lookup1.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))

      in.addData((1L, 1.0), (3L, 2.0))
      q.processAllAvailable()
      assert(q.isActive, "query must still be live for the second lookup")
      val lookup2 = spark.read.format("statestore").load(ckpt)
        .select(col("key.user_id").as("u"), col("value.count").as("c"))
        .orderBy("u").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(lookup2 === Seq((1L, 3L), (2L, 1L), (3L, 1L)))
    } finally q.stop()
  }

  private def flattenNames(t: org.apache.spark.sql.types.StructType): Seq[String] =
    t.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: org.apache.spark.sql.types.StructType =>
          f.name +: flattenNames(s).map(n => s"${f.name}.$n")
        case _ => Seq(f.name)
      }
    }

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
