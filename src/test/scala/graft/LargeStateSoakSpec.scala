package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Large-state soak (round-5 verdict #5; ref RocksDBKeyedStateBackend
  * .java:108 — keyed state far beyond executor heap): one MILLION
  * distinct keys of flatMapGroupsWithState state on the RocksDB state
  * store provider, updated incrementally, then restored across a query
  * restart from the same checkpoint. Pins that:
  *  - state rows scale to 10^6 keys per executor without heap pressure
  *    (RocksDB keeps them off-heap/on-disk; numRowsTotal reported);
  *  - an incremental batch touches only its keys (update semantics);
  *  - a restarted query resumes the SAME state from the checkpoint
  *    (count continues, not resets) — the recovery contract at soak
  *    scale rather than the toy sizes of CheckpointRecoverySpec. */
class LargeStateSoakSpec extends SparkSpec {
  import spark.implicits._

  private val N = 1000000

  test(s"$N-key state on RocksDB: build, incremental update, restart+restore") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long)]
      val op = input.toDS().groupByKey(_._1)
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (k: Long, rows: Iterator[(Long, Long)], st: GroupState[Long]) =>
            val c = st.getOption.getOrElse(0L) + rows.size
            st.update(c)
            Iterator.single((k, c))
        }
      val ckpt = s"/tmp/graft-ckpt/soak-${System.nanoTime()}"
      // foreachBatch sink: the memory sink refuses checkpoint recovery,
      // and the restart leg is the point of this spec
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def start() = op.toDF("k", "cnt").writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // persist before multiple actions: re-executing a stateful
          // batch plan would re-apply state updates (collect only the
          // sparse batches — bounded driver memory)
          b.persist()
          try {
            if (b.count() <= N / 100)
              b.collect().foreach(r => emitted.add((r.getLong(0), r.getLong(1))))
          } finally b.unpersist()
          ()
        }
        .start()

      // batch 0: a million distinct keys
      val q1 = start()
      input.addData((0 until N).map(i => (i.toLong, 1L)))
      q1.processAllAvailable()
      val sop = q1.lastProgress.stateOperators(0)
      assert(sop.numRowsTotal === N.toLong, "all keys must hold state")
      info(s"state rows=${sop.numRowsTotal} memoryUsedBytes=${sop.memoryUsedBytes}")

      // batch 1: touch every 1000th key; only those re-emit, at count 2
      input.addData((0 until N by 1000).map(i => (i.toLong, 1L)))
      q1.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(emitted.asScala.count(_._2 == 2L) === N / 1000)
      assert(q1.lastProgress.stateOperators(0).numRowsTotal === N.toLong)
      q1.stop()

      // restart from the same checkpoint: key 123's count must CONTINUE
      emitted.clear()
      val q2 = start()
      input.addData(Seq((123L, 1L)))
      q2.processAllAvailable()
      val restored = emitted.asScala.toSet
      assert(restored.contains((123L, 2L)),
        s"state not restored across restart: $restored")
      q2.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
