package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. A short untimed warmup (one relational + one
  * vector query) absorbs JVM/codegen/parquet-footer cold start so the
  * timed numbers reflect steady-state per-query cost; queries run in
  * sorted name order for stable attribution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q1_agg", "q_ann_brute").foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that cache() internally (dedup/kmeans) must not leak those
      // partitions into the next query's timing/memory
      spark.catalog.clearCache()
      // streaming queries leave their HDFSBackedStateStoreProvider version
      // maps loaded after stop(); 60+ stream queries in one session accumulate
      // heap and GC pressure that taxes every later query. Unload them.
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      val rt = Runtime.getRuntime
      System.err.println(f"[bench] $name%-28s $dt%8.2fs heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%dMiB")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
