package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Ordered async I/O (SURVEY.md §2.9: AsyncDataStream.orderedWait /
  * AsyncTableFunction — per-record calls to an external service with
  * bounded in-flight parallelism, results emitted in input order).
  *
  * Spark shape: mapPartitions with a sliding window of Futures — up to
  * `parallelism` requests in flight per partition; completion is awaited
  * in input order, so output order and per-partition memory (the window)
  * are both bounded. Total in-flight across the cluster =
  * parallelism × partitions, the same backpressure model as the
  * reference's ordered async operator. The I/O function runs on the
  * caller-supplied ExecutionContext (an async HTTP/DB client pool in
  * production; a worker pool in tests). */
object AsyncMap {

  def ordered[T, U: Encoder](ds: Dataset[T], parallelism: Int)(
      f: T => Future[U]): Dataset[U] = {
    require(parallelism >= 1)
    ds.mapPartitions { it =>
      new Iterator[U] {
        private val window = scala.collection.mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (window.size < parallelism && it.hasNext) window.enqueue(f(it.next()))
        override def hasNext: Boolean = { fill(); window.nonEmpty }
        override def next(): U = {
          fill()
          Await.result(window.dequeue(), Duration.Inf)
        }
      }
    }
  }

  /** Sync LOOKUP JOIN (ref LookupJoin on a bounded dimension): a plain
    * broadcast-hash join — Spark's torrent broadcast ships the dimension
    * to executors (no driver-side collect into user code, and the
    * broadcast-size guardrails stay in force), and the probe side streams
    * through codegen. This is the plan a lookup join should compile to
    * whenever the dimension is a table Spark can read. */
  def lookupJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
    val dim = graft.Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val probes = graft.Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"))
    probes.join(broadcast(dim), probes("user_id") === dim("c_custkey"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .orderBy("event_id")
  }

  /** Async LOOKUP JOIN (ref LookupJoin / AsyncTableFunction with a lookup
    * cache, and the file-backed dimension cache of the reference's hive
    * lookup join): every probe row calls the lookup service through the
    * ordered async window; the service's cache is built EXECUTOR-SIDE on
    * first probe by reading the dimension parquet directly from the shared
    * filesystem (LookupCache) — the driver never collects the dimension,
    * so dimension size is bounded per executor, not per driver, and a
    * 1000-executor cluster warms caches in parallel. */
  def lookupJoinAsync(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    import scala.concurrent.ExecutionContext.Implicits.global
    val dimPath = s"$dir/customer.parquet"
    val probes = graft.Tables(s, dir, "events")
      .select(col("event_id"), col("user_id")).as[(Long, Long)]
    ordered(probes, parallelism = 8) { case (eid, uid) =>
      Future {
        (eid, uid, LookupCache.segmentByCustkey(dimPath).getOrElse(uid, "UNKNOWN"))
      }
    }.toDF("event_id", "user_id", "segment").orderBy("event_id")
  }
}

/** Executor-side dimension cache for the async lookup join: one
  * `Map[custkey, mktsegment]` per (JVM, dimension path), built lazily by
  * reading the dimension's parquet files with parquet-mr — the same
  * "each task loads the dimension files into an in-memory cache" shape as
  * the reference's file-system lookup function. Never touches the driver;
  * concurrent probes on one executor share a single load. */
object LookupCache {
  private val caches =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Long, String]]()

  def segmentByCustkey(path: String): Map[Long, String] =
    caches.computeIfAbsent(path, load)

  private val load = new java.util.function.Function[String, Map[Long, String]] {
    override def apply(path: String): Map[Long, String] = {
      import org.apache.parquet.hadoop.ParquetReader
      import org.apache.parquet.hadoop.example.GroupReadSupport
      val files = {
        val f = new java.io.File(path)
        if (f.isDirectory)
          f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
        else Array(path)
      }
      val out = Map.newBuilder[Long, String]
      files.foreach { file =>
        val reader = ParquetReader
          .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(file))
          .build()
        try {
          var g = reader.read()
          while (g != null) {
            out += g.getLong("c_custkey", 0) -> g.getString("c_mktsegment", 0)
            g = reader.read()
          }
        } finally reader.close()
      }
      out.result()
    }
  }
}
