package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Dataset, Encoder}

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

  /** Async LOOKUP JOIN (ref LookupJoin / AsyncTableFunction with an async
    * lookup cache): every probe row calls the lookup service through the
    * ordered async window; the dimension here is a broadcast snapshot map
    * (the production analog keeps an async client + LRU cache per
    * executor — same operator shape, different `f`). Driver collects only
    * the DIMENSION (small by the lookup-join contract), never the probe. */
  def lookupJoin(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.col
    import scala.concurrent.ExecutionContext.Implicits.global
    val dim = graft.Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
      .collect().toMap
    val bc = s.sparkContext.broadcast(dim)
    val probes = graft.Tables(s, dir, "events")
      .select(col("event_id"), col("user_id")).as[(Long, Long)]
    ordered(probes, parallelism = 8) { case (eid, uid) =>
      Future { (eid, uid, bc.value.getOrElse(uid, "UNKNOWN")) }
    }.toDF("event_id", "user_id", "segment").orderBy("event_id")
  }
}
