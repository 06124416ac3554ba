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
}
