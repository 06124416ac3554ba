package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert / retracting sink via `foreachBatch` (SURVEY.md §7.1 item M5:
  * the changelog layer's terminal operator; ref FileSystemTableSink +
  * upsert Kafka/JDBC sinks).
  *
  * Each micro-batch's changelog rows are MERGEd into a keyed target: the
  * latest +I/+U per key wins, a trailing -D deletes the key. The target
  * here is an in-memory keyed store per query (production: Delta/Iceberg
  * MERGE INTO or a JDBC upsert — same per-batch merge contract, which is
  * exactly what exactly-once upsert sinks need: batch id + idempotent
  * merge). */
object UpsertSink {

  /** target state: query name -> (key -> value row) */
  private val targets =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Long, Long]]()

  def table(name: String): Map[Long, Long] =
    targets.getOrDefault(name, Map.empty)

  /** Run a changelog stream (user_id, event_id, rowkind) to completion,
    * merging every batch into the keyed target; returns the final table
    * as (user_id, event_id). */
  def runUpsert(s: SparkSession, changelog: DataFrame, name: String): DataFrame = {
    targets.remove(name)
    val q = changelog.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"/tmp/graft-ckpt/$name-${System.nanoTime()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch merge: apply the batch's changelog in row order per key
        val rows = batch.select("user_id", "event_id", "rowkind").collect()
        var cur = targets.getOrDefault(name, Map.empty)
        rows.foreach { r =>
          val (k, v, kind) = (r.getLong(0), r.getLong(1), r.getString(2))
          kind match {
            case "+I" | "+U" => cur = cur + (k -> v)
            case "-D"        => cur = cur - k
            case "-U"        => () // retract of the previous image; +U follows
          }
        }
        targets.put(name, cur)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    import s.implicits._
    table(name).toSeq.toDF("user_id", "event_id").orderBy("user_id")
  }
}
