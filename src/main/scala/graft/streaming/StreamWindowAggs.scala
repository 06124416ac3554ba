package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming group-window aggregations (SURVEY.md §2.5).
  *
  * Same logical plans as graft.operators.WindowAggs, executed as streaming
  * queries with watermarks + the streaming-aggregation state store. Ref:
  * StreamExecGroupWindowAggregate / WindowOperator.java:98; Spark's
  * micro-batch engine plays the reference's MiniBatch role natively.
  *
  * Scale: streaming agg state is keyed by (window, key) — bounded by
  * watermark-driven eviction exactly like the reference's cleanup timers.
  */
object StreamWindowAggs {

  /** TUMBLE(1 day) per event_type as a streaming query. Complete mode
    * materializes the full result so the bounded replay equals the batch
    * answer (append mode would hold back windows the final watermark never
    * passes — semantically right for unbounded input, wrong for a drain). */
  def tumble(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.events(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_tumble", "complete")
      .orderBy("w_start", "event_type")
  }

  /** SESSION(gap 1 hour) per user as a streaming query (session_window +
    * watermark; state merges adjacent sessions like the reference's
    * session assigner + merge callback). */
  def session(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.events(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_session", "complete")
      .orderBy("user_id", "w_start")
  }

  /** HOP(1 day, slide 12h) as a streaming query — each event in 2 windows. */
  def hop(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.events(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_hop", "complete")
      .orderBy("w_start", "event_type")
  }

  /** CUMULATE(1 day, step 6h) as a streaming query: the same sequence+
    * explode expansion as the batch operator feeds a streaming agg — the
    * reference's CumulativeWindowAssigner maps to expansion + windowed
    * state exactly like HOP does. */
  def cumulate(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.events(s, dir)
      .withWatermark("ts", "1 hour")
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("k0",
        ceil((unix_micros(col("ts")) - unix_micros(col("day"))) / lit(21600000000.0)).cast("int"))
      .withColumn("k", explode(expr("sequence(greatest(k0, 1), 4)")))
      .groupBy(col("day").as("w_start"),
        (col("day").cast("long") + col("k") * lit(21600L)).cast("timestamp").as("w_end"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    StreamSource.runToTable(s, agg, "stream_cumulate", "complete")
      .orderBy("w_start", "w_end", "event_type")
  }

  /** Stream–stream interval join: purchases × views of the same user within
    * the preceding hour. This is exactly Spark's supported event-time-range
    * stream join (ref: TimeIntervalJoin.java:479 — state pruned by
    * watermark on both sides). Inner joins emit eagerly, so the bounded
    * drain yields the complete result. */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = StreamSource.events(s, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val joined = purchases.join(views,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("p_id"), col("v_id"))
    StreamSource.runToTable(s, joined, "stream_interval_join", "append")
      .orderBy("user_id", "p_id", "v_id")
  }
}
