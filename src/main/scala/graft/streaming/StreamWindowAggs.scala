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

  /** TUMBLE(1 day) per event_type as a streaming query, APPEND mode: each
    * window is emitted exactly once when the watermark passes its end, and
    * its state is evicted — bounded state, no re-materialization (the plan
    * an unbounded production job runs; complete mode would re-emit the whole
    * result every batch and retain all windows forever). The far-future
    * sentinel row closes the final windows for the bounded drain. */
  def tumble(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.eventsWithSentinel(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_tumble", "append")
      .where(col("event_type") =!= "__sentinel")
      .orderBy("w_start", "event_type")
  }

  /** Non-keyed tumbling window — the reference's windowAll /
    * AllWindowedStream path (DataStream.windowAll →
    * AllWindowedStream.aggregate, parallelism-1 in Flink): here the window
    * itself is the grouping key, so Catalyst's partial aggregation combines
    * map-side and only one row per window crosses the shuffle — the
    * single-threaded bottleneck the reference documents for windowAll does
    * not exist in this plan. Append mode: each day emits once the watermark
    * passes it. */
  def tumbleAll(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.eventsWithSentinel(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"),
        round(min("value"), 2).as("min_value"), round(max("value"), 2).as("max_value"))
      .select(col("w.start").as("w_start"), col("cnt"), col("sum_value"),
        col("min_value"), col("max_value"))
    StreamSource.runToTable(s, agg, "stream_tumble_all", "append")
      .orderBy("w_start")
  }

  /** Cascading streaming windows — hourly tumble feeding a daily tumble in
    * ONE streaming query (the reference's window-on-window composition,
    * GroupWindowSql.cascade's streaming twin). Spark's chained stateful
    * operators (SPARK-40925) accept the inner window struct as the outer
    * window's time column, carrying the watermark through both stages;
    * the inner aggregate collapses events to one row per hour BEFORE the
    * outer shuffle — the partial-reduction reason cascades exist at
    * scale. Append mode: each day emits once the watermark passes it. */
  def cascade(s: SparkSession, dir: String): DataFrame = {
    val hourly = StreamSource.eventsWithSentinel(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
    val daily = hourly
      .groupBy(window(col("w"), "1 day").as("d"))
      .agg(sum("cnt").as("cnt"), round(sum("sv"), 2).as("sum_value"))
      .select(col("d.start").as("d_start"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, daily, "stream_cascade", "append")
      .orderBy("d_start")
  }

  /** SESSION(gap 1 hour) per user as a streaming query (session_window +
    * watermark; state merges adjacent sessions like the reference's
    * session assigner + merge callback). Append mode: sessions emit once
    * closed by the watermark, state evicted. */
  def session(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.eventsWithSentinel(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_session", "append")
      .where(col("user_id") =!= -1L)
      .orderBy("user_id", "w_start")
  }

  /** HOP(1 day, slide 12h), append mode — each event in 2 windows. */
  def hop(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.eventsWithSentinel(s, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_hop", "append")
      .where(col("event_type") =!= "__sentinel")
      .orderBy("w_start", "event_type")
  }

  /** CUMULATE(1 day, step 6h) as a streaming query: the same sequence+
    * explode expansion as the batch operator feeds a streaming agg — the
    * reference's CumulativeWindowAssigner maps to expansion + windowed
    * state exactly like HOP does. Append mode over the expanded windows:
    * emitted when the watermark passes w_end (groupBy includes the
    * event-time day column so Spark tracks eviction on it). */
  def cumulate(s: SparkSession, dir: String): DataFrame = {
    val agg = StreamSource.eventsWithSentinel(s, dir)
      .withWatermark("ts", "1 hour")
      .withColumn("day", date_trunc("day", col("ts")))
      // half-open [start, end): floor+1 so a boundary row only joins
      // windows ending strictly after it (matches WindowAggs.cumulate)
      .withColumn("k0",
        (floor((unix_micros(col("ts")) - unix_micros(col("day"))) / lit(21600000000.0)).cast("int") + lit(1)))
      .withColumn("k", explode(expr("sequence(k0, 4)")))
      .groupBy(window(col("ts"), "1 day").as("w"), col("k"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"),
        (col("w.start").cast("long") + col("k") * lit(21600L)).cast("timestamp").as("w_end"),
        col("event_type"), col("cnt"), col("sum_value"))
    StreamSource.runToTable(s, agg, "stream_cumulate", "append")
      .where(col("event_type") =!= "__sentinel")
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
