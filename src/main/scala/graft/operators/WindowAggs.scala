package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL group-window aggregations over the `events` table (SURVEY.md §2.5):
  * TUMBLE / HOP / SESSION / CUMULATE.
  *
  * Reference: flink-table-runtime-blink operators/window/WindowOperator.java:98
  * with assigners/ (Tumbling, Sliding, Session, Cumulative). Spark expresses
  * tumble/slide via `window()` and sessions via `session_window()` — the
  * assigner becomes an expression producing the window struct, the agg is an
  * ordinary two-phase HashAggregate keyed by (window, keys). At 100 TB the
  * shuffle key space is windows × keys, which auto-balances; HOP/CUMULATE
  * replicate rows per overlapping window (size/slide ×) exactly like the
  * reference's pane-less assigners.
  *
  * These are the batch shapes; graft.streaming.StreamWindowAggs runs the
  * same plans as Structured Streaming queries.
  */
object WindowAggs {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** TUMBLE(ts, 1 day) per event_type. */
  def tumble(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** HOP(ts, size 1 day, slide 12 hours) — each event lands in 2 windows. */
  def hop(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** SESSION(ts, gap 1 hour) per user: window = [min_ts, max_ts + gap). */
  def session(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("cnt"), col("sum_value"))
      .orderBy("user_id", "w_start")

  /** CUMULATE(ts, max 1 day, step 6 hours): growing windows
    * [day, day+6h), [day, day+12h), [day, day+18h), [day, day+24h);
    * an event is in every window whose end is after its timestamp.
    * No Spark built-in assigner — expand via sequence + explode
    * (ref assigner: CumulativeWindowAssigner). */
  def cumulate(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("day", date_trunc("day", col("ts")))
      // k-th window end = day + k*6h for k in [floor(offset/6h)+1 .. 4]:
      // windows are half-open [start, end), so a row exactly on a step
      // boundary belongs only to windows ending strictly after it.
      // Integer-microsecond arithmetic matches DuckDB's epoch_us exactly.
      .withColumn("k0",
        (floor((unix_micros(col("ts")) - unix_micros(col("day"))) / lit(21600000000.0)).cast("int") + lit(1)))
      .withColumn("k", explode(expr("sequence(k0, 4)")))
      .groupBy(col("day").as("w_start"),
        (col("day").cast("long") + col("k") * lit(21600L)).cast("timestamp").as("w_end"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .orderBy("w_start", "w_end", "event_type")

  /** Interval (time-bounded) join: each purchase matched to the same user's
    * view events in the preceding hour. Ref: TimeIntervalJoin.java /
    * StreamExecIntervalJoin.scala:54 — in batch this is an equi-join with a
    * range predicate; Spark shuffles on user_id and filters the range. */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"), col("ts").as("v_ts"))
    purchases.join(views,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("p_id"), col("v_id"))
      .orderBy("user_id", "p_id", "v_id")
  }

  /** Custom-operator as-of join (graft.plans.AsOfJoin: LogicalPlan +
    * SparkStrategy + co-partitioned sort-merge SparkPlan) on the same
    * probe/build split as asOfJoin below — the two implementations must
    * agree (AsOfJoinSpec) and both match DuckDB's ASOF JOIN oracle. */
  def asOfJoinCustom(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin(purchases, views, "user_id", "v_user", "p_ts", "v_ts")
      .select(col("user_id"), col("p_id"), col("v_id"))
      .orderBy("user_id", "p_id")
  }

  /** Event-time as-of join (batch form): each purchase joined to the same
    * user's latest view at-or-before it. Ref: TemporalRowTimeJoinOperator
    * .java:77 — the batch equivalent is DuckDB's ASOF JOIN; Spark-side we
    * union the tagged streams, sort per key by time, and carry the last
    * build-side version forward with a window `last_value(ignoreNulls)`.
    * One shuffle on user_id; no range-join blowup. */
  def asOfJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, dir)
    // tag: build side (views) sorts before probe (purchases) at equal ts
    val tagged = e.where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "view", col("event_id")).as("v_id"),
        when(col("event_type") === "purchase", lit(1)).otherwise(0).as("is_probe"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_view", last(col("v_id"), ignoreNulls = true).over(w))
      .where(col("is_probe") === 1)
      .select(col("user_id"), col("event_id").as("p_id"), col("last_view").as("v_id"))
      .orderBy("user_id", "p_id")
  }
}
