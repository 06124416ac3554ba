package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-side access to the driver's `events` table and the
  * run-to-completion harness used by the Verify entries.
  *
  * The driver's correctness gate calls `(SparkSession, sfDir) => DataFrame`;
  * streaming operators satisfy it by running a REAL Structured Streaming
  * query over the events file (file source → operator → memory sink),
  * draining it with processAllAvailable, and returning the sink table.
  * The plan that runs is the same micro-batch plan a production job runs —
  * state store, watermarks and all; only the source (file replay) and sink
  * (memory) are test doubles. Flink analog: bounded execution of a
  * streaming pipeline (flink-streaming-java bounded sources).
  */
object StreamSource {

  /** Typed event row (ts already truncated to micros by graft.Tables). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** `$dir/events.parquet` is a single FILE in the driver testdata but a
    * part-file DIRECTORY when written by Spark (the scale rehearsals);
    * stream (path, glob) that matches either layout. */
  private def eventsStreamPath(dir: String): (String, String) = {
    val p = s"$dir/events.parquet"
    if (new java.io.File(p).isDirectory) (p, "*.parquet") else (dir, "events.parquet")
  }

  /** events as an unbounded DataFrame via the parquet file-stream source. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // file source needs an explicit schema: take it from the batch reader
    // (cached per JVM+path — r16, the Tables.cachedSchema discipline), then
    // normalize ts the same schema-adaptive way as graft.Tables
    // (the generator has shipped both nanos-as-long and micros drops)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.Tables.cachedSchema(s, s"$dir/events.parquet")
    val (path, glob) = eventsStreamPath(dir)
    graft.Tables.normalizeTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(path))
  }

  def eventsTyped(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    events(s, dir).select("event_id", "ts", "user_id", "event_type", "value").as[Event]
  }

  /** events stream unioned with a one-row far-future sentinel so the final
    * watermark passes every real window: append-mode window aggregations then
    * emit each closed window exactly once with watermark-bounded state — the
    * plan an unbounded production job runs (Flink analog: event-time windows
    * firing on watermark passage + cleanup timers, WindowOperator.java:98),
    * unlike complete mode which re-materializes all windows every batch and
    * retains state forever. Callers filter the sentinel key back out
    * (`event_type = '__sentinel'`, `user_id = -1`). */
  /** Per-JVM memo of the written sentinel fixture: (events dir) →
    * (events schema, sentinel parquet dir). r16 optimization (guide §1):
    * every sentinel-based streaming query re-ran the max(ts) scan AND
    * rewrote the one-row sentinel parquet before its stream even started —
    * a fixture-prep job inside the timed run. The events fixture is
    * immutable for the life of a JVM, so both are computed once; the memo
    * is in-process only (no cross-process reuse — a stale sentinel from an
    * older testdata drop can never leak into a new run). */
  private val sentinelMemo = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.sql.types.StructType, String)]

  def eventsWithSentinel(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (schema, sentinelDir) = sentinelMemo.getOrElseUpdate(dir,
      prepareSentinel(s, dir))
    val (path, glob) = eventsStreamPath(dir)
    val real = s.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(path)
    val sentinel = s.readStream.schema(schema).parquet(sentinelDir)
    graft.Tables.normalizeTs(real.union(sentinel))
  }

  private def prepareSentinel(s: SparkSession, dir: String):
      (org.apache.spark.sql.types.StructType, String) = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    val schema = raw.schema
    import org.apache.spark.sql.functions.max
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // sentinel ts = max(ts) + 30 days, expressed in the file's own ts type so
    // the sentinel parquet unions cleanly with the raw stream before the
    // shared normalizeTs pass
    val maxRow = raw.agg(max("ts")).head()
    // empty events: max(ts) is NULL — anchor the sentinel at the epoch so
    // the query still runs (and returns its empty result) instead of NPEing
    val empty = maxRow.isNullAt(0)
    val sentinelTs: Any = schema("ts").dataType match {
      case LongType =>
        (if (empty) 0L else maxRow.getLong(0)) + 30L * 24 * 3600 * 1000000000L
      case TimestampNTZType =>
        (if (empty) java.time.LocalDateTime.ofEpochSecond(0, 0, java.time.ZoneOffset.UTC)
         else maxRow.getAs[java.time.LocalDateTime](0)).plusDays(30)
      case TimestampType =>
        java.sql.Timestamp.from(
          (if (empty) java.time.Instant.EPOCH else maxRow.getTimestamp(0).toInstant)
            .plus(java.time.Duration.ofDays(30)))
      case other => throw new IllegalStateException(s"unsupported events.ts type $other")
    }
    val values: Array[Any] = schema.fields.map(_.name).map {
      case "event_id" => -1L
      case "ts" => sentinelTs
      case "user_id" => -1L
      case "event_type" => "__sentinel"
      case "value" => 0.0
      case _ => null
    }
    val sentinelDir = s"/tmp/graft-sentinel/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    s.createDataFrame(java.util.Arrays.asList(org.apache.spark.sql.Row(values: _*)), schema)
      .coalesce(1).write.mode("overwrite").parquet(sentinelDir)
    (schema, sentinelDir)
  }

  /** Typed sentinel stream with a 1-hour watermark: stateful operators
    * using EventTimeTimeout flush their buffers when the sentinel drives
    * the watermark past end-of-data. The sentinel row itself only reaches
    * key -1's group (and matches no real predicate). */
  def eventsTypedWithSentinel(s: SparkSession, dir: String,
                              delay: String = "1 hour"): Dataset[Event] = {
    import s.implicits._
    eventsWithSentinel(s, dir)
      .withWatermark("ts", delay)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
  }

  /** runToTable for CHAINED stateful operators (sortedEvents → operator):
    * Spark's global-watermark correctness check flags any stateful op
    * downstream of one that emits rows older than the watermark, because
    * a downstream op with watermark-based eviction COULD silently drop
    * them as late. The downstream stages here are NoTimeout
    * flatMapGroupsWithState over un-watermarked (operator-generated)
    * columns — they have no late-row predicate, so nothing is dropped;
    * the DuckDB oracle hash (exact row set) re-proves it per run. The
    * check is consulted only during query PLANNING (the unsupported-
    * operation walk at start()), so the session flag is restored the
    * moment start() returns — the window where a concurrently-planned
    * query could observe the flipped flag is the planning call itself,
    * not the whole run; the check stays ON for every other query. */
  def runToTableChained(s: SparkSession, df: DataFrame, name: String,
                        mode: String): DataFrame = {
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = s.conf.get(key, "true")
    s.conf.set(key, "false")
    runToTable(s, df, name, mode, afterStart = () => s.conf.set(key, prev))
  }

  /** Run `df` (a streaming DataFrame) to completion into a memory sink and
    * return the materialized result. `afterStart` runs as soon as the query
    * has been planned and started — even when start() itself throws.
    *
    * State-store sizing: each shuffle partition materializes one state-store
    * instance per stateful operator per batch (snapshot + fsync under the
    * checkpoint dir). For the bounded replays here that fixed cost dominates
    * the actual work, so streaming queries run with a smaller shuffle
    * fan-out; production unbounded jobs size this to key cardinality. */
  /** Streaming checkpoint root: tmpfs when the host has one. On a real
    * cluster the checkpoint store is remote (HDFS/object store) with its
    * own commit path; on this single-JVM host, per-batch fsyncs of tiny
    * state/offset files onto ext4 are pure fixture overhead taxing every
    * bounded replay. Crash durability is separately proven by
    * CheckpointRecoverySpec (own paths); nothing here reads a checkpoint
    * after process exit. */
  val ckptRoot: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-ckpt" else "/tmp/graft-ckpt"
  }

  def runToTable(s: SparkSession, df: DataFrame, name: String,
                 mode: String, afterStart: () => Unit = () => (),
                 // runs after the drain, before stop — the hook that lets
                 // callers read the query's final progress (state-store
                 // row counts for the TTL-bound demonstrations)
                 onDrained: StreamingQuery => Unit = _ => ()): DataFrame = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    // default 4 (was 8): measured at sf0.1, the replay-driven queries spend
    // their time in per-partition state-store lifecycle (snapshot + fsync
    // per stateful op per batch), so halving the fan-out cuts ~10-13% off
    // every streaming query (q_stream_dyn_session_ooo 7.12->6.22 s warm,
    // q_stream_tumble 2.21->2.01 s); 2 partitions re-serializes the work
    // and loses the gain. GRAFT_STREAM_SHUFFLE overrides for experiments.
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("GRAFT_STREAM_SHUFFLE", "4"))
    try {
      val q: StreamingQuery =
        try df.writeStream
          .format("memory").queryName(name).outputMode(mode)
          .option("checkpointLocation",
            s"$ckptRoot/$name-${System.nanoTime()}")
          .start()
        finally afterStart()
      q.processAllAvailable()
      // GRAFT_STREAM_PROGRESS=1: per-batch duration breakdown on stderr
      // (optimization-round measurement aid; off in normal runs)
      if (sys.env.contains("GRAFT_STREAM_PROGRESS"))
        q.recentProgress.foreach { p =>
          System.err.println(s"[stream-prof] $name batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs}")
        }
      onDrained(q)
      q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(name)
  }
}
