package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional (two-phase-commit) file sinks — the exactly-once SINK
  * contract of the reference's Kafka producer
  * (FlinkKafkaProducer.java:101: pre-commit on checkpoint barrier, commit
  * on checkpoint-complete notification) and the rolling bucketed
  * StreamingFileSink (StreamingFileSink.java:92: in-progress part files,
  * bucket assignment, roll policy, commit on checkpoint), re-expressed on
  * Structured Streaming's epoch model:
  *
  *   phase 1 (prepare)  — the epoch's output is written to a staging
  *                        directory keyed by batchId; `mode(Overwrite)`
  *                        makes a failed attempt's retry self-cleaning;
  *   phase 2 (commit)   — one atomic rename makes the epoch visible; a
  *                        replayed epoch (same batchId after restart)
  *                        sees the committed target and drops itself.
  *
  * Spark's checkpoint (offset log + foreachBatch's exactly-once batchId
  * replay) plays the role of the reference's checkpoint coordinator: a
  * crash between prepare and commit replays the SAME epoch from the SAME
  * source offsets (FileTopic re-serves them deterministically), so output
  * is neither lost nor duplicated — the restart-mid-epoch spec
  * (TxFileSinkSpec) proves both directions.
  *
  * All paths go through Hadoop FileSystem/FileContext (FsCommit), so the
  * same code runs in local mode (unchanged behavior), on HDFS (atomic
  * renames), or — via the rolling sink's manifest commit point — on an
  * object store without atomic rename, same two phases. */
object TxFileSink {

  /** Test hooks: throw once after the named epoch's phase 1 / phase 2. */
  @volatile var failAfterStage: Option[Long] = None
  @volatile var failAfterCommit: Option[Long] = None

  private def maybeFail(hook: () => Option[Long], clear: () => Unit,
                        batchId: Long, where: String): Unit =
    if (hook().contains(batchId)) {
      clear()
      throw new RuntimeException(s"injected failure $where epoch $batchId")
    }

  /** foreachBatch body: stage the batch, then atomically publish it.
    * IO through FsCommit (Hadoop FS): local mode unchanged; HDFS gets a
    * namenode-atomic directory rename; an object store would point the
    * same call sites at the manifest variant below. */
  def commitEpoch(batch: DataFrame, batchId: Long, outDir: String): Unit = {
    import graft.sources.FsCommit
    val committed = s"$outDir/epoch-$batchId"
    if (FsCommit.exists(committed)) return // replayed, already-visible epoch: drop
    val staging = s"$outDir/_staging/epoch-$batchId"
    batch.write.mode("overwrite").parquet(staging) // phase 1
    maybeFail(() => failAfterStage, () => failAfterStage = None, batchId, "after staging")
    FsCommit.mkdirs(outDir)
    if (!FsCommit.renameIfAbsent(staging, committed) && !FsCommit.exists(committed))
      throw new java.io.IOException(s"commit rename failed for epoch $batchId")
    maybeFail(() => failAfterCommit, () => failAfterCommit = None, batchId, "after commit")
  }

  /** Everything committed; `_staging` is invisible to the glob. */
  def readCommitted(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(s"$outDir/epoch-*")

  // ------------------------------------------------- rolling bucketed sink

  /** Test hook: throw once mid-phase-2 (after `n` file renames) — the
    * partial-commit crash the replay must repair. */
  @volatile var failMidPublish: Option[(Long, Int)] = None

  /** StreamingFileSink semantics: rows are assigned to buckets (the date
    * path a production sink uses), part files roll at `maxRowsPerFile`,
    * and files become visible only on epoch commit. Layout after commit:
    * `<out>/<bucket>/part-<epoch>-<file>-<i>.parquet` + an
    * `_epoch-<N>.committed` marker making replay idempotent. File
    * contents are DETERMINISTIC (rows are rank-ordered by `orderCol`
    * inside a bucket before being split into files), so a partial
    * publish crash followed by replay re-creates byte-equivalent files
    * and finishes the remaining renames. */
  def rollingEpoch(batch: DataFrame, batchId: Long, outDir: String,
                   bucketCol: String, orderCol: String,
                   maxRowsPerFile: Int): Unit = {
    import graft.sources.FsCommit
    val marker = s"$outDir/_epoch-$batchId.committed"
    if (FsCommit.exists(marker)) return
    val staging = s"$outDir/_staging/epoch-$batchId"
    // deterministic file assignment: rank within bucket → file index
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bucketCol)).orderBy(col(orderCol))
    batch
      .withColumn("__file", ((row_number().over(w) - 1) / maxRowsPerFile).cast("int"))
      .repartition(col(bucketCol), col("__file"))
      .write.mode("overwrite").partitionBy(bucketCol, "__file").parquet(staging)
    maybeFail(() => failAfterStage, () => failAfterStage = None, batchId, "after staging")
    // phase 2: per-file renames into bucket-major layout, then the
    // MANIFEST publish — a single atomic small-file write listing the
    // epoch's (bucket, file) pairs. Readers resolve parts only through
    // manifests, so a mid-publish crash leaves the epoch invisible and
    // the deterministic replay finishes the remaining renames (on an
    // object store the renames become copies; the commit point — the
    // manifest — is unchanged).
    val bucketRe = s"$bucketCol=(.*)".r
    val fileRe = "__file=(\\d+)".r
    var renamed = 0
    val manifest = Seq.newBuilder[String]
    for {
      bName <- FsCommit.listDirs(staging).sorted
      bucket <- bName match { case bucketRe(v) => Some(v); case _ => None }
      fName <- FsCommit.listDirs(s"$staging/$bName").sorted
      fileIdx <- fName match { case fileRe(v) => Some(v.toInt); case _ => None }
      (part, i) <- FsCommit.list(s"$staging/$bName/$fName")
        .filter(_.endsWith(".parquet")).sorted.zipWithIndex
    } {
      FsCommit.mkdirs(s"$outDir/$bucket")
      val destName = f"part-$batchId-$fileIdx%05d-$i.parquet"
      FsCommit.renameOverwrite(s"$staging/$bName/$fName/$part",
        s"$outDir/$bucket/$destName")
      manifest += s"$bucket\t$destName"
      renamed += 1
      failMidPublish match {
        case Some((b, n)) if b == batchId && renamed >= n =>
          failMidPublish = None
          throw new RuntimeException(s"injected failure mid-publish epoch $batchId")
        case _ => ()
      }
    }
    FsCommit.writeAtomic(marker, manifest.result().mkString("\n"))
  }

  /** Read a rolling sink's committed output back with its bucket column.
    * Parts are resolved ONLY through epoch manifests (pure metadata,
    * object-store safe — no directory listing of data paths); files from
    * uncommitted epochs are invisible by construction. */
  def readRolling(s: SparkSession, outDir: String, bucketCol: String): DataFrame = {
    import graft.sources.FsCommit
    val markerRe = "_epoch-(\\d+)\\.committed".r
    val entries = FsCommit.list(outDir).collect { case n @ markerRe(_) => n }
      .flatMap(m => FsCommit.readString(s"$outDir/$m").split("\n").toSeq)
      .filter(_.nonEmpty)
      .map { line =>
        line.split("\t") match {
          case Array(bucket, file) => bucket -> s"$outDir/$bucket/$file"
          case _ => throw new java.io.IOException(
            s"corrupt rolling-sink manifest line under $outDir: '$line'")
        }
      }
    val frames = entries.groupBy(_._1).toSeq.sortBy(_._1).map { case (bucket, fs) =>
      s.read.parquet(fs.map(_._2): _*).withColumn(bucketCol, lit(bucket))
    }
    frames.reduceOption(_.unionByName(_))
      .getOrElse(s.emptyDataFrame)
  }

  // ------------------------------------------------------------- queries

  /** One deterministic topic per (app, events dir), produced executor-side
    * (each partition appends one segment — the "partition leader writes
    * its segment" shape; FileTopic.append is atomic per segment). */
  def ensureTopic(s: SparkSession, dir: String): String = synchronized {
    val topic = s"/tmp/graft-topic/${s.sparkContext.applicationId}-" +
      java.lang.Integer.toHexString(dir.hashCode)
    // Produce into a temp dir and rename on success: a totalRecords==0
    // gate is not atomic with production, so a job that dies after some
    // partitions appended would make later calls skip production and
    // serve a truncated topic forever. The dir rename is the commit.
    if (!graft.sources.FsCommit.exists(topic)) {
      val staging = topic + s".inprogress-${java.util.UUID.randomUUID}"
      graft.Tables(s, dir, "events")
        .select(col("user_id").cast("string").as("k"),
          concat_ws("|", col("event_id"), date_format(col("ts"), "yyyy-MM-dd")).as("v"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          graft.sources.FileTopic.append(staging,
            it.map(r => (r.getString(0), r.getString(1))).toSeq)
        }
      if (!graft.sources.FsCommit.renameIfAbsent(staging, topic) &&
          !graft.sources.FsCommit.exists(topic))
        throw new java.io.IOException(s"failed to publish topic $topic")
    }
    topic
  }

  /** Exactly-once pipeline: file topic → micro-batch stream → 2PC sink →
    * read committed → aggregate. The oracle recomputes from the events
    * table the topic was produced from — any duplicate or lost record
    * breaks the count/sum hash. */
  def exactlyOnce(s: SparkSession, dir: String): DataFrame = {
    val topic = ensureTopic(s, dir)
    val out = s"/tmp/graft-2pc/${s.sparkContext.applicationId}-" +
      java.lang.Integer.toHexString(dir.hashCode) + "-" + System.nanoTime()
    val q = graft.sources.FileTopic.readStream(s, topic)
      .writeStream
      .option("checkpointLocation", s"$out-ckpt")
      .foreachBatch { (b: DataFrame, id: Long) => commitEpoch(b, id, out) }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    readCommitted(s, out)
      .select(col("key"), split(col("value"), "\\|").getItem(0).cast("long").as("eid"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("eid")).as("sum_eid"))
      .orderBy(col("key"))
  }

  /** Rolling bucketed sink pipeline: topic → stream → date-bucketed
    * rolling files (committed on epoch) → read back → per-bucket stats. */
  def rollingSink(s: SparkSession, dir: String): DataFrame = {
    val topic = ensureTopic(s, dir)
    val out = s"/tmp/graft-rolling/${s.sparkContext.applicationId}-" +
      java.lang.Integer.toHexString(dir.hashCode) + "-" + System.nanoTime()
    // roll threshold scales with the corpus (a production sink rolls by
    // SIZE, not a fixed tiny row count): the events fixture spans ~30 day
    // buckets, so rows/90 targets ~3 part files per bucket at any SF —
    // multi-file rolling stays exercised while the benchmark measures
    // commit machinery rather than small-file churn
    val rollRows = math.max(200L,
      graft.Tables(s, dir, "events").count() / 90).toInt
    val q = graft.sources.FileTopic.readStream(s, topic)
      .select(col("key"), col("value"),
        split(col("value"), "\\|").getItem(1).as("day"))
      .writeStream
      .option("checkpointLocation", s"$out-ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        rollingEpoch(b, id, out, "day", "value", maxRowsPerFile = rollRows)
      }
      .start()
    try { q.processAllAvailable() } finally q.stop()
    readRolling(s, out, "day")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(split(col("value"), "\\|").getItem(0).cast("long")).as("sum_eid"))
      .orderBy(col("day"))
  }

  val sql: Map[String, String] = Map(
    "q_topic_exactly_once" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt,
        | CAST(sum(event_id) AS BIGINT) AS sum_eid
        |FROM events GROUP BY user_id ORDER BY key""".stripMargin,
    "q_stream_file_sink" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        | count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_eid
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
