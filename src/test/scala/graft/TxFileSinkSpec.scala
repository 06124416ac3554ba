package graft

import graft.sources.FileTopic
import graft.streaming.TxFileSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end exactly-once: replayable offset source (FileTopic DSv2
  * micro-batch stream) + two-phase-commit sink, under injected crashes at
  * every dangerous point of the epoch protocol — the contract of the
  * reference's Kafka source/sink pair (offsets + 2PC) and the recovery
  * behavior its checkpoint coordinator guarantees. */
class TxFileSinkSpec extends SparkSpec {

  private def freshDirs(tag: String): (String, String, String) = {
    val base = s"/tmp/graft-txspec/$tag-${System.nanoTime()}"
    (s"$base/topic", s"$base/out", s"$base/ckpt")
  }

  private def startSink(topic: String, out: String, ckpt: String) =
    FileTopic.readStream(spark, topic)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) => TxFileSink.commitEpoch(b, id, out) }
      .start()

  private def committedKeys(out: String): Seq[String] =
    TxFileSink.readCommitted(spark, out)
      .select("key").collect().map(_.getString(0)).sorted.toSeq

  test("file topic source replays offset ranges deterministically") {
    val (topic, _, _) = freshDirs("replay")
    FileTopic.append(topic, (1 to 5).map(i => (s"k$i", s"v$i")))
    FileTopic.append(topic, (6 to 9).map(i => (s"k$i", s"v$i")))
    assert(FileTopic.totalRecords(topic) === 9)
    // segment index answers range planning without opening files
    val segs = FileTopic.segments(topic)
    assert(segs.map(s => (s._2, s._3)) === Seq((0L, 5L), (5L, 4L)))
    // a full read sees dense offsets 0..8 with the appended payloads
    val (_, out, ckpt) = freshDirs("replay-run")
    val q = startSink(topic, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val rows = TxFileSink.readCommitted(spark, out)
      .orderBy("offset").collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 8L))
    assert(rows.map(_.getString(1)).toSeq === (1 to 9).map(i => s"k$i"))
  }

  test("crash between prepare and commit: epoch is replayed, output appears exactly once") {
    val (topic, out, ckpt) = freshDirs("prep-crash")
    FileTopic.append(topic, Seq(("a", "1"), ("b", "2")))
    val q1 = startSink(topic, out, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    FileTopic.append(topic, Seq(("c", "3"), ("d", "4")))
    TxFileSink.failAfterStage = Some(1L) // epoch 1 dies after phase 1
    val q2 = startSink(topic, out, ckpt)
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    assert(committedKeys(out) === Seq("a", "b"), "uncommitted epoch must stay invisible")

    // restart from the same checkpoint: epoch 1 replays the SAME offsets
    val q3 = startSink(topic, out, ckpt)
    try q3.processAllAvailable() finally q3.stop()
    assert(committedKeys(out) === Seq("a", "b", "c", "d")) // no loss, no dupes
  }

  test("crash after commit but before the epoch is acknowledged: replay drops itself") {
    val (topic, out, ckpt) = freshDirs("ack-crash")
    FileTopic.append(topic, Seq(("a", "1"), ("b", "2")))
    TxFileSink.failAfterCommit = Some(0L) // visible, but Spark never hears back
    val q1 = startSink(topic, out, ckpt)
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(committedKeys(out) === Seq("a", "b"), "commit happened before the crash")

    val q2 = startSink(topic, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(committedKeys(out) === Seq("a", "b"), "replayed epoch must not duplicate")
  }

  test("rolling bucketed sink: date buckets, bounded part files, mid-publish crash repaired") {
    val base = s"/tmp/graft-txspec/rolling-${System.nanoTime()}"
    val (topic, out, ckpt) = (s"$base/topic", s"$base/out", s"$base/ckpt")
    // two buckets, enough rows to force rolling at 3 rows/file
    FileTopic.append(topic, (1 to 8).map(i => (s"k$i", s"$i|2024-01-01")) ++
      (9 to 12).map(i => (s"k$i", s"$i|2024-01-02")))
    def start() = FileTopic.readStream(spark, topic)
      .select(col("key"), col("value"), split(col("value"), "\\|").getItem(1).as("day"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        TxFileSink.rollingEpoch(b, id, out, "day", "value", maxRowsPerFile = 3)
      }.start()

    TxFileSink.failMidPublish = Some((0L, 2)) // die after 2 of the renames
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(TxFileSink.readRolling(spark, out, "day").count() === 0,
      "no marker → nothing is committed-visible")

    val q2 = start() // replay repairs the partial publish
    try q2.processAllAvailable() finally q2.stop()
    val rows = TxFileSink.readRolling(spark, out, "day")
    assert(rows.count() === 12)
    assert(rows.groupBy("day").count().orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("2024-01-01", 8L), ("2024-01-02", 4L)))
    // every committed part file respects the roll bound
    val sizes = for {
      b <- new java.io.File(out).listFiles.toSeq
      if b.isDirectory && !b.getName.startsWith("_")
      f <- b.listFiles.toSeq if f.getName.endsWith(".parquet")
    } yield spark.read.parquet(f.getPath).count()
    assert(sizes.nonEmpty && sizes.forall(_ <= 3), sizes.toString)
  }

  test("compaction: merges small files transactionally, crash-safe, composes with later epochs") {
    val base = s"/tmp/graft-txspec/compact-${System.nanoTime()}"
    val (topic, out, ckpt) = (s"$base/topic", s"$base/out", s"$base/ckpt")
    FileTopic.append(topic, (1 to 9).map(i => (s"k$i", s"$i|2024-01-01")) ++
      (10 to 15).map(i => (s"k$i", s"$i|2024-01-02")))
    def start(ck: String) = FileTopic.readStream(spark, topic)
      .select(col("key"), col("value"), split(col("value"), "\\|").getItem(1).as("day"))
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: DataFrame, id: Long) =>
        TxFileSink.rollingEpoch(b, id, out, "day", "value", maxRowsPerFile = 3)
      }.start()
    val q = start(ckpt); try q.processAllAvailable() finally q.stop()

    def partFiles(): Seq[String] = for {
      b <- new java.io.File(out).listFiles.toSeq
      if b.isDirectory && !b.getName.startsWith("_")
      f <- b.listFiles.toSeq if f.getName.endsWith(".parquet")
    } yield s"${b.getName}/${f.getName}"
    val before = TxFileSink.readRolling(spark, out, "day")
      .orderBy("value").collect().toSeq
    val filesBefore = partFiles().size
    assert(filesBefore >= 5, s"rolling should have produced small files: $filesBefore")

    // crash BEFORE the compaction marker publishes: old state stays exactly
    // readable, orphan compacted files are invisible (manifest resolution)
    TxFileSink.failBeforeCompactPublish = true
    intercept[Exception] {
      TxFileSink.compact(spark, out, "day", "value", targetRowsPerFile = 1000)
    }
    assert(TxFileSink.readRolling(spark, out, "day")
      .orderBy("value").collect().toSeq === before,
      "crashed compaction must be invisible")

    // the re-run publishes; content identical, each bucket one file
    TxFileSink.compact(spark, out, "day", "value", targetRowsPerFile = 1000)
    assert(TxFileSink.readRolling(spark, out, "day")
      .orderBy("value").collect().toSeq === before,
      "compaction must preserve content exactly")
    val compacted = partFiles()
    assert(compacted.size === 2 && compacted.forall(_.contains("compact-")),
      s"each bucket should collapse to one compacted file: $compacted")

    // epochs committed AFTER the compaction compose on top of it
    FileTopic.append(topic, Seq(("k16", "16|2024-01-02"), ("k17", "17|2024-01-03")))
    val q2 = start(ckpt); try q2.processAllAvailable() finally q2.stop()
    val after = TxFileSink.readRolling(spark, out, "day")
    assert(after.count() === 17)
    assert(after.groupBy("day").count().orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("2024-01-01", 9L), ("2024-01-02", 7L), ("2024-01-03", 1L)))

    // a second generation supersedes the first AND the post-compact epoch
    TxFileSink.compact(spark, out, "day", "value", targetRowsPerFile = 1000)
    assert(TxFileSink.readRolling(spark, out, "day").count() === 17)
    assert(partFiles().size === 3, partFiles().toString)

    // marker retirement: once a superseded manifest's data files are gone,
    // the janitor deletes the marker itself, so the supersede set — and
    // every future cleanup's manifest re-reads — stay O(live markers)
    // rather than growing with every epoch ever committed (no O(n²)
    // lifetime cost for a nightly-compaction sink)
    def markers(): Seq[String] = new java.io.File(out).listFiles.toSeq
      .map(_.getName).filter(n => n.startsWith("_epoch-") || n.startsWith("_compact-"))
      .filter(_.endsWith(".committed")).sorted
    val gen2 = markers()
    assert(gen2 === Seq("_compact-2.committed"),
      s"retired epoch + gen-1 markers must be deleted after cleanup: $gen2")
    // and the retirement didn't break resolution or a further generation
    FileTopic.append(topic, Seq(("k18", "18|2024-01-03")))
    val q3 = start(ckpt); try q3.processAllAvailable() finally q3.stop()
    assert(TxFileSink.readRolling(spark, out, "day").count() === 18)
    TxFileSink.compact(spark, out, "day", "value", targetRowsPerFile = 1000)
    assert(TxFileSink.readRolling(spark, out, "day").count() === 18)
    assert(markers() === Seq("_compact-3.committed"), markers().toString)
  }

  test("renameIfAbsent: racing directory committers — exactly one wins, content never mixed") {
    import graft.sources.FsCommit
    val base = s"/tmp/graft-txspec/race-${System.nanoTime()}"
    val dst = s"$base/epoch-0"
    new java.io.File(base).mkdirs()
    val n = 16
    // each committer stages a dir whose single file names the committer —
    // a lost race that silently replaced the winner would change the name
    val stagings = (0 until n).map { i =>
      val d = new java.io.File(s"$base/_staging-$i"); d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, s"payload-$i.txt").toPath, s"committer-$i")
      d.getPath
    }
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = stagings.map { s =>
        pool.submit(new Runnable {
          def run(): Unit = {
            barrier.await()
            if (FsCommit.renameIfAbsent(s, dst)) wins.incrementAndGet()
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() === 1, "exactly one committer may win the publish")
    val published = new java.io.File(dst).listFiles().map(_.getName).toSeq
    assert(published.length === 1)
    // the winner's payload file is intact and self-consistent
    val content = java.nio.file.Files.readString(
      new java.io.File(dst, published.head).toPath)
    assert(s"payload-${content.stripPrefix("committer-")}.txt" === published.head,
      s"published dir mixes committers: $published -> $content")
    // losers' staging dirs are untouched (caller cleans them up)
    assert(stagings.count(s => new java.io.File(s).exists()) === n - 1)
  }

  test("renameIfAbsent: racing file committers — link(2) O_EXCL picks one winner") {
    import graft.sources.FsCommit
    val base = s"/tmp/graft-txspec/frace-${System.nanoTime()}"
    new java.io.File(base).mkdirs()
    val dst = s"$base/marker.committed"
    val n = 16
    val srcs = (0 until n).map { i =>
      val f = new java.io.File(base, s"attempt-$i")
      java.nio.file.Files.writeString(f.toPath, s"writer-$i")
      f.getPath
    }
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = srcs.zipWithIndex.map { case (s, i) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            barrier.await()
            if (FsCommit.renameIfAbsent(s, dst)) { winners.add(i); () }
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    assert(winners.size === 1, s"exactly one writer may win: $winners")
    val w = winners.iterator().next()
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(dst)) === s"writer-$w",
      "published content must be the winner's, never a later replacement")
    // winner's source name is gone; losers keep theirs
    assert(!new java.io.File(srcs(w)).exists())
    assert(srcs.zipWithIndex.count { case (s, i) => i != w && new java.io.File(s).exists() } === n - 1)
  }
}
