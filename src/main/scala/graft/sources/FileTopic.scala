package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A replayable, offset-addressed "topic" over append-only files — the
  * exactly-once SOURCE contract of the reference's Kafka consumer
  * (flink-connectors/flink-connector-kafka/.../FlinkKafkaConsumer.java:72:
  * checkpointed offsets + deterministic replay from an offset), built as a
  * Spark DSv2 `MicroBatchStream` so Structured Streaming checkpoints our
  * offsets exactly as it would Kafka's.
  *
  * Layout: `<dir>/segment-<startOffset>-<count>.jsonl`, each line one
  * record. Producers append whole segments atomically (tmp + rename), so
  * readers never observe a partial segment; record offsets are global and
  * dense, and the segment name carries the (startOffset, count) index —
  * `planInputPartitions(start, end)` maps an offset range onto segment
  * slices without opening any file.
  *
  * Schema: (offset BIGINT, key STRING, value STRING) — Kafka's triple.
  *
  * Exactly-once composition: this source re-serves the SAME records for
  * the SAME offset range on replay (determinism), Spark's checkpoint
  * persists the range per epoch (the offset log), and a transactional
  * sink (TwoPhaseCommitSink) makes epoch output visible atomically —
  * together, end-to-end exactly-once, the reference's
  * source-offsets + 2PC-sink architecture re-expressed. */
object FileTopic {

  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** Producer: atomically append one segment of (key, value) records.
    * All IO through FsCommit (Hadoop FS) — local mode unchanged, HDFS
    * deployment gets the same protocol with namenode-atomic claims. */
  def append(dir: String, records: Seq[(String, String)]): Unit = synchronized {
    if (records.isEmpty) return
    FsCommit.mkdirs(dir)
    val start = totalRecords(dir)
    val tmp = s"$dir/.segment-inprogress-${java.util.UUID.randomUUID}"
    val w = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(FsCommit.create(tmp), "UTF-8"))
    try records.foreach { case (k, v) =>
      w.println(s"${esc(k)}\t${esc(v)}")
    } finally w.close()
    val target = f"$dir/segment-$start%016d-${records.size}%08d.jsonl"
    // commit-if-absent rename: the COMPLETE tmp file becomes the segment
    // in one operation, so no reader can ever observe a partial or empty
    // segment (a claim-file approach would expose an empty visible
    // segment between claim and fill — phantom records on crash). A
    // racing producer's rename finds the target taken and aborts.
    if (!FsCommit.renameIfAbsent(tmp, target)) {
      FsCommit.delete(tmp)
      throw new java.io.IOException(s"append lost the race for $target")
    }
  }

  private def esc(s: String): String =
    if (s == null) "\u0000" else s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private[sources] def unesc(s: String): String =
    if (s == "\u0000") null
    else {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 't' => b.append('\t'); i += 2
            case 'n' => b.append('\n'); i += 2
            case '\\' => b.append('\\'); i += 2
            case other => b.append(other); i += 2
          }
        } else { b.append(c); i += 1 }
      }
      b.toString
    }

  /** (path, startOffset, count) for every committed segment, offset-ordered. */
  def segments(dir: String): Seq[(String, Long, Long)] = {
    val re = "segment-(\\d{16})-(\\d{8})\\.jsonl".r
    FsCommit.list(dir).flatMap {
      case n @ re(s, c) => Some((s"$dir/$n", s.toLong, c.toLong))
      case _ => None
    }.sortBy(_._2)
  }

  def totalRecords(dir: String): Long =
    segments(dir).lastOption.map(t => t._2 + t._3).getOrElse(0L)

  /** Streaming read of a topic. */
  def readStream(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    s.readStream.format(classOf[FileTopicProvider].getName)
      .option("path", dir).load()
}

class FileTopicProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FileTopic.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FileTopicTable(properties.get("path"))
}

class FileTopicTable(dir: String) extends Table with SupportsRead {
  require(dir != null, "file-topic needs .option(\"path\", dir)")
  override def name(): String = s"filetopic:$dir"
  override def schema(): StructType = FileTopic.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FileTopic.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FileTopicMicroBatchStream(dir)
      }
    }
}

/** Offset = count of records fully consumed (dense, total-ordered). */
case class TopicOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class FileTopicMicroBatchStream(dir: String) extends MicroBatchStream {
  override def initialOffset(): Offset = TopicOffset(0L)
  override def latestOffset(): Offset = TopicOffset(FileTopic.totalRecords(dir))
  override def deserializeOffset(json: String): Offset = TopicOffset(json.toLong)
  override def commit(end: Offset): Unit = () // retention is the producer's concern

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicOffset].n
    val e = end.asInstanceOf[TopicOffset].n
    // one partition per overlapping segment slice — splittable, no file opened
    FileTopic.segments(dir).flatMap { case (f, segStart, count) =>
      val lo = math.max(s, segStart)
      val hi = math.min(e, segStart + count)
      if (lo < hi) Some(FileTopicPartition(f, segStart, lo, hi): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[FileTopicPartition]
        new FileTopicReader(p)
      }
    }

  override def stop(): Unit = ()
}

case class FileTopicPartition(file: String, segStart: Long, lo: Long, hi: Long)
  extends InputPartition

class FileTopicReader(p: FileTopicPartition) extends PartitionReader[InternalRow] {
  // executor-side open through Hadoop FS: works for file://, hdfs://, s3a://
  private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
    FsCommit.open(p.file), "UTF-8"))
  private var pos = p.segStart - 1
  private var line: String = _

  override def next(): Boolean = {
    while (pos + 1 < p.lo) { reader.readLine(); pos += 1 } // skip to slice
    if (pos + 1 >= p.hi) return false
    line = reader.readLine()
    pos += 1
    line != null
  }

  override def get(): InternalRow = {
    val tab = line.indexOf('\t')
    val k = FileTopic.unesc(line.substring(0, tab))
    val v = FileTopic.unesc(line.substring(tab + 1))
    InternalRow(pos,
      if (k == null) null else UTF8String.fromString(k),
      if (v == null) null else UTF8String.fromString(v))
  }

  override def close(): Unit = reader.close()
}
