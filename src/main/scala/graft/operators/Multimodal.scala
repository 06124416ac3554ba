package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver-mandated extension, SURVEY.md §7).
  *
  * Media payloads are opaque `binary` columns + typed metadata structs.
  * The decode step is a deterministic STUB (this container has no image/
  * audio codecs — see builder contract); everything around it is the real
  * Spark shape a production pipeline needs:
  *  - typed Dataset[MediaRow] with a case-class Encoder,
  *  - partition-wise batched processing via mapPartitions (the Scala analog
  *    of `mapInPandas`: one iterator per partition, batch-local librarys
  *    state amortized across the batch),
  *  - metadata as a first-class struct column,
  *  - frame sampling as a generator (explode) — no driver collect.
  *
  * At 100 TB: binary payloads dominate size → `spark.sql.files.
  * maxPartitionBytes` bounds per-task memory; decode parallelism = input
  * splits; column pruning drops the binary column for metadata-only queries.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, data: Array[Byte])
  case class DecodedRow(doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** The corpus-as-media table: text bytes standing in for image payloads. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("data"))

  /** Deterministic fake "decode": metadata derived purely from payload
    * length, so the DuckDB oracle can reproduce it. A real deployment swaps
    * the body of `decodeOne` for an image codec — the operator shape
    * (batched mapPartitions over binary) is unchanged. */
  def decodeOne(r: MediaRow): DecodedRow = {
    val n = r.data.length
    DecodedRow(r.doc_id, n,
      width = 64 + n % 577,
      height = 64 + (n * 31) % 421,
      n_frames = 1 + n % 7)
  }

  def decodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions { it =>
        // batch shape: amortize per-partition setup (codec init in real life)
        it.grouped(256).flatMap(batch => batch.iterator.map(decodeOne))
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Resize planning: target box 224x224 preserving aspect ratio (integer
    * arithmetic so the oracle reproduces it; a real codec would also emit
    * the resized payload). floor semantics: scaled = dim * 224 / max(w,h). */
  def resizeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions(_.map(decodeOne))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        (col("width") * 224 / greatest(col("width"), col("height"))).cast("int").as("out_w"),
        (col("height") * 224 / greatest(col("width"), col("height"))).cast("int").as("out_h"))
      .orderBy("doc_id")
  }

  /** Feature extraction stub: an 8-dim feature vector from the payload via
    * per-band byte histograms (deterministic; a real extractor swaps the
    * band statistic for model output — the schema/partitioning contract is
    * identical). Band b = count of payload bytes with value % 8 == b. */
  def featureStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions(_.map { r =>
        val bands = new Array[Long](8)
        r.data.foreach(b => bands((b & 0xff) % 8) += 1)
        (r.doc_id, bands.toSeq)
      })
      .toDF("doc_id", "features")
      // serialized to a comma-joined string for the oracle compare (the
      // driver's pandas hash can't sort array cells; bigint text is stable)
      .select(col("doc_id"),
        array_join(col("features").cast("array<string>"), ",").as("features"))
      .orderBy("doc_id")
  }

  /** Frame sampling: one output row per sampled frame, frame identity =
    * md5(doc fingerprint + frame index). Generator-based — never collects. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions(_.map(decodeOne))
      .toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))).as("frame_key"))
      .orderBy("doc_id", "frame_idx")
  }
}
