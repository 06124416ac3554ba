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

  /** 60-bit average hash of a binary payload — the perceptual-dup
    * fingerprint (aHash): average-pool the byte stream into 60 cells,
    * threshold each cell against the global mean, pack the bits. With a
    * real codec the pooling runs over 8×8 grayscale pixels; the byte-slice
    * pooling here is the same computation over the stub payload, and the
    * banding/verify machinery downstream is codec-agnostic. */
  def aHash60(data: Array[Byte]): Long = {
    val n = data.length
    val px = new Array[Long](60)
    var i = 0
    while (i < 60) {
      val lo = i * n / 60; val hi = (i + 1) * n / 60
      if (hi > lo) {
        var sm = 0L; var j = lo
        while (j < hi) { sm += (data(j) & 0xffL); j += 1 }
        px(i) = sm / (hi - lo)
      }
      i += 1
    }
    val mean = px.sum / 60
    var hash = 0L
    i = 0
    while (i < 60) { if (px(i) > mean) hash |= 1L << i; i += 1 }
    hash
  }

  /** q_mm_phash — perceptual near-dup pairs over media payloads (the image
    * re-crawl dedup every multimodal corpus runs: aHash/pHash + Hamming
    * threshold). Fixture plants re-encode variants through the md5 bridge
    * (a localized 8-byte overlay — the watermark/corner-stamp analog; a
    * length-changing edit would shift the pooling grid like a crop does,
    * and indeed lands far from the original). Candidates by 4×15-bit
    * banding; Hamming ≤ 3 verification — pigeonhole makes 4 bands COMPLETE
    * at that threshold (≤ 3 flipped bits leave one band intact), so the
    * brute-force oracle's hash compare proves no pair is missed (the
    * 256-doc hot-bucket cap never binds on the fixture — spec-pinned —
    * so the proof is unconditional there). Scale shape: hashing is one
    * mapPartitions pass (codec-shaped); the join runs on 4 postings/doc
    * with 15-bit buckets, bucket cost capped — the simhash plan. */
  /** The media corpus q_mm_phash dedups: every document payload plus the
    * planted re-encode variants at doc_id + 3000000 (the re-crawl copies). */
  private[graft] def phashMedia(s: SparkSession, dir: String): DataFrame = {
    val mdi = "CAST(conv(substr(md5(concat('mv:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    base.union(
      base.where(expr(s"$mdi % 5 = 0"))
        .selectExpr("doc_id + 3000000 AS doc_id",
          "concat('xxxxxxxx', substr(text, 9)) AS text"))
      .select(col("doc_id"), col("text").cast("binary").as("data"))
  }

  def phashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = phashMedia(s, dir)
    val hashes = media.as[MediaRow]
      .mapPartitions(_.map(r => (r.doc_id, aHash60(r.data))))
      .toDF("doc_id", "ah")
      .localCheckpoint(true) // band postings + verify both read it
    val allChunks = hashes.select(col("doc_id"), col("ah"),
        explode(expr("transform(sequence(0, 3), " +
          "c -> struct(c AS chunk, shiftright(ah, 15*c) & 32767 AS cv))")).as("cc"))
      .select(col("doc_id"), col("ah"), col("cc.chunk"), col("cc.cv"))
    // hot-bucket cap (the minhash maxBucket convention): a band bucket of
    // m docs costs m² candidate rows, and a degenerate corpus whose hashes
    // CLUSTER (the k=100 rehearsal's inflated token soup produced 27M
    // sub-threshold pairs) would otherwise explode the self-join. No
    // fixture bucket comes near the cap, so the completeness proof holds
    // verbatim there (Round13Spec pins it); where the cap does bind, the
    // output degrades to what the uncapped bands still agree on — the
    // standard recall/cost dial every banded index ships with.
    val small = allChunks.groupBy(col("chunk"), col("cv"))
      .agg(count(lit(1)).as("bsz")).where(col("bsz") <= 256)
      .select(col("chunk"), col("cv"))
    val chunks = allChunks.join(small, Seq("chunk", "cv"))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.ah").bitwiseXOR(col("b.ah"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** q_mm_phash_keep — the PRODUCTION spelling of perceptual media dedup:
    * the pair list collapses to KEEP-SETS. Verified aHash pairs (Hamming
    * ≤ 3) → connected components → keep each cluster's MINIMUM doc_id,
    * emitted as one anti-join of the media universe against the dropped
    * set — the GPT-3/MassiveText pairs→components→keep-one pipeline
    * applied to the media path (same composition as
    * [[Dedup.minhashClusterKeep]]). The point at scale: a saturated
    * cluster of m re-encodes costs the PAIR list O(m²) rows (the k=100
    * rehearsal measured 26.1M), while the keep-set emits exactly m − 1
    * drops — output is linear in cluster size by construction
    * (Round14Spec pins the saturation case). Same size-guarded plan flip
    * as the MinHash twin: driver union-find under 2M pairs, distributed
    * min-label CC above. */
  def phashKeep(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterKeepFrom(phashPairs(s, dir),
      phashMedia(s, dir).select(col("doc_id")))

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
