package graft

import graft.operators.{Similarity, TextAnalysis}

/** Round-13 pins: index-mined hard negatives ≡ the brute-force scan, and
  * the CCNet sketch-threshold tercile split's agreement with the exact
  * ntile split. */
class Round13Spec extends SparkSpec {

  test("hard negatives mined from the production IVF-PQ index ≡ brute-force top-5") {
    // VERDICT r12 task 4 (DPR mines from the live index): the ADC
    // shortlist at production parameters (K=256, nprobe=8, R=200) with a
    // label post-filter and exact re-rank must reproduce the brute scan's
    // top-5 per query EXACTLY on the fixture — the same equivalence the
    // driver oracle (q_ann_negatives_ix vs the brute SQL) hash-checks at
    // sf0.01.
    val brute = Similarity.annHardNegatives(spark, sf).collect().map(_.toSeq).toSeq
    val mined = Similarity.annHardNegativesIndexed(spark, sf).collect().map(_.toSeq).toSeq
    assert(brute.nonEmpty, "fixture produced no hard negatives")
    assert(mined === brute,
      "index-mined hard negatives diverged from the brute-force ranking")
  }

  test("CCNet sketch-threshold terciles agree ≥95% with the exact ntile split") {
    // Wenzek 2020 §4.3 buckets by percentile THRESHOLDS; the sketch twin
    // replaces the per-language sort with an HDR-cell histogram. The two
    // can only disagree for documents whose nats_u shares a threshold
    // CELL (the ≤1/16 relative-error band), so agreement stays high.
    val exact = TextAnalysis.ccnetBuckets(spark, sf)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sketch = TextAnalysis.ccnetBucketsSketch(spark, sf)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sketch.keySet === exact.keySet,
      "sketch split must cover exactly the scored documents")
    val agree = exact.count { case (id, b) => sketch(id) == b }
    val frac = agree.toDouble / exact.size
    assert(frac >= 0.95, f"sketch/ntile bucket agreement $frac%.3f < 0.95 " +
      s"($agree of ${exact.size})")
    // both splits are onto: every tercile non-empty in the sketch form
    val counts = sketch.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(Seq("head", "middle", "tail").forall(counts.getOrElse(_, 0) > 0),
      s"degenerate sketch split: $counts")
  }

  test("until() stops the loop at the stop event without consuming it") {
    // ref Pattern#until (docs/dev/libs/cep.md:449-456): an event matching
    // the stop condition is never accepted into the repetition; the next
    // step is tried AT that row. view,signup,purchase: plain A+ B swallows
    // the signup and matches, A+ until(signup) B cannot.
    import spark.implicits._
    import graft.streaming.{Cep, StreamSource}
    def ev(id: Long, sec: Int, u: Long, t: String) =
      StreamSource.Event(id, new java.sql.Timestamp(sec * 1000L), u, t, 1.0)
    val events = spark.createDataset(Seq(
      ev(1, 1, 1L, "view"), ev(2, 2, 1L, "signup"), ev(3, 3, 1L, "purchase"),
      // key 2: the stop event ends the run AFTER the closing purchase —
      // backtracking still finds the match the stop row doesn't block
      ev(4, 4, 2L, "view"), ev(5, 5, 2L, "purchase"), ev(6, 6, 2L, "signup"),
      // pattern-breaking tail rows so trailing attempts are decidable in
      // the batch-ordered matcher (no sentinel on this path)
      ev(7, 7, 1L, "error"), ev(8, 8, 2L, "error")))
    val a: StreamSource.Event => Boolean =
      e => e.event_type != "error" && e.event_type != "__sentinel"
    val b: StreamSource.Event => Boolean = _.event_type == "purchase"
    val plain = Seq(Cep.QStep.oneOrMore(a), Cep.QStep.once(b))
    val stopped = Seq(Cep.QStep.oneOrMore(a).copy(
      until = Some((e: StreamSource.Event) => e.event_type == "signup")),
      Cep.QStep.once(b))
    val plainGot = Cep.matchRecognizeOrderedSkip(events, plain,
      Cep.SkipPastLastRow).collect().map(_.ids).toSeq
    assert(plainGot === Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)),
      "plain A+ must swallow the signup")
    val stoppedGot = Cep.matchRecognizeOrderedSkip(events, stopped,
      Cep.SkipPastLastRow).collect().map(_.ids).toSeq
    assert(stoppedGot === Seq(Seq(4L, 5L)),
      "until(signup) must refuse the signup into the loop, killing match 1")
  }

  test("normalization-keyed dedup collapses variants raw exact dedup misses") {
    import graft.operators.Dedup
    val out = Dedup.normalizedDedup(spark, sf).collect()
    assert(out.nonEmpty)
    // planted recrawl variants (uppercased / accented / comma-injected)
    // have DIFFERENT raw fingerprints but the SAME normalized key: groups
    // with n_raw > 1 are exactly the duplicates a raw-text key misses
    val caught = out.count(r => r.getLong(2) > 1)
    assert(caught > 0, "no variant group collapsed — normalization not load-bearing")
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"n_copies < n_raw in $r")
    }
  }

  test("LSH calibration: TPs ⊆ candidates, recall/precision in range and non-vacuous") {
    import graft.operators.Dedup
    val r = Dedup.minhashEval(spark, sf).head()
    val (nTruth, nCand, nTp, prec, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nTruth > 0 && nCand > 0, "vacuous fixture")
    assert(nTp <= nCand, "verified TPs must be a subset of candidates")
    assert(prec >= 0 && prec <= 10000 && rec >= 0 && rec <= 10000)
    // 16x2 banding at J >= 0.5: collision prob 1-(1-j^2)^16 >= 0.99 — the
    // planted near-dup pairs should essentially all be found
    assert(rec >= 9000, s"recall_bp $rec unexpectedly low for 16x2 banding")
  }

  test("phash band buckets stay far below the hot-bucket cap on the fixture") {
    // the completeness proof (4 bands, Hamming ≤ 3) is unconditional only
    // while no bucket is dropped by the 256 cap — pin that with headroom
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    import spark.implicits._
    val mdi = "CAST(conv(substr(md5(concat('mv:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    val base = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val media = base.union(
      base.where(expr(s"$mdi % 5 = 0"))
        .selectExpr("doc_id + 3000000 AS doc_id",
          "concat('xxxxxxxx', substr(text, 9)) AS text"))
      .select(col("doc_id"), col("text").cast("binary").as("data"))
    val maxBucket = media.as[Multimodal.MediaRow]
      .mapPartitions(_.map(r => (r.doc_id, Multimodal.aHash60(r.data))))
      .toDF("doc_id", "ah")
      .select(explode(expr("transform(sequence(0, 3), " +
        "c -> struct(c AS chunk, shiftright(ah, 15*c) & 32767 AS cv))")).as("cc"))
      .groupBy("cc.chunk", "cc.cv").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= 64, s"fixture band bucket $maxBucket too close to the 256 cap")
  }

  test("PPJoin prefix index is a strict prune of the full inverted index") {
    // the oracle hash-compare proves COMPLETENESS (ppjoin pairs ≡ brute
    // pairs); this pins the other half of the bargain — the prefix index
    // is materially smaller than the full posting table, and rarest-first
    // ordering keeps prefix collisions far below full-index collisions
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Dedup, TextAnalysis}
    val ds = Tables(spark, sf, "documents")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("sh", Dedup.shingles(col("toks")))
      .select(col("doc_id"), explode(col("sh")).as("sg"), size(col("sh")).as("n"))
    val dfreq = ds.groupBy("sg").agg(count(lit(1)).as("df"))
    val ranked = ds.join(dfreq, "sg").withColumn("rn",
      row_number().over(Window.partitionBy("doc_id").orderBy("df", "sg")))
    val full = ranked.count()
    val prefix = ranked
      .where(col("rn") <= col("n") - expr("CAST(ceil(n * 0.5) AS INT)") + 1)
      .count()
    assert(prefix * 2 <= full + 1000,
      s"prefix postings $prefix not ~half of full $full")
    // collision work: full-index self-join pairs vs prefix-probed pairs
    val fullCollisions = dfreq.agg(sum(col("df") * col("df"))).head().getLong(0)
    val prefixDf = ranked
      .where(col("rn") <= col("n") - expr("CAST(ceil(n * 0.5) AS INT)") + 1)
      .groupBy("sg").agg(count(lit(1)).as("pdf"))
    val probeCollisions = dfreq.join(prefixDf, "sg")
      .agg(sum(col("df") * col("pdf"))).head().getLong(0)
    assert(probeCollisions * 2 < fullCollisions,
      s"prefix probing $probeCollisions not < half of full self-join $fullCollisions")
  }
}
