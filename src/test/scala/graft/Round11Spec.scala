package graft

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.StateBootstrap
import org.apache.spark.sql.functions._

/** Round-11 operators: Bloom-filter incremental dedup, conditional
  * bigram-LM perplexity, and savepoint rescaling (Flink key-group
  * redistribution analog). */
class Round11Spec extends SparkSpec {

  test("bloom dedup: no false negatives, recrawls flagged, FP set auditable") {
    val out = Dedup.bloomDedup(spark, sf).cache()
    try {
      // structural Bloom property: membership never misses — every exact
      // duplicate must be bloom-flagged
      assert(out.where(col("exact_dup") && !col("bloom_dup")).count() === 0)
      // every planted re-crawl (doc_id offset by the smallest power of 10
      // above max(doc_id), by construction) is an exact dup → flagged
      val maxId = Tables(spark, sf, "documents")
        .agg(max(col("doc_id"))).head().getLong(0)
      val off = math.pow(10, maxId.toString.length).toLong
      val recrawl = out.where(col("doc_id") >= off)
      assert(recrawl.count() > 0)
      assert(recrawl.where(!col("bloom_dup")).count() === 0)
      // the FP set (bloom-yes, truth-no) is deterministic and tiny at this
      // fill factor: lake ~2k docs * 4 probes over 2^18 bits → (8k/262k)^4
      val fp = out.where(col("bloom_dup") && !col("exact_dup")).count()
      assert(fp <= 2, s"unexpected FP count $fp")
      // note: fresh shard docs CAN be exact dups too — the corpus plants
      // duplicate texts (q_dedup_exact's fixture); the bloom must — and
      // does, per the false-negative check above — catch those as well
    } finally out.unpersist(false)
  }

  test("bloom dedup plan: probe is broadcast-side, no sort-merge join") {
    val plan = Dedup.bloomDedup(spark, sf).queryExecution.executedPlan.toString
    // the truth join back-checks FPs on a small lake — must broadcast, and
    // the bitmap itself is a literal (no join at all for the bloom verdict)
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("forall"), "bloom probe expression missing")
  }

  test("bigram LM: invariant unigram vs strictly-costlier bigram on token-shuffled corpus") {
    // doctored corpus: every document's tokens deterministically permuted
    // (md5-keyed sort). The unigram model and every per-doc token multiset
    // are unchanged — unigram perplexity must be IDENTICAL row-for-row.
    // Token order is destroyed — bigram cost must rise on average. This is
    // exactly the damage class the bigram operator exists to catch.
    val dir2 = s"/tmp/graft-shuffled/${System.nanoTime()}"
    Tables.all.foreach { t =>
      val src = spark.read.parquet(s"$sf/$t.parquet")
      val out =
        if (t == "documents")
          src.withColumn("text", expr(
            "concat_ws(' ', transform(array_sort(transform(split(lower(text), ' '), " +
              "(t, i) -> struct(md5(concat(cast(doc_id AS string), ':', cast(i AS string))) AS k, t AS t))), " +
              "s -> s.t))"))
        else src
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir2/$t.parquet")
    }
    val uniA = TextAnalysis.perplexity(spark, sf).select("doc_id", "nats_u")
    val uniB = TextAnalysis.perplexity(spark, dir2).select("doc_id", "nats_u")
    assert(uniA.exceptAll(uniB).count() === 0 && uniB.exceptAll(uniA).count() === 0,
      "unigram perplexity must be order-invariant")
    val meanA = TextAnalysis.bigramPerplexity(spark, sf)
      .agg(avg("nats_u")).head().getDouble(0)
    val meanB = TextAnalysis.bigramPerplexity(spark, dir2)
      .agg(avg("nats_u")).head().getDouble(0)
    assert(meanB > meanA,
      s"shuffled corpus must cost more under the bigram LM: $meanB !> $meanA")
  }

  test("ann recall: probing every cell is exact, nprobe=3 is bounded") {
    import graft.operators.Similarity
    val r3 = Similarity.annRecall(spark, sf).collect()
    assert(r3.nonEmpty)
    r3.foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0 && h <= 10, r.toString)
    }
    // probing every cell degenerates to brute force — the recall dial's
    // upper anchor, and the proof the harness measures what it claims
    val truth = Similarity.annBruteForce(spark, sf).select("qid", "rank", "vec_id")
    val all = Similarity.annIvfProbes(spark, sf, nprobe = Int.MaxValue).select("qid", "rank", "vec_id")
    assert(truth.exceptAll(all).count() === 0 && all.exceptAll(truth).count() === 0,
      "nprobe=all (every cell) must reproduce brute-force top-10 exactly")
  }

  test("pq: top-10 ADC lists are well-formed and distances rank monotonically") {
    import graft.operators.Similarity
    val out = Similarity.annPq(spark, sf).cache()
    try {
      val qids = out.select("qid").distinct().count()
      assert(qids === 5)
      // 10 ranked rows per query, distances non-negative and monotone in rank
      out.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getInt(1))
        assert(sorted.map(_.getInt(1)).toSeq === (1 to 10))
        val ds = sorted.map(_.getLong(3))
        assert(ds.forall(_ >= 0L))
        assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
          s"ADC distances must be monotone in rank: ${ds.mkString(",")}")
      }
      // the query vector itself is excluded from its own candidates
      assert(out.where(col("qid") === col("vec_id")).count() === 0)
    } finally out.unpersist(false)
  }

  test("ivf-pq: cell pruning never changes a surviving candidate's ADC distance") {
    import graft.operators.Similarity
    val full = Similarity.annPq(spark, sf)
      .select(col("qid"), col("vec_id"), col("adist_u").as("d_full"))
    val pruned = Similarity.annIvfPq(spark, sf).cache()
    try {
      // the composed index ranks a SUBSET of candidates with the SAME
      // distance function — any pair in both top-10s must agree exactly
      val both = pruned.join(full, Seq("qid", "vec_id"))
      assert(both.where(col("adist_u") =!= col("d_full")).count() === 0)
      // well-formed per-query lists (≤10; ranks contiguous from 1)
      pruned.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val rk = rows.map(_.getInt(1)).sorted.toSeq
        assert(rk === (1 to rk.size), rk.mkString(","))
        assert(rk.size <= 10)
      }
    } finally pruned.unpersist(false)
  }

  test("sized bloom: m is a power of two >= 1024 and no false negatives") {
    val out = Dedup.bloomSizedDedup(spark, sf).cache()
    try {
      val m = out.select("m_bits").head().getLong(0)
      assert(m >= 1024 && (m & (m - 1)) === 0L, s"m_bits $m")
      assert(out.where(col("exact_dup") && !col("bloom_dup")).count() === 0)
    } finally out.unpersist(false)
  }

  test("stream bloom: streaming bit_or fold builds the bit-identical bitmap") {
    import graft.operators.Dedup
    import graft.streaming.StreamBloom
    val batch = Dedup.bloomDedup(spark, sf)
    val stream = StreamBloom.bloomStreamDedup(spark, sf)
    assert(batch.exceptAll(stream).count() === 0 && stream.exceptAll(batch).count() === 0,
      "stream-built bloom verdicts must equal the batch build's")
  }

  test("state rescale: p=8 savepoint redistributed into p=32, totals lossless") {
    val (res, ckptA, ckptB) = StateBootstrap.rescaleRun(spark, sf)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables(spark, sf, "events").groupBy("user_id")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want, "rescaled totals must equal the whole-table batch aggregate")
    // the partition-count pin: the old store really ran at 8, the new at 32
    def numParts(ckpt: String): Long =
      spark.read.format("statestore").load(ckpt)
        .select(col("partition_id")).agg(max("partition_id")).head().getInt(0).toLong + 1
    val pA = numParts(ckptA)
    val pB = numParts(ckptB)
    assert(pA <= 8, s"old savepoint used $pA partitions")
    assert(pB > 8 && pB <= 32, s"new job used $pB partitions")
    // redistribution really moved keys: the new store holds every key
    val keysB = spark.read.format("statestore").load(ckptB)
      .select(col("key.value").as("u")).distinct().count()
    assert(keysB === want.size.toLong)
  }

  test("ols: recovers a planted exact linear relationship") {
    // doctored lineitem: l_extendedprice := 3·round(l_quantity) + 7, an
    // exact integer relationship — the closed-form fit must return it
    // EXACTLY (slope 3, intercept 7, r² = 1) because every sufficient
    // statistic is exact integer math
    val dir2 = s"/tmp/graft-ols/${System.nanoTime()}"
    Tables.all.foreach { t =>
      val src = spark.read.parquet(s"$sf/$t.parquet")
      val out =
        if (t == "lineitem")
          src.withColumn("l_extendedprice",
            expr("cast(3 * round(l_quantity) + 7 AS double)"))
        else src
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir2/$t.parquet")
    }
    graft.operators.MlPipeline.ols(spark, dir2).collect().foreach { r =>
      assert(r.getDouble(2) === 3.0, s"slope ${r.getDouble(2)}")
      assert(r.getDouble(3) === 7.0, s"intercept ${r.getDouble(3)}")
      assert(r.getDouble(4) === 1.0, s"r2 ${r.getDouble(4)}")
    }
  }

  test("stream ols: drained moments equal the batch aggregate's model") {
    val streamed = streaming.StreamQueries.streamOls(spark, sf)
    val batch = Tables(spark, sf, "events")
      .select(col("event_type"),
        expr("cast(dayofyear(ts) AS bigint)").as("x"),
        expr("cast(round(value * 100) AS bigint)").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .withColumn("slope", expr(
        "round(cast(n * sxy - sx * sy AS double) / cast(n * sxx - sx * sx AS double), 6)"))
      .withColumn("intercept", expr(
        "round((cast(sy AS double) - slope * cast(sx AS double)) / n, 4)"))
      .select(col("event_type"), col("n"), col("slope"), col("intercept"))
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0,
      "streaming moments must reproduce the batch model exactly")
  }

  test("bpe fertility: every word costs at least one symbol") {
    val f = graft.operators.Bpe.fertility(spark, sf).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), r.toString) // n_bpe >= n_words
      assert(r.getDouble(3) >= 1.0, r.toString)
    }
  }

  test("span strip: edit is consistent with span coverage") {
    val strip = Dedup.spanStrip(spark, sf)
    val cover = Dedup.spanDupCoverage(spark, sf)
    val j = strip.join(cover, "doc_id").cache()
    try {
      // a doc loses tokens iff it owns at least one duplicated window
      assert(j.where((col("n_removed") > 0) =!= (col("dup_ngrams") > 0)).count() === 0)
      // one duplicated 13-gram covers 13 tokens, so any edit removes ≥ 13
      assert(j.where(col("n_removed") > 0 && col("n_removed") < 13).count() === 0)
      // untouched docs keep their original (normalized) fingerprint
      val untouched = j.where(col("n_removed") === 0)
        .join(Tables(spark, sf, "documents"), "doc_id")
        .where(col("fp_kept") =!= md5(lower(col("text"))))
      // normalized text = lower + single-space; fixture text is already
      // single-spaced, so md5(lower(text)) is the kept-sequence hash
      assert(untouched.count() === 0)
      // the corpus plants exact duplicates — something must be stripped
      assert(j.where(col("n_removed") > 0).count() > 0)
    } finally j.unpersist(false)
  }

  test("state rescale DOWN: p=32 savepoint merges losslessly into p=8 stores") {
    // the merge direction — in the reference this is several key groups
    // landing on one subtask (StateAssignmentOperation); here 32 stores'
    // rows hash-shuffle into 8, multiple old partitions per new one
    val (res, ckptA, ckptB) = StateBootstrap.rescaleRun(spark, sf, pOld = 32, pNew = 8)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables(spark, sf, "events").groupBy("user_id")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    def maxPart(ckpt: String): Int =
      spark.read.format("statestore").load(ckpt)
        .agg(max("partition_id")).head().getInt(0)
    assert(maxPart(ckptA) > 8, "old store must have used more than 8 partitions")
    assert(maxPart(ckptB) < 8, "new store must fit in 8 partitions")
  }
}
