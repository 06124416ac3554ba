package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-12 pins: the Bloom bitmap size guard (plan-literal vs executor
  * broadcast), the span-strip interval-merge rewrite, and the
  * production-parameter ANN recall sweep. */
class Round12Spec extends SparkSpec {

  test("bloom size guard: broadcast probe ≡ literal probe, plan shapes flip") {
    val lit = Dedup.bloomDedupGuard(spark, sf, Dedup.BloomLiteralMaxWords)
    val bc = Dedup.bloomDedupGuard(spark, sf, 0) // force the broadcast path
    val litPlan = lit.queryExecution.executedPlan.toString
    val bcPlan = bc.queryExecution.executedPlan.toString
    // fixture scale: bitmap rides the plan as a literal inside forall
    assert(litPlan.contains("forall"), "literal path lost its forall probe")
    assert(!litPlan.contains("bloom_contains"),
      "literal path must not ship a broadcast")
    // forced-production scale: bitmap is a broadcast read by the codegen
    // expression; no Literal array, no join, no sort-merge anywhere new
    assert(bcPlan.contains("bloom_contains"),
      "broadcast path missing the BloomContains expression")
    assert(!bcPlan.contains("forall"), "broadcast path still carries forall")
    assert(!bcPlan.contains("SortMergeJoin"), bcPlan.take(2000))
    // the two probes read the same bits: verdicts are row-identical
    assert(lit.collect().toSeq === bc.collect().toSeq,
      "broadcast probe diverged from the plan-literal probe")
  }

  test("span strip: interval merge ≡ naive probe on a boilerplate-saturated doc") {
    import spark.implicits._
    val boiler = (0 until 60).map(i => s"b${i % 7}x$i").mkString(" ")
    val uniqA = (0 until 20).map(i => s"ua$i").mkString(" ")
    val uniqB = (0 until 20).map(i => s"ub$i").mkString(" ")
    val docs = Seq(
      (0L, boiler),                      // saturated: every 13-gram duplicated
      (1L, boiler),                      // its twin
      (2L, s"$uniqA $boiler $uniqB"),    // boilerplate island mid-document
      (3L, (0 until 40).map(i => s"uc$i").mkString(" ")), // untouched
      (4L, "short doc under thirteen tokens")
    ).toDF("doc_id", "text")
    val merged = Dedup.spanStripRewrite(docs, naive = false).collect().toSeq
    val naive = Dedup.spanStripRewrite(docs, naive = true).collect().toSeq
    assert(merged === naive, "interval-merge rewrite changed the edit")
    val byId = merged.map(r => r.getLong(0) -> r).toMap
    // saturated docs: everything removed (48 overlapping starts merge to
    // ONE [1,60] interval), fingerprint null
    assert(byId(0L).getInt(2) === 60 && byId(0L).isNullAt(3))
    // island doc keeps its unique flanks
    assert(byId(2L).getInt(2) === 60 && !byId(2L).isNullAt(3))
    // unique and sub-span docs untouched
    assert(byId(3L).getInt(2) === 0)
    assert(byId(4L).getInt(2) === 0)
  }

  test("production ANN: K=256 PQ + exact refine hits recall@10 >= 0.9 at nprobe=8") {
    // the FAISS protocol at real parameters: Lloyd coarse cells (the label
    // column is measured near-random w.r.t. embedding geometry), K=256
    // per-subspace codebooks, ADC shortlist R=100, exact cosine re-rank.
    val sweep = graft.operators.Similarity
      .annRecallProdSweep(spark, sf, nprobes = Seq(1, 3, 8, 10))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // the headline pin: production recall at the production operating point
    assert(sweep(8)._1 >= 0.9,
      s"refined mean recall@10 at nprobe=8 = ${sweep(8)._1}")
    assert(sweep(10)._1 >= 0.9,
      s"refined mean recall@10 at probe-all = ${sweep(10)._1}")
    // the dial works: probing 8 cells beats probing 1
    assert(sweep(8)._1 > sweep(1)._1,
      s"nprobe dial inverted: ${sweep(1)._1} -> ${sweep(8)._1}")
    // honesty twin: raw 8-byte ADC cannot order unit-norm random vectors'
    // top-10 (quantization noise exceeds the neighbor gaps) — the refine
    // step must be load-bearing, not decorative
    assert(sweep(8)._3 < sweep(8)._1,
      s"ADC-only ${sweep(8)._3} should trail refined ${sweep(8)._1}")
  }

  test("NFD packing: capacity respected except single oversized docs; dense bin ids") {
    val out = graft.operators.Pipeline.packBinNfd(spark, sf)
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("toks"), count(lit(1)).as("n_docs"))
      .cache()
    try {
      // a bin over capacity must be a lone oversized document
      assert(out.where(col("toks") > 256 && col("n_docs") > 1).count() === 0)
      // next-fit never leaves a gap in bin numbering: ids are dense 1..max
      val dense = out.groupBy(col("source"), col("shard"))
        .agg(max(col("bin")).as("mx"), count(lit(1)).as("nb"))
      assert(dense.where(col("mx") =!= col("nb")).count() === 0)
      assert(out.count() > 0)
    } finally out.unpersist(false)
  }

  test("leakage-safe split: no verified near-dup pair straddles splits") {
    val split = Dedup.leakageSafeSplit(spark, sf)
      .select(col("doc_id"), col("split")).cache()
    try {
      val pairs = Dedup.minhashLshPairs(spark, sf)
        .select(col("doc_a"), col("doc_b"))
      val straddle = pairs
        .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
        .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
        .where(col("sa") =!= col("sb"))
      assert(straddle.count() === 0,
        "a near-dup pair landed on opposite sides of the split")
      // all three splits populated at the 80/10/10 hash shares
      val shares = split.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(shares.keySet === Set("train", "val", "test"), shares.toString)
      assert(shares("train") > shares("val") && shares("train") > shares("test"))
    } finally split.unpersist(false)
  }

  test("NFD packing plan: the group shuffle + output sort are the only exchanges") {
    val plan = graft.operators.Pipeline.packBinNfd(spark, sf)
      .queryExecution.executedPlan.toString
    val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
    val nRange = "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(nHash === 1, s"expected exactly the (source, shard) group shuffle:\n${plan.take(2000)}")
    assert(nRange === 1, s"expected exactly the final orderBy:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("streaming PSI ≡ batch PSI (monotone counts, drained max = scan count)") {
    val batch = graft.operators.DataQuality.driftPsi(spark, sf).collect().toSeq
    val stream = graft.streaming.StreamQueries.streamDriftPsi(spark, sf)
      .collect().toSeq
    assert(stream === batch, "streaming PSI fold diverged from the batch scan")
    assert(batch.nonEmpty)
  }

  test("span strip: corpus-wide equivalence of merged and naive probes") {
    val merged = Dedup.spanStripRewrite(
      Tables(spark, sf, "documents"), naive = false).collect().toSeq
    val naive = Dedup.spanStripRewrite(
      Tables(spark, sf, "documents"), naive = true).collect().toSeq
    assert(merged === naive)
  }
}
