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
}
