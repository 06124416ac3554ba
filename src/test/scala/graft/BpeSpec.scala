package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE train/encode invariants. The DuckDB oracle re-runs the
  * whole 8-round training bit-for-bit; these pin the properties the design
  * rests on. */
class BpeSpec extends SparkSpec {

  test("replace scans left-to-right continuing after the match (cross-engine contract)") {
    // the merge-application primitive: DuckDB gives the same ' aa a a ' —
    // verified in the oracle; if Spark ever diverged, training would drift
    val r = spark.sql("SELECT replace(' a a a a ', ' a a ', ' aa ') AS x")
      .head().getString(0)
    assert(r === " aa a a ")
  }

  test("merge counts are non-increasing across rounds and merges are pairs of prior symbols") {
    val m = Bpe.mergeTable(spark, sf).collect()
    assert(m.length === Bpe.Rounds)
    val cnts = m.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse, s"counts not non-increasing: $cnts")
    // every pair is two space-separated symbols; merged is their concat
    m.foreach { r =>
      val Array(x, y) = r.getAs[String]("pair").split(" ", 2)
      assert(r.getAs[String]("merged") === x + y)
    }
  }

  test("encoding compresses: n_words <= n_bpe <= n_chars, every doc encoded") {
    val e = Bpe.encode(spark, sf).cache()
    assert(e.count() === Tables(spark, sf, "documents").count())
    val bad = e.where(col("n_bpe") > col("n_chars") || col("n_bpe") < col("n_words")).count()
    assert(bad === 0)
    // 8 merges on a zipfian corpus must actually shrink something
    assert(e.where(col("n_bpe") < col("n_chars")).count() > 0)
    e.unpersist()
  }
}
