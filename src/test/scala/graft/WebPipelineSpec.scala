package graft

import graft.operators.WebPipeline
import org.apache.spark.sql.functions._

/** Planted-invariant checks for the web-corpus curation operators — the
  * DuckDB oracle proves value parity; these pin the SEMANTIC claims the
  * fixture was designed to exercise. */
class WebPipelineSpec extends SparkSpec {

  test("c4Filter enforces every published rule on the planted defects") {
    val out = WebPipeline.c4Filter(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every surviving line ends in terminal punctuation and skips the
    // boilerplate/javascript plants
    rows.foreach { r =>
      val cleaned = r.getAs[String]("cleaned")
      if (cleaned.nonEmpty) {
        assert(cleaned.endsWith("."), s"doc ${r.getLong(0)} cleaned must end in '.'")
        assert(!cleaned.contains("subscribe to our newsletter"))
        assert(!cleaned.contains("javascript"))
      }
      assert(r.getAs[Int]("n_kept") <= r.getAs[Int]("n_lines") + 1) // +1: page poison line
    }
    // the lorem-ipsum / curly-brace page plants force keep_doc = false
    val poisoned = out.where(col("cleaned").contains("lorem ipsum") ||
      col("cleaned").contains("{")).where(col("keep_doc")).count()
    assert(poisoned === 0)
    // the rule set discriminates: some docs kept, some dropped
    val kept = out.where(col("keep_doc")).count()
    assert(kept > 0 && kept < rows.length)
    out.unpersist()
  }

  test("lineDedup keeps a cross-document line only in its first document") {
    val out = WebPipeline.lineDedup(spark, sf).cache()
    val boiler = "subscribe to our newsletter for the latest updates"
    val withBoiler = out.where(col("cleaned").contains(boiler))
    // the planted boilerplate occurs in many docs pre-dedup (1/20 of lines)
    // but survives in at most one
    assert(withBoiler.count() <= 1)
    assert(out.agg(sum("n_dropped")).head().getLong(0) > 0)
    out.unpersist()
  }

  test("urlDedup canonical forms are clean and partition the corpus") {
    val out = WebPipeline.urlDedup(spark, sf).cache()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(out.agg(sum("n_copies")).head().getLong(0) === nDocs)
    out.collect().foreach { r =>
      val c = r.getAs[String]("canon")
      assert(c.startsWith("https://site"), c)       // scheme+host lowercased, www. gone
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains(":443"), c)
      assert(!c.endsWith("/"), c)
    }
    // the decorations actually collide: fewer canonical groups than docs
    assert(out.count() < nDocs)
    // the surviving ?id=9 param forms its own group
    assert(out.where(col("canon").endsWith("?id=9")).count() > 0)
    out.unpersist()
  }

  test("qualityClassifier is deterministic and thresholds on the sum logit") {
    val a = WebPipeline.qualityClassifier(spark, sf).collect()
    val b = WebPipeline.qualityClassifier(spark, sf).collect()
    assert(a.sameElements(b))
    a.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("logit_u") > 0))
    }
    // md5 weights are symmetric around zero: both classes appear
    assert(a.exists(_.getAs[Boolean]("keep")) && a.exists(!_.getAs[Boolean]("keep")))
  }
}
