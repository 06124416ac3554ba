package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators — the named cleaning stages a production
  * pretraining pipeline runs between the crawl and the tokenizer, extending
  * the LLM-pipeline family (SURVEY.md §7 driver mandate):
  *
  *   - [[c4Filter]]    — the C4 heuristic rule set (Raffel et al. 2020 §2.2)
  *   - [[lineDedup]]   — cross-document repeated-line removal (the
  *                       CCNet/RefinedWeb paragraph-dedup stage)
  *   - [[urlDedup]]    — URL canonicalization + keep-first dedup (the crawl
  *                       frontier / recrawl-collapse step every web corpus
  *                       starts with)
  *   - [[qualityClassifier]] — hashed-bag-of-words linear scorer (the
  *                       fastText-classifier inference shape used for GPT-3/
  *                       LLaMA-style "looks like a reference page" filtering)
  *
  * The synthetic `documents` fixture is token soup with no line structure or
  * URLs, so each operator PLANTS its structure deterministically through the
  * md5 bridge (same convention as q_pii_redact's planted PII and the RMat
  * generator bits): both engines regenerate the identical fixture and the
  * oracle checks the operator's real logic end to end.
  *
  * Scale shape: c4Filter and qualityClassifier are expression-only (zero
  * shuffles — one WholeStageCodegen pass over the scan, like the text-stats
  * family). lineDedup is explode → line-hash agg → join-back → per-doc
  * reassembly: three LINEAR shuffles, the same inverted-index shape as the
  * dedup family; the viral-boilerplate key ("subscribe to our newsletter")
  * is absorbed by partial aggregation on the count side and is the standard
  * AQE skew-join case on the join-back side. urlDedup is one groupBy on the
  * canonical URL. Nothing here is quadratic at 100 TB.
  */
object WebPipeline {

  /** md5-derived nonnegative BIGINT (< 2^60) from a SQL string expression —
    * the cross-engine determinism bridge (DuckDB:
    * `('0x'||substr(md5(s),1,15))::UBIGINT`). */
  private def mdi(arg: String): String =
    s"CAST(conv(substr(md5($arg), 1, 15), 16, 10) AS BIGINT)"

  /** Planted line fixture: chunk the token stream into 8-token lines, then
    * decorate per (doc, line) md5 draw — 1/20 boilerplate ("subscribe to our
    * newsletter", no terminal punctuation), 1/20 a javascript notice, 1/20
    * unpunctuated, 1/20 a 2-word stub, the rest honest sentences ending in
    * '.'; 1/25 of pages gain a "lorem ipsum" line, another 1/25 a line with
    * a curly brace — exactly the defect classes the C4 rules target. */
  private def linesDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("nl", expr("greatest(CAST(ceil(size(toks) / 8.0) AS INT), 1)"))
      .withColumn("lines0", expr(
        s"""transform(sequence(0, nl - 1), i ->
           |  CASE ${mdi("concat('ln:', CAST(doc_id AS STRING), ':', CAST(i AS STRING))")} % 20
           |    WHEN 0 THEN 'subscribe to our newsletter for the latest updates'
           |    WHEN 1 THEN 'please enable javascript to view this site.'
           |    WHEN 2 THEN concat_ws(' ', slice(toks, i * 8 + 1, 8))
           |    WHEN 3 THEN concat(concat_ws(' ', slice(toks, i * 8 + 1, 2)), '.')
           |    ELSE concat(concat_ws(' ', slice(toks, i * 8 + 1, 8)), '.')
           |  END)""".stripMargin))
      .withColumn("pg", expr(s"${mdi("concat('doc:', CAST(doc_id AS STRING))")} % 25"))
      .withColumn("lines", expr(
        """CASE WHEN pg = 0 THEN array_append(lines0, 'lorem ipsum dolor sit amet.')
          |     WHEN pg = 1 THEN array_append(lines0, 'function() { return 0; }')
          |     ELSE lines0 END""".stripMargin))
      .select(col("doc_id"), col("lines"))

  /** q_c4_filter — the C4 cleaning rules (Raffel et al. 2020, "Colossal
    * Clean Crawled Corpus", §2.2): keep only lines that end in terminal
    * punctuation AND have ≥ 3 words AND don't mention javascript; drop the
    * whole page if fewer than 5 sentences survive, or the page contains
    * "lorem ipsum" or a curly brace. Expression-only per document. */
  def c4Filter(s: SparkSession, dir: String): DataFrame =
    linesDf(s, dir)
      .withColumn("kept", expr(
        "filter(lines, l -> l LIKE '%.' AND size(split(l, ' ')) >= 3" +
          " AND NOT l LIKE '%javascript%')"))
      .withColumn("page", expr("array_join(lines, ' ')"))
      .select(col("doc_id"),
        size(col("lines")).as("n_lines"),
        size(col("kept")).as("n_kept"),
        (size(col("kept")) >= 5 &&
          !col("page").contains("lorem ipsum") &&
          !col("page").contains("{")).as("keep_doc"),
        expr("array_join(kept, ' ')").as("cleaned"))
      .orderBy("doc_id")

  /** q_dedup_lines — cross-document repeated-line removal (CCNet §3.1 /
    * RefinedWeb's exact-paragraph dedup): a line occurring in more than one
    * document survives only in the first (min doc_id) document; every other
    * copy is cut and the document reassembled in line order. The boilerplate
    * planted by [[linesDf]] is exactly the target. Within one document a
    * repeated line is NOT cut (that is q_text_repetition's intra-doc
    * signal). */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val ex = linesDf(s, dir).select(col("doc_id"),
      posexplode(col("lines")).as(Seq("idx", "line")))
    val freq = ex.groupBy("line").agg(
      countDistinct(col("doc_id")).as("nd"), min(col("doc_id")).as("first_doc"))
    ex.join(freq, "line")
      .withColumn("kept", col("nd") === 1 || col("doc_id") === col("first_doc"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        expr("array_join(transform(array_sort(" +
          "collect_list(CASE WHEN kept THEN struct(idx, line) END)), " +
          "x -> x.line), ' ')").as("cleaned"))
      .orderBy("doc_id")
  }

  /** q_dedup_url — URL canonicalization + keep-first dedup. The fixture
    * plants the classic recrawl variants around a canonical location
    * (scheme/host case, www. prefix, explicit :443, trailing slash,
    * utm_* / campaign tracking params, #fragment); canonicalization
    * lowercases scheme+host only (paths are case-sensitive), strips the
    * default port, the www. prefix, the fragment, every utm_* param and the
    * trailing slash — non-tracking query params (?id=9) survive. One
    * groupBy(canonical) keeps the first doc per location. */
  def urlDedup(s: SparkSession, dir: String): DataFrame = {
    def d(tag: String) = mdi(s"concat('$tag:', CAST(doc_id AS STRING))")
    val url = Tables(s, dir, "documents").selectExpr("doc_id",
      s"""concat(
         | element_at(array('https://', 'HTTPS://', 'Https://'), CAST(${d("sc")} % 3 AS INT) + 1),
         | element_at(array('', 'www.', 'WWW.'), CAST(${d("w")} % 3 AS INT) + 1),
         | 'site', CAST(doc_id % 7 AS STRING), '.Example.COM',
         | CASE WHEN ${d("p")} % 4 = 0 THEN ':443' ELSE '' END,
         | '/Articles/item', CAST(doc_id % 53 AS STRING),
         | element_at(array('', '/', '?utm_source=feed', '?utm_medium=email&utm_source=feed', '?id=9&utm_campaign=x'), CAST(${d("q")} % 5 AS INT) + 1),
         | CASE WHEN ${d("f")} % 4 = 0 THEN '#Section-2' ELSE '' END
         |) AS url""".stripMargin)
    url
      .withColumn("u1", regexp_replace(col("url"), "#.*$", ""))
      .withColumn("pre", regexp_extract(col("u1"), "^[a-zA-Z]+://[^/?]*", 0))
      .withColumn("rest", expr("substr(u1, length(pre) + 1)"))
      .withColumn("pre2", expr(
        "replace(regexp_replace(lower(pre), ':443$', ''), 'https://www.', 'https://')"))
      .withColumn("r1", regexp_replace(col("rest"), "utm_[a-z]+=[^&#]*", ""))
      .withColumn("r2", regexp_replace(col("r1"), "[?&]+$", ""))
      .withColumn("r3", expr("replace(r2, '?&', '?')"))
      .withColumn("canon", concat(col("pre2"), regexp_replace(col("r3"), "/$", "")))
      .groupBy("canon")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("canon")
  }

  /** q_url_blocklist — UT1-style domain blocklist filtering (the
    * RefinedWeb §3.1 first gate: drop every document whose REGISTRABLE
    * domain is on the adult/fraud category lists, subdomains included).
    * The fixture plants hosts with subdomain variety (www./cdn./news.)
    * over five registrable domains; the blocklist is a deterministic md5
    * draw over the DISTINCT registrable domains (category stand-in, same
    * convention as the classifier weights). Registrable-domain extraction
    * = last two dot-labels, so cdn.site3.tracker-hub.net matches a
    * tracker-hub.net entry — the suffix-match every naive
    * full-host-equality filter gets wrong. Scale shape: the real UT1 list
    * is ~4M domains ≈ 100 MB — still a BROADCAST join against the corpus
    * (the join is on the extracted registrable key, never a suffix scan);
    * the filter itself is one map-side probe, no shuffle of the corpus. */
  def urlBlocklist(s: SparkSession, dir: String): DataFrame = {
    def d(tag: String) = mdi(s"concat('$tag:', CAST(doc_id AS STRING))")
    val hosts = Tables(s, dir, "documents").selectExpr("doc_id",
      s"""concat(
         | element_at(array('', 'www.', 'cdn.', 'news.'), CAST(${d("sub")} % 4 AS INT) + 1),
         | 'site', CAST(doc_id % 7 AS STRING), '.',
         | element_at(array('example.com', 'sample.org', 'tracker-hub.net',
         |                  'web-mall.io', 'fast-ads.dev'), CAST(doc_id % 5 AS INT) + 1)
         |) AS host""".stripMargin)
      .withColumn("registrable", regexp_extract(col("host"), "[^.]+\\.[^.]+$", 0))
    val blocklist = hosts.select("registrable").distinct()
      .where(expr(s"${mdi("concat('blk:', registrable)")} % 3 = 0"))
      .withColumn("blocked", lit(true))
    hosts.join(broadcast(blocklist), Seq("registrable"), "left")
      .groupBy("registrable")
      .agg(coalesce(max(col("blocked")), lit(false)).as("blocked"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("registrable")
  }

  /** q_quality_classifier — hashed-bag-of-words linear quality scorer, the
    * inference shape of the fastText classifier used to filter CommonCrawl
    * against a reference corpus (GPT-3 appendix A / LLaMA §2): token →
    * hash-bucket (4096) → weight lookup → sum; keep when the mean logit is
    * positive (su > 0 ⟺ mean > 0 since n > 0). Weights here are md5-derived
    * micro-logit integers — the model is a deterministic stand-in (the
    * container ships no trained weights, same convention as the multimodal
    * stub codec) but the scoring plumbing is the real thing: the whole
    * lookup-and-sum runs as ONE codegen expression over the scan, no
    * shuffle, no UDF, no weight table to join (a 4096-bucket model lives in
    * the instruction stream; a 10M-bucket one would broadcast). */
  /** q_quality_calibration — the threshold-sweep table a classifier gate
    * ships with (FineWeb-Edu/DCLM release reports): corpus scored, split
    * into logit deciles, each row reporting volume, score range and the
    * keep-rate the production threshold (0) would yield there — the table
    * one reads to PICK the threshold. Deterministic ntile over (logit,
    * doc_id). Scale note: a corpus-wide ntile is a range-partitioned sort;
    * at petabyte scale the sketch-threshold split takes over — the exact
    * same swap q_quality_ccnet_sketch demonstrates for the per-language
    * terciles. */
  def qualityCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityClassifier(s, dir).select(col("doc_id"), col("logit_u"))
    scored
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("logit_u"), col("doc_id"))))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("logit_u")).as("lo"), max(col("logit_u")).as("hi"),
        sum(when(col("logit_u") > 0, 1L).otherwise(0L)).as("n_keep"))
      .orderBy("decile")
  }

  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val bucket = s"CAST(${mdi("concat('b:', t)")} % 4096 AS STRING)"
    val weight = s"(${mdi(s"concat('w:', $bucket)")} % 2000001) - 1000000"
    Tables(s, dir, "documents")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("su", expr(
        s"aggregate(transform(toks, t -> $weight), CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tok"),
        col("su").as("logit_u"),
        (col("su") > 0).as("keep"))
      .orderBy("doc_id")
  }
}
