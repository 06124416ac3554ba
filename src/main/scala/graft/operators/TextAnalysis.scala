package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (driver-mandated
  * extensions, SURVEY.md §7): token counting, quality scoring, language ID,
  * document fingerprinting.
  *
  * All pure Catalyst built-ins (higher-order array functions) — the whole
  * stage fuses into one codegen span over the parquet scan, no UDF
  * serialization boundary, so the per-document cost at 100 TB is one
  * streaming pass.
  */
object TextAnalysis {

  /** Shared tokenization: lowercase, single-space split. */
  def tokens(c: Column): Column = split(lower(c), " ")

  val stopEn = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "as")
  val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val stopFr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  val stopEs = Seq("el", "los", "y", "es", "en", "una", "lo", "como", "mas", "por")

  /** Token counts (whitespace + BPE-ish regex), length stats, punctuation /
    * stopword ratios, and two fingerprints (md5 + polynomial rolling hash).
    * Ref analog: per-record Calc with rich scalar exprs (CalcCodeGenerator). */
  def stats(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopEn.map(lit): _*)
    Tables(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).as("n_tokens_re"),
        length(col("text")).as("n_chars_m"),
        round(expr("aggregate(transform(toks, t -> length(t)), 0L, (a, b) -> a + b)")
          .cast("double") / size(col("toks")), 6).as("avg_tok_len"),
        round(size(filter(col("toks"), t => array_contains(stopArr, t))).cast("double")
          / size(col("toks")), 6).as("stop_ratio"),
        round((length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double") / length(col("text")), 6).as("punct_ratio"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp_md5"),
        expr("aggregate(transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))), " +
          "0L, (acc, c) -> (acc * 31 + c) % 1000000007)").as("fp_roll"))
      .orderBy("doc_id")
  }

  /** Corpus datasheet — the per-source "data card" a pretraining pipeline
    * publishes (Datasheets for Datasets, Gebru et al. 2021; every public
    * corpus release ships this table): ROLLUP over (source, lang) of
    * document/token/char volumes and a short-doc fraction, subtotals and
    * the grand total in ONE pass (Spark lowers rollup to a single Expand +
    * partial-agg — no per-grouping re-scan, the 100 TB shape).
    * grouping_id disambiguates subtotal rows from real NULL groups. */
  def corpusDatasheet(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(avg(col("n_toks")), 2).as("avg_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(when(col("n_toks") < 60, 1L).otherwise(0L)).as("n_short"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("source").asc_nulls_first,
        col("lang").asc_nulls_first)
  }

  /** md5-derived nonnegative BIGINT (< 2^60) from a SQL string expression —
    * the cross-engine determinism bridge (DuckDB twin:
    * `('0x'||substr(md5(s),1,15))::UBIGINT`). */
  private def mdi(arg: String): String =
    s"CAST(conv(substr(md5($arg), 1, 15), 16, 10) AS BIGINT)"

  /** The full Gopher/MassiveText document-level rule set (Rae et al. 2021,
    * Table A1) — the seven named heuristics a pretraining mix applies
    * before any model-based scoring: word-count bounds, mean-word-length
    * band, symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    * alphabetic-word fraction, and stop-word presence. Complements
    * [[repetition]] (Gopher's duplicate-n-gram rules) so the family covers
    * the whole table.
    *
    * The token-soup fixture has no symbols, bullets or line structure, so
    * those defect classes are PLANTED deterministically through the md5
    * bridge (same convention as WebPipeline's C4 fixture): each token is
    * replaced by '####' on a 1/40 md5 draw, and each 8-token line draws
    * bullet (1/10) or trailing-ellipsis (1/10) decorations. Both engines
    * regenerate the identical fixture, so the oracle checks every rule's
    * real arithmetic, thresholds included.
    *
    * Every per-document metric is a higher-order array expression — the
    * operator is one WholeStageCodegen pass over the scan, zero shuffles,
    * linear at 100 TB. Verdicts are computed on the ROUNDED metrics so
    * boundary cases agree bit-for-bit across engines. */
  def gopherQuality(s: SparkSession, dir: String): DataFrame = {
    val stopArr = array(stopEn.map(lit): _*)
    val planted = mdi("concat('gs:', CAST(doc_id AS STRING), ':', CAST(j + 1 AS STRING))")
    val lineDraw = mdi("concat('gl:', CAST(doc_id AS STRING), ':', CAST(i AS STRING))")
    Tables(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .withColumn("toks2", expr(
        s"transform(toks, (t, j) -> CASE WHEN $planted % 40 = 0 THEN '####' ELSE t END)"))
      .withColumn("n", size(col("toks2")))
      .withColumn("nl", expr("greatest(CAST(ceil(size(toks) / 8.0) AS INT), 1)"))
      .withColumn("ldraws", expr(s"transform(sequence(0, nl - 1), i -> $lineDraw % 10)"))
      .select(
        col("doc_id"),
        col("n").as("n_words"),
        round(expr("aggregate(toks2, 0L, (a, t) -> a + length(t))").cast("double")
          / col("n"), 6).as("mean_word_len"),
        round(size(expr("filter(toks2, t -> t rlike '[a-z]')")).cast("double")
          / col("n"), 6).as("alpha_frac"),
        round(size(expr("filter(toks2, t -> t = '####')")).cast("double")
          / col("n"), 6).as("sym_ratio"),
        round(size(expr("filter(ldraws, d -> d = 0)")).cast("double")
          / col("nl"), 6).as("frac_bullet"),
        round(size(expr("filter(ldraws, d -> d = 1)")).cast("double")
          / col("nl"), 6).as("frac_ellipsis"),
        size(array_intersect(array_distinct(col("toks2")), stopArr)).as("n_stop"))
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("sym_ratio") <= 0.1 &&
          col("frac_bullet") <= 0.9 &&
          col("frac_ellipsis") <= 0.3 &&
          col("alpha_frac") >= 0.8 &&
          col("n_stop") >= 2)
      .orderBy("doc_id")
  }

  /** Intra-document repetition ratios (the Gopher/MassiveText quality
    * filters): duplicate n-gram fraction = 1 − distinct/total over word
    * 2-grams and 3-grams. A high ratio marks degenerate boilerplate /
    * keyword-stuffed pages a training mix drops. Expression-only — one
    * codegen pass per document, no shuffle, linear in document length
    * (deliberately NO per-token frequency metric here: that is O(n²) as a
    * row expression; the cross-doc path is spanDupCoverage's job). */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    def grams(n: Int): Column =
      when(size(col("toks")) < lit(n), array().cast("array<string>"))
        .otherwise(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(toks, i, $n)))"))
    def dupFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0)).otherwise(
        round(lit(1.0) - size(array_distinct(g)).cast("double") / size(g), 6))
    Tables(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .withColumn("g2", grams(2)).withColumn("g3", grams(3))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        dupFrac(col("g2")).as("dup2_frac"),
        dupFrac(col("g3")).as("dup3_frac"))
      .orderBy("doc_id")
  }

  /** Top-3 TF-IDF keywords per document — the classic corpus-analytics /
    * feature-extraction step. Two linear shuffles: (doc, token) term
    * counts, then token document frequencies derived from the FIRST
    * aggregate (never re-shuffling raw tokens). Ranking compares the
    * INTEGER key tf × round(ln(N/df)·10⁶) — cross-engine `ln` can differ
    * in the last ulp, and a double-keyed sort could rank two tokens
    * differently in Spark vs the oracle; the quantized key cannot
    * (ln values are ~[0,12], an ulp is ~1e-15, the 1e-6 grid is 9 orders
    * of magnitude coarser). Ties on the key break by token ascending. */
  def tfidfTop3(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
    val n = docs.count() // scalar corpus size (metadata-scale action)
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("token"))
      .withColumn("skey",
        col("tf") * expr(s"cast(round(ln($n / cast(df AS DOUBLE)) * 1e6) AS BIGINT)"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("skey").desc, col("token").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("token"),
        round(col("skey").cast("double") / 1e6, 4).as("score"))
      .orderBy("doc_id", "rnk")
  }

  /** Corpus-unigram-LM perplexity quality score (the CCNet signal: train a
    * cheap LM on the corpus, rank every document by per-token negative
    * log-likelihood; high cost = far from the corpus distribution =
    * boilerplate/garbled). The model is add-one-smoothed unigram counts
    * over the same corpus. Per-token cost −ln((c+1)/(N+V)) is quantized to
    * integer MICRO-NATS before the per-document sum, so the aggregate is
    * order-independent and the oracle reproduces it exactly (the
    * dsirWeights trick — a double sum is summation-order-dependent
    * cross-engine); the per-doc mean is integer division, exact on both
    * engines. `keep` is a fixed 3.405-nat threshold (≈ p75 of the synthetic
    * fixture, whose unigram costs sit in a narrow 3.38–3.70 band) —
    * production CCNet buckets head/middle/tail by corpus PERCENTILE, which
    * is two more percentile scalars over this same nats_u column.
    *
    * Shape at 100 TB: explode → token agg (vocab-scale model) → join back
    * on token → doc agg. Two linear shuffles plus one join that is
    * deliberately NOT broadcast (a 100-TB corpus's vocab with counts can
    * exceed executor memory); the token key is zipfian-skewed ('the'
    * carries ~5% of rows) — exactly the AQE skew-split case, mirroring
    * q_join_skew's rehearsal. */
  def perplexity(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val cnt = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // model normalizer: two scalars (total tokens N, vocab V) — metadata-
    // scale driver action like tfidfTop3's corpus count
    val m = cnt.agg(coalesce(sum(col("c")), lit(0L)).as("n"),
      count(lit(1)).as("v")).head()
    // empty corpus: keep the normalizer positive so the (never-evaluated)
    // ln stays well-formed and the query returns its empty result
    val nv = math.max(m.getLong(0) + m.getLong(1), 1L)
    val cost = cnt.select(col("tok"),
      expr(s"cast(round(-ln((c + 1) / $nv.0D) * 1e6) AS BIGINT)").as("u"))
    toks.join(cost, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("u")).as("su"))
      .select(col("doc_id"), col("n_tok"),
        expr("su div n_tok").as("nats_u"),
        (expr("su div n_tok") <= lit(3405000L)).as("keep"))
      .orderBy("doc_id")
  }

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3 — the
    * production form of [[perplexity]]'s fixed-threshold `keep`): within
    * each LANGUAGE, documents split into perplexity terciles; 'head' (the
    * most in-distribution third) trains high-quality models, 'tail' is
    * dropped or demoted. Per-language percentiles matter because raw
    * perplexities are not comparable across languages (different vocab
    * sizes and token statistics). The split is ntile(3) over the total
    * order (nats_u, doc_id) — integer micro-nats with a deterministic
    * tiebreak, so both engines assign identical buckets (SQL-standard
    * ntile puts the n mod 3 remainder on the first buckets in both).
    *
    * Shape at 100 TB: [[perplexity]]'s two linear shuffles + one
    * per-language sort for the tercile window — the one genuinely
    * rank-based step, bounded per language; [[ccnetBucketsSketch]]
    * (r13) is the sort-free sketch-threshold twin for when it is not. */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
    val w = Window.partitionBy(col("lang")).orderBy(col("nats_u"), col("doc_id"))
    perplexity(s, dir).select(col("doc_id"), col("nats_u"))
      .join(langs, "doc_id")
      .withColumn("t", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("nats_u"),
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  /** CCNet terciles via the QUANTILE SKETCH (r13, the docstring's named
    * alternative made real — Wenzek 2020 §4.3 buckets by percentile
    * THRESHOLDS, not a full sort): per language, a log₂ histogram over
    * nats_u with 14 MANTISSA BITS per octave (1/16384 relative cell
    * width — the DDSketch move of choosing γ for the statistic: mean
    * unigram costs cluster within ~0.5% of each other, so the coarse
    * 16-cell grid the length sketches use cannot separate the tercile
    * thresholds, measured 0.48 agreement; pure integer math either way,
    * bit-replayable) yields the 1/3 and 2/3 threshold CELLS; documents
    * are bucketed by comparing their own cell id to the thresholds. Same
    * output schema as [[ccnetBuckets]]; Round13Spec pins ≥95% bucket
    * agreement against the exact ntile split (disagreements are confined
    * to threshold-cell ties).
    *
    * Shape at 100 TB: replaces the per-language SORT with one histogram
    * aggregate — cells OCCUPIED are what ride the shuffle (a few hundred
    * per language at this concentration; ≤ 64·2¹⁴ ever) — plus a
    * broadcast threshold join: the variant to run when a language's
    * partition no longer fits a sort. */
  def ccnetBucketsSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
    val d = perplexity(s, dir).select(col("doc_id"), col("nats_u"))
      .join(langs, "doc_id")
      .withColumn("cell", expr(
        "(length(bin(nats_u)) - 1) * 16384 + " +
          "(shiftright(nats_u, greatest(length(bin(nats_u)) - 15, 0)) & 16383)"))
    val hist = d.groupBy(col("lang"), col("cell")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy("lang").orderBy("cell")))
    val n = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val thr = cum.join(broadcast(n), "lang")
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") >= expr("cast(ceil(n / 3.0) as bigint)"),
          col("cell"))).as("b1"),
        min(when(col("cum") >= expr("cast(ceil(2 * n / 3.0) as bigint)"),
          col("cell"))).as("b2"))
    d.join(broadcast(thr), "lang")
      .select(col("doc_id"), col("lang"), col("nats_u"),
        when(col("cell") <= col("b1"), "head")
          .when(col("cell") <= col("b2"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  /** Interpolation-free conditional BIGRAM-LM perplexity — the KenLM-grade
    * upgrade of [[perplexity]]'s unigram signal (CCNet's production filter
    * is a 5-gram KenLM; the bigram is the smallest model that catches what
    * unigram provably cannot: token-order damage. A shuffled document has
    * EXACTLY the unigram cost of the original but a far higher bigram
    * cost). Per-bigram cost is conditional add-one:
    * −ln((c(w1,w2)+1)/(c(w1)+V)), quantized to integer micro-nats before
    * the per-document sum so the aggregate is order-independent and the
    * oracle replays it exactly (same discipline as [[perplexity]] and
    * dsirWeights).
    *
    * Shape at 100 TB: the bigram model build is explode → groupBy(w1,w2)
    * (one linear shuffle, output bounded by observed-bigram cardinality);
    * the unigram conditioning counts join the MODEL (vocab-scale), not the
    * corpus; then one corpus-scale join back on the bigram key — zipfian
    * ('of the') → the AQE skew-split case. Docs need ≥ 2 tokens to own a
    * bigram event; shorter docs have no conditional likelihood and are
    * excluded by construction on both engines. `keep` is a fixed
    * 3.422-nat threshold (≈ p75 of the fixture's 3.28–3.63 band — the
    * near-random synthetic corpus keeps bigram costs near the smoothing
    * floor); production CCNet buckets by corpus percentile. */
  def bigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 2)
    val bi = docs.select(col("doc_id"), expr(
        "explode(transform(sequence(2, size(toks)), " +
          "i -> struct(element_at(toks, i - 1) AS w1, element_at(toks, i) AS w2)))")
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = docs.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cprev"))
    // vocab size: one scalar driver action (metadata scale)
    val v = math.max(uni.count(), 1L)
    val model = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .join(uni, "w1") // vocab-scale join, never touches the corpus
      .select(col("w1"), col("w2"),
        expr(s"cast(round(-ln((cb + 1) / (cprev + $v.0D)) * 1e6) AS BIGINT)").as("u"))
    bi.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_big"), sum(col("u")).as("su"))
      .select(col("doc_id"), col("n_big"), expr("su div n_big").as("nats_u"),
        (expr("su div n_big") <= lit(3422000L)).as("keep"))
      .orderBy("doc_id")
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003, the
    * MOSS algorithm): hash every word 5-gram with the 31-polynomial the
    * classify exprs use, slide a 4-gram window and select each window's
    * MINIMUM hash; the distinct selected values are the fingerprint. Any
    * run of ≥ w+k−1 shared tokens between two documents is guaranteed to
    * contribute a shared selected hash — offset-robust, unlike the whole-
    * document rolling hash in [[stats]] — at the published ~2/(w+1)
    * density. Expression-only: zero shuffles, one codegen pass per
    * document; a downstream join on exploded fingerprints is the
    * cross-doc detector (same candidates→verify shape as the dedup
    * family). */
  /** (doc_id, n_grams, fps) with fps the distinct selected winnowing
    * hashes — the shared core of [[winnowFingerprint]] and
    * [[winnowDupPairs]]. */
  private def winnowSets(s: SparkSession, dir: String): DataFrame = {
    // r16 optimization (guide §4.1): the fused WinnowFpsExpr replaces a
    // 3-layer HOF chain whose rolling hash paid an interpreted lambda per
    // CHARACTER of every 5-gram; semantics identical (Round16Spec pin
    // against the legacy spelling, fixture + unicode synthetics).
    import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
    Tables(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .withColumn("wf", column(graft.functions.WinnowFpsExpr(
        expression(col("toks")), 5, 4)))
      .select(col("doc_id"), col("wf.n_grams").as("n_grams"),
        col("wf.fps").as("fps"))
  }

  /** The pre-r16 HOF spelling of [[winnowSets]]'s gram/hash/window pipeline
    * over a `toks` column — kept ONLY as the Round16Spec equivalence
    * oracle for [[graft.functions.WinnowFpsExpr]]. */
  private[graft] def winnowFpsLegacy(withToks: DataFrame): DataFrame = {
    val k = 5
    val w = 4
    withToks
      .withColumn("g",
        when(size(col("toks")) < k, array().cast("array<string>"))
          .otherwise(expr(
            s"transform(sequence(1, size(toks) - ${k - 1}), " +
              s"i -> concat_ws(' ', slice(toks, i, $k)))")))
      .withColumn("h", expr(
        "transform(g, gr -> aggregate(transform(sequence(1, length(gr)), " +
          "i -> ascii(substring(gr, i, 1))), 0L, " +
          "(acc, c) -> (acc * 31 + c) % 1000000007))"))
      .withColumn("sel",
        when(size(col("h")) === 0, array().cast("array<bigint>"))
          .otherwise(expr(
            s"transform(sequence(1, greatest(size(h) - ${w - 1}, 1)), " +
              s"j -> array_min(slice(h, j, $w)))")))
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        array_sort(array_distinct(col("sel"))).as("fps"))
  }

  def winnowFingerprint(s: SparkSession, dir: String): DataFrame =
    winnowSets(s, dir)
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).as("n_fp"),
        expr("array_join(transform(fps, x -> cast(x AS STRING)), ',')").as("fp"))
      .orderBy("doc_id")

  /** Near-duplicate pairs over the winnowing fingerprints — the MOSS
    * detector's cross-document stage, and the cheap counterpart to the
    * exact n-gram Jaccard pairs (fingerprints are ~1/w of the grams, so
    * index and verify cost shrink by the winnow density). Same
    * candidates→verify shape as the rest of the dedup family: inverted
    * index on fingerprint hash with a hot cap (a boilerplate hash shared
    * by >64 docs is dropped from candidate GENERATION — at 100 TB that cap
    * is what stops one viral template from emitting n² candidates; the cap
    * is on the index side only, verification still sees full sets), then
    * one equi-join back to the fingerprint sets for the exact
    * Jaccard-over-sets verdict. */
  def winnowDupPairs(s: SparkSession, dir: String): DataFrame = {
    val sets = winnowSets(s, dir).select(col("doc_id"), col("fps"))
      .localCheckpoint(true)
    val posting = sets.select(col("doc_id"), explode(col("fps")).as("hsh"))
    val freq = posting.groupBy("hsh").agg(count(lit(1)).as("df"))
    val capped = posting.join(freq.where(col("df") <= 64).select("hsh"), "hsh")
    val cands = capped.as("a").join(capped.as("b"),
        col("a.hsh") === col("b.hsh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("fps").as("fa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("fps").as("fb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("fa"), col("fb"))).cast("double")
          / (size(col("fa")) + size(col("fb"))
            - size(array_intersect(col("fa"), col("fb")))), 4).as("j"))
      .where(col("j") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** q_text_entropy — character-distribution Shannon entropy, the cheap
    * gibberish/boilerplate gate quality pipelines run before anything
    * model-based (a keyboard-mash or base64 blob has near-uniform chars,
    * a repeated-char page near-zero; natural English sits ~2.5-3.1
    * nats/char). H = Σ_c (c_count/n)·ln(n/c_count), computed as integer
    * micro-nat terms (the tfidfTop3 quantization discipline — ln rounded
    * to the 1e-6 grid BEFORE the per-doc sum so both engines add the same
    * integers). Two linear shuffles: (doc, char) counts, then the per-doc
    * sum; at 100 TB both are partial-agg-first hash shuffles bounded by
    * |alphabet| ≈ dozens of rows per doc — never wider than the corpus. */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    val chars = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .where(length(col("ch")) > 0)
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val n = chars.groupBy("doc_id").agg(sum("c").as("n"))
    chars.join(n, "doc_id")
      .withColumn("term_u",
        expr("c * cast(round(ln(n / cast(c AS DOUBLE)) * 1e6) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(max("n").as("n_chars"), sum("term_u").as("ent_u"))
      // keep when mean entropy ≥ 2.5 nats/char (integer cross-multiply —
      // no division on the compare path)
      .withColumn("keep", expr("ent_u >= 2500000 * n_chars"))
      .select(col("doc_id"), col("n_chars"), col("ent_u"), col("keep"))
      .orderBy("doc_id")
  }

  /** q_text_mixed_lang — code-switching / mixed-language detection (the
    * CCNet §4.2 per-paragraph language check: a page whose halves vote
    * for different languages is dropped or split, since a document-level
    * langid mislabels it and the tokenizer pays for it). The fixture
    * plants the defect through the md5 bridge: 1/6 of docs get their
    * second half replaced by German filler. Each half is scored with the
    * [[langId]] stopword machinery (same tie order), mixed = the halves
    * disagree. Expression-only over the scan — no shuffle. */
  def mixedLang(s: SparkSession, dir: String): DataFrame = {
    val mdi = "CAST(conv(substr(md5(concat('ml:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    def score(half: String, words: Seq[String]): Column =
      size(array_intersect(array_distinct(col(half)),
        array(words.map(lit): _*)))
    def vote(p: String): Column =
      when(col(s"${p}_en") >= col(s"${p}_de") && col(s"${p}_en") >= col(s"${p}_fr")
          && col(s"${p}_en") >= col(s"${p}_es"), "en")
        .when(col(s"${p}_de") >= col(s"${p}_fr") && col(s"${p}_de") >= col(s"${p}_es"), "de")
        .when(col(s"${p}_fr") >= col(s"${p}_es"), "fr")
        .otherwise("es")
    Tables(s, dir, "documents")
      .withColumn("toks0", tokens(col("text")))
      // the plant swaps EXACTLY the second half's token count for German
      // filler, so text2's midpoint stays at the language boundary (a
      // length-changing filler would shift the half split into the
      // English part and dilute both votes)
      .withColumn("text2", expr(
        s"""CASE WHEN $mdi % 6 = 0 THEN concat(
           |  concat_ws(' ', slice(toks0, 1, CAST((size(toks0) + 1) / 2 AS INT))),
           |  ' ', concat_ws(' ', slice(
           |    split(repeat('der die das und ist nicht mit ein zu den ',
           |      CAST(size(toks0) / 10 AS INT) + 1), ' '),
           |    1, size(toks0) - CAST((size(toks0) + 1) / 2 AS INT))))
           |ELSE text END""".stripMargin))
      .withColumn("toks", tokens(col("text2")))
      .withColumn("nh", expr("CAST((size(toks) + 1) / 2 AS INT)"))
      .withColumn("h1", expr("slice(toks, 1, nh)"))
      .withColumn("h2", expr("slice(toks, nh + 1, size(toks) - nh)"))
      .withColumn("a_en", score("h1", stopEn)).withColumn("a_de", score("h1", stopDe))
      .withColumn("a_fr", score("h1", stopFr)).withColumn("a_es", score("h1", stopEs))
      .withColumn("b_en", score("h2", stopEn)).withColumn("b_de", score("h2", stopDe))
      .withColumn("b_fr", score("h2", stopFr)).withColumn("b_es", score("h2", stopEs))
      .select(col("doc_id"), vote("a").as("lang_a"), vote("b").as("lang_b"))
      .withColumn("mixed", col("lang_a") =!= col("lang_b"))
      .orderBy("doc_id")
  }

  /** Language ID by stopword-hit scoring over 4 language lists, ties broken
    * in fixed order en>de>fr>es. N-gram-heuristic class of the reference-era
    * langid tools; exact arithmetic so the oracle reproduces it. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    // tokenize + distinct ONCE, intersect per language (4x cheaper than
    // re-deriving the token set inside each score expression)
    def score(words: Seq[String]): Column =
      size(array_intersect(col("dt"), array(words.map(lit): _*)))
    Tables(s, dir, "documents")
      .withColumn("dt", array_distinct(tokens(col("text"))))
      .withColumn("s_en", score(stopEn)).withColumn("s_de", score(stopDe))
      .withColumn("s_fr", score(stopFr)).withColumn("s_es", score(stopEs))
      .select(col("doc_id"), col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es").as("lang_pred"))
      .orderBy("doc_id")
  }
}
