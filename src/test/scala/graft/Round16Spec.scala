package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupWindowSql
import graft.streaming.{Cep, MatchRecognizeSql, StreamDedup, StreamSource}

/** Round-16 pins: the full MATCH_RECOGNIZE grammar in bounded mode (PERMUTE
  * and grouped repetition, anchors composing with both), the TTL-bounded
  * streaming PPJoin (horizon eviction + idle-bucket timeout, state row
  * count bounded), the balanced-paren TVF GROUP BY scan (parenthesized
  * grouping keys, loud pair-missing reject), and window_time ≡
  * window_end − 1ms over the HOP and SESSION assigners. */
class Round16Spec extends SparkSpec {

  private def ev(id: Long, sec: Int, tpe: String) =
    StreamSource.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, tpe, 0.0)

  private val view = Cep.QStep.once(_.event_type == "view").copy(name = "A")
  private val click = Cep.QStep.once(_.event_type == "click").copy(name = "B")

  test("anchors compose with PERMUTE in bounded mode") {
    import spark.implicits._
    val alts = Seq(Seq(view, click), Seq(click, view))
    // click view | click view — PERMUTE(A,B) matches at rows 1-2 and 3-4
    val events = spark.createDataset(Seq(
      ev(1, 1, "click"), ev(2, 2, "view"), ev(3, 3, "click"), ev(4, 4, "view")))
    def ids(anchorStart: Boolean, anchorEnd: Boolean): Seq[Seq[Long]] =
      Cep.matchRecognizeBoundedAlts(events, alts, Cep.SkipPastLastRow,
        anchorStart = anchorStart, anchorEnd = anchorEnd)
        .collect().map(_.ids).toSeq
    assert(ids(false, false) === Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(ids(anchorStart = true, anchorEnd = false) === Seq(Seq(1L, 2L)),
      "^ must keep only the partition-opening permutation")
    assert(ids(anchorStart = false, anchorEnd = true) === Seq(Seq(3L, 4L)),
      "$ must keep only the partition-closing permutation")
    assert(ids(anchorStart = true, anchorEnd = true).isEmpty,
      "^ PERMUTE(A,B) $ cannot cover a 4-row partition")
    // whole-partition match fires the SECOND alternative (B A — alt=1)
    val two = spark.createDataset(Seq(ev(1, 1, "click"), ev(2, 2, "view")))
    val whole = Cep.matchRecognizeBoundedAlts(two, alts, Cep.SkipPastLastRow,
      anchorStart = true, anchorEnd = true)
      .collect().map(m => (m.ids, m.alt)).toSeq
    assert(whole === Seq((Seq(1L, 2L), 1)),
      "the click-first permutation must fire as alternative 1")
  }

  test("anchors compose with grouped repetition in bounded mode") {
    import spark.implicits._
    // ^ (A B)* A $ — whole-partition alternating parse, repetition count
    // decided by the data (alt carries k)
    val ok = spark.createDataset(Seq(
      ev(1, 1, "view"), ev(2, 2, "click"), ev(3, 3, "view"),
      ev(4, 4, "click"), ev(5, 5, "view")))
    val got = Cep.matchRecognizeBoundedGroup(ok, Seq(view, click), Seq(view),
      minRep = 0, Cep.SkipPastLastRow, anchorStart = true, anchorEnd = true)
      .collect().map(m => (m.ids, m.alt)).toSeq
    assert(got === Seq((Seq(1L, 2L, 3L, 4L, 5L), 2)),
      s"5 alternating rows must parse as k=2 repetitions + tail: $got")
    // 4 alternating rows: no repetition count lands the tail A on the last
    // row (k=2 needs 5 rows, k=1 ends at row 3, k=0 at row 1) → no match
    val bad = spark.createDataset(Seq(
      ev(1, 1, "view"), ev(2, 2, "click"), ev(3, 3, "view"), ev(4, 4, "click")))
    assert(Cep.matchRecognizeBoundedGroup(bad, Seq(view, click), Seq(view),
      minRep = 0, Cep.SkipPastLastRow, anchorStart = true, anchorEnd = true)
      .collect().isEmpty)
  }

  test("runBatch accepts the full grammar (PERMUTE + grouped repetition)") {
    // end-to-end: the r15 subset require is gone; both statements run
    // bounded with rows (their oracle equality to the streaming twins is
    // the Verify gate's job — q_sql_match_batch_permute/_group)
    assert(MatchRecognizeSql.matchPermuteBatch(spark, sf).count() > 0)
    assert(MatchRecognizeSql.matchMultiBatch(spark, sf).count() > 0)
  }

  test("TVF GROUP BY scan skips balanced parens (date_trunc grouping key)") {
    // pair BEFORE the parenthesized key: the r15 regex truncated the span
    // at date_trunc's ')' — harmless here, but the span must now cover it
    val before =
      """SELECT window_start AS w_start, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY))
        |GROUP BY window_start, window_end, date_trunc('day', ts)
        |ORDER BY w_start""".stripMargin
    val lb = GroupWindowSql.rewriteTvf(before)
    assert(lb.contains("GROUP BY TUMBLE(ts, INTERVAL '1' DAY), date_trunc('day', ts)"),
      s"pair before a parenthesized key must substitute:\n$lb")
    // pair AFTER the parenthesized key: the r15 silent miss — the scan
    // stopped at date_trunc's ')' and never reached the pair
    val after =
      """SELECT window_start AS w_start, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY))
        |GROUP BY date_trunc('day', ts), window_start, window_end
        |ORDER BY w_start""".stripMargin
    val la = GroupWindowSql.rewriteTvf(after)
    assert(la.contains("GROUP BY date_trunc('day', ts), TUMBLE(ts, INTERVAL '1' DAY)"),
      s"pair after a parenthesized key must substitute:\n$la")
    // both lowered statements actually run
    assert(GroupWindowSql.runTvf(spark, sf, before).count() > 0)
    assert(GroupWindowSql.runTvf(spark, sf, after).count() > 0)
    // a GROUP BY without the pair is a LOUD reject, not a silent miss
    val bad =
      """SELECT event_type, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY))
        |GROUP BY event_type""".stripMargin
    val ex = intercept[IllegalArgumentException](GroupWindowSql.rewriteTvf(bad))
    assert(ex.getMessage.contains("window_start"), s"wrong reject: ${ex.getMessage}")
  }

  test("window_time = window_end - 1ms over HOP and SESSION TVFs") {
    val hopLowered = GroupWindowSql.rewriteTvf(GroupWindowSql.tvfHopTimeSql)
    assert(hopLowered.contains(
      "HOP_ROWTIME(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY)"),
      s"HOP window_time must lower onto HOP_ROWTIME:\n$hopLowered")
    val hop = GroupWindowSql.tvfHopTime(spark, sf)
      .withColumn("expect", col("w_start") + expr("INTERVAL 1 DAY") -
        expr("INTERVAL 1 MILLISECOND"))
    assert(hop.where(col("w_time") =!= col("expect")).count() === 0L)
    assert(hop.count() > 0)
    val sesLowered = GroupWindowSql.rewriteTvf(GroupWindowSql.tvfSessionTimeSql)
    assert(sesLowered.contains("SESSION_ROWTIME(ts, INTERVAL '1' HOUR)"),
      s"SESSION window_time must lower onto SESSION_ROWTIME:\n$sesLowered")
    // SESSION's end is data-driven — compare against the proven TVF
    // session's w_end per (user, window start)
    val ses = GroupWindowSql.tvfSessionTime(spark, sf)
      .select(col("user_id"), col("w_start"), col("w_time"))
    val base = GroupWindowSql.tvfSession(spark, sf)
      .select(col("user_id"), col("w_start"),
        (col("w_end") - expr("INTERVAL 1 MILLISECOND")).as("expect"))
    val joined = ses.join(base, Seq("user_id", "w_start"))
    assert(joined.count() === ses.count(), "every session must line up")
    assert(joined.where(col("w_time") =!= col("expect")).count() === 0L)
  }

  test("TTL-bounded streaming PPJoin: horizon evicts, state stays bounded") {
    // VERDICT r15 what's-wrong #2. doc_ids replay globally ascending, so
    // doc_id is the stream's logical clock; horizon 100 splits sf0.001's
    // 28 true pairs (distances 4..445).
    val dir = sf
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(StreamDedup.ppjoinStream(spark, dir))
    val fullState = StreamDedup.lastStateRows
    val ttl = pairSet(StreamDedup.ppjoinStreamTtl(spark, dir, 100L, 1))
    val ttlState = StreamDedup.lastStateRows
    // pairs within the horizon unchanged; beyond-horizon pairs gone
    assert(ttl === full.filter { case (a, b) => b - a <= 100L },
      "TTL pairs must be exactly the within-horizon subset of the full join")
    assert(ttl.nonEmpty && ttl != full,
      "horizon 100 must be load-bearing (keeps some pairs, drops some)")
    assert(full.exists { case (a, b) => b - a > 100L },
      "fixture must contain a beyond-horizon pair to demonstrate eviction")
    // state row count provably bounded below the NoTimeout run's
    assert(fullState > 0 && ttlState > 0,
      s"state progress must be captured (full=$fullState, ttl=$ttlState)")
    assert(ttlState < fullState,
      s"TTL state ($ttlState rows) must stay under NoTimeout state ($fullState rows)")
  }

  test("TTL-bounded streaming LSH dedup: keep-set relaxes monotonically, state bounded") {
    // the minhash twin of the PPJoin TTL pin: only verified pairs WITHIN
    // the horizon evict a document, so the TTL keep-set is a strict
    // SUPERSET of the unbounded run's (fewer pairs seen → more docs kept)
    def keeps(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val full = keeps(StreamDedup.minhashStreamKeep(spark, sf))
    val fullState = StreamDedup.lastStateRows
    val ttl = keeps(StreamDedup.minhashStreamKeepTtl(spark, sf, 100L, 1))
    val ttlState = StreamDedup.lastStateRows
    assert(full.subsetOf(ttl), "horizon must only ADD kept documents")
    assert(ttl != full, "horizon 100 must be load-bearing on the keep set")
    assert(fullState > 0 && ttlState > 0, "state progress must be captured")
    assert(ttlState < fullState,
      s"TTL state ($ttlState rows) must stay under NoTimeout state ($fullState rows)")
  }

  test("BM25 retrieval: contiguous ranks, monotone scores, no self-match") {
    val rows = graft.operators.Retrieval.bm25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length),
        s"qid $q ranks must be contiguous from 1")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"qid $q scores must be non-increasing down the ranking: $scores")
      assert(!rs.exists(_.getLong(2) == q), s"qid $q must not retrieve itself")
    }
  }

  test("hybrid RRF: fused score recomputes exactly from the two source lists") {
    val sparse = graft.operators.Retrieval.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val dense = graft.operators.Similarity.annBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val fused = graft.operators.Retrieval.hybridRrf(spark, sf).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect =
        sparse.get(key).map(rk => 1000000L / (60L + rk)).getOrElse(0L) +
        dense.get(key).map(rk => 1000000L / (60L + rk)).getOrElse(0L)
      assert(r.getLong(3) === expect,
        s"RRF mismatch at $key: got ${r.getLong(3)}, want $expect")
    }
    // fusion is load-bearing: at least one fused top-10 contains a doc
    // from EACH source list (lexical-only and semantic-only candidates)
    val fusedKeys = fused.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(fusedKeys.exists(sparse.contains), "a BM25 doc must surface")
    assert(fusedKeys.exists(dense.contains), "a dense doc must surface")
  }

  test("SQL-level anchors compose with PERMUTE in batch mode (review fix)") {
    // r16 review finding: the matchers accepted anchor flags but parse()
    // still rejected anchors outside the sequential subset, so the SQL
    // surface could never reach them — the gate is now bounded-mode only
    val anchoredSql =
      """SELECT user_id, a_id, b_id FROM events
        |MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES A.event_id AS a_id, B.event_id AS b_id
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (^ PERMUTE(A, B))
        |  DEFINE A AS event_type = 'view', B AS event_type = 'click'
        |)""".stripMargin
    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val anchored = keys(MatchRecognizeSql.runBatch(spark, sf, anchoredSql))
    val free = keys(MatchRecognizeSql.matchPermuteBatch(spark, sf))
    assert(anchored.subsetOf(free),
      "^ must only REMOVE permutation matches (those not at partition start)")
    assert(anchored != free, "^ must be load-bearing on the fixture")
    // the streaming path still rejects anchors loudly
    val ex = intercept[IllegalArgumentException](
      MatchRecognizeSql.run(spark, sf, anchoredSql))
    assert(ex.getMessage.contains("BATCH"), s"wrong reject: ${ex.getMessage}")
  }

  test("TVF pair substitution skips an intervening pair-less GROUP BY (review fix)") {
    // a derived table whose GROUP BY sits between the TVF call site and
    // the windowed aggregation must not capture the anchor
    val sql =
      """SELECT window_start AS w_start, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY)) w
        |JOIN (SELECT user_id, count(*) AS n FROM events GROUP BY user_id) d
        |  ON w.user_id = d.user_id
        |GROUP BY window_start, window_end
        |ORDER BY w_start""".stripMargin
    val lowered = GroupWindowSql.rewriteTvf(sql)
    assert(lowered.contains("GROUP BY TUMBLE(ts, INTERVAL '1' DAY)"),
      s"the windowed clause (not the derived table's) must be substituted:\n$lowered")
    assert(lowered.contains("GROUP BY user_id"),
      s"the derived table's GROUP BY must be untouched:\n$lowered")
  }

  test("hybrid RRF over IVF-PQ: same contract, scores recompute from the swapped list") {
    val sparse = graft.operators.Retrieval.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val dense = graft.operators.Similarity.annIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val fused = graft.operators.Retrieval.hybridRrfIvf(spark, sf).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect =
        sparse.get(key).map(rk => 1000000L / (60L + rk)).getOrElse(0L) +
        dense.get(key).map(rk => 1000000L / (60L + rk)).getOrElse(0L)
      assert(r.getLong(3) === expect,
        s"IVF-PQ RRF mismatch at $key: got ${r.getLong(3)}, want $expect")
    }
  }

  test("shingles3 expression ≡ the HOF spelling (distinct, order, guards)") {
    import spark.implicits._
    val rows = Seq(
      Seq("a", "b", "c", "d"),            // two grams
      Seq("x", "x", "x", "x", "x"),       // duplicates collapse to one
      Seq("a", "b"),                      // n < 3 → empty
      Seq.empty[String],                  // empty → empty
      null,                               // null → null
      Seq("a", null, "c", "d")            // null token: concat_ws skips it
    )
    val df = spark.createDataset(rows.map(r =>
      Option(r).map(_.map(Option(_))).orNull))(
      implicitly[org.apache.spark.sql.Encoder[Seq[Option[String]]]])
      .toDF("toks").withColumn("toks", col("toks").cast("array<string>"))
    val legacy = array_distinct(
      when(size(col("toks")) < lit(3), array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(1, size(toks) - 2), " +
            "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))")))
    val out = df.select(
      graft.operators.Dedup.shingles(col("toks")).as("fast"),
      legacy.as("slow")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"mismatch: $r")
    }
  }

  test("winnow_fps expression ≡ the legacy HOF spelling (fixture + synthetics)") {
    import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}
    import graft.operators.TextAnalysis
    def fused(withToks: org.apache.spark.sql.DataFrame) =
      withToks.withColumn("wf",
          column(graft.functions.WinnowFpsExpr(expression(col("toks")), 5, 4)))
        .select(col("doc_id"), col("wf.n_grams").as("n_grams"),
          col("wf.fps").as("fps"))
    def check(withToks: org.apache.spark.sql.DataFrame): Unit = {
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2))).toMap
      val f = m(fused(withToks))
      val l = m(TextAnalysis.winnowFpsLegacy(withToks))
      assert(f.keySet === l.keySet)
      f.keys.foreach(id => assert(f(id) === l(id), s"doc $id: ${f(id)} vs ${l(id)}"))
    }
    // real fixture: every document, tokens() exactly as winnowSets builds them
    check(Tables(spark, sf, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
    // synthetics: short/exact-k/window-short/duplicate/multibyte/empty-token
    import spark.implicits._
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", "b", "c", "d"),                      // n < k → 0 grams
      2L -> Seq("a", "b", "c", "d", "e"),                 // exactly k → 1 gram < w
      3L -> Seq("a", "b", "c", "d", "e", "f", "g"),       // 3 grams < w windows
      4L -> (1 to 30).map(i => s"t${i % 7}"),             // repeats → distinct collapse
      5L -> Seq("héllo", "wörld", "日本語", "🎉emoji", "x", "ß", "末"), // multibyte + astral
      6L -> Seq("", "a", "", "b", "c", "", "d"),          // empty-string tokens
      7L -> Seq.empty[String])
    check(spark.createDataset(rows).toDF("doc_id", "toks"))
    // null toks is unreachable in production (split of non-null text);
    // the fused kernel is null-in → null-out
    val nul = spark.sql("SELECT 8L AS doc_id, CAST(NULL AS ARRAY<STRING>) AS toks")
    assert(fused(nul).collect()(0).isNullAt(1))
  }

  test("shared pair table: PPJoin builder ≡ the capped inverted-index join") {
    // the r16 shared-materialization swap (ngramJaccardPairsShared now
    // builds via ppjoinPairs): both spellings must produce the identical
    // exact pair set — same (doc_a, doc_b) keys, same rounded j
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = m(graft.operators.Dedup.ngramJaccardPairs(spark, sf))
    val pp = m(graft.operators.Dedup.ppjoinPairs(spark, sf))
    assert(pp.keySet === brute.keySet,
      s"pair-set drift: only-pp=${pp.keySet -- brute.keySet} only-brute=${brute.keySet -- pp.keySet}")
    pp.keys.foreach(k => assert(pp(k) === brute(k), s"j drift at $k"))
    assert(pp.nonEmpty, "fixture must contain planted near-dup pairs")
  }
}
