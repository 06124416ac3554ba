package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, GroupWindowSql, Similarity}
import graft.streaming.{Cep, MatchRecognizeSql, StreamDedup, StreamSource}

/** Round-15 pins: star-CC ≡ min-label (the clusterKeepFrom over-cap flip),
  * NEXT physical offsets in batch mode (semantics + end-of-partition NULL +
  * the unchanged streaming reject), FLIP-145 window_time, the TVF GROUP BY
  * clause-end fix, exact scale-tag matching, the single-slot prod-index
  * memo, and trigger-size invariance of the streaming PPJoin. */
class Round15Spec extends SparkSpec {

  test("star CC labels equal min-label CC labels (path + clique + isolated)") {
    // VERDICT r14 #2: clusterKeepFrom's over-cap branch now runs
    // large-star/small-star (O(log n) rounds) instead of min-label
    // propagation (O(diameter) rounds). The contract both must satisfy:
    // every vertex labeled with its component MINIMUM. The fixture is the
    // shape that motivated the flip — a long PATH (diameter = n-1, the
    // worst case for label propagation) next to a clique and an isolated
    // vertex.
    import spark.implicits._
    val pathEdges = (0L until 9L).map(i => (i, i + 1))          // 0-1-...-9
    val cliqueEdges = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val edges = spark.createDataset(pathEdges ++ cliqueEdges).toDF("src", "dst")
    val verts = spark.createDataset((0L to 9L) ++ (100L to 104L) :+ 999L).toDF("id")
    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = labelsOf(Graph.connectedComponentsStar(verts, edges, maxIter = 15))
    val minl = labelsOf(Graph.connectedComponents(verts, edges, maxIter = 30))
    assert(star === minl, "star CC must produce the min-label contract")
    assert(star(9L) === 0L && star(104L) === 100L && star(999L) === 999L)
  }

  test("NEXT physical offset in batch mode: ascending-run semantics") {
    // r15 (VERDICT r14 #5): forward lookahead on a BOUNDED partition.
    // values 1<2<3<5 | 4<7<9 | 2 — two maximal ascending runs of length
    // >= 3; UP matches while the physically next row is larger, TOP is
    // each run's peak.
    import spark.implicits._
    def ev(id: Long, sec: Int, v: Double) =
      StreamSource.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, "view", v)
    val events = spark.createDataset(Seq(
      ev(1, 1, 1.0), ev(2, 2, 2.0), ev(3, 3, 3.0), ev(4, 4, 5.0),
      ev(5, 5, 4.0), ev(6, 6, 7.0), ev(7, 7, 9.0), ev(8, 8, 2.0)))
    val steps = MatchRecognizeSql.parse(
      MatchRecognizeSql.matchNextSql, boundedInput = true).pattern.map(_._2)
    val got = Cep.matchRecognizeBoundedSkip(events, steps, Cep.SkipPastLastRow)
      .collect().map(m => (m.ids, m.counts)).toSeq
    assert(got === Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(3, 1)),   // UP={1,2,3}, TOP=4 (value 5)
      (Seq(5L, 6L, 7L), Seq(2, 1))),      // UP={5,6},  TOP=7 (value 9)
      s"unexpected NEXT matches: $got")
  }

  test("NEXT off the partition end is SQL NULL; streaming keeps the loud reject") {
    import spark.implicits._
    def ev(id: Long, sec: Int, v: Double) =
      StreamSource.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, "view", v)
    // ascending straight to end-of-data: the peak row's NEXT is NULL →
    // UP stops there, TOP lands on the partition's last row
    val events = spark.createDataset(Seq(ev(1, 1, 1.0), ev(2, 2, 2.0), ev(3, 3, 3.0)))
    val steps = MatchRecognizeSql.parse(
      MatchRecognizeSql.matchNextSql, boundedInput = true).pattern.map(_._2)
    val got = Cep.matchRecognizeBoundedSkip(events, steps, Cep.SkipPastLastRow)
      .collect().map(_.ids).toSeq
    assert(got === Seq(Seq(1L, 2L, 3L)),
      "a run ending at the partition end must still match (NEXT NULL stops UP at the peak)")
    // a two-row ascent has only one UP candidate — below UP{2,}: no match
    val short = spark.createDataset(Seq(ev(1, 1, 1.0), ev(2, 2, 2.0)))
    assert(Cep.matchRecognizeBoundedSkip(short, steps, Cep.SkipPastLastRow)
      .collect().isEmpty)
    // the STREAMING path's reject is unchanged (default parse)
    val ex = intercept[IllegalArgumentException](
      MatchRecognizeSql.parse(MatchRecognizeSql.matchNextSql))
    assert(ex.getMessage.contains("NEXT"), s"wrong reject: ${ex.getMessage}")
  }

  test("anchors ^/$ in batch mode: partition-pinned matches; streaming reject") {
    import spark.implicits._
    def ev(id: Long, sec: Int, et: String, v: Double = 1.0) =
      StreamSource.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, et, v)
    // ^ A+ B over [view, view, purchase, view, purchase]: only the OPENING
    // run matches (rows 1-3); the second purchase's run starts past the
    // anchor and must NOT match
    val spec = MatchRecognizeSql.parse(
      MatchRecognizeSql.matchAnchorStartSql, boundedInput = true)
    assert(spec.anchorStart && !spec.anchorEnd)
    val steps = spec.pattern.map(_._2)
    val events = spark.createDataset(Seq(
      ev(1, 1, "view"), ev(2, 2, "view"), ev(3, 3, "purchase"),
      ev(4, 4, "view"), ev(5, 5, "purchase")))
    val got = Cep.matchRecognizeBoundedSkip(events, steps, Cep.SkipPastLastRow,
      anchorStart = true).collect().map(_.ids).toSeq
    assert(got === Seq(Seq(1L, 2L, 3L)),
      s"^ must pin the match to the partition start only: $got")
    // a partition whose FIRST row is a purchase has no anchored match at
    // all, even though an interior run exists
    val startsWithPurchase = spark.createDataset(Seq(
      ev(1, 1, "purchase"), ev(2, 2, "view"), ev(3, 3, "purchase")))
    assert(Cep.matchRecognizeBoundedSkip(startsWithPurchase, steps,
      Cep.SkipPastLastRow, anchorStart = true).collect().isEmpty)
    // $ A B+ over [purchase, view, purchase, view, view]: only the LAST
    // purchase's run reaches the partition end
    val specE = MatchRecognizeSql.parse(
      MatchRecognizeSql.matchAnchorEndSql, boundedInput = true)
    assert(specE.anchorEnd && !specE.anchorStart)
    val tail = spark.createDataset(Seq(
      ev(1, 1, "purchase"), ev(2, 2, "view"), ev(3, 3, "purchase"),
      ev(4, 4, "view"), ev(5, 5, "view")))
    val gotE = Cep.matchRecognizeBoundedSkip(tail, specE.pattern.map(_._2),
      Cep.SkipPastLastRow, anchorEnd = true).collect().map(_.ids).toSeq
    assert(gotE === Seq(Seq(3L, 4L, 5L)),
      s"$$ must pin the match end to the partition's last row: $gotE")
    // streaming keeps the loud reject (default parse), same as NEXT
    val ex = intercept[IllegalArgumentException](
      MatchRecognizeSql.parse(MatchRecognizeSql.matchAnchorStartSql))
    assert(ex.getMessage.contains("anchors"), s"wrong reject: ${ex.getMessage}")
  }

  test("q_sql_match_next equals the ascending-islands window derivation") {
    val viaMr = MatchRecognizeSql.matchNext(spark, sf).collect().map(_.toSeq)
    Tables.registerAll(spark, sf)
    val expected = spark.sql(
      """WITH o AS (SELECT user_id, event_id, value,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS rn FROM events),
        |b AS (SELECT *, CASE WHEN value > lag(value)
        |        OVER (PARTITION BY user_id ORDER BY rn)
        |      THEN 0 ELSE 1 END AS brk FROM o),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM b),
        |r AS (SELECT user_id, grp, count(*) AS m,
        |        min_by(event_id, rn) AS strt_id, max_by(event_id, rn) AS peak_id,
        |        max_by(value, rn) AS peak_val
        |      FROM g GROUP BY user_id, grp)
        |SELECT user_id, strt_id, peak_id, CAST(m - 1 AS BIGINT) AS n_up,
        |       round(peak_val, 6) AS peak_val
        |FROM r WHERE m >= 3
        |ORDER BY user_id, strt_id, peak_id, n_up, peak_val""".stripMargin)
      .collect().map(_.toSeq)
    assert(viaMr === expected)
    assert(viaMr.nonEmpty, "fixture must contain ascending runs of >= 3 rows")
  }

  test("FLIP-145 window_time lowers onto *_ROWTIME and equals window_end - 1ms") {
    val lowered = GroupWindowSql.rewriteTvf(GroupWindowSql.tvfWindowTimeSql)
    assert(lowered.contains("TUMBLE_ROWTIME(ts, INTERVAL '1' DAY)"),
      s"window_time must lower onto the dialect's ROWTIME selector:\n$lowered")
    val rows = GroupWindowSql.tvfWindowTime(spark, sf)
      .withColumn("expect", col("w_start") + expr("INTERVAL 1 DAY") -
        expr("INTERVAL 1 MILLISECOND"))
    assert(rows.where(col("w_time") =!= col("expect")).count() === 0L)
    assert(rows.count() > 0)
    // the other four columns are exactly the proven TVF tumble's
    val base = GroupWindowSql.tvfTumble(spark, sf)
      .collect().map(_.toSeq).toSeq
    val thisOne = rows.select("w_start", "event_type", "cnt", "sum_value")
      .collect().map(_.toSeq).toSeq
    assert(thisOne === base)
  }

  test("TVF GROUP BY substitution stops at a closing paren / later clauses") {
    // r15 ADVICE fix: the clause-end regex knows WINDOW/UNION/')' — a TVF
    // aggregation inside a derived table must substitute ONLY inside its
    // own GROUP BY span, leaving the outer query intact
    val sql =
      """SELECT c FROM (SELECT window_start, window_end, count(*) AS c
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY))
        |GROUP BY window_start, window_end) t ORDER BY c""".stripMargin
    val lowered = GroupWindowSql.rewriteTvf(sql)
    assert(lowered.contains("GROUP BY TUMBLE(ts, INTERVAL '1' DAY)) t ORDER BY c"),
      s"pair substitution must end at the derived table's closing paren:\n$lowered")
    // and the lowered statement actually runs
    val n = GroupWindowSql.runTvf(spark, sf, sql).count()
    assert(n > 0)
  }

  test("TPC-DS scale tags match exactly (sf10 / sf1.5 are not scale 100)") {
    import graft.tpcds.TpcdsData.scaleOf
    assert(scaleOf("/root/testdata/sf0.1") === 10)
    assert(scaleOf("sf1") === 100)
    assert(scaleOf("/root/testdata/sf0.01") === 1)
    assert(scaleOf("sf10") === 1)
    assert(scaleOf("sf1.5") === 1)
    assert(scaleOf("no-tag-at-all") === 1)
  }

  test("prod-index memo holds one slot and reuses per (dir, session)") {
    val a = Similarity.prodIndexFor(spark, sf)
    val b = Similarity.prodIndexFor(spark, sf)
    assert(a eq b, "same dir + live session must reuse the fitted index")
  }

  test("streaming PPJoin is trigger-size invariant (the deployment dial)") {
    // maxFilesPerTrigger moves pairs between the state path (cross-batch)
    // and the in-batch accumulation buffer — the verified pair set must
    // not move with it (exact recall whatever the batching)
    def pairs(mft: Int): Seq[Seq[Any]] =
      StreamDedup.ppjoinStream(spark, sf, mft).collect().map(_.toSeq).toSeq
    val oneFile = pairs(1)
    assert(pairs(4) === oneFile)
    assert(oneFile.nonEmpty, "sf0.001 must contain at least one J>=0.5 pair")
  }
}
