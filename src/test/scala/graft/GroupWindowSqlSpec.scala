package graft

import graft.operators.{GroupWindowSql, WindowAggs}

/** Group-window SQL dialect: rewrite units plus equivalence of each SQL
  * text against the API-path window aggregation. */
class GroupWindowSqlSpec extends SparkSpec {

  test("TUMBLE family rewrites onto window() with struct selectors") {
    val r = GroupWindowSql.rewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS s, TUMBLE_END(ts, INTERVAL '1' DAY) AS e " +
        "FROM t GROUP BY TUMBLE(ts, INTERVAL '1' DAY)")
    assert(r === "SELECT window.start AS s, window.end AS e FROM t GROUP BY window(ts, '1 day')")
  }

  test("HOP takes (time, slide, size) and maps onto window(time, size, slide)") {
    val r = GroupWindowSql.rewrite(
      "GROUP BY HOP(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY)")
    assert(r === "GROUP BY window(ts, '1 day', '12 hour')")
  }

  test("SESSION maps onto session_window with its own struct name") {
    val r = GroupWindowSql.rewrite(
      "SELECT SESSION_START(ts, INTERVAL '30' MINUTE) AS s FROM t " +
        "GROUP BY SESSION(ts, INTERVAL '30' MINUTE)")
    assert(r === "SELECT session_window.start AS s FROM t GROUP BY session_window(ts, '30 minute')")
  }

  test("CUMULATE expands structurally into the aligned explode form") {
    val r = GroupWindowSql.rewrite(
      "SELECT CUMULATE_START(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY) AS s FROM events " +
        "GROUP BY CUMULATE(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY)")
    assert(r.contains("__cum_start, __cum_k"), r)
    assert(r.contains("LATERAL VIEW explode(sequence("), r)
    assert(r.contains("pmod(unix_micros(ts), 86400000000L)"), r)
    assert(r.startsWith("SELECT __cum_start AS s FROM (SELECT *,"), r)
  }

  test("CUMULATE windows are half-open: a step-boundary row joins only later windows") {
    import spark.implicits._
    // one row exactly on the 06:00 step boundary, one mid-window at 05:00
    Seq(("2024-03-01 06:00:00", 1.0), ("2024-03-01 05:00:00", 2.0))
      .toDF("s", "value").selectExpr("CAST(s AS TIMESTAMP) AS ts", "value")
      .createOrReplaceTempView("cum_edge")
    val r = spark.sql(GroupWindowSql.rewrite(
      """SELECT CUMULATE_END(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY) AS w_end,
        | round(sum(value), 2) AS sv
        |FROM cum_edge
        |GROUP BY CUMULATE(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY)
        |ORDER BY w_end""".stripMargin))
      .collect().map(row => (row.getTimestamp(0).toString, row.getDouble(1)))
    // 06:00 row is NOT in the window ending 06:00 ([00:00,06:00) excludes it)
    assert(r === Seq(
      ("2024-03-01 06:00:00.0", 2.0),  // only the 05:00 row
      ("2024-03-01 12:00:00.0", 3.0),
      ("2024-03-01 18:00:00.0", 3.0),
      ("2024-03-02 00:00:00.0", 3.0)), r.toSeq)
  }

  test("SQL cumulate equals the API cumulate") {
    assert(GroupWindowSql.cumulate(spark, sf).collect().map(_.toSeq) ===
      WindowAggs.cumulate(spark, sf).collect().map(_.toSeq))
  }

  test("non-window SQL passes through untouched") {
    val q = "SELECT count(*) FROM t WHERE x = 'TUMBLEWEED'"
    assert(GroupWindowSql.rewrite(q) === q)
  }

  test("SQL tumble equals the API tumble") {
    assert(GroupWindowSql.tumble(spark, sf).collect().map(_.toSeq) ===
      WindowAggs.tumble(spark, sf).collect().map(_.toSeq))
  }

  test("SQL hop equals the API hop") {
    assert(GroupWindowSql.hop(spark, sf).collect().map(_.toSeq) ===
      WindowAggs.hop(spark, sf).collect().map(_.toSeq))
  }

  test("streaming SQL tumble equals the batch SQL tumble") {
    assert(GroupWindowSql.streamTumble(spark, sf).collect().map(_.toSeq) ===
      GroupWindowSql.tumble(spark, sf).collect().map(_.toSeq))
  }

  test("SQL session equals the API session") {
    assert(GroupWindowSql.session(spark, sf).collect().map(_.toSeq) ===
      WindowAggs.session(spark, sf).collect().map(_.toSeq))
  }

  test("FLIP-145 TVF syntax lowers onto the group-window dialect") {
    // textual lowering: the TVF wrapper disappears, GROUP BY's adjacent
    // (window_start, window_end) pair becomes the assigner, selectors
    // become *_START/*_END
    val lowered = GroupWindowSql.rewriteTvf(GroupWindowSql.tvfTumbleSql)
    assert(lowered.contains("GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type"))
    assert(lowered.contains("TUMBLE_START(ts, INTERVAL '1' DAY) AS w_start"))
    assert(!lowered.toUpperCase.contains("DESCRIPTOR"))
    // non-TVF SQL passes through untouched
    assert(GroupWindowSql.rewriteTvf(GroupWindowSql.tumbleSql) ===
      GroupWindowSql.tumbleSql)
  }

  test("TVF tumble/hop/cumulate equal their group-window twins") {
    assert(GroupWindowSql.tvfTumble(spark, sf).collect().map(_.toSeq) ===
      GroupWindowSql.tumble(spark, sf).collect().map(_.toSeq))
    assert(GroupWindowSql.tvfHop(spark, sf).collect().map(_.toSeq) ===
      GroupWindowSql.hop(spark, sf).collect().map(_.toSeq))
    assert(GroupWindowSql.tvfCumulate(spark, sf).collect().map(_.toSeq) ===
      GroupWindowSql.cumulate(spark, sf).collect().map(_.toSeq))
  }

  test("SESSION TVF (1.14 FLIP-145 completion) equals the session dialect") {
    assert(GroupWindowSql.tvfSession(spark, sf).collect().map(_.toSeq) ===
      GroupWindowSql.session(spark, sf).collect().map(_.toSeq))
    // the key descriptor must be realized as a grouping key IN the GROUP
    // BY clause — a key mentioned only in HAVING must not pass (sessions
    // would silently merge across keys otherwise)
    val e = intercept[IllegalArgumentException] {
      GroupWindowSql.rewriteTvf(
        """SELECT window_start, count(*) AS cnt
          |FROM TABLE(SESSION(TABLE events, DESCRIPTOR(ts), DESCRIPTOR(user_id), INTERVAL '1' HOUR))
          |GROUP BY window_start, window_end
          |HAVING max(user_id) > 0""".stripMargin)
    }
    assert(e.getMessage.contains("user_id"))
  }

  test("TVF pair substitution is scoped to the GROUP BY clause (r14 ADVICE)") {
    // the canonical FLIP-145 shape: the SELECT list carries the bare
    // window_start, window_end PAIR — it must lower to *_START/*_END
    // selectors, not the assigner (only the GROUP BY pair becomes one)
    val lowered = GroupWindowSql.rewriteTvf(
      """SELECT window_start, window_end, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY))
        |GROUP BY window_start, window_end
        |ORDER BY window_start""".stripMargin)
    assert(lowered.contains(
      "SELECT TUMBLE_START(ts, INTERVAL '1' DAY), TUMBLE_END(ts, INTERVAL '1' DAY)"))
    assert(lowered.contains("GROUP BY TUMBLE(ts, INTERVAL '1' DAY)"))
    assert(lowered.contains("ORDER BY TUMBLE_START(ts, INTERVAL '1' DAY)"))
    // window_time (r15 — implemented, formerly rejected): FLIP-145's third
    // column lowers onto the dialect's *_ROWTIME selector (end − 1ms)
    val withTime = GroupWindowSql.rewriteTvf(
      """SELECT window_start, window_time, count(*) AS cnt
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' DAY))
        |GROUP BY window_start, window_end""".stripMargin)
    assert(withTime.contains("TUMBLE_ROWTIME(ts, INTERVAL '1' DAY)"),
      s"window_time must lower onto the ROWTIME selector:\n$withTime")
  }
}
