package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** SQL text surface for MATCH_RECOGNIZE, routed onto Cep.matchRecognize —
  * the reference exposes CEP through SQL (StreamExecMatch translating the
  * MATCH_RECOGNIZE relational node onto the CEP operator,
  * flink-table-planner-blink/.../stream/StreamExecMatch.scala:68; grammar
  * docs/dev/table/sql/queries.md:366). Spark's parser has no
  * MATCH_RECOGNIZE production, so this module accepts the SQL text
  * directly — the same position the reference's parser occupies — and
  * compiles it onto the streaming matcher.
  *
  * Supported subset (documented contract, spec-pinned):
  *   SELECT <partition col and/or measure aliases> FROM events
  *   MATCH_RECOGNIZE (
  *     PARTITION BY user_id
  *     ORDER BY ts
  *     MEASURES { FIRST(V.f) | LAST(V.f) | V.f | COUNT(V.*)
  *              | SUM(V.value) | MIN(V.value) | MAX(V.value)
  *              | AVG(V.value) } AS alias, ...   -- f ∈ event_id, value
  *                                               -- doubles rounded to 6
  *     [ONE ROW PER MATCH]
  *     AFTER MATCH SKIP { TO NEXT ROW | PAST LAST ROW }
  *     PATTERN (V[+|+?|*|*?|{n}] ...)
  *     DEFINE V AS <pred> [, ...]
  *   )
  * where <pred> is AND/OR combinations (no parentheses) of comparisons
  * `field op literal` over the event fields (event_type/value/user_id/
  * event_id), or TRUE. A pattern variable without a DEFINE matches any
  * row (SQL default). `V.event_id` in MEASURES means LAST(V.event_id)
  * (the standard's ONE ROW PER MATCH semantics). */
object MatchRecognizeSql {
  import StreamSource.Event

  sealed trait Measure { def variable: String; def alias: String }
  case class FirstM(variable: String, alias: String,
                    field: String = "event_id") extends Measure
  case class LastM(variable: String, alias: String,
                   field: String = "event_id") extends Measure
  case class CountM(variable: String, alias: String) extends Measure
  /** SUM/MIN/MAX/AVG over a variable's `value` rows; emitted rounded to 6
    * decimals (the repo-wide cross-engine convention). */
  case class ValAggM(fn: String, variable: String, alias: String) extends Measure

  case class Spec(selectCols: Seq[String], table: String, partitionCol: String,
                  orderCol: String, measures: Seq[Measure],
                  skipPastLastRow: Boolean,
                  pattern: Seq[(String, Cep.QStep)],
                  allRows: Boolean = false,
                  withinMicros: Option[Long] = None)

  // ---------------------------------------------------------------- parsing

  private val mrRe =
    "(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+(\\w+)\\s+MATCH_RECOGNIZE\\s*\\((.*)\\)\\s*$".r
  private val partRe = "(?is)PARTITION\\s+BY\\s+(\\w+)".r
  private val orderRe = "(?is)ORDER\\s+BY\\s+(\\w+)".r
  private val measuresRe =
    "(?is)MEASURES\\s+(.*?)\\s+(?:ONE\\s+ROW\\s+PER\\s+MATCH|ALL\\s+ROWS\\s+PER\\s+MATCH|AFTER\\s+MATCH|PATTERN)".r
  private val allRowsRe = "(?is)ALL\\s+ROWS\\s+PER\\s+MATCH".r
  private val skipRe = "(?is)AFTER\\s+MATCH\\s+SKIP\\s+(TO\\s+NEXT\\s+ROW|PAST\\s+LAST\\s+ROW)".r
  private val patternRe = "(?is)PATTERN\\s*\\(([^)]*)\\)".r
  private val withinRe =
    "(?is)PATTERN\\s*\\([^)]*\\)\\s*WITHIN\\s+INTERVAL\\s+'(\\d+)'\\s+(DAY|HOUR|MINUTE|SECOND)S?".r
  private val defineRe = "(?is)DEFINE\\s+(.*)$".r
  private val measureRe =
    "(?is)^(?:(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG)\\s*\\(\\s*)?(\\w+)\\.(event_id|value|\\*)\\s*\\)?\\s+AS\\s+(\\w+)$".r
  private val tokenRe = "([A-Za-z]\\w*)(\\+\\?|\\*\\?|\\+|\\*|\\{(\\d+)\\})?".r
  private val cmpRe = "(?s)^(\\w+)\\s*(<>|!=|<=|>=|=|<|>)\\s*(?:'([^']*)'|([-0-9.eE]+))$".r

  def parse(sqlText: String): Spec = {
    val (selectList, table, body) = sqlText match {
      case mrRe(sel, tbl, b) => (sel, tbl, b)
      case _ => throw new IllegalArgumentException(
        "not a SELECT ... FROM <t> MATCH_RECOGNIZE (...) statement")
    }
    val partitionCol = partRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("missing PARTITION BY"))
    val orderCol = orderRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("missing ORDER BY"))
    require(partitionCol.equalsIgnoreCase("user_id"),
      s"unsupported PARTITION BY column: $partitionCol (events are keyed by user_id)")
    require(orderCol.equalsIgnoreCase("ts"),
      s"unsupported ORDER BY column: $orderCol (event time is ts)")

    val measures = measuresRe.findFirstMatchIn(body)
      .map(_.group(1)).toSeq
      .flatMap(_.split(","))
      .map(_.trim).filter(_.nonEmpty)
      .map {
        case measureRe(fn, v, field, alias) =>
          val f = Option(fn).map(_.toUpperCase).getOrElse("LAST")
          f match {
            case "COUNT" => CountM(v, alias)
            case "SUM" | "MIN" | "MAX" | "AVG" =>
              require(field == "value", s"$f expects a value field, got $field")
              ValAggM(f, v, alias)
            case "FIRST" =>
              require(field != "*", "FIRST expects a field")
              FirstM(v, alias, field)
            case _ =>
              require(field != "*", "LAST expects a field")
              LastM(v, alias, field)
          }
        case m => throw new IllegalArgumentException(s"unsupported measure: $m")
      }

    val skipPast = skipRe.findFirstMatchIn(body).map(_.group(1)) match {
      case Some(s) => s.toUpperCase.startsWith("PAST") // SKIP PAST LAST ROW
      case None    => true // SQL default: AFTER MATCH SKIP PAST LAST ROW
    }

    val defines: Map[String, Event => Boolean] =
      defineRe.findFirstMatchIn(body).map(_.group(1)).toSeq
        .flatMap(splitTopLevel)
        .map { d =>
          val kv = d.split("(?is)\\s+AS\\s+", 2)
          require(kv.length == 2, s"bad DEFINE entry: $d")
          kv(0).trim.toUpperCase -> compilePred(kv(1).trim)
        }.toMap

    val pattern = patternRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("missing PATTERN"))
      .trim.split("\\s+").toSeq.map {
        case tokenRe(v, quant, times) =>
          // SQL default for an un-DEFINEd variable is "matches any row" —
          // any *user* row; the engine-internal sentinel must never match
          // (compilePred guards identically for defined variables).
          val pred = defines.getOrElse(v.toUpperCase,
            (e: Event) => e.event_type != "__sentinel")
          val step = Option(quant) match {
            case None       => Cep.QStep.once(pred)
            case Some("+")  => Cep.QStep.oneOrMore(pred)
            case Some("+?") => Cep.QStep.oneOrMore(pred, greedy = false)
            case Some("*")  => Cep.QStep.zeroOrMore(pred)
            case Some("*?") => Cep.QStep.zeroOrMore(pred, greedy = false)
            case Some(_)    => Cep.QStep.times(pred, times.toInt)
          }
          v.toUpperCase -> step
        case t => throw new IllegalArgumentException(s"bad pattern token: $t")
      }
    require(pattern.nonEmpty, "empty PATTERN")
    val patVars = pattern.map(_._1)
    require(patVars.distinct == patVars,
      "a pattern variable may appear only once in this subset")
    measures.foreach(m => require(patVars.contains(m.variable.toUpperCase),
      s"measure references undefined pattern variable ${m.variable}"))

    val selectCols = selectList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val allRows = allRowsRe.findFirstIn(body).isDefined
    if (allRows) require(measures.isEmpty,
      "ALL ROWS PER MATCH exposes the row itself plus CLASSIFIER()/MATCH_NUMBER(); MEASURES unsupported in this subset")
    val within = withinRe.findFirstMatchIn(body).map { m =>
      m.group(1).toLong * (m.group(2).toUpperCase match {
        case "DAY" => 86400000000L
        case "HOUR" => 3600000000L
        case "MINUTE" => 60000000L
        case _ => 1000000L
      })
    }
    Spec(selectCols, table, partitionCol.toLowerCase, orderCol.toLowerCase,
      measures, skipPast, pattern, allRows, within)
  }

  /** Split a DEFINE body on commas that separate entries (`,` followed by
    * `ident AS` later) — predicates themselves contain no commas in this
    * subset, so a plain split suffices. */
  private def splitTopLevel(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Compile an AND/OR predicate over event fields. The engine-internal
    * sentinel row never matches any compiled predicate. */
  private[streaming] def compilePred(text: String): Event => Boolean = {
    val orFns = text.split("(?i)\\s+OR\\s+").map { part =>
      val andFns = part.split("(?i)\\s+AND\\s+").map(t => compileCmp(t.trim))
      (e: Event) => andFns.forall(_(e))
    }
    e => e.event_type != "__sentinel" && orFns.exists(_(e))
  }

  private def compileCmp(t: String): Event => Boolean = {
    if (t.equalsIgnoreCase("TRUE")) return _ => true
    t match {
      case cmpRe(field, op, strLit, numLit) =>
        val fl = field.toLowerCase
        if (strLit != null) {
          require(fl == "event_type", s"string comparison on non-string field $field")
          op match {
            case "="         => e => e.event_type == strLit
            case "<>" | "!=" => e => e.event_type != strLit
            case _ => throw new IllegalArgumentException(s"unsupported string op $op")
          }
        } else {
          val x = numLit.toDouble
          val get: Event => Double = fl match {
            case "value"    => _.value
            case "user_id"  => _.user_id.toDouble
            case "event_id" => _.event_id.toDouble
            case _ => throw new IllegalArgumentException(s"unknown numeric field $field")
          }
          op match {
            case "="         => e => get(e) == x
            case "<>" | "!=" => e => get(e) != x
            case "<"         => e => get(e) < x
            case "<="        => e => get(e) <= x
            case ">"         => e => get(e) > x
            case ">="        => e => get(e) >= x
          }
        }
      case _ => throw new IllegalArgumentException(s"unsupported predicate term: $t")
    }
  }

  // ---------------------------------------------------------------- running

  /** Parse and execute `sqlText` as a streaming query over the events
    * table at `dir`: file-stream source → Cep.matchRecognize → measure
    * projection → memory sink, drained (same harness as every other
    * streaming Verify entry). */
  def run(s: SparkSession, dir: String, sqlText: String): DataFrame = {
    import s.implicits._
    val spec = parse(sqlText)
    require(spec.table.equalsIgnoreCase("events"),
      s"unsupported table ${spec.table}")
    val steps = spec.pattern.map(_._2)
    val varIdx = spec.pattern.map(_._1).zipWithIndex.toMap
    val measures = spec.measures
    val out = Cep.matchRecognize(
      StreamSource.eventsTypedWithSentinel(s, dir), steps, spec.skipPastLastRow,
      withinMicros = spec.withinMicros)
    if (spec.allRows) return runAllRows(s, spec, out, sqlText)
    // ONE ROW PER MATCH: evaluate each measure from the match's rows and
    // the per-step segmentation (counts). FIRST/LAST/aggregates on an
    // empty optional variable are NULL, per the standard. Long-valued and
    // double-valued measures land in two parallel arrays; `slots` records
    // each measure's (array, index).
    val isDouble: Measure => Boolean = {
      case _: ValAggM            => true
      case FirstM(_, _, "value") => true
      case LastM(_, _, "value")  => true
      case _                     => false
    }
    val slots: Seq[(String, Int)] = {
      var li = 0; var di = 0
      measures.map { mm =>
        if (isDouble(mm)) { val r = ("__d", di); di += 1; r }
        else { val r = ("__m", li); li += 1; r }
      }
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = out.map { m =>
      val offs = m.counts.scanLeft(0)(_ + _)
      val longs = Seq.newBuilder[Option[Long]]
      val dbls = Seq.newBuilder[Option[Double]]
      measures.foreach { meas =>
        val i = varIdx(meas.variable.toUpperCase)
        val cnt = m.counts(i)
        def idSeg = m.ids.slice(offs(i), offs(i) + cnt)
        def valSeg = m.vals.slice(offs(i), offs(i) + cnt)
        meas match {
          case _: CountM => longs += Some(cnt.toLong)
          case FirstM(_, _, "value") =>
            dbls += (if (cnt == 0) None else Some(round6(valSeg.head)))
          case LastM(_, _, "value") =>
            dbls += (if (cnt == 0) None else Some(round6(valSeg.last)))
          case _: FirstM => longs += (if (cnt == 0) None else Some(idSeg.head))
          case _: LastM  => longs += (if (cnt == 0) None else Some(idSeg.last))
          case ValAggM(fn, _, _) =>
            dbls += (if (cnt == 0) None else Some(round6(fn match {
              case "SUM" => valSeg.sum
              case "MIN" => valSeg.min
              case "MAX" => valSeg.max
              case _     => valSeg.sum / valSeg.size // AVG
            })))
        }
      }
      (m.user_id, longs.result(), dbls.result())
    }.toDF("__pk", "__m", "__d")
    val name = "sql_match_" + Integer.toHexString(sqlText.hashCode).takeWhile(_ != '-')
    val drained = StreamSource.runToTable(s, rows, name, "append")
    val cols = spec.selectCols.map { c =>
      if (c.equalsIgnoreCase(spec.partitionCol)) col("__pk").as(c)
      else {
        val mi = measures.indexWhere(_.alias.equalsIgnoreCase(c))
        require(mi >= 0, s"SELECT column $c is neither the partition key nor a measure")
        val (arr, idx) = slots(mi)
        col(arr).getItem(idx).as(c)
      }
    }
    drained.select(cols: _*).orderBy(spec.selectCols.map(col): _*)
  }

  private val classifierRe = "(?i)^CLASSIFIER\\s*\\(\\s*\\)\\s+AS\\s+(\\w+)$".r

  /** ALL ROWS PER MATCH: one output row per matched input row — the row's
    * event_id/value plus CLASSIFIER() (the pattern variable that matched
    * it). An event matched by several overlapping matches appears once per
    * match, per the standard. MATCH_NUMBER() is not in this subset (a
    * per-key sequential number would need its own ordered-emission state). */
  private def runAllRows(s: SparkSession, spec: Spec,
                         out: org.apache.spark.sql.Dataset[Cep.Match],
                         sqlText: String): DataFrame = {
    import s.implicits._
    val varNames = spec.pattern.map(_._1)
    val rows = out.flatMap { m =>
      val classifiers = m.counts.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(varNames(i)) }
      m.ids.lazyZip(m.vals).lazyZip(classifiers).map { (id, v, cls) =>
        (m.user_id, id, v, cls) }
    }.toDF("__pk", "__row_id", "__val", "__cls")
    val name = "sql_matchr_" + Integer.toHexString(sqlText.hashCode).takeWhile(_ != '-')
    val drained = StreamSource.runToTable(s, rows, name, "append")
    val pairs = spec.selectCols.map {
      case classifierRe(alias) => (col("__cls").as(alias), alias)
      case c if c.equalsIgnoreCase(spec.partitionCol) => (col("__pk").as(c), c)
      case c if c.equalsIgnoreCase("event_id") => (col("__row_id").as(c), c)
      case c if c.equalsIgnoreCase("value") => (col("__val").as(c), c)
      case c => throw new IllegalArgumentException(
        s"ALL ROWS PER MATCH select supports the partition key, event_id, value, CLASSIFIER(); got $c")
    }
    drained.select(pairs.map(_._1): _*).orderBy(pairs.map(p => col(p._2)): _*)
  }

  // ------------------------------------------------------------- queries

  /** PATTERN (A+ B) greedy with SKIP TO NEXT ROW — the SQL text form of
    * the programmatic cepPlus query. */
  val matchPlusSql: String =
    """SELECT user_id, a_id, b_id, n_a FROM events
      |MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts
      |  MEASURES FIRST(A.event_id) AS a_id, LAST(B.event_id) AS b_id,
      |           COUNT(A.*) AS n_a
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP TO NEXT ROW
      |  PATTERN (A+ B)
      |  DEFINE A AS event_type <> 'error', B AS event_type = 'purchase'
      |)""".stripMargin

  /** Strict PATTERN (A B C) funnel in SQL. */
  val matchStrictSql: String =
    """SELECT user_id, a_id, b_id, c_id FROM events
      |MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts
      |  MEASURES A.event_id AS a_id, B.event_id AS b_id, C.event_id AS c_id
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP TO NEXT ROW
      |  PATTERN (A B C)
      |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
      |         C AS event_type = 'purchase'
      |)""".stripMargin

  /** PATTERN (A{2} B) with value-aggregate measures over the A pair. */
  val matchSumSql: String =
    """SELECT user_id, a_id, a_sum, a_avg, b_val, n_a FROM events
      |MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts
      |  MEASURES FIRST(A.event_id) AS a_id, SUM(A.value) AS a_sum,
      |           AVG(A.value) AS a_avg, LAST(B.value) AS b_val,
      |           COUNT(A.*) AS n_a
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP TO NEXT ROW
      |  PATTERN (A{2} B)
      |  DEFINE A AS event_type = 'view', B AS event_type = 'purchase'
      |)""".stripMargin

  /** Strict funnel bounded by WITHIN: the view→click→purchase triple must
    * complete inside 1 day of event time (ref Pattern#within / the SQL
    * WITHIN clause — also the matcher's state-pruning bound). */
  val matchWithinSql: String =
    """SELECT user_id, a_id, b_id, c_id FROM events
      |MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts
      |  MEASURES A.event_id AS a_id, B.event_id AS b_id, C.event_id AS c_id
      |  ONE ROW PER MATCH
      |  AFTER MATCH SKIP TO NEXT ROW
      |  PATTERN (A B C) WITHIN INTERVAL '1' DAY
      |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
      |         C AS event_type = 'purchase'
      |)""".stripMargin

  /** Strict funnel in ALL ROWS PER MATCH mode with CLASSIFIER(). */
  val matchAllRowsSql: String =
    """SELECT user_id, event_id, CLASSIFIER() AS cls FROM events
      |MATCH_RECOGNIZE (
      |  PARTITION BY user_id
      |  ORDER BY ts
      |  ALL ROWS PER MATCH
      |  AFTER MATCH SKIP TO NEXT ROW
      |  PATTERN (A B C)
      |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
      |         C AS event_type = 'purchase'
      |)""".stripMargin

  def matchPlus(s: SparkSession, dir: String): DataFrame = run(s, dir, matchPlusSql)
  def matchStrict(s: SparkSession, dir: String): DataFrame = run(s, dir, matchStrictSql)
  def matchSum(s: SparkSession, dir: String): DataFrame = run(s, dir, matchSumSql)
  def matchAllRows(s: SparkSession, dir: String): DataFrame = run(s, dir, matchAllRowsSql)
  def matchWithin(s: SparkSession, dir: String): DataFrame = run(s, dir, matchWithinSql)

  /** DuckDB oracles (no MATCH_RECOGNIZE there either — expressed with
    * window functions, same derivations as the programmatic CEP oracles). */
  val sql: Map[String, String] = Map(
    "q_sql_match" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
        |o AS (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS rn,
        |        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |      FROM e),
        |g AS (SELECT *, sum(is_err) OVER (PARTITION BY user_id ORDER BY rn) AS grp FROM o),
        |a AS (SELECT * FROM g WHERE is_err = 0),
        |s AS (SELECT user_id, grp, rn, event_id,
        |        max(CASE WHEN event_type = 'purchase' THEN rn END) OVER
        |          (PARTITION BY user_id, grp ORDER BY rn
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS j_rn
        |      FROM a)
        |SELECT s.user_id, s.event_id AS a_id, b.event_id AS b_id,
        |       CAST(s.j_rn - s.rn AS BIGINT) AS n_a
        |FROM s JOIN a b ON b.user_id = s.user_id AND b.rn = s.j_rn
        |WHERE s.j_rn IS NOT NULL
        |ORDER BY s.user_id, a_id""".stripMargin,
    "q_sql_match_sum" ->
      """WITH o AS (SELECT user_id, event_id, event_type, value,
        |            CAST(ts AS TIMESTAMP) AS t FROM events),
        |sq AS (SELECT user_id, event_id AS a_id, value AS v0, event_type AS et0,
        |  lead(event_type, 1) OVER w AS et1, lead(value, 1) OVER w AS v1,
        |  lead(event_type, 2) OVER w AS et2, lead(value, 2) OVER w AS v2
        | FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        |SELECT user_id, a_id, round(v0 + v1, 6) AS a_sum,
        | round((v0 + v1) / 2, 6) AS a_avg, round(v2, 6) AS b_val,
        | CAST(2 AS BIGINT) AS n_a
        |FROM sq WHERE et0 = 'view' AND et1 = 'view' AND et2 = 'purchase'
        |ORDER BY user_id, a_id""".stripMargin,
    "q_sql_match_rows" ->
      """WITH o AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t
        |           FROM events),
        |sq AS (SELECT user_id, event_id AS a_id, event_type AS et0,
        |  lead(event_type, 1) OVER w AS et1, lead(event_id, 1) OVER w AS b_id,
        |  lead(event_type, 2) OVER w AS et2, lead(event_id, 2) OVER w AS c_id
        | FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |m AS (SELECT user_id, a_id, b_id, c_id FROM sq
        |      WHERE et0 = 'view' AND et1 = 'click' AND et2 = 'purchase')
        |SELECT user_id, event_id, cls FROM (
        | SELECT user_id, a_id AS event_id, 'A' AS cls FROM m
        | UNION ALL SELECT user_id, b_id, 'B' FROM m
        | UNION ALL SELECT user_id, c_id, 'C' FROM m)
        |ORDER BY user_id, event_id, cls""".stripMargin,
    "q_sql_match_within" ->
      """WITH o AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t
        |           FROM events),
        |sq AS (SELECT user_id, event_id AS a_id, event_type AS et0, t AS t0,
        |  lead(event_type, 1) OVER w AS et1, lead(event_id, 1) OVER w AS b_id,
        |  lead(event_type, 2) OVER w AS et2, lead(event_id, 2) OVER w AS c_id,
        |  lead(t, 2) OVER w AS t2
        | FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        |SELECT user_id, a_id, b_id, c_id FROM sq
        |WHERE et0 = 'view' AND et1 = 'click' AND et2 = 'purchase'
        |  AND t2 - t0 <= INTERVAL 1 DAY
        |ORDER BY user_id, a_id""".stripMargin,
    "q_sql_match_strict" ->
      """WITH o AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t
        |           FROM events),
        |sq AS (SELECT user_id, event_id AS a_id, event_type AS et0,
        |  lead(event_type, 1) OVER w AS et1, lead(event_id, 1) OVER w AS b_id,
        |  lead(event_type, 2) OVER w AS et2, lead(event_id, 2) OVER w AS c_id
        | FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        |SELECT user_id, a_id, b_id, c_id FROM sq
        |WHERE et0 = 'view' AND et1 = 'click' AND et2 = 'purchase'
        |ORDER BY user_id, a_id""".stripMargin,
  )
}
