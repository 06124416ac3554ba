package graft.streaming

import graft.streaming.StreamSource.Event
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (SURVEY.md §7.1 "custom stateful
  * operators" — the capabilities Spark lacks as built-ins, re-expressed as
  * `flatMapGroupsWithState` functions over `KeyValueGroupedDataset`).
  *
  * Reference analogs:
  *  - keepLast       → operators/deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java
  *  - topN           → operators/rank/AppendOnlyTopNFunction.java:48 (+Updatable)
  *  - runningAgg     → operators/over/RowTimeRowsUnboundedPrecedingFunction (over-window on stream)
  *  - changelogNormalize → StreamExecChangelogNormalize.scala + RowKind.java:35-58
  *
  * Ordering contract: rows are processed in event-time order WITHIN each
  * micro-batch (we sort the group iterator); cross-batch order relies on the
  * source replaying in order, which holds for file replay and ordered test
  * feeds. Full out-of-order safety buffers rows until the watermark passes
  * them — that pattern is TemporalSort below (EventTimeTimeout + state
  * buffer), which the others can be composed with at the cost of latency.
  *
  * Scale: state per key is O(1) (keepLast, runningAgg), O(N) (topN) or
  * O(unflushed window) (temporalSort) — all bounded; keys shard across
  * executors by groupByKey hash, the same keyed-state sharding the
  * reference uses.
  */
object StatefulOps {

  /** Event-time sort key in MICROseconds — Timestamp.getTime is millis-only
    * and would mis-order same-millisecond events vs the oracle's full-
    * precision ORDER BY ts. */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  private def ord(e: Event): (Long, Long) = (micros(e.ts), e.event_id)

  /** Keep-last-row-per-key dedup. Emits the new latest row for a key
    * whenever it changes — each emission is an immutable "the latest
    * advanced to X" fact, monotone in (ts, event_id) per key, so the
    * operator is declared APPEND (which also lets it chain after
    * sortedEvents; Spark requires all-append for chained stateful ops).
    * Single-batch replays emit once per key; multi-batch consumers fold
    * argmax(ts, event_id) per key. */
  def keepLast(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Event, Event](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Event]) =>
          val latestIn = rows.maxBy(ord)
          val cur = state.getOption
          if (cur.isEmpty || Ordering[(Long, Long)].gt(ord(latestIn), ord(cur.get))) {
            state.update(latestIn)
            Iterator.single(latestIn)
          } else Iterator.empty
      }
  }

  /** Keep-last dedup with IDLE-STATE RETENTION (ref StateTtlConfig /
    * table.exec.state.ttl, docs/dev/table/streaming/query_configuration.md):
    * a key's state is dropped once event time passes its last row by
    * `ttlMs`, so unbounded key spaces (session ids, request ids) don't
    * grow state forever — the price is the documented TTL semantics: a
    * row arriving after its key expired is treated as new, even if an
    * older version preceded it. At 100 TB of keys this bound is what
    * keeps the state store finite. */
  def keepLastWithTtl(ds: Dataset[Event], ttlMs: Long): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Event, Event](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Event]) =>
          if (state.hasTimedOut) {
            // idle horizon passed: forget the key entirely
            state.remove()
            Iterator.empty
          } else {
            val latestIn = rows.maxBy(ord)
            val cur = state.getOption
            val out =
              if (cur.isEmpty || Ordering[(Long, Long)].gt(ord(latestIn), ord(cur.get))) {
                state.update(latestIn)
                Iterator.single(latestIn)
              } else Iterator.empty
            val lastMs = micros(state.get.ts) / 1000L
            state.setTimeoutTimestamp(
              math.max(lastMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  case class Ranked(event_type: String, rank: Int, event_id: Long,
                    user_id: Long, value: Double)

  /** Continuously-maintained per-key Top-N by (value desc, event_id asc).
    * Each batch emits the key's full current top-N (update semantics: the
    * sink's last emission per key is the answer; the reference's retract
    * variant maps to changelogNormalize-style -U/+U emission). */
  def topN(ds: Dataset[Event], n: Int): Dataset[Ranked] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[List[Event], Ranked](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[List[Event]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++ rows)
            .sortBy(e => (-e.value, e.event_id))
            .take(n)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case (e, i) =>
            Ranked(key, i + 1, e.event_id, e.user_id, e.value)
          }
      }
  }

  /** Top-N with a rank RANGE — `WHERE rn BETWEEN rankStart AND rankEnd`
    * (ref operators/rank/AbstractTopNFunction.java: the reference plans any
    * constant RankRange(rankStart, rankEnd), not just 1..N; "page 2 of the
    * leaderboard" queries). State keeps the key's top rankEnd rows — the
    * prefix is required to know which rows occupy ranks < rankStart — but
    * only ranks inside the range emit. Update semantics like [[topN]]. */
  def topNRange(ds: Dataset[Event], rankStart: Int, rankEnd: Int): Dataset[Ranked] = {
    import ds.sparkSession.implicits._
    require(1 <= rankStart && rankStart <= rankEnd,
      s"invalid rank range [$rankStart, $rankEnd]")
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[List[Event], Ranked](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[List[Event]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++ rows)
            .sortBy(e => (-e.value, e.event_id))
            .take(rankEnd)
          state.update(merged)
          merged.iterator.zipWithIndex.collect {
            case (e, i) if i + 1 >= rankStart =>
              Ranked(key, i + 1, e.event_id, e.user_id, e.value)
          }
      }
  }

  case class RankedVer(event_type: String, rank: Int, event_id: Long,
                       user_id: Long, value: Double, ver: Long)
  case class TopNVerState(rows: List[Event], ver: Long)

  /** Top-N in APPEND mode: each batch with input for a key emits the key's
    * refreshed full top-N tagged with a monotone generation number —
    * a versioned changelog rather than in-place updates, so the operator
    * can chain after sortedEvents (all-append rule). The consumer keeps
    * each key's max-ver generation (the same upsert fold the update-mode
    * topN delegates to the memory sink). */
  def topNVersioned(ds: Dataset[Event], n: Int): Dataset[RankedVer] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[TopNVerState, RankedVer](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[TopNVerState]) =>
          val st = state.getOption.getOrElse(TopNVerState(Nil, 0L))
          val merged = (st.rows ++ rows)
            .sortBy(e => (-e.value, e.event_id))
            .take(n)
          val ver = st.ver + 1
          state.update(TopNVerState(merged, ver))
          merged.iterator.zipWithIndex.map { case (e, i) =>
            RankedVer(key, i + 1, e.event_id, e.user_id, e.value, ver)
          }
      }
  }

  case class RankedChange(event_type: String, rank: Int, event_id: Long,
                          user_id: Long, value: Double, rowkind: String)

  /** Retracting Top-N (ref operators/rank/RetractableTopNFunction.java:53):
    * per batch, the OLD ranking is diffed against the NEW one and only the
    * changed ranks emit — -U/+U for a replaced entry, +I for a newly
    * occupied rank, -D for a vacated one. Consumers fold the changelog
    * (net > 0 per (key, rank, event_id)) to the current ranking; a sink
    * keyed on (key, rank) can apply it as upserts/deletes directly. */
  def topNChangelog(ds: Dataset[Event], n: Int): Dataset[RankedChange] = {
    import ds.sparkSession.implicits._
    // -U/+U/-D/+I rows are immutable change facts (the consumer folds
    // net>0) — APPEND mode, chainable after sortedEvents
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[List[Event], RankedChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[List[Event]]) =>
          val old = state.getOption.getOrElse(Nil)
          val cur = (old ++ rows).sortBy(e => (-e.value, e.event_id)).take(n)
          state.update(cur)
          val out = scala.collection.mutable.ArrayBuffer.empty[RankedChange]
          def chg(e: Event, r: Int, kind: String): RankedChange =
            RankedChange(key, r + 1, e.event_id, e.user_id, e.value, kind)
          (0 until math.max(old.size, cur.size)).foreach { r =>
            (old.lift(r), cur.lift(r)) match {
              case (Some(o), Some(nw)) if o.event_id == nw.event_id => ()
              case (Some(o), Some(nw)) => out += chg(o, r, "-U") += chg(nw, r, "+U")
              case (None, Some(nw))    => out += chg(nw, r, "+I")
              case (Some(o), None)     => out += chg(o, r, "-D")
              case _ => ()
            }
          }
          out.iterator
      }
  }

  case class Running(user_id: Long, event_id: Long, run_cnt: Long, run_sum: Double)
  case class AggState(cnt: Long, sum: Double)

  /** Streaming OVER aggregate: per-key running count/sum in event-time
    * order (ROWS UNBOUNDED PRECEDING). One emission per input row. */
  def runningAgg(ds: Dataset[Event]): Dataset[Running] = {
    import ds.sparkSession.implicits._
    // append mode: every input row emits exactly one output row, never
    // revised — and append is what allows composing after sortedEvents
    // (chained stateful operators must all be append)
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[AggState, Running](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[AggState]) =>
          var st = state.getOption.getOrElse(AggState(0L, 0.0))
          val out = rows.toSeq.sortBy(ord).map { e =>
            st = AggState(st.cnt + 1, st.sum + e.value)
            Running(key, e.event_id, st.cnt, st.sum)
          }
          state.update(st)
          out.iterator
      }
  }

  case class BoundedAgg(user_id: Long, event_id: Long, w_cnt: Long, w_sum: Double)
  case class RowsBuf(vals: Seq[Double])
  case class RangeBuf(rows: Seq[(Long, Double)])

  /** Streaming bounded OVER aggregate, `ROWS BETWEEN n PRECEDING AND
    * CURRENT ROW`: per-key ring buffer of the previous n values — O(n)
    * state, one emission per row (ref operators/over/
    * RowTimeRowsBoundedPrecedingFunction.java:68, which keeps the same
    * retract-from-left buffer). The window sum is recomputed left-to-right
    * over the (short) buffer instead of add/retract accumulation so float
    * results are order-stable against the batch oracle. */
  def boundedRowsAgg(ds: Dataset[Event], nPreceding: Int): Dataset[BoundedAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[RowsBuf, BoundedAgg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[RowsBuf]) =>
          var buf = state.getOption.map(_.vals.toVector).getOrElse(Vector.empty)
          val out = rows.toSeq.sortBy(ord).map { e =>
            val win = (buf :+ e.value).takeRight(nPreceding + 1)
            buf = win
            BoundedAgg(key, e.event_id, win.length.toLong, win.sum)
          }
          state.update(RowsBuf(buf.takeRight(nPreceding)))
          out.iterator
      }
  }

  /** Streaming bounded OVER aggregate, `RANGE BETWEEN interval PRECEDING
    * AND CURRENT ROW`: per-key buffer of (event-time, value) pruned below
    * the sliding horizon — state bounded by the interval's row capacity
    * (ref operators/over/RowTimeRangeBoundedPrecedingFunction.java:61).
    * The frame is the processed-prefix order (ties included only up to the
    * current (ts, event_id)), matching the interval-join oracle. */
  def boundedRangeAgg(ds: Dataset[Event], precedingMicros: Long): Dataset[BoundedAgg] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[RangeBuf, BoundedAgg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[RangeBuf]) =>
          var buf = state.getOption.map(_.rows.toVector).getOrElse(Vector.empty)
          val out = rows.toSeq.sortBy(ord).map { e =>
            val m = micros(e.ts)
            buf = (buf :+ (m, e.value)).dropWhile(_._1 < m - precedingMicros)
            BoundedAgg(key, e.event_id, buf.length.toLong,
              buf.foldLeft(0.0)(_ + _._2))
          }
          state.update(RangeBuf(buf))
          out.iterator
      }
  }

  /** `seq` is the change's event-time in micros: downstream keyed sinks use
    * (seq, event_id) for an executor-side last-writer-wins merge instead of
    * replaying rows in emission order on the driver. */
  case class Change(user_id: Long, event_id: Long, rowkind: String, seq: Long = 0L)
  case class LastRow(ts: Long, event_id: Long)

  /** Changelog-normalize: interpret the keyed stream as upserts and emit a
    * +I / -U / +U changelog (the reference's RowKind flow made explicit as
    * a column — the `__rowkind` convention from SURVEY.md §7.1). Change
    * facts are immutable once emitted — APPEND mode, so the operator
    * chains after sortedEvents (all-append rule). */
  def changelogNormalize(ds: Dataset[Event]): Dataset[Change] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastRow, Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[LastRow]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Change]
          var cur = state.getOption
          rows.toSeq.sortBy(ord).foreach { e =>
            val m = micros(e.ts)
            cur match {
              case None =>
                out += Change(key, e.event_id, "+I", m)
              case Some(prev) =>
                out += Change(key, prev.event_id, "-U", prev.ts)
                out += Change(key, e.event_id, "+U", m)
            }
            cur = Some(LastRow(m, e.event_id))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  // ---------------------------------------------------------------------
  // Processing-time operator variants (ref ProcTimeDeduplicateKeepFirstRow
  // Function.java, ProcTimeRowsUnboundedPrecedingFunction,
  // TemporalProcessTimeJoinOperator.java): no event-time sort, no
  // watermark — rows take effect in ARRIVAL order and state is consulted
  // "as of now". On the ordered file replay (events.parquet is (ts,
  // event_id)-sorted, single split) arrival order is deterministic, which
  // is what makes these oracle-checkable; the genuinely proc-time behavior
  // (first ARRIVAL wins even when a smaller event-time row arrives later)
  // is pinned by StreamingSemanticsSpec on shuffled MemoryStream input.
  // ---------------------------------------------------------------------

  /** Proc-time dedup keep-FIRST: one emission per key, the first row to
    * ARRIVE; later rows are dropped without inspecting event time. */
  def procTimeDedupKeepFirst(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Boolean, Event](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[Boolean]) =>
          if (state.getOption.contains(true) || !rows.hasNext) Iterator.empty
          else { state.update(true); Iterator.single(rows.next()) }
      }
  }

  /** Proc-time unbounded OVER: running count/sum in arrival order (no
    * per-batch event-time sort — contrast runningAgg above). */
  def procTimeRunningAgg(ds: Dataset[Event]): Dataset[Running] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[AggState, Running](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[AggState]) =>
          var st = state.getOption.getOrElse(AggState(0L, 0.0))
          val out = rows.map { e =>
            st = AggState(st.cnt + 1, st.sum + e.value)
            Running(key, e.event_id, st.cnt, st.sum)
          }.toList
          state.update(st)
          out.iterator
      }
  }

  case class ProcJoinOut(user_id: Long, p_id: Long, v_id: Option[Long])

  /** Proc-time temporal join: each probe row pairs with the build side's
    * CURRENT latest version at the moment the probe ARRIVES (null-padded
    * when none yet) — the "join against the table as of now" semantics of
    * the reference's processing-time temporal join; no versioned history
    * is kept, so a probe can never see a build row that arrives later
    * even if its event time is earlier. State per key: one build row. */
  def procTimeTemporalJoin(ds: Dataset[Event], probeType: String,
                           buildType: String): Dataset[ProcJoinOut] = {
    import ds.sparkSession.implicits._
    ds.filter(e => e.event_type == probeType || e.event_type == buildType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, ProcJoinOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ProcJoinOut]
          var cur = state.getOption
          rows.foreach { e =>
            if (e.event_type == buildType) cur = Some(e.event_id)
            else out += ProcJoinOut(key, e.event_id, cur)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  case class ValChange(user_id: Long, event_id: Long, event_type: String,
                       value: Double, rowkind: String, seq: Long)
  case class LastVal(ts: Long, event_id: Long, event_type: String, value: Double)

  /** Value-carrying changelog normalize in APPEND mode: each keyed upsert
    * emits immutable change facts (+I first row, -U old / +U new after),
    * carrying the retracted/inserted VALUE so a downstream aggregate can
    * consume the changelog (ref StreamExecChangelogNormalize emitting
    * RowKind-tagged full rows, not just keys). Append output is what lets
    * the retractable aggregate chain after it in one query. */
  def valueChangelog(ds: Dataset[Event]): Dataset[ValChange] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastVal, ValChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[LastVal]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ValChange]
          var cur = state.getOption
          rows.toSeq.sortBy(ord).foreach { e =>
            val m = micros(e.ts)
            cur match {
              case None =>
                out += ValChange(key, e.event_id, e.event_type, e.value, "+I", m)
              case Some(p) =>
                out += ValChange(key, p.event_id, p.event_type, p.value, "-U", p.ts)
                out += ValChange(key, e.event_id, e.event_type, e.value, "+U", m)
            }
            cur = Some(LastVal(m, e.event_id, e.event_type, e.value))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  case class RetractAggOut(event_type: String, cnt: Long, sum_value: Double,
                           min_value: Double, max_value: Double, ver: Long)
  case class RetractAggState(cnt: Long, sum: Double,
                             counts: Map[Double, Long], changes: Long)

  /** Retractable group aggregate: consumes a -U/+U changelog and maintains
    * count/sum/min/max correctly under retraction (ref GroupAggFunction.java
    * :45 processing RowKind rows; min/max recover through a value→count
    * multiset exactly like MinWithRetractAggFunction's MapState — when the
    * current minimum is retracted the next-smallest surviving value takes
    * over, which no subtract-only accumulator can do). Count/sum fold
    * commutatively (+ for accumulate rows, - for retract rows), so
    * cross-user arrival order inside a batch cannot change the result.
    * Emits the group's refreshed aggregate once per batch tagged with a
    * monotone change version; the consumer keeps each group's max-version
    * row (upsert fold). State per group: one entry per DISTINCT live value. */
  def retractableAgg(changes: Dataset[ValChange]): Dataset[RetractAggOut] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.event_type)
      .flatMapGroupsWithState[RetractAggState, RetractAggOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[ValChange], state: GroupState[RetractAggState]) =>
          var st = state.getOption.getOrElse(RetractAggState(0L, 0.0, Map.empty, 0L))
          rows.foreach { c =>
            val retract = c.rowkind == "-U" || c.rowkind == "-D"
            val d = if (retract) -1L else 1L
            val nc = st.counts.getOrElse(c.value, 0L) + d
            val counts = if (nc == 0L) st.counts - c.value
                         else st.counts + (c.value -> nc)
            st = RetractAggState(st.cnt + d,
              if (retract) st.sum - c.value else st.sum + c.value,
              counts, st.changes + 1)
          }
          state.update(st)
          if (st.cnt > 0) {
            val live = st.counts.collect { case (v, n) if n > 0 => v }
            Iterator.single(RetractAggOut(key, st.cnt, st.sum,
              live.min, live.max, st.changes))
          } else Iterator.empty
      }
  }

  case class SessOut(user_id: Long, w_start: java.sql.Timestamp, cnt: Long, sum_value: Double)
  case class SessState(startMicros: Long, endMicros: Long, cnt: Long, sum: Double)

  private def tsOfMicros(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(m / 1000L)
    t.setNanos(((m % 1000000L) * 1000L).toInt)
    t
  }

  /** Session windows with a PER-EVENT gap (ref: dynamic-gap session
    * assigner, SessionWindowTimeGapExtractor): each event extends its
    * session's end to max(end, ts + gap(event)); an event beyond the
    * current end closes the session and opens a new one. Completed
    * sessions emit once final; the open session re-emits per batch with
    * its current aggregate (update semantics — the sink keeps the row
    * with the highest cnt per (key, w_start)). */
  def dynamicSession(ds: Dataset[Event], gapMicros: Event => Long): Dataset[SessOut] = {
    import ds.sparkSession.implicits._
    // append-mode snapshot emissions (the sink fold keeps each session's
    // max-cnt row) — lets the operator chain after sortedEvents
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[SessState]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
          rows.toSeq.sortBy(ord).foreach { e =>
            val m = micros(e.ts)
            cur match {
              case Some(s) if m <= s.endMicros =>
                cur = Some(SessState(s.startMicros,
                  math.max(s.endMicros, m + gapMicros(e)), s.cnt + 1, s.sum + e.value))
              case other =>
                other.foreach(s =>
                  out += SessOut(key, tsOfMicros(s.startMicros), s.cnt, s.sum))
                cur = Some(SessState(m, m + gapMicros(e), 1L, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            out += SessOut(key, tsOfMicros(s.startMicros), s.cnt, s.sum)
          }
          out.iterator
      }
  }

  case class EventBuf(rows: List[Event])

  /** Watermark-ordered event stream: buffers FULL events per key and
    * releases them in event-time order once the watermark passes — the
    * generalized temporal sort that composes in FRONT of the in-order
    * operators (runningAgg, CEP, dynamicSession), upgrading them from
    * in-order-arrival to full out-of-order safety at one extra stateful
    * stage. Spark supports chained stateful operators in a single query;
    * both stages share the key partitioning, so no extra shuffle. */
  def sortedEvents(ds: Dataset[Event], delay: String = "10 minutes"): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EventBuf, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[Event], state: GroupState[EventBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.map(_.rows).getOrElse(Nil) ++ rows
          val (ripe, hold) = buf.partition(e => e.ts.getTime <= wm)
          if (hold.nonEmpty) {
            state.update(EventBuf(hold))
            state.setTimeoutTimestamp(hold.map(_.ts.getTime).min)
          } else state.remove()
          ripe.sortBy(ord).iterator
      }
  }

  case class SortedOut(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class SortBuf(rows: List[(Long, Long)]) // (tsMillis, event_id)

  /** Temporal sort (ref StreamExecTemporalSort): buffer out-of-order rows
    * per key and emit them in event-time order once the watermark passes.
    * EventTimeTimeout + state buffer — the production-grade ordering
    * pattern the eager operators above trade away for latency. Rows at or
    * beyond the final watermark stay buffered (correct for unbounded
    * semantics; tests advance the watermark with a sentinel to drain). */
  def temporalSort(ds: Dataset[Event]): Dataset[SortedOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SortBuf, SortedOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[SortBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.map(_.rows).getOrElse(Nil) ++
            rows.map(e => (e.ts.getTime, e.event_id))
          val (ripe, hold) = buf.partition(_._1 <= wm)
          if (hold.nonEmpty) {
            state.update(SortBuf(hold))
            state.setTimeoutTimestamp(hold.map(_._1).min)
          } else state.remove()
          ripe.sorted.iterator.map { case (t, id) =>
            SortedOut(key, id, new java.sql.Timestamp(t))
          }
      }
  }
}
