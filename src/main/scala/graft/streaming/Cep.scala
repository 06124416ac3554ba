package graft.streaming

import graft.streaming.StreamSource.Event
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Complex-event-processing: pattern matching over keyed event streams
  * (SURVEY.md §2.9 MATCH_RECOGNIZE; ref flink-cep nfa/NFA.java and
  * StreamExecMatch.scala:68).
  *
  * Round-1 scope: strict-contiguity sequence patterns (`PATTERN (A B C)`)
  * with emit-on-every-match (`AFTER MATCH SKIP TO NEXT ROW`) — the matcher
  * is a sliding window of the last (L-1) events per key, which IS the NFA
  * for strict contiguity (each partial match is a suffix of the recent
  * event run). Relaxed contiguity / quantifiers (`A+ B*?`) need the full
  * shared-buffer NFA and are a later-round stretch.
  *
  * State per key: L-1 events — O(1). Event-time order within batch is
  * enforced by sorting the group iterator; compose with
  * StatefulOps.temporalSort for out-of-order input.
  */
object Cep {

  case class Match(user_id: Long, ids: Seq[Long])
  case class Partial(ids: Seq[Long], startMicros: Long, next: Int,
                     lastMicros: Long)
  case class NfaState(partials: Seq[Partial])

  /** All strict-contiguity matches of `steps` (one predicate per pattern
    * position) in per-key event-time order. */
  def matchPattern(ds: Dataset[Event], steps: Seq[Event => Boolean]): Dataset[Match] = {
    import ds.sparkSession.implicits._
    val L = steps.length
    require(L >= 1)
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Match](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[List[Event]]) =>
          var recent = state.getOption.getOrElse(Nil) // last L-1 events, oldest first
          val out = scala.collection.mutable.ArrayBuffer.empty[Match]
          rows.toSeq.sortBy(e => (StatefulOps.micros(e.ts), e.event_id)).foreach { e =>
            val window = recent :+ e
            if (window.length == L && window.zip(steps).forall { case (ev, p) => p(ev) })
              out += Match(key, window.map(_.event_id))
            recent = (window.takeRight(L - 1))
          }
          state.update(recent)
          out.iterator
      }
  }

  /** Relaxed-contiguity NFA (`A followed_by B followed_by C` with a WITHIN
    * window — ref NFA.java relaxed contiguity + Pattern#within): partial
    * matches skip non-matching events; each partial advances on the FIRST
    * later event matching its next step (earliest-match semantics, which is
    * deterministic and SQL-reproducible); every step-0 match spawns a new
    * partial. Partials expire once event time passes start + within —
    * that bound is what keeps per-key state finite on an unbounded stream
    * (the reference prunes the shared buffer with the same within timer). */
  def matchRelaxed(ds: Dataset[Event], steps: Seq[Event => Boolean],
                   withinMs: Long): Dataset[Match] = {
    import ds.sparkSession.implicits._
    val L = steps.length
    val withinMicros = withinMs * 1000L
    require(L >= 2)
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[NfaState, Match](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[NfaState]) =>
          var partials = state.getOption.map(_.partials.toList).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Match]
          rows.toSeq.sortBy(e => (StatefulOps.micros(e.ts), e.event_id)).foreach { e =>
            val m = StatefulOps.micros(e.ts)
            partials = partials.filter(p => m <= p.startMicros + withinMicros)
            // strictly-later event time required to advance: two events with
            // equal timestamps are simultaneous, not "followed by" (matches
            // the oracle's x.t > a.a_t and the reference's event-time order)
            partials = partials.flatMap { p =>
              if (m > p.lastMicros && steps(p.next)(e)) {
                val adv = Partial(p.ids :+ e.event_id, p.startMicros, p.next + 1, m)
                if (adv.next == L) { out += Match(key, adv.ids); Nil }
                else List(adv)
              } else List(p)
            }
            if (steps.head(e))
              partials = partials :+ Partial(Seq(e.event_id), m, 1, m)
          }
          state.update(NfaState(partials))
          out.iterator
      }
  }
}
