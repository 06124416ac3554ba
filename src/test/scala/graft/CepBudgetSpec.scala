package graft

import graft.streaming.{Cep, StreamSource}

/** Adversarial-ambiguity guard for the CEP backtracking matcher
  * (VERDICT r9 task 8): the reference's NFA + SharedBuffer stays
  * polynomial via partial-match sharing; our backtracker is worst-case
  * exponential on stacked overlapping quantifiers (the `(A+)+` family).
  * The per-drain attempt budget must fail such a pattern LOUDLY — a task
  * error naming the pattern shape — instead of hanging the executor,
  * while leaving every non-pathological pattern's semantics untouched. */
class CepBudgetSpec extends SparkSpec {

  private def ev(id: Long, sec: Int, et: String) =
    StreamSource.Event(id, new java.sql.Timestamp(sec * 1000L), 1L, et, 1.0)

  test("planted (A+)+-style ambiguity trips the attempt budget loudly, not a hang") {
    import spark.implicits._
    // 60 consecutive A's, then a pattern-BREAKING row (not A, not B): the
    // break forces every start position to full decision (no NeedMore
    // parking), and 12 stacked overlapping A+ steps followed by a B that
    // never comes give ~C(59,11) ≈ 7e11 compositions to refute —
    // astronomically past the 5e6 budget, unbounded wall-clock unguarded.
    val as = spark.createDataset(
      (1 to 60).map(i => ev(i.toLong, i, "A")) :+ ev(61L, 61, "X"))
    val steps = Seq.fill(12)(Cep.QStep.oneOrMore(
      (e: StreamSource.Event) => e.event_type == "A")) :+
      Cep.QStep.once((e: StreamSource.Event) => e.event_type == "B")
    val ex = intercept[Exception] {
      Cep.matchRecognizeOrderedSkip(as, steps, Cep.SkipToNextRow).collect()
    }
    // the budget error surfaces wrapped in Spark's task-failure chain
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    val all = messages(ex).mkString(" | ")
    assert(all.contains("CEP attempt budget exceeded"), s"wrong failure: $all")
    assert(all.contains("ambiguous"), all)
  }

  test("the budget is invisible to a benign pattern on the same input") {
    import spark.implicits._
    // same 60-A run plus the B: one greedy A+ then B — a single
    // backtracking pass, budget untouched, the usual greedy-longest match
    val rows = (1 to 60).map(i => ev(i.toLong, i, "A")) :+ ev(61L, 61, "B")
    val ds = spark.createDataset(rows)
    val steps = Seq(
      Cep.QStep.oneOrMore((e: StreamSource.Event) => e.event_type == "A"),
      Cep.QStep.once((e: StreamSource.Event) => e.event_type == "B"))
    val got = Cep.matchRecognizeOrderedSkip(ds, steps, Cep.SkipPastLastRow)
      .collect()
    assert(got.length === 1 && got.head.ids === (1L to 61L).toSeq)
  }
}
