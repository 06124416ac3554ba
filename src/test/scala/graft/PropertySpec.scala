package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks with independent in-test oracles: the custom
  * operators must agree with a straightforward reference implementation on
  * randomized inputs (the reference repo has no property tests — SURVEY §5
  * — so this is added rigor, catching edge shapes the fixed corpora miss). */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("vec_dot equals strict left-to-right double summation") {
    import spark.implicits._
    val genVec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    check(Prop.forAll(genVec, genVec) { (a: List[Float], b: List[Float]) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.VecOps.dot($"a", $"b")).head().getDouble(0)
      got == expected
    }, n = 10)
  }

  test("similar_to translation agrees with a LIKE-style interpreter on wildcard patterns") {
    // restrict to the %/_/literal fragment where an independent oracle is
    // easy: a direct recursive matcher over the UNtranslated pattern
    def likeMatch(s: String, p: String): Boolean = (s, p) match {
      case (_, "") => s.isEmpty
      case (_, pp) if pp.head == '%' =>
        (0 to s.length).exists(i => likeMatch(s.substring(i), pp.tail))
      case ("", _) => false
      case (ss, pp) if pp.head == '_' || pp.head == ss.head =>
        likeMatch(ss.tail, pp.tail)
      case _ => false
    }
    val genChar = Gen.oneOf('a', 'b', 'c')
    val genStr = Gen.listOfN(6, genChar).map(_.mkString)
    val genPat = Gen.listOfN(4, Gen.oneOf(Gen.const('%'), Gen.const('_'), genChar))
      .map(_.mkString)
    check(Prop.forAll(genStr, genPat) { (s: String, p: String) =>
      val re = graft.functions.FlinkScalarsUtil.similarToRegex(p, None)
      s.matches(re) == likeMatch(s, p)
    }, n = 200)
  }

  test("custom as-of join agrees with a per-row scan oracle on random data") {
    import spark.implicits._
    val genRow = for {
      k <- Gen.chooseNum(1L, 3L)
      t <- Gen.chooseNum(0L, 50L)
    } yield (k, t)
    val genProbe = Gen.listOfN(12, genRow)
    val genBuild = Gen.listOfN(12, genRow)
    check(Prop.forAll(genProbe, genBuild) { (ps: List[(Long, Long)], bs: List[(Long, Long)]) =>
      // unique ids; times scaled to ms
      val probe = ps.zipWithIndex.map { case ((k, t), i) =>
        (k, i.toLong, new java.sql.Timestamp(t * 1000)) }
      // unique (key, time) on the build side: at equal times the operator's
      // pick among ties is sort-order-dependent (unspecified), so ties are
      // excluded from the property
      val build = bs.distinctBy(r => (r._1, r._2)).zipWithIndex.map { case ((k, t), i) =>
        (k, 1000L + i, new java.sql.Timestamp(t * 1000)) }
      val got = graft.plans.AsOfJoin(
          probe.toDF("k", "p_id", "p_ts"), build.toDF("bk", "b_id", "b_ts"),
          "k", "bk", "p_ts", "b_ts")
        .select("p_id", "b_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // oracle: per probe row, latest build at-or-before by (time, id)
      val expected = probe.map { case (k, pid, pts) =>
        val candidates = build.filter(b => b._1 == k && !b._3.after(pts))
        pid -> candidates.sortBy(b => (b._3.getTime, b._2)).lastOption.map(_._2).getOrElse(-1L)
      }.toMap
      got == expected
    }, n = 12)
  }

  test("connected components agree with union-find on random graphs") {
    import spark.implicits._
    val genEdges = Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(1L, 8L), Gen.chooseNum(1L, 8L)))
    check(Prop.forAll(genEdges) { es: List[(Long, Long)] =>
      val edges = es.filter { case (a, b) => a != b }
      val verts = (1L to 8L).toList
      val got = operators.Graph.connectedComponents(
          verts.toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // oracle: union-find with min-id relabel
      val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = verts.map(v => v -> find(v)).toMap
      got == expected
    }, n = 10)
  }
}
