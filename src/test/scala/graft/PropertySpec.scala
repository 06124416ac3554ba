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

  test("z_value round-trips: interleave is a bijection on 16-bit pairs") {
    import graft.functions.ZValueUtil
    def deinterleave(z: Long): (Int, Int) = {
      var x = 0; var y = 0
      for (i <- 0 until 16) {
        x |= (((z >> (2 * i)) & 1L) << i).toInt
        y |= (((z >> (2 * i + 1)) & 1L) << i).toInt
      }
      (x, y)
    }
    check(Prop.forAll(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535)) { (x: Int, y: Int) =>
      deinterleave(ZValueUtil.interleave16(x, y)) == (x, y)
    }, n = 50)
  }

  test("CMS estimate never undercounts on random token streams") {
    // pure register math over an in-test stream: d x w counters via the
    // same md5-derived buckets the operator uses, min over rows >= truth
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val genStream = Gen.listOfN(120, Gen.oneOf((0 until 12).map(i => s"t$i")))
    check(Prop.forAll(genStream) { toks =>
      val counters = Array.ofDim[Long](4, 64)
      toks.foreach { t =>
        for (i <- 0 until 4) counters(i)((h60(s"$i:$t") & 63).toInt) += 1
      }
      val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      truth.forall { case (t, n) =>
        (0 until 4).map(i => counters(i)((h60(s"$i:$t") & 63).toInt)).min >= n
      }
    }, n = 20)
  }

  test("HLL register merge equals the sketch of the concatenated stream") {
    // merge-by-max on arbitrary splits: registers(A ++ B) == max-merge
    def regs(items: List[Long]): Map[Long, Int] = {
      def h60(s: String): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      items.map { it =>
        val h = h60(it.toString)
        val v = h >> 8
        val rho = if (v == 0) 53 else java.lang.Long.numberOfTrailingZeros(v) + 1
        (h & 255) -> rho
      }.groupBy(_._1).map { case (b, vs) => b -> vs.map(_._2).max }
    }
    val genItems = Gen.listOfN(60, Gen.chooseNum(0L, 1000L))
    check(Prop.forAll(genItems, genItems) { (a: List[Long], b: List[Long]) =>
      val merged = (regs(a).toSeq ++ regs(b).toSeq)
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      merged == regs(a ++ b)
    }, n = 20)
  }

  test("HDR quantile bucket bound: lower edge within 1/16 of any member value") {
    // any v in bucket (e, m) satisfies lower <= v < lower * (1 + 1/16) for
    // e >= 4 — the relative-error guarantee the sketch's estimate rests on
    check(Prop.forAll(Gen.chooseNum(16L, 1L << 40)) { v =>
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val m = (v >> math.max(e - 4, 0)) & 15
      val lower = (16 + m) << math.max(e - 4, 0)
      lower <= v && v < lower + (1L << math.max(e - 4, 0))
    }, n = 50)
  }

  test("cluster-keep union-find drop set equals a transitive-closure oracle") {
    // the small-side branch of minhashClusterKeep: non-min members of every
    // connected component, against an independent BFS closure
    val genEdges = Gen.listOfN(14,
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
    check(Prop.forAll(genEdges) { es: List[(Long, Long)] =>
      val edges = es.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val got = operators.Dedup.unionFindDrop(edges)
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
      var seen = Set.empty[Long]
      val drops = scala.collection.mutable.ListBuffer.empty[Long]
      adj.keys.toSeq.sorted.foreach { n =>
        if (!seen(n)) {
          var comp = Set.empty[Long]
          var frontier = Set(n)
          while (frontier.nonEmpty) {
            comp ++= frontier
            frontier = frontier.flatMap(adj) -- comp
          }
          seen ++= comp
          drops ++= (comp - comp.min)
        }
      }
      got == drops.toSeq.sorted
    }, n = 40)
  }

  test("multiset encoding identities: |A ⊎ B| = |A| + |B| and element counts add") {
    import spark.implicits._
    val genBag = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d"))
    check(Prop.forAll(genBag, genBag) { (xs: List[String], ys: List[String]) =>
      val row = Seq((xs, ys)).toDF("xs", "ys")
        .selectExpr(
          "map_from_entries(array_sort(transform(array_distinct(xs), " +
            "v -> struct(v, CAST(size(filter(xs, x -> x = v)) AS BIGINT))))) AS ma",
          "map_from_entries(array_sort(transform(array_distinct(ys), " +
            "v -> struct(v, CAST(size(filter(ys, y -> y = v)) AS BIGINT))))) AS mb")
        .selectExpr(
          "aggregate(map_values(map_zip_with(ma, mb, (k, x, y) -> coalesce(x, 0L) + coalesce(y, 0L))), 0L, (a, x) -> a + x) AS card_u",
          "coalesce(element_at(map_zip_with(ma, mb, (k, x, y) -> coalesce(x, 0L) + coalesce(y, 0L)), 'a'), 0L) AS cnt_a")
        .head()
      row.getLong(0) == (xs.size + ys.size).toLong &&
        row.getLong(1) == (xs.count(_ == "a") + ys.count(_ == "a")).toLong
    }, n = 15)
  }
}
