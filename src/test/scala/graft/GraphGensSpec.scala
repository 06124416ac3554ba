package graft

import graft.operators.GraphGens
import org.apache.spark.sql.functions._

/** Gelly generator/asm-degree/bipartite parity properties that don't need
  * the DuckDB oracle: closed-form edge counts, regularity, determinism. */
class GraphGensSpec extends SparkSpec {

  test("hypercube(3): 24 directed edges, 3-regular, neighbors differ by one bit") {
    val e = GraphGens.hypercube(spark, 3).cache()
    assert(e.count() === 24)
    val degs = e.groupBy("src").count().select("count").distinct().collect()
    assert(degs.map(_.getLong(0)).toSeq === Seq(3L))
    val badBit = e.where(expr("bit_count(src ^ dst) <> 1")).count()
    assert(badBit === 0)
  }

  test("cycle(5): every vertex has exactly the two ring neighbors") {
    val e = GraphGens.cycle(spark, 5)
    assert(e.count() === 10)
    val nbrs = e.where(col("src") === 0).select("dst")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(nbrs === Seq(1L, 4L))
  }

  test("complete(6) = all ordered pairs; echo offsets face the far side") {
    assert(GraphGens.complete(spark, 6).count() === 30)
    // echo(7, 2): offsets (7-2+1)/2 = 3, 4 — each vertex links to the two
    // opposite vertices
    val nbrs = GraphGens.echo(spark, 7, 2).where(col("src") === 0)
      .select("dst").collect().map(_.getLong(0)).sorted.toSeq
    assert(nbrs === Seq(3L, 4L))
  }

  test("grid: size-2 dimension ignores the wrap flag (no duplicate edges)") {
    val wrapped = GraphGens.grid(spark, Seq((2L, true), (3L, false)))
    val plain = GraphGens.grid(spark, Seq((2L, false), (3L, false)))
    assert(wrapped.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(wrapped).count() === 0)
  }

  test("rmat: deterministic, exact edge count, ids inside 2^scale") {
    val a = GraphGens.rmat(spark, scale = 5, m = 200).cache()
    val b = GraphGens.rmat(spark, scale = 5, m = 200)
    assert(a.count() === 200)
    assert(a.exceptAll(b).count() === 0)
    assert(a.where(col("src") >= 32 || col("dst") >= 32 ||
      col("src") < 0 || col("dst") < 0).count() === 0)
    // power-law pull: the A-quadrant makes low ids denser than high ids
    val low = a.where(col("src") < 16).count()
    assert(low > 100, s"expected low-id skew, got $low/200")
  }

  test("vertexDegreesDirected: distinct-neighbor semantics with bitmask merge") {
    import spark.implicits._
    // 1→2 and 2→1 (mutual), 1→3 twice (duplicate edge collapses), 4 isolated
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    val out = GraphGens.vertexDegreesDirected(verts, edges)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out === Seq(
      (1L, 2L, 2L, 1L), // neighbors {2,3}; out {2,3}; in {2}
      (2L, 1L, 1L, 1L),
      (3L, 1L, 0L, 1L),
      (4L, 0L, 0L, 0L)))
  }

  test("invalidVertexIds: validate() finds dangling edge endpoints") {
    import spark.implicits._
    val verts = Seq(1L, 2L, 3L).toDF("id")
    val okEdges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(GraphGens.invalidVertexIds(verts, okEdges).count() === 0) // valid graph
    val badEdges = okEdges.union(Seq((3L, 99L), (98L, 1L)).toDF("src", "dst"))
    val bad = GraphGens.invalidVertexIds(verts, badEdges)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bad === Seq(98L, 99L))
  }

  test("maximumDegreeFilter drops the hub and every incident edge") {
    import spark.implicits._
    // star around 0 plus one far edge; cap 2 kills the hub, keeps the edge
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (8L, 9L)).toDF("src", "dst")
    val kept = GraphGens.maximumDegreeFilter(edges, maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(kept === Seq((8L, 9L)))
  }
}
