package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph algorithms over vertex/edge DataFrames (SURVEY.md §1.1 Gelly row:
  * flink-libraries/flink-gelly library/ConnectedComponents et al. →
  * iterative joins over DataFrames).
  *
  * Connected components = min-label propagation: each round every vertex
  * takes the min label among itself and its neighbors; converges within
  * graph-diameter rounds. The driver-side loop with `localCheckpoint`
  * replaces Flink's native BSP iteration (DataSet.iterateDelta) — each
  * round is one shuffle join + agg, lineage is truncated per round so plans
  * don't grow, and the changed-label count doubles as the convergence test
  * (the reference's "no more active vertices" condition).
  *
  * At 100 TB: per-round cost is one join shuffle on edge dst + one agg on
  * src — the same asymptotics as Gelly's scatter-gather; skewed hubs can be
  * handled by the standard large-star/small-star variant if needed.
  */
object Graph {

  /** Minimum-component-id connected components.
    * @param vertices single column `id`
    * @param edges columns `src`, `dst` (undirected; symmetrized here) */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "id")
        .where(col("n.label") =!= col("o.label"))
        .count()
      labels = next
      done = changed == 0
      iter += 1
    }
    labels
  }

  /** Near-duplicate clustering of the documents corpus: CC over the exact
    * n-gram-Jaccard pair graph — upgrades pairwise dedup to transitive
    * clusters (A~B, B~C → {A,B,C} share one component). */
  def docComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(s, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val verts = graft.Tables(s, dir, "documents").select(col("doc_id").as("id"))
    connectedComponents(verts, pairs)
      .select(col("id").as("doc_id"), col("label").as("component"))
      .orderBy("doc_id")
  }

  val sql: Map[String, String] = Map(
    // transitive closure by recursive CTE, component = min reachable id
    "q_graph_cc" -> (graft.LlmOracles.shinglesCte + """,
      |pairs AS (
      | SELECT doc_a, doc_b FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |   round(len(list_intersect(a.s, b.s))::DOUBLE /
      |         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) WHERE j >= 0.5),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach AS (
      | SELECT doc_id AS a, doc_id AS b FROM documents
      | UNION
      | SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
      |SELECT a AS doc_id, min(b) AS component FROM reach
      |GROUP BY a ORDER BY doc_id""").stripMargin
      .replaceFirst("WITH toks", "WITH RECURSIVE toks"),
  )
}
