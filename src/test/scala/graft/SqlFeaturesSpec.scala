package graft

import graft.operators.{Formats, SqlSurface}
import org.apache.spark.sql.functions._

/** FLIP-113 (query hints) and FLIP-107 (metadata columns) analogs — the
  * oracle proves result parity; these pin that the hint actually reached
  * the planner and that `_metadata` carries real per-file facts. */
class SqlFeaturesSpec extends SparkSpec {

  test("MERGE hint forces SortMergeJoin where size stats would broadcast") {
    val hinted = SqlSurface.sqlHints(spark, sf)
    val plan = hinted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    // the same query hinted BROADCAST flips back — the hint, not the data,
    // picks the strategy
    val b = spark.sql(SqlSurface.hintSql.replace("MERGE(n)", "BROADCAST(n)"))
    assert(b.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // identical results either way
    assert(hinted.collect().toSeq == b.collect().toSeq)
  }

  test("_metadata columns expose per-file path, size, and dense row_index") {
    val perFile = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("_metadata.file_path").as("p"),
        col("_metadata.file_name").as("fn"),
        col("_metadata.file_size").as("sz"),
        col("_metadata.row_index").as("ri"))
      .groupBy("p", "fn")
      .agg(count(lit(1)).as("n"), min("ri").as("lo"), max("ri").as("hi"),
        countDistinct("ri").as("nri"), min("sz").as("s1"), max("sz").as("s2"))
      .collect()
    assert(perFile.nonEmpty)
    perFile.foreach { r =>
      assert(r.getAs[String]("fn").endsWith(".parquet"))
      assert(r.getAs[String]("p").endsWith(r.getAs[String]("fn")))
      // row_index is dense 0..n-1 within each file
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("nri") === r.getAs[Long]("n"))
      // file_size is a per-file constant
      assert(r.getAs[Long]("s1") === r.getAs[Long]("s2") && r.getAs[Long]("s1") > 0L)
    }
    // metadata columns prune like data columns: a file_name filter reaches
    // the scan without reading data columns
    val cnt = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("_metadata.file_name").endsWith(".parquet")).count()
    assert(cnt === Tables(spark, sf, "documents").count())
  }
}
