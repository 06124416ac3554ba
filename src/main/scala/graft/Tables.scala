package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (see TESTDATA.md).
  *
  * All operators in the engine take DataFrames as inputs; this object is the
  * single place that knows the on-disk layout. At 100 TB scale the same code
  * paths apply unchanged — `spark.read.parquet` scans are split-based and
  * vectorized, filter/column pushdown reaches the scan (verify with
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
      // rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to
      // microseconds — the DuckDB oracle applies CAST(ts AS TIMESTAMP), the
      // same truncation. `div` keeps the arithmetic integral (a double round
      // trip would lose precision above 2^53 ns).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` matches the oracle. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
