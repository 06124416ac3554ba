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

  /** Normalize an event-time column to session-zone TimestampType no matter
    * how the parquet file declared it. The generator has shipped `events.ts`
    * as TIMESTAMP(NANOS) in some data drops and plain `timestamp[us]`
    * (read as TIMESTAMP_NTZ) in others; the reference derives the runtime
    * type from the file footer rather than assuming one encoding
    * (flink-formats/flink-parquet/.../ParquetVectorizedInputFormat.java), so
    * we branch on the schema Spark actually read:
    *  - LongType — nanos surfaced by `spark.sql.legacy.parquet.nanosAsLong`;
    *    truncate to micros integrally (`div` avoids the double round-trip
    *    that loses precision above 2^53 ns). DuckDB's CAST(ts AS TIMESTAMP)
    *    applies the same truncation, so the oracle agrees.
    *  - TimestampNTZType — micros without a zone; the cast to TimestampType
    *    is the identity on the stored micros ONLY when the session zone is
    *    UTC, so that invariant is enforced here rather than assumed (an
    *    unpinned session would silently shift event times relative to the
    *    zone-free oracle). Streaming watermarks require TimestampType.
    *  - TimestampType — already what every operator expects.
    */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(c).dataType match {
      case LongType         => df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case TimestampNTZType =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        val isUtc = try {
          java.time.ZoneId.of(tz).getRules.isFixedOffset &&
            java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
        } catch { case _: Exception => false }
        if (!isUtc) throw new IllegalStateException(
          s"normalizeTs requires spark.sql.session.timeZone=UTC to reinterpret " +
          s"TIMESTAMP_NTZ micros zone-free (session zone is '$tz'); pin the " +
          "session zone before reading event-time tables")
        df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"unsupported event-time type $other for column $c")
    }
  }

  /** Per-path parquet schema cache (r16 optimization, guide §1/§6): the
    * fixture and generated-TPC-DS parquet under a given path are write-once
    * for the life of a JVM, yet every operator invocation re-ran schema
    * inference (footer read + listing) through `spark.read.parquet` —
    * measured at ~1.5 s per TPC-DS query build (24 tables) and a steady tax
    * on every registerAll-based SQL query. One inference per (JVM, path);
    * reads then pass the schema explicitly. This is exactly the role a
    * catalog/metastore plays in production — schemas come from metadata,
    * not from re-opening data files per query. nanosAsLong must already be
    * set by the caller for event-time tables so the cached schema matches
    * the flagged read path. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def cachedSchema(spark: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    // nanosAsLong changes what inference returns for TIMESTAMP(NANOS)
    // columns — key the cache on it so a flagged and an unflagged reader
    // of the same file can never serve each other's schema
    val key = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") + ":" + path
    schemaCache.getOrElseUpdate(key, spark.read.parquet(path).schema)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // nanosAsLong only affects TIMESTAMP(NANOS) columns (micros files are
      // untouched); setting it unconditionally keeps the nanos drop readable.
      // Set BEFORE the (cached) inference so the cached schema reflects it.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.schema(cachedSchema(spark, path)).parquet(path))
    } else spark.read.schema(cachedSchema(spark, path)).parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` matches the oracle. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
