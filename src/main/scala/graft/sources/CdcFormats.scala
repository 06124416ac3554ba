package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC ingestion formats (SURVEY.md §2.1; reference
  * `flink-formats/flink-json/src/main/java/org/apache/flink/formats/json/
  * {debezium/DebeziumJsonDeserializationSchema.java,
  * canal/CanalJsonDeserializationSchema.java,
  * maxwell/MaxwellJsonDeserializationSchema.java}`): parse Debezium / Canal /
  * Maxwell JSON change events into an explicit +I/-U/+U/-D changelog — the
  * reference's RowKind made a column, per the `__rowkind` convention the
  * streaming operators here already use — and materialize the changelog into
  * current table state.
  *
  * Spark-first shape: the whole parse is `from_json` + a CASE over the op
  * code building an array of (kind, row) structs + `explode` — expression
  * only, no UDF, so at 100 TB the parse fuses into one WholeStageCodegen
  * span over the text scan and distributes trivially (a CDC log shards by
  * file/offset; every event is handled where it is read). Materialization is
  * keep-last-per-key — one hash shuffle on the primary key, the same shape
  * Spark plans for any keyed dedup, with AQE handling hot keys.
  *
  * Semantics mirrored from the reference (file:line cited per format):
  *  - Debezium (DebeziumJsonDeserializationSchema.java:149-166): op c/r →
  *    +I(after); u → -U(before) then +U(after), null before is an error
  *    (REPLICA IDENTITY FULL hint); d → -D(before); empty message =
  *    tombstone, skipped; optional schema-include wrapper is unwrapped and
  *    the "schema" part ignored (ibid:129-134).
  *  - Canal (CanalJsonDeserializationSchema.java:186-235): `data` is an
  *    ARRAY of rows; INSERT → +I per element; UPDATE → pair per element
  *    with `old[i]`'s null fields back-filled from `data[i]` (only changed
  *    fields are present in `old`); DELETE → -D per element; CREATE (DDL)
  *    skipped; `database`/`table` options filter foreign events
  *    (ibid:174-187).
  *  - Maxwell (MaxwellJsonDeserializationSchema.java:95-131): like Canal
  *    but `data`/`old` are single rows.
  * Unknown op codes raise unless ignoreParseErrors (all three formats).
  */
object CdcFormats {

  /** Payload row type shared by the fixtures: an orders subset. */
  val payload: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  private def kindRow(kind: String, row: Column): Column =
    struct(lit(kind).as("kind"), row.as("row"))

  /** Null fields of `before` back-filled from `after` — Canal/Maxwell ship
    * only the CHANGED columns in `old`. */
  private def backfill(before: Column, after: Column, schema: StructType): Column =
    struct(schema.fields.toSeq.map(f =>
      coalesce(before.getField(f.name), after.getField(f.name)).as(f.name)): _*)

  private def flattenEvents(df: DataFrame, events: Column): DataFrame =
    df.select(col("offset"), col("ts_ms"), explode(events).as("ev"))
      .select(col("offset"), col("ts_ms"), col("ev.kind").as("kind"), col("ev.row.*"))

  /** Debezium JSON → changelog. `raw` carries (value STRING, offset BIGINT);
    * offset is the source position (Kafka offset / file line) that orders
    * the log — Flink gets the same ordering from the source context. */
  def debeziumChangelog(raw: DataFrame, schema: StructType,
                        schemaInclude: Boolean = false,
                        ignoreParseErrors: Boolean = false): DataFrame = {
    val envelope = StructType(Seq(
      StructField("before", schema), StructField("after", schema),
      StructField("op", StringType), StructField("ts_ms", LongType)))
    val parseSchema =
      if (schemaInclude) StructType(Seq(StructField("payload", envelope)))
      else envelope
    val p0 = raw
      // tombstone messages (null/empty value) are skipped, ibid:122-125
      .where(col("value").isNotNull && length(col("value")) > 0)
      .withColumn("e", from_json(col("value"), parseSchema))
    val p = (if (schemaInclude) p0.withColumn("e", col("e.payload")) else p0)
      .withColumn("ts_ms", col("e.ts_ms"))
    val before = col("e.before")
    val after = col("e.after")
    val badBefore = raise_error(concat(lit(
      "The \"before\" field of UPDATE/DELETE message is null; check the " +
        "source table has REPLICA IDENTITY FULL: "), col("value")))
    val events =
      when(col("e.op").isin("c", "r"), array(kindRow("+I", after)))
        .when(col("e.op") === "u",
          when(before.isNull, badBefore)
            .otherwise(array(kindRow("-U", before), kindRow("+U", after))))
        .when(col("e.op") === "d",
          when(before.isNull, badBefore).otherwise(array(kindRow("-D", before))))
        .otherwise(
          if (ignoreParseErrors) array().cast(ArrayType(StructType(Seq(
            StructField("kind", StringType), StructField("row", schema)))))
          else raise_error(concat(lit("Unknown \"op\" value in Debezium JSON: "),
            col("value"))))
    flattenEvents(p, events)
  }

  /** Canal JSON → changelog. `database`/`table` filter foreign events the
    * way the reference's options do (exact match; None = accept all). */
  def canalChangelog(raw: DataFrame, schema: StructType,
                     database: Option[String] = None,
                     table: Option[String] = None,
                     ignoreParseErrors: Boolean = false): DataFrame = {
    val envelope = StructType(Seq(
      StructField("data", ArrayType(schema)), StructField("old", ArrayType(schema)),
      StructField("type", StringType), StructField("database", StringType),
      StructField("table", StringType), StructField("ts", LongType)))
    var p = raw.withColumn("e", from_json(col("value"), envelope))
      .withColumn("ts_ms", col("e.ts"))
    database.foreach(db => p = p.where(col("e.database") === db))
    table.foreach(t => p = p.where(col("e.table") === t))
    val pairKind = ArrayType(StructType(Seq(
      StructField("kind", StringType), StructField("row", schema))))
    val events =
      when(col("e.type") === "INSERT",
        transform(col("e.data"), d => kindRow("+I", d)))
        .when(col("e.type") === "UPDATE",
          flatten(zip_with(col("e.data"), col("e.old"), (a, o) =>
            array(kindRow("-U", backfill(o, a, schema)), kindRow("+U", a)))))
        .when(col("e.type") === "DELETE",
          transform(col("e.data"), d => kindRow("-D", d)))
        // DDL events ("CREATE", data = null) are skipped, ibid:227-231
        .when(col("e.type") === "CREATE", array().cast(pairKind))
        .otherwise(
          if (ignoreParseErrors) array().cast(pairKind)
          else raise_error(concat(lit("Unknown \"type\" value in Canal JSON: "),
            col("value"))))
    flattenEvents(p, events)
  }

  /** Maxwell JSON → changelog: single-row data/old, same null-backfill rule
    * for partial `old` as Canal. */
  def maxwellChangelog(raw: DataFrame, schema: StructType,
                       ignoreParseErrors: Boolean = false): DataFrame = {
    val envelope = StructType(Seq(
      StructField("data", schema), StructField("old", schema),
      StructField("type", StringType), StructField("database", StringType),
      StructField("table", StringType), StructField("ts", LongType)))
    val p = raw.withColumn("e", from_json(col("value"), envelope))
      .withColumn("ts_ms", col("e.ts"))
    val pairKind = ArrayType(StructType(Seq(
      StructField("kind", StringType), StructField("row", schema))))
    val events =
      when(col("e.type") === "insert", array(kindRow("+I", col("e.data"))))
        .when(col("e.type") === "update",
          array(kindRow("-U", backfill(col("e.old"), col("e.data"), schema)),
            kindRow("+U", col("e.data"))))
        .when(col("e.type") === "delete", array(kindRow("-D", col("e.data"))))
        .otherwise(
          if (ignoreParseErrors) array().cast(pairKind)
          else raise_error(concat(lit("Unknown \"type\" value in Maxwell JSON: "),
            col("value"))))
    flattenEvents(p, events)
  }

  /** Changelog → current state: keep the LAST event per key in log order
    * (within one offset the +U of an update pair outranks its -U, matching
    * emission order) and drop keys whose last event is a retraction. This is
    * the reference's ChangelogNormalize + upsert-sink pair as one batch
    * operator: one hash shuffle on the key, WindowGroupLimit pushes the
    * rank-1 filter below the sort at scale. */
  def materialize(changelog: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("offset").desc, (col("kind") === "+U").desc)
    changelog.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("kind").isin("+I", "+U"))
      .drop("_rn", "kind", "offset", "ts_ms")
  }

  // ------------------------------------------------------------------
  // Fixtures: a deterministic CDC history of the orders table, derived
  // through the repo's standard md5 hash bridge so DuckDB reproduces the
  // identical event set from the identical parquet. Per order key k with
  // h = md5-bucket(k) in 0..9:
  //   - every key is inserted       (offset 4k,   initial row)
  //   - keys with h < 4 are updated (offset 4k+1, status→'U', price+1000)
  //   - keys with h = 0 are deleted (offset 4k+2, before = updated row)
  // The JSON strings are written to text files and read back, so each
  // query is a genuine file→text→parse round trip.
  // ------------------------------------------------------------------

  private def hashBucket: Column =
    conv(substring(md5(concat(lit("cdc_"), col("o_orderkey").cast("string"))), 1, 15),
      16, 10).cast("long") % 10

  private def ordersWithBucket(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .withColumn("hh", hashBucket)

  private def initialRow: Column = struct(
    col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))

  private def updatedRow: Column = struct(
    col("o_orderkey"), col("o_custkey"), lit("U").as("o_orderstatus"),
    (col("o_totalprice") + 1000.0).as("o_totalprice"))

  private def tmpDir(fmt: String, dir: String): String =
    s"/tmp/graft-cdc/$fmt-${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"

  /** Debezium event log as JSON lines: (value, offset). `wrapped` selects
    * the schema-include envelope ({"schema":…,"payload":{…}}). */
  private def debeziumEvents(o: DataFrame, wrapped: Boolean): DataFrame = {
    def env(before: Column, after: Column, op: String, off: Column): Column = {
      val e = struct(before.as("before"), after.as("after"),
        lit(op).as("op"), off.as("ts_ms"))
      if (wrapped)
        to_json(struct(struct(lit("struct").as("type")).as("schema"), e.as("payload")))
      else to_json(e)
    }
    val nullRow = lit(null).cast(payload)
    val ins = o.select(
      env(nullRow, initialRow, "c", col("o_orderkey") * 4).as("value"),
      (col("o_orderkey") * 4).as("offset"))
    val upd = o.where(col("hh") < 4).select(
      env(initialRow, updatedRow, "u", col("o_orderkey") * 4 + 1).as("value"),
      (col("o_orderkey") * 4 + 1).as("offset"))
    val del = o.where(col("hh") === 0).select(
      env(updatedRow, nullRow, "d", col("o_orderkey") * 4 + 2).as("value"),
      (col("o_orderkey") * 4 + 2).as("offset"))
    ins.unionAll(upd).unionAll(del)
  }

  /** Write a (value, offset) event log as JSON-lines text, read it back as a
    * text source with the line's offset recovered from the payload. The
    * round trip makes the parse a real file-format test (not an in-memory
    * identity) while keeping offsets exactly reproducible. */
  /** Per-JVM memo of written CDC event-log fixtures: the log content is a
    * deterministic function of (format, dir) — re-serializing it per
    * invocation was fixture prep inside the timed region (r16
    * optimization, guide §1; sentinel-memo precedent). In-process only,
    * so a stale fixture never crosses testdata drops. */
  private val fixtureMemo = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def roundTrip(s: SparkSession, events: => DataFrame, path: String,
                        offsetFrom: Column): DataFrame = {
    // synchronized: two concurrent first-callers must not overwrite the
    // same path mid-read (callers are sequential today; cheap insurance)
    synchronized(fixtureMemo.getOrElseUpdate(path,
      events.select("value").write.mode("overwrite").text(path)))
    s.read.text(path).withColumn("offset", offsetFrom)
  }

  /** q_fmt_debezium: parse the event log — even keys through the plain
    * envelope, odd keys through the schema-include envelope (both reference
    * branches) — and aggregate the changelog per RowKind. The -U/+U pair
    * counts and before/after value sums pin the exact emission semantics. */
  def debeziumKinds(s: SparkSession, dir: String): DataFrame = {
    val o = ordersWithBucket(s, dir)
    val even = tmpDir("dbz-plain", dir)
    val odd = tmpDir("dbz-wrapped", dir)
    val plain = roundTrip(s, debeziumEvents(o.where(col("o_orderkey") % 2 === 0), wrapped = false),
      even, get_json_object(col("value"), "$.ts_ms").cast("long"))
    val wrapped = roundTrip(s, debeziumEvents(o.where(col("o_orderkey") % 2 === 1), wrapped = true),
      odd, get_json_object(col("value"), "$.payload.ts_ms").cast("long"))
    debeziumChangelog(plain, payload)
      .unionAll(debeziumChangelog(wrapped, payload, schemaInclude = true))
      .groupBy("kind")
      .agg(count(lit(1)).as("cnt"),
        sum("o_orderkey").as("key_sum"),
        round(sum("o_totalprice"), 2).as("total"),
        max("ts_ms").as("max_ts"))
      .orderBy("kind")
  }

  /** Write the full (unwrapped) Debezium fixture as JSON-lines text under a
    * caller-keyed directory; returns the path. Used by the batch materialize
    * query and the streaming CDC pipeline (streaming/CdcStream). */
  def writeDebeziumFixture(s: SparkSession, dir: String, which: String): String = {
    val path = tmpDir(which, dir)
    synchronized(fixtureMemo.getOrElseUpdate(path,
      debeziumEvents(ordersWithBucket(s, dir), wrapped = false)
        .select("value").write.mode("overwrite").text(path)))
    path
  }

  /** DuckDB derivation of the fixture's final state (shared by the batch
    * and streaming materialization oracles). */
  def duckFinalStateSql: String = duckFinalState

  /** q_cdc_materialize: Debezium changelog → current table state (the
    * reference's CDC-source → ChangelogNormalize → upsert materialized view,
    * its flagship CDC pipeline), aggregated per final status. */
  def debeziumMaterialize(s: SparkSession, dir: String): DataFrame = {
    val o = ordersWithBucket(s, dir)
    val raw = roundTrip(s, debeziumEvents(o, wrapped = false),
      tmpDir("dbz-mat", dir), get_json_object(col("value"), "$.ts_ms").cast("long"))
    materialize(debeziumChangelog(raw, payload), Seq("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  private def unpack(df: DataFrame): DataFrame =
    df.select(col("e.value").as("value"), col("e.offset").as("offset"))

  /** Canal event log: inserts batched two-per-message (data is an ARRAY),
    * updates with `old` carrying ONLY the changed fields (status, price),
    * plus planted foreign-table / foreign-database / DDL messages that the
    * filters must drop. */
  private def canalEvents(o: DataFrame): DataFrame = {
    def env(data: Column, old: Column, typ: String, db: String, tbl: String,
            off: Column): Column =
      struct(
        to_json(struct(data.as("data"), old.as("old"), lit(typ).as("type"),
          lit(db).as("database"), lit(tbl).as("table"), off.as("ts"))).as("value"),
        off.as("offset"))
    val nullArr = lit(null).cast(ArrayType(payload))
    // batch of 2: both keys' updates/deletes have offsets strictly above the
    // shared insert offset (keys 2b,2b+1 → ins 8b; upd 8b+1 / 8b+5)
    val ins = unpack(o.groupBy((col("o_orderkey") / 2).cast("long").as("b"))
      .agg(collect_list(initialRow).as("rows"), (min("o_orderkey") * 4).as("off"))
      .select(env(col("rows"), nullArr, "INSERT", "graft", "orders", col("off")).as("e")))
    // old: changed fields only — key and custkey are NULL and must be
    // back-filled from data (ibid:205-213)
    val oldPartial = array(struct(
      lit(null).cast(LongType).as("o_orderkey"), lit(null).cast(LongType).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice")))
    val upd = unpack(o.where(col("hh") < 4).select(
      env(array(updatedRow), oldPartial, "UPDATE", "graft", "orders",
        col("o_orderkey") * 4 + 1).as("e")))
    val del = unpack(o.where(col("hh") === 0).select(
      env(array(updatedRow), nullArr, "DELETE", "graft", "orders",
        col("o_orderkey") * 4 + 2).as("e")))
    // planted events that filtering / DDL-skip must drop: same shape, wrong
    // table, wrong database, and a CREATE with no data
    val alien = unpack(o.limit(7).select(
      env(array(initialRow), nullArr, "INSERT", "graft", "other", lit(1L)).as("e")))
    val alienDb = unpack(o.limit(5).select(
      env(array(initialRow), nullArr, "INSERT", "otherdb", "orders", lit(1L)).as("e")))
    val ddl = unpack(o.limit(1).select(
      env(nullArr, nullArr, "CREATE", "graft", "orders", lit(1L)).as("e")))
    ins.unionAll(upd).unionAll(del).unionAll(alien).unionAll(alienDb).unionAll(ddl)
  }

  /** q_fmt_canal: changelog per RowKind — key_sum over -U rows proves the
    * null-backfill of `old`, the counts prove the foreign-event filters. */
  def canalKinds(s: SparkSession, dir: String): DataFrame = {
    val o = ordersWithBucket(s, dir)
    val raw = roundTrip(s, canalEvents(o), tmpDir("canal", dir),
      get_json_object(col("value"), "$.ts").cast("long"))
    canalChangelog(raw, payload, database = Some("graft"), table = Some("orders"))
      .groupBy("kind")
      .agg(count(lit(1)).as("cnt"),
        sum("o_orderkey").as("key_sum"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("kind")
  }

  /** Maxwell event log: single-row data/old per message, lower-case ops. */
  private def maxwellEvents(o: DataFrame): DataFrame = {
    def env(data: Column, old: Column, typ: String, off: Column): Column =
      struct(
        to_json(struct(data.as("data"), old.as("old"), lit(typ).as("type"),
          lit("graft").as("database"), lit("orders").as("table"),
          off.as("ts"))).as("value"),
        off.as("offset"))
    val nullRow = lit(null).cast(payload)
    val oldPartial = struct(
      lit(null).cast(LongType).as("o_orderkey"), lit(null).cast(LongType).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"))
    val ins = unpack(o.select(
      env(initialRow, nullRow, "insert", col("o_orderkey") * 4).as("e")))
    val upd = unpack(o.where(col("hh") < 4)
      .select(env(updatedRow, oldPartial, "update", col("o_orderkey") * 4 + 1).as("e")))
    val del = unpack(o.where(col("hh") === 0)
      .select(env(updatedRow, nullRow, "delete", col("o_orderkey") * 4 + 2).as("e")))
    ins.unionAll(upd).unionAll(del)
  }

  /** q_fmt_maxwell: parse + materialize to current state; custkey sum pins
    * full-row fidelity through the single-row envelope. */
  def maxwellMaterialize(s: SparkSession, dir: String): DataFrame = {
    val o = ordersWithBucket(s, dir)
    val raw = roundTrip(s, maxwellEvents(o), tmpDir("maxwell", dir),
      get_json_object(col("value"), "$.ts").cast("long"))
    materialize(maxwellChangelog(raw, payload), Seq("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        sum("o_custkey").as("cust_sum"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  // DuckDB oracles: the same event derivation through the md5 bridge.
  private val duckHash =
    "('0x' || substr(md5('cdc_' || o_orderkey::VARCHAR), 1, 15))::UBIGINT % 10"

  private val duckBase =
    s"""WITH h AS (
       | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |        $duckHash AS hh
       | FROM orders)""".stripMargin

  private val duckKindEvents =
    s"""$duckBase,
       |ev AS (
       | SELECT '+I' AS kind, o_orderkey, o_totalprice AS price,
       |        o_orderkey*4 AS ts FROM h
       | UNION ALL SELECT '-U', o_orderkey, o_totalprice, o_orderkey*4+1
       |   FROM h WHERE hh < 4
       | UNION ALL SELECT '+U', o_orderkey, o_totalprice + 1000.0, o_orderkey*4+1
       |   FROM h WHERE hh < 4
       | UNION ALL SELECT '-D', o_orderkey, o_totalprice + 1000.0, o_orderkey*4+2
       |   FROM h WHERE hh = 0)""".stripMargin

  private val duckFinalState =
    s"""$duckBase,
       |fin AS (
       | SELECT o_orderkey, o_custkey,
       |        CASE WHEN hh < 4 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
       |        CASE WHEN hh < 4 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice
       | FROM h WHERE hh <> 0)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_fmt_debezium" ->
      s"""$duckKindEvents
         |SELECT kind, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
         |  round(sum(price), 2) AS total,
         |  CAST(max(ts) AS BIGINT) AS max_ts
         |FROM ev GROUP BY kind ORDER BY kind""".stripMargin,
    "q_cdc_materialize" ->
      s"""$duckFinalState
         |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
         |  round(sum(o_totalprice), 2) AS total
         |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_fmt_canal" ->
      s"""$duckKindEvents
         |SELECT kind, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
         |  round(sum(price), 2) AS total
         |FROM ev GROUP BY kind ORDER BY kind""".stripMargin,
    "q_fmt_maxwell" ->
      s"""$duckFinalState
         |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
         |  round(sum(o_totalprice), 2) AS total
         |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
