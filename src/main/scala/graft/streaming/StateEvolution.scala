package graft.streaming

import graft.streaming.StreamSource.Event
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Savepoint-compatible state evolution (reference
  * `flink-core/src/main/java/org/apache/flink/api/common/typeutils/
  * TypeSerializerSnapshot.java` and `TypeSerializerSchemaCompatibility
  * .java`: a restored serializer may declare itself compatible-after-
  * migration, letting a job resume an old savepoint after its state class
  * gained a field).
  *
  * Spark-first mapping: `transformWithState` + RocksDB state store +
  * **Avro state encoding** (`spark.sql.streaming.stateStore.encodingFormat
  * = avro`) is exactly this contract — the checkpoint stores each state
  * row's Avro schema, and a restarted query whose state class ADDED a
  * nullable field reads old rows through Avro schema resolution (missing
  * field → null default), Spark's own schema-compatibility checker playing
  * the reference's `resolveSchemaCompatibility` role. The HDFS store's
  * UnsafeRow encoding (and flatMapGroupsWithState generally) is
  * positional-binary and would refuse the restart — the provider/encoding
  * choice IS the migration story, the same way the reference's POJO/Avro
  * serializers are evolvable and Kryo's is not.
  *
  * V1 state counts rows per key; V2 adds `last: Option[Double]` (the
  * evolved field — optional so its Avro schema carries a null default).
  * StateEvolutionSpec runs V1 against a checkpoint, swaps in V2, and
  * proves the resumed query CONTINUES each key's count while populating
  * the new field — the reference's compatible-after-migration path,
  * end to end on a real checkpoint. */
object StateEvolution {

  case class CountV1(cnt: Long)
  case class CountV2(cnt: Long, last: Option[Double])
  case class KeyCount(user_id: Long, cnt: Long, last: Double)

  /** Generation 1: per-key row count. */
  class ProcV1 extends StatefulProcessor[Long, Event, KeyCount] {
    @transient private var acc: org.apache.spark.sql.streaming.ValueState[CountV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[CountV1]("acc", Encoders.product[CountV1], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[KeyCount] = {
      var st = if (acc.exists()) acc.get() else CountV1(0L)
      rows.foreach(_ => st = CountV1(st.cnt + 1))
      acc.update(st)
      Iterator.single(KeyCount(key, st.cnt, -1.0))
    }
  }

  /** Generation 2: the SAME named state ("acc"), schema evolved by one
    * nullable field. Old checkpoint rows surface with `last = None`. */
  class ProcV2 extends StatefulProcessor[Long, Event, KeyCount] {
    @transient private var acc: org.apache.spark.sql.streaming.ValueState[CountV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[CountV2]("acc", Encoders.product[CountV2], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[KeyCount] = {
      var st = if (acc.exists()) acc.get() else CountV2(0L, None)
      rows.foreach(e => st = CountV2(st.cnt + 1, Some(e.value)))
      acc.update(st)
      Iterator.single(KeyCount(key, st.cnt, st.last.getOrElse(-1.0)))
    }
  }
}
