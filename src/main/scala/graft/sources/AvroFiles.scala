package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on avro-core (which ships
  * in /opt/spark/jars; only the spark-avro DataSource wrapper is absent
  * from this deployment). The format needs nothing more than the
  * container-file API the reference's Avro format uses
  * (flink-formats/flink-avro AvroFileFormatFactory / AvroWriters):
  *
  *  - sink: one DataFileWriter per partition, executor-side — the same
  *    part-file layout every distributed file sink produces;
  *  - source: binaryFiles → DataFileStream per file, each file decoded on
  *    the executor where it lands (FileSource split model; avro container
  *    files are block-splittable, per-file granularity is the simple and
  *    correct unit at part-file sizes).
  *
  * Supported column types: long / int / double / string (nullable via
  * avro unions) — the fixture schema surface. Timestamps follow the
  * CSV/JSON convention (excluded from round trips; production pipelines
  * pin a logicalType). */
object AvroFiles {

  def avroSchema(schema: StructType, name: String = "rec"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { sf =>
      val base = sf.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case t => throw new IllegalArgumentException(s"unsupported avro type $t")
      }
      val t = if (sf.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      fields.add(new Schema.Field(sf.name, t,
        null, if (sf.nullable) Schema.Field.NULL_DEFAULT_VALUE else null))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Distributed sink: each partition writes its own avro container file.
    *
    * Commit protocol (the FileOutputCommitter shape): each task writes to a
    * hidden attempt file `.part-NNNNN-<uuid>.avro.tmp` and atomically
    * renames it into place only after a successful close — a failed or
    * speculative attempt leaves only a `.tmp` orphan (ignored by the
    * source's `*.avro` glob and swept by the next overwrite), never a
    * truncated visible part file. Paths go through Hadoop FileSystem
    * (FsCommit) executor-side, so the same protocol runs in local mode
    * and on HDFS; commit-if-absent is the FileContext rename contract. */
  def write(df: DataFrame, outDir: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val names = df.schema.fieldNames
    FsCommit.mkdirs(outDir)
    val childDirs = FsCommit.listDirs(outDir).toSet // one listing, not O(n^2)
    FsCommit.list(outDir).foreach { n =>
      if (!childDirs(n)) FsCommit.delete(s"$outDir/$n")
    }
    df.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val sch = new Schema.Parser().parse(schemaJson)
        val attempt = f"$outDir/.part-$i%05d-${java.util.UUID.randomUUID}.avro.tmp"
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
        w.create(sch, FsCommit.create(attempt))
        var n = 0L
        it.foreach { row =>
          val r = new GenericData.Record(sch)
          var j = 0
          while (j < names.length) { r.put(names(j), row.get(j)); j += 1 }
          w.append(r); n += 1
        }
        w.close()
        val visible = f"$outDir/part-$i%05d.avro"
        if (!FsCommit.renameIfAbsent(attempt, visible)) {
          // a concurrent (speculative) attempt already committed this
          // partition — both attempts wrote identical content; drop ours
          FsCommit.delete(attempt)
          if (!FsCommit.exists(visible))
            throw new java.io.IOException(s"commit failed for $visible")
        }
        Iterator.single(n)
      }
    }.count() // action materializes the write
  }


  /** binaryFiles raises on a glob matching ZERO files — the empty-corpus
    * write produces exactly that; an empty frame is the correct read. */
  private def hasAvroFiles(s: SparkSession, inDir: String): Boolean =
    FsCommit.list(inDir).exists(_.endsWith(".avro"))

  /** Reader schema for EVOLVED reads: fields in `defaults` are declared
    * non-null with that default (avro resolution fills them when the
    * writer schema lacks the field); everything else is nullable as in
    * [[avroSchema]]. */
  def avroSchemaWithDefaults(schema: StructType,
                             defaults: Map[String, AnyRef]): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { sf =>
      val base = sf.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case t => throw new IllegalArgumentException(s"unsupported avro type $t")
      }
      fields.add(defaults.get(sf.name) match {
        case Some(d) => new Schema.Field(sf.name, base, null, d)
        case None =>
          val t = if (sf.nullable)
            Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
          new Schema.Field(sf.name, t,
            null, if (sf.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      })
    }
    Schema.createRecord("rec", null, "graft", false, fields)
  }

  /** Schema-evolution source (ref flink-avro AvroDeserializationSchema /
    * RegistryAvroDeserializationSchema: reader-schema-driven resolution):
    * each file is decoded against the READER schema — fields matched by
    * name (reordering is free), writer-only fields skipped (drop), and
    * reader-only fields filled from their declared default. This is the
    * standard avro schema-resolution contract, so files written before a
    * column was added remain readable forever. */
  def readEvolved(s: SparkSession, inDir: String, schema: StructType,
                  defaults: Map[String, AnyRef]): DataFrame = {
    if (!hasAvroFiles(s, inDir))
      return s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    val names = schema.fieldNames
    val strCols = schema.fields.zipWithIndex
      .collect { case (f, i) if f.dataType == StringType => i }.toSet
    val readerJson = avroSchemaWithDefaults(schema, defaults).toString
    val rdd = s.sparkContext.binaryFiles(s"$inDir/*.avro").flatMap { case (_, pds) =>
      val reader = new Schema.Parser().parse(readerJson)
      val stream = new DataFileStream[GenericRecord](
        pds.open(), new GenericDatumReader[GenericRecord](null, reader))
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = stream.hasNext
          if (!h) stream.close()
          h
        }
        override def next(): Row = {
          val rec = stream.next()
          Row.fromSeq(names.indices.map { j =>
            val v = rec.get(names(j))
            if (v != null && strCols(j)) v.toString else v
          })
        }
      }
    }
    s.createDataFrame(rdd, schema)
  }

  /** Distributed source: decode each container file where it lands. */
  def read(s: SparkSession, inDir: String, schema: StructType): DataFrame = {
    if (!hasAvroFiles(s, inDir))
      return s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    val names = schema.fieldNames
    val strCols = schema.fields.zipWithIndex
      .collect { case (f, i) if f.dataType == StringType => i }.toSet
    val rdd = s.sparkContext.binaryFiles(s"$inDir/*.avro").flatMap { case (_, pds) =>
      val stream = new DataFileStream[GenericRecord](
        pds.open(), new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = stream.hasNext
          if (!h) stream.close()
          h
        }
        override def next(): Row = {
          val rec = stream.next()
          Row.fromSeq(names.indices.map { j =>
            val v = rec.get(names(j))
            // avro decodes strings as Utf8 — convert at the boundary
            if (v != null && strCols(j)) v.toString else v
          })
        }
      }
    }
    s.createDataFrame(rdd, schema)
  }
}
