package graft.sources

import java.nio.ByteBuffer
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source/sink — the row-oriented interchange format a pipeline
  * meets at its edges: Kafka payloads, log shippers, and cross-language
  * hand-offs are Avro far more often than parquet.
  *
  * This distribution ships the Avro core + mapred libraries but NOT the
  * `spark-avro` data source module, so `format("avro")` does not exist
  * here; the source is built directly on what the classpath provides:
  *
  *  - '''read''': `AvroKeyInputFormat` via `newAPIHadoopFile` — the
  *    standard splittable Hadoop input format (Avro container files
  *    carry sync markers every block, so a 100 TB landing zone splits
  *    into HDFS-block-sized tasks exactly like parquet). The reader
  *    schema is ELECTED on the driver from a bounded sample of file
  *    headers — the distinct schema that resolves every other sniffed
  *    generation under Avro's compatibility rules — so mixed-generation
  *    directories read correctly in both naming orders (see
  *    electReaderSchema). Records are converted
  *    to Spark rows inside the reading task, before the (reused) Avro
  *    object is advanced — no record object ever crosses a stage
  *    boundary.
  *  - '''write''': `AvroKeyOutputFormat` via `saveAsNewAPIHadoopFile` —
  *    one container file per partition through the normal Hadoop output
  *    committer (task retries/speculation leave no partial files, same
  *    guarantee as the parquet sink). zstd by default, matching the
  *    ORC/parquet sinks.
  *
  * Type mapping (both directions) follows the public spark-avro
  * convention: nullable → `union(null, T)`; DateType ↔ `int`/`date`;
  * TimestampType ↔ `long`/`timestamp-micros` (and `timestamp-millis`
  * accepted on read); DecimalType(p,s) ↔ `bytes`/`decimal` (big-endian
  * two's-complement unscaled); Binary ↔ `bytes`/`fixed`; enums read as
  * strings; arrays/maps/structs recurse. Byte/Short widen to int in the
  * file and read back as IntegerType (Avro has no narrow ints).
  *
  * What Avro lacks vs parquet is column pruning and predicate pushdown,
  * which is why the read path is typically the first hop of an
  * ingest-to-parquet job, not a query target. The reference has no Avro
  * surface (its IO is CSV/JSON/parquet — /root/reference/src/DataFrame/
  * IO); this rounds out format parity for ingest jobs. Oracle coverage:
  * q144 writes a slice out through this sink, reads it back through this
  * reader, and the DuckDB oracle recomputes the expected aggregate
  * straight from the parquet table — any type-mapping drift fails the
  * hash match (the q70 ORC round-trip pattern).
  */
object Avro {

  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val avroSchema = electReaderSchema(path, hconf)
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(hconf)
    AvroJob.setInputKeySchema(job, avroSchema)
    val rows = spark.sparkContext
      .newAPIHadoopFile(path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        // Converters are rebuilt per task from the schema JSON (Avro
        // Schema is not serializable); conversion happens before the
        // record reader advances, so Hadoop's object reuse is safe.
        val schema = new Schema.Parser().parse(schemaJson)
        val conv = recordToRow(schema)
        it.map { case (k, _) => conv(k.datum()) }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Distributed Avro sink through the Hadoop output committer.
    * `compression`: zstandard | snappy | deflate | null. One file per
    * partition — size files by repartitioning upstream (the committer,
    * not this sink, owns file placement).
    *
    * `mode`: "overwrite" (default, parity with the other sinks) or
    * "error"/"errorifexists". Unlike the committer-managed sinks,
    * overwrite here is OUR recursive delete — so it carries a
    * foreign-content guard: the existing target must look like a prior
    * Avro output (a directory of part-* / _SUCCESS / hidden files).
    * A mistyped path pointing at arbitrary data refuses instead of
    * silently wiping it. */
  def writeAvro(df: DataFrame, path: String,
                compression: String = "zstandard",
                mode: String = "overwrite"): Unit = {
    val sparkSchema = df.schema
    val avroSchema = toAvroSchema(sparkSchema)
    val schemaJson = avroSchema.toString
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(path)
    val fs = target.getFileSystem(hconf)
    if (fs.exists(target)) mode.toLowerCase match {
      case "overwrite" =>
        val foreign: Seq[String] =
          if (!fs.getFileStatus(target).isDirectory) Seq(path)
          else fs.listStatus(target).collect {
            case s if {
              val n = s.getPath.getName
              !(n.startsWith("_") || n.startsWith(".") ||
                (s.isFile && n.startsWith("part-")))
            } => s.getPath.getName
          }.toSeq
        require(foreign.isEmpty,
          s"writeAvro: refusing to overwrite $path — existing target does " +
            s"not look like a prior Avro output (found: " +
            s"${foreign.take(5).mkString(", ")}). Delete it explicitly if " +
            "intended.")
        fs.delete(target, true)
      case "error" | "errorifexists" =>
        throw new IllegalArgumentException(
          s"writeAvro: target $path already exists (mode=$mode)")
      case other =>
        throw new IllegalArgumentException(
          s"writeAvro: unknown mode '$other' (overwrite | errorifexists)")
    }
    val job = Job.getInstance(hconf)
    AvroJob.setOutputKeySchema(job, avroSchema)
    FileOutputFormat.setCompressOutput(job, true)
    job.getConfiguration.set("avro.output.codec", compression)
    df.rdd
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        val conv = rowToRecord(schema)
        rows.map(r => (new AvroKey[GenericRecord](conv(r)), NullWritable.get()))
      }
      .saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Driver-side reader-schema ELECTION (round-10; closes the ADVICE r9
    * mixed-generation gap): every Avro container file carries its writer
    * schema in the header, so up to `maxProbe` evenly-spaced file
    * headers are sniffed (header read only — no data scan) and the
    * reader schema is the distinct schema that can resolve EVERY other
    * sniffed schema under Avro's own compatibility rules
    * (SchemaCompatibility). That makes mixed-generation directories
    * read correctly regardless of file NAMING: an added-nullable-field
    * generation is elected whether its files sort first or last
    * (previously the lexicographically-first file dictated the reader,
    * and a new-generation file sorting first broke reads of older
    * files). If no sniffed schema resolves all others (e.g. an added
    * field with no default in both directions), the read fails fast on
    * the driver with the conflicting schemas named — not at task
    * runtime with a missing-field error. A generation living ONLY in
    * un-probed files past `maxProbe` still resolves through whichever
    * schema was elected, or fails at task runtime as before — the
    * probe bound keeps driver cost O(maxProbe) on a 100 TB landing
    * zone. */
  private def electReaderSchema(path: String,
                                hconf: org.apache.hadoop.conf.Configuration,
                                maxProbe: Int = 64): Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val stats =
      if (fs.getFileStatus(p).isFile) Seq(fs.getFileStatus(p))
      else fs.listStatus(p).filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.sortBy(_.getPath.getName).toSeq
    if (stats.isEmpty)
      throw new IllegalArgumentException(s"no Avro data files under $path")
    val probed =
      if (stats.length <= maxProbe) stats
      else {
        val stride = stats.length.toDouble / maxProbe
        (0 until maxProbe).map(i => stats((i * stride).toInt)).distinct
      }
    def headerSchema(stat: org.apache.hadoop.fs.FileStatus): Schema = {
      val in = fs.open(stat.getPath)
      try {
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        try stream.getSchema finally stream.close()
      } finally in.close()
    }
    val distinct = probed.map(headerSchema).distinct
    if (distinct.size == 1) distinct.head
    else {
      import org.apache.avro.SchemaCompatibility
      def readsAll(reader: Schema): Boolean = distinct.forall { writer =>
        SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
          .getType == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE
      }
      // most fields first (the widest generation), toString tie-break
      // for determinism across listings
      distinct.sortBy(s => (-s.getFields.size, s.toString))
        .find(readsAll).getOrElse(throw new IllegalArgumentException(
          s"readAvro: no sniffed schema under $path can resolve all " +
            s"generations (Avro schema resolution failed between: " +
            s"${distinct.map(_.toString).mkString(" | ")}). Added fields " +
            "must carry defaults (nullable fields do) for mixed-generation " +
            "reads."))
    }
  }

  // ---- schema conversion --------------------------------------------------

  private[sources] def toAvroSchema(st: StructType,
                                    name: String = "graft_record"): Schema = {
    val fields = st.fields.toSeq.map { f =>
      new Schema.Field(f.name, toAvroFieldSchema(f.dataType, f.nullable,
        s"${name}_${f.name}"),
        null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, fields.asJava)
  }

  private def toAvroFieldSchema(dt: DataType, nullable: Boolean,
                                recName: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroFieldSchema(et, containsNull, recName + "_item"))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(toAvroFieldSchema(vt, valueContainsNull, recName + "_value"))
      case s: StructType => toAvroSchema(s, recName)
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro field type: $other")
    }
    if (nullable)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  private[sources] def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = toSparkField(f.schema())
        StructField(f.name(), dt, nullable)
      })
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
        TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY =>
      val (et, n) = toSparkField(s.getElementType)
      ArrayType(et, n)
    case Schema.Type.MAP =>
      val (vt, n) = toSparkField(s.getValueType)
      MapType(StringType, vt, n)
    case Schema.Type.UNION => toSparkField(s)._1
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  /** union(null, T) → (T, nullable=true); bare T → (T, false). */
  private def toSparkField(s: Schema): (DataType, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only union(null, T) Avro unions are supported, got $s")
      (toSparkType(branches.head), s.getTypes.size > branches.size)
    } else (toSparkType(s), false)

  // ---- value conversion ---------------------------------------------------

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private[sources] def recordToRow(schema: Schema): GenericRecord => Row = {
    val convs = schema.getFields.asScala.toArray.map(f => fromAvro(f.schema()))
    rec => Row.fromSeq(convs.zipWithIndex.map { case (c, i) => c(rec.get(i)) }.toSeq)
  }

  private def fromAvro(fieldSchema: Schema): Any => Any = {
    val s = nonNull(fieldSchema)
    val conv: Any => Any = s.getType match {
      case Schema.Type.RECORD =>
        val inner = recordToRow(s)
        v => inner(v.asInstanceOf[GenericRecord])
      case Schema.Type.INT if s.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        v => java.sql.Date.valueOf(
          LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Schema.Type.LONG if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        v => microsToTimestamp(v.asInstanceOf[Long])
      case Schema.Type.LONG if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        v => microsToTimestamp(Math.multiplyExact(v.asInstanceOf[Long], 1000L))
      case Schema.Type.STRING | Schema.Type.ENUM =>
        v => v.toString
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes: Any => Array[Byte] = {
          case b: ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: GenericData.Fixed => f.bytes()
          case other => other.asInstanceOf[Array[Byte]]
        }
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            v => new java.math.BigDecimal(
              new java.math.BigInteger(bytes(v)), d.getScale)
          case _ => v => bytes(v)
        }
      case Schema.Type.ARRAY =>
        val elem = fromAvro(s.getElementType)
        v => v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq.map(elem)
      case Schema.Type.MAP =>
        val value = fromAvro(s.getValueType)
        v => v.asInstanceOf[java.util.Map[Any, Any]].asScala
          .map { case (k, x) => k.toString -> value(x) }.toMap
      case _ => identity
    }
    v => if (v == null) null else conv(v)
  }

  private[sources] def rowToRecord(schema: Schema): Row => GenericRecord = {
    val fields = schema.getFields.asScala.toArray
    val convs = fields.map(f => toAvro(f.schema()))
    row => {
      val rec = new GenericData.Record(schema)
      var i = 0
      while (i < fields.length) {
        rec.put(i, convs(i)(row.get(i)))
        i += 1
      }
      rec
    }
  }

  private def toAvro(fieldSchema: Schema): Any => Any = {
    val s = nonNull(fieldSchema)
    val conv: Any => Any = s.getType match {
      case Schema.Type.RECORD =>
        val inner = rowToRecord(s)
        v => inner(v.asInstanceOf[Row])
      case Schema.Type.INT if s.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        v => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case Schema.Type.INT =>
        { case b: Byte => b.toInt; case sh: Short => sh.toInt; case other => other }
      case Schema.Type.LONG if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
        v => timestampToMicros(v.asInstanceOf[java.sql.Timestamp])
      case Schema.Type.BYTES => s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          v => ByteBuffer.wrap(v.asInstanceOf[java.math.BigDecimal]
            .setScale(d.getScale).unscaledValue().toByteArray)
        case _ => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      }
      case Schema.Type.ARRAY =>
        val elem = toAvro(s.getElementType)
        v => new java.util.ArrayList[Any](
          v.asInstanceOf[scala.collection.Seq[Any]].map(elem).asJava)
      case Schema.Type.MAP =>
        val value = toAvro(s.getValueType)
        v => {
          val m = new java.util.HashMap[String, Any]()
          v.asInstanceOf[scala.collection.Map[String, Any]]
            .foreach { case (k, x) => m.put(k, value(x)) }
          m
        }
      case _ => identity
    }
    v => if (v == null) null else conv(v)
  }

  /** Instant-exact micros ↔ java.sql.Timestamp (getTime carries the
    * milli part of the nanos; keep only whole seconds from it). */
  private def timestampToMicros(ts: java.sql.Timestamp): Long =
    Math.addExact(
      Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L),
      (ts.getNanos / 1000).toLong)

  private def microsToTimestamp(micros: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }
}
