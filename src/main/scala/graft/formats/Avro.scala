package graft.formats

import java.io.File
import java.nio.ByteBuffer

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container files on the Generic API.
  *
  * Spark's `avro` DataFrame format lives in the spark-avro module,
  * which is not bundled in this environment — but the core Avro
  * runtime (`avro-1.12.1.jar`, what Spark itself links against) is on
  * the classpath, so this codec implements the container read/write
  * path directly and keeps BOTH sides distributed: the writer emits
  * one container file per partition (`foreachPartition`), the reader
  * parallelizes over files with one task per container (Avro blocks
  * inside a container are not split — same per-file granularity as
  * the reference's format modules, splittable at the file level the
  * way a 100 TB layout actually arrives: many files).
  *
  * Type mapping (both directions, nullable = union with null):
  * long/int/double/float/string/boolean/bytes 1:1; TimestampType <->
  * long + timestamp-micros logical type; DateType <-> int + date
  * logical type. These cover every driver-generated table column.
  */
object Avro {

  /** Spark StructType -> Avro record schema (JSON-stable, so closures
    * carry the string and re-parse — avro Schema equality across
    * serialization is then trivially exact).
    */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(
          s"avro: unsupported Spark type $other for column ${f.name}")
      }
      val sch =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      val dflt: AnyRef =
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
      fields.add(new Schema.Field(f.name, sch, null, dflt))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.toArray(Array.empty[Schema])
        .filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, s"avro: unsupported union $s")
      (nonNull.head, true)
    } else (s, false)

  /** Avro record schema -> Spark StructType (inverse of avroSchema). */
  def sparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"avro: not a record: $schema")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (base, nullable) = unwrap(f.schema())
      val dt = (base.getType, Option(base.getLogicalType)) match {
        case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
        case (Schema.Type.LONG, Some(_: LogicalTypes.LocalTimestampMicros)) =>
          TimestampNTZType
        case (Schema.Type.LONG, _)    => LongType
        case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
        case (Schema.Type.INT, _)     => IntegerType
        case (Schema.Type.DOUBLE, _)  => DoubleType
        case (Schema.Type.FLOAT, _)   => FloatType
        case (Schema.Type.STRING, _)  => StringType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.BYTES, _)   => BinaryType
        case (t, _) => throw new IllegalArgumentException(
          s"avro: unsupported type $t for field ${f.name}")
      }
      StructField(f.name, dt, nullable)
    })
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case t: java.sql.Timestamp =>
      // micros = ms*1000 + sub-ms micros (getNanos repeats the ms part)
      java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
    case ldt: java.time.LocalDateTime => // TimestampNTZType
      java.lang.Long.valueOf(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L)
    case d: java.sql.Date =>
      java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other.asInstanceOf[AnyRef]
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l.longValue(), 1000L))
      ts.setNanos((Math.floorMod(l.longValue(), 1000000L) * 1000L).toInt)
      ts
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        (Math.floorMod(l.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (s: CharSequence, StringType) => s.toString
    case (other, _) => other
  }

  /** Distributed write: one Avro container per partition under `path`.
    * Returns the row count (via the same single pass that writes).
    *
    * Filesystem contract: `path` is a java.io.File path, so this module
    * requires local mode or a POSIX filesystem mounted identically on
    * driver and every executor (NFS and friends) — unlike the other
    * format modules, which go through Spark/Hadoop path resolution. On
    * a cluster with only object storage, stage to a shared mount or
    * extend this to Hadoop FileSystem streams.
    *
    * Each task writes to an attempt-unique temp name and atomically
    * renames on success, so a speculative or retried attempt can never
    * interleave bytes with the winner — last completed rename wins and
    * both attempts wrote identical content from the same partition.
    */
  def write(df: DataFrame, path: String): Long = {
    val schemaJson = avroSchema(df.schema).toString
    val types = df.schema.fields.map(_.dataType)
    new File(path).mkdirs()
    val counter = df.sparkSession.sparkContext.longAccumulator("avro_rows")
    df.rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      val finalFile = new File(path, f"part-$pid%05d.avro")
      val tmpFile = new File(path, f".part-$pid%05d.avro.attempt-${tc.taskAttemptId()}")
      w.create(schema, tmpFile)
      var ok = false
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < types.length) {
            rec.put(i, toAvro(if (row.isNullAt(i)) null else row.get(i), types(i)))
            i += 1
          }
          w.append(rec); counter.add(1L)
        }
        ok = true
      } finally {
        // The tmp file must not outlive this block on ANY failure path
        // — including w.close() throwing after ok=true (a leaked
        // .attempt file is litter the .avro read filter skips, but
        // litter accumulates across retries). After a successful move
        // the tmp path no longer exists and the delete is a no-op.
        try {
          w.close()
          if (ok) {
            java.nio.file.Files.move(tmpFile.toPath, finalFile.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        } finally {
          if (tmpFile.exists()) tmpFile.delete()
        }
      }
    }
    counter.value
  }

  /** Distributed read: one task per container file; schema from the
    * first container's header (or caller-supplied). Same filesystem
    * contract as `write`: local mode or a shared POSIX mount.
    */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val files = Option(new File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"avro: no .avro files under $path")
    val st = schema.getOrElse {
      val r = new DataFileReader[GenericRecord](
        new File(files.head), new GenericDatumReader[GenericRecord]())
      try sparkSchema(r.getSchema) finally r.close()
    }
    val types = st.fields.map(_.dataType)
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val r = new DataFileReader[GenericRecord](
          new File(f), new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try while (r.hasNext) {
          val rec = r.next()
          out += Row.fromSeq(types.indices.map(i => fromAvro(rec.get(i), types(i))))
        } finally r.close()
        out
      }
    spark.createDataFrame(rdd, st)
  }
}
