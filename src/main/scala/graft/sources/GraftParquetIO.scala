package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real columnar IO for `graft.storage = parquet` lake tables: each
  * committed file group lands as an actual parquet file (written with
  * parquet-mr's example API — the same writer/reader stack Spark's own
  * parquet source sits on), so write-amplification claims are measured
  * in BYTES on disk rather than driver-object identity, and the reader
  * factories exercise genuine columnar decode in tasks.
  *
  * Supports primitive/string/temporal/decimal(<=18) leaves composed to
  * ANY nesting depth of ARRAY / STRUCT / MAP — the shapes training-data
  * tables actually carry (token lists, span structs, per-field score
  * maps). The encodings are the standard parquet nested shapes any
  * engine writes: 3-level LIST (`optional group (LIST) { repeated group
  * list { optional element } }`), plain nested groups for STRUCT, and
  * 3-level MAP (`optional group (MAP) { repeated group key_value {
  * required key; optional value } }`). Leaf types outside the supported
  * set reject loudly at table creation ([[supported]]). Row order is
  * write order (single sequential writer per file), which is what keeps
  * `_pos`-keyed deletion vectors stable across the storage modes. */
object GraftParquetIO {

  private def primSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    // money columns: unscaled-INT64 decimal (the parquet DECIMAL
    // annotation for precision <= 18 — the common lakehouse encoding)
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  def supported(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => supported(et)
    case StructType(fields) =>
      fields.nonEmpty && fields.forall(f => supported(f.dataType))
    // parquet MAP keys are physically `required`: a null key has no
    // encoding, so only non-null primitive keys are accepted
    case MapType(kt, vt, _) => primSupported(kt) && supported(vt)
    case _ => primSupported(dt)
  }

  private def primType(dt: DataType, required: Boolean)
      : PTypes.PrimitiveBuilder[org.apache.parquet.schema.PrimitiveType] = {
    def b(t: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName) =
      if (required) PTypes.required(t) else PTypes.optional(t)
    dt match {
      case LongType => b(INT64)
      case IntegerType => b(INT32)
      case DoubleType => b(DOUBLE)
      case FloatType => b(FLOAT)
      case BooleanType => b(BOOLEAN)
      case StringType => b(BINARY).as(LogicalTypeAnnotation.stringType())
      case DateType => b(INT32).as(LogicalTypeAnnotation.dateType())
      case TimestampType | TimestampNTZType => b(INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.MICROS))
      case d: DecimalType if d.precision <= 18 => b(INT64)
        .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
      case other => throw new UnsupportedOperationException(
        s"graft.storage=parquet cannot store ${other.sql}")
    }
  }

  /** The parquet type of one (possibly nested) field — recursive over
    * ARRAY/STRUCT/MAP, each in its standard encoding. */
  private def ptype(n: String, dt: DataType,
      required: Boolean = false): org.apache.parquet.schema.Type =
    dt match {
      case ArrayType(et, _) =>
        PTypes.optionalGroup()
          .as(LogicalTypeAnnotation.listType())
          .addField(PTypes.repeatedGroup()
            .addField(ptype("element", et))
            .named("list"))
          .named(n)
      case StructType(fields) =>
        val g = PTypes.optionalGroup()
        fields.foreach(f => g.addField(ptype(f.name, f.dataType)))
        g.named(n)
      case MapType(kt, vt, _) =>
        PTypes.optionalGroup()
          .as(LogicalTypeAnnotation.mapType())
          .addField(PTypes.repeatedGroup()
            .addField(ptype("key", kt, required = true))
            .addField(ptype("value", vt))
            .named("key_value"))
          .named(n)
      case prim => primType(prim, required).named(n)
    }

  private def messageType(
      names: Seq[String], types: Seq[DataType]): MessageType = {
    val b = PTypes.buildMessage()
    names.zip(types).foreach { case (n, dt) => b.addField(ptype(n, dt)) }
    b.named("graft_lake_file")
  }

  /** Append the NON-NULL catalyst value `v` of type `dt` at field `i`
    * of `g`, recursing into nested groups. Callers handle null (absent
    * field) — parquet encodes null as no value at the position. */
  private def addTo(g: Group, i: Int, dt: DataType, v: Any): Unit =
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        g.add(i, v.asInstanceOf[Long])
      case IntegerType | DateType => g.add(i, v.asInstanceOf[Int])
      case DoubleType => g.add(i, v.asInstanceOf[Double])
      case FloatType => g.add(i, v.asInstanceOf[Float])
      case BooleanType => g.add(i, v.asInstanceOf[Boolean])
      case StringType => g.add(i, Binary.fromConstantByteArray(
        v.asInstanceOf[UTF8String].getBytes))
      case _: DecimalType =>
        g.add(i, v.asInstanceOf[Decimal].toUnscaledLong)
      case ArrayType(et, _) =>
        // one `list` entry group per element; a null element is an
        // entry with no `element` value (empty array = LIST group with
        // zero entries — distinct from a null column)
        val arr = v.asInstanceOf[ArrayData]
        val lg = g.addGroup(i)
        var j = 0
        while (j < arr.numElements()) {
          val entry = lg.addGroup(0)
          if (!arr.isNullAt(j)) addTo(entry, 0, et, arr.get(j, et))
          j += 1
        }
      case StructType(fields) =>
        val sr = v.asInstanceOf[InternalRow]
        val sg = g.addGroup(i)
        var j = 0
        while (j < fields.length) {
          if (!sr.isNullAt(j))
            addTo(sg, j, fields(j).dataType, sr.get(j, fields(j).dataType))
          j += 1
        }
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val mg = g.addGroup(i)
        val ks = m.keyArray()
        val vs = m.valueArray()
        var j = 0
        while (j < m.numElements()) {
          val kv = mg.addGroup(0)
          addTo(kv, 0, kt, ks.get(j, kt)) // keys are required, never null
          if (!vs.isNullAt(j)) addTo(kv, 1, vt, vs.get(j, vt))
          j += 1
        }
      case other => throw new UnsupportedOperationException(
        s"graft.storage=parquet cannot store ${other.sql}")
    }

  /** Write one file group; returns its size in bytes (the currency of
    * the write-amplification assertions).
    *
    * DEFAULT: the NATIVE row writer (VERDICT r16 task 7) — Spark's own
    * [[org.apache.spark.sql.execution.datasources.parquet
    * .ParquetWriteSupport]] streams InternalRows straight into parquet
    * column writers through a RecordConsumer, no per-row `Group` object
    * tree (the write-side twin of the vectorized decode). Encodings are
    * the standard modern shapes (3-level LIST/MAP, INT64-micros
    * timestamps) and both readers — the positional Group reader below
    * and the vectorized batch reader — serve files from either writer;
    * the only physical divergence is DECIMAL(≤9), which the native
    * writer stores as INT32 ([[readValue]] dispatches on the file's own
    * primitive type, so mixed-writer tables read exactly).
    * `-Dgraft.lake.write.columnar=off` pins the legacy Group writer —
    * the A/B knob DecodeBench's write phase measures. */
  def write(path: String, names: Seq[String], types: Seq[DataType],
      rows: Vector[InternalRow]): Long =
    if (sys.props.get("graft.lake.write.columnar").contains("off"))
      writeGroups(path, names, types, rows)
    else writeNative(path, names, types, rows)

  private def writeNative(path: String, names: Seq[String],
      types: Seq[DataType], rows: Vector[InternalRow]): Long = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    import org.apache.spark.sql.internal.SQLConf
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t) })
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    // executor-side: no session — pin every init-read setting in the
    // Hadoop conf explicitly (values = this engine's write contract)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      "TIMESTAMP_MICROS")
    // proleptic-Gregorian values only — this engine never writes
    // legacy-calendar ordinals (same CORRECTED the readers assume)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
    // read by the schema converter even though no VARIANT column exists
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key, "false")
    val writer = new RowWriterBuilder(new Path(path))
      .withConf(conf).build()
    try rows.foreach(writer.write) finally writer.close()
    new java.io.File(path).length()
  }

  private class RowWriterBuilder(path: Path)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[
        InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetWriteSupport()
  }

  /** The legacy parquet-mr `Group` writer (row-at-a-time object trees):
    * kept as the A/B baseline and a production fallback knob. */
  private def writeGroups(path: String, names: Seq[String],
      types: Seq[DataType], rows: Vector[InternalRow]): Long = {
    val schema = messageType(names, types)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(new Configuration()).withType(schema).build()
    try rows.foreach { r =>
      val g = factory.newGroup()
      var i = 0
      while (i < types.length) {
        if (!r.isNullAt(i)) addTo(g, i, types(i), r.get(i, types(i)))
        i += 1
      }
      writer.write(g)
    } finally writer.close()
    new java.io.File(path).length()
  }

  /** The catalyst value of the PRESENT field `i` of `g` typed `dt`,
    * recursing into nested groups (dual of [[addTo]]). */
  private def readValue(g: Group, i: Int, dt: DataType): Any = dt match {
    case LongType | TimestampType | TimestampNTZType => g.getLong(i, 0)
    case IntegerType | DateType => g.getInteger(i, 0)
    case DoubleType => g.getDouble(i, 0)
    case FloatType => g.getFloat(i, 0)
    case BooleanType => g.getBoolean(i, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
    case d: DecimalType =>
      // dispatch on the FILE's primitive: the legacy Group writer
      // stores every ≤18-precision decimal as INT64; the native writer
      // (Spark's converter) stores ≤9 as INT32 — both are this table's
      // own files and must read exactly
      g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName match {
        case INT32 =>
          Decimal(g.getInteger(i, 0).toLong, d.precision, d.scale)
        case INT64 => Decimal(g.getLong(i, 0), d.precision, d.scale)
        case _ => // FIXED_LEN_BYTE_ARRAY / BINARY (defensive)
          Decimal(new java.math.BigDecimal(new java.math.BigInteger(
            g.getBinary(i, 0).getBytes), d.scale), d.precision, d.scale)
      }
    case ArrayType(et, _) =>
      val lg = g.getGroup(i, 0)
      val n = lg.getFieldRepetitionCount(0)
      val vals = new Array[Any](n)
      var j = 0
      while (j < n) {
        val entry = lg.getGroup(0, j)
        vals(j) =
          if (entry.getFieldRepetitionCount(0) == 0) null
          else readValue(entry, 0, et)
        j += 1
      }
      new GenericArrayData(vals)
    case StructType(fields) =>
      val sg = g.getGroup(i, 0)
      val vals = new Array[Any](fields.length)
      var j = 0
      while (j < fields.length) {
        vals(j) =
          if (sg.getFieldRepetitionCount(j) == 0) null
          else readValue(sg, j, fields(j).dataType)
        j += 1
      }
      new GenericInternalRow(vals)
    case MapType(kt, vt, _) =>
      val mg = g.getGroup(i, 0)
      val n = mg.getFieldRepetitionCount(0)
      val keys = new Array[Any](n)
      val vals = new Array[Any](n)
      var j = 0
      while (j < n) {
        val kv = mg.getGroup(0, j)
        keys(j) = readValue(kv, 0, kt)
        vals(j) =
          if (kv.getFieldRepetitionCount(1) == 0) null
          else readValue(kv, 1, vt)
        j += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys),
        new GenericArrayData(vals))
    case other => throw new UnsupportedOperationException(
      s"graft.storage=parquet cannot read ${other.sql}")
  }

  /** TEST HOOK: files opened by this reader since JVM start — the
    * zero-read-probe-at-write spec's counter (a streaming upsert must
    * open NO existing data file). */
  val reads = new java.util.concurrent.atomic.AtomicLong

  /** Read a file group back, in write order, as InternalRows typed by
    * the file's write-time column types. */
  def read(path: String, types: Seq[DataType]): Vector[InternalRow] = {
    reads.incrementAndGet()
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new Path(path))
      .withConf(new Configuration()).build()
    val out = Vector.newBuilder[InternalRow]
    try {
      var g = reader.read()
      while (g != null) {
        val arr = new Array[Any](types.length)
        var i = 0
        while (i < types.length) {
          arr(i) =
            if (g.getFieldRepetitionCount(i) == 0) null
            else readValue(g, i, types(i))
          i += 1
        }
        out += new GenericInternalRow(arr)
        g = reader.read()
      }
    } finally reader.close()
    out.result()
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete()
  }
}
