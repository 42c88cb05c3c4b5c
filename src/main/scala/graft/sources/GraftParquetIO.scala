package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real columnar IO for `graft.storage = parquet` lake tables: each
  * committed file group lands as an actual parquet file (written with
  * parquet-mr's example API — the same writer/reader stack Spark's own
  * parquet source sits on), so write-amplification claims are measured
  * in BYTES on disk rather than driver-object identity, and the reader
  * factories exercise genuine columnar decode in tasks.
  *
  * Scoped to schemas of primitive/string/temporal columns plus
  * single-level ARRAYs of those (written as standard parquet 3-level
  * LIST groups — `optional group (LIST) { repeated group list {
  * optional element } }` — so the embeddings fixtures' ARRAY<FLOAT>
  * lands as real columnar data); deeper nesting rejects loudly at
  * table creation ([[supported]]). Row order is write order (single
  * sequential writer per file), which is what keeps `_pos`-keyed
  * deletion vectors stable across the storage modes. */
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
    case ArrayType(et, _) => primSupported(et)
    case _ => primSupported(dt)
  }

  private def primType(dt: DataType)
      : PTypes.PrimitiveBuilder[org.apache.parquet.schema.PrimitiveType] =
    dt match {
      case LongType => PTypes.optional(INT64)
      case IntegerType => PTypes.optional(INT32)
      case DoubleType => PTypes.optional(DOUBLE)
      case FloatType => PTypes.optional(FLOAT)
      case BooleanType => PTypes.optional(BOOLEAN)
      case StringType => PTypes.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType())
      case DateType => PTypes.optional(INT32)
        .as(LogicalTypeAnnotation.dateType())
      case TimestampType | TimestampNTZType => PTypes.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.MICROS))
      case d: DecimalType if d.precision <= 18 => PTypes.optional(INT64)
        .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
      case other => throw new UnsupportedOperationException(
        s"graft.storage=parquet cannot store ${other.sql}")
    }

  private def messageType(
      names: Seq[String], types: Seq[DataType]): MessageType = {
    val b = PTypes.buildMessage()
    names.zip(types).foreach { case (n, dt) =>
      val f: org.apache.parquet.schema.Type = dt match {
        case ArrayType(et, _) =>
          // standard LIST shape, built explicitly: outer optional group
          // annotated LIST, repeated middle group `list`, optional leaf
          // `element` — what parquet-backed lakehouse arrays look like
          PTypes.optionalGroup()
            .as(LogicalTypeAnnotation.listType())
            .addField(PTypes.repeatedGroup()
              .addField(primType(et).named("element"))
              .named("list"))
            .named(n)
        case prim => primType(prim).named(n)
      }
      b.addField(f)
    }
    b.named("graft_lake_file")
  }

  /** Write one file group; returns its size in bytes (the currency of
    * the write-amplification assertions). */
  def write(path: String, names: Seq[String], types: Seq[DataType],
      rows: Vector[InternalRow]): Long = {
    val schema = messageType(names, types)
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(new Configuration()).withType(schema).build()
    try rows.foreach { r =>
      val g = factory.newGroup()
      var i = 0
      while (i < types.length) {
        if (!r.isNullAt(i)) types(i) match {
          case LongType => g.add(i, r.getLong(i))
          case IntegerType => g.add(i, r.getInt(i))
          case DoubleType => g.add(i, r.getDouble(i))
          case FloatType => g.add(i, r.getFloat(i))
          case BooleanType => g.add(i, r.getBoolean(i))
          case StringType =>
            g.add(i, Binary.fromConstantByteArray(r.getUTF8String(i).getBytes))
          case DateType => g.add(i, r.getInt(i))
          case TimestampType | TimestampNTZType => g.add(i, r.getLong(i))
          case d: DecimalType =>
            g.add(i, r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
          case ArrayType(et, _) =>
            // one `list` entry group per element; a null element is an
            // entry with no `element` value (empty array = LIST group
            // with zero entries — distinct from a null column)
            val arr = r.getArray(i)
            val lg = g.addGroup(i)
            var j = 0
            while (j < arr.numElements()) {
              val entry = lg.addGroup(0)
              if (!arr.isNullAt(j)) et match {
                case LongType => entry.add(0, arr.getLong(j))
                case IntegerType => entry.add(0, arr.getInt(j))
                case DoubleType => entry.add(0, arr.getDouble(j))
                case FloatType => entry.add(0, arr.getFloat(j))
                case BooleanType => entry.add(0, arr.getBoolean(j))
                case StringType => entry.add(0, Binary
                  .fromConstantByteArray(arr.getUTF8String(j).getBytes))
                case DateType => entry.add(0, arr.getInt(j))
                case TimestampType | TimestampNTZType =>
                  entry.add(0, arr.getLong(j))
                case d: DecimalType => entry.add(0,
                  arr.getDecimal(j, d.precision, d.scale).toUnscaledLong)
                case _ => ()
              }
              j += 1
            }
          case _ => ()
        }
        i += 1
      }
      writer.write(g)
    } finally writer.close()
    new java.io.File(path).length()
  }

  /** Read a file group back, in write order, as InternalRows typed by
    * the file's write-time column types. */
  def read(path: String, types: Seq[DataType]): Vector[InternalRow] = {
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
            else types(i) match {
              case LongType => g.getLong(i, 0)
              case IntegerType => g.getInteger(i, 0)
              case DoubleType => g.getDouble(i, 0)
              case FloatType => g.getFloat(i, 0)
              case BooleanType => g.getBoolean(i, 0)
              case StringType =>
                UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
              case DateType => g.getInteger(i, 0)
              case TimestampType | TimestampNTZType => g.getLong(i, 0)
              case d: DecimalType =>
                Decimal(g.getLong(i, 0), d.precision, d.scale)
              case ArrayType(et, _) =>
                val lg = g.getGroup(i, 0)
                val n = lg.getFieldRepetitionCount(0)
                val vals = new Array[Any](n)
                var j = 0
                while (j < n) {
                  val entry = lg.getGroup(0, j)
                  vals(j) =
                    if (entry.getFieldRepetitionCount(0) == 0) null
                    else et match {
                      case LongType => entry.getLong(0, 0)
                      case IntegerType => entry.getInteger(0, 0)
                      case DoubleType => entry.getDouble(0, 0)
                      case FloatType => entry.getFloat(0, 0)
                      case BooleanType => entry.getBoolean(0, 0)
                      case StringType => UTF8String
                        .fromBytes(entry.getBinary(0, 0).getBytes)
                      case DateType => entry.getInteger(0, 0)
                      case TimestampType | TimestampNTZType =>
                        entry.getLong(0, 0)
                      case d: DecimalType =>
                        Decimal(entry.getLong(0, 0), d.precision, d.scale)
                      case _ => null
                    }
                  j += 1
                }
                new org.apache.spark.sql.catalyst.util
                  .GenericArrayData(vals)
              case _ => null
            }
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
