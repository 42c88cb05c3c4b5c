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
  * Deliberately scoped to FLAT schemas of primitive/string/temporal
  * columns — the shapes every lakehouse registry fixture uses; nested
  * types reject loudly at table creation ([[supported]]). Row order is
  * write order (single sequential writer per file), which is what keeps
  * `_pos`-keyed deletion vectors stable across the storage modes. */
object GraftParquetIO {

  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def messageType(
      names: Seq[String], types: Seq[DataType]): MessageType = {
    val b = PTypes.buildMessage()
    names.zip(types).foreach { case (n, dt) =>
      val f = dt match {
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
        case other => throw new UnsupportedOperationException(
          s"graft.storage=parquet supports flat primitive columns, got " +
            s"$n: ${other.sql}")
      }
      b.addField(f.named(n))
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
