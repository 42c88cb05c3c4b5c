package graft.sources

import java.util.{ArrayList => JArrayList}

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** VECTORIZED decode for parquet-backed lake scans (VERDICT r15 task 1).
  *
  * The row path ([[GraftParquetIO.read]]) decodes through parquet-mr's
  * example `Group` API — one materialized object tree per record — which
  * is correct but row-at-a-time; at 100 TB the decode CPU on the scan
  * path dominates. This module instead drives Spark's own
  * `VectorizedParquetRecordReader` (the engine under the built-in
  * parquet source): column chunks decode straight into
  * `OnHeapColumnVector`s in 4k-row batches, the DSv2 factory hands the
  * `ColumnarBatch` to Spark, and `ColumnarToRow` consumes it inside
  * whole-stage codegen — the exact physical shape `spark.read.parquet`
  * produces.
  *
  * Lake semantics are preserved by COMPOSING the batch, not rewriting
  * the decode:
  *  - field-id resolution: the file's parquet column LABELS are its
  *    write-time names ([[GraftLakeFile.pnames]], positionally aligned
  *    with the id manifest), so a projection maps current name → field
  *    id → file position → write-time label, and a RENAMEd column keeps
  *    decoding from the right chunk;
  *  - schema evolution: a column ADDed after the file was written has
  *    no chunk to decode — it rides as a [[ConstantColumnVector]]
  *    serving the EXISTS-default (or null), per batch, zero copies;
  *  - `_file` is a constant vector, `_pos` an `OnHeapColumnVector`
  *    refilled with the batch's run of ordinal positions (files are
  *    written by a single sequential writer, so parquet read order IS
  *    `_pos` order).
  *
  * Scans that need per-row work stay on the row path (the factory
  *  falls back whenever [[eligible]] says no): files with deletion
  * vectors (batch-level selection would need row copies anyway — DV
  * maintenance compacts them away), type-WIDENED reads (physical ≠
  * logical type needs per-value conversion), nested columns (served
  * row-wise by the custom reader), and in-memory storage. Eligibility
  * is decided ONCE per scan over the whole active file set, because
  * Spark requires every partition of a scan to agree on columnar vs
  * row output. */
object GraftLakeColumnar {

  /** Decode batch size — Spark's own default parquet batch capacity. */
  val BatchSize = 4096

  private def primVectorizable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** Types the vectorized path serves: the full `graft.storage =
    * parquet` surface — primitives AND nested containers (Spark's
    * vectorized reader decodes standard 3-level LIST / plain-group
    * STRUCT / 3-level MAP into nested column vectors; these files are
    * written in exactly those encodings). */
  def vectorizable(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => vectorizable(et)
    case StructType(fields) =>
      fields.nonEmpty && fields.forall(f => vectorizable(f.dataType))
    case MapType(kt, vt, _) =>
      primVectorizable(kt) && vectorizable(vt)
    case other => primVectorizable(other)
  }

  /** Scan-level eligibility: EVERY active file must be parquet-backed,
    * DV-free, and serve every required data column either from a
    * physically-identical chunk or as a constant (absent → default) —
    * and at least one required column must actually decode from each
    * file (a zero-column projection has no batch to drive). */
  def eligible(files: Seq[GraftLakeFile], dvs: Map[String, Set[Long]],
      required: StructType, namesOf: GraftLakeFile => Seq[String],
      defaults: Map[String, Any]): Boolean = {
    val dataFields = required.fields.filterNot(f =>
      f.name == GraftLakeTable.FileCol || f.name == GraftLakeTable.PosCol)
    dataFields.nonEmpty &&
    dataFields.forall(f => vectorizable(f.dataType)) &&
    files.forall { f =>
      f.path.isDefined && f.pnames.length == f.cols.length &&
      dvs.getOrElse(f.id, Set.empty).isEmpty && {
        val names = namesOf(f)
        dataFields.exists(fld => names.contains(fld.name)) &&
        dataFields.forall { fld =>
          val i = names.indexOf(fld.name)
          if (i >= 0) f.types(i) == fld.dataType
          // absent column: a constant vector serves it — null for any
          // type, a non-null EXISTS-default only if primitive
          else defaults.getOrElse(fld.name, null) == null ||
            primVectorizable(fld.dataType)
        }
      }
    }
  }

  /** A per-batch constant column: the EXISTS-default (or null) an old
    * file serves for a post-write ADD COLUMN, vectorized. */
  private def constant(dt: DataType, v: Any): ConstantColumnVector = {
    val c = new ConstantColumnVector(BatchSize, dt)
    // null serves ANY type (including nested — isNullAt answers before
    // any child vector is consulted); non-null constants are primitive
    // by eligibility
    if (v == null) c.setNull()
    else dt match {
      case LongType | TimestampType | TimestampNTZType =>
        c.setLong(v.asInstanceOf[Long])
      case IntegerType | DateType => c.setInt(v.asInstanceOf[Int])
      case DoubleType => c.setDouble(v.asInstanceOf[Double])
      case FloatType => c.setFloat(v.asInstanceOf[Float])
      case BooleanType => c.setBoolean(v.asInstanceOf[Boolean])
      case StringType => c.setUtf8String(v.asInstanceOf[UTF8String])
      case d: DecimalType =>
        c.setDecimal(v.asInstanceOf[Decimal], d.precision)
      case other => throw new UnsupportedOperationException(
        s"columnar constant for ${other.sql}")
    }
    c
  }

  /** Executor-side columnar reader for one parquet-backed file group.
    * Only called when [[eligible]] approved the scan. */
  def reader(fp: GraftLakeFilePartition, required: StructType,
      defaults: Map[String, Any]): PartitionReader[ColumnarBatch] = {
    val path = fp.path.getOrElse(throw new IllegalStateException(
      s"columnar read planned for in-memory file ${fp.fileId}"))
    // required data columns present in the file: output slot → file
    // position; requested from parquet under the file's WRITE-TIME
    // labels, in output order (the reader's batch preserves request
    // order, so batch column j serves the j-th present field)
    val present: Array[(Int, Int)] =
      required.fields.zipWithIndex.flatMap { case (fld, oi) =>
        if (fld.name == GraftLakeTable.FileCol ||
            fld.name == GraftLakeTable.PosCol) None
        else {
          val fi = fp.cols.indexOf(fld.name)
          if (fi >= 0) Some((oi, fi)) else None
        }
      }
    val requestCols = new JArrayList[String](present.length)
    present.foreach { case (_, fi) => requestCols.add(fp.pnames(fi)) }
    // rebase CORRECTED: these files are written by this engine with
    // proleptic-Gregorian day/micro values — no legacy calendar exists
    val vec = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, BatchSize)
    var initialized = false
    try {
      vec.initialize(path, requestCols)
      initialized = true
    } finally if (!initialized) vec.close()
    val decoded = vec.resultBatch()
    val needPos =
      required.fieldNames.contains(GraftLakeTable.PosCol)
    val posVec = if (needPos) new OnHeapColumnVector(BatchSize, LongType)
      else null
    val outIdxToBatch = present.zipWithIndex
      .map { case ((oi, _), j) => oi -> j }.toMap
    val mine = Vector.newBuilder[ColumnVector] // vectors this reader owns
    if (posVec != null) mine += posVec
    val out: Array[ColumnVector] =
      required.fields.zipWithIndex.map { case (fld, oi) =>
        if (fld.name == GraftLakeTable.FileCol) {
          val c = new ConstantColumnVector(BatchSize, StringType)
          c.setUtf8String(UTF8String.fromString(fp.fileId))
          mine += c
          c
        } else if (fld.name == GraftLakeTable.PosCol) posVec
        else outIdxToBatch.get(oi) match {
          case Some(j) => decoded.column(j)
          case None =>
            val c = constant(fld.dataType,
              defaults.getOrElse(fld.name, null))
            mine += c
            c
        }
      }
    val owned = mine.result()
    val batch = new ColumnarBatch(out)
    new PartitionReader[ColumnarBatch] {
      private var base = 0L
      override def next(): Boolean =
        if (!vec.nextBatch()) false
        else {
          val n = decoded.numRows()
          if (posVec != null) {
            posVec.reset()
            var i = 0
            while (i < n) { posVec.putLong(i, base + i); i += 1 }
          }
          base += n
          batch.setNumRows(n)
          true
        }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = {
        vec.close() // closes the decoded batch's vectors
        owned.foreach(_.close())
      }
    }
  }
}
