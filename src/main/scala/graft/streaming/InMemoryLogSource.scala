package graft.streaming

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kafka-SHAPED DSv2 micro-batch source: an in-memory, offset-addressed,
  * append-only log behind the full connector streaming contract —
  * `initialOffset` / `latestOffset` / `planInputPartitions(start, end)` /
  * `commit` / checkpointed offset restore — plus the two production knobs
  * the file source can't exercise: ADMISSION CONTROL (`ReadMaxRows` via
  * `maxRecordsPerTrigger`, honored batch by batch under AvailableNow
  * through [[SupportsTriggerAvailableNow]]) and RESTART semantics (a new
  * run against the same checkpoint resumes from the COMMITTED offset —
  * records appended after the first drain are picked up exactly once, no
  * replays, no gaps). `stream_kafka_restart` drives a stop → append →
  * restart cycle through it and is gated by the batch oracle;
  * StreamingSpec additionally asserts the planned-range ledger (contiguous,
  * gap-free, restart begins at the committed offset).
  *
  * The "broker" is a per-topic in-process buffer ([[InMemoryLog]]) — the
  * single-JVM harness stand-in for a real cluster bus, exactly like the
  * memory SINK used across the streaming suite (ARCHITECTURE.md "known
  * single-node vs cluster deltas"). The connector surface is the real
  * thing; at 100 TB you swap the buffer for Kafka partitions and this
  * source's offset arithmetic becomes per-partition instead of global.
  * Reference anchor: the closest reference concept is the Lambda trigger
  * (app.py:106) — batch admission of "what arrived since last run" —
  * re-expressed as source-side offset tracking.
  */
object InMemoryLog {

  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** One record in the log (kept columnar-simple; ts intentionally absent —
    * the restart query is about offsets, not event time). */
  final case class Record(
      eventId: Long, userId: Long, eventType: String, value: Double)

  private val topics = new ConcurrentHashMap[String, ArrayBuffer[Record]]()

  /** Planned micro-batch ranges per topic, in planning order — the ledger
    * StreamingSpec audits for the exactly-once contract (contiguous,
    * non-overlapping, restart resumes at the committed offset). The same
    * range appears several times per batch (Spark re-plans the scan for
    * logical planning, physical planning, and execution) — auditors read
    * it through `.distinct`. */
  private[graft] val plannedRanges =
    new ConcurrentHashMap[String, ArrayBuffer[(Long, Long)]]()

  /** Highest end-offset acknowledged through the source `commit()`
    * callback per topic. NOTE: Spark acknowledges batch N to the source
    * only when batch N+1 starts, so this LAGS the drain end by up to one
    * batch — restart resumption reads the checkpoint's commit log, not
    * this callback (same contract as Kafka consumer-offset advancement;
    * the callback exists for source-side cleanup/retention). */
  private[graft] val committed = new ConcurrentHashMap[String, Long]()

  def reset(topic: String): Unit = {
    topics.put(topic, ArrayBuffer.empty)
    plannedRanges.put(topic, ArrayBuffer.empty)
    committed.remove(topic)
  }

  def append(topic: String, records: Seq[Record]): Unit = {
    val buf = topics.computeIfAbsent(topic, _ => ArrayBuffer.empty)
    buf.synchronized { buf ++= records }
  }

  def size(topic: String): Long = {
    val buf = topics.get(topic)
    if (buf == null) 0L else buf.synchronized(buf.length.toLong)
  }

  def slice(topic: String, from: Long, until: Long): Seq[Record] = {
    val buf = topics.get(topic)
    require(buf != null, s"unknown in-memory log topic: $topic")
    buf.synchronized(buf.slice(from.toInt, until.toInt).toVector)
  }
}

/** Offset = position in the append-only log (a Kafka offset with one
  * partition). JSON form is just the number, like Kafka's per-partition
  * longs in the offset log. */
final case class LogOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** The TableProvider looked up by class name:
  * `spark.readStream.format(classOf[InMemoryLogProvider].getName)`. */
class InMemoryLogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InMemoryLog.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new InMemoryLogTable(properties.asScala.toMap)
}

class InMemoryLogTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val topic = properties.getOrElse("topic",
    sys.error("in-memory log source requires a 'topic' option"))
  override def name(): String = s"inmemlog:$topic"
  override def schema(): StructType = InMemoryLog.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = InMemoryLog.Schema
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new InMemoryLogMicroBatchStream(topic,
          Option(options.get("maxRecordsPerTrigger")).map(_.toLong))
    }
  }
}

class InMemoryLogMicroBatchStream(
    topic: String, maxRecordsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // AvailableNow contract: everything present when the trigger fired is
  // the drain target; later appends wait for the next run
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(InMemoryLog.size(topic))

  private def cappedSize: Long =
    availableNowCap.getOrElse(InMemoryLog.size(topic))

  override def initialOffset(): Offset = LogOffset(0L)

  override def deserializeOffset(json: String): Offset =
    LogOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(
      ReadLimit.allAvailable())

  /** Admission control: advance by at most the read limit per batch —
    * source-side rate limiting, the first knob a production streaming
    * user touches. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffset].index
    val end = limit match {
      case r: ReadMaxRows => math.min(from + r.maxRows(), cappedSize)
      case _ => cappedSize
    }
    LogOffset(end)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffset].index
    val e = end.asInstanceOf[LogOffset].index
    val ledger = InMemoryLog.plannedRanges
      .computeIfAbsent(topic, _ => ArrayBuffer.empty)
    ledger.synchronized { ledger += ((s, e)) }
    if (s >= e) Array.empty
    else Array(LogInputPartition(topic, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogPartitionReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[LogOffset].index
    InMemoryLog.committed.merge(topic, e, (a, b) => math.max(a, b))
  }

  override def stop(): Unit = ()
}

final case class LogInputPartition(topic: String, start: Long, end: Long)
    extends InputPartition

class LogPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogInputPartition]
    // local[n] = one JVM, so the "broker" buffer is reachable from the
    // task; a real cluster source fetches from the broker here instead
    val records = InMemoryLog.slice(p.topic, p.start, p.end).iterator
    new PartitionReader[InternalRow] {
      private var current: InMemoryLog.Record = _
      override def next(): Boolean =
        if (records.hasNext) { current = records.next(); true } else false
      override def get(): InternalRow = InternalRow(
        current.eventId, current.userId,
        UTF8String.fromString(current.eventType), current.value)
      override def close(): Unit = ()
    }
  }
}
