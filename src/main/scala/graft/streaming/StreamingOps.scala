package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.TimestampNTZType

import graft.Query
import graft.functions.Exact._
import graft.sources.Tables

/** Structured Streaming twins of the batch event-time operators: the same
  * tumbling-window aggregation declared over `readStream`, driven to
  * completion with Trigger.AvailableNow against the static events parquet.
  *
  * Because AvailableNow processes the full input and the sink runs in
  * complete mode, the streaming result equals the batch result — so the
  * SAME DuckDB oracle applies: a genuine batch/streaming consistency check.
  *
  * Scale notes: in production this is `readStream` off a queue/landing
  * zone; the watermark bounds state (windows older than watermark are
  * evicted), and the stateful aggregation shuffles on (window, key) exactly
  * like the batch plan. The memory sink here is the test harness stand-in
  * for a real sink (kafka/delta/parquet appends).
  */
object StreamingOps {

  private val sinkId = new AtomicLong(0)

  /** Streaming tumbling 10-minute counts per event type (same semantics as
    * batch `win_time_tumbling` — and the same oracle).
    */
  def tumblingStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // schema must be provided to readStream; reuse the batch footer schema
    // (ts arrives as Long nanos under nanosAsLong — Tables normalizes).
    val batchSchema = spark.read.parquet(path).schema
    // the file stream source wants a directory: point it at sfDir and
    // glob-select the events file (same S2-style pruning as RefParity)
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    // watermarks require TIMESTAMP (with local tz), not NTZ — keep the
    // stream on LTZ micros (session is UTC so wall-clock math is identical)
    // and emit NTZ window bounds at the end to match the batch contract.
    val events = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val name = s"graft_stream_tumbling_${sinkId.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(
        col("window.start").cast(TimestampNTZType).as("wstart"),
        col("window.end").cast(TimestampNTZType).as("wend"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")
  }

  private val tumblingStreamOracle =
    s"""SELECT wstart, wstart + INTERVAL '10 minutes' AS wend, event_type,
       | CAST(count(*) AS BIGINT) AS n,
       | ${sqlDsum("value")} AS sum_value
       |FROM (SELECT time_bucket(INTERVAL '10 minutes', ts) AS wstart, event_type, value
       |      FROM events)
       |GROUP BY wstart, event_type
       |ORDER BY wstart, event_type""".stripMargin

  val queries: Seq[Query] = Seq(
    Query("stream_tumbling_counts",
      "Structured Streaming tumbling windows (AvailableNow; equals batch)",
      tumblingStream, Some(tumblingStreamOracle)),
  )
}
