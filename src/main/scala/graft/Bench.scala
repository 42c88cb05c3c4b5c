package graft
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-only: bench a name-filtered subset (substring match, comma-sep)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    // NOTE: do NOT set a fixed spark.sql.streaming.checkpointLocation here.
    // A/B'd (tmpfs vs /tmp, ABAB over the 5 heaviest streaming queries):
    // 40.7/42.3 s vs 39.6 s — checkpoint I/O is ~3% of the streaming cost,
    // i.e. noise — AND a persistent base is a footgun: query names restart
    // per JVM, so a re-run resumes the PREVIOUS run's committed checkpoint
    // and silently processes zero rows (observed: 5 queries "ran" in
    // 1.16 s total). Per-query temp checkpoints stay.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session costs (task dispatch JIT, parquet reader +
    // codegen framework init) so per-query numbers measure the queries,
    // not the first query's luck of position
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // pre-stage the chunked streaming fixtures: staging is one-time test
    // setup (fingerprint-cached on disk), not part of any operator's cost
    graft.streaming.StreamingOps.chunkedEventsDir(spark, sfDir)
    graft.streaming.StreamingOps.chunkedEventsWithSentinelDir(spark, sfDir)
    // fixed name order: run-to-run and round-to-round comparability
    // (Map iteration order is hash-dependent)
    // a failed query must be DISTINCT in the output, not a silently-timed
    // row (ADVICE r9: the old catch-all would have recorded the fake-fast
    // silent-checkpoint-resume number the awaitDrained guard exists to
    // prevent) — its elapsed time still counts toward the total, but the
    // name lands in an "errors" list any consumer can see
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // PER-BATCH STREAMING TRACE (VERDICT r10): the driver's r10 run
    // recorded stream_windowed_rollup at 35.8 s against a 4.2 s history
    // with the code unchanged, and nothing in the bench output could say
    // WHICH micro-batch stalled. A listener records every streaming
    // micro-batch's trigger duration keyed by the bench query running at
    // the time; the full trace lands in bench.trace.json and any query
    // whose wall time crosses the anomaly threshold gets a compact
    // stdout marker line — so a recurrence arrives self-diagnosed
    // (stalled batch id + duration) instead of as a bare total.
    val currentQuery = new java.util.concurrent.atomic.AtomicReference("")
    val traces = new java.util.concurrent.ConcurrentHashMap[
      String, scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val ms = Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(-1L)
          val buf = traces.computeIfAbsent(currentQuery.get,
            _ => scala.collection.mutable.ArrayBuffer.empty)
          buf.synchronized {
            if (buf.length < 500) buf += ((p.batchId, ms, p.numInputRows))
          }
        }
      })
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (name, fn) =>
      currentQuery.set(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // whitelist printable ASCII (ADVICE r10: \b, \f, \u0000 etc.
          // would still break the JSON line), then drop the two printable
          // chars that are JSON-structural in a quoted string
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[^\\x20-\\x7e]|[\"\\\\]", " ").take(120)
      }
      // queries may cache small intermediates (signature tables etc.);
      // drop them so later queries aren't measured under memory pressure
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    // millisecond precision: noise floor is ±30% run-to-run, and the full
    // JSON line must stay under the driver's stdout tail window (~2.9 KB —
    // rounds 2 and 3 both truncated a full-precision line mid-JSON and
    // recorded "parsed": null)
    def sec3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a name-filtered dev subset is marked INSIDE the JSON so a file
    // consumer can never mistake a partial total for a full benchmark
    val partial = if (only.isDefined) """"partial":true,""" else ""
    // failures surface in BOTH emitted lines; an empty key is omitted so
    // a clean run's JSON is unchanged round-over-round
    val errs = if (failed.isEmpty) "" else failed
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString(""""errors":{""", ",", "},")
    val json =
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec",$partial$errs"queries":$qs,"sf":"$sfDir"}"""
    // the bare println proved losable to sbt log interleaving/truncation in
    // round 1 ("parsed": null) — emit the line under a unique grep-able
    // marker AND persist it to a file so the round's number can't be lost.
    val marker =
      if (only.isDefined) "GRAFT_BENCH_JSON_PARTIAL" else "GRAFT_BENCH_JSON"
    println(s"$marker $json")
    // full per-batch streaming trace to a file; compact stdout marker for
    // queries whose wall time crossed the anomaly threshold (12 s: the
    // heaviest healthy streaming query reads ~7 s at sf0.1) — printed
    // HERE, before the final compact line, so the driver's ~2.9 KB stdout
    // tail still ends with the canonical summary
    val timeByName = results.toMap
    val traceJson = traces.asScala.toSeq.sortBy(_._1).map { case (n, buf) =>
      val bs = buf.synchronized(buf.toVector)
      val batches = bs.map { case (id, ms, rows) =>
        s"[$id,$ms,$rows]" }.mkString("[", ",", "]")
      "\"" + n + "\":{\"wall_sec\":" +
        sec3(timeByName.getOrElse(n, -1.0)) +
        ",\"batches_id_ms_rows\":" + batches + "}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench.trace.json"), traceJson + "\n")
    val anomalies = traces.asScala.toSeq
      .filter { case (n, _) => timeByName.getOrElse(n, 0.0) > 12.0 }
      .sortBy { case (n, _) => -timeByName(n) }.take(2)
    anomalies.foreach { case (n, buf) =>
      val bs = buf.synchronized(buf.toVector)
      val top = bs.sortBy(-_._2).take(6)
        .map { case (id, ms, rows) => s"\"b$id\":[$ms,$rows]" }
        .mkString("{", ",", "}")
      println(s"""GRAFT_BENCH_TRACE {"query":"$n","wall_sec":${
        sec3(timeByName(n))},"n_batches":${bs.length},"slowest_ms_rows":$top}""")
    }
    // a filtered dev run must not clobber the last FULL run's bench.json —
    // without an explicit output override it lands in its own default file
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "bench.partial.json" else "bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    // stop FIRST, then print as the process's near-last stdout line:
    // Spark/sbt shutdown logging can no longer interleave. The harness
    // retains only a 2000-char stdout TAIL (measured from BENCH_r03) — the
    // full 100+-query JSON can never fit, so the final line is a COMPACT
    // json (total + the 20 slowest queries); the complete per-query map
    // stays in the marker line above and in the bench.json file.
    spark.stop()
    // slowest-30 (VERDICT r9 task 4): wide enough that the driver's
    // truncated stdout tail keeps every historically-heavy row visible;
    // still fits the ~2.9 KB tail window with the error list
    val top = results.sortBy(-_._2).take(30)
      .map { case (k, v) => s"\"" + k + "\":" + sec3(v) }
      .mkString("{", ",", "}")
    // "slowest", NOT "queries": the truncated 30-entry map must not be
    // mistakable for the complete per-query map in the marker line / file
    println(
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec",$partial${errs}"n_queries":${results.size},"slowest":$top,"sf":"$sfDir"}""")
  }
}
