package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Environment-drift guard for the events timestamp contract.
  *
  * events.parquet carries parquet TIMESTAMP(NANOS), a type Spark has no
  * native mapping for. The installed Spark 4.1.2 jar has already changed
  * behavior once mid-project: older builds honored
  * `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrived as Long nanos);
  * the current build ignores the flag and yields TIMESTAMP_NTZ truncated
  * to micros. That swap silently broke 7 streaming queries in round 7
  * because the raw type leaked past a non-type-aware `ts div 1000`.
  *
  * These assertions pin the contract so the NEXT jar/env drift fails a
  * named test instead of a pile of downstream queries:
  *  1. the raw footer type is one of the two KNOWN arrivals (a third
  *     behavior — e.g. LTZ, or nanos-preserving — fails loudly here);
  *  2. batch normalization lands on TIMESTAMP_NTZ micros (the DuckDB
  *     oracle truncates the same column to micros, so this is the
  *     cross-engine comparison contract);
  *  3. the streaming normalization (LTZ for watermark eligibility) agrees
  *     with the batch normalization value-for-value under the UTC session.
  */
class EventsTsSpec extends SparkTestBase {

  test("events.ts raw arrival type is a known jar behavior") {
    val raw = spark.read.parquet(s"$Sf/events.parquet")
    val t = raw.schema("ts").dataType
    assert(t == LongType || t == TimestampNTZType,
      s"events.ts arrived as $t — a NEW jar behavior; " +
        "re-audit Tables.normalizeEventTs/normalizeEventTsStream")
  }

  test("batch normalization yields TIMESTAMP_NTZ at microsecond precision") {
    val norm = Tables(spark, Sf, "events")
    assert(norm.schema("ts").dataType == TimestampNTZType)
    // micros precision (not millis, not nanos-zeroed): truncating again to
    // micros must be the identity, truncating to millis must NOT be —
    // the generated data carries sub-millisecond variation
    val n = norm.count()
    val microsStable = norm.filter(
      date_trunc("microsecond", col("ts")) === col("ts")).count()
    assert(microsStable == n, "ts must already be micros-truncated")
    val millisStable = norm.filter(
      date_trunc("millisecond", col("ts")) === col("ts")).count()
    // sub-milli variation is a property of the CURRENT generated fixture,
    // not of the normalization contract — but "normalized output is
    // millis-aligned" has two causes with opposite meanings. Distinguish
    // them against the RAW fixture (ADVICE r9): if the raw data carries
    // sub-milli variation that the normalized output lost, that IS the
    // upstream-truncation drift this test exists to catch — hard fail;
    // only a fixture that is millis-aligned at the SOURCE may skip.
    if (millisStable == n) {
      val raw = spark.read.parquet(s"$Sf/events.parquet")
      val rawSubMilli = raw.schema("ts").dataType match {
        case LongType => // nanos since epoch: remainder inside the milli
          raw.filter(col("ts") % 1000000L =!= 0L).count()
        case _ =>
          raw.filter(
            date_trunc("millisecond", col("ts")) =!= col("ts")).count()
      }
      assert(rawSubMilli == 0L,
        s"normalization LOST sub-millisecond precision: $rawSubMilli raw " +
          "rows carry sub-milli variation but the normalized output is " +
          "millis-aligned — the truncation drift this test guards against")
      cancel("events fixture is millis-aligned at the source on this " +
        "generation — sub-milli precision check not exercisable " +
        "(verified against the raw data, not assumed)")
    }
  }

  test("streaming normalization equals batch normalization value-for-value") {
    val raw = spark.read.parquet(s"$Sf/events.parquet")
    // normalizeEventTsStream is a plain DataFrame function — applying it to
    // the batch frame exercises exactly the streaming branch logic
    val streamNorm = Tables.normalizeEventTsStream(raw)
    assert(streamNorm.schema("ts").dataType == TimestampType,
      "streams ride TIMESTAMP (LTZ) for watermark eligibility")
    val mismatched = streamNorm
      .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"))
      .join(Tables(spark, Sf, "events").select(col("event_id"),
        col("ts").as("batch_ts")), "event_id")
      .filter(col("ts") =!= col("batch_ts"))
      .count()
    assert(mismatched == 0,
      "stream and batch ts normalization diverged — the shared-oracle " +
        "batch/streaming consistency gate would silently break")
  }

  test("Tables schema cache serves the footer-inferred schema per path") {
    // r21: Tables caches inferred schemas per (path, nanos-flag) — the
    // metastore role — so every registry query skips per-statement
    // footer re-inference (~80 ms/call measured). This pins the cache's
    // one correctness obligation: what it serves IS the footer schema
    // of THAT path, never another sf dir's (the two harness dirs differ
    // only in data, but the keying must hold regardless), and the
    // cached read produces the same relation schema as a fresh
    // inference read.
    for (sf <- Seq(Sf, SfOracle); t <- Seq("orders", "events", "documents")) {
      val cached = Tables(spark, sf, t).schema
      val fresh = spark.read.parquet(s"$sf/$t.parquet")
      val freshNorm =
        if (t == "events") Tables.normalizeEventTs(fresh) else fresh
      assert(cached == freshNorm.schema,
        s"cached schema for $sf/$t diverged from footer inference")
    }
  }
}
