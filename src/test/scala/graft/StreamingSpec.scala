package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact._

/** Batch/streaming consistency: every streaming query drained with
  * Trigger.AvailableNow must equal the batch aggregate over the same data.
  */
class StreamingSpec extends SparkTestBase {

  test("streaming dedup of a doubled stream equals the single-copy batch aggregate") {
    val got = run("stream_dedup_exact").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    val want = spark.read.parquet(s"$Sf/events.parquet")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    assert(got.sameElements(want))
  }

  test("stream-static enrichment equals the batch join aggregate") {
    val got = run("stream_enrich_static").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val want = ev.join(cust, ev("user_id") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    assert(got.sameElements(want))
  }

  test("stream-stream interval join equals the batch interval join") {
    val got = run("stream_stream_join").collect().map(_.toSeq)
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("signup_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("ts").as("purchase_ts"))
    val want = s.join(p, col("user_id") === col("pu")
        && col("purchase_ts") >= col("signup_ts")
        && col("purchase_ts") <= col("signup_ts") + expr("INTERVAL '30' MINUTE"))
      .select("signup_id", "purchase_id", "user_id", "signup_ts", "purchase_ts")
      .orderBy("signup_id", "purchase_id").collect().map(_.toSeq)
    assert(got.sameElements(want))
  }

  test("streaming tumbling windows equal the batch windowed aggregate") {
    val got = run("stream_tumbling_counts").collect().map(_.toSeq)
    val want = run("win_time_tumbling").collect().map(_.toSeq)
    assert(got.sameElements(want))
  }
}
