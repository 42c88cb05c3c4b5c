package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the harness test tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Schemas come from the parquet footers — the files are driver-generated and
  * homogeneous, so footer schemas are deterministic. At 100 TB the same call
  * shape holds: a multi-file partitioned parquet root instead of one file;
  * Catalyst partition-prunes and column-prunes the scan either way (the scan
  * is declarative — see `.explain` checks in the test suite).
  *
  * Mirrors the reference's source surface (SURVEY.md §2.1): the reference
  * hand-rolls partition pruning by S3 prefix (app.py:26) and file pruning by
  * key substring (app.py:27); here both fall out of path construction /
  * pathGlobFilter on a declarative read — see [[graft.operators.RefParity]]
  * for the CSV-with-glob variant.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table $name")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for — sessions set spark.sql.legacy.parquet.nanosAsLong=true and the
    * column arrives as Long nanos. DuckDB (the oracle engine) truncates the
    * same column to microseconds on read, so we floor-divide to micros and
    * expose TIMESTAMP_NTZ (naive, like the rest of the harness timestamps).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => df
    }
}
