package graft

import org.apache.spark.sql.functions._

import graft.operators.Lakehouse

/** The two properties the oracle can't see: time travel must be
  * copy-on-write at the FILE level (versions share unchanged buckets —
  * that's what makes a 100 TB version cheap), and manifest skipping must
  * actually skip (the scan touches only stat-surviving files).
  */
class LakehouseSpec extends SparkTestBase {

  test("time travel: versions share all but the rewritten bucket (CoW)") {
    run("ref_time_travel").collect() // builds + stages the table
    val root = Lakehouse.versionedTable(spark, Sf) // staged: no rebuild
    val v1 = Lakehouse.manifestPaths(root, 1).toSet
    val v2 = Lakehouse.manifestPaths(root, 2).toSet
    assert((v1 -- v2).size == 1 && (v2 -- v1).size == 1,
      s"exactly one bucket rewritten between versions: $v1 vs $v2")
    assert((v1 & v2).size == v1.size - 1,
      "every other bucket's files shared byte-for-byte between versions")
  }

  test("snapshot expiry vacuums only the expired version's exclusive files") {
    run("ref_snapshot_expire").collect() // builds + stages post-expiry state
    val root = Lakehouse.expiredTable(spark, Sf)
    assert(!new java.io.File(root, "manifest_v1.txt").exists(),
      "expired manifest removed")
    val v2 = Lakehouse.manifestPaths(root, 2)
    assert(v2.forall(p => new java.io.File(p).exists()),
      "vacuum must never touch a file a live manifest references")
    assert(!new java.io.File(new java.io.File(root, "v1"), "bucket=3")
      .exists(), "the expired version's exclusive bucket is deleted")
    assert(new java.io.File(new java.io.File(root, "v1"), "bucket=0")
      .exists(), "buckets shared with v2 survive under the v1 data dir")
    Lakehouse.expireVersion(root, 1) // idempotent: second expiry is a no-op
    assert(v2.forall(p => new java.io.File(p).exists()))
  }

  test("MERGE INTO SQL equals the hand-rolled full-outer merge, row for row") {
    assert(run("ref_merge_into_sql").collect().toSeq ==
      run("ref_upsert_merge").collect().toSeq,
      "the analyzer-derived MERGE must reproduce the declarative merge")
  }

  test("row-level SQL plans through the group-based ReplaceData rewrite") {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graftlake.spec_rls")
    spark.sql("CREATE TABLE graftlake.spec_rls (k BIGINT, s STRING)")
    spark.range(3).selectExpr("id AS k", "'a' AS s")
      .createOrReplaceTempView("spec_rls_src")
    val plan = spark.sql(
      """EXPLAIN MERGE INTO graftlake.spec_rls t USING spec_rls_src b
        |ON t.k = b.k
        |WHEN MATCHED THEN UPDATE SET s = b.s
        |WHEN NOT MATCHED THEN INSERT (k, s) VALUES (b.k, b.s)
        |""".stripMargin).head().getString(0)
    assert(plan.contains("ReplaceData") && plan.contains("MergeRows"),
      s"MERGE must go through the row-level rewrite, got:\n$plan")
  }

  test("manifest skipping prunes files before read and stays exact") {
    val (_, stats) = Lakehouse.statsManifest(spark, Sf)
    val keep = Lakehouse.survivingFiles(stats, "1995-01-01", "1995-12-31")
    assert(keep.nonEmpty && keep.size < stats.size,
      s"skipping must be observable: kept ${keep.size} of ${stats.size}")
    // the files the manifest skips really contain no qualifying rows:
    // stats-based pruning is result-transparent by the min/max invariant
    val skipped = stats.map(_._1).filterNot(keep.toSet)
    val tsOf = spark.read.parquet(skipped: _*)
    val tsType = tsOf.schema("o_orderdate").dataType
    val leaked = tsOf.filter(
      col("o_orderdate") >= lit("1995-01-01 00:00:00").cast(tsType)
        && col("o_orderdate") <= lit("1995-12-31 00:00:00").cast(tsType))
      .count()
    assert(leaked == 0, "no qualifying row may live in a skipped file")
  }
}
