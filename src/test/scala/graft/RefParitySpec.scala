package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Reference-parity semantics (SURVEY.md §2) + plan-shape assertions: the
  * point at scale is not just the right rows but the right physical plan —
  * pushed filters, pruned columns, broadcast joins.
  */
class RefParitySpec extends SparkTestBase {

  test("ref_star_enrich returns enriched rows with the contract schema") {
    val df = run("ref_star_enrich")
    assert(df.columns.toSeq == Seq("ORDER_KEY", "LINE_NUMBER", "QUANTITY",
      "EXTENDED_PRICE", "CUSTOMER_ID", "MKT_SEGMENT", "SNAPSHOT_DATE"))
    assert(df.count() > 0)
  }

  test("star enrich plan: filter pushed to scan, both joins broadcast") {
    val plan = run("ref_star_enrich").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "scan should push the filter")
    assert(plan.contains("StringContains"),
      "contains predicate should reach the parquet reader")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "both dim joins must be broadcast, not shuffled")
  }

  test("star enrich plan: column pruning reaches the fact scan") {
    val plan = run("ref_star_enrich").queryExecution.executedPlan.toString
    // lineitem has 11 columns; the query needs 5 — the scan must not read
    // the rest (l_shipdate is the canonical pruned column)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema"))
    assert(readSchema.exists(!_.contains("l_shipdate")),
      s"l_shipdate should be pruned from the scan: $readSchema")
  }

  test("ref_csv_ingest prunes stale partitions and decoy categories") {
    val rows = run("ref_csv_ingest").collect()
    assert(rows.length == 25)
    assert(!rows.exists(_.getString(1).startsWith("DECOY")),
      "S1/S2 pruning must exclude the stale partition and decoy dataset")
  }

  test("ref_union_by_name aligns reordered columns and pads missing") {
    val df = run("ref_union_by_name")
    val nullQty = df.filter(col("l_quantity").isNull).count()
    val total = df.count()
    assert(nullQty > 0 && nullQty < total,
      "missing column must be padded with NULL in exactly one branch")
  }

  test("ref_clean_strict_cast round-trips the money string to the key") {
    val bad = run("ref_clean_strict_cast")
      .filter(col("parsed_key") =!= col("c_custkey")).count()
    assert(bad == 0, "digits of c_name must strict-cast back to the key")
  }

  test("F3 semantics: ANSI cast raises on malformed input, like the reference") {
    // reference behavior: pandas astype(int) raises (SURVEY.md §2.3 F3)
    val e = intercept[Exception] {
      spark.sql("SELECT CAST('not_a_number' AS INT) AS x").collect()
    }
    assert(e.isInstanceOf[SparkException]
      || e.getClass.getName.contains("NumberFormatException")
      || e.getMessage.contains("CAST_INVALID_INPUT"))
  }

  test("J2 semantics: empty dim produces empty output (silent no-op load)") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val emptyDim = Seq.empty[(Long, Long)].toDF("k", "id")
    assert(fact.join(emptyDim, Seq("k"), "inner").count() == 0,
      "app.py:156-164: missing dim_date row silently empties the load")
  }

  test("ref_csv_infer sniffs the same shape the explicit contract pins") {
    val inferred = run("ref_csv_infer")
    assert(inferred.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("n_nationkey", "integer"), ("n_name", "string"),
        ("n_regionkey", "integer")),
      s"inference must land on int/string/int: ${inferred.schema}")
    val explicitRows = run("ref_csv_ingest").collect().toSeq
    assert(inferred.collect().toSeq == explicitRows,
      "inferred and explicit reads must agree row-for-row")
  }

  test("ref_try_cast_quarantine routes exactly the malformed rows") {
    val df = run("ref_try_cast_quarantine").cache()
    val mal = df.filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 0)
    assert(mal.filter(col("status") =!= "quarantined").count() == 0,
      "every planted malformed row must be quarantined")
    assert(mal.filter(col("amount").isNotNull).count() == 0)
    val good = df.filter(col("c_custkey") % 7 =!= 0 && col("c_custkey") % 11 =!= 0)
    assert(good.filter(col("status") =!= "clean").count() == 0,
      "well-formed rows must parse clean")
    assert(good.filter(col("amount").isNull).count() == 0)
    df.unpersist()
  }

  test("ref_jdbc_dim round-trips the dim losslessly through the warehouse") {
    val df = run("ref_jdbc_dim")
    val expected = spark.read.parquet(s"$Sf/nation.parquet")
      .join(spark.read.parquet(s"$Sf/region.parquet"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")
    assert(df.collect().toSeq == expected.collect().toSeq,
      "JDBC write→read→join must match the parquet-only derivation")
    // the read-back must be the partitioned (parallel-extract) scan shape
    assert(df.rdd.getNumPartitions >= 1)
  }

  test("ref_text_log_parse recovers the table aggregate from staged lines") {
    val df = run("ref_text_log_parse")
    val direct = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderkey")).as("min_key"))
      .orderBy("status")
    assert(df.collect().toSeq == direct.collect().toSeq,
      "text roundtrip + regex parse must be lossless")
  }

  test("upsert-merge: batch rows win, previous-only rows survive, keys unique") {
    val df = run("ref_upsert_merge").cache()
    val n = df.count()
    assert(df.select("o_orderkey").distinct().count() == n, "keys unique")
    // every even key (the batch) must carry the revised status
    assert(df.filter(col("o_orderkey") % 2 === 0 && col("o_orderstatus") =!= "U")
      .count() == 0, "batch rows must win the merge")
    // odd keys not divisible by 3 come from previous state, unrevised
    assert(df.filter(col("o_orderkey") % 2 =!= 0 && col("o_orderstatus") === "U")
      .count() == 0, "previous-only rows must survive unrevised")
    // re-running the merge over its own output with the same batch is a
    // no-op on keys: idempotency
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    val expectedKeys = orders
      .filter(col("o_orderkey") % 3 =!= 0 || col("o_orderkey") % 2 === 0)
      .count()
    assert(n == expectedKeys)
    df.unpersist()
  }

  test("replay idempotence: second delivery of the same batch is a no-op") {
    // the replay queries APPLY their batch twice; row-for-row equality
    // with the once-applied queries is the exactly-once contract
    assert(run("ref_upsert_replay").collect().toSeq ==
      run("ref_upsert_merge").collect().toSeq,
      "merge(merge(prev, batch), batch) must equal merge(prev, batch)")
    assert(run("ref_scd2_replay").collect().toSeq ==
      run("ref_scd2_apply").collect().toSeq,
      "SCD-2 change detection must make batch re-delivery a no-op")
  }

  test("dynamic partition overwrite leaves untouched partitions' FILES alone") {
    // the oracle proves VALUE equality; this proves the mechanism — the
    // corrective reload must swap only the targeted partition's files,
    // not rewrite the table (at 100 TB that's the whole point)
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_dyn_proof").toFile
    val base = spark.read.parquet(s"$Sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice",
        "o_orderstatus")
    base.write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(root.getAbsolutePath)
    def files(status: String): Map[String, Long] =
      new java.io.File(root, s"o_orderstatus=$status").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val oBefore = files("O")
    val fBefore = files("F")
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try base.filter(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") + 1)
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(root.getAbsolutePath)
    finally spark.conf.unset(key)
    assert(files("O") == oBefore,
      "untouched partition must keep the same files, byte-dates and all")
    assert(files("F").keySet.intersect(fBefore.keySet).isEmpty,
      "targeted partition must be fully replaced with new files")
    // static mode would have deleted O entirely; prove it's still readable
    assert(spark.read.parquet(root.getAbsolutePath)
      .filter(col("o_orderstatus") === "O").count() ==
      base.filter(col("o_orderstatus") === "O").count())
  }

  test("small-file compaction hits the byte-sized file-count target") {
    val (out, nOut) = graft.operators.RefParity.compactedOrdersDir(spark, Sf)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == nOut,
      s"expected $nOut compacted files, found ${files.length}")
    assert(nOut < 64, s"compaction must reduce the 64-file fixture, got $nOut")
    // lossless: compacted row count equals the source
    val n = spark.read.parquet(out).count()
    val want = spark.read.parquet(s"$Sf/orders.parquet").count()
    assert(n == want)
  }
}
