package graft

import org.apache.spark.sql.functions._

/** Durable catalog metadata (VERDICT r15 task 2): a parquet-storage lake
  * table's COMMIT LOG lives as files under `<root>/_graft_log`
  * (table.json + per-file manifests + one manifest-list JSON per commit
  * + refs.json), so the in-memory registry is a cache. The spec's "JVM
  * restart" is [[graft.sources.GraftLakeCatalog.evict]]: drop the
  * registry entry, then prove the NEXT access rebuilds the table from
  * disk alone — current state, time travel (version, tag, timestamp),
  * change feed, refs with staged branch commits, schema evolution with
  * exists-defaults, deletion vectors — and that post-reopen writes
  * journal on, so a second "restart" sees them too. */
class DurableCatalogSpec extends SparkTestBase {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_wh_").toFile.getAbsolutePath

  private def useCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graftdur",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdur.warehouse", wh)
  }

  private def evict(name: String): Unit = {
    graft.sources.GraftLakeCatalog.evict("graftdur", name)
    assert(graft.sources.GraftLakeCatalog.tableFor("graftdur", name).isEmpty,
      "precondition: the registry entry must be gone before reopen")
  }

  test("a parquet table survives the registry: state, time travel, CDF, refs, schema") {
    useCatalog()
    val t = "graftdur.dur_main"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet', " +
      "'graft.mode' = 'merge-on-read')")
    // v1, v2: two appends
    spark.range(0, 10).selectExpr("id AS k", "concat('a', id) AS s")
      .coalesce(1).writeTo(t).append()
    spark.range(10, 20).selectExpr("id AS k", "concat('b', id) AS s")
      .coalesce(1).writeTo(t).append()
    // v3 (metadata commit): evolve the schema with an exists-default
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (w DOUBLE DEFAULT 2.5)")
    // v4: post-evolution append
    spark.range(20, 25).selectExpr("id AS k", "concat('c', id) AS s",
      "CAST(id AS DOUBLE) AS w").coalesce(1).writeTo(t).append()
    // v5: a merge-on-read DELETE — a deletion vector must survive too
    spark.sql(s"DELETE FROM $t WHERE k = 5")
    // refs: a tag on v2 and a branch with one staged (unpublished) commit
    spark.sql(s"CALL graftdur.system.create_tag('dur_main', 'gold', 2)")
    spark.sql(s"CALL graftdur.system.create_branch('dur_main', 'audit')")
    spark.range(100, 103).selectExpr("id AS k", "concat('z', id) AS s",
      "0.0 AS w").coalesce(1)
      .writeTo(t).option("graft.branch", "audit").append()

    def state() = spark.table(t).orderBy("k").collect().toSeq
    def asOf2() = spark.sql(s"SELECT * FROM $t VERSION AS OF 2")
      .orderBy("k").collect().toSeq
    def feed() = spark.read.option("graft.changes.from", "0")
      .table(s"$t.changes")
      .orderBy("_commit_version", "_change_type", "k").collect().toSeq
    val (s0, v0, f0) = (state(), asOf2(), feed())
    assert(s0.length == 24 && v0.length == 20)
    val table0 = graft.sources.GraftLakeCatalog
      .tableFor("graftdur", "dur_main").get
    val (curV, earliestV) = (table0.currentVersion, table0.earliestVersion)

    evict("dur_main")

    // every read below is served by a table REBUILT from _graft_log
    assert(state() == s0, "current state must survive the registry")
    val table1 = graft.sources.GraftLakeCatalog
      .tableFor("graftdur", "dur_main").get
    assert(!(table1 eq table0), "reopen must build a fresh instance")
    assert(table1.currentVersion == curV &&
      table1.earliestVersion == earliestV)
    assert(asOf2() == v0, "VERSION AS OF must survive")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'gold'")
      .orderBy("k").collect().toSeq == v0, "tag reads must survive")
    assert(feed() == f0, "the change feed must survive")
    // deletion vector: k=5 stays dead
    assert(!state().exists(_.getLong(0) == 5L))
    // exists-default: pre-ADD rows serve 2.5 after reopen
    assert(spark.table(t).where("k = 3").collect().head.getDouble(2) == 2.5)
    // refs metadata table: tag + branch with 1 staged commit
    val refs = spark.table(s"$t.refs").orderBy("name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(refs.toSeq == Seq(("audit", "branch", curV, 1),
      ("gold", "tag", 2, 0)), refs.toSeq.toString)
    // the staged branch commit is readable and publishable post-reopen
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'audit'")
      .count() == 27)
    spark.sql(s"CALL graftdur.system.fast_forward('dur_main', 'audit')")
    assert(spark.table(t).count() == 27)

    // writes journal on after reopen: a second "restart" sees them
    spark.range(200, 202).selectExpr("id AS k", "concat('y', id) AS s",
      "1.0 AS w").coalesce(1).writeTo(t).append()
    val s1 = state()
    evict("dur_main")
    assert(state() == s1, "post-reopen commits must survive a second restart")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("expire prunes the on-disk log; the floor survives reopen") {
    useCatalog()
    val t = "graftdur.dur_expire"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    for (b <- 0 until 4)
      spark.range(b * 10L, (b + 1) * 10L).selectExpr("id AS k")
        .coalesce(1).writeTo(t).append()
    // CoW UPDATE makes an orphanable file, then expire everything but 2
    spark.sql(s"UPDATE $t SET k = k + 1000 WHERE k = 35")
    spark.sql(s"CALL graftdur.system.expire_versions('dur_expire', 2)")
    val root = new java.io.File(wh, "dur_expire")
    val logDir = new java.io.File(root, "_graft_log")
    val commitFiles = logDir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.json")).sorted
    assert(commitFiles.toSeq == Seq("v4.json", "v5.json"),
      s"expired manifest lists must be deleted: ${commitFiles.toSeq}")
    evict("dur_expire")
    val table = { spark.table(t).count(); graft.sources.GraftLakeCatalog
      .tableFor("graftdur", "dur_expire").get }
    assert(table.earliestVersion == 4 && table.currentVersion == 5)
    assert(spark.table(t).count() == 40 &&
      spark.table(t).where("k = 1035").count() == 1)
    // reads below the floor still fail loudly after reopen
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect())
    assert(e.getMessage.contains("out of range"), e.getMessage)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CREATE over an existing durable root fails; DROP deletes it for good") {
    useCatalog()
    val t = "graftdur.dur_guard"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    spark.range(0, 5).selectExpr("id AS k").writeTo(t).append()
    evict("dur_guard")
    // the root still holds a table — a blind CREATE must not shadow it
    val e = intercept[Exception](spark.sql(s"CREATE TABLE $t (x BIGINT) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')"))
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    // the durable table is still intact and reopenable
    assert(spark.table(t).count() == 5)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    assert(!new java.io.File(wh, "dur_guard").exists(),
      "DROP must delete the durable root")
    // ... and now the name is genuinely free
    intercept[Exception](spark.table(t).collect())
  }

  test("columnar decode works on a reopened table (manifest labels round-trip)") {
    useCatalog()
    val t = "graftdur.dur_col"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    spark.range(0, 100).selectExpr("id AS k", "concat('v', id) AS s")
      .coalesce(1).writeTo(t).append()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN s TO label")
    evict("dur_col")
    val df = spark.table(t)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "reopened parquet files must still decode columnar")
    assert(df.where("label = 'v42'").collect().head.getLong(0) == 42L)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
