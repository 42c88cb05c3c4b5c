package graft.operators

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Query
import graft.functions.Exact._
import graft.sources.Tables

/** Lakehouse table semantics over RAW parquet + a manifest — the two
  * capabilities a table format adds that plain directory scans cannot
  * give, re-derived from first principles so the engine works where no
  * Delta/Iceberg jar exists (this sandbox; see VERDICT "missing" #1):
  *
  *  - TIME TRAVEL ([[timeTravel]]): a version = a MANIFEST (the list of
  *    data files), never a data copy. A change batch COPY-ON-WRITES only
  *    the buckets it touches; every other file is shared between
  *    versions byte-for-byte. Reading AS OF v = reading v's file list.
  *  - DATA SKIPPING ([[manifestSkipping]]): the manifest carries per-file
  *    min/max column stats; a range predicate prunes FILES driver-side
  *    before any footer is opened — at 100 TB the difference between
  *    "list + read 2 files" and "open 10k footers to learn 9998 were
  *    never candidates".
  *
  * The manifest here is a text file of paths (+ stats), i.e. exactly the
  * metadata layer of every table format, minimally expressed. Reference
  * anchor: the reference's warehouse APPEND (app.py:195-197) has no
  * versioning at all — a bad load is unrecoverable; these give the
  * rollback/as-of story its modern replacement has.
  */
object Lakehouse {

  private val Buckets = 8

  /** Build the two-version table once per (sfDir) generation: v1 = orders
    * bucketed by hash(o_orderkey) into [[Buckets]] dirs; v2 = the change
    * batch (status 'T' for o_orderkey ≡ 3 mod 16, all of which hash into
    * ONE bucket) copy-on-written: that bucket is rewritten under v2/, all
    * other buckets are SHARED with v1 (same files listed in both
    * manifests). Returns the table root. */
  private[graft] def versionedTable(spark: SparkSession, sfDir: String): File =
    Staging.stagedDir("graft_lake_tt", sfDir, s"cow-$Buckets-v1") { root =>
      buildTwoVersions(spark, sfDir, root)
    }

  /** v1 = orders bucketed by hash(o_orderkey); v2 = the change batch
    * (keys ≡ 3 mod 16 → status 'T', all hashing into bucket 3)
    * copy-on-written: exactly that bucket rewritten under v2/, every
    * other file shared with v1 — both manifests written. */
  private def buildTwoVersions(
      spark: SparkSession, sfDir: String, root: File): Unit = {
    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .withColumn("bucket", pmod(col("o_orderkey"), lit(Buckets.toLong)))
    orders.write.partitionBy("bucket").mode("overwrite")
      .parquet(new File(root, "v1").getAbsolutePath)
    def bucketDirs(version: String): Map[Long, String] =
      new File(root, version).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(f => f.getName.stripPrefix("bucket=").toLong ->
          f.getAbsolutePath)
        .toMap
    val v1 = bucketDirs("v1")
    val hot = 3L
    spark.read.parquet(v1(hot))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 16 === 3, lit("T"))
          .otherwise(col("o_orderstatus")))
      .withColumn("bucket", lit(hot))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(new File(root, "v2").getAbsolutePath)
    val v2 = v1 ++ bucketDirs("v2")
    def writeManifest(name: String, dirs: Map[Long, String]): Unit =
      Files.writeString(new File(root, name).toPath,
        dirs.toSeq.sortBy(_._1).map(_._2).mkString("", "\n", "\n"))
    writeManifest("manifest_v1.txt", v1)
    writeManifest("manifest_v2.txt", v2)
  }

  private[graft] def manifestPaths(root: File, version: Int): Seq[String] =
    Files.readAllLines(
      new File(root, s"manifest_v$version.txt").toPath).asScala.toSeq

  /** Read the versioned table AS OF v1 and AS OF v2 — each read is
    * exactly its manifest's file list (no directory listing, no
    * format-level versioning) — and aggregate both. The v2 change is
    * visible only in version 2, and v1 remains readable AFTER v2 exists:
    * the rollback contract. Copy-on-write is spec-asserted: the two
    * manifests share all but one bucket's files. */
  def timeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val root = versionedTable(spark, sfDir)
    def asOf(v: Int): DataFrame =
      spark.read.parquet(manifestPaths(root, v): _*)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"))
        .withColumn("version", lit(v))
    asOf(1).unionByName(asOf(2))
      .select("version", "o_orderstatus", "n", "sum_price")
      .orderBy("version", "o_orderstatus")
  }

  private val timeTravelOracle =
    """SELECT 1 AS version, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2
      |UNION ALL
      |SELECT 2 AS version, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT CASE WHEN o_orderkey % 16 = 3 THEN 'T'
      |             ELSE o_orderstatus END AS o_orderstatus, o_totalprice
      |      FROM orders)
      |GROUP BY 1, 2
      |ORDER BY version, o_orderstatus""".stripMargin

  /** Expire `version`'s manifest from a versioned table root: delete the
    * files it references that no LIVE manifest still references (vacuum —
    * an expired version's exclusive files are dead storage), then remove
    * the manifest itself. Deleting only the reference-counted orphans is
    * the entire safety story of every table format's VACUUM: a file
    * shared with a live version must survive. */
  private[graft] def expireVersion(root: File, version: Int): Unit = {
    val manifest = new File(root, s"manifest_v$version.txt")
    if (!manifest.exists()) return // idempotent: already expired
    val expired = manifestPaths(root, version).toSet
    val live = root.listFiles()
      .filter(f => f.getName.startsWith("manifest_v")
        && f.getName != manifest.getName)
      .flatMap(f => Files.readAllLines(f.toPath).asScala)
      .toSet
    (expired -- live).foreach { dir =>
      val d = new File(dir)
      Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      d.delete()
    }
    manifest.delete()
  }

  /** The versioned table with v1 EXPIRED (vacuumed) — staged post-expiry,
    * so the staged generation is immutable as the staging contract
    * requires. Built separately from [[versionedTable]]: expiry is
    * destructive and must not eat the time-travel query's v1. */
  private[graft] def expiredTable(spark: SparkSession, sfDir: String): File =
    Staging.stagedDir("graft_lake_expire", sfDir, s"cow-$Buckets-expire-v1") {
      root =>
        buildTwoVersions(spark, sfDir, root)
        expireVersion(root, 1)
    }

  /** Snapshot expiry (VACUUM): after v1 is expired, its exclusively-owned
    * file (the pre-rewrite hot bucket) is deleted, every file shared with
    * v2 survives, and AS OF v2 still answers exactly — proven by the v2
    * oracle. The spec additionally audits the file inventory (orphan
    * gone, shared files intact, expired manifest removed). */
  def snapshotExpire(spark: SparkSession, sfDir: String): DataFrame = {
    val root = expiredTable(spark, sfDir)
    spark.read.parquet(manifestPaths(root, 2): _*)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  private val snapshotExpireOracle =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT CASE WHEN o_orderkey % 16 = 3 THEN 'T'
      |             ELSE o_orderstatus END AS o_orderstatus, o_totalprice
      |      FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  private val SkipFiles = 16

  /** Stage orders as date-clustered files (range partition by
    * o_orderdate, the natural arrival clustering) and record per-file
    * min/max(o_orderdate) stats in a manifest. Returns (root, stats). */
  private[graft] def statsManifest(
      spark: SparkSession, sfDir: String): (File, Seq[(String, String, String)]) = {
    val root = Staging.stagedDir("graft_lake_skip", sfDir,
      s"dateclustered-$SkipFiles") { d =>
      Tables(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .repartitionByRange(SkipFiles, col("o_orderdate"), col("o_orderkey"))
        .write.mode("overwrite").parquet(new File(d, "data").getAbsolutePath)
      // per-file stats from one scan over the written files — what a
      // table format collects AT WRITE time from parquet footers
      val stats = spark.read
        .parquet(new File(d, "data").getAbsolutePath)
        .groupBy(col("_metadata.file_path").as("path"))
        .agg(date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("lo"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("hi"))
        .collect()
        .map(r => s"${r.getString(0)}\t${r.getString(1)}\t${r.getString(2)}")
        .sorted
      Files.writeString(new File(d, "stats_manifest.tsv").toPath,
        stats.mkString("", "\n", "\n"))
    }
    val stats = Files.readAllLines(
      new File(root, "stats_manifest.tsv").toPath).asScala.toSeq
      .map { line =>
        val Array(p, lo, hi) = line.split("\t"); (p, lo, hi)
      }
    (root, stats)
  }

  /** The file set a [lo, hi] date-range predicate cannot skip. */
  private[graft] def survivingFiles(
      stats: Seq[(String, String, String)],
      lo: String, hi: String): Seq[String] =
    stats.collect { case (p, flo, fhi) if flo <= hi && fhi >= lo => p }

  // one calendar year ≈ 1/7 of the 1992-1998 corpus → ~2-3 of 16 files
  private val SkipLo = "1995-01-01"
  private val SkipHi = "1995-12-31"

  /** Manifest min/max data skipping: the date-range predicate prunes the
    * FILE LIST driver-side (manifest compare — no footer is ever opened
    * for a skipped file), then only surviving files are read, with the
    * predicate still applied for exactness inside the boundary files.
    * The oracle is the plain WHERE over the whole table: skipping must be
    * result-transparent. PlanSpec asserts the read touches only the
    * surviving files (lineage via `_metadata.file_path`). */
  def manifestSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, stats) = statsManifest(spark, sfDir)
    val keep = survivingFiles(stats, SkipLo, SkipHi)
    require(keep.nonEmpty && keep.size < stats.size,
      s"fixture must make skipping observable: ${keep.size}/${stats.size}")
    val df = spark.read.parquet(keep: _*)
    val tsType = df.schema("o_orderdate").dataType
    df.filter(col("o_orderdate") >= lit(s"$SkipLo 00:00:00").cast(tsType)
        && col("o_orderdate") <= lit(s"$SkipHi 00:00:00").cast(tsType))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  private val manifestSkippingOracle =
    s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$SkipLo 00:00:00'
       |  AND o_orderdate <= TIMESTAMP '$SkipHi 00:00:00'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---- row-level SQL over the DSv2 catalog table ---------------------------

  /** TBLPROPERTIES clause for lake tables: base properties plus the
    * storage mode override (`-Dgraft.lake.storage=parquet` routes every
    * registry fixture through REAL parquet file groups — the spec uses
    * it to prove both storage modes produce the identical relation). */
  private[graft] def tblProps(extra: (String, String)*): String = {
    // the global A/B override wins over a fixture's explicit storage
    // choice (and must not duplicate the key — Spark rejects duplicate
    // TBLPROPERTIES entries)
    val over = sys.props.get("graft.lake.storage").map("graft.storage" -> _)
    val all = extra.filterNot(kv => over.exists(_._1 == kv._1)) ++ over
    if (all.isEmpty) ""
    else all.map { case (k, v) => s"'$k' = '$v'" }
      .mkString(" TBLPROPERTIES (", ", ", ")")
  }

  /** Storage prop for the fixtures the r21 A/B measured FASTER on real
    * parquet file groups than on memory-backed rows: a memory-backed
    * scan ships every row INSIDE each task closure (5-11 MB serialized
    * task, driver-serialized per task — guide §5 "the driver should do
    * almost no data work"), while parquet-backed partitions ship paths
    * and decode columnar bytes executor-side. Interleaved A/B at sf0.1
    * (dev/r21/ab_lake_{mem,pq}{1,2}.json, min-of-2): the 14 flipped
    * queries total 30.6 → 20.1 s. Fixtures that LOST (partition fan-out
    * writes many tiny files: join_spj_storage, ref_partition_transform,
    * ref_cluster_files) and the metadata-table fixtures stay
    * memory-backed. */
  private val pqStore = "graft.storage" -> "parquet"

  /** Materialize `out` off the lake table (localCheckpoint pins the
    * computed rows in the block manager), then DROP the query's tables:
    * a registry query must not leave its table + full commit history on
    * the driver heap for the rest of a 240-query bench run (VERDICT r11
    * task 2). Parquet-backed storage is deleted by the DROP too. */
  private[graft] def releasing(spark: SparkSession, out: DataFrame,
      tables: String*): DataFrame = {
    val pinned = out.localCheckpoint(true)
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    pinned
  }

  /** Create (or recreate) the in-memory row-level table and load it with
    * the `previous` upsert-fixture slice of orders. Returns the qualified
    * name. One catalog instance per session ⇒ per-session isolation. */
  private def freshLakeTable(
      spark: SparkSession, sfDir: String, suffix: String): String = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = s"graftlake.orders_$suffix"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps(pqStore))
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    t
  }

  /** Real `MERGE INTO` SQL (VERDICT round-5 missing #1): the statement is
    * planned by Spark's RewriteMergeIntoTable into a group-based
    * ReplaceData over [[graft.sources.GraftLakeTable]] — matched rows
    * updated, unmatched source rows inserted, untouched rows carried —
    * and the result must equal the hand-rolled full-outer merge
    * (`ref_upsert_merge` shares the oracle). Same fixture slices, so the
    * two paths are directly comparable.
    *
    * Granularity is FILE-GROUP, not whole-table (round-10): the table's
    * committed state is a set of files, the operation's scan is
    * runtime-group-filtered on the `_file` metadata column, and the
    * ReplaceData commit rewrites only the groups holding matched rows —
    * LakehouseSpec pins carried-by-identity for untouched groups. This
    * bench fixture's merge batch (every even key) matches rows in every
    * group, so it measures the worst case; the scale win is the
    * single-key statement that now touches one file of 10k. */
  def mergeIntoSql(spark: SparkSession, sfDir: String): DataFrame = {
    val t = freshLakeTable(spark, sfDir, "merge")
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_merge_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_merge_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |""".stripMargin)
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  /** The MERGE-ON-READ twin of [[mergeIntoSql]] (the read-side complement
    * of file-group copy-on-write, VERDICT r9's blessed extension): the
    * same MERGE statement against a table created with
    * `graft.mode = merge-on-read`, planned through Spark's DELTA-based
    * row-level rewrite (`SupportsDelta` → WriteDelta) instead of
    * ReplaceData. Matched rows become DELETION-VECTOR entries keyed by
    * (_file, _pos) — Iceberg's position-delete shape — and updated/new
    * rows land in new files; NO committed file is rewritten, trading the
    * CoW path's write amplification for a DV filter at read time. Shares
    * the [[mergeIntoSqlOracle]] contract: both rewrites must produce the
    * identical relation. LakehouseSpec pins the no-rewrite property
    * (every pre-merge file id survives) the oracle can't see. */
  def mergeOnReadSql(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_mor"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps("graft.mode" -> "merge-on-read", pqStore))
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_mor_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_mor_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |""".stripMargin)
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  /** SYNC-STYLE MERGE (VERDICT r15 task 3): the full Spark 4 MERGE
    * grammar including `WHEN NOT MATCHED BY SOURCE` — the clauses that
    * make a table MIRROR a batch: matched rows update, new source rows
    * insert, and target rows ABSENT from the batch are conditionally
    * deleted ('F' rows) or demoted (status → 'S'). Planned by Spark's
    * RewriteMergeIntoTable over the same row-level operation surface as
    * the two-clause merge; the BY SOURCE clauses flip the rewrite's
    * join to keep UNMATCHED TARGET rows as candidates, so every file
    * group participates (no runtime group filter on source keys — the
    * correct plan, since absence from the source is precisely what
    * can't be known per group). At 100 TB the statement is a full
    * shuffle join by construction; the scale lever is partition-scoped
    * sources (merge a day at a time), not plan tricks. CoW variant:
    * groups holding any touched row rewrite. */
  def mergeSyncSql(spark: SparkSession, sfDir: String): DataFrame = {
    val t = freshLakeTable(spark, sfDir, "sync")
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_sync_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_sync_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'S'
         |""".stripMargin)
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  /** Merge-on-read twin of [[mergeSyncSql]]: same statement, same
    * oracle, planned through SupportsDelta — BY-SOURCE deletes and
    * demotions land as deletion-vector positions + new files, zero
    * committed files rewritten (LakehouseSpec pins that plus replay
    * idempotence, which the oracle can't see). */
  def mergeSyncMor(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_sync_mor"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps("graft.mode" -> "merge-on-read", pqStore))
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_sync_mor_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_sync_mor_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'S'
         |""".stripMargin)
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  /** The sync-merge relation derived set-algebraically: matched rows
    * take the batch's values, batch-only rows insert, target-only rows
    * drop when 'F' else demote to 'S'. Shared by both storage modes. */
  private val mergeSyncOracle =
    """WITH target AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT t.o_orderkey, b.o_orderstatus, b.o_totalprice
      |FROM target t JOIN batch b ON t.o_orderkey = b.o_orderkey
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus, o_totalprice FROM batch
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM target)
      |UNION ALL
      |SELECT o_orderkey, 'S' AS o_orderstatus, o_totalprice FROM target
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)
      |  AND o_orderstatus <> 'F'
      |ORDER BY o_orderkey""".stripMargin

  /** Real `UPDATE` and `DELETE FROM` SQL against the same row-level
    * table: both statements rewrite to ReplaceData (no SupportsDelete
    * filter shortcut is implemented, deliberately — the row-level path is
    * the one under test), each replacing only its runtime-filtered file
    * groups. Output aggregates the surviving state. */
  def updateDeleteSql(spark: SparkSession, sfDir: String): DataFrame = {
    val t = freshLakeTable(spark, sfDir, "upddel")
    spark.sql(
      s"UPDATE $t SET o_orderstatus = 'X' WHERE o_orderkey % 10 = 1")
    spark.sql(
      s"DELETE FROM $t WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 2")
    releasing(spark, spark.table(t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("o_orderstatus"), t)
  }

  private val updateDeleteSqlOracle =
    """WITH prev AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 = 1 THEN 'X' ELSE o_orderstatus END
      |      AS o_orderstatus,
      |    o_totalprice
      |  FROM orders WHERE o_orderkey % 3 <> 0)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM prev
      |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 2)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  private val mergeIntoSqlOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT coalesce(b.o_orderkey, p.o_orderkey) AS o_orderkey,
      |       coalesce(b.o_orderstatus, p.o_orderstatus) AS o_orderstatus,
      |       coalesce(b.o_totalprice, p.o_totalprice) AS o_totalprice
      |FROM prev p FULL OUTER JOIN batch b ON p.o_orderkey = b.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // ---- storage-partitioned join (SPARK-37375) -----------------------------

  /** Storage-partitioned join: two DSv2 tables `PARTITIONED BY (bucket)`
    * on the same key join with ZERO exchange on either side — the scans
    * report [[org.apache.spark.sql.connector.read.partitioning
    * .KeyGroupedPartitioning]] (one input split per partition value, each
    * tagged `HasPartitionKey`) and Spark aligns the two key sets instead
    * of shuffling. This is the lake-native generalization of
    * `join_bucketed`'s Hive bucketing: Iceberg/Delta ship exactly this
    * metadata from their manifests, and at 100 TB it removes BOTH
    * fact-side exchanges from the hot co-partitioned join — the single
    * biggest network term in a star join. The follow-on `groupBy(bucket)`
    * also rides the reported partitioning (no re-shuffle before the agg);
    * the only exchange in the whole plan is the final 16-row orderBy.
    * PlanSpec pins all of that.
    *
    * Determinism: per-customer totals go through the DECIMAL route, the
    * 16-row output is totally ordered, and partition alignment is by KEY
    * VALUE (Spark sorts both sides' grouped values), so bucket count or
    * row order cannot change results.
    */
  def storagePartitionedJoin(spark: SparkSession, sfDir: String): DataFrame =
    releasing(spark, spjPlanned(spark, sfDir),
      "graftlake.spj_orders", "graftlake.spj_cust")

  /** Build the SPJ fixture tables and memoize the joined plan under the
    * pinned confs; the registry query materializes and RELEASES the
    * tables, while PlanSpec asserts on this RAW plan (the released
    * result is an ExistingRDD scan with no join left to inspect).
    * Callers own the two `spj_*` tables until they drop them. */
  private[graft] def spjPlanned(
      spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val tOrd = "graftlake.spj_orders"
    val tCust = "graftlake.spj_cust"
    spark.sql(s"DROP TABLE IF EXISTS $tOrd")
    spark.sql(s"DROP TABLE IF EXISTS $tCust")
    spark.sql(s"CREATE TABLE $tOrd (bucket BIGINT, o_custkey BIGINT, " +
      "total DOUBLE) PARTITIONED BY (bucket)" + tblProps())
    spark.sql(s"CREATE TABLE $tCust (bucket BIGINT, c_custkey BIGINT, " +
      "c_mktsegment STRING) PARTITIONED BY (bucket)" + tblProps())
    Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total"))
      .select(pmod(col("o_custkey"), lit(16L)).as("bucket"),
        col("o_custkey"), col("total"))
      .writeTo(tOrd).append()
    Tables(spark, sfDir, "customer")
      .select(pmod(col("c_custkey"), lit(16L)).as("bucket"),
        col("c_custkey"), col("c_mktsegment"))
      .writeTo(tCust).append()
    val pinned = Map(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // join keys are (bucket, custkey), a SUPERSET of the partition key
      // (bucket) — same-partition-value rows can only ever meet
      // themselves, so co-partition on the subset is sufficient; the
      // default-true strict check would reject it and shuffle anyway
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = pinned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = spark.table(tOrd)
      val c = spark.table(tCust)
      val out = o.join(c,
          o("bucket") === c("bucket") && col("o_custkey") === col("c_custkey"))
        .groupBy(o("bucket"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("total")).as("revenue"))
        .orderBy("bucket")
      out.queryExecution.executedPlan // memoize the plan under the pin
      out
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** `INSERT INTO ... BY NAME` — schema-evolution-safe loading: columns
    * bind by NAME, not position, so a producer that reorders its SELECT
    * (the classic silent-corruption bug of positional INSERT: status
    * swapped into the price column and nobody notices until month-end)
    * still lands every value in the right column. The fixture writes the
    * batch with columns deliberately REVERSED from the table definition;
    * positional semantics would cast-fail or transpose, BY NAME is
    * byte-identical to a correctly-ordered insert — which is what the
    * oracle checks.
    */
  def insertByName(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.byname_orders"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps())
    Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 7 === 0)
      // reversed column order relative to the table definition
      .select(col("o_totalprice"), col("o_orderstatus"), col("o_orderkey"))
      .createOrReplaceTempView("graft_byname_batch")
    spark.sql(s"INSERT INTO $t BY NAME SELECT * FROM graft_byname_batch")
    releasing(spark, spark.table(t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_price"))
      .orderBy("o_orderstatus"), t)
  }

  private val insertByNameOracle =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey % 7 = 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Row-level UPDATE + DELETE on a `PARTITIONED BY` table — the
    * combination ADVICE r10 flagged as a capability regression (the
    * key-grouped scan rejects `_file`). The scan now falls back to
    * FILE-GRAINED partitions for the operation (and the group-filter
    * subquery), so the statements stay group-granular while regular
    * reads of the same table keep the KeyGroupedPartitioning report the
    * storage-partitioned join rides. Same statement fixtures as
    * [[updateDeleteSql]]; output adds the partition column so the oracle
    * also proves partition values survived the rewrite. */
  def updatePartitionedSql(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_part_upd"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_bucket BIGINT, o_orderkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE) PARTITIONED BY (o_bucket)" + tblProps(pqStore))
    Tables(spark, sfDir, "orders")
      .select(pmod(col("o_orderkey"), lit(8L)).as("o_bucket"),
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    spark.sql(
      s"UPDATE $t SET o_orderstatus = 'X' WHERE o_orderkey % 10 = 1")
    spark.sql(
      s"DELETE FROM $t WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 2")
    releasing(spark, spark.table(t)
      .groupBy(col("o_bucket"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("o_bucket", "o_orderstatus"), t)
  }

  private val updatePartitionedSqlOracle =
    """WITH prev AS (
      |  SELECT o_orderkey % 8 AS o_bucket, o_orderkey,
      |    CASE WHEN o_orderkey % 10 = 1 THEN 'X' ELSE o_orderstatus END
      |      AS o_orderstatus,
      |    o_totalprice
      |  FROM orders WHERE o_orderkey % 3 <> 0)
      |SELECT o_bucket, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM prev
      |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 2)
      |GROUP BY o_bucket, o_orderstatus
      |ORDER BY o_bucket, o_orderstatus""".stripMargin

  /** CHANGE FEED (Delta CDF / Iceberg changelog, VERDICT r10's natural
    * next surface): after the merge-on-read MERGE, read the row-level
    * changes the commit produced via the `graft.changes.*` read options —
    * every matched row surfaces as a DELETE carrying its pre-image and
    * every written row as an INSERT, straight from the commit history's
    * file/DV diff. The scan reads only files the commit range TOUCHED
    * (never the table), which is what lets a 100 TB downstream consumer
    * sync incrementally instead of re-scanning. The oracle derives the
    * same feed relationally from the merge fixture's set algebra. */
  def changeFeed(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_cdf"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps("graft.mode" -> "merge-on-read", pqStore))
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    val table = graft.sources.GraftLakeCatalog
      .tableFor("graftlake", "orders_cdf").get
    val loadedV = table.currentVersion // the version the consumer last saw
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_cdf_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_cdf_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |""".stripMargin)
    releasing(spark, spark.read
      .option("graft.changes.from", loadedV.toString)
      .option("graft.changes.to", table.currentVersion.toString)
      .table(t)
      .select(col("_change_type").as("change_type"),
        (col("_commit_version") - loadedV).as("commit_step"),
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy("o_orderkey", "change_type"), t)
  }

  /** Incremental downstream sync FROM the change feed — the consumer
    * half of CDC, and the reason a change feed exists: a replica table
    * loaded at version v1 is brought to v2 by applying ONLY the feed
    * (delete pre-images out by (key, pre-image), inserts in), never by
    * re-reading the upstream table. The oracle is the full upstream
    * state after the merge — if the replica hash-matches it, the feed
    * carried exactly the information the sync needed. At 100 TB this is
    * the nightly-sync pattern: feed size ∝ churn, not table size; the
    * anti-join keys on the replica's unique key so the delete apply is
    * one shuffle of (replica ⋉ feed-deletes), also churn-bounded via the
    * broadcast-able delete set. */
  def incrementalSync(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_sync"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps("graft.mode" -> "merge-on-read", pqStore))
    val prev = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
    prev.writeTo(t).append()
    val table = graft.sources.GraftLakeCatalog
      .tableFor("graftlake", "orders_sync").get
    val loadedV = table.currentVersion
    // the REPLICA was synced at loadedV: same relation, separate store
    val replica = prev
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_sync_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_sync_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |""".stripMargin)
    val feed = spark.read
      .option("graft.changes.from", loadedV.toString)
      .option("graft.changes.to", table.currentVersion.toString)
      .table(t)
    val deletes = feed.filter(col("_change_type") === "delete")
      .select(col("o_orderkey").as("del_key"))
    val inserts = feed.filter(col("_change_type") === "insert")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // apply: replica ▷ deletes (left anti on the unique key) ∪ inserts
    releasing(spark, replica
      .join(broadcast(deletes), col("o_orderkey") === col("del_key"),
        "left_anti")
      .unionByName(inserts)
      .orderBy("o_orderkey"), t)
  }

  /** The synced replica must equal the post-merge upstream relation —
    * same algebra as [[mergeIntoSqlOracle]]. */
  private val incrementalSyncOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT coalesce(b.o_orderkey, p.o_orderkey) AS o_orderkey,
      |       coalesce(b.o_orderstatus, p.o_orderstatus) AS o_orderstatus,
      |       coalesce(b.o_totalprice, p.o_totalprice) AS o_totalprice
      |FROM prev p FULL OUTER JOIN batch b ON p.o_orderkey = b.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** Lake-native SCHEMA EVOLUTION: `ALTER TABLE ADD COLUMNS` on the DSv2
    * catalog table. No committed file is rewritten — each file carries
    * its COLUMN MANIFEST (the schema it was written under) and readers
    * resolve BY NAME, so pre-evolution files serve NULL for the new
    * column (the Iceberg add-column contract; the `ref_schema_evolution`
    * registry twin covers the raw-parquet `mergeSchema` shape, this one
    * covers the managed-table DDL shape). The fixture then runs a
    * row-level UPDATE that back-fills the new column on one key stripe —
    * old 3-column files and new 4-column files flow through the same
    * group-based rewrite, proving the evolved schema holds end-to-end
    * (scan, group filter, MergeRows, writer). */
  def alterAddColumn(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_evolve"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps(pqStore))
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (o_channel STRING)")
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        when(col("o_orderkey") % 2 === 0, lit("web")).otherwise(lit("app"))
          .as("o_channel"))
      .filter(col("o_orderkey") % 3 === 0)
      .writeTo(t).append()
    spark.sql(
      s"UPDATE $t SET o_channel = 'bulk' WHERE o_orderkey % 10 = 1")
    releasing(spark, spark.table(t)
      .groupBy(coalesce(col("o_channel"), lit("legacy")).as("channel"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("channel", "o_orderstatus"), t)
  }

  private val alterAddColumnOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    CAST(NULL AS VARCHAR) AS o_channel
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |added AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'app' END AS o_channel
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |upd AS (
      |  SELECT o_orderstatus, o_totalprice,
      |    CASE WHEN o_orderkey % 10 = 1 THEN 'bulk' ELSE o_channel END
      |      AS o_channel
      |  FROM (SELECT * FROM prev UNION ALL SELECT * FROM added))
      |SELECT coalesce(o_channel, 'legacy') AS channel, o_orderstatus,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM upd GROUP BY channel, o_orderstatus
      |ORDER BY channel, o_orderstatus""".stripMargin

  /** Schema evolution part 2 — RENAME COLUMN and DROP COLUMN via STABLE
    * PER-FILE FIELD IDS (the Iceberg field-id contract; VERDICT r11 task
    * 4): files stamp column IDS, not names, so a rename is pure metadata
    * (files written before it keep serving the id under its new name —
    * a name-keyed manifest would wrongly null-fill them) and a drop
    * retires an id without touching a single file. The fixture exercises
    * the full lifecycle: load under the v1 schema, ADD a column, load
    * mixed-schema files, RENAME the added column, DROP an original
    * column, then a row-level UPDATE that rewrites groups spanning all
    * three schema generations under the final schema. Zero-rewrite and
    * feed-replay-across-rename are spec-pinned (LakehouseSpec); the
    * oracle checks the end-to-end relation. */
  def alterDropRename(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_rename"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps(pqStore))
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (o_channel STRING)")
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        when(col("o_orderkey") % 2 === 0, lit("web")).otherwise(lit("app"))
          .as("o_channel"))
      .filter(col("o_orderkey") % 3 === 0)
      .writeTo(t).append()
    // rename: files written as o_channel keep serving their id as o_src
    spark.sql(s"ALTER TABLE $t RENAME COLUMN o_channel TO o_src")
    // drop: the original status id is retired; no file is rewritten
    spark.sql(s"ALTER TABLE $t DROP COLUMN o_orderstatus")
    // row-level back-fill across all three schema generations
    spark.sql(s"UPDATE $t SET o_src = 'bulk' WHERE o_orderkey % 10 = 1")
    releasing(spark, spark.table(t)
      .groupBy(coalesce(col("o_src"), lit("legacy")).as("channel"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("channel"), t)
  }

  /** Schema evolution part 3 — ADD COLUMN ... DEFAULT and widening
    * ALTER COLUMN TYPE (VERDICT r12 task 5), both pure-metadata on the
    * field-id manifests: a defaulted add stores (id → default) in table
    * metadata and PRE-EVOLUTION files serve the EXISTS-default instead
    * of NULL (the Delta/Iceberg default-value contract — readers
    * back-fill, no file is touched); INT→BIGINT stores the new logical
    * type while each file keeps its physical type, widened per value at
    * scan planning (Iceberg type promotion). The fixture spans three
    * schema generations plus a row-level UPDATE that writes widened
    * values only a BIGINT can hold; zero-rewrite is spec-pinned
    * (LakehouseSpec), the oracle checks the end-to-end relation. */
  def alterDefaultWiden(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_defwiden"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_qty INT, o_totalprice DOUBLE)" + tblProps(pqStore))
    def base = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderkey") % 1000).cast("int").as("o_qty"),
        col("o_totalprice"))
    // generation 1: the pre-default schema
    base.filter(col("o_orderkey") % 3 =!= 0).writeTo(t).append()
    // generation 2: defaulted add — gen-1 files read back 'legacy'
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (o_src STRING DEFAULT 'legacy')")
    base.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_src",
        when(col("o_orderkey") % 2 === 0, lit("web")).otherwise(lit("app")))
      .writeTo(t).append()
    // generation 3: widen INT → BIGINT, then back-fill values that only
    // the widened type can hold (no file rewritten by the ALTER itself)
    spark.sql(s"ALTER TABLE $t ALTER COLUMN o_qty TYPE BIGINT")
    spark.sql(s"UPDATE $t SET o_qty = o_qty * 10000000 " +
      "WHERE o_orderkey % 10 = 1")
    releasing(spark, spark.table(t)
      .groupBy(col("o_src").as("src"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_qty")).as("sum_qty"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("src"), t)
  }

  /** Range-clustering maintenance — `CALL system.cluster(table, cols,
    * n)` rewrites the whole table sorted by the cluster key into n
    * tight-range files, the Iceberg `rewrite_data_files` sort strategy.
    * The fixture makes clustering NECESSARY: four interleaved appends
    * (`o_orderkey % 4`) give every file the full key range, so min/max
    * skipping can prune nothing; after the CALL the stripes are
    * near-disjoint and the range query below plans a fraction of the
    * files (partition-count pinned in LakehouseSpec; this query pins
    * the RESULT is unchanged by the rewrite — clustering is pure
    * layout). */
  def clusterFiles(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_cluster"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_totalprice DOUBLE)" + tblProps())
    val base = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    // interleaved appends: every file spans the whole key range
    for (b <- 0 until 4)
      base.filter(col("o_orderkey") % 4 === b).writeTo(t).append()
    spark.sql(s"CALL graftlake.system.cluster('orders_cluster', " +
      "'o_orderkey', 8)")
    releasing(spark, spark.table(t)
      .where(col("o_orderkey") >= 1000 && col("o_orderkey") < 50000)
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price")), t)
  }

  /** HIDDEN (transform) partitioning — `PARTITIONED BY (days(ts),
    * bucket(8, user_id))` (VERDICT r13 task 1): the partition key is
    * DERIVED by the table, never a user-maintained column — the Iceberg
    * partition-transform contract that makes the reference's
    * date-prefixed S3 layout (app.py:26) automatic. The scan reports
    * [[org.apache.spark.sql.connector.read.partitioning
    * .KeyGroupedPartitioning]] over the transform expressions (resolved
    * through the catalog's FunctionCatalog — the storage-partitioned-
    * join hook, SPJ-pinned in PlanSpec), a plain `ts` range predicate
    * prunes day files via min/max stats with no transform mentioned in
    * the query (partition counts pinned in LakehouseSpec), and the
    * relation stays oracle-exact. At 100 TB this is one `CREATE TABLE`
    * clause replacing the hand-maintained `bucket` columns every other
    * lake fixture here carries. */
  def partitionTransform(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.events_hidden"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (ts TIMESTAMP_NTZ, user_id BIGINT, " +
      "event_type STRING, value DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(8, user_id))" + tblProps())
    Tables(spark, sfDir, "events")
      .select("ts", "user_id", "event_type", "value")
      .writeTo(t).append()
    // hidden pruning: the predicate is on ts alone — the days() layout
    // is the table's concern, not the query's
    releasing(spark, spark.table(t)
      .where(col("ts") >= lit("2024-01-10 00:00:00")
          .cast("timestamp_ntz")
        && col("ts") < lit("2024-01-17 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value"), 4).as("sum_value"))
      .orderBy("event_type"), t)
  }

  /** NESTED columns through REAL parquet lake storage — STRUCT, ARRAY
    * and MAP columns land as the standard parquet nested encodings
    * (plain groups, 3-level LIST, 3-level MAP) in actual files, and
    * read back through the DSv2 scan with column-granular pruning (the
    * scan declines Spark's nested-field pruning — stored rows carry
    * whole structs — and Spark projects the subset above it). This is
    * the shape a training-data table actually has: span structs, token
    * arrays, per-metric score maps. The query writes orders-derived
    * nested rows, reads them back extracting from every container
    * kind, and aggregates — oracle-exact against flat SQL. */
  def lakeNested(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_nested"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (o_orderkey BIGINT, " +
      "meta STRUCT<status: STRING, bucket: BIGINT>, " +
      "amounts ARRAY<DOUBLE>, " +
      "tags MAP<STRING, BIGINT>) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          (col("o_orderkey") % 7).as("bucket")).as("meta"),
        array(col("o_totalprice"), col("o_totalprice") * 0.5)
          .as("amounts"),
        map(lit("k1"), col("o_orderkey") % 5,
          lit("k2"), col("o_orderkey") % 3).as("tags"))
      .writeTo(t).append()
    releasing(spark, spark.table(t)
      .groupBy(col("meta.status").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("meta.bucket")).as("sum_bucket"),
        dsum(element_at(col("amounts"), 1)
          + element_at(col("amounts"), 2), 4).as("sum_amt"),
        sum(element_at(col("tags"), lit("k1"))).as("sum_k1"))
      .orderBy("status"), t)
  }

  private val lakeNestedOracle =
    """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(o_orderkey % 7) AS BIGINT) AS sum_bucket,
      | CAST(sum(CAST(o_totalprice + o_totalprice * 0.5
      |   AS DECIMAL(18,4))) AS DOUBLE) AS sum_amt,
      | CAST(sum(o_orderkey % 5) AS BIGINT) AS sum_k1
      |FROM orders GROUP BY status ORDER BY status""".stripMargin

  /** WRITE-AUDIT-PUBLISH over snapshot refs (VERDICT r13 task 5) — the
    * Iceberg branch/tag surface: `create_tag` names the audited-good
    * production version (retention keeps it), `create_branch` forks an
    * audit branch at the main head, `.option("graft.branch", ...)`
    * appends STAGE the new batch on it (two commits, INVISIBLE to main —
    * no version number even exists for them yet), `VERSION AS OF
    * 'audit'` is the audit read, and `fast_forward` publishes the staged
    * commits onto main in order. The result pins all three mechanisms
    * at once: the published relation (init ∪ staged), `pre_publish_n`
    * (main's row count taken AFTER staging — must still be the initial
    * load: staged commits are invisible), and `tag_n` (the tagged
    * version read back after publish — time travel by name). At 100 TB
    * this is the ingestion pattern that makes bad loads NON-EVENTS: the
    * audit query rejects the branch, main never saw a byte. */
  def wapPublish(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_wap"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE)" + tblProps(pqStore))
    val base = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // the audited-good production state, tagged
    base.filter(col("o_orderkey") % 4 =!= 0).writeTo(t).append()
    spark.sql(s"CALL graftlake.system.create_tag('orders_wap', 'prod', 1)")
    // WRITE: stage the incoming batch on a branch, two commits
    spark.sql(s"CALL graftlake.system.create_branch('orders_wap', 'audit')")
    base.filter(col("o_orderkey") % 8 === 0)
      .writeTo(t).option("graft.branch", "audit").append()
    base.filter(col("o_orderkey") % 8 === 4)
      .writeTo(t).option("graft.branch", "audit").append()
    // AUDIT: the gate queries the BRANCH by name; this fixture's batch
    // is deterministically clean, so the gate passes
    val auditBad = spark.sql(s"SELECT count(*) AS n FROM $t " +
      "VERSION AS OF 'audit' WHERE o_totalprice < 0 OR o_orderkey IS NULL")
      .head().getLong(0)
    require(auditBad == 0, s"audit gate rejected the staged batch " +
      s"($auditBad bad rows) — the branch would be dropped, not published")
    // invisibility probe: main AFTER staging still serves the initial load
    val prePublishN = spark.table(t).count()
    // PUBLISH
    spark.sql(s"CALL graftlake.system.fast_forward('orders_wap', 'audit')")
    val tagN = spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'prod'")
      .head().getLong(0)
    releasing(spark, spark.table(t)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .withColumn("pre_publish_n", lit(prePublishN))
      .withColumn("tag_n", lit(tagN))
      .orderBy("status"), t)
  }

  private val wapPublishOracle =
    """WITH init AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 4 <> 0),
      |staged AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 4 = 0),
      |pub AS (SELECT * FROM init UNION ALL SELECT * FROM staged)
      |SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |   AS sum_price,
      | (SELECT CAST(count(*) AS BIGINT) FROM init) AS pre_publish_n,
      | (SELECT CAST(count(*) AS BIGINT) FROM init) AS tag_n
      |FROM pub GROUP BY status ORDER BY status""".stripMargin

  private val partitionTransformOracle =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  private val clusterFilesOracle =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      | CAST(min(o_orderkey) AS BIGINT) AS mn,
      | CAST(max(o_orderkey) AS BIGINT) AS mx,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |   AS sum_price
      |FROM orders
      |WHERE o_orderkey >= 1000 AND o_orderkey < 50000""".stripMargin

  private val alterDefaultWidenOracle =
    """WITH gen1 AS (
      |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS o_qty,
      |    o_totalprice, 'legacy' AS o_src
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |gen2 AS (
      |  SELECT o_orderkey, CAST(o_orderkey % 1000 AS BIGINT) AS o_qty,
      |    o_totalprice,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'app' END AS o_src
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |upd AS (
      |  SELECT o_src, o_totalprice,
      |    CASE WHEN o_orderkey % 10 = 1 THEN o_qty * 10000000
      |      ELSE o_qty END AS o_qty
      |  FROM (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2))
      |SELECT o_src AS src, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(o_qty) AS BIGINT) AS sum_qty,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM upd GROUP BY src ORDER BY src""".stripMargin

  private val alterDropRenameOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_src
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |added AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'app' END AS o_src
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |upd AS (
      |  SELECT o_totalprice,
      |    CASE WHEN o_orderkey % 10 = 1 THEN 'bulk' ELSE o_src END AS o_src
      |  FROM (SELECT * FROM prev UNION ALL SELECT * FROM added))
      |SELECT coalesce(o_src, 'legacy') AS channel,
      | CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM upd GROUP BY channel ORDER BY channel""".stripMargin

  /** STREAMING change-feed consumption — the `<table>.changes` metadata
    * table read as a `readStream` source whose offsets are COMMIT
    * VERSIONS (the Delta streaming-source shape). The query runs the
    * real production loop twice: drain 1 (startingVersion 0) ships the
    * initial load's inserts into a parquet sink; a MERGE then commits;
    * drain 2 RESUMES FROM THE CHECKPOINT (startingVersion is ignored on
    * restart — the persisted version offset wins) and ships exactly the
    * merge's delete+insert churn. The accumulated sink must equal the
    * full relational feed — proving version-offset exactly-once across
    * restarts, not just a single replay. Each drain's cost is ∝ the
    * commits it covers, which is the 100 TB tailing contract. */
  def streamLakeCdf(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_scdf"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)" +
      tblProps("graft.mode" -> "merge-on-read", pqStore))
    val tmp = sys.props("java.io.tmpdir")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_pid" + ProcessHandle.current().pid()
    val chk = new File(tmp, s"graft_scdf_chk_$tag")
    val sink = new File(tmp, s"graft_scdf_sink_$tag")
    Seq(chk, sink).foreach(graft.streaming.StreamingOps.deleteRecursively)
    def drain(): Unit = {
      val q = spark.readStream
        .option("graft.stream.startingVersion", "0")
        .table(s"$t.changes")
        .select(col("_change_type").as("change_type"),
          col("_commit_version").as("commit_step"),
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .writeStream.format("parquet")
        .option("path", sink.getAbsolutePath)
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      graft.streaming.StreamingOps.awaitDrained(q)
    }
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 3 =!= 0)
      .writeTo(t).append()
    drain() // ships the v1 load
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .createOrReplaceTempView("graft_scdf_batch")
    spark.sql(
      s"""MERGE INTO $t t USING graft_scdf_batch b
         |ON t.o_orderkey = b.o_orderkey
         |WHEN MATCHED THEN UPDATE SET
         |  o_orderstatus = b.o_orderstatus, o_totalprice = b.o_totalprice
         |WHEN NOT MATCHED THEN INSERT
         |  (o_orderkey, o_orderstatus, o_totalprice)
         |  VALUES (b.o_orderkey, b.o_orderstatus, b.o_totalprice)
         |""".stripMargin)
    drain() // resumes at the checkpointed version: merge churn only
    // output lives in the parquet sink — no pin needed before release
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.read.parquet(sink.getAbsolutePath)
      .orderBy("o_orderkey", "commit_step", "change_type")
  }

  /** PARTITION-SPEC EVOLUTION — `CALL system.set_partition_spec`
    * changes the table's layout WITHOUT rewriting a file (Iceberg's
    * ALTER TABLE ADD/REPLACE PARTITION FIELD): pre-evolution files keep
    * their old-spec key stamps, new writes fanout under the new spec,
    * and every read stays correct across the mixed set because pruning
    * is stats-based, never layout-based. The fixture loads orders
    * identity-partitioned by status, evolves to bucket(8, custkey),
    * loads a second wave, then aggregates across both — the oracle is
    * the plain relational answer, proving evolution is pure layout. */
  def partitionEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_evolve"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      "PARTITIONED BY (o_orderstatus)" + tblProps())
    val base = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    // wave 1 under identity(o_orderstatus)
    base.filter(col("o_orderkey") % 2 === 0).writeTo(t).append()
    spark.sql(s"CALL graftlake.system.set_partition_spec(" +
      "'orders_evolve', 'bucket:8:o_custkey')")
    // wave 2 under bucket(8, o_custkey): the mixed-spec set must read
    // as one relation
    base.filter(col("o_orderkey") % 2 =!= 0).writeTo(t).append()
    releasing(spark, spark.table(t)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("o_orderstatus"), t)
  }

  private val partitionEvolveOracle =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      | CAST(min(o_orderkey) AS BIGINT) AS mn,
      | CAST(max(o_orderkey) AS BIGINT) AS mx,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |   AS sum_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Exactly-once STREAMING INGEST into a lake table —
    * `writeStream.toTable` over the DSv2 STREAMING_WRITE surface
    * (Delta/Iceberg's streaming-sink contract). Each micro-batch epoch
    * lands as one atomic commit stamped (queryId, epochId) inside the
    * commit record itself — a restarted query replaying its last epoch
    * is a no-op, never a duplicate. The fixture proves it end-to-end:
    * wave 1 (the events corpus as 3 landing files, maxFilesPerTrigger=1
    * → 3 epochs) drains, THEN a wave-2 file lands and the SAME
    * checkpoint restarts — the second drain must ingest only the new
    * file. Any replayed epoch would double wave 1 in the aggregate and
    * fail the oracle. Scale note: the ingest path is the task-side file
    * writer (executors write parquet + stats, the driver adopts
    * metadata), so sink bandwidth scales with executors — the 100 TB
    * streaming-ingest shape. */
  def streamLakeSink(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.events_ssink"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (event_id BIGINT, event_type STRING, " +
      "user_id BIGINT, value DOUBLE)" + tblProps(pqStore))
    val tmp = sys.props("java.io.tmpdir")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_pid" + ProcessHandle.current().pid()
    val land = new File(tmp, s"graft_ssink_land_$tag")
    val chk = new File(tmp, s"graft_ssink_chk_$tag")
    Seq(land, chk).foreach(graft.streaming.StreamingOps.deleteRecursively)
    val base = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("value"))
    val schema = base.schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(land.getAbsolutePath)
        .writeStream
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(t)
      graft.streaming.StreamingOps.awaitDrained(q)
    }
    // wave 1: the corpus lands as 3 files -> 3 exactly-once epochs
    base.repartition(3).write.mode("append").parquet(land.getAbsolutePath)
    drain()
    // wave 2 arrives AFTER the first drain; the checkpoint restart must
    // ingest ONLY the new file (a replayed epoch would double wave 1)
    base.filter(col("event_type") === "click").coalesce(1)
      .write.mode("append").parquet(land.getAbsolutePath)
    drain()
    releasing(spark, spark.table(t)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_value"))
      .orderBy("event_type"), t)
  }

  /** STREAMING UPSERT via EQUALITY DELETES (VERDICT r16 task 4) — the
    * Flink→Iceberg CDC-writer shape: each micro-batch epoch commits its
    * rows as new data files PLUS an equality-delete keys file that
    * logically deletes every prior row with a matching key, with ZERO
    * read-side probe of existing data at write time (position deletes
    * would need a key lookup per batch — the read amplification that
    * makes MoR writers slow; equality deletes defer it to the scan and
    * to compaction). Shares [[mergeIntoSqlOracle]]: the surviving
    * relation must equal the full-outer upsert the MERGE queries
    * produce. The spec side (LakehouseSpec) pins the zero-probe
    * property and the compaction resolution the oracle can't see. */
  def streamUpsertEqDelete(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_eqd"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // parquet storage explicitly: the keys files are real parquet the
    // scan tasks read (memory storage has no upsert surface)
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    val base = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    base.filter(col("o_orderkey") % 3 =!= 0).writeTo(t).append() // prev
    val tmp = sys.props("java.io.tmpdir")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_pid" + ProcessHandle.current().pid()
    val land = new File(tmp, s"graft_eqd_land_$tag")
    val chk = new File(tmp, s"graft_eqd_chk_$tag")
    Seq(land, chk).foreach(graft.streaming.StreamingOps.deleteRecursively)
    // the upsert batch arrives as 3 landing files → 3 epochs, each
    // committing (data files + equality-delete keys file) atomically
    base.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .repartition(3).write.mode("append").parquet(land.getAbsolutePath)
    val q = spark.readStream
      .schema(spark.table(t).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(land.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", chk.getAbsolutePath)
      .option("graft.upsert.key", "o_orderkey")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(t)
    graft.streaming.StreamingOps.awaitDrained(q)
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  /** Change feed ACROSS an equality-delete commit (VERDICT r17 task 2)
    * — the CDC-writer's primary consumer reading the CDC-writer's own
    * commit shape. A streaming upsert lands one equality-delete epoch
    * (data files + keys parquet, zero read-probe at write); the feed
    * then enumerates the epoch's delete leg by probing each prior
    * applicable file's live rows against the keys parquet TASK-side
    * (the driver ships probe specs only) and emits the epoch's data
    * files as inserts. No compaction runs — the point is serving the
    * feed while the delete debt is still unresolved. At 100 TB the
    * feed's cost stays ∝ churn × prior-file count, never table size,
    * and the probe work distributes across scan tasks. */
  def changeFeedUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_eqdcf"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    val base = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    base.filter(col("o_orderkey") % 3 =!= 0).writeTo(t).append()
    val table = graft.sources.GraftLakeCatalog
      .tableFor("graftlake", "orders_eqdcf").get
    val loadedV = table.currentVersion
    val tmp = sys.props("java.io.tmpdir")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_pid" + ProcessHandle.current().pid()
    val land = new File(tmp, s"graft_eqdcf_land_$tag")
    val chk = new File(tmp, s"graft_eqdcf_chk_$tag")
    Seq(land, chk).foreach(graft.streaming.StreamingOps.deleteRecursively)
    base.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .coalesce(1).write.mode("append").parquet(land.getAbsolutePath)
    val q = spark.readStream
      .schema(spark.table(t).schema)
      .parquet(land.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", chk.getAbsolutePath)
      .option("graft.upsert.key", "o_orderkey")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(t)
    graft.streaming.StreamingOps.awaitDrained(q)
    require(table.eqDeletes.nonEmpty,
      "the feed must be read UNDER the unresolved equality delete")
    releasing(spark, spark.read
      .option("graft.changes.from", loadedV.toString)
      .option("graft.changes.to", table.currentVersion.toString)
      .table(t)
      .select(col("_change_type").as("change_type"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .orderBy("o_orderkey", "change_type"), t)
  }

  /** METADATA-ONLY DELETE (SupportsDeleteV2) — the 100 TB
    * partition-drop path. Orders load as four files with DISJOINT
    * o_orderkey ranges (what identity partitioning or a clustered
    * layout gives every real table); `DELETE WHERE o_orderkey < cut`
    * at a file boundary is then PROVABLE from per-file min/max stats
    * alone, so Spark's OptimizeMetadataOnlyDeleteFromTable routes it
    * to `deleteWhere`: the two low files leave the manifest list in
    * one metadata commit — no scan, no rewrite, no deletion vector,
    * cost ∝ manifests, never bytes. The `require`s pin exactly that
    * (files shrank, nothing was added, no DV appeared); a predicate
    * the stats cannot decide falls back to the ordinary row-level
    * plan, also exercised here mid-file. */
  def lakeMetadataDelete(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_mdel"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    val base = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val maxKey = base.agg(max("o_orderkey")).head.getLong(0)
    val q = maxKey / 4
    // four range-pure files — each decides any cut at a multiple of q
    for (b <- 0L until 4L)
      base.filter(col("o_orderkey") >= b * q &&
          (col("o_orderkey") < (b + 1) * q || lit(b == 3L)))
        .coalesce(1).writeTo(t).append()
    val table = graft.sources.GraftLakeCatalog
      .tableFor("graftlake", "orders_mdel").get
    val ids0 = table.fileIds.toSet
    spark.sql(s"DELETE FROM $t WHERE o_orderkey < ${2 * q}")
    require(table.fileIds.toSet.subsetOf(ids0) &&
      table.fileIds.size == 2,
      "the boundary-aligned DELETE must drop whole files and add none")
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  private val lakeMetadataDeleteOracle =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey >= 2 * ((SELECT max(o_orderkey) FROM orders) // 4)
      |ORDER BY o_orderkey""".stripMargin

  /** CHECK CONSTRAINTS (DSv2 SUPPORT_TABLE_CONSTRAINT) — the schema
    * contract a warehouse load declares once and every writer then
    * cannot break. The engine owns declaration + persistence; Spark's
    * analyzer reads `Table.constraints()` and injects the predicate as
    * a row assertion into EVERY V2 write plan, so a violating INSERT /
    * UPDATE / MERGE fails the job and the atomic commit reverts — at
    * 100 TB this is a per-row codegen'd check riding the write's
    * existing pass, zero extra scans. Staged here: orders loads under
    * `CHECK (o_totalprice > 0)`, a violating batch is refused whole
    * (the `require` pins the revert), and the clean reload succeeds. */
  def lakeCheckConstraint(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_checked"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, " +
      "CONSTRAINT price_pos CHECK (o_totalprice > 0)) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    val base = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    base.writeTo(t).append()
    // a poisoned batch (one negated price) must be refused WHOLE — the
    // commit is atomic, so the valid rows of the batch revert with it
    val poisoned = base.limit(100)
      .withColumn("o_totalprice", -col("o_totalprice"))
    val refused =
      try { poisoned.writeTo(t).append(); false }
      catch { case e: Throwable =>
        var c: Throwable = e; var hit = false
        while (c != null && !hit) {
          hit = Option(c.getMessage)
            .exists(_.contains("CHECK_CONSTRAINT_VIOLATION"))
          c = c.getCause
        }
        hit
      }
    require(refused, "the poisoned batch must fail the CHECK loudly")
    // RENAME COLUMN rewrites the persisted CHECK predicate alongside
    // the rename (VERDICT r19: a dangling predicate would inject an
    // unresolvable assertion into EVERY later write and brick the
    // table): the constraint keeps binding under the new name — a
    // violating insert is refused, a clean one lands.
    spark.sql(s"ALTER TABLE $t RENAME COLUMN o_totalprice TO price")
    val renamedRefused =
      try { spark.sql(s"INSERT INTO $t VALUES (-1, 'X', -9.0)"); false }
      catch { case _: Throwable => true }
    require(renamedRefused,
      "the CHECK must still bind after RENAME COLUMN")
    spark.sql(s"INSERT INTO $t VALUES (-1, 'X', 9.0)")
    require(spark.table(t).where("o_orderkey = -1").count() == 1,
      "a clean insert must land after the rename (no dangling predicate)")
    spark.sql(s"DELETE FROM $t WHERE o_orderkey = -1")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN price TO o_totalprice")
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  private val lakeCheckConstraintOracle =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** The `.partitions` METADATA TABLE (Iceberg's partitions summary):
    * one row per partition tuple with file count, stored/live rows and
    * bytes — what an operator reads before choosing compaction targets
    * or auditing skew, answered from MANIFESTS alone (control-plane
    * cost, zero data reads; the fanout writer's partition-pure files
    * make per-key aggregation exact). Staged here: an identity-
    * partitioned orders table, a merge-on-read DELETE carving deletion
    * vectors, then the summary — live counts reflect the DVs while
    * stored counts don't, the read-debt audit at a glance. */
  def lakePartitionsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.orders_parts"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "PARTITIONED BY (o_orderstatus) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet', " +
      "'graft.mode' = 'merge-on-read')")
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .writeTo(t).append()
    spark.sql(s"DELETE FROM $t WHERE o_orderkey % 10 = 0")
    releasing(spark, spark.table(s"$t.partitions")
      .select(col("partition"), col("n_rows"), col("n_live_rows"))
      .orderBy("partition"), t)
  }

  private val lakePartitionsTableOracle =
    """SELECT concat('[', o_orderstatus, ']') AS partition,
      |  count(*) AS n_rows,
      |  count(*) FILTER (WHERE o_orderkey % 10 <> 0) AS n_live_rows
      |FROM orders
      |GROUP BY 1
      |ORDER BY partition""".stripMargin

  /** ATOMIC CTAS + RTAS (StagingTableCatalog). `CREATE TABLE AS
    * SELECT` stages the whole table (log + data files) in a hidden
    * sibling directory and publishes with ONE atomic rename — a failed
    * query leaves no half-loaded visible table, which is what the
    * non-atomic fallback (create, write, drop-on-failure) cannot
    * guarantee on a crash. `REPLACE TABLE AS SELECT` publishes by
    * pointer swing: readers serve the OLD table until one atomic log
    * rename flips visibility to the staged replacement — the
    * schema-changing reload pattern (recompute a derivative table from
    * scratch, swap atomically) every warehouse pipeline runs daily. */
  def lakeCtasReplace(spark: SparkSession, sfDir: String): DataFrame = {
    val tmp = sys.props("java.io.tmpdir")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_pid" + ProcessHandle.current().pid()
    val wh = new File(tmp, s"graft_ctas_wh_$tag")
    graft.streaming.StreamingOps.deleteRecursively(wh)
    spark.conf.set("spark.sql.catalog.gctas",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctas.warehouse", wh.getAbsolutePath)
    graft.sources.GraftLakeCatalog.evict("gctas", "orders_ctas")
    val t = "gctas.orders_ctas"
    Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView("ctas_src_orders")
    spark.sql(s"CREATE TABLE $t TBLPROPERTIES " +
      "('graft.storage' = 'parquet') AS " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice " +
      "FROM ctas_src_orders WHERE o_orderkey % 2 = 0")
    // the reload: new schema, new contents, one atomic flip
    spark.sql(s"REPLACE TABLE $t TBLPROPERTIES " +
      "('graft.storage' = 'parquet') AS " +
      "SELECT o_orderkey, o_orderstatus " +
      "FROM ctas_src_orders WHERE o_orderkey % 3 = 0")
    releasing(spark, spark.table(t).orderBy("o_orderkey"), t)
  }

  private val lakeCtasReplaceOracle =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderkey % 3 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** TWO WRITERS, ONE TABLE — the optimistic-commit auto-rebase
    * (Iceberg's commit-retry contract) exercised end-to-end on real
    * data. Two catalog INSTANCES (separate registries, the cross-driver
    * shape) share one durable warehouse root. Writer B appends while
    * STALE — its commit loses the version-record CAS to writer A's
    * commit, refreshes from `_graft_log`, and lands rebased; writer A
    * then commits a merge-on-read DELETE while stale the same way (its
    * delta re-validates against the refreshed state: A's target files
    * are untouched by B's append, so snapshot isolation admits it). No
    * manual evict/retry anywhere — the `require`s pin that both writers
    * actually lost a race and rebased, and that the final history is
    * one linear, contiguous version chain. At 100 TB this is the normal
    * state of a shared table: ingest jobs, CDC writers, and maintenance
    * commit concurrently, and appends/compatible deltas must never need
    * a coordinator beyond the log's CAS. */
  def lakeConcurrentWriters(spark: SparkSession, sfDir: String): DataFrame = {
    val tmp = sys.props("java.io.tmpdir")
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_pid" + ProcessHandle.current().pid()
    val wh = new File(tmp, s"graft_cw_wh_$tag")
    graft.streaming.StreamingOps.deleteRecursively(wh)
    Seq("gcw", "gcw2").foreach { c =>
      spark.conf.set(s"spark.sql.catalog.$c",
        classOf[graft.sources.GraftLakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$c.warehouse",
        wh.getAbsolutePath)
      graft.sources.GraftLakeCatalog.evict(c, "cw_orders")
    }
    val tA = "gcw.cw_orders"
    val tB = "gcw2.cw_orders"
    spark.sql(s"CREATE TABLE $tA " +
      "(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet', " +
      "'graft.mode' = 'merge-on-read')")
    val base = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // v1 (writer A): keys ≡ 0 (mod 3)
    base.filter(col("o_orderkey") % 3 === 0).writeTo(tA).append()
    // writer B reopens from disk at v1 — its own registry, own state
    require(spark.table(tB).count() > 0, "writer B reopens at v1")
    val tableB = graft.sources.GraftLakeCatalog
      .tableFor("gcw2", "cw_orders").get
    // v2 (writer A): keys ≡ 2 (mod 3) — B is now STALE
    base.filter(col("o_orderkey") % 3 === 2).writeTo(tA).append()
    // v3 (writer B, stale): the append loses the CAS and rebases
    val rebB = tableB.rebases
    base.filter(col("o_orderkey") % 3 === 1).writeTo(tB).append()
    require(tableB.rebases > rebB,
      "writer B's stale append must land via rebase, not by luck")
    // v4 (writer A, stale at v2): a MoR DELETE over its OWN v1 files —
    // B's commit only appended, so the delta re-validates and rebases
    val tableA = graft.sources.GraftLakeCatalog
      .tableFor("gcw", "cw_orders").get
    val rebA = tableA.rebases
    spark.sql(s"DELETE FROM $tA WHERE o_orderkey % 6 = 0")
    require(tableA.rebases > rebA,
      "writer A's stale delete must land via rebase")
    require(tableA.currentVersion == 4 && tableB.currentVersion == 3,
      "one linear history: create, A, A, B-rebased, A-rebased — " +
        "B simply hasn't observed v4 yet")
    releasing(spark, spark.table(tA)
      .orderBy("o_orderkey"), tA, tB)
  }

  private val lakeConcurrentWritersOracle =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey % 6 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** Delete pre-images = prev ∩ batch keys; inserts = the batch. */
  private val changeFeedUpsertOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT * FROM (
      |  SELECT 'delete' AS change_type,
      |    o_orderkey, o_orderstatus, o_totalprice
      |  FROM prev WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 'insert' AS change_type,
      |    o_orderkey, o_orderstatus, o_totalprice
      |  FROM batch)
      |ORDER BY o_orderkey, change_type""".stripMargin

  private val streamLakeSinkOracle =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT event_type, value FROM events
      |  UNION ALL
      |  SELECT event_type, value FROM events WHERE event_type = 'click'
      |)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  private val streamLakeCdfOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT * FROM (
      |  SELECT 'insert' AS change_type, CAST(1 AS BIGINT) AS commit_step,
      |    o_orderkey, o_orderstatus, o_totalprice FROM prev
      |  UNION ALL
      |  SELECT 'delete' AS change_type, CAST(2 AS BIGINT) AS commit_step,
      |    o_orderkey, o_orderstatus, o_totalprice
      |  FROM prev WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 'insert' AS change_type, CAST(2 AS BIGINT) AS commit_step,
      |    o_orderkey, o_orderstatus, o_totalprice FROM batch)
      |ORDER BY o_orderkey, commit_step, change_type""".stripMargin

  private val changeFeedOracle =
    """WITH prev AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 3 <> 0),
      |batch AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT * FROM (
      |  SELECT 'delete' AS change_type, CAST(1 AS BIGINT) AS commit_step,
      |    o_orderkey, o_orderstatus, o_totalprice
      |  FROM prev WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 'insert' AS change_type, CAST(1 AS BIGINT) AS commit_step,
      |    o_orderkey, o_orderstatus, o_totalprice
      |  FROM batch)
      |ORDER BY o_orderkey, change_type""".stripMargin

  private val storagePartitionedJoinOracle =
    """WITH o AS (
      |  SELECT o_custkey % 16 AS bucket, o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM orders GROUP BY 1, 2)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM o JOIN customer ON o_custkey = c_custkey
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  val queries: Seq[Query] = Seq(
    Query("ref_time_travel",
      "manifest-versioned time travel: copy-on-write buckets, AS OF reads",
      timeTravel, Some(timeTravelOracle)),
    Query("ref_manifest_skipping",
      "file-level min/max data skipping: manifest prunes before any footer IO",
      manifestSkipping, Some(manifestSkippingOracle)),
    Query("ref_snapshot_expire",
      "VACUUM: expired version's exclusive files deleted, shared files survive",
      snapshotExpire, Some(snapshotExpireOracle)),
    Query("ref_merge_into_sql",
      "real MERGE INTO SQL via DSv2 row-level ops (group-based ReplaceData)",
      mergeIntoSql, Some(mergeIntoSqlOracle)),
    Query("ref_update_delete_sql",
      "real UPDATE + DELETE FROM SQL through the row-level rewrite",
      updateDeleteSql, Some(updateDeleteSqlOracle)),
    Query("ref_merge_on_read",
      "MERGE via SupportsDelta deltas: deletion vectors, zero file rewrites",
      mergeOnReadSql, Some(mergeIntoSqlOracle)),
    Query("ref_merge_sync",
      "MERGE incl. WHEN NOT MATCHED BY SOURCE: mirror-a-batch, CoW rewrite",
      mergeSyncSql, Some(mergeSyncOracle)),
    Query("ref_merge_sync_mor",
      "sync MERGE w/ BY SOURCE via deltas: DV deletes/demotes, no rewrites",
      mergeSyncMor, Some(mergeSyncOracle)),
    Query("ref_update_partitioned",
      "UPDATE/DELETE on a PARTITIONED BY table: file-grained op scan, SPJ reads",
      updatePartitionedSql, Some(updatePartitionedSqlOracle)),
    Query("ref_change_feed",
      "change feed between versions: insert/delete rows from file + DV diffs",
      changeFeed, Some(changeFeedOracle)),
    Query("ref_incremental_sync",
      "CDC consumer: replica + change feed reproduces the upstream relation",
      incrementalSync, Some(incrementalSyncOracle)),
    Query("stream_lake_cdf",
      "streaming change source: version offsets, checkpointed two-drain tail",
      streamLakeCdf, Some(streamLakeCdfOracle)),
    Query("stream_lake_sink",
      "exactly-once streaming ingest: epoch-stamped commits, restart-safe",
      streamLakeSink, Some(streamLakeSinkOracle)),
    Query("stream_upsert_eqdelete",
      "streaming upsert via equality deletes: zero read-probe at write",
      streamUpsertEqDelete, Some(mergeIntoSqlOracle)),
    Query("ref_change_feed_upsert",
      "change feed across an UNRESOLVED equality-delete commit: probed delete leg",
      changeFeedUpsert, Some(changeFeedUpsertOracle)),
    Query("lake_concurrent_writers",
      "optimistic-commit auto-rebase: two stale writers land without manual retry",
      lakeConcurrentWriters, Some(lakeConcurrentWritersOracle)),
    Query("lake_metadata_delete",
      "metadata-only DELETE: stats-decided files drop whole, no scan or rewrite",
      lakeMetadataDelete, Some(lakeMetadataDeleteOracle)),
    Query("lake_ctas_replace",
      "atomic CTAS + REPLACE TABLE AS SELECT: staged publish, one-rename flip",
      lakeCtasReplace, Some(lakeCtasReplaceOracle)),
    Query("lake_partitions_table",
      ".partitions metadata table: per-key file/row/live summary from manifests",
      lakePartitionsTable, Some(lakePartitionsTableOracle)),
    Query("lake_check_constraint",
      "CHECK constraints: declared once, every violating write refused whole",
      lakeCheckConstraint, Some(lakeCheckConstraintOracle)),
    Query("ref_partition_evolve",
      "partition-spec evolution: metadata-only relayout, mixed-spec reads",
      partitionEvolve, Some(partitionEvolveOracle)),
    Query("ref_alter_add_column",
      "ALTER TABLE ADD COLUMNS: per-file manifests null-fill, no rewrite",
      alterAddColumn, Some(alterAddColumnOracle)),
    Query("ref_alter_drop_rename",
      "RENAME/DROP COLUMN via stable per-file field ids, zero rewrites",
      alterDropRename, Some(alterDropRenameOracle)),
    Query("ref_alter_default_widen",
      "ADD COLUMN DEFAULT + INT->BIGINT widening: metadata-only evolution",
      alterDefaultWiden, Some(alterDefaultWidenOracle)),
    Query("ref_partition_transform",
      "hidden partitioning: days()/bucket() transforms, no derived column",
      partitionTransform, Some(partitionTransformOracle)),
    Query("ref_cluster_files",
      "CALL system.cluster: range-sort rewrite makes file skipping bite",
      clusterFiles, Some(clusterFilesOracle)),
    Query("ref_wap_publish",
      "write-audit-publish: branch-staged commits, tag reads, fast-forward",
      wapPublish, Some(wapPublishOracle)),
    Query("ref_lake_nested",
      "STRUCT/ARRAY/MAP columns through real parquet lake storage",
      lakeNested, Some(lakeNestedOracle)),
    Query("join_spj_storage",
      "storage-partitioned join: co-partitioned DSv2 tables, zero exchanges",
      storagePartitionedJoin, Some(storagePartitionedJoinOracle)),
    Query("ref_insert_by_name",
      "INSERT BY NAME: reversed producer column order still lands correctly",
      insertByName, Some(insertByNameOracle)),
  )
}
