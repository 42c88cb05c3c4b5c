package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scale probe for the DISTRIBUTED maintenance rewrites
  * (round-16 items: task-side writes, distributed cluster/compaction):
  * loads orders×8 into a `graft.storage = parquet` lake table (the
  * 12M-row ingest itself exercises the task-side write plane that the
  * old driver-resident shape could not survive), then times
  * `CALL system.cluster` (range-shuffle sort rewrite),
  * `CALL system.cluster_zorder`, a fragmenting DELETE, and
  * `CALL system.compact` (distributed DV-clearing rewrite). Prints one
  * JSON line per step. Not part of the driver contract —
  * `sbt "runMain graft.MaintBench [sfDir] [copies]"`. */
object MaintBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.maint_bench"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet', " +
      "'graft.mode' = 'merge-on-read')")
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"""{"step":"$label","sec":${(System.nanoTime() - t0) /
        1e9}%.2f}""")
    }
    timed(s"ingest_x$copies") {
      (1 to copies).map(_ => base).reduce(_ union _)
        .repartition(16).writeTo(t).append()
    }
    val n = spark.table(t).count()
    println(s"""{"rows":$n}""")
    timed("cluster_sort_32") {
      spark.sql(s"CALL graftlake.system.cluster('maint_bench', " +
        "'o_orderkey', 32)")
    }
    timed("cluster_zorder_32") {
      spark.sql(s"CALL graftlake.system.cluster_zorder('maint_bench', " +
        "'o_orderkey, o_custkey', 32)")
    }
    timed("delete_1pct") {
      spark.sql(s"DELETE FROM $t WHERE o_orderkey % 97 = 0")
    }
    timed("compact_dv") {
      spark.sql(s"CALL graftlake.system.compact('maint_bench')")
    }
    val after = spark.table(t).count()
    println(s"""{"rows_after":$after}""")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.stop()
  }
}
