package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B for the lake-scan decode path (VERDICT r15 task 1):
  * loads orders into a `graft.storage = parquet` lake table once, then
  * times the same scan-aggregate with the vectorized ColumnarBatch
  * decode ON vs pinned OFF (`-Dgraft.lake.columnar=off` equivalent,
  * toggled in-process). Prints one JSON line per leg. Not part of the
  * driver contract — `sbt "runMain graft.DecodeBench [sfDir] [reps]"`. */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graftlake",
      classOf[graft.sources.GraftLakeCatalog].getName)
    val t = "graftlake.decode_bench"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING, " +
      "o_orderdate TIMESTAMP) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet')")
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority", "o_orderdate")
    // 16x self-union: decode cost must dominate the fixed per-query floor
    (1 to 16).map(_ => base).reduce(_ union _)
      .repartition(16).writeTo(t).append()
    val n = spark.table(t).count()
    def leg(): Double = {
      val t0 = System.nanoTime()
      // touch every column so the WHOLE file decodes
      spark.sql(s"SELECT o_orderstatus, sum(o_totalprice), " +
        "sum(o_orderkey + o_custkey), count(1), min(o_orderpriority), " +
        s"min(o_orderdate) FROM $t GROUP BY o_orderstatus").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths' codegen before timing
    sys.props("graft.lake.columnar") = "off"; leg()
    sys.props -= "graft.lake.columnar"; leg()
    def legs(label: String): Unit = {
      val ts = (1 to reps).map(_ => leg())
      println(f"""{"path":"$label","rows":$n,"best":${ts.min}%.3f,"median":${
        ts.sorted.apply(reps / 2)}%.3f,"all":[${
        ts.map(v => f"$v%.3f").mkString(",")}]}""")
    }
    legs("columnar")
    sys.props("graft.lake.columnar") = "off"
    legs("row")
    sys.props -= "graft.lake.columnar"
    spark.sql(s"DROP TABLE IF EXISTS $t")

    // ---- DV'd merge-on-read table (VERDICT r16 task 1) ---------------------
    // The decode win must survive row-level ops: a hot MoR table is
    // mostly DV'd between compactions. Same data, ~10% of positions
    // position-deleted, batches selection-filtered at decode.
    val td = "graftlake.decode_bench_dv"
    spark.sql(s"DROP TABLE IF EXISTS $td")
    spark.sql(s"CREATE TABLE $td (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING, " +
      "o_orderdate TIMESTAMP) " +
      "TBLPROPERTIES ('graft.storage' = 'parquet', " +
      "'graft.mode' = 'merge-on-read')")
    (1 to 16).map(_ => base).reduce(_ union _)
      .repartition(16).writeTo(td).append()
    spark.sql(s"DELETE FROM $td WHERE o_orderkey % 10 = 0")
    val nd = spark.table(td).count()
    def legDv(): Double = {
      val t0 = System.nanoTime()
      spark.sql(s"SELECT o_orderstatus, sum(o_totalprice), " +
        "sum(o_orderkey + o_custkey), count(1), min(o_orderpriority), " +
        s"min(o_orderdate) FROM $td GROUP BY o_orderstatus").collect()
      (System.nanoTime() - t0) / 1e9
    }
    sys.props("graft.lake.columnar") = "off"; legDv()
    sys.props -= "graft.lake.columnar"; legDv()
    def legsDv(label: String): Unit = {
      val ts = (1 to reps).map(_ => legDv())
      println(f"""{"path":"$label","rows":$nd,"best":${ts.min}%.3f,"median":${
        ts.sorted.apply(reps / 2)}%.3f,"all":[${
        ts.map(v => f"$v%.3f").mkString(",")}]}""")
    }
    legsDv("columnar_dv")
    sys.props("graft.lake.columnar") = "off"
    legsDv("row_dv")
    sys.props -= "graft.lake.columnar"
    spark.sql(s"DROP TABLE IF EXISTS $td")

    // ---- WRITE phase A/B (VERDICT r16 task 7) ------------------------------
    // Same 16x orders ingest, timed: native ParquetWriteSupport path
    // (default) vs the legacy Group writer
    // (-Dgraft.lake.write.columnar=off equivalent, toggled in-process).
    val tw = "graftlake.decode_bench_w"
    def ingest(label: String): Unit = {
      val ts = (1 to math.max(2, reps / 2)).map { _ =>
        spark.sql(s"DROP TABLE IF EXISTS $tw")
        spark.sql(s"CREATE TABLE $tw (o_orderkey BIGINT, o_custkey " +
          "BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, " +
          "o_orderpriority STRING, o_orderdate TIMESTAMP) " +
          "TBLPROPERTIES ('graft.storage' = 'parquet')")
        val t0 = System.nanoTime()
        (1 to 16).map(_ => base).reduce(_ union _)
          .repartition(16).writeTo(tw).append()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"path":"$label","rows":$n,"best":${ts.min}%.3f,"median":${
        ts.sorted.apply(ts.length / 2)}%.3f,"all":[${
        ts.map(v => f"$v%.3f").mkString(",")}]}""")
    }
    ingest("write_native_warm"); ingest("write_native")
    sys.props("graft.lake.write.columnar") = "off"
    ingest("write_groups")
    sys.props -= "graft.lake.write.columnar"
    spark.sql(s"DROP TABLE IF EXISTS $tw")

    // PURE writer A/B: the end-to-end ingest above is dominated by the
    // source scan + repartition shuffle; this leg times ONLY
    // GraftParquetIO.write on a fixed in-memory row set (the task-side
    // writer's actual work), isolating ParquetWriteSupport vs the
    // per-row Group object trees.
    {
      import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
      import org.apache.spark.sql.types._
      import org.apache.spark.unsafe.types.UTF8String
      val names = Seq("k", "ck", "status", "price", "prio", "ts")
      val types = Seq(LongType, LongType, StringType, DoubleType,
        StringType, TimestampType)
      val nrows = 1000000
      val rows = Vector.tabulate(nrows)(i => new GenericInternalRow(
        Array[Any](i.toLong, (i * 31 % 99991).toLong,
          UTF8String.fromString(if (i % 3 == 0) "O" else "F"),
          i * 0.37, UTF8String.fromString(s"P-${i % 5}"),
          1700000000000000L + i.toLong)))
      val dir = java.nio.file.Files.createTempDirectory("wbench_").toFile
      def wleg(label: String): Unit = {
        val ts = (1 to reps).map { r =>
          val p = new java.io.File(dir, s"$label$r.parquet").getAbsolutePath
          val t0 = System.nanoTime()
          graft.sources.GraftParquetIO.write(p, names, types, rows)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"path":"$label","rows":$nrows,"best":${
          ts.min}%.3f,"median":${ts.sorted.apply(reps / 2)}%.3f,"all":[${
          ts.map(v => f"$v%.3f").mkString(",")}]}""")
      }
      wleg("purewrite_native_warm"); wleg("purewrite_native")
      sys.props("graft.lake.write.columnar") = "off"
      wleg("purewrite_groups")
      sys.props -= "graft.lake.write.columnar"
      graft.sources.GraftParquetIO.deleteRecursively(dir)
    }
    spark.stop()
  }
}
