package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  test("agg_pricing_summary covers every (returnflag, linestatus) group") {
    val df = run("agg_pricing_summary")
    assert(df.count() == 6) // 3 flags × 2 statuses in the generator
    assert(df.filter(col("sum_qty") <= 0).count() == 0)
  }

  test("approx distinct is within the configured 2% rsd of exact") {
    // the query now SELF-GATES (within_band rides the row and the
    // DuckDB oracle pins it TRUE); this spec re-checks both legs: the
    // exact counts match the independently-oracled agg_distinct_users
    // and every band boolean holds
    val exact = run("agg_distinct_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("agg_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"${r.getString(0)}: exact-count leg drifted")
      assert(r.getBoolean(2),
        s"${r.getString(0)}: approx drifted outside the 10% band")
    }
  }

  test("merged daily HLL sketches track exact monthly distincts") {
    // the query's own exact leg must agree with an independently-derived
    // exact count (the oracle re-derives the same thing in DuckDB), and
    // the sketch-union estimate must sit inside the gated band
    val exact = graft.sources.Tables(spark, Sf, "events")
      .select(col("ts"), col("event_type"), col("user_id"))
      .groupBy(date_trunc("MONTH", col("ts")).as("month"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val merged = run("agg_sketch_merge").collect()
      .map(r => (r.get(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(merged.keySet == exact.keySet, "same groups must appear")
    exact.foreach { case (k, n) =>
      val (ne, within) = merged(k)
      assert(ne == n, s"$k: query's exact leg $ne != independent exact $n")
      assert(within, s"$k: sketch-union drifted outside the 10% band")
    }
  }

  test("rollup grand-total row equals the full customer count") {
    val total = run("agg_rollup")
      .filter(col("nation") === "(all)" && col("segment") === "(all)")
      .collect()
    assert(total.length == 1)
    val nCust = spark.read.parquet(s"$Sf/customer.parquet").count()
    assert(total.head.getAs[Long]("n_cust") == nCust)
  }

  test("win_rank_orders keeps at most 3 ranks per customer") {
    val over = run("win_rank_orders").groupBy(col("o_custkey"))
      .agg(max(col("rnk")).as("m")).filter(col("m") > 3).count()
    assert(over == 0)
  }

  test("semi and anti joins partition the customer set") {
    val df = run("join_semi_anti")
    val nCust = spark.read.parquet(s"$Sf/customer.parquet").count()
    assert(df.count() == nCust)
    assert(df.select(col("c_custkey")).distinct().count() == nCust)
  }

  test("top-k plan avoids a global sort (TakeOrderedAndProject)") {
    val plan = run("sort_topk_customers").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "limit-under-sort must plan as per-partition heaps, not a full sort")
  }

  test("as-of join matches are at-or-before, and click events match themselves") {
    val df = run("join_asof").cache()
    val nEvents = spark.read.parquet(s"$Sf/events.parquet").count()
    assert(df.count() == nEvents, "left as-of keeps every probe row")
    assert(df.filter(col("last_click_ts") > col("ts")).count() == 0,
      "an as-of match must not come from the future")
    // a click whose (user, ts) is unique matches itself
    val selfMiss = df.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(count(lit(1)).as("c"), max(col("last_click_ts")).as("m"))
      .filter(col("c") === 1 && col("m") =!= col("ts"))
      .count()
    assert(selfMiss == 0, "unique click rows must as-of-match themselves")
    df.unpersist()
  }

  test("pivot columns partition the unpivoted total") {
    val df = run("agg_pivot")
    assert(df.count() == 5) // five order priorities
    val pivotTotal = df.select(
      sum(coalesce(col("sum_f"), lit(0.0)) + coalesce(col("sum_o"), lit(0.0))
        + coalesce(col("sum_p"), lit(0.0))).as("t")).collect().head.getDouble(0)
    val direct = spark.read.parquet(s"$Sf/orders.parquet")
      .select(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .collect().head.getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6,
      s"pivot cells must partition the total: $pivotTotal vs $direct")
  }

  test("percentiles are ordered within each group") {
    val bad = run("agg_percentiles")
      .filter(col("p25") > col("p50") || col("p50") > col("p75")).count()
    assert(bad == 0)
  }

  test("sketch percentiles stay close to the exact percentiles") {
    // the query now SELF-GATES (rank-band booleans ride the row and the
    // DuckDB oracle pins them TRUE alongside re-derived exact
    // percentiles); this spec re-checks the exact leg against the
    // independently-oracled agg_percentiles and every band boolean
    val exact = run("agg_percentiles").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val rows = run("agg_approx_percentiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) = exact(r.getString(0))
      assert((r.getDouble(1), r.getDouble(2), r.getDouble(3))
        == ((p25, p50, p75)), s"${r.getString(0)}: exact leg drifted")
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"${r.getString(0)}: a digest value left its exact rank band")
    }
  }

  test("grouping sets emit one row per status, per priority, plus grand total") {
    val df = run("agg_grouping_sets")
    assert(df.count() == 3 + 5 + 1) // statuses + priorities + ()
    val grand = df.filter(col("status") === "(all)" && col("priority") === "(all)")
    assert(grand.count() == 1)
    val nOrders = spark.read.parquet(s"$Sf/orders.parquet").count()
    assert(grand.collect().head.getAs[Long]("n") == nOrders)
  }

  test("range frame counts at least the current row and is capped by user total") {
    val df = run("win_range_frame").cache()
    assert(df.filter(col("n_trailing_30m") < 1).count() == 0)
    val perUser = spark.read.parquet(s"$Sf/events.parquet")
      .groupBy(col("user_id")).agg(count(lit(1)).as("total"))
    val over = df.join(perUser, Seq("user_id"))
      .filter(col("n_trailing_30m") > col("total")).count()
    assert(over == 0)
    df.unpersist()
  }

  test("weighted-average UDAF sits inside the per-group price range") {
    val bounds = spark.read.parquet(s"$Sf/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
    val out = run("agg_custom_udaf")
      .join(bounds, Seq("l_returnflag", "l_linestatus"))
      .filter(col("wavg_price") < col("lo") || col("wavg_price") > col("hi"))
      .count()
    assert(out == 0)
  }

  test("running total is monotone for non-negative values per user") {
    val bad = run("win_running_total")
      .withColumn("prev", lag(col("running_value"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("event_id"))))
      .filter(col("prev").isNotNull && col("running_value") < col("prev"))
      .join(
        spark.read.parquet(s"$Sf/events.parquet").filter(col("value") < 0)
          .select(col("event_id")),
        Seq("event_id"), "left_anti")
      .count()
    assert(bad == 0)
  }

  test("bounded_top_k is callable from SQL via the session extension") {
    spark.read.parquet(s"$Sf/customer.parquet")
      .createOrReplaceTempView("graft_spec_cust")
    val viaSql = spark.sql(
      """SELECT c_nationkey, t.score AS c_acctbal, t.id AS c_custkey
        |FROM (SELECT c_nationkey,
        |        bounded_top_k(c_acctbal, c_custkey, 3) AS top
        |      FROM graft_spec_cust GROUP BY c_nationkey)
        |LATERAL VIEW explode(top) AS t
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin)
      .collect().map(_.toSeq)
    val viaApi = run("sort_topk_per_group")
      .select("c_nationkey", "c_acctbal", "c_custkey")
      .collect().map(_.toSeq)
    assert(viaSql.sameElements(viaApi))
  }

  test("Misra-Gries sketch keeps every above-threshold item under eviction") {
    import spark.implicits._
    // planted zipf-ish skew with far more distinct keys (200) than sketch
    // capacity (16), spread over 32 partitions so partial sketches evict
    // AND the merge cut path runs. Guarantee under test: every key with
    // count > n/(capacity+1) survives, for this arbitrary partitioning.
    val rows = (0 until 200).flatMap { k =>
      val reps = if (k < 5) 400 else if (k < 30) 40 else 3
      Seq.fill(reps)(k.toLong)
    }
    val n = rows.length
    val df = rows.toDF("k").repartition(32)
    val sketch = df
      .agg(graft.functions.MisraGries(col("k"), 16).as("s"))
      .select(explode(col("s")).as("c"))
      .select(col("c.item").as("k"))
      .collect().map(_.getLong(0)).toSet
    assert(sketch.size <= 16, s"sketch must stay bounded, got ${sketch.size}")
    val mustSurvive = (0 until 200)
      .filter { k =>
        val reps = if (k < 5) 400 else if (k < 30) 40 else 3
        reps.toLong * (16 + 1) > n
      }.map(_.toLong).toSet
    assert(mustSurvive.nonEmpty, "fixture must plant guaranteed survivors")
    assert(mustSurvive.subsetOf(sketch),
      s"guaranteed heavy keys ${mustSurvive -- sketch} evicted")
    // SQL surface parity via the session extension
    df.createOrReplaceTempView("graft_mg_v")
    val viaSql = spark
      .sql("SELECT heavy_hitters(k, 16) AS s FROM graft_mg_v")
      .select(explode(col("s")).as("c")).select(col("c.item"))
      .collect().map(_.getLong(0)).toSet
    assert(mustSurvive.subsetOf(viaSql))
  }

  test("ref_audit_observe lands its metrics on the query's own pass") {
    // the production circuit-breaker pattern: row counts / violation
    // counts collected as accumulators on the SAME pass that does the
    // work — a 100 TB pipeline cannot afford a second validation scan,
    // and a .count() on the side would plan one
    val (df, obs) = operators.Relational.auditedRevenue(spark, Sf)
    df.collect()
    val m = obs.get
    val cleaned = spark.read.parquet(s"$Sf/lineitem.parquet")
      .filter(col("l_quantity") > 0)
    assert(m("rows_out") == cleaned.count(),
      "metrics must see every cleaned row exactly once")
    assert(m("high_discount_rows") ==
      cleaned.filter(col("l_discount") > 0.05).count(),
      "violation counter must match a standalone scan")
    val revenue = cleaned
      .agg(graft.functions.Exact.dsum(col("l_extendedprice")))
      .collect()(0).getDouble(0)
    assert(m("gross_revenue") == revenue,
      "observed decimal revenue must be bitwise equal to the exact agg")
  }

  test("regression fit diagnostics are bounded and consistent with the line") {
    val fit = run("agg_group_regression_fit").collect()
      .filter(r => !r.isNullAt(2)) // degenerate groups emit NULL by contract
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val line = run("agg_group_regression").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fit.nonEmpty, "generated events must have non-degenerate groups")
    fit.foreach { case (g, (n, r2, resid)) =>
      assert(n == line(g), s"$g: n must match the line query")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$g: R² out of [0,1]: $r2")
      assert(resid >= 0.0, s"$g: negative residual stddev: $resid")
      // value-vs-time is near-noise in the generated events: a strong fit
      // (R² near 1) would mean the fixture or the math broke
      assert(r2 < 0.5, s"$g: implausibly strong trend fit, R²=$r2")
    }
  }

  test("regression line+fit NULL degenerate groups, exact on crafted ones") {
    // Spark IEEE x/0 (NaN/Inf) and DuckDB x/0 (NULL) diverge, and DuckDB
    // RAISES on sqrt(tiny negative) where Spark yields NaN — so degenerate
    // groups must short-circuit to NULL and the sqrt argument must be
    // clamped on BOTH sides. This fixture forces every degenerate shape the
    // harness events never contain: a 1-row group, an all-same-timestamp
    // group (zero x-variance), a constant-value group (zero y-variance),
    // and a mathematically perfect fit (the sqrt-clamp case).
    import spark.implicits._
    val base = 1704067200L
    val rows = Seq(
      ("single", 0L, 12.34),
      ("same_ts", 50L, 1.00), ("same_ts", 50L, 2.00), ("same_ts", 50L, 3.00),
      ("const_y", 0L, 5.00), ("const_y", 10L, 5.00), ("const_y", 20L, 5.00),
      ("perfect", 0L, 10.00), ("perfect", 100L, 13.00),
      ("perfect", 200L, 16.00),
      ("normal", 0L, 1.00), ("normal", 10L, 2.50), ("normal", 20L, 3.00))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_reg_degenerate").toString
    rows.zipWithIndex
      .map { case ((g, off, v), i) => (i.toLong, base + off, 1L, g, v, "{}") }
      .toDF("event_id", "epoch", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_seconds(col("epoch"))
          .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val line = run("agg_group_regression", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(line("single") == ((1L, None, None)), s"got ${line("single")}")
    assert(line("same_ts") == ((3L, None, None)), s"got ${line("same_ts")}")
    assert(line("const_y") == ((3L, Some(0.0), Some(500.0))))
    assert(line("perfect") == ((3L, Some(3.0), Some(1000.0))))
    assert(line("normal") == ((3L, Some(10.0), Some(116.666667))))

    val fit = run("agg_group_regression_fit", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(fit("single") == ((1L, None, None)), s"got ${fit("single")}")
    assert(fit("same_ts") == ((3L, None, None)), s"got ${fit("same_ts")}")
    // zero y-variance: R² undefined (NULL), residuals exactly zero
    assert(fit("const_y") == ((3L, None, Some(0.0))))
    assert(fit("perfect") == ((3L, Some(1.0), Some(0.0))))
    assert(fit("normal") == ((3L, Some(0.923077), Some(23.570226))))
  }

  test("corr moments NULL the pairs touching a zero-variance column") {
    // same degenerate-group contract as the regression family: a constant
    // column has no defined correlation, and the unguarded expressions
    // diverge cross-engine (Spark x/0 → NaN vs DuckDB NULL; DuckDB raises
    // on sqrt of a rounded tiny negative). Constant l_discount ⇒ both
    // disc corrs NULL, price×qty unaffected — the DuckDB oracle on this
    // exact fixture returns (3, 0.981980506062, NULL, NULL).
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corr_degenerate").toString
    Seq((1.00, 10.00, 0.05), (2.00, 30.00, 0.05), (3.00, 40.00, 0.05))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = run("agg_corr_moments", dir).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.981980506062, s"got ${r.getDouble(1)}")
    assert(r.isNullAt(2) && r.isNullAt(3),
      "corrs against the constant column must be NULL")
  }
}
