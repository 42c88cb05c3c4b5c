package graft

/** Byte-stability under reconfiguration: the 100 TB reproducibility
  * contract. A production cluster changes `spark.sql.shuffle.partitions`
  * (AQE, autoscaling, pool changes) without notice; every query whose
  * result depends on partition count is silently broken at scale — double
  * summation order, non-total sort ties, and grouped-batch effects are the
  * classic leaks. The engine's determinism rules (decimal-routed sums,
  * unique-key tiebreaks, integer fixed-point iteration — SURVEY.md §7.4)
  * exist exactly to close them, and this spec pins the property itself:
  * representative queries from every determinism-sensitive family must
  * produce IDENTICAL rows at 3 and 7 shuffle partitions.
  *
  * (Correctness vs DuckDB is the oracle gate's job; this is the
  * complementary engine-internal invariant — same engine, different
  * physical configuration, same bytes.)
  */
class DeterminismSpec extends SparkTestBase {

  /** Families picked for distinct risk surfaces: decimal-sum aggregation,
    * salted two-phase aggregation, window sort + limit, iterative
    * fixed-point (PageRank), LSH banding join, PQ shortlist + re-rank,
    * exact moment arithmetic, and streaming state merge are all covered
    * elsewhere at fixed config — these are the cheap representatives.
    */
  private val Sample = Seq(
    "agg_pricing_summary",   // decimal-routed double sums
    "agg_salted_skew",       // two-phase salted recombination
    "win_rank_orders",       // window sort with unique tiebreaks
    "sort_topk_customers",   // per-partition heaps + driver merge
    "graph_shortest_paths",  // iterative min-agg fixed point
    "sim_ann_pq_adc",        // argmin tiebreaks + shortlist cut + re-rank
    "dedup_exact",           // hash-group representative choice
    "agg_zscore_outliers",   // broadcast moments + integer flags
    "ts_ohlc_bars",          // min_by/max_by selection-aggregate ties
    "text_fuzzy_join",       // blocking join + keep-best resolution
    "curation_mixture_weights", // bottleneck-min + integer floor divs
    "agg_robust_outliers",   // two chained percentile passes
    "join_ivm_view",         // delta-join partials merged into state
    "ts_gap_fill",           // spine join + IGNORE NULLS forward fill
    "ref_scd2_replay",       // double-applied merge over checkpointed state
    "ref_merge_into_sql",    // analyzer-derived MERGE through ReplaceData
    "sim_hard_negatives",    // bounded-heap ties under cross-label scoring
    "text_bigram_surprisal", // integer bit-length surprisal, one division
    "text_bpe_train",        // per-round argmax + checkpointed rewrites
    "curation_split_leakage_free", // split keyed on propagated components
    "curation_dsir_resample",      // integer LLR + one division, top-100
    "text_bm25_topk",        // rational-idf decimal sums + bounded heap
    "sim_mmr_select",        // greedy rounds: 6dp cosines, λ=1/2 exact
    "dedup_stream_admission", // batch-boundary-independent verified pairs
    "sim_rrf_fusion",        // integer ranks -> reciprocal sums
    "text_drift_monitor",    // exact counts cast once, one division
    "dedup_containment",     // integer intersection counts, one division
    "dedup_semantic",        // exact-grid cosines rounded 6dp, argmax ties
    "sim_embedding_drift",   // exact BIGINT grid sums, fixed division order
    "text_vocab_growth",     // pure integer counts + min-bucket
    "join_cogroup_reconcile", // JVM-side BigDecimal sums, unordered groups
    "join_spj_storage",      // key-aligned DSv2 partitions + decimal sums
    "graph_label_propagation", // sync rounds + integer argmax tiebreaks
    "win_running_distinct",  // stacked windows, first-occurrence tiebreaks
    "agg_exchange_reuse",    // reused exchange + double share divisions
    "curation_span_corrupt", // hash noise + ordered struct-sort reassembly
    "curation_epoch_shuffle") // keyed-hash permutation — THE claim is
                              // partition-independence (rand(seed) isn't)

  private def rowsAt(name: String, partitions: Int): Seq[Seq[Any]] = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, partitions.toString)
    try run(name, SfOracle).collect().toSeq.map(_.toSeq)
    finally spark.conf.set(key, prev)
  }

  Sample.foreach { name =>
    test(s"$name is byte-identical at 3 vs 7 shuffle partitions") {
      assert(rowsAt(name, 3) == rowsAt(name, 7))
    }
  }
}
