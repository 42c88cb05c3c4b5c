package graft

/** Behavior checks on the graph operators beyond the DuckDB oracle gate:
  * the invariants of the fixed-point PageRank recurrence itself.
  */
class GraphSpec extends SparkTestBase {

  test("pagerank covers every node and never drops below the base mass") {
    val rows = run("graph_pagerank").collect()
    assert(rows.length == 25, "one row per nation")
    // r' = 0.15·S + 0.85·(non-negative contributions): base is a floor
    assert(rows.forall(_.getLong(1) >= 150000L))
  }

  test("pagerank concentrates mass on linked nodes") {
    val ranks = run("graph_pagerank").collect().map(_.getLong(1))
    // the sparsified trade graph is non-empty, so some node must end above
    // its starting mass — all-equal ranks would mean the edge cut dropped
    // everything and the recurrence degenerated to the base term
    assert(ranks.max > 1000000L, s"expected authority above 1.0·S, got ${ranks.max}")
    assert(ranks.distinct.length > 5, "degenerate rank distribution")
  }

  test("pagerank is bit-stable across runs (integer arithmetic only)") {
    val a = run("graph_pagerank").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = run("graph_pagerank").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.sameElements(b))
  }
}
