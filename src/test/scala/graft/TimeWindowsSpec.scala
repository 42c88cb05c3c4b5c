package graft

/** Behavioral checks for the event-time windowing operators that aren't
  * covered by the streaming equivalence tests.
  */
class TimeWindowsSpec extends SparkTestBase {

  test("funnel stages partition the session set exactly") {
    val stages = run("win_funnel_stages", SfOracle).collect()
    val nSessions = run("win_sessionize", SfOracle).count()
    assert(stages.map(_.getLong(1)).sum == nSessions,
      "every session must land in exactly one funnel stage")
    assert(stages.map(_.getLong(0)).forall(s => s >= 0 && s <= 3))
    assert(stages.length >= 2, "fixture must exercise more than one stage")
  }

  test("fill-forward carries observations and only observations") {
    val rows = run("win_fill_forward", SfOracle).collect()
    assert(rows.length == 10000)
    // an observed row's fill is itself
    rows.filter(!_.isNullAt(2)).foreach(r =>
      assert(r.getDouble(3) == r.getDouble(2)))
    // leading gap stays null; every filled value is some observed value
    assert(rows.exists(_.isNullAt(3)), "pre-first-observation rows stay null")
    val observed = rows.filter(!_.isNullAt(2)).map(_.getDouble(2)).toSet
    rows.filter(!_.isNullAt(3)).foreach(r =>
      assert(observed(r.getDouble(3)), "filled values must be observations"))
  }
}
