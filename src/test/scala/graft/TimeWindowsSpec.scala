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
}
