package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BoundedTopK, DotProduct, MisraGries, RollingHash}

/** Session extension registering the engine's native expressions for SQL
  * use (`SELECT rolling_hash(text), dot_product(a, b) ...`) and its
  * optimizer rules ([[graft.plans.ThresholdLevenshteinRule]]). Enable with
  * `spark.sql.extensions=graft.GraftExtensions` — the harness mains
  * (Verify/Bench) and the test base do. This is the standard injection
  * point for custom Catalyst pieces; if a whole-operator extension ever
  * becomes necessary (none is for the reference surface — SURVEY.md §4.2),
  * its Strategy would register here too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => graft.plans.ThresholdLevenshteinRule)
    // physical: global-sort elision over manifest-certified ordered
    // lake scans (runs post-EnsureRequirements in AQE preparation)
    extensions.injectQueryStagePrepRule(_ =>
      graft.plans.OrderedScanSortElision)
    extensions.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "rolling_hash(str) takes one argument")
        RollingHash(exprs.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("bounded_top_k"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_top_k"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "bounded_top_k(score, id, k) takes three arguments")
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"bounded_top_k k must be an INT literal, got $other")
        }
        BoundedTopK(exprs.head, exprs(1), k)
      }))
    extensions.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[MisraGries].getName, "heavy_hitters"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "heavy_hitters(item, capacity) takes two arguments")
        val cap = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"heavy_hitters capacity must be an INT literal, got $other")
        }
        MisraGries(exprs.head, cap)
      }))
    extensions.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(exprs.head, exprs(1))
      }))
  }
}
