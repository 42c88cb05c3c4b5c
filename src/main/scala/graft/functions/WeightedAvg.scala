package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: exact decimal running sums (order-independent — any
  * partial-aggregate tree yields the same result; see [[Exact]]).
  */
case class WAvgBuf(sumPQ: BigDecimal, sumQ: BigDecimal)

/** Typed custom UDAF (the `Aggregator` axis the reference has no analog
  * for): quantity-weighted average price, exact under reordering.
  *
  * Inputs are quantized to 2 decimal places exactly like the oracle's
  * `CAST(x AS DECIMAL(18,2))`, summed in exact decimal arithmetic, and
  * divided once as doubles at finish — so Spark's two-phase (partial +
  * merge) aggregation and DuckDB's sequential scan produce bit-identical
  * doubles.
  *
  * Scale notes: an Aggregator plans as ObjectHashAggregate with map-side
  * partials — the shuffle carries one small buffer per group, not rows.
  * Catalyst can't see inside the JVM lambda (no codegen, no pushdown
  * through it), which is why the engine prefers built-in expressions
  * everywhere else; this exists to cover the genuinely-custom-aggregation
  * axis with the determinism discipline intact.
  */
object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  private def d2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))

  override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf = {
    val p = d2(a._1)
    val q = d2(a._2)
    WAvgBuf(b.sumPQ + p * q, b.sumQ + q)
  }

  override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
    WAvgBuf(x.sumPQ + y.sumPQ, x.sumQ + y.sumQ)

  override def finish(b: WAvgBuf): Double =
    if (b.sumQ.signum == 0) 0.0 else b.sumPQ.toDouble / b.sumQ.toDouble

  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
