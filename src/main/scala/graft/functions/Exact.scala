package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent ("exact") aggregation helpers.
  *
  * Summing doubles is order-dependent: Spark's partial/final two-phase
  * aggregation associates additions differently from DuckDB's sequential
  * scan, so the last bits of a plain `sum(double)` differ between engines
  * and between runs with different partitioning — which breaks the driver's
  * hash comparison AND breaks run-to-run reproducibility at 100 TB (where
  * partition counts change with cluster size).
  *
  * Fix: route the aggregation through DECIMAL. The harness's money-like
  * columns carry ≤2 fractional digits, so `cast(x as decimal(18,2))` is
  * value-preserving, decimal addition is exact and associative (any
  * partial-aggregate tree yields the same result), and the single final
  * decimal→double conversion is deterministic. Same trick in the DuckDB
  * oracle SQL yields bit-identical doubles.
  */
object Exact {
  /** Exact order-independent sum of a ≤`scale`-fractional-digit double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact order-independent average (double sum / long count). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  /** The column as decimal, for exact compound arithmetic before a sum. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** DuckDB-side equivalents, for composing oracle SQL. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(expr: String, scale: Int = 2): String =
    s"(CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / count($expr))"
}
