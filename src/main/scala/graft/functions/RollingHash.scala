package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's UTF-8 bytes:
  *
  *   acc₀ = byte₀ ; accₖ = (accₖ₋₁ · 31 + byteₖ) mod (2³¹−1)
  *
  * A native Catalyst expression with whole-stage codegen — stays inside the
  * generated loop, no UDF serialization, no row boxing. The fold starts at
  * the first byte (not 0) to match DuckDB's two-argument `list_reduce`, so
  * the fingerprint is oracle-checkable; the modulus is < 2³¹ so the update
  * never overflows a long (Spark 4 ANSI mode would raise).
  *
  * Document-fingerprinting role (the reference has no such operator — this
  * is part of the LLM-pipeline extension surface): a cheap order-sensitive
  * content fingerprint, complementing md5 (order-sensitive, cryptographic)
  * and MinHash/SimHash (order-insensitive, similarity-preserving) in
  * [[graft.operators.Dedup]].
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    if (bytes.length > 0) {
      acc = bytes(0) & 0xffL
      var k = 1
      while (k < bytes.length) {
        acc = (acc * 31 + (bytes(k) & 0xffL)) % RollingHash.Mod
        k += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |if ($bytes.length > 0) {
         |  $acc = $bytes[0] & 0xffL;
         |  for (int $k = 1; $k < $bytes.length; $k++) {
         |    $acc = ($acc * 31 + ($bytes[$k] & 0xffL)) % ${RollingHash.Mod}L;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Mod: Long = 2147483647L // 2^31 - 1

  /** Column API: `rolling_hash($"text")`. */
  def apply(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
