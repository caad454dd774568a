package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial string hash: fold(acc·mult + codePoint) mod `mod`
  * over the string's characters — the codegen form of
  * [[TextFns.polyHash]]'s higher-order-function definition
  * (`aggregate(split(c, ""), ...)`), which interprets two lambda
  * expressions PER CHARACTER and allocates the split array per row.
  * This expression is one JIT-compiled loop per row; on the dedup hot
  * paths (q26 minhash shingling, q27/q60 simhash word hashes) the word
  * hash runs once per token occurrence, so the per-char interpretation
  * overhead multiplies by corpus size.
  *
  * Bit-identical to the HOF form AND the DuckDB oracle's
  * `list_reduce(string_split(w, ''), (a, x) -> (a·mult + ascii(x)) % mod)`:
  * `split(c, "")` yields one element per code point and `ascii` returns
  * the code point, so the fold visits code points in order; all values
  * stay nonnegative (acc < mod < 2^30, mult ≤ 37, cp ≤ 0x10FFFF ⇒ no
  * int64 overflow, `%` ≡ pmod). The ASCII fast path walks UTF-8 bytes
  * directly (a byte < 0x80 IS the code point); any high byte falls back
  * to code-point iteration.
  *
  * Preference order per SURVEY.md §7.3: built-ins compose the rest of
  * the pipeline; the custom Expression is only this scalar kernel.
  */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.compute($c, ${mult}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {

  /** The per-row kernel (also the codegen call target via the static
    * forwarder). */
  def compute(s: UTF8String, mult: Long, mod: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) >= 0) { // ASCII byte == code point
        acc = (acc * mult + bytes(i)) % mod
        i += 1
      } else { // multi-byte char: restart over code points
        return computeCodePoints(s.toString, mult, mod)
      }
    }
    acc
  }

  private def computeCodePoints(str: String, mult: Long, mod: Long): Long = {
    var acc = 0L
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      acc = (acc * mult + cp) % mod
      j += Character.charCount(cp)
    }
    acc
  }

  /** Column form over a STRING column. */
  def hash(c: Column, mult: Long = 31L, mod: Long = 1000000007L): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mult, mod))
  }
}
