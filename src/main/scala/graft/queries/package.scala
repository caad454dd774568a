package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query surface.
  *
  * [[dec]] is the engine's oracle-parity rule for money arithmetic:
  * both Spark and the DuckDB oracle sum doubles in engine-specific
  * order, and a sum landing exactly on a round(x, 2) boundary flips the
  * last cent on 1e-10 binary noise. Casting to DECIMAL(18,2) before
  * multiply/sum makes the arithmetic exact and the rounding
  * deterministic on both engines; the cast to double happens only on
  * the final, already-rounded value.
  */
package object queries {
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  def ts(s: String): Column = lit(s).cast("timestamp")

  /** THE deterministic key hash of the query surface (q67 sample, q69
    * KMV, q73 stratified sample, q76 token budget, q79 split): Lehmer/
    * glibc LCG in exact int64 arithmetic, identical on both engines
    * for NON-NEGATIVE keys below ~8.3e9 (callers must guard
    * `key >= 0`: Spark's pmod maps negatives into [0, m) where
    * DuckDB's % keeps the sign). One definition — a same-wrong-constant
    * drift between copies is invisible to the oracle. */
  val LcgMod = 2147483647L
  def lcgHash(c: Column): Column =
    org.apache.spark.sql.functions.pmod(
      c * 1103515245L, lit(LcgMod))

  /** The DuckDB twin of [[lcgHash]] (plain `%` — non-negative input
    * makes it equal to pmod). */
  def lcgHashSql(expr: String): String =
    s"(($expr) * 1103515245) % $LcgMod"
}
