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
}
