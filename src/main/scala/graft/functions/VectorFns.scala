package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ARRAY<FLOAT>` embedding columns, composed
  * from higher-order functions (`zip_with`/`aggregate`) so the whole
  * expression stays inside Catalyst — no UDF serialization per row.
  * Computation is done in DOUBLE: float inputs upcast exactly, and the
  * sequential fold order matches other engines' list arithmetic, which
  * keeps cosine scores reproducible for the oracle.
  */
object VectorFns {

  def toDoubleArr(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0d), _ + _)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine when both sides carry a precomputed `nrm` — the form used in
    * top-k search so norms are computed once per vector, not once per
    * pair. */
  def cosineWithNorms(dotCol: Column, na: Column, nb: Column): Column =
    dotCol / (na * nb)
}
