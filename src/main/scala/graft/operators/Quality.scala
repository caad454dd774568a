package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation pass a
  * 100 TB ingest runs before publishing a snapshot (the
  * Deequ/Great-Expectations capability in plain declarative Spark; the
  * reference's pipelines validate by ad-hoc inspection, e.g. the
  * profile row counts `ProfileConversion.scala:139-151` — this is that
  * check as a first-class operator).
  *
  * Three rule families with three distinct scale shapes, kept separate
  * so adding cheap rules never adds passes over the data:
  *
  *  - ROW rules — arbitrary per-row violation predicates (not-null,
  *    range, regex, cross-column invariants). ALL of them evaluate in
  *    ONE scan via conditional aggregation: a new rule is a new
  *    counter in the same partial agg, not a new job. A predicate that
  *    evaluates null (SQL three-valued logic) does not count as a
  *    violation — same semantics both engines.
  *  - UNIQUENESS rules — one map-side-combinable groupBy per key set
  *    (the only shuffles here); violations = rows beyond the first in
  *    each duplicated key group, so a clean key reports 0.
  *  - REFERENTIAL rules — a left-anti probe per foreign key (broadcast
  *    when the dimension is small — Catalyst's call); null FKs are
  *    exempt (SQL FK convention).
  *
  * Output: one row per rule — (rule, violations, pass) — small enough
  * to sit in a publish gate whatever the input size. Everything is
  * count arithmetic: the q136 oracle replays every rule in DuckDB.
  */
object Quality {

  /** Evaluate expectation rules against `df`.
    *
    * @param rowRules    (name, violatedWhen) — counted in one scan
    * @param uniqueRules (name, key columns) — duplicates beyond first
    * @param fkRules     (name, fk column, dimension, dim key column)
    */
  def expect(df: DataFrame,
             rowRules: Seq[(String, Column)],
             uniqueRules: Seq[(String, Seq[String])] = Nil,
             fkRules: Seq[(String, String, DataFrame, String)] = Nil)
      : DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty || fkRules.nonEmpty,
      "no rules")
    val row: Seq[DataFrame] = if (rowRules.isEmpty) Nil else {
      val aggs = rowRules.map { case (n, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(n)
      }
      // melt the single counter row back to (rule, violations) rows;
      // coalesce covers the empty-input sum-of-nothing null
      Seq(df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rowRules.map { case (n, _) =>
          struct(lit(n).as("rule"),
            coalesce(col(n), lit(0L)).as("violations"))
        }: _*)).as("s"))
        .select(col("s.rule").as("rule"), col("s.violations").as("violations")))
    }
    val uniq = uniqueRules.map { case (n, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("violations"))
        .select(lit(n).as("rule"), col("violations"))
    }
    val fks = fkRules.map { case (n, fk, dim, dimKey) =>
      df.select(col(fk)).filter(col(fk).isNotNull)
        .join(dim.select(col(dimKey).as(fk)).distinct(), Seq(fk), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(n).as("rule"), col("violations"))
    }
    (row ++ uniq ++ fks).reduce(_ union _)
      .withColumn("pass", col("violations") === 0L)
  }
}
