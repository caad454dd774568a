package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the lakehouse MERGE shape.
  *
  * A mutable table at 100 TB is a base snapshot plus an append-only
  * changelog (op ∈ {I, U, D}, a per-key monotone sequence number); the
  * engine's job is to re-derive state from the log without ever
  * mutating in place. Two consumers of the same log:
  *
  *  - [[snapshot]] — current state: latest change per key wins, deletes
  *    drop the key. ONE shuffle on the key and a WindowGroupLimit
  *    top-1 (no full sort, no driver state), so the apply cost is the
  *    log+base scan plus a single keyed exchange however large the
  *    table — the plan a MERGE INTO compiles to when the update side
  *    can't be broadcast.
  *  - [[history]] — SCD2 validity intervals: every version a key ever
  *    had, stamped [seq, next-seq) by a lead() over the same per-key
  *    ordering. Same single exchange; the window reuses the shuffle
  *    the ranking introduced.
  *
  * Contract: at most one change per (key, seq); base rows carry an
  * implicit seq below every change (the operator stamps them -1), so a
  * key's base row survives only if the log never touched it.
  */
object Cdc {

  private val SeqCol = "__cdc_seq"
  private val OpCol = "__cdc_op"

  /** base ∪ changes with base stamped (seq = -1, op = I), both sides
    * reduced to the payload + lineage columns in a fixed order. */
  private def unified(base: DataFrame, changes: DataFrame, keys: Seq[String],
                      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.toSeq
    val baseSide = base.select(
      payload.map(col) :+ lit(-1L).as(SeqCol) :+ lit("I").as(OpCol): _*)
    val changeSide = changes.select(
      payload.map(col) :+ col(seqCol).cast("long").as(SeqCol)
        :+ col(opCol).as(OpCol): _*)
    baseSide.unionByName(changeSide)
  }

  /** Current-state snapshot: per key, the highest-seq row wins; a
    * winning delete removes the key. Output columns = base's columns. */
  def snapshot(base: DataFrame, changes: DataFrame, keys: Seq[String],
               seqCol: String, opCol: String): DataFrame = {
    val all = unified(base, changes, keys, seqCol, opCol)
    Relational.topKPerGroup(all, keys.map(col),
      Seq(col(SeqCol).desc), 1)
      .filter(col(OpCol) =!= "D")
      .select(base.columns.map(col): _*)
  }

  /** Snapshot DIFF — the reconciliation census between two versions of
    * a keyed table (the check a pipeline runs after replaying a
    * changelog, before swapping a snapshot live): ONE keyed full-outer
    * join, then a single wide aggregate — row counts both sides,
    * keys added / removed, matched keys changed vs identical (null-safe
    * `<=>` over `compareCols`), and a per-column change count for each
    * compared column. One exchange however wide the table; no
    * collect, no row-by-row driver diff.
    *
    * Contract: `keys` must be UNIQUE in both inputs (the snapshot
    * contract every caller already holds) — a duplicated key fans out
    * through the full-outer join and silently inflates every counter;
    * and `compareCols` must be non-empty (there is nothing to diff
    * otherwise). */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty,
      "snapshotDiff needs at least one compare column")
    val b = before.select((keys ++ compareCols).map(col): _*)
      .withColumn("_inb", lit(1L))
    val a = after.select(keys.map(col) ++
        compareCols.map(c => col(c).as(s"${c}__a")): _*)
      .withColumn("_ina", lit(1L))
    val j = b.join(a, keys, "full_outer")
    val both = col("_inb").isNotNull && col("_ina").isNotNull
    val changed = compareCols.map(c => !(col(c) <=> col(s"${c}__a")))
      .reduceLeft(_ || _)
    val aggs = Seq(
      sum(coalesce(col("_inb"), lit(0L))).as("n_before"),
      sum(coalesce(col("_ina"), lit(0L))).as("n_after"),
      sum(when(col("_inb").isNull, 1L).otherwise(0L)).as("n_added"),
      sum(when(col("_ina").isNull, 1L).otherwise(0L)).as("n_removed"),
      sum(when(both && changed, 1L).otherwise(0L)).as("n_changed"),
      sum(when(both && !changed, 1L).otherwise(0L)).as("n_same")) ++
      compareCols.map(c =>
        sum(when(both && !(col(c) <=> col(s"${c}__a")), 1L).otherwise(0L))
          .as(s"chg_$c"))
    j.agg(aggs.head, aggs.tail: _*)
  }

  /** SCD2 history: every version with its validity interval
    * [valid_from, valid_to) in sequence numbers — valid_to is null for
    * the currently-live version, and delete markers close the prior
    * version without emitting one themselves. */
  def history(base: DataFrame, changes: DataFrame, keys: Seq[String],
              seqCol: String, opCol: String): DataFrame = {
    val all = unified(base, changes, keys, seqCol, opCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(SeqCol))
    all.withColumn("valid_to", lead(col(SeqCol), 1).over(w))
      .filter(col(OpCol) =!= "D")
      .select(base.columns.map(col)
        :+ col(SeqCol).as("valid_from") :+ col("valid_to"): _*)
  }
}
