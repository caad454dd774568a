package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftshim.PlanBridge

/** Lifecycle registry for `localCheckpoint` blocks.
  *
  * `localCheckpoint` is the right tool for iterative loops (lineage
  * truncation) and shared intermediates (compute-once), but the blocks
  * it pins live until the session stops — over a 68-query bench run
  * dozens of dead checkpoints erode execution memory (the round-2
  * VERDICT's "What's wrong" #2). Discipline:
  *
  *  - operators call [[checkpoint]] instead of `df.localCheckpoint()`,
  *    which registers the backing RDD here;
  *  - loop bodies call [[release]] on each superseded round's result as
  *    soon as its successor is materialized (a lost localCheckpoint
  *    block is unrecoverable, so releasing early also SHRINKS the
  *    failure window at scale — fewer retained blocks, less to lose);
  *  - harness mains (Bench, Verify) call [[releaseAll]] once a query's
  *    action completes, dropping every block the finished query left
  *    behind. Session-lifetime materializations (the co-ship spine)
  *    use [[checkpointPinned]] and survive `releaseAll`; their owners
  *    release them explicitly on eviction.
  *
  * No-checkpoint mode: `-Dgraft.noCheckpoint=true` makes [[checkpoint]]
  * the identity (and [[release]] a structural no-op), so plan auditors
  * ([[Explain]] --audit) can see THROUGH the checkpoint boundary to the
  * full logical plan. Only for small-sf inspection: iterative plans
  * grow per round without truncation.
  */
object Checkpoints {

  /** System property consumed by [[checkpoint]]: "true" disables
    * checkpointing so audits see untruncated plans. */
  val NoCheckpointProp = "graft.noCheckpoint"
  private def disabled: Boolean = java.lang.Boolean.getBoolean(NoCheckpointProp)

  // (context, rddId) -> (rdd, pinned). Keyed by context so concurrent
  // sessions don't release each other's blocks.
  private val tracked = TrieMap[(SparkContext, Int), (RDD[_], Boolean)]()

  /** `df.localCheckpoint()` + registration for [[releaseAll]]. */
  def checkpoint(df: DataFrame): DataFrame = doCheckpoint(df, pin = false)

  /** Like [[checkpoint]] but the block survives [[releaseAll]] — for
    * session-lifetime materialized views whose owner releases them
    * explicitly (e.g. the GraphQueries co-ship spine). */
  def checkpointPinned(df: DataFrame): DataFrame = doCheckpoint(df, pin = true)

  /** Like [[checkpoint]] but applied EVEN in no-checkpoint audit mode —
    * for a loop's INPUT relation when that input is itself an expensive
    * audited-elsewhere subtree (e.g. the ER pair list feeding star
    * contraction: the pair plan is audited via q25 and the loop via
    * q78/q34, while an un-truncated loop would replicate the pair
    * subtree ~4^rounds times and make planning alone intractable). */
  def checkpointAlways(df: DataFrame): DataFrame =
    doCheckpoint(df, pin = false, force = true)

  /** [[checkpointPinned]] ∩ [[checkpointAlways]]: survives
    * [[releaseAll]] AND stays a real checkpoint in no-checkpoint audit
    * mode — for SESSION-LIFETIME materializations that back registered
    * SQL views (`GraphQueries.registerGraphViews`): a view over a
    * non-pinned block breaks unrecoverably after releaseAll (truncated
    * lineage, block gone), and a view over an un-truncated iterative
    * plan makes audit-mode planning intractable. */
  def checkpointPinnedAlways(df: DataFrame): DataFrame =
    doCheckpoint(df, pin = true, force = true)

  private def doCheckpoint(df: DataFrame, pin: Boolean,
                           force: Boolean = false): DataFrame = {
    if (disabled && !force) df
    else {
      val cp = df.localCheckpoint()
      PlanBridge.checkpointRdd(cp).foreach { r =>
        tracked.put((r.sparkContext, r.id), (r, pin))
      }
      cp
    }
  }

  /** Immediately unpersist one checkpointed DataFrame's blocks.
    * Structural no-op when `df` is not a bare checkpoint (so loop code
    * stays correct under no-checkpoint mode). Callers must guarantee no
    * consumer re-executes `df` afterwards — a truncated lineage cannot
    * recompute. */
  def release(df: DataFrame): Unit =
    PlanBridge.checkpointRdd(df).foreach { r =>
      r.unpersist(blocking = false)
      tracked.remove((r.sparkContext, r.id))
    }

  /** [[release]] except in no-checkpoint audit mode, where it keeps
    * the block: with [[checkpoint]] an identity there, a consumer's
    * UNTRUNCATED plan may still reference this [[checkpointAlways]]
    * block, and an eager downstream materialization (e.g.
    * louvainTwoLevel checkpointing the refineCommunities output it
    * builds on) would hit the unrecoverable lost-block error. The
    * skipped block is non-pinned, so the harness' [[releaseAll]]
    * reclaims it after the query. Normal-mode behavior is unchanged. */
  def releaseAfterLoop(df: DataFrame): Unit =
    if (!disabled) release(df)

  /** Unpersist every non-pinned tracked block of this session's context
    * (and forget entries of stopped contexts). Call between queries,
    * after the previous query's action has fully completed. */
  def releaseAll(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    tracked.filterInPlace { case ((c, _), (r, pin)) =>
      if (c.isStopped) false
      else if (c eq sc) {
        if (!pin) r.unpersist(blocking = false)
        pin
      } else true
    }
  }

  /** Number of live tracked blocks for this session (spec hook). */
  def trackedCount(spark: SparkSession, includePinned: Boolean = true): Int =
    tracked.count { case ((c, _), (_, pin)) =>
      (c eq spark.sparkContext) && (includePinned || !pin)
    }
}
