package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: inner join on `e1 OR e2` (both equi-predicates
  * spanning the two sides) → UNION ALL of two hash-joinable equi-joins.
  *
  * Spark plans a disjunctive join condition as a nested-loop join —
  * O(|L|·|R|) row comparisons, the difference between hours and seconds
  * at scale (the reference hits exactly this with its FK-closure join
  * matching parent OR child, `MagDwarf.scala:115-122`). The rewrite is
  * duplicate-safe: the second branch takes `e2 AND NOT coalesce(e1,
  * false)`, so a pair matching both predicates flows through exactly
  * one branch — the same partition-of-the-OR-set identity as the
  * manual form in [[graft.operators.Joins.disjunctiveEquiJoin]].
  *
  * The second branch re-aliases its output (fresh expression ids), as
  * Union children must not share output attributes post-analysis.
  *
  * Activation: `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * dynamically via `spark.experimental.extraOptimizations`.
  */
object DisjunctiveJoinRewrite extends Rule[LogicalPlan] {

  private def spansBothSides(e: EqualTo, left: LogicalPlan,
                             right: LogicalPlan): Boolean = {
    val l = left.outputSet
    val r = right.outputSet
    (e.left.references.subsetOf(l) && e.right.references.subsetOf(r)) ||
      (e.left.references.subsetOf(r) && e.right.references.subsetOf(l))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner,
        Some(Or(e1: EqualTo, e2: EqualTo)), hint)
        if spansBothSides(e1, left, right) && spansBothSides(e2, left, right) =>
      val first = Join(left, right, Inner, Some(e1), hint)
      val exclusive = And(e2,
        Not(Coalesce(Seq(e1, Literal.FalseLiteral))))
      val second = Project(
        j.output.map(a => Alias(a, a.name)()),
        Join(left, right, Inner, Some(exclusive), hint))
      Union(Seq(first, second))
  }
}

/** `spark.sql.extensions` entry point registering the engine's rules
  * and planner strategies. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DisjunctiveJoinRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
