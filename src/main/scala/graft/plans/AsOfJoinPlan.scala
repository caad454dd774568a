package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator custom-plan path (preference
  * (c) of SURVEY.md §7.3 / the build brief): a `LogicalPlan` node, a
  * `SparkStrategy`, and a physical `SparkPlan`, registered through
  * `spark.experimental.extraStrategies` (or `GraftExtensions` for
  * `spark.sql.extensions`).
  *
  * Semantics: for each left row, the single LATEST right row of the
  * same key with `rightTime <= leftTime`; right payload columns are
  * null when no right row precedes the left row. Right rows should be
  * unique per (key, time) for determinism. NULL handling follows SQL
  * join convention — a null key or time never matches (left rows get a
  * null payload; right rows are skipped) — which is also DuckDB's ASOF
  * behavior. This is the ONE divergence from the composed form
  * [[graft.operators.Joins.asOfJoin]] (identical on null-free keys and
  * times, which the equivalence spec checks): the window composition
  * groups null keys into one partition and sorts null times first, so
  * it can match them.
  *
  * Physical shape — the 100 TB reason this beats the union+window
  * composition: both sides hash-partition on their key and sort by
  * (key, time) — exactly what Catalyst's EnsureRequirements inserts for
  * the declared distribution/ordering — then ONE streaming merge pass
  * emits each left row joined to the last right row seen for its key.
  * No union row blow-up, no `last(...) over rows-unbounded` window
  * state, and the right side's payload never travels through a window
  * buffer: per partition the operator keeps ONE buffered right row.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValues: Seq[Attribute]) extends BinaryNode {
  require(DataTypeUtils.sameType(leftKey.dataType, rightKey.dataType),
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(DataTypeUtils.sameType(leftTime.dataType, rightTime.dataType),
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sorted-merge as-of join. Catalyst satisfies the
  * declared [[requiredChildDistribution]]/[[requiredChildOrdering]]
  * with hash exchanges + sorts (reused when the data is already
  * partitioned, e.g. bucketed tables), so `doExecute` is a pure
  * zip-partitions merge: advance the right iterator while its (key,
  * time) is at or before the left row's, remembering the latest right
  * payload per key — O(|L|+|R|) per partition, constant memory. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValues: Seq[Attribute]) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val rightVals = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyB = BindReferences.bindReference(leftKey, leftOut)
      val lTimeB = BindReferences.bindReference(leftTime, leftOut)
      val rKeyB = BindReferences.bindReference(rightKey, rightOut)
      val rTimeB = BindReferences.bindReference(rightTime, rightOut)
      val valueProj = UnsafeProjection.create(
        rightVals.map(v => BindReferences.bindReference(v: Expression, rightOut)))
      // final projection guarantees UnsafeRow output for parents
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullValues = new GenericInternalRow(rightVals.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // next unconsumed right row's (key, time) — value-copied because
        // sorter iterators reuse row buffers
        private var havePeek = false
        private var peekKey: Any = null
        private var peekTime: Any = null
        private var peekRow: InternalRow = null
        // latest right row consumed, by key
        private var lastKey: Any = null
        private var lastValues: UnsafeRow = null

        private def loadPeek(): Unit = {
          havePeek = false
          while (!havePeek && rIt.hasNext) {
            val r = rIt.next()
            val k = rKeyB.eval(r)
            val t = rTimeB.eval(r)
            if (k != null && t != null) { // null key/time rows never match
              peekKey = InternalRow.copyValue(k)
              peekTime = InternalRow.copyValue(t)
              peekRow = r
              havePeek = true
            }
          }
        }
        loadPeek()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKeyB.eval(l)
          val lt = lTimeB.eval(l)
          if (lk == null || lt == null) return resultProj(joined(l, nullValues))
          // consume right rows with (key, time) <= (lk, lt)
          var cont = havePeek
          while (cont) {
            val c = keyOrd.compare(peekKey, lk)
            if (c < 0 || (c == 0 && timeOrd.compare(peekTime, lt) <= 0)) {
              lastKey = peekKey
              lastValues = valueProj(peekRow).copy()
              loadPeek()
              cont = havePeek
            } else cont = false
          }
          if (lastKey != null && keyOrd.compare(lastKey, lk) == 0)
            resultProj(joined(l, lastValues))
          else
            resultProj(joined(l, nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
