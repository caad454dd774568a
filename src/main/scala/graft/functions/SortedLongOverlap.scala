package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst intersection-size over two ASCENDING-sorted
  * ARRAY<BIGINT> columns with distinct elements, via a single merge
  * scan (`doGenCode` emits the tight two-pointer loop).
  *
  * This is the verification kernel of the PPJoin similarity join
  * ([[graft.operators.Dedup.ngramJaccardPairs]]): per candidate pair
  * it replaces `size(array_intersect(a, b))`, which builds a hash set
  * per row pair, with an allocation-free O(|a|+|b|) merge — the arrays
  * arrive pre-sorted from the plan's `array_sort`, so sortedness is a
  * data-flow invariant, not a per-row cost.
  *
  * Contract: both inputs sorted ascending with no duplicates and no
  * null elements (the shingle-hash sets satisfy all three). Unsorted
  * input undercounts — it is NOT detected.
  */
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedLongOverlap {
  /** Column form; inputs must be ascending-sorted distinct ARRAY<BIGINT>. */
  def overlap(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      SortedLongOverlap(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
