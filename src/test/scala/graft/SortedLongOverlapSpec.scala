package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedLongOverlap

/** The merge-scan overlap expression must equal
  * size(array_intersect(...)) on sorted distinct arrays, through both
  * the codegen path (normal execution) and the interpreted eval. */
class SortedLongOverlapSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def randomSorted(rnd: scala.util.Random, n: Int): Seq[Long] =
    Seq.fill(n)(rnd.nextInt(40).toLong).distinct.sorted

  test("overlap ≡ array_intersect size on random sorted distinct arrays") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map { i =>
      (i.toLong, randomSorted(rnd, 1 + rnd.nextInt(25)),
        randomSorted(rnd, 1 + rnd.nextInt(25)))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        SortedLongOverlap.overlap(col("a"), col("b")).as("merge_co"),
        size(array_intersect(col("a"), col("b"))).as("hash_co"))
    assert(df.filter(col("merge_co") =!= col("hash_co")).isEmpty)
    assert(df.agg(sum(col("merge_co"))).as[Long].head() > 0)
  }

  test("interpreted eval matches codegen semantics incl. edge cases") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    def ov(a: Seq[Long], b: Seq[Long]): Int =
      SortedLongOverlap(lit(a), lit(b)).eval(null).asInstanceOf[Int]
    assert(ov(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) == 2)
    assert(ov(Seq.empty, Seq(1L)) == 0)
    assert(ov(Seq(5L), Seq(5L)) == 1)
    assert(ov(Seq(1L, 9L), Seq(2L, 3L, 4L)) == 0)
  }
}
