package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.DisjunctiveJoinRewrite

class DisjunctiveJoinRewriteSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DisjunctiveJoinRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == DisjunctiveJoinRewrite)
  }

  private lazy val l = Seq((1L, 10L), (2L, 20L), (7L, 7L)).toDF("k1", "k2")
  private lazy val r = Seq(1L, 20L, 7L, 99L).toDF("k")

  test("OR equi-join is rewritten away from nested-loop join") {
    withRule {
      val df = l.join(r, col("k1") === col("k") || col("k2") === col("k"))
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("NestedLoop"), physical)
      assert(physical.contains("Union"), physical)
    }
  }

  test("rewritten join returns the exact OR-join rows, no duplicates") {
    val expected = l.join(r, col("k1") === col("k") || col("k2") === col("k"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val got = withRule {
      l.join(r, col("k1") === col("k") || col("k2") === col("k"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
    }
    assert(got == expected)
    assert(got.count(_ == (7L, 7L, 7L)) == 1) // both-predicates row: once
  }

  test("non-splittable OR conditions are left untouched") {
    withRule {
      // second disjunct references only one side → not rewritten
      val df = l.join(r, col("k1") === col("k") || col("k2") > 5)
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Union"), physical)
    }
  }
}
