package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("densifyCumulative zero-fills missing periods and accumulates") {
    val facts = Seq((1L, 2000), (1L, 2000), (1L, 2002), (2L, 2001))
      .toDF("e", "y")
    val got = Relational.densifyCumulative(facts, col("e"), col("y"), "e", "y")
      .select("e", "y", "n", "cum").as[(Long, Int, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2000, 2L, 2L), (1L, 2001, 0L, 2L), (1L, 2002, 1L, 3L),
      (2L, 2000, 0L, 0L), (2L, 2001, 1L, 1L), (2L, 2002, 0L, 1L)))
  }

  test("topKPerGroup is deterministic under ties") {
    val df = Seq((1L, 10, 100L), (1L, 10, 101L), (1L, 10, 102L), (2L, 5, 103L))
      .toDF("g", "score", "id")
    val got = Relational.topKPerGroup(df, Seq(col("g")),
        Seq(col("score").desc, col("id")), 2)
      .select("g", "id", "rn").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 1L), (1L, 101L, 2L), (2L, 103L, 1L)))
  }
}
