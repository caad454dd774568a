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

  test("globalCumsum equals the single-partition window at every partition count") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "w")
    // shuffled order key (id * 37 mod 501 is a permutation) — the range
    // partitioner must not rely on input order
    val key = pmod(col("id") * 37, lit(501L))
    val want = rows.map { case (i, w) => (i * 37 % 501, i, w) }.sortBy(_._1)
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, c), (k, i, w)) => (k, i, w, c + w) }
      .drop(1).map { case (_, i, _, c) => (i, c) }.toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Relational.globalCumsum(df, Seq(key, col("id")), col("w"),
          "cum", numParts = parts)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"numParts=$parts")
      graft.Checkpoints.releaseAll(spark)
    }
  }

  test("exactQuantiles picks the nearest-rank value, ties and extremes included") {
    val rnd = new scala.util.Random(29)
    // duplicates on purpose: nearest-rank must be tie-indifferent
    val vals = (1 to 400).map(_ => rnd.nextInt(40).toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sorted = vals.sorted
    val probs = Seq(0.0025, 0.25, 0.5, 0.75, 1.0)
    val want = probs.map(p =>
      p -> sorted(math.max(1, math.ceil(p * 400).toInt) - 1)).toMap
    val got = Relational.exactQuantiles(df, col("v"), probs)
      .as[(Double, Double)].collect().toMap
    assert(got == want)
    graft.Checkpoints.releaseAll(spark)
  }

  test("globalCumsum never plans a single-partition global window") {
    val df = (1L to 50L).map(i => (i, i)).toDF("id", "w")
    val plan = Relational.globalCumsum(df, Seq(col("id")), col("w"), "cum", 8)
      .queryExecution.executedPlan.toString
    // the window must be keyed by the internal range-partition id, not
    // an empty (global) partition spec
    assert(plan.contains("_pid"), plan)
    graft.Checkpoints.releaseAll(spark)
  }
}
