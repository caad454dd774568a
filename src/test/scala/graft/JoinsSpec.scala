package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("disjunctiveEquiJoin equals the OR join, including both-match rows") {
    val l = Seq((1L, 10L), (2L, 20L), (3L, 30L), (7L, 7L)).toDF("k1", "k2")
    val r = Seq(1L, 20L, 7L, 99L).toDF("k")
    val rewritten = Joins.disjunctiveEquiJoin(l, r,
        col("k1") === col("k"), col("k2") === col("k"))
      .select("k1", "k2", "k").as[(Long, Long, Long)].collect().sorted.toSeq
    val direct = l.join(r, col("k1") === col("k") || col("k2") === col("k"))
      .select("k1", "k2", "k").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(rewritten == direct)
    assert(rewritten.contains((7L, 7L, 7L))) // matched by BOTH → exactly once
  }

  test("disjunctiveEquiJoin plans hash joins, not nested loop") {
    val l = Seq((1L, 10L)).toDF("k1", "k2")
    val r = Seq(1L).toDF("k")
    val plan = Joins.disjunctiveEquiJoin(l, r,
      col("k1") === col("k"), col("k2") === col("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("saltedJoin equals the plain join on skewed keys") {
    val big = (1L to 1000L).map(i => (if (i % 10 == 0) 42L else i, i))
      .toDF("k", "payload") // key 42 is hot
    val small = Seq((42L, "hot"), (7L, "cold")).toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "payload", "tag")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Joins.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "tag")
      .as[(Long, Long, String)].collect().sorted.toSeq
    // 100 multiples of 10 + i=42 itself on the hot key, + one cold row
    assert(salted == plain && plain.size == 102)
  }

  test("asOfJoin picks the latest right row at or before each left time") {
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 15L, 9.0))
      .toDF("qk", "qt", "price")
    val trades = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (2L, 99L))
      .toDF("k", "t")
    val got = Joins.asOfJoin(trades, quotes, "k", "qk", "t", "qt", Seq("price"))
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 5L, None),        // nothing at or before t=5
      (1L, 10L, Some(1.0)),  // same-instant quote visible (<=)
      (1L, 25L, Some(2.0)),
      (2L, 14L, None),
      (2L, 99L, Some(9.0))))
  }

  test("fkClosedSample keeps exactly the FK-matching child rows") {
    val child = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("fk", "v")
    val keys = Seq(1L, 3L).toDF("k")
    val got = Joins.fkClosedSample(child, "fk", keys, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "x"), (3L, "z")))
  }
}
