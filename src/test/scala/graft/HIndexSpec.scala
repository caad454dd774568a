package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HIndexAgg

class HIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def brute(vs: Seq[Long]): Int = {
    val sorted = vs.filter(_ > 0).sortBy(-_)
    sorted.zipWithIndex.count { case (v, i) => v >= i + 1 }
  }

  private def viaSpark(vs: Seq[Long]): Int =
    vs.toDF("v").agg(HIndexAgg.hindex($"v")).as[Int].head()

  test("reference examples") {
    assert(viaSpark(Seq(3, 0, 6, 1, 5)) == 3)   // classic h-index example
    assert(viaSpark(Seq(10, 8, 5, 4, 3)) == 4)
    assert(viaSpark(Seq(25, 8, 5, 3, 3)) == 3)
    assert(viaSpark(Seq(0, 0)) == 0)
    assert(viaSpark(Seq(1)) == 1)
    assert(viaSpark(Seq(-5, 2, 2)) == 2) // non-positive values ignored
  }

  test("matches brute force on random lists (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val vs = Seq.fill(1 + rnd.nextInt(50))(rnd.nextLong(60))
      assert(viaSpark(vs) == brute(vs), s"on $vs")
    }
  }

  test("partial aggregation merges across partitions") {
    val vs = (1L to 100L) ++ (1L to 100L)
    val got = vs.toDF("v").repartition(7)
      .agg(HIndexAgg.hindex($"v")).as[Int].head()
    assert(got == brute(vs))
  }

  test("values above Cap clip without breaking small h") {
    // h is bounded by item count, so clipping at 4096 is invisible here
    val vs = Seq(1000000L, 999999L, 5L)
    assert(viaSpark(vs) == 3)
  }
}
