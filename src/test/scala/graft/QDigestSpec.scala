package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QDigestAgg

class QDigestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val probs = Seq(0.25, 0.5, 0.75, 0.99)

  /** Count of values <= v (upper end of v's rank range). */
  private def countLe(sorted: Array[Long], v: Long): Long = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Tie-aware rank error: a value occupies the rank RANGE
    * (count(<v), count(<=v)]; error is the distance from the target
    * rank to that range (0 when the target falls inside it). */
  private def rankErr(sorted: Array[Long], v: Long, target: Long): Long = {
    val le = countLe(sorted, v)
    val lt = countLe(sorted, v - 1) // domain is integer: < v  ⟺  <= v-1
    if (target > lt && target <= le) 0L
    else math.min(math.abs(target - le), math.abs(target - (lt + 1)))
  }

  private def assertWithinEps(agg: QDigestAgg, data: Array[Long],
                              sketch: Seq[Long], label: String): Unit = {
    val sorted = data.sorted
    val n = data.length.toLong
    probs.zip(sketch).foreach { case (p, v) =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      val err = rankErr(sorted, v, target).toDouble / n
      assert(err <= agg.declaredEps,
        s"$label p=$p: rank err $err > eps ${agg.declaredEps}")
    }
  }

  private def buildChunks(agg: QDigestAgg, data: Array[Long],
                          nChunks: Int): Seq[Array[Long]] =
    data.grouped(math.max(1, data.length / nChunks)).map { chunk =>
      chunk.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    }.toSeq

  test("rank error stays within declaredEps for every merge order, on adversarial inputs") {
    val agg = QDigestAgg(24, 4096, probs)
    val rnd = new scala.util.Random(7)
    val n = 40000
    val datasets: Seq[(String, Array[Long])] = Seq(
      "uniform" -> Array.fill(n)(rnd.nextInt(1 << 24).toLong),
      "skewed"  -> Array.fill(n)(math.min((1L << 24) - 1,
        math.round(math.exp(rnd.nextDouble() * 16)))),
      "sorted"  -> (0 until n).map(_.toLong * 400).toArray,
      "heavy-dup" -> Array.fill(n)((rnd.nextInt(5) * 1000000).toLong))
    datasets.foreach { case (label, data) =>
      val chunks = buildChunks(agg, data, 16)
      val leftFold = chunks.reduceLeft(agg.merge)
      val rightFold = chunks.reduceRight(agg.merge)
      val balanced = {
        def go(cs: Seq[Array[Long]]): Array[Long] =
          if (cs.length == 1) cs.head
          else go(cs.grouped(2).map(g => g.reduce(agg.merge)).toSeq)
        go(chunks)
      }
      Seq("left" -> leftFold, "right" -> rightFold, "bal" -> balanced)
        .foreach { case (order, sk) =>
          assertWithinEps(agg, data, agg.finish(sk), s"$label/$order")
        }
    }
  }

  test("merge is deterministic: identical inputs give bit-identical buffers") {
    val agg = QDigestAgg(24, 4096, probs)
    val rnd = new scala.util.Random(11)
    val data = Array.fill(20000)(rnd.nextInt(1 << 24).toLong)
    def build() = buildChunks(agg, data, 8).reduceLeft(agg.merge)
    assert(build().toSeq == build().toSeq)
  }

  test("buffer stays bounded while the input grows") {
    val agg = QDigestAgg(24, 256, probs)
    val rnd = new scala.util.Random(3)
    var b = agg.zero
    (1 to 100000).foreach(_ => b = agg.reduce(b, rnd.nextInt(1 << 24).toLong))
    assert(b(0) <= 8 * 256, s"buffer held ${b(0)} pairs")
  }

  test("small inputs are exact (no compression below n=k)") {
    val agg = QDigestAgg(24, 4096, probs)
    val data = (1L to 1000L).toArray
    val sk = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    assert(sk == Seq(250L, 500L, 750L, 990L))
  }

  test("distributed agg over the fixture matches the declared bound") {
    val agg = QDigestAgg(24, 4096, probs)
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
      .repartition(16) // force a real partial-merge tree
    val sketch = li.agg(agg(col("v")).as("qs"))
      .select(col("qs")).as[Seq[Long]].head()
    val data = li.as[Long].collect()
    assertWithinEps(agg, data, sketch, "lineitem")
  }
}
