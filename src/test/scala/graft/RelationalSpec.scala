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
    // 0 = the derived default (spark.sql.shuffle.partitions); 256 >
    // rows/partition boundary cases with many near-empty partitions
    for (parts <- Seq(1, 7, 32, 256, 0)) {
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

  test("ewmaInt folds in time order with floor semantics") {
    // key 1: x = 100, 200, 60 in ts order (ids break the ts tie) →
    // e = 100; (200 + 3*100)//4 = 125; (60 + 3*125)//4 = 108
    // key 2: single event → its own value
    // key 3: negative values — floorDiv, not truncation:
    // e = -5; (-10 + 3*-5)//4 = floor(-6.25) = -7
    val rows = Seq(
      (1L, 10L, 1L, 100L), (1L, 20L, 2L, 200L), (1L, 20L, 3L, 60L),
      (2L, 5L, 4L, 42L),
      (3L, 1L, 5L, -5L), (3L, 2L, 6L, -10L)
    ).toDF("k", "us", "id", "x")
    val got = Relational.ewmaInt(rows, col("k"), col("us"), col("id"),
        col("x"), num = 1L, den = 4L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> ((3L, 108L)), 2L -> ((1L, 42L)),
      3L -> ((2L, -7L))))
  }

  test("zorderKey interleaves bits and buckets bound both dimensions") {
    // hand-computed Morton values
    val pts = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L),
      (5L, 6L)).toDF("x", "y")
    val got = pts.select(Relational.zorderKey(col("x"), col("y")))
      .as[Long].collect().toSeq
    // (3,1): x bits 0,1 → pos 0,2; y bit 0 → pos 1 ⇒ 0b0111 = 7
    // (5,6): x 101 → pos 0,4; y 110 → pos 3,5 ⇒ 0b111001 = 57
    assert(got == Seq(7L, 0L, 0x55555555L, 0xAAAAAAAAL, 57L))
    // locality: every >>18 bucket of a random scatter spans ≤ 512 in
    // BOTH dims — the two-dimensional pruning guarantee
    val rnd = new scala.util.Random(31)
    val scatter = (1 to 2000)
      .map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
    val spans = scatter
      .withColumn("zb", shiftright(Relational.zorderKey(col("x"), col("y")), 18))
      .groupBy(col("zb"))
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .agg(max(greatest(col("dx"), col("dy")))).as[Long].head()
    assert(spans <= 511L, s"bucket spans $spans > 511")
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

  test("isqrt is the exact integer floor sqrt, perfect-square " +
       "boundaries included") {
    val xs = (0L to 1000L) ++
      Seq(9L, 15L, 16L, 17L, 99L, 100L, 101L,
        (1L << 40) - 1L, 1L << 40, (1L << 40) + 1L,
        999999999999L, 1000000000000L, 4503599627370496L /* 2^52 */)
    val got = xs.toDF("x")
      .select(col("x"), Relational.isqrt(col("x")).as("s"))
      .as[(Long, Long)].collect()
    assert(got.length == xs.size)
    got.foreach { case (x, s) =>
      assert(s >= 0L && s * s <= x && (s + 1L) * (s + 1L) > x,
        s"isqrt($x) = $s")
    }
  }

  /** Local brute-force skyline: strict dominance, ties survive. */
  private def bruteSkyline(rows: Seq[(Long, Seq[Long])])
      : Set[Long] = {
    def dominates(a: Seq[Long], b: Seq[Long]): Boolean =
      a.zip(b).forall { case (x, y) => x >= y } && a != b
    rows.filter { case (_, v) =>
      !rows.exists { case (_, w) => dominates(w, v) }
    }.map(_._1).toSet
  }

  test("skyline equals brute-force dominance on random data, " +
       "every dim count and partition layout") {
    val rnd = new scala.util.Random(41)
    for (nDims <- 1 to 4; parts <- Seq(1, 7, 32)) {
      // small value range → plenty of ties and duplicate vectors
      val rows = (1L to 300L).map(i =>
        (i, Seq.fill(nDims)(rnd.nextInt(8).toLong)))
      val df = rows.map { case (i, v) =>
          (i, v.padTo(4, -1L)) }
        .map { case (i, Seq(a, b, c, dd)) => (i, a, b, c, dd) }
        .toDF("id", "d1", "d2", "d3", "d4")
        .repartition(parts)
      val dims = (1 to nDims).map(k => s"d$k")
      val got = Relational.skyline(df, dims)
        .select("id").as[Long].collect().toSet
      assert(got == bruteSkyline(rows), s"nDims=$nDims parts=$parts")
    }
  }

  test("skyline keeps all copies of a tied maximal vector and every " +
       "non-dim column intact") {
    val df = Seq((1L, 5L, 5L, "a"), (2L, 5L, 5L, "b"),
        (3L, 5L, 4L, "c"), (4L, 4L, 5L, "d"), (5L, 1L, 1L, "e"))
      .toDF("id", "x", "y", "tag")
    val got = Relational.skyline(df, Seq("x", "y"))
      .select("id", "tag").as[(Long, String)].collect().toSet
    // (5,5) twice: identical vectors dominate nothing — both stay;
    // (5,4)/(4,5) are dominated by (5,5); (1,1) is dominated.
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  test("skyline rejects non-BIGINT dims") {
    val df = Seq((1L, 2)).toDF("id", "d")
    intercept[IllegalArgumentException] {
      Relational.skyline(df, Seq("d"))
    }
  }

  test("fkCensus counts nulls, orphans, distinct refs and unreferenced " +
       "parents exactly on a planted-violation fixture") {
    // child keys: 1 twice, 2 once, one NULL, one orphan (5);
    // parents 1..4 → 3 and 4 unreferenced
    val child = Seq(Some(1L), Some(1L), Some(2L), None, Some(5L))
      .toDF("k")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("p")
    val got = graft.operators.Relational
      .fkCensus(Seq(("child.k->parent", child, "k", parent, "p")))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(("child.k->parent", 5L, 1L, 1L, 3L, 4L, 2L)),
      s"got $got")
    // a clean edge reports all zeros in the violation columns
    val clean = graft.operators.Relational
      .fkCensus(Seq(("c->p", Seq(1L, 2L).toDF("k"), "k", parent, "p")))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert((clean._3, clean._4) == ((0L, 0L)))
  }

  test("fkCensus carries key multiplicity through the pre-aggregated " +
       "join: repeated orphans and nulls count per ROW, not per key") {
    // r19 shape: the child side is grouped by key before the parent
    // join and every census integer is a cnt-weighted sum — repeated
    // orphan key 9 (3 rows) and repeated NULL (2 rows) must still
    // count 3 and 2, and n_distinct_fk must count keys, not rows
    val child = Seq(Some(9L), Some(9L), Some(9L), None, None, Some(1L))
      .toDF("k")
    val parent = Seq(1L, 2L).toDF("p")
    val got = graft.operators.Relational
      .fkCensus(Seq(("dup->p", child, "k", parent, "p")))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // (edge, n_child, n_null_fk, n_orphans, n_distinct_fk,
    //  n_parents, n_unreferenced)
    assert(got == (("dup->p", 6L, 2L, 3L, 2L, 2L, 1L)), s"got $got")
  }
}
