package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val mults = Seq(31L, 37L, 41L)
  private val width = 32 // small so collisions actually happen

  // zipf-ish corpus: key "k<i>" appears 200/i times
  private def corpus: DataFrame =
    (1 to 40).flatMap(i => Seq.fill(200 / i)(s"k$i")).toDF("k")

  private def exact: Map[String, Long] =
    (1 to 40).map(i => s"k$i" -> (200 / i).toLong).toMap

  test("countMin estimate is >= the exact count for every key (CM " +
       "guarantee), and equals it when no depth collides") {
    val cells = Sketches.countMinCells(corpus, col("k"), mults, width)
    val probes = corpus.distinct()
    val est = Sketches.countMinEstimates(probes, col("k"), cells, mults, width)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: est ${est(k)} < exact $c")
    }
    // width 32 for 40 keys: some key must collide in every depth row
    assert(exact.exists { case (k, c) => est(k) > c }, "no collision seen")
    // and the most frequent key's estimate is exact or near-exact
    assert(est("k1") >= 200L)
  }

  test("countMin matrix merges by addition: cells(a union b) = " +
       "cellwise sum of cells(a) and cells(b)") {
    val indexed = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"k$i"))
      .zipWithIndex.toDF("k", "idx")
    val a = indexed.filter(col("idx") < 300).select("k")
    val b = indexed.filter(col("idx") >= 300).select("k")
    def cellMap(df: DataFrame): Map[(Long, Long), Long] =
      Sketches.countMinCells(df, col("k"), mults, width)
        .as[(Long, Long, Long)].collect()
        .map { case (i, cell, c) => (i, cell) -> c }.toMap
    val whole = cellMap(indexed.select("k"))
    val parts = (cellMap(a).toSeq ++ cellMap(b).toSeq)
      .groupBy(_._1).map { case (kc, vs) => kc -> vs.map(_._2).sum }
    assert(whole == parts)
  }

  test("countMin cells are independent of partitioning") {
    def cellSet(df: DataFrame) =
      Sketches.countMinCells(df, col("k"), mults, width)
        .as[(Long, Long, Long)].collect().toSet
    assert(cellSet(corpus.repartition(1)) == cellSet(corpus.repartition(7)))
  }

  test("a key the sketch never saw estimates 0 only if all its cells " +
       "are empty; absent cells read as zero") {
    val tiny = Seq("a").toDF("k")
    val cells = Sketches.countMinCells(tiny, col("k"), mults, width)
    val est = Sketches.countMinEstimates(
        Seq("zzz-not-seen").toDF("k"), col("k"), cells, mults, width)
      .as[(String, Long)].collect().head
    assert(est._2 >= 0L && est._2 <= 1L) // 0 unless it collides with "a"
  }

  test("countMinJoinSize is >= the true join size always, and exact " +
       "once any depth row is collision-free") {
    val b = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")).toDF("k")
    val bCounts = (1 to 40).map(i => s"k$i" -> (i % 5 + 1).toLong).toMap
    val trueSize = exact.map { case (k, c) => c * bCounts(k) }.sum
    def est(w: Int): Long = Sketches.countMinJoinSize(
        Sketches.countMinCells(corpus, col("k"), mults, w),
        Sketches.countMinCells(b, col("k"), mults, w))
      .as[Long].collect().head
    assert(est(width) >= trueSize) // collisions only ADD mass
    assert(est(width) > trueSize, "width 32 over 40 keys must collide")
    assert(est(1 << 16) == trueSize) // injective depth row -> exact
  }

  // ----- deterministic HLL ------------------------------------------

  private def hllCorpus: DataFrame =
    (1 to 5000).map(i => ("g", s"user$i")).toDF("g", "k")

  test("hll registers max-merge: registers(a union b) = bucketwise max " +
       "of registers(a) and registers(b)") {
    val indexed = (1 to 5000).map(i => (s"user$i", i)).toDF("k", "idx")
      .withColumn("g", lit("g"))
    val a = indexed.filter(col("idx") <= 2500)
    val b = indexed.filter(col("idx") > 2500)
    def regMap(df: DataFrame): Map[Long, Int] =
      Sketches.hllRegisters(df, Seq("g"), col("k"))
        .select(col("bucket"), col("reg"))
        .as[(Long, Int)].collect().toMap
    val whole = regMap(indexed)
    val merged = (regMap(a).toSeq ++ regMap(b).toSeq)
      .groupBy(_._1).map { case (bk, vs) => bk -> vs.map(_._2).max }
    assert(whole == merged)
  }

  test("hll registers are independent of partitioning, and the " +
       "estimate lands within the m=256 error regime") {
    def regSet(df: DataFrame) =
      Sketches.hllRegisters(df, Seq("g"), col("k"))
        .as[(String, Long, Int)].collect().toSet
    assert(regSet(hllCorpus.repartition(1)) == regSet(hllCorpus.repartition(7)))
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(hllCorpus, Seq("g"), col("k")), Seq("g"))
      .select(col("est")).as[Double].collect().head
    // raw-HLL rsd at m=256 is ~1.04/sqrt(256) = 6.5%; 3 sigma
    assert(math.abs(est / 5000.0 - 1.0) <= 0.20, s"hll est $est vs 5000")
  }

  test("hll harmonic sum is exact long arithmetic: an empty-register " +
       "group folds to alpha/m-scaled full-sum, and rho covers rest=0") {
    // one key per group: n_filled = 1, sum = 2^(rCap-rho) + 255*2^rCap
    val one = Seq(("g", "user1")).toDF("g", "k")
    val r = Sketches.hllEstimate(
        Sketches.hllRegisters(one, Seq("g"), col("k")), Seq("g"))
      .select(col("n_filled")).as[Long].collect().head
    assert(r == 1L)
  }

  // ---- heavyHitters (two-pass Misra-Gries-then-recount) ----

  private def hhBrute(df: DataFrame, num: Long, den: Long): Map[String, Long] = {
    val rows = df.filter(col("k").isNotNull).as[String].collect()
    val n = rows.length.toLong
    val thr = (num * n + den - 1) / den
    rows.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= thr).toMap
  }

  test("heavyHitters equals GROUP BY .. HAVING on a skewed corpus, " +
       "across partitionings") {
    // zipf-ish over 40 keys: k1 is ~13% of mass, several keys heavy
    // at the 1/20 bar, most not
    Seq(1, 7, 32).foreach { p =>
      val df = corpus.repartition(p)
      val got = Sketches.heavyHitters(df, col("k"), 1L, 20L, 25)
        .as[(String, Long)].collect().toMap
      assert(got == hhBrute(corpus, 1L, 20L), s"diverged at $p partitions")
      assert(got.nonEmpty, "fixture must produce at least one heavy key")
    }
  }

  test("heavyHitters rejects the non-strict boundary share = 1/(s+1)") {
    // ADVICE scenario: s=1, share 1/2, stream a,b,a,b — MG can evict
    // every key from every summary while both keys meet the threshold;
    // the strict require refuses the configuration instead
    val df = Seq("a", "b", "a", "b").toDF("k")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, col("k"), 1L, 2L, 1)
    }
    // with one extra counter the guarantee holds and both keys return
    val got = Sketches.heavyHitters(df.coalesce(1), col("k"), 1L, 2L, 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L))
  }

  test("heavyHitters threshold is integer-exact when share*n is " +
       "integral (no fp ceil overshoot)") {
    // 110 rows at share 1/10: threshold must be exactly 11, so a key
    // with count exactly 11 is kept (double ceil(0.1*110) gives 12)
    val df = (Seq.fill(11)("edge") ++ (1 to 99).map(i => s"u$i")).toDF("k")
    val got = Sketches.heavyHitters(df, col("k"), 1L, 10L, 30)
      .as[(String, Long)].collect().toMap
    assert(got == Map("edge" -> 11L))
  }

  test("heavyHittersByGroup equals per-group GROUP BY .. HAVING " +
       "across partitionings, with independent group thresholds") {
    // group A: zipf over 40 keys (several heavy at 1/20); group B:
    // one dominant key + uniform tail (only the dominant is heavy);
    // group sizes differ so per-group thresholds genuinely differ
    val a = (1 to 40).flatMap(i => Seq.fill(200 / i)(("A", s"k$i")))
    val b = Seq.fill(60)(("B", "big")) ++ (1 to 300).map(i => ("B", s"u$i"))
    val rows = (a ++ b).toDF("g", "k")
    def brute: Set[(String, String, Long, Long)] = {
      val all = (a ++ b)
      val totals = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      all.groupBy(identity).view.mapValues(_.size.toLong).toSeq.collect {
        case ((g, k), c) if c * 20L >= totals(g) * 1L =>
          (g, k, c, totals(g))
      }.toSet
    }
    Seq(1, 7, 32).foreach { p =>
      val got = Sketches.heavyHittersByGroup(
          rows.repartition(p), col("g"), col("k"), 1L, 20L, 25)
        .as[(String, String, Long, Long)].collect().toSet
      assert(got == brute, s"diverged at $p partitions")
    }
    assert(brute.exists(_._1 == "A") && brute.exists(_._1 == "B"))
  }

  test("mergeable MG summaries keep the union-stream superset " +
       "guarantee under any merge order and batch split") {
    // zipf corpus split into shuffled "batches"; whatever the split
    // and fold order, every key above share 1/(s+1) of the UNION
    // stream must survive the merged summary (Agarwal et al. 2012)
    val s = 25
    val all = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"k$i"))
    val n = all.size.toLong
    val trueHeavy = all.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (s + 1) > n }.keySet
    assert(trueHeavy.nonEmpty)
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val shuffled = rnd.shuffle(all)
      val batches = shuffled.grouped(shuffled.size / 4 + 1).toSeq
      val summaries = batches.map { b =>
        val df = b.toDF("k").repartition(trial * 3)
        Sketches.mgSummaries(df, col("k"), s)
          .as[(Array[String], Array[Long], Long)].collect()
          .map { case (ks, cs, _) => ks.zip(cs).toMap }
          .foldLeft(Map.empty[String, Long])(Sketches.mgMerge(_, _, s))
      }
      val leftFold = summaries.reduceLeft(Sketches.mgMerge(_, _, s))
      val rightFold = summaries.reduceRight(Sketches.mgMerge(_, _, s))
      Seq("left" -> leftFold, "right" -> rightFold).foreach {
        case (order, merged) =>
          assert(merged.size <= s, s"trial $trial $order size")
          val missing = trueHeavy -- merged.keySet
          assert(missing.isEmpty,
            s"trial $trial $order lost true heavies $missing")
          // MG counts never overestimate the true count
          val exact = all.groupBy(identity).view.mapValues(_.size.toLong)
          merged.foreach { case (k, c) =>
            assert(c <= exact.getOrElse(k, 0L), s"$k overestimated")
          }
      }
    }
  }

  test("heavyHitters and the grouped form return empty on empty and " +
       "all-null inputs (the zero-total path)") {
    val empty = Seq.empty[String].toDF("k")
    assert(Sketches.heavyHitters(empty, col("k"), 1L, 10L, 15)
      .collect().isEmpty)
    val nulls = Seq[Option[String]](None, None).toDF("k")
    assert(Sketches.heavyHitters(nulls, col("k"), 1L, 10L, 15)
      .collect().isEmpty)
    val emptyG = Seq.empty[(String, String)].toDF("g", "k")
    assert(Sketches.heavyHittersByGroup(emptyG, col("g"), col("k"),
      1L, 10L, 15).collect().isEmpty)
  }

  test("heavyHitters ignores null keys in both the count base and " +
       "the output") {
    // 10 nulls + 20 non-null rows: n must be 20, so "h" (8/20 = 40%)
    // is heavy at share 1/3 (ceil(20/3) = 7); with nulls wrongly in
    // the base the threshold would be ceil(30/3) = 10 and drop it
    val df = (Seq.fill(8)(Some("h")) ++ (1 to 12).map(i => Some(s"u$i")) ++
      Seq.fill(10)(Option.empty[String])).toDF("k")
    val got = Sketches.heavyHitters(df, col("k"), 1L, 3L, 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("h" -> 8L))
  }

  // ----- KMV pairwise set-operation estimates (q153) ----------------

  private def kmvSketchOf(rows: DataFrame, k: Int): DataFrame =
    Sketches.kmvMinHashes(
      rows.select(col("g"),
        Sketches.mixedStringHash(col("key")).as("h")), "g", col("h"), k)

  test("kmvPairEstimates exact branch: complete merged sketch returns " +
       "exact union and intersection counts") {
    val rows = ((1 to 30).map(i => ("a", s"x$i")) ++
      (11 to 40).map(i => ("b", s"x$i"))).toDF("g", "key")
    val out = Sketches.kmvPairEstimates(kmvSketchOf(rows, 64), "g", 64)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("ga") == "a" && r.getAs[String]("gb") == "b")
    assert(r.getAs[Long]("n_shared") == 20L)
    assert(r.getAs[Double]("est_union") == 40.0)
    assert(r.getAs[Double]("est_inter") == 20.0)
  }

  test("kmvPairEstimates estimate branch: planted 1000-of-5000 overlap " +
       "lands within KMV tolerance") {
    // union 5000 distinct, intersection 1000 (k2001..k3000 shared)
    val rows = ((1 to 3000).map(i => ("a", s"k$i")) ++
      (2001 to 5000).map(i => ("b", s"k$i"))).toDF("g", "key")
    val r = Sketches.kmvPairEstimates(kmvSketchOf(rows, 128), "g", 128)
      .collect().head
    val eu = r.getAs[Double]("est_union")
    val ei = r.getAs[Double]("est_inter")
    // stderr ~ 1/sqrt(k-2) ~ 9% for the union; the intersection adds
    // the binomial noise of n_shared ~ Binom(k, J) — wider band
    assert(math.abs(eu - 5000.0) / 5000.0 < 0.2, s"est_union $eu")
    assert(math.abs(ei - 1000.0) / 1000.0 < 0.45, s"est_inter $ei")
  }

  test("kmv merge property: the pair's merged sketch IS the sketch of " +
       "the union (same k-th minimum, identical estimator value)") {
    val k = 128
    val a = (1 to 3000).map(i => ("a", s"k$i"))
    val b = (2001 to 5000).map(i => ("b", s"k$i"))
    val pairEst = Sketches.kmvPairEstimates(
        kmvSketchOf((a ++ b).toDF("g", "key"), k), "g", k)
      .collect().head.getAs[Double]("est_union")
    // one group holding the union, sketched directly
    val u = (a ++ b).map { case (_, key) => ("u", key) }
    val uSketch = kmvSketchOf(u.toDF("g", "key"), k)
      .agg(count(lit(1)), max(col("h"))).as[(Long, Long)].collect().head
    assert(uSketch._1 == k.toLong)
    val direct = (k - 1).toDouble * Sketches.MixedHashRange / uSketch._2
    assert(pairEst == direct,
      s"merged-sketch estimate $pairEst != direct union sketch $direct")
  }

  test("kmvMinHashes keeps exactly the k smallest distinct hashes, " +
       "independent of partitioning") {
    val base = (1 to 500).map(i => ("g", s"v$i")).toDF("g", "key")
    val expected = kmvSketchOf(base, 32).orderBy(col("h"))
      .as[(String, Long)].collect().toSeq
    Seq(1, 7, 32).foreach { p =>
      val got = kmvSketchOf(base.repartition(p), 32).orderBy(col("h"))
        .as[(String, Long)].collect().toSeq
      assert(got == expected, s"partitioning $p changed the sketch")
      assert(got.size == 32)
    }
  }
}
