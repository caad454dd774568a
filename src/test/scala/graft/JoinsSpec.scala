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

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 10⁴ lines on one hyper-key + a disjoint uniform tail — the
    * planted-skew fixture (SURVEY.md §4). */
  private def skewedBig = ((1L to 10000L).map(_ => 42L) ++ (10001L to 12000L))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")

  test("AQE splits the planted hyper-key's shuffle partition (skew join)") {
    val right = ((1L to 12000L) :+ 42L).distinct.map(k => (k, k * 2)).toDF("k", "v")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the SMJ path
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // low thresholds: the constant hyper-key compresses extremely
      // well in shuffle blocks, so the skewed partition is only a few
      // KB at fixture scale
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB") {
      val j = skewedBig.join(right, "k")
      assert(j.collect().length == 12000) // 10000 hot + 2000 tail matches
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    }
  }

  test("saltedJoin spreads the hyper-key across partitions; unsalted concentrates it") {
    val small = Seq((42L, "hot"), (7L, "cold")).toDF("k", "tag")
    def hotRowsPerPartition(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.withColumn("pid", spark_partition_id())
        .filter(col("k") === 42L)
        .groupBy(col("pid")).count()
        .select(col("count")).as[Long].collect().toSeq
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false", // isolate the salting
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val unsalted = hotRowsPerPartition(skewedBig.join(small, "k"))
      val salted = hotRowsPerPartition(Joins.saltedJoin(skewedBig, small, "k", 8))
      assert(salted.sum == unsalted.sum) // same join result cardinality
      assert(unsalted.size == 1 && unsalted.head == 10000L,
        s"expected one straggler partition of 10000, got $unsalted")
      assert(salted.size >= 2, s"salt did not spread the hot key: $salted")
      assert(salted.max <= 6000, s"residual straggler after salting: $salted")
    }
  }

  test("fkClosedSample keeps exactly the FK-matching child rows") {
    val child = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("fk", "v")
    val keys = Seq(1L, 3L).toDF("k")
    val got = Joins.fkClosedSample(child, "fk", keys, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "x"), (3L, "z")))
  }

  test("intervalJoin equals the range-predicate join (multi-bucket spans, " +
       "negative starts, empty and boundary intervals)") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "t")
    val ivs = ((1 to 40).map { i =>
      val s = rnd.nextInt(1000).toLong - 20 // some negative starts
      (100L + i, s, s + rnd.nextInt(150).toLong) // some empty (hi == lo)
    } :+ ((999L, 100L, 150L))) // exact bucket-aligned boundaries
      .toDF("iid", "lo", "hi")
    val got = Joins.intervalJoin(pts, ivs, "t", "lo", "hi", 50L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val want = pts.join(ivs, col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("overlapJoin equals the theta join and emits each pair exactly once " +
       "(multi-bucket spans, negative starts, empty intervals)") {
    val rnd = new scala.util.Random(13)
    val ls = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong - 30
      (i.toLong, s, s + rnd.nextInt(200).toLong) // some empty (en == st)
    }.toDF("lid", "lst", "len_")
    val rs = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong - 30
      (1000L + i, s, s + rnd.nextInt(120).toLong)
    }.toDF("rid", "rst", "ren")
    val got = Joins.overlapJoin(ls, rs, "lst", "len_", "rst", "ren", 50L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val want = ls.join(rs, col("lst") < col("ren") && col("rst") < col("len_"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == want.sorted)
    assert(got.size == got.distinct.size, "a pair was emitted twice")
    assert(want.nonEmpty)
  }

  test("overlapJoin plans a hash join on the bucket key, never a nested loop") {
    val ls = Seq((1L, 0L, 10L)).toDF("lid", "lst", "len_")
    val rs = Seq((2L, 5L, 15L)).toDF("rid", "rst", "ren")
    val plan = Joins.overlapJoin(ls, rs, "lst", "len_", "rst", "ren", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("intervalJoin plans a hash join on the bucket key, never a nested loop") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((9L, 0L, 10L)).toDF("iid", "lo", "hi")
    val plan = Joins.intervalJoin(pts, ivs, "t", "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  // --- Bloom semi-join reduction ---

  private val bloomKeys = (0L until 500L).map(_ * 3L) // {0,3,...,1497}
  private val bloomM = 8192L // 16.4 bits/key
  private val bloomH = 5

  test("bloomFilterOf admits every inserted key (no false negatives)") {
    val dim = bloomKeys.toDF("k")
    val bf = Joins.bloomFilterOf(dim, "k", bloomM, bloomH)
    val missed = dim.crossJoin(broadcast(bf))
      .filter(!Joins.bloomMightContain(col("k"), col("bf"), bloomM, bloomH))
      .count()
    assert(missed == 0L)
  }

  test("bloomFilterOf bits are independent of partitioning (OR-merge " +
       "determinism)") {
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.selectExpr("explode(bf)").as[(Long, Long)].collect().toMap
    val dim = bloomKeys.toDF("k")
    val one = asMap(Joins.bloomFilterOf(dim.repartition(1), "k", bloomM, bloomH))
    val many = asMap(Joins.bloomFilterOf(dim.repartition(7), "k", bloomM, bloomH))
    assert(one == many)
    assert(one.nonEmpty)
  }

  test("bloom false-positive rate on non-keys is near the theoretical rate") {
    val dim = bloomKeys.toDF("k")
    val bf = Joins.bloomFilterOf(dim, "k", bloomM, bloomH)
    // probe keys disjoint from the inserted set (non-multiples of 3)
    val probes = (0L until 3000L).map(_ * 3L + 1L).toDF("k")
    val fp = probes.crossJoin(broadcast(bf))
      .filter(Joins.bloomMightContain(col("k"), col("bf"), bloomM, bloomH))
      .count()
    val theory = math.pow(
      1.0 - math.exp(-bloomH * 500.0 / bloomM), bloomH) // ~0.6%
    assert(fp / 3000.0 < 5 * theory + 0.01, s"fpp=${fp / 3000.0}")
  }

  test("bloomPrefilterJoin equals the plain join and prunes fact rows " +
       "before it") {
    val fact = (0L until 2000L).map(i => (i % 700L, i)).toDF("fk", "payload")
    val dim = (0L until 700L by 13L).map(i => (i, s"d$i")).toDF("k", "name")
    val got = Joins.bloomPrefilterJoin(fact, "fk", dim, "k")
      .select("fk", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val want = fact.join(dim, col("fk") === col("k"))
      .select("fk", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(got == want)
    assert(want.nonEmpty)
    // the pre-filter itself must pass far fewer rows than the fact scan:
    // 54/700 keys ≈ 7.7% selectivity; at 10 bits/key the Bloom admits
    // ≲ a few % extra — well under half the fact
    val n = math.max(1L, dim.count())
    val mBits = ((n * 10 + 63) / 64) * 64
    val bf = Joins.bloomFilterOf(dim, "k", mBits, 5)
    val kept = fact.crossJoin(broadcast(bf))
      .filter(Joins.bloomMightContain(col("fk"), col("bf"), mBits, 5))
      .count()
    assert(kept < 1000L, s"pre-filter kept $kept of 2000")
  }

  test("q223's 8-relation join plans as a pure broadcast chain: no " +
       "sort-merge join, no dimension shuffle") {
    // the plan a 100 TB fact scan wants — every dimension broadcast,
    // the only exchange is the final groupBy; a regression to SMJ on a
    // dimension key would show here before it shows in the bench
    val plan = graft.SparkEntry.queries("q223_market_share")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "dimension join degraded to SMJ")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 6, s"expected >= 6 broadcast joins, saw $bhj")
    graft.Checkpoints.releaseAll(spark)
  }

  test("broadcastIfSmall hints a small checkpointed dim and falls " +
       "through above the threshold (r17 VERDICT item 2)") {
    val probe = (1L to 500L).toDF("k")
    // checkpointed: stats erased, so WITHOUT a hint Spark cannot
    // auto-broadcast this side (LogicalRDD reports the default huge
    // sizeInBytes) — the exact q277 premise
    val dim = graft.Checkpoints.checkpoint((1L to 50L).toDF("k"))
    try {
      val hinted = probe.join(Joins.broadcastIfSmall(dim), "k")
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "under-threshold dim must be hinted")
      // shrink the threshold until the SAME 50-row dim no longer
      // qualifies (row width 8B long + 8B overhead -> maxRows 4).
      // NOTE the gate must return the frame UNHINTED — whether Spark
      // then still broadcasts on its own stats is Spark's call (a
      // localCheckpoint PRESERVES origin stats, so this local-relation
      // dim would; q277's TSV-derived spine, whose estimate is huge,
      // would not) — so the pin is on the absence of the HINT, not on
      // the physical join choice
      withConfs("spark.sql.autoBroadcastJoinThreshold" -> "64b") {
        val ungated = Joins.broadcastIfSmall(dim)
        assert(ungated eq dim,
          "over-threshold dim must fall through to the unhinted frame")
      }
      // threshold disabled entirely -> never hint
      withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        assert(Joins.broadcastIfSmall(dim) eq dim,
          "disabled threshold must return the frame untouched")
      }
    } finally graft.Checkpoints.releaseAll(spark)
  }

  test("q242's Q7-shape trade-flow join broadcasts every dimension and " +
       "emits only cross-nation pairs") {
    val res = graft.SparkEntry.queries("q242_trade_flows")(
      spark, "/root/testdata/sf0.001")
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 4, s"expected >= 4 broadcast dimension joins, saw $bhj")
    import spark.implicits._
    val sameNation = res.filter($"supp_nation" === $"cust_nation").count()
    assert(sameNation == 0, "domestic flows must be filtered out")
    graft.Checkpoints.releaseAll(spark)
  }
}
