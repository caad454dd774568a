package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins
import graft.sources.Tables

/** The native as-of operator (AsOfJoinPlan/Strategy/Exec) must agree
  * with the composed union+window form on goldens and on the real
  * events/orders fixture, handle no-match lefts with nulls, and show
  * the custom exec node in its plan. */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val quotes = Seq( // (key, time, px)
    (1L, 10L, 100L), (1L, 20L, 110L), (1L, 30L, 120L),
    (2L, 15L, 200L)).toDF("k", "t", "px")
  private val trades = Seq( // (key, time)
    (1L, 5L),  // before any quote -> null
    (1L, 10L), // equal time -> 100 (<= semantics)
    (1L, 25L), // between -> 110
    (1L, 99L), // after all -> 120
    (2L, 14L), // before key-2's only quote -> null
    (3L, 50L)  // key with no quotes at all -> null
  ).toDF("k", "t")

  test("native as-of matches hand-computed golden incl. nulls and <= ties") {
    val got = Joins.asOfJoinNative(trades, quotes, "k", "k", "t", "t", Seq("px"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 5L, None), (1L, 10L, Some(100L)), (1L, 25L, Some(110L)),
      (1L, 99L, Some(120L)), (2L, 14L, None), (3L, 50L, None)))
  }

  test("native as-of ≡ composed union+window form on the real fixture") {
    val d = "/root/testdata/sf0.001"
    val lastPerDay = Tables.orders(spark, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
      .withColumn("o_ts", col("o_orderdate").cast("timestamp"))
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"))

    val composed = Joins.asOfJoin(ev, lastPerDay, "user_id", "o_custkey",
        "ts", "o_ts", Seq("last_orderkey"))
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .as[(Long, Long, Option[Long])].collect().toSet
    val native = Joins.asOfJoinNative(ev, lastPerDay, "user_id", "o_custkey",
        "ts", "o_ts", Seq("last_orderkey"))
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("native ≡ composed on seeded random key/time data") {
    val rnd = new scala.util.Random(42)
    val l = Seq.fill(400)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("lid", "k", "t")
    // unique (key, time) on the right for determinism
    val r = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong * 7) }
      .toDF("k", "t", "payload")
    val composed = Joins.asOfJoin(l, r, "k", "k", "t", "t", Seq("payload"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val native = Joins.asOfJoinNative(l, r, "k", "k", "t", "t", Seq("payload"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(native == composed)
    assert(native.size == 400)
  }

  test("native as-of is correct with AQE disabled (plain EnsureRequirements)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val got = Joins.asOfJoinNative(trades, quotes, "k", "k", "t", "t", Seq("px"))
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(got == Set(
        (1L, 5L, None), (1L, 10L, Some(100L)), (1L, 25L, Some(110L)),
        (1L, 99L, Some(120L)), (2L, 14L, None), (3L, 50L, None)))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("self-as-of join (shared exprIds) reads RIGHT payload, not left") {
    // Same DataFrame on both sides: without the fresh-exprId re-alias of
    // the right plan, the output projection binds right payload columns
    // to the LEFT row's slots and silently returns left values.
    val q = quotes // (k, t, px)
    val got = Joins.asOfJoinNative(
        q.withColumnRenamed("px", "left_px"), q, "k", "k", "t", "t", Seq("px"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    // each quote as-of-joins to itself (<= includes equality)
    assert(got == Set(
      (1L, 10L, 100L, Some(100L)), (1L, 20L, 110L, Some(110L)),
      (1L, 30L, 120L, Some(120L)), (2L, 15L, 200L, Some(200L))))
    // shared-lineage variant where payload values DIFFER between sides:
    // left carries px*1000; right payload must still be the raw px
    val shifted = quotes.withColumn("t", col("t") + lit(1))
      .withColumn("px", col("px") * 1000)
    val lag = Joins.asOfJoinNative(shifted, quotes, "k", "k", "t", "t", Seq("px"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(lag == Set(
      (1L, 11L, 100000L, Some(100L)), (1L, 21L, 110000L, Some(110L)),
      (1L, 31L, 120000L, Some(120L)), (2L, 16L, 200000L, Some(200L))))
  }

  test("ambiguous payload column name throws instead of silent first-match") {
    val dupRight = quotes.select(col("k"), col("t"), col("px"),
      (col("px") * 2).as("px2")).withColumnRenamed("px2", "px")
    val ex = intercept[IllegalArgumentException] {
      Joins.asOfJoinNative(trades, dupRight, "k", "k", "t", "t", Seq("px"))
    }
    assert(ex.getMessage.contains("ambiguous"))
  }

  test("plan contains the custom AsOfJoinExec node") {
    val df = Joins.asOfJoinNative(trades, quotes, "k", "k", "t", "t", Seq("px"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }
}
