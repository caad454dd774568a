package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoOccur

/** The SURVEY.md §4 physical-execution claim, demonstrated: bucketing
  * the authorship-shaped table by its group key makes the co-membership
  * self-join — the engine's hottest pattern — run WITHOUT a shuffle
  * exchange (both sides are co-partitioned by bucket). At 100 TB this
  * is the difference between re-shuffling the largest table per query
  * and reading it join-ready. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  /** Shared plan-inspection mechanics: run with broadcast disabled (the
    * realistic 100 TB shape where nothing broadcasts), execute, and
    * hand the FINAL adaptive plan to the assertion — AQE's plan string
    * repeats the plan under "== Initial Plan ==", which would
    * double-count exchanges. */
  private def finalPlanNoBroadcast(build: => DataFrame)(check: String => Unit): Unit = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = build
      df.collect()
      check(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("bucketed self-join plans without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh").toString
    val table = "li_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.sources.Ingest.writeBucketed(
      graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_suppkey"),
      table, s"$warehouse/$table", "l_orderkey", 8, Some("l_orderkey"))
    try {
      val pairs = CoOccur.pairs(spark.table(table), "l_orderkey", "l_suppkey")
      pairs.collect()
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      // a non-bucketed plan pays 2 extra exchanges for the same shape
      val nonBucketed = CoOccur.pairs(
        graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
          .select("l_orderkey", "l_suppkey"), "l_orderkey", "l_suppkey")
      nonBucketed.collect()
      val bucketedEx = exchanges(plan)
      val plainEx = exchanges(nonBucketed.queryExecution.executedPlan.toString)
      assert(bucketedEx < plainEx,
        s"bucketed=$bucketedEx plain=$plainEx\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("co-bucketed two-table join (lineitem ⋈ orders) plans without exchanges") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh2").toString
    spark.sql("DROP TABLE IF EXISTS li_b2"); spark.sql("DROP TABLE IF EXISTS ord_b2")
    try {
      val d = "/root/testdata/sf0.001"
      graft.sources.Ingest.writeBucketed(
        graft.sources.Tables.lineitem(spark, d)
          .select("l_orderkey", "l_quantity"),
        "li_b2", s"$warehouse/li_b2", "l_orderkey", 8, Some("l_orderkey"))
      graft.sources.Ingest.writeBucketed(
        graft.sources.Tables.orders(spark, d)
          .select("o_orderkey", "o_custkey"),
        "ord_b2", s"$warehouse/ord_b2", "o_orderkey", 8, Some("o_orderkey"))
      finalPlanNoBroadcast(
        spark.table("li_b2").join(spark.table("ord_b2"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))) { plan =>
        assert(plan.contains("SortMergeJoin"), plan)
        assert(exchanges(plan) == 0,
          s"co-bucketed join still exchanges\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b2"); spark.sql("DROP TABLE IF EXISTS ord_b2")
    }
  }

  test("q71 bucketed spine: the self-join plans with zero exchanges (SMJ path)") {
    finalPlanNoBroadcast(
      SparkEntry.queries("q71_bucketed_spine")(spark, "/root/testdata/sf0.001")) { plan =>
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // exactly ONE shuffle survives: the final (a, b) edge aggregation;
      // the join and the per-side distinct ride the bucketing
      assert(exchanges(plan) == 1,
        s"expected 1 exchange (final agg)\n$plan")
    }
  }
}
