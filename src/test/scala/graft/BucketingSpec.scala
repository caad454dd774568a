package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoOccur

/** The SURVEY.md §4 physical-execution claim, demonstrated: bucketing
  * the authorship-shaped table by its group key makes the co-membership
  * self-join — the engine's hottest pattern — run WITHOUT a shuffle
  * exchange (both sides are co-partitioned by bucket). At 100 TB this
  * is the difference between re-shuffling the largest table per query
  * and reading it join-ready. */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed self-join plans without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh").toString
    val table = "li_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_suppkey")
      .write.option("path", s"$warehouse/$table")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(table)
    try {
      val t = spark.table(table)
      val pairs = CoOccur.pairs(t, "l_orderkey", "l_suppkey")
      pairs.collect()
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      // count exchanges: distinct aggregation may shuffle once per side
      // of the join at most; a non-bucketed plan has 2 extra exchanges
      val nonBucketed = CoOccur.pairs(
        graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
          .select("l_orderkey", "l_suppkey"), "l_orderkey", "l_suppkey")
      nonBucketed.collect()
      def exchanges(s: String) = "Exchange hashpartitioning".r.findAllIn(s).size
      val bucketedEx = exchanges(plan)
      val plainEx = exchanges(nonBucketed.queryExecution.executedPlan.toString)
      assert(bucketedEx < plainEx,
        s"bucketed=$bucketedEx plain=$plainEx\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("co-bucketed two-table join (lineitem ⋈ orders) plans without exchanges") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh2").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
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
      val j = spark.table("li_b2").join(spark.table("ord_b2"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      j.collect()
      val finalPlan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("SortMergeJoin"), finalPlan)
      val ex = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
      assert(ex == 0, s"co-bucketed join still exchanges ($ex)\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b2"); spark.sql("DROP TABLE IF EXISTS ord_b2")
    }
  }

  test("q71 bucketed spine: the self-join plans with zero exchanges (SMJ path)") {
    // disable broadcast so the co-partitioned sort-merge path is what's
    // audited — the realistic shape at 100 TB where nothing broadcasts
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q71_bucketed_spine")(
        spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // exactly ONE shuffle survives: the final (a, b) edge aggregation.
      // The join and the per-side distinct ride the bucketing. (AQE's
      // plan string repeats the plan under "== Initial Plan ==" — count
      // the final section only.)
      val finalPlan = plan.split("== Initial Plan ==").head
      val ex = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
      assert(ex == 1, s"expected 1 exchange (final agg), got $ex\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
