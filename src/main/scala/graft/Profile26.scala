package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CoOccur
import graft.sources.Tables

/** Scratch perf probe for the co-ship graph spine (q15-q17/q34/q35/q40).
  * Not part of the declared surface; safe to delete. */
object Profile26 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r"); r
    }

    Tables.lineitem(s, d).count(); Tables.orders(s, d).count()

    def coShipCurrent() = CoOccur.firstPeriodEdges(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
      Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr")),
      "l_orderkey", "l_suppkey", "yr")

    // variant: attach the period to the deduped membership BEFORE the
    // self-join, so the pair stream goes straight into the final agg
    def coShipPre() = {
      val m = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
        .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr")), "l_orderkey")
      val a = m.select(col("l_orderkey"), col("l_suppkey").as("a"), col("yr"))
      val b = m.select(col("l_orderkey"), col("l_suppkey").as("b"))
      a.join(b, Seq("l_orderkey")).filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("weight"), min(col("yr")).as("first_yr"))
    }

    time("pairs-count")(CoOccur.pairs(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
      "l_orderkey", "l_suppkey").count())
    time("coship-current-warm")(coShipCurrent().count())
    time("coship-current")(coShipCurrent().count())
    time("coship-prejoin-warm")(coShipPre().count())
    time("coship-prejoin")(coShipPre().count())

    val strong = coShipPre().filter(col("weight") >= 5)
      .select(col("a"), col("b"), col("first_yr").as("year")).localCheckpoint()
    time("q17-personalNet")(CoOccur.personalNet(strong).count())
    time("q34-components")(graft.operators.Graph
      .connectedComponents(strong.select(col("a"), col("b"))).count())
    time("q35-bfs")(graft.operators.Graph
      .egoBfs(s, strong.select(col("a"), col("b")), 1L, 2).count())
    spark.stop()
  }
}
