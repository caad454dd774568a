package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Ingest, Tables}

/** Sink surface (S5/S6/S8) + the scale property that matters: a write
  * partitioned by a filter key must let reads prune partitions. */
class IngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("partitionBy write → partition-pruned read") {
    val dir = Files.createTempDirectory("part").toString
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("yr", year(col("o_orderdate")))
    Ingest.writePartitioned(df, dir, Seq("yr"))
    val read = spark.read.parquet(dir).filter(col("yr") === 1996)
    val scan = read.queryExecution.executedPlan.toString
    // pruning shows up as a partition filter on the scan, and the
    // result only contains the requested partition
    assert(scan.contains("PartitionFilters: [isnotnull(yr"), scan)
    assert(read.select("yr").distinct().as[Int].collect().toSeq == Seq(1996))
  }

  test("csv round-trip preserves rows") {
    val dir = Files.createTempDirectory("csv").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Ingest.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
  }

  test("approx_count_distinct stays within its rsd of exact") {
    val q = SparkEntry.queries("q44_approx_distinct")(spark, "/root/testdata/sf0.001")
    q.as[(String, Long, Long)].collect().foreach { case (_, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.1)
    }
  }
}
