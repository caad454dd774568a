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

  test("z-ordered layout prunes partitions in BOTH dimensions; x-layout cannot") {
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"),
        col("l_quantity"))
      .filter(col("x").between(0, 65535) && col("y").between(0, 65535))
    val shift = 6 // 8×8-value cells — sized for the fixture's key ranges
    val zDir = Files.createTempDirectory("zord").toString
    Ingest.writeZOrdered(src, zDir, "x", "y", shift)
    // baseline: the SAME partition count, but keyed on x alone — what
    // a single-dimension sort/partition layout gives you
    val xDir = Files.createTempDirectory("xord").toString
    src.withColumn("xbucket", col("x") / lit(1L << (shift / 2)))
      .withColumn("xbucket", col("xbucket").cast("long"))
      .write.mode("overwrite").partitionBy("xbucket").parquet(xDir)

    def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
      // execute THIS plan (df.count() would build a separate execution
      // whose scan metrics never touch df.queryExecution's)
      df.queryExecution.toRdd.count()
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in plan"))
      scan.metrics("numPartitions").value
    }

    // a y-SELECTIVE rectangle: full x range, one y cell
    val (xLo, xHi, yLo, yHi) = (0L, 4095L, 1L, 7L)
    val zRead = Ingest.readZRect(spark, zDir, "x", "y", xLo, xHi, yLo, yHi, shift)
    val xRead = spark.read.parquet(xDir)
      .filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
    val zParts = partitionsRead(zRead)
    val zTotal = spark.read.parquet(zDir).select("zbucket").distinct().count()
    val xParts = partitionsRead(xRead)
    val xTotal = spark.read.parquet(xDir).select("xbucket").distinct().count()
    // x-layout: the y predicate prunes NOTHING (x range covers all) —
    // every partition (100% of the data) is read; z-layout: only the
    // covering cells, i.e. roughly the y-selectivity fraction of the
    // data. Partitions are compared as FRACTIONS — the layouts cut the
    // same rows into different partition sizes
    assert(xParts == xTotal, s"x-layout unexpectedly pruned: $xParts/$xTotal")
    assert(zParts.toDouble / zTotal <= 0.6,
      s"z-layout did not prune: $zParts/$zTotal")
    // and a rectangle selective in BOTH dims covers just its cells
    val tight = Ingest.readZRect(spark, zDir, "x", "y", 0, 7, 0, 7, shift)
    assert(partitionsRead(tight) <= 2,
      "single-cell rectangle read more than its covering buckets")
    // and both layouts return identical rows
    val want = src.filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
      .select(sum(col("l_quantity"))).as[Double].head()
    assert(zRead.select(sum(col("l_quantity"))).as[Double].head() == want)
    assert(xRead.select(sum(col("l_quantity"))).as[Double].head() == want)
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

  test("jsonLines parses valid lines, dead-letters malformed ones, and " +
       "tolerates schema drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsontest")
    java.nio.file.Files.writeString(dir.resolve("a.json"),
      """{"id": 1, "name": "ok", "v": 2.5}
        |x{"id": 2, "name": "garbage-prefixed", "v": 1.0}
        |{"id": 3, "name": "missing-v"}
        |{"id": 4, "name": "extra-field", "v": 0.5, "unknown": true}
        |""".stripMargin)
    val df = graft.sources.Ingest.jsonLines(spark, dir.toString,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, name STRING, v DOUBLE"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4)
    // the dead letter: all data fields null, raw line preserved
    val dead = rows.filter(r => r.isNullAt(0))
    assert(dead.length == 1 &&
      dead.head.getString(3).startsWith("x{\"id\": 2"))
    // schema drift is NOT a dead letter: a missing field is null and
    // an extra field is ignored, _corrupt stays null for both
    val byId = rows.filter(!_.isNullAt(0)).map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).isNullAt(2) && byId(3L).isNullAt(3))
    assert(byId(4L).getDouble(2) == 0.5 && byId(4L).isNullAt(3))
  }
}
