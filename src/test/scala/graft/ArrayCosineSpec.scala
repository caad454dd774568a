package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayCosine, VectorFns}
import graft.sql.SqlSurface

class ArrayCosineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(1.0, 0.0), Seq(0.0, 1.0)),
    (Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")

  test("native expression matches the higher-order-function form bitwise") {
    val got = vecs.select(ArrayCosine.cosine($"a", $"b").as("n"),
        VectorFns.cosine($"a", $"b").as("h"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n == h) } // identical fold order
  }

  test("participates in whole-stage codegen") {
    // repartition forces a real (non-local) plan; run it so AQE
    // finalizes, then inspect the executed plan
    val df = vecs.repartition(2).select(ArrayCosine.cosine($"a", $"b"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" star marks a WholeStageCodegen stage; a codegen-failing
    // expression would demote the Project to an unstarred (interpreted) one
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[arraycosine.*"), plan)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val got = df.select(ArrayCosine.cosine($"a", $"b")).collect()(0)
    assert(got.isNullAt(0))
  }

  test("SQL surface exposes tables, hindex, and array_cosine") {
    SqlSurface.register(spark, "/root/testdata/sf0.001")
    val h = spark.sql(
      "SELECT hindex(CAST(l_quantity AS BIGINT)) FROM lineitem").as[Int].head()
    assert(h > 0)
    val c = spark.sql(
      "SELECT round(array_cosine(CAST(embedding AS ARRAY<DOUBLE>), " +
        "CAST(embedding AS ARRAY<DOUBLE>)), 6) FROM embeddings LIMIT 1")
      .as[Double].head()
    assert(c == 1.0)
  }

  test("SQL surface exposes the portable hashes (poly_hash, lcg_hash)") {
    SqlSurface.register(spark, "/root/testdata/sf0.001")
    // poly_hash('ab') = (0*31 + 97)*31 + 98 mod 1e9+7 = 3105
    assert(spark.sql("SELECT poly_hash('ab')").as[Long].head() == 3105L)
    // lcg_hash must equal the query surface's lcgHash column form
    val fromSql = spark.sql("SELECT lcg_hash(42)").as[Long].head()
    val fromCol = Seq(42L).toDF("k")
      .select(graft.queries.lcgHash(col("k"))).as[Long].head()
    assert(fromSql == fromCol)
  }
}
