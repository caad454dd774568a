package graft

import org.apache.spark.sql.{Encoders, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.MagSchemas.PaperAuthorAff

/** Typed Dataset surface (SURVEY.md §2.2 P10, §2.8 U4/U5): lambda
  * filters, flatMap generators, groupByKey, and row-level map through
  * an explicit row encoder — the reference's Dataset-of-case-class
  * style (`StaticNet.scala:241`, `PersonalNet.scala:166-190`,
  * `App.scala:40-52` with Spark 4's `Encoders.row` replacing the
  * removed `RowEncoder(schema)`).
  */
class TypedOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val paa = Seq(
    PaperAuthorAff(1L, 10L, 100L, 1, "MIT"),
    PaperAuthorAff(1L, 11L, 100L, 2, "MIT"),
    PaperAuthorAff(2L, 10L, 101L, 1, "Oxford")).toDS()

  test("typed filter + groupByKey count") {
    val perAuthor = paa.filter(_.affiliation == 100L)
      .groupByKey(_.author).count().collect().toMap
    assert(perAuthor == Map(10L -> 1L, 11L -> 1L))
  }

  test("flatMap as UDTF: per-paper author pair generation") {
    val pairs = paa.groupByKey(_.paper)
      .flatMapGroups { (p, rows) =>
        val as = rows.map(_.author).toSeq.sorted
        for (i <- as.indices.iterator; j <- (i + 1 until as.size).iterator)
          yield (p, as(i), as(j))
      }.collect().toSet
    assert(pairs == Set((1L, 10L, 11L)))
  }

  test("row-level map with explicit row encoder (Spark-4 RowEncoder)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "paper BIGINT, author BIGINT")
    val mapped = paa.toDF().map(
      r => Row(r.getLong(0), r.getLong(1) * 10))(Encoders.row(schema))
    assert(mapped.as[(Long, Long)].collect().toSet ==
      Set((1L, 100L), (1L, 110L), (2L, 100L)))
  }

  test("tuple-string parsing into struct (F10)") {
    import graft.functions.TextFns
    val got = Seq("('CAN', 'Grande Prairie')").toDF("c")
      .select(TextFns.parseCountryTuple($"c").as("t"))
      .select("t.country_code", "t.city").as[(String, String)].head()
    assert(got == ("CAN", "Grande Prairie"))
  }
}
