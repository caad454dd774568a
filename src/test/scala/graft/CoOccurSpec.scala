package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoOccur

/** Port of the reference's hand-checkable PAA topologies
  * (`AddTestData.scala:61-72`: a 3-coauthor paper, singleton-author
  * papers, a disconnected pair) with printed oracles turned into
  * asserted goldens (SURVEY.md §5).
  */
class CoOccurSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (paper, author): p0{1,2,3} p1{1,2} p2{2,3} p7{6,7} p8{8} p9{9}
  private lazy val paa = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L),
    (7L, 6L), (7L, 7L), (8L, 8L), (9L, 9L),
    (1L, 1L) // duplicate row: must not double-count (distinct grain)
  ).toDF("paper", "author")

  private lazy val years = Seq(
    (0L, 2000), (1L, 2001), (2L, 1999), (7L, 2005), (8L, 2004), (9L, 2004)
  ).toDF("paper", "year")

  test("weightedEdges counts distinct shared groups") {
    val got = CoOccur.weightedEdges(paa, "paper", "author")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 2L), (6L, 7L, 1L)))
  }

  test("firstPeriodEdges takes min year per pair") {
    val got = CoOccur.firstPeriodEdges(paa, years, "paper", "author", "year")
      .select("a", "b", "first_year").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 2000), (1L, 3L, 2000), (2L, 3L, 1999), (6L, 7L, 2005)))
  }

  test("personalNet closes alter pairs with greatest-year semantics") {
    val edges = CoOccur.firstPeriodEdges(paa, years, "paper", "author", "year")
      .selectExpr("a", "b", "first_year as year")
    val got = CoOccur.personalNet(edges)
      .as[(Long, Long, Long, Int)].collect().toSet
    // triangle {1,2,3}: every ego sees the other two; all closure years
    // resolve to max(2000, 1999, 2000) per pair = 2000
    assert(got == Set((1L, 2L, 3L, 2000), (2L, 1L, 3L, 2000), (3L, 1L, 2L, 2000)))
  }
}
