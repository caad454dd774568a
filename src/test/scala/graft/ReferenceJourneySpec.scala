package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AuthorProfiles, CoOccur}
import graft.schema.MagTables
import graft.sources.Ingest

/** End-to-end "reference user journey": the exact flow a
  * mihaighidoveanu/iconic-data-science user runs — a tab-separated MAG
  * snapshot read with declared schemas, the two flagship pipelines
  * (PersonalNet_2's personal network and ProfileConversion's author
  * profiles), and a CSV sink — executed through this library only.
  * Fixture topology mirrors the reference's own AddTestData edge cases
  * (`AddTestData.scala:29-96`). */
class ReferenceJourneySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // TSV snapshot: papers (21 cols, only id/year populated meaningfully)
  // and PAA (paper, author, affiliation, seq, origAff)
  private lazy val snapshot: String = {
    val dir = Files.createTempDirectory("magsnap").toFile
    def paperRow(id: Long, year: String) =
      (Seq(id.toString, "1", "doi", "journal", s"title $id", s"title $id",
        "", year, s"$year-06-01", "pub", "1", "1", "1", "", "", "", "",
        "0", "0", "0", s"$year-06-01")).mkString("\t")
    // a1 and a2 coauthor p1 (2000) and p2 (2002); a3 joins on p2 only;
    // p3 (2001) is a1 solo; p4 has a NULL year (reference fill-3000)
    Files.writeString(new java.io.File(dir, "Papers.txt").toPath, Seq(
      paperRow(1, "2000"), paperRow(2, "2002"), paperRow(3, "2001"),
      paperRow(4, "")).mkString("", "\n", "\n"))
    Files.writeString(
      new java.io.File(dir, "PaperAuthorAffiliations.txt").toPath, Seq(
        "1\t10\t5\t1\t", "1\t20\t5\t2\t",
        "2\t10\t5\t1\t", "2\t20\t5\t2\t", "2\t30\t6\t3\t",
        "3\t10\t5\t1\t", "4\t20\t5\t1\t").mkString("", "\n", "\n"))
    Files.writeString(new java.io.File(dir, "PaperReferences.txt").toPath,
      Seq("2\t1", "3\t1", "2\t3").mkString("", "\n", "\n"))
    dir.getPath
  }

  test("TSV snapshot -> personal network -> CSV sink (PersonalNet_2 flow)") {
    val paa = MagTables.paperAuthorAffiliations(spark, snapshot)
    val papers = MagTables.papers(spark, snapshot)
      .select(col("id").as("paper_id"), col("year"))
      .na.fill(AuthorProfiles.SentinelYear, Seq("year"))

    // coauthor first-year edges (a < b), then personal-net closure
    val edges = CoOccur.firstPeriodEdges(
      paa.select(col("paper"), col("author")),
      papers.select(col("paper_id").as("paper"), col("year")),
      "paper", "author", "year")
      .select(col("a"), col("b"), col("first_year").as("year"))
    val gotEdges = edges.as[(Long, Long, Int)].collect().toSet
    // (10,20) first co-paper year 2000; (10,30)/(20,30) only on p2 (2002)
    assert(gotEdges == Set((10L, 20L, 2000), (10L, 30L, 2002),
      (20L, 30L, 2002)))

    val net = CoOccur.personalNet(edges)
      .as[(Long, Long, Long, Int)].collect().toSet
    // every ego's alter pair must itself be an edge; year = max of the 3
    assert(net == Set(
      (10L, 20L, 30L, 2002), (20L, 10L, 30L, 2002), (30L, 10L, 20L, 2002)))

    val out = Files.createTempDirectory("net").toFile.getPath + "/csv"
    Ingest.writeCsv(CoOccur.personalNet(edges), out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 3)
  }

  test("TSV snapshot -> author profiles (ProfileConversion flow)") {
    val paa = MagTables.paperAuthorAffiliations(spark, snapshot)
      .select(col("paper"), col("author"))
    val papers = MagTables.papers(spark, snapshot).select(col("id"), col("year"))
    val refs = MagTables.paperReferences(spark, snapshot)

    val prof = AuthorProfiles.profile(paa, papers, refs, 2000, 2002)
      .as[(Long, Int, Long, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap
    // a1 (10) owns p1,p2,p3: papers 2000,2001,2002; citations: p3→p1
    // (2001), p2→p1 and p2→p3 (2002); per-paper cum at 2002: p1=2,
    // p3=1 → h=1
    assert(prof((10L, 2001)) == (1L, 2L, 1L, 1L, 1))
    assert(prof((10L, 2002)) == (1L, 3L, 2L, 3L, 1))
    // a2 (20) owns p1,p2,p4: the null-year p4 is excluded by the
    // sentinel bound; its only cited paper is p1 (cum 2 by 2002)
    assert(prof((20L, 2002)) == (1L, 2L, 1L, 2L, 1))
    // a3 (30) owns only p2 (2002), which is never cited
    assert(prof((30L, 2000)) == (0L, 0L, 0L, 0L, 0))
    assert(prof((30L, 2002)) == (1L, 1L, 0L, 0L, 0))
    assert(prof.size == 9) // 3 authors x 3 grid years
  }
}
