package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HIndexAgg

/** The reference's richest pipeline: per-author-per-year bibliometric
  * profiles (`ProfileConversion.scala` end-to-end, SURVEY.md §3 EP2):
  * per-year citation counts, per-year paper counts, year densification,
  * cumulative aggregates (W1), and h-index — produced here as ONE
  * dataflow instead of the reference's notebook of cached stages.
  *
  * Semantics preserved from the reference:
  *  - null publication years are sentinel-filled with 3000
  *    (`ProfileConversion.scala:44`) and the sentinel never enters the
  *    profile output (the year grid stops at `maxYear`, mirroring
  *    `filter($"year" <= maxYear)`, `:97,115,142`);
  *  - a citation is attributed to the YEAR OF THE CITING paper;
  *  - self-citations count (the reference does not exclude them —
  *    its own test fixture marks one, `AddTestData.scala:86-87`);
  *  - reference edges are treated as a set (duplicates dropped).
  *
  * Scale: three shuffles on `author` (citations, papers, final joins),
  * one on `cited` paper; the year grid is a broadcast cross join; the
  * h-index aggregates per-paper citation totals with the constant-size
  * [[HIndexAgg]] buffer, never a collect_list.
  */
object AuthorProfiles {

  val SentinelYear = 3000

  /** @param paa    (paper, author) authorship pairs
    * @param papers (id, year) publication years (year nullable)
    * @param refs   (citing, cited) paper-level citation edges
    * @param minYear,maxYear profile year range (reference: 2000-2018)
    * @return (author, year, papers, cum_papers, citations,
    *          cum_citations, h_index) — one row per author per year in
    *          [minYear, maxYear]
    */
  def profile(paa: DataFrame, papers: DataFrame, refs: DataFrame,
              minYear: Int, maxYear: Int): DataFrame = {
    val spark = paa.sparkSession
    val paperYear = papers
      .select(col("id").as("paper"), col("year"))
      .na.fill(SentinelYear, Seq("year"))
    val authorship = paa.select(col("paper"), col("author")).distinct()
      .localCheckpoint() // reused by papers-, citations- and h-index legs
    val refEdges = refs.select(col("citing"), col("cited")).distinct()

    val papersByYear = authorship.join(paperYear, "paper")
      .groupBy(col("author"), col("year"))
      .agg(count(lit(1)).as("papers"))

    // citing-paper year joined onto the cited paper's authors
    val citationsByYear = refEdges
      .join(paperYear.select(col("paper").as("citing"), col("year")), "citing")
      .join(authorship.select(col("paper").as("cited"), col("author")), "cited")
      .groupBy(col("author"), col("year"))
      .agg(count(lit(1)).as("citations"))

    // h-index over per-paper citation totals (constant per author)
    val perPaperCitations = refEdges.groupBy(col("cited")).agg(count(lit(1)).as("c"))
    val hIndex = authorship
      .join(perPaperCitations.withColumnRenamed("cited", "paper"), Seq("paper"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(col("author"))
      .agg(HIndexAgg.hindex(col("c")).as("h_index"))

    val years = spark.range(minYear, maxYear + 1).select(col("id").cast("int").as("year"))
    val grid = authorship.select(col("author")).distinct()
      .crossJoin(broadcast(years))

    val w = Window.partitionBy(col("author")).orderBy(col("year"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(papersByYear, Seq("author", "year"), "left")
      .join(citationsByYear, Seq("author", "year"), "left")
      .na.fill(0L, Seq("papers", "citations"))
      .withColumn("cum_papers", sum(col("papers")).over(w))
      .withColumn("cum_citations", sum(col("citations")).over(w))
      .join(hIndex, "author")
      .select(col("author"), col("year"), col("papers"), col("cum_papers"),
        col("citations"), col("cum_citations"), col("h_index"))
  }
}
