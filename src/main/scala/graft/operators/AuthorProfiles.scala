package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HIndexAgg

/** The reference's richest pipeline: per-author-per-year bibliometric
  * profiles (`ProfileConversion.scala` end-to-end, SURVEY.md §3 EP2):
  * per-year citation counts, per-year paper counts, year densification,
  * cumulative aggregates (W1), and a PER-YEAR h-index — produced here as
  * ONE dataflow instead of the reference's notebook of cached stages.
  *
  * Semantics preserved from the reference:
  *  - null publication years are sentinel-filled with 3000
  *    (`ProfileConversion.scala:44`); sentinel-year papers/citations are
  *    excluded by the `year <= maxYear` bound exactly like the
  *    reference's citation leg (`:97`);
  *  - a citation is attributed to the YEAR OF THE CITING paper;
  *  - cumulative aggregates include ALL pre-`minYear` history: actual
  *    rows for years < minYear flow through the window and only the
  *    OUTPUT is restricted to year >= minYear, mirroring the
  *    reference's window-then-`filter($"year" >= minYear)` order
  *    (`ProfileConversion.scala:114-115,139-142`);
  *  - h_index at year Y is computed over each paper's CUMULATIVE
  *    citations up to Y (the reference's densified `aggregated` column,
  *    `:148-152`) — it grows year over year;
  *  - self-citations count (the reference does not exclude them —
  *    its own test fixture marks one, `AddTestData.scala:86-87`);
  *  - reference edges are treated as a set (duplicates dropped).
  *
  * Deliberate departures (documented, not bugs):
  *  - the output grain is a DENSE (author × [minYear,maxYear]) grid with
  *    zero-filled rows, where the reference inner-joins its two legs and
  *    so drops author-years with no citation row (`:165-169`);
  *  - the reference's paper leg would keep sentinel-3000 rows (its
  *    `dfPaperCounts` never applies the maxYear bound); we bound both
  *    legs symmetrically.
  *
  * Scale: shuffles on `author` (paper counts, final grid joins) and on
  * `cited` paper (per-paper cumulative window); the year grid is a
  * broadcast cross join; the h-index aggregates per-paper cumulative
  * citation totals with the constant-size [[HIndexAgg]] buffer, never a
  * collect_list. The per-paper densification fans out to at most
  * |cited papers| × |grid years| rows — the same shape the reference
  * materializes, and it stays partitioned by paper until the final
  * author-keyed aggregation.
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
    val authorship = graft.Checkpoints.checkpoint( // reused by papers-,
      paa.select(col("paper"), col("author")).distinct()) // citations- and h-index legs
    val refEdges = refs.select(col("citing"), col("cited")).distinct()

    val years = spark.range(minYear, maxYear + 1)
      .select(col("id").cast("int").as("year"))

    // ---- citations: per cited paper, count by CITING year (all years
    // up to maxYear — pre-minYear history included) ----
    val paperCitesByYear = refEdges
      .join(paperYear.select(col("paper").as("citing"), col("year")), "citing")
      .filter(col("year") <= maxYear)
      .groupBy(col("cited"), col("year"))
      .agg(count(lit(1)).as("cnt"))

    // densify each cited paper over [max(minYear, first-cite-year),
    // maxYear] (reference `citedInRange`, :100-103), union the actual
    // rows (incl. pre-minYear), cumulate, THEN restrict the output years
    val firstCite = paperCitesByYear.groupBy(col("cited"))
      .agg(min(col("year")).as("fy"))
    val citeGrid = firstCite.crossJoin(broadcast(years))
      .filter(col("year") >= col("fy"))
      .select(col("cited"), col("year"), lit(0L).as("cnt"))
    val wPaper = Window.partitionBy(col("cited")).orderBy(col("year"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cumPerPaper = paperCitesByYear.unionByName(citeGrid)
      .groupBy(col("cited"), col("year"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wPaper))
      .filter(col("year") >= minYear)

    // author-year citation profile: at year Y each cited paper of the
    // author contributes its in-year count and its cumulative total;
    // h_index is over the papers' cumulative totals at Y (reference
    // `authorsCitations`, :148-152). Papers not yet cited by Y carry 0
    // citations and cannot affect the h-index.
    val authorCitations = cumPerPaper
      .join(authorship.select(col("paper").as("cited"), col("author")), "cited")
      .groupBy(col("author"), col("year"))
      .agg(sum(col("cnt")).as("citations"),
        sum(col("cum")).as("cum_citations"),
        HIndexAgg.hindex(col("cum")).as("h_index"))

    // ---- papers: per author-year counts; cumulative over ALL years
    // (pre-minYear rows enter the window, output filtered afterwards) ----
    val papersByYear = authorship.join(paperYear, "paper")
      .filter(col("year") <= maxYear)
      .groupBy(col("author"), col("year"))
      .agg(count(lit(1)).as("papers"))
    val authorGrid = authorship.select(col("author")).distinct()
      .crossJoin(broadcast(years))
    val wAuthor = Window.partitionBy(col("author")).orderBy(col("year"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val paperProfile = papersByYear
      .unionByName(authorGrid.withColumn("papers", lit(0L)))
      .groupBy(col("author"), col("year"))
      .agg(sum(col("papers")).as("papers"))
      .withColumn("cum_papers", sum(col("papers")).over(wAuthor))
      .filter(col("year") >= minYear)

    paperProfile
      .join(authorCitations, Seq("author", "year"), "left")
      .na.fill(0L, Seq("citations", "cum_citations"))
      .na.fill(0, Seq("h_index"))
      .select(col("author"), col("year"), col("papers"), col("cum_papers"),
        col("citations"), col("cum_citations"), col("h_index"))
  }
}
