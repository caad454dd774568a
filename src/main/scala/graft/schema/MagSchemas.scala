package graft.schema

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.Ingest

/** The reference's MAG data model (SURVEY.md §1.4), declared as case
  * classes with schemas derived via Encoders — the same
  * schema-from-case-class style the reference uses
  * (`ScalaReflection.schemaFor[Paper]`, `src/scala/model/MAG.scala:14`).
  *
  * Field sets follow `src/scala/model/models.scala:4-30` (the canonical
  * truth; the notebooks drift — SURVEY.md §1.4 "schema-drift warts").
  * A reference user can point [[MagTables]] at their TSV snapshot
  * directory and run the pipelines in [[graft.operators.AuthorProfiles]]
  * / [[graft.operators.CoOccur]] unchanged.
  */
object MagSchemas {
  // models.scala:6-10
  case class Paper(id: Long, rank: Int, doi: String, docType: String,
      title: String, originalTitle: String, bookTitle: String, year: Int,
      date: Date, publisher: String, journal: Long, conferenceSeries: Long,
      conferenceInstance: Long, volume: String, issue: String,
      firstPage: String, lastPage: String, references: Long, citations: Long,
      estimatedCitations: Long, createdAt: Date)
  // models.scala:12-13
  case class Author(id: Long, rank: Long, name: String, dname: String,
      affiliation: Long, papers: Long, citations: Long, createdAt: Date)
  // models.scala:15-16
  case class Fos(id: Long, rank: Int, name: String, dname: String,
      mainType: String, level: Int, papers: Long, citations: Long,
      createdAt: Date)
  // models.scala:18-21 (incl. the trailing geo columns countryCode,
  // country that parseCountryTuple / the geocoding flow populate)
  case class Affiliation(id: Long, rank: Int, name: String, dname: String,
      grid: String, page: String, wiki: String, papers: Long, citations: Long,
      lat: Float, long: Long, createdAt: Date,
      countryCode: String, country: String)
  // models.scala:24
  case class PaperAuthorAff(paper: Long, author: Long, affiliation: Long,
      authorSequence: Int, originalAffiliation: String)
  // models.scala:26
  case class PaperFos(paper: Long, fos: Long, similarity: Double)
  // models.scala:28
  case class PaperReference(citing: Long, cited: Long)
  // models.scala:30
  case class FosChild(parent: Long, child: Long)

  // ---- auxiliary catalog relations --------------------------------------
  // The reference samples these alongside the core eight
  // (`src/notebooks/scala/MagDwarf.scala:142-147`) but never declares
  // schemas for them — a user loading a real MAG dump hits that gap on
  // day one. Field sets are read off the tab-separated sample headers
  // (`data/samples/Journals.txt:1` 10 cols, `ConferenceSeries.txt:1`
  // 7 cols, `ConferenceInstances.txt:1` 15 cols, `PaperUrls.txt:1`
  // 3 cols, `PaperLanguages.txt:1` 2 cols, `PaperCitationContexts.txt:1`
  // 3 cols, `PaperRecommandations.txt:1` 3 cols,
  // `FieldOfStudyRelationship.txt:1` 7 cols), field names following the
  // core tables' conventions above (id/rank/name/dname/papers/citations/
  // createdAt).

  // Journals.txt: id rank name dname issn publisher webpage papers
  // citations createdAt
  case class Journal(id: Long, rank: Int, name: String, dname: String,
      issn: String, publisher: String, webpage: String, papers: Long,
      citations: Long, createdAt: Date)
  // ConferenceSeries.txt: id rank name dname papers citations createdAt
  case class ConferenceSeries(id: Long, rank: Int, name: String,
      dname: String, papers: Long, citations: Long, createdAt: Date)
  // ConferenceInstances.txt: id name dname series location url start end
  // abstractDue submissionDue notificationDue finalDue papers citations
  // createdAt (the four *Due dates are frequently empty in the wild —
  // PERMISSIVE nulls)
  case class ConferenceInstance(id: Long, name: String, dname: String,
      series: Long, location: String, url: String, startDate: Date,
      endDate: Date, abstractDueDate: Date, submissionDueDate: Date,
      notificationDueDate: Date, finalDueDate: Date, papers: Long,
      citations: Long, createdAt: Date)
  // PaperUrls.txt: paper sourceType url
  case class PaperUrl(paper: Long, sourceType: Int, url: String)
  // PaperLanguages.txt: paper language
  case class PaperLanguage(paper: Long, language: String)
  // PaperCitationContexts.txt: citing cited contextText — the text a
  // citing paper wraps around each reference, keyed by the SAME
  // (citing, cited) pair as PaperReference; the reference's intended
  // text-analysis substrate (SURVEY.md §0.3)
  case class PaperCitationContext(citing: Long, cited: Long,
      context: String)
  // PaperRecommandations.txt (the reference's on-disk spelling):
  // paper recommended score
  case class PaperRecommendation(paper: Long, recommended: Long,
      score: Double)
  // FieldOfStudyRelationship.txt: denormalized fos pairs with display
  // names and types carried inline plus a relation weight
  case class FosRelationship(fos1: Long, name1: String, type1: String,
      fos2: Long, name2: String, type2: String, weight: Double)
  // Affiliations_FC.txt: the geocoded affiliations export — the 10
  // leading Affiliation columns as sampled (no lat/long; the file
  // predates them) plus the trailing country tuple-string
  // "('CAN', 'Grande Prairie')" the reference parses ad hoc
  // (`Geocoding.ipynb` cells 10-14; `data/samples/Affiliations_FC
  // .txt:1`). Ingest keeps `fc` a STRING here; [[MagTables
  // .affiliationsFC]] parses it into a typed struct at read time.
  case class AffiliationFC(id: Long, rank: Int, name: String, dname: String,
      grid: String, page: String, wiki: String, papers: Long,
      citations: Long, createdAt: Date, fc: String)
  // PaperAbstractsInvertedIndex.txt: paper id + the abstract stored as
  // a JSON inverted index ({"IndexLength":N,"InvertedIndex":
  // {word:[positions]}} — `data/samples/PaperAbstractsInvertedIndex
  // .txt:1`). The JSON stays a STRING at ingest (its vocabulary is
  // per-row, so no static schema exists for the map keys); decoding is
  // a `from_json(map<string,array<int>>)` select — the q59/q263 path.
  case class PaperAbstractInvIndex(paper: Long, indexedAbstract: String)

  def schemaOf[T <: Product : scala.reflect.runtime.universe.TypeTag]: StructType =
    Encoders.product[T].schema
}

/** TSV snapshot readers — the reference's ingest path (S1:
  * `SparkUtils.scala:10-15`): tab-delimited, explicit schema,
  * PERMISSIVE nulls. */
object MagTables {
  import MagSchemas._

  private def read[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, dir: String, file: String): DataFrame =
    Ingest.delimited(spark, s"$dir/$file", schemaOf[T])

  def papers(s: SparkSession, dir: String): DataFrame =
    read[Paper](s, dir, "Papers.txt")
  def authors(s: SparkSession, dir: String): DataFrame =
    read[Author](s, dir, "Authors.txt")
  def paperAuthorAffiliations(s: SparkSession, dir: String): DataFrame =
    read[PaperAuthorAff](s, dir, "PaperAuthorAffiliations.txt")
  def paperReferences(s: SparkSession, dir: String): DataFrame =
    read[PaperReference](s, dir, "PaperReferences.txt")
  def fieldsOfStudy(s: SparkSession, dir: String): DataFrame =
    read[Fos](s, dir, "FieldsOfStudy.txt")
  def fieldOfStudyChildren(s: SparkSession, dir: String): DataFrame =
    read[FosChild](s, dir, "FieldOfStudyChildren.txt")
  def affiliations(s: SparkSession, dir: String): DataFrame =
    read[Affiliation](s, dir, "Affiliations.txt")

  // auxiliary catalog relations (MagDwarf.scala:142-147 sample set)
  def journals(s: SparkSession, dir: String): DataFrame =
    read[Journal](s, dir, "Journals.txt")
  def conferenceSeries(s: SparkSession, dir: String): DataFrame =
    read[ConferenceSeries](s, dir, "ConferenceSeries.txt")
  def conferenceInstances(s: SparkSession, dir: String): DataFrame =
    read[ConferenceInstance](s, dir, "ConferenceInstances.txt")
  def paperUrls(s: SparkSession, dir: String): DataFrame =
    read[PaperUrl](s, dir, "PaperUrls.txt")
  def paperLanguages(s: SparkSession, dir: String): DataFrame =
    read[PaperLanguage](s, dir, "PaperLanguages.txt")
  def paperCitationContexts(s: SparkSession, dir: String): DataFrame =
    read[PaperCitationContext](s, dir, "PaperCitationContexts.txt")
  // "Recommandations" is the snapshot's own spelling
  // (`data/samples/PaperRecommandations.txt`); keep it so a real dump
  // loads without a rename step
  def paperRecommendations(s: SparkSession, dir: String): DataFrame =
    read[PaperRecommendation](s, dir, "PaperRecommandations.txt")
  def fieldOfStudyRelationship(s: SparkSession, dir: String): DataFrame =
    read[FosRelationship](s, dir, "FieldOfStudyRelationship.txt")
  // The country tuple-string is parsed into a proper struct AT INGEST
  // (F10: the engine stores structured data structurally) — downstream
  // code sees fc.country_code / fc.city, never the raw tuple syntax.
  def affiliationsFC(s: SparkSession, dir: String): DataFrame =
    read[AffiliationFC](s, dir, "Affiliations_FC.txt")
      .withColumn("fc",
        graft.functions.TextFns.parseCountryTuple(
          org.apache.spark.sql.functions.col("fc")))
  // The abstracts file embeds unquoted JSON (full of `"`) in its second
  // column; MAG TSVs never CSV-quote, so quoting is DISABLED for this
  // read — a `"` is just a character, never a field delimiter.
  def paperAbstractsInvertedIndex(s: SparkSession, dir: String): DataFrame =
    Ingest.delimited(s, s"$dir/PaperAbstractsInvertedIndex.txt",
      schemaOf[PaperAbstractInvIndex], quote = "")
}
