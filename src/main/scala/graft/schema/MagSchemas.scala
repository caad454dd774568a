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
}
