package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{MagSchemas, MagTables}

/** TSV ingest path (S1): schema-declared tab-delimited read with
  * PERMISSIVE null handling, driven through the MAG table readers. */
class MagIngestSpec extends AnyFunSuite with SparkTestBase {

  test("reads a MAG-style TSV snapshot with explicit schema") {
    val dir = Files.createTempDirectory("mag").toFile
    val f = new java.io.File(dir, "PaperAuthorAffiliations.txt")
    // trailing empty field + unparseable int → PERMISSIVE nulls
    Files.writeString(f.toPath,
      "1\t100\t5\t1\tMIT\n2\t200\t\tnotanint\t\n3\t300\t6\t2\tOxford\n")
    val df = MagTables.paperAuthorAffiliations(spark, dir.getPath)
    val expected = org.apache.spark.sql.types.StructType(
      MagSchemas.schemaOf[MagSchemas.PaperAuthorAff]
        .fields.map(_.copy(nullable = true)))
    assert(df.schema == expected)
    assert(df.count() == 3)
    val bad = df.filter(df("paper") === 2L).collect()(0)
    assert(bad.isNullAt(df.schema.fieldIndex("authorSequence")))
  }

  test("paper schema derives all 21 reference fields") {
    val s = MagSchemas.schemaOf[MagSchemas.Paper]
    assert(s.fields.length == 21)
    assert(s("date").dataType == org.apache.spark.sql.types.DateType)
  }
}
