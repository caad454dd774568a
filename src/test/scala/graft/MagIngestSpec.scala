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

  test("aux schemas carry the sample-header field counts") {
    // counts read off data/samples/*.txt (tab-separated, no header)
    assert(MagSchemas.schemaOf[MagSchemas.Journal].fields.length == 10)
    assert(MagSchemas.schemaOf[MagSchemas.ConferenceSeries].fields.length == 7)
    assert(MagSchemas.schemaOf[MagSchemas.ConferenceInstance].fields.length == 15)
    assert(MagSchemas.schemaOf[MagSchemas.PaperUrl].fields.length == 3)
    assert(MagSchemas.schemaOf[MagSchemas.PaperLanguage].fields.length == 2)
    assert(MagSchemas.schemaOf[MagSchemas.PaperCitationContext].fields.length == 3)
    assert(MagSchemas.schemaOf[MagSchemas.PaperRecommendation].fields.length == 3)
    assert(MagSchemas.schemaOf[MagSchemas.FosRelationship].fields.length == 7)
  }

  test("journal reader: empty issn/publisher/webpage stay null strings") {
    val dir = Files.createTempDirectory("mag").toFile
    val f = new java.io.File(dir, "Journals.txt")
    // shape of data/samples/Journals.txt:1 — inner empty fields
    Files.writeString(f.toPath,
      "465\t123\teureka\tEureka\t\t\t\t1017\t138\t2016-06-24\n" +
        "1137\t118\tajhc\tArtist Journal\t2151-4879\t\t\t266\t7558\t2016-06-24\n")
    val df = MagTables.journals(spark, dir.getPath)
    assert(df.count() == 2)
    val r = df.filter(df("id") === 465L).collect()(0)
    assert(r.isNullAt(df.schema.fieldIndex("issn")))
    assert(r.getLong(df.schema.fieldIndex("papers")) == 1017L)
    val r2 = df.filter(df("id") === 1137L).collect()(0)
    assert(r2.getString(df.schema.fieldIndex("issn")) == "2151-4879")
  }

  test("conference-instance reader: empty due dates parse as nulls") {
    val dir = Files.createTempDirectory("mag").toFile
    val f = new java.io.File(dir, "ConferenceInstances.txt")
    // shape of data/samples/ConferenceInstances.txt:1 — 15 cols, the
    // abstract/notification/final due dates empty
    Files.writeString(f.toPath,
      "778\ttime 2008\tTIME 2008\t262\tMontreal, Canada\thttp://x.org/" +
        "\t2008-06-16\t2008-06-18\t\t2008-01-11\t\t\t22\t238\t2016-06-24\n")
    val df = MagTables.conferenceInstances(spark, dir.getPath)
    val r = df.collect()(0)
    assert(r.getLong(df.schema.fieldIndex("series")) == 262L)
    assert(r.isNullAt(df.schema.fieldIndex("abstractDueDate")))
    assert(r.getDate(df.schema.fieldIndex("submissionDueDate")).toString
      == "2008-01-11")
    assert(r.getLong(df.schema.fieldIndex("papers")) == 22L)
  }

  test("citation-context reader: tab-free context text survives intact") {
    val dir = Files.createTempDirectory("mag").toFile
    val f = new java.io.File(dir, "PaperCitationContexts.txt")
    Files.writeString(f.toPath,
      "587\t125816956\tSome work (Author, 1970; Other, 1971) exists.\n")
    val df = MagTables.paperCitationContexts(spark, dir.getPath)
    val r = df.collect()(0)
    assert(r.getLong(0) == 587L && r.getLong(1) == 125816956L)
    assert(r.getString(2).contains("(Author, 1970; Other, 1971)"))
  }

  test("recommendation + fos-relationship readers parse float weights") {
    val dir = Files.createTempDirectory("mag").toFile
    Files.writeString(new java.io.File(dir, "PaperRecommandations.txt").toPath,
      "150\t319\t0.9153817\n150\t228\t0.8398268\n")
    Files.writeString(new java.io.File(dir, "FieldOfStudyRelationship.txt").toPath,
      "487\tPolio\tdisease\t683\tSurgery\tmedical_treatment\t0.0102311\n")
    val rec = MagTables.paperRecommendations(spark, dir.getPath)
    assert(rec.count() == 2)
    assert(rec.filter(rec("recommended") === 319L).collect()(0)
      .getDouble(2) == 0.9153817)
    val fr = MagTables.fieldOfStudyRelationship(spark, dir.getPath)
    val r = fr.collect()(0)
    assert(r.getString(fr.schema.fieldIndex("type2")) == "medical_treatment")
    assert(r.getDouble(fr.schema.fieldIndex("weight")) == 0.0102311)
  }

  test("affiliations-FC reader: country tuple parses to a struct at ingest") {
    val dir = Files.createTempDirectory("mag").toFile
    // shape of data/samples/Affiliations_FC.txt:1-4 — 11 cols, grid
    // sometimes empty, the trailing column a python-ish tuple string
    // (incl. a non-ASCII city, row 2)
    Files.writeString(new java.io.File(dir, "Affiliations_FC.txt").toPath,
      "20455151\t9759\tair liquide\tAir Liquide\tgrid.476009.c" +
        "\thttps://a.example.org/x\thttp://w.example.org/Air_Liquide" +
        "\t6314\t44828\t2016-06-24\t('CAN', 'Grande Prairie')\n" +
      "35926432\t12053\tmackay medical college\tMackay Medical College" +
        "\t\thttp://www.example.tw/\thttp://w.example.org/Mackay" +
        "\t815\t6080\t2016-06-24\t('TWN', '三芝區')\n")
    val df = MagTables.affiliationsFC(spark, dir.getPath)
    assert(df.count() == 2)
    assert(df.schema("fc").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    import org.apache.spark.sql.functions.col
    val r = df.filter(col("id") === 20455151L)
      .select(col("fc.country_code"), col("fc.city"), col("papers"))
      .collect()(0)
    assert(r.getString(0) == "CAN" && r.getString(1) == "Grande Prairie")
    assert(r.getLong(2) == 6314L)
    val tw = df.filter(col("id") === 35926432L)
      .select(col("fc.country_code"), col("fc.city"), col("grid"))
      .collect()(0)
    assert(tw.getString(0) == "TWN" && tw.getString(1) == "三芝區")
    assert(tw.isNullAt(2))
  }

  test("abstracts reader: unquoted JSON with embedded quotes survives") {
    val dir = Files.createTempDirectory("mag").toFile
    // shape of data/samples/PaperAbstractsInvertedIndex.txt:1 — the
    // second column is raw JSON, full of unquoted `"` (quote handling
    // must be OFF for this read or the field is mangled)
    Files.writeString(
      new java.io.File(dir, "PaperAbstractsInvertedIndex.txt").toPath,
      "15\t{\"IndexLength\":4,\"InvertedIndex\":{\"im\":[2]," +
        "\"erfolgreiche\":[0],\"arbeitsteilung\":[1,3]}}\n" +
        "37\t{\"IndexLength\":1,\"InvertedIndex\":{\"summary\":[0]}}\n")
    val df = MagTables.paperAbstractsInvertedIndex(spark, dir.getPath)
    assert(df.count() == 2)
    val r = df.filter(df("paper") === 15L).collect()(0)
    val js = r.getString(df.schema.fieldIndex("indexedAbstract"))
    assert(js.startsWith("{\"IndexLength\":4"))
    // decodes with real JSON codecs to the declared map shape
    import org.apache.spark.sql.functions.{col, from_json, map_keys, size}
    val dec = df.select(col("paper"), from_json(col("indexedAbstract"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "struct<IndexLength:int, InvertedIndex:map<string,array<int>>>"))
      .as("doc"))
    val d15 = dec.filter(col("paper") === 15L)
      .select(col("doc.IndexLength"), size(map_keys(col("doc.InvertedIndex"))))
      .collect()(0)
    assert(d15.getInt(0) == 4 && d15.getInt(1) == 3)
  }

  test("paper-urls + languages readers cover the per-paper aux pair") {
    val dir = Files.createTempDirectory("mag").toFile
    Files.writeString(new java.io.File(dir, "PaperUrls.txt").toPath,
      "9\t1\thttps://example.org/a?b=1\n15\t3\thttps://example.org/c.pdf\n")
    Files.writeString(new java.io.File(dir, "PaperLanguages.txt").toPath,
      "198\ten\n197\tro\n")
    val urls = MagTables.paperUrls(spark, dir.getPath)
    assert(urls.filter(urls("paper") === 9L).collect()(0).getInt(1) == 1)
    val langs = MagTables.paperLanguages(spark, dir.getPath)
    assert(langs.filter(langs("language") === "ro").count() == 1)
  }
}
