package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

class QualitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (id, qty, tag, fk) with planted defects: one qty out of range, one
  // null tag, a duplicated id, one dangling fk, one NULL fk (exempt)
  private def rows = Seq(
    (1L, 10, "a", Some(100L)),
    (2L, 999, "b", Some(100L)),
    (3L, 5, null, Some(200L)),
    (3L, 7, "c", Some(999L)),
    (4L, 8, "d", None)
  ).toDF("id", "qty", "tag", "fk")

  private def dim = Seq(100L, 200L).toDF("k")

  test("expect counts each rule family correctly and flags pass/fail") {
    val got = Quality.expect(rows,
        rowRules = Seq(
          "qty_in_range" -> !col("qty").between(1, 50),
          "tag_not_null" -> col("tag").isNull),
        uniqueRules = Seq("id_unique" -> Seq("id")),
        fkRules = Seq(("fk_in_dim", "fk", dim, "k")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("qty_in_range") == ((1L, false)))
    assert(got("tag_not_null") == ((1L, false)))
    assert(got("id_unique") == ((1L, false))) // 2 rows of id=3 -> 1 extra
    assert(got("fk_in_dim") == ((1L, false))) // 999 dangles; NULL exempt
    assert(got.size == 4)
  }

  test("a clean table passes every rule, including on empty input") {
    def check(df: org.apache.spark.sql.DataFrame) = {
      val got = Quality.expect(df,
          rowRules = Seq("qty_in_range" -> !col("qty").between(1, 1000)),
          uniqueRules = Seq("pk_unique" -> Seq("id", "qty")),
          fkRules = Seq(("fk_in_dim", "fk", dim, "k")))
        .as[(String, Long, Boolean)].collect()
      assert(got.forall(r => r._2 == 0L && r._3), got.mkString(","))
      assert(got.length == 3)
    }
    check(rows.filter(col("id") === 1))
    check(rows.filter(col("id") < 0)) // empty relation
  }

  test("null predicates do not count as violations (3-valued logic)") {
    // qty NULL -> between() is null -> when() falls to otherwise(0)
    val df = Seq((1L, Some(10)), (2L, None)).toDF("id", "qty")
    val got = Quality.expect(df,
        rowRules = Seq("qty_in_range" -> !col("qty").between(1, 5)))
      .as[(String, Long, Boolean)].collect().head
    assert(got._2 == 1L) // id=1 violates; id=2's null predicate does not
  }

  test("piiCensus counts each identifier shape and redacts them in order") {
    val docs = Seq(
      (1L, "write to alice.smith@corp.example.org or call 555-0199 now"),
      (2L, "server at 192.168.1.10 and 10.0.0.1 no contacts"),
      (3L, "clean text with no identifiers at all"),
      // x@y.z has a 1-char TLD (pattern wants {2,}) -> NOT an email;
      // the phone fragment inside a@b.io's neighborhood still counts
      (4L, "a@b.io x@y.z 555-1234 1.2.3.4")
    ).toDF("doc_id", "text")
    val got = Quality.piiCensus(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1 && got(1L)._3 == 0)
    assert(got(2L) == ((0L, 0L, 2L,
      "server at <pii> and <pii> no contacts".length.toLong)))
    assert(got(3L) == ((0L, 0L, 0L,
      "clean text with no identifiers at all".length.toLong)))
    assert(got(4L)._1 == 1 && got(4L)._2 == 1 && got(4L)._3 == 1)
    // redaction shrinks exactly the docs that had matches
    assert(got(1L)._4 < "write to alice.smith@corp.example.org or call 555-0199 now".length)
  }

  test("bigramLmScore matches hand-computed integer conditionals and " +
       "ranks templated text above out-of-distribution text") {
    // corpus: "a b a c", "a b" → prefix counts a=3, b=1;
    // bigram counts (a,b)=2, (b,a)=1, (a,c)=1; +1 prefix discount:
    // doc 1: p = 2e6//4 + 1e6//2 + 1e6//4 → (500000+500000+250000)//3
    // doc 2: p = 500000 // 1
    val fix = Seq((1L, "a b a c"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = Quality.bigramLmScore(fix, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(1L -> ((3L, 416666L)), 2L -> ((1L, 500000L))))
    // single-word doc 3 has no bigram → absent by contract

    // distributional ranking on a larger corpus: many documents share
    // a template; one is word salad over unique tokens — the template
    // docs must outscore it under the corpus' own statistics (raw MLE
    // would score both 1.0; the +1 discount is what separates a
    // singleton's ½ from a 20-observation agreement's 20/21)
    val corpus = ((0L until 20L).map(i => (i, "the quick brown fox")) :+
      ((99L, "zxq wvu tsr qpo"))).toDF("doc_id", "text")
    val scores = Quality.bigramLmScore(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert((0L until 20L).forall(i => scores(i) > scores(99L)))
    assert(scores(0L) == 20L * Quality.LmScale / 21L) // 952380
    assert(scores(99L) == Quality.LmScale / 2L)       // 500000
  }

  test("trigramLmScore separates a bigram-preserving reshuffle that " +
       "bigramLmScore cannot, and backs off exactly") {
    // T = (a b a c)^6 and S = (a b)^6 (a c)^6 have IDENTICAL bigram
    // multisets (ab/ba/ac ×6, ca ×5) — an Eulerian-style reshuffle —
    // but S replaces T's bac/cab continuations with bab/cac ones, so
    // only the order-3 model can rank T (in-template) above S.
    val t = Seq.fill(6)("a b a c").mkString(" ")
    val s = (Seq.fill(6)("a b") ++ Seq.fill(6)("a c")).mkString(" ")
    val docs = Seq((1L, t), (2L, s), (3L, "x y z")).toDF("doc_id", "text")
    val lm2 = Quality.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val lm3 = Quality.trigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(lm2(1L) == lm2(2L),
      "bigram model must NOT separate the bigram-preserving reshuffle")
    assert(lm3(1L) > lm3(2L),
      s"trigram model must rank template over reshuffle: $lm3")
    // doc 3's only trigram has a singleton context (c12 = 1 < 2) →
    // stupid backoff: (2 · ((1·S) div (1+1))) div 5 = S/5
    assert(lm3(3L) == 2L * (Quality.LmScale / 2L) / 5L) // 200000
  }

  test("urlCensus extracts host/domain/path and strips tracking params " +
       "in original order; link-free docs come back empty") {
    val docs = Seq(
      (1L, "read https://a.news.example.org/world/item?utm_source=x&q=1&utm_medium=y&page=2 now"),
      (2L, "plain https://example.com/top"),
      (3L, "no links here at all")).toDF("doc_id", "text")
    val got = Quality.urlCensus(docs, "doc_id", "text")
      .as[(Long, String, String, String, String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "a.news.example.org", "example.org",
      "/world/item", "q=1&page=2", 4L, 2L)))
    assert(got(2L) == ((2L, "example.com", "example.com", "/top",
      "", 0L, 0L)))
    assert(got(3L) == ((3L, "", "", "", "", 0L, 0L)))
  }

  test("dataset card reports hand-computed corpus facts on a planted " +
       "fixture (exact-dup and near-dup excess included)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("card_fix").toString
    Seq(
      (1L, "a b c a", "en", "s1", 7L),
      (2L, "a b c a", "en", "s1", 7L),   // exact dup of 1
      (3L, "d e", "fr", "s2", 3L),       // sub-shingle short doc
      (4L, "p q r s t u v w", "en", "s2", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val card = graft.queries.TextQueries.defs("q214_dataset_card")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(card == Map(
      "n_docs" -> 4L, "total_chars" -> 32L,
      "total_words" -> 18L,            // 4 + 4 + 2 + 8
      "distinct_words" -> 13L,         // a b c d e p q r s t u v w
      "n_langs" -> 2L, "n_sources" -> 2L,
      "top_lang_docs" -> 3L,           // en
      "exact_dup_excess" -> 1L,        // docs 1,2 share the text key
      "neardup_excess" -> 1L,          // cluster {1,2}: 2 members - 1
      "short_docs" -> 4L,              // every doc < 20 words
      "mean_words_x100" -> 450L))      // 18*100 // 4
  }

  test("kAnonymityCensus pools fine violators at the coarse tuple and " +
       "flags groups that stay re-identifiable even after pooling") {
    import org.apache.spark.sql.functions.col
    // (nat, seg, kb): A = 5 rows fine-ok; B splits 2+3 across kb but
    // pools to 5 at (nat, seg); C is a lone row that stays below k
    val rows = Seq.fill(5)((1L, "s1", 0L)) ++
      Seq.fill(2)((2L, "s1", 0L)) ++ Seq.fill(3)((2L, "s1", 1L)) ++
      Seq((3L, "s2", 7L))
    val df = rows.toDF("nationkey", "mktsegment", "bal_kilo")
    val got = Quality.kAnonymityCensus(df,
        Seq("nationkey", "mktsegment", "bal_kilo"),
        Seq("nationkey", "mktsegment"), k = 5)
      .select(col("nationkey"), col("bal_kilo"), col("group_size"),
        col("level"), col("eff_size"), col("ok"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 5L, 0L, 5L, 1L),   // fine group already k-anonymous
      (2L, 0L, 2L, 1L, 5L, 1L),   // violator, saved by pooling
      (2L, 1L, 3L, 1L, 5L, 1L),   // violator, saved by pooling
      (3L, 7L, 1L, 1L, 1L, 0L)))  // re-identifiable even pooled
  }
}
