package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFns, VectorFns}

class TextVectorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q167 rank fusion: RRF arithmetic is exactly derivable from " +
       "the emitted ranks and the top-10 is rrf-ordered") {
    val rows = SparkEntry.queries("q167_rank_fusion")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Option[Long], Option[Long], Long, Long)].collect()
      .sortBy(_._5)
    assert(rows.length == 10)
    assert(rows.map(_._5).toSeq == (1L to 10L))
    rows.foreach { case (_, ra, rb, rrf, _) =>
      ra.foreach(r => assert(r >= 1 && r <= 100))
      rb.foreach(r => assert(r >= 1 && r <= 100))
      val exp = ra.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rb.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == exp)
    }
    // fusion order: rrf non-increasing down the emitted ranks
    rows.map(_._4).sliding(2).foreach(p => assert(p(0) >= p(1)))
    // hybrid, not single-signal: the winners carry BOTH ranks on the
    // real corpus (every doc holds dictionary terms)
    assert(rows.count(r => r._2.isDefined && r._3.isDefined) >= 5)
    graft.Checkpoints.releaseAll(spark)
  }

  test("norm lowercases and collapses whitespace") {
    val got = Seq("  Hello   World  ").toDF("t")
      .select(TextFns.norm($"t")).as[String].head()
    assert(got == "hello world")
  }

  test("shingles produce word 3-grams; short docs give empty") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFns.shingles(TextFns.words($"t"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFns.shingles(TextFns.words($"t"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("rollingFingerprint matches hand-computed polynomial hash") {
    val got = Seq("abc").toDF("t")
      .select(TextFns.rollingFingerprint($"t")).as[Long].head()
    assert(got == ((97L * 31 + 98) * 31 + 99) % 1000000007) // 96354
  }

  test("native PolyHash kernel equals the HOF definition, incl. empty and non-ASCII") {
    val samples = Seq("", "a", "abc", "hello world", "käse crème 東京",
      "x" * 300, "", "mixed ascii ünd mörε")
    for ((mult, mod) <- Seq((31L, 1000000007L), (37L, 998244353L))) {
      val df = samples.toDF("t")
      val native = df.select(TextFns.polyHash($"t", mult, mod)).as[Long].collect()
      val hof = df.select(TextFns.polyHashHof($"t", mult, mod)).as[Long].collect()
      assert(native.toSeq == hof.toSeq, s"mult=$mult mod=$mod")
    }
    // and on the real corpus, per word (the q26/q27 hot-path shape)
    val words = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextFns.words(TextFns.norm(col("text")))).as("w")).limit(5000)
    val n = words.select(TextFns.polyHash($"w")).as[Long].collect()
    val h = words.select(TextFns.polyHashHof($"w")).as[Long].collect()
    assert(n.toSeq == h.toSeq)
  }

  test("langId picks the profile with most stopword hits") {
    val got = Seq("der hund und die katze ist da", "the cat and the dog",
        "le chat et la maison")
      .toDF("t").select(TextFns.langId(TextFns.words($"t"))).as[String].collect()
    assert(got.toSeq == Seq("de", "en", "fr"))
  }

  test("cosine on known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    val got = df.select(round(VectorFns.cosine($"a", $"b"), 6)).as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.0, 1.0))
  }
}
