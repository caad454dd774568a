package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFns, VectorFns}

class TextVectorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

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
