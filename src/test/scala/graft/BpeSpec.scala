package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Reference implementation: the classic iterative greedy algorithm —
    * repeatedly find the LOWEST-RANK merge pair present anywhere in the
    * token list and merge all its occurrences leftmost-first — against
    * which the production replace-chain (one pass per merge in rank
    * order) is asserted equivalent. */
  private def greedyBpe(word: String): List[String] = {
    val rank = Bpe.merges.zipWithIndex.toMap
    var toks = word.map(_.toString).toList
    var done = false
    while (!done) {
      val present = toks.zip(toks.drop(1)).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val (a, b) = present.minBy(_._2)._1
        val out = List.newBuilder[String]
        var rest = toks
        while (rest.nonEmpty) rest match {
          case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
          case x :: tl => out += x; rest = tl
          case Nil => ()
        }
        toks = out.result()
      }
    }
    toks
  }

  private def greedyCount(text: String): Long =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
      .split(" ").filter(_.nonEmpty).map(w => greedyBpe(w).length.toLong).sum

  test("replace-chain tokenization equals iterative greedy BPE on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" >= 0).select($"doc_id", $"text")
    val got = docs.select($"doc_id", Bpe.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    val want = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> greedyCount(Option(t).getOrElse("")) }.toMap
    assert(got.keySet == want.keySet)
    val diff = got.collect { case (id, n) if want(id) != n => (id, n, want(id)) }
    assert(diff.isEmpty, s"diverged on ${diff.take(5)}")
    assert(got.nonEmpty && got.values.sum > 0)
  }

  test("merges actually fire: 'the' is one token, merged counts are smaller") {
    val df = Seq((1L, "the thing and the rest"), (2L, "xqzjv")).toDF("doc_id", "text")
    val got = df.select($"doc_id", Bpe.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    // "the"=1 (th+e→the), "thing"=2 (th+ing), "and"=1 (an+d→and),
    // "rest"=2 (re+st), total 1+2+1+1+2
    assert(got(1L) == 7L)
    assert(got(2L) == 5L) // no merge applies: one token per char
  }

  /** Pure-Scala reference BPE LEARNER: per round, count adjacent
    * non-space token pairs across the corpus (overlapping, in token
    * order), pick the most frequent with lexicographic tie-break, and
    * merge all occurrences leftmost-first. The production
    * `Bpe.learnMerges` must learn the identical table. */
  private def referenceLearn(texts: Seq[String], rounds: Int): Seq[(String, String)] = {
    def normToks(t: String): List[String] =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
        .map(_.toString).toList
    def mergeAll(toks: List[String], a: String, b: String): List[String] = {
      val out = List.newBuilder[String]
      var rest = toks
      while (rest.nonEmpty) rest match {
        case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
        case x :: tl => out += x; rest = tl
        case Nil => ()
      }
      out.result()
    }
    var state = texts.map(normToks)
    var learned = Vector.empty[(String, String)]
    var done = false
    (0 until rounds).foreach { _ =>
      if (!done) {
        val counts = state.flatMap(ts => ts.zip(ts.drop(1)))
          .filter { case (a, b) => a != " " && b != " " }
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
          .filter(_._2 >= 2)
        if (counts.isEmpty) done = true
        else {
          val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
          learned = learned :+ best
          state = state.map(mergeAll(_, best._1, best._2))
        }
      }
    }
    learned
  }

  test("learnMerges equals the pure-Scala reference learner and is reproducible") {
    val texts = Seq(
      "the cat sat on the mat", "the dog ate the bone and the cat",
      "a cataract in the eye", "dogs and cats and dogs",
      "state of the art, the state", "at the gate the cat sat")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, $"text", 8)
    val want = referenceLearn(texts, 8)
    assert(got == want, s"learned $got, reference $want")
    assert(got.size == 8, "fixture has at least 8 learnable merges")
    // reproducibility: the q132 oracle depends on two executions
    // learning the identical table
    assert(Bpe.learnMerges(docs, $"text", 8) == got)
    // applying the learned table through the replace chain equals the
    // reference merge sequence's final token counts
    val cnt = docs.select($"doc_id", Bpe.tokenCountWith($"text", got).as("n"))
      .as[(Long, Long)].collect().toMap
    val wantCnt = texts.zipWithIndex.map { case (t, i) =>
      val toks = want.foldLeft(
        t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
          .map(_.toString).toList) { case (ts, (a, b)) =>
        val out = List.newBuilder[String]
        var rest = ts
        while (rest.nonEmpty) rest match {
          case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
          case x :: tl => out += x; rest = tl
          case Nil => ()
        }
        out.result()
      }
      i.toLong -> toks.count(_ != " ").toLong
    }.toMap
    assert(cnt == wantCnt)
  }

  test("learnMerges equals the reference learner on random corpora " +
       "(histogram rewrite property)") {
    // the histogram restructure's claim — freq-weighted vocabulary
    // pair counts equal corpus pair counts — checked on seeded random
    // corpora with repeated words, punctuation, numerics, and empties
    val rnd = new scala.util.Random(29)
    val vocab = Seq("the", "cat", "sat", "mat", "dog", "state", "art",
      "gate", "at", "a", "42", "cat!", "The", "  ", "")
    (1 to 5).foreach { trial =>
      val texts = Seq.fill(8)(
        Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.learnMerges(docs, $"text", 6)
      val want = referenceLearn(texts, 6)
      assert(got == want, s"trial $trial: learned $got, reference $want")
    }
  }

  test("learnMerges stops early when no pair repeats") {
    val docs = Seq((1L, "ab"), (2L, "cd")).toDF("doc_id", "text")
    // every adjacent pair occurs once — nothing reaches the n >= 2 bar
    assert(Bpe.learnMerges(docs, $"text", 5).isEmpty)
  }

  test("the DuckDB replay chain is textually well-formed") {
    val sql = Bpe.tokenCountSql("text")
    assert(sql.contains("chr(31)") && sql.contains("chr(30)"))
    assert(!sql.exists(c => c == '\u001F' || c == '\u001E'),
      "raw control chars must not appear in generated SQL (json-escape hazard)")
    assert(Bpe.merges.forall { case (a, b) =>
      sql.contains(s"chr(31)||'$a'||chr(30)||chr(31)||'$b'||chr(30)")
    }, "every merge pair must appear as a chr-literal search pattern")
  }
}
