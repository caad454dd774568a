package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the q75 chunk plan that the oracle's
  * hash-match cannot express (both engines could agree on a wrong
  * plan): every token covered, no gaps, and no chunk fully contained
  * in its predecessor (the redundancy class fixed after review). */
class ChunkPlanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("chunks cover [0, n_words) with overlap and no subset chunks") {
    val plan = SparkEntry.queries("q75_chunk_plan")(
        spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_tok")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(plan.nonEmpty)
    plan.foreach { case (doc, chunks) =>
      // chunk indexes are dense from 0
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong), s"doc $doc")
      // first chunk starts at token 0
      assert(chunks.head._3 == 0L, s"doc $doc")
      chunks.toSeq.sliding(2).foreach {
        case Seq((_, _, s1, n1), (_, _, s2, n2)) =>
          assert(s2 == s1 + 40, s"doc $doc stride")      // fixed stride
          assert(s2 < s1 + n1, s"doc $doc gap")          // overlapping
          assert(s2 + n2 > s1 + n1, s"doc $doc subset chunk") // new tokens
        case _ => ()
      }
      assert(chunks.forall(_._4 > 0), s"doc $doc empty chunk")
    }
    // coverage checked against an INDEPENDENT token count (q20's
    // n_ws_tokens): the last chunk must reach exactly the doc end
    val nWords = SparkEntry.queries("q20_token_stats")(
        spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_ws_tokens").as[(Long, Long)].collect().toMap
    plan.foreach { case (doc, chunks) =>
      val end = chunks.map(c => c._3 + c._4).max
      assert(end == nWords(doc), s"doc $doc covers $end of ${nWords(doc)}")
    }
  }

  test("q138 token-unit chunks share geometry with q75 and cover " +
       "exactly the q126 budget denominator") {
    val sf = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q138_chunk_plan_tokens")(spark, sf)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_tok")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(plan.nonEmpty)
    plan.foreach { case (doc, chunks) =>
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong), s"doc $doc")
      assert(chunks.head._3 == 0L, s"doc $doc")
      chunks.toSeq.sliding(2).foreach {
        case Seq((_, _, s1, n1), (_, _, s2, n2)) =>
          assert(s2 == s1 + 40, s"doc $doc stride")
          assert(s2 < s1 + n1, s"doc $doc gap")
          assert(s2 + n2 > s1 + n1, s"doc $doc subset chunk")
        case _ => ()
      }
    }
    // the chunk denominator IS the budget denominator: per doc, the
    // covered token range ends at exactly Bpe.tokenCount — the same
    // expression q126 budgets with (its n_tokens column), so chunk
    // totals and mix budgets are in one unit system
    val budgetUnits = spark.read
      .parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        graft.functions.Bpe.tokenCount($"text").as("n_tokens"))
      .filter($"n_tokens" > 0)
      .as[(Long, Long)].collect().toMap
    assert(plan.keySet == budgetUnits.keySet)
    plan.foreach { case (doc, chunks) =>
      val end = chunks.map(c => c._3 + c._4).max
      assert(end == budgetUnits(doc),
        s"doc $doc chunk coverage $end != token budget ${budgetUnits(doc)}")
    }
  }

  test("q139 packed spans tile every sequence exactly and reassemble " +
       "every document") {
    val sf = "/root/testdata/sf0.001"
    val spans = SparkEntry.queries("q139_sequence_packing")(spark, sf)
      .select($"doc_id", $"seq_id", $"seq_off", $"span_len")
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.nonEmpty)
    assert(spans.forall(s => s._3 >= 0 && s._3 < 512 && s._4 > 0 &&
      s._3 + s._4 <= 512), "span inside its sequence")
    // sequences tile: within a seq_id, spans are disjoint, start at 0,
    // abut with no gaps, and fill to 512 (except the final sequence)
    val bySeq = spans.groupBy(_._2)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"seq $seq starts at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + a._4, s"seq $seq gap/overlap at ${b._3}")
        case _ => ()
      }
      val filled = sorted.last._3 + sorted.last._4
      if (seq != lastSeq) assert(filled == 512L, s"seq $seq fills $filled")
    }
    // documents reassemble: per doc, span lengths sum to its token
    // count (same Bpe denominator as q126/q138)
    val nTok = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= 0)
      .select($"doc_id", graft.functions.Bpe.tokenCount($"text").as("n"))
      .filter($"n" > 0).as[(Long, Long)].collect().toMap
    val perDoc = spans.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    assert(perDoc.keys.toSet == nTok.keySet)
    perDoc.foreach { case (doc, tot) =>
      assert(tot == nTok(doc), s"doc $doc packs $tot of ${nTok(doc)}")
    }
    // a doc crossing a cut must appear in >1 sequence (fixture has
    // docs longer than 512 tokens, so the split path is exercised)
    assert(spans.groupBy(_._1).exists(_._2.length > 1), "no split docs")
  }

  test("q146 per-language budgets respect the mixture weights and pack " +
       "into exactly ceil(total/512) sequences per language") {
    val sf = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("q146_language_mixture")(spark, sf)
      .select($"doc_id", $"lang_pred", $"n_tokens", $"cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    assert(kept.nonEmpty)
    val weights = Map("en" -> 4L, "de" -> 3L, "fr" -> 2L, "es" -> 1L)
    val totalTokens = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= 0)
      .select(graft.functions.Bpe.tokenCount($"text").as("n"))
      .agg(org.apache.spark.sql.functions.sum($"n")).as[Long].head()
    val langs = kept.map(_._2).distinct
    val wTotal = langs.map(weights).sum
    // per-language kept totals stay under the pro-rata budget share
    // (half the corpus total split by weight) and the NEXT doc in fill
    // order would overflow it — the budget is tight, not just bounded
    val byLang = kept.groupBy(_._2)
    byLang.foreach { case (l, ds) =>
      val maxCum = ds.map(_._4).max
      assert(maxCum * 2L * wTotal <= totalTokens * weights(l),
        s"$l over budget")
      assert(ds.map(_._3).sum == maxCum, s"$l cumsum consistency")
    }
    // the kept docs of each language pack into exactly
    // ceil(kept_total / 512) fixed-size sequences — the q139
    // concat-and-cut arithmetic applied per language
    byLang.foreach { case (l, ds) =>
      val tot = ds.map(_._3).sum
      val packed = graft.operators.Relational.globalCumsum(
          ds.toSeq.toDF("doc_id", "lang_pred", "n_tokens", "cum_tokens")
            .withColumn("h", graft.queries.lcgHash($"doc_id")),
          Seq($"h", $"doc_id"), $"n_tokens", "cum")
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.call_function("div",
              $"cum" - $"n_tokens", org.apache.spark.sql.functions.lit(512L)),
            org.apache.spark.sql.functions.call_function("div",
              $"cum" - 1, org.apache.spark.sql.functions.lit(512L))))
          .as("seq_id"))
        .select($"seq_id").distinct().count()
      assert(packed == (tot + 511L) / 512L,
        s"$l: $tot tokens -> $packed sequences")
    }
  }

  test("q154 deciles are equi-depth and partition the quality order") {
    val rows = SparkEntry.queries("q154_quality_curriculum")(
        spark, "/root/testdata/sf0.001")
      .orderBy($"decile")
      .select($"decile", $"n_docs", $"min_quality", $"max_quality")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == (0L to 9L), "missing deciles")
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1L,
      s"not equi-depth: ${sizes.mkString(",")}")
    // consecutive buckets do not invert the quality order (ties may
    // straddle a cut, hence >=, not >)
    rows.sliding(2).foreach {
      case Array((_, _, _, hiPrev), (_, _, loNext, _)) =>
        assert(loNext >= hiPrev, "decile quality ranges overlap")
      case _ => ()
    }
    rows.foreach { case (dec, _, lo, hi) =>
      assert(lo <= hi, s"decile $dec min > max") }
  }

  test("q155 temperature flattening keeps a LARGER fraction of the " +
       "small source and stays inside the half-corpus budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q155").toString
    val docs = (1 to 40).map(i =>
        (i.toLong, ("alpha beta gamma delta " * 50).trim, "en", "big", 0L)) ++
      (41 to 45).map(i =>
        (i.toLong, ("alpha beta gamma delta " * 5).trim, "en", "small", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source",
        graft.functions.Bpe.tokenCount($"text").as("n_tokens"))
      .groupBy($"source").agg(sum($"n_tokens").as("tot"))
      .as[(String, Long)].collect().toMap
    val kept = SparkEntry.queries("q155_temperature_mixture")(spark, dir)
      .groupBy($"source").agg(sum($"n_tokens").as("kept"))
      .as[(String, Long)].collect().toMap
    val fracSmall = kept.getOrElse("small", 0L).toDouble / all("small")
    val fracBig = kept.getOrElse("big", 0L).toDouble / all("big")
    assert(fracSmall > fracBig,
      s"flattening inverted: small $fracSmall <= big $fracBig")
    // the cross-multiplied cut bounds every source by its pro-rata
    // share of HALF the corpus, so the total kept is <= half
    assert(kept.values.sum <= all.values.sum / 2 + 1,
      s"budget blown: ${kept.values.sum} of ${all.values.sum}")
  }
}
