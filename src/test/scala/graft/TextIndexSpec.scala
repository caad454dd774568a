package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextIndex
import graft.sources.Tables

/** Build/serve split for the text layer: the persisted BM25 inverted
  * index must serve the IDENTICAL ranking a from-scratch computation
  * produces, and serving must read only the probed terms' postings
  * (pushed filter on the scan — the property that makes serving cost
  * per-query, not per-corpus). */
class TextIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bm25TopKIndexed equals a local BM25 recomputation and pushes " +
       "the term filter into the postings scan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft_bm25_spec").toString
    TextIndex.buildBm25Index(docs, "doc_id", "text", dir)
    graft.Checkpoints.releaseAll(spark)
    val terms = Seq("query", "merge", "spark")
    val served = TextIndex.bm25TopKIndexed(spark, dir, terms, 20)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"), plan)
    val got = served.as[(Long, Long, Long)].collect()
      .map(r => (r._3, r._1, r._2)).sortBy(_._1)

    // local twin: same tokenization, same integer BM25 pieces, same
    // one-division ratios summed in the same term order
    val corpus = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect()
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
    }
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, xs) => (id, w, xs.size.toLong) }
    }
    val dl = toks.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val dfx = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nDocs = dl.size.toLong
    val totdl = dl.values.sum
    def ratio(id: Long, w: String, tfv: Long): Double = {
      val num = 44L * tfv * totdl * (2 * nDocs - 2 * dfx(w) + 1)
      val den = (2 * dfx(w) + 1) *
        (20L * totdl * tfv + 6L * totdl + 18L * dl(id) * nDocs)
      num.toDouble / den.toDouble
    }
    val perDoc = tf.filter(t => terms.contains(t._2))
      .groupBy(_._1).view.mapValues { ts =>
        val byTerm = ts.map(t => t._2 -> ratio(t._1, t._2, t._3)).toMap
        val rs = terms.map(t => byTerm.getOrElse(t, 0.0))
        (rs.reduceLeft(_ + _), rs.count(_ > 0).toLong)
      }.toMap
    val exp = perDoc.toSeq.filter(_._2._1 > 0)
      .sortBy { case (id, (s, _)) => (-s, id) }.take(20)
      .zipWithIndex
      .map { case ((id, (_, m)), i) => (i + 1L, id, m) }
    assert(got.toSeq == exp)
    assert(got.nonEmpty)
  }

  test("appendToBm25Index: build(80%) + append(20%) serves BIT-EQUAL " +
       "to the one-shot build, and the sidecars merge additively") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Files.createTempDirectory("graft_bm25_full").toString
    val inc = Files.createTempDirectory("graft_bm25_inc").toString
    TextIndex.buildBm25Index(docs, "doc_id", "text", full)
    TextIndex.buildBm25Index(
      docs.filter(col("doc_id") % 5 =!= 4), "doc_id", "text", inc)
    TextIndex.appendToBm25Index(
      spark, inc, docs.filter(col("doc_id") % 5 === 4), "doc_id", "text")
    graft.Checkpoints.releaseAll(spark)
    // sidecars: identical values after the additive merge
    def rows(path: String) = spark.read.parquet(path)
      .collect().map(_.toSeq).toSet
    assert(rows(s"$inc/termdf") == rows(s"$full/termdf"))
    assert(rows(s"$inc/stats") == rows(s"$full/stats"))
    assert(rows(s"$inc/doclens") == rows(s"$full/doclens"))
    // serve: identical ranking, scores included (exact IEEE equality —
    // same posting rows, same sidecar values, same expression tree)
    val terms = Seq("query", "merge", "spark")
    def serve(dir: String) =
      TextIndex.bm25TopKIndexed(spark, dir, terms, 20)
        .collect().map(_.toSeq).toSeq
    assert(serve(inc) == serve(full))
  }
}
