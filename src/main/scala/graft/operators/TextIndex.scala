package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Persisted INVERTED-INDEX serving for lexical retrieval — the
  * build/serve split (the q119 ANN / q141 dedup convention) applied to
  * the text layer: the index job tokenizes the corpus ONCE and writes
  * the four BM25 statistics tables; a query run then reads only the
  * probed terms' postings — the parquet scan carries a pushed
  * `term IN (...)` filter, so serving cost is proportional to the
  * query's posting lists, never to the corpus (TextIndexSpec asserts
  * the pushdown on the physical plan).
  *
  * Index layout (all parquet under `dir`):
  *   postings/  (term, doc_id, tf)   — the inverted index proper
  *   doclens/   (doc_id, dl)
  *   termdf/    (term, df_)
  *   stats/     (n_docs, totdl)      — one row
  *
  * Scoring is q88's exact integer BM25 fraction (k1=1.2, b=0.75 in
  * the log-free rational form), per-doc ratios summed in FIXED term
  * order (the q167 pivot discipline) — identical doubles on any
  * engine, so the oracle can recompute the ranking from the raw
  * documents table and hash-match the indexed serve.
  */
object TextIndex {

  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     dir: String): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.words(TextFns.norm(col(textCol)))).as("term"))
    val tf = graft.Checkpoints.checkpoint(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    tf.write.mode("overwrite").parquet(s"$dir/postings")
    val dl = graft.Checkpoints.checkpoint(
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
    dl.write.mode("overwrite").parquet(s"$dir/doclens")
    tf.groupBy(col("term")).agg(count(lit(1)).as("df_"))
      .write.mode("overwrite").parquet(s"$dir/termdf")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("totdl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** APPEND a disjoint batch to a persisted BM25 index — the q192
    * admission shape for the retrieval index: the BIG relations
    * (postings, doclens) grow by parquet append (cost ∝ batch; the
    * corpus is never re-tokenized), while the SMALL sidecars (termdf —
    * vocabulary-sized; stats — one row) are recomputed additively and
    * rewritten (df and length totals are sums, so merge = group-sum of
    * old + batch). Serving from the appended index is BIT-EQUAL to a
    * one-shot build over the union: identical posting/doclen rows,
    * identical sidecar values → identical IEEE score arithmetic
    * (TextIndexSpec pins it). Contract: batch doc ids must be disjoint
    * from the indexed corpus (re-ingesting an id would double-count —
    * deletions/updates are tombstones in a real deployment). */
  def appendToBm25Index(spark: SparkSession, dir: String, batch: DataFrame,
                        idCol: String, textCol: String): Unit = {
    val toks = batch.select(col(idCol).as("doc_id"),
      explode(TextFns.words(TextFns.norm(col(textCol)))).as("term"))
    val tf = graft.Checkpoints.checkpoint(
      toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    tf.write.mode("append").parquet(s"$dir/postings")
    val dl = graft.Checkpoints.checkpoint(
      tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
    dl.write.mode("append").parquet(s"$dir/doclens")
    // sidecar rewrite: materialize merged values BEFORE overwriting
    // the paths they were read from (Spark refuses a lazy
    // read-overwrite cycle on the same location)
    val mergedDf = graft.Checkpoints.checkpoint(
      spark.read.parquet(s"$dir/termdf")
        .unionByName(tf.groupBy(col("term")).agg(count(lit(1)).as("df_")))
        .groupBy(col("term")).agg(sum(col("df_")).as("df_")))
    mergedDf.write.mode("overwrite").parquet(s"$dir/termdf")
    val mergedStats = graft.Checkpoints.checkpoint(
      spark.read.parquet(s"$dir/stats")
        .unionByName(dl.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("totdl")))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("totdl")).as("totdl")))
    mergedStats.write.mode("overwrite").parquet(s"$dir/stats")
    graft.Checkpoints.release(mergedDf)
    graft.Checkpoints.release(mergedStats)
    graft.Checkpoints.release(dl)
    graft.Checkpoints.release(tf)
  }

  /** Top-`k` documents for a conjunctive-OR term query served from the
    * persisted index: per matched term the q88 integer (num, den) BM25
    * pieces, one IEEE division each, summed per doc in the caller's
    * term order; rank ties break by doc_id. Also returns the matched
    * term count. Only `terms`' postings are read. */
  def bm25TopKIndexed(spark: SparkSession, dir: String,
                      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be non-empty and distinct")
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(terms: _*))
    val dl = spark.read.parquet(s"$dir/doclens")
    val dfreq = spark.read.parquet(s"$dir/termdf")
      .filter(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$dir/stats")
    val ratio = postings.join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        ((lit(44L) * col("tf") * col("totdl") *
          (lit(2L) * col("n_docs") - lit(2L) * col("df_") + lit(1L)))
          .cast("double") /
          ((lit(2L) * col("df_") + lit(1L)) *
            (lit(20L) * col("totdl") * col("tf") +
              lit(6L) * col("totdl") +
              lit(18L) * col("dl") * col("n_docs"))).cast("double"))
          .as("r"))
    val pivCols = terms.map(t =>
      coalesce(max(when(col("term") === t, col("r"))), lit(0.0))
        .as(s"r_$t"))
    val scored = ratio.groupBy(col("doc_id"))
      .agg(pivCols.head, pivCols.tail: _*)
      .select(col("doc_id"),
        terms.map(t => col(s"r_$t")).reduceLeft(_ + _).as("score"),
        terms.map(t => when(col(s"r_$t") > 0, 1L).otherwise(0L))
          .reduceLeft(_ + _).as("n_terms_matched"))
    Relational.topKPerGroup(scored.filter(col("score") > 0), Seq(),
        Seq(col("score").desc, col("doc_id")), k, "rank")
      .select(col("doc_id"), col("n_terms_matched"), col("rank"))
  }
}
