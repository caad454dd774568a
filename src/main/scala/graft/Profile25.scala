package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Scratch perf probe for the dedup hot path (q25/q26). Not part of the
  * declared surface; safe to delete.
  *
  * Measured trade-off (sf0.1, local[32]): replacing the global-rarity
  * prefix order with plain hash order saves the rarity agg+join+window
  * (~0.4s steady, more warm) but grows candidates 206k -> 318k on this
  * flat-frequency corpus; on a skewed organic corpus hash order lets
  * ubiquitous shingles into prefixes and the candidate join degrades
  * toward Σf². Rarity order kept — it is the scale-correct choice. */
object Profile25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r"); r
    }
    time("q25-warm")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.4).count())
    time("q25-steady")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.4).count())
    def q26() = Dedup.lshCandidates(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id").count()
    time("q26-warm")(q26())
    time("q26-steady")(q26())
    spark.stop()
  }
}
