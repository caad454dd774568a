package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document deduplication family (SURVEY.md §2.11; grounded in the
  * reference's author-disambiguation archive `archive/links.md:6-39`).
  *
  * Scale design: every variant is a pure dataflow — normalize/shingle
  * per-row, aggregate per-doc, then a key-equality shuffle (group or
  * join). Nothing collects to the driver; candidate generation is
  * always through a bucketing key (exact key, LSH band, simhash
  * prefix), never an all-pairs cross join.
  */
object Dedup {

  /** Exact duplicate groups over a normalized text key (optionally a
    * prefix, for near-exact head dedup). Returns one row per key group:
    * the survivor (min id) and the group size. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String,
                  prefixLen: Int = Int.MaxValue): DataFrame = {
    val key = if (prefixLen == Int.MaxValue) TextFns.norm(col(textCol))
              else substring(TextFns.norm(col(textCol)), 1, prefixLen)
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Distinct (id, shingle) pairs — the unit of Jaccard/minhash work. */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame =
    df.select(col(idCol),
        explode(TextFns.shingles(TextFns.words(TextFns.norm(col(textCol))), n))
          .as("sh"))
      .distinct()

  /** Exact pairwise n-gram Jaccard over candidate pairs that share at
    * least one shingle (inverted-index join — pairs sharing nothing are
    * never generated). Output: id_a, id_b, jaccard (rounded 4). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.4): DataFrame = {
    val sh = docShingles(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val co = sh.select(col(idCol).as("id_a"), col("sh"))
      .join(sh.select(col(idCol).as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("co"))
    co.join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("co").cast("double") / (col("sz_a") + col("sz_b") - col("co")), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures: sig[i] = min over shingles of xxhash64(i, sh).
    * One exploded pass, `numPerms` min-aggregates — map-side combine
    * keeps the shuffle at one row per doc. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerms: Int = 32, shingleN: Int = 3): DataFrame = {
    val sh = docShingles(df, idCol, textCol, shingleN)
    val aggs = (0 until numPerms)
      .map(i => min(xxhash64(lit(i), col("sh"))).as(s"m$i"))
    sh.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: hash each band of `rowsPerBand` signature slots,
    * self-join on (band, bandHash) → candidate pairs. Classic
    * probability: docs with Jaccard j collide in a band with j^r, in
    * any of b bands with 1-(1-j^r)^b. */
  def lshCandidates(sigs: DataFrame, idCol: String,
                    numPerms: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val bands = numPerms / rowsPerBand
    val banded = sigs.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")))))))
      .select(col(idCol), col("pos").as("band"), col("col").as("bkey"))
    banded.select(col(idCol).as("id_a"), col("band"), col("bkey"))
      .join(banded.select(col(idCol).as("id_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** 64-bit SimHash over (distinct-word, count) pairs: bit j is the
    * sign of the count-weighted sum of word-hash bit j. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wc = df.select(col(idCol),
        explode(TextFns.words(TextFns.norm(col(textCol)))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$j")
    }
    wc.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }
}
