package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic fixed-merge-table BPE (byte-pair-encoding) subword
  * tokenization — the token-counting denominator a training-mix
  * pipeline budgets in (whitespace words, q20/q76, under-count real
  * subword token usage). The reference's text surface stops at
  * inverted-index abstracts (`data/samples/PaperAbstractsInvertedIndex
  * .txt`); this is the engine-level extension the LLM-pipeline layer
  * needs.
  *
  * Design for oracle-checkability and scale, not vocabulary quality:
  *
  *  - The merge table is a FIXED literal (rank-ordered, well-formed:
  *    every operand is a single char or the product of an earlier
  *    merge). For a well-formed table, applying each merge once in
  *    rank order equals the iterative greedy lowest-rank algorithm: a
  *    later merge's product can never be an operand of an earlier
  *    merge, and merging only creates adjacencies that involve the new
  *    token — so no earlier merge ever becomes applicable again.
  *  - Tokenization state is a flat STRING, not an array-of-tokens:
  *    every char of the normalized text is wrapped as US·c·RS (unit/record
  *    separator, 0x1F/0x1E), and one merge (a,b)→ab is ONE `replace`
  *    of "US a RS US b RS" with "US ab RS". Left-to-right non-overlapping
  *    `replace` IS BPE's leftmost-first application, and because
  *    adjacent matches share no characters (each token carries its own
  *    delimiters) the scan can never half-consume a neighbor. The
  *    whole chain is codegen-resident built-ins (no UDF), and DuckDB
  *    replays the IDENTICAL chain via chr(31)/chr(30) literals —
  *    mechanical equality, not semantic reimplementation.
  *  - Word boundaries need no explode: spaces are tokens too, no merge
  *    contains a space, so merges can never cross words; space tokens
  *    are dropped before counting.
  *  - Normalization projects to lowercase [a-z0-9 ] (squeezed spaces):
  *    Java regex `.` counts UTF-16 units while RE2 counts codepoints,
  *    so the ASCII projection is what makes the per-char wrap
  *    bit-identical across engines. A production byte-level fallback
  *    vocabulary is out of scope — the operator shape (scan-stage
  *    expression chain, no shuffle, no UDF) is the deliverable.
  */
object Bpe {

  private val T = "\u001F" // token start marker (US)
  private val E = "\u001E" // token end marker (RS)

  /** Rank-ordered merge pairs; well-formed (operands are chars or
    * earlier products). A real vocabulary would be learned offline and
    * loaded as data; the fixed table keeps the operator deterministic
    * and oracle-replayable. */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "o" -> "n",
    "e" -> "r", "r" -> "e", "a" -> "t", "e" -> "n", "o" -> "r",
    "an" -> "d", "in" -> "g", "t" -> "o", "e" -> "s", "o" -> "f",
    "e" -> "d", "i" -> "s", "a" -> "l", "s" -> "t", "0" -> "0")

  /** Lowercased ASCII-projected single-spaced text. */
  def norm(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** The fully-merged delimited-token string for `text` under an
    * arbitrary rank-ordered merge table. */
  def tokenizedWith(text: Column, table: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(norm(text), "(.)", T + "$1" + E)
    table.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(T + a + E + T + b + E), lit(T + a + b + E))
    }
  }

  /** The fully-merged delimited-token string for `text`. */
  def tokenized(text: Column): Column = tokenizedWith(text, merges)

  /** Subword token count of `text` under an arbitrary merge table
    * (space tokens excluded). Marker counting only — no division, so
    * no float/trunc divergence. */
  def tokenCountWith(text: Column, table: Seq[(String, String)]): Column = {
    val noSpace = replace(tokenizedWith(text, table), lit(T + " " + E), lit(""))
    (length(noSpace) - length(replace(noSpace, lit(T), lit("")))).cast("long")
  }

  /** Subword token count of `text` (space tokens excluded). */
  def tokenCount(text: Column): Column = tokenCountWith(text, merges)

  /** LEARN a merge table from the corpus — the BPE training loop
    * (Sennrich, Haddow, Birch, "Neural Machine Translation of Rare
    * Words with Subword Units", ACL 2016 — public algorithm). Each
    * round counts adjacent token pairs, merges the most frequent pair
    * everywhere (leftmost-first, exactly what [[tokenizedWith]]'s
    * `replace` chain replays), and repeats on the merged state.
    *
    * The learning state is the DISTINCT-WORD HISTOGRAM, not the
    * corpus (Sennrich et al. learn on the word histogram for exactly
    * this reason): no merge ever crosses a word boundary — space
    * tokens participate in no merge — so every adjacent token pair in
    * the corpus lies inside a single word occurrence, and the corpus
    * pair count equals the vocabulary pair count weighted by word
    * frequency. The table learned here is therefore IDENTICAL to
    * corpus-state learning (exact long counts, lexicographic
    * tie-break), which is what lets the q132 oracle replay the
    * LEARNED table as literals (the q51 discipline) while BpeSpec
    * pins the learning itself against a pure-Scala reference.
    *
    * 100 TB shape: ONE corpus pass total (the `groupBy(word)`
    * histogram — map-side partial counts, the shuffle moves #distinct
    * words, not #tokens). Every round thereafter touches only the
    * vocabulary-sized relation: one pair explode + pair-keyed groupBy
    * weighted by `freq`, and one `replace` rewrite of the vocab
    * strings — O(|vocab|) per round instead of a full corpus
    * materialization per round. The only driver traffic is the argmax
    * pair — 1 row per round, the documented bounded-loop-parameter
    * convention. Rounds stop early if no pair repeats. */
  def learnMerges(docs: org.apache.spark.sql.DataFrame, text: Column,
                  rounds: Int): Seq[(String, String)] = {
    var learned = Vector.empty[(String, String)]
    var state = graft.Checkpoints.checkpoint(
      docs.select(explode(split(norm(text), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .select(regexp_replace(col("w"), "(.)", T + "$1" + E).as("tok"),
          col("freq")))
    var done = false
    (0 until rounds).foreach { _ =>
      if (!done) {
        // tokens in word order: strip the outer markers, split on the
        // RS·US seams between adjacent tokens
        val arr = split(regexp_replace(col("tok"), s"^$T|$E$$", ""), E + T)
        val best = state
          .select(col("freq"), explode(zip_with(arr,
            slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
          .filter(col("p.b").isNotNull)
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("n"))
          .filter(col("n") >= 2)
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val (a, b) = (best(0).getString(0), best(0).getString(1))
          learned = learned :+ ((a, b))
          val next = graft.Checkpoints.checkpoint(state.select(
            replace(col("tok"), lit(T + a + E + T + b + E),
              lit(T + a + b + E)).as("tok"), col("freq")))
          graft.Checkpoints.release(state)
          state = next
        }
      }
    }
    graft.Checkpoints.release(state)
    learned
  }

  // ---- DuckDB replay (same table, same chain, chr() literals) ----

  private def tokSql(t: String) = s"chr(31)||'$t'||chr(30)"

  def normSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  def tokenizedSqlWith(c: String, table: Seq[(String, String)]): String = {
    val wrapped =
      s"regexp_replace(${normSql(c)}, '(.)', chr(31)||'\\1'||chr(30), 'g')"
    table.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, ${tokSql(a)}||${tokSql(b)}, ${tokSql(a + b)})"
    }
  }

  def tokenizedSql(c: String): String = tokenizedSqlWith(c, merges)

  def tokenCountSqlWith(c: String, table: Seq[(String, String)]): String = {
    val noSpace = s"replace(${tokenizedSqlWith(c, table)}, ${tokSql(" ")}, '')"
    s"(length($noSpace) - length(replace($noSpace, chr(31), '')))"
  }

  def tokenCountSql(c: String): String = tokenCountSqlWith(c, merges)
}
