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

  /** The fully-merged delimited-token string for `text`. */
  def tokenized(text: Column): Column = {
    val wrapped = regexp_replace(norm(text), "(.)", T + "$1" + E)
    merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(T + a + E + T + b + E), lit(T + a + b + E))
    }
  }

  /** Subword token count of `text` (space tokens excluded). Marker
    * counting only — no division, so no float/trunc divergence. */
  def tokenCount(text: Column): Column = {
    val noSpace = replace(tokenized(text), lit(T + " " + E), lit(""))
    (length(noSpace) - length(replace(noSpace, lit(T), lit("")))).cast("long")
  }

  // ---- DuckDB replay (same table, same chain, chr() literals) ----

  private def tokSql(t: String) = s"chr(31)||'$t'||chr(30)"

  def normSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  def tokenizedSql(c: String): String = {
    val wrapped =
      s"regexp_replace(${normSql(c)}, '(.)', chr(31)||'\\1'||chr(30), 'g')"
    merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, ${tokSql(a)}||${tokSql(b)}, ${tokSql(a + b)})"
    }
  }

  def tokenCountSql(c: String): String = {
    val noSpace = s"replace(${tokenizedSql(c)}, ${tokSql(" ")}, '')"
    s"(length($noSpace) - length(replace($noSpace, chr(31), '')))"
  }
}
