package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline surface (SURVEY.md
  * §2.11): normalization, tokenization, shingling, stopword profiling,
  * rolling-hash fingerprinting. All are composed from codegen-friendly
  * built-ins / higher-order functions — no Scala UDFs in the hot path.
  *
  * Grounding: the reference's text columns (citation contexts,
  * inverted-index abstracts — `data/samples/PaperCitationContexts.txt`,
  * `PaperAbstractsInvertedIndex.txt`) and its author-dedup archive
  * (`archive/links.md:6-39`).
  */
object TextFns {

  /** Canonical text normalization: lowercase, trim, collapse runs of
    * whitespace. Deterministic and oracle-friendly. */
  def norm(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens. */
  def words(c: Column): Column = split(c, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, single other. */
  def regexTokens(c: Column): Column =
    regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Word n-gram shingles (distinct not applied here). Empty array when
    * the doc has fewer than n words. */
  def shingles(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) >= n,
      transform(sequence(lit(0), size(wordsCol) - n),
        i => concat_ws(" ", slice(wordsCol, i + 1, lit(n)))))
      .otherwise(array())

  /** Count of tokens that belong to a stopword set. */
  def stopCount(wordsCol: Column, stops: Seq[String]): Column =
    size(filter(wordsCol, w => w.isInCollection(stops)))

  /** Polynomial rolling-hash fingerprint of a string:
    * fold(acc*mult + ascii(char)) mod `mod`. A content hash that is
    * reproducible in any engine (no engine-specific hash) — the
    * cross-engine replacement for xxhash64 wherever a DuckDB oracle
    * must recompute the same value (q23 fingerprint, q26 minhash,
    * q27/q60 simhash word hashes). All-nonnegative exact int64
    * arithmetic: acc < mod < 2^30, mult ≤ 37 → acc·mult + 255 ≪ 2^63
    * on both engines. Runs as the native codegen [[PolyHash]] kernel;
    * [[polyHashHof]] is the built-ins-only definition it must equal
    * (TextVectorSpec asserts the equivalence). */
  def polyHash(c: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    PolyHash.hash(c, mult, mod)

  /** The higher-order-function form of [[polyHash]] — the semantic
    * definition (and the shape the DuckDB oracle SQL mirrors), kept as
    * the equivalence reference for the codegen kernel. Interpreted
    * per-character; not for hot paths. */
  private[graft] def polyHashHof(c: Column, mult: Long = 31L,
                                 mod: Long = 1000000007L): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => pmod(acc * lit(mult) + ascii(ch), lit(mod)))

  /** q23's document fingerprint — [[polyHash]] at its defaults. */
  def rollingFingerprint(c: Column): Column = polyHash(c)

  /** Parse the reference's tuple-strings `"('CAN', 'Grande Prairie')"`
    * (Affiliations_FC country column, parsed ad hoc in
    * `Geocoding.ipynb` cells 10-14) into a proper struct — the engine
    * stores structured data structurally (SURVEY.md §1.3 F10). */
  def parseCountryTuple(c: Column): Column = {
    val pat = "\\('([^']*)',\\s*'([^']*)'\\)"
    struct(
      regexp_extract(c, pat, 1).as("country_code"),
      regexp_extract(c, pat, 2).as("city"))
  }

  /** Stopword profiles used by the language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Heuristic language ID: argmax of stopword-profile hit counts with
    * a fixed priority order on ties (en > de > fr > es > unknown "zh").
    * Works on any engine; accuracy depends on the corpus actually
    * containing language-specific function words. */
  def langId(wordsCol: Column): Column = {
    val scores = langProfiles.map { case (l, stops) => l -> stopCount(wordsCol, stops) }
    val byLang = scores.toMap
    when(byLang("en") >= greatest(byLang("de"), byLang("fr"), byLang("es")), "en")
      .when(byLang("de") >= greatest(byLang("fr"), byLang("es")), "de")
      .when(byLang("fr") >= byLang("es"), "fr")
      .otherwise("es")
  }
}
