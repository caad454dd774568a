package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation pass a
  * 100 TB ingest runs before publishing a snapshot (the
  * Deequ/Great-Expectations capability in plain declarative Spark; the
  * reference's pipelines validate by ad-hoc inspection, e.g. the
  * profile row counts `ProfileConversion.scala:139-151` — this is that
  * check as a first-class operator).
  *
  * Three rule families with three distinct scale shapes, kept separate
  * so adding cheap rules never adds passes over the data:
  *
  *  - ROW rules — arbitrary per-row violation predicates (not-null,
  *    range, regex, cross-column invariants). ALL of them evaluate in
  *    ONE scan via conditional aggregation: a new rule is a new
  *    counter in the same partial agg, not a new job. A predicate that
  *    evaluates null (SQL three-valued logic) does not count as a
  *    violation — same semantics both engines.
  *  - UNIQUENESS rules — one map-side-combinable groupBy per key set
  *    (the only shuffles here); violations = rows beyond the first in
  *    each duplicated key group, so a clean key reports 0.
  *  - REFERENTIAL rules — a left-anti probe per foreign key (broadcast
  *    when the dimension is small — Catalyst's call); null FKs are
  *    exempt (SQL FK convention).
  *
  * Output: one row per rule — (rule, violations, pass) — small enough
  * to sit in a publish gate whatever the input size. Everything is
  * count arithmetic: the q136 oracle replays every rule in DuckDB.
  */
object Quality {

  /** Evaluate expectation rules against `df`.
    *
    * @param rowRules    (name, violatedWhen) — counted in one scan
    * @param uniqueRules (name, key columns) — duplicates beyond first
    * @param fkRules     (name, fk column, dimension, dim key column)
    */
  def expect(df: DataFrame,
             rowRules: Seq[(String, Column)],
             uniqueRules: Seq[(String, Seq[String])] = Nil,
             fkRules: Seq[(String, String, DataFrame, String)] = Nil)
      : DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty || fkRules.nonEmpty,
      "no rules")
    val row: Seq[DataFrame] = if (rowRules.isEmpty) Nil else {
      val aggs = rowRules.map { case (n, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(n)
      }
      // melt the single counter row back to (rule, violations) rows;
      // coalesce covers the empty-input sum-of-nothing null
      Seq(df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rowRules.map { case (n, _) =>
          struct(lit(n).as("rule"),
            coalesce(col(n), lit(0L)).as("violations"))
        }: _*)).as("s"))
        .select(col("s.rule").as("rule"), col("s.violations").as("violations")))
    }
    val uniq = uniqueRules.map { case (n, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("violations"))
        .select(lit(n).as("rule"), col("violations"))
    }
    val fks = fkRules.map { case (n, fk, dim, dimKey) =>
      df.select(col(fk)).filter(col(fk).isNotNull)
        .join(dim.select(col(dimKey).as(fk)).distinct(), Seq(fk), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(n).as("rule"), col("violations"))
    }
    (row ++ uniq ++ fks).reduce(_ union _)
      .withColumn("pass", col("violations") === 0L)
  }

  /** Scale of [[bigramLmScore]]'s integer conditional probabilities:
    * score units are millionths. */
  val LmScale = 1000000L

  /** LM-based quality scoring — the CCNet/Gopher-family "perplexity
    * filter" modality (Wenzek et al. 2020 train a KenLM and keep
    * low-perplexity text; public method), self-trained and in exact
    * integer arithmetic so the whole model replays cross-engine:
    *
    *  - TRAIN: corpus unigram counts c(w) and bigram counts c(w1,w2)
    *    — two map-side-combinable groupBys. The model is a keyed
    *    RELATION, never a driver/broadcast structure: at 100 TB the
    *    bigram table shuffles like any fact table (a real KenLM
    *    truncates the vocabulary; the relation form doesn't need to).
    *  - SCORE: each document bigram occurrence contributes the
    *    scaled DISCOUNTED conditional probability
    *    (c(w1,w2)·LmScale) div (c(w1) + 1) — how predictable this
    *    word is given the previous one, under the corpus' own
    *    statistics. The +1 prefix discount is essential for a
    *    SELF-trained model: raw MLE assigns probability 1 to any
    *    bigram whose prefix occurs once, scoring word salad over
    *    unique tokens as perfectly as boilerplate; the discount is a
    *    confidence lower bound (a singleton estimates ½, a
    *    20-observation agreement 20/21), so templated in-distribution
    *    text outscores out-of-distribution text (the spec pins this
    *    ranking). A document's lm_score is the MEAN contribution
    *    (sum div n_bigrams). No logs, no doubles — the integer-ratio
    *    discipline (q66/q88) applied to the LM filter, which is what
    *    lets the oracle hash-match the score rather than bound it.
    *
    * Output: (id, n_bigrams, lm_score) for every doc with ≥ 1 bigram.
    * Thresholding is the caller's policy (compose with [[expect]] or
    * a curation funnel stage). */
  /** PII CENSUS — the scrub pass an LLM training pipeline runs before
    * publishing a corpus (C4's and Dolma's PII handling — public
    * methodology): per document, occurrence counts of the three
    * classic machine-detectable identifier shapes (emails, NANP-style
    * phone fragments, dotted-quad IPs) on the raw text, plus the
    * REDACTED length — what the text becomes once every match is
    * replaced by a fixed tag (emails first, then IPs, then phones —
    * the order is part of the contract). Counts are independent
    * per-pattern on the ORIGINAL text (a phone-shaped fragment inside
    * an email counts for both; the redaction chain removes it once).
    * Entirely row-local — no shuffle at all: censusing is
    * embarrassingly parallel at any corpus size, and the patterns are
    * ASCII character classes that parse identically under Java regex
    * and RE2, so a DuckDB oracle replays every count and length. */
  def piiCensus(df: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    def n(pat: String) =
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("long")
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, PiiEmail, "<pii>"),
        PiiIp, "<pii>"),
      PiiPhone, "<pii>")
    df.select(col(id),
      n(PiiEmail).as("n_emails"),
      n(PiiPhone).as("n_phones"),
      n(PiiIp).as("n_ips"),
      length(redacted).cast("long").as("redacted_len"))
  }

  /** The three census patterns — shared verbatim with the oracle SQL
    * (ASCII classes only; `\b` is the same word boundary in Java
    * regex and RE2). */
  val PiiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PiiPhone = "\\b[0-9]{3}-[0-9]{4}\\b"
  val PiiIp = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** URL census — the link-hygiene pass a crawl pipeline runs before
    * host-level aggregation (C4/CCNet methodology): per doc, the first
    * URL's host, registrable domain (last two labels), path, and the
    * query string with TRACKING parameters (utm_*) stripped in
    * original order — the canonical form host dedup and per-domain
    * quotas key on. Entirely row-local (one projection, no shuffle);
    * ASCII regexes identical under Java regex and RE2, list order
    * preserved by both engines' split/filter/join, so an oracle
    * replays every field. Docs without a URL surface with empty
    * fields and zero counts — provably link-free. */
  def urlCensus(df: DataFrame, id: String, text: String): DataFrame = {
    val url = regexp_extract(col(text), UrlPattern, 0)
    val host = regexp_extract(url, "https?://([a-z0-9.-]+)", 1)
    val qs = regexp_extract(url, "\\?([a-z0-9=&_.-]*)", 1)
    val parts = split(qs, "&")
    val kept = filter(parts, p => not(p.startsWith("utm_")))
    val nParams = when(qs === "", 0L).otherwise(size(parts).cast("long"))
    val nKept = when(qs === "", 0L).otherwise(size(kept).cast("long"))
    df.select(col(id),
      host.as("host"),
      regexp_extract(host, "([a-z0-9-]+\\.[a-z]+)$", 1).as("domain"),
      regexp_extract(url, "https?://[a-z0-9.-]+(/[a-z0-9/._-]*)", 1)
        .as("path"),
      array_join(kept, "&").as("clean_params"),
      nParams.as("n_params"),
      (nParams - nKept).as("n_tracking"))
  }

  /** The census URL shape — shared verbatim with the oracle SQL (ASCII
    * classes only; no backtracking constructs, so Java regex and RE2
    * agree). Space-free by construction: a URL in word-soup text ends
    * at the first space. */
  val UrlPattern = "https?://[a-z0-9.-]+[a-z0-9/?=&_.-]*"

  /** K-ANONYMITY census with one LOCAL-RECODING generalization step —
    * the other pre-publish governance gate next to [[piiCensus]]
    * (Sweeney, "k-Anonymity: a model for protecting privacy", 2002):
    * rows whose FINE quasi-identifier tuple groups fewer than k
    * records are re-identifiable by join; the standard remedy pools
    * exactly those rows at a COARSER tuple (drop the finest column)
    * and re-checks. Emits one row per fine QI group: size, the
    * generalization level used (0 = fine ok, 1 = pooled), the
    * effective group size after pooling, and the residual `ok`
    * verdict — the table a release review reads. Two groupBys and a
    * key-equality join: census cost is O(groups), never O(rows²). */
  def kAnonymityCensus(df: DataFrame, fine: Seq[String],
                       coarse: Seq[String], k: Int): DataFrame = {
    require(coarse.forall(fine.contains),
      "coarse QI must be a subset of the fine QI (a generalization)")
    val g0 = df.groupBy(fine.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
    val pooled = g0.filter(col("group_size") < k)
      .groupBy(coarse.map(col): _*)
      .agg(sum(col("group_size")).as("pooled_size"))
    val eff = when(col("group_size") >= k, col("group_size"))
      .otherwise(col("pooled_size"))
    g0.join(pooled, coarse, "left")
      .select(fine.map(col) ++ Seq(
        col("group_size"),
        when(col("group_size") >= k, 0L).otherwise(1L).as("level"),
        eff.as("eff_size"),
        when(eff >= k, 1L).otherwise(0L).as("ok")): _*)
  }

  /** L-DIVERSITY census — the homogeneity-attack gate k-anonymity
    * misses (Machanavajjhala et al., "l-Diversity: privacy beyond
    * k-anonymity", 2007): a QI group can be large (k-anonymous) yet
    * reveal everyone's sensitive value if that value is CONSTANT in
    * the group. Emits one row per QI group: size, the number of
    * DISTINCT sensitive values, the share of the most frequent
    * sensitive value in exact ×10⁴ basis points (the direct
    * homogeneity readout — distinct-count alone flatters a group
    * that is 99% one value), and the `ok` verdict at the given l.
    * Two keyed aggregates + one ≤32-value-per-group max: census cost
    * is O(groups·values), never O(rows²). */
  def lDiversityCensus(df: DataFrame, qi: Seq[String],
                       sensitive: String, l: Int): DataFrame = {
    val bySens = df.groupBy((qi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    bySens.groupBy(qi.map(col): _*)
      .agg(sum(col("n_rows")).as("group_size"),
        count(lit(1)).as("n_sensitive"),
        max(col("n_rows")).as("top_count"))
      .select(qi.map(col) ++ Seq(
        col("group_size"), col("n_sensitive"),
        expr("top_count * 10000 div group_size").as("top_share_x10k"),
        when(col("n_sensitive") >= l, 1L).otherwise(0L).as("ok")): _*)
  }

  def bigramLmScore(df: DataFrame, id: String, text: String): DataFrame = {
    import graft.functions.TextFns
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("pos"))
    // one tokenize pass feeds both training counts and scoring —
    // checkpoint: three consumers (unigrams, bigrams, the score join)
    val bg = graft.Checkpoints.checkpoint(
      df.select(col(id),
          posexplode(TextFns.words(TextFns.norm(col(text))))
            .as(Seq("pos", "w1")))
        .withColumn("w2", lead(col("w1"), 1).over(w))
        .filter(col("w2").isNotNull)
        .select(col(id), col("w1"), col("w2")))
    val uni = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val bi = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    bg.join(bi, Seq("w1", "w2")).join(uni, Seq("w1"))
      .select(col(id),
        call_function("div", col("cb") * LmScale, col("cu") + 1L).as("p"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("ps"))
      .select(col(id), col("n_bigrams"),
        call_function("div", col("ps"), col("n_bigrams")).as("lm_score"))
  }

  /** Trigram contexts seen fewer than this many times back off to the
    * bigram estimate — the reliability threshold that makes backoff
    * REACHABLE in a self-trained model (every scored trigram's own
    * context occurs at least once in the same document, so a
    * plain "count = 0" backoff would never fire). */
  val Lm3ContextMin = 2L

  /** Stupid-backoff penalty α = 2/5 (Brants et al. 2007 use 0.4) as an
    * exact integer ratio: backed-off scores are (2·p₂) div 5. */
  val Lm3BackoffNum = 2L
  val Lm3BackoffDen = 5L

  /** Order-3 LM quality scoring with STUPID BACKOFF — the trigram
    * extension of [[bigramLmScore]] (Brants et al. 2007's backoff
    * scheme, public; the CCNet perplexity-filter modality at the
    * n-gram order real filters use), in the same exact-integer
    * discount discipline so the oracle retrains and hash-matches:
    *
    *  - TRAIN: corpus trigram counts c(w1,w2,w3), bigram counts
    *    c(·,·), unigram counts c(·) — three map-side-combinable
    *    groupBys over one tokenize pass. The model stays a keyed
    *    RELATION (shuffles like a fact table; no driver structure).
    *  - SCORE: each trigram occurrence contributes
    *      c(w1,w2) ≥ [[Lm3ContextMin]] :
    *        p₃ = (c(w1,w2,w3)·LmScale) div (c(w1,w2) + 1)
    *      else (unreliable context — back off) :
    *        p  = (2 · p₂) div 5,  p₂ = (c(w2,w3)·LmScale) div (c(w2) + 1)
    *    — the +1 prefix discount exactly as in the bigram model, the
    *    α = 0.4 stupid-backoff penalty as the integer ratio 2/5. A
    *    document's lm3_score is the MEAN contribution (sum div n).
    *
    * Why order 3 matters for curation: a bigram-preserving reshuffle
    * of templated text keeps every bigram statistic — q148 scores it
    * identically — but breaks the trigram contexts, so this score
    * drops (QualitySpec pins the separation). No logs, no doubles.
    *
    * Output: (id, n_trigrams, lm3_score) for docs with ≥ 1 trigram. */
  def trigramLmScore(df: DataFrame, id: String, text: String): DataFrame = {
    import graft.functions.TextFns
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("pos"))
    // one tokenize pass feeds all three count tables and scoring
    val toks = graft.Checkpoints.checkpoint(
      df.select(col(id),
          posexplode(TextFns.words(TextFns.norm(col(text))))
            .as(Seq("pos", "w1")))
        .withColumn("w2", lead(col("w1"), 1).over(w))
        .withColumn("w3", lead(col("w1"), 2).over(w)))
    val tg = toks.filter(col("w3").isNotNull)
      .select(col(id), col("w1"), col("w2"), col("w3"))
    val bgAll = toks.filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"))
    val uni = toks.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val bi = bgAll.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val tri = tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("ct"))
    val p3 = call_function("div", col("ct") * LmScale, col("c12") + 1L)
    val p2 = call_function("div", col("c23") * LmScale, col("cu2") + 1L)
    tg.join(tri, Seq("w1", "w2", "w3"))
      .join(bi.select(col("w1"), col("w2"), col("cb").as("c12")),
        Seq("w1", "w2"))
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cb").as("c23")), Seq("w2", "w3"))
      .join(uni.select(col("w1").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .select(col(id),
        when(col("c12") >= Lm3ContextMin, p3)
          .otherwise(call_function("div",
            lit(Lm3BackoffNum) * p2, lit(Lm3BackoffDen))).as("p"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("p")).as("ps"))
      .select(col(id), col("n_trigrams"),
        call_function("div", col("ps"), col("n_trigrams")).as("lm3_score"))
  }
}
