package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Structured Streaming surface (SURVEY.md §2.10).
  *
  * The reference is batch-only; its closest need is incremental
  * coauthor-edge maintenance as new PaperAuthorAffiliations rows arrive.
  * Here the `events` table plays the stream role. Every transform below
  * is written against a plain DataFrame so the SAME code runs in batch
  * (oracle-checkable, see EventQueries) and under `readStream` — the
  * Spark-idiomatic unified-batch-stream design.
  *
  * Scale notes: all stateful ops are keyed (shuffle by key, state in the
  * state store, watermark bounds state size); none hold unbounded state.
  */
object EventStreams {

  /** Event schema as read from the fixture (after ns→us truncation). */
  val eventSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** File-based stream source over a directory of parquet drops. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts with a watermark bounding late data. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Per-window quantile summaries via the mergeable q-digest
    * (functions/QDigest.scala) — the streaming use the sketch exists
    * for: each open window keeps O(k) digest state however many events
    * land in it, partials merge with the deterministically-bounded
    * rank error, and nearest-rank answers emit when the watermark
    * closes the window. Batch twin: q123 (same agg, same windows,
    * DuckDB-checked ε-bound); StreamingSpec asserts the streamed
    * answers satisfy the same bound against exact per-window ranks. */
  def windowQuantiles(events: DataFrame, windowLen: String = "1 day",
                      watermark: String = "1 hour",
                      probs: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val agg = graft.functions.QDigestAgg(16, 4096, probs)
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(agg(floor(col("value") * 100).cast("long")).as("qs"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("qs"), col("n"))
  }

  /** Sliding-window counts (overlapping windows). */
  def slidingCounts(events: DataFrame, windowLen: String = "10 minutes",
                    slide: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Session windows: 30-minute inactivity gap per user — the streaming
    * twin of EventQueries.q32_sessionize. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
        col("n_events"))

  /** Streaming deduplication by event_id within the watermark. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental co-membership edge maintenance — the MAG-shaped
    * streaming use case (SURVEY.md §2.10): as new (group, member, ts)
    * authorship rows arrive, emit the NEW co-author pairs they create
    * with already-seen members of the same group. A watermarked
    * stream-stream self-join: both sides buffer per-group state, the
    * watermark bounds it; `a < b` keeps pairs unordered-unique and
    * drops self-pairs. Downstream, a grouped count maintains edge
    * weights incrementally (the batch twin is `CoOccur.weightedEdges`).
    *
    * The pair-uniqueness predicate is written `least(a,b) = a AND
    * a != b` rather than the equivalent `a < b`: StreamingJoinHelper
    * probes every inequality conjunct of a stream-stream join condition
    * as a potential time constraint and logs an "Error trying to
    * extract state constraint" WARN on `a < b` (two non-time
    * attributes); the equality form is skipped by the probe, so the two
    * canonical time-range conjuncts are analyzed cleanly and state
    * eviction bounds derive without noise. StreamingSpec asserts the
    * state PLATEAUS (rows evicted, no growth) under an advancing
    * watermark. */
  def incrementalCoEdges(authorship: DataFrame,
                         watermark: String = "1 hour"): DataFrame = {
    val l = authorship.select(col("group").as("g"), col("member").as("a"),
      col("ts").as("ts_a")).withWatermark("ts_a", watermark)
    val r = authorship.select(col("group").as("g2"), col("member").as("b"),
      col("ts").as("ts_b")).withWatermark("ts_b", watermark)
    l.join(r, col("g") === col("g2") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $watermark") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $watermark"))
      .filter(least(col("a"), col("b")) === col("a") && col("a") =!= col("b"))
      .select(col("g").as("group"), col("a"), col("b"),
        greatest(col("ts_a"), col("ts_b")).as("pair_ts"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  case class FunnelState(user_id: Long, view_us: Option[Long],
                         click_us: Option[Long], purchase_us: Option[Long])

  /** Epoch micros of an event's timestamp, matching `unix_micros`. */
  private def eventMicros(e: Event): Long =
    e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L

  case class LastType(user_id: Long, last_type: String)
  case class Transition(user_id: Long, prev: String, next: String)

  /** Per-key state for the watermark-ordered stateful twins: the folded
    * summary so far plus the events the watermark has not yet passed. */
  case class Pending[S](folded: Option[S], buf: List[Event])

  /** Shared buffer-until-watermark machinery for the order-dependent
    * stateful twins ([[ewmaStream]]/[[funnelStages]]/[[transitionStream]]).
    *
    * An order-dependent fold applied at ARRIVAL order silently diverges
    * from its batch twin when a late event lands in a later micro-batch.
    * Instead, each key buffers incoming events in state and folds ONLY
    * the events whose event time the watermark has passed, in
    * (event-time, event_id) order — at that point no yet-to-arrive row
    * may precede them (rows older than the watermark are dropped by
    * Spark before reaching the function, the standard watermark
    * contract), so the fold order equals the batch twin's event-time
    * order under ANY arrival order within the watermark delay. Buffered
    * events carry an event-time timeout at the earliest pending row, so
    * they fold (and emit) when the watermark passes even if the key
    * never sees another row. State is bounded by the watermark delay
    * per key — the same bound every watermarked stateful op here has. */
  private def foldRipe[S, O](rows: Iterator[Event],
                             state: GroupState[Pending[S]])(
      fold: (Option[S], Seq[Event]) => (S, List[O])): Iterator[O] = {
    val prev = state.getOption.getOrElse(Pending[S](None, Nil))
    val buf = prev.buf ::: rows.toList
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ripe, wait) = buf.partition(e => eventMicros(e) < wmUs)
    val out =
      if (ripe.isEmpty) { state.update(prev.copy(buf = wait)); Nil }
      else {
        val (s2, os) = fold(prev.folded,
          ripe.sortBy(e => (eventMicros(e), e.event_id)))
        state.update(Pending(Some(s2), wait))
        os
      }
    if (wait.nonEmpty)
      state.setTimeoutTimestamp(wait.iterator.map(eventMicros).min / 1000L + 1L)
    out.iterator
  }

  /** Streaming twin of the q90 journey model: per-user keyed state
    * holds the LAST folded event type; each event past the watermark
    * emits one (prev, next) transition ('_start' before the first).
    * Transitions are append-only facts — a downstream stateless groupBy
    * count (or foreachBatch upsert) maintains the live matrix. Late /
    * out-of-order arrival within the watermark delay is handled by the
    * [[foldRipe]] buffer: emission waits for the watermark, then folds
    * in event-time order, matching the batch twin exactly. */
  def transitionStream(events: Dataset[Event],
                       watermark: String = "10 minutes"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Pending[LastType], Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Pending[LastType]]) =>
          foldRipe(rows, state) { (st0: Option[LastType], ordered) =>
            var last = st0.map(_.last_type).getOrElse("_start")
            val out = ordered.map { e =>
              val t = Transition(uid, last, e.event_type)
              last = e.event_type
              t
            }
            (LastType(uid, last), out.toList)
          }
      }
  }

  /** Streaming twin of the q85 staged funnel: per-user keyed state
    * tracks the first view, the first click AT OR AFTER that view, and
    * the first purchase at or after that click. Events fold through the
    * [[foldRipe]] watermark buffer, so the stage machine always advances
    * in event-time order regardless of arrival order — a click arriving
    * a batch BEFORE its qualifying view still opens the funnel, exactly
    * like the batch twin. Emits the updated per-user funnel row on each
    * eviction (Update mode). */
  def funnelStages(events: Dataset[Event],
                   watermark: String = "10 minutes"): Dataset[FunnelState] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Pending[FunnelState], FunnelState](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Pending[FunnelState]]) =>
          foldRipe(rows, state) { (st0: Option[FunnelState], ordered) =>
            var st = st0.getOrElse(FunnelState(uid, None, None, None))
            ordered.foreach { e =>
              val us = eventMicros(e)
              e.event_type match {
                case "view" if st.view_us.forall(us < _) =>
                  st = st.copy(view_us = Some(us))
                case "click" if st.view_us.exists(_ <= us) &&
                    st.click_us.forall(us < _) =>
                  st = st.copy(click_us = Some(us))
                case "purchase" if st.click_us.exists(_ <= us) &&
                    st.purchase_us.forall(us < _) =>
                  st = st.copy(purchase_us = Some(us))
                case _ => ()
              }
            }
            (st, List(st))
          }
      }
  }

  case class DocText(doc_id: Long, text: String)
  case class DocSourced(doc_id: Long, source: String, text: String)
  case class BandedDoc(band: Int, bkey: Long, doc_id: Long, sig: Seq[Long])
  case class DupHit(doc_id: Long, dup_of: Long, band: Int)
  case class BucketState(docs: List[(Long, Seq[Long])])

  /** Streaming BANDED near-duplicate detection — the LSH sibling of
    * [[dedupEvents]]'s exact-key dedup, closing the one LLM-pipeline
    * operator with no streaming twin (SURVEY §2.10 + §2.11 dedup
    * family). Each arriving doc computes its minhash signature
    * ROW-LOCALLY (`Dedup.localMinhashSig` — bit-equal to the batch
    * signatures, asserted by StreamingSpec) and explodes to its band
    * buckets; per-BUCKET keyed state holds the (doc_id, sig) pairs
    * seen so far, and a new doc emits a [[DupHit]] against every
    * earlier doc in the bucket agreeing on ≥ `minMatches` of
    * `numPerms` signature slots — the same integer decision as the
    * batch `est_jaccard >= minMatches/numPerms` filter, so distinct
    * (doc_id, dup_of) downstream is EXACTLY the batch q108 pair set
    * (StreamingSpec asserts the parity).
    *
    * Scale shape: state is per band bucket (the same partitioning the
    * batch LSH join shuffles on), bounded by bucket occupancy — in
    * production the state would evict on an event-time timeout at the
    * dedup horizon, exactly where `dropDuplicatesWithinWatermark`
    * bounds ITS state; the fixture corpus is bounded so the spec runs
    * NoTimeout. Arrival-order-independent: a new doc is compared
    * against EVERY bucket resident and the hit is emitted as
    * (max id, min id), so the distinct pair set equals the batch q108
    * set whatever order docs arrive in (StreamingSpec shuffles the
    * arrival order to assert it). */
  /** Streaming Count-Min maintenance — the q122 frequency sketch kept
    * live over a document stream: corpus-bigram occurrences fold into
    * the same depth×width counter matrix (`Sketches.countMinCells` is
    * pure additive dataflow, so it runs unchanged under streaming
    * aggregation). Additive counters are the whole point here: after
    * ANY batch split and arrival order, the streamed cells equal the
    * batch matrix EXACTLY (StreamingSpec asserts bit-equality, not a
    * bound), and state is at most depth×width counters no matter how
    * the vocabulary grows. Bigrams come from the row-local
    * [[graft.functions.TextFns.shingles]] form — no cross-row window,
    * the streaming-legal extraction; the spec pins it to the batch
    * q122 window+lead extraction on the same corpus. */
  def countMinStream(docs: Dataset[DocText],
                     mults: Seq[Long] = Seq(31L, 37L, 41L),
                     width: Int = 256): DataFrame = {
    import graft.functions.TextFns
    val bg = docs.toDF().select(explode(
      TextFns.shingles(TextFns.words(TextFns.norm(col("text"))), 2)).as("bg"))
    graft.operators.Sketches.countMinCells(bg, col("bg"), mults, width)
  }

  /** Streaming sequence-pack ACCOUNTING — the live-corpus twin of the
    * q126/q139/q146 budgeting layer. A stream cannot emit final pack
    * offsets (they depend on the global fill order, fixed only when
    * the corpus closes), but every quantity the pack plan is computed
    * FROM is an additive aggregate and therefore exactly stream-
    * maintainable: per (source, predicted language) — both row-local
    * extractions, q22's langId and the q126/q139 BPE token count —
    * the doc count, the token total, and the derived sequence count
    * ceil(total/cap) (integer form (total + cap − 1) div cap). After
    * ANY batch split and arrival order the final state equals the
    * batch aggregation bit-for-bit (StreamingSpec asserts equality
    * against the q146-denominated batch counts), and state is one row
    * per (source, lang) however many documents arrive. */
  def packAccountingStream(docs: Dataset[DocSourced],
                           cap: Long = 512L): DataFrame = {
    import graft.functions.{Bpe, TextFns}
    docs.toDF()
      .select(col("source"),
        TextFns.langId(TextFns.words(TextFns.norm(col("text"))))
          .as("lang_pred"),
        Bpe.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .groupBy(col("source"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), col("lang_pred"), col("n_docs"),
        col("total_tokens"),
        call_function("div", col("total_tokens") + (cap - 1), lit(cap))
          .as("n_sequences"))
  }

  /** Streaming SPAN-DEDUP candidate maintenance — the live-corpus twin
    * of q144/q150's duplicated-shingle detection: per L-token shingle
    * hash, a running occurrence count as a streaming aggregation
    * (additive, so any batch split converges to the batch frequency
    * table bit-for-bit; shingling is row-local — a document's windows
    * never cross rows, so [[graft.functions.TextFns.shingles]] is the
    * streaming-legal extraction, spec-pinned to the batch posexplode
    * + lead form). Counts ≥ 2 are exactly the duplicated-shingle
    * candidates the batch island-merge consumes; the maximal-span
    * merge itself is deliberately NOT streamed (it needs each doc's
    * final duplicated-position set, fixed only when the corpus
    * closes — the packAccountingStream division of labor). */
  def spanCandidateStream(docs: Dataset[DocText],
                          minTokens: Int = 8): DataFrame = {
    import graft.functions.TextFns
    docs.toDF()
      .select(explode(transform(
        TextFns.shingles(TextFns.words(TextFns.norm(col("text"))),
          minTokens),
        s => xxhash64(s))).as("hk"))
      .groupBy(col("hk")).agg(count(lit(1)).as("cnt"))
  }

  /** Streaming CDC-CHUNK candidate maintenance — the live-corpus twin
    * of q166: chunking is row-local ([[graft.operators.Dedup
    * .cdcChunkArray]], the pure-column form spec-pinned to the batch
    * window chunker), and chunk occurrence counts are additive, so
    * after any batch split the state equals the batch frequency table
    * bit-for-bit. The ≥ 2 slice is the live duplicated-chunk set the
    * batch keeper consumes; cross-document doc counts and keeper
    * election stay batch-side (the spanCandidateStream division of
    * labor). State is one row per distinct chunk. */
  def cdcChunkStream(docs: Dataset[DocText],
                     meanChunk: Int = 16): DataFrame =
    docs.toDF()
      .select(explode(graft.operators.Dedup
        .cdcChunkArray(col("text"), meanChunk)).as("c"))
      .select(col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").as("n_tokens"))
      .groupBy(col("chunk_text"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming ANN INGEST routing — new vectors routed to their
    * nearest persisted-index cell as they arrive (the serving-side
    * complement of the q119/q141 index split: the index is built by a
    * scheduled batch job, a LIVE stream keeps cell occupancies
    * current so the operator knows when a rebuild is due). The
    * centroid table is tiny and FIXED at build time, so it rides into
    * the stream as a literal struct array and the argmax is row-local
    * (an `aggregate` fold in cell-ascending order, strict-greater
    * replacement — exactly assignCells' (sim DESC, cell ASC) top-1,
    * using [[graft.functions.VectorFns.cosine]] which is spec-pinned
    * bitwise to the batch ArrayCosine kernel); per-cell counts are
    * one additive streaming aggregation. StreamingSpec pins the
    * row-local assign ≡ batch assignCells per vector, and streamed
    * counts ≡ batch counts under shuffled batches. */
  def ivfIngestStream(vecs: DataFrame,
                      centroids: Seq[(Long, Seq[Double])],
                      vec: String = "cv"): DataFrame = {
    vecs.select(ivfCellOf(col(vec), centroids).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
  }

  /** The row-local nearest-centroid pick used by [[ivfIngestStream]]
    * (exposed for the spec's batch-equivalence pin). `centroids` must
    * be sorted by cell id ascending — the fold's strict-greater
    * replacement then breaks similarity ties toward the smaller cell,
    * matching assignCells' window order. */
  private[graft] def ivfCellOf(vecCol: org.apache.spark.sql.Column,
                               centroids: Seq[(Long, Seq[Double])])
      : org.apache.spark.sql.Column = {
    require(centroids == centroids.sortBy(_._1),
      "centroids must arrive sorted by cell id")
    import graft.functions.VectorFns
    val ctrLit = typedLit(centroids)
    aggregate(ctrLit,
      struct(lit(-1L).as("cell"), lit(-2.0).as("sim")),
      (acc, c) => {
        val sim = VectorFns.cosine(vecCol, c.getField("_2"))
        when(sim > acc.getField("sim"),
          struct(c.getField("_1").as("cell"), sim.as("sim")))
          .otherwise(acc)
      }).getField("cell")
  }

  case class KmvState(hs: List[Long], nSeen: Long)
  case class KmvSketch(source: String, n_seen: Long, hs: Seq[Long])

  /** Streaming KMV maintenance — the q153 per-source k-minimum-values
    * sketch kept live over a document stream. Shingling is the
    * row-local [[graft.functions.TextFns.shingles]] form and the hash
    * is the same row-local `Sketches.mixedStringHash` column the batch
    * side uses, so the streamed hash SET per source equals the batch
    * set by construction; per-source keyed state holds the k smallest
    * distinct hashes (a sorted set insert — IDEMPOTENT like the HLL
    * max-merge, so shuffled batches AND wholesale redelivery leave the
    * `hs` sketch bit-equal to batch
    * [[graft.operators.Sketches.kmvMinHashes]], where an additive
    * sketch would double-count; StreamingSpec asserts both). The
    * idempotence claim is scoped to `hs` ONLY: `n_seen` is a plain
    * per-row counter, so a redelivered batch inflates it even while
    * the sketch stays bit-equal — treat it as a processed-rows
    * diagnostic, not a replay-stable statistic (every downstream
    * union/intersection/Jaccard estimate reads `hs` alone).
    * State is ≤ k longs per source however many
    * documents arrive; every downstream pair estimate (union /
    * intersection / Jaccard) reads these sketches only, so cross-
    * source overlap screening stays live without ever re-shuffling
    * the corpus. */
  def kmvStream(docs: Dataset[DocSourced], n: Int = 5,
                k: Int = 64): Dataset[KmvSketch] = {
    import docs.sparkSession.implicits._
    import graft.functions.TextFns
    docs.toDF()
      .select(col("source"), explode(
        TextFns.shingles(TextFns.words(TextFns.norm(col("text"))), n))
        .as("sh"))
      .select(col("source"),
        graft.operators.Sketches.mixedStringHash(col("sh")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvSketch](
        GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[(String, Long)],
         state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(Nil, 0L))
          val set = scala.collection.mutable.TreeSet.from(prev.hs)
          var seen = prev.nSeen
          rows.foreach { r =>
            seen += 1L
            set += r._2
            if (set.size > k) set -= set.last
          }
          // n_seen is monotone per source — the spec's final-update pick
          val out = KmvState(set.toList, seen)
          state.update(out)
          KmvSketch(src, seen, out.hs)
      }
  }

  /** Streaming HLL maintenance — the q133/q134 distinct sketch kept
    * live over the event stream: per-(window, event_type, bucket)
    * max(rho) is a streaming MAX aggregation, so
    * `Sketches.hllRegisters` runs unchanged as incremental dataflow.
    * Where q122's additive counters demand exactly-once folding, max
    * is IDEMPOTENT as well as commutative/associative — any batch
    * split, arrival order, or wholesale REDELIVERY of a batch leaves
    * the registers bit-equal to the batch sketch (StreamingSpec
    * asserts all three). State: 2^p registers per (window, type)
    * however many users arrive; windows close at the watermark in
    * production (the fixture corpus is bounded, so the spec runs
    * complete mode). */
  def hllRegisterStream(events: Dataset[Event], p: Int = 8): DataFrame =
    graft.operators.Sketches.hllRegisters(
      events.toDF()
        .select(unix_timestamp(
            window(col("ts"), "1 day").getField("start")).as("ws"),
          col("event_type"), col("user_id").cast("string").as("k")),
      Seq("ws", "event_type"), col("k"), p)

  def bandedNearDup(docs: Dataset[DocText], minMatches: Int = 16,
                    numPerms: Int = 32, rowsPerBand: Int = 4): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { d =>
      val sig = graft.operators.Dedup.localMinhashSig(d.text, numPerms)
      if (sig == null) Iterator.empty
      else {
        val sigSeq: Seq[Long] = sig.toIndexedSeq
        graft.operators.Dedup.localBandKeys(sig, rowsPerBand)
          .iterator.zipWithIndex
          .map { case (bk, b) => BandedDoc(b, bk, d.doc_id, sigSeq) }
      }
    }
    banded.groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
          val hits = List.newBuilder[DupHit]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            seen.foreach { case (id0, sig0) =>
              if (id0 != r.doc_id) {
                var m = 0
                var i = 0
                while (i < sig0.length) {
                  if (sig0(i) == r.sig(i)) m += 1
                  i += 1
                }
                if (m >= minMatches)
                  hits += DupHit(math.max(id0, r.doc_id),
                    math.min(id0, r.doc_id), key._1)
              }
            }
            seen = (r.doc_id, r.sig) :: seen
          }
          state.update(BucketState(seen))
          hits.result().iterator
      }
  }

  case class EwmaState(user_id: Long, n_events: Long, ewma: Long)

  /** Streaming twin of the q115 per-user integer EWMA
    * (`Relational.ewmaInt`): keyed state holds (count, ewma) and each
    * event past the watermark advances e ← (num·x + (den−num)·e)
    * floordiv den — the SAME exact-int64 recursion as the batch fold.
    * The recursion is order-dependent, so events fold through the
    * [[foldRipe]] watermark buffer in event-time order: after the
    * watermark passes a set of events the state equals the batch
    * operator on exactly that set, under ANY arrival order within the
    * watermark delay (StreamingSpec asserts it with shuffled batches). */
  def ewmaStream(events: Dataset[Event], num: Long = 1L, den: Long = 4L,
                 watermark: String = "10 minutes"): Dataset[EwmaState] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Pending[EwmaState], EwmaState](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Pending[EwmaState]]) =>
          foldRipe(rows, state) { (st0: Option[EwmaState], ordered) =>
            var st = st0.orNull
            ordered.foreach { e =>
              val x = math.floor(e.value * 100).toLong
              st =
                if (st == null) EwmaState(uid, 1L, x)
                else EwmaState(uid, st.n_events + 1,
                  Math.floorDiv(num * x + (den - num) * st.ewma, den))
            }
            (st, List(st))
          }
      }
  }

  case class Change(k: Long, payload: String, v: Double, seq: Long, op: String)
  case class Upsert(k: Long, payload: String, v: Double, seq: Long,
                    live: Boolean)

  /** Streaming CDC upsert view — the incremental twin of
    * [[graft.operators.Cdc.snapshot]] (q129): as changelog rows arrive,
    * each key's state converges to its highest-seq change, and every
    * batch emits the key's current version (live=false marks a winning
    * delete — the tombstone a downstream sink needs to drop the row).
    *
    * Unlike the order-dependent twins (ewma/funnel/transition), the
    * max-seq merge is COMMUTATIVE, ASSOCIATIVE, and IDEMPOTENT, so
    * out-of-order and duplicate delivery need no event-time buffering
    * at all: any arrival order over any batching converges to the same
    * state the batch operator computes (StreamingSpec shuffles
    * deliveries across batches and asserts equality). State is one row
    * per live key — the lower bound for ANY materialized upsert view —
    * so no timeout/eviction applies (the view IS the state). */
  def cdcUpsertStream(changes: Dataset[Change]): Dataset[Upsert] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState[Change, Upsert](GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[Change], state: GroupState[Change]) =>
          val best = (state.getOption.iterator ++ rows).maxBy(_.seq)
          state.update(best)
          Upsert(k, best.payload, best.v, best.seq, best.op != "D")
      }
  }

  case class MgShard(shard: Int, ks: Seq[String], cnts: Seq[Long], n: Long)

  /** Streaming heavy-hitter CANDIDATE maintenance — q137's
    * Misra-Gries pass kept live over a key stream. Keys hash to
    * `shards` state groups; each shard folds its arrivals into an
    * s-counter summary held as keyed state (`mapGroupsWithState` —
    * ≤ s counters per shard however large the keyspace grows, the
    * same bounded-state discipline as the Count-Min and HLL twins).
    * Because hashing routes ALL of a key's occurrences to ONE shard,
    * a globally heavy key (count > n/(s+1) ≥ n_shard/(s+1)) survives
    * its shard's MG guarantee, so the union of shard summaries is a
    * SUPERSET of the true union-stream heavies under ANY batch split
    * and arrival order — the exact answer then needs only the q137
    * recount over the few candidates. StreamingSpec replays shuffled
    * batches and asserts exactly that: candidates ⊇ true heavies,
    * per-shard state bounded, and the candidate recount equal to the
    * batch q137 pipeline's output. */
  def heavyHitterCandidates(keys: Dataset[String], summarySize: Int,
                            shards: Int = 32): Dataset[MgShard] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(k => math.floorMod(k.hashCode, shards))
      .mapGroupsWithState[MgShard, MgShard](GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[String], state: GroupState[MgShard]) =>
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(s =>
            s.ks.zip(s.cnts).foreach { case (k, c) => counters(k) = c })
          var n = state.getOption.map(_.n).getOrElse(0L)
          rows.foreach { k =>
            n += 1L
            if (counters.contains(k)) counters(k) += 1L
            else if (counters.size < summarySize) counters(k) = 1L
            else {
              counters.mapValuesInPlace((_, v) => v - 1L)
              counters.filterInPlace((_, v) => v > 0L)
            }
          }
          val ks = counters.keys.toArray.sorted
          val next = MgShard(shard, ks.toSeq, ks.map(counters).toSeq, n)
          state.update(next)
          next
      }
  }

  /** Custom keyed state: running per-user totals via
    * flatMapGroupsWithState (the reference-shaped "custom state" hook —
    * SURVEY.md §2.10). Emits an updated total per key per batch. */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0d))
          var n = prev.n_events
          var v = prev.total_value
          rows.foreach { e => n += 1; v += e.value }
          val next = UserTotal(uid, n, v)
          state.update(next)
          Iterator(next)
      }
  }
}
