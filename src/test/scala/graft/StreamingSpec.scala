package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

case class Authorship(group: Long, member: Long, ts: Timestamp)

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, uid: Long, typ: String = "click",
                 v: Double = 1.0) = Event(id, ts(t), uid, typ, v, "{}")

  test("tumblingCounts aggregates per hour window (incremental)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:55:00", 2))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 11:05:00", 1))
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .select(unix_timestamp($"win_start"), $"n_events")
        .as[(Long, Long)].collect().toSet
      val h10 = ts("2024-01-01 10:00:00").getTime / 1000
      assert(got == Set((h10, 2L), (h10 + 3600, 1L)))
    } finally q.stop()
  }

  test("dedupEvents drops duplicate event ids within watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.dedupEvents(ms.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", 1), ev(1, "2024-01-01 10:00:30", 1),
        ev(2, "2024-01-01 10:01:00", 2))
      q.processAllAvailable()
      assert(spark.table("dedup").select("event_id")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("userRunningTotals keeps state across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.userRunningTotals(ms.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", 7, v = 2.0),
        ev(2, "2024-01-01 10:01:00", 7, v = 3.0))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 10:02:00", 7, v = 5.0))
      q.processAllAvailable()
      val last = spark.table("totals").as[EventStreams.UserTotal]
        .collect().maxBy(_.n_events)
      assert(last == EventStreams.UserTotal(7L, 3L, 10.0))
    } finally q.stop()
  }

  test("funnelStages matches batch q85 under cross-batch OUT-OF-ORDER arrival") {
    implicit val ctx = spark.sqlContext
    // the six real events, delivered SCRAMBLED across batches: user 7's
    // purchase arrives first, its click second, its view LAST — the
    // arrival-order fold would leave user 7's funnel permanently closed;
    // the watermark-ordered fold must open all three stages
    val evs = Seq(
      ev(1, "2024-01-01 10:00:00", 7, "view"),
      ev(2, "2024-01-01 10:05:00", 7, "click"),
      ev(3, "2024-01-01 09:00:00", 8, "click"),
      ev(4, "2024-01-01 09:30:00", 8, "view"),
      ev(5, "2024-01-01 10:10:00", 7, "purchase"),
      ev(6, "2024-01-01 09:40:00", 8, "purchase"))
    val ms = MemoryStream[Event]
    val q = EventStreams.funnelStages(ms.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      ms.addData(evs(4), evs(2)); q.processAllAvailable() // purchase, click
      ms.addData(evs(1), evs(5)); q.processAllAvailable() // click, purchase
      ms.addData(evs(0), evs(3)); q.processAllAvailable() // the views, last
      // nothing may emit before the watermark passes the buffered events
      assert(spark.table("funnel").isEmpty,
        "funnel emitted before the watermark passed")
      // flush: a far-future sentinel advances the watermark past all
      // real events, firing the event-time timeouts that fold them
      ms.addData(ev(99, "2024-01-01 14:00:00", 999, "view"))
      q.processAllAvailable()
      val last = spark.table("funnel").as[EventStreams.FunnelState]
        .collect().filter(_.user_id != 999L).groupBy(_.user_id).view
        .mapValues(_.maxBy(s => (s.view_us, s.click_us, s.purchase_us))).toMap
      def us(s: String) = ts(s).getTime * 1000L
      assert(last(7L) == EventStreams.FunnelState(7L,
        Some(us("2024-01-01 10:00:00")), Some(us("2024-01-01 10:05:00")),
        Some(us("2024-01-01 10:10:00"))))
      // user 8's click PRECEDES its first view in event time → closed
      assert(last(8L) == EventStreams.FunnelState(8L,
        Some(us("2024-01-01 09:30:00")), None, None))
      // and the final state matches the oracle-checked batch twin (q85)
      // on the same six events
      val dir = java.nio.file.Files.createTempDirectory("funnel").toString
      // match the fixture layout Tables.events expects: ts as raw nanos
      evs.toDS().withColumn("ts", expr("unix_micros(ts) * 1000"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val twin = SparkEntry.queries("q85_funnel_stages")(spark, dir)
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().map(r => r._1 -> r).toMap
      assert(twin(7L) == ((7L, last(7L).view_us, last(7L).click_us,
        last(7L).purchase_us)))
      assert(twin(8L) == ((8L, last(8L).view_us, None, None)))
    } finally q.stop()
  }

  test("transitionStream matches batch q90 under cross-batch OUT-OF-ORDER arrival") {
    implicit val ctx = spark.sqlContext
    // event-time journeys: 7: view→click→purchase; 8: view→view→error.
    // Delivered scrambled: each user's LAST event arrives first, so the
    // arrival-order fold would invent transitions like purchase→view.
    val evs = Seq(
      ev(1, "2024-01-01 10:00:00", 7, "view"),
      ev(2, "2024-01-01 10:05:00", 7, "click"),
      ev(3, "2024-01-01 10:01:00", 8, "view"),
      ev(4, "2024-01-01 10:10:00", 7, "purchase"),
      ev(5, "2024-01-01 10:11:00", 8, "view"),
      ev(6, "2024-01-01 10:12:00", 8, "error"))
    val ms = MemoryStream[Event]
    val q = EventStreams.transitionStream(ms.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      ms.addData(evs(3), evs(5)); q.processAllAvailable()
      ms.addData(evs(1), evs(4)); q.processAllAvailable()
      ms.addData(evs(0), evs(2)); q.processAllAvailable()
      assert(spark.table("transitions").isEmpty,
        "transitions emitted before the watermark passed")
      ms.addData(ev(99, "2024-01-01 14:00:00", 999, "view")) // flush
      q.processAllAvailable()
      val streamed = spark.table("transitions")
        .filter(col("user_id") =!= 999L)
        .groupBy(col("prev"), col("next")).count()
        .as[(String, String, Long)].collect().toSet
      assert(streamed == Set(
        ("_start", "view", 2L), ("view", "click", 1L),
        ("click", "purchase", 1L), ("view", "view", 1L),
        ("view", "error", 1L)))
      // and the aggregate equals the oracle-checked batch twin q90 on
      // the same events (same fixture layout as the funnel test)
      val dir = java.nio.file.Files.createTempDirectory("trans").toString
      evs.toDS().withColumn("ts", expr("unix_micros(ts) * 1000"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val twin = SparkEntry.queries("q90_transition_matrix")(spark, dir)
        .as[(String, String, Long)].collect().toSet
      assert(twin == streamed)
    } finally q.stop()
  }

  test("slidingCounts places an event in every overlapping window") {
    val batch = Seq(ev(1, "2024-01-01 10:07:00", 1)).toDF()
    val wins = EventStreams.slidingCounts(batch)
      .select(unix_timestamp($"win_start")).as[Long].collect().sorted.toSeq
    val t1000 = ts("2024-01-01 10:00:00").getTime / 1000
    assert(wins == Seq(t1000, t1000 + 300)) // 10:00 and 10:05 windows
  }

  test("incrementalCoEdges emits new pairs as members arrive") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Authorship]
    val q = EventStreams.incrementalCoEdges(ms.toDF())
      .writeStream.format("memory").queryName("coedges")
      .outputMode("append").start()
    try {
      ms.addData(Authorship(1L, 10L, ts("2024-01-01 10:00:00")),
        Authorship(1L, 11L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      ms.addData(Authorship(1L, 12L, ts("2024-01-01 10:02:00")),
        Authorship(2L, 10L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val got = spark.table("coedges").select("group", "a", "b")
        .as[(Long, Long, Long)].collect().toSet
      // batch1 pair + the two pairs the batch2 arrival creates with
      // buffered state; group 2 has one member → no pair
      assert(got == Set((1L, 10L, 11L), (1L, 10L, 12L), (1L, 11L, 12L)))
    } finally q.stop()
  }

  test("incrementalCoEdges join state PLATEAUS under an advancing watermark") {
    // the interval self-join buffers both sides in the state store;
    // StreamingJoinHelper cannot analyze the pushed-down `a < b`
    // conjunct (it logs a WARN and skips it), but the two canonical
    // time-range conjuncts still yield eviction bounds — this test
    // PROVES eviction: with event time advancing 40 min per batch and a
    // 1-hour watermark, state rows must stop growing and rows must be
    // removed, instead of accumulating one batch's rows forever
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Authorship]
    val q = EventStreams.incrementalCoEdges(ms.toDF(), "1 hour")
      .writeStream.format("memory").queryName("coedges_state")
      .outputMode("append").start()
    try {
      val base = ts("2024-01-01 00:00:00").getTime
      val totals = (0 until 12).map { i =>
        val t = new Timestamp(base + i * 40L * 60 * 1000)
        ms.addData((0 until 4).map(m => Authorship(1L, i * 10L + m, t)): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators(0).numRowsTotal
      }
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "join state never evicted a row")
      // plateau: the tail holds no more rows than the mid-run level
      // (+1 batch of slack for boundary timing)
      assert(totals.takeRight(3).max <= totals.slice(5, 9).max + 8,
        s"state kept growing: $totals")
      // and far below the no-eviction level (12 batches × 4 rows × 2 sides)
      assert(totals.last < 96, s"state ~unbounded: $totals")
    } finally q.stop()
  }

  test("incremental edge-weight maintenance: foreachBatch upsert converges to batch weights") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    val ms = MemoryStream[Authorship]
    // the materialized-view upsert pattern: each micro-batch's new
    // pairs are merged into keyed weight state (in production: a
    // keyed parquet/Delta MERGE; here: a driver map, same contract)
    val state = scala.collection.concurrent.TrieMap[(Long, Long, Long), Long]()
    val q = EventStreams.incrementalCoEdges(ms.toDF())
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.groupBy("group", "a", "b").count()
          .collect().foreach { r =>
            val k = (r.getLong(0), r.getLong(1), r.getLong(2))
            state.updateWith(k)(prev => Some(prev.getOrElse(0L) + r.getLong(3)))
          }
      }.start()
    try {
      val rows = Seq(
        Authorship(1L, 10L, ts("2024-01-01 10:00:00")),
        Authorship(1L, 11L, ts("2024-01-01 10:01:00")),
        Authorship(1L, 12L, ts("2024-01-01 10:02:00")),
        Authorship(2L, 10L, ts("2024-01-01 10:03:00")),
        Authorship(2L, 11L, ts("2024-01-01 10:04:00")))
      ms.addData(rows.take(2): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(2): _*)
      q.processAllAvailable()
      // batch twin on the SAME data (unified code): final MV state must
      // equal the from-scratch weights
      val batch = EventStreams.incrementalCoEdges(rows.toDF())
        .groupBy($"group", $"a", $"b").count()
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
      assert(state.toMap == batch)
      assert(batch.values.sum == 4L) // (10,11),(10,12),(11,12) in g1 + (10,11) in g2
    } finally q.stop()
  }

  test("watermark drops late data in append-mode aggregation") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(ms.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:07:00", 1))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window...
      ms.addData(ev(3, "2024-01-01 12:00:00", 1))
      q.processAllAvailable()
      // ...then a late event for the already-finalized window: dropped
      ms.addData(ev(4, "2024-01-01 10:08:00", 1))
      q.processAllAvailable()
      ms.addData(ev(5, "2024-01-01 14:00:00", 1)) // flush 12:00 window
      q.processAllAvailable()
      val got = spark.table("late")
        .select(unix_timestamp($"win_start"), $"n_events")
        .as[(Long, Long)].collect().toMap
      val h10 = ts("2024-01-01 10:00:00").getTime / 1000
      assert(got(h10) == 2L) // late event 4 did NOT bump the count
    } finally q.stop()
  }

  test("file stream source: parquet drops flow through tumblingCounts") {
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    // stage one parquet drop from the fixture (already us-precision)
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .limit(200).write.mode("overwrite").parquet(dir)
    val q = EventStreams.tumblingCounts(EventStreams.readStream(spark, dir))
      .writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("filestream")
        .agg(sum($"n_events")).as[Long].head()
      assert(n == 200)
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with a dimension") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[Event]
    val q = ms.toDF().join(broadcast(dim), Seq("user_id"), "left")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:00", 9))
      q.processAllAvailable()
      val got = spark.table("enriched").as[(Long, Option[String])]
        .collect().toMap
      assert(got == Map(1L -> Some("gold"), 2L -> None))
    } finally q.stop()
  }

  test("foreachBatch sink lands incremental parquet batches") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("fb").toString
    val ms = MemoryStream[Event]
    val q = ms.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$out/batch_$id")
      }.start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", 1))
      q.processAllAvailable()
      ms.addData(ev(2, "2024-01-01 10:01:00", 2), ev(3, "2024-01-01 10:02:00", 3))
      q.processAllAvailable()
      val n = spark.read.parquet(s"$out/batch_*").count()
      assert(n == 3)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates (backfill mode)") {
    // the production catch-up pattern: process everything currently in
    // the source in bounded micro-batches, then stop — what a 100 TB
    // backfill run uses instead of a forever-running query
    val dir = java.nio.file.Files.createTempDirectory("avnow").toString
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .limit(300).write.mode("overwrite").parquet(dir)
    val q = EventStreams.tumblingCounts(EventStreams.readStream(spark, dir))
      .writeStream.format("memory").queryName("avnow")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
      val n = spark.table("avnow").agg(sum($"n_events")).as[Long].head()
      assert(n == 300)
    } finally q.stop()
  }

  test("localMinhashSig equals the batch minhashSignatures on a real corpus") {
    // the streaming near-dup path computes signatures row-locally; the
    // parity below is only meaningful if the two formulations are
    // bit-equal on real text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val batch = graft.operators.Dedup
      .minhashSignatures(docs, "doc_id", "text")
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    val local = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      Option(graft.operators.Dedup.localMinhashSig(t)).map(s => id -> s.toSeq)
    }.toMap
    assert(local.keySet == batch.keySet)
    local.foreach { case (id, s) =>
      assert(s == batch(id), s"signature diverged for doc $id")
    }
    assert(local.nonEmpty)
  }

  test("bandedNearDup stream equals the batch q108 pair set") {
    implicit val ctx = spark.sqlContext
    // synthetic corpus with PLANTED near-dup clusters: docs in a
    // cluster share all but one word, singletons are disjoint — so the
    // parity is exercised on real hits, not a vacuous empty set
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"w${seed}x$i").mkString(" ")
    val docs = (
      (0 until 6).map(i => EventStreams.DocText(10L + i,
        words(1, 30) + s" tail$i")) ++ // cluster: 30 shared + 1 own word
      (0 until 6).map(i => EventStreams.DocText(30L + i,
        words(2, 25) + s" end$i")) ++ // second cluster
      (0 until 8).map(i => EventStreams.DocText(50L + i,
        words(100 + i, 20))) // disjoint singletons
    ).sortBy(_.doc_id)
    val ms = MemoryStream[EventStreams.DocText]
    val q = EventStreams.bandedNearDup(ms.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      // SCRAMBLED arrival across micro-batches: interleave the clusters
      // and reverse ids, so most pairs meet their bucket-mate with the
      // smaller id arriving last — order independence is exercised, not
      // assumed (deterministic scramble, no RNG)
      docs.sortBy(d => (d.doc_id % 3, -d.doc_id)).grouped(7).foreach { b =>
        ms.addData(b.toSeq: _*); q.processAllAvailable()
      }
      val streamed = spark.table("neardup").select($"doc_id", $"dup_of")
        .distinct().as[(Long, Long)].collect().toSet
      val docsDf = docs.toDF()
      val sigs = graft.operators.Dedup
        .minhashSignatures(docsDf, "doc_id", "text")
      val batch = graft.operators.Dedup
        .minhashEstimate(
          graft.operators.Dedup.lshCandidates(sigs, "doc_id"), sigs, "doc_id")
        .filter($"est_jaccard" >= 0.5)
        .select($"id_b", $"id_a").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "planted clusters produced no batch pairs")
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${streamed -- batch}, " +
          s"only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("ewmaStream equals batch ewmaInt under cross-batch OUT-OF-ORDER arrival") {
    implicit val ctx = spark.sqlContext
    // the EWMA recursion is order-dependent: folding user 1's values in
    // arrival order (2.00, 0.60, 1.00) yields 146, in event-time order
    // (1.00, 2.00, 0.60) yields 108 — so this parity FAILS unless the
    // stream folds in event-time order however events arrive
    val evs = Seq(
      ev(1, "2024-01-01 10:00:00", 1, v = 1.00),
      ev(2, "2024-01-01 10:01:00", 1, v = 2.00),
      ev(3, "2024-01-01 10:02:00", 1, v = 0.60),
      ev(4, "2024-01-01 10:00:30", 2, v = 0.42),
      ev(5, "2024-01-01 10:03:00", 2, v = 3.00))
    val ms = MemoryStream[Event]
    val q = EventStreams.ewmaStream(ms.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("ewma")
      .outputMode("update").start()
    try {
      ms.addData(evs(1), evs(4)); q.processAllAvailable()
      ms.addData(evs(2), evs(3)); q.processAllAvailable()
      ms.addData(evs(0)); q.processAllAvailable()
      assert(spark.table("ewma").isEmpty,
        "ewma emitted before the watermark passed")
      ms.addData(ev(99, "2024-01-01 14:00:00", 999)) // watermark flush
      q.processAllAvailable()
      // latest state per user (n_events strictly grows, so the max
      // struct IS the latest update row) vs the batch fold
      val streamed = spark.table("ewma")
        .filter($"user_id" =!= 999L)
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"ewma")).as("st"))
        .select($"user_id", $"st.n_events", $"st.ewma")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val batchGot = graft.operators.Relational.ewmaInt(
          evs.toDF(), $"user_id", unix_micros($"ts"), $"event_id",
          floor($"value" * 100), 1L, 4L)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(streamed == batchGot)
      assert(streamed(1L) == ((3L, 108L))) // the event-time-order fold
    } finally q.stop()
  }

  test("sessionCounts (unified API) splits on the gap in batch mode") {
    val batch = Seq(
      ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:10:00", 1),
      ev(3, "2024-01-01 11:30:00", 1), // > 30 min after previous → new session
      ev(4, "2024-01-01 10:00:00", 2)
    ).toDF()
    val got = EventStreams.sessionCounts(batch)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got == Map(1L -> Seq(1L, 2L), 2L -> Seq(1L)))
  }

  test("countMinStream cells after shuffled batches equal the batch " +
       "matrix exactly (additive merge), and the row-local bigram " +
       "extraction matches q122's window+lead form") {
    implicit val ctx = spark.sqlContext
    import graft.functions.TextFns
    import graft.operators.Sketches
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[EventStreams.DocText].collect().toSeq
    // batch reference on the SAME corpus via the row-local extraction
    val corpusDf = corpus.toDF()
    val bgHof = corpusDf.select(explode(
      TextFns.shingles(TextFns.words(TextFns.norm($"text")), 2)).as("bg"))
    val batch = Sketches
      .countMinCells(bgHof, col("bg"), Seq(31L, 37L, 41L), 256)
      .as[(Long, Long, Long)].collect().toSet
    // q122's extraction (posexplode + lead over the doc partition)
    // yields the same bigram multiset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val bgWin = corpusDf.select($"doc_id",
        posexplode(TextFns.words(TextFns.norm($"text"))).as(Seq("pos", "w0")))
      .withColumn("w1", lead($"w0", 1).over(w))
      .filter($"w1".isNotNull)
      .select(concat_ws(" ", $"w0", $"w1").as("bg"))
    assert(bgHof.groupBy("bg").count().as[(String, Long)].collect().toMap ==
      bgWin.groupBy("bg").count().as[(String, Long)].collect().toMap)
    val ms = MemoryStream[EventStreams.DocText]
    val q = EventStreams.countMinStream(ms.toDS())
      .writeStream.format("memory").queryName("cmstream")
      .outputMode("complete").start()
    try {
      val shuffled = new scala.util.Random(5).shuffle(corpus)
      shuffled.grouped(math.max(1, shuffled.size / 3)).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("cmstream")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("spanCandidateStream after shuffled batches equals the batch " +
       "shingle frequency table, and its >=2 slice is exactly the " +
       "q144 candidate set") {
    implicit val ctx = spark.sqlContext
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[EventStreams.DocText].collect().toSeq
    // batch reference: the q144 shingle relation (posexplode + lead)
    val batch = graft.operators.Dedup
      .spanShingles(corpus.toDF(), "doc_id", "text", 8)
      .groupBy($"hk").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toSet
    val ms = MemoryStream[EventStreams.DocText]
    val q = EventStreams.spanCandidateStream(ms.toDS())
      .writeStream.format("memory").queryName("spancand")
      .outputMode("complete").start()
    try {
      val shuffled = new scala.util.Random(13).shuffle(corpus)
      shuffled.grouped(math.max(1, shuffled.size / 3)).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("spancand")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch)
      // the candidate slice is non-trivial on the fixture (planted
      // duplicated spans) and matches the batch duplicated set
      val cands = streamed.filter(_._2 >= 2)
      assert(cands.nonEmpty)
      assert(cands == batch.filter(_._2 >= 2))
    } finally q.stop()
    graft.Checkpoints.releaseAll(spark)
  }

  test("ivfIngestStream routes vectors to the same cells as batch " +
       "assignCells, and streamed occupancies equal batch counts") {
    implicit val ctx = spark.sqlContext
    import graft.functions.VectorFns
    import graft.operators.Similarity
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".as("n_id"),
        VectorFns.toDoubleArr($"embedding").as("cv"))
    val ctrs = Similarity.lloydCentroids(emb, 8, 2)
    val ctrSeq = ctrs.select($"cell", $"ctr")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    // row-local pick ≡ the batch window top-1, vector by vector
    val rowLocal = emb.select($"n_id",
        EventStreams.ivfCellOf($"cv", ctrSeq).as("cell"))
      .as[(Long, Long)].collect().toMap
    val batchAssign = Similarity.assignCells(emb, ctrs, 1)
      .as[(Long, Long)].collect().toMap
    assert(rowLocal == batchAssign)
    val batchCounts = batchAssign.values.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }
    // streamed occupancies under shuffled batches
    val rows = emb.as[(Long, Seq[Double])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = EventStreams.ivfIngestStream(
        ms.toDS().toDF("n_id", "cv"), ctrSeq)
      .writeStream.format("memory").queryName("ivfingest")
      .outputMode("complete").start()
    try {
      val shuffled = new scala.util.Random(41).shuffle(rows)
      shuffled.grouped(math.max(1, shuffled.size / 3)).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("ivfingest")
        .as[(Long, Long)].collect().toMap
      assert(streamed == batchCounts)
      assert(streamed.size > 1, "fixture should spread across cells")
    } finally q.stop()
    graft.Checkpoints.releaseAll(spark)
  }

  test("cdcChunkStream after shuffled batches equals the batch chunk " +
       "frequency table, and its dup slice carries q166's copy counts") {
    implicit val ctx = spark.sqlContext
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[EventStreams.DocText].collect().toSeq
    val batch = corpus.toDF()
      .select(explode(graft.operators.Dedup
        .cdcChunkArray($"text", 16)).as("c"))
      .groupBy($"c.chunk_text", $"c.n_tokens")
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    val ms = MemoryStream[EventStreams.DocText]
    val q = EventStreams.cdcChunkStream(ms.toDS())
      .writeStream.format("memory").queryName("cdcchunks")
      .outputMode("complete").start()
    try {
      val shuffled = new scala.util.Random(29).shuffle(corpus)
      shuffled.grouped(math.max(1, shuffled.size / 3)).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("cdcchunks")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch)
      // the live dup slice agrees with the oracle-gated q166 copies
      val q166 = SparkEntry.queries("q166_cdc_chunks")(
          spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      val M = 1000000007L
      def pv(t: String): Long =
        t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % M)
      val dupSlice = streamed.filter(r => r._3 >= 2 && r._2 >= 4)
        .map(r => pv(r._1) -> r._3).toMap
      assert(dupSlice == q166)
      assert(dupSlice.nonEmpty)
    } finally q.stop()
    graft.Checkpoints.releaseAll(spark)
  }

  test("packAccountingStream after shuffled batches equals the batch " +
       "per-(source, language) token accounting exactly") {
    implicit val ctx = spark.sqlContext
    import graft.functions.{Bpe, TextFns}
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"source", $"text")
      .as[EventStreams.DocSourced].collect().toSeq
    // batch reference: the same row-local extractions aggregated once
    val batch = corpus.toDF()
      .select($"source",
        TextFns.langId(TextFns.words(TextFns.norm($"text"))).as("lang_pred"),
        Bpe.tokenCount($"text").as("n_tokens"))
      .filter($"n_tokens" > 0)
      .groupBy($"source", $"lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"))
      .select($"source", $"lang_pred", $"n_docs", $"total_tokens",
        call_function("div", $"total_tokens" + 511L, lit(512L))
          .as("n_sequences"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    val ms = MemoryStream[EventStreams.DocSourced]
    val q = EventStreams.packAccountingStream(ms.toDS())
      .writeStream.format("memory").queryName("packacct")
      .outputMode("complete").start()
    try {
      val shuffled = new scala.util.Random(9).shuffle(corpus)
      shuffled.grouped(math.max(1, shuffled.size / 4)).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.table("packacct")
        .as[(String, String, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // the sequence arithmetic agrees with a real q139-style pack of
      // one (source, lang) group: ceil(total/512) is what concat-and-
      // cut produces
      val (src, lng, _, tot, nseq) = streamed.maxBy(_._4)
      val ids = corpus.toDF()
        .select($"doc_id", $"source",
          TextFns.langId(TextFns.words(TextFns.norm($"text")))
            .as("lang_pred"),
          Bpe.tokenCount($"text").as("n"))
        .filter($"n" > 0 && $"source" === src && $"lang_pred" === lng)
        .agg(sum($"n")).as[Long].head()
      assert(ids == tot && nseq == (tot + 511L) / 512L)
    } finally q.stop()
  }

  test("hllRegisterStream registers after shuffled batches AND a " +
       "redelivered batch equal the batch sketch exactly (max-merge " +
       "idempotence)") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Sketches
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
      .as[EventStreams.Event].collect().toSeq
    val batch = Sketches.hllRegisters(
        events.toDF()
          .select(unix_timestamp(
              window($"ts", "1 day").getField("start")).as("ws"),
            $"event_type", $"user_id".cast("string").as("k")),
        Seq("ws", "event_type"), col("k"))
      .as[(Long, String, Long, Int)].collect().toSet
    val ms = MemoryStream[EventStreams.Event]
    val q = EventStreams.hllRegisterStream(ms.toDS())
      .writeStream.format("memory").queryName("hllstream")
      .outputMode("complete").start()
    try {
      val shuffled = new scala.util.Random(7).shuffle(events)
      val batches = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // redeliver the first batch wholesale: additive sketches would
      // double-count; max-merge registers must not move
      ms.addData(batches.head: _*); q.processAllAvailable()
      val streamed = spark.table("hllstream")
        .as[(Long, String, Long, Int)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("heavyHitterCandidates shard summaries stay a superset of the " +
       "true heavies under shuffled batches, and the candidate recount " +
       "equals the batch q137 answer") {
    implicit val ctx = spark.sqlContext
    import graft.functions.TextFns
    val s = 150
    val words = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextFns.words(TextFns.norm($"text"))).as("w"))
      .as[String].collect().toSeq
    val n = words.size.toLong
    val thr = (n + 99L) / 100L // ceil(n/100) — q137's rational share
    val exactCounts = words.groupBy(identity).view.mapValues(_.size.toLong)
    val trueHeavy = exactCounts.filter(_._2 >= thr).toMap
    assert(trueHeavy.nonEmpty)
    val ms = MemoryStream[String]
    val q = EventStreams.heavyHitterCandidates(ms.toDS(), s)
      .writeStream.format("memory").queryName("hhstream")
      .outputMode("update").start()
    try {
      val shuffled = new scala.util.Random(17).shuffle(words)
      shuffled.grouped(math.max(1, shuffled.size / 4)).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      // final state per shard = the update with the largest n (n is
      // monotone per shard; the memory sink keeps every update)
      val finals = spark.table("hhstream")
        .as[(Int, Seq[String], Seq[Long], Long)].collect()
        .groupBy(_._1).map(_._2.maxBy(_._4)).toSeq
      assert(finals.map(_._4).sum == n, "shard counts cover the stream")
      assert(finals.forall(_._2.size <= s), "per-shard state bounded")
      val candidates = finals.flatMap(_._2).toSet
      assert(trueHeavy.keySet.subsetOf(candidates),
        s"lost heavies ${trueHeavy.keySet -- candidates}")
      // exact recount of candidates only — the q137 second pass —
      // reproduces the batch answer
      val recounted = candidates.toSeq
        .map(k => k -> exactCounts.getOrElse(k, 0L))
        .filter(_._2 >= thr).toMap
      assert(recounted == trueHeavy)
      // and the batch q137 pipeline agrees on the same corpus
      val batchQ = SparkEntry.queries("q137_heavy_hitters")(
          spark, "/root/testdata/sf0.001")
        .as[(String, Long)].collect().toMap
      assert(batchQ == trueHeavy)
    } finally q.stop()
  }

  test("kmvStream sketches after shuffled batches AND a redelivered " +
       "batch equal the batch KMV sketch exactly (min-k set " +
       "idempotence)") {
    implicit val ctx = spark.sqlContext
    import graft.operators.{Dedup, Sketches}
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = Sketches.kmvMinHashes(
        Dedup.docShingles(docsDf, "doc_id", "text", 5)
          .join(docsDf.select($"doc_id", $"source"), "doc_id")
          .select($"source", Sketches.mixedStringHash($"sh").as("h")),
        "source", col("h"), 64)
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val docs = docsDf.select($"doc_id", $"source", $"text")
      .as[EventStreams.DocSourced].collect().toSeq
    val ms = MemoryStream[EventStreams.DocSourced]
    val q = EventStreams.kmvStream(ms.toDS())
      .writeStream.format("memory").queryName("kmvstream")
      .outputMode("update").start()
    try {
      val shuffled = new scala.util.Random(11).shuffle(docs)
      val batches = shuffled.grouped(math.max(1, shuffled.size / 3)).toSeq
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // redeliver the first batch wholesale: a min-k SET insert is
      // idempotent, so the sketch must not move
      ms.addData(batches.head: _*); q.processAllAvailable()
      // final update per source = the row with the largest monotone
      // n_seen (the memory sink keeps every update)
      val streamed = spark.table("kmvstream")
        .as[(String, Long, Seq[Long])].collect().toSeq
        .groupBy(_._1).map { case (s, rows) =>
          s -> rows.maxBy(_._2)._3.sorted.toSeq }
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (s, hs) =>
        assert(hs == batch(s), s"source $s diverged") }
      assert(streamed.exists(_._2.size == 64), "no sketch reached k")
    } finally q.stop()
  }

  test("windowQuantiles streamed answers satisfy the declared rank-error " +
       "bound against exact per-window ranks (cross-batch, shuffled order)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // 2-day watermark: no event in the shuffled batches is ever late,
    // so the exact reference below sees exactly the streamed rows
    val q = EventStreams.windowQuantiles(ms.toDF(), watermark = "2 days")
      .writeStream.format("memory").queryName("wquant")
      .outputMode("append").start()
    try {
      val rnd = new scala.util.Random(11)
      val evs = rnd.shuffle((1 to 500).map { i =>
        val day = 1 + rnd.nextInt(2)
        ev(i.toLong,
          f"2024-01-0$day ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00",
          i % 7, v = rnd.nextInt(40000) / 100.0)
      })
      val (b1, b2) = evs.splitAt(250)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      // sentinel far past both windows + watermark → they close and emit
      ms.addData(ev(9999, "2024-01-10 00:00:00", 1))
      q.processAllAvailable()
      val got = spark.table("wquant")
        .select(unix_timestamp($"win_start"), $"qs", $"n")
        .as[(Long, Seq[Long], Long)].collect()
      assert(got.length == 2, s"expected both day windows closed: ${got.toSeq}")
      val agg = graft.functions.QDigestAgg(16, 4096, Seq(0.5, 0.9))
      got.foreach { case (ws, qs, n) =>
        val vs = evs.filter(e =>
            e.ts.getTime / 1000 >= ws && e.ts.getTime / 1000 < ws + 86400)
          .map(e => math.floor(e.value * 100).toLong).sorted
        assert(vs.length == n, s"window $ws row count")
        val w = math.ceil(agg.declaredEps * n).toLong
        Seq(0.5, 0.9).zipWithIndex.foreach { case (p, i) =>
          val tr = math.max(1L, math.ceil(p * n).toLong)
          val lo = vs((math.max(1L, tr - w) - 1).toInt)
          assert(qs(i) >= lo, s"window $ws p=$p: ${qs(i)} < $lo")
          if (tr + w + 1 <= n)
            assert(qs(i) <= vs((tr + w).toInt),
              s"window $ws p=$p: ${qs(i)} > ${vs((tr + w).toInt)}")
        }
      }
    } finally q.stop()
  }
}
