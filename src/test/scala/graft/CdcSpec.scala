package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cdc, Profile}

class CdcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "s", "v")

  private def changes = Seq(
    // k=1: two updates — the later one must win
    (1L, "a1", 11.0, 1L, "U"), (1L, "a2", 12.0, 2L, "U"),
    // k=2: update then delete — delete-over-update drops the key
    (2L, "b1", 21.0, 1L, "U"), (2L, "b1", 21.0, 2L, "D"),
    // k=4: pure insert (no base row)
    (4L, "d", 40.0, 1L, "I"))
    .toDF("k", "s", "v", "seq", "op")

  test("snapshot applies latest-wins with deletes and inserts") {
    val got = Cdc.snapshot(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "a2", 12.0),  // latest update
      (3L, "c", 30.0),   // untouched base
      (4L, "d", 40.0)))  // insert; k=2 deleted
  }

  test("snapshotDiff censuses added/removed/changed/same with " +
       "per-column change counts") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((2L, "b", 20.0), (3L, "X", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = Cdc.snapshotDiff(before, after, Seq("k"), Seq("s", "v"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    // (n_before, n_after, n_added, n_removed, n_changed, n_same,
    //  chg_s, chg_v)
    assert(got.toSeq == Seq((3L, 3L, 1L, 1L, 1L, 1L, 1L, 0L)))
  }

  test("snapshotDiff equals a brute-force local diff on random " +
       "before/after tables, including null column values") {
    val rnd = new scala.util.Random(17)
    (0 until 3).foreach { _ =>
      def randRows(keys: Range): Seq[(Long, Option[String], Double)] =
        keys.map(k => (k.toLong,
          if (rnd.nextInt(5) == 0) None
          else Some(Seq("a", "b", "c")(rnd.nextInt(3))),
          rnd.nextInt(4).toDouble))
      val before = randRows(0 until 30)
      // after: drop some keys, add some, mutate some
      val after = randRows(10 until 40)
      val bDf = before.toDF("k", "s", "v")
      val aDf = after.toDF("k", "s", "v")
      val got = Cdc.snapshotDiff(bDf, aDf, Seq("k"), Seq("s", "v"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().head
      val bm = before.map(r => r._1 -> (r._2, r._3)).toMap
      val am = after.map(r => r._1 -> (r._2, r._3)).toMap
      val both = bm.keySet & am.keySet
      val changed = both.count(k => bm(k) != am(k))
      val chgS = both.count(k => bm(k)._1 != am(k)._1)
      val chgV = both.count(k => bm(k)._2 != am(k)._2)
      assert(got == ((bm.size.toLong, am.size.toLong,
        (am.keySet -- bm.keySet).size.toLong,
        (bm.keySet -- am.keySet).size.toLong,
        changed.toLong, (both.size - changed).toLong,
        chgS.toLong, chgV.toLong)))
    }
  }

  test("history stamps [valid_from, valid_to) and closes versions on delete") {
    val got = Cdc.history(base, changes, Seq("k"), "seq", "op")
      .select(col("k"), col("s"), col("valid_from"), col("valid_to"))
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, "a", -1L, Some(1L)), (1L, "a1", 1L, Some(2L)), (1L, "a2", 2L, None),
      (2L, "b", -1L, Some(1L)), (2L, "b1", 1L, Some(2L)), // closed by the delete
      (3L, "c", -1L, None),
      (4L, "d", 1L, None)))
  }

  test("cdcUpsertStream converges to batch snapshot under SHUFFLED cross-batch arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.{Change, Upsert}
    implicit val ctx = spark.sqlContext
    // the exact CdcSpec fixture as a changelog: base rows at seq -1
    val log = Seq(
      Change(1L, "a", 10.0, -1L, "I"), Change(2L, "b", 20.0, -1L, "I"),
      Change(3L, "c", 30.0, -1L, "I"),
      Change(1L, "a1", 11.0, 1L, "U"), Change(1L, "a2", 12.0, 2L, "U"),
      Change(2L, "b1", 21.0, 1L, "U"), Change(2L, "b1", 21.0, 2L, "D"),
      Change(4L, "d", 40.0, 1L, "I"))
    val ms = MemoryStream[Change]
    val q = EventStreams.cdcUpsertStream(ms.toDS())
      .writeStream.format("memory").queryName("upserts")
      .outputMode("update").start()
    try {
      // deliberately adversarial order: the winning delete FIRST, base
      // rows last, the stale a1 after the winning a2 — and a duplicate
      ms.addData(log(6), log(4)); q.processAllAvailable() // D@2, a2@2
      ms.addData(log(3), log(7), log(6)); q.processAllAvailable() // stale a1, insert, dup D
      ms.addData(log(0), log(1), log(2), log(5)); q.processAllAvailable() // base + stale b1
      val finalState = spark.table("upserts").as[Upsert].collect()
        .groupBy(_.k).map { case (k, rows) => rows.maxBy(_.seq) }
        .filter(_.live).map(u => (u.k, u.payload, u.v)).toSet
      val batch = Cdc.snapshot(base, changes, Seq("k"), "seq", "op")
        .as[(Long, String, Double)].collect().toSet
      assert(finalState == batch,
        s"stream $finalState diverged from batch $batch")
    } finally q.stop()
  }

  test("profile covers nulls, constant columns, and histogram edges") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (0.0, 5.0), (1.0, 5.0), (2.0, 5.0), (8.0, 5.0), (null, 5.0))
      .toDF("x", "c")
    val got = Profile.profile(df, Seq("x", "c"), buckets = 4)
      .as[(String, String, Double)].collect()
      .map { case (c, s, v) => (c, s) -> v }.toMap
    assert(got(("x", "n")) == 4.0 && got(("x", "nulls")) == 1.0)
    assert(got(("x", "ndv")) == 4.0)
    assert(got(("x", "min")) == 0.0 && got(("x", "max")) == 8.0)
    // width 2: 0,1 -> b0; 2 -> b1; 8 (== max) clamps into the last bucket
    assert(got(("x", "b0")) == 2.0 && got(("x", "b1")) == 1.0 &&
      got(("x", "b3")) == 1.0 && !got.contains(("x", "b2")))
    // constant column: every value lands in b0, no NaN bucket
    assert(got(("c", "b0")) == 5.0 && got(("c", "ndv")) == 1.0)
  }
}
