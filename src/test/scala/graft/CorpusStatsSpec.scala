package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural gates for the corpus-statistics queries the oracle's
  * hash-match cannot express on its own fixture: q158's PMI arithmetic
  * on a PLANTED collocation (the driver corpus is random text, lift
  * ~1.0 everywhere) and q159's share completeness. */
class CorpusStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q158 PMI: a planted always-adjacent pair is the only supported " +
       "bigram and carries the hand-computed lift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q158").toString
    // 6 docs "new york t<i>": bigrams = {new york} x6 + {york t<i>} x1
    // each -> only "new york" has support >= 5; N = 12 bigrams,
    // n_x(new as first) = 6, n_y(york as second) = 6,
    // lift = 6*12/(6*6) = 2.0
    val docs = (0 until 6).map(i =>
      (i.toLong, s"new york t$i", "en", "src0", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q158_pmi_collocations")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 1)
    val (bg, nXy, nX, nY, nTotal, lift) = rows.head
    assert(bg == "new york")
    assert((nXy, nX, nY, nTotal) == ((6L, 6L, 6L, 12L)))
    assert(lift == 2.0)
  }

  test("q162 equi-width buckets partition the cent range: counts " +
       "cover the table and observed bucket extremes respect the " +
       "bucket width") {
    val rows = SparkEntry.queries("q162_equiwidth_histogram")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val (lo, hi) = (rows.head._2, rows.head._3)
    val total = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(rows.map(_._4).sum == total, "bucket counts must cover orders")
    rows.foreach { case (b, l, h, _, _, bMin, bMax) =>
      assert(b >= 0L && b < 16L)
      assert((l, h) == ((lo, hi)), "inconsistent scalar bounds")
      val width = h - l + 1
      // observed extremes must map back into their own bucket
      assert((bMin - l) * 16 / width == b && (bMax - l) * 16 / width == b)
    }
  }

  test("q163 A/B moments are consistent and the z-score matches a " +
       "local recomputation") {
    val rows = SparkEntry.queries("q163_ab_test")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 1)
    val (na, ka, nb, kb, z) = rows.head
    assert(ka >= 0 && ka <= na && kb >= 0 && kb <= nb)
    assert(ka > 0 || kb > 0, "fixture should have some conversions")
    assert(ka < na || kb < nb, "fixture should have some non-converters")
    val p = (ka + kb).toDouble / (na + nb)
    val zRef = (ka.toDouble / na - kb.toDouble / nb) /
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(z - zRef) < 1e-3, s"z $z vs local $zRef")
  }

  test("q164 autocorrelation moments equal a local recomputation of " +
       "the daily dollar series at both lags") {
    val got = SparkEntry.queries("q164_autocorrelation")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 7L))
    val raw = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("unix_timestamp(o_orderdate) AS es",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .as[(Long, Long)].collect()
    val series: Map[Long, Long] = raw.groupBy(_._1 / 86400)
      .map { case (d, xs) => d -> xs.map(_._2).sum / 100 }
    Seq(1L, 7L).foreach { lag =>
      val pairs = series.toSeq.flatMap { case (d, x) =>
        series.get(d + lag).map(y => (x, y)) }
      val exp = (lag, pairs.length.toLong,
        pairs.map(_._1).sum, pairs.map(_._2).sum,
        pairs.map(p => p._1 * p._2).sum,
        pairs.map(p => p._1 * p._1).sum,
        pairs.map(p => p._2 * p._2).sum)
      assert(got(lag) == exp, s"lag $lag")
    }
  }

  test("q168 per-nation trend: slope rational derives exactly from " +
       "the emitted moments and every nation has a real series") {
    val rows = SparkEntry.queries("q168_group_trend")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(rows.length == 25)
    rows.foreach { case (_, n, sx, sy, sxy, sx2, num, den, slope) =>
      assert(n >= 12, "a nation with under a year of months")
      assert(num == n * sxy - sx * sy)
      assert(den == n * sx2 - sx * sx)
      assert(den > 0)
      // slope is the rounded rational (HALF_UP): within half an ulp
      // of the 4-decimal grid around num/den
      assert(math.abs(slope - num.toDouble / den.toDouble) <= 0.50001e-4)
    }
  }

  test("q169 trend decomposition equals a local recomputation of the " +
       "centered 7-day window") {
    val got = SparkEntry.queries("q169_trend_decomposition")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val raw = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("unix_timestamp(o_orderdate) AS es",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .as[(Long, Long)].collect()
    val series: Map[Long, Long] = raw.groupBy(_._1 / 86400)
      .map { case (d, xs) => d -> xs.map(_._2).sum / 100 }
    val exp = series.flatMap { case (d, x) =>
      val win = (-3L to 3L).flatMap(k => series.get(d + k))
      if (win.length == 7) Some(d -> ((x, win.sum, 7 * x - win.sum)))
      else None
    }
    assert(got == exp)
    assert(got.nonEmpty)
  }

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)])
      : String = {
    val dirPath = java.nio.file.Files.createTempDirectory("graft_ev")
    // sweep the fixture at JVM exit — specs used to leak one dir per run
    sys.addShutdownHook {
      val w = java.nio.file.Files.walk(dirPath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally w.close()
    }
    val dir = dirPath.toString
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q171 rolling 7-day actives on a planted calendar: windows " +
       "count exactly the users active in the prior week") {
    // u1 active day 0 and day 5, u2 active day 3; emitted days are
    // the active ones: day 0 → {u1}, day 3 → {u1(d0), u2}, day 5 →
    // {u1(d5), u2(d3)}
    val dir = writeEvents(Seq(
      (1L, 0L * 86400, 1L, "view", 1.0),
      (2L, 5L * 86400, 1L, "view", 1.0),
      (3L, 3L * 86400, 2L, "click", 1.0)))
    val got = SparkEntry.queries("q171_rolling_actives")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("q172 last-touch attribution credits the latest prior touch, " +
       "same-instant touches count, and untouched purchases go to " +
       "'none'") {
    val dir = writeEvents(Seq(
      (1L, 100L, 1L, "view", 0.0),
      (2L, 200L, 1L, "click", 0.0),
      (3L, 300L, 1L, "purchase", 2.0),   // latest touch = click@200
      (4L, 50L, 2L, "purchase", 1.0),    // no touch → none
      (5L, 500L, 3L, "view", 0.0),
      (6L, 500L, 3L, "purchase", 3.0)))  // same instant → view counts
    val got = SparkEntry.queries("q172_attribution")(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("click", 1L, 200L), ("none", 1L, 100L),
      ("view", 1L, 300L)))
  }

  test("q173 MAD outliers equal a local nearest-rank recomputation " +
       "per event type") {
    val got = SparkEntry.queries("q173_mad_outliers")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val raw = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id").isNotNull)
      .selectExpr("event_type", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS cents")
      .as[(String, Long, Long)].collect()
    def medianBy[A](xs: Seq[(Long, Long)]): Long = {
      // nearest-rank at ceil(n/2), ties by event_id — the engine's
      // exact ordering
      val sorted = xs.sortBy(x => (x._1, x._2))
      sorted(math.max(1, math.ceil(0.5 * sorted.length).toInt) - 1)._1
    }
    val byType = raw.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      val med = medianBy(rows.map(r => (r._3, r._2)).toSeq)
      val devs = rows.map(r => (math.abs(r._3 - med), r._2)).toSeq
      val mad = medianBy(devs)
      val out = devs.count(_._1 > 3 * mad)
      assert(got(t) == ((t, rows.length.toLong, med, mad, out.toLong)),
        s"type $t")
    }
  }

  test("q174 drift on a planted two-mode shift: full-strength " +
       "opposite deltas in the extreme bins") {
    val dir = writeEvents(
      (1L to 4L).map(i => (i, 0L, i, "view", 1.0)) ++
        (5L to 8L).map(i => (i, 20L * 86400, i, "view", 9.0)))
    val got = SparkEntry.queries("q174_dist_drift")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 4L, 0L, 4L, 4L, 16L),
      (7L, 0L, 4L, 4L, 4L, -16L)))
  }

  test("q176 association rules: moments are internally consistent and " +
       "every emitted rule passes the 1% support gate") {
    val rows = SparkEntry.queries("q176_copurchase_rules")(
        spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nab, na, nb, n, conf, lift) =>
      assert(a < b)
      assert(nab <= math.min(na, nb) && na <= n && nb <= n)
      assert(nab * 100 >= n, "support gate")
      assert(math.abs(conf - nab.toDouble / na) <= 0.50001e-4)
      assert(math.abs(lift - (nab * n).toDouble / (na * nb)) <= 0.50001e-4)
    }
  }

  test("q177 time-to-convert: forward as-of picks the NEXT purchase, " +
       "deadline and direction respected on a planted timeline") {
    val dir = writeEvents(Seq(
      (1L, 100L, 1L, "click", 0.0),
      (2L, 200L, 1L, "purchase", 1.0),   // converted, delay 100
      (3L, 100L, 2L, "click", 0.0),
      (4L, 3702L, 2L, "purchase", 1.0),  // 3602s later: too late
      (5L, 50L, 3L, "click", 0.0),       // no purchase at all
      (6L, 40L, 4L, "purchase", 1.0),
      (7L, 60L, 4L, "click", 0.0),       // purchase BEFORE the click
      (8L, 500L, 5L, "click", 0.0),
      (9L, 500L, 5L, "purchase", 1.0)))  // same instant: delay 0
    val got = SparkEntry.queries("q177_time_to_convert")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((5L, 2L, 100L)))
  }

  test("q181 funnel latency: per-stage counts and exact nearest-rank " +
       "median delays on a planted funnel") {
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view", 0.0), (2L, 10L, 1L, "click", 0.0),
      (3L, 30L, 1L, "purchase", 1.0),
      (4L, 0L, 2L, "view", 0.0), (5L, 50L, 2L, "click", 0.0),
      (6L, 0L, 3L, "view", 0.0)))
    val got = SparkEntry.queries("q181_funnel_latency")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // n=2 delays {10s, 50s} → nearest-rank median = rank ceil(1) = 10s
    assert(got == Set(
      ("view_to_click", 2L, 10000000L, 10000000L, 50000000L),
      ("click_to_purchase", 1L, 20000000L, 20000000L, 20000000L)))
  }

  test("q182 sketch calibration: full agreement rows carry exact " +
       "jaccard 1.0 and every moment respects the scaled bounds") {
    val rows = SparkEntry.queries("q182_sketch_calibration")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, n, sj, minj, maxj) =>
      assert(m >= 0 && m <= 32 && n >= 1)
      assert(minj >= 0 && maxj <= 10000 && minj <= maxj)
      assert(sj >= n * minj && sj <= n * maxj)
    }
    // calibration direction: the highest agreement level present
    // averages at least as high an exact jaccard as the lowest
    val hi = rows.maxBy(_._1); val lo = rows.minBy(_._1)
    assert(hi._3.toDouble / hi._2 >= lo._3.toDouble / lo._2)
    graft.Checkpoints.releaseAll(spark)

    // planted EXACT duplicates pin the top row: identical docs land
    // in the 32-agreement bucket with exact jaccard precisely 1.0
    val dir = java.nio.file.Files.createTempDirectory("graft_q182").toString
    val txt = (0 until 30).map(i => s"w$i").mkString(" ")
    Seq((1L, txt, "en", "s0", 0L), (2L, txt, "en", "s0", 0L),
      (3L, (0 until 30).map(i => s"z$i").mkString(" "), "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = SparkEntry.queries("q182_sketch_calibration")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(planted.toSeq == Seq((32L, 1L, 10000L, 10000L, 10000L)))
  }

  test("q184 quantile normalization maps a planted two-source corpus " +
       "onto hand-computed global values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q184").toString
    Seq((1L, "t", "en", "A", 10L), (2L, "t", "en", "A", 20L),
      (3L, "t", "en", "B", 10L), (4L, "t", "en", "B", 20L),
      (5L, "t", "en", "B", 30L), (6L, "t", "en", "B", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q184_quantile_normalize")(spark, dir)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // A (n=2): ranks 1,2 → global ranks 3,6 → values 20,40
    // B (n=4): ranks 1..4 → global ranks 2,3,5,6 → 10,20,30,40
    assert(got == Map(1L -> 20L, 2L -> 40L, 3L -> 10L, 4L -> 20L,
      5L -> 30L, 6L -> 40L))
  }

  test("q185 fertility: every (source, lang) row is internally " +
       "consistent and subwords never undercount words") {
    val rows = SparkEntry.queries("q185_tokenizer_fertility")(
        spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(rows.map(_._3).sum == total)
    rows.foreach { case (_, _, n, nw, nt, f) =>
      assert(n >= 1 && nw >= 1)
      assert(nt >= nw, "BPE merges never cross word boundaries")
      assert(math.abs(f - nt.toDouble / nw.toDouble) <= 0.50001e-4)
    }
  }

  test("q186 malformed census: the parser books exactly the corrupted " +
       "rows and sums only the valid keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q186").toString
    Seq((17L, 100L, 1L, "view", 0.0, """{"k": 5}"""),
      (1L, 200L, 1L, "view", 0.0, """{"k": 3}"""),
      (2L, 300L, 2L, "click", 0.0, """{"k": 4}"""))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q186_malformed_census")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    // event 17 (id % 17 = 0) is corrupted: counted malformed, its k
    // excluded from the valid sum
    assert(got == Set(("view", 2L, 1L, 3L), ("click", 1L, 0L, 4L)))
  }

  test("q159 weekday shares are complete: per type the dow counts sum " +
       "to the type total and indexes stay in [0, 6]") {
    val rows = SparkEntry.queries("q159_dow_seasonality")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0L && r._2 <= 6L), "dow out of range")
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val total = rs.head._4
      assert(rs.forall(_._4 == total), s"$tpe: inconsistent n_type")
      assert(rs.map(_._3).sum == total,
        s"$tpe: dow counts ${rs.map(_._3).sum} != total $total")
    }
  }

  test("q225 Markov attribution: hand-computed removal effects, with " +
       "purchase absorbing and restarting the journey") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q225").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: view→purchase; u2: view→(end); u3: click→purchase;
    // u4: purchase, then view→(end) — the purchase ABSORBS and the
    // view starts a NEW journey from _start (no purchase→view edge).
    // Matrix: _start→view 3, _start→click 1, _start→purchase 1,
    //         view→purchase 1, view→_end 2, click→purchase 1.
    val rows = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"), (2L, t(2), 1L, "purchase", 0.0, "{}"),
      (3L, t(1), 2L, "view", 0.0, "{}"),
      (4L, t(1), 3L, "click", 0.0, "{}"), (5L, t(2), 3L, "purchase", 0.0, "{}"),
      (6L, t(1), 4L, "purchase", 0.0, "{}"), (7L, t(2), 4L, "view", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q225_markov_attribution")(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // S=1e9: p(view)=S//3, p(click)=S;
    // p_full(_start) = (3*(S//3) + S + S)//5 = 599999999
    // remove view:  (0 + S + S)//5          = 400000000
    // remove click: (3*(S//3) + 0 + S)//5   = 399999999
    assert(got.keySet == Set("view", "click"), s"channels ${got.keySet}")
    assert(got("view") == (("view", 599999999L, 400000000L, 199999999L)),
      s"view: ${got("view")}")
    assert(got("click") == (("click", 599999999L, 399999999L, 200000000L)),
      s"click: ${got("click")}")
    graft.Checkpoints.releaseAll(spark)
  }

  /** Orders of the sf0.001 fixture, as (custkey, epochDay, cents) with
    * the q162 exact-cents rule (DECIMAL(18,2) HALF_UP before ×100). */
  private lazy val sfOrders: Seq[(Long, Long, Long)] = {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").cast("long"),
        col("o_orderdate").cast("date"), col("o_totalprice"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
  }

  test("q229 RFM equals the local quartile replay, and each metric's " +
       "quartiles are balanced") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q229_rfm_segments")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val byCust = sfOrders.groupBy(_._1)
    val n = byCust.size
    def scores(ranked: Seq[Long]): Map[Long, Long] =
      ranked.zipWithIndex.map { case (c, i) => c -> (4L - i.toLong * 4 / n) }
        .toMap
    val r = scores(byCust.toSeq
      .sortBy { case (c, os) => (-os.map(_._2).max, c) }.map(_._1))
    val f = scores(byCust.toSeq
      .sortBy { case (c, os) => (-os.size.toLong, c) }.map(_._1))
    val m = scores(byCust.toSeq
      .sortBy { case (c, os) => (-os.map(_._3).sum, c) }.map(_._1))
    byCust.keys.foreach { c =>
      assert(got(c) == ((r(c), f(c), m(c), r(c) * 100 + f(c) * 10 + m(c))),
        s"cust $c: ${got(c)}")
    }
    // quartile balance: each score bucket holds n/4 or n/4+1 customers
    Seq(r, f, m).foreach { sc =>
      val sizes = sc.values.groupBy(identity).values.map(_.size)
      assert(sizes.forall(s => s == n / 4 || s == n / 4 + 1))
    }
  }

  test("q230/q231 Lorenz deciles and Gini equal the local sorted " +
       "replay, cumulative shares are monotone and end at 10000") {
    val d = "/root/testdata/sf0.001"
    val rev = sfOrders.groupBy(_._1).toSeq
      .map { case (c, os) => (c, os.map(_._3).sum) }
      .sortBy { case (c, v) => (v, c) }
    val n = rev.size
    val total = rev.map(_._2).sum
    val lorenz = SparkEntry.queries("q230_lorenz_deciles")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val expDec = rev.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n + 1 }
    assert(lorenz.map(_._1).toSeq == (1L to 10L))
    var cum = 0L
    (1L to 10L).foreach { dd =>
      val rows = expDec(dd)
      cum += rows.map(_._1._2).sum
      val got = lorenz(dd.toInt - 1)
      assert(got == ((dd, rows.size.toLong, rows.map(_._1._2).sum, cum,
        cum * 10000 / total)), s"decile $dd: $got")
    }
    assert(lorenz.map(_._5).toSeq == lorenz.map(_._5).toSeq.sorted)
    assert(lorenz.last._5 == 10000L)
    val gini = SparkEntry.queries("q231_revenue_gini")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    val gnum = rev.zipWithIndex
      .map { case ((_, v), i) => (2L * (i + 1) - n - 1) * BigInt(v) }.sum
    assert(gini == ((n.toLong, total, gnum.toLong,
      (gnum * 10000 / (BigInt(n) * total)).toLong)), s"gini $gini")
    assert(gini._4 >= 0 && gini._4 < 10000)
  }

  test("q232 CUSUM telescopes to zero on the last day and flags the " +
       "locally-computed argmax deviation") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q232_cusum_changepoint")(spark, d)
      .select(col("o_orderdate").cast("date"), col("rev_cents"),
        col("snx"), col("at_peak"))
      .as[(java.sql.Date, Long, Long, Long)].collect()
      .sortBy(_._1.toLocalDate.toEpochDay)
    val daily = sfOrders.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, os) => os.map(_._3).sum }
    val n = daily.size
    val total = daily.sum
    val snx = daily.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (cum, i) => n * cum - (i + 1L) * total }
    assert(got.length == n)
    assert(got.map(_._3).toSeq == snx)
    assert(got.last._3 == 0L, "S_n must telescope to exactly zero")
    val mx = snx.map(math.abs).max
    got.zip(snx).foreach { case (row, s) =>
      assert(row._4 == (if (math.abs(s) == mx) 1L else 0L))
    }
    assert(got.map(_._4).sum >= 1L)
  }

  test("q233 Benford census: digit shares sum to the corpus and match " +
       "the local leading-digit replay") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q233_benford_census")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val prices = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_totalprice")).as[Double].collect()
    val digits = prices.map(p => p.toLong.toString.head.asDigit.toLong)
    val n = digits.length.toLong
    assert(got.values.map(_._2).sum == n)
    digits.groupBy(identity).foreach { case (dig, ds) =>
      val row = got(dig)
      assert(row._2 == ds.length.toLong && row._3 == ds.length * 10000L / n,
        s"digit $dig: $row")
      assert(row._5 == math.abs(row._3 - row._4))
    }
    assert(got.keySet.forall(k => k >= 1 && k <= 9))
  }

  test("q247 exact AUC equals the brute-force pairwise definition " +
       "2U = sum of 2*[c>v] + [c=v]") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q247_exact_auc")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    val ev = graft.sources.Tables.events(spark, d)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val clicks = ev.filter(_._1 == "click").map(_._2)
    val views = ev.filter(_._1 == "view").map(_._2)
    val u2 = (for (c <- clicks; v <- views) yield
      if (c > v) 2L else if (c == v) 1L else 0L).sum
    assert(got == ((clicks.length.toLong, views.length.toLong, u2,
      u2 * 10000 / (2L * clicks.length * views.length))), s"$got")
    assert(got._4 >= 0 && got._4 <= 10000)
  }

  test("q248 lift curve: capture is monotone to 10000 and the top " +
       "decile matches the local score ranking") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q248_lift_curve")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 10L))
    val captures = got.map(_._6).toSeq
    assert(captures == captures.sorted && captures.last == 10000L)
    assert(got.last._7 == 10000L, "full-population lift must be 1.0")
    // local replay of the full table
    val us = graft.sources.Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .as[(Long, Long, Long)].collect()
    val n = us.length
    val totalConv = us.map(_._3).sum
    val ranked = us.sortBy(u => (-u._2, u._1))
    val byDec = ranked.zipWithIndex.groupBy { case (_, i) => i.toLong * 10 / n + 1 }
    var (cu, cc) = (0L, 0L)
    (1L to 10L).foreach { dd =>
      val rows = byDec(dd)
      cu += rows.size; cc += rows.map(_._1._3).sum
      val g = got(dd.toInt - 1)
      assert(g == ((dd, rows.size.toLong, rows.map(_._1._3).sum, cu, cc,
        cc * 10000 / totalConv, cc * n * 10000 / (cu * totalConv))),
        s"decile $dd: $g")
    }
  }

  test("q245 dedup savings ledger reconciles exactly with the q202 " +
       "cluster verdicts and local token counts") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q245_dedup_savings")(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val kept = SparkEntry.queries("q202_neardup_keeper")(spark, d)
      .select(col("doc_id"), col("kept")).as[(Long, Long)].collect().toMap
    val toks = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.words(
          graft.functions.TextFns.norm(col("text")))).cast("long"))
      .as[(Long, String, Long)].collect()
    toks.groupBy(_._2).foreach { case (src, ds) =>
      val tot = ds.map(_._3).sum
      val keptToks = ds.map(t => t._3 * kept.getOrElse(t._1, 1L)).sum
      val nKept = ds.map(t => kept.getOrElse(t._1, 1L)).sum
      assert(got(src) == ((src, ds.size.toLong, nKept, tot, keptToks,
        (tot - keptToks) * 10000 / tot)), s"$src: ${got(src)}")
      assert(nKept <= ds.size && keptToks <= tot)
    }
    graft.Checkpoints.releaseAll(spark)
  }

  test("q246 exact KS statistic equals the local sup-norm replay and " +
       "stays in [0, 10000]") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q246_ks_drift")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    val ev = graft.sources.Tables.events(spark, d)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val clicks = ev.filter(_._1 == "click").map(_._2).sorted
    val views = ev.filter(_._1 == "view").map(_._2).sorted
    val (n1, n2) = (clicks.length.toLong, views.length.toLong)
    val dNum = (clicks ++ views).distinct.map { x =>
      math.abs(clicks.count(_ <= x) * n2 - views.count(_ <= x) * n1)
    }.max
    assert(got == ((n1, n2, dNum, dNum * 10000 / (n1 * n2))), s"$got")
    assert(got._4 >= 0 && got._4 <= 10000)
  }

  test("q243 skew audit equals the local top-10 replay with exact " +
       "share and skew ratios") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q243_skew_audit")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    val keys = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_suppkey").cast("long")).as[Long].collect()
    val cnts = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nKeys, nRows) = (cnts.size.toLong, keys.length.toLong)
    val top = cnts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(got.map(_._1).toSeq == (1L to 10L))
    got.zip(top).foreach { case (g, (k, c)) =>
      assert(g == ((g._1, k, c, c * 10000 / nRows,
        c * nKeys * 10000 / nRows, nKeys, nRows)), s"rank ${g._1}: $g")
    }
    // ranks are count-ordered
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
  }

  test("q244 longest streak equals the local consecutive-run replay " +
       "and never exceeds the active-day count") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q244_longest_streak")(spark, d)
      .select(col("user_id"), col("streak_len"), col("streak_start"),
        col("n_active_days"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val days = graft.sources.Tables.events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(Long, Long)].collect().toSeq.distinct
    days.groupBy(_._1).foreach { case (u, rs) =>
      val ds = rs.map(_._2).sorted
      // split into consecutive runs
      val runs = ds.foldLeft(List.empty[(Long, Long)]) {
        case ((start, last) :: tail, d0) if d0 == last + 1 =>
          (start, d0) :: tail
        case (acc, d0) => (d0, d0) :: acc
      }.map { case (st, en) => (en - st + 1, st) }
      val best = runs.sortBy { case (len, st) => (-len, st) }.head
      assert(got(u) == ((u, best._1, best._2, ds.size.toLong)),
        s"user $u: ${got(u)} vs $best")
      assert(got(u)._2 <= got(u)._4)
    }
  }

  test("q240 burstiness equals the local Fano replay and the " +
       "dispersion numerator is never negative") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q240_user_burstiness")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val days = graft.sources.Tables.events(spark, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(Long, Long)].collect()
    days.groupBy(_._1).foreach { case (u, rs) =>
      val cs = rs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val (n, tot, s2) = (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
      val num = n * s2 - tot * tot
      assert(num >= 0, s"user $u dispersion numerator $num")
      assert(got(u) == ((u, n, tot, s2, num * 10000 / (n * tot))),
        s"user $u: ${got(u)}")
    }
  }

  test("q241 CLV cohorts: age-0 activity equals the cohort size and " +
       "the terminal cumulative revenue covers the cohort's total spend") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q241_clv_cohorts")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val byCust = sfOrders.groupBy(_._1)
    val yearOf = (epochDay: Long) =>
      java.time.LocalDate.ofEpochDay(epochDay).getYear.toLong
    val cohortOf = byCust.view.mapValues(os => os.map(o => yearOf(o._2)).min)
    val cohSize = cohortOf.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    got.groupBy(_._1).foreach { case (cy, rows) =>
      val age0 = rows.find(_._2 == 0L).get
      // every cohort member places an order in its cohort year
      assert(age0._3 == cohSize(cy) && age0._4 == cohSize(cy),
        s"cohort $cy age-0 $age0")
      val cum = rows.maxBy(_._2)._6
      val cohTotal = byCust.collect {
        case (c, os) if cohortOf(c) == cy => os.map(_._3).sum
      }.sum
      assert(cum == cohTotal, s"cohort $cy cum $cum != $cohTotal")
      assert(rows.maxBy(_._2)._7 == cohTotal / cohSize(cy))
      // cumulative revenue is monotone in age
      val byAge = rows.sortBy(_._2).map(_._6).toSeq
      assert(byAge == byAge.sorted)
    }
  }

  test("q238 HHI equals the local share-square replay and respects the " +
       "1/n..1 concentration bounds") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q238_market_hhi")(spark, d)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_suppkey").cast("long"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
    val sup = spark.read.parquet(s"$d/supplier.parquet")
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .as[(Long, Long)].collect().toMap
    val nat = spark.read.parquet(s"$d/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].collect().toMap
    val byNation = li.groupBy(_._1).toSeq
      .map { case (sk, ls) => (nat(sup(sk)), ls.map(_._2).sum) }
      .groupBy(_._1)
    assert(got.keySet == byNation.keySet)
    byNation.foreach { case (name, rs) =>
      val tot = rs.map(_._2).sum
      val sq = rs.map(r => BigInt(r._2) * r._2).sum
      val hhi = (sq * 100000000 / (BigInt(tot) * tot)).toLong
      assert(got(name) == ((name, rs.size.toLong, tot, hhi)),
        s"$name: ${got(name)}")
      assert(hhi <= 100000000L && hhi + 1 >= 100000000L / rs.size,
        s"$name hhi $hhi outside [1e8/n, 1e8]")
    }
  }

  test("q239 Spearman equals the local rank replay and rho stays in " +
       "[-10000, 10000]") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q239_rank_correlation")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    val byCust = sfOrders.groupBy(_._1)
    val n = byCust.size
    def ranks(key: Long => Long): Map[Long, Long] =
      byCust.keys.toSeq.sortBy(c => (-key(c), c)).zipWithIndex
        .map { case (c, i) => c -> (i + 1L) }.toMap
    val f = ranks(c => byCust(c).size.toLong)
    val m = ranks(c => byCust(c).map(_._3).sum)
    val ds = byCust.keys.toSeq.map(c => f(c) - m(c))
    val sumD2 = ds.map(x => x * x).sum
    val rho = 10000L - sumD2 * 60000L / (n.toLong * (n.toLong * n - 1))
    assert(got == ((n.toLong, sumD2, ds.map(math.abs).sum, rho)), s"$got")
    assert(got._4 >= -10000L && got._4 <= 10000L)
  }

  test("q228 Shapley attribution equals brute-force enumeration over " +
       "all k! channel orderings, and the efficiency identity holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q228").toString
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // channels present: click, error, view (k = 3). Converted users:
    // u1 {view,click}, u3 {click}, u4 {} (purchase only); u2/u5 touch
    // channels but never convert, so they contribute to NO coalition.
    val rows = Seq(
      (1L, t(1), 1L, "view", 0.0, "{}"), (2L, t(2), 1L, "click", 0.0, "{}"),
      (3L, t(3), 1L, "purchase", 0.0, "{}"),
      (4L, t(1), 2L, "view", 0.0, "{}"), (5L, t(2), 2L, "error", 0.0, "{}"),
      (6L, t(1), 3L, "click", 0.0, "{}"), (7L, t(2), 3L, "purchase", 0.0, "{}"),
      (8L, t(1), 4L, "purchase", 0.0, "{}"),
      (9L, t(1), 5L, "error", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q228_shapley_attribution")(spark, dir)
      .as[(String, Long)].collect().toMap

    // brute force straight from the fixture rows
    val channels = rows.map(_._4).filter(_ != "purchase").distinct.sorted
    val k = channels.length
    val byUser = rows.groupBy(_._3)
    val convMasks = byUser.values.toSeq
      .filter(_.exists(_._4 == "purchase"))
      .map(_.map(_._4).filter(_ != "purchase").toSet)
    def v(coal: Set[String]): Long =
      convMasks.count(_.subsetOf(coal)).toLong
    val brute = channels.map { c =>
      c -> channels.permutations.map { perm =>
        val before = perm.takeWhile(_ != c).toSet
        v(before + c) - v(before)
      }.sum
    }.toMap
    assert(got == brute, s"got $got brute $brute")
    assert(got.values.sum ==
      (1 to k).product.toLong * (v(channels.toSet) - v(Set.empty)),
      "efficiency: sum of Shapley values != k!*(v(full)-v(empty))")
    graft.Checkpoints.releaseAll(spark)
  }

  test("q226 subsequence DP equals O(n^3) brute-force triple counting " +
       "on random sequences") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q226").toString
    val types = Array("view", "click", "purchase", "error", "signup")
    val rnd = new scala.util.Random(7)
    // 4 users × 30 events of random types, random-but-distinct times
    val rows = for (u <- 1L to 4L; i <- 0 until 30) yield
      (u * 100 + i, new java.sql.Timestamp(1700000000000L + u * 1000000 +
        i * 1000), u, types(rnd.nextInt(types.length)), 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q226_subsequence_count")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    // brute force: enumerate every index triple i < j < k
    val byUser = rows.groupBy(_._3)
    byUser.foreach { case (u, evs) =>
      val seq = evs.sortBy(_._1).map(_._4).toIndexedSeq
      val brute = (for {
        i <- seq.indices; j <- (i + 1) until seq.size
        k <- (j + 1) until seq.size
        if seq(i) == "view" && seq(j) == "click" && seq(k) == "purchase"
      } yield 1).size.toLong
      assert(got(u) == brute, s"user $u: DP ${got(u)} != brute $brute")
    }
    graft.Checkpoints.releaseAll(spark)
  }

  test("q218 TextRank: a hub word outranks equally-frequent words, and " +
       "repeating a pair adds no rank (edges dedup)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q218").toString
    // hub graph: a-b, a-c, a-d (three docs) + an isolated pair x-y
    // whose adjacency REPEATS 3 times inside one doc — TextRank must
    // rank the hub 'a' first, and the repetition must not lift x/y
    // above b/c/d's class (the deduped edge x-y carries no more weight
    // than a-b). tf would rank x,y (3 occurrences) over a (3).
    val docs = Seq(
      (0L, "a b", "en", "src0", 0L),
      (1L, "a c", "en", "src0", 0L),
      (2L, "a d", "en", "src0", 0L),
      (3L, "x y x y x y", "en", "src0", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q218_textrank_keywords")(spark, dir)
      .as[(String, Long)].collect()
    val rank = rows.toMap
    assert(rows.head._1 == "a", s"hub not top: ${rows.toList}")
    assert(rank("x") == rank("y"), "symmetric pair must tie")
    // within x-y the repetition added nothing: x scores exactly like a
    // degree-1 leaf of a 2-vertex component, strictly below the hub
    assert(rank("a") > rank("x"))
    // leaves b, c, d are symmetric
    assert(rank("b") == rank("c") && rank("c") == rank("d"))
  }
}
