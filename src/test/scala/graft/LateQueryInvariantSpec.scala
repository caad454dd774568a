package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CoreQueries, GraphQueries, SimQueries, TextQueries}

/** Structural invariants of the r13 late additions (q258–q262) that the
  * row-level oracle can't express — conservation laws and definitional
  * consistency on the real fixtures. */
class LateQueryInvariantSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q259 apportionment conserves the budget exactly and respects quotas") {
    val rows = CoreQueries.defs("q259_sample_allocation")(spark, dir)
      .select(col("n_base"), col("n_alloc")).as[(Long, Long)].collect()
    // largest-remainder: Σ n_alloc = B exactly, and every stratum gets
    // its base quota with at most one remainder seat on top
    assert(rows.map(_._2).sum == 1000L)
    assert(rows.forall { case (b, a) => a == b || a == b + 1 })
    Checkpoints.releaseAll(spark)
  }

  test("q260 attributes only orders truly inside a conference span") {
    // re-verify the bucketized interval join against the raw predicate
    val out = GraphQueries.defs("q260_conference_orders")(spark, dir)
      .agg(sum(col("n_orders"))).first.getLong(0)
    val epoch = lit("1970-01-01")
    val conf = graft.schema.MagTables.conferenceInstances(spark,
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          "graft_magaux_sf0.001").toString)
      .select(col("id"), datediff(col("startDate"), epoch).as("s"),
        datediff(col("endDate"), epoch).as("e"))
    val brute = graft.sources.Tables.orders(spark, dir)
      .select(datediff(col("o_orderdate"), epoch).as("d"))
      .join(conf, col("d") >= col("s") && col("d") <= col("e"))
      .count()
    assert(out == brute)
    Checkpoints.releaseAll(spark)
  }

  test("q261 screens every eval vector and verdicts match the threshold") {
    val rows = SimQueries.defs("q261_semantic_contamination")(spark, dir)
      .select(col("q_id"), col("cos_x10k"), col("contaminated"))
      .as[(Long, Long, Long)].collect()
    val nEval = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 20 === 0).count()
    assert(rows.length.toLong == nEval) // nothing silently dropped
    assert(rows.forall { case (_, c, f) => (c >= 8000) == (f == 1L) })
    Checkpoints.releaseAll(spark)
  }

  test("q262 fertility is >= 1 token per word in every language") {
    // the regex tokenizer never merges across whitespace, so each word
    // yields at least one token: fertility_x10k >= 10000 structurally
    val rows = TextQueries.defs("q262_token_fertility")(spark, dir)
      .select(col("fertility_x10k")).as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ >= 10000L))
    Checkpoints.releaseAll(spark)
  }

  test("q266 quartiles partition each nation near-evenly and the " +
       "distribution stats are monotone") {
    val rows = CoreQueries.defs("q266_revenue_quartiles")(spark, dir)
      .select(col("n_name"), col("quartile"), col("pct_rank"), col("cume"))
      .as[(String, Long, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (nation, rs) =>
      // ntile: bucket sizes differ by at most 1
      val sizes = rs.groupBy(_._2).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$nation ntile sizes $sizes")
      // distribution stats live in [0, 1]; cume reaches exactly 1
      assert(rs.forall(r => r._3 >= 0 && r._3 <= 1 && r._4 > 0 && r._4 <= 1))
      assert(rs.map(_._4).max == 1.0, nation)
    }
    Checkpoints.releaseAll(spark)
  }

  test("q267 split census: exactly one best split, purity score in " +
       "range, monotone left counts") {
    val rows = CoreQueries.defs("q267_decision_stump")(spark, dir)
      .select(col("bin"), col("n_left"), col("n_right"), col("score_x6"),
        col("is_best"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._5).sum == 1L) // one argmax
    // purity mass S ∈ (half the split mass, N]: each side contributes
    // at least n/2 (binary labels) and at most n — so N/2·10⁶ ≤
    // score_x6 ≤ N·10⁶ structurally
    val n = rows.head._2 + rows.head._3 // n_left + n_right = N, any row
    assert(rows.forall(r => r._4 >= n * 500000L && r._4 <= n * 1000000L),
      s"score out of [N/2, N]·1e6 for N=$n")
    val best = rows.filter(_._5 == 1L).head
    assert(rows.forall(r => r._4 < best._4 ||
      (r._4 == best._4 && r._1 >= best._1)))
    // zip-with-tail, not sliding(2): a single-row census would hand
    // sliding a length-1 window and MatchError instead of passing
    assert(rows.zip(rows.drop(1)).forall { case (a, b) => a._2 < b._2 })
    Checkpoints.releaseAll(spark)
  }

  test("q268 holdout eval: confusion census covers the whole holdout " +
       "and F1 sits between precision and recall") {
    val r = CoreQueries.defs("q268_stump_eval")(spark, dir)
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision_x10k"), col("recall_x10k"), col("f1_x10k"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val holdout = graft.sources.Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 1).count()
    assert(r._1 + r._2 + r._3 + r._4 == holdout)
    // harmonic mean lies between its arguments (±1 for the floordiv)
    val (p, rec, f1) = (r._5, r._6, r._7)
    assert(f1 >= math.min(p, rec) - 1 && f1 <= math.max(p, rec) + 1,
      s"p=$p r=$rec f1=$f1")
    Checkpoints.releaseAll(spark)
  }

  test("q270 PR curve: positives conserve per threshold, recall is " +
       "monotone, and the loosest threshold recalls everything") {
    val rows = CoreQueries.defs("q270_pr_curve")(spark, dir)
      .select(col("threshold_bin"), col("tp"), col("fp"), col("fn"),
        col("recall_x10k"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val p = rows.head._2 + rows.head._4 // tp + fn, any row
    assert(rows.forall(r => r._2 + r._4 == p))
    // raising the threshold can only shed predicted positives
    // (zip-with-tail — sliding(2) would MatchError on a 1-bin census)
    assert(rows.zip(rows.drop(1)).forall { case (a, b) =>
      b._2 <= a._2 && b._2 + b._3 <= a._2 + a._3 })
    assert(rows.head._5 == 10000L) // bin 0 predicts everything positive
    Checkpoints.releaseAll(spark)
  }

  test("q271 kappa: census covers the corpus, kappa never exceeds " +
       "accuracy, and the fixed point matches BigInt") {
    val r = CoreQueries.defs("q271_rater_kappa")(spark, dir)
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        col("accuracy_x10k"), col("kappa_x6"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val nOrders = graft.sources.Tables.orders(spark, dir).count()
    assert(r._1 + r._2 + r._3 + r._4 == nOrders)
    val (tp, fp, fn, tn) = (BigInt(r._1), BigInt(r._2), BigInt(r._3),
      BigInt(r._4))
    val nn = tp + fp + fn + tn
    val pe = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    val num = nn * (tp + tn) - pe
    val den = (nn * nn - pe).max(BigInt(1)) // floored at 1, as the query
    assert(BigInt(r._6) == num.abs * 1000000 / den * num.signum)
    // kappa = (po−pe')/(1−pe') ≤ po: chance correction only shrinks
    assert(r._6 <= r._5 * 100 + 1)
    Checkpoints.releaseAll(spark)
  }

  test("q272 McNemar: paired census covers the corpus, accuracy deltas " +
       "live in the discordant cells, fixed point matches BigInt") {
    val r = CoreQueries.defs("q272_mcnemar_compare")(spark, dir)
      .select(col("both_right"), col("b"), col("c"), col("both_wrong"),
        col("acc_a_x10k"), col("acc_b_x10k"), col("mcnemar_x6"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val nOrders = graft.sources.Tables.orders(spark, dir).count()
    assert(r._1 + r._2 + r._3 + r._4 == nOrders)
    // acc_a − acc_b = (b − c)/N exactly, up to the two independent
    // floordivs (±1 each)
    val exactDelta = (r._2 - r._3) * 10000.0 / nOrders
    assert(math.abs((r._5 - r._6) - exactDelta) <= 2.0)
    val (b, c) = (BigInt(r._2), BigInt(r._3))
    assert(BigInt(r._7) ==
      (b - c) * (b - c) * 1000000 / ((b + c).max(BigInt(1))))
    Checkpoints.releaseAll(spark)
  }

  test("q273 Theil–Sen: the median pair slope equals an exact BigInt " +
       "recomputation, and pair counts are the full x-grid") {
    val got = CoreQueries.defs("q273_theilsen_trend")(spark, dir)
      .select(col("n_name"), col("n_pairs"), col("ts_slope_x6"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val census = graft.sources.Tables.orders(spark, dir)
      .join(graft.sources.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) - 1992).cast("long").as("x"))
      .agg(sum((queries.dec(col("o_totalprice")) * 100).cast("long"))
        .as("yv"))
      .as[(String, Long, Long)].collect()
    def fx(num: BigInt, den: BigInt): Long = // truncate toward zero
      (num.abs * 1000000 / den * num.signum).toLong
    val exp = census.groupBy(_._1).view.mapValues { rs =>
      val pts = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = (for {
        (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
      } yield fx(BigInt(y2) - y1, BigInt(x2) - x1)).sorted
      (slopes.length.toLong, slopes((slopes.length + 1) / 2 - 1))
    }.toMap
    assert(got.length == exp.size)
    got.foreach { case (nm, np, sl) =>
      assert((np, sl) == exp(nm), nm)
      val k = census.count(_._1 == nm).toLong
      assert(np == k * (k - 1) / 2) // every x-pair present, none twice
    }
    Checkpoints.releaseAll(spark)
  }

  test("q274 l-diversity: groups cover the customer base, the dominant " +
       "share is at least the uniform share, verdict matches l=3") {
    val rows = CoreQueries.defs("q274_l_diversity")(spark, dir)
      .select(col("group_size"), col("n_sensitive"),
        col("top_share_x10k"), col("ok"))
      .as[(Long, Long, Long, Long)].collect()
    val nCust = graft.sources.Tables.customer(spark, dir).count()
    assert(rows.map(_._1).sum == nCust) // every customer in one group
    rows.foreach { case (gs, ns, ts, ok) =>
      assert(ns >= 1 && ns <= math.min(gs, 5)) // 5 market segments exist
      assert(ts >= 10000 / ns - 1 && ts <= 10000) // max ≥ mean
      assert((ok == 1L) == (ns >= 3))
    }
    Checkpoints.releaseAll(spark)
  }

  test("q275 maintained aggregate equals the one-shot recompute " +
       "row-for-row, and the base census is persisted") {
    val got = CoreQueries.defs("q275_agg_maintenance")(spark, dir)
      .select(col("o_year"), col("o_orderpriority"), col("n_orders"),
        col("revenue_cents"))
      .as[(Long, String, Long, Long)].collect().toSet
    val oneShot = graft.sources.Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((queries.dec(col("o_totalprice")) * 100).cast("long"))
          .as("revenue_cents"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == oneShot)
    // the delta side really is partial: some groups span the cut, so
    // the maintained fold had to merge base and delta rows
    val deltaOnly = graft.sources.Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01")).count()
    assert(deltaOnly > 0 && deltaOnly < got.toSeq.map(_._3).sum)
    Checkpoints.releaseAll(spark)
  }

  test("q276 Wilson LCB: bounds hold, ranks are permutations, and the " +
       "fixed point matches an exact BigInt + isqrt replay") {
    val rows = TextQueries.defs("q276_rate_lcb_ranking")(spark, dir)
      .select(col("source"), col("n_docs"), col("n_pass"),
        col("rate_x10k"), col("lcb_x10k"), col("lcb_rank"),
        col("rate_rank"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val nDocs = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") >= 0).count()
    assert(rows.map(_._2).sum == nDocs)
    assert(rows.map(_._6).sorted.toSeq == (1L to rows.length).toSeq)
    assert(rows.map(_._7).sorted.toSeq == (1L to rows.length).toSeq)
    def isqrt(x: BigInt): BigInt = { // floor √x, Newton
      var g = BigInt(math.sqrt(x.toDouble).toLong.max(1))
      var prev = BigInt(-1)
      while (g != prev) { prev = g; g = (g + x / g) / 2 }
      while (g * g > x) g -= 1
      while ((g + 1) * (g + 1) <= x) g += 1
      g
    }
    rows.foreach { case (src, n, s, rate, lcb, _, _) =>
      val x = (BigInt(s) * (n - s) + n) * 100000000 / n
      val exp = ((BigInt(s) + 2) * 10000 - 2 * isqrt(x)) / (BigInt(n) + 4)
      assert(BigInt(lcb) == exp, src)
      assert(lcb >= 0 && lcb <= rate && rate <= 10000, src)
    }
    Checkpoints.releaseAll(spark)
  }

  test("q258 calibration bins partition the user base") {
    val rows = CoreQueries.defs.get("q258_calibration_bins")
      .orElse(graft.queries.EventQueries.defs.get("q258_calibration_bins"))
      .get(spark, dir)
      .select(col("bin"), col("n_users"), col("n_pos"))
      .as[(Long, Long, Long)].collect()
    val nUsers = graft.sources.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == nUsers) // every user in exactly one bin
    assert(rows.forall { case (b, n, p) => b >= 1 && b <= 10 && p <= n })
    Checkpoints.releaseAll(spark)
  }

  test("q277 dense journey: per-ego counts reconcile with the closure " +
       "and degrees bound them") {
    val rows = GraphQueries.defs("q277_personalnet_dense")(spark, dir)
      .select(col("ego"), col("n_pairs"), col("first_year"),
        col("last_year"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, fy, ly) => n >= 1 && fy <= ly })
    // rebuild the dense edge spine the query builds internally and
    // bound each ego's closed pairs by C(deg, 2) — the closure can
    // only LOSE alter pairs (those not themselves coauthor edges)
    val jdir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_magjourney_sf0.001_s17").toString
    val paa = graft.schema.MagTables.paperAuthorAffiliations(spark, jdir)
    val papers = graft.schema.MagTables.papers(spark, jdir)
      .select(col("id").as("paper"), col("year"))
      .na.fill(graft.operators.AuthorProfiles.SentinelYear, Seq("year"))
    val edges = graft.operators.CoOccur.firstPeriodEdges(
        paa.select(col("paper"), col("author")), papers,
        "paper", "author", "year")
      .select(col("a"), col("b"))
    val deg = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .as[(Long, Long)].collect().toMap
    assert(rows.forall { case (ego, n, _, _) =>
      val d = deg.getOrElse(ego, 0L); n <= d * (d - 1) / 2 })
    // every ego with a closed pair is a vertex of the spine
    assert(rows.forall { case (ego, _, _, _) => deg.contains(ego) })
    Checkpoints.releaseAll(spark)
  }
}
