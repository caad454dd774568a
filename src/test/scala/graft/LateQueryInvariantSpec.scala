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
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 < b._2 })
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
}
