package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Mergeable frequency sketches (SURVEY.md §2.11 engine additions).
  *
  * The Count-Min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary", J. Algorithms 2005 — public algorithm) summarizes a
  * key stream in a depth×width counter matrix: each occurrence
  * increments one cell per depth row (cell = hash_i(key) mod width),
  * and a key's count estimate is the MINIMUM over its depth cells —
  * always ≥ the true count, over only by colliding keys' mass. Counters
  * are ADDITIVE, so the partial-aggregate merge is plain summation:
  * commutative, associative, and therefore bit-deterministic under any
  * shuffle order — unlike sample-based sketches, the whole matrix is
  * exactly replayable in SQL (the q122 oracle recomputes every cell and
  * every estimate in DuckDB and hash-matches).
  *
  * Scale shape: the matrix build is one map-side-combinable groupBy of
  * at most depth×width cells regardless of key cardinality — the state
  * for a 100 TB keyspace is a few KB — and estimates are an equi-join
  * of probe keys against the tiny broadcast matrix. Hashes are
  * [[PolyHash]] (codegen'd, and the engine's established DuckDB-twin
  * hash) with distinct multipliers per depth row.
  */
object Sketches {

  /** The sparse Count-Min matrix of `key` occurrences in `rows`:
    * one output row per non-empty (depth, cell) with its count.
    * `mults.length` is the sketch depth. */
  def countMinCells(rows: DataFrame, key: Column,
                    mults: Seq[Long], width: Int): DataFrame = {
    require(mults.nonEmpty && mults.distinct.size == mults.size && width > 0)
    rows.select(explode(array(mults.zipWithIndex.map { case (m, i) =>
        struct(lit(i).as("i"), (PolyHash.hash(key, m) % width).as("cell"))
      }: _*)).as("s"))
      .groupBy(col("s.i").as("i"), col("s.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
  }

  /** Count estimates for `probes`' `key` column against a
    * [[countMinCells]] matrix built with the same `mults`/`width`:
    * probes keep their columns and gain `est_cnt` = min over depth
    * cells (0 for a key whose cells are all empty — a key the sketch
    * provably never saw). */
  def countMinEstimates(probes: DataFrame, key: Column, cells: DataFrame,
                        mults: Seq[Long], width: Int): DataFrame = {
    val probeCells = probes.select(probes.columns.map(col) :+
      explode(array(mults.zipWithIndex.map { case (m, i) =>
        struct(lit(i).as("i"), (PolyHash.hash(key, m) % width).as("cell"))
      }: _*)).as("s"): _*)
      .select(probes.columns.map(col) :+ col("s.i").as("i") :+
        col("s.cell").as("cell"): _*)
    probeCells.join(broadcast(cells), Seq("i", "cell"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
  }

  // ----- deterministic HLL-style distinct sketch (q133) -------------
  //
  // HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007 —
  // public algorithm) in the engine's cross-engine-replay discipline:
  // Spark's approx_count_distinct (q44) keeps its HLL++ state in an
  // engine-internal binary layout no other engine can replay, so that
  // query is the surface's one rows-only entry. This form makes every
  // piece of the sketch SQL arithmetic:
  //
  //  - hash    = mix31(PolyHash(key)) — the established DuckDB-twin
  //              hash through a nonlinear xor-shift finalizer (see
  //              [[mix31]] for why the finalizer is load-bearing);
  //  - bucket  = hash % 2^p, rest = hash // 2^p;
  //  - rho     = rank of the LOWEST set bit of `rest` (geometric with
  //              P(rho = r) ≈ 2^-r, same observable as HLL's
  //              leading-zero rank), emitted as a generated CASE chain
  //              identical in both engines;
  //  - register[bucket] = max(rho) — the MERGEABLE state: max-merge of
  //              two sketches IS the sketch of the union
  //              (SketchesSpec property), and a register array is 2^p
  //              small however many distinct keys exist — the 100 TB
  //              partial-agg shape;
  //  - harmonic sum Σ 2^-reg is computed as the EXACT long
  //              Σ 2^(rCap-reg) (empty registers folded in
  //              arithmetically), so the only floating-point step is
  //              ONE division of a shared literal by that integer —
  //              bit-identical cross-engine, hash-matchable.
  //
  // Estimate = alpha_m·m² / Σ 2^-reg — the raw HLL estimator. The
  // small-cardinality linear-counting branch is deliberately omitted:
  // it needs ln(), whose last-bit rounding is libm-specific, and the
  // oracle gate demands bit parity; accuracy below ~2.5·m distinct is
  // therefore biased (documented; the spec asserts the fixture regime).

  /** Sparse HLL registers of `key` within each `groupCols` group: one
    * row per non-empty (group, bucket) with `reg` = max rho. */
  def hllRegisters(rows: DataFrame, groupCols: Seq[String], key: Column,
                   p: Int = 8, mod: Long = 1000000007L): DataFrame = {
    val m = 1 << p
    val rBits = hllRestBits(p)
    val h = mix31(PolyHash.hash(key, 31L, mod))
    rows.select(groupCols.map(col) :+ (h % m).as("bucket") :+
        floor(h / m).cast("long").as("rest"): _*)
      .select(groupCols.map(col) :+ col("bucket") :+
        lowestSetBitRank(col("rest"), rBits).as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Nonlinear 31-bit scramble of a nonnegative < 2^31 hash: two
    * xor-shift-multiply rounds mod 2^31 and a final xor-shift.
    * [[PolyHash]] alone is AFFINE in its input string's trailing
    * digits — consecutive ids hash to consecutive values, so blocks of
    * 2^p keys share one `rest` and register diversity collapses (the
    * estimate read 0.38× truth on a sequential-id fixture). The xor
    * steps break affinity; every op is BIGINT-exact in both engines
    * (max intermediate < 2^61 — DuckDB errors on int64 overflow rather
    * than wrapping, so the bound is load-bearing). */
  private def mix31(h: Column): Column = {
    val a = (h.bitwiseXOR(shiftright(h, 15)) * Mix31Mult) % Mix31Mod
    val b = (a.bitwiseXOR(shiftright(a, 13)) * Mix31Mult) % Mix31Mod
    b.bitwiseXOR(shiftright(b, 11))
  }

  private val Mix31Mult = 1103515245L
  private val Mix31Mod = 2147483648L

  /** DuckDB twin of [[mix31]], staged as three CTE-friendly exprs:
    * apply in sequence as x1, x2, x over the previous stage's name. */
  def mix31Sql: Seq[String => String] = Seq(
    h => s"(xor($h, $h >> 15) * $Mix31Mult) % $Mix31Mod",
    x => s"(xor($x, $x >> 13) * $Mix31Mult) % $Mix31Mod",
    x => s"xor($x, $x >> 11)")

  /** Per-group estimate from [[hllRegisters]] output: `n_filled`
    * registers occupied and `est` = alpha_m·m²/Σ2^-reg (rounded to 3
    * decimals — the cross-engine float-parity convention). */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
                  p: Int = 8): DataFrame = {
    val m = 1 << p
    val rCap = hllRestBits(p) + 1
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_filled"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rCap - reg)")).as("sf"))
      .select(groupCols.map(col) :+ col("n_filled") :+
        round(lit(hllAlphaNum(p)) /
          (col("sf") + (lit(m.toLong) - col("n_filled")) * (1L << rCap))
            .cast("double"), 3).as("est"): _*)
  }

  /** Join-SIZE estimation from two Count-Min matrices (Cormode &
    * Muthukrishnan 2005 §4.2 — the CM inner-product estimator): for
    * relations A and B sketched on their join key with the SAME
    * mults/width, est_i = Σ_cell cmA[i,c]·cmB[i,c] per depth row, and
    * the estimate is min_i est_i. Each est_i = |A ⋈ B| + (colliding
    * cross mass), so the estimate is ALWAYS ≥ the true join size
    * (counters are nonnegative — the guarantee SketchesSpec holds),
    * tightening as width grows. The planner use case: the true size of
    * an m:n join costs the join's own shuffle to discover; this is two
    * O(depth×width) summaries and a cell-wise product — at 100 TB the
    * matrices are KBs however large either side is, so join-size
    * screening (skip, broadcast-pick, or salt decisions) never touches
    * the data a second time. Everything is exact long arithmetic —
    * cells and estimate replay in SQL (the q135 oracle). */
  def countMinJoinSize(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA.select(col("i"), col("cell"), col("c").as("ca"))
      .join(cellsB.select(col("i"), col("cell"), col("c").as("cb")),
        Seq("i", "cell"))
      .groupBy(col("i"))
      .agg(sum(col("ca") * col("cb")).as("est_i"))
      .agg(min(col("est_i")).as("est_join_size"))

  /** Bits of `rest` = mixedHash // 2^p ([[mix31]] output < 2^31). */
  def hllRestBits(p: Int): Int = 31 - p

  /** alpha_m·m²·2^rCap — the shared numerator literal; embed EXACTLY
    * this double (`.toString`) in the oracle replay. */
  def hllAlphaNum(p: Int): Double = {
    val m = 1 << p
    require(m >= 128, "alpha constant below is the m >= 128 one")
    0.7213 / (1 + 1.079 / m) * m * m *
      math.pow(2.0, hllRestBits(p) + 1)
  }

  /** rho: 1-based rank of the lowest set bit of nonnegative `rest`
    * (rBits+1 when rest = 0) — a flat coalesce-of-whens whose SQL twin
    * [[lowestSetBitRankSql]] generates the same chain. */
  private def lowestSetBitRank(rest: Column, rBits: Int): Column =
    coalesce((1 to rBits).map(r =>
      when(rest % (1L << r) === (1L << (r - 1)), lit(r))) :+
      lit(rBits + 1): _*)

  /** DuckDB twin of [[lowestSetBitRank]] over the SQL expression
    * `rest`. */
  def lowestSetBitRankSql(rest: String, rBits: Int): String =
    (1 to rBits).map(r =>
      s"WHEN $rest % ${1L << r} = ${1L << (r - 1)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${rBits + 1} END")

  /** EXACT heavy hitters — non-null keys with count ≥
    * ceil(shareNum·n/shareDen) over the n non-null-key rows — without
    * a full-cardinality groupBy: the classic two-pass
    * Misra-Gries-then-recount shape (Misra & Gries, "Finding repeated
    * elements", Sci. Comput. Program. 1982 — public algorithm).
    *
    * Pass 1 runs an s-counter Misra-Gries summary INSIDE each
    * partition (`mapPartitions` — the genuinely imperative per-
    * partition case SURVEY §7.3 reserves it for) and emits that
    * partition's row count ALONGSIDE its summary, so within pass 1
    * `n` and the summaries describe the very same scan (no separate
    * `count()` job that could see different rows). Pass 2 does
    * re-scan the source to recount candidates, so end-to-end
    * exactness still assumes the source is deterministic across the
    * two passes — as every multi-pass Spark job does. Every key
    * whose partition-local count EXCEEDS
    * n_p/(s+1) survives its partition's summary; a globally heavy key
    * (count > Σ n_p/(s+1) = n/(s+1)) must by pigeonhole be partition-
    * heavy somewhere. The MG survival guarantee is STRICT (>), so the
    * superset property needs strict slack share > 1/(s+1) — at
    * share = 1/(s+1) exactly, a key meeting the threshold can be
    * evicted from every summary (s=1, share=1/2, stream a,b,a,b) —
    * hence the strict `require` below. Pass 2 exact-counts ONLY the
    * candidate keys (broadcast semi-join; ≤ s·#partitions candidates
    * however large the keyspace) and applies the threshold, so false
    * candidates vanish and the output equals the plain
    * `GROUP BY ... HAVING count ≥ threshold` answer — exactly what
    * the q137 oracle runs.
    *
    * The share is a RATIONAL (shareNum/shareDen), not a double: the
    * threshold ceil(num·n/den) is computed in exact integer
    * arithmetic on both engines, so no fp-drift ceil overshoot
    * (0.1·110 → 11.000000000000002 → 12) can drop a key the oracle
    * keeps. NULL keys are excluded from BOTH the candidate stream and
    * `n` (SQL GROUP BY would keep a NULL group; this operator
    * documents the non-null-key contract and the oracle filters
    * identically).
    *
    * Scale shape: a 100 TB keyspace never shuffles — pass 1 moves
    * s·#partitions candidate keys (plus one count per partition),
    * pass 2 is a broadcast-filtered map-side-combinable count of the
    * few surviving keys. The classic alternative (full groupBy)
    * shuffles every distinct key. */
  def heavyHitters(rows: DataFrame, key: Column, shareNum: Long,
                   shareDen: Long, summarySize: Int): DataFrame = {
    require(shareNum > 0 && shareDen > 0 && shareNum <= shareDen,
      "share must be a rational in (0, 1]")
    require(shareNum * (summarySize + 1) > shareDen,
      s"superset guarantee needs share STRICTLY above 1/(summarySize+1)")
    val spark = rows.sparkSession
    import spark.implicits._
    val keyed = rows.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull).as[String]
    // one scan: per-partition (MG summary keys, row count)
    val summaries = graft.Checkpoints.checkpoint(keyed.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { k =>
        n += 1L
        if (counters.contains(k)) counters(k) += 1L
        else if (counters.size < summarySize) counters(k) = 1L
        else {
          // decrement-all; drop zeros (the MG eviction step)
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.filterInPlace((_, v) => v > 0L)
        }
      }
      Iterator.single((counters.keys.toArray.sorted, n))
    }.toDF("ks", "n"))
    val total = summaries.agg(coalesce(sum(col("n")), lit(0L)))
      .head.getLong(0)
    val cands = summaries.select(explode(col("ks")).as("k")).distinct()
    // ceil(num·total/den) in exact integer arithmetic (BigInt: immune
    // to num·total overflow at any row count)
    val threshold =
      ((BigInt(shareNum) * total + shareDen - 1) / shareDen).toLong
    keyed.toDF("k")
      .join(broadcast(cands), "k")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Per-partition Misra-Gries SUMMARIES with counts — the mergeable
    * form of [[heavyHitters]]'s pass 1: one row per partition holding
    * its s-counter summary as parallel (keys, counts) arrays plus the
    * partition's row count. Combine across partitions / batches with
    * [[mgMerge]]. */
  def mgSummaries(rows: DataFrame, key: Column,
                  summarySize: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull).as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        var n = 0L
        it.foreach { k =>
          n += 1L
          if (counters.contains(k)) counters(k) += 1L
          else if (counters.size < summarySize) counters(k) = 1L
          else {
            counters.mapValuesInPlace((_, v) => v - 1L)
            counters.filterInPlace((_, v) => v > 0L)
          }
        }
        val ks = counters.keys.toArray.sorted
        Iterator.single((ks, ks.map(counters), n))
      }.toDF("ks", "cnts", "n")
  }

  /** Mergeable-summaries MG merge (Agarwal, Cormode, Huang, Phillips,
    * Wei, Yi, "Mergeable Summaries", PODS 2012 — public result): sum
    * counters keywise, and if more than `summarySize` keys survive,
    * subtract the (s+1)-th largest count from every counter and drop
    * the non-positive ones. The merged summary keeps the MG guarantee
    * OF THE UNION stream: any key with true count > n/(s+1) over the
    * combined input survives, whatever the merge tree — which is what
    * makes the per-batch summaries a streaming-maintainable state
    * whose final candidate set still needs only the [[heavyHitters]]
    * recount to become exact. Deterministic: pure function of its
    * inputs, ties need no breaking (subtraction treats all keys
    * alike). */
  def mgMerge(xs: Map[String, Long], ys: Map[String, Long],
              summarySize: Int): Map[String, Long] = {
    val sum = scala.collection.mutable.HashMap.empty[String, Long]
    (xs.iterator ++ ys.iterator).foreach { case (k, v) =>
      sum(k) = sum.getOrElse(k, 0L) + v
    }
    if (sum.size <= summarySize) sum.toMap
    else {
      // (s+1)-th largest count — the smallest amount whose subtraction
      // leaves at most s positive counters
      val cs = sum.values.toArray.sorted(Ordering[Long].reverse)
      val dec = cs(summarySize)
      sum.iterator.collect {
        case (k, v) if v - dec > 0L => k -> (v - dec)
      }.toMap
    }
  }

  /** PER-GROUP exact heavy hitters — [[heavyHitters]] with an
    * independent share threshold per group (frequent items per
    * tenant/source): non-null (group, key) pairs where the key's
    * count within its group reaches shareNum/shareDen of that
    * GROUP's rows.
    *
    * Pass 1 keeps one s-counter Misra-Gries summary PER GROUP inside
    * each partition (the per-group substream gets its own MG, so the
    * strict-slack superset guarantee of [[heavyHitters]] holds
    * group-wise by the same pigeonhole), and emits each (partition,
    * group)'s row count beside its summary — totals come from the
    * summarized scan itself. Pass 2 exact-counts candidates only and
    * applies the per-group threshold as the integer cross-multiply
    * cnt·den ≥ n_g·num (for integers, cnt ≥ ceil(a/b) ⟺ b·cnt ≥ a —
    * no ceil arithmetic at all, so nothing to drift from the
    * oracle's HAVING).
    *
    * State per partition is s × (groups seen in that partition) —
    * the moderate-group-cardinality regime (sources, tenants,
    * languages). A keyspace-sized group column would degenerate to
    * exact counting; repartition by group first if group counts are
    * huge and skewed. */
  def heavyHittersByGroup(rows: DataFrame, group: Column, key: Column,
                          shareNum: Long, shareDen: Long,
                          summarySize: Int): DataFrame = {
    require(shareNum > 0 && shareDen > 0 && shareNum <= shareDen,
      "share must be a rational in (0, 1]")
    require(shareNum * (summarySize + 1) > shareDen,
      s"superset guarantee needs share STRICTLY above 1/(summarySize+1)")
    val spark = rows.sparkSession
    import spark.implicits._
    val keyed = rows
      .select(group.cast("string").as("g"), key.cast("string").as("k"))
      .filter(col("g").isNotNull && col("k").isNotNull)
      .as[(String, String)]
    val summaries = graft.Checkpoints.checkpoint(keyed.mapPartitions { it =>
      val perGroup = scala.collection.mutable.HashMap
        .empty[String, (scala.collection.mutable.HashMap[String, Long], Array[Long])]
      it.foreach { case (g, k) =>
        val (counters, n) = perGroup.getOrElseUpdate(
          g, (scala.collection.mutable.HashMap.empty[String, Long], Array(0L)))
        n(0) += 1L
        if (counters.contains(k)) counters(k) += 1L
        else if (counters.size < summarySize) counters(k) = 1L
        else {
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.filterInPlace((_, v) => v > 0L)
        }
      }
      perGroup.iterator.map { case (g, (counters, n)) =>
        (g, counters.keys.toArray.sorted, n(0))
      }
    }.toDF("g", "ks", "n"))
    val totals = summaries.groupBy(col("g"))
      .agg(sum(col("n")).as("n_group"))
    val cands = summaries
      .select(col("g"), explode(col("ks")).as("k")).distinct()
    keyed.toDF("g", "k")
      .join(broadcast(cands), Seq("g", "k"))
      .groupBy(col("g"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), "g")
      .filter(col("cnt") * shareDen >= col("n_group") * shareNum)
      .select(col("g"), col("k"), col("cnt"), col("n_group"))
  }

  // ----- KMV sketches + pairwise set-operation estimates (q153) -----
  //
  // k-minimum-values (Bar-Yossef et al., RANDOM'02; the set-operation
  // estimators are Beyer et al., SIGMOD'07 — public algorithms): a
  // group's sketch is the k smallest DISTINCT hash values of its keys.
  // q69 already uses the single-group estimator; this is the PAIRWISE
  // layer: merging two sketches (k smallest of the hash union) is the
  // sketch of the set union, so distinct-union, distinct-intersection
  // and Jaccard between every group pair come from the k-row sketches
  // alone — the 100 TB shape for cross-source overlap screening, where
  // q95's exact matrix must shuffle the full (source, shingle) grain
  // but this touches it once to build per-source k-row state.

  /** The established cross-engine string hash ([[hllRegisters]]'s
    * mix31 ∘ PolyHash) exposed as a column: uniform-ish on [0, 2^31)
    * and exactly replayable in DuckDB via [[mix31Sql]] over the
    * q122 wordHash twin. */
  def mixedStringHash(key: Column, mod: Long = 1000000007L): Column =
    mix31(PolyHash.hash(key, 31L, mod))

  /** Upper bound (exclusive) of [[mixedStringHash]]'s range — the M in
    * the KMV estimator est = (k−1)·M/h_k. */
  val MixedHashRange: Double = 2147483648.0

  /** Per-group KMV sketch: the k smallest distinct values of `h`.
    * The rank filter plans as WindowGroupLimit — each map task keeps
    * only its local k smallest before the exchange, so the shuffle
    * carries ≤ k rows per (partition, group) however many distinct
    * keys the group holds. */
  def kmvMinHashes(rows: DataFrame, group: String, h: Column,
                   k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col("h"))
    rows.select(col(group), h.as("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(group), col("h"))
  }

  /** Pairwise set-operation estimates over ONE [[kmvMinHashes]] table:
    * for every group pair (ga < gb) the merged sketch is the k
    * smallest hashes of the two sketches' union with per-side
    * membership flags; `est_union` = (k−1)·M/h_k over the merged
    * sketch and `est_inter` scales it by the shared fraction INSIDE
    * the merged sketch (Beyer et al. §4). When the merged sketch holds
    * fewer than k hashes both input sketches were complete and both
    * answers are EXACT counts (emitted through the same columns).
    *
    * Cost: groups²·k rows built from the k-row sketches only —
    * independent of corpus size; the group-pair grid is an intended
    * broadcast cross join over the group-name relation. */
  def kmvPairEstimates(sketch: DataFrame, group: String, k: Int,
                       hashRange: Double = MixedHashRange): DataFrame = {
    val names = sketch.select(col(group)).distinct()
    val pairs = names.select(col(group).as("ga"))
      .crossJoin(names.select(col(group).as("gb")))
      .filter(col("ga") < col("gb"))
    val sides = pairs
      .join(sketch.select(col(group).as("ga"), col("h")), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionByName(pairs
        .join(sketch.select(col(group).as("gb"), col("h")), Seq("gb"))
        .select(col("ga"), col("gb"), col("h"),
          lit(0L).as("in_a"), lit(1L).as("in_b")))
    val merged = sides.groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val ranked = merged.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("ga"), col("gb")).orderBy(col("h"))))
      .filter(col("rn") <= k)
    val agged = ranked.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_union_hashes"),
        max(when(col("rn") === k, col("h"))).as("hk"),
        sum(col("in_a") * col("in_b")).as("n_shared"))
    val estU = when(col("n_union_hashes") < k,
        col("n_union_hashes").cast("double"))
      .otherwise(lit((k - 1).toDouble) * hashRange / col("hk"))
    agged.select(col("ga"), col("gb"), col("n_shared"),
      estU.as("est_union"),
      when(col("n_union_hashes") < k, col("n_shared").cast("double"))
        .otherwise(col("n_shared") * estU / lit(k.toDouble))
        .as("est_inter"))
  }
}
