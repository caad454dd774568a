package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shape rewrites (SURVEY.md §2.3).
  */
object Joins {

  /** SIZE-GATED broadcast hint for MATERIALIZED relations (r17 VERDICT
    * item 2). A `localCheckpoint`ed frame carries no stats, so AQE
    * cannot decide broadcastability and an unconditional
    * `broadcast(df)` hint is a scale hazard: correct while the
    * relation is small, but at 100× it forces a driver-side hash build
    * (or OOM) instead of degrading gracefully to a shuffle join. This
    * helper restores the decision AQE would have made: one `count()`
    * (free on a checkpointed input — the blocks are already pinned),
    * compared against `spark.sql.autoBroadcastJoinThreshold` scaled by
    * the schema's estimated row width; hint only under the bound,
    * plain frame otherwise. A disabled threshold (≤ 0) means the user
    * turned auto-broadcast off — respected here the same way.
    *
    * Use at any hinted join whose input lineage passes through a
    * checkpoint (stats erased); NOT needed for bounded scalar/grid
    * broadcasts (≤ #groups rows by construction — the audit's curated
    * intended list). */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val raw = spark.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // the conf accepts a bare (possibly negative = disabled) byte count
    // as well as suffixed forms ("10MB") — JavaUtils parses only the
    // latter
    val thresholdBytes = raw.toLongOption.getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    if (thresholdBytes <= 0) df
    else {
      // defaultSize mirrors Catalyst's own stats estimate for the
      // schema; +8 per row for object/offset overhead keeps the bound
      // conservative (prefer SMJ over a marginal broadcast)
      val rowBytes = math.max(1L,
        df.schema.map(_.dataType.defaultSize.toLong).sum + 8L)
      if (df.count() <= thresholdBytes / rowBytes) broadcast(df) else df
    }
  }

  /** Inner join on `c1 OR c2` rewritten as a union of two equi-joins
    * (J7 — the reference's FK-closure join `MagDwarf.scala:115-122`
    * matches parent OR child and planedly degrades to a
    * BroadcastNestedLoopJoin; the union form keeps both branches
    * hash-joinable, which is the difference between O(n·m) and two
    * shuffles at 100 TB).
    *
    * Exact OR semantics without duplicates: the second branch excludes
    * pairs already matched by `c1` (null-safe — a null predicate is
    * "not true", same as the OR join). */
  def disjunctiveEquiJoin(left: DataFrame, right: DataFrame,
                          c1: Column, c2: Column): DataFrame =
    left.join(right, c1)
      .unionByName(left.join(right, c2 && not(coalesce(c1, lit(false)))))

  /** As-of join — for each left row, the single latest right row with
    * the same key and `rightTime <= leftTime`. Spark has no native
    * as-of; the scalable composition (preference (a) of SURVEY.md §7.3)
    * is the union-then-window form: tag both sides, union, sort each
    * key's timeline ONCE, and carry the last-seen right payload forward
    * with `last(_, ignoreNulls)`. One shuffle + one sort total — never
    * a per-key range scan or a time-expanded join.
    *
    * Right rows must be unique per (key, time) for determinism —
    * pre-aggregate the right side if they are not. Right payload
    * columns come back null when no right row precedes the left row.
    * NULL caveat: the window composition groups null keys into one
    * partition and sorts null times first, so nulls can match each
    * other — unlike [[asOfJoinNative]] (and SQL join convention),
    * where a null key/time never matches.
    *
    * @param valueCols right-side payload columns to carry */
  def asOfJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val probe = left.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_isProbe") +:
        valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(v))) ++
        leftCols.map(col): _*)
    val build = right.select(
      (col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_isProbe") +:
        valueCols.map(col)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // at equal timestamps the right (build) row sorts first, so a
    // same-instant right row IS visible to the left row (<= semantics)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_isProbe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(probe.unionByName(build)) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("_isProbe") === 1)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** As-of join through the NATIVE custom operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]):
    * same semantics as [[asOfJoin]], but planned as a co-partitioned
    * sorted-merge with one buffered right row per partition instead of
    * the union+window composition. The strategy is registered on the
    * session idempotently. */
  def asOfJoinNative(left: DataFrame, right: DataFrame, leftKey: String,
                     rightKey: String, leftTime: String, rightTime: String,
                     valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    import org.apache.spark.sql.graftshim.PlanBridge
    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = PlanBridge.analyzed(left)
    // Always re-alias the right side with fresh exprIds (what Spark's
    // own Join does for self-joins): with shared lineage — a self-as-of
    // join, or events joined to an aggregate of events — left.output
    // and right.output share exprIds, and AsOfJoinExec's output
    // projection binds by first index, silently reading LEFT row values
    // for right payload columns. A Project of fresh Aliases makes the
    // two sides' attribute ids disjoint by construction.
    val rPlan: LogicalPlan = {
      val r0 = PlanBridge.analyzed(right)
      Project(r0.output.map(a => Alias(a, a.name)()), r0)
    }
    def attr(p: LogicalPlan, n: String) =
      p.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"no column $n in ${p.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.size} matches in ${p.output.map(_.name)}")
      }
    PlanBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan, attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      valueCols.map(attr(rPlan, _))))
  }

  /** Skew-salted equi-join: the big (skewed) side gets a deterministic
    * salt derived from its full row, the small side is exploded into
    * `factor` copies, and the join key becomes (key, salt) — a hot key's
    * rows spread over `factor` reducers instead of one straggler task.
    * AQE's runtime skew-join split usually covers this; the explicit
    * form is for pathological keys known in advance (SURVEY.md §4).
    * Small side grows ×factor — keep it broadcast-sized. */
  /** The deterministic salt [[saltedJoin]] derives from the big side's
    * full row — exposed so JoinsSpec can assert the partition-spread
    * property on exactly the production formula. */
  private[graft] def saltExpr(big: DataFrame, factor: Int) =
    pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor))

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt", saltExpr(big, factor))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** FK-closed sampling (G8 — the reference's "MAG dwarf",
    * `MagDwarf.scala:59-147`): keep child rows whose FK points into the
    * sampled key set. Semi-join, so child columns pass through
    * unchanged and the key set is broadcast when small. */
  def fkClosedSample(child: DataFrame, fk: String,
                     keys: DataFrame, key: String): DataFrame =
    child.join(keys, child(fk) === keys(key), "left_semi")

  /** Interval join WITHOUT an equi-key: each point row pairs with every
    * interval row whose `[start, end)` contains it. Spark plans the
    * bare range predicate as a BroadcastNestedLoopJoin — O(points ×
    * intervals) work that is the canonical 100 TB scale-killer. The
    * bucketed rewrite makes it a hash join: points land in exactly one
    * `bucketWidth`-sized bucket, intervals are exploded to every bucket
    * they overlap, and the equi-join on bucket id sees each qualifying
    * pair exactly once (the point's one bucket) before the exact range
    * filter. Work becomes O(points + intervals × span/bucketWidth +
    * true matches) and shuffles hash-partition on bucket id.
    *
    * Pick `bucketWidth` near the typical interval length: each interval
    * explodes to ~2 buckets and per-bucket occupancy stays bounded.
    * Columns pass through from both sides (caller keeps names
    * disjoint); all three boundary columns are integer epoch-like
    * values (exact arithmetic — no float bucket drift). NULL points or
    * boundaries never match, as in the predicate form. */
  /** Deterministic Bloom filter over `dim`'s `key` column, as a ONE-ROW
    * DataFrame holding a sparse word-index → 64-bit-word map. The build
    * is itself distributed: keys explode to their `numHashes` bit
    * positions, duplicate positions collapse, and `bit_or` folds each
    * 64-bit word — OR is commutative and associative, so the bits are
    * independent of partitioning and merge order (what makes the
    * semi-join reduction oracle-checkable at all). Bit positions come
    * from `xxhash64(i, key)` (Spark's codegen'd 64-bit hash, seeded per
    * probe index); the sparse map stays exact for any `mBits` because
    * absent words read as zero on the probe side. */
  def bloomFilterOf(dim: DataFrame, key: String, mBits: Long,
                    numHashes: Int): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0, "mBits must be a multiple of 64")
    val bitpos = (0 until numHashes).map(i =>
      pmod(xxhash64(lit(i.toLong), col(key)), lit(mBits)))
    dim.select(explode(array(bitpos: _*)).as("bp")).distinct()
      .groupBy(shiftright(col("bp"), 6).as("w"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), (col("bp") % 64).cast("int")))
        .as("bits"))
      .agg(map_from_arrays(collect_list(col("w")),
        collect_list(col("bits"))).as("bf"))
  }

  /** Membership probe against [[bloomFilterOf]]'s map column — pure
    * built-ins (`element_at`/`shiftright`/AND), so the test runs inside
    * whole-stage codegen on the fact scan. False negatives are
    * impossible; false positives pass and are removed by the exact join
    * that follows. */
  def bloomMightContain(key: Column, bf: Column, mBits: Long,
                        numHashes: Int): Column =
    (0 until numHashes).map { i =>
      val bp = pmod(xxhash64(lit(i.toLong), key), lit(mBits))
      coalesce(element_at(bf, shiftright(bp, 6)), lit(0L))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (bp % 64).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)

  /** Semi-join REDUCTION for a big-to-big selective join — the 100 TB
    * shape where `dim` is too large to broadcast as a hash relation
    * (hundreds of bytes per key) but its Bloom filter is not (~10 BITS
    * per key): build the filter over `dim`'s keys, broadcast the one-row
    * map as a scalar (an intended BroadcastNestedLoopJoin, the q42
    * convention), and drop non-matching fact rows BEFORE the join's
    * shuffle — the exchange then moves only rows that can match, which
    * at a 10% dim selectivity is ~10% of the fact shuffle bytes. The
    * exact join still runs, so the result is identical to the plain
    * join (the oracle): the Bloom only over-admits, never drops.
    *
    * `dim` is scanned three times (count for sizing, filter build, the
    * join itself) — localCheckpoint a derived dim if it is expensive.
    * Spark's own runtime bloom pushdown covers simple cases; this form
    * is explicit, sized from the real key count, and composes with any
    * dim expression. */
  def bloomPrefilterJoin(fact: DataFrame, factKey: String,
                         dim: DataFrame, dimKey: String,
                         bitsPerKey: Int = 10,
                         numHashes: Int = 5): DataFrame = {
    val n = math.max(1L, dim.count()) // bounded scalar (q110 convention)
    val mBits = ((n * bitsPerKey + 63) / 64) * 64
    val bf = bloomFilterOf(dim, dimKey, mBits, numHashes)
    val pre = fact.crossJoin(broadcast(bf))
      .filter(bloomMightContain(col(factKey), col("bf"), mBits, numHashes))
      .drop("bf")
    pre.join(dim, pre(factKey) === dim(dimKey))
  }

  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact floor-div on int64, in PURE integer arithmetic: x - pmod
    // is an exact multiple of w (also for negatives), and `div` is
    // integral division — no double rounding anywhere, so values past
    // 2^53 bucket exactly. floor(c / w) or a double quotient would
    // round the ratio in binary and can mis-bucket near boundaries.
    def bucket(c: Column): Column =
      call_function("div", c - pmod(c, lit(bucketWidth)), lit(bucketWidth))
    val p = points.withColumn("_bkt", bucket(col(pointCol)))
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("_bkt", explode(sequence(
        bucket(col(startCol)),
        bucket(col(endCol) - 1)))) // end is exclusive
    p.join(iv, Seq("_bkt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bkt")
  }

  /** INTERVAL-OVERLAP JOIN between two interval relations with NO
    * equi-key — the non-equi join Spark has no native operator for
    * (the bare `lStart < rEnd AND rStart < lEnd` predicate plans as a
    * nested-loop cross product): [[intervalJoin]]'s bucketization
    * applied to BOTH sides. Each interval explodes to the fixed-width
    * buckets it covers, the join is a plain equi-join on the bucket
    * id, the true half-open overlap predicate re-verifies inside the
    * bucket, and a pair overlapping several shared buckets is emitted
    * EXACTLY ONCE by the algebraic rule "keep the match only in the
    * bucket containing the overlap's own start" (greatest of the two
    * starts) — no distinct, no extra shuffle. Fan-out per row =
    * ceil(interval length / bucketWidth); size `bucketWidth` near the
    * typical interval length. Intervals are half-open [start, end);
    * empty ones match nothing. Callers disambiguate column names
    * before joining (the output carries both sides' columns). */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column =
      call_function("div", c - pmod(c, lit(bucketWidth)), lit(bucketWidth))
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("_bkt", explode(sequence(
        bucket(col(lStart)), bucket(col(lEnd) - 1))))
    val r = right.filter(col(rEnd) > col(rStart))
      .withColumn("_bkt", explode(sequence(
        bucket(col(rStart)), bucket(col(rEnd) - 1))))
    l.join(r, Seq("_bkt"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(bucket(greatest(col(lStart), col(rStart))) === col("_bkt"))
      .drop("_bkt")
  }
}
