package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch: a deterministic q-digest (Shrivastava,
  * Buragohain, Agrawal, Suri, "Medians and Beyond", SenSys 2004) over
  * the integer domain [0, 2^levels), as a true Spark partial aggregate.
  *
  * Why this sketch and not KLL/GK: the engine's oracle discipline
  * requires DETERMINISM under Spark's nondeterministic partial-merge
  * tree. KLL compaction is randomized (and its determinized variant's
  * bound is order-sensitive); GK is not cleanly mergeable. The q-digest
  * is pure integer arithmetic, its merge is count addition followed by
  * a canonical compression, and its rank-error bound — counts parked at
  * an internal node are uncertain only within that node's range, so a
  * quantile's rank error is at most the sum of counts on its root path,
  * ≤ levels·(n/k) — holds for EVERY merge order, which is exactly what
  * the q120 oracle's within-ε check needs (the check must pass however
  * the shuffle lands). `declaredEps` is deliberately above the
  * worst-case levels/k: re-compressed parents can transiently exceed
  * the n/k threshold, and the slack keeps the bound honest;
  * QDigestSpec measures actual error well inside it across adversarial
  * merge orders.
  *
  * Buffer layout: flat Array[Long] — slot 0 = pair count, then
  * (nodeId, count) pairs; appends are amortized O(1) (capacity
  * doubling) and the buffer compresses itself whenever it exceeds
  * `maxPairs`, so partial-aggregation memory is O(k) regardless of
  * input size. Node ids are heap order (root 1, children 2x/2x+1,
  * leaf for value v = 2^levels + v); the q113 exact-quantile machinery
  * is the accuracy oracle, not a replacement — the sketch exists for
  * streams and pre-aggregated rollups where a second exact pass is
  * unavailable.
  */
case class QDigestAgg(levels: Int, k: Int, probs: Seq[Double])
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(levels > 0 && levels < 40 && k > 1)

  private val leafBase = 1L << levels
  private val maxPairs = 8 * k

  /** The ε the q120 bound check declares (rank error ≤ ε·n). 4× the
    * single-compression levels/k worst case: merged parents can carry
    * up to one sub-threshold fold per merge-tree level, so the slack
    * covers the shuffle's ~log(partitions) merge depth. */
  def declaredEps: Double = 4.0 * levels / k

  override def zero: Array[Long] = Array(0L)

  private def clamp(v: Long): Long =
    math.min(math.max(v, 0L), leafBase - 1L)

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    val used = b(0).toInt
    val need = 3 + 2 * used
    val nb =
      if (b.length >= need) b
      else {
        val n2 = new Array[Long](math.max(need, 2 * b.length + 1))
        Array.copy(b, 0, n2, 0, 1 + 2 * used)
        n2
      }
    nb(1 + 2 * used) = leafBase + clamp(v)
    nb(2 + 2 * used) = 1L
    nb(0) = used + 1L
    if (used + 1 >= maxPairs) compress(nb) else nb
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val ux = x(0).toInt; val uy = y(0).toInt
    val out = new Array[Long](1 + 2 * (ux + uy))
    out(0) = ux + uy
    Array.copy(x, 1, out, 1, 2 * ux)
    Array.copy(y, 1, out, 1 + 2 * ux, 2 * uy)
    // compress only past the pair budget: a 32-way partial-merge tree
    // otherwise pays a full canonical compression PER pairwise merge
    // (finish() canonicalizes at the end regardless, and the bound
    // argument only counts compressions actually performed). Still a
    // pure function of its inputs — merge-determinism is unchanged.
    if (ux + uy > maxPairs) compress(out) else out
  }

  private def depth(node: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(node)

  /** Consolidate duplicate nodes, then canonical bottom-up q-digest
    * compression: children (and the parent's own count) fold into the
    * parent whenever the triple sums below n/k. Deterministic — levels
    * bottom-up, nodes in ascending id order, no RNG. Returns the
    * canonical sorted-pair serialization.
    *
    * Nodes are BUCKETED by level once and each level sweeps its own
    * sorted bucket (parents created by a fold are appended to the
    * level-above bucket): the same visit order as filtering the live
    * key set per level — every level-L id sorts above every
    * level-(L-1) id — without 'levels' full-map scans per call, which
    * dominated the aggregate's profile at 32-partition merge trees. */
  private def compress(b: Array[Long]): Array[Long] = {
    val used0 = b(0).toInt
    // pre-size: 32k inserts into a default-sized LongMap pay ~11
    // rehash doublings per compress call
    val m = new mutable.LongMap[Long](math.max(16, used0 * 2))
    var i = 0
    val used = used0
    var n = 0L
    while (i < used) {
      val node = b(1 + 2 * i); val c = b(2 + 2 * i)
      m(node) = m.getOrElse(node, 0L) + c
      n += c
      i += 1
    }
    val t = n / k
    if (t > 0) {
      val byLevel = Array.fill(levels + 1)(
        new scala.collection.mutable.ArrayBuilder.ofLong)
      m.foreachKey(node => byLevel(depth(node)) += node)
      var lvl = levels
      while (lvl >= 1) {
        val atLvl = byLevel(lvl).result()
        java.util.Arrays.sort(atLvl)
        var j = 0
        while (j < atLvl.length) {
          val node = atLvl(j)
          val left = node & ~1L
          // process each sibling pair once (skip the odd twin if its
          // even sibling was already handled in this sweep)
          if ((node & 1L) == 0L || !m.contains(left)) {
            val parent = node >> 1
            val sum = m.getOrElse(left, 0L) + m.getOrElse(left | 1L, 0L) +
              m.getOrElse(parent, 0L)
            if (sum < t) {
              val hadParent = m.contains(parent)
              m.remove(left); m.remove(left | 1L)
              if (sum > 0) {
                m(parent) = sum
                if (!hadParent) byLevel(lvl - 1) += parent
              }
            }
          }
          j += 1
        }
        lvl -= 1
      }
    }
    val keys = new Array[Long](m.size)
    var ki = 0
    m.foreachKey { node => keys(ki) = node; ki += 1 }
    java.util.Arrays.sort(keys)
    val out = new Array[Long](1 + 2 * keys.length)
    out(0) = keys.length
    var o = 0
    while (o < keys.length) {
      out(1 + 2 * o) = keys(o); out(2 + 2 * o) = m(keys(o)); o += 1
    }
    out
  }

  /** Largest domain value covered by `node`'s range. */
  private def upperValue(node: Long): Long = {
    val shift = levels - depth(node)
    (((node + 1L) << shift) - 1L) - leafBase
  }

  override def finish(b: Array[Long]): Seq[Long] = {
    val c = compress(b) // consolidate (and canonicalize) first
    val used = c(0).toInt
    if (used == 0) return probs.map(_ => 0L)
    // q-digest quantile read: nodes in (range upper bound asc, deeper
    // node first) order; the value at rank r is the upper bound of the
    // node where the running count reaches r
    val nodes = (0 until used).map(i => (c(1 + 2 * i), c(2 + 2 * i)))
      .sortBy { case (node, _) => (upperValue(node), -depth(node)) }
    val n = nodes.iterator.map(_._2).sum
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var ans = upperValue(nodes.last._1)
      var i = 0
      var found = false
      while (i < nodes.length && !found) {
        cum += nodes(i)._2
        if (cum >= target) { ans = upperValue(nodes(i)._1); found = true }
        i += 1
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  /** Column form. */
  def apply(values: Column): Column = udaf(this).apply(values)
}
