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
}
