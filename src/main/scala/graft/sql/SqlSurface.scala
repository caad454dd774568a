package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

import graft.functions.{ArrayCosine, HIndexAgg}
import graft.sources.Tables

/** SQL entry point (SURVEY.md §7.1 `sql/` module): registers every
  * table of a scale-factor directory as a temp view plus the engine's
  * custom functions, so the whole surface is reachable from
  * `spark.sql(...)` — mirroring the reference's catalog-view style
  * (global temp views consumed across notebooks,
  * `SetUpEnv.scala:119-125`).
  */
object SqlSurface {

  def register(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    // the graph layer as composable views (coship_edges, knn_edges,
    // triangle_counts, components) — a SQL-only user reaches the
    // operator layer too (q109)
    graft.queries.GraphQueries.registerGraphViews(spark, dir)
    spark.udf.register("hindex", udaf(HIndexAgg))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_cosine", exprs => ArrayCosine(exprs(0), exprs(1)), "scala_udf")
    // the engine's portable deterministic hashes, reachable from SQL:
    // poly_hash(str) — the codegen polynomial kernel (q23/q94 family,
    // defaults 31 / 1e9+7); lcg_hash(key) — the cross-engine LCG key
    // scramble (q67/q69/q73 family). Both reproducible in any engine.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash",
      exprs => graft.functions.PolyHash(exprs(0), 31L, 1000000007L),
      "scala_udf")
    spark.udf.register("lcg_hash",
      (k: Long) => java.lang.Math.floorMod(k * 1103515245L, 2147483647L))
  }
}
