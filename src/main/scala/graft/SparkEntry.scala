package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator surface; each entry has a
  * DuckDB oracle in `oracleSql` unless the operation is not ANSI-SQL
  * expressible (those get the driver's rows-only check).
  */
object SparkEntry {

  private def groups: Seq[(Map[String, (SparkSession, String) => DataFrame],
                           Map[String, String])] = Seq(
    (CoreQueries.defs, CoreQueries.oracles),
    (GraphQueries.defs, GraphQueries.oracles),
    (TextQueries.defs, TextQueries.oracles),
    (SimQueries.defs, SimQueries.oracles),
    (EventQueries.defs, EventQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)

  /** Data-DEPENDENT oracles, computed at Verify time with the live
    * session (the IVF literal-centroid replay for q51/q72): merged over
    * [[oracleSql]] before the dump, so the driver's DuckDB pass sees
    * SQL whose literals were produced from the same `sfDir` it checks. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    SimQueries.dynamicOracles(spark, sfDir) ++
      TextQueries.dynamicOracles(spark, sfDir) ++
      EventQueries.dynamicOracles(spark, sfDir) ++
      GraphQueries.dynamicOracles(spark, sfDir) ++
      CoreQueries.dynamicOracles(spark, sfDir)
}
