package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ingestion-time statistics pass.
  *
  * Before a 100 TB table is queryable you want its shape: per-column
  * non-null counts, null counts, exact distinct counts, min/max, and an
  * equi-width histogram (what an optimizer's ANALYZE collects, and what
  * data-quality gates alert on). The profile is computed from ONE melt
  * of the table — each row explodes into (column, value) pairs at the
  * scan, so the table is read once however many columns are profiled —
  * followed by two keyed aggregations:
  *
  *  - scalar stats groupBy(column): only ~#columns groups, but every
  *    aggregate here (count/sum/min/max) partial-aggregates map-side,
  *    so each task emits #columns rows and the single-reducer funnel a
  *    low-cardinality rank window would have does not arise; the exact
  *    distinct count expands to a (column, value) pre-aggregation whose
  *    cardinality is #columns × ndv — shuffle-distributed by value.
  *  - histogram groupBy(column, bucket): bucket is a pure arithmetic
  *    expression over the broadcast per-column [min, max] (IEEE -, ×8
  *    (exact power-of-two scale), ÷ are each correctly rounded, so both
  *    engines derive bit-identical bucket ids), partial-aggregated the
  *    same way.
  *
  * Output long form: (col_name, stat, val) with stat ∈ {n, nulls, ndv,
  * min, max, b0..b{buckets-1}} and val double (counts are exact in
  * doubles far past any real table's row count).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], buckets: Int = 8): DataFrame = {
    val long = df.select(inline(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)))
    val stats = long.groupBy(col("col_name")).agg(
      count(col("v")).cast("double").as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).cast("double").as("nulls"),
      countDistinct(col("v")).cast("double").as("ndv"),
      min(col("v")).as("min"),
      max(col("v")).as("max"))
    val scalarStats = stats.select(col("col_name"),
      explode(map(
        lit("n"), col("n"), lit("nulls"), col("nulls"),
        lit("ndv"), col("ndv"), lit("min"), col("min"),
        lit("max"), col("max"))).as(Seq("stat", "val")))
    val mm = stats.select(col("col_name"), col("min").as("mn"), col("max").as("mx"))
    val bucket = least(lit(buckets - 1),
      floor((col("v") - col("mn")) * lit(buckets.toDouble) / (col("mx") - col("mn")))
        .cast("long"))
    val hist = long.filter(col("v").isNotNull)
      .join(broadcast(mm), "col_name")
      .select(col("col_name"),
        concat(lit("b"), when(col("mx") === col("mn"), lit(0L))
          .otherwise(bucket).cast("string")).as("stat"))
      .groupBy(col("col_name"), col("stat"))
      .agg(count(lit(1)).cast("double").as("val"))
    scalarStats.unionByName(hist)
  }
}
