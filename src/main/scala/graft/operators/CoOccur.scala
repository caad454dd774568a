package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-membership graph extraction — the reference's coauthor-edge spine
  * (G1/G3/G4/G6, SURVEY.md §2.9).
  *
  * The reference builds (ego, year, alter) coauthor edges two ways:
  * collect_list-then-explode (`PersonalNet_2.scala:88-98`) and a pure
  * self-join (`PySparkles.ipynb` cell 35). We implement ONLY the
  * self-join form: at 100 TB a mega-group's member list does not fit in
  * one row, while the self-join shuffles both sides by the group key and
  * streams pairs out of a co-partitioned sort-merge join. Skewed hyper
  * -groups are handled by AQE skew-join splitting (enabled in session
  * conf), matching the reference's own cap convention
  * (`StaticNet.scala:314`).
  */
object CoOccur {

  /** Distinct unordered co-membership pairs per group: (group, a, b),
    * a < b. Input is deduplicated to (group, member) grain first so a
    * member appearing twice in a group (e.g. a supplier on two lines of
    * one order) contributes one pair. */
  def pairs(df: DataFrame, group: String, member: String): DataFrame = {
    val m = df.select(col(group), col(member)).distinct()
    val a = m.select(col(group), col(member).as("a"))
    val b = m.select(col(group), col(member).as("b"))
    a.join(b, Seq(group)).filter(col("a") < col("b"))
  }

  /** Weighted edges: number of distinct groups shared by each pair —
    * the reference's papersTogether (`StaticNet.scala:238-243`). */
  def weightedEdges(df: DataFrame, group: String, member: String): DataFrame =
    pairs(df, group, member)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("weight"))

  /** First-co-occurrence edges: min of a period attribute per pair —
    * the reference's first-collaboration year
    * (`PersonalNet_2.scala:125`). `periods` maps group → period. */
  def firstPeriodEdges(df: DataFrame, periods: DataFrame, group: String,
                       member: String, period: String): DataFrame =
    pairs(df, group, member)
      .join(periods, group)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("weight"), min(col(period)).as("first_" + period))

  /** Personal-network closure (G3+G4, `PersonalNet_2.scala:128-136`):
    * for each ego, unordered pairs of its neighbors that are themselves
    * connected; pair year = max of the three first-contact years
    * (`greatest`, reference `PersonalNet_2.scala:130,135`).
    *
    * `edges` must be (a, b, year) with a < b. Symmetrized in here so
    * every vertex acts as ego. */
  def personalNet(edges: DataFrame, a: String = "a", b: String = "b",
                  year: String = "year"): DataFrame = {
    val fwd = edges.select(col(a).as("ego"), col(b).as("alter"), col(year).as("y"))
    val rev = edges.select(col(b).as("ego"), col(a).as("alter"), col(year).as("y"))
    val adj = fwd.unionByName(rev)
    val c1 = adj.select(col("ego"), col("alter").as("a1"), col("y").as("y1"))
    val c2 = adj.select(col("ego"), col("alter").as("a2"), col("y").as("y2"))
    val alterPairs = c1.join(c2, Seq("ego")).filter(col("a1") < col("a2"))
      .select(col("ego"), col("a1"), col("a2"),
        greatest(col("y1"), col("y2")).as("py"))
    alterPairs
      .join(edges.select(col(a).as("a1"), col(b).as("a2"), col(year).as("ey")),
        Seq("a1", "a2"))
      .select(col("ego"), col("a1"), col("a2"),
        greatest(col("py"), col("ey")).as(year))
  }
}
