package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scan-level scale evidence: filters must reach the parquet scan
  * (PushedFilters) and projections must prune the read schema
  * (Output [n]) — at 100 TB a scan that reads all 16 lineitem columns
  * for a 4-column query, or decodes row groups a pushed range would
  * skip, is the difference between touching 100 TB and touching the
  * needed slice. Pinned on the live FORMATTED plans (toString truncates
  * the pushed-filter list) so a refactor that silently breaks pushdown
  * (a cast before the filter, a UDF wrapper, a non-pushable expression)
  * fails HERE, not in a cluster bill. */
class ScanPushdownSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q06: all three range predicates push to the lineitem scan and " +
       "the read schema prunes 16 columns to 4") {
    val p = plan("q06_forecast_revenue")
    // predicate pushdown: every conjunct reaches the scan
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1996-01-01"), p)
    assert(p.contains("LessThan(l_shipdate,1997-01-01"), p)
    assert(p.contains("GreaterThanOrEqual(l_discount,0.02)"), p)
    assert(p.contains("LessThanOrEqual(l_discount,0.06)"), p)
    assert(p.contains("LessThan(l_quantity,24.0)"), p)
    // column pruning: only the 4 referenced columns are read
    val out = p.linesIterator.find(_.startsWith("Output [4]"))
      .getOrElse(fail(s"lineitem scan reads more than 4 columns:\n$p"))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .foreach(c => assert(out.contains(c), out))
    assert(!p.contains("l_comment"), "l_comment read but never used")
  }

  test("q02: conjunction, disjunction, and contains ALL push to the " +
       "part scan (StringContains included)") {
    val p = plan("q02_parts_filter")
    assert(p.contains("GreaterThanOrEqual(p_size,10)"), p)
    assert(p.contains("LessThanOrEqual(p_size,20)"), p)
    assert(p.contains("Or(EqualTo(p_type,SMALL),EqualTo(p_type,ECONOMY))"), p)
    assert(p.contains("StringContains(p_name,bolt)"), p)
    assert(!p.contains("p_container") && !p.contains("p_comment"), p)
  }

  test("documents text queries prune to the referenced columns") {
    // q24's dup-key grouping needs only (doc_id, text) of the 5 columns
    val p = plan("q24_dedup_prefix")
    val out = p.linesIterator.find(_.startsWith("Output [2]"))
      .getOrElse(fail(s"documents scan reads more than 2 columns:\n$p"))
    assert(out.contains("doc_id") && out.contains("text"), out)
    assert(!p.contains("n_chars") && !p.contains("lang"), p)
  }
}
