package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: every oracle key must name a real
  * query, and every query must at least ANALYZE against the smallest
  * fixture (catches column typos and wiring errors without running the
  * full correctness gate). */
class ContractSpec extends AnyFunSuite with SparkTestBase {

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("all queries analyze against sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").schema; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
