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

  test("query numbers are contiguous 1..N (dense bench-line invariant)") {
    // Bench.compactLine ships VALUES ONLY and implies the keys from
    // this contiguity; a gap or duplicate would silently shift every
    // later query's recorded timing, so it is pinned here.
    val nums = SparkEntry.queries.keySet.toSeq
      .map(n => n.drop(1).takeWhile(_.isDigit).toInt).sorted
    assert(nums == (1 to nums.size), {
      val missing = (1 to nums.max).toSet -- nums.toSet
      val dupes = nums.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      s"non-contiguous query numbers: missing=$missing dupes=$dupes"
    })
  }

  test("Verify.dynamicKeys matches the keys dynamicOracleSql emits") {
    // The r10 wart: q141 was missing from the list, so a subset verify
    // run never generated its oracle and silently degraded it to
    // rows-only. Pin the list to the live map (sf0.001 — cells72 = 4
    // there, so the conditional q72/q141 entries are present).
    val emitted = SparkEntry.dynamicOracleSql(spark, "/root/testdata/sf0.001").keySet
    assert(emitted == Verify.dynamicKeys.toSet,
      s"missing from dynamicKeys: ${emitted -- Verify.dynamicKeys.toSet}; " +
        s"stale in dynamicKeys: ${Verify.dynamicKeys.toSet -- emitted}")
  }

  test("AUDIT.json covers exactly the declared query surface") {
    // The r11 wart: q194 landed after the audit regen, so AUDIT.json
    // shipped 193/194 plans. Pin the committed audit's key set to the
    // live query map so a late-added query can never miss the plan
    // audit again. Cheap textual extraction (no JSON lib on the test
    // classpath): every query name appears as a quoted key of the
    // "queries" object.
    val audit = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("AUDIT.json")), "UTF-8")
    // anchored to OBJECT-valued keys ("qN_...": {) so a future string
    // field naming a query can't satisfy the pin for an unaudited one
    val audited = "\"(q\\d+_[A-Za-z0-9_]+)\"\\s*:\\s*\\{".r
      .findAllMatchIn(audit).map(_.group(1)).toSet
    val declared = SparkEntry.queries.keySet
    assert(audited == declared,
      s"missing from AUDIT.json: ${declared -- audited}; " +
        s"stale in AUDIT.json: ${audited -- declared}")
  }

  test("compact bench line fits the driver tail at 350 queries") {
    // The driver keeps the last 2000 bytes of sbt stdout and the
    // [success] epilogue eats ~75; simulate a 350-query sweep (head
    // room past the current 265-query surface) with worst-ish-case
    // values (4-digit centiseconds) plus errors and assert the line
    // still fits AND round-trips through a JSON parse back to the
    // right (query -> centis) assignment.
    val centis: Seq[(String, Option[Long])] = (1 to 350).map { i =>
      val v = if (i % 50 == 0) None else Some(1000L + i) // 10s-ish each
      (f"q$i%02d_synthetic_name_$i", v)
    }
    val line = Bench.compactLine(9999.999, centis, "sf0.1",
      passRatio = 1.45, loadStart = 31.72, loadEnd = 0.14)
    assert(line.length <= 1925, s"compact line ${line.length} bytes > 1925")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(line)
    assert(node.get("first").asInt == 1 && node.get("n").asInt == 350)
    val qv = node.get("qv")
    assert(qv.size == 350)
    assert(qv.get(102).asLong == 1103L) // q103 = qv[103-first]
    assert(qv.get(49).asLong == -1L)    // q50 errored
    assert(node.get("errors").size == 7)
    assert(node.get("errors").get(0).asInt == 50) // errors carry numbers
    // hot-box self-description (r17): pass ratio + loadavg pair, both
    // clamped-width one-decimal in the compact form (full precision
    // stays in bench.json)
    assert(node.get("p12").asDouble == 1.5) // 1.45 rounded half-up
    assert(node.get("ld").get(0).asDouble == 31.7 &&
      node.get("ld").get(1).asDouble == 0.1)
    // a non-contiguous subset (SPARK_GRAFT_ONLY) must fall back to
    // explicit keys rather than mis-assign values
    val subset = Bench.compactLine(1.0,
      Seq("q104_citation_hits" -> Some(250L), "q107_skew" -> Some(80L)), "sf0.1")
    val sn = om.readTree(subset)
    assert(sn.get("qv") == null)
    assert(sn.get("queries").get("104").asLong == 250L)
    assert(sn.get("queries").get("107").asLong == 80L)
  }
}
