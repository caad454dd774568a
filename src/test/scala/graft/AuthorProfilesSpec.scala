package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AuthorProfiles

/** Golden test of the full profile pipeline on a hand-computable
  * MAG-shaped fixture, covering the reference's own edge cases
  * (`AddTestData.scala:81-91`) — a self-citation, citing two papers of
  * one author in the same year, a null publication year — plus
  * pre-minYear history: a 1998 paper and a 1999 citation that must be
  * INCLUDED in the cumulative columns of in-range years
  * (`ProfileConversion.scala` windows before its `year >= minYear`
  * filter) while producing no output row themselves. */
class AuthorProfilesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("profile matches hand-computed bibliometrics") {
    // p0 (1998) and p1,p2 by a1; p3,p5,p6 by a2; p4 coauthored a1+a2;
    // p5 has NULL year; p6 (1999) cites p0 BEFORE the profile range
    val paa = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L), (4L, 2L),
      (5L, 2L), (0L, 1L), (6L, 2L)).toDF("paper", "author")
    val papers = Seq((0L, Some(1998)), (1L, Some(2000)), (2L, Some(2001)),
      (3L, Some(2001)), (4L, Some(2002)), (5L, None), (6L, Some(1999)))
      .toDF("id", "year")
    // p2→p1 is a SELF-citation (a1 cites a1); p3 cites two a1 papers in
    // the same year (p1 and p2); p6→p0 is pre-minYear history
    val refs = Seq((2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 3L),
      (6L, 0L)).toDF("citing", "cited")

    val got = AuthorProfiles.profile(paa, papers, refs, 2000, 2002)
      .as[(Long, Int, Long, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap

    // a1 papers: p0(1998) p1(2000) p2(2001) p4(2002) → cum starts at 2
    // in 2000 (pre-range p0 counted). citations(yr of citing):
    //   1999: p6→p0 = 1 (pre-range, cum only)
    //   2001: p2→p1 + p3→p1 + p3→p2 = 3;  2002: p4→p1 = 1
    // per-paper CUMULATIVE at each year → per-year h-index:
    //   2000: p0=1           → h(1)=1
    //   2001: p0=1 p1=2 p2=1 → h(2,1,1)=1
    //   2002: p0=1 p1=3 p2=1 → h(3,1,1)=1
    assert(got((1L, 2000)) == (1L, 2L, 0L, 1L, 1))
    assert(got((1L, 2001)) == (1L, 3L, 3L, 4L, 1))
    assert(got((1L, 2002)) == (1L, 4L, 1L, 5L, 1))
    // a2: p6(1999), p3(2001), p4(2002), p5(null year → sentinel,
    // outside the bound); only p3 is ever cited (p4→p3 in 2002), so the
    // h-index is 0 until 2002
    assert(got((2L, 2000)) == (0L, 1L, 0L, 0L, 0))
    assert(got((2L, 2001)) == (1L, 2L, 0L, 0L, 0))
    assert(got((2L, 2002)) == (1L, 3L, 1L, 1L, 1))
    assert(got.size == 6) // 2 authors × 3 grid years, sentinel excluded
  }
}
