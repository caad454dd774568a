package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AuthorProfiles

/** Golden test of the full profile pipeline on a hand-computable
  * MAG-shaped fixture, covering the reference's own edge cases
  * (`AddTestData.scala:81-91`): a self-citation, citing two papers of
  * one author in the same year, and a null publication year. */
class AuthorProfilesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("profile matches hand-computed bibliometrics") {
    // p1,p2 by a1; p3 by a2; p4 coauthored a1+a2; p5 has NULL year
    val paa = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L), (4L, 2L), (5L, 2L))
      .toDF("paper", "author")
    val papers = Seq((1L, Some(2000)), (2L, Some(2001)), (3L, Some(2001)),
      (4L, Some(2002)), (5L, None)).toDF("id", "year")
    // p2→p1 is a SELF-citation (a1 cites a1); p3 cites two a1 papers in
    // the same year (p1 and p2)
    val refs = Seq((2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 3L))
      .toDF("citing", "cited")

    val got = AuthorProfiles.profile(paa, papers, refs, 2000, 2002)
      .as[(Long, Int, Long, Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap

    // a1 papers/yr: 2000:1 2001:1 2002:1; citations(yr of citing):
    //   2001: p2→p1 + p3→p1 + p3→p2 = 3;  2002: p4→p1 = 1
    // per-paper totals p1:3 p2:1 p4:0 → h(3,1,0)=1
    assert(got((1L, 2000)) == (1L, 1L, 0L, 0L, 1))
    assert(got((1L, 2001)) == (1L, 2L, 3L, 3L, 1))
    assert(got((1L, 2002)) == (1L, 3L, 1L, 4L, 1))
    // a2: p3(2001), p4(2002), p5(null year → sentinel, outside grid);
    //   citations: p4→p3 in 2002; per-paper totals p3:1 p4:0 p5:0 → h=1
    assert(got((2L, 2000)) == (0L, 0L, 0L, 0L, 1))
    assert(got((2L, 2001)) == (1L, 1L, 0L, 0L, 1))
    assert(got((2L, 2002)) == (1L, 2L, 1L, 1L, 1))
    assert(got.size == 6) // 2 authors × 3 grid years, sentinel excluded
  }
}
