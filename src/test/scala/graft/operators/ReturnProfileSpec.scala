package graft.operators

import graft.SparkSpec

/** a17 return-time profile: structural invariants — every gap exceeds
  * the sessionize threshold by construction (a shorter gap would have
  * been the SAME session), quantiles are ordered, and the gap count
  * recomposes from the declared a02 session table. */
class ReturnProfileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("gaps exceed the session threshold; quantiles ordered; count recomposes") {
    val r = SessionQueries.queries("a17_return_profile")(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    val (nGaps, vMin, vMax, mean) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
    val qs = (5 to 9).map(row.getLong)
    // sessionize gap threshold: anything ≤ it is the same session
    assert(vMin > 1800L, s"min return gap $vMin must exceed the 1800 s threshold")
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b }, s"quantiles ordered: $qs")
    assert(vMin <= qs.head && qs.last <= vMax)
    assert(mean >= vMin && mean <= vMax)
    // recompose the count from the declared a02 sessions: gaps = sessions − users
    val sess = SessionQueries.queries("a02_sessionize")(spark, dir).collect()
    val nSessions = sess.length.toLong
    val nUsers = sess.map(_.getLong(0)).distinct.length.toLong
    assert(nGaps == nSessions - nUsers,
      s"gap count $nGaps != sessions $nSessions - users $nUsers")
  }
}
