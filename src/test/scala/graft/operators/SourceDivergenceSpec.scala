package graft.operators

import graft.SparkSpec

/** tx21 source divergence: planted distributions — identically-distributed
  * sources have EXACTLY zero TV distance, a lexically disjoint source hits
  * the closed form `1 − m_s/N`, and the absent-word identity recomposes a
  * hand-computed mixed case bit-exactly. */
class SourceDivergenceSpec extends SparkSpec {

  private def run(posting: Seq[(Long, String, Long)], src: Seq[(Long, String)]) = {
    import spark.implicits._
    TextQueries.divergenceOf(
      posting.toDF("doc_id", "t", "tf"),
      src.toDF("doc_id", "source"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("identical source distributions give exactly zero TV") {
    // both sources: 3x 'a', 1x 'b' — each equals the corpus distribution
    val out = run(
      Seq((1L, "a", 3L), (1L, "b", 1L), (2L, "a", 3L), (2L, "b", 1L)),
      Seq((1L, "web"), (2L, "book")))
    assert(out("web") == ((4L, 0L, 0.0)))
    assert(out("book") == ((4L, 0L, 0.0)))
  }

  test("a lexically disjoint source hits the closed form 1 - m_s/N") {
    // web: 6 tokens of {a,b}; alien: 2 tokens of {z} — disjoint vocab.
    // TV(alien) = 1 - 2/8 = 3/4; TV(web) = 1 - 6/8 = 1/4.
    val out = run(
      Seq((1L, "a", 4L), (1L, "b", 2L), (2L, "z", 2L)),
      Seq((1L, "web"), (2L, "alien")))
    val (mA, numA, tvA) = out("alien")
    assert(mA == 2L && tvA == 0.75)
    // tv_num = 2 * N * m_s * tv = 2*8*2*(3/4) = 24
    assert(numA == 24L)
    val (mW, numW, tvW) = out("web")
    assert(mW == 6L && tvW == 0.25 && numW == 24L)
  }

  test("the absent-word identity recomposes a hand-computed mixed case") {
    // corpus: a->5 (web 4, book 1), b->3 (book 3). N=8, m_web=4, m_book=4.
    // sum over ALL words of |c_sw*N - C_w*m_s|:
    //  web:  |4*8-5*4| + |0*8-3*4| = 12 + 12 = 24 -> tv = 24/(2*8*4) = 3/8
    //  book: |1*8-5*4| + |3*8-3*4| = 12 + 12 = 24 -> tv = 3/8
    val out = run(
      Seq((1L, "a", 4L), (2L, "a", 1L), (2L, "b", 3L)),
      Seq((1L, "web"), (2L, "book")))
    assert(out("web") == ((4L, 24L, 0.375)))
    assert(out("book") == ((4L, 24L, 0.375)))
  }
}
