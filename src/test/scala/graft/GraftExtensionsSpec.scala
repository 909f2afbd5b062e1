package graft

import graft.functions.VectorOps.cosineExact

/** The custom expressions must be reachable from plain SQL after
  * registration, with values identical to the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate identically to the Column API") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)

    Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(3.0f, 2.0f, 1.0f)))
      .toDF("id", "v").createOrReplaceTempView("vecs")

    val sql = s.sql(
      """SELECT a.id, cosine_exact(a.v, b.v) AS c, dot_exact(a.v, b.v) AS d,
        |       norm_sq_exact(a.v) AS n, hyper_sig(a.v, 8) AS sig
        |FROM vecs a JOIN vecs b ON b.id = 2 WHERE a.id = 1""".stripMargin).collect()(0)
    val api = Seq((1L, Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("id", "a", "b")
      .select(cosineExact($"a", $"b")).collect()(0).getDouble(0)
    assert(sql.getDouble(1) == api)
    assert(sql.getDouble(2) == 10.0) // 3+4+3
    assert(sql.getDouble(3) == 14.0) // 1+4+9
    assert(sql.getString(4).length == 8 && sql.getString(4).forall("+-".contains(_)))

    val sh = s.sql(
      "SELECT simhash64(array('a','b')) AS h, dec10(CAST(0.1 AS DOUBLE)) AS d").collect()(0)
    assert(sh.get(0).isInstanceOf[Long])
    assert(sh.getDecimal(1).toPlainString == "0.1000000000")
  }
}
