package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Exact.dsum
import graft.functions.VectorOps.{cosineExact, hyperSig}
import graft.sources.Tables

/** Differential tests: the native expressions must reproduce the explode +
  * decimal-sum construction BIT-FOR-BIT — that construction is the one the
  * DuckDB oracle mirrors, so exact agreement here is what guarantees the
  * driver's hash-match (Exact.scala determinism contract). */
class VectorOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def unnested: DataFrame = {
    val s = spark
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", ($"pos" + 1).as("pos"), $"col".cast("double").as("e"))
  }

  test("cosineExact matches the posexplode + dsum cosine bit-for-bit") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val probe = e.orderBy($"vec_id").limit(1)
      .select($"vec_id".as("pid"), $"embedding".as("pemb"))

    val native = e.crossJoin(broadcast(probe)).filter($"vec_id" =!= $"pid")
      .select($"vec_id", cosineExact($"embedding", $"pemb").as("cosine"))

    val ev = unnested
    val pv = ev.join(broadcast(probe.select($"pid")), $"vec_id" === $"pid")
      .select($"pos", $"e".as("pe"))
    val exploded = ev.join(broadcast(pv), "pos")
      .groupBy($"vec_id")
      .agg(dsum($"e" * $"pe").as("dot"), dsum($"e" * $"e").as("nx"), dsum($"pe" * $"pe").as("ny"))
      .select($"vec_id", ($"dot" / (sqrt($"nx") * sqrt($"ny"))).as("cosine"))
      .join(broadcast(probe.select($"pid")), $"vec_id" === $"pid", "left_anti")

    val a = native.orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = exploded.orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case ((id1, c1), (id2, c2)) =>
      assert(id1 == id2)
      // bit-for-bit, not approximate
      assert(java.lang.Double.doubleToLongBits(c1) == java.lang.Double.doubleToLongBits(c2),
        s"cosine mismatch for vec $id1: $c1 vs $c2")
    }
  }

  test("hyperSig signs match the explode + dsum projection construction") {
    val s = spark
    import s.implicits._
    val planes = 32
    val native = Tables.embeddings(s, dir)
      .select($"vec_id", hyperSig($"embedding", planes).as("sig"))

    // sign string rebuilt from the round-1 explode-based projections
    val alt = unnested
      .select($"vec_id", $"pos", $"e", explode(sequence(lit(0), lit(planes - 1))).as("p"))
      .withColumn("r",
        when(substring(md5(concat($"p".cast("string"), lit("_"), $"pos".cast("string"))
          .cast("binary")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1.0))
          .otherwise(lit(-1.0)))
      .groupBy($"vec_id", $"p").agg(dsum($"r" * $"e").as("proj"))
      .groupBy($"vec_id")
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct($"p", $"proj"))),
          x => when(x.getField("proj") >= 0, lit("+")).otherwise(lit("-")))).as("sig"))

    val a = native.orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = alt.orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.length == b.length && a.length > 0)
    assert(a.forall(_._2.length == planes))
    a.zip(b).foreach { case ((id1, s1), (id2, s2)) =>
      assert(id1 == id2)
      assert(s1 == s2, s"signature mismatch for vec $id1: $s1 vs $s2")
    }
  }

  test("termUnscaled fast path equals the exact BigDecimal rounding") {
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 2000000) {
      // float-typical magnitudes plus products and boundary-ish values
      val x = rnd.nextInt(6) match {
        case 0 => (rnd.nextFloat() - 0.5f).toDouble
        case 1 => (rnd.nextFloat() - 0.5f).toDouble * (rnd.nextFloat() - 0.5f).toDouble
        case 2 => (rnd.nextLong() % 100000000000L) / 1e10 + rnd.nextGaussian() * 1e-11
        case 3 => // money-style 2-decimal values and their products (TPC-H sums)
          (rnd.nextInt(20000000) / 100.0) * (if (rnd.nextBoolean()) 1.0
          else rnd.nextInt(100) / 100.0)
        case 4 => // large irregular magnitudes (slow-path territory, within
          // the long-unscaled domain |x| < 9.2e8 of termUnscaled's contract)
          rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 1)
        case _ => rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3)
      }
      assert(VectorOps.termUnscaled(x) == VectorOps.termUnscaledSlow(x),
        s"mismatch at x=$x (bits=${java.lang.Double.doubleToLongBits(x)})")
      i += 1
    }
  }

  test("toDec10 matches Spark's double->decimal(28,10) cast incl. huge values") {
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(50000)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(17))) ++
      Seq(0.0, -0.0, 1.23e15, -9.87654321e14, 4.5e5, 4.50000000001e5)
    cases.foreach { x =>
      val viaCast = org.apache.spark.sql.types.Decimal(
        scala.math.BigDecimal(x), 28, 10)
      assert(Exact.toDec10(x).toJavaBigDecimal.compareTo(viaCast.toJavaBigDecimal) == 0,
        s"toDec10 mismatch at x=$x")
    }
  }

  test("null elements are skipped like SUM's null semantics") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps.{dotExact, normSqExact}
    val df = Seq(1).toDF("one").select(
      expr("array(cast(1.0 as float), cast(null as float), cast(2.0 as float))").as("a"),
      expr("array(cast(3.0 as float), cast(4.0 as float), cast(5.0 as float))").as("b"))
    val r = df.select(dotExact($"a", $"b").as("d"), normSqExact($"a").as("n")).collect()(0)
    assert(r.getDouble(0) == 13.0) // 1*3 + skip + 2*5
    assert(r.getDouble(1) == 5.0)  // 1 + skip + 4
    // mismatched lengths: min-length intersection (mirrors the pos equi-join)
    val df2 = Seq(1).toDF("one").select(
      expr("array(cast(1.0 as float), cast(2.0 as float))").as("a"),
      expr("array(cast(3.0 as float))").as("b"))
    assert(df2.select(dotExact($"a", $"b")).collect()(0).getDouble(0) == 3.0)
  }

  test("hammingDist matches the per-position substring construction") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps.hammingDist
    // fixed cases pin DuckDB hamming() semantics (mismatching-char count)
    val fixed = Seq(("++--", "+-+-", 2), ("++++", "++++", 0), ("+-", "-+", 2))
      .toDF("a", "b", "want")
      .select(hammingDist($"a", $"b").as("got"), $"want").collect()
    fixed.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // differential on real signatures against the naive per-position form
    val planes = 64
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", hyperSig($"embedding", planes).as("sig"))
    val probe = e.orderBy($"vec_id").limit(1).select($"sig".as("psig"))
    val perPos = (1 to planes)
      .map(i => when(substring($"sig", i, 1) === substring($"psig", i, 1), 0).otherwise(1))
      .reduce(_ + _)
    e.crossJoin(broadcast(probe))
      .select(hammingDist($"sig", $"psig").as("h1"), perPos.as("h2"))
      .collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1), s"${r.getInt(0)} vs ${r.getInt(1)}"))
    // unequal lengths throw, mirroring DuckDB's hamming() contract
    intercept[Exception] {
      Seq(("ab", "abc")).toDF("a", "b").select(hammingDist($"a", $"b")).collect()
    }
  }
}
