package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential test of the distributed BPE trainer against an independent
  * single-machine reference (same conventions: overlap-counting zip pair
  * stats, count-desc-then-lexicographic argmax, greedy left-to-right
  * application), plus the declared-query tie-ins. */
class BpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent reference trainer — deliberately NOT sharing code with
    * BpeTrainer beyond the conventions under test. */
  private def refTrain(words0: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    def apply1(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: apply1(rest, l, r)
      case a :: rest => a :: apply1(rest, l, r)
      case Nil => Nil
    }
    // code-point split, the shared convention (independent of the trainer's)
    var words = words0.toList.map { case (w, c) =>
      (w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))), c)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; win <- syms.sliding(2) if win.length == 2)
        counts((win(0), win(1))) = counts.getOrElse((win(0), win(1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) =
          counts.toSeq.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        out += ((l, r, c))
        words = words.map { case (syms, cc) => (apply1(syms, l, r), cc) }
        i += 1
      }
    }
    out.result()
  }

  test("distributed trainer matches the reference on the classic corpus") {
    import spark.implicits._
    val text = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val docs = Seq(text).toDF("text")
    val got = BpeTrainer.train(docs, 6).map(m => (m.lhs, m.rhs, m.pairCount))
    val want = refTrain(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    assert(got == want)
  }

  test("distributed trainer matches the reference on the driver corpus") {
    import spark.implicits._
    val wordCounts = graft.sources.Tables.documents(spark, dir)
      .select(explode(TextQueries.wsTokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = BpeTrainer.train(graft.sources.Tables.documents(spark, dir), 5)
      .map(m => (m.lhs, m.rhs, m.pairCount))
    assert(got == refTrain(wordCounts, 5))
  }

  test("tx11's top pair is the trainer's first merge") {
    val top = TextQueries.queries("tx11_bpe_pairs")(spark, dir).head()
    val first = BpeTrainer.train(graft.sources.Tables.documents(spark, dir), 1).head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      (first.lhs, first.rhs, first.pairCount))
  }

  test("tx12 emits the merge table in rank order with positive counts") {
    val rows = TextQueries.queries("tx12_bpe_merges")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq)
    assert(rows.forall(_.getLong(3) > 0L))
  }

  test("non-BMP symbols survive as whole code points, matching the tx11 engine") {
    import spark.implicits._
    // U+1F642 is a surrogate pair in UTF-16: a UTF-16-unit split would
    // shear it and disagree with Spark's code-point substring in tx11
    val docs = Seq("🙂x 🙂x 🙂y").toDF("text")
    val first = BpeTrainer.train(docs, 1).head
    assert((first.lhs, first.rhs, first.pairCount) == ("🙂", "x", 2L))
    // tx11's pair stats over the same frame agree (Spark-side substring)
    val words = docs.select(explode(TextQueries.wsTokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
    val top = words.filter(length($"w") >= 2)
      .select($"wc", explode(sequence(lit(1), length($"w") - 1)).as("i"), $"w")
      .select(expr("substring(w, i, 1)").as("lhs"),
        expr("substring(w, i + 1, 1)").as("rhs"), $"wc")
      .groupBy($"lhs", $"rhs").agg(sum($"wc").as("pair_count"))
      .orderBy(desc("pair_count"), $"lhs", $"rhs").limit(1).head()
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      (first.lhs, first.rhs, first.pairCount))
  }

  test("tx13 per-doc BPE token counts match a driver-side re-encode") {
    import spark.implicits._
    val merges = TextQueries.trainedMerges(spark, dir)
    val docToks = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", TextQueries.wsTokens($"text").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = TextQueries.queries("tx13_bpe_encode")(spark, dir).collect()
    assert(got.length == docToks.size)
    got.foreach { r =>
      val ts = docToks(r.getLong(0))
      assert(r.getLong(1) == ts.length.toLong, s"ws_tokens for doc ${r.getLong(0)}")
      val bpe = ts.map(w => BpeTrainer.encode(w, merges).length.toLong).sum
      assert(r.getLong(2) == bpe, s"bpe_tokens for doc ${r.getLong(0)}")
    }
    // the trained merges FUSE on this corpus (they were argmaxed on it):
    // corpus-wide BPE tokens strictly under the code-point total
    val sumChars = docToks.values.flatten
      .map(w => w.codePointCount(0, w.length).toLong).sum
    val sumBpe = got.map(_.getLong(2)).sum
    assert(sumBpe < sumChars, s"no merge ever applied: $sumBpe vs $sumChars")
  }

  test("encode applies merges greedily and preserves the word's characters") {
    val merges = Seq(
      BpeTrainer.Merge(0, "e", "s", 9L),
      BpeTrainer.Merge(1, "es", "t", 9L))
    assert(BpeTrainer.encode("newest", merges) == Seq("n", "e", "w", "est"))
    assert(BpeTrainer.encode("best", merges).mkString == "best")
    assert(BpeTrainer.encode("", merges).isEmpty)
  }
}
