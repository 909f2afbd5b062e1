package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** dd13 SemDeDup semantics on a corpus WITH planted semantic duplicates —
  * the driver testdata plants none (max pairwise cosine ≈ 0.51), so the
  * declared query's drop path only fires here: tight planted clusters must
  * lose everything but their lowest id, and the engine must agree with a
  * brute-force within-cell reference computed from its own cell layout. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 48

  /** Near-one-hot vector per id: unique dominant coordinate per spread id,
    * so distinct spread vectors are orthogonal by construction (no
    * accidental near-dups — a structured low-dim generator produced
    * cosine ≥ 0.9 collisions among "unique" vectors in the first cut). */
  private def vec(seed: Long): Array[Float] = {
    val a = Array.fill(dim)(0.0f)
    a((seed % dim).toInt) = 1.0f
    a
  }

  /** `base` with one coordinate nudged — cosine to `base` ≥ 0.99. */
  private def nearDup(base: Array[Float], eps: Float): Array[Float] = {
    val c = base.clone(); c(0) = c(0) + eps; c
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("semdedup").toString
    // spread occupies coordinates 7..46; the planted bases take 0/1/2 so no
    // group accidentally duplicates a spread vector
    val spread = (0L until 40L).map(i => (i, vec(i + 7)))
    // three planted tight clusters at high ids (monotone-append contract):
    // sizes 3 / 2 / 2, members within cosine ≥ 0.99 of their base
    val g1 = Seq((100L, vec(0)), (101L, nearDup(vec(0), 0.01f)),
      (102L, nearDup(vec(0), 0.02f)))
    val g2 = Seq((200L, vec(1)), (201L, nearDup(vec(1), 0.01f)))
    val g3 = Seq((300L, vec(2)), (301L, nearDup(vec(2), 0.01f)))
    (spread ++ g1 ++ g2 ++ g3).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("planted tight clusters keep exactly their lowest id") {
    val out = DedupQueries.queries("dd13_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == 47)
    // every planted non-representative is dropped; each representative kept
    assert(out(100L) && !out(101L) && !out(102L), "g1: keep 100, drop 101/102")
    assert(out(200L) && !out(201L), "g2: keep 200, drop 201")
    assert(out(300L) && !out(301L), "g3: keep 300, drop 301")
    // the spread region is semantically unique — nothing dropped there
    assert((0L until 40L).forall(out(_)), "spread vectors must all be kept")
  }

  test("engine agrees with a brute-force within-cell reference") {
    val rows = DedupQueries.queries("dd13_semdedup")(spark, dir).collect()
    val cells = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { r =>
      val (id, kept) = (r.getLong(0), r.getBoolean(3))
      val lower = cells.keys.filter(o => o < id && cells(o) == cells(id))
      val expMax = lower.map(o => cos(embs(id), embs(o))).maxOption
      val gotMax = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      // decimal-exact engine cosine vs double reference: compare loosely
      (expMax, gotMax) match {
        case (None, None) =>
        case (Some(e), Some(g)) => assert(math.abs(e - g) < 1e-6, s"max_sim of $id")
        case other => fail(s"max_sim presence mismatch for $id: $other")
      }
      assert(kept == expMax.forall(_ < 0.9), s"keep decision of $id")
    }
  }

  test("dd14 online verdicts: batch dups of INDEXED content drop; batch-only ignored") {
    val out = DedupQueries.queries("dd14_online_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // only vec_id % 10 == 0 rows are the batch
    assert(out.keySet.forall(_ % 10 == 0))
    // planted bases 100/200/300 are batch rows whose near-dups (101/102,
    // 201, 301) are corpus-side: each must be flagged as an arriving dup
    assert(out(100L) && out(200L) && out(300L),
      "batch vectors duplicating indexed content must be flagged")
    // spread batch rows (0/10/20/30) are orthogonal to everything — clean
    assert(Seq(0L, 10L, 20L, 30L).forall(id => !out(id)),
      "semantically unique batch vectors must pass")
  }
}
