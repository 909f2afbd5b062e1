package graft.operators

import graft.SparkSpec

/** Span semantics of the windowed-hash substring dedup (dd11/dd12) on a
  * hand-crafted corpus where every maximal span is known: cross-document
  * repeats, WITHIN-document repeats, overlapping-window merge, the
  * gap-boundary between one merged span and two, and sub-window documents.
  * The DuckDB oracle proves Spark-vs-SQL agreement; this spec pins the
  * SEMANTICS both engines are supposed to share. */
class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  // d1/d2 share "x1..x6" (6 tokens → 2 overlapping windows) and "q1..q5"
  // (5 tokens → 1 window). In d1 the two covered regions [1,6] and [7,11]
  // are ADJACENT → one maximal span; in d2 a lone z9 separates them and the
  // dup-start gap (8 − 2 = 6 > WinW) must split the islands. d3 is shorter
  // than one window and must vanish. d4 repeats "r1..r5" WITHIN one
  // document — both occurrences are duplicated spans.
  private val docs = Seq(
    (1L, "x1 x2 x3 x4 x5 x6 q1 q2 q3 q4 q5"),
    (2L, "x1 x2 x3 x4 x5 x6 z9 q1 q2 q3 q4 q5"),
    (3L, "u1 u2 u3 u4"),
    (4L, "r1 r2 r3 r4 r5 s0 r1 r2 r3 r4 r5")
  ).toDF("doc_id", "text")

  private lazy val spans =
    DedupQueries.spanRowsOf(DedupQueries.windowRowsOf(docs))
      .orderBy($"doc_id", $"span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("maximal spans: cross-doc, within-doc, overlap merge, gap split") {
    assert(spans == Seq(
      (1L, 1L, 11L, 11L, 3L), // adjacent covered regions merge: one maximal span
      (2L, 1L, 6L, 6L, 2L),   // x1..x6: two overlapping windows merged
      (2L, 8L, 12L, 5L, 1L),  // gap 6 > WinW: islands must not merge
      (4L, 1L, 5L, 5L, 1L),   // within-doc repeat: both occurrences are spans
      (4L, 7L, 11L, 5L, 1L)))
  }

  test("documents shorter than one window produce no rows anywhere") {
    assert(!spans.exists(_._1 == 3L))
    val win = DedupQueries.windowRowsOf(docs.filter($"doc_id" === 3L))
    assert(win.count() == 0)
  }

  test("dup stats: fraction over token count, keep decided at the threshold") {
    val stats = DedupQueries.dupStatsOf(docs,
        DedupQueries.spanRowsOf(DedupQueries.windowRowsOf(docs)))
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    assert(stats == Seq(
      (1L, 11L, 11L, 1.0, false),          // fully duplicated → drop
      (2L, 12L, 11L, 11.0 / 12.0, false),
      (3L, 4L, 0L, 0.0, true),             // sub-window doc keeps by construction
      (4L, 11L, 10L, 10.0 / 11.0, false)))
  }

  test("a document with no duplicated windows keeps with zero fraction") {
    val lonely = Seq((9L, "a1 a2 a3 a4 a5 a6 a7")).toDF("doc_id", "text")
    val all = docs.union(lonely)
    val stats = DedupQueries.dupStatsOf(all,
        DedupQueries.spanRowsOf(DedupQueries.windowRowsOf(all)))
      .filter($"doc_id" === 9L).collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0 && r.getBoolean(4))
  }

  test("dd18 boilerplate: cross-source templates flag, single-source repeats don't") {
    // template "t1..t5" appears once in THREE sources → boilerplate.
    // "u1..u5" repeats heavily but only inside source srcA → NOT
    // boilerplate (that's dd12's axis, not dd18's). doc 40 is pure unique
    // content in a third source.
    val docs = Seq(
      (10L, "t1 t2 t3 t4 t5 a1 a2 a3 a4 a5", "srcA"),
      (20L, "b1 b2 b3 b4 b5 t1 t2 t3 t4 t5", "srcB"),
      (30L, "t1 t2 t3 t4 t5 c1 c2 c3 c4 c5", "srcC"),
      (11L, "u1 u2 u3 u4 u5 d0 u1 u2 u3 u4 u5", "srcA"),
      (12L, "u1 u2 u3 u4 u5 e0 e1 e2 e3 e4", "srcA"),
      (40L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f0", "srcC")
    ).toDF("doc_id", "text", "source")
    val stats = DedupQueries.boilerplateStatsOf(docs, DedupQueries.windowRowsOf(docs))
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(stats(10L) == ((5L, true)), "template covers 5 of 10 tokens, at the keep line")
    assert(stats(20L) == ((5L, true)))
    assert(stats(30L) == ((5L, true)))
    assert(stats(11L) == ((0L, true)), "within-source repetition is not boilerplate")
    assert(stats(12L) == ((0L, true)))
    assert(stats(40L) == ((0L, true)), "unique content untouched")
    // sharpen: a doc that is MOSTLY template must drop
    val docs2 = docs.union(Seq(
      (50L, "t1 t2 t3 t4 t5 z9", "srcA")).toDF("doc_id", "text", "source"))
    val dropped = DedupQueries.boilerplateStatsOf(docs2, DedupQueries.windowRowsOf(docs2))
      .filter($"doc_id" === 50L).collect().head
    assert(dropped.getLong(2) == 5L && !dropped.getBoolean(4),
      "5/6 template tokens must cross BoilerTau and drop")
  }
}
