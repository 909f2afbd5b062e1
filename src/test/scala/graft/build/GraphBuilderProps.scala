package graft.build

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.model.Spell
import graft.timeline.Timeline

/** Property-based invariants (SURVEY.md §5) mirrored from the reference's
  * semantics, checked on randomly generated spell sets:
  *
  *  - discretization covers EXACTLY the Δ-grid slots of each spell, grid
  *    aligned at START (`load_gexf_to_neo4j.py:69-71`) — cross-checked
  *    against an independent Scala transcription of the reference formula;
  *  - canonicalization `actor1 < actor2` always (`:201-202`);
  *  - the frame chain is dense and contiguous incl. empty slots (`:170`);
  *  - timeline range scans keep strictly-exclusive bounds
  *    (`BaseTimeline.java:551,614,658,678`).
  */
object GraphBuilderProps extends Properties("GraphBuilder") {

  // Spark jobs per sample: keep the sample count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.SparkSpec.session
  private val Delta = 20L

  private val edgeSpellGen: Gen[Spell] = for {
    a <- Gen.choose(1L, 8L)
    b <- Gen.choose(1L, 8L) if a != b
    t1 <- Gen.choose(1000L, 1400L)
    len <- Gen.choose(1L, 120L)
  } yield Spell("edge", a, Some(b), t1, t1 + len)

  private val spellsGen: Gen[List[Spell]] = for {
    edges <- Gen.nonEmptyListOf(edgeSpellGen)
    // at least one node spell per endpoint so the actor catalog is complete
    nodes = edges.flatMap(e => Seq(e.src, e.dst.get)).distinct
      .map(a => Spell("node", a, None, 1000L, 1520L))
  } yield nodes ++ edges

  /** Independent transcription of the reference discretization
    * (`get_intervals`, `load_gexf_to_neo4j.py:69-71`). */
  private def referenceSlots(t1: Long, t2: Long, start: Long): Seq[Long] = {
    val grid = t1 - ((t1 - start) % Delta)
    grid.until(t2, Delta).map(s => (s - start) / Delta)
  }

  property("frame memberships equal the reference discretization formula") =
    forAllNoShrink(spellsGen) { spells =>
      import spark.implicits._
      val g = GraphBuilder.fromSpells(spark, spells.toDS(), Delta)
      val start = spells.map(_.t1).min
      val stop = spells.map(_.t2).max
      val nFrames = (stop - start + Delta - 1) / Delta
      val expected = spells.filter(_.kind == "edge").flatMap { sp =>
        referenceSlots(sp.t1, sp.t2, start)
          .filter(f => f >= 0 && f < nFrames)
          .map(f => (f, math.min(sp.src, sp.dst.get), math.max(sp.src, sp.dst.get)))
      }.toSet
      val actual = g.frameInteractions.select("frame_id", "actor1", "actor2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      actual == expected
    }

  property("canonicalization: actor1 < actor2 in every edge row") =
    forAllNoShrink(spellsGen) { spells =>
      import spark.implicits._
      val g = GraphBuilder.fromSpells(spark, spells.toDS(), Delta)
      g.frameInteractions.filter("actor1 >= actor2").count() == 0 &&
        g.interactions.filter("actor1 >= actor2").count() == 0
    }

  property("frame chain is dense and contiguous, empty slots included") =
    forAllNoShrink(spellsGen) { spells =>
      import spark.implicits._
      val g = GraphBuilder.fromSpells(spark, spells.toDS(), Delta)
      val ids = g.frames.select("frame_id").collect().map(_.getLong(0)).sorted.toSeq
      val start = spells.map(_.t1).min
      val stop = spells.map(_.t2).max
      ids == (0L until (stop - start + Delta - 1) / Delta)
    }

  private val boundsGen: Gen[(Long, Long)] = for {
    a <- Gen.choose(0L, 900L)
    b <- Gen.choose(a + 1, 1000L)
  } yield (a, b)

  property("timeline range scans are strictly exclusive on both bounds") =
    forAllNoShrink(Gen.nonEmptyListOf(Gen.choose(0L, 1000L)), boundsGen) { (tss, bounds) =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val (lo, hi) = bounds
      val payload = tss.toDF("secs").withColumn("ts_start", timestamp_seconds(col("secs")))
      val tl = Timeline(payload)
      val after = tl.allAfter(lo).collect().map(_.getLong(0)).toSet
      val before = tl.allBefore(hi).collect().map(_.getLong(0)).toSet
      val between = tl.allBetween(lo, hi).collect().map(_.getLong(0)).toSet
      after == tss.filter(_ > lo).toSet &&
        before == tss.filter(_ < hi).toSet &&
        between == tss.filter(t => t > lo && t < hi).toSet &&
        tl.nodesAt(lo).collect().map(_.getLong(0)).toSet == tss.filter(_ == lo).toSet
    }
}
