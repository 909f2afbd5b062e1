package graft.build

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.sources.Gexf

/** Golden-fixture test of the GEXF→graph pipeline (FIXTURES.md §1): Δ=20 s,
  * START=990, STOP=1100 → 6 dense frames; expectations hand-computed from the
  * reference's discretization rule (`load_gexf_to_neo4j.py:69-71`). */
class GraphBuilderSpec extends SparkSpec {

  private lazy val spells =
    Gexf.readSpells(spark, getClass.getResource("/golden.gexf").getPath)
  private lazy val g = GraphBuilder.fromSpells(spark, spells, delta = 20L)

  test("GEXF parse finds all node and edge spells") {
    assert(spells.filter("kind = 'node'").count() == 6)
    assert(spells.filter("kind = 'edge'").count() == 5) // incl. duplicate pair
  }

  test("dense frame enumeration covers [START, STOP) including empty slots") {
    val frames = g.frames.orderBy("frame_id").collect()
    assert(frames.length == 6) // ceil((1100-990)/20)
    assert(frames.map(_.getLong(0)).toSeq == (0L to 5L))
    // frame 3 [1050,1070) has no edge activity but still exists
    assert(g.frames.filter("frame_id = 3").count() == 1)
  }

  test("undirected canonicalization: actor1 < actor2 everywhere, pairs deduped") {
    assert(g.interactions.filter("actor1 >= actor2").count() == 0)
    assert(g.interactions.count() == 4) // (1,2) (3,5) (1,3) (4,6)
  }

  test("discretization snaps spells to the Δ-grid anchored at START") {
    // edge (1,2) spell [1000,1040) → grid slot 990 → frames 0,1,2
    val f12 = g.frameInteractions
      .filter("actor1 = 1 AND actor2 = 2").select("frame_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(f12 == Seq(0L, 1L, 2L))
    // edge (3,5) spell [995,1005) fits inside frame 0 only
    val f35 = g.frameInteractions
      .filter("actor1 = 3 AND actor2 = 5").select("frame_id")
      .collect().map(_.getLong(0)).toSeq
    assert(f35 == Seq(0L))
    // duplicate overlapping spells of (1,3) collapse to one frame-1 row
    val f13 = g.frameInteractions
      .filter("actor1 = 1 AND actor2 = 3").collect()
    assert(f13.map(r => r.getLong(r.fieldIndex("frame_id"))).toSeq == Seq(1L))
    // edge (4,6) spell [1080,1100) → frames 4,5
    val f46 = g.frameInteractions
      .filter("actor1 = 4 AND actor2 = 6").select("frame_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(f46 == Seq(4L, 5L))
  }

  test("node activity: unaligned spell [1010,1030) lands exactly in frame 1") {
    val f3 = g.frameActors.filter("actor_id = 3").select("frame_id")
      .collect().map(_.getLong(0)).toSeq
    assert(f3 == Seq(1L))
  }

  test("actor catalog uses reference-style zero-padded names") {
    val names = g.actors.orderBy("actor_id").collect()
      .map(_.getString(1)).toSeq
    assert(names == Seq("ACTOR_0001", "ACTOR_0002", "ACTOR_0003",
      "ACTOR_0004", "ACTOR_0005", "ACTOR_0006"))
  }

  test("round-trips through partitioned parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    GraphBuilder.write(g, dir)
    val back = GraphBuilder.read(spark, dir)
    assert(back.frames.count() == 6)
    assert(back.interactions.count() == 4)
    assert(back.frameInteractions.count() == 7)
    assert(back.frameActors.count() == g.frameActors.count())
    // date-part partition columns survive for pruning
    assert(back.frames.columns.contains("year"))
  }

  test("typed Dataset views encode the model case classes") {
    val fs = g.typedFrames.collect()
    assert(fs.length == 6 && fs.map(_.frame_id).sorted.toSeq == (0L to 5L))
    assert(fs.forall(f => f.length == 20L && f.year > 1900))
    assert(g.typedActors.collect().map(_.name).forall(_.startsWith("ACTOR_")))
    assert(g.typedInteractions.collect().forall(i => i.actor1 < i.actor2))
    assert(g.typedFrameInteractions.collect().forall(_.weight == 1L))
    assert(g.typedFrameActors.count() == g.frameActors.count())
    // and over the at-rest read-back layout
    val dir = java.nio.file.Files.createTempDirectory("graft-typed").toString
    GraphBuilder.write(g, dir)
    val back = GraphBuilder.read(spark, dir)
    assert(back.typedFrames.collect().map(_.frame_id).sorted.toSeq == (0L to 5L))
    assert(back.typedFrameInteractions.count() == 7)
  }
}
