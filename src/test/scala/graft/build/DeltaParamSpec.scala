package graft.build

import graft.SparkSpec

/** Δ is the reference's frame-length CLI parameter
  * (`load_gexf_to_neo4j.py:45-46`, default 20 s); the engine must derive a
  * consistent graph for any Δ, not just the events-table default. */
class DeltaParamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("EventGraph honors a non-default delta consistently") {
    val fine = new EventGraph(spark, dir, delta = 900L) // 15-minute frames
    val coarse = new EventGraph(spark, dir, delta = 7200L) // 2-hour frames

    val b = fine.bounds.collect()(0)
    val span = b.getLong(1) - b.getLong(0)
    assert(fine.frames.count() == span / 900L + 1)
    assert(coarse.frames.count() == span / 7200L + 1)

    // refining the grid can only split frames: distinct (actor) presence is
    // preserved, total (frame, actor) membership rows can only grow
    val fineFA = fine.frameActors.count()
    val coarseFA = coarse.frameActors.count()
    assert(fineFA >= coarseFA)
    assert(fine.frameActors.select("actor_id").distinct().count() ==
      coarse.frameActors.select("actor_id").distinct().count())

    // canonicalization invariant is Δ-independent
    assert(fine.frameInteractions.filter("actor1 >= actor2").count() == 0)
    assert(coarse.frameInteractions.filter("actor1 >= actor2").count() == 0)

    // run-wide interaction catalog: co-occurrence within a fine frame implies
    // co-occurrence within the containing coarse frame
    val fineI = fine.interactions.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarseI = coarse.interactions.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fineI.subsetOf(coarseI))
  }

  test("GraphCache materializes per-delta layouts independently") {
    val g1 = GraphCache(spark, dir) // default 3600
    val g2 = GraphCache(spark, dir, delta = 7200L)
    assert(g1.path != g2.path)
    assert(g1.delta == 3600L && g2.delta == 7200L)
    assert(g2.frames.count() < g1.frames.count())
    // probes re-derived per grid; bounds identical
    assert(g1.probes.t0 == g2.probes.t0 && g1.probes.t1 == g2.probes.t1)
  }
}
