package graft.build

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Gexf

/** The parity-query SHAPES over a GEXF-sourced graph (the reference's actual
  * input format): snapshot membership (C2/C3), activity counts (C4), degree
  * (C10), neighbors (C7), all against hand-computed expectations from the
  * golden fixture — demonstrating the query surface is source-agnostic
  * (events-derived and GEXF-derived graphs share the §1.3 model). */
class GexfParitySpec extends SparkSpec {

  // golden.gexf: Δ=20, START=990 → frames 0..5; edges (1,2)@[1000,1040),
  // (3,5)@[995,1005), (1,3)@[1005,1025)x2 dup, (4,6)@[1080,1100)
  private lazy val g = GraphBuilder.fromSpells(
    spark, Gexf.readSpells(spark, getClass.getResource("/golden.gexf").getPath), 20L)

  test("C2/C3 shape: snapshot membership of one frame") {
    val inFrame0 = g.frameInteractions.filter(col("frame_id") === 0)
      .select("actor1", "actor2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inFrame0 == Set((1L, 2L), (3L, 5L)))
  }

  test("C4 shape: per-actor frame-presence counts") {
    val freq = g.frameActors.groupBy(col("actor_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node spells in golden.gexf put actor 3 in exactly one frame
    assert(freq(3L) == 1L)
  }

  test("C10 shape: degree over canonicalized run-wide interactions") {
    val endpoints = g.interactions.select(col("actor1").as("a"))
      .unionAll(g.interactions.select(col("actor2").as("a")))
    val deg = endpoints.groupBy("a").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // edges: (1,2) (3,5) (1,3) (4,6) → degree(1)=2, others 1
    assert(deg == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 5L -> 1L, 4L -> 1L, 6L -> 1L))
  }

  test("C7 shape: neighbors of actor 1") {
    val nbrs = g.interactions
      .filter(col("actor1") === 1 || col("actor2") === 1)
      .select(when(col("actor1") === 1, col("actor2")).otherwise(col("actor1")).as("n"))
      .collect().map(_.getLong(0)).toSet
    assert(nbrs == Set(2L, 3L))
  }
}
