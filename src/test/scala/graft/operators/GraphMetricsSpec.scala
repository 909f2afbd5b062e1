package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.build.GraphCache
import graft.graph.TemporalGraph

/** Differential + invariant tests for the probe-day graph metrics. */
class GraphMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The c12/g02 probe-day edge window, as the metrics queries see it. */
  private def dayEdges = {
    val g = GraphCache(spark, dir)
    g.frameInteractions
      .filter(col("year") === g.probes.py && col("month") === g.probes.pm &&
        col("day") === g.probes.pdd)
  }

  test("c12 degree and triangle counts match the GraphX mirror") {
    val tg = TemporalGraph.fromEdges(
      dayEdges.select("frame_id", "actor1", "actor2", "weight"))
    val c12 = GraphMetricsQueries.queries("c12_clustering_coeff")(spark, dir).collect()
    val deg = tg.degrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tri = tg.triangleCounts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c12.nonEmpty)
    c12.foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) == deg(v), s"degree mismatch for $v")
      assert(r.getLong(2) == tri.getOrElse(v, 0L), s"triangle mismatch for $v")
      val expected =
        if (r.getLong(1) >= 2)
          2.0 * r.getLong(2) / (r.getLong(1) * (r.getLong(1) - 1.0))
        else 0.0
      assert(r.getDouble(3) == expected, s"lcc mismatch for $v")
    }
    // the synthetic contact graph is dense enough to close triangles
    assert(c12.exists(_.getLong(2) > 0), "fixture should contain triangles")
  }

  test("g02 k-core: members qualify, outsiders don't (maximality)") {
    import spark.implicits._
    val edges = dayEdges.select($"actor1", $"actor2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val core = GraphMetricsQueries.queries("g02_kcore")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = 2
    def coreNeighbors(v: Long): Int = edges.count { case (a, b) =>
      (a == v && core.contains(b)) || (b == v && core.contains(a))
    }
    // every member's reported in-core degree is correct and >= K
    core.foreach { case (v, cd) =>
      assert(cd >= k, s"member $v below K")
      assert(cd == coreNeighbors(v), s"core_degree mismatch for $v")
    }
    // maximality: no excluded vertex has >= K neighbors inside the core
    val all = edges.flatMap(e => Seq(e._1, e._2)).toSet
    (all -- core.keySet).foreach { v =>
      assert(coreNeighbors(v) < k, s"outsider $v would qualify — core not maximal")
    }
    assert(core.nonEmpty, "fixture should have a non-empty core")
    assert(core.size < all.size, "fixture peel should actually drop vertices")
  }

  test("g04 pagerank conserves probability mass and matches a naive recompute") {
    import spark.implicits._
    val pr = GraphMetricsQueries.queries("g04_pagerank")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.nonEmpty)
    // no dangling vertices => sum pr stays exactly 1 every iteration (up to
    // the 1e-10 decimal-exact rounding of each per-edge contribution)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6, s"mass=${pr.values.sum}")

    // naive driver-side recompute (plain double sums, no decimal rounding)
    val edges = dayEdges.select($"actor1", $"actor2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges ++ edges.map(e => (e._2, e._1))
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val n = adj.size
    var rank = adj.keys.map(_ -> 1.0 / n).toMap
    // NB: sum over the neighbor ARRAY — a `.keys`-based formulation returns
    // a Set whose map() would deduplicate equal contribution values
    for (_ <- 1 to 3)
      rank = adj.map { case (v, nbrs) =>
        v -> (0.15 / n + 0.85 * nbrs.map(u => rank(u) / adj(u).size).sum)
      }
    assert(pr.keySet == rank.keySet)
    pr.foreach { case (v, p) =>
      // tolerance scales with degree: Exact.dsum rounds each per-edge
      // contribution to DECIMAL(28,10) (up to 5e-11 error each), so a
      // high-degree vertex on a denser fixture accumulates proportionally
      val tol = 1e-10 * math.max(adj(v).size.toDouble, 10.0) * 3 // 3 iterations
      assert(math.abs(p - rank(v)) < tol, s"rank mismatch for $v: $p vs ${rank(v)}")
    }
  }

  test("g05 link prediction matches a naive neighbor-set recompute") {
    import spark.implicits._
    val rows = GraphMetricsQueries.queries("g05_link_prediction")(spark, dir).collect()
    assert(rows.nonEmpty, "fixture should produce candidate pairs")

    val edges = dayEdges.select($"actor1", $"actor2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pairs must be canonically ordered")
      assert(!edges.contains((a, b)), s"($a,$b) is adjacent — must be excluded")
      val cn = adj(a).intersect(adj(b))
      assert(cn.nonEmpty && r.getLong(2) == cn.size, s"cn mismatch for ($a,$b)")
      val jac = cn.size.toDouble / (adj(a).size + adj(b).size - cn.size)
      assert(r.getDouble(3) == jac, s"jaccard mismatch for ($a,$b)")
      val ra = cn.toSeq.map(z => 1.0 / adj(z).size).sum
      // decimal-exact vs naive double summation: 5e-11 per term
      assert(math.abs(r.getDouble(4) - ra) < 1e-10 * math.max(cn.size, 10),
        s"ra mismatch for ($a,$b): ${r.getDouble(4)} vs $ra")
    }
    // the declared query is a top-k: scores must be non-increasing
    val scores = rows.map(_.getDouble(4)).toSeq
    assert(scores == scores.sorted.reverse, "ra_score must be non-increasing")
  }

  test("g06 temporal wedges match a naive first-contact recompute") {
    import spark.implicits._
    val rows = GraphMetricsQueries.queries("g06_temporal_brokerage")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    // naive: first activation frame per canonical edge, then count ordered
    // neighbor pairs per middle vertex driver-side
    val first = dayEdges.groupBy($"actor1", $"actor2")
      .agg(min($"frame_id").as("f")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byZ = (first.toSeq.map { case ((a, b), f) => (a, (b, f)) } ++
      first.toSeq.map { case ((a, b), f) => (b, (a, f)) })
      .groupBy(_._1).map { case (z, xs) => z -> xs.map(_._2) }
    byZ.foreach { case (z, nbrs) =>
      val wedges = for {
        (a, f1) <- nbrs; (b, f2) <- nbrs if a != b && f2 > f1
      } yield b
      if (wedges.nonEmpty) {
        val (nw, nt) = rows(z)
        assert(nw == wedges.size, s"wedge count mismatch for $z")
        assert(nt == wedges.distinct.size, s"target count mismatch for $z")
      } else assert(!rows.contains(z), s"$z should have no wedges")
    }
  }

  test("g07 assortativity matches a naive Pearson recompute") {
    import spark.implicits._
    val r = GraphMetricsQueries.queries("g07_assortativity")(spark, dir).collect()(0)
    val edges = dayEdges.select($"actor1", $"actor2").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val und = edges ++ edges.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (v, es) => v -> es.length }
    val xs = und.map(e => deg(e._1).toDouble)
    val ys = und.map(e => deg(e._2).toDouble)
    val n = und.length.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val vy = ys.map(y => (y - my) * (y - my)).sum
    val expected = cov / math.sqrt(vx * vy)
    assert(r.getLong(0) == und.length)
    assert(math.abs(r.getDouble(1) - expected) < 1e-9,
      s"assortativity ${r.getDouble(1)} vs naive $expected")
    // a degenerate (all-equal-degree) fixture would make the test vacuous
    assert(deg.values.toSet.size > 1)
  }

  test("g09 frame turnover matches a driver-side recompute over the whole run") {
    val g = GraphCache(spark, dir)
    val byFrame = g.frameInteractions.select("frame_id", "actor1", "actor2")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).toSet }
    val frames = g.frames.select("frame_id").collect().map(_.getLong(0))
    val rows = GraphMetricsQueries.queries("g09_frame_turnover")(spark, dir).collect()
    // one row per consecutive frame pair, empty slots included
    assert(rows.length == frames.length - 1)
    rows.foreach { r =>
      val f = r.getLong(0)
      val e1 = byFrame.getOrElse(f, Set.empty)
      val e2 = byFrame.getOrElse(f + 1, Set.empty)
      val nc = (e1 & e2).size.toLong
      assert(r.getLong(1) == e1.size.toLong, s"n_edges at frame $f")
      assert(r.getLong(2) == e2.size.toLong, s"n_next at frame $f")
      assert(r.getLong(3) == nc, s"n_common at frame $f")
      val un = e1.size.toLong + e2.size.toLong - nc
      val jac = if (un > 0) nc.toDouble / un.toDouble else 0.0
      assert(r.getDouble(4) == jac, s"jaccard at frame $f")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // the driver corpus has no cross-frame edge persistence at this sf, so
    // the n_common/jaccard path needs a PLANTED corpus: hour 0 has the
    // triangle {1,2,3}, hour 1 keeps only edge (1,2) -> jaccard 1/3
    assert(rows.forall(_.getLong(3) == 0L))
  }

  test("g09 counts planted cross-frame persistence") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("g09-planted").toString
    val t0 = 1700000000L
    Seq(
      (1L, t0, 1L, "x"), (2L, t0, 2L, "x"), (3L, t0, 3L, "x"),
      (4L, t0 + 3600L, 1L, "x"), (5L, t0 + 3600L, 2L, "x"))
      .toDF("event_id", "secs", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"secs").as("ts"), $"user_id",
        $"event_type", lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = GraphMetricsQueries.queries("g09_frame_turnover")(spark, tmp)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((0L, 3L, 1L, 1L)))
    assert(r.getDouble(4) == 1.0 / 3.0)
  }

  test("g03 components match the GraphX mirror") {
    val tg = TemporalGraph.fromEdges(
      dayEdges.select("frame_id", "actor1", "actor2", "weight"))
    val relational = GraphMetricsQueries.queries("g03_components")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val graphx = tg.connectedComponents.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relational == graphx)
    assert(relational.nonEmpty)
  }

  /** Driver-side synchronous LPA: mode of the previous round's neighbor
    * labels, ties to the smallest label — the exact g12 update rule. */
  private def naiveLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges ++ edges.map(e => (e._2, e._1))
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var labels = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds)
      labels = adj.map { case (v, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        v -> best
      }
    labels
  }

  test("g12 LPA communities match a naive synchronous recompute") {
    import spark.implicits._
    val edges = dayEdges.select($"actor1", $"actor2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = GraphMetricsQueries.queries("g12_label_propagation")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = naiveLpa(edges, 4)
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("g12 separates barbell communities that g03 merges into one component") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("g12-planted").toString
    // one DAY, three hourly frames: triangle {1,2,3} at h0, triangle
    // {4,5,6} at h1, bridge contact {3,4} at h2 — a barbell: ONE connected
    // component, but LPA resolves the two cliques as distinct communities
    val t0 = 1700000000L - 30000L // 13:53 UTC — +2h stays on the same day
    (Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1), (3L, 2), (4L, 2))
      .zipWithIndex.map { case ((u, h), i) => (i.toLong, t0 + h * 3600L, u, "x") })
      .toDF("event_id", "secs", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"secs").as("ts"), $"user_id",
        $"event_type", lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val comp = GraphMetricsQueries.queries("g03_components")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet.size == 1, "barbell must be one component")
    val lpa = GraphMetricsQueries.queries("g12_label_propagation")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    val cliqueA = Set(1L, 2L, 3L).map(lpa)
    val cliqueB = Set(4L, 5L, 6L).map(lpa)
    assert(cliqueA.size == 1, s"clique A should agree on one label: $lpa")
    assert(cliqueB.size == 1, s"clique B should agree on one label: $lpa")
    assert(cliqueA != cliqueB, s"cliques should form distinct communities: $lpa")
    // and the update rule itself matches the naive recompute on this shape
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    assert(lpa == naiveLpa(edges, 4))
  }

  test("g13 BFS hops match a driver-side breadth-first recompute") {
    import spark.implicits._
    val pa1 = GraphCache(spark, dir).probes.pa1
    val got = GraphMetricsQueries.queries("g13_bfs_hops")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.get(pa1).contains(0L), "the probe actor is at distance 0")

    val edges = dayEdges.select($"actor1", $"actor2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val dist = scala.collection.mutable.Map(pa1 -> 0L)
    var frontier = Set(pa1)
    var dLevel = 0L
    while (frontier.nonEmpty) {
      dLevel += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = dLevel)
    }
    assert(got == dist.toMap, "BFS distances must match the naive recompute")
    assert(got.size > 1, "the probe actor should reach someone on its busiest day")
  }

  test("g10 per-day evolution matches a driver-side union-find recompute") {
    val got = GraphMetricsQueries.queries("g10_component_evolution")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size > 1, "expected a multi-day evolution curve")

    // independent recompute: distinct day edges collected, per-day union-find
    val edges = GraphCache(spark, dir).frameInteractions
      .select((col("year") * 10000 + col("month") * 100 + col("day")).cast("long").as("dkey"),
        col("actor1"), col("actor2"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDay = edges.groupBy(_._1)
    assert(got.keySet == byDay.keySet)
    byDay.foreach { case (dkey, es) =>
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (_, a, b) => parent(find(a)) = find(b) }
      val actors = es.flatMap(e => Seq(e._2, e._3)).distinct
      val comps = actors.groupBy(find)
      val expected = (actors.size.toLong, es.length.toLong,
        comps.size.toLong, comps.values.map(_.size).max.toLong)
      assert(got(dkey) == expected, s"day $dkey: got ${got(dkey)} expected $expected")
    }
  }
}
