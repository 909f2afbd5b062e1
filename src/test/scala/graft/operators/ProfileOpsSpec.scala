package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline

/** Specs for the round-9 profile/audit batch: a09 (activity anomaly), dd15
  * (band-index skew profile), ss16 (IVF cell profile), tx17 (Zipf head),
  * mm9 (container integrity — here its QUARANTINE path, which the
  * all-well-formed driver corpus and its oracle can never exercise). Each
  * operator gets a planted fixture pinning its semantics plus, where the
  * real corpus exercises it, a naive-recompute differential. */
class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")

  test("a09: planted spike flagged; constant and short histories are not") {
    // user 1: 15 quiet days (2 events) + 1 spike day (40 events). A lone
    // spike among n otherwise-EQUAL days has z² = n−1 exactly, whatever
    // its magnitude (all the variance is the spike's own), so n = 16 puts
    // it at z² = 15 > 9 — and n = 10 would sit exactly AT the 3σ boundary,
    // where the strict inequality correctly refuses to flag.
    // user 2: 10 identical days (variance 0 — never anomalous)
    // user 3: 2 days, one huge — below AnomMinDays, must stay unflagged
    val rows =
      (1 to 15).flatMap(d => Seq.fill(2)((1L, ts(d, 1)))) ++
        Seq.fill(40)((1L, ts(16, 1))) ++
        (1 to 10).flatMap(d => Seq.fill(5)((2L, ts(d, 2)))) ++
        Seq.fill(3)((3L, ts(1, 3))) ++ Seq.fill(99)((3L, ts(2, 3)))
    val ev = rows.toDF("user_id", "ts")
    val out = SessionQueries.anomalyOf(ev).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getBoolean(5)))
    val flagged = out.filter(_._3).map(t => (t._1, t._2)).toSet
    assert(flagged === Set((1L, "2024-03-16")),
      s"exactly the planted spike must be flagged, got $flagged")
    assert(out.length === 28, "every (user, day) row is emitted with its verdict")

    // the boundary case pinned explicitly: 9 quiet + 1 spike lands exactly
    // at z² = 9 and must NOT be flagged (strict >)
    val boundary = ((1 to 9).flatMap(d => Seq.fill(2)((7L, ts(d, 1)))) ++
      Seq.fill(1000)((7L, ts(10, 1)))).toDF("user_id", "ts")
    assert(!SessionQueries.anomalyOf(boundary).collect().exists(_.getBoolean(5)),
      "a lone spike among 10 days sits exactly at 3σ — strict inequality holds")
  }

  test("a09: integer 3-sigma verdicts == BigInt naive recompute (real corpus)") {
    val ev = graft.sources.Tables.events(spark, dir)
    val got = SessionQueries.anomalyOf(ev).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getBoolean(5)).toMap
    val daily = ev.select($"user_id", to_date($"ts").cast("string").as("day"))
      .groupBy($"user_id", $"day").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val naive = daily.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      val n = BigInt(ds.length)
      val sum = ds.map(d => BigInt(d._3)).sum
      val sumSq = ds.map(d => BigInt(d._3) * BigInt(d._3)).sum
      ds.toSeq.map { case (u, day, cnt) =>
        val dev = n * cnt - sum
        (u, day) -> (ds.length >= 3 && dev * dev > 9 * (n * sumSq - sum * sum))
      }
    }.toMap
    assert(got === naive, "engine verdicts must equal the exact BigInt recompute")
    assert(got.values.exists(identity) || got.size > 300,
      "fixture sanity: the corpus produced rows")
  }

  test("a12: planted cells land on the right (dow, hour) with exact shares") {
    // 2024-03-03 (epoch day 19785) is a Sunday → dow 0; 2024-03-04 → dow 1.
    // Seconds are offset +60 so the events sit strictly inside their hour.
    def at(day: Long, h: Long): Long = day * 86400L + h * 3600L + 60L
    val ev = Seq(
      (1L, at(19785, 5)), (2L, at(19785, 5)), (1L, at(19785, 5)),
      (3L, at(19786, 13)), (3L, at(19786, 13)))
      .toDF("user_id", "secs")
      .select($"user_id", timestamp_seconds($"secs").as("ts"))
    val got = SessionQueries.seasonalityOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == Set((0L, 5L), (1L, 13L)))
    assert(got((0L, 5L)) == ((3L, 2L, 3.0 / 5.0)))
    assert(got((1L, 13L)) == ((2L, 1L, 2.0 / 5.0)))
  }

  test("a12: epoch arithmetic == the JDK calendar (real corpus) + conservation") {
    val ev = graft.sources.Tables.events(spark, dir)
    val got = SessionQueries.seasonalityOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // driver recompute through java.time's calendar — a genuinely
    // independent dow/hour derivation (ISO DayOfWeek, SUNDAY mapped to 0)
    val cells = ev.select(col("user_id"), col("ts")).collect().map { r =>
      val z = r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC)
      ((z.getDayOfWeek.getValue % 7).toLong, z.getHour.toLong, r.getLong(0))
    }
    val expected = cells.groupBy(c => (c._1, c._2)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._3).distinct.length.toLong)
    }
    assert(got == expected)
    // conservation: cell masses sum to the corpus, shares to 1
    assert(got.values.map(_._1).sum == ev.count())
    val shares = SessionQueries.seasonalityOf(ev).collect().map(_.getDouble(4)).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("a13: hand-computed Gini on planted count profiles") {
    def ev(counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, u) =>
        (1 to c).map(i => (u.toLong, ts(1 + (i % 20), i % 24)))
      }.toDF("user_id", "ts")
    // equal activity -> 0
    assert(SessionQueries.giniOf(ev(Seq(5, 5, 5, 5))).collect()(0).getDouble(2) == 0.0)
    // [1, 3]: rank identity gives 2 / (2 * 4) = 0.25
    assert(SessionQueries.giniOf(ev(Seq(1, 3))).collect()(0).getDouble(2) == 0.25)
    // [1, 1, 8]: 14 / (3 * 10)
    assert(SessionQueries.giniOf(ev(Seq(1, 1, 8))).collect()(0).getDouble(2) == 14.0 / 30.0)
    // a lone user is perfectly equal with itself
    assert(SessionQueries.giniOf(ev(Seq(7))).collect()(0).getDouble(2) == 0.0)
  }

  test("a13: histogram identity == sorted-rank BigInt recompute (real corpus)") {
    val ev = graft.sources.Tables.events(spark, dir)
    val r = SessionQueries.giniOf(ev).collect()(0)
    val counts = ev.groupBy(col("user_id")).count().collect()
      .map(_.getLong(1)).sorted
    val n = counts.length
    assert(r.getLong(0) == n && r.getLong(1) == counts.sum)
    val gnum = counts.zipWithIndex.map { case (x, i0) =>
      BigInt(2L * (i0 + 1) - n - 1) * x
    }.sum
    val expected = gnum.toDouble / (BigInt(n) * BigInt(counts.sum)).toDouble
    assert(r.getDouble(2) == expected)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("dd15: sum(cand_pairs) == the band-bucket self-join's true pair count") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val bands = DedupQueries.bandRowsOf(
      DedupQueries.minhashRowsOf(DedupQueries.shingleRowsOf(docs))).cache()
    try {
      val prof = DedupQueries.bandProfileOf(bands).collect()
      val totalPairs = prof.map(_.getLong(3)).sum
      val totalRows = prof.map(r => r.getLong(1) * r.getLong(2)).sum
      val joinPairs = bands.select($"doc_id".as("d1"), $"band", $"bh")
        .join(bands.select($"doc_id".as("d2"), $"band", $"bh"), Seq("band", "bh"))
        .filter($"d1" < $"d2").count()
      assert(totalPairs === joinPairs,
        "the histogram's pair mass must equal the actual candidate join size")
      assert(totalRows === bands.count(), "occupancy mass must conserve band rows")
    } finally { bands.unpersist(); () }
  }

  test("ss16: planted skewed assignment profiles exactly; shares sum to 1") {
    val assign = ((1L to 90L).map(v => (v, 100L)) ++
      (91L to 99L).map(v => (v, 200L)) ++ Seq((100L, 300L)))
      .toDF("vec_id", "cid")
    val prof = SimilarityQueries.cellProfileOf(assign).collect()
    val byCell = prof.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(byCell(100L) === ((90L, 0.9, 90L * 89L / 2)))
    assert(byCell(200L) === ((9L, 0.09, 36L)))
    assert(byCell(300L) === ((1L, 0.01, 0L)))
    assert(math.abs(prof.map(_.getDouble(2)).sum - 1.0) < 1e-12)
  }

  test("tx17: head == naive full-sort recompute over the posting rows") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val counts = TextQueries.postingRowsOf(docs)
      .groupBy($"t").agg(sum($"tf").as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = counts.map(_._2).sum
    val sorted = counts.sortBy { case (t, c) => (-c, t) }.take(100)
    val expected = sorted.zipWithIndex.map { case ((t, c), i) =>
      val cum = sorted.take(i + 1).map(_._2).sum
      (i + 1L, t, c, cum, cum.toDouble / n, c.toDouble * (i + 1) / n)
    }
    val got = TextQueries.queries("tx17_zipf_head")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty && got.last._5 >= got.head._5,
      "coverage must be monotone non-decreasing")
  }

  test("a10: planted cohorts retain exactly as constructed") {
    // cohort 2024-03-01: users 1,2,3; user 1 returns d2 and d3, user 2
    // returns d3 only; cohort 2024-03-02: user 4, never returns
    val rows = Seq(
      (1L, ts(1, 1)), (2L, ts(1, 2)), (3L, ts(1, 3)),
      (1L, ts(2, 1)), (1L, ts(3, 1)), (2L, ts(3, 2)),
      (4L, ts(2, 4)))
    val out = SessionQueries.retentionOf(rows.toDF("user_id", "ts")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out === Map(
      ("2024-03-01", 0L) -> ((3L, 3L, 1.0)),
      ("2024-03-01", 1L) -> ((1L, 3L, 1.0 / 3)),
      ("2024-03-01", 2L) -> ((2L, 3L, 2.0 / 3)),
      ("2024-03-02", 0L) -> ((1L, 1L, 1.0))))
  }

  test("a10: day-0 retention is 1.0 and cohorts conserve users (real corpus)") {
    val ev = graft.sources.Tables.events(spark, dir)
    val out = SessionQueries.retentionOf(ev).collect()
    assert(out.nonEmpty)
    assert(out.filter(_.getLong(1) == 0L).forall(_.getDouble(4) == 1.0),
      "every cohort's day-0 retention is exactly 1.0")
    assert(out.forall(r => r.getLong(2) <= r.getLong(3)),
      "no offset can retain more users than the cohort started with")
    val cohortUsers = out.filter(_.getLong(1) == 0L).map(_.getLong(3)).sum
    val distinctUsers = ev.select("user_id").distinct().count()
    assert(cohortUsers === distinctUsers,
      "cohort day-0 sizes must partition the user population")
  }

  test("a11: planted transition matrix is exact; rows conserve events") {
    val rows = Seq(
      (1L, ts(1, 1), "view"), (1L, ts(1, 2), "view"), (1L, ts(1, 3), "purchase"),
      (2L, ts(1, 4), "view"), (2L, ts(1, 5), "purchase"),
      (3L, ts(1, 6), "click"))
      .zipWithIndex.map { case ((u, t, e), i) => (i.toLong, u, t, e) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = SessionQueries.transitionsOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out === Map(
      ("view", "view") -> ((1L, 3L, 1.0 / 3)),
      ("view", "purchase") -> ((2L, 3L, 2.0 / 3))),
      "singleton users contribute no transitions; probabilities row-normalize")

    // real corpus: Σ transitions == |events| − |users| (each user emits
    // n_u − 1 consecutive pairs), and every row's p sums to 1 per source
    val ev = graft.sources.Tables.events(spark, dir)
    val real = SessionQueries.transitionsOf(ev).collect()
    assert(real.map(_.getLong(2)).sum ===
      ev.count() - ev.select("user_id").distinct().count())
    val bySource = real.groupBy(_.getString(0))
    assert(bySource.values.forall(rs => math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-12),
      "each source row of the matrix must sum to probability 1")
  }

  test("g11: handshake lemma and CCDF invariants (real corpus)") {
    val out = GraphMetricsQueries.queries("g11_degree_histogram")(spark, dir)
      .collect()
    val degreeMass = out.map(r => r.getLong(0) * r.getLong(1)).sum
    val nInteractions = graft.build.GraphCache(spark, dir).interactions.count()
    assert(degreeMass === 2 * nInteractions,
      "sum(degree * n_actors) must equal 2|E| (handshake lemma)")
    // rows ordered by degree asc; cum_ge counts actors with degree >= row's
    val cums = out.map(_.getLong(2))
    assert(cums.zip(cums.drop(1)).forall { case (a, b) => a >= b },
      "CCDF numerator must be non-increasing in degree")
    assert(out.head.getLong(2) === out.map(_.getLong(1)).sum,
      "the lowest degree's cum_ge covers every actor with an edge")
    assert(out.head.getDouble(3) === 1.0, "CCDF at min degree is exactly 1.0")
  }

  test("a14: nearest-rank percentiles == sorted recompute over a02's sessions") {
    val sess = SessionQueries.queries("a02_sessionize")(spark, dir).collect()
    val byMetric = Map(
      "dur_sec" -> sess.map(_.getLong(5)).sorted,
      "n_events" -> sess.map(_.getLong(2)).sorted)
    val got = SessionQueries.queries("a14_session_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == byMetric.keySet)
    byMetric.foreach { case (metric, vs) =>
      val r = got(metric)
      assert(r.getLong(1) == vs.length)
      assert(r.getLong(2) == vs.min && r.getLong(3) == vs.max)
      assert(r.getDouble(4) == vs.sum.toDouble / vs.length.toDouble)
      Seq(25, 50, 75, 95, 99).zipWithIndex.foreach { case (q, i) =>
        val rank = math.ceil(vs.length * q / 100.0).toInt
        assert(r.getLong(5 + i) == vs(rank - 1),
          s"$metric p$q: got ${r.getLong(5 + i)} expected ${vs(rank - 1)}")
      }
    }
  }

  test("ss19: recall curve is monotone in pool width and internally consistent") {
    val rows = SimilarityQueries.queries("ss19_ann_pareto")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(25, 50, 100, 200))
    rows.foreach { case (_, hits, recall) =>
      assert(hits >= 0L && hits <= 20L)
      assert(recall == hits.toDouble / 20.0)
    }
    // a wider pool is a superset of candidates feeding the same exact
    // rerank, so measured recall cannot decrease
    val recalls = rows.map(_._3).toSeq
    assert(recalls == recalls.sorted, s"recall must be monotone in pool: $recalls")
    assert(recalls.last >= 0.8, "the widest (declared ss2) pool should recall >= 0.8")
  }

  test("g14: strength mass conservation and per-actor recompute (real corpus)") {
    val out = GraphMetricsQueries.queries("g14_strength_histogram")(spark, dir)
      .collect()
    // every frame-edge row contributes 1 to both endpoints' strength
    val mass = out.map(r => r.getLong(0) * r.getLong(1)).sum
    val nFrameEdges = graft.build.GraphCache(spark, dir).frameInteractions.count()
    assert(mass === 2 * nFrameEdges,
      "sum(strength * n_actors) must equal 2 * |frame-edge rows|")
    // driver recompute of the whole histogram
    val fe = graft.build.GraphCache(spark, dir).frameInteractions
      .select(col("actor1"), col("actor2")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    val expected = fe.groupBy(identity).values.map(_.size.toLong)
      .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
    assert(out.head.getDouble(3) === 1.0, "CCDF at min strength is exactly 1.0")
    // the contact graph has repeated contacts: strength domain ⊋ degree domain
    assert(out.map(_.getLong(0)).max >
      GraphMetricsQueries.queries("g11_degree_histogram")(spark, dir)
        .collect().map(_.getLong(0)).max,
      "fixture should contain repeated contacts (strength > degree)")
  }

  test("g11: histogram == GraphX degrees histogram (north-star differential)") {
    val g = graft.build.GraphCache(spark, dir)
    val gx = graft.graph.TemporalGraph.fromEdges(g.frameInteractions)
      .degrees.groupBy($"degree").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = GraphMetricsQueries.queries("g11_degree_histogram")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel === gx,
      "relational degree histogram must equal the GraphX mirror's")
  }

  test("mm9: corrupt containers quarantine as ok=false rows, never failures") {
    val good = Seq(
      MultimodalPipeline.imageAsset(3L),
      MultimodalPipeline.audioAsset(4L),
      MultimodalPipeline.videoAsset(5L, 7L))
    val bad = Seq(
      // truncated raster: header promises 16x16x3 bytes that are not there
      MultimodalPipeline.imageAsset(30L)
        .copy(assetId = 6L, bytes = MultimodalPipeline.imageAsset(30L).bytes.dropRight(10)),
      // wrong magic
      MultimodalPipeline.audioAsset(40L)
        .copy(assetId = 7L, bytes = "JUNK".getBytes ++ MultimodalPipeline.audioAsset(40L).bytes.drop(4)),
      // video whose frame index overruns the payload
      MultimodalPipeline.videoAsset(50L, 8L)
        .copy(assetId = 8L, bytes = MultimodalPipeline.videoAsset(50L, 8L).bytes.dropRight(50)))
    val out = MultimodalPipeline.integrity(spark.createDataset(good ++ bad))
      .collect().map(r => r.assetId -> r).toMap
    assert(Seq(3L, 4L, 5L).forall(out(_).ok), "well-formed assets pass")
    assert(out(3L).nUnits === 256 && out(4L).nUnits === 256)
    assert(out(5L).nFrames === (7 % 3 + 2) && out(5L).nUnits === (7 % 3 + 2) * 64)
    assert(Seq(6L, 7L, 8L).forall(a => !out(a).ok && out(a).nUnits === -1L),
      "malformed assets must become quarantine rows")
  }

  test("mm9: measured sizes equal the generation formula (engine-side oracle mirror)") {
    val got = MultimodalQueries.queries("mm9_integrity_audit")(spark, dir).collect()
    assert(got.forall(_.getBoolean(5)), "driver corpus is all well-formed")
    got.foreach { r =>
      val (id, mod, nb, nf, nu) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      mod match {
        case "image" => assert((nb, nf, nu) === ((781L, 1L, 256L)), s"asset $id")
        case "audio" => assert((nb, nf, nu) === ((556L, 1L, 256L)), s"asset $id")
        case _ =>
          assert(nb === 8 + 207 * nf && nu === 64 * nf, s"asset $id")
      }
    }
  }
}
