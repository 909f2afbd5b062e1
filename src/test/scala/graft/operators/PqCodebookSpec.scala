package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Exact.dsum
import graft.functions.VectorOps.cosineExact

/** The planted case FOR training the PQ codebook (round-9 verdict item 3):
  * the driver corpus is flat (near-uniform random vectors), which is the
  * friendly case for a codebook frozen from arbitrary low-id vectors — any
  * 32 vectors sample the bulk. A CLUSTERED corpus with id-skewed ingest
  * order (the real-world shape: early corpus from one source/domain) makes
  * the lowest-id codebook represent ONE cluster's geometry; quantization
  * error then concentrates exactly where queries land. This spec plants
  * that corpus and pins that per-subspace Lloyd training measurably fixes
  * both the k-means objective (total quantization distortion) and the
  * retrieval-level ADC ranking, where the untrained codebook measurably
  * fails. */
class PqCodebookSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val NClusters = 8
  private val PerCluster = 50

  /** Clustered corpus with id-skewed ingest: ids [c·50, c·50+50) all in
    * cluster c, so the 32 lowest ids — the codebook init — see ONLY
    * cluster 0. */
  private lazy val clustered: DataFrame = {
    val centers = Array.tabulate(NClusters) { c =>
      val r = new scala.util.Random(1000 + c)
      Array.fill(Dim)((r.nextDouble() * 2 - 1).toFloat)
    }
    val rows = (0 until NClusters * PerCluster).map { i =>
      val c = i / PerCluster
      val r = new scala.util.Random(i)
      val v = centers(c).map(x => x + (r.nextDouble() * 0.1 - 0.05).toFloat)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Total k-means objective Σ min-L2² over all (vector, subspace) pairs —
    * the quantity Lloyd descends; decimal-exact like the engine's argmin. */
  private def distortion(cb: DataFrame): Double = {
    val sub = SimilarityQueries.pqSubRowsOf(clustered)
    val dist = sub.join(cb, Seq("m", "pos"))
      .groupBy($"vec_id", $"m", $"cid")
      .agg(dsum(($"e" - $"ce") * ($"e" - $"ce")).as("d2"))
    val w = Window.partitionBy($"vec_id", $"m").orderBy($"d2", $"cid")
    dist.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .agg(sum($"d2")).collect()(0).getDouble(0)
  }

  /** Retrieval-level check: ADC top-`pool` recall of the exact top-10 for
    * a probe far from the codebook-init cluster. */
  private def adcRecall(cb: DataFrame, pool: Int): Double = {
    val probeId = 5L * PerCluster + 7 // cluster 5: unseen by the lowest-id init
    val probe = clustered.filter($"vec_id" === probeId).collect()(0)
    val pemb = probe.getSeq[Float](1)
    val exact = clustered.filter($"vec_id" =!= probeId)
      .select($"vec_id", cosineExact($"embedding", typedlit(pemb)).as("cos"))
      .orderBy(desc("cos"), $"vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val codes = SimilarityQueries.pqCodeRowsOf(clustered, cb)
    val sub = SimilarityQueries.pqSubRowsOf(clustered)
    val pe = sub.filter($"vec_id" === probeId).select($"pos", $"e".as("pe"))
    val lut = cb.join(pe, "pos").groupBy($"m", $"cid").agg(dsum($"ce" * $"pe").as("dotp"))
    val nrm = sub.groupBy($"vec_id").agg(dsum($"e" * $"e").as("nsq"))
    val pn = math.sqrt(
      nrm.filter($"vec_id" === probeId).collect()(0).getDouble(1))
    val got = codes.join(broadcast(lut), Seq("m", "cid"))
      .groupBy($"vec_id").agg(dsum($"dotp").as("adot"))
      .join(nrm, "vec_id").filter($"vec_id" =!= probeId)
      .select($"vec_id", ($"adot" / (sqrt($"nsq") * pn)).as("approx"))
      .orderBy(desc("approx"), $"vec_id").limit(pool)
      .collect().map(_.getLong(0)).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  test("clustered corpus: Lloyd training beats the lowest-id codebook on both axes") {
    val untrained = SimilarityQueries.pqCodebookOf(clustered)
    val trained = SimilarityQueries.pqTrainedCodebookOf(clustered)

    val dU = distortion(untrained)
    val dT = distortion(trained)
    info(f"distortion untrained=$dU%.3f trained=$dT%.3f ratio=${dT / dU}%.3f")
    assert(dT < dU * 0.5,
      f"training must at least halve the quantization distortion ($dT%.2f vs $dU%.2f)")

    val pool = 25 // half the true cluster: pool admission is the failure axis
    val rU = adcRecall(untrained, pool)
    val rT = adcRecall(trained, pool)
    info(f"ADC recall@10 (pool $pool) untrained=$rU%.2f trained=$rT%.2f")
    // measured on this deterministic corpus: 0.40 untrained vs 0.80
    // trained — the untrained codebook quantizes the whole probe cluster
    // to near-identical codes, so pool admission degenerates to id order
    assert(rU <= 0.6, f"the planted case must make the lowest-id codebook fail ($rU%.2f)")
    assert(rT >= 0.75, f"trained ADC must rank the true neighbors into a half-cluster pool ($rT%.2f)")
    assert(rT >= rU + 0.3, "training must open a decisive recall gap")
  }
}
