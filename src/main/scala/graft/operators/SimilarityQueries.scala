package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact.{dsum, sqlSum}
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`vec_id, embedding
  * ARRAY<FLOAT>, label`).
  *
  *  - ss1: brute-force cosine top-k against a probe vector — the exactness
  *    baseline. Dot products are computed positionally (posexplode + join on
  *    position) with decimal-exact sums, so the score is bit-identical on any
  *    engine and any partitioning — which is what makes the top-k ORDER
  *    stable and oracle-checkable.
  *  - ss2: LSH-bucketed ANN — 8 signed random hyperplanes derived
  *    deterministically from md5 parity; search only the probe's bucket.
  *    This is the scale path: at 100 TB the bucket join replaces the
  *    all-pairs scan, shuffling only on the (small-cardinality) signature.
  *  - ss3: embedding near-dup pairs — same-label blocking bounds the pair
  *    cardinality (the label plays the role of a coarse partitioner; swap in
  *    the ss2 signature for unlabeled corpora).
  *
  * At our scale factors the arrays are 64-dim; the positional explode is 64
  * rows/vector, aggregated back map-side (partial hash agg) before any
  * shuffle.
  */
object SimilarityQueries {

  private val TopK = 20
  /** Near-dup cosine threshold; the synthetic corpus has no planted embedding
    * dups (max same-label cosine ≈ 0.51), so τ=0.35 exercises the operator. */
  private val Tau = 0.35
  private val Planes = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss1_cosine_topk" -> ss1,
    "ss2_lsh_topk" -> ss2,
    "ss3_embed_neardup" -> ss3)

  /** (vec_id, pos, e) with pos 1-based and values as exact doubles. */
  private def unnested(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", ($"pos" + 1).as("pos"), $"col".cast("double").as("e"))
  }

  /** Exact cosine of every vector against the probe (min vec_id). */
  private def cosineVsProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = unnested(s, d)
    val probe = Tables.embeddings(s, d).select(min($"vec_id").as("pid"))
    val pv = ev.join(broadcast(probe), $"vec_id" === $"pid")
      .select($"pos", $"e".as("pe"))
    ev.join(broadcast(pv), "pos")
      .groupBy($"vec_id")
      .agg(
        dsum($"e" * $"pe").as("dot"),
        dsum($"e" * $"e").as("nx"),
        dsum($"pe" * $"pe").as("ny"))
      .select($"vec_id", ($"dot" / (sqrt($"nx") * sqrt($"ny"))).as("cosine"))
      .join(broadcast(probe), $"vec_id" === $"pid", "left_anti")
  }

  /** ss1: brute-force cosine top-k for the probe vector. */
  private def ss1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    cosineVsProbe(s, d).orderBy(desc("cosine"), $"vec_id").limit(TopK)
  }

  /** Deterministic ±1 hyperplane signature per vector: plane p's coefficient
    * at position `pos` is +1 when the first hex digit of md5("p_pos") is 0-7.
    * Identical construction in the oracle. */
  private def signatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    unnested(s, d)
      .select($"vec_id", $"pos", $"e", explode(sequence(lit(0), lit(Planes - 1))).as("p"))
      .withColumn("r",
        when(substring(md5(concat($"p".cast("string"), lit("_"), $"pos".cast("string"))
          .cast("binary")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1.0))
          .otherwise(lit(-1.0)))
      .groupBy($"vec_id", $"p").agg(dsum($"r" * $"e").as("proj"))
      .groupBy($"vec_id")
      .agg(concat_ws("", sort_array(collect_list(
        concat($"p".cast("string"), when($"proj" >= 0, lit("+")).otherwise(lit("-")))))).as("sig"))
  }

  /** ss2: ANN top-k — exact cosine restricted to the probe's LSH bucket. */
  private def ss2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sig = signatures(s, d)
    val probe = Tables.embeddings(s, d).select(min($"vec_id").as("pid"))
    val probeSig = sig.join(broadcast(probe), $"vec_id" === $"pid").select($"sig".as("psig"))
    val bucket = sig.join(broadcast(probeSig), $"sig" === $"psig").select($"vec_id")
    cosineVsProbe(s, d)
      .join(bucket, Seq("vec_id"), "left_semi")
      .orderBy(desc("cosine"), $"vec_id").limit(TopK)
  }

  /** ss3: near-duplicate pairs by cosine within same-label blocks. */
  private def ss3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lab = Tables.embeddings(s, d).select($"vec_id", $"label")
    val ev = unnested(s, d)
    val a = ev.join(lab, "vec_id").select($"label", $"vec_id".as("v1"), $"pos", $"e".as("e1"))
    val b = ev.join(lab, "vec_id").select($"label", $"vec_id".as("v2"), $"pos", $"e".as("e2"))
    a.join(b, Seq("label", "pos")).filter($"v1" < $"v2")
      .groupBy($"v1", $"v2")
      .agg(
        dsum($"e1" * $"e2").as("dot"),
        dsum($"e1" * $"e1").as("n1"),
        dsum($"e2" * $"e2").as("n2"))
      .select($"v1", $"v2", ($"dot" / (sqrt($"n1") * sqrt($"n2"))).as("cosine"))
      .filter($"cosine" >= Tau)
      .orderBy($"v1", $"v2")
  }

  // ---------------------------------------------------------------- oracle --

  private val evSql =
    """ev AS (
      |  SELECT vec_id,
      |         unnest(generate_series(1, len(embedding))) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS e
      |  FROM embeddings
      |)""".stripMargin

  private val cosineSql =
    s"""probe AS (SELECT min(vec_id) AS pid FROM embeddings),
       |pv AS (SELECT pos, e AS pe FROM ev, probe WHERE vec_id = pid),
       |cos AS (
       |  SELECT ev.vec_id,
       |         ${sqlSum("ev.e * pv.pe")} /
       |           (sqrt(${sqlSum("ev.e * ev.e")}) * sqrt(${sqlSum("pv.pe * pv.pe")})) AS cosine
       |  FROM ev JOIN pv USING (pos)
       |  GROUP BY ev.vec_id
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ss1_cosine_topk" ->
      s"""WITH $evSql,
         |$cosineSql
         |SELECT vec_id, cosine FROM cos, probe WHERE vec_id <> pid
         |ORDER BY cosine DESC, vec_id LIMIT $TopK""".stripMargin,
    "ss2_lsh_topk" ->
      s"""WITH $evSql,
         |planes AS (SELECT unnest(generate_series(0, ${Planes - 1})) AS p),
         |proj AS (
         |  SELECT vec_id, p,
         |         ${sqlSum("(CASE WHEN substring(md5(CAST(p AS VARCHAR) || '_' || CAST(pos AS VARCHAR)), 1, 1) BETWEEN '0' AND '7' THEN 1.0 ELSE -1.0 END) * e")} AS proj
         |  FROM ev, planes GROUP BY vec_id, p
         |),
         |sig AS (
         |  SELECT vec_id,
         |         array_to_string(list_sort(list(CAST(p AS VARCHAR) ||
         |           CASE WHEN proj >= 0 THEN '+' ELSE '-' END)), '') AS sig
         |  FROM proj GROUP BY vec_id
         |),
         |$cosineSql,
         |psig AS (SELECT sig AS ps FROM sig, probe WHERE vec_id = pid)
         |SELECT c.vec_id, c.cosine FROM cos c
         |JOIN sig ON c.vec_id = sig.vec_id
         |JOIN psig ON sig.sig = psig.ps
         |JOIN probe ON c.vec_id <> probe.pid
         |ORDER BY c.cosine DESC, c.vec_id LIMIT $TopK""".stripMargin,
    "ss3_embed_neardup" ->
      s"""WITH $evSql,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |pairs AS (
         |  SELECT la.vec_id AS v1, lb.vec_id AS v2, a.pos, a.e AS e1, b.e AS e2
         |  FROM ev a JOIN lab la ON a.vec_id = la.vec_id
         |  JOIN lab lb ON la.label = lb.label AND la.vec_id < lb.vec_id
         |  JOIN ev b ON b.vec_id = lb.vec_id AND b.pos = a.pos
         |),
         |agg AS (
         |  SELECT v1, v2,
         |         ${sqlSum("e1 * e2")} AS dot,
         |         sqrt(${sqlSum("e1 * e1")}) AS n1,
         |         sqrt(${sqlSum("e2 * e2")}) AS n2
         |  FROM pairs GROUP BY v1, v2
         |)
         |SELECT v1, v2, dot / (n1 * n2) AS cosine FROM agg
         |WHERE dot / (n1 * n2) >= $Tau
         |ORDER BY v1, v2""".stripMargin)
}
