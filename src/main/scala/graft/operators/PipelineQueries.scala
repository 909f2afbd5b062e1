package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.functions.Fingerprint.fingerprintMd5
import graft.sources.Tables

/** End-to-end corpus curation — the composed shape a training-data pipeline
  * actually runs, chaining the individually-verified stages: quality gate
  * (tx2's scoring formula) → global exact dedup (dd1's fingerprint, keep the
  * smallest doc_id per cluster) → per-source yield report. One declared
  * query proves the stages COMPOSE — same expressions, same at-rest
  * fingerprint identity ([[graft.functions.Fingerprint]]), one plan.
  *
  * Scale shape: the gate is a pushed-down per-row filter (no shuffle), the
  * dedup is ONE window over the fingerprint hash (the dd1 plan, now over the
  * ~gated subset only — filters run BEFORE the expensive global shuffle),
  * and the report is a partial+final hash agg on source. At 100 TB this is
  * scan → filter → one hash shuffle → one small agg, the minimum possible
  * movement for global dedup.
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curation" -> p01)

  /** Quality gate: tx2's score ≥ [[MinQuality]] (which already zeroes
    * docs under 10 tokens) and a token-count ceiling. */
  private val MinQuality = 0.5
  private val MaxTokens = 5000L

  private def p01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = filter(split(lower(trim($"text")), "\\s+"), t => length(t) > 0)
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks,
      t => t.isInCollection(Seq("the", "a", "and", "of", "to", "in")))).cast("double")
    val nPunct = size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val nChars = length($"text").cast("double")
    val quality =
      when(nTok >= 10, lit(1.0)).otherwise(lit(0.0)) *
        (lit(1.0) - when(nChars > 0, nPunct / nChars).otherwise(lit(0.0))) *
        when(when(nTok > 0, nStop / nTok).otherwise(lit(0.0)) > 0.02, lit(1.0))
          .otherwise(lit(0.5))
    val gated = Tables.documents(s, d)
      .select($"doc_id", $"source", $"text", quality.as("quality"),
        size(toks).cast("long").as("n_tokens"))
      .filter($"quality" >= MinQuality && $"n_tokens" <= MaxTokens)
    gated
      .withColumn("fp", fingerprintMd5($"text"))
      .withColumn("kept", $"doc_id" === min($"doc_id").over(Window.partitionBy($"fp")))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_gated"),
        sum($"kept".cast("long")).as("n_kept"),
        Exact.davg(when($"kept", $"quality")).as("avg_quality"))
      .orderBy($"source")
  }

  def oracleSql: Map[String, String] = {
    val wsTok = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0)"
    val inStop = Seq("the", "a", "and", "of", "to", "in")
      .map(w => s"t = '$w'").mkString("(", " OR ", ")")
    Map(
      "p01_curation" ->
        s"""WITH sig AS (
           |  SELECT doc_id, source, text,
           |    CAST(len($wsTok) AS DOUBLE) AS n_tok,
           |    CAST(len(list_filter($wsTok, t -> $inStop)) AS DOUBLE) AS n_stop,
           |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS n_punct,
           |    CAST(length(text) AS DOUBLE) AS n_chars
           |  FROM documents),
           |scored AS (
           |  SELECT doc_id, source, text, CAST(n_tok AS BIGINT) AS n_tokens,
           |    (CASE WHEN n_tok >= 10 THEN 1.0 ELSE 0.0 END)
           |      * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END)
           |      * (CASE WHEN (CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) > 0.02
           |          THEN 1.0 ELSE 0.5 END) AS quality
           |  FROM sig),
           |gated AS (
           |  SELECT * FROM scored WHERE quality >= $MinQuality AND n_tokens <= $MaxTokens),
           |deduped AS (
           |  SELECT doc_id, source, quality,
           |    doc_id = min(doc_id) OVER (
           |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS kept
           |  FROM gated)
           |SELECT source,
           |  COUNT(*) AS n_gated,
           |  CAST(SUM(CAST(kept AS BIGINT)) AS BIGINT) AS n_kept,
           |  ${Exact.sqlAvg("CASE WHEN kept THEN quality END")} AS avg_quality
           |FROM deduped
           |GROUP BY source
           |ORDER BY source""".stripMargin)
  }
}
