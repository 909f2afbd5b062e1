package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.build.DerivedCache
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
    "p01_curation" -> p01,
    "p02_kmv_cardinality" -> p02,
    "p03_mixture_resample" -> p03,
    "p04_leakfree_split" -> p04,
    "p05_token_offsets" -> p05,
    "p06_chunk_manifest" -> p06,
    "p07_shard_manifest" -> p07,
    "p08_epoch_shuffle" -> p08,
    "p09_dataset_card" -> p09,
    "p10_weighted_sample" -> p10,
    "p11_budget_select" -> p11,
    "p12_mixture_order" -> p12)

  /** Quality gate: tx2's score ≥ [[MinQuality]] (which already zeroes
    * docs under 10 tokens) and a token-count ceiling. */
  private val MinQuality = 0.5
  private val MaxTokens = 5000L

  /** THE p01 gate as a per-document verdict frame (doc_id, n_chars, kept) —
    * factored so cross-family consumers (ss20's cell-curation map) apply
    * the one gate definition instead of a parallel reimplementation. Same
    * tx2 formula, same [[MinQuality]]/[[MaxTokens]] bounds, no filter (every
    * document gets a row); n_chars is the table's own column, not a
    * recompute. One corpus scan, no shuffle. */
  private[operators] def gateVerdicts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = TextQueries.wsTokens($"text")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(TextQueries.stop))).cast("double")
    val nPunct = size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val nChars = length($"text").cast("double")
    val quality = TextQueries.qualityFormula(
      nTok,
      when(nTok > 0, nStop / nTok).otherwise(lit(0.0)),
      when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)))
    Tables.documents(s, d).select($"doc_id", $"n_chars",
      (quality >= MinQuality && size(toks).cast("long") <= MaxTokens).as("kept"))
  }

  /** [[gateVerdicts]] mirrored as oracle CTEs `gsig` → `gate`
    * (doc_id, kept) — p01's sig/scored construction verbatim, minus the
    * filter, under clash-free names so it composes into other oracles. */
  private[operators] lazy val gateSql: String = {
    val wsTok = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0)"
    val inStop = TextQueries.stop.map(w => s"t = '$w'").mkString("(", " OR ", ")")
    s"""gsig AS (
       |  SELECT doc_id,
       |    CAST(len($wsTok) AS DOUBLE) AS n_tok,
       |    CAST(len(list_filter($wsTok, t -> $inStop)) AS DOUBLE) AS n_stop,
       |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS n_punct,
       |    CAST(length(text) AS DOUBLE) AS n_chars
       |  FROM documents),
       |gate AS (
       |  SELECT doc_id,
       |    ${TextQueries.qualityFormulaSql("n_tok",
            "CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END",
            "CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END")} >= $MinQuality
       |    AND CAST(n_tok AS BIGINT) <= $MaxTokens AS kept
       |  FROM gsig)""".stripMargin
  }

  private def p01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // tokenizer, stop list, and score all come from TextQueries — the gate
    // IS tx2's, by construction, not by parallel maintenance
    val toks = TextQueries.wsTokens($"text")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(TextQueries.stop))).cast("double")
    val nPunct = size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val nChars = length($"text").cast("double")
    val quality = TextQueries.qualityFormula(
      nTok,
      when(nTok > 0, nStop / nTok).otherwise(lit(0.0)),
      when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)))
    // Round 15 (guide §4.4 duplicated-expression + §2.3 aggregate-early).
    // The v1 plan evaluated the FULL quality expression twice per row —
    // once in the filter Catalyst pushed below the projection, once in the
    // projection itself (codegen CSE is per-operator, so the tokenizing
    // `split` ran ~2× per document) — and then shuffled every gated row
    // through an fp-keyed min WINDOW (no partial aggregation, plus a
    // per-partition sort). Now: ONE narrow projection of the per-document
    // signals, snapshotted (localCheckpoint — the tx19 shared-subtree
    // discipline) so the gate filter reads computed columns instead of
    // re-deriving them and both consumers share the single tokenize pass;
    // the per-fp canonical winner is min(struct(doc_id, source, quality))
    // — a HASH aggregate with map-side partials (doc_id is unique, so the
    // struct min IS the window's min-doc_id row) — and the per-source
    // rollups read the collapsed winners. A source whose every gated doc
    // loses its fp group keeps its row via the left join (n_kept = 0,
    // avg_quality null — exactly v1's sum/avg over an empty kept set).
    val sig = Tables.documents(s, d)
      .select($"doc_id", $"source", quality.as("quality"),
        size(toks).cast("long").as("n_tokens"), fingerprintMd5($"text").as("fp"))
      .localCheckpoint(eager = false)
    val gated = sig.filter($"quality" >= MinQuality && $"n_tokens" <= MaxTokens)
    val nGated = gated.groupBy($"source").agg(count(lit(1)).as("n_gated"))
    val winners = gated
      .groupBy($"fp").agg(min(struct($"doc_id", $"source", $"quality")).as("w"))
      .select($"w.source".as("source"), $"w.quality".as("quality"))
    val keptAgg = winners.groupBy($"source").agg(
      count(lit(1)).as("n_kept"), Exact.davg($"quality").as("avg_quality"))
    nGated.join(keptAgg, Seq("source"), "left")
      .select($"source", $"n_gated",
        coalesce($"n_kept", lit(0L)).as("n_kept"), $"avg_quality")
      .orderBy($"source")
  }

  /** Sketch size: estimates kick in for groups with >= [[KmvK]] distinct
    * hashes (the `rn === KmvK` row exists exactly when the group reaches k);
    * smaller groups fall back to the exact distinct-hash count (the
    * standard KMV rule — the sketch IS exact below k). */
  private val KmvK = 64

  /** p02: k-minimum-values distinct-count sketch — the cardinality
    * estimator corpus pipelines run per shard/source when exact
    * countDistinct is too expensive to merge. Unlike HLL-based
    * `approx_count_distinct` (whose register layout is engine-private and
    * therefore un-oracle-able), KMV is exactly reproducible on any engine:
    * hash = first 8 md5 hex digits of the dd1 fingerprint, estimator =
    * (k−1)/h_k with h_k the k-th smallest distinct hash normalized by 2^32
    * (a power-of-two division — exact in binary, so the estimate is
    * bit-identical in Spark and the DuckDB oracle). Accuracy ~1/√(k−2)
    * (~13% at k=64) is asserted against the exact count in PipelineSpec.
    * Scale shape: one distinct + one per-group top-k — at 100 TB the
    * sketch state per group is k longs, mergeable across shards. */
  private def p02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hv = Tables.documents(s, d)
      .select($"source", graft.functions.Kmv.hashCol($"text").as("h")).distinct()
    val ranked = hv.withColumn("rn",
      row_number().over(Window.partitionBy($"source").orderBy($"h")))
    val kth = ranked.filter($"rn" === KmvK).select($"source", $"h".as("hk"))
    val cnt = hv.groupBy($"source").agg(count(lit(1)).as("n_hashes"))
    val exact = Tables.documents(s, d)
      .select($"source", fingerprintMd5($"text").as("fp"))
      .groupBy($"source").agg(countDistinct($"fp").as("n_exact"))
    exact.join(cnt, "source").join(kth, Seq("source"), "left")
      .select($"source", $"n_exact",
        when($"hk".isNotNull, graft.functions.Kmv.estimateCol($"hk", KmvK))
          .otherwise($"n_hashes".cast("double")).as("kmv_est"))
      .orderBy($"source")
  }

  /** p03: deterministic mixture resampling — rebalance the LANGUAGE mixture
    * (the driver corpus is en-heavy ~3:1) by downsampling every language to
    * the smallest language's size in expectation (the domain-reweighting
    * step a pretraining pipeline runs before tokenization; a τ-temperature
    * or hand-set target mixture is the identical construction with a
    * different `n_target` column). A document survives iff
    * `hash32(doc_id) · n_docs < n_target · 2^32` — the keep decision is one
    * pushed-down integer comparison per row against a broadcast per-group
    * threshold: no shuffle of the corpus, no RNG (a retried task re-drawing
    * `rand()` would duplicate or lose rows), and the same doc set survives
    * on any cluster. The comparison runs in DECIMAL(38,0) (HUGEINT in the
    * oracle) so it cannot overflow even with per-group counts beyond 2^31
    * at the 100 TB end. */
  private def p03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    val target = counts.agg(min($"n_docs").as("n_target"))
    val hash32 =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)").cast("long")
    val kept = docs.select($"doc_id", $"lang", hash32.as("h"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(target))
      .filter($"h".cast("decimal(38,0)") * $"n_docs" <
        $"n_target".cast("decimal(38,0)") * lit(Kmv32))
      .groupBy($"lang").agg(count(lit(1)).as("n_kept"))
    // report every language, including one that (at a tiny sf) keeps nothing
    counts.crossJoin(target)
      .join(kept, Seq("lang"), "left")
      .select($"lang", $"n_docs", $"n_target",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        (coalesce($"n_kept", lit(0L)).cast("double") / $"n_docs".cast("double"))
          .as("achieved_rate"))
      .orderBy($"lang")
  }

  /** 2^32 — the 32-bit hash-space size as a long (p03's threshold scale). */
  private val Kmv32 = 4294967296L

  /** p04: leakage-free train/eval split — the dedup-aware assignment a
    * curation pipeline must run INSTEAD of tx5's per-document hash split:
    * near-duplicates of a training document inside the eval set are
    * contamination (dd5 measures it; this prevents it). The split key is
    * the dd6 CLUSTER id, so whole near-dup clusters move together and no
    * verified dup pair can straddle the boundary BY CONSTRUCTION (pinned
    * against the at-rest dup-pair graph in PipelineSpec, with the
    * per-document split as the leaking positive control). Output: per
    * split, document/cluster/dup-member counts. Scale shape: dd6's
    * clustering (broadcast pair fixpoint) + one md5 per CLUSTER + a final
    * tiny agg — the split decision itself is a pushed-down per-row
    * comparison, no corpus shuffle beyond dd6's own merge. */
  private def p04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clusters = DedupQueries.queries("dd6_dup_clusters")(s, d)
    val split =
      when(expr("conv(substring(md5(cast(cluster_id as string)), 1, 2), 16, 10)")
        .cast("long") < 64, "eval").otherwise("train")
    clusters.withColumn("split", split)
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"cluster_id").as("n_clusters"),
        sum(when($"is_dup", 1L).otherwise(0L)).as("n_dup_docs"))
      .orderBy($"split")
  }

  /** Training-sequence length for the concat-and-chunk packing (p05/p06) —
    * the fixed token budget each packed sequence holds. */
  private val SeqLen = 2048L

  /** doc_ids per prefix-sum bucket (p05). Session conf so specs (and a
    * 100-TB operator) can tune the two-level trade: the single-task pass
    * over bucket sums touches n_docs/B rows, the bucket-offset side of the
    * join holds the same n_docs/B rows — B scales both together. */
  val PackBucketKey = "spark.graft.pack.bucket"
  private val PackBucketDefault = 4096L

  /** Tokenize an explicit documents frame to the narrow (doc_id, n_tokens)
    * rows the prefix machinery runs on — the ONLY step that touches text. */
  private def tokenCountsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    // compute-spread layout (documentsWide's doc_id repartition, over the
    // explicit frame): tokenization cost follows rows, not row groups
    docs.repartition(n, $"doc_id")
      .select($"doc_id",
        size(TextQueries.wsTokens($"text")).cast("long").as("n_tokens"))
  }

  /** Per-doc token start offsets under GPT-style concat-and-chunk packing:
    * documents concatenated in doc_id order, token offset = `shift` + the
    * exclusive prefix sum of token counts (tx1's whitespace tokenizer —
    * same expression, not a parallel implementation).
    *
    * The scale problem is the GLOBAL running total: the naive shape is one
    * unpartitioned window over the corpus — a single task holding every
    * row, the exact thing WindowExec's "no partition defined" warning is
    * about. The two-level formulation keeps every corpus-sized pass
    * parallel: doc_ids bucket by `doc_id div B` (data-independent, so the
    * layout is deterministic), per-bucket token sums aggregate map-side,
    * ONLY the n/B bucket sums pay an ordered prefix pass (bounded by
    * construction — at 10^10 docs and B=4096 that is ~2.4 M 16-byte rows,
    * one small task), and each doc adds its bucket's exclusive offset
    * (n/B-row equi-join Spark is free to broadcast) to a within-bucket
    * prefix windowed BY bucket. Two keyed shuffles + one bounded pass —
    * no corpus-sized single-partition stage at any scale. */
  private[operators] def offsetRowsOf(docs: DataFrame, shift: Long = 0L): DataFrame =
    prefixRowsOf(tokenCountsOf(docs), shift)

  /** The two-level prefix sum over narrow (doc_id, n_tokens) rows. */
  private def prefixRowsOf(counts: DataFrame, shift: Long): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val b = s.conf.getOption(PackBucketKey).map(_.toLong).getOrElse(PackBucketDefault)
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    // only the 24-byte (doc_id, bucket, n_tokens) rows move onto the
    // bucket layout. That ONE narrow exchange is consumed by BOTH
    // downstream passes — the bucket-sum agg and the within-bucket window
    // each need ClusteredDistribution(bucket), which the explicit
    // repartition already satisfies, so neither adds a shuffle and
    // ReuseExchange runs the upstream scan+tokenize exactly once. The
    // corpus text itself is never shuffled here.
    // the explicit isNotNull mirrors the constraint the join below infers
    // on its own branch — WITHOUT it the two consumers of this exchange
    // canonicalize differently (one picks up the inferred filter) and
    // AQE's stage reuse can't dedup them; WITH it both subtrees are
    // identical and the scan+tokenize+shuffle runs once
    val t = counts
      .withColumn("bucket", expr(s"doc_id div $b"))
      .filter($"doc_id".isNotNull && $"bucket".isNotNull)
      .repartition(n, $"bucket")
    // max(doc_id) is trivially non-null (every bucket has members), but it
    // is NOT decorative: without a live reference to doc_id this branch's
    // projection prunes the column, the two consumers of the bucket
    // exchange stop canonicalizing identically, AQE cannot reuse the
    // shuffle stage — and the corpus tokenizes TWICE. The isNotNull filter
    // below is the "use" that keeps it alive (verified against the final
    // adaptive plan: one ShuffleQueryStage feeds both branches).
    val bucketSums = t.groupBy($"bucket")
      .agg(sum($"n_tokens").as("bsum"), max($"doc_id").as("_maxdoc"))
    // the ONE ordered pass: n/B bucket rows, bounded by construction
    // (declared via the PrefixSum.onePart constant key)
    val bucketOffsets = bucketSums.withColumn("boff",
      coalesce(sum($"bsum").over(
        Window.partitionBy(PrefixSum.onePart($"bucket"))
          .orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter($"_maxdoc".isNotNull)
      .select($"bucket", $"boff")
    val within = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // no broadcast hint: the offsets side is n/B rows — small enough that
    // the planner broadcasts it on its own at any sane B, and when an
    // operator shrinks B far enough to make it big, the join degrades to a
    // shuffle of ONLY the offsets side (t already satisfies the bucket
    // distribution) instead of a forced oversized broadcast
    t.join(bucketOffsets, "bucket")
      .withColumn("start_off",
        lit(shift) + $"boff" + coalesce(sum($"n_tokens").over(within), lit(0L)))
      .select($"doc_id", $"n_tokens", $"start_off")
  }

  /** (name, version) identities of the at-rest packing family: the offsets
    * table and its running-total meta (total_tokens, max_doc_id) — the
    * append path's O(1) reference point, per the sh_df_meta discipline. */
  private[graft] val OffsetsTable = ("doc_offsets", 1)
  private[graft] val OffsetsMetaTable = ("doc_offsets_meta", 1)

  /** Day-0 materialization of the packing offsets over an explicit frame —
    * a pipeline packs ONCE at ingest and every read (p05, p06, the
    * trainer's chunk loader) starts from the scan, like every other
    * [[DerivedCache]] index. The meta rows derive from the offsets
    * themselves (last doc's end == corpus token total), so the two tables
    * cannot disagree. */
  def buildOffsets(s: SparkSession, d: String, docs: DataFrame): DataFrame = {
    import s.implicits._
    val rows = DerivedCache.table(s, d, OffsetsTable)(offsetRowsOf(docs))
    DerivedCache.table(s, d, OffsetsMetaTable)(
      rows.agg(
        coalesce(max($"start_off" + $"n_tokens"), lit(0L)).as("total_tokens"),
        coalesce(max($"doc_id"), lit(-1L)).as("max_doc_id")))
    rows
  }

  /** Fold a NEW document batch into the at-rest offsets — the daily path.
    * Caller contract (shared with every append family): batch doc_ids must
    * not already be indexed. Offsets are the one per-document index that is
    * ORDER-dependent, so the shape depends on where the batch lands:
    *
    *  - monotone batch (min id above the indexed max — the normal ingest
    *    stream): new offsets = stored running total + the batch's own
    *    two-level prefix, file-appended. Cost ∝ batch, the append-flat
    *    shape IngestBench measures for the other families.
    *  - interior batch (ids below the indexed max — backfills): every doc
    *    after the insertion point shifts, so the prefix is RECOMPUTED —
    *    but over the union of the at-rest NARROW rows (which already carry
    *    n_tokens) and the tokenized batch, then staged-replaced. The
    *    existing corpus text is never re-read or re-tokenized; the cost is
    *    one narrow-row pass, not an ingest. */
  def appendOffsets(s: SparkSession, d: String, batch: DataFrame): Unit = {
    import s.implicits._
    val meta = DerivedCache.existing(s, d, OffsetsMetaTable).collect()(0)
    val (total, maxId) = (meta.getLong(0), meta.getLong(1))
    val bounds = batch.agg(
      min($"doc_id").as("lo"), max($"doc_id").as("hi"),
      count(lit(1)).as("n")).collect()(0)
    if (bounds.getLong(2) == 0L) return
    if (bounds.getLong(0) > maxId) {
      val rows = offsetRowsOf(batch, total)
      DerivedCache.append(s, d, OffsetsTable)(rows)
      val batchTokens = rows.agg(coalesce(sum($"n_tokens"), lit(0L))).collect()(0).getLong(0)
      DerivedCache.replace(s, d, OffsetsMetaTable)(
        Seq((total + batchTokens, bounds.getLong(1))).toDF("total_tokens", "max_doc_id"))
    } else {
      val merged = DerivedCache.existing(s, d, OffsetsTable)
        .select($"doc_id", $"n_tokens")
        .unionAll(tokenCountsOf(batch))
      val rows = prefixRowsOf(merged, 0L)
      DerivedCache.replace(s, d, OffsetsTable)(rows)
      DerivedCache.replace(s, d, OffsetsMetaTable)(
        DerivedCache.existing(s, d, OffsetsTable).agg(
          coalesce(max($"start_off" + $"n_tokens"), lit(0L)).as("total_tokens"),
          coalesce(max($"doc_id"), lit(-1L)).as("max_doc_id")))
    }
  }

  /** Remove deleted documents from the packing — the interior-backfill
    * path in reverse: every document after the earliest deleted id shifts
    * left, so the prefix is recomputed over the REMAINING at-rest narrow
    * (doc_id, n_tokens) rows (the corpus text is never re-read or
    * re-tokenized) and staged-replaced together with the meta total. */
  private[operators] def deleteOffsets(s: SparkSession, d: String,
      ids: DataFrame): Unit = {
    import s.implicits._
    val idSet = ids.select($"doc_id").distinct()
    val remaining = DerivedCache.existing(s, d, OffsetsTable)
      .join(idSet, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"n_tokens")
    DerivedCache.replace(s, d, OffsetsTable)(prefixRowsOf(remaining, 0L))
    DerivedCache.replace(s, d, OffsetsMetaTable)(
      DerivedCache.existing(s, d, OffsetsTable).agg(
        coalesce(max($"start_off" + $"n_tokens"), lit(0L)).as("total_tokens"),
        coalesce(max($"doc_id"), lit(-1L)).as("max_doc_id")))
  }

  /** The at-rest offsets for the driver corpus (lazy day-0 build). */
  private def tokenOffsets(s: SparkSession, d: String): DataFrame =
    buildOffsets(s, d, Tables.documents(s, d))

  /** Force at-rest offsets materialization (ingest-time cost, untimed in
    * Bench — the packing analog of the posting/shingle warms). */
  def warm(s: SparkSession, d: String): Unit = {
    tokenOffsets(s, d)
    ()
  }

  /** p05: every doc's packed position — start offset plus the first/last
    * [[SeqLen]]-token chunk it lands in (null spans for token-empty docs,
    * which occupy no chunk). The doc→chunk index IS the packing: a trainer
    * reading chunk c loads exactly the docs whose span covers c. */
  private def p05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tokenOffsets(s, d)
      .select($"doc_id", $"n_tokens", $"start_off",
        when($"n_tokens" > 0, expr(s"start_off div $SeqLen")).as("chunk_first"),
        when($"n_tokens" > 0, expr(s"(start_off + n_tokens - 1) div $SeqLen"))
          .as("chunk_last"))
      .orderBy($"doc_id")
  }

  /** p06: the chunk-side view of the same packing — per chunk, the docs
    * spanning it and the exact token mass they contribute (== [[SeqLen]]
    * for every chunk but the ragged last one; PipelineSpec pins that
    * invariant). Spans explode via `sequence(chunk_first, chunk_last)` —
    * per-doc row growth is n_tokens/SeqLen + 1, so the explode carries the
    * corpus token count / SeqLen rows total, and the rollup is one keyed
    * shuffle on chunk_id. */
  private def p06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val spans = tokenOffsets(s, d).filter($"n_tokens" > 0)
      .withColumn("cf", expr(s"start_off div $SeqLen"))
      .withColumn("cl", expr(s"(start_off + n_tokens - 1) div $SeqLen"))
    spans.select($"doc_id", $"n_tokens", $"start_off",
        explode(sequence($"cf", $"cl")).as("chunk_id"))
      .groupBy($"chunk_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"),
        sum(
          least($"start_off" + $"n_tokens", ($"chunk_id" + 1) * SeqLen) -
            greatest($"start_off", $"chunk_id" * SeqLen)).as("n_chunk_tokens"))
      .orderBy($"chunk_id")
  }

  /** Output shards for p07 — the writer-side fan-in a training run reads.
    * Fixed and small here; a production corpus sizes this so each shard
    * lands near the trainer's preferred file size (the knob changes only
    * the modulus, never the plan shape). */
  private val NShards = 8L

  /** p07: deterministic output-shard manifest — the SINK-side step of the
    * packing pipeline: every document is assigned a shard by a stable hash
    * of its id (the p03/tx5 md5 construction — no RNG, so a retried write
    * task lands every row in the same shard on any cluster), and the
    * manifest reports per shard what a trainer's data loader needs before
    * reading a byte: document count, exact token mass (from the MAINTAINED
    * `doc_offsets` table — the corpus is not re-tokenized to plan its own
    * write), byte mass, and the id range.
    *
    * Scale shape: two independent narrow scans (the at-rest offsets for
    * token mass, the documents scan pruned to `(doc_id, n_chars)` for byte
    * mass), each hash-aggregated map-side onto [[NShards]] groups, then an
    * [[NShards]]-row join — no corpus-sized shuffle anywhere, and the text
    * column is never read. The same manifest at 100 TB moves only
    * 2·NShards aggregate rows past the partial aggs. */
  private def p07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def shard =
      (expr("conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)")
        .cast("long") % NShards).as("shard")
    val tok = tokenOffsets(s, d)
      .select(shard, $"doc_id", $"n_tokens")
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
    val chars = Tables.documents(s, d)
      .select(shard, $"n_chars")
      .groupBy($"shard").agg(sum($"n_chars").as("n_chars"))
    tok.join(chars, "shard")
      .select($"shard", $"n_docs", $"n_tokens", $"n_chars", $"min_doc", $"max_doc")
      .orderBy($"shard")
  }

  /** p08's batch geometry: chunks per training batch, and the hash-space
    * width of a rank bucket (2^20 → ≤ 4096 buckets over the 32-bit hash
    * space — a BOUNDED ordered pass whatever the corpus size). */
  private val BatchChunks = 8L
  private val RankBucketWidth = 1L << 20

  /** p08: deterministic EPOCH SHUFFLE of the packed chunks — the data-order
    * randomization step of a training run, as a declared query: each chunk's
    * position in epoch 0 is the rank of its salted md5 hash (ties broken by
    * chunk_id — a total order), and its training batch is `pos div
    * [[BatchChunks]]`. No RNG anywhere, so a retried task, a different
    * cluster, or a resumed run reproduces the identical epoch order — and a
    * different epoch salt reshuffles everything.
    *
    * Scale shape: the global rank is the p05 TWO-LEVEL formulation over
    * hash-space buckets — per-bucket counts, ONE ≤ 4096-row ordered pass
    * for bucket offsets (bounded by the fixed hash space, NOT the corpus),
    * then a within-bucket `row_number` whose partitions are balanced by
    * hash uniformity (never the skew of a data column). Chunk ids come
    * from the maintained offsets table via the p06 span explode — the
    * corpus text is never read. The oracle states the semantics as the
    * naive single-window rank; the bucketed formulation must be
    * value-identical (the p05 discipline). */
  private def p08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val chunks = tokenOffsets(s, d).filter($"n_tokens" > 0)
      .select(explode(sequence(expr(s"start_off div $SeqLen"),
        expr(s"(start_off + n_tokens - 1) div $SeqLen"))).as("chunk_id"))
      .distinct()
    val hashed = chunks
      .withColumn("h",
        conv(substring(md5(concat(lit("p08epoch0:"), $"chunk_id".cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long"))
      .withColumn("bucket", expr(s"h div $RankBucketWidth"))
      .repartition(n, $"bucket")
    val bucketOffsets = hashed.groupBy($"bucket")
      .agg(count(lit(1)).as("bn"))
      .withColumn("boff",
        coalesce(sum($"bn").over(
          Window.partitionBy(PrefixSum.onePart($"bucket"))
            .orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select($"bucket", $"boff")
    val within = Window.partitionBy($"bucket").orderBy($"h", $"chunk_id")
    hashed.join(bucketOffsets, "bucket")
      .withColumn("pos", $"boff" + row_number().over(within).cast("long") - 1L)
      .select($"chunk_id", $"pos", expr(s"pos div $BatchChunks").as("batch"))
      .orderBy($"chunk_id")
  }

  /** p09: the dataset card — the one-row corpus summary every dataset
    * release ships (docs, chars, languages, tokens, exact-dup count,
    * vocabulary size, vector count), served ENTIRELY from maintained
    * at-rest tables (offsets meta for tokens, fingerprint index for dup
    * rate, posting index for vocabulary) plus two pruned narrow scans
    * (documents' (lang, n_chars) columns, embeddings' vec_id) — at 100 TB
    * the card costs a handful of narrow aggregations, never a text
    * re-tokenization. The five inputs are one-row aggregates cross-joined
    * (broadcast nested loop over single rows — bounded by construction).
    * The oracle recomputes every figure from the RAW corpus, so the
    * declared query doubles as a standing consistency gate between the
    * maintained state and the data it indexes. */
  private def p09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tokenOffsets(s, d) // ensure the offsets meta exists
    val base = Tables.documents(s, d).agg(
      count(lit(1)).as("n_docs"),
      sum($"n_chars").as("total_chars"),
      countDistinct($"lang").as("n_langs"))
    val tok = DerivedCache.existing(s, d, OffsetsMetaTable).select($"total_tokens")
    val uniq = DedupQueries.docFp(s, d).agg(countDistinct($"fp").as("n_unique_docs"))
    val vocab = TextQueries.postings(s, d).agg(countDistinct($"t").as("n_terms"))
    val emb = Tables.embeddings(s, d).agg(count(lit(1)).as("n_vectors"))
    base.crossJoin(tok).crossJoin(uniq).crossJoin(vocab).crossJoin(emb)
      .select($"n_docs", $"total_chars", $"n_langs", $"total_tokens",
        $"n_unique_docs", ($"n_docs" - $"n_unique_docs").as("n_exact_dup_docs"),
        $"n_terms", $"n_vectors")
  }

  /** Expected sample size (in documents) of the declared PPS query — the
    * budget knob: E[|sample|] = Σ min(1, PpsTarget·wᵢ/W) ≈ PpsTarget, so
    * the output is ~[[PpsTarget]] rows at ANY corpus scale. */
  private val PpsTarget = 200L

  /** p10: weighted sampling — each document survives with probability
    * PROPORTIONAL to its token mass (PPS / Poisson sampling, the
    * importance-sampling primitive behind token-budget subsampling, data
    * ablations, and mixture re-weighting by example size; p03 is the
    * uniform-within-stratum sibling, tx5 the fixed-rate one). The draw is
    * the p03 construction, with a per-ROW threshold instead of a
    * per-group one: doc i survives iff
    * `hash32(doc_id) · W < PpsTarget · wᵢ · 2^32` — no RNG (retries and
    * other clusters reproduce the identical sample), and the cap
    * `p = min(1, PpsTarget·wᵢ/W)` is IMPLICIT in the comparison: when
    * `PpsTarget·wᵢ ≥ W` the right side is ≥ W·2^32, above every possible
    * `hash32·W`, so oversized documents are always kept with no separate
    * branch. The comparison runs in DECIMAL(38,0) (HUGEINT in the oracle)
    * — at the 100 TB end `hash32·W ≈ 2^32·10^14` overflows int64.
    *
    * Weights come from the MAINTAINED `doc_offsets` table (the corpus is
    * never re-tokenized to sample itself); the corpus total W is the O(1)
    * offsets-meta row. Scale shape: one narrow at-rest scan, a per-row
    * integer compare against a broadcast one-row total, no shuffle before
    * the final order — and `p_incl` (one exact division, capped) is
    * reported so downstream estimators can Horvitz–Thompson-reweight. */
  private def p10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val off = tokenOffsets(s, d).select($"doc_id", $"n_tokens")
    val tot = DerivedCache.existing(s, d, OffsetsMetaTable).select($"total_tokens")
    val hash32 =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)").cast("long")
    off.select($"doc_id", $"n_tokens", hash32.as("h"))
      .crossJoin(broadcast(tot))
      .filter($"h".cast("decimal(38,0)") * $"total_tokens" <
        ($"n_tokens" * PpsTarget).cast("decimal(38,0)") * lit(Kmv32))
      .select($"doc_id", $"n_tokens",
        least(lit(1.0),
          ($"n_tokens" * PpsTarget).cast("double") / $"total_tokens".cast("double"))
          .as("p_incl"))
      .orderBy($"doc_id")
  }

  /** p12's interleave grid: each document's stream position is its
    * within-language quantile (2r−1)/(2n) snapped to a 2^20-step grid —
    * fine enough that per-prefix mixture deviation stays ≤ n_l/2^20 + 1
    * document per language, coarse enough that (2r−1)·2^20 stays inside
    * long for any real corpus (ranks to 2^42). */
  private val MixGrid = 1L << 20

  /** p12: deterministic MIXTURE-PRESERVING stream order — the data-loader
    * interleave every multilingual pretraining run needs: one global
    * training order where EVERY PREFIX carries the corpus's language mix
    * (a mixture defined per-epoch is useless if the first million steps
    * are all one language). No RNG: each doc gets a salted-hash
    * within-language rank (p08's machinery per stratum — two-level, the
    * per-language bucket pass bounded by the 32-bit hash space), its
    * stream key is the rank's language-quantile on the [[MixGrid]] grid,
    * and the global position is the two-level rank over that FIXED key
    * space (gb = pk div (grid/4096) — the p08 construction again, so no
    * corpus-sized window partition exists anywhere). Retried tasks,
    * resumes, and different clusters reproduce the identical stream; the
    * oracle states both ranks as naive single windows. Integer-only math
    * (one `div` per key), hash-exact. */
  private def p12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val hashed = Tables.documents(s, d).select($"doc_id", $"lang")
      .withColumn("h",
        conv(substring(md5(concat(lit("p12mix:"), $"doc_id".cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long"))
      .withColumn("bucket", expr(s"h div $RankBucketWidth"))
      .repartition(n, $"lang", $"bucket")
      // snapshotted: the bucket sums AND the ranked join both read this
      // narrow frame (column pruning would otherwise split the exchange)
      .localCheckpoint(eager = false)
    val bsums = hashed.groupBy($"lang", $"bucket").agg(count(lit(1)).as("bn"))
    val boffs = bsums
      .withColumn("boff", coalesce(sum($"bn").over(
        Window.partitionBy($"lang").orderBy($"bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"lang", $"bucket", $"boff")
    val nl = bsums.groupBy($"lang").agg(sum($"bn").as("nl"))
    val within = Window.partitionBy($"lang", $"bucket").orderBy($"h", $"doc_id")
    val ranked = hashed.join(boffs, Seq("lang", "bucket"))
      .withColumn("lang_rank", $"boff" + row_number().over(within).cast("long"))
      .join(broadcast(nl), "lang")
      .withColumn("pk", expr(s"((2 * lang_rank - 1) * $MixGrid) div (2 * nl)"))
    val g = ranked.withColumn("gb", expr(s"pk div ${MixGrid / 4096}"))
      .repartition(n, $"gb")
      // snapshotted for the same two-consumer reason — and it cuts the
      // whole first-level rank out of the second level's lineage
      .localCheckpoint(eager = false)
    val gsums = g.groupBy($"gb").agg(count(lit(1)).as("gn"))
    val goffs = gsums.withColumn("goff", coalesce(sum($"gn").over(
        Window.partitionBy(PrefixSum.onePart($"gb")).orderBy($"gb")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"gb", $"goff")
    val gwithin = Window.partitionBy($"gb").orderBy($"pk", $"lang", $"doc_id")
    g.join(goffs, "gb")
      .withColumn("pos", $"goff" + row_number().over(gwithin).cast("long") - 1L)
      .select($"doc_id", $"lang", $"lang_rank", $"pos")
      .orderBy($"doc_id")
  }

  /** Quality-quantile buckets for p11's global ranking. quality ∈ [0, 1]
    * by the tx2 formula, so the bucket domain is a CONSTANT [0, 4096] —
    * stronger than value-domain-bounded: the ordered bucket pass is ≤ 4097
    * rows at any corpus size. */
  private val SelBuckets = 4096L

  /** p11's level-3 subdivision width: doc_ids per sub-bucket within a
    * constant-quality run (session-tunable like [[PackBucketKey]] — C
    * trades the per-run ordered-pass row count, docRange/C, against the
    * row-level window partition size). */
  val SelSubBucketKey = "spark.graft.select.subbucket"
  private val SelSubBucketDefault = 4096L

  /** p11: token-BUDGET data selection — the greedy "take the best
    * documents until the token budget is spent" step every
    * quality-filtered pretraining mix ends with (the selection side of
    * DSIR/DataComp-style curation): documents ranked by (quality DESC,
    * doc_id), selected while the token mass BEFORE them is under the
    * budget (half the corpus token mass — a relative budget so the cut
    * bites at every sf), so the first document crossing the line is still
    * taken and the selected set is exactly a prefix of the ranking.
    *
    * Scale shape: the global ranking's running total NEVER runs as one
    * corpus-sized window — and, since round 11, not as one BUCKET-sized
    * window either. The tx2 quality formula is highly discrete (every
    * ≥10-token punctuation-free doc scores exactly 1.0), so the coarse
    * `floor(quality·B)` bucket alone gives no balance guarantee: the
    * qb = B cell can hold a constant fraction of the corpus. The prefix
    * therefore decomposes over THREE nested order-contiguous levels of
    * (quality DESC, doc_id):
    *
    *  1. qb = floor(quality·B) — monotone, ≤ B+1 bucket rows pay the
    *     ordered pass (constant-bounded: quality ∈ [0,1]) → `boff`;
    *  2. exact quality within qb — per-(qb, quality) sums, ordered pass
    *     over the DISTINCT qualities of each bucket → `qoff`. Its task
    *     size is the bucket's distinct-quality count — large exactly when
    *     runs are short, i.e. when level 3's partitions are small: the
    *     two skew modes are complementary, never stacked;
    *  3. sb = doc_id div C within a constant-quality run (doc_id is the
    *     tiebreak order, so `div` is order-contiguous) — per-(qb,
    *     quality, sb) sums, ordered pass over ≤ docRange/C sb rows per
    *     run → `soff`; the row-level window partitions by the FULL (qb,
    *     quality, sb) key, so even an all-1.0 corpus fans out across
    *     docRange/C tasks instead of one.
    *
    * `cum_before = boff + qoff + soff +` the within-(qb, quality, sb)
    * exclusive running sum. One corpus scan tokenizes once
    * (localCheckpoint — the tx19 shared-subtree discipline: all three
    * offset levels and the ranked join read it); n_tokens is the SAME
    * whitespace expression the maintained offsets are built from. Budget
    * compare in integers (2·cum < total), hash-exact; the oracle states
    * the semantics as the naive single-window rank over the gate CTEs. */
  private def p11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = TextQueries.wsTokens($"text")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(TextQueries.stop))).cast("double")
    val nPunct = size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double")
    val nChars = length($"text").cast("double")
    val quality = TextQueries.qualityFormula(
      nTok,
      when(nTok > 0, nStop / nTok).otherwise(lit(0.0)),
      when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)))
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val c = s.conf.getOption(SelSubBucketKey).map(_.toLong).getOrElse(SelSubBucketDefault)
    val scored = Tables.documentsWide(s, d)
      .select($"doc_id", quality.as("quality"),
        size(toks).cast("long").as("n_tokens"))
      .withColumn("qb", floor($"quality" * SelBuckets).cast("long"))
      .withColumn("sb", expr(s"doc_id div $c"))
      .localCheckpoint(eager = false)
    // level-3 cell sums: one map-side agg on the full nested key
    val ssums = scored.groupBy($"qb", $"quality", $"sb")
      .agg(sum($"n_tokens").as("ssum"))
      .localCheckpoint(eager = false)
    // level-2: run offsets within a constant-quality run (sb ascending —
    // doc_id is the tiebreak order, so sb is order-contiguous)
    val sw = Window.partitionBy($"qb", $"quality").orderBy($"sb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val soffs = ssums
      .withColumn("soff", coalesce(sum($"ssum").over(sw), lit(0L)))
      .select($"qb", $"quality", $"sb", $"soff")
    // level-2 totals → quality offsets within a bucket (quality DESC)
    val qsums = ssums.groupBy($"qb", $"quality").agg(sum($"ssum").as("qsum"))
    val qw = Window.partitionBy($"qb").orderBy($"quality".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val qoffs = qsums
      .withColumn("qoff", coalesce(sum($"qsum").over(qw), lit(0L)))
      .select($"qb", $"quality", $"qoff")
    // level-1: bucket offsets (≤ B+1 rows, the declared bounded pass)
    val bsums = qsums.groupBy($"qb").agg(sum($"qsum").as("bsum"))
    val bw = Window.partitionBy(PrefixSum.onePart($"qb")).orderBy($"qb".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val boffs = bsums
      .withColumn("boff", coalesce(sum($"bsum").over(bw), lit(0L)))
      .select($"qb", $"boff")
    val total = bsums.agg(sum($"bsum").as("total_tokens"))
    val ww = Window.partitionBy($"qb", $"quality", $"sb").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    scored.repartition(n, $"qb", $"quality", $"sb")
      .join(soffs, Seq("qb", "quality", "sb"))
      .join(qoffs, Seq("qb", "quality"))
      .join(boffs, "qb")
      .withColumn("cum_before",
        $"boff" + $"qoff" + $"soff" + coalesce(sum($"n_tokens").over(ww), lit(0L)))
      .crossJoin(broadcast(total))
      .select($"doc_id", $"quality", $"n_tokens", $"cum_before",
        ($"cum_before" * 2 < $"total_tokens").as("selected"))
      .orderBy($"doc_id")
  }

  def oracleSql: Map[String, String] = {
    val wsTok = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0)"
    val inStop = TextQueries.stop.map(w => s"t = '$w'").mkString("(", " OR ", ")")
    Map(
      // p09: every card figure recomputed from the RAW corpus — the
      // maintained tables the Spark side reads must agree or the hash breaks
      "p09_dataset_card" ->
        s"""WITH base AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
           |  FROM documents),
           |tok AS (
           |  SELECT CAST(COALESCE(SUM(len($wsTok)), 0) AS BIGINT) AS total_tokens
           |  FROM documents),
           |uniq AS (
           |  SELECT CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS BIGINT) AS n_unique_docs
           |  FROM documents),
           |vocab AS (
           |  SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_terms
           |  FROM (SELECT unnest($wsTok) AS t FROM documents) z),
           |emb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings)
           |SELECT base.n_docs, base.total_chars, base.n_langs, tok.total_tokens,
           |       uniq.n_unique_docs,
           |       base.n_docs - uniq.n_unique_docs AS n_exact_dup_docs,
           |       vocab.n_terms, emb.n_vectors
           |FROM base, tok, uniq, vocab, emb""".stripMargin,
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
           |    ${TextQueries.qualityFormulaSql("n_tok",
                  "CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END",
                  "CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END")} AS quality
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
           |ORDER BY source""".stripMargin,
      "p03_mixture_resample" -> {
        // 32-bit hash of the doc id key (NOT the text fingerprint): first 8
        // md5 hex digits via 1-based positions, the tx5/dd5 construction
        val h32 = (1 to 8).map { i =>
          val pow = java.lang.Long.toString(1L << (4 * (8 - i)))
          s"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * $pow"
        }.mkString("(", "\n         + ", ")")
        s"""WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
           |tgt AS (SELECT MIN(n_docs) AS n_target FROM counts),
           |kept AS (
           |  SELECT lang, COUNT(*) AS n_kept
           |  FROM documents JOIN counts USING (lang), tgt
           |  WHERE CAST($h32 AS HUGEINT) * n_docs < CAST(n_target AS HUGEINT) * 4294967296
           |  GROUP BY lang
           |)
           |SELECT lang, n_docs, n_target,
           |       coalesce(n_kept, 0) AS n_kept,
           |       CAST(coalesce(n_kept, 0) AS DOUBLE) / CAST(n_docs AS DOUBLE) AS achieved_rate
           |FROM (SELECT c.lang, c.n_docs, t.n_target FROM counts c, tgt t) ct
           |LEFT JOIN kept USING (lang)
           |ORDER BY lang""".stripMargin
      },
      // p10: weights recomputed from the RAW text (the maintained offsets
      // the Spark side reads must agree — the p05 consistency discipline);
      // the per-row PPS draw mirrors p03's hash construction in HUGEINT
      "p10_weighted_sample" -> {
        val h32 = (1 to 8).map { i =>
          val pow = java.lang.Long.toString(1L << (4 * (8 - i)))
          s"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * $pow"
        }.mkString("(", "\n         + ", ")")
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len($wsTok) AS BIGINT) AS n_tokens FROM documents),
           |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM t)
           |SELECT doc_id, n_tokens,
           |       LEAST(1.0e0, CAST(n_tokens * $PpsTarget AS DOUBLE)
           |                      / CAST(total_tokens AS DOUBLE)) AS p_incl
           |FROM t, tot
           |WHERE CAST($h32 AS HUGEINT) * total_tokens
           |      < CAST(n_tokens * $PpsTarget AS HUGEINT) * $Kmv32
           |ORDER BY doc_id""".stripMargin
      },
      // p12: both ranks stated as naive single windows — within-language
      // salted-hash order, then the global order by the grid key
      "p12_mixture_order" -> {
        val h32 = (1 to 8).map { i =>
          val pow = java.lang.Long.toString(1L << (4 * (8 - i)))
          s"(strpos('0123456789abcdef', substring(md5('p12mix:' || CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * $pow"
        }.mkString("(", "\n         + ", ")")
        s"""WITH r AS (
           |  SELECT doc_id, lang,
           |         row_number() OVER (PARTITION BY lang
           |                            ORDER BY CAST($h32 AS BIGINT), doc_id) AS lang_rank
           |  FROM documents),
           |nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
           |k AS (
           |  SELECT r.doc_id, r.lang, CAST(r.lang_rank AS BIGINT) AS lang_rank,
           |         ((2 * r.lang_rank - 1) * $MixGrid) // (2 * nl.n) AS pk
           |  FROM r JOIN nl USING (lang))
           |SELECT doc_id, lang, lang_rank,
           |       CAST(row_number() OVER (ORDER BY pk, lang, doc_id) - 1 AS BIGINT) AS pos
           |FROM k ORDER BY doc_id""".stripMargin
      },
      // p11: the semantics as the naive single-window rank — one global
      // cumulative sum ordered (quality DESC, doc_id) over the gate CTEs;
      // the engine's bucketed two-level formulation must be value-identical
      "p11_budget_select" ->
        s"""WITH $gateSql,
           |scored AS (
           |  SELECT doc_id,
           |    ${TextQueries.qualityFormulaSql("n_tok",
                  "CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END",
                  "CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END")} AS quality,
           |    CAST(n_tok AS BIGINT) AS n_tokens
           |  FROM gsig),
           |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM scored),
           |sel AS (
           |  SELECT doc_id, quality, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM scored)
           |SELECT s.doc_id, s.quality, s.n_tokens, s.cum_before,
           |       (s.cum_before * 2 < t.total_tokens) AS selected
           |FROM sel s, tot t ORDER BY s.doc_id""".stripMargin,
      // dd6's clustering SQL as a CTE + the tx5 hash construction keyed on
      // the CLUSTER id
      "p04_leakfree_split" ->
        s"""WITH clusters AS (
           |${DedupQueries.dd6Sql}
           |)
           |SELECT CASE WHEN (strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16
           |                 + strpos('0123456789abcdef', substring(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1 < 64
           |            THEN 'eval' ELSE 'train' END AS split,
           |       CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           |       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
           |FROM clusters
           |GROUP BY split
           |ORDER BY split""".stripMargin,
      // the oracle states the SEMANTICS as the naive single-window prefix
      // sum — the two-level bucket formulation must be value-identical
      "p05_token_offsets" ->
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len($wsTok) AS BIGINT) AS n_tokens FROM documents),
           |o AS (
           |  SELECT doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
           |  FROM t)
           |SELECT doc_id, n_tokens, start_off,
           |  CASE WHEN n_tokens > 0 THEN start_off // $SeqLen END AS chunk_first,
           |  CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) // $SeqLen END AS chunk_last
           |FROM o ORDER BY doc_id""".stripMargin,
      "p06_chunk_manifest" ->
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len($wsTok) AS BIGINT) AS n_tokens FROM documents),
           |o AS (
           |  SELECT doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
           |  FROM t WHERE n_tokens > 0),
           |e AS (
           |  SELECT o.doc_id, o.n_tokens, o.start_off, gs.chunk_id
           |  FROM o, LATERAL (SELECT unnest(generate_series(
           |    o.start_off // $SeqLen, (o.start_off + o.n_tokens - 1) // $SeqLen))
           |    AS chunk_id) gs)
           |SELECT chunk_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  MIN(doc_id) AS first_doc,
           |  MAX(doc_id) AS last_doc,
           |  CAST(SUM(LEAST(start_off + n_tokens, (chunk_id + 1) * $SeqLen)
           |           - GREATEST(start_off, chunk_id * $SeqLen)) AS BIGINT) AS n_chunk_tokens
           |FROM e GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,
      "p07_shard_manifest" -> {
        // the p03 32-bit md5 hash of the doc id, mod the shard count
        val h32 = (1 to 8).map { i =>
          val pow = java.lang.Long.toString(1L << (4 * (8 - i)))
          s"(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * $pow"
        }.mkString("(", "\n         + ", ")")
        s"""WITH t AS (
           |  SELECT doc_id, n_chars,
           |    CAST(len($wsTok) AS BIGINT) AS n_tokens,
           |    CAST($h32 AS BIGINT) % $NShards AS shard
           |  FROM documents)
           |SELECT shard,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |  MIN(doc_id) AS min_doc,
           |  MAX(doc_id) AS max_doc
           |FROM t GROUP BY shard ORDER BY shard""".stripMargin
      },
      // the oracle states the SEMANTICS as the naive single-window global
      // rank over the hash order — the bucketed two-level formulation must
      // be value-identical (the p05 discipline)
      "p08_epoch_shuffle" -> {
        val h32 = (1 to 8).map { i =>
          val pow = java.lang.Long.toString(1L << (4 * (8 - i)))
          s"(strpos('0123456789abcdef', substring(md5('p08epoch0:' || CAST(chunk_id AS VARCHAR)), $i, 1)) - 1) * $pow"
        }.mkString("(", "\n         + ", ")")
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len($wsTok) AS BIGINT) AS n_tokens FROM documents),
           |o AS (
           |  SELECT doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
           |  FROM t WHERE n_tokens > 0),
           |c AS (
           |  SELECT DISTINCT gs.chunk_id
           |  FROM o, LATERAL (SELECT unnest(generate_series(
           |    o.start_off // $SeqLen, (o.start_off + o.n_tokens - 1) // $SeqLen))
           |    AS chunk_id) gs),
           |hpos AS (
           |  SELECT chunk_id,
           |    CAST(ROW_NUMBER() OVER (ORDER BY CAST($h32 AS BIGINT), chunk_id) - 1 AS BIGINT) AS pos
           |  FROM c)
           |SELECT chunk_id, pos, pos // $BatchChunks AS batch
           |FROM hpos ORDER BY chunk_id""".stripMargin
      },
      "p02_kmv_cardinality" -> {
        // shared sketch definition: the SQL mirror of Kmv.hashCol
        val hex8 = graft.functions.Kmv.hashSql()
        val fpMd5 = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
        s"""WITH hv AS (
           |  SELECT DISTINCT source, $hex8 AS h
           |  FROM documents),
           |ranked AS (
           |  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
           |  FROM hv),
           |kth AS (SELECT source, h AS hk FROM ranked WHERE rn = $KmvK),
           |cnt AS (SELECT source, COUNT(*) AS n_hashes FROM hv GROUP BY source),
           |ex AS (
           |  SELECT source, COUNT(DISTINCT $fpMd5) AS n_exact
           |  FROM documents GROUP BY source)
           |SELECT source, n_exact,
           |  CASE WHEN hk IS NOT NULL
           |       THEN ${graft.functions.Kmv.estimateSql("hk", KmvK)}
           |       ELSE CAST(n_hashes AS DOUBLE) END AS kmv_est
           |FROM ex JOIN cnt USING (source) LEFT JOIN kth USING (source)
           |ORDER BY source""".stripMargin
      })
  }
}
