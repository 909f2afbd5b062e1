package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.build.DerivedCache

/** Hard size gate for the DECLARED non-scale control queries — dd2's
  * exhaustive shared-shingle self-join and ss1's brute-force cosine scan.
  * Both exist as correctness/recall baselines for the indexed variants
  * (dd3, ss2–ss8) and must never be pointed at a production corpus: dd2 is
  * quadratic in shingle document frequency, ss1 reads every vector. The
  * gate is one count over the at-rest input, MEMOIZED per (session, query,
  * corpus, mutation epoch) — the count is a data property that must not
  * inflate every timed rep of the very control queries the scaling harness
  * measures, but the at-rest inputs are NOT immutable (the incremental
  * append paths grow them), so the corpus's [[DerivedCache.mutationEpoch]]
  * keys the memo and any append/replace forces a recount. Running a bigger
  * control is a deliberate act (`spark.graft.control.maxRows`), never an
  * accident. */
private[operators] object Controls {

  val MaxRowsKey = "spark.graft.control.maxRows"
  val MaxRowsDefault = 10000000L

  /** Returns `df` unchanged when its row count is within the configured
    * guard; throws otherwise. `corpus` + its mutation epoch key the
    * memoized count. */
  def gate(df: DataFrame, what: String, corpus: String): DataFrame = {
    val max = df.sparkSession.conf.getOption(MaxRowsKey)
      .map(_.toLong).getOrElse(MaxRowsDefault)
    val n = EpochMemo.scalar(df.sparkSession, what, corpus)(df.count())
    check(n, what, max)
    df
  }

  private[operators] def gate(df: DataFrame, what: String, max: Long): DataFrame = {
    check(df.count(), what, max)
    df
  }

  private def check(n: Long, what: String, max: Long): Unit =
    require(n <= max,
      s"$what is a declared correctness/recall CONTROL, not a scale path: " +
        s"input has $n rows > $MaxRowsKey=$max. Use the indexed variant " +
        "(dd3 / ss2+) or raise the guard deliberately.")

  val CandMassKey = "spark.graft.containment.maxCandMass"
  val CandMassDefault = 1000000000L

  /** Average candidate fan-out per prefix row above which the containment
    * family escalates from single-shingle to PAIR witnesses
    * ([[DedupQueries.containmentPairs]]). A Heaps-law corpus measures
    * ≈0.1 (prefix shingles have df ≈ 1), the saturated sf1 rung ≈71; the
    * default sits an order of magnitude above healthy and well below
    * saturated. 0 forces the pair route (equivalence specs); a huge value
    * pins the single route. */
  val EscalateFanoutKey = "spark.graft.containment.escalateFanout"
  val EscalateFanoutDefault = 16.0

  /** dd4's analog of [[EscalateFanoutKey]]: average pigeonhole fan-out per
    * (band, chunk) row above which the SimHash family escalates from the
    * 4×16-bit single-chunk bands to 2-of-5 block-pair witnesses
    * ([[DedupQueries.simhashPairBands]]). Healthy sf0.1 measures ≈10, the
    * saturated sf1 rung ≈87. Same forcing semantics: 0 forces the pair
    * route, a huge value pins the single route. */
  val SimhashEscalateKey = "spark.graft.simhash.escalateFanout"

  /** [[SimhashEscalateKey]]'s default — sized for dd4's OWN measured band
    * (round-13 advice: reusing containment's 16 left only 1.6× headroom
    * over dd4's healthy ≈10, so a slightly-concentrated but healthy corpus
    * could spuriously flip to the pair route — answer-preserving, but 2.5×
    * band rows and a second mass probe for nothing). 30 is the geometric
    * mean of healthy ≈10 and saturated ≈87: 3× headroom each way. */
  val SimhashEscalateDefault = 30.0

  /** Candidate-MASS pre-flight gate for the index-driven candidate families
    * (prefix containment dd7/dd10, banded LSH dd3/dd8/dd9, SimHash
    * pigeonhole dd4) — the seatbelt on top of the dd21/dd15 instruments.
    * The prefix/pigeonhole candidate sets are REQUIRED for exactness, but
    * in the vocabulary-saturation regime (fixed vocabulary ⇒ every df grows
    * linearly with the corpus) they grow ~N² — measured at the sf1 rung:
    * dd7 exp +1.81, dd4 +1.12; one more decade at exp 1.8 is hours of
    * quadratic join. `mass` must be the EXACT pre-distinct candidate-join
    * row count, computable from the at-rest index tables with one narrow
    * agg (zero text reads for the prefix/band families); it is memoized per
    * (session, query, corpus, mutation epoch) like the row-count gates, so
    * timed reps never re-pay it but any append forces a re-check. The
    * default admits the sf1 ladder rung (max measured mass 2.1e7) with
    * ~50× headroom; crossing it is a deliberate act, never an accident. */
  def massGate(s: SparkSession, what: String, corpus: String,
      instrument: String)(mass: => Long): Unit = {
    val m = EpochMemo.scalar(s, s"mass:$what", corpus)(mass)
    massCheck(s, what, instrument, m)
  }

  /** The gate's check on an ALREADY-computed (and separately memoized)
    * mass — the containment family's routes memoize their own per-route
    * pre-flights, so the shared `mass:` memo key would serve a stale
    * route's value after an escalation flip. */
  private[operators] def massCheck(s: SparkSession, what: String,
      instrument: String, m: Long): Unit = {
    val max = s.conf.getOption(CandMassKey)
      .map(_.toLong).getOrElse(CandMassDefault)
    require(m <= max,
      s"$what pre-flight: candidate mass $m exceeds $CandMassKey=$max — " +
        "this corpus is in the VOCABULARY-SATURATION regime for the index " +
        "(df grows with the corpus, candidates ~N²). Re-shingle at a higher " +
        "n, raise the threshold, or route to the semantic family (dd13); " +
        s"$instrument shows where the mass concentrates. Raising the guard " +
        "is a deliberate act.")
  }
}

/** Memoized scalar data properties keyed by (session, name, corpus,
  * mutation epoch) — the shared machinery behind every size probe that
  * plans a query (the control gates above, the a03-pattern broadcast
  * guards). Probes are data properties, so they must not re-run on every
  * timed rep; but the at-rest inputs are NOT immutable (the incremental
  * append paths grow them), so the corpus's [[DerivedCache.mutationEpoch]]
  * keys each entry and any append/replace forces a recompute. Entries for
  * superseded epochs (and stopped sessions) are evicted on access, so a
  * long-lived ingest session holds at most one entry per (name, corpus).
  *
  * Concurrency: the map stores lazily-forced cells, and
  * `TrieMap.getOrElseUpdate` installs exactly ONE cell per key — two
  * queries planning the same probe concurrently force the same `lazy val`,
  * so the Spark count job the memo exists to dedupe runs once (a raced
  * loser's un-forced cell is garbage, never executed). The eviction scans
  * are O(live entries) — one per (name, corpus), bounded by the declared
  * surface. */
private[operators] object EpochMemo {

  private final class Cell(@volatile private var compute: () => Long) {
    // release the thunk once forced: the closure can capture a DataFrame
    // and its whole plan graph, dead weight next to the 8-byte result
    lazy val value: Long = {
      val v = compute()
      compute = null
      v
    }
  }

  private val memo = TrieMap.empty[(SparkSession, String, String, Long), Cell]

  def scalar(s: SparkSession, name: String, corpus: String)(compute: => Long): Long = {
    memo.keys.filter(_._1.sparkContext.isStopped).foreach(memo.remove)
    val epoch = DerivedCache.mutationEpoch(corpus)
    memo.keys
      .filter(k => k._1 == s && k._2 == name && k._3 == corpus && k._4 != epoch)
      .foreach(memo.remove)
    memo.getOrElseUpdate((s, name, corpus, epoch), new Cell(() => compute)).value
  }
}
