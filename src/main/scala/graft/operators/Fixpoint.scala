package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared driver for DataFrame fixpoint loops (g01 reachability, g02 k-core
  * peel, g03 components, dd6 dup clustering) — the loop DISCIPLINE lives
  * here exactly once:
  *
  *  - each round's state is snapshotted with a lazy `localCheckpoint`
  *    (never persist/unpersist cycling — non-cascading uncache recompiles
  *    dependents and silently replays the whole round chain; see
  *    SCALING.md §8c);
  *  - ONE action per round: the caller's signature aggregate materializes
  *    the checkpoint and decides convergence (callers pick a signature
  *    that is strictly monotone until their fixpoint);
  *  - a round cap that FAILS LOUDLY — a silently truncated fixpoint is a
  *    plausible-looking wrong answer that would also diverge from the
  *    oracle on a deeper corpus.
  *
  * The step function receives the latest signature so callers can pick a
  * cheaper plan for small frontiers (g01's literal path).
  *
  * Round 15 (`oneAction`, guide §1.2 driver-synchronous cost): under AQE,
  * every lazy `localCheckpoint`'s `toRdd` synchronously executes the round
  * plan's shuffle stages as separate jobs BEFORE the signature aggregate
  * runs the final stage — so a "one action" round was really 2+
  * driver-synchronous plan executions, a fixed ~0.2–0.4 s floor per round
  * at bench scale (round-14 telemetry) that never amortizes because loop
  * state is always a stats-free LogicalRDD. Loops whose step plans carry
  * EXPLICIT join modes everywhere (`broadcast`/`shuffle_hash` hints — AQE
  * has no strategy decision left to make for them) can opt in to
  * `oneAction = true`: AQE is disabled for the loop region only, `toRdd`
  * becomes lazy, and the signature collect is genuinely the round's single
  * job, computing and persisting the checkpoint blocks on the way. Loops
  * with unhinted step joins (g15/g17's triangle re-enumeration) must stay
  * on AQE for its runtime SMJ→broadcast conversion and keep the default.
  * Results are unaffected — AQE is a physical-planning feature; the
  * session posture is restored in a finally. (Session conf mutation: safe
  * because Verify/Bench/tests drive queries single-threaded; a concurrent
  * caller would at worst plan one query without AQE.)
  * `spark.graft.fixpoint.aqe=true` force-keeps AQE as an escape hatch. */
private[operators] object Fixpoint {

  private val KeepAqeKey = "spark.graft.fixpoint.aqe"

  /** State rows per loop-shuffle partition under `oneAction` (the manual
    * stand-in for AQE's coalescing, sized for these narrow ≤32-byte state
    * rows; production tuning knob). Callers of `oneAction = true` must put
    * the state ROW COUNT first in their signature — it drives the width. */
  private val RowsPerPartitionKey = "spark.graft.fixpoint.rowsPerPartition"

  def iterate(init: DataFrame, cap: Int, what: String)(
      signature: DataFrame => Seq[Long])(
      step: (DataFrame, Seq[Long]) => DataFrame,
      fixedAt: Seq[Long] => Boolean = _ => false,
      oneAction: Boolean = false): DataFrame = {
    val t0 = System.nanoTime()
    val s = init.sparkSession
    val stats = sys.env.contains("SPARK_GRAFT_LOOP_STATS")
    val aqeKey = "spark.sql.adaptive.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevAqe = s.conf.get(aqeKey, "true")
    val prevParts = s.conf.get(partsKey)
    val flipAqe = oneAction && prevAqe == "true" &&
      !s.conf.getOption(KeepAqeKey).exists(_.toBoolean)
    // With AQE off, loop shuffles lose its runtime coalescing, so the width
    // must be SCALE-ADAPTIVE rather than the session constant (guide §2.2):
    // every oneAction caller's signature leads with the state row count, so
    // each round plans its shuffles at ~rowsPerPartition state rows per
    // task, clamped to the session width — one task at bench scale (what
    // AQE coalesced to), the full session width once the state outgrows it.
    val rowsPer = s.conf.getOption(RowsPerPartitionKey)
      .map(_.toLong).getOrElse(100000L)
    def loopWidth(n: Long): Int = math.max(1L,
      math.min(prevParts.toLong, (n + rowsPer - 1) / rowsPer)).toInt
    if (flipAqe) s.conf.set(aqeKey, "false")
    try {
      var state = init.localCheckpoint(eager = false)
      var sig = signature(state)
      var round = 0
      var changed = true
      while (changed && round < cap) {
        val tr = System.nanoTime()
        if (flipAqe) s.conf.set(partsKey, loopWidth(sig.head).toString)
        val next = step(state, sig).localCheckpoint(eager = false)
        val tc = System.nanoTime()
        val nextSig = signature(next)
        // round 14: frontier-carrying loops can PROVE the fixpoint from the
        // signature itself (an empty frontier makes the next round a no-op
        // by construction), saving the one confirmation round the plain
        // sig-compare needs — at ~0.4 s of fixed per-round cost (checkpoint
        // + signature job) that round is pure overhead
        changed = nextSig != sig && !fixedAt(nextSig)
        sig = nextSig
        state = next
        round += 1
        if (stats) System.err.println(
          f"[fixpoint]   $what%s round $round: ckpt ${(tc - tr) / 1e9}%.3f s + " +
            f"sig ${(System.nanoTime() - tc) / 1e9}%.3f s, sig=$sig")
      }
      if (changed) throw new IllegalStateException(
        s"$what did not converge within $cap rounds; raise the cap")
      // round-count telemetry (round 14): per-round driver-synchronous cost
      // dominates these loops at bench scale, so the profile work needs the
      // denominator — one stderr line per loop execution, never on stdout
      // (the Bench JSON contract owns stdout)
      if (stats) System.err.println(
        f"[fixpoint] $what%s: $round rounds, ${(System.nanoTime() - t0) / 1e9}%.3f s" +
          (if (flipAqe) " (oneAction)" else ""))
      state
    } finally {
      if (flipAqe) {
        s.conf.set(aqeKey, prevAqe)
        s.conf.set(partsKey, prevParts)
      }
    }
  }
}
