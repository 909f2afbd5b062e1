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
  */
private[operators] object Fixpoint {

  def iterate(init: DataFrame, cap: Int, what: String)(
      signature: DataFrame => Seq[Long])(
      step: (DataFrame, Seq[Long]) => DataFrame,
      fixedAt: Seq[Long] => Boolean = _ => false): DataFrame = {
    val t0 = System.nanoTime()
    var state = init.localCheckpoint(eager = false)
    var sig = signature(state)
    var round = 0
    var changed = true
    while (changed && round < cap) {
      val tr = System.nanoTime()
      val next = step(state, sig).localCheckpoint(eager = false)
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
      if (sys.env.contains("SPARK_GRAFT_LOOP_STATS")) System.err.println(
        f"[fixpoint]   $what%s round $round: ${(System.nanoTime() - tr) / 1e9}%.3f s, sig=$sig")
    }
    if (changed) throw new IllegalStateException(
      s"$what did not converge within $cap rounds; raise the cap")
    // round-count telemetry (round 14): per-round driver-synchronous cost
    // dominates these loops at bench scale, so the profile work needs the
    // denominator — one stderr line per loop execution, never on stdout
    // (the Bench JSON contract owns stdout)
    if (sys.env.contains("SPARK_GRAFT_LOOP_STATS")) System.err.println(
      f"[fixpoint] $what%s: $round rounds, ${(System.nanoTime() - t0) / 1e9}%.3f s")
    state
  }
}
