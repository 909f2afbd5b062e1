package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the explicit skew-mitigation operator for
  * fact-to-fact joins whose key distribution is too skewed for one reducer
  * per key. AQE's runtime skew-join split handles MOST skew transparently
  * (and the library leaves it enabled), but AQE only splits post-shuffle
  * partitions of SORT-MERGE joins and can't help when a single key's rows
  * must still meet in one task downstream (e.g. a following groupBy on the
  * same key); salting is the plan-level fix a 100 TB pipeline reaches for
  * when one key holds billions of rows.
  *
  * Shape: the skewed (probe) side is split into `salt` deterministic
  * sub-keys by hashing a stable per-row discriminator; the other side is
  * replicated `salt` times with a compact `explode(sequence)` — the row
  * count multiplies by `salt`, so salt the side whose per-key cardinality
  * is LOW (dimension-like) and keep `salt` small (8–64). The join then runs
  * on (key, salt-bucket): every key now occupies `salt` shuffle partitions
  * instead of one, bounding the largest task at 1/salt of the hottest key.
  *
  * The result is row-identical to the plain equi-join (each probe row meets
  * exactly the one replica of its matching rows that carries its bucket),
  * which is what the declared q15 query's oracle asserts: the SQL oracle is
  * the PLAIN join — the salting must be invisible in the result.
  */
object Skew {

  /** Internal working column; inputs carrying it would be silently
    * overwritten (same guard discipline as [[AsOf]]). */
  private val SaltCol = "graft_salt"

  /** Join `probe` (skewed side) to `dim` (replicated side) on `keys`.
    *
    * @param probe   the large side with skewed key frequencies
    * @param dim     the side to replicate `salt`× (its per-key row count is
    *                multiplied; keep it the smaller side)
    * @param keys    equi-join key columns present on both sides
    * @param salt    number of sub-buckets per key (>= 1)
    * @param saltBy  deterministic per-row discriminator on `probe` (e.g. a
    *                line-number or primary-key column) — hashing it spreads
    *                a hot key's rows across buckets reproducibly, never via
    *                `rand()` (a retried task re-drawing different salt would
    *                duplicate/lose rows)
    */
  def saltedJoin(probe: DataFrame, dim: DataFrame, keys: Seq[String],
      salt: Int, saltBy: Column): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val clashes = (probe.columns ++ dim.columns).filter(_ == SaltCol)
    require(clashes.isEmpty,
      s"input frames must not contain the reserved column $SaltCol")
    // pmod keeps negative hashes in [0, salt)
    val p = probe.withColumn(SaltCol, pmod(hash(saltBy), lit(salt)))
    val r = dim.withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1))))
    p.join(r, keys :+ SaltCol).drop(SaltCol)
  }
}
