package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver's Parquet tables (TESTDATA.md). One call per table so
  * Catalyst sees an independent relation per use site (column pruning +
  * predicate pushdown reach each scan separately). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has CHANGED across driver testdata
    * generations — TIMESTAMP(NANOS) originally (reads as a nanosecond Long
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, which Spark's
    * vectorized reader otherwise rejects), TIMESTAMP(MICROS) without UTC
    * adjustment since round 9 (reads as TimestampNTZ). Normalize EVERY
    * possible read type to one schema — a UTC-instant microsecond
    * TimestampType — so downstream code (including `unix_micros` in
    * [[graft.operators.AsOf.joinNearest]]) sees one type regardless of the
    * file generation or the runner's Spark conf. Round 8's bench/verify
    * split (a06 failing in one runner, absent from the artifact of the
    * other) came from handling only the Long case here.
    *
    *  - Long (nanos): floor-truncate to micros, matching DuckDB's read.
    *  - TimestampType: already an instant; pass through.
    *  - TimestampNTZ: the file's wall-clock is UTC. A bare cast would
    *    interpret it in the SESSION timezone, so shift the wall time from
    *    UTC to the session zone first — the composition yields the same
    *    instant under ANY session timezone (graft runners pin UTC, where
    *    both steps are the identity on the wall value).
    *  - anything else: fail loudly at plan time, never silently mis-read. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        val sessionTz = s.conf.get("spark.sql.session.timeZone")
        raw.withColumn("ts",
          convert_timezone(lit("UTC"), lit(sessionTz), col("ts")).cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unsupported type $other; expected nanos-as-Long, " +
            "TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** `documents` redistributed for CPU-heavy per-row stages (tokenization,
    * regex scoring, hashing): scan parallelism is bounded by row groups —
    * the test corpus is ONE row group, so a fused scan+score stage runs
    * single-task regardless of cores. Repartitioning on the stable key
    * separates scan parallelism from COMPUTE parallelism for a few hundred
    * KB of shuffle — the same discipline as the multimodal decode's
    * repartition(assetId). On a many-row-group production corpus the same
    * move still bounds task skew when per-row cost dwarfs scan cost;
    * cheap projections should keep reading [[documents]] directly. */
  def documentsWide(s: SparkSession, d: String): DataFrame = {
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    documents(s, d).repartition(n, org.apache.spark.sql.functions.col("doc_id"))
  }

  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
