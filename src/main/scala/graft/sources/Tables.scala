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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * Verify/Bench) it reads as a nanosecond Long; normalize it back to a
    * microsecond TimestampType so downstream code sees one schema either way.
    * Floor-truncation to micros matches DuckDB's read of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
