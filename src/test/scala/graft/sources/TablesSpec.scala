package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec

/** Pins the `events.ts` read-type normalization ([[Tables.events]]).
  *
  * The driver's testdata generator has emitted `ts` as TIMESTAMP(NANOS)
  * (rounds 1–8) and as non-UTC-adjusted TIMESTAMP(MICROS) (round 9+), and
  * runner configs differ on `nanosAsLong` — so the loader must yield ONE
  * schema (UTC-instant TimestampType) for every combination. Round 8's a06
  * regression (AnalysisException: unix_micros requires TIMESTAMP, silently
  * absent from CORRECTNESS_r08) was exactly this normalization missing the
  * TimestampNTZ case.
  */
class TablesSpec extends SparkSpec {
  private val real = "/root/testdata/sf0.001"

  test("driver testdata events.ts normalizes to TimestampType") {
    val ev = Tables.events(spark, real)
    assert(ev.schema("ts").dataType == TimestampType)
    // the round-8 failure mode: unix_micros must analyze and execute
    val n = ev.select(unix_micros(col("ts")).as("us")).filter(col("us").isNotNull).count()
    assert(n > 0)
  }

  test("a06_nearest_join analyzes and returns rows on driver testdata") {
    val df = graft.operators.AsOfQueries.queries("a06_nearest_join")(spark, real)
    assert(df.count() > 0)
  }

  test("nanos-as-Long and TIMESTAMP_NTZ reads yield the same instants") {
    import spark.implicits._
    // one wall-clock second past the epoch day boundary, micro precision
    val micros = Seq(86400000000L, 86400000001L, 1700000000123456L)

    val ntzDir = Files.createTempDirectory("tables-ntz").toString
    spark.createDataset(micros).toDF("us")
      .select(col("us").as("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    val longDir = Files.createTempDirectory("tables-long").toString
    spark.createDataset(micros).toDF("us")
      .select(col("us").as("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$longDir/events.parquet")

    def instants(d: String): Seq[Long] = {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType)
      ev.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    }
    assert(instants(ntzDir) == micros.sorted)
    assert(instants(longDir) == micros.sorted)
  }

  test("unsupported ts read type fails loudly at plan time") {
    val dir = Files.createTempDirectory("tables-bad").toString
    import spark.implicits._
    Seq(("a", "b")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported"))
  }
}
