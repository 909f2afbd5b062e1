package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Benchmark main, mirroring the reference's timing protocol
  * (`cypher_query_timing.py:217-233`): N repetitions per query (default 5,
  * `SPARK_GRAFT_BENCH_REPS`), full result materialization via the noop sink
  * (a bare count() would let Catalyst delete sorts and unread projections),
  * nearest-rank median / 5th / 95th percentiles. Failures are recorded per
  * query — never silently mapped to a fake wall time. Output is ONE JSON
  * line: total = sum of per-query medians. */
object Bench {

  private def pct(sorted: Seq[Double], q: Double): Double =
    sorted(math.round((sorted.size - 1) * q).toInt)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = mutable.LinkedHashMap.empty[String, String]
    val stats = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            // strip quote/backslash and ALL control chars — the one-line
            // JSON contract must survive any exception text
            errors(name) = e.toString.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
            None
        }
      }.sorted
      name -> times
    }

    def jmap(f: (String, Seq[Double]) => Double): String = stats
      .collect { case (k, ts) if ts.nonEmpty => s"\"$k\":${f(k, ts)}" }
      .mkString("{", ",", "}")
    val medians = jmap((_, ts) => pct(ts, 0.5))
    val p05 = jmap((_, ts) => pct(ts, 0.05))
    val p95 = jmap((_, ts) => pct(ts, 0.95))
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }.mkString("{", ",", "}")
    val total = stats.collect { case (_, ts) if ts.nonEmpty => pct(ts, 0.5) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$medians,""" +
      s""""p05":$p05,"p95":$p95,"reps":$reps,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
