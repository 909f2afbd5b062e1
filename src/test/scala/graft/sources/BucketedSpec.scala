package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The at-rest bucketed layout's TWO provisioning paths: the initial
  * saveAsTable write, and the fresh-session re-attach (marker exists,
  * catalog empty → CREATE TABLE … CLUSTERED BY … LOCATION). The re-attach
  * is what every Bench-after-Verify JVM takes, so a regression there would
  * only surface in the driver run — pin it here, including that the
  * re-attached table still carries the bucket spec (a key-grouped agg
  * plans with no hash exchange). */
class BucketedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("re-attach path preserves rows and bucketing metadata") {
    import spark.implicits._
    // version 90: private to this spec, never shared with declared queries
    def provision(): String = Bucketed.table(spark, dir, "documents_spec", "doc_id", 4, 90) {
      Tables.documents(spark, dir).repartition(4, $"doc_id")
        .select($"doc_id", $"source", $"n_chars")
    }
    val t1 = provision()
    val expected = spark.table(t1).orderBy($"doc_id").collect().toSeq
    assert(expected.nonEmpty)

    // simulate a fresh session: drop the catalog entry, keep the files
    spark.sql(s"DROP TABLE $t1")
    assert(!spark.catalog.tableExists(t1))
    val t2 = provision()
    assert(t2 == t1)
    assert(spark.table(t2).orderBy($"doc_id").collect().toSeq == expected,
      "re-attached table must serve identical rows")

    // the DDL must re-trust the bucket layout: grouping on the bucket key
    // plans without a hash exchange
    val plan = spark.table(t2).groupBy($"doc_id").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle after re-attach:\n${plan.take(1500)}")
    val numBuckets = spark.sql(s"DESCRIBE EXTENDED $t2").collect()
      .find(_.getString(0) == "Num Buckets").map(_.getString(1))
    assert(numBuckets.contains("4"), s"bucket spec lost on re-attach: $numBuckets")
  }
}
