package graft.timeline

import graft.SparkSpec

/** Timeline semantics per the reference: EXCLUSIVE range bounds
  * (`BaseTimeline.java:551,614,658,678`), invalid-range rejection
  * (`BaseTimeline.java:637-641`), point lookup, first/last. */
class TimelineSpec extends SparkSpec {

  // timestamps at 100-second grid: 0,100,...,900
  private lazy val payload = {
    import org.apache.spark.sql.functions._
    spark.range(0, 10).toDF("id")
      .withColumn("ts_start", timestamp_seconds(col("id") * 100))
  }
  private lazy val tl = Timeline(payload)

  test("point lookup returns exactly the matching node") {
    val rows = tl.nodesAt(300L).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("allAfter is strictly greater (exclusive)") {
    assert(tl.allAfter(300L).count() == 6) // 400..900
  }

  test("allBefore is strictly less (exclusive)") {
    assert(tl.allBefore(300L).count() == 3) // 0,100,200
  }

  test("allBetween excludes both bounds") {
    val ids = tl.allBetween(200L, 600L).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 4L, 5L)) // 300,400,500
  }

  test("allBetween rejects from >= to like the reference") {
    intercept[IllegalArgumentException](tl.allBetween(600L, 600L))
    intercept[IllegalArgumentException](tl.allBetween(700L, 600L))
  }

  test("nodes(after, before) dispatches on null-ness") {
    assert(tl.nodes(None, None).count() == 10)
    assert(tl.nodes(Some(300L), None).count() == 6)
    assert(tl.nodes(None, Some(300L)).count() == 3)
    assert(tl.nodes(Some(200L), Some(600L)).count() == 3)
  }

  test("firstLast aggregates min/max/count") {
    val r = tl.firstLast.collect()(0)
    assert(r.getTimestamp(0).toInstant.getEpochSecond == 0L)
    assert(r.getTimestamp(1).toInstant.getEpochSecond == 900L)
    assert(r.getLong(2) == 10L)
  }

  test("removeAt drops exactly the nodes at one timestamp (D12)") {
    val after = tl.removeAt(300L)
    assert(after.allNodes.count() == 9)
    assert(after.nodesAt(300L).count() == 0)
    // neighbors untouched; range scans see the shrunken timeline
    assert(after.nodesAt(200L).count() == 1)
    assert(after.allBetween(200L, 600L).count() == 2) // 400,500
    // original timeline is an unmodified snapshot
    assert(tl.nodesAt(300L).count() == 1)
  }

  test("removeNodes + rewrite persists the deletion durably (D12)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-tl").toString
    val rewritten = tl.removeNodes(col("id") >= 8).rewrite(s"$dir/snap")
    assert(rewritten.allNodes.count() == 8)
    val reread = Timeline(spark.read.parquet(s"$dir/snap"))
    assert(reread.firstLast.collect()(0).getTimestamp(1).toInstant.getEpochSecond == 700L)
  }

  test("timestampFor is the reverse payload->timestamp lookup (D11)") {
    import org.apache.spark.sql.functions._
    val tss = tl.timestampFor(col("id") === 7).collect()
    assert(tss.map(_.getTimestamp(0).toInstant.getEpochSecond).toSeq == Seq(700L))
    assert(tl.timestampFor(col("id") === 99).count() == 0)
  }

  test("catalog delete with dropData removes the at-rest snapshot (D13)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-tl-del").toString
    val snap = tl.rewrite(s"$dir/snap")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/snap")))
    val cat = new TimelineCatalog
    cat.create("victim", snap.payload)
    // binding-only delete leaves data; re-create with the snapshot timeline
    cat.delete("victim")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/snap")))
    val cat2 = new TimelineCatalog
    cat2.bind("victim2", snap)
    cat2.delete("victim2", dropData = true)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/snap")))
  }

  test("catalog guards timeline-name reuse with a different payload") {
    val cat = new TimelineCatalog
    cat.create("t1", payload)
    cat.create("t1", payload) // same payload: fine
    val other = payload.limit(5)
    intercept[IllegalArgumentException](cat.create("t1", other))
    cat.delete("t1")
    cat.create("t1", other) // after delete the name is free
  }
}
