package graft.build

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once, at-rest cache for derived index tables (LSH signatures,
  * shingle sets, minhash bands, …), sharing the [[GraphCache]] philosophy:
  * index structures are built at INGEST, not per query — at 100 TB you write
  * the signature table next to the corpus exactly once and every dedup /
  * similarity query starts from the index scan. The versioned path + marker
  * file make stale layouts from older code unreachable, and a later JVM
  * (bench after verify) reuses the files without rebuilding. */
object DerivedCache {

  private val memo = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Memoized at-rest materialization of `build`, keyed by (session, source
    * dir, table name, layout version). */
  def table(spark: SparkSession, dir: String, name: String, version: Int)
      (build: => DataFrame): DataFrame = synchronized {
    val san = dir.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+|_+$", "")
    val path = s"target/graft-cache/$san/${name}_v$version"
    memo.getOrElseUpdate((spark, path), {
      val marker = Paths.get(s"$path/_GRAFT_DONE")
      if (!Files.exists(marker)) {
        build.write.mode("overwrite").parquet(path)
        Files.createFile(marker)
      }
      spark.read.parquet(path)
    })
  }
}
