package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE document identity fingerprint — md5 over whitespace-normalized
  * lowercase text — shared by batch exact dedup (dd1), the per-source
  * uniqueness profile (tx4), and streaming ingest dedup, so the three
  * surfaces can never silently diverge on what counts as "the same
  * document". Oracle SQL mirrors it as
  * `md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))`. */
object Fingerprint {
  def fingerprintMd5(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " ").cast("binary"))
}
