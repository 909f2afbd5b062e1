package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich/Haddow/Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
  * — the tokenizer-TRAINING step of an LLM data pipeline, run where the
  * corpus lives instead of funneling it through one machine.
  *
  * Classical BPE trains on the word-frequency table, and that is what makes
  * it distributable: the ONE corpus-sized pass is the word count (scan +
  * one hash shuffle on the word, the tx1 shape); every merge round after it
  * works on the distinct-word working set (vocabulary-sized — millions of
  * rows at web scale, never the corpus). Each round is: adjacent-pair
  * counts (typed flatMap, ~|word| pairs per distinct word) → one
  * partial+final hash agg → a ONE-ROW argmax collect (count desc, then
  * lexicographic — fully deterministic), then the greedy left-to-right
  * merge applied per word (pure per-row rewrite, no shuffle). Rounds
  * snapshot with lazy `localCheckpoint` per the [[Fixpoint]] discipline, so
  * the map lineage never stacks.
  *
  * Pair counts include overlapping occurrences (the standard zip count:
  * "aaa" counts (a,a) twice) while application merges greedily left-to-
  * right — the same convention as the reference implementation in the
  * original paper, pinned by BpeSpec's differential test against an
  * independent single-machine trainer. */
object BpeTrainer {

  /** One learned merge: at `rank`, `lhs`+`rhs` fused, having been the
    * most frequent adjacent pair with `pairCount` weighted occurrences. */
  final case class Merge(rank: Int, lhs: String, rhs: String, pairCount: Long)

  /** Train `nMerges` merges over `docs` (any frame with a `text` column,
    * tokenized by tx1's whitespace tokenizer). Stops early if no adjacent
    * pair remains. Returns the merge table in rank order — vocabulary-
    * sized driver state (the trained artifact), never corpus rows. */
  def train(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    val s = docs.sparkSession
    import s.implicits._
    var words: Dataset[(Seq[String], Long)] = docs
      .select(explode(TextQueries.wsTokens(col("text"))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
      .map { case (w, c) => (splitCodepoints(w), c) }
      .localCheckpoint(eager = false)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = words
        .flatMap { case (syms, c) =>
          syms.sliding(2).collect { case Seq(a, b) => (a, b, c) }
        }
        .toDF("lhs", "rhs", "wc")
        .groupBy($"lhs", $"rhs").agg(sum($"wc").as("cnt"))
        .orderBy(desc("cnt"), $"lhs", $"rhs").limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, c)
        val m = l + r
        words = words
          .map { case (syms, wc) => (applyMerge(syms, l, r, m), wc) }
          .localCheckpoint(eager = false)
        rank += 1
      }
    }
    merges.result()
  }

  /** Greedy left-to-right application of one merge to a symbol sequence —
    * the shared semantics of training and any downstream encoder. */
  private[operators] def applyMerge(
      syms: Seq[String], l: String, r: String, m: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = syms.length
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) { out += m; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Base symbols of a word, split by Unicode CODE POINT — the convention
    * Spark's `substring`/`length` (tx11) and DuckDB's `regexp_extract_all`
    * (the tx12 oracle) both use; splitting by UTF-16 unit would shear
    * surrogate pairs (emoji, rare CJK) into invalid half-symbols and
    * diverge from both engines. */
  private[operators] def splitCodepoints(w: String): Seq[String] =
    w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))

  /** Encode one word with a trained merge table (rank order) — the
    * inference-side counterpart used by specs to sanity-check round trips. */
  private[operators] def encode(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(splitCodepoints(word)) { (syms, mg) =>
      applyMerge(syms, mg.lhs, mg.rhs, mg.lhs + mg.rhs)
    }
}
