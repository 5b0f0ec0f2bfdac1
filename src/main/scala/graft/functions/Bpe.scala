package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import graft.plans.BpeExpressions

/** Byte-pair-encoding tokenizer training and segmentation — the tokenizer-
  * fitting stage of a training-data pipeline, Spark-first.
  *
  * Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): start from character symbols per word (plus
  * an end-of-word marker), repeatedly count adjacent symbol pairs weighted
  * by word frequency and merge the most frequent pair, recording the merge
  * order; segmentation replays the merges on new text.
  *
  * Scale shape: the CORPUS is scanned exactly once — everything iterative
  * runs on the word-frequency VOCABULARY (distinct words), which is
  * corpus-size-independent for natural text. Per merge: one shuffle (pair
  * counts, partial-aggregated map-side), a 1-row argmax collect (the
  * trainer's convergence probe — same driver contact as
  * `duplicateClusters`), and a vocab-local native-expression rewrite with
  * a per-iteration `localCheckpoint` lineage cut (reliable checkpoint at
  * cluster scale via `reliableCheckpoint = true`). Industrial vocabularies
  * (30k+ merges) batch several non-conflicting merges per round to
  * amortize the shuffle; this implementation keeps the reference
  * algorithm's strictly-sequential greedy order, which the spec pins
  * against a brute-force reference.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Word-frequency vocabulary as (cnt, syms) — characters + `</w>`. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(F.explode(F.split(F.col(textCol), "\\s+")).as("word"))
      .where(F.col("word") =!= "")
      .groupBy("word").agg(F.count(F.lit(1)).as("cnt"))
      .select(F.col("cnt"),
        F.concat(F.filter(F.split(F.col("word"), ""), s => s =!= ""),
          F.array(F.lit(EndOfWord))).as("syms"))

  /** Adjacent-pair counts over a (cnt, syms) vocabulary — the per-iteration
    * counting core (and the oracled face q106). Deterministic total order:
    * freq desc, then (lhs, rhs) ascending.
    *
    * Pairs ride the NATIVE shingle pass as "lhs rhs" strings (symbols are
    * whitespace-split word pieces plus `</w>`, so they can never contain
    * the space separator): an interpreted zip_with lambda here would run
    * per symbol per vocab word PER MERGE ITERATION — at a 100M-word
    * vocabulary that is ~1e9 interpreted evals per merge. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(F.col("cnt"),
        F.explode(graft.plans.Expressions.shingleArray(F.col("syms"), 2)).as("__pg"))
      .groupBy("__pg").agg(F.sum("cnt").as("freq"))
      .select(F.substring_index(F.col("__pg"), " ", 1).as("lhs"),
        F.substring_index(F.col("__pg"), " ", -1).as("rhs"),
        F.col("freq"))

  /** Train `numMerges` BPE merges on `docs(textCol)`. Returns the merge
    * table (rank, lhs, rhs, freq) in learned order; stops early when no
    * pair reaches `minPairCount`. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2, reliableCheckpoint: Boolean = false): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    def cut(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    var vocab = cut(vocabulary(docs, textCol))
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(F.col("freq").desc, F.col("lhs"), F.col("rhs"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) exhausted = true
      else {
        val (lhs, rhs, freq) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, lhs, rhs, freq))
        val prev = vocab
        vocab = cut(vocab.withColumn("syms",
          BpeExpressions.mergePair(F.col("syms"), lhs, rhs)))
        // the new cut is materialized (eager), so the previous iteration's
        // cached blocks are dead — release them, or a long training run
        // pins O(numMerges × vocab) in the block manager
        prev.unpersist(blocking = false)
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "lhs", "rhs", "freq")
      .select(F.col("rank").cast("long").as("rank"),
        F.col("lhs"), F.col("rhs"), F.col("freq"))
  }

  /** Segment text under a learned merge table (rank order). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    BpeExpressions.encode(text, merges, EndOfWord)

  /** Collect a merge DataFrame (rank, lhs, rhs, ...) into the ordered list
    * `encode` takes. Driver-sized by construction: the merge table has
    * `numMerges` rows. */
  def mergeList(merges: DataFrame): Seq[(String, String)] =
    merges.select("rank", "lhs", "rhs").collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq

  /** Merge list ↔ one string, for the SQL face (`bpe_encode(text, spec)`):
    * one "lhs rhs" pair per line, rank order. Unambiguous because symbols
    * are whitespace-split word pieces — they can contain neither the
    * space separator nor a newline. */
  def mergesToSpec(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  def parseMergeSpec(spec: String): Seq[(String, String)] =
    // CRLF-tolerant: a Windows-edited spec would otherwise leave "\r" on
    // every rhs — rank lookups silently never match and encoding degrades
    // to character tokens with no diagnostic
    spec.split("\r?\n").toSeq.filter(_.nonEmpty).map { line =>
      val i = line.indexOf(' ')
      require(i > 0 && i < line.length - 1, s"bad merge line: '$line'")
      (line.substring(0, i), line.substring(i + 1))
    }
}
