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
  * amortize the shuffle — `train(maxMergesPerRound = n)` does exactly
  * that, with a per-round validation probe that guarantees the merge
  * table equals strictly-sequential greedy order (falls back to a single
  * merge when the guarantee can't be proven); the spec pins both modes
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
    * pair reaches `minPairCount`.
    *
    * `maxMergesPerRound > 1` enables BATCHED training — the industrial
    * speedup for 30k-merge vocabularies: each round applies up to that many
    * top pairs in one vocabulary pass, amortizing the per-merge shuffle.
    * The merge TABLE is guaranteed identical to sequential order (BpeSpec
    * pins it): a round's batch is the maximal descending-frequency PREFIX
    * of candidates that is pairwise symbol-disjoint, and it is accepted
    * only if a validation probe over the full pair table shows
    *  (a) every non-batch pair touching a batch symbol or a concatenated
    *      symbol has freq strictly below the last batch member's — new
    *      pairs created by a merge are frequency-bounded by old touching
    *      pairs, so none can outrank a later batch member; and
    *  (b) no existing pair involves a concatenated symbol (a pre-existing
    *      `lhs+rhs` symbol elsewhere in the vocabulary could GAIN
    *      occurrences from the merge and overtake).
    * On any violation the round falls back to the plain sequential single
    * merge, so batching is a pure throughput knob, never a semantics one. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2, reliableCheckpoint: Boolean = false,
            maxMergesPerRound: Int = 1,
            roundCounter: java.util.concurrent.atomic.AtomicInteger = null): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxMergesPerRound >= 1,
      s"maxMergesPerRound must be >= 1, got $maxMergesPerRound")
    val spark = docs.sparkSession
    def cut(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    var vocab = cut(vocabulary(docs, textCol))
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      if (roundCounter != null) roundCounter.incrementAndGet()
      val want = math.min(maxMergesPerRound, numMerges - rank)
      // collect enough candidates to fill a batch after disjointness skips;
      // the k-th row's freq is the cutoff below which UNCOLLECTED pairs may
      // hide (a batch member must stay strictly above it)
      val k = if (want <= 1) 1 else math.min(want * 4 + 8, 256)
      val pc = pairCounts(vocab)
      val top = pc.orderBy(F.col("freq").desc, F.col("lhs"), F.col("rhs"))
        .limit(k).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) exhausted = true
      else {
        val fCut = if (top.length == k) top.last.getLong(2) else -1L
        // greedy disjoint prefix (stop at the first conflict — skipping
        // would break the prefix ordering the equivalence proof needs)
        val batch = Vector.newBuilder[(String, String, Long)]
        val acc = scala.collection.mutable.HashSet.empty[String]
        var size = 0
        var i = 0
        var stop = false
        while (i < top.length && size < want && !stop) {
          val (l, r, f) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          val ok = f >= minPairCount &&
            (size == 0 || (f > fCut && !acc(l) && !acc(r) && !acc(l + r)))
          if (ok) { batch += ((l, r, f)); acc += l; acc += r; acc += (l + r); size += 1 }
          else stop = true
          i += 1
        }
        var chosen = batch.result()
        if (chosen.length > 1) {
          val concats = chosen.map { case (l, r, _) => l + r }
          val batchKeys = chosen.map { case (l, r, _) => s"$l $r" }
          val fm = chosen.last._3
          val touching = F.col("lhs").isin(acc.toSeq: _*) ||
            F.col("rhs").isin(acc.toSeq: _*)
          val inC = F.col("lhs").isin(concats: _*) || F.col("rhs").isin(concats: _*)
          val notBatch = !F.concat_ws(" ", F.col("lhs"), F.col("rhs"))
            .isin(batchKeys: _*)
          val pr = pc.where(touching && notBatch)
            .agg(F.coalesce(F.max("freq"), F.lit(-1L)).as("mx"),
              F.coalesce(F.sum(F.when(inC, 1L).otherwise(0L)), F.lit(0L)).as("nc"))
            .head()
          if (!(pr.getLong(0) < fm && pr.getLong(1) == 0L)) chosen = chosen.take(1)
        }
        chosen.foreach { case (l, r, f) => merges += ((rank, l, r, f)); rank += 1 }
        val prev = vocab
        // nested mergePair expressions apply the batch IN ORDER within one
        // vocabulary pass — per-word application, so identical to one full
        // pass per merge
        vocab = cut(vocab.withColumn("syms",
          chosen.foldLeft(F.col("syms")) { case (c, (l, r, _)) =>
            BpeExpressions.mergePair(c, l, r)
          }))
        // the new cut is materialized (eager), so the previous iteration's
        // cached blocks are dead — release them, or a long training run
        // pins O(numMerges × vocab) in the block manager
        prev.unpersist(blocking = false)
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
