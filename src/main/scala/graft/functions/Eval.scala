package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Model- and label-quality EVALUATION operators — the audit step a
  * curation pipeline runs before unleashing a classifier, a ranking, or a
  * labeling scheme on 100 TB of corpus. Each metric is computed with the
  * integer discipline used throughout (exact BIGINT accumulators, one
  * trailing `DIV`), so results are order-independent under any shuffle and
  * reproducible cell-exact across engines.
  *
  * Scale shapes: AUC is computed from a SCORE HISTOGRAM (|distinct scores|
  * rows shuffle — bounded by the score domain, never the corpus), not a
  * global row-level rank; ranking metrics use per-group windows (each
  * query/source sorts independently); agreement is a single global
  * aggregate. No corpus-sized sort anywhere.
  *
  * Cf. the reference's per-tuple scoring tier these evaluations audit:
  * `storm-core/src/jvm/storm/trident/Stream.java:207-224` (`each`) and the
  * aggregate tier `Stream.java:383-425` run the producers; the reference
  * has no evaluation surface — prescribed beyond-reference (SURVEY §2.13).
  */
object Eval {

  /** Binary-classification evaluation: ROC AUC (Mann-Whitney with exact
    * midrank tie handling) plus the confusion matrix and derived rates at
    * `threshold`, from integer scores in `scoreCol` and boolean labels in
    * `labelCol`. One corpus pass builds a per-score histogram
    * (pos_n/neg_n per distinct score); AUC is a cumulative-negatives fold
    * over the SORTED HISTOGRAM ARRAY — |distinct scores| elements, NOT the
    * corpus — so the plan has no global row sort, no window, and survives
    * any corpus size whose score domain is bounded (integer milli-scores
    * are). All outputs are exact BIGINTs; rate divisions are guarded
    * `when(den =!= 0)` so degenerate inputs (all-positive, all-negative,
    * nothing kept) yield NULL rather than an ANSI divide-by-zero.
    *
    * AUC identity used (ties get half credit, exact in integers):
    *   auc_x2_num = Σ_s pos_s · (2·cumneg_<s + neg_s)
    *   auc_ppm    = auc_x2_num · 1e6 DIV (2·npos·nneg)
    */
  def binaryEval(scored: DataFrame, scoreCol: String, labelCol: String,
      threshold: Long): DataFrame =
    evalImpl(scored, Nil, scoreCol, labelCol, threshold)

  /** Per-group face of [[binaryEval]] — the audit as it actually runs at
    * scale: one AUC/confusion row per data slice (source domain, language,
    * snapshot …), because a gate that scores 0.8 AUC globally can still be
    * chance on the one domain that matters. Identical metrics and
    * arithmetic; the histogram is keyed (group, score) and each group's
    * fold runs over ITS score histogram only, so the heaviest per-group
    * state is score-domain-sized regardless of slice skew. */
  def binaryEvalByGroup(scored: DataFrame, groupCol: String,
      scoreCol: String, labelCol: String, threshold: Long): DataFrame =
    evalImpl(scored, Seq(groupCol), scoreCol, labelCol, threshold)

  private def evalImpl(scored: DataFrame, groupCols: Seq[String],
      scoreCol: String, labelCol: String, threshold: Long): DataFrame = {
    val pos = F.when(F.col(labelCol), 1L).otherwise(0L)
    val histKeys = groupCols.map(F.col) :+ F.col(scoreCol).cast("long").as("s")
    val hist = scored
      // a NULL score can be threshold-compared by neither engine and a
      // NULL label belongs to neither class: excluded by rule, so
      // n == tp+fp+fn+tn always holds (counting them in n but no
      // confusion cell would silently skew recall and the AUC histogram)
      .where(F.col(scoreCol).isNotNull && F.col(labelCol).isNotNull)
      .groupBy(histKeys: _*)
      .agg(F.sum(pos).as("pos_n"), F.sum(F.lit(1L) - pos).as("neg_n"))
    val kept = F.col("s") >= threshold
    // the cumulative-negatives sweep runs over the HISTOGRAM (score-domain
    // rows), not the corpus: collect it sorted into one array and fold —
    // an order-fixed codegen fold, no single-partition window, and the
    // whole metric set is ONE aggregation over the histogram
    val aucFold = F.aggregate(
      F.array_sort(F.collect_list(F.struct(
        F.col("s"), F.col("pos_n"), F.col("neg_n")))),
      F.struct(F.lit(0L).as("cumneg"), F.lit(0L).as("auc2")),
      (acc, x) => F.struct(
        (acc.getField("cumneg") + x.getField("neg_n")).as("cumneg"),
        (acc.getField("auc2") + x.getField("pos_n") *
          (F.lit(2L) * acc.getField("cumneg") + x.getField("neg_n")))
          .as("auc2")),
      acc => acc.getField("auc2"))
    val metricAggs = Seq(
      F.sum(F.col("pos_n") + F.col("neg_n")).as("n"),
      F.sum("pos_n").as("npos"),
      F.sum("neg_n").as("nneg"),
      aucFold.as("auc_x2_num"),
      F.sum(F.when(kept, F.col("pos_n")).otherwise(0L)).as("tp"),
      F.sum(F.when(kept, F.col("neg_n")).otherwise(0L)).as("fp"),
      F.sum(F.when(!kept, F.col("pos_n")).otherwise(0L)).as("fn"),
      F.sum(F.when(!kept, F.col("neg_n")).otherwise(0L)).as("tn"))
    val agg =
      if (groupCols.isEmpty) hist.agg(metricAggs.head, metricAggs.tail: _*)
      else hist.groupBy(groupCols.map(F.col): _*)
        .agg(metricAggs.head, metricAggs.tail: _*)
    // auc_x2_num ≤ 2·npos·nneg keeps the FOLD inside a long up to ~4e9
    // rows per group, but the trailing ·1e6 would overflow at ~4.3M
    // balanced rows (ANSI mode throws, it doesn't wrap) — widen that one
    // step through DECIMAL(38,0); `DIV` on positives floors identically
    // to the all-long path, so in-range results are bit-identical
    agg
      .withColumn("auc_ppm", F.when(F.col("npos") * F.col("nneg") =!= 0L,
        F.expr("CAST(CAST(auc_x2_num AS DECIMAL(38,0)) * 1000000 DIV (2 * npos * nneg) AS BIGINT)")))
      .withColumn("precision_ppm", F.when(F.col("tp") + F.col("fp") =!= 0L,
        F.expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV (tp + fp) AS BIGINT)")))
      .withColumn("recall_ppm", F.when(F.col("npos") =!= 0L,
        F.expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV npos AS BIGINT)")))
      .withColumn("f1_ppm", F.when(
        F.col("precision_ppm") + F.col("recall_ppm") > 0L,
        F.expr("2 * precision_ppm * recall_ppm DIV (precision_ppm + recall_ppm)")))
  }

  /** Reciprocal-rank fusion of two rankings of the same id space, per
    * partition group (query / source): each side is ranked independently
    * (dense per-group `row_number`), then fused with the standard RRF
    * weight 1/(rrfK + rank), held exact as `1e9 DIV (rrfK + rank)`. Ids
    * present in only one ranking contribute 0 from the missing side
    * (full-outer join). Returns the top `k` per group by fused score
    * (ties broken by id ascending). PRECONDITION: each input holds at
    * most one row per (group, id) — a duplicated id would be ranked
    * twice and the join would fan out, double-weighting it in the fused
    * top-k; dedupe upstream (a fan-out is an upstream bug this operator
    * must not silently absorb).
    *
    * Scale shape: both window sorts and the final top-k are PARTITIONED by
    * the group column — no global sort; the join is keyed (group, id). At
    * 100 TB the group is a query id and each group is retrieval-sized
    * (hundreds of rows), so every stage is bounded per key. */
  def rrfFuse(a: DataFrame, b: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int, rrfK: Long = 60L): DataFrame = {
    require(k > 0 && rrfK > 0, s"k and rrfK must be positive, got $k/$rrfK")
    def ranked(df: DataFrame, rankName: String): DataFrame = {
      val byGroup = Window.partitionBy(groupCol)
        .orderBy(F.col(scoreCol).desc, F.col(idCol).asc)
      df.select(F.col(groupCol), F.col(idCol),
        F.row_number().over(byGroup).cast("long").as(rankName))
    }
    val ra = ranked(a, "rank_a")
    val rb = ranked(b, "rank_b")
    val fusedCol =
      F.coalesce(F.expr(s"1000000000L DIV (${rrfK}L + rank_a)"), F.lit(0L)) +
      F.coalesce(F.expr(s"1000000000L DIV (${rrfK}L + rank_b)"), F.lit(0L))
    val fused = ra.join(rb, Seq(groupCol, idCol), "full_outer")
      .withColumn("fused", fusedCol)
    val byFused = Window.partitionBy(groupCol)
      .orderBy(F.col("fused").desc, F.col(idCol).asc)
    fused.withColumn("fused_rank", F.row_number().over(byFused).cast("long"))
      .where(F.col("fused_rank") <= k)
  }

  /** Cohen's kappa agreement between two boolean annotator columns — the
    * label-quality audit run before trusting EITHER labeling scheme at
    * scale. Single global aggregate (exact counts), and the chance-
    * corrected kappa is emitted as an exact integer FRACTION
    * (`kappa_num`/`kappa_den`, kappa = num/den) rather than a divided
    * value: kappa is legitimately negative below chance agreement, and
    * floor-vs-truncate division on negatives differs across engines — the
    * fraction sidesteps that while staying cell-exact. `po_ppm`/`pe_ppm`
    * (observed / expected agreement) are non-negative and safe to divide.
    *
    *   kappa_num = n·agree − (a1·b1 + a0·b0)
    *   kappa_den = n·n     − (a1·b1 + a0·b0)
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = F.when(F.col(aCol), 1L).otherwise(0L)
    val b = F.when(F.col(bCol), 1L).otherwise(0L)
    // a NULL verdict is not a negative vote: counting it negative in the
    // marginals but non-agreeing in `agree` would bias kappa down —
    // unlabeled rows are excluded by rule instead
    df.where(F.col(aCol).isNotNull && F.col(bCol).isNotNull)
      .agg(
        F.count(F.lit(1)).as("n"),
        F.sum(a).as("a_pos"),
        F.sum(b).as("b_pos"),
        F.sum(F.when(F.col(aCol) === F.col(bCol), 1L).otherwise(0L))
          .as("agree"))
      // the O(n²) quantities (pe_num, kappa fraction) fit a long exactly
      // up to n ≈ 3e9 annotated rows — the operator's documented bound;
      // the ×1e6 ppm steps would throw a decade earlier (~3e6) under
      // ANSI, so THOSE go through DECIMAL(38,0) (in-range results are
      // bit-identical: DIV floors the same on positives)
      .withColumn("pe_num",
        F.expr("a_pos * b_pos + (n - a_pos) * (n - b_pos)"))
      .select(
        F.col("n"), F.col("a_pos"), F.col("b_pos"), F.col("agree"),
        F.when(F.col("n") =!= 0L,
          F.expr("CAST(CAST(agree AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"))
          .as("po_ppm"),
        F.when(F.col("n") =!= 0L, F.expr(
          "CAST(CAST(pe_num AS DECIMAL(38,0)) * 1000000 DIV (n * n) AS BIGINT)"))
          .as("pe_ppm"),
        F.expr("n * agree - pe_num").as("kappa_num"),
        F.expr("n * n - pe_num").as("kappa_den"))
  }

  /** Calibration (reliability) bins: integer scores grouped into
    * fixed-width bins with positive counts and the observed positive rate
    * per bin — the reliability-diagram table, read before trusting a
    * score as a probability (or a threshold as a rate contract). One
    * map-side-combined aggregation; bin count is score-domain DIV width,
    * never corpus-sized. Bins FLOOR (uniform width for signed scores);
    * `avg_score` is the exact integer mean truncated toward zero (= floor
    * on non-negative scores), reproducible across engines; rows with a
    * NULL score or label are excluded by rule. */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pos = F.when(F.col(labelCol), 1L).otherwise(0L)
    val s = F.col(scoreCol).cast("long")
    // FLOOR bins, not truncated: plain `DIV` would give bin 0 double
    // width on signed scores (logits) and make bin_lo a non-bound for
    // negatives — `(s - pmod(s, w)) DIV w` floors exactly in integers
    // (the pmod-adjusted numerator is an exact multiple, so truncating
    // DIV is floor; never divide-then-cast, longs exceed double's 2^53)
    // and both engines agree (DuckDB: (s - ((s % w) + w) % w) // w)
    scored
      .where(s.isNotNull && F.col(labelCol).isNotNull)
      .withColumn("__s", s)
      .withColumn("bin",
        F.expr(s"(__s - pmod(__s, ${binWidth}L)) DIV ${binWidth}L"))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("n"), F.sum(pos).as("npos"),
        F.sum(F.col("__s")).as("__sum"))
      .select(F.col("bin"), (F.col("bin") * binWidth).as("bin_lo"),
        F.col("n"), F.col("npos"),
        F.expr("CAST(CAST(npos AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)")
          .as("pos_rate_ppm"),
        F.expr("__sum DIV n").as("avg_score"))
  }

  /** STREAMING face of the confusion tier: running (tp, fp, fn, tn) per
    * monitoring key (model id, data slice, …) maintained in the state
    * store as scored-and-labeled rows arrive — online classifier
    * monitoring, e.g. watching a quality gate drift against delayed
    * ground-truth labels during a long curation run. Exactly-once under
    * restart by the same checkpoint-version argument as every
    * [[graft.streaming.StateStoreRunner]] fold; state per key is four
    * longs. Rates (precision/recall) are one arithmetic step downstream
    * of the emitted counts — emitting counts keeps the state mergeable
    * and the face parity-testable against [[binaryEval]] on the same
    * rows (StateStoreSpec pins that). AUC is deliberately NOT maintained
    * here: it needs the score histogram, which is [[binaryEval]]'s batch
    * job over the accumulated data, not a per-row fold. */
  def streamingConfusion[K](scored: org.apache.spark.sql.Dataset[(K, Long, Boolean)],
      threshold: Long)(implicit kEnc: org.apache.spark.sql.Encoder[K],
      outEnc: org.apache.spark.sql.Encoder[(K, (Long, Long, Long, Long))])
      : org.apache.spark.sql.Dataset[(K, (Long, Long, Long, Long))] =
    graft.streaming.StateStoreRunner.runningCombine[K, (K, Long, Boolean),
        (Long, Long, Long, Long)](
      scored, _._1, (0L, 0L, 0L, 0L),
      v => {
        val kept = v._2 >= threshold
        (if (kept && v._3) 1L else 0L, if (kept && !v._3) 1L else 0L,
         if (!kept && v._3) 1L else 0L, if (!kept && !v._3) 1L else 0L)
      },
      (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))

  /** Retrieval metrics per query group from a scored candidate list with
    * boolean relevance: rank of the first relevant hit, reciprocal rank
    * scaled to 1e9 (`rr_e9 = 1e9 DIV first_rel_rank`, 0 when the group has
    * no relevant item), and precision@k numerator (`rel_at_k` = relevant
    * items in the top k). Windows are per-group — retrieval-sized, never
    * corpus-sized. Mean-reciprocal-rank over queries is `avg(rr_e9)` one
    * aggregate away; emitting per-group rows keeps the operator
    * composable (and the oracle face cell-exact on integers). */
  def retrievalMetrics(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val byGroup = Window.partitionBy(groupCol)
      .orderBy(F.col(scoreCol).desc, F.col(idCol).asc)
    val ranked = df.select(F.col(groupCol), F.col(idCol), F.col(relCol),
      F.row_number().over(byGroup).cast("long").as("rank"))
    ranked.groupBy(groupCol)
      .agg(
        F.min(F.when(F.col(relCol), F.col("rank"))).as("first_rel_rank"),
        F.sum(F.when(F.col(relCol) && F.col("rank") <= k, 1L).otherwise(0L))
          .as("rel_at_k"),
        F.count(F.lit(1)).as("n_candidates"))
      .withColumn("rr_e9", F.coalesce(
        F.expr("1000000000L DIV first_rel_rank"), F.lit(0L)))
  }
}
