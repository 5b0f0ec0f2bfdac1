package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftFunctions, HammingZeroRewrite}

/** The engine's SQL face: custom expressions registered as SQL functions
  * and the Hamming-zero → equality optimizer rewrite. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s.experimental.extraOptimizations ++= Seq(HammingZeroRewrite)
    s
  }

  import spark.implicits._

  test("registered SQL functions evaluate like their Column counterparts") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
                dot_prod(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
                hamming64(5L, 6L) AS ham,
                size(shingles(array('a','b','c','d'), 3)) AS nsh,
                size(shingle_minhash(array('a','b','c','d'), 3, 4)) AS nmh""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) == 2L)   // 101 xor 110 = 011
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 4)

    val decomposed = "e\u0301" // 'e' + combining acute
    val norm = Seq(decomposed).toDF("s")
      .selectExpr("nfc_normalize(s) AS n", "md5_bucket(s, 1000) AS b").head()
    assert(norm.getString(0) == "\u00e9") // composes to single-codepoint e-acute
    assert(norm.getLong(1) >= 0 && norm.getLong(1) < 1000)

    val sh = Seq((1L, Seq("x", "y"))).toDF("id", "toks")
    sh.createOrReplaceTempView("sqlsurface_toks")
    val viaSql = spark.sql("SELECT simhash_md5(toks) FROM sqlsurface_toks").head().getLong(0)
    val viaCol = sh.select(graft.plans.Expressions.simhashMd5($"toks")).head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("Column-tier SQL faces: tokens, minhash, tumbling/hopping windows") {
    import org.apache.spark.sql.{functions => F}
    val docs = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    docs.createOrReplaceTempView("sqlsurface_docs")

    val tok = spark.sql("SELECT tokens(text) AS t FROM sqlsurface_docs")
      .head().getSeq[String](0)
    assert(tok == Seq("the", "cat", "sat", "on", "the", "mat"))

    // minhash SQL face == the Column formulation, seed-sensitive
    val viaSql = spark.sql(
      "SELECT minhash(shingles(tokens(text), 2), 7) AS mh FROM sqlsurface_docs")
      .head().getString(0)
    val viaCol = docs.select(
      graft.functions.Dedup.minhash(graft.functions.Dedup.shingles($"text", 2), 7))
      .head().getString(0)
    assert(viaSql == viaCol)
    val otherSeed = spark.sql(
      "SELECT minhash(shingles(tokens(text), 2), 8) AS mh FROM sqlsurface_docs")
      .head().getString(0)
    assert(viaSql != otherSeed)

    // winnow_md5 SQL face == the Column face
    val winSql = spark.sql(
      "SELECT winnow_md5(tokens(text), 4, 4) AS fps FROM sqlsurface_docs")
      .head().getSeq[String](0)
    val winCol = docs.select(
      graft.functions.Dedup.winnowFingerprints($"text", 4, 4)).head().getSeq[String](0)
    assert(winSql == winCol && winSql.nonEmpty)

    val w = spark.sql(
      """SELECT tumbling_window(3605L, 3600) AS tw,
                hopping_windows(3605L, 3600, 1800) AS hw""").head()
    assert(w.getLong(0) == 3600L)
    assert(w.getSeq[Long](1) == Seq(1800L, 3600L)) // both covering hops

    // hopping_windows SQL face agrees with Temporal.hoppingWindows
    val ev = Seq((1L, 3605L), (2L, 7205L)).toDF("id", "ts")
    ev.createOrReplaceTempView("sqlsurface_ev")
    val viaFn = graft.functions.Temporal.hoppingWindows(ev, "ts", 3600L, 1800L)
      .select("id", "win_start").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSql2 = spark.sql(
      """SELECT id, explode(hopping_windows(ts, 3600, 1800)) AS win_start
         FROM sqlsurface_ev""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaFn == viaSql2)
  }

  test("every GraftFunctions entry is reachable from pure SQL (exhaustive parity sweep)") {
    import org.apache.spark.sql.{Column, functions => F}
    import graft.plans.Expressions
    val df = Seq((5L,
        "the cat sat on the mat",
        Seq("a", "b", "a", "b", "c"),
        Seq(1.0, 2.0), Seq(3.0, 4.0),
        Array(0.5f, -0.25f, 0.125f)))
      .toDF("id", "text", "toks", "va", "vb", "emb")
    df.createOrReplaceTempView("sqlsurface_every")
    // each check: the SQL spelling and the Column spelling of the SAME
    // invocation must produce equal values on the same row
    def parity(sqlExpr: String, colExpr: Column): Unit = {
      val viaSql = spark.sql(s"SELECT $sqlExpr AS r FROM sqlsurface_every").head().get(0)
      val viaCol = df.select(colExpr.as("r")).head().get(0)
      assert(viaSql == viaCol, s"SQL face diverged for `$sqlExpr`: $viaSql != $viaCol")
    }
    val checks: Map[String, () => Unit] = Map(
      "cosine_sim" -> (() => parity("cosine_sim(va, vb)", Expressions.cosineSim($"va", $"vb"))),
      "dot_prod" -> (() => parity("dot_prod(va, vb)", Expressions.dotProd($"va", $"vb"))),
      "simhash64" -> (() => parity("simhash64(toks)", Expressions.simhash64($"toks"))),
      "simhash_md5" -> (() => parity("simhash_md5(toks)", Expressions.simhashMd5($"toks"))),
      "shingles" -> (() => parity("shingles(toks, 2)", Expressions.shingleArray($"toks", 2))),
      "shingle_minhash" -> (() => parity("shingle_minhash(toks, 2, 4)",
        Expressions.shingleMinhash($"toks", 2, 4))),
      "winnow_md5" -> (() => parity("winnow_md5(toks, 2, 3)",
        Expressions.winnowMd5($"toks", 2, 3))),
      "hamming64" -> (() => parity("hamming64(id, 6)",
        F.bit_count($"id".bitwiseXOR(F.lit(6L))).cast("long"))),
      "nfc_normalize" -> (() => parity("nfc_normalize(text)", Expressions.nfcNormalize($"text"))),
      "md5_bucket" -> (() => parity("md5_bucket(text, 1000)", Expressions.md5Bucket($"text", 1000L))),
      "zorder2" -> (() => parity("zorder2(id, 9)", Expressions.zorder($"id", F.lit(9L)))),
      "squeeze_runs" -> (() => parity("squeeze_runs(toks)",
        Expressions.squeezeRuns($"toks"))),
      "byte_histogram" -> (() => parity("byte_histogram(encode(text, 'utf-8'), 4)",
        Expressions.byteHistogram(F.encode($"text", "UTF-8"), 4))),
      "repetition_signals" -> (() => parity("repetition_signals(toks, 2)",
        Expressions.repetitionSignals($"toks", 2, graft.functions.Text.DefaultStopwords))),
      "rhp_bucket" -> (() => parity("rhp_bucket(emb, 3, 4)",
        Expressions.rhpBucket($"emb", 3, 4, 42L))),
      "first_n" -> (() => parity("first_n(struct(id), 2)",
        Expressions.boundedFirstN(F.struct($"id"), 2))),
      "bpe_encode" -> (() => parity("bpe_encode(text, 'a t')",
        graft.plans.BpeExpressions.encode($"text", Seq(("a", "t")), graft.functions.Bpe.EndOfWord))),
      "tokens" -> (() => parity("tokens(text)", graft.functions.Text.tokens($"text"))),
      "minhash" -> (() => parity("minhash(toks, 7)", graft.functions.Dedup.minhash($"toks", 7))),
      "tumbling_window" -> (() => parity("tumbling_window(id, 2)",
        $"id" - F.pmod($"id", F.lit(2L)))),
      "hopping_windows" -> (() => parity("hopping_windows(3605, 3600, 1800)",
        F.sequence(F.lit(1800L), F.lit(3600L), F.lit(1800L))))
    )
    // exhaustive BY CONSTRUCTION: registering a new SQL function without a
    // parity row here fails this assert, not silently
    val registered = graft.plans.GraftFunctions.functions.map(_._1).toSet
    assert(checks.keySet == registered,
      s"SQL-face spec out of sync: missing=${registered -- checks.keySet} stale=${checks.keySet -- registered}")
    checks.values.foreach(_())
  }

  test("native TopKPerKey operator: matches window form, partial-reduces before the shuffle") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(5000).select(
      F.col("id"),
      F.pmod(F.col("id"), F.lit(7L)).as("k"),
      F.pmod(F.xxhash64(F.col("id")), F.lit(100000L)).as("v"))
    val native = graft.plans.TopK.topKPerKey(df, Seq("k"), "v",
      desc = true, tieBreak = Seq("id"), k = 5)
    val window = df.withColumn("rn", F.row_number().over(
        Window.partitionBy("k").orderBy(F.col("v").desc, F.col("id"))))
      .where(F.col("rn") <= 5).drop("rn")
    assert(native.count() == 35)
    assert(native.collect().map(_.toSeq).toSet == window.collect().map(_.toSeq).toSet)

    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPartial"), physical)
    assert(physical.contains("TopKFinal"), physical)
    // partial stage must sit BELOW the exchange: survivors-only shuffle
    val lines = physical.linesIterator.toSeq
    val iPartial = lines.indexWhere(_.contains("TopKPartial"))
    val iFinal = lines.indexWhere(_.contains("TopKFinal"))
    val iExchange = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(iFinal < iExchange && iExchange < iPartial, physical) // tree prints top-down

    // empty keys = GLOBAL top-K: all partial survivors must converge on one
    // task (AllTuples distribution), across many input partitions
    val global = graft.plans.TopK.topKPerKey(df.repartition(7), Nil, "v",
      desc = true, tieBreak = Seq("id"), k = 3)
    val expect = df.orderBy(F.col("v").desc, F.col("id")).limit(3)
    assert(global.collect().map(_.toSeq).toSet == expect.collect().map(_.toSeq).toSet)
  }

  test("distinct-heap TopKPerKey: order-equal rows collapse in the PARTIAL stage") {
    import org.apache.spark.sql.{functions => F}
    // heavy duplication: 60 distinct values, each repeated ~100x across
    // partitions — the regime where a .distinct() pre-pass would shuffle
    // 100x the survivor volume
    val df = spark.range(6000).repartition(8).select(
      F.pmod(F.col("id"), F.lit(3L)).as("k"),
      F.concat(F.lit("v"), F.lpad(F.pmod(F.xxhash64(F.pmod(F.col("id"), F.lit(60L))),
        F.lit(1000L)).cast("string"), 4, "0")).as("v"))
    val native = graft.plans.TopK.topKPerKey(df, Seq("k"), "v",
      desc = false, tieBreak = Nil, k = 5, distinct = true)
    // reference: explicit distinct then plain TopK
    val ref = graft.plans.TopK.topKPerKey(df.distinct(), Seq("k"), "v",
      desc = false, tieBreak = Nil, k = 5)
    assert(native.collect().map(_.toSeq).toSet == ref.collect().map(_.toSeq).toSet)
    assert(native.count() == 15) // 5 DISTINCT minima per key, dupes don't eat slots
    // the distinct form needs no pre-aggregation: exactly one exchange,
    // no HashAggregate anywhere in the plan
    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPartial") && physical.contains("TopKFinal"), physical)
    // no HashAggregate anywhere = no distinct pre-pass; the only exchange
    // is TopKFinal's required clustering (AQE prints it twice — initial
    // and final plan sections — so no line-count assertion)
    assert(!physical.contains("HashAggregate"), s"distinct pre-pass leaked in:\n$physical")
    // global form dedupes too
    val global = graft.plans.TopK.topKPerKey(df, Nil, "v",
      desc = false, tieBreak = Nil, k = 4, distinct = true)
    val gRef = df.select("v").distinct().orderBy("v").limit(4)
    assert(global.select("v").collect().map(_.getString(0)).sorted.toSeq ==
      gRef.collect().map(_.getString(0)).toSeq)
  }

  test("HammingZeroRewrite turns hamming64(a,b)=0 joins into equi-joins") {
    val l = spark.range(100).select($"id".as("sig_a"))
    val r = spark.range(100).select($"id".as("sig_b"))
    l.createOrReplaceTempView("sqlsurface_l")
    r.createOrReplaceTempView("sqlsurface_r")
    val joined = spark.sql(
      "SELECT sig_a FROM sqlsurface_l JOIN sqlsurface_r ON hamming64(sig_a, sig_b) = 0")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    assert(physical.contains("HashJoin") || physical.contains("SortMergeJoin"), physical)
    assert(joined.count() == 100)

    // the <= 0 spelling rewrites too
    val le = spark.sql(
      "SELECT sig_a FROM sqlsurface_l JOIN sqlsurface_r ON hamming64(sig_a, sig_b) <= 0")
    assert(!le.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(le.count() == 100)

    // nonzero thresholds are NOT equality — must stay un-rewritten
    val near = spark.sql(
      "SELECT sig_a FROM sqlsurface_l JOIN sqlsurface_r ON hamming64(sig_a, sig_b) <= 1")
    assert(near.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }
}
