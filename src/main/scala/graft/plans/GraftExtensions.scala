package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL-surface registration + optimizer rules for the engine.
  *
  * The reference exposes its operations only through the Java topology
  * builder; a Spark-native engine should ALSO surface them to `spark.sql`
  * so the same functions compose in plain SQL. Wire up either way:
  *
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - or imperative: `GraftFunctions.register(spark)` on a live session.
  */
object GraftFunctions {

  private def lit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    // exact — a silent toInt would truncate e.g. md5_bucket(k, 5000000000)
    // into a wrong-but-plausible bucket count
    case Literal(v: Long, LongType) => java.lang.Math.toIntExact(v)
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litL(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litStr(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** Hamming distance over 64-bit signatures as a Catalyst tree
    * (`cast(bit_count(a ^ b) as bigint)`) — the shape
    * [[HammingZeroRewrite]] recognizes. */
  def hammingExpr(a: Expression, b: Expression): Expression =
    Cast(BitwiseCount(BitwiseXor(a, b)), LongType)

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => Expressions.CosineSim(es(0), es(1))),
    "dot_prod" -> (es => Expressions.DotProd(es(0), es(1))),
    "simhash64" -> (es => Expressions.SimHash64(es(0))),
    "simhash_md5" -> (es => Expressions.SimHashMd5(es(0))),
    "shingles" -> (es => Expressions.ShingleArray(es(0), lit(es(1), "k"))),
    "shingle_minhash" -> (es => Expressions.ShingleMinHashMd5(
      es(0), lit(es(1), "k"), lit(es(2), "numHashes"))),
    "winnow_md5" -> (es => Expressions.WinnowMd5(
      es(0), lit(es(1), "k"), lit(es(2), "w"))),
    "hamming64" -> (es => hammingExpr(es(0), es(1))),
    "nfc_normalize" -> (es => Expressions.NfcNormalize(es(0))),
    "md5_bucket" -> (es => Expressions.Md5Bucket(es(0), lit(es(1), "buckets").toLong)),
    "squeeze_runs" -> (es => Expressions.SqueezeRuns(es(0))),
    "byte_histogram" -> (es => Expressions.ByteHistogram(
      es(0), lit(es(1), "bins"))),
    "zorder2" -> (es => Expressions.ZOrder2(es(0), es(1))),
    "repetition_signals" -> (es => Expressions.RepetitionSignals(
      es(0), lit(es(1), "k"), graft.functions.Text.DefaultStopwords)),
    "rhp_bucket" -> (es => Expressions.RhpBucket(
      es(0), lit(es(1), "dim"), lit(es(2), "nBits"),
      if (es.length > 3) litL(es(3), "seed") else 42L)),
    // bounded top-k aggregate (k smallest structs, heap-capped partials);
    // the analyzer wraps the raw AggregateFunction in an AggregateExpression
    "first_n" -> (es => Expressions.BoundedFirstN(es(0), lit(es(1), "k"))),
    // merge spec = newline-separated "lhs rhs" lines in rank order
    // (graft.functions.Bpe.mergesToSpec) — a string literal so the rank
    // map builds once at plan time, not per row
    "bpe_encode" -> (es => BpeExpressions.BpeEncode(
      es(0), graft.functions.Bpe.parseMergeSpec(litStr(es(1), "merges")),
      graft.functions.Bpe.EndOfWord)),
    // Column-tier helpers surfaced as raw Catalyst trees (the Spark 4
    // Column→Expression bridge yields an unevaluable ColumnNodeExpression
    // in registry context, so these builders construct the same trees the
    // Column formulations produce). Parity with Text.tokens /
    // Dedup.minhash / Temporal.hoppingWindows is pinned by SqlSurfaceSpec.
    "tokens" -> (es => ArrayRemove(
      StringSplit(es(0), Literal("\\Q \\E"), Literal(-1)), Literal(""))),
    "minhash" -> { es =>
      val seed = lit(es(1), "seed")
      val s = UnresolvedNamedLambdaVariable(Seq("s"))
      ArrayMin(ArrayTransform(es(0), LambdaFunction(
        Md5(Cast(Concat(Seq(Literal(s"$seed|"), s)), org.apache.spark.sql.types.BinaryType)),
        Seq(s))))
    },
    // temporal window keys over raw long ticks (the engine's ns-epoch
    // convention; Spark's own window()/session_window want TimestampType):
    // tumbling_window = the window start `ts` falls in; hopping_windows =
    // ALL starts covering `ts` (explode it, then groupBy — exactly
    // Temporal.hoppingWindows' per-row expansion); session_window-style
    // gap sessions need cross-row state and stay DataFrame-tier
    // (Temporal.sessionize / sessionizeStream)
    "tumbling_window" -> { es =>
      val t = Cast(es(0), LongType)
      Subtract(t, Pmod(t, Literal(litL(es(1), "sizeTicks"))))
    },
    "hopping_windows" -> { es =>
      val size = litL(es(1), "sizeTicks")
      val slide = litL(es(2), "slideTicks")
      require(size % slide == 0, "sizeTicks must be a multiple of slideTicks")
      val t = Cast(es(0), LongType)
      val anchor = Subtract(t, Pmod(t, Literal(slide)))
      Sequence(Add(Subtract(anchor, Literal(size)), Literal(slide)), anchor,
        Some(Literal(slide)), None)
    },
  )

  /** Idempotent imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Rewrites Hamming-distance-zero predicates into plain equality:
  * `bit_count(a ^ b) = 0` (and `<= 0`) ⇔ `a = b`.
  *
  * Why it matters at scale: a join whose only condition is
  * `hamming64(sig_a, sig_b) = 0` is not an equi-join to the planner, so it
  * falls to BroadcastNestedLoop/cartesian — O(N²) probes. Rewritten to
  * `sig_a = sig_b` it hash-partitions both sides and runs as a shuffled
  * hash / sort-merge join. The exact-match tier of SimHash dedup hits this
  * shape constantly.
  */
object HammingZeroRewrite extends Rule[LogicalPlan] {
  private object HammingDist {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Cast(BitwiseCount(BitwiseXor(a, b)), _, _, _) => Some((a, b))
      case BitwiseCount(BitwiseXor(a, b)) => Some((a, b))
      case _ => None
    }
  }
  private object ZeroLit {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0, IntegerType) => true
      case Literal(0L, LongType) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case EqualTo(HammingDist(a, b), ZeroLit()) => EqualTo(a, b)
    case EqualTo(ZeroLit(), HammingDist(a, b)) => EqualTo(a, b)
    case LessThanOrEqual(HammingDist(a, b), ZeroLit()) => EqualTo(a, b)
    case GreaterThanOrEqual(ZeroLit(), HammingDist(a, b)) => EqualTo(a, b)
  }
}

/** `spark.sql.extensions` entry point: SQL functions + optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.Expressions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => HammingZeroRewrite)
    ext.injectPlannerStrategy(_ => TopK.TopKStrategy)
  }
}
