package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.column

/** Custom Catalyst expressions for the hash-heavy pipeline operators.
  *
  * Spark's higher-order array functions (`transform`/`aggregate`) evaluate
  * their lambda interpreted, per element — for MinHash over ~100 shingles ×
  * k seeds that is thousands of interpreted expression evals per row and
  * dominates the corpus-scan cost at scale. Each expression below does the
  * same computation in one imperative pass per row (tight loop, reused
  * message digest, no per-element expression tree), which is the preferred
  * Catalyst extension tier for scalar work (custom Expression before custom
  * physical operator — SURVEY.md §7.3).
  *
  * Semantics are kept engine-portable: MinHash = lexicographic min of
  * lowercase md5 hex of `"<seed>|<shingle>"`, identical to the DuckDB
  * oracle's `min(md5('<seed>|' || shingle))`.
  */
object Expressions {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase-hex of a 16-byte md5 digest — shared by the fingerprint
    * expressions so the wire format cannot silently diverge between them. */
  private def hexifyMd5(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** UTF-8 bytes of the non-null tokens, in order; null elements are
    * skipped (absent tokens), matching the built-in HOF formulations
    * rather than NPE-ing the stage. Shared by the shingle expressions. */
  private def tokenBytes(arr: ArrayData): Array[Array[Byte]] = {
    val total = arr.numElements()
    val words = new Array[Array[Byte]](total)
    var w = 0
    var n = 0
    while (w < total) {
      val u = arr.getUTF8String(w)
      if (u != null) { words(n) = u.getBytes; n += 1 }
      w += 1
    }
    if (n == total) words else java.util.Arrays.copyOf(words, n)
  }

  /** Space-joined bytes of tokens [i, i+k) — the k-gram serialization every
    * md5 fingerprint expression hashes. One definition so the separator and
    * layout stay identical across them. */
  private def shingleBytes(words: Array[Array[Byte]], i: Int, k: Int): Array[Byte] = {
    var len = k - 1
    var j = 0
    while (j < k) { len += words(i + j).length; j += 1 }
    val shingle = new Array[Byte](len)
    var p = 0
    j = 0
    while (j < k) {
      if (j > 0) { shingle(p) = ' '; p += 1 }
      val wb = words(i + j)
      System.arraycopy(wb, 0, shingle, p, wb.length)
      p += wb.length
      j += 1
    }
    shingle
  }

  /** Analysis-time guard shared by the token-array expressions: a wrong
    * SQL argument type fails with a clean message instead of a runtime
    * ClassCastException inside generated code. */
  private def requireTokenArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<string> input, got ${other.catalogString}")
    }

  private def requireNumericArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<float> or array<double> input, got ${other.catalogString}")
    }


  private val tlMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 32 bits of md5(bytes) as an unsigned long — numerically equal to
    * `conv(substring(md5(x), 1, 8), 16, 10)` without materializing the hex
    * string or routing through decimal conv. Called from generated code. */
  def md5Head(bytes: Array[Byte]): Long = {
    val md = tlMd5.get(); md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** `md5_bucket(key, buckets)` → uniform bucket in [0, buckets) — the
    * sampling-predicate hot path (at 100 TB this runs per row inside the
    * scan stage, so the hex-string + decimal-conv detour of the Column
    * formulation matters). Codegen'd; engine-parity with the md5/substr/
    * conv spelling is exact, so the DuckDB oracles are unchanged. */
  case class Md5Bucket(child: Expression, buckets: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
    require(buckets > 0, "buckets must be positive")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_bucket"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        md5Head(input.asInstanceOf[UTF8String].getBytes) % buckets)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Expressions.md5Head($c.getBytes()) % ${buckets}L;")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 32→64-bit even-bit spread (standard Morton-code bit twiddling) —
    * called from generated code. */
  def spread32(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Morton (Z-order) interleave of the low 32 bits of each input. */
  def zorder2(x: Long, y: Long): Long = spread32(x) | (spread32(y) << 1)

  /** `zorder2(x, y)` → 64-bit Morton code: sort/range-partition by it and
    * rows close in BOTH dimensions land in the same files, so min/max file
    * stats prune 2-D predicates — the layout story for (time, key) or
    * (lat, lon) scans at 100 TB. Inputs are used mod 2^32; pre-scale to
    * that range. */
  case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "zorder2"
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.valueOf(zorder2(l.asInstanceOf[Long], r.asInstanceOf[Long]))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.Expressions.zorder2($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Unicode NFC normalization helper — called from generated code. */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** `nfc_normalize(text)` — canonical composition before fingerprinting /
    * dedup, so visually-identical strings ("é" composed vs decomposed)
    * hash identically. Standard Unicode algorithm on both engines (DuckDB
    * `nfc_normalize` is the oracle spelling). */
  case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"
    override def nullSafeEval(input: Any): Any = nfc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.Expressions.nfc($c);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `shingle_minhash(tokens, k, numHashes)` → array<string> of the k-gram
    * MinHash signature (null when fewer than k tokens, matching the
    * Column-tier guard). Builds shingle strings and all seed-hashes in one
    * pass. */
  case class ShingleMinHashMd5(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
    require(k > 0, s"shingle size k must be positive, got $k")
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    // null output for sub-k-token docs even when the input column is
    // declared non-null — without this the optimizer would fold away
    // IsNotNull guards and codegen would write null into a non-null slot
    override def nullable: Boolean = true
    override def prettyName: String = "shingle_minhash"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    // seed prefixes ("0|".."7|") are pure ASCII, so their UTF-8 bytes
    // prepend to the shingle's UTF-8 bytes exactly as a string concat
    // would; pure function of numHashes — built once, not per row
    private lazy val seedPrefixes = Array.tabulate(numHashes)(h =>
      s"$h|".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val md = tlMd5.get()
      // track minima as raw 16-byte digests: hex is a nibble-monotone
      // encoding (0-9 < a-f in ASCII order matches nibble 0-15 order), so
      // unsigned byte comparison == lexicographic hex comparison — the 32
      // chars per (shingle × seed) hexification moves out of the hot loop
      // and runs numHashes times total
      val mins = new Array[Array[Byte]](numHashes)
      val words = tokenBytes(arr)
      val n = words.length
      if (n < k) return null
      var i = 0
      while (i + k <= n) {
        val shingle = shingleBytes(words, i, k)
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(seedPrefixes(h))
          md.update(shingle)
          val digest = md.digest()
          if (mins(h) == null ||
            java.util.Arrays.compareUnsigned(digest, mins(h)) < 0) mins(h) = digest
          h += 1
        }
        i += 1
      }
      new GenericArrayData(mins.map(d => UTF8String.fromString(hexifyMd5(d)): Any))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `shingles(tokens, k)` → array<string> of k-gram shingle strings (empty
    * when fewer than k tokens). One pass, no per-element lambda. */
  case class ShingleArray(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
    require(k > 0, s"shingle size k must be positive, got $k")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingles"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val total = arr.numElements()
      val words = new Array[String](total)
      var w = 0
      var n = 0
      while (w < total) {
        val u = arr.getUTF8String(w)
        if (u != null) { words(n) = u.toString; n += 1 } // nulls = absent tokens
        w += 1
      }
      if (n < k) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i + k <= n) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `mask_join(tokens, positions)` → the tokens whose 0-based index is
    * NOT in `positions`, joined by a single space. One imperative pass
    * with a hash set of positions — the higher-order
    * `array_join(filter(ts, (x, i) -> !array_contains(cov, i)))` spelling
    * re-scans the coverage array PER TOKEN in the interpreted lambda
    * (O(len·|cov|) per row — the q146/q172 indexed-HOF trap, measured on
    * q125's final stage). Null position elements are ignored; a null in
    * `tokens` is skipped like the shingle expressions do. */
  case class MaskJoin(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "mask_join"
    override def checkInputDataTypes(): TypeCheckResult = {
      val tokOk = left.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
      val posOk = right.dataType match {
        case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
        case _ => false
      }
      if (tokOk && posOk) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<string>, array<int|bigint>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

    override def nullSafeEval(toks: Any, pos: Any): Any = {
      val arr = toks.asInstanceOf[ArrayData]
      val ps = pos.asInstanceOf[ArrayData]
      val masked = new java.util.HashSet[Long]()
      val isLong = right.dataType.asInstanceOf[ArrayType].elementType == LongType
      var i = 0
      while (i < ps.numElements()) {
        if (!ps.isNullAt(i))
          masked.add(if (isLong) ps.getLong(i) else ps.getInt(i).toLong)
        i += 1
      }
      val sb = new java.lang.StringBuilder
      var w = 0
      var first = true
      while (w < arr.numElements()) {
        val u = arr.getUTF8String(w)
        if (u != null && !masked.contains(w.toLong)) {
          if (!first) sb.append(' ')
          sb.append(u.toString)
          first = false
        }
        w += 1
      }
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** `squeeze_runs(tokens)` → the token array with runs of consecutive
    * identical tokens collapsed to one occurrence. One imperative pass —
    * the higher-order `filter((x, i) -> x != ts[i-1])` spelling
    * re-evaluates the OUTER array expression per element inside the
    * interpreted lambda (O(n²) per row, and the optimizer inlines the
    * tokenization into every use), which measured ~15× slower at sf0.1. */
  case class SqueezeRuns(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "squeeze_runs"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val total = arr.numElements()
      val out = new Array[Any](total)
      var prev: UTF8String = null
      var first = true
      var n = 0
      var i = 0
      while (i < total) {
        val u = arr.getUTF8String(i)
        // null tokens are kept with the same run semantics (null-run → one null)
        val isRepeat = !first && (if (u == null) prev == null
          else u == prev)
        if (!isRepeat) { out(n) = u; n += 1 }
        prev = u
        first = false
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], n))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `byte_histogram(payload, bins)` → `bins`-bucket histogram of byte
    * values (b mod bins), as array<long> — the integer content signature
    * [[graft.functions.Multimodal.signatureDupGroups]] keys on. One pass
    * over the payload bytes; the Column-tier formulation (regex char
    * extraction + per-bin lambdas) costs a regex table per row and
    * O(bins) lambda evals per char. */
  case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression with CodegenFallback {
    require(bins > 0 && bins <= 4096, s"bins out of range: $bins")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "byte_histogram"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs BINARY input, got ${child.dataType.sql}")

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val hist = new Array[Long](bins)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) % bins) += 1L
        i += 1
      }
      new GenericArrayData(hist)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `simhash64(tokens)` → 64-bit SimHash from xxhash64(seed=42) of each
    * token with per-bit majority vote — same output as the Column-tier
    * formulation, ~100× fewer expression evals. */
  case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) { // nulls = absent tokens
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        i += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 64) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `simhash_md5(tokens)` — the ORACLE-PORTABLE SimHash variant: per-token
    * hash = first 15 md5 hex chars as a 60-bit integer (DuckDB:
    * `('0x' || substr(md5(w),1,15))::BIGINT`), majority vote over bits
    * 0..59. Use [[SimHash64]] (xxhash) on the perf path. */
  case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_md5"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val md = tlMd5.get()
      val votes = new Array[Int](60)
      var i = 0
      while (i < n) {
        val tok = arr.getUTF8String(i)
        if (tok == null) { i += 1 } // nulls = absent tokens
        else {
        md.reset()
        val d = md.digest(tok.getBytes)
        // first 15 hex nibbles of the digest as a 60-bit value — identical
        // to parseLong(hex.substring(0, 15), 16) without the hex round-trip
        var h = 0L
        var ni = 0
        while (ni < 15) {
          val b = d(ni >> 1) & 0xff
          h = (h << 4) | (if ((ni & 1) == 0) b >>> 4 else b & 0xf)
          ni += 1
        }
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        i += 1
        }
      }
      var out = 0L
      var bit = 0
      while (bit < 60) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `cosine_sim(a, b)` over two float/double arrays, computed in double
    * left-to-right (identical result to the zip_with/aggregate formulation
    * and the DuckDB oracle). Null if either side is null or lengths differ.
    *
    * Implements `doGenCode` (not CodegenFallback): the generated loop stays
    * inside whole-stage codegen, so a similarity scan compiles into the
    * same Java method as its surrounding filter/project. */
  case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // null on length mismatch even for non-null inputs; also required for
    // nullSafeCodeGen to declare the isNull slot the generated code sets
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireNumericArray(left, prettyName)
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else requireNumericArray(right, prettyName)
    }

    private def isFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val aF = isFloat(left)
      val bF = isFloat(right)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val aGet = if (isFloat(left)) "getFloat" else "getDouble"
      val bGet = if (isFloat(right)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $x = (double) $a.$aGet($i);
        |    double $y = (double) $b.$bGet($i);
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |}
        """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** `dot_prod(a, b)` — double left-to-right dot product only (use with
    * precomputed norms to avoid recomputing them per candidate pair).
    * Codegen'd like [[CosineSim]]. */
  case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // null on length mismatch even for non-null inputs; also required for
    // nullSafeCodeGen to declare the isNull slot the generated code sets
    override def nullable: Boolean = true
    override def prettyName: String = "dot_prod"
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireNumericArray(left, prettyName)
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else requireNumericArray(right, prettyName)
    }

    private def isFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      val aF = isFloat(left)
      val bF = isFloat(right)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        i += 1
      }
      java.lang.Double.valueOf(dot)
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val aGet = if (isFloat(left)) "getFloat" else "getDouble"
      val bGet = if (isFloat(right)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $dot += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
        |  }
        |  ${ev.value} = $dot;
        |}
        """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Byte-exact equivalent of `regexp_replace(trim(x), '\\s+', ' ')`:
    * strip leading/trailing SPACES (0x20 — what Spark `trim` removes), then
    * collapse every run of Java-regex `\s` ([ \t\n\x0B\f\r], all ASCII) to
    * one space — including runs touching the ends, which the regex form
    * turns into a space, not nothing. UTF-8 continuation bytes are ≥ 0x80,
    * so the byte loop never splits a multi-byte char. Called from generated
    * code. */
  def squeezeWs(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    val out = new Array[Byte](hi - lo)
    var n = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      val b = bytes(i)
      if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) inWs = true
      else {
        if (inWs) { out(n) = 0x20; n += 1; inWs = false }
        out(n) = b; n += 1
      }
      i += 1
    }
    if (inWs) { out(n) = 0x20; n += 1 }
    UTF8String.fromBytes(out, 0, n)
  }

  /** `squeeze_ws(text)` — the imperative spelling of
    * `regexp_replace(trim(text), '\\s+', ' ')`: java.util.regex walks a
    * backtracking NFA per char, ~10× the cost of this one byte pass on a
    * corpus scan (fingerprinting reads EVERY byte of 100 TB). */
  case class SqueezeWs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      squeezeWs(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.plans.Expressions.squeezeWs($c)")
    override protected def withNewChildInternal(newChild: Expression): SqueezeWs =
      copy(child = newChild)
  }

  /** Size-capped heap buffer for [[BoundedFirstN]]: keeps the `maxLen`
    * SMALLEST elements seen (max-heap; a new element evicts the current max
    * once full), so a partial aggregation buffer never exceeds `maxLen`
    * rows no matter how hot the key. */
  final class BoundedFirstNBuffer(val maxLen: Int, ord: Ordering[InternalRow]) {
    val heap = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
    def add(row: InternalRow): Unit =
      if (heap.size < maxLen) heap.enqueue(row)
      else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row) }
    def sortedAsc: Array[InternalRow] = heap.toArray.sorted(ord)
  }

  /** `first_n(struct, k)` aggregate: the k smallest input structs in
    * ascending struct order — semantically `slice(array_sort(collect_list(
    * struct)), 1, k)`, but with the cap applied INSIDE the aggregation
    * buffer. `collect_list` materializes a hot key's entire group before any
    * downstream slice can truncate it (one bot user with 100M events = one
    * 100M-row buffer); this keeps every partial and final buffer ≤ k rows
    * and merges map-side like any other partial aggregate. */
  case class BoundedFirstN(child: Expression, maxLen: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[BoundedFirstNBuffer]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

    require(maxLen > 0, "maxLen must be positive")

    private lazy val ordering: Ordering[InternalRow] = {
      val structType = child.dataType.asInstanceOf[StructType]
      org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
        .forSchema(structType.map(_.dataType))
        .asInstanceOf[Ordering[InternalRow]]
    }
    private lazy val serProj =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(child.dataType.asInstanceOf[StructType])

    override def createAggregationBuffer(): BoundedFirstNBuffer =
      new BoundedFirstNBuffer(maxLen, ordering)

    override def update(buf: BoundedFirstNBuffer, input: InternalRow): BoundedFirstNBuffer = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[InternalRow].copy())
      buf
    }

    override def merge(buf: BoundedFirstNBuffer, other: BoundedFirstNBuffer): BoundedFirstNBuffer = {
      other.heap.foreach(buf.add)
      buf
    }

    override def eval(buf: BoundedFirstNBuffer): Any =
      new GenericArrayData(buf.sortedAsc.asInstanceOf[Array[Any]])

    override def serialize(buf: BoundedFirstNBuffer): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.heap.size)
      buf.heap.foreach { row =>
        val bytes = serProj(row).getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): BoundedFirstNBuffer = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      val nFields = child.dataType.asInstanceOf[StructType].size
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val rowBytes = new Array[Byte](len)
        in.readFully(rowBytes)
        val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(nFields)
        row.pointTo(rowBytes, len)
        buf.add(row)
        i += 1
      }
      buf
    }

    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case s: StructType
            if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"first_n requires an orderable struct input, got ${other.catalogString}")
      }
    override def prettyName: String = "first_n"
    override def withNewMutableAggBufferOffset(offset: Int): BoundedFirstN =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): BoundedFirstN =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): BoundedFirstN =
      copy(child = newChild)
  }

  /** `repetition_signals(tokens, k)` → struct(top_gram_frac double,
    * stopword_frac double) — the published boilerplate/quality cleaning
    * signals in ONE imperative pass per row. The modal k-gram count is a
    * hash-multiset max (identical to "longest equal run of the sorted
    * grams" — sorting groups equal grams, so the longest run IS the max
    * multiplicity); stopwords probe a prebuilt HashSet against the token's
    * `UTF8String.toLowerCase` (the exact semantics of `lower()`).
    *
    * Replaces the interpreted `F.aggregate`/`F.filter` HOF chain (thousands
    * of per-element interpreted expression evals per document — the same
    * anti-pattern [[ShingleMinHashMd5]] removed, ~8-10× there). Null array
    * elements are skipped as absent tokens (they cannot occur from
    * `split`). */
  case class RepetitionSignals(child: Expression, k: Int, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
    require(k > 0, s"gram size k must be positive, got $k")
    override def dataType: DataType = StructType(Seq(
      StructField("top_gram_frac", DoubleType, nullable = false),
      StructField("stopword_frac", DoubleType, nullable = false)))
    override def prettyName: String = "repetition_signals"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    // stopword list is matched as-is against lowercased tokens (the
    // Column tier compared `lower(t)` to the literal list) — pure function
    // of the constructor arg, built once per task, not per row
    private lazy val stopSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
      stopwords.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val total = arr.numElements()
      val words = new Array[String](total)
      var nTok = 0
      var nStop = 0
      var w = 0
      while (w < total) {
        val u = arr.getUTF8String(w)
        if (u != null) {
          if (stopSet.contains(u.toLowerCase)) nStop += 1
          words(nTok) = u.toString
          nTok += 1
        }
        w += 1
      }
      val nGrams = if (nTok >= k) nTok - k + 1 else 0
      var best = 0L
      if (nGrams > 0) {
        val counts = new java.util.HashMap[String, java.lang.Long](nGrams * 2)
        var i = 0
        while (i < nGrams) {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
          val c = counts.merge(sb.toString, java.lang.Long.valueOf(1L),
            (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
          if (c.longValue() > best) best = c.longValue()
          i += 1
        }
      }
      val topFrac = if (nGrams > 0) best.toDouble / nGrams else 0.0
      val stopFrac = if (nTok > 0) nStop.toDouble / nTok else 0.0
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](topFrac, stopFrac))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `repetition_profile(tokens)` → struct(n_tokens, top_word, top_bigram,
    * n_trigrams, distinct_trigrams, max_run): the count side of the
    * Gopher-family repetition gates ([[graft.functions.Text.repetitionProfile]]
    * derives the ppm ratios). ONE imperative pass per document with
    * doc-bounded hashmaps — every statistic here is per-document, so no
    * gram ever needs to leave its row, let alone shuffle. (The first
    * spelling was a tagged-gram explode + two aggregations; beyond the
    * needless shuffle it also re-evaluated the inlined tokenizer per HOF
    * reference interpreted — the q146 lesson — and a single-task scan of
    * the 500k-doc drill corpus ran for an hour before this rewrite.) */
  case class RepetitionProfile(child: Expression)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("top_word", LongType, nullable = false),
      StructField("top_bigram", LongType, nullable = false),
      StructField("n_trigrams", LongType, nullable = false),
      StructField("distinct_trigrams", LongType, nullable = false),
      StructField("max_run", LongType, nullable = false)))
    override def prettyName: String = "repetition_profile"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val total = arr.numElements()
      val words = new Array[String](total)
      var n = 0
      var w = 0
      while (w < total) {
        val u = arr.getUTF8String(w)
        if (u != null) { words(n) = u.toString; n += 1 } // nulls = absent tokens
        w += 1
      }
      val one = java.lang.Long.valueOf(1L)
      val add = new java.util.function.BiFunction[java.lang.Long, java.lang.Long, java.lang.Long] {
        def apply(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
          java.lang.Long.valueOf(a.longValue() + b.longValue())
      }
      // words + run lengths in one sweep
      var topW = 0L
      var maxRun = 0L
      var run = 0L
      val wc = new java.util.HashMap[String, java.lang.Long](math.max(16, n * 2))
      var i = 0
      while (i < n) {
        val c = wc.merge(words(i), one, add)
        if (c.longValue() > topW) topW = c.longValue()
        run = if (i > 0 && words(i) == words(i - 1)) run + 1 else 1L
        if (run > maxRun) maxRun = run
        i += 1
      }
      // modal bigram
      var topB = 0L
      if (n >= 2) {
        val bc = new java.util.HashMap[String, java.lang.Long](n * 2)
        i = 0
        while (i < n - 1) {
          val c = bc.merge(words(i) + " " + words(i + 1), one, add)
          if (c.longValue() > topB) topB = c.longValue()
          i += 1
        }
      }
      // trigram total vs distinct
      var nt = 0L
      var dt = 0L
      if (n >= 3) {
        val tc = new java.util.HashSet[String](n * 2)
        i = 0
        while (i < n - 2) {
          tc.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
          i += 1
        }
        nt = (n - 2).toLong
        dt = tc.size.toLong
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n.toLong, topW, topB, nt, dt, maxRun))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `rhp_bucket(emb, dim, nBits, seed)` → 64-bit random-hyperplane LSH
    * bucket: bit `b` is set iff the dot product of the vector with the
    * deterministic ±1 hyperplane `sign(xxhash64(seed, b, i) & 1)` is > 0 —
    * bit-identical to the zip_with/aggregate Column formulation (same
    * Spark `XXH64` chain seeded at 42, same left-to-right double fold),
    * with all `nBits` sign bits computed in ONE pass over the vector and
    * the whole ±1 sign matrix precomputed once per task instead of
    * `nBits × dim` interpreted lambda evals per row.
    *
    * Null when the array length ≠ `dim` or any element is null (the
    * Column tier returns engine-specific junk on those malformed inputs;
    * an ANN index wants them surfaced, not bucketed). */
  case class RhpBucket(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
    require(dim > 0, s"dim must be positive, got $dim")
    require(nBits > 0 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "rhp_bucket"
    override def checkInputDataTypes(): TypeCheckResult =
      requireNumericArray(child, prettyName)

    private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    // sign(bit, i) replicates xxhash64(lit(seed): long, lit(bit): int,
    // i: int): Spark's XxHash64 folds children left-to-right starting at
    // its fixed seed 42, hashLong for longs / hashInt for ints
    private lazy val signs: Array[Array[Double]] = Array.tabulate(nBits) { bit =>
      val h2 = XXH64.hashInt(bit, XXH64.hashLong(seed, 42L))
      Array.tabulate(dim) { i =>
        if ((XXH64.hashInt(i, h2) & 1L) == 1L) 1.0 else -1.0
      }
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      if (arr.numElements() != dim) return null
      var out = 0L
      var bit = 0
      while (bit < nBits) {
        val sg = signs(bit)
        var acc = 0.0
        var i = 0
        while (i < dim) {
          if (arr.isNullAt(i)) return null
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          acc += x * sg(i)
          i += 1
        }
        if (acc > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** `winnow_md5(tokens, k, w)` → the document's winnowing fingerprint set
    * (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): md5 each
    * k-gram, slide a window of `w` hashes, keep each window's MINIMUM,
    * output the distinct selected values sorted (hex strings — nibble-
    * monotone, so unsigned-digest comparison == lexicographic hex order,
    * same engine-portable trick as `shingle_minhash`). Guarantee: two
    * documents sharing any token run of length >= w + k - 1 share at least
    * one fingerprint — the LOCAL overlap detector that whole-document
    * fingerprints (`fingerprint_md5`/rolling) cannot express.
    *
    * Shapes: null when fewer than k tokens (mirrors `shingle_minhash`);
    * when the doc has fewer than `w` k-grams the whole doc is one window
    * (its global min hash). Fingerprints are deduped by VALUE, which
    * subsumes the paper's dedupe-by-position (equal selections stringify
    * equally). One pass, O(grams) via a monotonic min-deque — no per-window
    * rescans, no interpreted lambdas. */
  case class WinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
    require(k > 0, s"shingle size k must be positive, got $k")
    require(w > 0, s"window size w must be positive, got $w")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "winnow_md5"
    override def checkInputDataTypes(): TypeCheckResult =
      requireTokenArray(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val md = tlMd5.get()
      val words = tokenBytes(arr)
      val n = words.length
      if (n < k) return null
      val m = n - k + 1
      val digests = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) {
        md.reset()
        md.update(shingleBytes(words, i, k))
        digests(i) = md.digest()
        i += 1
      }
      val selected = new java.util.TreeSet[String]()
      if (m <= w) {
        var min = digests(0)
        i = 1
        while (i < m) {
          if (java.util.Arrays.compareUnsigned(digests(i), min) < 0) min = digests(i)
          i += 1
        }
        selected.add(hexifyMd5(min))
      } else {
        // monotonic deque of indices: head = current window minimum
        val dq = new Array[Int](m)
        var head = 0
        var tail = 0 // exclusive
        i = 0
        while (i < m) {
          while (tail > head && java.util.Arrays.compareUnsigned(
            digests(dq(tail - 1)), digests(i)) >= 0) tail -= 1
          dq(tail) = i; tail += 1
          if (dq(head) <= i - w) head += 1
          if (i >= w - 1) selected.add(hexifyMd5(digests(dq(head))))
          i += 1
        }
      }
      val out = new Array[Any](selected.size)
      val it = selected.iterator()
      i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column-facing constructors ----

  private def expr(c: Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  def shingleMinhash(tokens: Column, k: Int, numHashes: Int): Column =
    column(ShingleMinHashMd5(expr(tokens), k, numHashes))

  def shingleArray(tokens: Column, k: Int): Column =
    column(ShingleArray(expr(tokens), k))

  def squeezeRuns(tokens: Column): Column = column(SqueezeRuns(expr(tokens)))

  def maskJoin(tokens: Column, positions: Column): Column =
    column(MaskJoin(expr(tokens), expr(positions)))

  def simhash64(tokens: Column): Column = column(SimHash64(expr(tokens)))

  def byteHistogram(payload: Column, bins: Int): Column =
    column(ByteHistogram(expr(payload), bins))

  def simhashMd5(tokens: Column): Column = column(SimHashMd5(expr(tokens)))

  def md5Bucket(key: Column, buckets: Long): Column =
    column(Md5Bucket(expr(key), buckets))

  def nfcNormalize(text: Column): Column = column(NfcNormalize(expr(text)))

  def squeezeWhitespace(text: Column): Column = column(SqueezeWs(expr(text)))

  def zorder(x: Column, y: Column): Column =
    column(ZOrder2(expr(x.cast("long")), expr(y.cast("long"))))

  def cosineSim(a: Column, b: Column): Column = column(CosineSim(expr(a), expr(b)))

  def dotProd(a: Column, b: Column): Column = column(DotProd(expr(a), expr(b)))

  /** Aggregate: the `k` smallest struct values per group, ascending — a
    * buffer-bounded `slice(array_sort(collect_list(s)), 1, k)`. */
  def boundedFirstN(structCol: Column, k: Int): Column =
    column(BoundedFirstN(expr(structCol), k).toAggregateExpression())

  def repetitionSignals(tokens: Column, k: Int, stopwords: Seq[String]): Column =
    column(RepetitionSignals(expr(tokens), k, stopwords))

  def repetitionProfile(tokens: Column): Column =
    column(RepetitionProfile(expr(tokens)))

  def rhpBucket(emb: Column, dim: Int, nBits: Int, seed: Long): Column =
    column(RhpBucket(expr(emb), dim, nBits, seed))

  def winnowMd5(tokens: Column, k: Int, w: Int): Column =
    column(WinnowMd5(expr(tokens), k, w))
}
