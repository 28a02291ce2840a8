package graft.plans

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling kernel for the dedup hot path.
  *
  * [[graft.llm.Dedup.wordShinglesHof]] builds word n-grams from a
  * zip_with chain over shifted token slices — the best declarative
  * shape, but higher-order functions run INTERPRETED (each element
  * walks a lambda expression tree), and on a 5-gram build that is
  * n-1 zip_with passes per row before the per-element xxhash64
  * transform the LSH/PPJoin callers add on top. This kernel runs the
  * whole tokenize → n-gram → distinct (→ hash → sort) pipeline as one
  * tight JVM loop inside whole-stage codegen.
  *
  * Parity contract (spec-enforced bit-for-bit against the HOF form):
  *  - tokens = trim(text) split on `\s+` (same UTF8String.split the
  *    built-in StringSplit uses, so locale/regex semantics match);
  *  - docs with fewer than n tokens yield ONE shingle joining all
  *    tokens (concat_ws skips zip_with's null padding — empty text
  *    yields [""], matching split's single empty token);
  *  - distinct keeps FIRST occurrence order;
  *  - hashes are Spark xxhash64 (XXH64, seed 42) of each shingle,
  *    sorted ascending (signed), duplicates from hash collisions kept.
  */
object ShingleKernel {
  private val WhitespaceRe = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")
  private val Xxhash64DefaultSeed = 42L

  private def grams(s: UTF8String, n: Int): Array[UTF8String] = {
    val toks = s.trim().split(WhitespaceRe, -1)
    val out =
      if (n == 1) toks
      else if (toks.length < n) Array(UTF8String.concatWs(Space, toks: _*))
      else Array.tabulate(toks.length - n + 1) { i =>
        UTF8String.concatWs(Space, toks.slice(i, i + n): _*)
      }
    if (out.length <= 1) return out
    // distinct, first occurrence wins (array_distinct semantics)
    val seen = new java.util.LinkedHashSet[UTF8String](out.length * 2)
    out.foreach(seen.add)
    seen.toArray(new Array[UTF8String](seen.size))
  }

  def wordShingles(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(grams(s, n).asInstanceOf[Array[Any]])

  /** All n-grams of a pre-tokenized array: duplicates kept, EMPTY when
    * the document has fewer than n tokens (see [[ArrayNgramsF]]).
    * Null elements (possible in arbitrary caller arrays, not produced
    * by the tokenizer) vanish inside concatWs — which for n == 1 means
    * a lone null token becomes "" — matching the HOF
    * `concat_ws(" ", element_at(toks, i))` bit-for-bit and keeping the
    * declared containsNull = false honest.
    */
  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  def emptyNgrams(): ArrayData = EmptyArray

  def arrayNgrams(arr: ArrayData, n: Int): ArrayData = {
    val size = arr.numElements()
    if (size < n) return EmptyArray
    val toks = new Array[UTF8String](size)
    var i = 0
    while (i < size) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](size - n + 1)
    i = 0
    while (i < out.length) {
      out(i) = UTF8String.concatWs(Space, toks.slice(i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of the lowercased whitespace token MULTISET
    * (duplicates vote once each): bit b set when the Σ±1 votes over
    * token-hash bit b is positive. Mirrors the declarative bulk form
    * ([[graft.llm.Dedup.simhashSignatures]]'s explode + 64 conditional
    * sums) bit-for-bit: tokens = split(trim(lower(text)), "\\s+")
    * (same UTF8String toLowerCase/trim/split the built-ins use — an
    * empty document is the single empty token, which votes), hash =
    * xxhash64 seed 42. One tight loop per row instead of a corpus-
    * sized token explode through a 64-column hash aggregation.
    */
  def simhash64(s: UTF8String): Long = {
    val toks = s.toLowerCase.trim().split(WhitespaceRe, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, Xxhash64DefaultSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** One-hash minwise-permutation constants (canonical home; the
    * Dedup HOF/agg reference forms delegate here): 31-bit domain keeps
    * a·h + b inside a long (ANSI mode forbids wrapping overflow);
    * 2^-31 collision odds are ample for minhash.
    */
  def mixA(i: Int): Long = ((2654435761L * (2 * i + 1)) & 0x7FFFFFFFL) | 1L
  def mixB(i: Int): Long = (-7046029254386353131L * (i + 1)) & 0x7FFFFFFFL

  private val mixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def mixFor(numHashes: Int): (Array[Long], Array[Long]) =
    mixCache.computeIfAbsent(numHashes, k =>
      (Array.tabulate(k)(mixA), Array.tabulate(k)(mixB)))

  /** Whole MinHash signature in one per-row loop: distinct word
    * n-grams → xxhash64 & 0x7FFFFFFF → numHashes affine-mixed minima.
    * Bit-identical to the explode + min-aggregate bulk formulation
    * (same grams, same hash, same mix constants) with ZERO shuffle —
    * the signature rides the consumer's scan. A document always has
    * ≥ 1 gram (short docs join all tokens, empty text is the single
    * empty token), so the minima are always real.
    */
  def minhashSig(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val (as, bs) = mixFor(numHashes)
    val gs = grams(s, n)
    val out = new Array[Long](numHashes)
    Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < gs.length) {
      val g = gs(i)
      val h = XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, Xxhash64DefaultSeed) &
        0x7FFFFFFFL
      var j = 0
      while (j < numHashes) {
        val v = h * as(j) + bs(j)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val gs = grams(s, n)
    val hs = new Array[Long](gs.length)
    var i = 0
    while (i < gs.length) {
      val g = gs(i)
      hs(i) = XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, Xxhash64DefaultSeed)
      i += 1
    }
    Arrays.sort(hs)
    new GenericArrayData(hs)
  }
}

private[plans] sealed trait ShingleExpression extends UnaryExpression {
  def n: Int
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) {
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got $n")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType.simpleString}")
}

/** `graft_word_shingles(text, n)` — array<string> of distinct word
  * n-grams; drop-in for the HOF [[graft.llm.Dedup.wordShinglesHof]].
  */
case class WordShinglesF(child: Expression, n: Int) extends ShingleExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernel.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesF =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingles"
}

/** `graft_word_shingle_hashes(text, n)` — the fused form of
  * `array_sort(transform(shingles, xxhash64))`: sorted-ascending
  * xxhash64 values of the distinct word n-grams, ready for the
  * sorted-merge intersection of the PPJoin verification tail.
  */
case class WordShingleHashesF(child: Expression, n: Int) extends ShingleExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.wordShingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernel.wordShingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesF =
    copy(child = newChild)

  override def prettyName: String = "graft_word_shingle_hashes"
}

/** `graft_array_ngrams(tokens, n)` — ALL word n-grams (space-joined,
  * duplicates kept) of a token array, for per-document occurrence
  * counting ([[graft.llm.Search.ngramCounts]]). Unlike the shingle
  * forms: input is a pre-tokenized array, output is NOT distinct, and
  * a document shorter than n tokens yields an EMPTY array (no partial
  * gram) — mirroring the HOF `when(upper >= 1, transform(...))` form.
  */
case class ArrayNgramsF(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<string> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // a null token array yields an EMPTY gram array (never null),
  // mirroring the HOF guard `when(upper >= 1, ...).otherwise(array())`
  // whose null condition also falls through to the empty branch
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleKernel.emptyNgrams()
    else ShingleKernel.arrayNgrams(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      s"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${childGen.isNull}
         |    ? graft.plans.ShingleKernel.emptyNgrams()
         |    : graft.plans.ShingleKernel.arrayNgrams(${childGen.value}, $n);
       """.stripMargin
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.Block
        .BlockHelper(new StringContext(resultCode)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayNgramsF =
    copy(child = newChild)

  override def prettyName: String = "graft_array_ngrams"
}

/** `graft_minhash(text, n, numHashes)` — whole MinHash signature per
  * row (see [[ShingleKernel.minhashSig]]); the zero-shuffle drop-in
  * for the explode + min-aggregate bulk path, spec-pinned bit-for-bit
  * against it and the per-row HOF fold.
  */
case class MinHashSigF(child: Expression, n: Int, numHashes: Int)
    extends ShingleExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (numHashes >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs numHashes >= 1, got $numHashes")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.minhashSig(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleKernel.minhashSig($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigF =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** `graft_simhash(text)` — 64-bit SimHash of the lowercased
  * whitespace token multiset (see [[ShingleKernel.simhash64]]); the
  * codegen'd drop-in for the explode + 64-conditional-sum bulk
  * aggregation, spec-pinned bit-for-bit against it.
  */
case class SimHashF(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashF =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object TextExpressions {
  def simhash(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_simhash", text)

  def minhash(text: Column, n: Int, numHashes: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_minhash", text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(numHashes))

  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_word_shingles", text, org.apache.spark.sql.functions.lit(n))

  def wordShingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_word_shingle_hashes", text, org.apache.spark.sql.functions.lit(n))

  def arrayNgrams(tokens: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_array_ngrams", tokens, org.apache.spark.sql.functions.lit(n))
}
