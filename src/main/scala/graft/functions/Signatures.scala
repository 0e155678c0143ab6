package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass signature expressions for the LSH dedup pipelines.
  *
  * The column-combinator forms (32 × `array_min(transform(...))`) iterate
  * the shingle array once per hash function in interpreted HOF evaluation.
  * These expressions compute the whole signature in ONE pass over the
  * array elements with primitive state — measured ~5× on the sf0.1
  * documents table. Hashing matches Spark's `hash(col, seed)` (murmur3 on
  * UTF-8 bytes) so signatures are identical to the combinator form.
  *
  * All three implement `doGenCode` (a static call into [[SignatureOps]],
  * the same method `eval` uses), so they participate in whole-stage
  * codegen instead of forcing a CodegenFallback row-conversion boundary
  * in the middle of the dedup projections.
  */

/** Runtime kernels shared by interpreted eval and generated code —
  * plain object so Janino can call the static forwarders. */
object SignatureOps {

  /** min over elements of murmur3(element, seed) for every seed. */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Int.MaxValue)
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      // identical to Spark's hash(s, lit(seed)) = hashInt(seed,
      // hashUnsafeBytes(s, 42)) — the byte hash is seed-independent, so
      // it's computed ONCE per element and only the cheap int-mix varies
      val base = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42)
      var seed = 0
      while (seed < numHashes) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(seed, base)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 32-bit SimHash: majority vote per bit of murmur3(token). */
  /** 64-bit SimHash from two independent murmur32 draws (seeds 42/43)
    * per token — the band-blocking scale path needs ≥ 65k keys per
    * band, which a 32-bit signature's 4×8-bit split cannot give (256
    * keys/band is a hard ceiling that went quadratic on the 10×
    * ladder). */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42)
      val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 43)
      var b = 0
      while (b < 32) {
        if (((lo >>> b) & 1) == 1) counts(b) += 1
        if (((hi >>> b) & 1) == 1) counts(32 + b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1) == 1) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) * 2 >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Distinct word n-gram shingles from raw text (lowercase, whitespace
    * tokens, "fewer than n tokens → one joined shingle" edge preserved —
    * matches Text.shingles ∘ array_distinct). */
  /** Unigram+bigram instance bag, duplicates kept — mirrors the
    * `when(size(t) < 2, t).otherwise(concat(t, bigrams))` combinator
    * exactly: <2 tokens → just the tokens; else tokens ++ (k−1) bigrams.
    */
  def wordNgramBag(text: UTF8String): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val k = tokens.length
    if (k < 2) {
      val out = new Array[Any](k)
      var i = 0
      while (i < k) { out(i) = UTF8String.fromString(tokens(i)); i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](2 * k - 1)
      var i = 0
      while (i < k) { out(i) = UTF8String.fromString(tokens(i)); i += 1 }
      var j = 0
      while (j + 2 <= k) {
        out(k + j) = UTF8String.fromString(tokens(j) + " " + tokens(j + 1))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Word n-gram INSTANCES (duplicates kept, order preserved) — the
    * LM-count companion of [[wordShingles]]. `< n` tokens → ONE element
    * holding the whole (possibly empty) space-joined text, mirroring
    * the `array(concat_ws(" ", toks))` combinator edge exactly. */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val k = tokens.length
    if (k < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(tokens.mkString(" "))))
    } else {
      val out = new Array[Any](k - n + 1)
      var i = 0
      while (i + n <= k) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j)); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString); i += 1
      }
      new GenericArrayData(out)
    }
  }

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val seen = new java.util.LinkedHashSet[String]()
    if (tokens.length < n) {
      seen.add(tokens.mkString(" "))
    } else {
      var i = 0
      while (i + n <= tokens.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j)); j += 1
        }
        seen.add(sb.toString); i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Position-ordered 128-bit n-gram hashes: element i = hash of the
    * n-gram starting at token i (lowercase, whitespace tokens). 16-byte
    * keys (two XXH64 seeds over the gram's UTF-8 bytes) make anchor-gram
    * equality effectively exact (collision ~2⁻¹²⁸ per pair) at 13% of a
    * 120-char gram string's shuffle width. Fewer than n tokens → empty
    * array (no full anchor exists). One pass, no per-position token-array
    * slicing — the interpreted transform/slice/concat_ws combinator chain
    * this replaces recopied n tokens per position (q115 measured 12.3 s
    * at sf0.1; this form benches ~6× faster). */
  def positionalGramHashes(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](tokens.length - n + 1)
    var i = 0
    while (i + n <= tokens.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j)); j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 0x9E3779B97F4A7C15L)
      val b = java.nio.ByteBuffer.allocate(16)
      b.putLong(h1); b.putLong(h2)
      out(i) = b.array()
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All-minhash signature: for each seed in [0, numHashes), the min of
  * murmur3(element, seed) over the input string array. */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignatureOps.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.minhash($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** 32-bit SimHash from a string-token array: majority vote per bit of
  * murmur3(token) — one pass, primitive bit counters. */
case class SimHashExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SignatureOps.simhash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Word n-gram instances (duplicates kept) straight from raw text —
  * one tokenize per row instead of one per emitted element. */
case class WordNgramsExpr(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignatureOps.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

/** 64-bit SimHash (two murmur32 seeds) — the banded near-dup scale form. */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SignatureOps.simhash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Distinct word n-gram shingles straight from the raw text — one pass
  * with a LinkedHashSet for distinctness. Replaces the interpreted
  * filter/split/transform/sequence/slice/concat_ws combinator chain. */
case class WordShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignatureOps.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** Unigram+bigram INSTANCE bag (duplicates kept — LM counts need them)
  * in one pass: [t₁…tₖ, "t₁ t₂"…"tₖ₋₁ tₖ"]. Replaces the
  * transform(sequence(...)) HOF form whose lambda re-tokenized the
  * whole text per bigram element — O(tokens²) interpreted work that
  * made the DSIR corpus pass the slowest query in the bench. */
case class WordNgramBagExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignatureOps.wordNgramBag(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.wordNgramBag($c);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramBagExpr =
    copy(child = newChild)
}

/** Position-ordered 128-bit n-gram hashes from raw text — the
  * exact-substring anchor builder (element index = token position). */
case class PositionalGramHashesExpr(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignatureOps.positionalGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignatureOps.positionalGramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): PositionalGramHashesExpr =
    copy(child = newChild)
}

object Signatures {
  /** Single-pass distinct word n-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int): Column =
    GraftExprBridge.toColumn(WordShinglesExpr(GraftExprBridge.toExpression(text), n))

  /** Single-pass word n-gram instances (duplicates kept). */
  def wordNgrams(text: Column, n: Int): Column =
    GraftExprBridge.toColumn(WordNgramsExpr(GraftExprBridge.toExpression(text), n))

  /** Single-pass unigram+bigram instance bag (duplicates kept). */
  def wordNgramBag(text: Column): Column =
    GraftExprBridge.toColumn(WordNgramBagExpr(GraftExprBridge.toExpression(text)))

  /** Single-pass position-ordered 128-bit n-gram hashes of a text column. */
  def positionalGramHashes(text: Column, n: Int): Column =
    GraftExprBridge.toColumn(
      PositionalGramHashesExpr(GraftExprBridge.toExpression(text), n))

  /** Single-pass minhash signature of a string-array column. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftExprBridge.toColumn(
      MinHashSignatureExpr(GraftExprBridge.toExpression(shingles), numHashes))

  /** Single-pass 32-bit simhash of a string-token-array column. */
  def simhash(tokens: Column): Column =
    GraftExprBridge.toColumn(SimHashExpr(GraftExprBridge.toExpression(tokens)))

  /** Single-pass 64-bit simhash of a string-token-array column. */
  def simhash64(tokens: Column): Column =
    GraftExprBridge.toColumn(SimHash64Expr(GraftExprBridge.toExpression(tokens)))
}
