package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding merge table (Sennrich '16 / GPT-2-style): ordered
  * list of token pairs, rank = learning order. Encoding repeatedly
  * merges the lowest-rank (earliest-learned) adjacent pair, leftmost on
  * ties, until no adjacent pair is in the table — because any merge
  * whose elements contain a token t is necessarily learned after t is
  * formed, this one-occurrence-at-a-time greedy yields the identical
  * tokenization to the classic merge-all-occurrences-per-step encoder,
  * and (unlike it) is replayable step-by-step by a SQL recursive CTE,
  * which is how the DuckDB oracle verifies it.
  *
  * A `Vector[(String, String)]` param keeps case-class equality
  * structural, so identical expressions canonicalize equal and
  * subexpression elimination works (the BloomMightContainLong lesson).
  */
case class BpeMerges(pairs: Vector[(String, String)]) extends Serializable {

  /** rank lookup keyed "a b" (tokens are fragments of space-split words, so the space separator is unambiguous). */
  @transient lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.size * 2)
    pairs.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Direct-mapped per-instance word→count cache: corpora are Zipfian,
    * so almost every lookup hits. Entries are immutable (safe
    * publication via final fields); a lost racy update just recomputes.
    */
  @transient private lazy val cache =
    new Array[BpeMerges.CachedWord](BpeMerges.CacheSize)

  def wordTokenCount(word: String): Int = {
    val slot = word.hashCode & (BpeMerges.CacheSize - 1)
    val hit = cache(slot)
    if (hit != null && hit.word == word) return hit.count
    val n = encode(word).length
    cache(slot) = new BpeMerges.CachedWord(word, n)
    n
  }

  /** rank by merge OUTPUT string (a+b), first (lowest) rank wins —
    * id assignment for [[BpeOps.encodeIds]]: single chars take their
    * codepoint, merged tokens take 256 + this rank, so ids are a pure
    * function of the merge table both engines share.
    */
  @transient lazy val outputRank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.size * 2)
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, i); ()
    }
    m
  }

  @transient private lazy val idCache =
    new Array[BpeMerges.CachedIds](BpeMerges.CacheSize)

  def tokenId(tok: String): Int =
    if (tok.length == 1) tok.charAt(0).toInt
    else 256 + outputRank.get(tok).intValue()

  /** Token ids of one word (cached — corpora are Zipfian). */
  def wordIds(word: String): Array[Int] = {
    val slot = word.hashCode & (BpeMerges.CacheSize - 1)
    val hit = idCache(slot)
    if (hit != null && hit.word == word) return hit.ids
    val ids = encode(word).map(tokenId)
    idCache(slot) = new BpeMerges.CachedIds(word, ids)
    ids
  }

  /** Tokenize one word (no whitespace inside). O(L²) rank lookups. */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = false
    while (!done && toks.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      i = 0
      while (i < toks.length - 1) {
        val r = rank.get(toks(i) + " " + toks(i + 1))
        if (r != null && r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val next = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, next, 0, bi)
        next(bi) = toks(bi) + toks(bi + 1)
        System.arraycopy(toks, bi + 2, next, bi + 1, toks.length - bi - 2)
        toks = next
      }
    }
    toks
  }
}

object BpeMerges {
  private final val CacheSize = 1 << 14
  private final class CachedWord(val word: String, val count: Int)
  private[functions] final class CachedIds(val word: String, val ids: Array[Int])
}

/** Static kernels callable from generated code. */
object BpeOps {

  /** Total BPE tokens of a space-separated text: per-word encode
    * (cached), summed in one pass — no token array ever materializes
    * for the document.
    */
  def tokenCount(text: UTF8String, m: BpeMerges): Int = {
    val s = text.toString
    var total = 0
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) total += m.wordTokenCount(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** BPE tokens of a single word as an array (the trainer's surface). */
  def wordTokens(word: UTF8String, m: BpeMerges): GenericArrayData =
    new GenericArrayData(m.encode(word.toString).map(UTF8String.fromString(_)))

  /** Token ID sequence of a space-separated text — the actual encoder
    * output a training pipeline ships to the model: per-word encode
    * (cached), ids concatenated in document order. Single-char tokens
    * take their codepoint; merged tokens 256 + merge rank.
    */
  def encodeIds(text: UTF8String, m: BpeMerges): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(s.length / 3 + 4)
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) out.addAll(m.wordIds(s.substring(start, i)))
        start = i + 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out.result())
  }
}

/** `bpe_token_count(text)`: total BPE tokens of a space-separated text
  * under a fixed merge table. The table ships once per plan via
  * `addReferenceObj`; the per-row work is a compiled loop with a
  * word-level cache.
  */
case class BpeTokenCount(child: Expression, m: BpeMerges) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    BpeOps.tokenCount(input.asInstanceOf[UTF8String], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", m, classOf[BpeMerges].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.tokenCount($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** `bpe_word_tokens(word)`: the BPE tokenization of one word — used by
  * the trainer over the (small, deduplicated) distinct-word aggregate,
  * never over raw documents.
  */
case class BpeWordTokens(child: Expression, m: BpeMerges) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_word_tokens"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    BpeOps.wordTokens(input.asInstanceOf[UTF8String], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", m, classOf[BpeMerges].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.wordTokens($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeWordTokens =
    copy(child = newChild)
}

/** `bpe_encode_ids(text)`: the full token ID sequence of a document —
  * what the training pipeline actually materializes for the model.
  */
case class BpeEncodeIds(child: Expression, m: BpeMerges) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode_ids"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    BpeOps.encodeIds(input.asInstanceOf[UTF8String], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", m, classOf[BpeMerges].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.encodeIds($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeExpressions {
  def bpe_token_count(text: Column, m: BpeMerges): Column =
    bridge.column(BpeTokenCount(bridge.expression(text), m))
  def bpe_word_tokens(word: Column, m: BpeMerges): Column =
    bridge.column(BpeWordTokens(bridge.expression(word), m))
  def bpe_encode_ids(text: Column, m: BpeMerges): Column =
    bridge.column(BpeEncodeIds(bridge.expression(text), m))
}
