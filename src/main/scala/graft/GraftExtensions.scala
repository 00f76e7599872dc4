package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** Registers every custom Catalyst kernel as a SQL function, so the
  * whole library is usable from pure SQL on top of the DSv2 table:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or in-process:
  *   GraftExtensions.register(spark)
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM …
  *   SELECT simhash64(array_distinct(split(text, ' '))) FROM docs
  *   SELECT map_sum(m) FROM t GROUP BY k
  *
  * (SparkSessionExtensions is the supported injection point for custom
  * expressions; the same builders also register directly into an
  * existing session's function registry.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    // 3-arg ExpressionInfo is (className, db, name) — db stays null here
    (FunctionIdentifier(name), new ExpressionInfo("graft.functions", null, name), builder)

  /** (identifier, info, builder) for every graft SQL function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays") {
      args => CosineSim(args(0), args(1))
    },
    fn("dot_product", "dot_product(a, b) - dot product of two float/double arrays") {
      args => DotProduct(args(0), args(1))
    },
    fn("hyperplane_lsh", "hyperplane_lsh(vec, bits, salt) - random-hyperplane LSH signature") {
      args => HyperplaneLsh(args(0), intArg(args(1), "bits"), intArg(args(2), "salt").toLong)
    },
    fn("minhash_signature", "minhash_signature(set, k) - k-hash MinHash signature of a string array") {
      args => MinHashSignature(args(0), intArg(args(1), "k"))
    },
    fn("band_hashes", "band_hashes(sig, bands, rows) - LSH band hashes of a signature") {
      args => BandHashes(args(0), intArg(args(1), "bands"), intArg(args(2), "rows"))
    },
    fn("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array") {
      args => SimHash64(args(0))
    },
    fn("word_shingle_set", "word_shingle_set(text, n) - distinct word n-gram shingles") {
      args => WordShingleSet(args(0), intArg(args(1), "n"))
    },
    fn("rolling_hash", "rolling_hash(text) - polynomial rolling hash mod 1e9+7") {
      args => RollingHash(args(0))
    },
    fn("top_ngram_fraction",
      "top_ngram_fraction(text, n) - share of word n-gram occurrences held by the most frequent one") {
      args => TopNgramFraction(args(0), intArg(args(1), "n"))
    },
    fn("bitset_from_indices", "bitset_from_indices(ids, numWords) - pack int ids into a long[] mask") {
      args => BitsetFromIndices(args(0), intArg(args(1), "numWords"))
    },
    fn("bitset_intersect_count", "bitset_intersect_count(a, b) - popcount of the AND of two masks") {
      args => BitsetIntersectCount(args(0), args(1))
    },
    fn("map_sum", "map_sum(m) - aggregate: merge maps key-wise, summing collisions") {
      args => MapMergeAgg(args(0), MergeOp.Sum).toAggregateExpression()
    },
    fn("map_min", "map_min(m) - aggregate: merge maps key-wise, keeping minima") {
      args => MapMergeAgg(args(0), MergeOp.Min).toAggregateExpression()
    },
    fn("map_max", "map_max(m) - aggregate: merge maps key-wise, keeping maxima") {
      args => MapMergeAgg(args(0), MergeOp.Max).toAggregateExpression()
    },
    fn("concat_sorted", "concat_sorted(v) - aggregate: concatenation in sorted order") {
      args => ConcatSortedAgg(args(0)).toAggregateExpression()
    },
    fn("sketch_agg", "sketch_agg(k) - aggregate: serialized quantile sketch of a key column") {
      args => QuantileSketchAgg(args(0)).toAggregateExpression()
    },
    fn("word_ngrams", "word_ngrams(text, n) - every word n-gram occurrence (with repeats)") {
      args => WordNgrams(args(0), intArg(args(1), "n"))
    },
    fn("gram_buckets",
      "gram_buckets(text, n, buckets) - hashed word-n-gram feature buckets (DSIR feature map)") {
      args => GramBuckets(args(0), intArg(args(1), "n"), intArg(args(2), "buckets"))
    },
    fn("char_entropy", "char_entropy(text) - Shannon entropy of the byte distribution, bits/byte") {
      args => CharEntropy(args(0))
    },
    fn("deflate_ratio", "deflate_ratio(text) - Deflate compressed/raw byte ratio") {
      args => DeflateRatio(args(0))
    },
    fn("kmv_distinct", "kmv_distinct(k, cap) - aggregate: KMV distinct-count estimate") {
      args => KmvDistinctAgg(args(0),
        if (args.length > 1) intArg(args(1), "cap") else 4096).toAggregateExpression()
    },
    fn("kmv_sketch", "kmv_sketch(k, cap) - aggregate: serialized KMV sketch for set-op estimates") {
      args => KmvSketchAgg(args(0),
        if (args.length > 1) intArg(args(1), "cap") else 4096).toAggregateExpression()
    },
    fn("top_k",
      "top_k(score, id, k) - aggregate: per-group top-k (score desc, id asc) as structs") {
      args => TopKAgg(args(0), args(1), intArg(args(2), "k")).toAggregateExpression()
    },
    fn("heavy_hitters",
      "heavy_hitters(k, cap) - aggregate: Misra-Gries heavy hitters as (item, count) structs") {
      args => HeavyHittersAgg(args(0),
        if (args.length > 1) intArg(args(1), "cap") else 4096).toAggregateExpression()
    },
    fn("cms_sketch",
      "cms_sketch(k) - aggregate: serialized Count-Min sketch (exact below capacity)") {
      args => CmsSketchAgg(args(0), 4, 65536, 65536).toAggregateExpression()
    },
    fn("hll_distinct",
      "hll_distinct(k, p) - aggregate: HyperLogLog distinct estimate, 2^p registers") {
      args => HllDistinctAgg(args(0),
        if (args.length > 1) intArg(args(1), "p") else 14,
        emitSketch = false).toAggregateExpression()
    },
    fn("hll_sketch",
      "hll_sketch(k, p) - aggregate: serialized HyperLogLog registers for union estimates") {
      args => HllDistinctAgg(args(0),
        if (args.length > 1) intArg(args(1), "p") else 14,
        emitSketch = true).toAggregateExpression()
    },
    fn("sq8_encode", "sq8_encode(vec) - int8 scalar-quantized code vector (binary)") {
      args => Sq8Encode(args(0))
    },
    fn("sq8_scale", "sq8_scale(vec) - per-vector SQ8 dequantization scale") {
      args => Sq8Scale(args(0))
    },
    fn("sq8_dot", "sq8_dot(a, b) - exact integer dot product of two SQ8 code vectors") {
      args => Sq8Dot(args(0), args(1))
    },
    fn("bq_encode", "bq_encode(vec) - packed sign-bit code (binary, ceil(dim/8) bytes)") {
      args => BqEncode(args(0))
    },
    fn("bq_hamming", "bq_hamming(a, b) - Hamming distance between two sign-bit codes") {
      args => BqHamming(args(0), args(1))
    })

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.bridge.registerFunctions(spark, all)
}
