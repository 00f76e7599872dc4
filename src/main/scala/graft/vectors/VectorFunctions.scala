package graft.vectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]) — the ANN
  * toolkit of a training-data pipeline. Baseline is exact brute-force
  * cosine top-k; the scale path is random-hyperplane LSH bucketing so
  * only same-bucket pairs are scored. Dot products and norms are
  * zip_with/aggregate higher-order expressions — whole-stage codegen,
  * no UDFs.
  */
object VectorFunctions {

  /** Cast a float vector to double (all arithmetic in double). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest neighbours of `queryVec` (a double array
    * column from a one-row DataFrame, broadcast) by cosine.
    */
  def knnBrute(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    v.crossJoin(broadcast(query.select(toDouble(col(queryVecCol)).as("q"))))
      .select(col("id"), cosine(col("v"), col("q")).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a
    * long. Hyperplane components are deterministic pseudo-randoms derived
    * from xxhash64(table, plane, dim) — no driver-side state to
    * broadcast.
    */
  def lshSignature(vec: Column, bits: Int, dims: Int): Column =
    lshSignatureSalted(vec, bits, dims, lit(0))

  def lshSignatureSalted(vec: Column, bits: Int, dims: Int, salt: Column): Column = {
    val planes = sequence(lit(0), lit(bits - 1))
    aggregate(
      transform(planes, p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), lit(dims - 1)),
            (x, d) => x * (pmod(xxhash64(salt, p, d), lit(2001L)).cast("double") - 1000.0)),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Approximate top-k: bucket by LSH signature over `tables`
    * independent hash tables (different bit offsets), score only
    * candidates sharing a bucket with the query, exact-rescore, top-k.
    * Recall/cost is tuned by (bits, tables).
    */
  def knnLsh(vectors: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      bits: Int = 12, tables: Int = 4, dims: Int = 64): DataFrame = {
    def sigs(df: DataFrame, vc: String, out: String): DataFrame =
      df.withColumn(out,
        transform(sequence(lit(0), lit(tables - 1)),
          // per-table variation: extra table-index salt into the bucket hash
          t => xxhash64(t, lshSignatureSalted(col(vc), bits, dims, t))))
    val v = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val vs = sigs(v, "v", "sig").select(col("id"), col("v"), posexplode(col("sig")).as(Seq("t", "s")))
    val q = sigs(query.select(toDouble(col(queryVecCol)).as("q")), "q", "sig")
      .select(col("q"), posexplode(col("sig")).as(Seq("t", "s")))
    vs.join(broadcast(q), Seq("t", "s"))
      .select(col("id"), col("v"), col("q")).distinct()
      .select(col("id"), cosine(col("v"), col("q")).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Exact all-pairs with cosine >= threshold (embedding near-dup).
    * Brute self-join baseline; at scale, swap the join condition for an
    * LSH-bucket equality like `simhashPairs` (same shape).
    */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
