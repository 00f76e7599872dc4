package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted mixture sampling: cut each domain of a corpus
  * down to a per-domain TOKEN budget, the way training-data pipelines
  * blend sources to a target mixture (reference scope: the engine's
  * deterministic-sampling family, alongside the rate-based domain mix;
  * the budgeted form is what a "sample source X down to N tokens" recipe
  * actually needs).
  *
  * Selection is a pure function of (id, domain): docs are ordered inside
  * their domain by a SQL-replayable multiplicative hash of the id, and
  * kept while the running token total stays within the domain's budget —
  * so the sample is reproducible on any cluster at any partitioning, and
  * an oracle can replay it with one window function.
  *
  * The naive plan — `SUM(tokens) OVER (PARTITION BY domain ORDER BY
  * hash)` — funnels EVERY doc of a domain through one reducer for the
  * sort; a popular domain at 100 TB is billions of rows. This
  * implementation is exact but two-phase instead: (1) aggregate token
  * sums per (domain, hash-bucket) — a map-side-combined hash agg,
  * O(domains × buckets) rows to the driver; (2) from the per-domain
  * bucket prefix sums, buckets strictly below the cutoff are kept
  * wholesale with NO sort anywhere, and only the single boundary bucket
  * (≈ 1/15000th of the domain) pays a window, partitioned by (domain,
  * bucket) so its sort is tiny and parallel. Identical output to the
  * naive window, since the global running total of a boundary doc is
  * prefix(full buckets) + running-within-bucket.
  */
object MixtureSampling {

  /** Multiplier/modulus of the order hash: `(id * Prime) % Mod` is
    * overflow-free in 64-bit for ids up to ~3.4e9 and replays exactly in
    * any SQL engine (no engine-specific hash builtin).
    */
  val OrderPrime = 2654435761L
  val OrderMod = 1000000007L

  /** Hash-bucket width: ~15k buckets over the hash range keeps the
    * driver histogram O(domains × 15k) while the boundary bucket — the
    * only part that sorts — is a ~1/15000 sliver of its domain.
    */
  val BucketWidth = 65536L

  /** The hash-order position of an id within its domain. */
  def orderHash(id: Column): Column = pmod(id * lit(OrderPrime), lit(OrderMod))

  /** Deterministic epoch-based UPsampling — the temperature-mixing
    * complement of the t11 rate gate (which only drops): `ratePct` is
    * epochs ×100 (250 = 2.5 epochs), every doc gets ⌊rate/100⌋ full
    * copies plus one more iff its text-hash percentile falls under
    * rate mod 100 — so a domain's expected multiplicity is exactly
    * rate/100, each copy is tagged with its 1-based `epoch`, and the
    * blend is a pure function of (text, rate): reproducible on any
    * cluster, no RNG. Docs whose copies round to zero vanish. The
    * explode is map-side (no shuffle); downstream shuffling/sharding
    * is [[graft.text.ShuffleShard]]'s job.
    */
  def upsampleEpochs(docs: DataFrame, textCol: String, ratePct: Column): DataFrame = {
    import graft.functions.RollingHash.rolling_hash
    val whole = floor(ratePct / 100).cast("long")
    val extra = (pmod(rolling_hash(col(textCol)), lit(100)) < pmod(ratePct, lit(100)))
      .cast("long")
    docs.withColumn("__copies", whole + extra)
      .filter(col("__copies") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Keep each domain's docs (in deterministic hash order) while the
    * running `tokens` total stays within `budgets(domain)`; domains
    * absent from `budgets` are dropped. `tokens` is any integral token
    * count expression over the row (e.g. whitespace tokens, BPE count).
    */
  def sampleToBudget(docs: DataFrame, idCol: String, domainCol: String,
      tokens: Column, budgets: Map[String, Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val h = orderHash(col(idCol))
    val base = docs
      .withColumn("__ntok", tokens.cast("long"))
      .withColumn("__h", h)
      .withColumn("__b", floor(col("__h") / lit(BucketWidth.toDouble)).cast("long"))

    // Phase 1: per-(domain, bucket) token sums — small enough to prefix
    // on the driver (domains × ≤15k rows), no sort of the corpus.
    val hist = base.groupBy(col(domainCol).as("__dom"), col("__b"))
      .agg(sum(col("__ntok")).as("__btok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // cutoff(bucket, remaining) per domain: buckets < cutoff are wholly
    // in; the cutoff bucket gets `remaining` tokens; buckets above are
    // wholly out. A domain whose total fits its budget keeps everything
    // (cutoff past the last bucket).
    val cuts = hist.groupBy(_._1).flatMap { case (dom, rows) =>
      budgets.get(dom).map { budget =>
        var prefix = 0L
        var cut = Long.MaxValue
        var rem = 0L
        rows.sortBy(_._2).foreach { case (_, b, btok) =>
          if (cut == Long.MaxValue) {
            if (prefix + btok > budget) { cut = b; rem = budget - prefix }
            else prefix += btok
          }
        }
        (dom, cut, rem)
      }
    }.toSeq

    if (cuts.isEmpty) return base.filter(lit(false))
      .select(col(idCol), col(domainCol), col("__ntok").as("tokens"))

    val cutDf = broadcast(cuts.toDF("__dom", "__cut", "__rem"))
    val joined = base.join(cutDf, col(domainCol) === col("__dom"))
    val fullyIn = joined.filter(col("__b") < col("__cut"))
    // Phase 2: ONLY the boundary bucket sorts, inside its own tiny
    // (domain, bucket) window partition.
    val wb = Window.partitionBy(col("__dom"), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("__b") === col("__cut"))
      .withColumn("__cum", sum(col("__ntok")).over(wb))
      .filter(col("__cum") <= col("__rem"))
      .drop("__cum")
    fullyIn.unionByName(boundary)
      .select(col(idCol), col(domainCol), col("__ntok").as("tokens"))
  }

  /** Budgets from mixture weights over a total token target:
    * `budget(d) = floor(weight(d) / Σweights × totalTokens)`.
    */
  def sampleToMixture(docs: DataFrame, idCol: String, domainCol: String,
      tokens: Column, weights: Map[String, Double], totalTokens: Long): DataFrame = {
    val wSum = weights.values.sum
    require(wSum > 0, "weights must sum to a positive value")
    val budgets = weights.map { case (d, w) => d -> (w / wSum * totalTokens).toLong }
    sampleToBudget(docs, idCol, domainCol, tokens, budgets)
  }
}
