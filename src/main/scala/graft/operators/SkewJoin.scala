package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: identical results to
  * `fact.join(dim, factKey === dimKey)`, but a hot key's rows spread
  * across `salts` reducers instead of piling onto one.
  *
  * The fact side gets a deterministic salt in [0, salts) hashed from a
  * per-row unique column (NOT the join key — the whole point is that
  * rows sharing a hot key land on different salts); the dim side
  * replicates `salts` ways; the join key becomes (key, salt). Dim
  * replication costs `salts ×` its size — use for genuinely small-ish
  * dims with a fact too skewed for a plain shuffle join.
  *
  * AQE's skew-join split covers most of this automatically for
  * shuffle-stage inputs; explicit salting remains the tool when the
  * skewed aggregation/join feeds FROM a source AQE can't re-split, when
  * a deterministic plan is required, or on engines/configs without AQE.
  * Keeping it as a first-class operator also documents the pattern the
  * rest of the engine reaches for when a key's row count dwarfs a
  * partition.
  */
object SkewJoin {

  def salted(
      fact: DataFrame,
      dim: DataFrame,
      joinExpr: (DataFrame, DataFrame) => Column,
      saltFrom: Column,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        joinExpr(saltedFact, saltedDim) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Hot-head/tail split INNER equi-join against a ONE-ROW-PER-KEY dim
    * (a count/model table): identical results to `fact.join(dim, key)`,
    * but the `hotKeys` dim rows ranked highest by `hotBy` resolve via
    * broadcast on the map side, so a Zipf-skewed fact ("of the"-style
    * hot keys carrying billions of rows) never funnels a hot key
    * through one reducer; only tail keys — bounded per-reducer by
    * construction — take the shuffled join. The right tool when
    * salting would replicate a LARGE dim `salts`× for no reason: the
    * head of a Zipf distribution is small by definition, so broadcasting
    * it is cheap and exact.
    *
    * Ties at the head cutoff may land on either side; both sides
    * resolve the identical dim row, so results never depend on the
    * split.
    *
    * Costs and contract: the fact subtree appears in BOTH branches of
    * the union (hit filter, miss filter) — at scale that is two
    * embarrassingly-parallel map passes over the fact in exchange for
    * never stalling a reducer on a hot key, the right trade for a
    * Zipf head; callers whose fact is expensive to recompute should
    * persist it first. The fact must be DETERMINISTIC (or persisted):
    * a nondeterministic upstream evaluated once per branch could route
    * a row into neither or both branches (the round-5 double-evaluation
    * lesson). The dim must be DETERMINISTIC (or persisted) for the same
    * reason: it is evaluated in both the orderBy/limit head and the
    * full tail join, so a nondeterministic dim could place a key in the
    * broadcast head on one evaluation yet match it again (or not at
    * all) in the tail, duplicating or dropping rows.
    */
  def hotSplit(fact: DataFrame, dim: DataFrame, key: String,
      hotBy: Column, hotKeys: Int = 65536): DataFrame = {
    require(hotKeys >= 0, "hotKeys must be >= 0")
    if (hotKeys == 0) return fact.join(dim, Seq(key))
    splitOn(fact, dim, key, dim.orderBy(hotBy.desc).limit(hotKeys))
  }

  /** The head keys a one-pass Misra-Gries profile of the FACT's key
    * column elects — the sketch side of [[hotSplitProfiled]], exposed so
    * callers (and the spec) can inspect the decision. One map-side pass
    * over the fact; partials merge in O(capacity); the result is a
    * bounded O(hotKeys) driver list, which is the point: the plan
    * DECISION is driver-side and stable, the data never is. The MG
    * guarantee makes the election safe: every key with frequency >
    * |fact|/capacity is retained, so with capacity comfortably above
    * hotKeys the true Zipf head cannot be missed.
    */
  def profileHeadKeys(fact: DataFrame, key: String, hotKeys: Int,
      capacity: Int = 8192): Seq[Any] = {
    import graft.functions.FrequencySketches.heavy_hitters
    fact.select(col(key))
      .agg(heavy_hitters(col(key), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as(key), col("e.count").as("__cnt"))
      .orderBy(col("__cnt").desc, col(key))
      .limit(hotKeys)
      .collect().map(_.get(0)).toSeq // bounded by hotKeys — the plan input
  }

  /** [[hotSplit]] with the head ELECTED BY A SKETCH: a one-pass
    * Misra-Gries heavy-hitters profile of the fact's key column
    * ([[profileHeadKeys]]) decides which dim rows broadcast, instead of
    * an exact `orderBy(count).limit` TopN over the dim. Two reasons
    * this is the 100-TB default: the profile measures the skew where it
    * LIVES (the fact — a dim-side count column is a proxy that may not
    * exist), and it costs one map-side pass with O(capacity) partials
    * against the dim TopN's full sort. The elected keys land in the
    * plan as a LITERAL local relation, so both union branches see the
    * identical head by construction — no double-evaluation hazard even
    * though MG partial merge order is not deterministic.
    *
    * Results are identical to `fact.join(dim, key)` for ANY elected
    * head (the split is correctness-neutral; the head only decides
    * which keys avoid the shuffle), spec'd equal to the exact-count
    * decision in OperatorsSpec.
    */
  def hotSplitProfiled(fact: DataFrame, dim: DataFrame, key: String,
      hotKeys: Int = 1024, capacity: Int = 8192): DataFrame = {
    require(hotKeys >= 0, "hotKeys must be >= 0")
    if (hotKeys == 0) return fact.join(dim, Seq(key))
    val spark = fact.sparkSession
    val elected = profileHeadKeys(fact, key, hotKeys, capacity)
    if (elected.isEmpty) return fact.join(dim, Seq(key))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(key, fact.schema(key).dataType)))
    val headKeys = spark.createDataFrame(
      java.util.Arrays.asList(elected.map(v =>
        org.apache.spark.sql.Row(v)): _*), schema)
    splitOn(fact, dim, key, dim.join(broadcast(headKeys), Seq(key)))
  }

  /** Shared split body: `hot` must be a subset of `dim`'s rows (same
    * columns, one row per key). The left join flags fact rows whose key
    * is in the head; hits already carry their dim row, misses — by
    * definition not in the head — take the shuffled join against the
    * full dim.
    */
  private def splitOn(fact: DataFrame, dim: DataFrame, key: String,
      hot: DataFrame): DataFrame = {
    val flagged = hot.withColumn("__hot", lit(true))
    val withHot = fact.join(broadcast(flagged), Seq(key), "left")
    val dimCols = dim.columns.filterNot(_ == key)
    val hit = withHot.filter(col("__hot") === true).drop("__hot")
    val miss = withHot.filter(col("__hot").isNull).drop(dimCols :+ "__hot": _*)
    hit.unionByName(miss.join(dim, Seq(key)))
  }
}
