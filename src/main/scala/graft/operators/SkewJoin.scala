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
    val hot = dim.orderBy(hotBy.desc).limit(hotKeys).withColumn("__hot", lit(true))
    val withHot = fact.join(broadcast(hot), Seq(key), "left")
    val dimCols = dim.columns.filterNot(_ == key)
    val hit = withHot.filter(col("__hot") === true).drop("__hot")
    // a miss key is by definition not in the head, so the tail join
    // against the FULL dim matches exactly the tail rows
    val miss = withHot.filter(col("__hot").isNull).drop(dimCols :+ "__hot": _*)
    hit.unionByName(miss.join(dim, Seq(key)))
  }
}
