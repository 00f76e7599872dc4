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
}
