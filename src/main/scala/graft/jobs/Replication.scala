package graft.jobs

import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Continuous table→table replication, composed from the engine's own
  * primitives: the batch CDC feeds (`changesBetween` insert rows +
  * `deletedKeysBetween` delete keys, both tagged with their commit
  * version) applied to the replica as ONE atomic MERGE per cycle, with
  * the replica's idempotent txn watermark carrying the last replicated
  * SOURCE version — so a crash-replayed cycle is a recorded no-op and
  * the replica is exactly-once by construction (no external offset
  * store: the watermark commits atomically WITH the data).
  *
  * Cycle semantics:
  *  - first cycle (watermark 0) is a LOGICAL snapshot: `source.toDF` —
  *    aggregation applied, pending delete markers suppressed — so an
  *    order-sensitive (LWW) source replicates its resolved state, not
  *    its raw generations (whose per-file order a snapshot read cannot
  *    tag with versions);
  *  - incremental cycles walk the per-version manifests: puts and
  *    deletes are resolved PER KEY by commit version (a key deleted at
  *    v5 and re-ingested at v7 stays; ingested v5, deleted v7 goes) —
  *    the same shadowing rule the source's own LSM markers implement;
  *  - on an order-sensitive replica the window's puts collapse to each
  *    key's newest version (one merge = one write generation, so the
  *    order must fold in); commutative replicas keep every row (a sum
  *    replica re-accumulates exactly).
  *
  * At 100 TB a cycle costs O(changed files) metadata + a scan of only
  * the changed files + one merge write — never a re-read of the table.
  */
final class Replication(source: GraftTable, replica: GraftTable) {

  require(source.schema.rowKeyNames == replica.schema.rowKeyNames,
    "replication requires identical row keys")

  /** Watermark identity: one per (source dir, replica dir) pair. */
  val appId = s"replica:${source.dir}"

  def lastReplicatedVersion: Long =
    replica.store.lastTxnVersion(appId).getOrElse(0L)

  /** Replicate everything committed since the last cycle; returns the
    * number of source versions applied (0 = already caught up).
    */
  def runOnce(): Long = {
    val from = lastReplicatedVersion
    val to = source.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    if (to <= from) return 0L

    val keys = replica.schema.rowKeyNames
    val valueFields = replica.schema.values
    val lwwReplica = {
      val specs = graft.dsl.ConfigDsl.parseAggregation(
        replica.config.aggregationConfig, replica.schema)
      // a mixed config (e.g. last(a),sum(b)) cannot be replicated: the
      // window lands as ONE write generation, so keeping every row makes
      // the order-sensitive columns resolve arbitrarily among a key's
      // multiple source versions, while collapsing to the newest version
      // would under-accumulate the commutative columns — refuse rather
      // than silently diverge from the source
      require(specs.isEmpty || specs.forall(_.op == "last") ||
          !specs.exists(_.op == "last"),
        "cannot replicate to a table mixing order-sensitive (last) and " +
          s"commutative aggregation ops: '${replica.config.aggregationConfig}'")
      specs.nonEmpty && specs.forall(_.op == "last")
    }

    val cdc =
      if (from == 0L) {
        // initial load: the source's RESOLVED state, one put per key —
        // pinned to the captured version `to` (a commit landing between
        // the version capture and this read must NOT be in the snapshot,
        // or the next cycle's (to, to'] window would deliver it twice)
        GraftTable.loadAsOf(source.spark, source.dir, to).toDF
          .select((keys ++ valueFields.map(_.name)).map(col): _*)
          .withColumn("_op", lit("put"))
      } else {
        val puts = source.changesBetween(from, to)
        val dels = source.deletedKeysBetween(from, to)
        // append-only window (the common case): no delete markers were
        // committed, so skip the per-key delete-resolution shuffles
        // entirely — the emptiness probe reads only the window's (empty)
        // tombstone manifest list, not data
        val hasDeletes = !dels.isEmpty
        // order by (version, seq): a batched-committer version can carry
        // several logical commits; their within-version order rides in
        // the write-generation seq the manifest records
        val delMax =
          if (!hasDeletes) null
          else dels.groupBy(keys.map(col): _*)
            .agg(max(struct(col("_commit_version"), col("_commit_seq"))).as("__del"))
        // a put at the marker's own (version, seq) is pre-seq-manifest
        // history (unknown order: keep the put, the old contract); a
        // MERGE's put stamps one generation ABOVE its markers and a
        // batch's later commit a higher seq, so both resolve strictly
        val putsLive =
          if (!hasDeletes) puts
          else puts.join(delMax, keys, "left")
            .filter(col("__del").isNull ||
              struct(col("_commit_version"), col("_commit_seq")) >= col("__del"))
            .drop("__del")
        val putsFinal =
          if (!lwwReplica) putsLive
          else {
            // order-sensitive target: fold the window's order in — keep
            // each key's newest version (ties within one version follow
            // the LWW within-batch contract: at most one row per key
            // per source commit for determinism)
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(col): _*)
              .orderBy(col("_commit_version").desc)
            putsLive.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
          }
        val putsOnly = putsFinal
          .select((keys ++ valueFields.map(_.name)).map(col): _*)
          .withColumn("_op", lit("put"))
        if (!hasDeletes) putsOnly
        else {
          // ALWAYS emit the window's delete keys, even when a newer put
          // for the same key exists in the window: on a commutative
          // (e.g. sum) replica the delete must still clear contributions
          // replicated in EARLIER windows (source deleteKeys(K) then
          // re-ingest(K,5) in one window must leave the replica at 5,
          // not old+5). replica.merge stamps the tombstones one
          // generation below the same commit's puts, so the surviving
          // post-delete puts land above the marker and are kept.
          putsOnly.unionByName(delMax.select(
            (keys.map(col) ++
              valueFields.map(f => lit(null).cast(f.dataType).as(f.name)) :+
              lit("delete").as("_op")): _*))
        }
      }

    val (puts, tombs) = replica.merge(cdc, col("_op") === "delete",
      txn = Some((appId, to)))
    // a window of pure compactions/GC carries no rows: merge writes
    // nothing and therefore commits nothing — advance the watermark
    // with an empty (but watermarked) merge so the next cycle doesn't
    // re-walk the same versions
    if (puts.isEmpty && tombs.isEmpty)
      replica.store.commitMergeIfAbsent(appId, to, Nil, Nil)
    to - from
  }
}
