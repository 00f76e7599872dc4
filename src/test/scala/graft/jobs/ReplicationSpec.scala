package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** Table→table replication: initial logical snapshot, incremental
  * version windows with per-key put/delete resolution, exactly-once
  * via the replica's txn watermark.
  */
class ReplicationSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType, nullable = false)))

  private def tmp() = Files.createTempDirectory("graft-repl").toString

  private def lww(dir: String): GraftTable =
    GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))

  private def readMap(t: GraftTable): Map[Long, Long] =
    t.toDF.select("id", "v").as[(Long, Long)].collect().toMap

  test("LWW source replicates exactly: snapshot, increments, deletes, re-inserts") {
    val src = lww(tmp()); val dst = lww(tmp())
    src.ingest((0L until 60L).map(i => (i, i)).toDF("id", "v"))
    src.ingest((0L until 60L by 2).map(i => (i, i + 100L)).toDF("id", "v"))
    src.deleteKeys(Seq(5L, 6L).toDF("id"))

    val repl = new Replication(src, dst)
    assert(repl.runOnce() > 0)
    assert(readMap(dst) == readMap(src), "initial logical snapshot")
    assert(repl.runOnce() == 0L, "caught up: no-op cycle")

    // incremental window: update, delete, and delete-then-reinsert
    src.ingest(Seq((1L, 111L)).toDF("id", "v"))      // update
    src.deleteKeys(Seq(2L).toDF("id"))               // delete
    src.deleteKeys(Seq(3L).toDF("id"))               // delete...
    src.ingest(Seq((3L, 333L)).toDF("id", "v"))      // ...then re-insert
    assert(repl.runOnce() == 4L)
    assert(readMap(dst) == readMap(src), "incremental window")

    // the source compacts: dataChange=false outputs must not re-feed
    src.compactAll()
    assert(repl.runOnce() > 0L)
    assert(readMap(dst) == readMap(src), "post-compaction window is empty of rows")

    // a MERGE on the source replicates as its puts + deletes
    src.merge(Seq((7L, 777L, false), (8L, 0L, true)).toDF("id", "v", "del"), col("del"))
    assert(repl.runOnce() == 1L)
    assert(readMap(dst) == readMap(src), "merge window")
  }

  test("exactly-once: the watermark commits atomically with the merge") {
    val src = lww(tmp()); val dst = lww(tmp())
    src.ingest((0L until 10L).map(i => (i, 1L)).toDF("id", "v"))
    val repl = new Replication(src, dst)
    repl.runOnce()
    val v = repl.lastReplicatedVersion
    assert(v == src.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion)
    // a replayed cycle against the same window is a recorded no-op
    assert(repl.runOnce() == 0L)
    assert(dst.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion ==
      2L, "exactly one replica commit (create + merge)")
  }

  test("sum replica: delete-then-reinsert in one window clears prior contributions") {
    val mk = (d: String) => GraftTable.create(spark, d, schema,
      config = TableConfig(aggregationConfig = "sum(v)"))
    val src = mk(tmp()); val dst = mk(tmp())
    src.ingest((0L until 10L).map(i => (i, 10L)).toDF("id", "v"))
    val repl = new Replication(src, dst)
    repl.runOnce()
    // one window: delete key 3, then re-ingest it with 5 — the source
    // resolves to 5; the replica must NOT keep old+5 (the delete has to
    // clear the 10 replicated in the earlier window even though a newer
    // put exists in this window)
    src.deleteKeys(Seq(3L).toDF("id"))
    src.ingest(Seq((3L, 5L)).toDF("id", "v"))
    // and a plain delete with no re-insert
    src.deleteKeys(Seq(4L).toDF("id"))
    repl.runOnce()
    assert(readMap(src) == readMap(dst))
    assert(readMap(dst)(3L) == 5L)
    assert(!readMap(dst).contains(4L))
  }

  test("refuses a replica mixing order-sensitive and commutative agg ops") {
    val mixedSchema = GraftSchema(
      rowKeys = Seq(GraftField("id", LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("v", LongType, nullable = false),
        GraftField("n", LongType, nullable = false)))
    val src = GraftTable.create(spark, tmp(), mixedSchema,
      config = TableConfig(aggregationConfig = "last(v),sum(n)"))
    val dst = GraftTable.create(spark, tmp(), mixedSchema,
      config = TableConfig(aggregationConfig = "last(v),sum(n)"))
    src.ingest(Seq((1L, 1L, 1L)).toDF("id", "v", "n"))
    intercept[IllegalArgumentException] { new Replication(src, dst).runOnce() }
  }

  test("a batched-committer version replicates in within-version commit order") {
    val src = lww(tmp()); val dst = lww(tmp())
    src.ingest(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    new Replication(src, dst).runOnce()

    // three logical commits folded into ONE log version by the batched
    // committer: put k1=11, THEN delete k1, THEN put k2=22. Version-only
    // resolution would keep the k1 put (same version as its delete);
    // the manifest's per-commit seq must order them.
    val puts1 = new Ingest(src).run(Seq((1L, 11L)).toDF("id", "v"), commit = false)
    val dels = Tombstones.write(src, Seq(1L).toDF("id"), commit = false)
    val puts2 = new Ingest(src).run(Seq((2L, 22L)).toDF("id", "v"), commit = false)
    val out = src.store.asInstanceOf[graft.meta.InMemoryStateStore].commitValidated(Seq(
      graft.meta.StateTransaction.AddFiles(puts1.toVector),
      graft.meta.StateTransaction.AddTombstones(dels.toVector),
      graft.meta.StateTransaction.AddFiles(puts2.toVector)))
    assert(out.forall(_ == graft.meta.CommitOutcome.Committed))
    assert(readMap(src) == Map(2L -> 22L), "source resolves the batch by generation")

    assert(new Replication(src, dst).runOnce() == 1L)
    assert(readMap(dst) == Map(2L -> 22L), "replica applies within-version order")
  }

  test("commutative (sum) replica re-accumulates every window row") {
    val mk = (d: String) => GraftTable.create(spark, d, schema,
      config = TableConfig(aggregationConfig = "sum(v)"))
    val src = mk(tmp()); val dst = mk(tmp())
    src.ingest((0L until 10L).map(i => (i, 1L)).toDF("id", "v"))
    val repl = new Replication(src, dst)
    repl.runOnce()
    src.ingest((0L until 10L).map(i => (i, 2L)).toDF("id", "v"))
    src.ingest((0L until 10L).map(i => (i, 3L)).toDF("id", "v"))
    repl.runOnce()
    assert(readMap(dst) == (0L until 10L).map(i => i -> 6L).toMap)
    assert(readMap(dst) == readMap(src))
  }
}
