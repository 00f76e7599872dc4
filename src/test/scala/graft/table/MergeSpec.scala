package graft.table

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** MERGE INTO: one atomic commit carrying new data files (puts) and
  * row-key delete markers, with the markers stamped one generation
  * below the puts. Semantics on a last-write-wins table = Delta/Iceberg
  * MERGE (update matched, insert unmatched, delete marked).
  */
class MergeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("id", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType, nullable = false)))

  private def tmp() = Files.createTempDirectory("graft-merge").toString

  private def lwwTable(dir: String): GraftTable =
    GraftTable.create(spark, dir, schema, splitPoints = Seq(50L),
      config = TableConfig(aggregationConfig = "last(v)"))

  private def readBoth(table: GraftTable, dir: String): (Map[Long, Long], Map[Long, Long]) = {
    val q = table.toDF.select("id", "v").as[(Long, Long)].collect().toMap
    val d = spark.read.format("graft").load(dir)
      .select("id", "v").as[(Long, Long)].collect().toMap
    (q, d)
  }

  test("merge updates matched, inserts unmatched, deletes marked — in ONE version") {
    val dir = tmp()
    val table = lwwTable(dir)
    table.ingest((0L until 100L).map(i => (i, i)).toDF("id", "v"))
    val v0 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion

    // CDC-shaped source with an extra _op column outside the schema:
    // update 10..19 (matched), insert 100..109 (unmatched), delete 0..9
    val source =
      ((10L until 20L).map(i => (i, i + 1000L, "put")) ++
        (100L until 110L).map(i => (i, i + 1000L, "put")) ++
        (0L until 10L).map(i => (i, 0L, "delete"))).toDF("id", "v", "_op")
    val (puts, tombs) = table.merge(source, col("_op") === "delete")
    assert(puts.nonEmpty && tombs.nonEmpty)

    // atomicity: exactly ONE new state-store version
    assert(table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion == v0 + 1)
    // generation order: markers one below the data
    assert(tombs.map(_.seq).toSet.size <= 1 && puts.map(_.seq).toSet.size <= 1)
    assert(table.store.tombstones.head.seq + 1 ==
      table.store.fileReferences.map(_.seq).max)

    val expect = (10L until 100L).map(i => i -> (if (i < 20L) i + 1000L else i)).toMap ++
      (100L until 110L).map(i => i -> (i + 1000L)).toMap
    val (q, d) = readBoth(table, dir)
    assert(q == expect, "query path")
    assert(d == expect, "DSv2 merge path")

    table.compactAll()
    assert(table.store.tombstones.isEmpty)
    val (q2, d2) = readBoth(table, dir)
    assert(q2 == expect && d2 == expect, "post-compaction")
  }

  test("a key both deleted and put in one merge resolves to the put") {
    val dir = tmp()
    val table = lwwTable(dir)
    table.ingest(Seq((1L, 1L), (2L, 2L)).toDF("id", "v"))
    val source = Seq((1L, 0L, true), (1L, 11L, false)).toDF("id", "v", "del")
    table.merge(source, col("del"))
    val (q, d) = readBoth(table, dir)
    assert(q == Map(1L -> 11L, 2L -> 2L) && q == d)
    table.compactAll()
    assert(readBoth(table, dir)._1 == Map(1L -> 11L, 2L -> 2L))
  }

  test("merge survives reload; a later merge re-inserts a merged delete") {
    val dir = tmp()
    val t0 = lwwTable(dir)
    t0.ingest((0L until 10L).map(i => (i, 1L)).toDF("id", "v"))
    t0.merge(Seq((3L, 0L, true)).toDF("id", "v", "del"), col("del"))

    val t1 = GraftTable.load(spark, dir)
    assert(t1.toDF.select("id").as[Long].collect().toSet == (0L until 10L).toSet - 3L)
    // the next merge's puts outrank the pending marker (LSM shadowing)
    t1.merge(Seq((3L, 33L, false)).toDF("id", "v", "del"), col("del"))
    val (q, d) = readBoth(t1, dir)
    assert(q(3L) == 33L && q == d)
    t1.compactAll()
    assert(readBoth(t1, dir)._1(3L) == 33L)
  }

  test("null deleteWhen is treated as false; delete-only and put-only merges commit") {
    val dir = tmp()
    val table = lwwTable(dir)
    table.ingest(Seq((1L, 1L), (2L, 2L)).toDF("id", "v"))
    // null marker => put
    table.merge(Seq((1L, 10L, null.asInstanceOf[java.lang.Boolean]))
      .toDF("id", "v", "del"), col("del"))
    assert(readBoth(table, dir)._1(1L) == 10L)
    // delete-only
    val (p1, t1) = table.merge(Seq((2L, 0L, true)).toDF("id", "v", "del"), col("del"))
    assert(p1.isEmpty && t1.nonEmpty)
    // put-only
    val (p2, t2) = table.merge(Seq((5L, 5L, false)).toDF("id", "v", "del"), col("del"))
    assert(p2.nonEmpty && t2.isEmpty)
    assert(readBoth(table, dir)._1 == Map(1L -> 10L, 5L -> 5L))
  }

  test("the CDC feed reports a merge version's puts AND delete markers") {
    val dir = tmp()
    val table = lwwTable(dir)
    table.ingest((0L until 10L).map(i => (i, 1L)).toDF("id", "v"))
    val v0 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    table.merge(
      Seq((3L, 0L, true), (5L, 55L, false), (100L, 100L, false)).toDF("id", "v", "del"),
      col("del"))
    val v1 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion

    val ins = table.changesBetween(v0, v1).select("id", "v").as[(Long, Long)].collect().toMap
    assert(ins == Map(5L -> 55L, 100L -> 100L), "insert feed must carry the merge's puts")
    val dels = table.deletedKeysBetween(v0, v1).select("id").as[Long].collect().toSet
    assert(dels == Set(3L), "delete feed must carry the merge's markers")
  }

  test("streaming CDC apply: micro-batches land as atomic merges, exactly once") {
    val dir = tmp()
    val table = lwwTable(dir)
    val inbox = Files.createTempDirectory("graft-cdc-inbox").toString
    val cp = Files.createTempDirectory("graft-cdc-cp").toString
    val apply = new graft.streaming.StreamingMerge(table, inbox, cp)

    def drop(name: String, batch: org.apache.spark.sql.DataFrame): Unit = {
      val stage = Files.createTempDirectory("graft-cdc-stage")
      batch.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val it = Files.list(stage).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet")) part = p
      }
      Files.move(part, java.nio.file.Paths.get(inbox, name))
    }

    drop("b1.parquet",
      (0L until 10L).map(i => (i, i, "put")).toDF("id", "v", "_op"))
    assert(apply.runOnce() == 1)
    drop("b2.parquet",
      Seq((3L, 0L, "delete"), (5L, 55L, "put"), (20L, 20L, "put"))
        .toDF("id", "v", "_op"))
    val v1 = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    assert(apply.runOnce() == 1)
    // the CDC batch is ONE atomic version
    assert(table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion == v1 + 1)

    val expect = ((0L until 10L).toSet - 3L).map(i => i -> (if (i == 5L) 55L else i)).toMap +
      (20L -> 20L)
    val (q, d) = readBoth(table, dir)
    assert(q == expect && d == expect)

    // nothing pending => no further cycle; state unchanged
    assert(apply.runOnce() == 0)
    assert(readBoth(table, dir)._1 == expect)
    table.compactAll()
    assert(readBoth(table, dir)._1 == expect, "post-compaction convergence")
  }

  test("concurrent merges on one table all land; generations stay distinct") {
    val dir = tmp()
    val table = lwwTable(dir)
    table.ingest((0L until 40L).map(i => (i, 0L)).toDF("id", "v"))
    // 4 writers, disjoint key slices, each an upsert + a delete — the
    // store's CAS retry must serialize the Merge commits like any other
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            // each writer needs its own store handle: one store instance
            // serializes its own commits under `synchronized` anyway
            val t = GraftTable.load(spark, dir)
            val base = w * 10L
            val src = ((base until base + 9).map(i => (i, i + 100L, false)) :+
              ((base + 9, 0L, true): (Long, Long, Boolean))).toDF("id", "v", "del")
            t.merge(src, col("del"))
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()

    val fresh = GraftTable.load(spark, dir)
    val expect = (0L until 40L).filterNot(_ % 10 == 9L)
      .map(i => i -> (if (i % 10 == 9) 0L else i + 100L)).toMap
    assert(fresh.toDF.select("id", "v").as[(Long, Long)].collect().toMap == expect)
    // every writer got its own pair of generations (marker below puts)
    assert(fresh.store.fileReferences.map(_.seq).distinct.size >= 4)
    fresh.compactAll()
    assert(fresh.toDF.select("id", "v").as[(Long, Long)].collect().toMap == expect)
  }

  test("merge on a sum-aggregated table combines puts per the agg config") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(aggregationConfig = "sum(v)"))
    table.ingest(Seq((1L, 1L), (2L, 2L)).toDF("id", "v"))
    table.merge(Seq((1L, 10L, false), (2L, 0L, true)).toDF("id", "v", "del"), col("del"))
    val rows = table.toDF.select("id", "v").as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 11L))
  }
}
