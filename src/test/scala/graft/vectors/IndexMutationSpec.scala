package graft.vectors

import java.nio.file.Files
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{GraftField, GraftSchema}
import graft.table.GraftTable

/** DELETE/UPSERT consistency of the persisted ANN indexes: logical
  * tombstones shadow served entries immediately, appends after deletes
  * are upserts, vacuum preserves serve results while reclaiming dead
  * rows, and syncIndexWithTable keeps an index consistent with its base
  * table through the CDC feeds — the gap where a deleted base row kept
  * serving from a stale index.
  */
class IndexMutationSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new Random(seed)
    (0L until n).map(id => id -> Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** Exact brute-force ids for a query over a corpus DataFrame. */
  private def bruteIds(corpus: org.apache.spark.sql.DataFrame,
      query: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    VectorFunctions.knnBrute(corpus, "vec_id", "embedding", query, "embedding", k)
      .select("id").as[Long].collect().toSeq

  test("deleteFromIndex shadows served ids; append-after-delete is an upsert; vacuum preserves") {
    val dim = 16
    val all = vecs(200, dim, seed = 11)
    val df = all.toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-ivf-del").toString
    VectorFunctions.buildIvfIndex(df, "vec_id", "embedding", idx, nCentroids = 4)
    val query = Seq(9999L -> all(5)._2).toDF("vec_id", "embedding")

    // nprobe = nCentroids → exhaustive → results are EXACT, so equality
    // with brute force over the live set is deterministic
    def served(): Seq[Long] =
      VectorFunctions.knnIvfIndex(spark, idx, query, "embedding", k = 10, nprobe = 4)
        .select("id").as[Long].collect().toSeq

    val full = bruteIds(df, query, 10)
    assert(served() == full)

    // delete the top-3 served ids: they must vanish IMMEDIATELY
    val dead = full.take(3)
    VectorFunctions.deleteFromIndex(dead.toDF("vec_id"), "vec_id", idx)
    val live = df.filter(!$"vec_id".isin(dead: _*))
    assert(served() == bruteIds(live, query, 10),
      "deleted ids must stop serving without a rewrite")

    // upsert: re-add one dead id with a DIFFERENT vector (the query's
    // own vector → it becomes the top hit); exactly one copy serves
    val back = dead.head
    VectorFunctions.appendToIvfIndex(
      Seq(back -> all(5)._2).toDF("vec_id", "embedding"), "vec_id", "embedding", idx)
    val after = served()
    assert(after.head == back, s"upserted id must serve its NEW vector, got $after")
    assert(after.count(_ == back) == 1, "an upsert must serve exactly one copy")

    // vacuum: physical rewrite changes nothing observable, dead rows gone
    val liveCount = VectorFunctions.vacuumIndex(spark, idx)
    assert(liveCount == 200 - 3 + 1)
    assert(served() == after, "vacuum must not change serve results")
    // the tombstones are RETIRED from the served generation (the meta
    // records zero and the new generation has no deletes sidecar); the
    // old generation's sidecar may remain on disk as the grace copy for
    // in-flight serves until the next vacuum reclaims it
    val meta = VectorFunctions.readIndexMeta(idx)
    assert(meta.tombstoneRows == 0L, "vacuum must record zero tombstones")
    assert(meta.listsVersion == 1L, "vacuum must flip the generation pointer")
    assert(!graft.meta.GraftFS.exists(s"$idx/deletes.v1"),
      "the served generation must carry no tombstone sidecar")
  }

  test("IVF-PQ serve excludes deleted ids too") {
    val dim = 16
    val all = vecs(150, dim, seed = 23)
    val df = all.toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-ivfpq-del").toString
    VectorFunctions.buildIvfPqIndex(df, "vec_id", "embedding", idx,
      nCentroids = 4, m = 8, ksub = 16)
    val query = Seq(9999L -> all(7)._2).toDF("vec_id", "embedding")
    def served(): Seq[Long] =
      VectorFunctions.knnIvfPqIndex(spark, idx, query, "embedding",
        k = 5, nprobe = 4, rerank = 150).select("id").as[Long].collect().toSeq
    // rerank = corpus → the exact-rescore phase sees every candidate,
    // so top-5 equals brute force and the delete check is deterministic
    val full = bruteIds(df, query, 5)
    assert(served() == full)
    VectorFunctions.deleteFromIndex(full.take(2).toDF("vec_id"), "vec_id", idx)
    val live = df.filter(!$"vec_id".isin(full.take(2): _*))
    assert(served() == bruteIds(live, query, 5))
  }

  test("a sync interrupted between shadow and append converges on re-run") {
    val dim = 16
    val all = vecs(100, dim, seed = 43)
    val dir = Files.createTempDirectory("graft-ivf-crash-tbl").toString
    val idx = Files.createTempDirectory("graft-ivf-crash-idx").toString
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("vec_id", org.apache.spark.sql.types.LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val table = GraftTable.create(spark, dir, schema)
    table.ingest(all.toDF("vec_id", "embedding"))
    VectorFunctions.buildIvfIndexFromTable(table, "vec_id", "embedding", idx,
      nCentroids = 4)
    // upsert ids 0..9 in the TABLE (negated vectors)
    val upserts = all.take(10).map { case (id, v) => id -> v.map(x => -x) }
    table.ingest(upserts.toDF("vec_id", "embedding"))
    // a crashed first sync: the shadow landed, the append (and the
    // meta update) did not — the worst-case window, where the index
    // serves NEITHER copy of the touched ids
    VectorFunctions.deleteFromIndex(
      upserts.map(_._1).toDF("vec_id"), "vec_id", idx)
    // re-run from the stale synced version: re-shadows and appends at
    // higher seqs — exactly one live copy, the table's current state
    VectorFunctions.syncIndexWithTable(table, "vec_id", "embedding", idx)
    val expect = (upserts ++ all.drop(10)).toDF("vec_id", "embedding")
    val query = Seq(9999L -> all(1)._2).toDF("vec_id", "embedding")
    val served = VectorFunctions.knnIvfIndex(spark, idx, query, "embedding",
      k = 10, nprobe = 4).select("id").as[Long].collect().toSeq
    assert(served == bruteIds(expect, query, 10),
      "re-run after a partial sync must converge to the table state")
  }

  test("streaming sink keeps a persisted index fresh via the syncIndex option") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = 16
    val all = vecs(120, dim, seed = 51)
    val dir = Files.createTempDirectory("graft-ivf-stream-tbl").toString
    val idx = Files.createTempDirectory("graft-ivf-stream-idx").toString
    val cp = Files.createTempDirectory("graft-ivf-stream-cp").toString
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("vec_id", org.apache.spark.sql.types.LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val table = GraftTable.create(spark, dir, schema)
    table.ingest(all.take(60).toDF("vec_id", "embedding"))
    VectorFunctions.buildIvfIndexFromTable(table, "vec_id", "embedding", idx,
      nCentroids = 4)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", cp)
      .option("syncIndex", idx)
      .option("syncIndexEvery", "1")
      .outputMode("append")
      .start()
    val query = Seq(9999L -> all(3)._2).toDF("vec_id", "embedding")
    def served(k: Int): Seq[Long] =
      VectorFunctions.knnIvfIndex(spark, idx, query, "embedding", k, nprobe = 4)
        .select("id").as[Long].collect().toSeq
    try {
      // first micro-batch: the sink's post-commit sync absorbs it
      mem.addData(all.slice(60, 90): _*)
      q.processAllAvailable()
      assert(served(8) == bruteIds(all.take(90).toDF("vec_id", "embedding"), query, 8),
        "streamed rows must serve from the index after the epoch's sync")
      // an out-of-band DELETE lands between epochs; the next epoch's
      // sync reads the whole unsynced version window, so it carries
      // BOTH the delete and the new rows
      val dead = served(3)
      GraftTable.load(spark, dir).deleteKeys(dead.toDF("vec_id"))
      mem.addData(all.slice(90, 120): _*)
      q.processAllAvailable()
      val expect = all.take(120).filterNot(t => dead.contains(t._1))
      assert(served(8) == bruteIds(expect.toDF("vec_id", "embedding"), query, 8),
        "the epoch sync must absorb interleaved deletes and the new rows")
    } finally q.stop()
  }

  test("syncIndexWithTable reconciles appends, upserts, and deletes via the CDC feeds") {
    val dim = 16
    val all = vecs(240, dim, seed = 37)
    val dir = Files.createTempDirectory("graft-ivf-sync-tbl").toString
    val idx = Files.createTempDirectory("graft-ivf-sync-idx").toString
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("vec_id", org.apache.spark.sql.types.LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(120L))

    // initial corpus: ids not ≡ 4 (mod 5); index built FROM the table
    val initial = all.filter(_._1 % 5 != 4)
    table.ingest(initial.toDF("vec_id", "embedding"))
    VectorFunctions.buildIvfIndexFromTable(table, "vec_id", "embedding", idx,
      nCentroids = 4)

    // mutations AFTER the build: append the held-out ids, UPSERT every
    // id ≡ 0 (mod 7) with a shifted vector, DELETE every id ≡ 3 (mod 10)
    table.ingest(all.filter(_._1 % 5 == 4).toDF("vec_id", "embedding"))
    val upserts = all.filter(t => t._1 % 7 == 0 && t._1 % 5 != 4)
      .map { case (id, v) => id -> v.map(x => -x) }
    table.ingest(upserts.toDF("vec_id", "embedding"))
    val deadIds = all.map(_._1).filter(_ % 10 == 3)
    table.deleteKeys(deadIds.toDF("vec_id"))

    val synced = VectorFunctions.syncIndexWithTable(table, "vec_id", "embedding", idx)
    assert(VectorFunctions.readIndexMeta(idx).lastSyncedVersion == synced)

    // expected live state: everything except deleted; upserted ids carry
    // the NEW (negated) vector
    val expected = all.filterNot(t => t._1 % 10 == 3).map {
      case (id, v) if id % 7 == 0 && id % 5 != 4 => id -> v.map(x => -x)
      case other => other
    }
    val expectedDf = expected.toDF("vec_id", "embedding")
    val query = Seq(9999L -> all(9)._2).toDF("vec_id", "embedding")
    val served = VectorFunctions.knnIvfIndex(spark, idx, query, "embedding",
      k = 12, nprobe = 4).select("id").as[Long].collect().toSeq
    assert(served == bruteIds(expectedDf, query, 12),
      "the synced index must serve exactly the table's current state")

    // a second sync with no new table versions is a no-op
    assert(VectorFunctions.syncIndexWithTable(table, "vec_id", "embedding", idx) == synced)

    // vacuum then serve again — still the table's current state
    VectorFunctions.vacuumIndex(spark, idx)
    val served2 = VectorFunctions.knnIvfIndex(spark, idx, query, "embedding",
      k = 12, nprobe = 4).select("id").as[Long].collect().toSeq
    assert(served2 == served)
  }

  test("tombstone anti-join broadcasts only under the row-count limit") {
    val dim = 8
    val all = vecs(300, dim, seed = 23)
    val df = all.toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-ivf-bcast").toString
    VectorFunctions.buildIvfIndex(df, "vec_id", "embedding", idx, nCentroids = 4)
    VectorFunctions.deleteFromIndex(
      (0L until 50L).toDF("vec_id"), "vec_id", idx)

    def broadcasts(): Int = {
      val live = VectorFunctions.liveIndexLists(spark, idx)
      live.collect() // force AQE to finalize the executed plan
      graft.query.Plans.exchanges(live)._2
    }

    // Disable SIZE-based broadcast selection (planner and AQE), so the
    // observed strategy is exactly what liveIndexLists forces: with the
    // size path live, AQE correctly re-broadcasts any genuinely small
    // delete set regardless of the hint — which is the desired behavior
    // at scale but hides the hint's contribution from this spec.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // 50 tombstones, limit default 1M → the hint forces the broadcast
      assert(broadcasts() >= 1, "under the limit the delete set must broadcast")

      // force the limit below the tombstone count → NO BroadcastExchange
      spark.conf.set("graft.index.tombstoneBroadcastLimit", "10")
      assert(broadcasts() == 0,
        "over the limit the anti-join must not broadcast the delete set")
      // and the served rows are identical either way
      val query = Seq(9999L -> all(60)._2).toDF("vec_id", "embedding")
      val served = VectorFunctions.knnIvfIndex(spark, idx, query, "embedding",
        k = 10, nprobe = 4).select("id").as[Long].collect().toSeq
      val live = df.filter($"vec_id" >= 50L)
      assert(served == bruteIds(live, query, 10))
    } finally {
      spark.conf.unset("graft.index.tombstoneBroadcastLimit")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("serve-plan builds read the tombstone count from meta, not delete footers") {
    val dim = 8
    val all = vecs(150, dim, seed = 31)
    val df = all.toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-ivf-metacnt").toString
    VectorFunctions.buildIvfIndex(df, "vec_id", "embedding", idx, nCentroids = 4)
    VectorFunctions.deleteFromIndex((0L until 40L).toDF("vec_id"), "vec_id", idx)

    // delete maintained the count in the meta
    assert(VectorFunctions.readIndexMeta(idx).tombstoneRows == 40L)

    // repeat serves: zero footer-scan fallbacks
    VectorFunctions.serveFooterScans.set(0L)
    VectorFunctions.liveIndexLists(spark, idx).collect()
    VectorFunctions.liveIndexLists(spark, idx).collect()
    assert(VectorFunctions.serveFooterScans.get() == 0L,
      "with a meta-tracked count the serve path must not open delete footers")

    // a pre-field index (no meta) still works via the footer fallback
    val metaBak = graft.meta.GraftFS.readString(s"$idx/_index_meta.json")
    graft.meta.GraftFS.deleteRecursive(s"$idx/_index_meta.json")
    val live = VectorFunctions.liveIndexLists(spark, idx).collect()
    assert(VectorFunctions.serveFooterScans.get() >= 1L, "fallback must engage")
    assert(live.length == 110, "fallback serves the same live rows")
    graft.meta.GraftFS.writeString(s"$idx/_index_meta.json", metaBak)

    // vacuum clears the tombstones and records zero
    VectorFunctions.vacuumIndex(spark, idx)
    assert(VectorFunctions.readIndexMeta(idx).tombstoneRows == 0L)
    VectorFunctions.serveFooterScans.set(0L)
    assert(VectorFunctions.liveIndexLists(spark, idx).count() == 110)
    assert(VectorFunctions.serveFooterScans.get() == 0L)
  }

  test("a serve planned before a vacuum survives the generation flip") {
    val dim = 8
    val all = vecs(200, dim, seed = 41)
    val df = all.toDF("vec_id", "embedding")
    val idx = Files.createTempDirectory("graft-ivf-vacrace").toString
    VectorFunctions.buildIvfIndex(df, "vec_id", "embedding", idx, nCentroids = 4)
    VectorFunctions.deleteFromIndex((0L until 30L).toDF("vec_id"), "vec_id", idx)

    // plan (and file-list) a serve against the pre-vacuum generation
    val pinned = VectorFunctions.liveIndexLists(spark, idx)
    // the vacuum flips the pointer to generation 1; generation 0 stays
    assert(VectorFunctions.vacuumIndex(spark, idx) == 170L)
    assert(VectorFunctions.readIndexMeta(idx).listsVersion == 1L)
    // the pre-flip serve still executes over a complete generation —
    // the old rename swap made exactly this fail with FileNotFound
    assert(pinned.count() == 170L)

    // second round: gen 0 is reclaimed, gen 1 becomes the grace copy
    VectorFunctions.deleteFromIndex((30L until 40L).toDF("vec_id"), "vec_id", idx)
    val pinned2 = VectorFunctions.liveIndexLists(spark, idx)
    assert(VectorFunctions.vacuumIndex(spark, idx) == 160L)
    assert(pinned2.count() == 160L)
    assert(!new java.io.File(s"$idx/lists").exists(),
      "generation 0 reclaimed after the second flip")
    assert(new java.io.File(s"$idx/lists.v1").exists(), "grace generation kept")
    assert(VectorFunctions.liveIndexLists(spark, idx).count() == 160L)
    // upserts and serves keep working against the new generation
    VectorFunctions.appendToIvfIndex(
      Seq(500L -> all(7)._2).toDF("vec_id", "embedding"), "vec_id", "embedding", idx)
    assert(VectorFunctions.liveIndexLists(spark, idx).count() == 161L)
  }

  test("needsVacuum fires on absolute dead rows, not only the fraction") {
    val s = VectorFunctions.IvfIndexStats(cells = 16, totalVectors = 100L,
      maxCell = 10L, minCell = 1L, skew = 1.0, deadRows = 15L)
    assert(!s.needsVacuum()) // 13% dead, under both default arms
    assert(s.needsVacuum(maxDeadRows = 10L), "absolute arm must trigger")
    assert(s.needsVacuum(maxDeadFraction = 0.1), "fraction arm unchanged")
  }
}
