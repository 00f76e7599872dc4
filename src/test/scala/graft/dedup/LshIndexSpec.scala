package graft.dedup

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{GraftField, GraftSchema, KeyRange, Region}
import graft.query.GraftQuery
import graft.table.GraftTable

/** The persisted LSH near-dup index: build + incremental append equal a
  * from-scratch build, serving finds exactly the exact-Jaccard pairs,
  * and the many-point lookup fast path returns the same rows as a full
  * scan.
  */
class LshIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def corpus() = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a completely different document about spark tables"),
    (4L, "another unrelated text concerning parquet files"),
    (5L, "the quick brown fox jumps over the lazy dog today"))
    .toDF("doc_id", "text")

  test("serve finds near-dups of a batch against the indexed corpus; append == rebuild") {
    val dir = Files.createTempDirectory("graft-lshidx").toString
    val docs = corpus()
    LshIndex.build(spark, docs.filter($"doc_id" <= 3), "doc_id", "text", s"$dir/i")
    LshIndex.append(spark, s"$dir/i", docs.filter($"doc_id" > 3), "doc_id", "text")

    val batch = Seq((100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "nothing like anything in the corpus at all zzz qqq"))
      .toDF("doc_id", "text")
    val got = LshIndex.findNearDups(spark, s"$dir/i", batch, "doc_id", "text", 0.5)
      .select("qid", "doc_id").as[(Long, Long)].collect().toSet
    // qid 100 matches docs 1 (j=1.0), 2 and 5 (high overlap); 101 matches nothing
    assert(got.contains((100L, 1L)) && got.contains((100L, 5L)))
    assert(!got.exists(_._1 == 101L))
    assert(!got.contains((100L, 3L)) && !got.contains((100L, 4L)))

    // jaccard values are the exact set jaccards
    val j1 = LshIndex.findNearDups(spark, s"$dir/i", batch, "doc_id", "text", 0.5)
      .filter($"doc_id" === 1L).select("jaccard").as[Double].head()
    assert(j1 == 1.0)
  }

  test("delete and upsert keep serving consistent; vacuumBands reclaims stale buckets") {
    val dir = Files.createTempDirectory("graft-lshidx-mut").toString
    LshIndex.build(spark, corpus(), "doc_id", "text", s"$dir/i")
    val batch = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    def hits(): Set[Long] =
      LshIndex.findNearDups(spark, s"$dir/i", batch, "doc_id", "text", 0.5)
        .select("doc_id").as[Long].collect().toSet
    assert(hits() == Set(1L, 2L, 5L))

    // DELETE doc 1: it must stop matching immediately (stale band rows
    // may still nominate it, but the point-fetch finds no text)
    LshIndex.delete(spark, s"$dir/i", Seq(1L).toDF("doc_id"), "doc_id")
    assert(hits() == Set(2L, 5L), "a deleted doc must not serve as a near-dup")

    // UPSERT doc 2 with unrelated text: last-write-wins — the old
    // near-dup content must no longer match, under EITHER its old or
    // new buckets
    LshIndex.append(spark, s"$dir/i",
      Seq((2L, "totally new content about databases and storage engines xyz"))
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(hits() == Set(5L), "an upserted doc must match only via its CURRENT text")

    // vacuum: bands rebuilt from current docs — same serve results, and
    // the deleted doc's rows are physically gone from the bands table
    LshIndex.vacuumBands(spark, s"$dir/i")
    assert(hits() == Set(5L))
    val bandDocs = graft.table.GraftTable.load(spark, s"$dir/i/bands")
      .toDF.select("doc_id").as[Long].collect().toSet
    assert(!bandDocs.contains(1L), "vacuum must drop the deleted doc's band rows")
  }

  test("many-point region lookup (InSet fast path) equals the scan-and-filter result") {
    val dir = Files.createTempDirectory("graft-points").toString
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("k", org.apache.spark.sql.types.LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("v", org.apache.spark.sql.types.LongType)))
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(500L))
    table.ingest((0L until 1000L).map(i => (i, i * 7)).toDF("k", "v"))
    // 100 point keys (> the 33-region fast-path threshold)
    val keys = (0L until 1000L by 10L).map(k => Seq(k): Seq[Any])
    val got = table.query(GraftQuery.forKeys(schema, keys: _*))
      .select("k", "v").as[(Long, Long)].collect().toSet
    val expect = (0L until 1000L by 10L).map(k => (k, k * 7)).toSet
    assert(got == expect)

    // mixed point + range regions stay on the general path and stay correct
    val q = GraftQuery(regions = Seq(
      Region(KeyRange.minMax("k", 10L, 13L))) ++
      (100L until 400L by 3L).map(k => Region(KeyRange.exact("k", k))))
    val got2 = table.query(q).select("k").as[Long].collect().toSet
    assert(got2 == (10L until 13L).toSet ++ (100L until 400L by 3L).toSet)
  }
}
