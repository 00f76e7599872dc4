package graft.meta

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.Assertions._
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** The full-table-loop crash battery shared by every external-CAS
  * implementation: ingest ∥ compaction ∥ GC from three concurrent
  * writers, each with its OWN store handle (separate-process shape),
  * against [[EmulatedObjectStoreFS]] — non-atomic clobbering rename, no
  * overwrite detection, crash injection between the stage/claim/fill
  * steps of [[ClaimArbitratedCAS]]. Run once with the filesystem-
  * coordinated CAS (ObjectStoreLifecycleSpec) and once with the HTTP
  * claim service (HttpCasSpec): the invariants — ZERO lost updates, no
  * duplicated rows, no wedged versions — must hold for any arbiter.
  */
object LifecycleStress {

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("k", LongType)),
    sortKeys = Nil,
    values = Seq(GraftField("v", LongType)))

  def run(spark: SparkSession, casFactory: () => StateStoreCAS): Unit = {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.set(
      "fs.objstore.impl", classOf[EmulatedObjectStoreFS].getName)
    EmulatedObjectStoreFS.disarmAll()

    val local = Files.createTempDirectory("graft-objstore").toString
    val dir = s"objstore://$local"

    val tree = PartitionTree.fromSplitPoints(schema, Seq(5000000L))
    JsonStateStore.create(s"$dir/meta", schema, tree, cas = Some(casFactory()))
    GraftFS.mkdirs(s"$dir/data")

    val attempted = new ConcurrentLinkedQueue[Long]()
    val confirmed = new ConcurrentLinkedQueue[Long]()
    val crashes = new ConcurrentLinkedQueue[String]()

    def newHandle(): GraftTable = new GraftTable(spark, dir,
      JsonStateStore.load(s"$dir/meta", cas = Some(casFactory())),
      TableConfig(gcDelayMinutes = 0, compactionBatchSize = 4))

    // crash injections are armed by WORKER PROGRESS, not wall clock (a
    // warm suite finishes rounds faster than any sleep schedule), and
    // path-scoped to THIS table: kill a commit mid-STAGE (before its
    // claim exists), one post-claim mid-FILL (exercising rival repair),
    // then another stage kill. "$local/meta/state-v" matches only the
    // fill's final object — the staged tmp is "/meta/.state-v…".
    val stagePat = s"$local/meta/.staged-"
    val fillPat = s"$local/meta/state-v"
    val rounds = 7
    val threads = (0 until 3).map { w =>
      new Thread(() => {
        val table = newHandle()
        (0 until rounds).foreach { r =>
          if (w == 0 && r == 2) EmulatedObjectStoreFS.armCrash("create", stagePat)
          if (w == 1 && r == 3) EmulatedObjectStoreFS.armCrash("create", fillPat)
          if (w == 2 && r == 4) EmulatedObjectStoreFS.armCrash("create", stagePat)
          val keys = (0 until 20).map(i => w * 10000000L + r * 1000L + i)
          keys.foreach(attempted.add)
          try {
            table.ingest(keys.map(k => (k, k)).toDF("k", "v"))
            keys.foreach(confirmed.add)
          } catch {
            case t: Throwable =>
              crashes.add(s"w$w r$r ingest: ${t.getMessage}")
              try table.store.asInstanceOf[JsonStateStore].reloadLatest()
              catch { case _: Throwable => () }
          }
          // each writer also drives maintenance — compaction and GC race
          // the ingests and each other
          try {
            if (r % 3 == w % 3) table.compactAll()
            if (r % 2 == 1) new graft.jobs.GarbageCollector(table).run()
          } catch {
            case t: Throwable =>
              crashes.add(s"w$w r$r maint: ${t.getMessage}")
              try table.store.asInstanceOf[JsonStateStore].reloadLatest()
              catch { case _: Throwable => () }
          }
        }
      }, s"objstore-writer-$w")
    }

    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(threads.forall(!_.isAlive), "stress threads must finish")
    EmulatedObjectStoreFS.disarmAll()

    // liveness after every crash: a FRESH handle can still commit — this
    // both proves no version is wedged and repairs any claim whose
    // writer died between claim and fill
    val fin = newHandle()
    val finalKeys = Seq(99999999L)
    fin.ingest(finalKeys.map(k => (k, k)).toDF("k", "v"))

    val got = fin.toDF.select("k").as[Long].collect().toSeq
    val gotSet = got.toSet
    assert(got.size == gotSet.size, "no row may be duplicated by retries/repairs")
    val conf = confirmed.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    val att = attempted.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet ++ finalKeys
    assert(conf.subsetOf(gotSet),
      s"LOST UPDATES: confirmed-but-missing keys ${(conf -- gotSet).take(10)}")
    assert(gotSet.subsetOf(att),
      s"phantom keys ${(gotSet -- att).take(10)}")

    // every live reference must be physically readable (GC deleted
    // nothing still referenced, through all the clobbering renames)
    fin.store.fileReferences.foreach { ref =>
      assert(GraftFS.exists(fin.pathOf(ref)), s"missing data file for $ref")
    }
    // the injected crashes genuinely fired and were survived
    assert(EmulatedObjectStoreFS.firedCount >= 2,
      s"crash injection never triggered (fired=${EmulatedObjectStoreFS.firedCount}); " +
        s"observed crashes: ${crashes.toArray.mkString("; ")}")
  }
}
