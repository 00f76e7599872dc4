package graft.meta

/** Child-process body for the cross-process CAS stress spec: loads the
  * state store at `dir` and lands `commits` uniquely-named file
  * references, retrying through contention until every one is committed.
  * Spawned as a separate JVM (`java -cp <test classpath> graft.meta.CasHammer`)
  * so the hard-link CAS is exercised across PROCESS boundaries — separate
  * page caches, separate JVM monitors, nothing shared but the directory —
  * the way rival ingest/compaction jobs on different hosts would hit an
  * object-store CAS (the reference's DynamoDB log is inherently
  * multi-writer; this proves the filesystem CAS gives the same guarantee).
  *
  * Prints "DONE <n>" on success; any lost update surfaces as a missing
  * reference in the parent's final assertion.
  */
object CasHammer {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val writerId = args(1)
    val commits = args(2).toInt
    // optional 4th arg: an HTTP claim-service URL — arbitrate through the
    // remote conditional-put store instead of the filesystem primitive
    val cas = args.lift(3).map(url => new HttpCas(url))
    val store = JsonStateStore.load(dir, cas = cas)
    val leaf = store.partitionTree.leaves.map(_.id).min
    var landed = 0
    while (landed < commits) {
      try {
        store.addFiles(Seq(FileReference(s"$writerId-f$landed", leaf, 1)))
        landed += 1
      } catch {
        case _: ConcurrentStateException => () // exhausted one retry budget; go again
      }
    }
    println(s"DONE $landed")
  }
}
