package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Region
import graft.dsl.ConfigDsl
import graft.table.GraftTable

/** A query against a graft table: a list of key regions (ORed), an
  * optional value-field projection, an optional query-time transform, and
  * an optional SELECT-only SQL post-stage over the results
  * (reference: Query.java:30-34, QueryProcessingConfig.java:29-37,
  * rust/query_sql).
  */
final case class GraftQuery(
    regions: Seq[Region] = Nil,
    requestedValueFields: Option[Seq[String]] = None,
    queryTimeTransform: Option[DataFrame => DataFrame] = None,
    /** config-string transform (X1), e.g.
      * "graft.transforms.SecurityFilter{vis,public}" — the reference's
      * queryTimeIteratorClassName/Config JSON fields */
    queryTransformConfig: Option[String] = None,
    postSql: Option[String] = None)

object GraftQuery {
  val all: GraftQuery = GraftQuery()
  def forRegions(regions: Region*): GraftQuery = GraftQuery(regions = regions)

  /** Parse the reference's query JSON interchange form (see QuerySerDe). */
  def fromJson(json: String, schema: graft.core.GraftSchema): GraftQuery =
    QuerySerDe.fromJson(json, schema)

  /** Point-lookup sugar: one exact-key region per key, each key giving
    * row-key values in schema order (reference: the "keys" query JSON
    * form, example/query/sampleExactQueryInt.json, Query.java:30-34).
    */
  def forKeys(schema: graft.core.GraftSchema, keys: Seq[Any]*): GraftQuery = {
    require(keys.nonEmpty, "at least one key")
    GraftQuery(regions = keys.map { k =>
      require(k.size == schema.rowKeys.size,
        s"key $k must give a value per row-key dimension (${schema.rowKeyNames.mkString(",")})")
      Region(schema.rowKeys.zip(k).map { case (f, v) => graft.core.KeyRange.exact(f.name, v) })
    })
  }
}

/** Query execution, mirroring the reference's planner+executor
  * (QueryPlanner.java / LeafPartitionQueryExecutor.java, SURVEY.md §3.1):
  *
  *  1. prune: leaf partitions whose region overlaps a query region;
  *  2. file selection: the leaf's files plus every ancestor's files,
  *     each scan clipped by the leaf's region AND the query regions —
  *     the clip makes rows from shared ancestor files land in exactly
  *     one leaf (no duplicates; QueryPlanner.java:178-183);
  *  3. transforms: table-level (persistent filter + aggregation), then
  *     query-level, then projection (keys are always kept).
  *
  * Fast path: when every file reference sits on a leaf (steady state
  * after compaction), one parquet scan of the selected files with the
  * OR-of-regions predicate replaces the per-leaf unions — fewer plan
  * nodes, same pruning, and Catalyst pushes the region predicate into
  * the parquet row-group/page filters.
  */
final class QueryExecutor(table: GraftTable) {

  private def spark = table.spark
  private def schema = table.schema

  /** A canonical range that is a single point: [v, succ(v)). */
  private def pointValue(r: graft.core.KeyRange): Option[Any] = (r.min, r.max) match {
    case (Some(a: Int), Some(b: Int))
      if r.minInclusive && !r.maxInclusive && b == a + 1 => Some(a)
    case (Some(a: Long), Some(b: Long))
      if r.minInclusive && !r.maxInclusive && b == a + 1 => Some(a)
    case (Some(a: String), Some(b: String))
      if r.minInclusive && !r.maxInclusive && b == a + "\u0000" => Some(a)
    case _ => None
  }

  /** OR-of-regions as a row predicate. Many-point fast path: a batch of
    * thousands of exact key lookups (the LSH-index / serving-tier
    * shape) as an OR chain costs O(regions) per ROW and a giant codegen
    * tree per QUERY; instead, encode the key tuple once per row and
    * test membership in an InSet (O(1) hash probe), ANDed with the
    * per-field bounding box so parquet row-group pruning still gets
    * pushable range bounds. Exactness: each stringified field is
    * LENGTH-PREFIXED (`<char-count><value>`) before
    * concatenation, which makes the encoding injective for arbitrary
    * string contents — a bare separator would conflate e.g.
    * ('xy','z') with ('x','yz'). The prefix counts Unicode
    * code points on both sides (Spark `length` == UTF8String.numChars;
    * driver `codePointCount`), and int/long/string `cast("string")`
    * equals the driver-side `String.valueOf`, so membership is exact
    * key equality. Row keys are non-nullable by schema contract; a
    * null field encodes to a null (unmatchable) key, never a
    * conflated one.
    */
  private def regionPredicate(regions: Seq[Region]): Column = {
    val points: Option[Seq[Seq[Any]]] =
      if (regions.length < 33 || regions.isEmpty) None
      else {
        val fieldSeq = regions.head.ranges.map(_.field)
        val vals = regions.map { reg =>
          if (reg.ranges.map(_.field) != fieldSeq) None
          else {
            val pv = reg.ranges.map(pointValue)
            if (pv.forall(_.isDefined)) Some(pv.map(_.get)) else None
          }
        }
        if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
      }
    points match {
      case None => Region.anyOf(regions)
      case Some(keys) =>
        val fields = regions.head.ranges.map(_.field)
        val enc = concat(fields.flatMap { f =>
          val s = col(f).cast("string")
          Seq(length(s).cast("string"), lit("\u0001"), s)
        }: _*)
        val keyStrs = keys.map(_.map { v =>
          val s = String.valueOf(v)
          s"${s.codePointCount(0, s.length)}\u0001$s"
        }.mkString)
        val memb = enc.isInCollection(keyStrs)
        val bounds = fields.zipWithIndex.map { case (f, i) =>
          val vs = keys.map(_(i))
          val mn = vs.reduce((a, b) => if (graft.core.KeyOrdering.compare(a, b) <= 0) a else b)
          val mx = vs.reduce((a, b) => if (graft.core.KeyOrdering.compare(a, b) >= 0) a else b)
          col(f) >= lit(mn) && col(f) <= lit(mx)
        }
        bounds.reduce(_ && _) && memb
    }
  }

  def execute(q: GraftQuery): DataFrame = {
    val tree = table.store.partitionTree
    val regions =
      if (q.regions.nonEmpty) q.regions.map(_.canonical)
      else Seq(Region(schema.rowKeys.map(f => graft.core.KeyRange.unbounded(f.name))))

    val leaves = tree.leavesOverlapping(regions)
    val refsByPartition = table.store.fileReferences.groupBy(_.partitionId)

    // Order-sensitive aggregation (`last`, LWW) on this Catalyst path:
    // each row needs its file's write-generation sequence so the agg can
    // resolve max_by(value, seq); the generation-aware delete anti-join
    // needs the same column, so it is attached whenever this query sees
    // pending tombstones too (see scanWithSeq below for how).
    val hasLast = ConfigDsl.parseAggregation(table.config.aggregationConfig, schema)
      .exists(_.op == "last")
    val selectedIds = leaves.map(_.id).toSet ++
      leaves.flatMap(l => tree.ancestors(l.id).map(_.id))
    val pendingTombs = table.store.tombstones.filter(t => selectedIds.contains(t.partitionId))
    val needSeq = hasLast || pendingTombs.nonEmpty
    val readSchema = org.apache.spark.sql.types.StructType(
      schema.toStructType.fields.map(_.copy(nullable = true)))
    // Attach each row's write-generation seq as a FILE-CONSTANT column:
    // group the selected files by generation and scan each group with
    // lit(seq) — zero join, zero broadcast, and the constant folds into
    // codegen. Steady state (compacted) tables span a handful of
    // generations, so the union stays small; a heavily fragmented table
    // (many pending generations) falls back to a broadcast filename→seq
    // map scoped to the SELECTED refs only — never the whole table's
    // file index, so a point lookup broadcasts O(its files), not
    // O(100k+) rows.
    def scanWithSeq(pathSeqs: Seq[(String, Long)]): DataFrame = {
      val paths = pathSeqs.map(_._1)
      if (!needSeq) spark.read.schema(readSchema).parquet(paths: _*)
      else {
        val bySeq = pathSeqs.distinct.groupBy(_._2)
        if (bySeq.size <= 32)
          bySeq.toSeq.sortBy(_._1).map { case (s, ps) =>
            spark.read.schema(readSchema).parquet(ps.map(_._1): _*)
              .withColumn("__seq", lit(s))
          }.reduce(_ unionByName _)
        else {
          val seqDf = spark.createDataFrame(
            pathSeqs.map { case (p, s) => (p.substring(p.lastIndexOf('/') + 1), s) }.distinct)
            .toDF("__file", "__seq")
          spark.read.schema(readSchema).parquet(paths: _*)
            .withColumn("__file", regexp_extract(input_file_name(), "[^/]+$", 0))
            .join(broadcast(seqDf), Seq("__file")).drop("__file")
        }
      }
    }

    val scans: Seq[DataFrame] = {
      // Fast-path decision is scoped to the SELECTED leaves: only an
      // ancestor of a selected leaf can contribute shared (pre-split)
      // files to this query. A pre-split ref parked elsewhere in the
      // table must not push unrelated queries onto the clip path (whose
      // CASE-WHEN leaf-id expression grows with the tree).
      val allOnLeaves = leaves.forall(l =>
        tree.ancestors(l.id).forall(a => !refsByPartition.contains(a.id)))
      if (allOnLeaves) {
        val files = leaves.flatMap(l => refsByPartition.getOrElse(l.id, Nil))
          .map(r => (table.pathOf(r), r.seq)).distinct
        if (files.isEmpty) Nil
        // the declared read schema makes columns ADDED after a file was
        // written (schema evolution) decode as nulls instead of failing
        // resolution against that file's narrower footer schema
        else Seq(scanWithSeq(files).filter(regionPredicate(regions)))
      } else {
        // Refs still sit on ancestors (pre-split): ONE scan of every
        // selected file, clipped to rows whose leaf (computed by the
        // codegen'd split-tree CASE WHEN) is among the selected leaves.
        // Leaf regions are disjoint, so rows from shared ancestor files
        // are kept exactly once — same dedup as the reference's per-leaf
        // region AND (QueryPlanner.java:178-183) — with a plan whose node
        // count is independent of the leaf count.
        val files = leaves.flatMap { leaf =>
          (refsByPartition.getOrElse(leaf.id, Nil) ++
            tree.ancestors(leaf.id).flatMap(a => refsByPartition.getOrElse(a.id, Nil)))
        }.map(r => (table.pathOf(r), r.seq)).distinct
        if (files.isEmpty) Nil
        else Seq(scanWithSeq(files)
          .filter(tree.leafIdColumn.isin(leaves.map(_.id): _*) && regionPredicate(regions)))
      }
    }

    val scanned = {
      val s0 = scans.reduceOption(_ unionByName _)
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema.toStructType))
      // empty-table fallback: keep the __seq column downstream expects
      if (needSeq && !s0.columns.contains("__seq")) s0.withColumn("__seq", lit(0L)) else s0
    }

    // Row-key tombstones (deleteKeys): LEFT ANTI against the pending
    // delete keys of the selected leaves, generation-aware — a row is
    // suppressed only when some tombstone of its key is at least as new
    // as the row's file (row.__seq <= max tombstone seq per key), so a
    // key re-ingested after the delete survives (LSM delete-marker
    // semantics). Leaf regions partition the key space, so scoping to
    // selected leaves is exact; the equi-key part keeps the join
    // hash/SMJ-able and Catalyst broadcasts when the pending delete set
    // is small (the usual takedown shape).
    val base = {
      if (pendingTombs.isEmpty) scanned
      else {
        // key on the BASENAME: a shallow clone's inherited tombstone
        // carries the source's absolute path, while input_file_name()
        // below yields basenames (UUID-unique across homes)
        val tseqDf = spark.createDataFrame(
          pendingTombs.map(t =>
            (t.filename.substring(t.filename.lastIndexOf('/') + 1), t.seq)).distinct)
          .toDF("__tfile", "__tseq")
        val tdf = spark.read
          .schema(org.apache.spark.sql.types.StructType(
            schema.rowKeys.map(f => org.apache.spark.sql.types.StructField(
              f.name, f.dataType, nullable = true))))
          .parquet(pendingTombs.map(table.pathOf).distinct: _*)
          .withColumn("__tfile", regexp_extract(input_file_name(), "[^/]+$", 0))
          .join(broadcast(tseqDf), Seq("__tfile"))
          .groupBy(schema.rowKeyNames.map(col): _*)
          .agg(max(col("__tseq")).as("__tseq"))
        val cond = schema.rowKeyNames.map(k => scanned(k) === tdf(k)).reduce(_ && _) &&
          scanned("__seq") <= tdf("__tseq")
        val anti = scanned.join(tdf, cond, "left_anti")
        // the seq column was only for the anti-join unless LWW needs it
        if (hasLast) anti else anti.drop("__seq")
      }
    }

    val tableTransform = graft.transforms.TransformFactory.parse(
      table.config.transformConfig, schema, table.config.userJarsDir)
    val queryTransform = q.queryTransformConfig.flatMap(
      graft.transforms.TransformFactory.parse(_, schema, table.config.userJarsDir))
    val filterSpec = ConfigDsl.parseFilter(table.config.filterConfig, schema)
    val aggSpecs = ConfigDsl.parseAggregation(table.config.aggregationConfig, schema)

    // Read-schema pruning (P1/X1): keys always, then requested value
    // fields ∪ the fields the transforms/filter/aggregation declare —
    // narrowing BEFORE the transforms so even an opaque (mapPartitions)
    // transform body gets a pruned parquet scan (reference:
    // LeafPartitionQueryExecutor.createSchemaForDataRead:105-131).
    val narrowed = q.requestedValueFields match {
      case Some(req) =>
        val need = req.toSet ++
          tableTransform.toSeq.flatMap(_.requiredValueFields) ++
          queryTransform.toSeq.flatMap(_.requiredValueFields) ++
          filterSpec.toSeq.map { case ConfigDsl.AgeOff(f, _) => f } ++
          (if (aggSpecs.nonEmpty) schema.valueNames else Nil)
        base.select((schema.keyNames ++ schema.valueNames.filter(need.contains) ++
          (if (hasLast) Seq("__seq") else Nil)).map(col): _*)
      case None => base
    }

    // Compaction-time (persistent) transforms apply at query time too —
    // data not yet rewritten by compaction must read the same
    // (reference: LeafPartitionQueryExecutor.getRows:92-99).
    val now = System.currentTimeMillis()
    val filtered = filterSpec.map(f => narrowed.filter(f.toColumn(now))).getOrElse(narrowed)
    val aggregated =
      if (aggSpecs.isEmpty) filtered
      else {
        val cols = ConfigDsl.aggColumnsOrdered(aggSpecs, schema,
          if (hasLast) Some(col("__seq")) else None)
        filtered.groupBy(schema.keyNames.map(col): _*)
          .agg(cols.head, cols.tail: _*)
          .select((schema.keyNames ++
            schema.valueNames.filter(n => filtered.columns.contains(n))).map(col): _*)
      }

    // Table-level transform (runs at compaction too), then the
    // query-level config transform, then the programmatic hook.
    val withTableT = tableTransform.map(_(aggregated)).getOrElse(aggregated)
    val withQueryT = queryTransform.map(_(withTableT)).getOrElse(withTableT)
    val transformed = q.queryTimeTransform.map(_(withQueryT)).getOrElse(withQueryT)

    // Final projection: requested value fields only, keys always kept.
    val projected = q.requestedValueFields match {
      case Some(req) =>
        val keep = schema.keyNames ++ schema.valueNames.filter(req.contains)
        transformed.select(keep.map(col): _*)
      case None => transformed
    }

    val sorted = projected.sortWithinPartitions(schema.keyNames.map(col): _*)
    q.postSql.map(sql => SqlStage.overResults(spark, sorted, sql)).getOrElse(sorted)
  }
}
