package graft.query

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.GraftTable

/** JSON interchange compatibility with the reference's schema/query
  * forms: sample-file `keys`/`ranges` spellings, the current `regions`
  * spelling, schema type names, round-trips, and end-to-end planning of
  * a JSON query against a live table.
  */
class QuerySerDeSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("count", LongType)))

  test("schema round-trips through the reference's JSON form") {
    val s = GraftSchema(
      rowKeys = Seq(GraftField("k1", IntegerType), GraftField("k2", BinaryType)),
      sortKeys = Seq(GraftField("s1", LongType)),
      values = Seq(
        GraftField("v1", StringType, nullable = true),
        GraftField("v2", MapType(StringType, LongType, valueContainsNull = true)),
        GraftField("v3", ArrayType(LongType, containsNull = true))))
    val json = SchemaSerDe.toJson(s)
    assert(json.contains("\"IntType\"") && json.contains("\"ByteArrayType\"") &&
      json.contains("MapType") && json.contains("ListType"))
    assert(GraftSchema.fromJson(json) == s)
  }

  test("parses the reference's example schema file form") {
    val s = GraftSchema.fromJson("""{
      "rowKeyFields": [ {"name": "key", "type": "StringType"} ],
      "sortKeyFields": [ {"name": "timestamp", "type": "LongType"} ],
      "valueFields": [ {"name": "value", "type": "StringType"} ]
    }""")
    assert(s.rowKeyNames == Seq("key"))
    assert(s.sortKeyNames == Seq("timestamp"))
    assert(s.values == Seq(GraftField("value", StringType)))
  }

  test("parses the sample exact-key query form") {
    val intSchema = GraftSchema(Seq(GraftField("field1", IntegerType)), Nil,
      Seq(GraftField("v", LongType)))
    val q = GraftQuery.fromJson(
      """{"queryId": "id", "tableName": "t", "type": "Query",
         "keys": [ {"field1": 10} ]}""", intSchema)
    assert(q.regions.size == 1)
    assert(q.regions.head.ranges.head == KeyRange.exact("field1", 10))
  }

  test("parses the sample range query form with requested value fields") {
    val intSchema = GraftSchema(Seq(GraftField("key", IntegerType)), Nil,
      Seq(GraftField("value1", LongType), GraftField("value2", LongType)))
    val q = GraftQuery.fromJson(
      """{"queryId": "id", "tableName": "t", "type": "Query",
         "ranges": [ {"min": {"key": 1}, "minInclusive": true,
                      "max": {"key": 2}, "maxInclusive": false} ],
         "requestedValueFields": ["value1"]}""", intSchema)
    assert(q.regions == Seq(Region(Seq(
      KeyRange("key", Some(1), minInclusive = true, Some(2), maxInclusive = false)))))
    assert(q.requestedValueFields.contains(Seq("value1")))
  }

  test("query round-trips through the current regions form incl. transform config") {
    val q = GraftQuery(
      regions = Seq(Region(Seq(
        KeyRange("key", Some("a"), minInclusive = true, Some("m"), maxInclusive = false)))),
      requestedValueFields = Some(Seq("count")),
      queryTransformConfig = Some("graft.transforms.CapValue{count,5}"))
    val json = QuerySerDe.toJson(q, schema)
    val back = GraftQuery.fromJson(json, schema)
    assert(back.regions == q.regions)
    assert(back.requestedValueFields == q.requestedValueFields)
    assert(back.queryTransformConfig == q.queryTransformConfig)
  }

  test("a CHAINED transform spec with a configured non-final member round-trips losslessly") {
    // "A{x};B": naive first-'{' slicing serialized className="A",
    // config="x};B"-minus-last-char, silently losing the ";B" tail
    val chain = "graft.transforms.CapValue{count,5};graft.transforms.SecurityFilter{key,a|b}"
    val q = GraftQuery(queryTransformConfig = Some(chain))
    val back = GraftQuery.fromJson(QuerySerDe.toJson(q, schema), schema)
    assert(back.queryTransformConfig.contains(chain))
    // and the reconstructed spec still parses into a working chain
    assert(graft.transforms.TransformFactory.parse(back.queryTransformConfig.get, schema).isDefined)
    // a chain rides the graft-specific field; the reference-shaped
    // className field stays a loadable bare class name or is absent
    // (Query.java defines it as a Java class name, not a chain spec)
    val json = QuerySerDe.toJson(q, schema)
    assert(json.contains("queryTimeIteratorChain"))
    assert(!json.contains("queryTimeIteratorClassName"))
  }

  test("a JSON query plans and runs against a live table") {
    val dir = Files.createTempDirectory("graft-qjson").toString
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq("m"))
    table.ingest(Seq(("apple", 1L, 10L), ("mango", 1L, 20L), ("zebra", 1L, 30L))
      .toDF("key", "ts", "count"))
    val q = GraftQuery.fromJson(
      """{"queryId": "q1", "type": "Query",
         "regions": [ {"key": {"min": "a", "minInclusive": true,
                               "max": "n", "maxInclusive": false}} ],
         "requestedValueFields": ["count"]}""", schema)
    val got = table.query(q).select("key", "count").as[(String, Long)].collect().toSet
    assert(got == Set(("apple", 10L), ("mango", 20L)))
  }
}
