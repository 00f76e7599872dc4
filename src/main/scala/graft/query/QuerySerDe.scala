package graft.query

import java.util.Base64
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.types._
import graft.core._

/** Schema JSON interchange, compatible with the reference's form
  * (example/basic/schema.json; SchemaSerDe.java:125-195): three field
  * lists with type names IntType / LongType / StringType / ByteArrayType
  * and nested `{"MapType": {"keyType","valueType"}}` /
  * `{"ListType": {"elementType"}}` objects.
  */
object SchemaSerDe {

  def fromJson(json: String): GraftSchema = {
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def fields(k: String): Seq[GraftField] = m.get(k) match {
      case Some(JArray(fs)) => fs.map(fieldFromJson)
      case _ => Nil
    }
    GraftSchema(fields("rowKeyFields"), fields("sortKeyFields"), fields("valueFields"))
  }

  def toJson(schema: GraftSchema): String =
    JsonMethods.pretty(JsonMethods.render(JObject(
      "rowKeyFields" -> JArray(schema.rowKeys.map(fieldToJson).toList),
      "sortKeyFields" -> JArray(schema.sortKeys.map(fieldToJson).toList),
      "valueFields" -> JArray(schema.values.map(fieldToJson).toList))))

  private def fieldFromJson(j: JValue): GraftField = {
    val m = j.asInstanceOf[JObject].obj.toMap
    val JString(name) = m("name"): @unchecked
    val nullable = m.get("nullable").collect { case JBool(b) => b }.getOrElse(false)
    GraftField(name, typeFromJson(m("type")), nullable)
  }

  private def fieldToJson(f: GraftField): JValue = JObject(
    List("name" -> JString(f.name), "type" -> typeToJson(f.dataType)) ++
      (if (f.nullable) List("nullable" -> JBool(true)) else Nil))

  private def primitive(name: String): DataType = name match {
    case "IntType" => IntegerType
    case "LongType" => LongType
    case "StringType" => StringType
    case "ByteArrayType" => BinaryType
    // engine extension past the reference's interchange: float/double
    // VALUE columns (embeddings, scores) — see GraftSchema.isValueType
    case "FloatType" => FloatType
    case "DoubleType" => DoubleType
    case other => throw new IllegalArgumentException(s"unknown primitive type: $other")
  }

  private def primitiveName(t: DataType): String = t match {
    case IntegerType => "IntType"
    case LongType => "LongType"
    case StringType => "StringType"
    case BinaryType => "ByteArrayType"
    case FloatType => "FloatType"
    case DoubleType => "DoubleType"
    case other => throw new IllegalArgumentException(s"not a primitive key type: ${other.sql}")
  }

  private def typeFromJson(j: JValue): DataType = j match {
    case JString(s) => primitive(s)
    case JObject(fields) =>
      val m = fields.toMap
      m.get("MapType") match {
        case Some(JObject(mf)) =>
          val mm = mf.toMap
          val JString(kt) = mm("keyType"): @unchecked
          val JString(vt) = mm("valueType"): @unchecked
          MapType(primitive(kt), primitive(vt), valueContainsNull = true)
        case _ => m.get("ListType") match {
          case Some(JObject(lf)) =>
            val lm: Map[String, JValue] = lf.toMap
            val JString(et) = lm("elementType"): @unchecked
            ArrayType(primitive(et), containsNull = true)
          case _ => throw new IllegalArgumentException(s"unknown type json: $j")
        }
      }
    case other => throw new IllegalArgumentException(s"unknown type json: $other")
  }

  private def typeToJson(t: DataType): JValue = t match {
    case MapType(k, v, _) => JObject("MapType" -> JObject(
      "keyType" -> JString(primitiveName(k)), "valueType" -> JString(primitiveName(v))))
    case ArrayType(e, _) => JObject("ListType" -> JObject(
      "elementType" -> JString(primitiveName(e))))
    case p => JString(primitiveName(p))
  }
}

/** Query JSON interchange, schema-aware (values are typed by the row-key
  * field they constrain). Three region spellings are accepted, covering
  * both the reference's current serde and its documented sample files:
  *
  *  - `regions`: list of RegionSerDe-form objects mapping field name ->
  *    `{min, minInclusive, max, maxInclusive}` (RegionSerDe.java:136-230;
  *    a `stringsBase64Encoded` marker key is honored for string bounds);
  *  - `ranges` (sample form): list of `{min: {field: v}, minInclusive,
  *    max: {field: v}, maxInclusive}` entries composing ONE region
  *    (example/query/sampleRangeQuery.json);
  *  - `keys` (sample form): list of `{field: v, ...}` exact-key maps, one
  *    region per entry (example/query/sampleExactQueryInt.json).
  *
  * `requestedValueFields` and the query-time transform
  * (`queryTimeIteratorClassName` / `queryTimeIteratorConfig`,
  * Query.java:30-34) map onto the matching GraftQuery fields.
  */
object QuerySerDe {

  def fromJson(json: String, schema: GraftSchema): GraftQuery = {
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    m.get("type").foreach {
      case JString("Query") =>
      case JString(other) => throw new IllegalArgumentException(s"unsupported query type: $other")
      case _ =>
    }

    val regions: Seq[Region] = m.get("regions") match {
      case Some(JArray(rs)) => rs.map(regionFromJson(_, schema))
      case _ => m.get("ranges") match {
        case Some(JArray(rs)) => Seq(regionFromRangeList(rs, schema))
        case _ => m.get("keys") match {
          case Some(JArray(ks)) => ks.map(keyRegion(_, schema))
          case _ => Nil
        }
      }
    }

    val requested = m.get("requestedValueFields").collect {
      case JArray(vs) => vs.collect { case JString(s) => s }
    }
    // graft extension field first (multi-member chains), then the
    // reference's two-field single-transform form (Query.java:30-34)
    val transform = m.get("queryTimeIteratorChain").collect { case JString(spec) => spec }
      .orElse(m.get("queryTimeIteratorClassName").collect { case JString(cls) =>
        val cfg = m.get("queryTimeIteratorConfig").collect { case JString(c) => c }.getOrElse("")
        if (cfg.isEmpty) cls else s"$cls{$cfg}"
      })
    GraftQuery(regions = regions, requestedValueFields = requested,
      queryTransformConfig = transform)
  }

  /** Serializes in the reference's current (`regions`) spelling. */
  def toJson(q: GraftQuery, schema: GraftSchema, queryId: String = "query",
      tableName: String = ""): String = {
    val regionJson = q.regions.map { r =>
      JObject(schema.rowKeys.flatMap { f =>
        r.ranges.find(_.field == f.name).map { kr =>
          f.name -> JObject(List(
            "min" -> kr.min.map(valueToJson(f.dataType, _)).getOrElse(JNull),
            "minInclusive" -> JBool(kr.minInclusive),
            "max" -> kr.max.map(valueToJson(f.dataType, _)).getOrElse(JNull),
            "maxInclusive" -> JBool(kr.maxInclusive)))
        }
      }.toList)
    }
    // A single-member spec maps onto the reference's two-field form
    // (className + config), keeping those fields spec-conformant — a bare
    // class name, as Query.java defines them. A CHAIN doesn't fit the
    // reference's shape at all (it has no chain encoding), so it goes
    // into the graft-specific `queryTimeIteratorChain` field verbatim;
    // fromJson prefers that field, so the round trip stays lossless
    // without ever emitting "A{x};B{y}" where a reference consumer
    // expects a loadable class name.
    val transform = q.queryTransformConfig.map { rawSpec =>
      graft.transforms.TransformFactory.chainMembers(rawSpec) match {
        case Seq(single) =>
          val (cls, cfg) = graft.transforms.TransformFactory.memberParts(single)
          List("queryTimeIteratorClassName" -> JString(cls)) ++
            (if (cfg.nonEmpty) List("queryTimeIteratorConfig" -> JString(cfg)) else Nil)
        case _ => List("queryTimeIteratorChain" -> JString(rawSpec.trim))
      }
    }
    JsonMethods.pretty(JsonMethods.render(JObject(List(
      "queryId" -> JString(queryId),
      "tableName" -> JString(tableName),
      "type" -> JString("Query"),
      "regions" -> JArray(regionJson.toList)) ++
      q.requestedValueFields.map(vs =>
        "requestedValueFields" -> JArray(vs.map(JString(_)).toList)).toList ++
      transform.toList.flatten)))
  }

  private def regionFromJson(j: JValue, schema: GraftSchema): Region = {
    val m = j.asInstanceOf[JObject].obj.toMap
    val base64Strings = m.get(RegionStringsBase64Key).collect { case JBool(b) => b }.getOrElse(false)
    Region(schema.rowKeys.map { f =>
      m.get(f.name) match {
        case Some(JObject(rf)) =>
          val rm = rf.toMap
          val min = rm.get("min").filterNot(_ == JNull).map(value(f, _, base64Strings))
          val max = rm.get("max").filterNot(_ == JNull).map(value(f, _, base64Strings))
          KeyRange(f.name, min,
            rm.get("minInclusive").collect { case JBool(b) => b }.getOrElse(true),
            max,
            rm.get("maxInclusive").collect { case JBool(b) => b }.getOrElse(false))
        case _ => KeyRange.unbounded(f.name)
      }
    })
  }

  /** Sample-file form: each list entry holds `min`/`max` objects keyed by
    * field name; all entries together describe one region.
    */
  private def regionFromRangeList(rs: List[JValue], schema: GraftSchema): Region = {
    val byField = scala.collection.mutable.Map.empty[String, KeyRange]
    rs.foreach { rj =>
      val rm = rj.asInstanceOf[JObject].obj.toMap
      def bound(k: String): Option[(String, JValue)] = rm.get(k).collect {
        case JObject((field, v) :: _) => (field, v)
      }
      val minB = bound("min"); val maxB = bound("max")
      val fieldName = minB.map(_._1).orElse(maxB.map(_._1)).getOrElse(
        throw new IllegalArgumentException(s"range entry without a field: $rj"))
      val f = schema.field(fieldName)
      byField(fieldName) = KeyRange(fieldName,
        minB.map(b => value(f, b._2, base64Strings = false)),
        rm.get("minInclusive").collect { case JBool(b) => b }.getOrElse(true),
        maxB.map(b => value(f, b._2, base64Strings = false)),
        rm.get("maxInclusive").collect { case JBool(b) => b }.getOrElse(false))
    }
    Region(schema.rowKeys.map(f => byField.getOrElse(f.name, KeyRange.unbounded(f.name))))
  }

  private def keyRegion(j: JValue, schema: GraftSchema): Region = {
    val m = j.asInstanceOf[JObject].obj.toMap
    Region(schema.rowKeys.map { f =>
      m.get(f.name) match {
        case Some(v) => KeyRange.exact(f.name, value(f, v, base64Strings = false))
        case None => KeyRange.unbounded(f.name)
      }
    })
  }

  private val RegionStringsBase64Key = "stringsBase64Encoded"

  private def value(f: GraftField, j: JValue, base64Strings: Boolean): Any =
    (f.dataType, j) match {
      case (IntegerType, JInt(i)) => i.toInt
      case (LongType, JInt(i)) => i.toLong
      case (StringType, JString(s)) =>
        if (base64Strings) new String(Base64.getDecoder.decode(s), "UTF-8") else s
      case (BinaryType, JString(s)) => Base64.getDecoder.decode(s)
      case (t, v) => throw new IllegalArgumentException(
        s"value $v does not fit key field ${f.name}: ${t.sql}")
    }

  private def valueToJson(t: DataType, v: Any): JValue = (t, v) match {
    case (IntegerType, i: Int) => JInt(i)
    case (LongType, l: Long) => JInt(BigInt(l))
    case (LongType, i: Int) => JInt(BigInt(i.toLong))
    case (StringType, s: String) => JString(s)
    case (BinaryType, b: Array[Byte]) => JString(Base64.getEncoder.encodeToString(b))
    case (tt, vv) => throw new IllegalArgumentException(s"cannot serialize $vv as ${tt.sql}")
  }
}
