package graft.schema

import graft.core.{ColSpec, SourceType, TableSpec}
import graft.mask.MaskConfig
import org.json4s._
import org.json4s.jackson.JsonMethods

/** D1 — schema transform (SURVEY §2.6): Debezium-emitted Avro schema JSON →
  * [[TableSpec]]. Semantics from tipoca-stream
  * pkg/transformer/debezium/schema.go:114-235,309-506: extract the `before`
  * record's fields, read `connect.parameters.__debezium.source.column.
  * {type,length,scale}`, lowercase names, ENUM/SET widen to the string max,
  * primary keys from the key schema, mask-driven overrides applied by
  * [[withMaskOverrides]].
  */
object DebeziumSchema {

  private implicit val fmts: Formats = DefaultFormats

  /** Avro "type" values can be a string, a union array (nullable), or a
    * nested object; unwrap to the non-null branch. */
  private def unwrapType(t: JValue): JValue = t match {
    case JArray(branches) =>
      branches.find {
        case JString("null") => false
        case _ => true
      }.getOrElse(JNothing)
    case other => other
  }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case JNothing | JNull => ""
    case other => other.values.toString
  }

  /** Debezium semantic type from an Avro field type: the `connect.name`
    * logical annotation when present (e.g. io.debezium.time.Date), else the
    * primitive Avro type name (schema.go:331-360). */
  private def debeziumType(t: JValue): String = t match {
    case JString(prim) => prim
    case obj: JObject =>
      str(obj \ "connect.name") match {
        case "" => str(obj \ "type")
        case logical => logical.split('.').last.toLowerCase match {
          // io.debezium.time.* logical names → temporal markers; the
          // warehouse type still comes from the source column type.
          case other => other
        }
      }
    case _ => "string"
  }

  private def sourceType(t: JValue): SourceType = t match {
    case obj: JObject =>
      val params = obj \ "connect.parameters"
      val colType = str(params \ "__debezium.source.column.type")
      val len0 = str(params \ "__debezium.source.column.length")
      val scale = str(params \ "__debezium.source.column.scale")
      // ENUM/SET have no usable source length: widen to string max
      // (schema.go:93-96 — FIXTURES.md §3).
      val len = colType.toUpperCase match {
        case "ENUM" | "SET" => TypeMapper.StringMaxLength.toString
        case _ => len0
      }
      SourceType(colType, len, scale)
    case _ => SourceType()
  }

  private def avroToDebeziumPrimitive(t: JValue): String =
    str(unwrapType(t) match {
      case JString(s) => JString(s)
      case obj: JObject => obj \ "type"
      case _ => JString("string")
    }) match {
      case "int" => "int32"
      case "long" => "long"
      case "float" => "float32"
      case "double" => "float64"
      case "boolean" => "boolean"
      case "bytes" => "string"
      case "record" => "record"
      case other => other
    }

  /** Parse the envelope value schema (+ optional key schema for PKs). */
  def parseEnvelope(valueSchemaJson: String, keySchemaJson: Option[String] = None,
      schemaName: String = ""): TableSpec = {
    val root = JsonMethods.parse(valueSchemaJson)
    val namespace = str(root \ "namespace") // e.g. ts.inventory.customers
    val parts = namespace.split('.')
    val (db, table) =
      if (parts.length >= 2) (parts(parts.length - 2), parts.last)
      else (namespace, str(root \ "name"))

    val beforeField = (root \ "fields") match {
      case JArray(fs) => fs.find(f => str(f \ "name") == "before")
      case _ => None
    }
    val payload = beforeField.map(f => unwrapType(f \ "type")).getOrElse(JNothing)

    val pks: Set[String] = keySchemaJson.map { k =>
      (JsonMethods.parse(k) \ "fields") match {
        case JArray(fs) => fs.map(f => str(f \ "name").toLowerCase).toSet
        case _ => Set.empty[String]
      }
    }.getOrElse(Set.empty)

    val cols = (payload \ "fields") match {
      case JArray(fs) => fs.map { f =>
        val name = str(f \ "name")
        val t = unwrapType(f \ "type")
        val default = f \ "default" match {
          case JString(s) => s
          case _ => ""
        }
        ColSpec(
          name = name,
          debeziumType = t match {
            case obj: JObject if str(obj \ "connect.name").nonEmpty =>
              debeziumType(obj)
            case _ => avroToDebeziumPrimitive(f \ "type")
          },
          sourceType = sourceType(t),
          defaultVal = default,
          notNull = (f \ "type") match {
            case JArray(_) => false // nullable union
            case _ => true
          },
          primaryKey = pks.contains(name.toLowerCase))
      }
      case _ => Nil
    }

    TableSpec(if (schemaName.nonEmpty) schemaName else db, table, cols)
  }

  /** Mask-driven schema overrides (M5-M9, M11, M12; schema.go:393-506):
    * set `masked` flags from the config, add the extra key columns
    * (sorted first, as the reference does), tag sort/dist keys. */
  def withMaskOverrides(t: TableSpec, cfg: MaskConfig): TableSpec = {
    val table = t.name
    val masked = t.columns.map { c =>
      val n = c.lowerName
      val unmaskedStatic = cfg.nonPii(table, n) || cfg.hasMappingPiiKey(table)
      val conditional = cfg.conditionalPatterns(table, n).nonEmpty
      val dependent = cfg.dependentProviders(table, n).nonEmpty
      // M11 — conditional/dependent columns mix hash & plaintext: widen to
      // string max (debezium/schema.go:393-400). VARCHAR(65535) survives the
      // masked clamp (x4 ratio then [50, 65535] range) at the max.
      val widened =
        if (conditional || dependent)
          c.copy(debeziumType = "string",
            sourceType = SourceType("VARCHAR", TypeMapper.StringMaxLength.toString))
        else c
      widened.copy(
        masked = !unmaskedStatic || conditional || dependent,
        sortOrdinal = if (cfg.sortKey(table, n)) 1 else 0,
        distKey = cfg.distKey(table, n))
    }
    // Extra key columns, sorted by name, placed first (schema.go:447-483).
    val extras: Seq[ColSpec] =
      (cfg.lengthKeys.getOrElse(table, Nil).map(n =>
        ColSpec(s"${n}_length", "int32", SourceType("INT", "10"))) ++
        cfg.mobileKeys.getOrElse(table, Nil).map(n =>
          ColSpec(s"${n}_init5", "string", SourceType("VARCHAR",
            (Masker_MobileExposedLength * 2).toString))) ++
        cfg.mappingPiiKeys.getOrElse(table, Nil).map(n =>
          ColSpec(s"hashed_$n", "string", SourceType("VARCHAR", "50"),
            masked = true)) ++
        cfg.regexBoolPatterns(table).flatMap { case (c, names) =>
          names.keys.map(nm => ColSpec(s"${c}_$nm", "boolean", SourceType("BOOL")))
        }).sortBy(_.name)
    t.copy(columns = extras ++ masked)
  }

  private val Masker_MobileExposedLength = graft.mask.Masker.MobileExposedLength

  private implicit class CfgOps(cfg: MaskConfig) {
    def regexBoolPatterns(table: String): Map[String, Map[String, String]] =
      cfg.regexPatternBooleanKeys.getOrElse(table, Map.empty)
  }
}
