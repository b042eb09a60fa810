package graft.mask

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Masking configuration — same YAML file format as the reference
  * (tipoca-stream pkg/transformer/masker/mask_config.go:24-60; MASKING.md).
  *
  * Table keys are kept as written; column names are lowercased on load
  * (mask_config.go:180-190), matching warehouse lowercase column naming.
  */
final case class MaskConfig(
    nonPiiKeys: Map[String, Seq[String]] = Map.empty,
    conditionalNonPiiKeys: Map[String, Map[String, Seq[String]]] = Map.empty,
    dependentNonPiiKeys: Map[String, Map[String, Map[String, Seq[String]]]] = Map.empty,
    lengthKeys: Map[String, Seq[String]] = Map.empty,
    mobileKeys: Map[String, Seq[String]] = Map.empty,
    mappingPiiKeys: Map[String, Seq[String]] = Map.empty,
    sortKeys: Map[String, Seq[String]] = Map.empty,
    distKeys: Map[String, Seq[String]] = Map.empty,
    includeTables: Option[Seq[String]] = None,
    regexPatternBooleanKeys: Map[String, Map[String, Map[String, String]]] = Map.empty) {

  def nonPii(table: String, col: String): Boolean =
    nonPiiKeys.getOrElse(table, Nil).contains(col)
  def lengthKey(table: String, col: String): Boolean =
    lengthKeys.getOrElse(table, Nil).contains(col)
  def mobileKey(table: String, col: String): Boolean =
    mobileKeys.getOrElse(table, Nil).contains(col)
  def mappingPiiKey(table: String, col: String): Boolean =
    mappingPiiKeys.getOrElse(table, Nil).contains(col)
  def hasMappingPiiKey(table: String): Boolean = mappingPiiKeys.contains(table)
  def sortKey(table: String, col: String): Boolean =
    sortKeys.getOrElse(table, Nil).contains(col)
  def distKey(table: String, col: String): Boolean =
    distKeys.getOrElse(table, Nil).contains(col)
  def conditionalPatterns(table: String, col: String): Seq[String] =
    conditionalNonPiiKeys.getOrElse(table, Map.empty).getOrElse(col, Nil)
  def dependentProviders(table: String, col: String): Map[String, Seq[String]] =
    dependentNonPiiKeys.getOrElse(table, Map.empty).getOrElse(col, Map.empty)
  def regexBoolPatterns(table: String, col: String): Map[String, String] =
    regexPatternBooleanKeys.getOrElse(table, Map.empty).getOrElse(col, Map.empty)
  def tableIncluded(table: String): Boolean =
    includeTables.forall(_.contains(table.toLowerCase))
}

object MaskConfig {

  /** SQL-LIKE pattern → anchored regex (mask_config.go:444-452: `%` → `.*`,
    * `^…$`, case-SENSITIVE). */
  def likeToRegex(pattern: String): String =
    "^" + pattern.replace("%", ".*") + "$"

  def load(path: String): MaskConfig =
    parse(Files.readString(Paths.get(path)))

  def parse(yamlText: String): MaskConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = Option(yaml.load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala).getOrElse(scala.collection.mutable.Map.empty)

    def strSeq(v: Object): Seq[String] =
      v.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(String.valueOf)

    def tableCols(key: String): Map[String, Seq[String]] =
      root.get(key).collect { case m: java.util.Map[_, _] =>
        m.asScala.collect { case (t, cols) if cols != null =>
          String.valueOf(t) -> strSeq(cols.asInstanceOf[Object]).map(_.toLowerCase)
        }.toMap
      }.getOrElse(Map.empty)

    def nested2(key: String): Map[String, Map[String, Seq[String]]] =
      root.get(key).collect { case m: java.util.Map[_, _] =>
        m.asScala.collect { case (t, colsRaw) if colsRaw != null =>
          val cols = colsRaw.asInstanceOf[java.util.Map[Object, Object]].asScala
          String.valueOf(t) -> cols.collect { case (c, pats) if pats != null =>
            String.valueOf(c).toLowerCase -> strSeq(pats)
          }.toMap
        }.toMap
      }.getOrElse(Map.empty)

    def nested3(key: String): Map[String, Map[String, Map[String, Seq[String]]]] =
      root.get(key).collect { case m: java.util.Map[_, _] =>
        m.asScala.collect { case (t, colsRaw) if colsRaw != null =>
          val cols = colsRaw.asInstanceOf[java.util.Map[Object, Object]].asScala
          String.valueOf(t) -> cols.collect { case (c, provRaw) if provRaw != null =>
            val provs = provRaw.asInstanceOf[java.util.Map[Object, Object]].asScala
            String.valueOf(c).toLowerCase -> provs.collect {
              case (p, vals) if vals != null =>
                String.valueOf(p).toLowerCase -> strSeq(vals)
            }.toMap
          }.toMap
        }.toMap
      }.getOrElse(Map.empty)

    def nestedStr(key: String): Map[String, Map[String, Map[String, String]]] =
      root.get(key).collect { case m: java.util.Map[_, _] =>
        m.asScala.collect { case (t, colsRaw) if colsRaw != null =>
          val cols = colsRaw.asInstanceOf[java.util.Map[Object, Object]].asScala
          String.valueOf(t) -> cols.collect { case (c, namesRaw) if namesRaw != null =>
            val names = namesRaw.asInstanceOf[java.util.Map[Object, Object]].asScala
            String.valueOf(c).toLowerCase -> names.map { case (n, p) =>
              String.valueOf(n).toLowerCase -> String.valueOf(p)
            }.toMap
          }.toMap
        }.toMap
      }.getOrElse(Map.empty)

    MaskConfig(
      nonPiiKeys = tableCols("non_pii_keys"),
      conditionalNonPiiKeys = nested2("conditional_non_pii_keys"),
      dependentNonPiiKeys = nested3("dependent_non_pii_keys"),
      lengthKeys = tableCols("length_keys"),
      mobileKeys = tableCols("mobile_keys"),
      mappingPiiKeys = tableCols("mapping_pii_keys"),
      sortKeys = tableCols("sort_keys"),
      distKeys = tableCols("dist_keys"),
      includeTables = root.get("include_tables").collect {
        case l: java.util.List[_] =>
          l.asScala.toSeq.map(v => String.valueOf(v).toLowerCase)
      },
      regexPatternBooleanKeys = nestedStr("regex_pattern_boolean_keys")
    )
  }
}
