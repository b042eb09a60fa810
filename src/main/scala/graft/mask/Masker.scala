package graft.mask

import graft.core.Cdc
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column mask metadata — drives warehouse DDL type overrides
  * (reference pkg/serializer/serializer.go:16-34 MaskInfo). */
final case class MaskInfo(
    masked: Boolean,
    sortCol: Boolean = false,
    distCol: Boolean = false,
    lengthCol: Boolean = false,
    mobileCol: Boolean = false,
    mappingPiiCol: Boolean = false,
    conditionalNonPiiCol: Boolean = false,
    dependentNonPiiCol: Boolean = false,
    regexBoolCol: Boolean = false)

/** The masking stage (SURVEY §2.3 M1-M8): default is mask EVERY column with
  * salted SHA-1; the config selectively unmasks or adds derived key columns.
  *
  * Semantics from tipoca-stream pkg/transformer/masker/masker.go:61-207 and
  * mask_config.go:322-516. Compiled to a single declarative projection of
  * `when`-chains over built-in functions (sha1/concat/rlike/isin/length/
  * substring) — one codegen'd stage, no per-row interpretation, so masking
  * is shuffle-free and scales linearly with input splits.
  *
  * @param hash hash used for M1; `Masker.Sha1` matches the reference's
  *             golden vectors (masker_test.go:11-43). Pluggable because some
  *             oracles (DuckDB) lack sha1.
  */
final class Masker(
    cfg: MaskConfig,
    salt: String,
    hash: (Column, String) => Column = Masker.Sha1) {

  private val ignore = Set(Cdc.OffsetColumn, Cdc.OperationColumn)

  /** M1 — hash mask; NULL/whitespace-empty stays NULL (masker.go:150-156). */
  def maskValue(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(null).cast(StringType))
      .otherwise(hash(c, salt))

  /** Unmask predicate for one column (mask_config.go PerformUnMasking:
    * 478-496). `allCols` supplies dependent-key provider values. */
  private def unmaskPredicate(
      table: String, name: String, c: Column,
      allCols: Map[String, Column]): Column = {
    var p: Column = lit(ignore.contains(name) || cfg.nonPii(table, name) ||
      cfg.hasMappingPiiKey(table))
    // M3 — conditional: value matches any anchored SQL-LIKE pattern,
    // case-sensitive (mask_config.go:498-547).
    for (pat <- cfg.conditionalPatterns(table, name))
      p = p || (c.isNotNull && c.rlike(MaskConfig.likeToRegex(pat)))
    // M4 — dependent: provider column equals any listed value
    // (mask_config.go:549-597).
    for ((prov, vals) <- cfg.dependentProviders(table, name); v <- vals)
      allCols.get(prov).foreach { pc => p = p || (pc.cast(StringType) === v) }
    p
  }

  /** Apply masking to every column of `df` for `table`. Input columns are
    * stringified (the transform stage already emits strings). Extra key
    * columns (M5-M8) are appended after the base columns. */
  def apply(df: DataFrame, table: String): DataFrame = {
    val names = df.columns.toSeq
    val allCols = names.map(n => n -> col(n).cast(StringType)).toMap

    val base = names.map { n =>
      val c = allCols(n)
      if (ignore.contains(n)) col(n)
      else {
        val unmask = unmaskPredicate(table, n, c, allCols)
        when(c.isNull || trim(c) === "", lit(null).cast(StringType))
          .when(unmask, c)
          .otherwise(hash(c, salt))
          .as(n)
      }
    }

    val extras = names.flatMap { n =>
      val c = allCols(n)
      val length =
        // M5 — length key: UTF-8 byte length of original (Go len(*cVal),
        // masker.go:99-111), 0 for NULL.
        if (cfg.lengthKey(table, n))
          Seq(coalesce(octet_length(c), lit(0)).as(s"${n}_length"))
        else Nil
      val mobile =
        // M6 — mobile key: first 5 chars (masker.go:112-132).
        if (cfg.mobileKey(table, n))
          Seq(substring(c, 1, Masker.MobileExposedLength).as(s"${n}_init5"))
        else Nil
      val mapping =
        // M7 — mapping PII key: hashed copy; base table stays unmasked
        // (masker.go:133-146,159-162).
        if (cfg.mappingPiiKey(table, n)) Seq(maskValue(c).as(s"hashed_$n"))
        else Nil
      val bools =
        // M8 — regex-pattern boolean keys: case-insensitive substring
        // match over free text, "true"/"false", false for NULL
        // (mask_config.go:322-375).
        cfg.regexBoolPatterns(table, n).toSeq.sortBy(_._1).map {
          case (name, pat) =>
            when(c.isNotNull && c.rlike("(?i)" + pat), lit("true"))
              .otherwise(lit("false")).as(s"${n}_$name")
        }
      length ++ mobile ++ mapping ++ bools
    }

    df.select((base ++ extras): _*)
  }

  /** Mask metadata per column — consumed by DDL emission (M9, M11, M12). */
  def maskInfo(table: String, names: Seq[String]): Map[String, MaskInfo] =
    names.map { n =>
      val unmaskedStatic = ignore.contains(n) || cfg.nonPii(table, n) ||
        cfg.hasMappingPiiKey(table)
      val conditional = cfg.conditionalPatterns(table, n).nonEmpty
      val dependent = cfg.dependentProviders(table, n).nonEmpty
      // Conditional/dependent columns are recorded masked regardless —
      // they mix hash and plaintext rows (masker.go:177-181).
      val masked = !unmaskedStatic || conditional || dependent
      n -> MaskInfo(
        masked = masked,
        sortCol = cfg.sortKey(table, n),
        distCol = cfg.distKey(table, n),
        lengthCol = cfg.lengthKey(table, n),
        mobileCol = cfg.mobileKey(table, n),
        mappingPiiCol = cfg.mappingPiiKey(table, n),
        conditionalNonPiiCol = conditional,
        dependentNonPiiCol = dependent,
        regexBoolCol = cfg.regexBoolPatterns(table, n).nonEmpty)
    }.toMap
}

object Masker {
  val MobileExposedLength = 5 // masker.go:15-17

  /** Reference hash: lowercase-hex sha1(value ‖ salt) (masker.go:37-43). */
  val Sha1: (Column, String) => Column =
    (c, salt) => sha1(concat(c.cast(StringType), lit(salt)))

  /** sha256 variant for oracles that lack sha1 (same shape, 64 hex chars). */
  val Sha256: (Column, String) => Column =
    (c, salt) => sha2(concat(c.cast(StringType), lit(salt)), 256)
}
