package graft.mask

/** O3 — mask-config diff (tipoca-stream pkg/transformer/masker/
  * mask_diff.go:95-112, controllers/mask_diff.go:16-128): compare two
  * versions of the mask config and report which tables' masking rules
  * changed — those tables must be reloaded (rebuilt into `_reload_<v>` and
  * released, SURVEY §2.7 O2/O6).
  */
object MaskDiff {

  /** Tables whose effective masking differs between `current` and `desired`
    * (lowercased table names). A table absent from both maps in a given key
    * class contributes nothing. */
  def changedTables(current: MaskConfig, desired: MaskConfig): Set[String] = {
    def keys[V](m: MaskConfig => Map[String, V]): Set[String] =
      (m(current).keySet ++ m(desired).keySet)
        .filter(t => m(current).get(t) != m(desired).get(t))

    (keys(_.nonPiiKeys) ++
      keys(_.conditionalNonPiiKeys) ++
      keys(_.dependentNonPiiKeys) ++
      keys(_.lengthKeys) ++
      keys(_.mobileKeys) ++
      keys(_.mappingPiiKeys) ++
      keys(_.sortKeys) ++
      keys(_.distKeys) ++
      keys(_.regexPatternBooleanKeys)).map(_.toLowerCase)
  }

  /** True when nothing changed — no reloads needed. */
  def identical(current: MaskConfig, desired: MaskConfig): Boolean =
    changedTables(current, desired).isEmpty &&
      current.includeTables == desired.includeTables
}
