package graft.mask

/** YAML mask-config parsing — same file format as the reference
  * (pkg/transformer/masker/database.yaml; MASKING.md). */
class MaskConfigSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val yaml =
    """non_pii_keys:
      |  customers:
      |    - id
      |    - Created_At
      |conditional_non_pii_keys:
      |  customers:
      |    EMAIL:
      |      - "%example.com"
      |      - "%exampledev.com"
      |dependent_non_pii_keys:
      |  customers:
      |    first_name:
      |      last_name:
      |        - Jones
      |        - Dhoni
      |length_keys:
      |  customers:
      |    - email
      |mobile_keys:
      |  customers:
      |    - mobile_number
      |mapping_pii_keys:
      |  reservations:
      |    - phone_number
      |sort_keys:
      |  customers:
      |    - created_at
      |dist_keys:
      |  customers:
      |    - id
      |include_tables:
      |  - customers
      |  - reservations
      |regex_pattern_boolean_keys:
      |  customers:
      |    favourite_quote:
      |      has_philosophy: philosophy
      |""".stripMargin

  private val cfg = MaskConfig.parse(yaml)

  test("column names lowercased on load (mask_config.go:180-190)") {
    assert(cfg.nonPii("customers", "created_at"))
    assert(cfg.conditionalPatterns("customers", "email") ==
      Seq("%example.com", "%exampledev.com"))
  }

  test("nested key structures") {
    assert(cfg.dependentProviders("customers", "first_name") ==
      Map("last_name" -> Seq("Jones", "Dhoni")))
    assert(cfg.regexBoolPatterns("customers", "favourite_quote") ==
      Map("has_philosophy" -> "philosophy"))
    assert(cfg.mappingPiiKey("reservations", "phone_number"))
    assert(cfg.sortKey("customers", "created_at"))
    assert(cfg.distKey("customers", "id"))
  }

  test("include_tables filter (M10)") {
    assert(cfg.tableIncluded("customers"))
    assert(!cfg.tableIncluded("orders"))
    assert(MaskConfig.parse("{}").tableIncluded("anything"))
  }

  test("LIKE to regex: % wildcard, anchored, case-sensitive") {
    assert(MaskConfig.likeToRegex("%example.com") == "^.*example.com$")
    assert("x@example.com".matches(MaskConfig.likeToRegex("%example.com")))
    assert(!"x@example.com.evil".matches(MaskConfig.likeToRegex("%example.com")))
  }

  test("empty / missing sections parse to empty config") {
    val empty = MaskConfig.parse("")
    assert(empty.nonPiiKeys.isEmpty && empty.includeTables.isEmpty)
  }
}
