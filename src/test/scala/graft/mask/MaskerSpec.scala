package graft.mask

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden vectors from the reference's mask tests
  * (tipoca-stream pkg/transformer/masker/masker_test.go; FIXTURES.md §1/§5).
  * Salt `testhash`; sha1 goldens are byte-exact. */
class MaskerSpec extends SparkSpec {
  import spark.implicits._

  private val salt = "testhash"

  test("M1 golden sha1 vectors (masker_test.go:11-43)") {
    val m = new Masker(MaskConfig(), salt)
    val out = Seq("275402", "Batman").toDF("v")
      .select(m.maskValue(col("v")).as("v")).as[String].collect()
    assert(out(0) == "95b623a5d57372c26025828015f537ad42104f9c")
    assert(out(1) == "9ba53e85b996f6278aa647d8da8f355aafd16149")
  }

  test("M1 NULL and whitespace-empty stay NULL (masker.go:150-156)") {
    val m = new Masker(MaskConfig(), salt)
    val out = Seq[Option[String]](None, Some(""), Some("  "), Some("x"))
      .toDF("v").select(m.maskValue(col("v")).as("v")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).isNullAt(0))
    assert(!out(3).isNullAt(0))
  }

  private val cfg = MaskConfig(
    nonPiiKeys = Map("customers" -> Seq("id")),
    conditionalNonPiiKeys =
      Map("customers" -> Map("email" -> Seq("%example.com", "%exampledev.com"))),
    dependentNonPiiKeys =
      Map("customers" -> Map("first_name" -> Map("last_name" -> Seq("Jones", "Dhoni")))),
    lengthKeys = Map("customers" -> Seq("email")),
    mobileKeys = Map("customers" -> Seq("mobile_number")),
    regexPatternBooleanKeys =
      Map("customers" -> Map("quote" -> Map("has_philosophy" -> "philosophy"))))

  private val masker = new Masker(cfg, salt)

  private def df1(id: String, first: String, last: String, email: String,
      mobile: String, quote: String) =
    Seq((id, first, last, email, mobile, quote))
      .toDF("id", "first_name", "last_name", "email", "mobile_number", "quote")

  test("M2 non-pii allowlist passes plaintext; others hash") {
    val r = masker(df1("42", "Bruce", "Wayne", "b@other.org", "+15551234567",
      "none"), "customers").head()
    assert(r.getAs[String]("id") == "42")
    assert(r.getAs[String]("first_name") ==
      hex1("Bruce"))
    assert(r.getAs[String]("last_name") == hex1("Wayne"))
  }

  test("M3 conditional unmask on SQL-LIKE match, case-sensitive anchoring") {
    val hit = masker(df1("1", "a", "b", "x@example.com", "m", "q"), "customers")
      .head().getAs[String]("email")
    assert(hit == "x@example.com")
    val miss = masker(df1("1", "a", "b", "x@EXAMPLE.com", "m", "q"), "customers")
      .head().getAs[String]("email")
    assert(miss == hex1("x@EXAMPLE.com"))
  }

  test("M4 dependent unmask when provider column matches") {
    val hit = masker(df1("1", "Rocky", "Jones", "e", "m", "q"), "customers")
      .head().getAs[String]("first_name")
    assert(hit == "Rocky")
    val miss = masker(df1("1", "Rocky", "Stark", "e", "m", "q"), "customers")
      .head().getAs[String]("first_name")
    assert(miss == hex1("Rocky"))
  }

  test("M5 length key: char length of original, 0 for NULL") {
    val r = masker(df1("1", "a", "b", "x@example.com", "m", "q"), "customers")
      .head()
    assert(r.getAs[Int]("email_length") == 13)
    val rn = masker(
      Seq(("1", "a", "b", null: String, "m", "q"))
        .toDF("id", "first_name", "last_name", "email", "mobile_number", "quote"),
      "customers").head()
    assert(rn.getAs[Int]("email_length") == 0)
  }

  test("M5 length key counts UTF-8 bytes, not characters (masker.go len())") {
    // "héllo" = 5 chars but 6 UTF-8 bytes; Go len(*cVal) counts bytes
    val r = masker(df1("1", "a", "b", "héllo", "m", "q"), "customers").head()
    assert(r.getAs[Int]("email_length") == 6)
  }

  test("M6 mobile key: first 5 chars exposed") {
    val r = masker(df1("1", "a", "b", "e", "+919812345678", "q"), "customers")
      .head()
    assert(r.getAs[String]("mobile_number_init5") == "+9198")
    // base column still masked
    assert(r.getAs[String]("mobile_number") == hex1("+919812345678"))
  }

  test("M7 mapping PII key: hashed copy, base table unmasked") {
    val mp = new Masker(
      MaskConfig(mappingPiiKeys = Map("t" -> Seq("phone"))), salt)
    val r = mp(Seq(("p1", "secret")).toDF("phone", "note"), "t").head()
    assert(r.getAs[String]("phone") == "p1") // unmasked (M7 side effect)
    assert(r.getAs[String]("note") == "secret")
    assert(r.getAs[String]("hashed_phone") == hex1("p1"))
  }

  test("M8 regex boolean keys: case-insensitive, false for NULL") {
    val r = masker(df1("1", "a", "b", "e", "m", "I like PHILOSOPHY a lot"),
      "customers").head()
    assert(r.getAs[String]("quote_has_philosophy") == "true")
    val r2 = masker(
      Seq(("1", "a", "b", "e", "m", null: String))
        .toDF("id", "first_name", "last_name", "email", "mobile_number", "quote"),
      "customers").head()
    assert(r2.getAs[String]("quote_has_philosophy") == "false")
  }

  test("metadata columns kafkaoffset/debeziumop pass through untouched") {
    val df = Seq(("12", "CREATE", "v")).toDF("kafkaoffset", "debeziumop", "x")
    val r = masker(df, "customers").head()
    assert(r.getAs[String]("kafkaoffset") == "12")
    assert(r.getAs[String]("debeziumop") == "CREATE")
    assert(r.getAs[String]("x") == hex1("v"))
  }

  test("maskInfo records conditional/dependent columns as masked (M11)") {
    val info = masker.maskInfo("customers",
      Seq("id", "email", "first_name", "last_name"))
    assert(!info("id").masked)
    assert(info("email").masked && info("email").conditionalNonPiiCol)
    assert(info("first_name").masked && info("first_name").dependentNonPiiCol)
    assert(info("last_name").masked)
  }

  /** Driver-side sha1(v+salt) twin for assertions. */
  private def hex1(v: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    d.digest((v + salt).getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
