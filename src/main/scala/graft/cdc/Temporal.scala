package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium temporal-encoding conversions as Catalyst column expressions.
  *
  * Semantics from tipoca-stream pkg/transformer/debezium/message.go:113-266
  * (`convertDebeziumFormattedTime` and helpers); golden vectors in
  * message_test.go:7-116. All conversions are UTC (the session must run with
  * spark.sql.session.timeZone=UTC). Everything composes from built-in
  * codegen'd functions — no UDFs — so these stay inside whole-stage codegen
  * at any scale.
  *
  * One deliberate divergence: the reference derives the fractional part from
  * `strconv.Itoa(nanosecond)[:n]`, which drops leading zeros (message.go:
  * 160-171) — e.g. 50ms would render ".50" instead of ".05". We zero-pad the
  * nanosecond field to 9 digits before truncating, which matches every
  * published golden vector and is correct for the cases the reference gets
  * wrong.
  */
object Temporal {

  private val epoch = to_date(lit("1970-01-01"))

  /** DATE: int days since epoch → "yyyy-MM-dd" (message.go:131-139). */
  def debeziumDate(days: Column): Column =
    date_format(date_add(epoch, days.cast(IntegerType)), "yyyy-MM-dd")

  /** TIMESTAMP: ISO "1988-08-21T14:01:02Z" → "1988-08-21 14:01:02"
    * (message.go:141-145 — plain string surgery, T→space, Z dropped). */
  def debeziumTimestamp(ts: Column): Column =
    regexp_replace(regexp_replace(ts, "T", " "), "Z", "")

  private def fraction(nanos: Column, length: Int): Column =
    substring(lpad(nanos.cast(StringType), 9, "0"), 1, length)

  private def withFraction(base: Column, nanos: Column, length: Int): Column =
    if (length == 0) base
    else concat(base, lit("."), fraction(nanos, length))

  /** DATETIME(n), n<=3: epoch millis → "yyyy-MM-dd HH:mm:ss[.frac(n)]"
    * (message.go:147-171). */
  def debeziumDatetimeMillis(ms: Column, length: Int): Column = {
    val msL = ms.cast(LongType)
    val base = date_format(timestamp_millis(msL), "yyyy-MM-dd HH:mm:ss")
    withFraction(base, pmod(msL, lit(1000L)) * lit(1000000L), length)
  }

  /** DATETIME(n), n>3: epoch micros → "yyyy-MM-dd HH:mm:ss.frac(n)"
    * (message.go:173-201). */
  def debeziumDatetimeMicros(us: Column, length: Int): Column = {
    val usL = us.cast(LongType)
    val base = date_format(timestamp_micros(usL), "yyyy-MM-dd HH:mm:ss")
    withFraction(base, pmod(usL, lit(1000000L)) * lit(1000L), length)
  }

  /** DATETIME dispatch on declared source column length (message.go:222-253):
    * length<=3 → millis, otherwise micros. */
  def debeziumDatetime(v: Column, sourceLength: String): Column = {
    val n = if (sourceLength.isEmpty) 0 else sourceLength.toInt
    if (n <= 3) debeziumDatetimeMillis(v, n) else debeziumDatetimeMicros(v, n)
  }

  /** TIME: epoch micros → "HH:mm:ss" (message.go:203-208). */
  def debeziumTime(us: Column): Column =
    date_format(timestamp_micros(us.cast(LongType)), "HH:mm:ss")

  /** Dispatch mirroring convertDebeziumFormattedTime (message.go:213-266). */
  def convert(v: Column, sourceType: String, sourceLength: String): Column =
    sourceType.toUpperCase match {
      case "DATE" => debeziumDate(v)
      case "TIMESTAMP" => debeziumTimestamp(v)
      case "DATETIME" => debeziumDatetime(v, sourceLength)
      case "TIME" => debeziumTime(v)
      case other =>
        throw new IllegalArgumentException(s"unhandled temporal source type: $other")
    }
}
