package graft.streaming

import graft.SparkSpec

/** Executable form of the S1 container constraint (COVERAGE.md §2.1):
  * the spark-sql-kafka connector cannot resolve in this offline build
  * environment, so the source must (a) keep plan construction lazy
  * enough that the module loads and compiles everywhere, and (b) fail
  * at `load()` with the standard missing-provider error — NOT a
  * mis-spelled option or a silent empty stream. Everything downstream
  * of the source is MemoryStream-proven against the same DataFrame
  * contract (CdcStreamSpec). */
class KafkaEnvSpec extends SparkSpec {

  test("kafka connector absent: clear provider error at load, not before") {
    // no kafka artifact reachable on the test classpath
    assert(
      !getClass.getClassLoader
        .getResources("META-INF/services/org.apache.spark.sql.sources.DataSourceRegister")
        .asIterator().asScala
        .exists(_.toString.toLowerCase.contains("kafka")),
      "a kafka connector appeared in the container - flip S1 to a broker-backed spec")
    val e = intercept[Exception] {
      CdcStream.kafkaSource(spark, "broker:9092", "ts\\..*")
    }
    // Spark's DataSourceManager error names the missing provider and the
    // fix (deploy-time --packages), which is the operator experience we
    // want for a missing connector
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("kafka"), s"unhelpful error: ${e.getMessage}")
  }

  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  private implicit class EnumAdapter[A](e: java.util.Enumeration[A]) {
    def asIterator(): java.util.Iterator[A] =
      java.util.Collections.list(e).iterator()
  }
}
