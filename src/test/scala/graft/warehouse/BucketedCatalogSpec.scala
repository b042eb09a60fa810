package graft.warehouse

import graft.SparkSpec
import graft.core.Cdc
import org.apache.spark.sql.functions._

class BucketedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bucket").toString

  test("merge rewrites only affected buckets; result matches plain catalog") {
    val root = tmp()
    val cat = new BucketedCatalog(spark, root, nBuckets = 16)
    val plain = new ParquetCatalog(spark, tmp())

    val target = (1 to 200).map(i => (i, s"v$i")).toDF("pk", "v")
    cat.save("s", "t", target, Seq("pk"))
    plain.save("s", "t", target)
    assert(cat.buckets("s", "t").size > 8) // keys spread over buckets

    // record per-bucket file state before the merge
    def bucketFiles(): Map[String, Set[String]] = {
      val base = new java.io.File(s"$root/s/t")
      base.listFiles.filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles.map(f => f.getName + ":" + f.lastModified)
          .toSet
      }.toMap
    }
    val before = bucketFiles()

    // a small batch touching 2 PKs
    val stage = Seq(
      ("10", Cdc.OpUpdate, 7, "v7b"),
      ("11", Cdc.OpDelete, 8, "v8"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")
    cat.merge("s", "t", stage, Seq("pk"))
    plain.merge("s", "t", stage, Seq("pk"))

    // correctness: same content as the plain catalog
    val got = cat.load("s", "t").select("pk", "v")
      .as[(Int, String)].collect().toMap
    val want = plain.load("s", "t").as[(Int, String)].collect().toMap
    assert(got == want)
    assert(got(7) == "v7b" && !got.contains(8) && got(9) == "v9")

    // efficiency: untouched buckets' files unchanged
    val after = bucketFiles()
    val touched = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(touched.size <= 2, s"touched $touched")
  }

  test("crash recovery: bucket stranded in __trash is restored on load") {
    val root = tmp()
    val cat = new BucketedCatalog(spark, root, nBuckets = 4)
    cat.save("s", "t", (1 to 40).map(i => (i, s"v$i")).toDF("pk", "v"), Seq("pk"))
    val before = cat.load("s", "t").count()
    // simulate the crash window: a bucket renamed aside but its
    // replacement never renamed in
    val buckets = new java.io.File(s"$root/s/t").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    val victim = buckets.head
    val trash = new java.io.File(s"$root/s/t__trash")
    assert(trash.mkdirs())
    assert(victim.renameTo(new java.io.File(trash, victim.getName)))
    // load() must restore the stranded bucket and clear the trash
    assert(cat.load("s", "t").count() == before)
    assert(!trash.exists())
  }

  test("crash recovery: evolving-swap window restores from __old") {
    val root = tmp()
    val cat = new BucketedCatalog(spark, root, nBuckets = 4)
    cat.save("s", "t", Seq((1, "a"), (2, "b")).toDF("pk", "v"), Seq("pk"))
    // simulate the crash between rename(tgt, old) and rename(shadow, tgt)
    assert(new java.io.File(s"$root/s/t")
      .renameTo(new java.io.File(s"$root/s/t__old")))
    assert(cat.exists("s", "t")) // recovery restores the table
    assert(cat.load("s", "t").count() == 2)
  }

  test("first merge creates the bucketed table") {
    val cat = new BucketedCatalog(spark, tmp(), nBuckets = 4)
    val stage = Seq(("1", Cdc.OpCreate, 1, "a"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")
    cat.merge("s", "t", stage, Seq("pk"))
    assert(cat.load("s", "t").select("pk", "v")
      .as[(Int, String)].collect().toSeq == Seq((1, "a")))
  }

  test("schema-evolving merge full-rewrites; all buckets stay consistent") {
    val root = tmp()
    val cat = new BucketedCatalog(spark, root, nBuckets = 8)
    cat.save("s", "t", (1 to 100).map(i => (i, s"v$i")).toDF("pk", "v"),
      Seq("pk"))

    // stage carries a NEW column: must trigger the full-table rewrite, not
    // a per-bucket patch that would leave heterogeneous schemas
    val stage = Seq(("1", Cdc.OpUpdate, 7, "v7b", "extra7"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v", "extra")
    cat.merge("s", "t", stage, Seq("pk"))

    val loaded = cat.load("s", "t")
    assert(loaded.columns.contains("extra"))
    val got = loaded.select("pk", "v", "extra")
      .as[(Int, String, Option[String])].collect()
      .map { case (k, v, e) => k -> ((v, e)) }.toMap
    assert(got(7) == (("v7b", Some("extra7"))))
    assert(got(8) == (("v8", None))) // untouched rows: new column null
    assert(got.size == 100)

    // a later merge must NOT lose the new column (the round-1 advice bug:
    // footer-sampled schema dropped it and rewrote buckets without it)
    val stage2 = Seq(("2", Cdc.OpUpdate, 9, "v9b", "extra9"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v", "extra")
    cat.merge("s", "t", stage2, Seq("pk"))
    val again = cat.load("s", "t").select("pk", "v", "extra")
      .as[(Int, String, Option[String])].collect()
      .map { case (k, v, e) => k -> ((v, e)) }.toMap
    assert(again(7) == (("v7b", Some("extra7"))))
    assert(again(9) == (("v9b", Some("extra9"))))
  }

  test("stage MISSING a column stays on the per-bucket path, schema intact") {
    val root = tmp()
    val cat = new BucketedCatalog(spark, root, nBuckets = 8)
    cat.save("s", "t",
      (1 to 100).map(i => (i, s"v$i", s"e$i")).toDF("pk", "v", "extra"),
      Seq("pk"))
    def files(): Map[String, Set[String]] = {
      val base = new java.io.File(s"$root/s/t")
      base.listFiles.filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles.map(f => f.getName + ":" + f.lastModified).toSet
      }.toMap
    }
    val before = files()
    // all-null / dropped column batch (the NDJSON shape): must NOT force
    // a full-table rewrite — union-by-name against the full-schema slice
    // keeps patched buckets homogeneous
    val stage = Seq(("1", Cdc.OpUpdate, 7, "v7b"))
      .toDF(Cdc.OffsetColumn, Cdc.OperationColumn, "pk", "v")
    cat.merge("s", "t", stage, Seq("pk"))
    val touched = files().keySet.filter(k => before.get(k) != files().get(k))
    assert(touched.size <= 1, s"full rewrite happened: $touched")
    val got = cat.load("s", "t").select("pk", "v", "extra")
      .as[(Int, String, Option[String])].collect()
      .map { case (k, v, e) => k -> ((v, e)) }.toMap
    assert(got(7) == (("v7b", None))) // replaced row: missing col null
    assert(got(8) == (("v8", Some("e8")))) // untouched rows keep all cols
    assert(got.size == 100)
  }

  test("scan of one bucket prunes partitions") {
    val cat = new BucketedCatalog(spark, tmp(), nBuckets = 8)
    cat.save("s", "t", (1 to 50).map(i => (i, s"v$i")).toDF("pk", "v"),
      Seq("pk"))
    val plan = cat.load("s", "t").filter(col("bucket") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"), plan)
  }
}
