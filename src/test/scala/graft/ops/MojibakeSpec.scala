package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def signals(s: String): (Long, Long, Boolean) = {
    val df = Seq(Tuple1(s)).toDF("t")
    val cols = TextOps.mojibakeColumns(col("t"))
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Boolean)].head()
  }

  private def repaired(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.repairMojibake(col("t")).as("r")).as[String].head()

  test("detector counts every damage family; clean text is clean") {
    assert(signals("cafÃ© visit") == (1L, 0L, true)) // "cafÃ©"
    assert(signals("itâ€™s here") == (1L, 0L, true)) // "itâ€™s"
    assert(signals("lost � bytes") == (0L, 1L, true))
    assert(signals("plain ascii text") == (0L, 0L, false))
    assert(signals("café déjà") == (0L, 0L, false),
      "correctly-encoded accents are NOT damage")
  }

  test("repair restores the original text; replacement chars survive") {
    assert(repaired("cafÃ©") == "café")
    assert(repaired("itâ€™s") == "it's")
    // longest-first: the 3-char CP1252 artifact rewrites as a unit
    assert(repaired("aâ€“b") == "a-b")
    assert(repaired("keep � as-is") == "keep � as-is")
    assert(repaired(null.asInstanceOf[String]) == "")
  }

  test("repair round-trips synthetic damage and detector goes quiet") {
    // damage a sentence the way a Latin-1 mis-decode would, then repair
    val clean = "résumé of the fête" // é..é..ê (ê not in map)
    val damaged = clean.flatMap {
      case 'é' => "Ã©"
      case c => c.toString
    }
    assert(signals(damaged)._1 == 2L)
    assert(repaired(damaged) == clean)
    assert(signals(repaired(damaged)) == (0L, 0L, false))
  }

  test("no map entry can half-match another after repair (order safety)") {
    // every damaged key, concatenated, repairs to exactly the values
    val allBad = TextOps.MojibakeMap.map(_._1).mkString(" ")
    val allGood = TextOps.MojibakeMap.map(_._2).mkString(" ")
    assert(repaired(allBad) == allGood)
    assert(signals(allBad)._1 == TextOps.MojibakeMap.size.toLong)
  }
}
