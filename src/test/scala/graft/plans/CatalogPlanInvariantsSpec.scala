package graft.plans

import graft.SparkSpec

/** Enforced plan invariants over the ENTIRE query catalog (PLANS.md is
  * the human review artifact; this is the gate): no query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin at sf0.001. Catches the
  * class of regression where an innocent-looking change (a crossJoin
  * for scalars, a non-equi condition Catalyst can't band) reintroduces
  * an all-pairs plan that local row counts would hide until 100×.
  */
class CatalogPlanInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no catalog query plans a cartesian or nested-loop join") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan.toString
          catch {
            case e: Throwable =>
              fail(s"$name failed to plan: ${e.getClass.getName}: " +
                e.getMessage)
          }
        if (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")) Some(name)
        else None
      }
    graft.core.Metrics.drainUnpersist()
    assert(offenders.isEmpty,
      s"cartesian/BNLJ plans in catalog: ${offenders.mkString(", ")}")
  }
}
