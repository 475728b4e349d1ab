package graft.plans

import graft.SparkSpec
import graft.queries.{DiffQueries, LlmQueries}

/** Prints formatted plans for the expensive queries (manual audit aid;
  * assertions live in PlanSpec).
  */
class PlanAuditSpec extends SparkSpec {
  test("audit: key plans contain no cartesian products or unexpected sorts") {
    for (name <- Seq("diff_full_outer", "dedup_minhash", "sim_search_topk")) {
      val plan = (DiffQueries.qs ++ LlmQueries.qs)(name)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") || name == "sim_search_topk",
        s"$name has a nested-loop join:\n$plan")
    }
  }
}
