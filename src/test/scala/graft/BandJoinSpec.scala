package graft

import graft.plans.BandJoinRewrite
import org.apache.spark.sql.functions._

/** The band-join optimizer rule: a naive BETWEEN join plans as a
  * nested-loop cross product; with the rule it becomes a bucketed hash
  * join with identical results. */
class BandJoinSpec extends SparkSpecBase {

  private def bandJoin = {
    val p = Tables(spark, sfDir, "part")
    val li = Tables(spark, sfDir, "lineitem")
    p.join(li, li("l_extendedprice").between(
        p("p_retailprice") - 5, p("p_retailprice") + 5))
      .groupBy(p("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  test("without the rule: nested-loop; with it: hash join, same result") {
    // the rule is wired session-wide through spark.sql.extensions;
    // the naive baseline uses its kill switch
    spark.conf.set("spark.graft.bandjoin.enabled", "false")
    val (naivePlan, expected) = try {
      (bandJoin.queryExecution.executedPlan.toString,
        bandJoin.collect()
          .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq)
    } finally spark.conf.unset("spark.graft.bandjoin.enabled")
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"),
      s"expected the naive plan to be a cross product:\n$naivePlan")

    val optPlan = bandJoin.queryExecution.executedPlan.toString
    assert(!optPlan.contains("BroadcastNestedLoopJoin") &&
      !optPlan.contains("CartesianProduct"),
      s"band join not rewritten:\n$optPlan")
    assert(optPlan.contains("__graft_bucket"),
      s"rewrite marker missing:\n$optPlan")
    val got = bandJoin.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("swapped orientation (banded column on the right child) rewrites too") {
    val p = Tables(spark, sfDir, "part")
    val li = Tables(spark, sfDir, "lineitem")
    // here the banded variable (p_retailprice) sits on the LEFT child
    // and the band anchor (l_extendedprice) on the RIGHT — the mirror
    // of the first test's orientation
    def q = p.join(li, p("p_retailprice").between(
        li("l_extendedprice") - 5, li("l_extendedprice") + 5))
      .groupBy(li("l_returnflag").as("rf"))
      .agg(count(lit(1)).as("n_pairs"))
    val expected = q.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"swapped band join not rewritten:\n$plan")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got === expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }

  test("rule leaves plain equi-joins and already-bucketed joins alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      val o = Tables(spark, sfDir, "orders")
      val c = Tables(spark, sfDir, "customer")
      val equi = o.join(c, o("o_custkey") === c("c_custkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      // hand-bucketed query from the catalog still passes through
      val handBucketed = Catalog.byName("q_range_join_bucketed").fn(spark, sfDir)
      assert(handBucketed.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }
}
