package graft

import graft.plans.{BandJoinConvert, BandJoinStrategy}
import org.apache.spark.sql.functions._

/** The native band-join physical operator: one bucketed shuffle,
  * results identical to the naive BETWEEN join. */
class BandJoinNativeSpec extends SparkSpecBase {

  private def bandJoin = {
    val p = Tables(spark, sfDir, "part")
    val li = Tables(spark, sfDir, "lineitem")
    p.join(li, li("l_extendedprice").between(
        p("p_retailprice") - 5, p("p_retailprice") + 5))
      .groupBy(p("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private def integralBand = {
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    val c = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("cck"), col("c_nationkey").as("nk"))
    o.join(c, o("ck") >= c("cck") - 2 && o("ck") <= c("cck") + 3)
      .groupBy(col("nk")).agg(count(lit(1)).as("n"))
  }

  private def withNative[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinConvert
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ BandJoinStrategy
    spark.conf.set("spark.graft.bandjoin.native", "true")
    try body
    finally {
      spark.conf.set("spark.graft.bandjoin.native", "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq BandJoinConvert)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ eq BandJoinStrategy)
    }
  }

  // SparkPlan.nodeName strips the "Exec" suffix, so the physical node
  // prints as "BandJoin <x>: ..."
  private def assertNative(plan: String): Unit = {
    assert(plan.contains("BandJoin "), s"native operator not planned:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"fallback to cross product:\n$plan")
  }

  test("plans as BandJoinExec and matches the naive join (double band)") {
    val expected = bandJoin.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    withNative {
      assertNative(bandJoin.queryExecution.executedPlan.toString)
      val got = bandJoin.collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got === expected)
    }
  }

  test("integral band (exact LONG bucketing) matches the naive join") {
    val expected = integralBand.collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    withNative {
      assertNative(integralBand.queryExecution.executedPlan.toString)
      val got = integralBand.collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got === expected)
    }
  }

  test("null band operands produce no pairs (inner semantics)") {
    import spark.implicits._
    // def, not val: a materialized QueryExecution is cached per Dataset,
    // so a pre-built frame would keep its pre-native plan
    def j = {
      val l = Seq(Some(1.0), None, Some(10.0)).toDF("xv")
      val r = Seq(Some(1.5), None, Some(20.0)).toDF("yv")
      l.join(r, l("xv") >= r("yv") - 1 && l("xv") <= r("yv") + 1)
    }
    val expected = j.collect().map(_.toString).sorted.toSeq
    withNative {
      assertNative(j.queryExecution.executedPlan.toString)
      val got = j.collect().map(_.toString).sorted.toSeq
      assert(got === expected)
      assert(!got.exists(_.contains("null")))
    }
  }
}
