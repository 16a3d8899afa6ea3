package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Catalog-wide plan audit for the filter-inlining pathology the
  * Materialize fence exists for: a predicate pushed through a
  * projection substitutes aliases with their defining expressions, and
  * inside higher-order-function lambdas there is no common-
  * subexpression elimination — so a Filter whose condition contains
  * many copies of `split(`/`transform(`/`aggregate(` re-does the heavy
  * array work per reference. Prints every catalog entry whose plan has
  * a Filter with more than THRESHOLD such occurrences (plan
  * construction only — nothing executes). */
object PlanAudit {
  private val Needles = Seq("split(trim", "transform(", "aggregate(",
    "array_distinct(", "graft_shingle", "regexp_replace(")
  private val Threshold = 3

  private def filters(p: SparkPlan): Seq[FilterExec] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => filters(a.executedPlan)
      case f: FilterExec => Seq(f)
      case _ => Nil
    }
    self ++ p.children.flatMap(filters) ++
      p.subqueries.flatMap(filters)
  }

  private def countAll(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  private def windows(p: SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
      case _ => Nil
    }
    self ++ p.children.flatMap(windows) ++ p.subqueries.flatMap(windows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Catalog.all.foreach { q =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan
        val bad = filters(plan).map { f =>
          val cond = f.condition.toString
          Needles.map(n => n -> countAll(cond, n)).filter(_._2 > 0)
        }.filter(_.map(_._2).sum > Threshold)
        if (bad.nonEmpty)
          println(s"[audit] ${q.name}: " + bad.map(_.map {
            case (n, c) => s"$n x$c"
          }.mkString(", ")).mkString(" | "))
        val unpart = windows(plan).filter(_.partitionSpec.isEmpty)
        if (unpart.nonEmpty)
          println(s"[audit-window] ${q.name}: ${unpart.size} unpartitioned " +
            unpart.map(_.child.getClass.getSimpleName).mkString("(", ",", ")"))
      } catch {
        case e: Exception =>
          println(s"[audit] ${q.name}: PLAN ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
