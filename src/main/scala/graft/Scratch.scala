package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup
    noop(spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count())

    // ---- band join stage breakdown: join-only vs full query ----
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandJoinConvert
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.BandJoinStrategy

    def bucketed() = {
      // native() flips this conf and BandJoinConvert also matches the
      // equi+BETWEEN conjunction, so reset it here or every bucketed()
      // run after the first native() call silently measures BandJoinExec.
      spark.conf.set("spark.graft.bandjoin.native", "false")
      val p = Tables(spark, sfDir, "part")
        .withColumn("bucket", explode(sequence(
          floor((col("p_retailprice") - 5) / 10),
          floor((col("p_retailprice") + 5) / 10))))
      val li = Tables(spark, sfDir, "lineitem")
        .withColumn("bucket", floor(col("l_extendedprice") / 10))
      p.join(li, p("bucket") === li("bucket") &&
        li("l_extendedprice").between(
          p("p_retailprice") - 5, p("p_retailprice") + 5))
    }
    def native() = {
      spark.conf.set("spark.graft.bandjoin.native", "true")
      val p = Tables(spark, sfDir, "part")
      val li = Tables(spark, sfDir, "lineitem")
      p.join(li, li("l_extendedprice").between(
        p("p_retailprice") - 5, p("p_retailprice") + 5))
    }
    for (round <- 1 to 3) {
      time(s"r$round bucketed join only")(noop(bucketed().select(col("p_brand"))))
      time(s"r$round native   join only")(noop(native().select(col("p_brand"))))
      time(s"r$round bucketed full agg")(noop(bucketed()
        .groupBy(col("p_brand")).agg(count(lit(1)), countDistinct(col("p_partkey")))))
      time(s"r$round native   full agg")(noop(native()
        .groupBy(col("p_brand")).agg(count(lit(1)), countDistinct(col("p_partkey")))))
    }
    spark.stop()
  }
}
