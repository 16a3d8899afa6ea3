package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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

    val docs = Tables(spark, sfDir, "documents")
    time("scan docs")(noop(docs))
    val tg = docs.repartition(col("doc_id")).select(col("doc_id"), col("lang"),
      graft.functions.GraftFunctions.charNGrams(col("text"), 3).as("tg"))
    time("charNGrams")(noop(tg))
    val ex0 = tg.select(col("doc_id"), col("lang"), explode(col("tg")).as("t"))
    time("explode")(noop(ex0))
    val ex = ex0.distinct()
    time("distinct")(noop(ex))
    val exP = ex.persist()
    time("persist+count")(exP.count())
    val dfreq = exP.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("cnt"))
    time("dfreq")(noop(dfreq))
    val w = org.apache.spark.sql.expressions.Window
    val wp = w.partitionBy(col("lang")).orderBy(col("cnt").desc, col("t").asc)
    val profile = dfreq.withColumn("rn", row_number().over(wp))
      .where(col("rn") <= 30)
      .select(col("lang").as("plang"), col("t"))
    time("profile")(noop(profile))
    val scores = exP.select(col("doc_id"), col("t"))
      .join(broadcast(profile), "t")
      .groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("n"))
    time("scores")(noop(scores))
    val wb = w.partitionBy(col("doc_id")).orderBy(col("n").desc, col("plang").asc)
    val best = scores.withColumn("rn", row_number().over(wb))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("guess"), col("n").as("best_score"))
    time("best")(noop(best))
    val out = docs.select(col("doc_id"), col("lang"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang").as("declared"),
        coalesce(col("guess"), lit("unknown")).as("guess"),
        coalesce(col("best_score"), lit(0L)).as("best_score"),
        (col("guess") === col("lang")).as("is_match"))
    time("full")(noop(out))
    spark.stop()
  }
}
