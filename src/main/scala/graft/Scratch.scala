package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // ---- cost of BoundedWindow's materialize(0) constant key vs a
    // bare unpartitioned window, mechanism isolation ----
    val m0 = graft.functions.GraftFunctions.materialize(lit(0))
    for (n <- Seq(3000000L)) {
      val base = spark.range(n).select(col("id"),
        (col("id") * 2654435761L % 1000).as("v"))
      val variants = Seq(
        "A empty (v,id)       " -> Window.orderBy(col("v").asc, col("id").asc),
        "B part=m0 (v,id)     " -> Window.partitionBy(m0)
          .orderBy(col("v").asc, col("id").asc),
        "C empty (m0,v,id)    " -> Window.orderBy(m0.asc, col("v").asc, col("id").asc),
        "D empty (v,id,m0)    " -> Window.orderBy(col("v").asc, col("id").asc, m0.asc),
        "E BoundedWindow      " -> graft.ops.BoundedWindow
          .ordered(col("v").asc, col("id").asc))
      for (round <- 1 to 3; (label, w) <- variants) {
        time(s"n=$n r$round $label")(noop(
          base.withColumn("rn", row_number().over(w))
            .withColumn("cs", sum(col("v")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))))
      }
    }
    spark.stop()
  }
}
