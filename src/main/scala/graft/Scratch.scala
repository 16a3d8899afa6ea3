package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the driver contract).
  * Currently holding: q_dedup_edit_distance stage isolation at sf0.1 —
  * candidate generation vs banded-levenshtein verify. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.ops.TextOps.tokens
    for (round <- 1 to 3) {
      val b = Tables(spark, d, "documents")
        .select(col("doc_id"), col("text"), tokens(col("text")).as("w"))
        .select(col("doc_id"), col("text"),
          md5(concat_ws(" ", array_sort(array_distinct(col("w"))))).as("h"))
        .persist()
      time(s"r$round build b (tokenize+sort+md5)")(noop(b))
      val joined = b.alias("a").join(b.alias("c"),
        col("a.h") === col("c.h") && col("a.doc_id") < col("c.doc_id"))
      time(s"r$round join only (no lev)")(noop(
        joined.select(col("a.doc_id"), col("c.doc_id"))))
      time(s"r$round join + lev64")(noop(
        joined.select(col("a.doc_id"), col("c.doc_id"),
          levenshtein(col("a.text"), col("c.text"), 64).as("ed"))))
      time(s"r$round join + pair-repart + lev64")(noop(
        joined.select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"),
            col("a.text").as("ta"), col("c.text").as("tb"))
          .repartition(col("doc_a"), col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("ta"), col("tb"), 64).as("ed"))))
      b.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
