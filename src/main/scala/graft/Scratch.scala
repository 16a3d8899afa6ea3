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

    import graft.functions.GraftFunctions
    import graft.ops.TextOps
    import org.apache.spark.sql.expressions.Window

    // ---- q_dedup_ngram_jaccard stage breakdown ----
    val sh = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        array_sort(array_distinct(
          GraftFunctions.shingleHashes(col("w"), 3, TextOps.P))).as("sh"))
      .persist()
    time("shingles persist+count")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("dfreq")(noop(dfreq))
    val wDoc = Window.partitionBy(col("doc_id"))
    val ranked = ex.join(dfreq, "shingle")
      .select(col("doc_id"), col("shingle"),
        (row_number().over(wDoc.orderBy(col("df").asc, col("shingle").asc)) - 1)
          .as("pos"),
        count(lit(1)).over(wDoc).as("sz"))
    time("ranked")(noop(ranked))
    val prefix = ranked
      .where(col("pos") < expr("CAST(sz - ((sz*3+4) div 5) + 1 AS INT)"))
      .persist()
    time("prefix persist+count")(prefix.count())
    val cand = prefix.alias("a")
      .join(prefix.alias("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * 3 <= col("b.sz") * 5 &&
        col("b.sz") * 3 <= col("a.sz") * 5 &&
        (lit(1) + least(col("a.sz") - col("a.pos") - 1,
          col("b.sz") - col("b.pos") - 1)) >=
          expr("(3*(a.sz + b.sz) + 7) div 8"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    time("candidates")(noop(cand))
    val fa = sh.select(col("doc_id").as("da"), col("sh").as("sha"))
    val fb = sh.select(col("doc_id").as("db"), col("sh").as("shb"))
    val inter = GraftFunctions.intersectCountSorted(col("sha"), col("shb"))
    val uni = size(col("sha")) + size(col("shb")) - inter
    val fin = cand.join(fa, "da").join(fb, "db")
      .withColumn("jaccard", inter.cast("double") / uni)
      .where(col("jaccard") >= 0.6)
    time("verify")(noop(fin))
    println(s"[scratch] candidates rows: " + cand.count())
    spark.stop()
  }
}
