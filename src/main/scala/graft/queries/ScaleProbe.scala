package graft.queries

import graft.{Catalog, Tables}
import graft.ops.TextOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicLong

/** Empirical scaling probe for the dedup family (VERDICT r5 item 5):
  * measures wall time, shuffle-write bytes, CANDIDATE-pair counts and
  * result counts for `q_dedup_ngram_jaccard` (PPJoin prefix filtering)
  * and `q_dedup_minhash_lsh` (banded inverted index) at sf0.01 / sf0.1
  * and a synthesized sf1-scale corpus (50k docs), so the "near-linear
  * at 100 TB" claim rests on data points, not just plan shape.
  *
  * The sf1 corpus is 10 replicas of the sf0.1 documents where replica
  * r > 0 suffixes every token with `_r`. Each replica therefore keeps
  * the original's internal near-dup structure EXACTLY (same shingle
  * set geometry, disjoint vocabulary across replicas), so a 10× corpus
  * carries exactly 10× the true duplicate pairs — the ideal yardstick:
  * a scale-safe candidate generator should produce ~10× candidates and
  * ~10× output, never ~100× (which is what an all-pairs design yields).
  *
  * Usage: runMain graft.queries.ScaleProbe [outDir]
  * Prints one JSON line per (scale, query) measurement.
  */
object ScaleProbe {

  /** Sums shuffle-write bytes/records across completed stages. */
  private final class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong
    val records = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
  }

  /** Replicate the sf0.1 documents 10× with per-replica token renaming
    * (disjoint vocabularies — see class doc) into `outDir/documents
    * .parquet`. Deterministic: a pure function of the input corpus. */
  private def buildSf1(spark: SparkSession, sf01Dir: String, outDir: String): Unit = {
    val docs = Tables(spark, sf01Dir, "documents")
    val replicas = (0 until 10).map { r =>
      val renamed =
        if (r == 0) docs
        else docs.withColumn("text",
          concat_ws(" ", transform(split(trim(col("text")), " "),
            t => concat(t, lit(s"_$r")))))
      renamed.withColumn("doc_id", col("doc_id") + lit(r * 1000000L))
    }
    replicas.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** Candidate-pair count of the PPJoin prefix join — the same
    * prefix/size-ratio/positional filters as q_dedup_ngram_jaccard
    * (DedupQueries.scala:166-194), counted before the verify stage. */
  private def ngramCandidates(spark: SparkSession, dir: String): Long = {
    val sh = DedupQueries.docShingles(spark, dir).persist()
    val ex = sh.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("shingle"))
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val ranked = ex.join(dfreq, "shingle")
      .select(col("doc_id"), col("shingle"), col("sz"),
        (row_number().over(wDoc.orderBy(col("df").asc, col("shingle").asc)) - 1)
          .as("pos"))
    val prefix = ranked
      .where(col("pos") < expr("CAST(sz - ((sz*3+4) div 5) + 1 AS INT)"))
      .persist()
    val n = prefix.alias("a")
      .join(prefix.alias("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * 3 <= col("b.sz") * 5 &&
        col("b.sz") * 3 <= col("a.sz") * 5 &&
        (lit(1) + least(col("a.sz") - col("a.pos") - 1,
          col("b.sz") - col("b.pos") - 1)) >=
          expr("(3*(a.sz + b.sz) + 7) div 8"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct().count()
    prefix.unpersist(); sh.unpersist()
    n
  }

  /** Candidate-pair count of the LSH band-bucket join — same banding
    * as q_dedup_minhash_lsh (DedupQueries.scala:303-318). */
  private def lshCandidates(spark: SparkSession, dir: String): Long = {
    import graft.functions.GraftFunctions
    val sh = DedupQueries.docShingles(spark, dir)
    val sig = sh.select(col("doc_id"), GraftFunctions.minhashSig(col("sh")).as("sig"))
    val bands = sig.select(col("doc_id"), posexplode(
      array((0 until TextOps.numBands).map { b =>
        concat_ws("_", transform(
          slice(col("sig"), b * TextOps.bandRows + 1, TextOps.bandRows),
          x => x.cast("string")))
      }: _*)).as(Seq("band", "key")))
      .persist()
    val n = bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct().count()
    bands.unpersist()
    n
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    buildSf1(spark, "/root/testdata/sf0.1", s"$outDir/sf1")
    val scales = Seq(
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> s"$outDir/sf1")
    val queries = Seq("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh")

    // warmup (JIT/codegen) on the smallest scale
    queries.foreach(q => Catalog.byName(q).fn(spark, scales.head._2)
      .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()

    for ((sfName, dir) <- scales; q <- queries) {
      val nDocs = Tables(spark, dir, "documents").count()
      val cands =
        if (q == "q_dedup_ngram_jaccard") ngramCandidates(spark, dir)
        else lshCandidates(spark, dir)
      spark.catalog.clearCache()
      val b0 = meter.bytes.get(); val r0 = meter.records.get()
      val t0 = System.nanoTime()
      val out = Catalog.byName(q).fn(spark, dir)
      val nOut = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(s"""{"probe":"$q","scale":"$sfName","docs":$nDocs,""" +
        s""""candidates":$cands,"result_pairs":$nOut,"sec":$secs,""" +
        s""""shuffle_bytes":${meter.bytes.get() - b0},""" +
        s""""shuffle_records":${meter.records.get() - r0}}""")
    }
    spark.stop()
  }
}
