package graft

import graft.ops.Relational
import graft.pipeline.{AppendSink, IdempotentParquetSink, Pipeline}
import graft.queries.PipelineQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Forked-JVM crash harness for PipelineSpec: runs the standard job
  * with the exactly-once sink, then HALTS the JVM (no shutdown hooks,
  * the moral equivalent of kill -9 / an executor host dying) right
  * after the Nth file's data lands but BEFORE its checkpoint marker is
  * written — the nastiest window for a delivery contract. The parent
  * test asserts the death, then resumes in-process and checks
  * exactly-once row counts. */
object CrashLoadMain {
  def main(args: Array[String]): Unit = {
    val Array(ws, sfDir, dieAfter) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var appended = 0
    val crashingSink: AppendSink = new AppendSink {
      def append(df: DataFrame, target: String): Unit =
        throw new UnsupportedOperationException("source-file overload only")
      override def append(df: DataFrame, target: String, sourceFile: String): Unit = {
        IdempotentParquetSink.append(df, target, sourceFile)
        appended += 1
        if (appended == dieAfter.toInt) {
          // data written, checkpoint NOT yet created — die hard
          Runtime.getRuntime.halt(137)
        }
      }
    }
    new Pipeline(spark, PipelineQueries.spec(ws),
      src => Relational.scanParquet(spark, s"$sfDir/${src.name}.parquet"),
      sink = crashingSink, retryInitialDelayMs = 1).runAll()
    // must be unreachable when dieAfter <= file count
    spark.stop()
    sys.exit(0)
  }
}
