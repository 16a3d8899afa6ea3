package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Storage control plane over the Hadoop FileSystem API — one code path
  * for s3a:// and file:// alike (replaces the reference's boto3
  * side-channel, SURVEY.md §4.3):
  *  - dataset existence probes (ref py:156-184)
  *  - per-file checkpoint markers (ref py:237-276)
  *  - staged-file enumeration (ref py:279-300)
  *  - parquet footer row counts — progress accounting WITHOUT
  *    re-scanning data (the reference re-reads and count()s every file,
  *    py:317-325; footers make that a metadata-only operation).
  */
final class Storage(conf: Configuration) {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  /** C1 — "does any *.parquet exist under prefix?" */
  def datasetExists(dir: String): Boolean = {
    val p = new Path(dir)
    val f = fs(p)
    f.exists(p) && f.globStatus(new Path(p, "*.parquet")).nonEmpty
  }

  /** C5 — enumerate staged parquet files (sorted for determinism). */
  def listParquet(dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.globStatus(new Path(p, "*.parquet")).map(_.getPath.toString).sorted.toSeq
  }

  /** C2 — checkpoint marker path convention. */
  def checkpointMarker(checkpointDir: String, fileName: String): Path =
    new Path(checkpointDir, s"$fileName.checkpoint")

  /** C3 — zero-byte marker after a successful per-file load. */
  def createCheckpoint(checkpointDir: String, fileName: String): Unit = {
    val m = checkpointMarker(checkpointDir, fileName)
    val f = fs(m)
    f.mkdirs(m.getParent)
    f.create(m, true).close()
  }

  /** C4 — has this file already been loaded? */
  def checkpointExists(checkpointDir: String, fileName: String): Boolean = {
    val m = checkpointMarker(checkpointDir, fileName)
    fs(m).exists(m)
  }

  def delete(dir: String): Unit = {
    val p = new Path(dir)
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Row count from the parquet footer — no data read. */
  def footerRowCount(file: String): Long = {
    val in = HadoopInputFile.fromPath(new Path(file), conf)
    val r = ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}

/** C6 — retry with exponential backoff (ref py:19-36: 3 attempts, 5 s
  * initial delay, ×2; catches everything, re-raises after exhaustion).
  */
object Retry {
  def retry[T](
      attempts: Int = 3,
      initialDelayMs: Long = 5000,
      backoff: Double = 2.0,
      onRetry: (Int, Throwable) => Unit = (_, _) => ())(thunk: => T): T = {
    var delay = initialDelayMs
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return thunk
      catch {
        case t: Throwable =>
          last = t
          i += 1
          if (i < attempts) {
            onRetry(i, t)
            Thread.sleep(delay)
            delay = (delay * backoff).toLong
          }
      }
    }
    throw last
  }
}
