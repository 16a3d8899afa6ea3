package graft.pipeline

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** C7 — per-target-table dynamic log file, the reference's
  * `logs/log_{table}_{timestamp}.log` handler (py:39-57): each table
  * run opens its own file named with the reference's underscore
  * timestamp (`%Y_%m_%d_%H_%M_%S`, py:44). Line format: the reference's
  * per-table file handler is `%(asctime)s - %(levelname)s -
  * %(message)s` (py:50, no logger name); we use the richer py:437
  * console variant `%(asctime)s - %(name)s - %(levelname)s -
  * %(message)s` with the table as the name — a deliberate upgrade so
  * one aggregated log dir stays attributable per table. Written
  * through the Hadoop FileSystem API so the file lands beside the
  * workspace on any storage scheme (file://, s3a://, ...) — one code
  * path, like the rest of the control plane in [[Storage]].
  */
final class TableLog(conf: Configuration, logsDir: String, table: String)
    extends AutoCloseable {

  private val lineTs = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss,SSS")
    .withZone(ZoneOffset.UTC)
  private val fileTs = DateTimeFormatter.ofPattern("yyyy_MM_dd_HH_mm_ss")
    .withZone(ZoneOffset.UTC).format(Instant.now())

  /** `<logsDir>/log_<table>_<ts>.log` (py:44 naming). */
  val path: Path = new Path(logsDir, s"log_${table}_$fileTs.log")

  private val out = {
    val f = path.getFileSystem(conf)
    f.mkdirs(path.getParent)
    f.create(path, true)
  }

  def info(msg: String): Unit = write("INFO", msg)
  def warn(msg: String): Unit = write("WARNING", msg)
  def error(msg: String): Unit = write("ERROR", msg)

  private def write(level: String, msg: String): Unit = synchronized {
    out.write(
      s"${lineTs.format(Instant.now())} - $table - $level - $msg\n".getBytes("UTF-8"))
    out.hflush()
  }

  override def close(): Unit = synchronized(out.close())
}
