package graft.gdl

import java.io.InputStream
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable URL reader ≙ the reference's injectable
  * `url_reader: Callable[[str], StreamingBody]`
  * (/root/reference/backend/check_stac_metadata/utils.py:52-58; prod impl
  * task.py:20-25; test impl tests/aws_utils.py MockJSONURLReader).
  */
trait UrlReader extends Serializable {
  def open(url: String): InputStream
  def exists(url: String): Boolean

  def readString(url: String): String = {
    val in = open(url)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}

/** Hadoop-FileSystem reader: handles file:, hdfs:, s3a: URLs uniformly.
  * `s3://` is normalized to `s3a://` (the Hadoop S3 connector scheme). */
class HadoopUrlReader(@transient conf: Configuration) extends UrlReader {
  // Configuration is not serializable-stable across executors; each task
  // re-derives it from the deserialized default — fine for file:/hdfs:.
  private def resolve(url: String): Path =
    new Path(if (url.startsWith("s3://")) "s3a://" + url.stripPrefix("s3://") else url)

  private def fs(p: Path): FileSystem =
    p.getFileSystem(if (conf == null) new Configuration() else conf)

  override def open(url: String): InputStream = {
    val p = resolve(url)
    fs(p).open(p)
  }

  override def exists(url: String): Boolean = {
    val p = resolve(url)
    fs(p).exists(p)
  }
}

/** In-memory reader for tests ≙ MockJSONURLReader. */
class InMemoryUrlReader(docs: Map[String, Array[Byte]]) extends UrlReader {
  override def open(url: String): InputStream =
    docs.get(url) match {
      case Some(bytes) => new java.io.ByteArrayInputStream(bytes)
      case None => throw new java.io.FileNotFoundException(url)
    }
  override def exists(url: String): Boolean = docs.contains(url)
}
