package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4 (reference): one `.txt` file per document, named
  * `<doc_id>_<safe_title>.txt` (`prepare_data.py:37-50`).
  *
  * The reference collects all rows to the driver and forks an `hdfs put`
  * process per document. Here each partition writes its own documents
  * directly (`foreachPartition`) — distributed, no driver materialization,
  * no subprocesses. On a cluster the `java.nio` calls would be replaced by
  * the Hadoop `FileSystem` API against a shared store; the partition-wise
  * structure is identical.
  */
object PerDocTextSink {

  /** `[^A-Za-z0-9]+` → `_`, capped at 50 chars (`prepare_data.py:44`). */
  def safeTitle(title: String): String =
    title.replaceAll("[^A-Za-z0-9]+", "_").take(50)

  def write(corpus: DataFrame, dir: String,
            idCol: String = "doc_id", titleCol: String = "title",
            textCol: String = "text"): Unit = {
    Files.createDirectories(Paths.get(dir))
    corpus.select(col(idCol).cast("string"), col(titleCol), col(textCol))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val name = s"${r.getString(0)}_${safeTitle(Option(r.getString(1)).getOrElse(""))}.txt"
          Files.write(Paths.get(dir, name),
            Option(r.getString(2)).getOrElse("").getBytes(StandardCharsets.UTF_8))
        }
      }
  }
}
