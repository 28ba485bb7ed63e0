package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source for the reference's own fixture corpus: a directory of
  * `<doc_id>_<title>.txt` files (the output shape of the reference's
  * data-prep stage, `prepare_data.py:37-50`; 1000 Wikipedia articles in
  * `app/data/`). Reading it back lets this engine run the reference's
  * exact smoke queries (`app/app.sh:22-27`) over the reference's exact
  * corpus.
  *
  * Distributed read: `wholetext` files become rows (one task per file
  * split set), the id/title parse is a column expression on the file
  * name — no driver-side directory walking.
  */
object WikiCorpus {

  /** `(doc_id, title, text)` from a `<id>_<title>.txt` directory. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val name = regexp_extract(input_file_name(), "([^/]+)\\.txt$", 1)
    spark.read.option("wholetext", "true").text(dir)
      .select(
        // try_cast: regexp_extract yields "" for non-matching filenames,
        // and ANSI CAST('' AS BIGINT) throws; try_cast → NULL → filtered.
        regexp_extract(name, "^(\\d+)_", 1).try_cast("long").as("doc_id"),
        regexp_replace(regexp_extract(name, "^\\d+_(.*)$", 1), "_", " ").as("title"),
        col("value").as("text"))
      .filter(col("doc_id").isNotNull)
  }
}
