package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared filesystem lifecycle primitives for the stores (index store,
  * dedup store, compaction, upsert sinks). One implementation of the
  * crash-safe swap so error handling cannot diverge between call sites.
  */
object FsOps {

  /** Install `tmp` at `live` via rename-aside: readers observe the old or
    * the new directory, never half of either, and no failure mode deletes
    * the only remaining copy — every rename's return value is checked,
    * and the aside copy is only dropped after the install succeeded.
    */
  /** Write a one-long driver-side text marker at `<path>/<marker>` —
    * the shared bookkeeping primitive behind every store's `_lastbatch`
    * / `_last_audit` discipline (index, dedup, IVF, versioned). One
    * implementation so a future change (e.g. crash-atomic tmp+rename)
    * lands in every family at once. */
  def writeLongMarker(spark: org.apache.spark.sql.SparkSession, path: String,
                      marker: String, v: Long): Unit = {
    val p = new Path(s"$path/$marker")
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a one-long marker back (None when absent). */
  def readLongMarker(spark: org.apache.spark.sql.SparkSession, path: String,
                     marker: String): Option[Long] = {
    val p = new Path(s"$path/$marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  def atomicSwap(fs: FileSystem, live: Path, tmp: Path): Unit = {
    // leading underscore: ignored by Spark's file listing, so an aside
    // copy inside a partitioned table root is never parsed as a partition
    val old = new Path(live.getParent, s"_${live.getName}.swap_old")
    fs.delete(old, true) // leftover from a previous crashed swap
    val hadLive = fs.exists(live)
    if (hadLive && !fs.rename(live, old))
      throw new java.io.IOException(s"swap: failed to move $live aside to $old")
    if (!fs.rename(tmp, live)) {
      if (hadLive) fs.rename(old, live) // roll back
      throw new java.io.IOException(s"swap: failed to install $tmp at $live")
    }
    fs.delete(old, true)
  }
}
