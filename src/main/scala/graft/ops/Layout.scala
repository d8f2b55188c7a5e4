package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared directory-swap primitive for persisted index layouts (the BM25
  * postings side tables, the IVF cell directories): stage the replacement
  * frame next to the live directory, then swap with tombstone ordering.
  * Factored out of the postings maintenance path so the text and vector
  * indexes share ONE crash-recovery contract instead of two diverging
  * copies. */
private[ops] object Layout {

  /** Swap-replace a layout directory: stage the merged frame next to it
    * (so the source directory is never read and overwritten in the same
    * job — Spark refuses exactly that), then swap with tombstone
    * ordering: old → `__old`, stage → live, drop the tombstone. NO step
    * rewrites data, so a crash at any point loses nothing — the complete
    * table always exists as exactly one of {live, stage, tombstone}, and
    * leftovers from a crashed prior swap are cleared up front. The swap
    * is NOT atomic for concurrent readers (two renames; a reader can
    * land in the gap and miss the path) — maintenance runs in a window
    * without concurrent serving, exactly like parquet table compaction;
    * the callers (`postingsAppend`/`postingsCompact`/`postingsDelete`,
    * `Ann.retrain`/`Ann.compact`) document the same contract.
    * `partitionCols` preserves a partitioned layout (the IVF cell
    * directories) through the rewrite. */
  def replaceDir(s: SparkSession, merged: DataFrame, dir: String,
      partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(dir)
    val stage = new Path(s"${dir}__stage")
    val old = new Path(s"${dir}__old")
    val fs = live.getFileSystem(s.sparkContext.hadoopConfiguration)
    // recover from a crashed prior swap: a live dir wins over leftovers;
    // a missing live dir with a tombstone means the crash hit between
    // the renames — restore the tombstone before proceeding
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"swap recovery of $dir failed")
    fs.delete(old, true)
    val writer = merged.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(stage.toString)
    require(fs.rename(live, old), s"swap of $dir failed (old aside)")
    require(fs.rename(stage, live), s"swap of $dir failed (stage in)")
    fs.delete(old, true)
  }

  /** True iff `dir` exists on the layout's filesystem — the cheap probe
    * serving paths use to notice an optional segment (tombstones). */
  def dirExists(s: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Recursively drop a layout directory (tombstone segment cleanup
    * after a compaction folds the deletes in). */
  def deleteDir(s: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
