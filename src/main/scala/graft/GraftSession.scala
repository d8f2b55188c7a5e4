package graft

import org.apache.spark.sql.SparkSession

/** Canonical session construction for the graft engine.
  *
  * Every conf the library's loaders depend on lives HERE, at session
  * build time — table loaders (`Tables`) are pure reads with no runtime
  * conf mutation, so using graft as a library can never change the
  * behavior of unrelated queries in a shared session.
  *
  * Confs and why:
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: the driver's
  *    events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses to
  *    read as a timestamp; reading it as a raw long lets
  *    `Tables.events` truncate to microseconds exactly the way DuckDB
  *    does on read, so oracle comparisons align (see FIXTURES.md).
  *  - `spark.sql.session.timeZone=UTC`: date/timestamp functions must
  *    fold identically to the DuckDB oracle regardless of host zone.
  *  - shuffle partitions sized to the local core count, not the 200
  *    default — on a real cluster this is the knob sized to the data
  *    (SURVEY §4); locally 200 tiny partitions just add scheduler drag.
  */
object GraftSession {

  /** Builder pre-loaded with the graft confs; callers add master/app
    * specifics and `getOrCreate()`. */
  def builder(shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      // the deployment-grade extension install: native expressions +
      // the (registration-gated, otherwise inert) MV-rewrite rule run
      // in every session the mains build, not just in specs
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // storage-partitioned joins: lets a DSv2 scan's reported
      // KeyGroupedPartitioning (the bucketed epoch tables) satisfy
      // join distribution without an exchange; inert for every scan
      // that reports nothing
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // r20 guide §2.2/§6: distributed file listing defaults to ONE
      // TASK PER PATH (parallelPartitionDiscoveryParallelism=10000), so
      // a 2.5k-partition epoch read paid a 2.5k-task listing job whose
      // work was 0.1 s of stat calls under 4 s of scheduling. 128
      // listing tasks bound the scheduler overhead at ANY path count
      // while each task batches many store RPCs — the right shape on a
      // real object store too, where per-task listing throughput (not
      // task count) is the limit. Override via the standard conf knob
      // if a deployment's store needs more listing concurrency.
      .config("spark.sql.sources.parallelPartitionDiscovery.parallelism",
        "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed-table root for bucketed sinks (S5): keep it out of the
      // caller's cwd — catalog metadata is session-local either way
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** The standard local session the mains use. */
  def local(cores: Int, appName: String): SparkSession = {
    val s = builder(cores).master(s"local[$cores]").appName(appName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Per-process scratch root for registry queries that materialize an
    * on-disk layout (bucketed tables, partitioned sinks, saved indexes).
    * Keyed by pid so two graft processes on the same machine — e.g. a
    * bench and a verify over the same sf dir — can never race on
    * DROP/overwrite of each other's files. Catalog entries are already
    * session-local; this makes the FILE paths process-local too. */
  lazy val scratchDir: String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-scratch-" +
      ProcessHandle.current().pid()
    new java.io.File(d).mkdirs()
    // lifecycle: the dir is process-private by construction, so the
    // process is also the only safe place to reap it — delete on exit
    // rather than letting bench/verify runs accumulate dirs in tmp
    sys.addShutdownHook(deleteRecursively(new java.io.File(d)))
    d
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
