package graft.sources

import graft.ops.{Epoch, EpochTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Epoch tables as a STREAMING SOURCE — `spark.readStream.table(
  * "graft.tbl")` subscribes to the table's committed delta versions,
  * one micro-batch per epoch range, exactly-once off the streaming
  * checkpoint (the table-format change feed: Delta's streaming source,
  * Iceberg's incremental read — here the manifest IS the log):
  *
  *  - OFFSETS ARE EPOCH NUMBERS. A batch (a, b] emits exactly the
  *    delta directories manifests a+1..b added — resolved from the
  *    immutable manifest chain, so replanning a batch after a crash
  *    reads byte-identical input (the exactly-once story needs no
  *    ledger: offsets name immutable directory sets).
  *  - APPEND-ONLY CONTRACT (the standard change-feed discipline): a
  *    delta version streams; a tombstone-only epoch emits nothing (a
  *    takedown never RETRACTS rows already emitted downstream — run
  *    the takedown through the downstream tier too, as
  *    [[graft.ops.Takedown]] does); a refresh/compact/merge epoch
  *    rewrites or shadows history a stream already emitted and FAILS
  *    the stream loudly — restart from the new snapshot.
  *  - `startingVersion` option: begin at a RawDataVersion id's epoch
  *    (every retained version is a valid resume point); default is
  *    the head at stream start — new changes only. A start or batch
  *    range older than the retention horizon fails loudly (the
  *    Kafka-data-loss analogue: [[graft.ops.Epoch.prune]] retired the
  *    manifests).
  *
  * Scale shape: planning is manifest-diff only (tiny driver-side text
  * files — never a data listing); each batch's rows are read by
  * Spark's own vectorized parquet reader over exactly the new
  * directories, with the query's column pruning re-applied per batch,
  * so a 100 TB table with a 1 GB delta streams 1 GB. */
object EpochTableStream {

  private[sources] final case class EpochOffset(epoch: Long)
      extends Offset {
    override def json(): String = epoch.toString
  }

  private def emptyOpts =
    new CaseInsensitiveStringMap(java.util.Collections.emptyMap())

  /** A fresh pushed-down parquet scan over `dirs` with the streaming
    * query's column pruning and data filters re-applied. */
  private def scanFor(s: SparkSession, dirs: Seq[String],
      required: Option[StructType], filters: Seq[Expression]): Scan = {
    val b = ParquetTable("epoch-table-stream", s, emptyOpts, dirs,
      None, classOf[ParquetFileFormat]).newScanBuilder(emptyOpts)
    if (filters.nonEmpty) b.pushFilters(filters)
    required.foreach(b.pruneColumns)
    b.build()
  }

  /** The micro-batch stream over one epoch table layout. One instance
    * per running query; all state is (re)derived from the manifest
    * chain and the checkpointed offsets. */
  private[sources] final class TableChangesStream(s: SparkSession,
      path: String, options: CaseInsensitiveStringMap,
      required: Option[StructType], filters: Seq[Expression])
      extends MicroBatchStream {

    private def head: Long =
      Epoch.resolve(s, path).map(_.epoch).getOrElse(
        throw new IllegalStateException(
          s"EpochTableStream: no committed version at $path"))

    override def initialOffset(): Offset =
      Option(options.get("startingVersion")) match {
        case None => EpochOffset(head)
        case Some(v) =>
          val ver =
            try v.toLong
            catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"EpochTableStream: startingVersion '$v' is not a " +
                    "RawDataVersion id")
            }
          val m = EpochTable.manifestForVersion(s, path, ver).getOrElse(
            throw new IllegalStateException(
              s"EpochTableStream: startingVersion $ver is not a " +
                s"retained version at $path (pruned or never committed)"))
          // the batch range is EXCLUSIVE of the start offset — begin
          // one epoch before the version's, so its own delta streams
          EpochOffset(m.epoch - 1)
      }

    override def latestOffset(): Offset = EpochOffset(head)

    override def deserializeOffset(json: String): Offset =
      EpochOffset(json.toLong)

    override def commit(end: Offset): Unit = ()

    override def stop(): Unit = ()

    /** The data directories manifests (a, b] ADDED, append-only
      * validated epoch by epoch. Epoch 0's predecessor is the empty
      * layout, so a stream started AT the first version (offset -1)
      * emits the initial snapshot as its first batch. */
    private def dirsBetween(a: Long, b: Long): Seq[String] = {
      def manifest(n: Long) = Epoch.resolveAsOf(s, path, n).getOrElse(
        throw new IllegalStateException(
          s"EpochTableStream: epoch $n at $path is gone — the stream " +
            "fell behind the retention horizon (Epoch.prune); restart " +
            "from a retained version"))
      (a + 1 to b).flatMap { n =>
        val prev =
          if (n == 0L) Epoch.Manifest(-1L, Map.empty, Seq.empty)
          else manifest(n - 1)
        val cur = manifest(n)
        val prevData = prev.components.getOrElse("data", Seq.empty)
        val curData = cur.components.getOrElse("data", Seq.empty)
        require(prevData.forall(curData.contains),
          s"EpochTableStream: epoch $n at $path rewrote data " +
            "directories (a refresh or compact) — a stream cannot " +
            "replay rewritten history; restart from the new snapshot")
        require(cur.components.getOrElse("merge", Seq.empty) ==
            prev.components.getOrElse("merge", Seq.empty),
          s"EpochTableStream: epoch $n at $path committed a keyed " +
            "merge — upserts shadow rows a stream already emitted; " +
            "restart from a compacted snapshot")
        // a tombstone-only epoch adds no dirs and emits nothing
        curData.filterNot(prevData.contains).map(d => s"$path/$d")
      }
    }

    override def planInputPartitions(start: Offset,
        end: Offset): Array[InputPartition] = {
      val dirs = dirsBetween(start.asInstanceOf[EpochOffset].epoch,
        end.asInstanceOf[EpochOffset].epoch)
      if (dirs.isEmpty) Array.empty
      else scanFor(s, dirs, required, filters).toBatch.planInputPartitions()
    }

    /** One factory for the stream's lifetime: bound to the schema and
      * pushdown, not to any directory set — partitions carry the
      * files. Built over the head manifest's dirs (schema drift across
      * deltas is refused at write time, so any dir set agrees). */
    override def createReaderFactory(): PartitionReaderFactory = {
      val m = Epoch.resolve(s, path).getOrElse(
        throw new IllegalStateException(
          s"EpochTableStream: no committed version at $path"))
      scanFor(s, EpochTable.scanDataDirs(path, m), required, filters)
        .toBatch.createReaderFactory()
    }
  }

  /** ScanBuilder that keeps the delegate's full pushdown surface
    * (catalyst filters incl. partition pruning, column pruning,
    * aggregate pushdown) and returns a Scan that can ALSO stream —
    * the batch path is the delegate's scan verbatim.
    *
    * When the required schema asks for the `_g` metadata column (the
    * row's file path — only the row-level matching subquery and
    * explicit provenance reads do), the build returns the per-file
    * `_g`-appending scan instead: the pushed condition still reaches
    * the parquet readers (footer-stats pruning intact), each matched
    * row carries the file it lives in, and the dynamic-pruning
    * subquery turns that into the rewrite's file set. The serving
    * path — no `_g` — keeps the stock vectorized scan untouched. */
  private[sources] final class StreamableScanBuilder(s: SparkSession,
      path: String, delegate: ParquetScanBuilder,
      options: CaseInsensitiveStringMap)
      extends ScanBuilder with SupportsPushDownCatalystFilters
      with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

    private var pushedExprs: Seq[Expression] = Seq.empty
    private var required: Option[StructType] = None
    private var needsGroup = false

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
      pushedExprs = filters
      delegate.pushFilters(filters)
    }

    override def pushedFilters(): Array[Predicate] =
      delegate.pushedFilters

    override def pruneColumns(requiredSchema: StructType): Unit = {
      import graft.sources.{EpochTableCatalog => Cat}
      needsGroup = requiredSchema.fieldNames.contains(Cat.GroupCol)
      val pruned = StructType(
        requiredSchema.fields.filterNot(_.name == Cat.GroupCol))
      required = Some(pruned)
      delegate.pruneColumns(pruned)
    }

    override def pushAggregation(aggregation: Aggregation): Boolean =
      !needsGroup && delegate.pushAggregation(aggregation)

    override def supportCompletePushDown(
        aggregation: Aggregation): Boolean =
      !needsGroup && delegate.supportCompletePushDown(aggregation)

    override def build(): Scan =
      if (needsGroup)
        new EpochTableCatalog.RewriteScan(delegate.build(),
          withGroup = true)
      else
        new StreamableScan(delegate.build(),
          new TableChangesStream(s, path, options, required, pushedExprs))
  }

  /** The delegate parquet scan, plus the micro-batch face. */
  private[sources] final class StreamableScan(delegate: Scan,
      stream: TableChangesStream) extends Scan {
    override def readSchema(): StructType = delegate.readSchema()
    override def description(): String = delegate.description()
    override def toBatch: Batch = delegate.toBatch
    override def toMicroBatchStream(
        checkpointLocation: String): MicroBatchStream = stream
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      delegate.columnarSupportMode()
    override def supportedCustomMetrics()
        : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      delegate.supportedCustomMetrics()
  }
}
