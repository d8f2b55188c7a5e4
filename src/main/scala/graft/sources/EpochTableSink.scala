package graft.sources

import graft.ops.EpochTable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** `df.writeStream.toTable("graft.t")` — the DSv2 STREAMING WRITE
  * face of the epoch table tier (round-18 verdict "next" #4): each
  * micro-batch's rows stream through Spark's own parquet writers into
  * a per-epoch staging directory, and the epoch commit MOVES the
  * staged files in as ONE delta version under `Epoch.occ` — the same
  * machinery `StreamRunner.tableCdcEpochStream` drives through
  * foreachBatch, exposed at the standard API so a plain append stream
  * needs zero knowledge of the manifest protocol.
  *
  * EXACTLY-ONCE is the ledger's: the commit is keyed
  * `stw_<queryId>_<epochId>` (the streaming query id is stable across
  * checkpoint restarts; the epoch id is the micro-batch id), so a
  * replayed batch after a crash-restart re-stages its files and the
  * commit is a mechanical no-op — nothing re-applied, the replayed
  * staging swept. Task-attempt safety: writers write DOT-prefixed
  * in-progress files (invisible to every parquet scan and to the
  * commit's data-file filter) and rename them into place only when
  * the attempt commits, with Spark's commit coordinator arbitrating
  * attempts — a crashed attempt leaves only invisible residue.
  *
  * 100 TB shape: the batch's rows are written once, partition-
  * parallel, by the stock parquet writers (no driver round-trip, no
  * second copy — the staged directory is RENAMED into the
  * generation); the visible flip is one manifest rename per batch;
  * planning cost per batch is manifest-diff only on the readers'
  * side. Append-only by contract, exactly like `INSERT INTO`. */
object EpochTableSink {

  private final case class StagedFile(path: String)
      extends WriterCommitMessage

  /** One running query's streaming write into one table layout. */
  private[sources] final class EpochStreamingWrite(s: SparkSession,
      layoutPath: String, info: LogicalWriteInfo)
      extends StreamingWrite {

    private val stageRoot =
      s"$layoutPath/_stage_stream_${info.queryId()}"

    override def createStreamingWriterFactory(
        pinfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
      // prepareWrite configures the job conf (write support, schema,
      // compression) on the DRIVER; the factory + conf serialize to
      // the executors — the standard FileFormat writer contract
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        s.sessionState.newHadoopConf())
      val factory = new ParquetFileFormat().prepareWrite(s, job,
        Map.empty, info.schema())
      EpochStreamWriterFactory(factory, info.schema(), stageRoot,
        new org.apache.spark.util.SerializableConfiguration(
          job.getConfiguration))
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit =
      EpochTable.commitStreamDelta(s, layoutPath,
        s"$stageRoot/epoch=$epochId",
        s"stw_${info.queryId()}_$epochId")

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val p = new org.apache.hadoop.fs.Path(
        s"$stageRoot/epoch=$epochId")
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(p, true): Unit
    }
  }

  /** Serializable per-task writer factory: one parquet file per
    * (partition, task attempt, epoch), written in-progress-invisible
    * and renamed on task commit. */
  private final case class EpochStreamWriterFactory(
      factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
      schema: StructType, stageRoot: String,
      conf: org.apache.spark.util.SerializableConfiguration)
      extends StreamingDataWriterFactory {

    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] = {
      import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
      val ctx = new org.apache.hadoop.mapreduce.task
        .TaskAttemptContextImpl(conf.value,
          new TaskAttemptID(new TaskID(
            new JobID("graft-stw", (epochId % Int.MaxValue).toInt),
            TaskType.MAP, partitionId), 0))
      val dir = new org.apache.hadoop.fs.Path(
        s"$stageRoot/epoch=$epochId")
      val fs = dir.getFileSystem(conf.value)
      fs.mkdirs(dir)
      val fin = new org.apache.hadoop.fs.Path(dir,
        s"part-$partitionId-$taskId" + factory.getFileExtension(ctx))
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s".${fin.getName}.inprogress")
      val w = factory.newInstance(tmp.toString, schema, ctx)
      new DataWriter[InternalRow] {
        override def write(row: InternalRow): Unit = w.write(row)
        override def commit(): WriterCommitMessage = {
          w.close()
          require(fs.rename(tmp, fin),
            s"EpochTableSink: publish rename $tmp -> $fin failed")
          StagedFile(fin.toString)
        }
        override def abort(): Unit = {
          try w.close()
          catch { case scala.util.control.NonFatal(_) => () }
          fs.delete(tmp, false): Unit
        }
        override def close(): Unit = ()
      }
    }
  }
}
