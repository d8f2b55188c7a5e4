package graft.sources

import graft.ops.{Epoch, EpochTable}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL face of the epoch table tier: a DataSourceV2 `TableCatalog`
  * that serves every [[graft.ops.EpochTable]] layout under one root as
  * an ordinary SQL table — with version-id TIME TRAVEL through Spark's
  * own `VERSION AS OF` syntax:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[graft.sources.EpochTableCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "<warehouse root>")
  *   spark.sql("SELECT * FROM graft.contributions")             // head
  *   spark.sql("SELECT * FROM graft.contributions VERSION AS OF 3")
  * }}}
  *
  * ≙ the reference's "every monthly version stays queryable" made a
  * first-class SQL capability (`RawDataVersion`,
  * `models/tracking.py:~130`): `VERSION AS OF n` addresses the
  * `RawDataVersion` id — resolved through each retained epoch's meta
  * row, exactly like [[graft.ops.EpochTable.dataForVersion]] — not the
  * raw epoch number, so compactions and takedown epochs never shift
  * what a version id means.
  *
  * Architecture (the Spark-first part): `loadTable` resolves the
  * manifest ONCE — the reader's single coordination point — and hands
  * Spark its pinned generation directories as a built-in vectorized
  * parquet [[ParquetTable]]. Everything downstream is stock Spark:
  * filter pushdown, column pruning, partition pruning, whole-stage
  * codegen — zero wrapper cost on the scan path, and snapshot
  * isolation falls out because the `Table` holds the PINNED dir list,
  * not the layout root (a refresh committing mid-query flips the
  * manifest, never the dirs a running scan reads). Re-resolution
  * happens per `spark.sql` call, so each statement sees the newest
  * committed version.
  *
  * SQL WRITES GO THROUGH THE MANIFEST PROTOCOL — never around it:
  * `INSERT INTO` commits one delta version
  * ([[graft.ops.EpochTable.refreshDelta]] under `Epoch.occ`),
  * `INSERT OVERWRITE` commits a full-reload version (≙ the
  * reference's monthly reload — the old version stays addressable by
  * `VERSION AS OF`), and `DELETE FROM` commits one tombstone takedown
  * epoch; version ids self-assign past the retained maximum. A write
  * path that dodged the protocol (files appended into generation
  * dirs) is structurally impossible here: the only write surface IS
  * the commit. Catalog-level DDL (CREATE/DROP/ALTER/RENAME) still
  * throws — layouts are created by their build pipelines. A version
  * carrying unfolded tombstones or merge generations refuses READS
  * loudly (the bare parquet `Table` cannot express the
  * anti-join/shadowing plan) — compact first, or read through
  * `EpochTable`'s faces.
  *
  * Identifier mapping: `graft.ns.tbl` → `<root>/ns/tbl` — one epoch
  * layout per table path, namespaces are directories. */
final class EpochTableCatalog extends TableCatalog
    with StagingTableCatalog with ProcedureCatalog
    with FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var registry: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"EpochTableCatalog: spark.sql.catalog.$name.root is required"))
    registry = Option(options.get("registry"))
  }

  override def name(): String = catalogName

  private def active: SparkSession = SparkSession.active

  private def layoutPath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$root/", "/", "")

  /** Tables under a namespace = child dirs holding >=1 committed
    * manifest — one FS listing, no file IO. In snapshot mode, only
    * the tiers the current registry snapshot pins are tables. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val s = active
    val base = new org.apache.hadoop.fs.Path(
      namespace.mkString(s"$root/", "/", ""))
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Array.empty
    val pinnedOnly = registry.map(r =>
      graft.ops.Snapshot.resolvePins(s, r).keySet)
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(d => pinnedOnly.forall(_.contains(d)))
      .filter(d => Epoch.committedList(s,
        new org.apache.hadoop.fs.Path(base, d).toString).nonEmpty)
      .sorted
      .map(Identifier.of(namespace, _))
      .toArray
  }

  /** `$versions` identifiers resolve to their base layout; snapshot
    * mode recognizes only the tiers the registry cut pins — the same
    * rules [[loadTable]] applies, so EXISTS and LOAD can never
    * disagree. */
  override def tableExists(ident: Identifier): Boolean = {
    val suffix = Seq(MetaSuffix, ChangesSuffix)
      .find(ident.name().endsWith)
    val base = suffix.fold(ident)(sfx =>
      Identifier.of(ident.namespace(),
        ident.name().stripSuffix(sfx)))
    // snapshot mode refuses $versions/$changes in loadTable (history
    // and the live head both escape the cut) — EXISTS answers
    // consistently
    (suffix.isEmpty || registry.isEmpty) &&
    registry.forall(reg =>
      graft.ops.Snapshot.resolvePins(active, reg).contains(base.name())) &&
      Epoch.resolve(active, layoutPath(base)).nonEmpty
  }

  /** Iceberg-style metadata-table suffix: `graft.tbl$versions` is the
    * RawDataVersion history of `graft.tbl` (id, verified counts, the
    * verify invariant, the declared release instant) as a SQL table. */
  private val MetaSuffix = "$versions"

  /** The TYPED CHANGE FEED suffix: `readStream.table("graft.\`tbl$changes\`")`
    * subscribes to the table's committed changes as typed rows
    * (after-image columns + `_op` + `_epoch`) — merge versions stream
    * as upserts, takedowns as delete keys, folds are skipped
    * ([[EpochTableStream.ChangesTable]]). */
  private val ChangesSuffix = "$changes"

  /** The CURRENT version — resolved at load time, pinned thereafter.
    * `tbl$versions` loads the version-history metadata table. */
  override def loadTable(ident: Identifier): Table = {
    val s = active
    if (ident.name().endsWith(MetaSuffix)) {
      refuseEscapeInSnapshotMode("the $versions history table")
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix(MetaSuffix))
      val p = layoutPath(base)
      if (Epoch.resolve(s, p).isEmpty)
        throw new NoSuchTableException(ident)
      return new EpochTableCatalog.VersionsTable(ident.toString,
        EpochTable.versionsMeta(s, p).orderBy("version"))
    }
    if (ident.name().endsWith(ChangesSuffix)) {
      refuseEscapeInSnapshotMode("the $changes feed (it follows the " +
        "live head)")
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix(ChangesSuffix))
      val p = layoutPath(base)
      if (Epoch.resolve(s, p).isEmpty)
        throw new NoSuchTableException(ident)
      return new EpochTableStream.ChangesTable(ident.toString, s, p)
    }
    val p = layoutPath(ident)
    val m = registry match {
      case None =>
        Epoch.resolve(s, p).getOrElse(
          throw new NoSuchTableException(ident))
      case Some(reg) =>
        // SNAPSHOT MODE: every table resolves through the SAME
        // registry snapshot manifest — one consistent cut across all
        // tables this catalog serves ([[graft.ops.Snapshot]]); a tier
        // the snapshot does not pin is not a table HERE
        val pins = graft.ops.Snapshot.resolvePins(s, reg)
        if (!pins.contains(ident.name()))
          throw new NoSuchTableException(ident)
        graft.ops.Snapshot.pinned(s, p, pins, ident.name())
    }
    pinned(s, ident, p, m)
  }

  /** Snapshot mode serves exactly ONE consistent cut — a time-travel
    * read (or the full `$versions` history) would escape it and could
    * surface epochs the snapshot never pinned; refuse loudly, naming
    * the head-mode alternative. */
  private def refuseEscapeInSnapshotMode(what: String): Unit =
    registry.foreach(_ => throw new UnsupportedOperationException(
      s"EpochTableCatalog($catalogName) runs in SNAPSHOT MODE — $what " +
        "would escape the registry cut this catalog promises; register " +
        "a head-mode catalog (no registry option) for history reads"))

  /** TIME TRAVEL: `TIMESTAMP AS OF <t>` — resolved against each
    * version's DECLARED release instant (≙
    * `RawDataVersion.release_datetime`), never commit wall-clock, so
    * "the table as California published it in March" is exact and
    * replayable. `timestamp` arrives in microseconds (Spark's
    * contract). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    refuseEscapeInSnapshotMode("TIMESTAMP AS OF")
    val s = active
    val p = layoutPath(ident)
    val m = EpochTable.manifestForTimestamp(s, p, timestamp).getOrElse(
      throw new NoSuchTableException(ident))
    pinned(s, ident, p, m)
  }

  /** TIME TRAVEL: `VERSION AS OF <v>` — `v` is the RawDataVersion id,
    * resolved through the retained epochs' meta rows. */
  override def loadTable(ident: Identifier, version: String): Table = {
    refuseEscapeInSnapshotMode("VERSION AS OF")
    val s = active
    val p = layoutPath(ident)
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException =>
          throw new NoSuchTableException(ident)
      }
    val m = EpochTable.manifestForVersion(s, p, v).getOrElse(
      throw new NoSuchTableException(ident))
    pinned(s, ident, p, m)
  }

  private def pinned(s: SparkSession, ident: Identifier, p: String,
      m: Epoch.Manifest): Table =
    // A DIVERGED manifest (rename/drop awaiting its convergence fold
    // — one manifest-key check, no file IO on the fast path) serves
    // through the MAPPED face: current display names over the old
    // physical columns, reads only. Otherwise the stock path: schema
    // comes from the raw data dirs (merge batches are schema-equal by
    // construction); the folded-snapshot gate runs lazily at SCAN
    // build, so DML on a merge-bearing layout works while reads
    // refuse with the compact-first message.
    if (EpochTable.isDiverged(m))
      new EpochTableCatalog.MappedEpochTable(ident.toString, s, p, m)
    else
      // the DECLARED schema (when the manifest records field ids)
      // pins the read: files predating an added column serve typed
      // NULLs, and schema inference is skipped on the hot path
      new EpochTableCatalog.PinnedEpochTable(ident.toString, s, p, m,
        ParquetTable(ident.toString, s,
          new CaseInsensitiveStringMap(java.util.Collections.emptyMap()),
          EpochTable.scanDataDirs(p, m),
          EpochTable.physReadSchema(s, p, m),
          classOf[ParquetFileFormat]))

  private def readOnly(): Nothing =
    throw new UnsupportedOperationException(
      s"EpochTableCatalog($catalogName) is read-only for bare DDL — " +
        "layouts are created by their build pipelines or by CREATE " +
        "TABLE AS SELECT (which commits manifest 0 through the same " +
        "protocol); mutations go through EpochTable.refresh/" +
        "refreshDelta/merge/delete so every change is one atomic " +
        "manifest")

  // ---- CTAS: the one sanctioned SQL table-creation path ----------
  // `CREATE TABLE cat.t AS SELECT …` routes through stageCreate (this
  // catalog is a StagingTableCatalog), the SELECT's rows land via the
  // staged table's writer as EpochTable.refresh(version = 0) under
  // Epoch.occ — one atomic manifest commit, immediately carrying the
  // full version/meta/fields machinery ($versions, VERSION AS OF,
  // DML, the change feed). Plain CREATE TABLE (no AS) still throws:
  // an epoch layout without a committed version serves nothing.

  override def stageCreate(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    refuseEscapeInSnapshotMode("CREATE TABLE AS SELECT")
    // `PARTITIONED BY (col)` / `PARTITIONED BY (months(col))` map to
    // the table tier's identity/month partition specs — the new
    // layout is BORN partitioned (per-value dirs, partition-scoped
    // folds); other transforms refuse naming the supported set
    val spec: Option[EpochTable.PartSpec] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) =>
        val colName = t.references().toSeq match {
          case Seq(r) => r.fieldNames.mkString(".")
          case _ => throw new UnsupportedOperationException(
            s"EpochTableCatalog: partition transform $t must " +
              "reference exactly one column")
        }
        t.name() match {
          case "identity" =>
            Some(EpochTable.PartSpec(colName, "identity"))
          case "years" =>
            Some(EpochTable.PartSpec(colName, "year"))
          case "months" =>
            Some(EpochTable.PartSpec(colName, "month"))
          case "days" =>
            Some(EpochTable.PartSpec(colName, "day"))
          case other => throw new UnsupportedOperationException(
            s"EpochTableCatalog: unsupported partition transform " +
              s"$other — supported: identity (PARTITIONED BY (col)) " +
              "and years/months/days of a date/timestamp column")
        }
      case many => throw new UnsupportedOperationException(
        s"EpochTableCatalog: multi-column partitioning is not " +
          s"supported yet (got ${many.mkString(", ")})")
    }
    val s = active
    val p = layoutPath(ident)
    if (Epoch.resolve(s, p).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    new EpochTableCatalog.StagedEpochTable(ident.toString, s, p,
      StructType(columns.map(c => org.apache.spark.sql.types
        .StructField(c.name(), c.dataType(), c.nullable()))), spec)
  }

  override def stageReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable =
    readOnly()

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable =
    readOnly()

  // ---- SQL CALL maintenance procedures --------------------------
  // The operational lifecycle as first-class SQL (the Iceberg
  // `CALL catalog.system.*` idea on Spark 4's ProcedureCatalog):
  //   CALL cat.compact(`table` => 't' [, n_files, cluster_by])
  //   CALL cat.prune(`table` => 't' [, keep])
  //   CALL cat.reap_stages(`table` => 't' [, older_than_ms])
  // Each runs the SAME code path the maintenance sweep uses (occ'd
  // fold, retention-pruned history, staging reap) and returns one
  // status row. Snapshot-mode catalogs refuse (maintenance mutates).

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty && registry.isEmpty)
      EpochTableCatalog.ProcedureNames
        .map(Identifier.of(namespace, _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    refuseEscapeInSnapshotMode("CALL (maintenance mutates the head)")
    require(ident.namespace().isEmpty &&
      EpochTableCatalog.ProcedureNames.contains(ident.name()),
      s"EpochTableCatalog: no procedure $ident (have " +
        s"${EpochTableCatalog.ProcedureNames.mkString(", ")})")
    new EpochTableCatalog.MaintenanceProcedure(ident.name(), active,
      root)
  }

  // ---- FunctionCatalog: the bucket transform ---------------------
  // Storage-partitioned joins resolve a scan-reported
  // `bucket(n, col)` transform through the RELATION's catalog — this
  // is how Spark learns what our bucket ids mean and that two epoch
  // tables' bucketings are the same function ([[BucketFunction]]).

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty)
      Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      EpochTableCatalog.BucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = readOnly()

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = readOnly()

  /** `ALTER TABLE … RENAME COLUMN` / `DROP COLUMN` — SQL-native
    * field-id evolution: each change is ONE metadata commit through
    * [[graft.ops.EpochTable.renameColumn]]/[[graft.ops.EpochTable.dropColumn]]
    * (zero data movement; retained versions keep resolving by id).
    * Until the next fold converges the files, the table serves
    * through the MAPPED read face (current names, reads only — see
    * [[EpochTableCatalog.MappedEpochTable]]). Every other ALTER shape
    * still refuses. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    refuseEscapeInSnapshotMode("ALTER TABLE")
    val s = active
    val p = layoutPath(ident)
    if (Epoch.resolve(s, p).isEmpty)
      throw new NoSuchTableException(ident)
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "EpochTableCatalog: nested column evolution is not supported")
        EpochTable.renameColumn(s, p, rc.fieldNames()(0), rc.newName())
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames().length == 1,
          "EpochTableCatalog: nested column evolution is not supported")
        EpochTable.dropColumn(s, p, dc.fieldNames()(0))
      case ac: TableChange.AddColumn =>
        // ADD COLUMN / the automatic half of MERGE … WITH SCHEMA
        // EVOLUTION: one metadata commit, files predating the column
        // serve typed NULLs (declared-schema reads)
        require(ac.fieldNames().length == 1,
          "EpochTableCatalog: nested column evolution is not supported")
        require(ac.position() == null,
          "EpochTableCatalog: positioned ADD COLUMN is not supported " +
            "— new columns append to the display order")
        EpochTable.addColumn(s, p, ac.fieldNames()(0), ac.dataType())
      case sp: TableChange.SetProperty =>
        // table properties are one metadata commit; `graft.mode=mor`
        // flips row-level DELETE to merge-on-read
        if (sp.property() == "graft.mode")
          require(Set("mor", "cow")(sp.value()),
            s"EpochTableCatalog: graft.mode must be mor or cow, got " +
              sp.value())
        EpochTable.setProperty(s, p, sp.property(), Some(sp.value()))
      case rp: TableChange.RemoveProperty =>
        EpochTable.setProperty(s, p, rp.property(), None)
      case _ => readOnly()
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = readOnly()

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly()
}

object EpochTableCatalog {

  /** Register this catalog on the session under `name` (idempotent) —
    * SQL can then address every epoch table layout under `rootDir`.
    * With `registry` set, the catalog runs in SNAPSHOT MODE: every
    * table resolves through the CURRENT registry snapshot
    * ([[graft.ops.Snapshot]]) — one consistent cut across all pinned
    * tables, so a cross-table join can never straddle an ingest (the
    * multi-table form of `snapshot_table_fetch`'s guarantee). NOTE:
    * catalog options are read once at first use per session; register
    * snapshot and head modes under DIFFERENT names. */
  def register(s: SparkSession, name: String, rootDir: String,
      registry: Option[String] = None): Unit = {
    s.conf.set(s"spark.sql.catalog.$name",
      classOf[EpochTableCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.root", rootDir)
    registry.foreach(r =>
      s.conf.set(s"spark.sql.catalog.$name.registry", r))
  }

  /** The SQL table over one pinned version. READS: the batch scan
    * path (pushdown, pruning, codegen) is the built-in parquet
    * table's — routed through
    * [[EpochTableStream.StreamableScanBuilder]], which delegates every
    * pushdown call and only adds the micro-batch face
    * (`readStream.table` subscribes to committed delta versions).
    * WRITES commit manifests, never files: INSERT INTO → one delta
    * version, INSERT OVERWRITE / TRUNCATE-backed overwrite → one
    * full-reload version, DELETE FROM → one tombstone takedown epoch —
    * each under `Epoch.occ`, each a single atomic rename, version ids
    * self-assigned past the retained maximum (SQL has no
    * RawDataVersion notion; pipeline runs that do assign their own ids
    * coexist because both draw from the same monotone sequence).
    * Writes act on the layout HEAD (the occ rebase discipline), not
    * the pinned manifest a time-travel read resolved. */
  private final class PinnedEpochTable(ident: String, s: SparkSession,
      layoutPath: String, manifest: Epoch.Manifest,
      delegate: ParquetTable)
      extends Table with SupportsRead with SupportsWrite
      with SupportsDelete with SupportsMetadataColumns
      with SupportsRowLevelOperations {

    /** One synthetic metadata column, the row's FILE PATH: every data
      * file is its own rewrite group (Iceberg's `_file` discipline).
      * Spark's group-based row-level framework routes the replacement
      * rows through its data/metadata projections only when the
      * operation declares metadata attributes the scan produces
      * (`ReplaceDataExec.writingTask` falls back to writing RAW rows
      * — operation column included — otherwise); `_g` engages that
      * path AND carries the group identity the runtime group filter
      * prunes on ([[RewriteScan]]). */
    override def metadataColumns(): Array[MetadataColumn] =
      Array(EpochTableCatalog.RewriteGroupColumn)
    override def name(): String = ident
    override def schema(): StructType = delegate.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.STREAMING_WRITE,
        // MERGE … WITH SCHEMA EVOLUTION: Spark computes the additive
        // TableChanges and routes them through alterTable(AddColumn)
        // — one metadata commit — before planning the merge
        TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
    /** The bucket layout the scan may REPORT: declared by the
      * manifest AND physically intact — every data entry must carry a
      * `_b=` segment (a row-level rewrite's staged files don't, so
      * the co-partitioning claim falls back to plain scanning until
      * the next fold re-buckets; a false claim would silently
      * mis-join). */
    private lazy val reportableBuckets: Option[EpochTable.BucketSpec] =
      EpochTable.bucketSpecOf(s, layoutPath, manifest).filter(_ =>
        manifest.components.getOrElse("data", Seq.empty)
          .forall(_.contains("_b=")))

    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = {
      // MERGE-ON-READ: a mor-mode manifest with pending tombstones
      // (and no merges) serves through the tombstone-applying scan —
      // a point DELETE committed O(|doomed|) bytes and reads stay
      // correct until the maintenance fold reaps. Otherwise the
      // folded-snapshot gate: reads of a version carrying unfolded
      // tombstones/merges refuse here (writes never arrive).
      val morTomb = EpochTable.morTombstones(s, layoutPath, manifest)
      if (morTomb.isEmpty)
        EpochTable.scanDirs(s, layoutPath, manifest)
      new EpochTableStream.StreamableScanBuilder(s, layoutPath,
        manifest, delegate.schema, delegate.newScanBuilder(options),
        options,
        if (morTomb.isEmpty) reportableBuckets else None, morTomb)
    }

    /** Declared table properties (`SHOW TBLPROPERTIES`). */
    override def properties(): java.util.Map[String, String] = {
      val m = new java.util.HashMap[String, String]()
      EpochTable.propsOf(s, layoutPath, manifest)
        .foreach { case (k, v) => m.put(k, v) }
      m
    }

    /** The next version id no retained version uses — monotone across
      * SQL and pipeline writers (retained-history-bounded driver read). */
    private def autoVersion(): Long = {
      val next = Epoch.resolve(s, layoutPath).map(_.next).getOrElse(0L)
      val maxVer = EpochTable.versionsMeta(s, layoutPath)
        .agg(org.apache.spark.sql.functions.max("version")).head()
        .getLong(0)
      math.max(next, maxVer + 1L)
    }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        private var overwrite = false
        override def truncate(): WriteBuilder = { overwrite = true; this }
        override def build(): Write = new V1Write {
          /** `writeStream.toTable` — each micro-batch commits one
            * delta version, exactly-once off the ledger
            * ([[EpochTableSink]]); append output mode only (the
            * change feed and snapshot history have no meaning under
            * per-batch truncation). */
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
            if (overwrite) throw new UnsupportedOperationException(
              "EpochTableCatalog: streaming writes are APPEND-only — " +
                "complete/update output modes would rewrite history " +
                "every batch; route full reloads through INSERT " +
                "OVERWRITE")
            new EpochTableSink.EpochStreamingWrite(s, layoutPath, info)
          }
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, ov: Boolean): Unit =
                Epoch.occ(s, layoutPath) {
                  if (overwrite || ov)
                    // a partitioned table's overwrite keeps its
                    // declared partition spec — the monthly reload
                    // lands partitioned like the layout it replaces
                    EpochTable.partSpecOf(s, layoutPath,
                        EpochTable.current(s, layoutPath)) match {
                      case Some(spec) =>
                        EpochTable.refreshPartitioned(s, layoutPath,
                          data, version = autoVersion(), spec)
                      case None =>
                        EpochTable.refresh(s, layoutPath, data,
                          version = autoVersion())
                    }
                  else
                    EpochTable.refreshDelta(s, layoutPath, data,
                      version = autoVersion())
                  ()
                }
            }
        }
      }

    /** SQL `UPDATE` / `MERGE INTO` (and non-pushable `DELETE`),
      * GROUP-BASED COPY-ON-WRITE at FILE granularity: every data file
      * is one rewrite group. The rewrite scan plans one partition per
      * file and exposes NO build-time filter pushdown (a pushed
      * condition would prune ROWS out of the rewrite and the replaced
      * groups would lose them) — but it DOES accept Spark's runtime
      * group filter ([[RewriteScan]] implements
      * `SupportsRuntimeV2Filtering` on `_g`): the optimizer plans a
      * matching-rows subquery over the ORIGINAL table (full pushdown
      * — the command condition reaches the parquet scan, footer
      * stats + the `table_cluster` layout prune it to few files),
      * collects the distinct `_g` file paths that contain matches,
      * and the rewrite scan drops every other file. The replacement
      * rows for the MATCHED FILES ONLY stream through Spark's own
      * parquet writers into a private staging dir; the driver-side
      * commit ([[graft.ops.EpochTable.commitRewrite]]) carries every
      * untouched file forward BY REFERENCE in the new manifest and
      * aborts loudly if any concurrent commit moved the head
      * mid-statement (the lost-update conflict check). Readers keep
      * their pinned version throughout; the pre-statement version
      * stays addressable; meta rows carry forward verbatim. Cost
      * ∝ |touched files| on a clustered layout — degrades to the
      * whole-table rewrite (never to wrong answers) when the
      * condition cannot prune. */
    override def newRowLevelOperationBuilder(
        info: RowLevelOperationInfo): RowLevelOperationBuilder =
      new RowLevelOperationBuilder {
        override def build(): RowLevelOperation = new RowLevelOperation {
          // the manifest the rewrite scan pinned + the scan itself —
          // the commit consults both (conflict check; the scanned
          // file set after runtime group filtering)
          @volatile private var scanned: Epoch.Manifest = _
          @volatile private var rewriteScan
              : EpochTableCatalog.RewriteScan = _

          override def command(): RowLevelOperation.Command =
            info.command()

          override def requiredMetadataAttributes()
              : Array[NamedReference] =
            Array(Expressions.column(EpochTableCatalog.GroupCol))

          override def newScanBuilder(
              options: CaseInsensitiveStringMap): ScanBuilder = {
            scanned = EpochTable.current(s, layoutPath)
            new EpochTableCatalog.RewriteScanBuilder(s,
              EpochTable.scanDirs(s, layoutPath, scanned),
              EpochTable.physReadSchema(s, layoutPath, scanned),
              sc => rewriteScan = sc)
          }

          override def newWriteBuilder(
              winfo: LogicalWriteInfo): WriteBuilder = {
            val stage = s"$layoutPath/_stage_${winfo.queryId()}"
            val inner = ParquetTable(s"$ident#stage", s,
              new CaseInsensitiveStringMap(
                java.util.Collections.emptyMap()),
              Seq(stage), Some(winfo.schema()),
              classOf[ParquetFileFormat]).newWriteBuilder(winfo)
            new WriteBuilder {
              override def build(): Write = new Write {
                private val d = inner.build()
                override def description(): String =
                  s"epoch-cow-rewrite($ident)"
                override def toBatch: BatchWrite = new BatchWrite {
                  private val db = d.toBatch
                  // the file write runs its own Hadoop commit protocol
                  // (useCommitCoordinator=false there); not delegating
                  // this re-enables driver coordination ON TOP of it
                  // and every task commit gets denied
                  override def useCommitCoordinator(): Boolean =
                    db.useCommitCoordinator()
                  override def createBatchWriterFactory(
                      pinfo: PhysicalWriteInfo): DataWriterFactory =
                    db.createBatchWriterFactory(pinfo)
                  override def commit(
                      messages: Array[WriterCommitMessage]): Unit = {
                    db.commit(messages)
                    val rewritten = Option(rewriteScan)
                      .map(_.scannedFilePaths).getOrElse(Set.empty)
                    Epoch.occ(s, layoutPath) {
                      EpochTable.commitRewrite(s, layoutPath, scanned,
                        rewritten, stage)
                    }
                  }
                  override def abort(
                      messages: Array[WriterCommitMessage]): Unit = {
                    db.abort(messages)
                    val f = new org.apache.hadoop.fs.Path(stage)
                      .getFileSystem(
                        s.sparkContext.hadoopConfiguration)
                    f.delete(new org.apache.hadoop.fs.Path(stage), true)
                  }
                }
              }
            }
          }
        }
      }

    override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
      EpochTableCatalog.filtersToColumn(filters).isDefined

    /** DELETE FROM … WHERE, COPY-ON-WRITE: one tombstone epoch (the
      * pushed condition evaluated against the served head, ∝ |doomed|)
      * followed by one fold epoch — successive occ blocks, so the next
      * SELECT serves a bare folded snapshot (the SQL face's contract).
      * The fold is ∝ |table| — the price every copy-on-write format
      * pays on DELETE; high-volume takedown pipelines use the
      * merge-on-read path instead ([[graft.ops.EpochTable.delete]] +
      * the sweep's cadence-scheduled folds) and pay ∝ |doomed| per
      * batch. The pre-delete version stays addressable. */
    override def deleteWhere(filters: Array[sources.Filter]): Unit = {
      val cond = EpochTableCatalog.filtersToColumn(filters).getOrElse(
        throw new UnsupportedOperationException(
          s"EpochTableCatalog: cannot push delete condition " +
            filters.mkString("[", ", ", "]")))
      Epoch.occ(s, layoutPath) {
        val m = EpochTable.current(s, layoutPath)
        val doomed = EpochTable.data(s, layoutPath, m).where(cond)
        EpochTable.delete(s, doomed, layoutPath, batchId = m.next)
      }
      // MERGE-ON-READ mode stops here: the statement committed only
      // the tombstone component (O(|doomed|) bytes, zero data files
      // rewritten) — serving applies it at read and the maintenance
      // fold reaps on its own cadence. Copy-on-write mode folds now:
      // partition-scoped on a partitioned table (∝ |touched
      // partitions| — the tombstones carry full rows, so the touched
      // set derives exactly), bucket-scoped on a bucketed one,
      // whole-table otherwise.
      if (!EpochTable.isMor(s, layoutPath,
          EpochTable.current(s, layoutPath)))
        Epoch.occ(s, layoutPath) {
          EpochTable.compactForDelete(s, layoutPath)
        }
    }
  }

  private[sources] val ProcedureNames =
    Seq("compact", "prune", "reap_stages", "compact_bucketed")

  /** One maintenance verb as a Spark 4 SQL procedure. Parameters are
    * IN-mode with literal defaults; `call` runs the verb and returns
    * a single status row as a LocalScan (no executor tasks). */
  private[sources] final class MaintenanceProcedure(verb: String,
      s: SparkSession, root: String)
      extends org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
      with org.apache.spark.sql.connector.catalog.procedures.BoundProcedure {
    import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType => SStr}

    override def name(): String = verb
    override def description(): String = verb match {
      case "compact" =>
        "fold accumulated deltas/merges/tombstones into one snapshot " +
          "generation (occ'd; optional clustering)"
      case "prune" =>
        "retire manifests/generations past the retention horizon"
      case "compact_bucketed" =>
        "fold into a hash-bucketed layout on a key — enables " +
          "storage-partitioned (zero-exchange) joins"
      case _ =>
        "delete crashed statements' _stage_* dirs older than a bound"
    }
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = {
      val tbl = ProcedureParameter.in("table", SStr)
        .comment("table identifier under this catalog").build()
      verb match {
        case "compact" => Array(tbl,
          ProcedureParameter.in("n_files", IntegerType)
            .defaultValue("8").build(),
          ProcedureParameter.in("cluster_by", SStr)
            .defaultValue("''")
            .comment("comma-separated range-cluster columns").build())
        case "prune" => Array(tbl,
          ProcedureParameter.in("keep", IntegerType)
            .defaultValue("3").build())
        case "compact_bucketed" => Array(tbl,
          ProcedureParameter.in("key", SStr)
            .comment("hash-bucket key column").build(),
          ProcedureParameter.in("n_buckets", IntegerType)
            .defaultValue("8").build())
        case _ => Array(tbl,
          ProcedureParameter.in("older_than_ms", LongType)
            .defaultValue("3600000").build())
      }
    }

    override def call(input: org.apache.spark.sql.catalyst.InternalRow)
        : java.util.Iterator[org.apache.spark.sql.connector.read.Scan] = {
      val path = s"$root/${input.getUTF8String(0).toString}"
      require(Epoch.resolve(s, path).nonEmpty,
        s"EpochTableCatalog.$verb: no committed version at $path")
      val status = verb match {
        case "compact" =>
          val nFiles = input.getInt(1)
          val cluster = input.getUTF8String(2).toString.trim
          Epoch.occ(s, path) {
            EpochTable.compact(s, path, nFiles,
              if (cluster.isEmpty) Seq.empty
              else cluster.split(",").map(_.trim).toSeq)
          }
          s"folded into epoch ${EpochTable.current(s, path).epoch}"
        case "prune" =>
          Epoch.prune(s, path, input.getInt(1))
          s"retained ${Epoch.committedList(s, path).size} manifests"
        case "compact_bucketed" =>
          val key = input.getUTF8String(1).toString
          val n = input.getInt(2)
          Epoch.occ(s, path) {
            EpochTable.compactBucketed(s, path, key, n)
          }
          s"bucketed into $n buckets on $key at epoch " +
            s"${EpochTable.current(s, path).epoch}"
        case _ =>
          val reaped = Epoch.reapStages(s, path, input.getLong(1))
          s"reaped ${reaped.size} staging dirs" +
            (if (reaped.isEmpty) "" else reaped.mkString(": ", ", ", ""))
      }
      val schema = StructType(Seq(org.apache.spark.sql.types
        .StructField("status", org.apache.spark.sql.types.StringType)))
      val row: org.apache.spark.sql.catalyst.InternalRow =
        InternalRow(org.apache.spark.unsafe.types.UTF8String
          .fromString(status))
      java.util.Collections.singletonList(
        new org.apache.spark.sql.connector.read.LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = schema
        }: org.apache.spark.sql.connector.read.Scan).iterator()
    }
  }

  /** The MAPPED SQL face of a DIVERGED table (a rename/drop awaiting
    * its convergence fold): serves the CURRENT display schema over
    * the old physical columns by field-id resolution — reads only
    * (writes, streaming, and row-level ops are fenced until the fold;
    * the missing capabilities make Spark refuse them in analysis).
    * The scan stays the stock VECTORIZED parquet path: rows are
    * positional, so the mapping costs exactly two schema-object
    * renames — display→physical on the way down (column pruning +
    * pushed filters, so footer pruning still fires on the renamed
    * column) and physical→display on the way up. */
  private[sources] final class MappedEpochTable(ident: String,
      s: SparkSession, layoutPath: String, manifest: Epoch.Manifest)
      extends Table with SupportsRead {
    private lazy val fields =
      EpochTable.liveFields(s, layoutPath, manifest)
    override def name(): String = ident
    override def schema(): StructType =
      EpochTable.displaySchema(s, layoutPath, manifest)
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = {
      val dirs = EpochTable.scanDirs(s, layoutPath, manifest)
      new RenamingScanBuilder(
        ParquetTable(s"$ident#mapped", s,
          new CaseInsensitiveStringMap(
            java.util.Collections.emptyMap()),
          dirs, None, classOf[ParquetFileFormat])
          .newScanBuilder(new CaseInsensitiveStringMap(
            java.util.Collections.emptyMap())),
        schema(),
        fields.map(f => f.name -> f.phys).toMap,
        fields.map(f => f.phys -> f.name).toMap)
    }
  }

  /** Display↔physical translation around a stock parquet scan
    * builder. Filters are pushed under PHYSICAL names (and all
    * returned as residuals — re-evaluating a pushed filter above the
    * scan is always safe); the built scan's batch is the delegate's
    * VERBATIM, only `readSchema` comes back renamed. */
  private final class RenamingScanBuilder(
      delegate: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder,
      displaySchema: StructType,
      d2p: Map[String, String], p2d: Map[String, String])
      extends ScanBuilder
      with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
      with SupportsPushDownRequiredColumns {

    private var pruned = false

    private def toPhys(st: StructType): StructType =
      StructType(st.fields.map(f => f.copy(name =
        d2p.getOrElse(f.name, f.name))))

    override def pushFilters(
        filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
      val translated = filters.map(_.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if d2p.contains(a.name) => a.withName(d2p(a.name))
      })
      delegate.pushFilters(translated)
      // everything stays a residual — over-filtering above a pushed
      // parquet filter is a no-op, under-claiming is never wrong
      filters
    }

    override def pushedFilters()
        : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
      delegate.pushedFilters

    override def pruneColumns(requiredSchema: StructType): Unit = {
      pruned = true
      delegate.pruneColumns(toPhys(requiredSchema))
    }

    override def build(): Scan = {
      if (!pruned) delegate.pruneColumns(toPhys(displaySchema))
      new RenamedScan(delegate.build(), p2d)
    }
  }

  /** The delegate scan with `readSchema` translated physical→display
    * — batch, partitioning, and columnar mode untouched. */
  private final class RenamedScan(delegate: Scan,
      p2d: Map[String, String]) extends Scan {
    override def readSchema(): StructType =
      StructType(delegate.readSchema().fields.map(f =>
        f.copy(name = p2d.getOrElse(f.name, f.name))))
    override def description(): String =
      s"epoch-mapped(${delegate.description()})"
    override def toBatch: Batch = delegate.toBatch
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      delegate.columnarSupportMode()
    override def supportedCustomMetrics()
        : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      delegate.supportedCustomMetrics()
  }

  /** The CTAS staging table: the SELECT's rows arrive through the V1
    * write bridge and commit as EpochTable version 0 under
    * `Epoch.occ` — CTAS IS a refresh, so the new table is born with
    * the full protocol (meta row, field ids, time travel, DML).
    * Abort deletes the half-born layout; commit verifies a manifest
    * actually landed. */
  private final class StagedEpochTable(ident: String, s: SparkSession,
      layoutPath: String, declared: StructType,
      partSpec: Option[EpochTable.PartSpec] = None)
      extends StagedTable with SupportsWrite {
    override def name(): String = ident
    override def schema(): StructType = declared
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE)
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder {
        override def build(): Write = new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, ov: Boolean): Unit =
                Epoch.occ(s, layoutPath) {
                  partSpec match {
                    case Some(spec) => EpochTable.refreshPartitioned(
                      s, layoutPath, data, version = 0L, spec)
                    case None => EpochTable.refresh(
                      s, layoutPath, data, version = 0L)
                  }
                  ()
                }
            }
        }
      }
    override def commitStagedChanges(): Unit =
      require(Epoch.resolve(s, layoutPath).nonEmpty,
        s"EpochTableCatalog: CTAS commit for $ident saw no committed " +
          "manifest — the write never ran")
    /** Abort deletes the half-born layout ONLY while no manifest is
      * committed there: stageCreate's existence check is not under
      * occ, so a racing writer may have committed the same table
      * between the check and this abort — an unconditional delete
      * would destroy ITS committed layout (and if our own write
      * committed manifest 0 before a later stage failure, the table
      * is born and stays; the orphan report covers the odd case). */
    override def abortStagedChanges(): Unit =
      if (Epoch.resolve(s, layoutPath).isEmpty) {
        val f = new org.apache.hadoop.fs.Path(layoutPath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        f.delete(new org.apache.hadoop.fs.Path(layoutPath), true)
      }
  }

  /** The bucket transform both sides of a storage-partitioned join
    * resolve: `pmod(murmur3hash(col), n)` — EXACTLY the placement
    * [[graft.ops.EpochTable.compactBucketed]] wrote (Spark's `hash()`,
    * seed 42), so the reported partition keys are truthful. The
    * canonical name keys compatibility: two epoch-table scans bucketed
    * on the same-typed key with the same n are co-partitioned. */
  private[sources] object BucketFunction
      extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col) = pmod(murmur3hash(col), n) — the epoch table " +
        "tier's hash-bucket placement"
    override def bind(inputType: StructType)
        : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
      require(inputType.size == 2,
        s"bucket expects (numBuckets, col), got $inputType")
      new BoundBucket(inputType.fields(1).dataType)
    }
  }

  private final class BoundBucket(keyType: org.apache.spark.sql.types.DataType)
      extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
    @transient private lazy val hasher =
      new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        Seq(org.apache.spark.sql.catalyst.expressions.BoundReference(
          1, keyType, nullable = true)), 42)
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(org.apache.spark.sql.types.IntegerType, keyType)
    override def resultType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isResultNullable: Boolean = false
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${keyType.catalogString})"
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val h = hasher.eval(input).asInstanceOf[Int]
      ((h % n) + n) % n
    }
  }

  /** The rewrite-group metadata column name ([[RewriteGroupColumn]]). */
  private[sources] val GroupCol = "_g"

  /** The rewrite group identity: the row's data FILE PATH (scheme
    * stripped) — every file is one copy-on-write group, so runtime
    * group filtering prunes point DML to the files its condition
    * touches. */
  private[sources] object RewriteGroupColumn extends MetadataColumn {
    override def name(): String = GroupCol
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "rewrite group id: the row's data file path — one " +
        "copy-on-write group per file"
  }

  /** One [[FilePartition]] per physical FILE: the delegate parquet
    * scan may split a file into ranges or coalesce several files into
    * one partition; regroup so partition ≡ group. Group identity must
    * survive splits, so it is the file path, never the partition. */
  private[sources] def perFilePartitions(
      parts: Array[InputPartition])
      : Array[org.apache.spark.sql.execution.datasources.FilePartition] = {
    import org.apache.spark.sql.execution.datasources.FilePartition
    val files = parts.flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"EpochTableCatalog: expected FilePartition from the parquet " +
          s"scan, got ${other.getClass.getName}")
    }
    files.groupBy(_.filePath.toString).toSeq.sortBy(_._1).zipWithIndex
      .map { case ((_, fs), i) => FilePartition(i, fs) }.toArray
  }

  /** The group id of a per-file partition — the SAME derivation the
    * reader factory appends as `_g`, so the runtime filter's IN-set
    * and the commit's rewritten-file set always compare like with
    * like. */
  private[sources] def partitionFilePath(
      fp: org.apache.spark.sql.execution.datasources.FilePartition)
      : String =
    fp.files.head.filePath.toPath.toUri.getPath

  /** The ROW-LEVEL REWRITE scan builder. Exposes ONLY column pruning
    * — no build-time filter pushdown — so the command's condition can
    * never prune ROWS out of a group rewrite (a replaced file would
    * lose its unmatched rows); group-level pruning arrives through
    * the RUNTIME filter instead ([[RewriteScan.filter]]). `onBuild`
    * hands the built scan back to the [[RowLevelOperation]] so the
    * commit can read the post-filter scanned-file set. */
  private[sources] final class RewriteScanBuilder(s: SparkSession,
      dirs: Seq[String],
      declaredSchema: Option[StructType] = None,
      onBuild: RewriteScan => Unit = _ => ())
      extends ScanBuilder
      with SupportsPushDownRequiredColumns {
    private val delegate = ParquetTable("epoch-rewrite", s,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()),
      dirs, declaredSchema, classOf[ParquetFileFormat])
      .newScanBuilder(new CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    private var needsGroup = false

    override def pruneColumns(requiredSchema: StructType): Unit = {
      needsGroup = requiredSchema.fieldNames.contains(GroupCol)
      if (needsGroup)
        require(requiredSchema.fields.last.name == GroupCol,
          s"RewriteScanBuilder: $GroupCol must be the trailing column" +
            s" — got ${requiredSchema.fieldNames.mkString(",")}")
      delegate.pruneColumns(StructType(
        requiredSchema.fields.filterNot(_.name == GroupCol)))
    }

    override def build(): Scan = {
      val sc = new RewriteScan(delegate.build(), needsGroup)
      onBuild(sc)
      sc
    }
  }

  /** Per-file rewrite scan with RUNTIME GROUP FILTERING: Spark's
    * optimizer (RowLevelOperationRuntimeGroupFiltering) plans a
    * matching-rows subquery over the original table — command
    * condition pushed all the way into the parquet scan — and feeds
    * the distinct matched `_g` values here via [[filter]]; only the
    * matched files stay in the rewrite. `scannedFilePaths` is what
    * the commit replaces — initialized to every file, narrowed by the
    * runtime filter, so a plan where the rule never fires degrades to
    * the whole-table rewrite, never to a wrong answer. Also serves as
    * the `_g`-producing BATCH scan of the original table (the
    * matching subquery's read — [[EpochTableStream.StreamableScanBuilder]]
    * builds one when `_g` is requested). */
  private[sources] final class RewriteScan(delegate: Scan,
      withGroup: Boolean) extends Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    import org.apache.spark.sql.execution.datasources.FilePartition

    private lazy val allParts: Array[FilePartition] =
      perFilePartitions(delegate.toBatch.planInputPartitions())
    @volatile private var retained: Option[Array[FilePartition]] = None
    private def parts: Array[FilePartition] = retained.getOrElse(allParts)

    /** The files this scan will read / has read — post runtime
      * filtering. */
    private[sources] def scannedFilePaths: Set[String] =
      parts.map(partitionFilePath).toSet

    override def readSchema(): StructType =
      if (!withGroup) delegate.readSchema()
      else StructType(delegate.readSchema().fields :+
        org.apache.spark.sql.types.StructField(GroupCol,
          org.apache.spark.sql.types.StringType, nullable = false))
    override def description(): String =
      s"epoch-rewrite(${delegate.description()})"
    override def toBatch: Batch = this

    override def filterAttributes(): Array[NamedReference] =
      Array(Expressions.column(GroupCol))

    override def filter(predicates: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate])
        : Unit = {
      val sets = predicates.flatMap(inSetOnGroupCol)
      if (sets.nonEmpty) {
        val keep = sets.reduce(_ intersect _)
        // the matched-file set is a driver-side structure bounded by
        // file count. Past the limit (a condition touching most of a
        // many-file table), per-file pruning stops paying for itself
        // — drop it EXPLICITLY and take the documented degradation,
        // the whole-table rewrite: bounded driver memory, never a
        // wrong answer.
        val limit = SparkSession.active.conf
          .get("spark.graft.cow.runtimeFilterFileLimit", "100000").toInt
        if (keep.size <= limit)
          retained = Some(parts.filter(p =>
            keep.contains(partitionFilePath(p))))
      }
      // unrecognized predicates prune nothing — scanning more files
      // than matched is always safe (they rewrite to themselves)
    }

    override def planInputPartitions(): Array[InputPartition] =
      parts.toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory = {
      val inner = delegate.toBatch.createReaderFactory()
      if (!withGroup) inner else FilePathAppendReaderFactory(inner)
    }
  }

  /** Parse a runtime predicate into the matched `_g` set: `IN(_g,
    * v…)` (what the dynamic-pruning subquery produces) or `=(_g, v)`.
    * None → not a `_g` restriction → ignored (safe direction). */
  private def inSetOnGroupCol(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[Set[String]] = {
    def isG(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case r: NamedReference => r.fieldNames.toSeq == Seq(GroupCol)
      case _ => false
    }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value != null => Some(l.value.toString)
      case _ => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && isG(p.children().head) =>
        Some(p.children().tail.flatMap(lit).toSet)
      case "=" if p.children().length == 2 && isG(p.children().head) =>
        lit(p.children()(1)).map(Set(_))
      case _ => None
    }
  }

  /** Appends the partition's FILE PATH as `_g` to every row — forces
    * the row-based read path (per-row join; rewrite and
    * matching-subquery scans are maintenance paths, not serving
    * paths). Partitions are per-file ([[perFilePartitions]]), so the
    * group id is one constant per partition. */
  private final case class FilePathAppendReaderFactory(
      delegate: PartitionReaderFactory) extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(
        p: InputPartition): PartitionReader[InternalRow] = {
      val path = p match {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          partitionFilePath(fp)
        case other => throw new IllegalStateException(
          s"FilePathAppendReaderFactory: expected FilePartition, got " +
            other.getClass.getName)
      }
      val d = delegate.createReader(p)
      new PartitionReader[InternalRow] {
        private val joined =
          new org.apache.spark.sql.catalyst.expressions.JoinedRow
        private val group = InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(path))
        override def next(): Boolean = d.next()
        override def get(): InternalRow = joined(d.get(), group)
        override def close(): Unit = d.close()
      }
    }
  }

  /** v1 data-source filters → one Column, the supported-subset
    * translation `DELETE FROM` pushes through (None = a shape we
    * cannot express; `canDeleteWhere` then refuses in analysis
    * instead of failing mid-delete). */
  private[sources] def filtersToColumn(
      filters: Array[sources.Filter]): Option[Column] =
    filters.foldLeft(Option(lit(true))) { (acc, f) =>
      acc.flatMap(a => filterToColumn(f).map(a && _))
    }

  private def filterToColumn(f: sources.Filter): Option[Column] =
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r))
          yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- filterToColumn(l); rc <- filterToColumn(r))
          yield lc || rc
      case sources.Not(c) => filterToColumn(c).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }

  /** The `$versions` metadata table: one row per retained
    * RawDataVersion — tiny by construction (bounded by the retention
    * horizon, never by table size), so it plans as a LOCAL scan (a
    * driver-side row set, no executor tasks), the same way Iceberg
    * serves its snapshot/history tables. */
  private final class VersionsTable(ident: String,
      df: org.apache.spark.sql.DataFrame)
      extends Table with SupportsRead {
    override def name(): String = ident
    override def schema(): StructType = df.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def rows()
              : Array[org.apache.spark.sql.catalyst.InternalRow] =
            df.queryExecution.executedPlan.executeCollect()
          override def readSchema(): StructType = df.schema
        }
    }
  }
}
