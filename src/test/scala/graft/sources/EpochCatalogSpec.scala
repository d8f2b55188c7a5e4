package graft.sources

import graft.SparkTestBase
import graft.ops.{Epoch, EpochTable}
import org.apache.spark.sql.functions._

/** The DataSourceV2 catalog face of the epoch table tier: SQL reads
  * plan stock pushed-down parquet scans over PINNED manifests, Spark's
  * own `VERSION AS OF` addresses RawDataVersion ids, writes die in
  * analysis, and unfolded tombstone/merge versions refuse loudly. */
class EpochCatalogSpec extends SparkTestBase {

  import spark.implicits._

  private def mkTyped(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i", i * 10L)).toDF("event_id", "etype", "uid")

  private val root = s"${graft.GraftSession.scratchDir}/sqlcat"

  private def registered(): Unit =
    EpochTableCatalog.register(spark, "gcat", root)

  test("SQL head read equals the programmatic serve; each statement " +
      "re-resolves to the newest committed version; listTables lists " +
      "exactly the committed layouts") {
    registered()
    val path = s"$root/evts"
    EpochTable.refresh(spark, path, mkTyped(1L to 40L), version = 0L)
    assert(spark.sql("SELECT * FROM gcat.evts").count() === 40L)
    // an uncommitted sibling dir is not a table
    new java.io.File(s"$root/scratch_not_a_table").mkdirs()
    assert(spark.sql("SHOW TABLES IN gcat").collect()
      .map(_.getAs[String]("tableName")).toSeq === Seq("evts"))
    // the next statement sees the next version — resolution is per query
    EpochTable.refresh(spark, path, mkTyped(1L to 70L), version = 1L)
    assert(spark.sql("SELECT * FROM gcat.evts").count() === 70L)
    assert(spark.sql("SELECT sum(uid) AS s FROM gcat.evts").head()
      .getAs[Long]("s") === (1L to 70L).map(_ * 10L).sum)
  }

  test("VERSION AS OF addresses the RawDataVersion id through the " +
      "meta rows — stable across compaction — and an unknown version " +
      "fails in analysis") {
    registered()
    val path = s"$root/tt"
    EpochTable.refresh(spark, path, mkTyped(1L to 30L), version = 5L)
    EpochTable.refreshDelta(spark, path, mkTyped(31L to 50L),
      version = 7L)
    EpochTable.compact(spark, path)
    // version 7 is CURRENT (carried through the compact's meta row);
    // version 5's epoch is still retained and addressable
    assert(spark.sql("SELECT * FROM gcat.tt VERSION AS OF 7")
      .count() === 50L)
    assert(spark.sql("SELECT * FROM gcat.tt VERSION AS OF 5")
      .count() === 30L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.tt VERSION AS OF 99").collect()
    }
    // compaction carries meta rows forward — the $versions face still
    // shows exactly ONE row per version id, never one per manifest
    val hist = spark.sql("SELECT version FROM gcat.`tt$versions`")
      .collect().map(_.getLong(0)).toSeq
    assert(hist.sorted === hist.distinct.sorted, hist.toString)
    assert(hist.toSet === Set(5L, 7L))
  }

  test("the SQL scan pushes filters and prunes columns — the catalog " +
      "face costs nothing over a bare parquet scan") {
    registered()
    val path = s"$root/push"
    EpochTable.refresh(spark, path, mkTyped(1L to 100L), version = 0L)
    val df = spark.sql(
      "SELECT event_id FROM gcat.push WHERE uid > 500")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(uid), " +
      "GreaterThan(uid,500)]"), s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,uid:bigint>"),
      s"columns not pruned:\n$plan")
    assert(df.count() === 50L)
  }

  test("aggregate pushdown survives the streamable-builder delegation: " +
      "MIN/MAX/COUNT answer from parquet footers, no row scan") {
    registered()
    val path = s"$root/aggpush"
    EpochTable.refresh(spark, path, mkTyped(1L to 64L), version = 0L)
    val prev = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = spark.sql(
        "SELECT MIN(uid) AS lo, MAX(uid) AS hi, COUNT(*) AS n " +
          "FROM gcat.aggpush")
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("PushedAggregation: [MIN(uid), MAX(uid), " +
        "COUNT(*)]"), s"aggregates not pushed:\n$plan")
      val r = df.head()
      assert(r.getAs[Long]("lo") === 10L)
      assert(r.getAs[Long]("hi") === 640L)
      assert(r.getAs[Long]("n") === 64L)
    } finally {
      prev.fold(spark.conf
        .unset("spark.sql.parquet.aggregatePushdown"))(v =>
        spark.conf.set("spark.sql.parquet.aggregatePushdown", v))
    }
  }

  test("SQL writes commit manifest versions, never files: INSERT " +
      "INTO = a delta version, INSERT OVERWRITE = a full reload with " +
      "the old version still addressable, DELETE FROM = a tombstone " +
      "epoch; DDL still throws") {
    registered()
    val path = s"$root/dml"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    // INSERT INTO → one delta version (epoch grew by exactly one)
    spark.sql("INSERT INTO gcat.dml VALUES (11, 'x', 110), (12, 'y', 120)")
    assert(spark.sql("SELECT * FROM gcat.dml").count() === 12L)
    assert(Epoch.resolve(spark, path).get.epoch === 1L)
    assert(Epoch.resolve(spark, path).get.components("data").size === 2)
    // the SQL-assigned version id is queryable like any other
    val v1 = EpochTable.versions(spark, path)
      .orderBy("version").collect().map(_.getAs[Long]("version"))
    assert(v1.toSeq === Seq(0L, 1L))
    // DELETE FROM: copy-on-write — tombstone epoch + fold epoch, so
    // the very next SELECT serves a bare folded snapshot
    spark.sql("DELETE FROM gcat.dml WHERE etype = 'x'")
    assert(spark.sql("SELECT * FROM gcat.dml WHERE event_id = 11")
      .count() === 0L)
    assert(spark.sql("SELECT * FROM gcat.dml").count() === 11L)
    assert(Epoch.resolve(spark, path).get
      .components("tombstones").isEmpty)
    // a non-pushable delete condition falls back to the row-level
    // copy-on-write rewrite — unmatched rows survive
    spark.sql("DELETE FROM gcat.dml WHERE event_id % 2 = 0")
    assert(EpochTable.serve(spark, path).count() === 5L)
    assert(spark.sql("SELECT * FROM gcat.dml WHERE event_id = 7")
      .count() === 1L)
    spark.sql("INSERT INTO gcat.dml SELECT * FROM " +
      "(VALUES (2, 'b2', 20), (4, 'b4', 40), (6, 'b6', 60), " +
      "(8, 'b8', 80), (10, 'b10', 100), (12, 'b12', 120)) " +
      "AS t(event_id, etype, uid)")
    assert(EpochTable.serve(spark, path).count() === 11L)
    // INSERT OVERWRITE → a full-reload version; the pre-overwrite
    // table stays addressable by its version id
    spark.sql("INSERT OVERWRITE gcat.dml VALUES (100, 'z', 1000)")
    assert(spark.sql("SELECT * FROM gcat.dml").count() === 1L)
    val vers = EpochTable.versions(spark, path)
      .orderBy("version").collect().map(_.getAs[Long]("version"))
    val preOverwrite = vers(vers.length - 2)
    assert(EpochTable.dataForVersion(spark, path, preOverwrite)
      .get.count() === 11L)
    // DDL is still refused — layouts are created by their pipelines
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.newtbl (a INT)")
    }
    intercept[Exception] {
      spark.sql("DROP TABLE gcat.dml")
    }
  }

  test("UPDATE and MERGE INTO rewrite copy-on-write: matched rows " +
      "change, unmatched rows survive, sources insert, the " +
      "pre-statement version stays addressable, no staging residue") {
    registered()
    val path = s"$root/rlo"
    EpochTable.refresh(spark, path, mkTyped(1L to 30L), version = 0L)
    // UPDATE: one condition, the rest untouched
    spark.sql("UPDATE gcat.rlo SET etype = 'upd', uid = uid + 1 " +
      "WHERE event_id <= 5")
    val afterUpd = spark.sql("SELECT * FROM gcat.rlo")
    assert(afterUpd.count() === 30L)
    assert(afterUpd.where(col("etype") === "upd").count() === 5L)
    assert(afterUpd.where(col("event_id") === 3L).head()
      .getAs[Long]("uid") === 31L)
    assert(afterUpd.where(col("event_id") === 20L).head()
      .getAs[String]("etype") === "v20")
    // the pre-update rows are still served by the retained epoch
    assert(EpochTable.data(spark, path,
      Epoch.resolveAsOf(spark, path, 0L).get)
      .where(col("event_id") === 3L).head()
      .getAs[String]("etype") === "v3")
    // MERGE INTO: updates + inserts from a source in one statement
    mkTyped(Seq(2L, 3L)).withColumn("etype", lit("merged"))
      .unionByName(mkTyped(Seq(31L, 32L)))
      .createOrReplaceTempView("rlo_src")
    spark.sql("""
      MERGE INTO gcat.rlo t USING rlo_src s ON t.event_id = s.event_id
      WHEN MATCHED THEN UPDATE SET t.etype = s.etype
      WHEN NOT MATCHED THEN INSERT *
    """)
    val afterMerge = spark.sql("SELECT * FROM gcat.rlo")
    assert(afterMerge.count() === 32L)
    assert(afterMerge.where(col("etype") === "merged").count() === 2L)
    assert(afterMerge.where(col("event_id") === 31L).count() === 1L)
    // untouched rows unchanged through both rewrites
    assert(afterMerge.where(col("event_id") === 20L).head()
      .getAs[String]("etype") === "v20")
    // MERGE with a delete clause drops through the same rewrite
    spark.sql("""
      MERGE INTO gcat.rlo t USING rlo_src s ON t.event_id = s.event_id
      WHEN MATCHED AND s.event_id = 2 THEN DELETE
    """)
    assert(spark.sql("SELECT * FROM gcat.rlo").count() === 31L)
    assert(spark.sql("SELECT * FROM gcat.rlo WHERE event_id = 2")
      .count() === 0L)
    // no staging residue
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).exists(_.startsWith("_stage_")))
  }

  test("a version carrying unfolded tombstones or merges refuses " +
      "loudly; compact folds it back into SQL reach") {
    registered()
    val path = s"$root/folded"
    EpochTable.refresh(spark, path, mkTyped(1L to 20L), version = 0L)
    EpochTable.delete(spark, Seq(3L, 4L).toDF("event_id"), path,
      batchId = 1L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.folded").collect()
    }
    assert(e.getMessage.contains("compact first") ||
      Option(e.getCause).exists(_.getMessage.contains("compact first")),
      s"wrong refusal: ${e.getMessage}")
    EpochTable.compact(spark, path)
    assert(spark.sql("SELECT * FROM gcat.folded").count() === 18L)
    // merges refuse the same way until folded
    EpochTable.merge(spark, path,
      Seq((5L, "m5", 999L)).toDF("event_id", "etype", "uid"),
      version = 1L, keys = Seq("event_id"))
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.folded").collect()
    }
    // ... but DML still lands on a merge-bearing layout (the gate is
    // on the SCAN, not the table): one more delta version commits
    spark.sql("INSERT INTO gcat.folded VALUES (99, 'ins', 990)")
    assert(EpochTable.serve(spark, path)
      .where(col("event_id") === 99L).count() === 1L)
    EpochTable.compact(spark, path)
    assert(spark.sql(
      "SELECT etype FROM gcat.folded WHERE event_id = 5").head()
      .getAs[String]("etype") === "m5")
  }

  test("TIMESTAMP AS OF resolves against declared release instants " +
      "(not commit wall-clock): between releases → the earlier one, " +
      "before the first → analysis error; $versions is the history " +
      "as a local-scan SQL table") {
    registered()
    val path = s"$root/ts"
    def utc(iso: String) =
      java.sql.Timestamp.from(java.time.Instant.parse(iso))
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L,
      releaseTs = Some(utc("2024-03-01T00:00:00Z")))
    EpochTable.refreshDelta(spark, path, mkTyped(11L to 16L),
      version = 1L, releaseTs = Some(utc("2024-04-01T00:00:00Z")))
    assert(spark.sql("SELECT * FROM gcat.ts " +
      "TIMESTAMP AS OF TIMESTAMP '2024-03-15 00:00:00'").count() === 10L)
    assert(spark.sql("SELECT * FROM gcat.ts " +
      "TIMESTAMP AS OF TIMESTAMP '2024-06-01 00:00:00'").count() === 16L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.ts " +
        "TIMESTAMP AS OF TIMESTAMP '2023-01-01 00:00:00'").collect()
    }
    // the metadata table: history rows with release instants, planned
    // as a LOCAL scan (no file source in the plan)
    val hist = spark.sql("SELECT * FROM gcat.`ts$versions` ORDER BY version")
    assert(hist.collect().map(_.getAs[Long]("version")).toSeq ===
      Seq(0L, 1L))
    assert(hist.where(col("consistent")).count() === 2L)
    assert(hist.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
    // a metadata table over a layout that does not exist refuses
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.`nope$versions`").collect()
    }
  }

  test("snapshot mode: every table resolves through ONE registry cut " +
      "— an unpublished refresh is invisible, unpinned tiers are not " +
      "tables, and the head catalog diverges as expected") {
    registered()
    val tbl = s"$root/snapt"
    val other = s"$root/snapo"
    val reg = s"$root/snapreg"
    EpochTable.refresh(spark, tbl, mkTyped(1L to 12L), version = 0L)
    EpochTable.refresh(spark, other, mkTyped(1L to 3L), version = 0L)
    graft.ops.Snapshot.publish(spark, reg, Map("snapt" -> 0L), "cut_0")
    EpochTableCatalog.register(spark, "gsnapc", root,
      registry = Some(reg))
    // an unpublished refresh advances the head catalog, not the cut
    EpochTable.refresh(spark, tbl, mkTyped(1L to 40L), version = 1L)
    assert(spark.sql("SELECT * FROM gsnapc.snapt").count() === 12L)
    assert(spark.sql("SELECT * FROM gcat.snapt").count() === 40L)
    // a tier the snapshot does not pin is not a table in snapshot mode
    intercept[Exception] {
      spark.sql("SELECT * FROM gsnapc.snapo").collect()
    }
    assert(spark.sql("SHOW TABLES IN gsnapc").collect()
      .map(_.getAs[String]("tableName")).toSeq === Seq("snapt"))
  }

  test("two concurrent SQL INSERT writers both land: the occ rebase " +
      "serializes the manifest flips, no rows lost, distinct versions") {
    registered()
    val path = s"$root/race"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val f1 = scala.concurrent.Future {
        spark.sql("INSERT INTO gcat.race VALUES (11, 'a', 110)")
      }
      val f2 = scala.concurrent.Future {
        spark.sql("INSERT INTO gcat.race VALUES (12, 'b', 120)")
      }
      scala.concurrent.Await.result(f1, scala.concurrent.duration
        .Duration(120, "s"))
      scala.concurrent.Await.result(f2, scala.concurrent.duration
        .Duration(120, "s"))
    } finally pool.shutdownNow()
    val served = spark.sql("SELECT * FROM gcat.race")
    assert(served.count() === 12L)
    assert(served.where(col("event_id").isin(11L, 12L)).count() === 2L)
    // two delta epochs committed, each with its own version id
    assert(Epoch.resolve(spark, path).get.epoch === 2L)
    assert(EpochTable.versions(spark, path).count() === 3L)
  }

  test("snapshot mode refuses history escapes: VERSION/TIMESTAMP AS " +
      "OF and $versions throw naming the head-mode alternative; " +
      "tableExists agrees with loadTable on pins and $versions") {
    registered()
    val tbl = s"$root/snaptt"
    val reg = s"$root/snapttreg"
    def utc(iso: String) =
      java.sql.Timestamp.from(java.time.Instant.parse(iso))
    EpochTable.refresh(spark, tbl, mkTyped(1L to 8L), version = 0L,
      releaseTs = Some(utc("2024-03-01T00:00:00Z")))
    graft.ops.Snapshot.publish(spark, reg, Map("snaptt" -> 0L), "cut_0")
    EpochTableCatalog.register(spark, "gsnaptt", root,
      registry = Some(reg))
    // an unpublished full reload the cut must never surface — not
    // through the head read, not through a time-travel side door
    EpochTable.refresh(spark, tbl, mkTyped(1L to 50L), version = 1L,
      releaseTs = Some(utc("2024-04-01T00:00:00Z")))
    assert(spark.sql("SELECT * FROM gsnaptt.snaptt").count() === 8L)
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM gsnaptt.snaptt VERSION AS OF 1").collect()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage)
      .getOrElse("")).contains("SNAPSHOT MODE"), e1.getMessage)
    intercept[Exception] {
      spark.sql("SELECT * FROM gsnaptt.snaptt " +
        "TIMESTAMP AS OF TIMESTAMP '2024-04-15 00:00:00'").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM gsnaptt.`snaptt$versions`").collect()
    }
    // the head catalog still serves all three faces
    assert(spark.sql("SELECT * FROM gcat.snaptt VERSION AS OF 1")
      .count() === 50L)
    assert(spark.sql("SELECT * FROM gcat.`snaptt$versions`")
      .count() === 2L)
    // tableExists mirrors loadTable: pinned base yes, unpinned no,
    // $versions only in head mode
    val snapCat = spark.sessionState.catalogManager
      .catalog("gsnaptt")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val headCat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    val id = Identifier.of(Array.empty[String], "snaptt")
    val idMeta = Identifier.of(Array.empty[String], "snaptt$versions")
    assert(snapCat.tableExists(id))
    assert(!snapCat.tableExists(
      Identifier.of(Array.empty[String], "snapo")))
    assert(!snapCat.tableExists(idMeta))
    assert(headCat.tableExists(idMeta))
    assert(!headCat.tableExists(
      Identifier.of(Array.empty[String], "nope$versions")))
  }

  test("SQL DELETE removes NULL-bearing rows: the tombstones carry " +
      "full rows with NULLs and the null-safe anti-join still kills " +
      "them; WHERE c IS NULL deletes exactly the null rows") {
    registered()
    val path = s"$root/nulldel"
    val base = (1L to 20L).map(i => (i,
      if (i % 4 == 0) null else s"v$i",
      if (i == 5L) None else Some(i * 10L)))
      .toDF("event_id", "etype", "uid")
    EpochTable.refresh(spark, path, base, version = 0L)
    // pushable condition, doomed rows carry NULL etype — the full-row
    // tombstones must still match them
    spark.sql("DELETE FROM gcat.nulldel WHERE event_id <= 8")
    assert(spark.sql("SELECT * FROM gcat.nulldel").count() === 12L)
    assert(spark.sql(
      "SELECT * FROM gcat.nulldel WHERE event_id = 4").count() === 0L)
    // IS NULL is translated, pushed, and actually deletes
    spark.sql("DELETE FROM gcat.nulldel WHERE etype IS NULL")
    val left = spark.sql("SELECT * FROM gcat.nulldel")
    assert(left.count() === 9L)
    assert(left.where(col("etype").isNull).count() === 0L)
  }

  test("file-granular rewrite groups: a point UPDATE on a clustered " +
      "table rewrites ONLY the files its condition touches — " +
      "untouched files carry forward by reference, byte-identical") {
    registered()
    val path = s"$root/pruned"
    EpochTable.refresh(spark, path, mkTyped(1L to 4000L), version = 0L)
    // cluster into 8 files, each owning a disjoint event_id interval
    EpochTable.compact(spark, path, nFiles = 8,
      clusterBy = Seq("event_id"))
    val before = Epoch.resolve(spark, path).get
    val beforeFiles = EpochTable.dataFiles(spark, path, before)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen))
    assert(beforeFiles.size === 8, s"expected 8 files: $beforeFiles")
    // point update: one id → the condition prunes to ONE file
    spark.sql("UPDATE gcat.pruned SET etype = 'point', uid = 0 " +
      "WHERE event_id = 1234")
    val served = spark.sql("SELECT * FROM gcat.pruned")
    assert(served.count() === 4000L)
    assert(served.where(col("etype") === "point").count() === 1L)
    assert(served.where(col("event_id") === 1234L).head()
      .getAs[Long]("uid") === 0L)
    // the committed manifest carries ≥ 6 of the 8 files forward as
    // individual FILE entries (same path, same bytes — nothing moved);
    // only the matched file(s) were rewritten into the new generation
    val after = Epoch.resolve(spark, path).get
    assert(after.epoch === before.epoch + 1)
    val afterFiles = EpochTable.dataFiles(spark, path, after)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen))
    val carried = afterFiles.toSet.intersect(beforeFiles.toSet)
    assert(carried.size >= 6,
      s"runtime group filtering did not prune: carried=${carried.size}" +
        s" of ${beforeFiles.size}\nbefore=$beforeFiles\nafter=$afterFiles")
    assert(carried.size < beforeFiles.size)
    // and the rewrite's data entries name those files individually
    val entries = after.components("data")
    assert(entries.count(_.endsWith(".parquet")) === carried.size,
      entries.toString)
  }

  test("a concurrent commit between the rewrite scan and its publish " +
      "aborts the statement loudly and cleans the staging dir (the " +
      "lost-update conflict check)") {
    val path = s"$root/conflict"
    EpochTable.refresh(spark, path, mkTyped(1L to 100L), version = 0L)
    val scanned = Epoch.resolve(spark, path).get
    // simulate the race: an INSERT-like delta commits AFTER the
    // rewrite pinned `scanned` but BEFORE its publish
    EpochTable.refreshDelta(spark, path, mkTyped(101L to 110L),
      version = 1L)
    // a staged rewrite of the OLD head must now refuse to publish
    val stage = s"$path/_stage_test"
    mkTyped(1L to 100L).withColumn("etype", lit("rewritten"))
      .write.mode("overwrite").parquet(stage)
    val e = intercept[java.util.ConcurrentModificationException] {
      Epoch.occ(spark, path) {
        EpochTable.commitRewrite(spark, path, scanned,
          EpochTable.dataFiles(spark, path, scanned)
            .map(_.getPath.toUri.getPath).toSet, stage)
      }
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
    // staging cleaned, head untouched, the concurrent rows intact
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(stage)))
    assert(Epoch.resolve(spark, path).get.epoch === 1L)
    assert(EpochTable.serve(spark, path).count() === 110L)
    // the happy path still publishes: same rewrite against the NEW head
    val head = Epoch.resolve(spark, path).get
    mkTyped(1L to 110L).withColumn("etype", lit("rw"))
      .write.mode("overwrite").parquet(stage)
    Epoch.occ(spark, path) {
      EpochTable.commitRewrite(spark, path, head,
        EpochTable.dataFiles(spark, path, head)
          .map(_.getPath.toUri.getPath).toSet, stage)
    }
    assert(EpochTable.serve(spark, path)
      .where(col("etype") === "rw").count() === 110L)
  }

  test("CTAS commits manifest 0 through the protocol: the new table " +
      "is born with $versions/time-travel/DML; plain CREATE, " +
      "stage-replace, and CTAS onto an existing table still refuse") {
    registered()
    val path = s"$root/ctas"
    mkTyped(1L to 25L).createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE gcat.ctas AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT * FROM gcat.ctas").count() === 25L)
    // born with the full machinery: version 0, meta row, field ids
    assert(Epoch.resolve(spark, path).get.epoch === 0L)
    val hist = spark.sql("SELECT * FROM gcat.`ctas$versions`")
    assert(hist.count() === 1L &&
      hist.head().getAs[Long]("version") === 0L &&
      hist.head().getAs[Boolean]("consistent"))
    assert(spark.sql("SELECT * FROM gcat.ctas VERSION AS OF 0")
      .count() === 25L)
    // DML lands on it like on any pipeline-built layout
    spark.sql("INSERT INTO gcat.ctas VALUES (26, 'x', 260)")
    assert(spark.sql("SELECT * FROM gcat.ctas").count() === 26L)
    // refusals: CTAS onto an existing table, plain CREATE, REPLACE
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ctas AS SELECT * FROM ctas_src")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE gcat.ctas_bare (a INT)")
    }
    intercept[Exception] {
      spark.sql("REPLACE TABLE gcat.ctas AS SELECT * FROM ctas_src")
    }
    // a bare-CREATE refusal left no half-born layout behind
    assert(Epoch.resolve(spark, s"$root/ctas_bare").isEmpty)
  }

  test("SQL-native evolution: ALTER TABLE RENAME/DROP COLUMN are " +
      "one-metadata commits; the diverged table serves the CURRENT " +
      "schema read-only with pushdown intact; the fold converges and " +
      "reopens DML; pre-rename versions serve as written") {
    registered()
    val path = s"$root/altt"
    EpochTable.refresh(spark, path, mkTyped(1L to 50L), version = 0L)
    spark.sql("ALTER TABLE gcat.altt RENAME COLUMN etype TO label")
    // mapped serving: the new name answers immediately, zero data
    // movement (the data dirs are the original generation's)
    val served = spark.sql("SELECT event_id, label, uid FROM gcat.altt")
    assert(served.count() === 50L)
    assert(served.where(col("label") === "v7").count() === 1L)
    assert(Epoch.resolve(spark, path).get.components("data") ===
      Seq("g0/data"))
    // pushdown on the RENAMED column reaches the parquet scan under
    // the PHYSICAL name — footer pruning intact through the mapping
    val q = spark.sql(
      "SELECT event_id FROM gcat.altt WHERE label = 'v9'")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("etype"),
      plan)
    assert(q.count() === 1L)
    // writes fence until the convergence fold (capabilities withheld)
    intercept[Exception] {
      spark.sql("INSERT INTO gcat.altt VALUES (99, 'x', 990)")
    }
    intercept[Exception] {
      spark.sql("UPDATE gcat.altt SET uid = 0 WHERE event_id = 1")
    }
    // DROP COLUMN = a mapping tombstone, served schema shrinks at once
    spark.sql("ALTER TABLE gcat.altt DROP COLUMN uid")
    assert(spark.sql("SELECT * FROM gcat.altt").columns.toSeq ===
      Seq("event_id", "label"))
    // the convergence fold returns the table to the stock fast path
    // and reopens DML under the new names
    EpochTable.compact(spark, path)
    assert(spark.sql("SELECT * FROM gcat.altt").columns.toSeq ===
      Seq("event_id", "label"))
    spark.sql("INSERT INTO gcat.altt VALUES (99, 'x')")
    assert(spark.sql("SELECT * FROM gcat.altt").count() === 51L)
    // VERSION AS OF resolves to the freshest manifest carrying the
    // version's meta (the documented compaction rule) — version 0's
    // ROWS answer under the CURRENT names even across the evolution;
    // the as-written face is the programmatic epoch-number read
    val v0 = spark.sql("SELECT * FROM gcat.altt VERSION AS OF 0")
    assert(v0.columns.toSeq === Seq("event_id", "label"))
    assert(v0.count() === 50L)
    assert(EpochTable.data(spark, path,
      Epoch.resolveAsOf(spark, path, 0L).get).columns.toSeq ===
      Seq("event_id", "etype", "uid"))
    // ADD COLUMN is supported since r19 (additive evolution,
    // MergeEvolveSpec); genuinely unsupported shapes still refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.altt ALTER COLUMN label TYPE INT")
    }
  }

  test("two racing SQL UPDATEs never lose a write: either both " +
      "serialize (disjoint effects land) or the loser aborts with " +
      "the conflict discipline — never a silent overwrite") {
    registered()
    val path = s"$root/updrace"
    EpochTable.refresh(spark, path,
      mkTyped(1L to 100L).withColumn("uid", lit(0L)), version = 0L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val fs = Seq(
      "UPDATE gcat.updrace SET etype = 'lo' WHERE event_id <= 50",
      "UPDATE gcat.updrace SET uid = 7 WHERE event_id > 50")
      .map(q => scala.concurrent.Future(
        scala.util.Try { spark.sql(q); () }))
    val results =
      try fs.map(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration(180, "s")))
      finally pool.shutdownNow()
    val failures = results.collect { case scala.util.Failure(e) => e }
    // any failure must be THE conflict abort, nothing else
    failures.foreach(e => assert(deepMsg(e).contains("aborted"),
      deepMsg(e)))
    assert(failures.size <= 1, failures.map(deepMsg).toString)
    val served = spark.sql("SELECT * FROM gcat.updrace")
    assert(served.count() === 100L)
    val loApplied = served.where(col("etype") === "lo").count() === 50L
    val hiApplied = served.where(col("uid") === 7L).count() === 50L
    if (failures.isEmpty)
      // serialized: the loser rebased... there is no rebase for DML —
      // serialization here means the statements did not overlap
      assert(loApplied && hiApplied)
    else {
      // exactly one landed; the aborted one changed NOTHING
      assert(loApplied ^ hiApplied)
      assert(served.where(col("etype") === "lo" && col("uid") === 7L)
        .isEmpty)
    }
    // no staging residue either way
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).exists(_.startsWith("_stage_")))
  }

  test("SQL CALL maintenance: compact folds (clustered), prune " +
      "retires history, reap_stages clears crashed staging; unknown " +
      "procedures and snapshot-mode calls refuse") {
    registered()
    val path = s"$root/proc"
    EpochTable.refresh(spark, path, mkTyped(1L to 40L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(41L to 60L),
      version = 1L)
    assert(Epoch.resolve(spark, path).get.components("data").size === 2)
    val st = spark.sql("CALL gcat.compact(`table` => 'proc', " +
      "n_files => 2, cluster_by => 'event_id')").head()
      .getAs[String]("status")
    assert(st.contains("folded into epoch 2"), st)
    assert(Epoch.resolve(spark, path).get.components("data") ===
      Seq("g2/data"))
    assert(spark.sql("SELECT * FROM gcat.proc").count() === 60L)
    // prune retires everything below the keep horizon
    spark.sql("CALL gcat.prune(`table` => 'proc', keep => 1)")
    assert(Epoch.committedList(spark, path) === Seq(2L))
    // reap_stages: plant a crashed stage, a conservative call keeps
    // it, an aggressive one removes it
    mkTyped(1L to 3L).write.mode("overwrite")
      .parquet(s"$path/_stage_dead")
    spark.sql("CALL gcat.reap_stages(`table` => 'proc')")
    assert(Epoch.orphans(spark, path).stages.size === 1)
    val st2 = spark.sql("CALL gcat.reap_stages(`table` => 'proc', " +
      "older_than_ms => 0)").head().getAs[String]("status")
    assert(st2.contains("reaped 1"), st2)
    assert(Epoch.orphans(spark, path).stages.isEmpty)
    intercept[Exception] {
      spark.sql("CALL gcat.vacuum(`table` => 'proc')").collect()
    }
    // snapshot-mode catalogs refuse maintenance (they pin a cut)
    val reg = s"$root/procreg"
    graft.ops.Snapshot.publish(spark, reg, Map("proc" -> 2L), "cut")
    EpochTableCatalog.register(spark, "gproccut", root,
      registry = Some(reg))
    val e = intercept[Exception] {
      spark.sql("CALL gproccut.compact(`table` => 'proc')").collect()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).contains("SNAPSHOT MODE"), e.getMessage)
  }

  test("the _g metadata column serves FILE PROVENANCE on the normal " +
      "read path: one distinct path per physical file, joinable to " +
      "the manifest's file inventory") {
    registered()
    val path = s"$root/prov"
    EpochTable.refresh(spark, path, mkTyped(1L to 400L), version = 0L)
    EpochTable.compact(spark, path, nFiles = 4,
      clusterBy = Seq("event_id"))
    val prov = spark.sql(
      "SELECT _g, count(*) AS n FROM gcat.prov GROUP BY _g")
    val paths = prov.collect().map(_.getString(0)).sorted
    val files = EpochTable.dataFiles(spark, path,
      Epoch.resolve(spark, path).get)
      .map(_.getPath.toUri.getPath).sorted
    assert(paths.toSeq === files.toSeq)
    assert(prov.agg(sum(col("n"))).head().getLong(0) === 400L)
    // plain reads stay columnar/vectorized — _g never taxes them
    val plain = spark.sql("SELECT event_id FROM gcat.prov " +
      "WHERE uid > 100")
    assert(plain.queryExecution.executedPlan.toString()
      .contains("ColumnarToRow"),
      plain.queryExecution.executedPlan.toString())
  }

  test("a loaded table is PINNED: dirs resolved at load survive a " +
      "concurrent refresh (snapshot isolation per statement)") {
    registered()
    val path = s"$root/pin"
    EpochTable.refresh(spark, path, mkTyped(1L to 25L), version = 0L)
    // pin a DataFrame (resolution happened at analysis)
    val pinnedDf = spark.sql("SELECT * FROM gcat.pin")
    EpochTable.refresh(spark, path, mkTyped(1L to 60L), version = 1L)
    // the pinned statement still serves version 0's dirs; prune keeps
    // both epochs by default (keep=3)
    assert(pinnedDf.count() === 25L)
    assert(spark.sql("SELECT * FROM gcat.pin").count() === 60L)
  }

  test("the CoW runtime-filter IN-set is bounded: past the file " +
      "limit a point UPDATE falls back to the whole-table rewrite " +
      "explicitly — zero carried files, same answer") {
    registered()
    val path = s"$root/inset_cap"
    EpochTable.refresh(spark, path, mkTyped(1L to 2000L), version = 0L)
    EpochTable.compact(spark, path, nFiles = 4,
      clusterBy = Seq("event_id"))
    spark.conf.set("spark.graft.cow.runtimeFilterFileLimit", "0")
    try {
      spark.sql("UPDATE gcat.inset_cap SET etype = 'cap' " +
        "WHERE event_id = 77")
      val m = Epoch.resolve(spark, path).get
      // no carried-forward file entries: every file was rewritten
      assert(!m.components("data").exists(_.endsWith(".parquet")),
        m.components("data").toString)
      val served = spark.sql("SELECT * FROM gcat.inset_cap")
      assert(served.count() === 2000L)
      assert(served.where(col("etype") === "cap").count() === 1L)
    } finally
      spark.conf.unset("spark.graft.cow.runtimeFilterFileLimit")
    // with the default limit the same statement prunes again
    spark.sql("UPDATE gcat.inset_cap SET etype = 'cap2' " +
      "WHERE event_id = 77")
    assert(Epoch.resolve(spark, path).get.components("data")
      .exists(_.endsWith(".parquet")))
    assert(spark.sql("SELECT * FROM gcat.inset_cap")
      .where(col("etype") === "cap2").count() === 1L)
  }

  test("CTAS abort never deletes a COMMITTED layout: a racer that " +
      "commits the same table between the existence check and the " +
      "abort keeps its data; a true abort still cleans up") {
    registered()
    val cat = spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.StagingTableCatalog]
    def stage(name: String) = cat.stageCreate(
      org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, name),
      Array(org.apache.spark.sql.connector.catalog.Column.create(
        "event_id", org.apache.spark.sql.types.LongType)),
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      new java.util.HashMap[String, String]())
    // racer commits between stageCreate's check and our abort
    val raced = stage("ctas_abort_race")
    EpochTable.refresh(spark, s"$root/ctas_abort_race",
      mkTyped(1L to 12L), version = 0L)
    raced.abortStagedChanges()
    assert(spark.sql("SELECT * FROM gcat.ctas_abort_race").count()
      === 12L)
    // a genuine abort (nothing committed) removes the half-born dir
    val lone = stage("ctas_abort_lone")
    lone.abortStagedChanges()
    assert(Epoch.resolve(spark, s"$root/ctas_abort_lone").isEmpty)
  }

  test("the batch $changes face survives retention pruning: history " +
      "starts at the earliest reconstructible diff instead of " +
      "throwing on the pruned predecessor") {
    registered()
    val path = s"$root/chg_pruned"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(11L to 14L),
      version = 1L)
    EpochTable.refreshDelta(spark, path, mkTyped(15L to 16L),
      version = 2L)
    // full history first: snapshot + both deltas
    assert(spark.sql(
      "SELECT * FROM gcat.`chg_pruned$changes`").count() === 16L)
    Epoch.prune(spark, path, keep = 2) // epoch 0's manifest retired
    // epoch 1's diff needs the pruned epoch-0 manifest — the batch
    // face starts at epoch 2's diff (the earliest reconstructible)
    val chg = spark.sql(
      "SELECT event_id, _op FROM gcat.`chg_pruned$changes`")
    assert(chg.collect().map(_.getLong(0)).sorted.toSeq
      === Seq(15L, 16L))
  }
}
