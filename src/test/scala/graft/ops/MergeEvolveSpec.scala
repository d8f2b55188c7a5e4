package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Additive schema evolution on MERGE and INSERT (round-18 verdict
  * "next" #5): a source frame carrying a NEW column evolves the
  * field-id mapping — programmatically in the SAME commit as the
  * merge generation, through SQL as `ALTER … ADD COLUMN` /
  * `MERGE … WITH SCHEMA EVOLUTION` — while old files serve typed
  * NULLs via the declared-schema read; a retyped column still
  * refuses. */
class MergeEvolveSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/mevcat"

  private def registered(): Unit =
    graft.sources.EpochTableCatalog.register(spark, "gmev", root)

  private def narrow(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i")).toDF("event_id", "etype")

  private def wide(ids: Seq[Long]) =
    ids.map(i => (i, s"w$i", i * 10L)).toDF("event_id", "etype", "uid")

  test("programmatic merge(evolveSchema): ONE commit carries the new " +
      "field id AND the merge generation; untouched rows serve typed " +
      "NULLs; the old version still serves as written") {
    val path = s"$root/prog"
    EpochTable.refresh(spark, path, narrow(1L to 30L), version = 0L)
    val before = Epoch.resolve(spark, path).get.epoch
    val loaded = EpochTable.merge(spark, path, wide(Seq(5L, 31L)),
      version = 1L, keys = Seq("event_id"), evolveSchema = true)
    // exactly ONE epoch committed — schema and data flip together
    assert(Epoch.resolve(spark, path).get.epoch === before + 1)
    assert(loaded === 31L)
    val served = EpochTable.serve(spark, path)
    assert(served.columns.toSeq === Seq("event_id", "etype", "uid"))
    assert(served.where(col("event_id") === 5L).head()
      .getAs[Long]("uid") === 50L)
    assert(served.where(col("event_id") === 31L).head()
      .getAs[String]("etype") === "w31")
    // rows the batch never touched: typed NULL from pre-column files
    assert(served.where(col("event_id") === 7L).head()
      .getAs[java.lang.Long]("uid") === null)
    assert(served.where(col("uid").isNull).count() === 29L)
    // the pre-evolution version serves AS WRITTEN (no uid)
    assert(EpochTable.dataForVersion(spark, path, 0L).get
      .columns.toSeq === Seq("event_id", "etype"))
    // the fold materializes the column physically, same answers
    EpochTable.compact(spark, path)
    assert(EpochTable.serve(spark, path)
      .where(col("uid").isNull).count() === 29L)
  }

  test("a retyped column refuses even under evolveSchema; a batch " +
      "missing served columns refuses") {
    val path = s"$root/retype"
    EpochTable.refresh(spark, path, wide(1L to 10L), version = 0L)
    val retyped = Seq((5L, "x", "oops"))
      .toDF("event_id", "etype", "uid") // uid: string now
    val e1 = intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path, retyped, version = 1L,
        keys = Seq("event_id"), evolveSchema = true)
    }
    assert(e1.getMessage.contains("changes type"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path,
        Seq((5L, 99L, true)).toDF("event_id", "uid", "extra"),
        version = 1L, keys = Seq("event_id"), evolveSchema = true)
    }
    assert(e2.getMessage.contains("every served column"), e2.getMessage)
  }

  test("SQL: ALTER TABLE ADD COLUMN is one metadata commit — the " +
      "next SELECT serves typed NULLs, INSERT INTO carries values, " +
      "and a point UPDATE can set the new column on old files") {
    registered()
    val path = s"$root/alter"
    EpochTable.refresh(spark, path, narrow(1L to 20L), version = 0L)
    spark.sql("ALTER TABLE gmev.alter ADD COLUMN uid BIGINT")
    val after = spark.sql("SELECT * FROM gmev.alter")
    assert(after.columns.toSeq === Seq("event_id", "etype", "uid"))
    assert(after.where(col("uid").isNotNull).isEmpty)
    // INSERT INTO with the evolved schema appends a delta version
    wide(Seq(21L, 22L)).createOrReplaceTempView("mev_ins")
    spark.sql("INSERT INTO gmev.alter SELECT * FROM mev_ins")
    val served = spark.sql("SELECT * FROM gmev.alter")
    assert(served.count() === 22L)
    assert(served.where(col("uid").isNotNull).count() === 2L)
    // a copy-on-write UPDATE writes the new column into old rows
    spark.sql("UPDATE gmev.alter SET uid = 777 WHERE event_id = 3")
    assert(spark.sql(
      "SELECT uid FROM gmev.alter WHERE event_id = 3").head()
      .getLong(0) === 777L)
    // positioned/nested adds refuse
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gmev.alter ADD COLUMN z BIGINT FIRST")
    }
    assert(e.getMessage.contains("positioned"), e.getMessage)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION: the additive column flows " +
      "through alterTable and the copy-on-write merge in one " +
      "statement") {
    registered()
    val path = s"$root/sqlmev"
    EpochTable.refresh(spark, path, narrow(1L to 20L), version = 0L)
    wide(Seq(4L, 8L, 25L)).createOrReplaceTempView("mev_sql_src")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO gmev.sqlmev t
      USING mev_sql_src s
      ON t.event_id = s.event_id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val served = spark.sql("SELECT * FROM gmev.sqlmev")
    assert(served.count() === 21L)
    assert(served.where(col("uid").isNotNull).count() === 3L)
    assert(served.where(col("event_id") === 8L).head()
      .getAs[Long]("uid") === 80L)
    assert(served.where(col("event_id") === 7L).head()
      .getAs[java.lang.Long]("uid") === null)
    // without the evolution clause the table NEVER evolves — Spark's
    // by-name INSERT * simply drops the extra source column (opt-in
    // per statement, never implied)
    EpochTable.refresh(spark, s"$root/sqlmev2", narrow(1L to 5L),
      version = 0L)
    spark.sql("""
      MERGE INTO gmev.sqlmev2 t USING mev_sql_src s
      ON t.event_id = s.event_id
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert(spark.sql("SELECT * FROM gmev.sqlmev2").columns.toSeq
      === Seq("event_id", "etype"))
    // ids 8 and 25 are fresh (1–5 seeded) → two inserts, uid dropped
    assert(spark.sql("SELECT * FROM gmev.sqlmev2").count() === 7L)
  }
}
