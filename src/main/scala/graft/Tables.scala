package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-provided parquet testdata.
  *
  * Mirrors the reference's model registry (`calaccess_raw/__init__.py:~20`
  * `get_model_list()` — see SURVEY.md §1.1): a central place that knows
  * every table. Here the registry is a name → parquet path mapping; schemas
  * are carried by the parquet footers (fixed, never inferred from data).
  *
  * Scale note: `spark.read.parquet` is the columnar, predicate-pushdown,
  * partition-parallel scan path — at 100 TB each `.parquet` name would be a
  * directory of many files and the same code holds.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. Read it as a raw long (legacy conf) and truncate to
    * microseconds with integer division — exactly what DuckDB 1.0 does on
    * read, so oracle comparisons align (see FIXTURES.md). Plain `/ 1000`
    * would route through double and lose precision at ~1.7e18 ns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** One registered operator query: the Spark implementation plus (when
  * SQL-expressible) the DuckDB oracle the driver hash-compares against.
  * Oracle rules (SURVEY.md §5.2): deterministic final ORDER BY, identical
  * column names/types on both sides (explicit casts), decimal — not
  * double — money aggregation.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
