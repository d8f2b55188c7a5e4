package graft.ingest

import graft.schemas.Schemas.TableDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The "load" pass ≙ `loadcalaccessrawdata.py:~50-200` +
  * `managers.py:~10-60`: raw all-text columns → typed table.
  *
  * The reference stages text into a temp table then casts in
  * `INSERT…SELECT` (two phases because PostgreSQL COPY can't cast).
  * Spark needs no staging: the whole thing is ONE projection —
  * `CollapseProject` fuses it with the scan, and every rule below is a
  * codegen'd built-in expression (no UDFs; SURVEY §2.11):
  *
  *  - header rename UPPER → lower_snake (P7, mapping dict at `~90-120`)
  *  - '' → NULL (P3, `~120-150`)
  *  - `DATE_FIELDS` parsed M/d/yyyy with ISO yyyy-MM-dd fallback,
  *    garbage → NULL (P4, coalesced try_to_timestamp — real CAL-ACCESS
  *    exports mix both formats across vintages, SURVEY §2.11)
  *  - `DATETIME_FIELDS` parsed M/d/yyyy h:mm:ss a, ISO fallback (P5)
  *  - int/decimal casts with NULL-on-garbage try_cast semantics (P6)
  */
object Load {

  /** Per-vintage formats, first match wins. Order matters only for
    * strings both formats accept — there are none: M/d/yyyy rejects
    * `-`-separated dates and yyyy-MM-dd rejects `/`-separated ones, so
    * the coalesce is unambiguous. Each try_to_timestamp is a codegen'd
    * built-in; the coalesce stays one narrow projection (no UDF). */
  private val DateFmts = Seq("M/d/yyyy", "yyyy-MM-dd")
  private val DatetimeFmts = Seq("M/d/yyyy h:mm:ss a", "yyyy-MM-dd HH:mm:ss")

  /** ''→NULL then type coercion for one field — the per-column cast the
    * reference's generated INSERT…SELECT performs inside PostgreSQL. */
  private def coerce(table: TableDef, f: StructField): Column = {
    val raw = col(f.name.toUpperCase)
    val nulled = when(trim(raw) === "", lit(null)).otherwise(trim(raw))
    def multiFmt(fmts: Seq[String]): Column =
      coalesce(fmts.map(fmt => try_to_timestamp(nulled, lit(fmt))): _*)
    val typed = f.dataType match {
      case DateType if table.dateFields.contains(f.name) =>
        multiFmt(DateFmts).cast(DateType)
      case TimestampType if table.datetimeFields.contains(f.name) =>
        multiFmt(DatetimeFmts)
      case dt => nulled.try_cast(dt)
    }
    // keep help_text metadata on the loaded column (self-documentation is
    // part of the reference's contract — fields.py:~10-110)
    typed.as(f.name, f.metadata)
  }

  /** Typed projection: raw header-cased all-string frame → declared
    * schema. One narrow pass; no shuffle; fuses into the scan. */
  def load(table: TableDef, raw: DataFrame): DataFrame =
    raw.select(table.schema.fields.map(f => coerce(table, f)).toSeq: _*)

  /** Latest-amendment-wins dedup on the declared UNIQUE_KEY minus the
    * amendment counter (core CAL-ACCESS consumption semantics, SURVEY
    * §2.5 W1): for each logical record keep the max-amend_id row. */
  def latestAmendment(table: TableDef, typed: DataFrame,
      amendCol: String = "amend_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = table.uniqueKey.filterNot(_ == amendCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(amendCol).desc)
    typed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The skew-proof twin of [[latestAmendment]], for the mega-filer
    * pattern (real CAL-ACCESS committees carry 10³–10⁴ amendments on a
    * single filing while the median chain is ≤3): the window form
    * funnels every amendment of the hot key through ONE task's sort
    * buffer, whereas this form never co-locates a whole chain —
    * `Skew.saltedAggregate` splits each logical key across `salts`
    * partial max/count aggregates (map-side combinable), and the
    * winners frame (one row per logical key) is broadcast back onto the
    * unshuffled input to select the max-amend_id rows. Result carries
    * an extra `n_amendments` lineage column (chain length — free in the
    * same pass). Semantics match [[latestAmendment]] given unique
    * (keys, amendCol) rows, which the declared UNIQUE_KEY guarantees;
    * on a tie the window form keeps one arbitrary row, this form keeps
    * all tied rows. NULL amend_id sorts LOWEST in both forms (the
    * window's desc order puts nulls last; here NULL is coalesced to a
    * Long.MinValue sentinel in both the aggregate and the join-back
    * filter, so an all-NULL chain survives instead of vanishing through
    * a null-rejecting equality) — the sentinel never collides with a
    * real counter because CAL-ACCESS AMEND_IDs are small non-negatives.
    *
    * `broadcastWinners` — true (default) when the latest pass runs over
    * a filer/filing subset, so one-row-per-key fits a broadcast and the
    * big side never shuffles at all. For a WHOLE-table pass at 10⁷+
    * logical keys pass false: the join-back becomes a shuffle join that
    * hashes on (keys, amend counter) — the winner filter is pushed into
    * the join condition — so even a mega-chain spreads uniformly and no
    * single task ever holds a whole chain (see the join comment). */
  def latestAmendmentSalted(table: TableDef, typed: DataFrame,
      amendCol: String = "amend_id", salts: Int = 8,
      broadcastWinners: Boolean = true): DataFrame = {
    val keys = table.uniqueKey.filterNot(_ == amendCol)
    // max() ignores NULLs and === rejects them, so an un-coalesced
    // all-NULL chain would vanish; the sentinel keeps NULL as "lowest"
    // on both sides, matching the window form's nulls-last desc order.
    val amendKey = coalesce(col(amendCol).cast(LongType),
      lit(Long.MinValue))
    val winners = graft.ops.Skew.saltedAggregate(typed, keys, salts,
      partials = Seq(max(amendKey).as("__pmax"),
        count(lit(1)).as("__pcnt")),
      finals = Seq(max(col("__pmax")).as("__max_amend"),
        sum(col("__pcnt")).as("n_amendments")),
      // the amendment counter is unique within a chain — a perfect
      // deterministic salt that the aggregate already reads
      saltOn = Seq(col(amendCol)))
    // The winner-selection filter sits directly above the join, so
    // Catalyst pushes it INTO the join condition and it becomes an
    // extra equi-join key (keys..., amendKey=__max_amend). That makes
    // the non-broadcast join-back inherently skew-immune: the shuffle
    // hashes on (keys, amend counter), and the counter is unique within
    // a chain, so a 10⁴-amendment mega-chain spreads uniformly across
    // partitions instead of funneling into one task — losers hash to
    // partitions where no winner row exists and are dropped in place.
    // No AQE skew split is needed (none fires: there is no oversized
    // partition to split); AqeSkewJoinSpec pins the join-key shape.
    typed.join(if (broadcastWinners) broadcast(winners) else winners, keys)
      .filter(amendKey === col("__max_amend"))
      // usingColumns moved the keys first; restore the input's column
      // order so this is a drop-in twin of latestAmendment
      .select((typed.columns.map(col) :+ col("n_amendments")).toSeq: _*)
  }
}
