package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-PQ — the composed 100 TB ANN serving index (SURVEY §2.10 X3
  * scale path): [[Ann]]'s inverted-file cells decide WHICH vectors a
  * probe scores (nProbe/k of the corpus, partition pruning on the
  * persisted layout) and [[Pq]]'s product codes decide WHAT scoring a
  * candidate costs (m byte codes instead of dim floats). This is the
  * standard large-scale layout (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the IVFADC system): at 100 TB
  * the pruned+compressed scan phase reads `nProbe/k · m/(4·dim)` of the
  * raw bytes a brute-force pass would.
  *
  * Search runs in two phases with DIFFERENT column footprints, and the
  * plan keeps them separate so parquet column pruning does the work:
  *
  *   phase 1 (ADC): scan ONLY (id, codes) of the probed cells — the
  *     compressed inverted lists; score with driver-computed lookup
  *     tables (no joins, no shuffle), TakeOrdered the `shortlist` best.
  *   phase 2 (re-rank): broadcast the ≤shortlist ids back onto the
  *     probed cells, read the TRUE embedding column for just those
  *     rows, exact cosine, final top-k. Exact-within-shortlist — the
  *     same serving contract as [[Pq.search]], so recall is governed by
  *     (nProbe, shortlist), and a full-probe full-shortlist search
  *     degenerates to brute force (pinned in IvfpqSpec).
  *
  * Codebooks are trained GLOBALLY on the unit-normalized corpus (not
  * per-cell residuals — one LUT set per probe serves every probed cell,
  * keeping the scoring expression cell-independent and codegen-flat;
  * the exact re-rank absorbs the recall difference vs residual
  * encoding). Output contract matches [[Ann.query]]: (neighbor_id,
  * sim, rank) with true cosine.
  */
object Ivfpq {

  /** Driver-held coarse centroids + product codebooks; `encoded` is the
    * cell-assigned corpus carrying BOTH the PQ codes (the serving
    * column) and the raw embedding (the re-rank / cold-storage column).
    */
  final case class IvfPqIndex(centroids: Seq[(Long, Seq[Double])],
      m: Int, dsub: Int, books: Seq[Seq[Seq[Double]]], encoded: DataFrame)

  /** One coarse k-means ([[Ann.build]]) + one global PQ training pass
    * ([[Pq.train]]); the encode is a narrow map fused onto the already
    * cell-assigned scan — build cost is the two trainings plus one
    * projection, nothing extra shuffles. */
  def build(embeddings: DataFrame, k: Int, m: Int, codes: Int,
      iters: Int = 2, idCol: String = "vec_id",
      embCol: String = "embedding"): IvfPqIndex = {
    val ivf = Ann.build(embeddings, k, iters, idCol, embCol)
    val (books, dsub) = Pq.train(embeddings, m, codes, iters, idCol, embCol)
    val encoded = ivf.assigned.select(col(idCol), col(embCol), col("cell"),
      graft.functions.PqEncode.pqEncode(Pq.unit(col(embCol)), books)
        .as("codes"))
    IvfPqIndex(ivf.centroids, m, dsub, books, encoded)
  }

  /** Persist with the inverted lists as cell partition directories
    * (same layout contract as [[Ann.save]] — the probe's cell
    * restriction becomes parquet partition pruning) plus the two
    * bounded side tables (centroids; codebooks flattened to one row per
    * (subspace, code)). */
  def save(index: IvfPqIndex, path: String): Unit = {
    index.encoded.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/encoded")
    val spark = index.encoded.sparkSession
    import spark.implicits._
    index.centroids.toDF("centroid_id", "centroid_emb")
      .write.mode("overwrite").parquet(s"$path/centroids")
    index.books.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (cent, code) => (sub, code, cent) }
    }.toDF("sub", "code", "centroid")
      .write.mode("overwrite").parquet(s"$path/books")
  }

  /** Load a saved index; [[search]] on it prunes to the probed cell
    * directories and the ADC phase reads only the codes column. */
  def load(spark: SparkSession, path: String): IvfPqIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("centroid_id").cast(LongType), col("centroid_emb"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val books: Seq[Seq[Seq[Double]]] = spark.read.parquet(s"$path/books")
      .select(col("sub").cast(IntegerType), col("code").cast(IntegerType),
        col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq }
    IvfPqIndex(cents, books.length, books.head.head.length, books,
      spark.read.parquet(s"$path/encoded"))
  }

  /** Top-`topK` neighbors of `probeId`: driver-side cell routing (the
    * centroids are local, same tie-breaks as [[Ann.query]]), then the
    * two-phase pruned-compressed search described on the object. */
  def search(index: IvfPqIndex, probeId: Long, topK: Int, nProbe: Int,
      shortlist: Int, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val probe: Seq[Double] = index.encoded
      .filter(col(idCol) === probeId)
      .select(transform(col(embCol), _.cast(DoubleType)))
      .take(1) match {
        case Array(r) => r.getSeq[Double](0).toSeq
        case _ => throw new IllegalArgumentException(
          s"Ivfpq.search: probe id $probeId not found in the index")
      }
    val probeUnit = Pq.localUnit(probe)
    val cells: Seq[Long] = index.centroids
      .map { case (cid, cemb) => (cid, Ann.localCosine(cemb, probe)) }
      .sortBy { case (cid, csim) => (-csim, cid) }
      .take(nProbe)
      .map(_._1)
    val probed = index.encoded
      .filter(col("cell").isin(cells: _*))
      .filter(col(idCol) =!= probeId)
    // phase 1: compressed candidates — (id, codes) only
    val short = probed
      .select(col(idCol),
        Pq.adcExpr(Pq.lutsFor(index.books, index.dsub, probeUnit),
          col("codes")).as("_adc"))
      .orderBy(col("_adc").asc, col(idCol))
      .limit(shortlist)
      .select(col(idCol))
    // phase 2: exact re-rank — true embeddings for ≤shortlist rows
    val litProbe = array(probeUnit.map(lit): _*)
    probed.join(broadcast(short), Seq(idCol))
      .select(col(idCol).as("neighbor_id"),
        // probe is unit-norm: /1 implicit; Ann.guardedSim pins zero-norm
        // rows to −1 (NaN would sort ABOVE every real sim desc)
        Ann.guardedSim(transform(col(embCol), _.cast(DoubleType)), litProbe,
          lit(1.0)).as("sim"))
      .orderBy(col("sim").desc, col("neighbor_id"))
      .limit(topK)
      .select(col("neighbor_id"), col("sim"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("neighbor_id"))).cast(LongType)
          .as("rank"))
  }
}
