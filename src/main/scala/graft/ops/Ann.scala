package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate nearest neighbor over an embedding column — the scale path
  * for similarity search (SURVEY §2.10 X3). Brute-force cosine
  * (`VectorQueries.simTopk`) is the exactness baseline; this IVF
  * (inverted-file) index is the 100 TB form:
  *
  *   build: seed k centroids deterministically, refine with distributed
  *          Lloyd's k-means (assignment pass is scan-only; the update
  *          shuffles (cell, pos, value) triples), assign every vector to
  *          its nearest centroid; the assignment column is the partition
  *          key for storage.
  *   query: score the probe against the k centroids (tiny), keep the
  *          nProbe nearest cells, then brute-force ONLY inside those
  *          cells — candidate set shrinks by ~k/nProbe.
  *
  * Centroids live on the driver between iterations — k·dim doubles, bounded
  * by construction, exactly as Spark MLlib's KMeans keeps cluster centers
  * locally. That keeps every assignment pass a shallow plan over a literal
  * centroid array instead of a lineage that re-runs all prior iterations.
  * The per-vector argmax is higher-order array expressions — no UDFs, no
  * cross join of the full table.
  */
object Ann {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Literal `array<struct<centroid_id, centroid_emb>>` from driver-held
    * centroids — the broadcast-equivalent for a bounded dimension. */
  private def centroidArray(cents: Seq[(Long, Seq[Double])]): Column =
    array(cents.map { case (id, emb) =>
      struct(lit(id).as("centroid_id"),
        array(emb.map(lit): _*).as("centroid_emb"))
    }: _*)

  /** Nearest-centroid assignment: per-row argmax over the literal centroid
    * list — one narrow pass over the vectors, no shuffle, no join. */
  private def assign(embeddings: DataFrame, cents: Seq[(Long, Seq[Double])],
      idCol: String, embCol: String): DataFrame =
    embeddings
      .withColumn("best",
        aggregate(centroidArray(cents),
          struct(lit(-2.0).as("sim"), lit(-1L).as("cid")),
          (acc, c) => {
            val s = cosine(col(embCol), c.getField("centroid_emb"))
            when(s > acc.getField("sim"),
              struct(s.as("sim"), c.getField("centroid_id").as("cid")))
              .otherwise(acc)
          }))
      .select(col(idCol), col(embCol),
        col("best.cid").as("cell"), col("best.sim").as("cell_sim"))

  /** Lloyd update step, distributed: per-cell element-wise mean via
    * posexplode → groupBy(cell, pos) → avg → re-collect in position order.
    * One shuffle of (cell, pos, value) triples; only the k·dim means come
    * back to the driver. Cells that lost all members drop out (standard
    * Lloyd's degeneracy handling). */
  private def meanCentroids(assigned: DataFrame, embCol: String)
      : Seq[(Long, Seq[Double])] =
    assigned
      .select(col("cell"), posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg(avg(col("v").cast(DoubleType)).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("emb"))
      .orderBy("cell")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

  /** Build the IVF index: deterministic seeding (the k lowest-id vectors)
    * followed by `iters` Lloyd's k-means refinements. Per iteration: one
    * scan-only assignment pass + one aggregation shuffle — the standard
    * cluster-parallel k-means shape, unchanged at 100 TB where only the
    * assignment pass touches the data. `iters = 0` reproduces the plain
    * seeded index. */
  def build(embeddings: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): IvfIndex = {
    var cents: Seq[(Long, Seq[Double])] = embeddings
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast(LongType),
        transform(col(embCol), _.cast(DoubleType)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    for (_ <- 1 to iters)
      cents = meanCentroids(assign(embeddings, cents, idCol, embCol), embCol)
    val spark = embeddings.sparkSession
    import spark.implicits._
    IvfIndex(
      cents.toDF("centroid_id", "centroid_emb"),
      assign(embeddings, cents, idCol, embCol))
  }

  /** Persist the index with the inverted lists as partition directories:
    * `assigned` partitioned by cell, centroids as a tiny side table. A
    * probe that keeps nProbe cells then touches only those directories —
    * on the loaded index the cell restriction becomes (dynamic) partition
    * pruning, so at 100 TB a query reads nProbe/k of the data no matter
    * how large the corpus grows. */
  def save(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a saved index; `query` on it prunes to the probed cells. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/assigned"))

  /** Top-k neighbors of `probeId` searching only the nProbe nearest
    * cells. Returns (neighbor_id, sim, rank). */
  def query(index: IvfIndex, probeId: Long, topK: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probe = index.assigned.filter(col(idCol) === probeId)
      .select(col(embCol).as("probe_emb"))
    // rank cells by centroid similarity to the probe, keep nProbe
    val cells = index.centroids.crossJoin(broadcast(probe))
      .select(col("centroid_id"),
        cosine(col("centroid_emb"), col("probe_emb")).as("csim"))
      .orderBy(col("csim").desc, col("centroid_id"))
      .limit(nProbe)
      .select(col("centroid_id").as("cell"))
    // brute force inside the selected cells only
    val candidates = index.assigned
      .join(broadcast(cells), "cell")
      .filter(col(idCol) =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col(idCol).as("neighbor_id"),
        cosine(col(embCol), col("probe_emb")).as("sim"))
    val w = Window.orderBy(col("sim").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topK)
  }
}
