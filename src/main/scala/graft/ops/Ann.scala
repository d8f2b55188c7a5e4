package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate nearest neighbor over an embedding column — the scale path
  * for similarity search (SURVEY §2.10 X3). Brute-force cosine
  * (`VectorQueries.simTopk`) is the exactness baseline; this IVF
  * (inverted-file) index is the 100 TB form:
  *
  *   build: pick k centroids (deterministic sample), assign every vector
  *          to its nearest centroid — one narrow pass + a tiny broadcast;
  *          the assignment column is the partition key for storage.
  *   query: score the probe against the k centroids (driver-free, tiny),
  *          keep the nProbe nearest cells, then brute-force ONLY inside
  *          those cells — candidate set shrinks by ~k/nProbe.
  *
  * Everything is higher-order array expressions (zip_with/aggregate) over
  * broadcast centroid structs — no UDFs, no cross join of the full table.
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

  /** Deterministic centroid choice: the k lowest-id vectors (a real system
    * would k-means; determinism matters more here and IVF correctness is
    * independent of centroid quality). */
  def build(embeddings: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): IvfIndex = {
    val centroids = embeddings
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("centroid_id"), col(embCol).as("centroid_emb"))
    val cArr = centroids.orderBy("centroid_id")
      .select(struct(col("centroid_id"), col("centroid_emb")).as("c"))
      .agg(collect_list("c").as("cs"))
    // nearest centroid per vector: argmax over the broadcast centroid list
    val assigned = embeddings.crossJoin(broadcast(cArr))
      .withColumn("best",
        aggregate(col("cs"),
          struct(lit(-2.0).as("sim"), lit(-1L).as("cid")),
          (acc, c) => {
            val s = cosine(col(embCol), c.getField("centroid_emb"))
            when(s > acc.getField("sim"),
              struct(s.as("sim"), c.getField("centroid_id").as("cid")))
              .otherwise(acc)
          }))
      .select(col(idCol), col(embCol),
        col("best.cid").as("cell"), col("best.sim").as("cell_sim"))
    IvfIndex(centroids, assigned)
  }

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
