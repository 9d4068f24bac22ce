package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables

/** Similarity search over the `embeddings` table
  * (vec_id: long, embedding: array<float> [64-dim], label: int).
  *
  * Two tiers:
  *  - `cosineTopK`: exact brute-force top-k for a query set — the
  *    correctness baseline. The query side is broadcast, so the corpus is
  *    scanned once with no shuffle; cost O(|Q|·N). Fine for |Q| small even
  *    at 100 TB corpus; never all-pairs.
  *  - `annLsh`: random-hyperplane (sign) LSH — corpus is bucketed by a
  *    16-bit signature, each query probes only its own bucket. The scale
  *    path: bucketing is one shuffle of (id, sig, vec); probe cost is
  *    O(|bucket|). Approximate → rows-only check (no oracle).
  *
  * All arithmetic is double-precision folds in array order (zip_with +
  * aggregate), matching the DuckDB oracle's list_transform/list_aggregate
  * fold bit-for-bit. "Random" hyperplanes derive from xxhash64(plane, dim)
  * — deterministic, no RNG state to ship.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Cosine via the native codegen expression (graft.functions.CosineSimF32)
    * — bit-identical to the sequential double fold but whole-stage-codegen'd.
    */
  private def cosine(df: DataFrame): org.apache.spark.sql.Column = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    expr("cosine_f32(qe, ce)")
  }

  // ------------------------------------------------------- brute force
  /** Exact cosine top-5 neighbors for query vectors vec_id < 10. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame =
    cosineTopKOn(emb(spark, dir), nQueries = 10, k = 5)

  def cosineTopKOn(e: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", cosine(e))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid").as("vec_id"), col("cid").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("vec_id"), col("neighbor_id"))
  }

  val cosineTopKSql: String =
    """WITH cos AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
      |    / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |     * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rn FROM cos)
      |SELECT vec_id, neighbor_id, round(cos, 6) AS cos_sim
      |FROM rk WHERE rn <= 5 ORDER BY vec_id, neighbor_id""".stripMargin

  // --------------------------------------------------------------- ann
  /** Sign-LSH bucketed ANN: 16 deterministic pseudo-random hyperplanes;
    * signature bit p = sign(Σ_d emb[d] · u(p,d)) with
    * u(p,d) = xxhash64(p,d)/2⁶³ ∈ [−1,1). Candidates = same-bucket pairs;
    * top-5 by exact cosine within the bucket. Returns (vec_id,
    * neighbor_id, cos_sim, bucket) for vec_id < 10.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigExpr =
      """aggregate(sequence(0, 15), 0L, (acc, p) ->
        |  acc | (case when aggregate(sequence(0, size(embedding) - 1), cast(0.0 as double),
        |      (s, d) -> s + cast(embedding[d] as double) *
        |                (cast(xxhash64(p, d) as double) / cast(9223372036854775807 as double))) > cast(0.0 as double)
        |    then shiftleft(1L, p) else 0L end))""".stripMargin
    val e = emb(spark, dir).withColumn("bucket", expr(sigExpr))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("bucket").as("cbucket"))
    val scored = c.join(broadcast(q),
        col("bucket") === col("cbucket") && col("qid") =!= col("cid"))
      .withColumn("cos", cosine(e))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid").as("vec_id"), col("cid").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"), col("bucket"))
      .orderBy(col("vec_id"), col("neighbor_id"))
  }

  /** Embedding-cosine near-duplicate pairs (all-pairs within LSH buckets,
    * cos ≥ 0.95) — the embedding variant of dedup. Bucketed, so never a
    * full cross join.
    */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sigExpr =
      """aggregate(sequence(0, 7), 0L, (acc, p) ->
        |  acc | (case when aggregate(sequence(0, size(embedding) - 1), cast(0.0 as double),
        |      (s, d) -> s + cast(embedding[d] as double) *
        |                (cast(xxhash64(p, d) as double) / cast(9223372036854775807 as double))) > cast(0.0 as double)
        |    then shiftleft(1L, p) else 0L end))""".stripMargin
    val e = emb(spark, dir).withColumn("bucket", expr(sigExpr))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("qe"), col("bucket"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("ce"),
      col("bucket").as("bb"))
    a.join(b, col("bucket") === col("bb") && col("va") < col("vb"))
      .withColumn("cos", cosine(e))
      .filter(col("cos") >= 0.95)
      .select(col("va").as("doc_a"), col("vb").as("doc_b"), round(col("cos"), 6).as("cos_sim"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** IVF (inverted-file) ANN: KMeans centroids partition the corpus into
    * coarse cells; each query probes only the `nprobe` nearest cells.
    * The centroid table is tiny (k × dim) and broadcast; the corpus is
    * scanned once to assign cells (one shuffle on cell id at scale), and
    * probe cost is nprobe/k of the corpus per query. Approximate →
    * rows-only check.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    graft.plans.GraftExtensions.register(spark)
    val e = emb(spark, dir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(16).setSeed(42).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(e)
    val assigned = model.transform(e)
    val centroids = {
      import spark.implicits._
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
        .toDF("cent_cell", "ce")
    }
    // rank cells per query by centroid cosine, keep nprobe = 4
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wCell = Window.partitionBy(col("qid")).orderBy(col("cos_c").desc, col("cent_cell"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cos_c", expr("cosine_f32(qe, ce)"))
      .withColumn("cr", row_number().over(wCell))
      .filter(col("cr") <= 4)
      .select(col("qid"), col("qe"), col("cent_cell"))
    // search only the probed cells
    val c = assigned.select(col("vec_id").as("cid"), col("embedding").as("ce2"),
      col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    c.join(broadcast(probed), col("cell") === col("cent_cell") && col("qid") =!= col("cid"))
      .withColumn("cos", expr("cosine_f32(qe, ce2)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid").as("vec_id"), col("cid").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"), col("cell"))
      .orderBy(col("vec_id"), col("neighbor_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (cosineTopK _),
    "sim_ann_lsh" -> (annLsh _),
    "sim_ann_ivf" -> (annIvf _),
    "sim_cosine_neardup" -> (cosineNearDup _))

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" -> cosineTopKSql)
}
