package graft.ext

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column. Three tiers:
  *
  *   - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query
  *     set against the corpus; one narrow shuffle for the per-query
  *     rank. The correctness baseline at any scale where queries are
  *     few; cost O(|corpus| x |queries|) but fully partition-parallel
  *     with no corpus shuffle.
  *   - [[lshTopK]]: random-hyperplane LSH — T independent tables of
  *     b sign-bits; candidates = same bucket in ANY table, then exact
  *     cosine re-rank. Corpus-side cost: T bucket keys per vector
  *     (row-local), candidate join shuffles on bucket keys only.
  *   - [[ivfTopK]]: inverted-file — assign vectors to their nearest
  *     centroid (broadcast centroids), probe the nProbe nearest lists
  *     per query. The classic 100 TB layout: partition/bucket the
  *     corpus by list id so a query touches nProbe partitions.
  *
  * Hyperplanes/centroid choice are deterministic (fixed seed / fixed
  * id-stride) so results are reproducible run-to-run.
  */
object Similarity {

  private def rankWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)

  /** Exact top-k neighbors of each query vector, excluding self.
    * Ordering ties broken by rounded cosine then neighbor id — fully
    * deterministic.
    */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    // broadcast-join parallelism follows the stream side's partition
    // count; a small parquet corpus arrives as one split — spread it
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(VectorOps.cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic random hyperplanes: `tables` tables x `bits` planes
    * x `dim` components, seeded.
    */
  private[graft] def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** (table, bit, plane) rows for a broadcast join — computing buckets
    * via one dot-product expression over a planes table instead of
    * tables x bits inlined literal-array expressions: the literal form
    * generated enormous codegen (seconds of janino compile per query);
    * this shape is one small cross join + one grouped sum.
    */
  private def planesDf(spark: org.apache.spark.sql.SparkSession, planes: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    planes.zipWithIndex.flatMap { case (table, t) =>
      table.zipWithIndex.map { case (p, bit) => (t, bit, p.toSeq) }
    }.toSeq.toDF("t", "bit", "plane")
  }

  /** Bucket each vector in every table: sign bit of the dot product
    * with each plane, packed per table.
    */
  private def withBuckets(df: DataFrame, id: String, vec: String, planes: DataFrame): DataFrame = {
    val bits = df.crossJoin(broadcast(planes))
      .withColumn("bitval",
        when(graft.functions.DotProductExpr.dot(col(vec), col("plane")) >= 0,
          expr("shiftleft(1, bit)")).otherwise(lit(0)))
      .groupBy(col(id), col("t"))
      .agg(sum(col("bitval")).as("b"))
    bits.join(df.select(col(id), col(vec)), Seq(id))
  }

  /** LSH-bucketed approximate top-k: candidates share a bucket with the
    * query in at least one of the `tables` hash tables; exact cosine
    * re-rank on the candidate set. Recall grows with `tables`, bucket
    * selectivity with `bits`.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      bits: Int = 8,
      seed: Long = 42L,
      dim: Int = 64
  ): DataFrame = {
    val planes = planesDf(corpus.sparkSession, hyperplanes(tables, bits, dim, seed))

    val c = withBuckets(
      corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id", "cv", planes)
    val q = broadcast(withBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", planes))

    c.join(q, Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
      .withColumn("cos", round(VectorOps.cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** IVF approximate top-k. Centroids are corpus vectors at a fixed id
    * stride (deterministic); every corpus vector joins its nearest
    * centroid's list; each query probes its `nProbe` nearest lists.
    * At scale: write the corpus bucketed by `list` so probing reads
    * only nProbe buckets.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidStride: Int = 50,
      nProbe: Int = 3
  ): DataFrame = {
    val centroids = broadcast(
      corpus.filter(col(idCol) % centroidStride === 0)
        .select(col(idCol).as("list"), col(vecCol).as("centv")))

    // corpus side: nearest centroid per vector (rank-1 over broadcast join)
    val wAssign = Window.partitionBy(col("neighbor_id")).orderBy(col("d").asc, col("list").asc)
    val assigned = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(centroids, col("neighbor_id") =!= lit(-1))
      .withColumn("d", VectorOps.l2sq(col("cv"), col("centv")))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select("list", "neighbor_id", "cv")

    // query side: nProbe nearest lists
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("d").asc, col("list").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(centroids, col("query_id") =!= lit(-1))
      .withColumn("d", VectorOps.l2sq(col("qv"), col("centv")))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nProbe)
      .select("query_id", "qv", "list")

    assigned.join(broadcast(probes), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(VectorOps.cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
