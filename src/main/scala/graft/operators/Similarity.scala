package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over the `embeddings` table.
  *
  * Scale design: the query side is tiny and broadcast; norms are
  * computed once per row *before* the join fans out. The brute-force
  * path is the exactness baseline (a single corpus scan per batch of
  * queries); the SRP-LSH path buckets the corpus so each probe touches
  * only matching buckets — candidate count scales with bucket density,
  * not corpus size.
  */
object Similarity {

  /** Brute-force cosine top-k: exact baseline. Queries = vec_id < 5,
    * k = 10. One broadcast-nested-loop over a single corpus scan, with
    * the fused native [[graft.functions.expressions.CosineSimilarity]]
    * expression in the hot loop. */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame =
    annBruteforce(Tables.parallel(Tables.load(spark, dir, "embeddings")))

  def annBruteforce(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val q = broadcast(e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv")))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.GraftFunctions.cosineSim(spark, col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("c_id"), col("rnk"),
        round(col("cos"), 6).as("score"))
      .orderBy("q_id", "rnk")
  }

  /** IVF (inverted-file) ANN: K-Means centroids partition the corpus;
    * each query probes only the `nProbe` nearest cells. At scale the
    * corpus is written partitioned by centroid id, so a probe reads
    * `nProbe/k` of the data — the classic IVF trade of recall for scan
    * fraction. Centroid training uses the DataFrame ML API with a
    * fixed seed; assignment and probing are plain joins.
    * Rows-only oracle (iterative training isn't SQL); recall is
    * spec-asserted against the brute-force baseline. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 16, nProbe: Int = 4): DataFrame =
    annIvf(Tables.parallel(Tables.load(spark, dir, "embeddings")), k, nProbe)

  def annIvf(e: DataFrame, k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = e.sparkSession
    // cache: KMeans makes one pass per iteration; without this each
    // pass re-reads parquet and re-projects the vectors
    val feat = e.withColumn("fv", array_to_vector(col("embedding"))).cache()
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(3)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val fitted = model.fit(feat)
    val corpus = fitted.transform(feat)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("cell"))
    // centroids as a tiny literal table; queries rank cells by cosine
    val centers = fitted.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.toSeq)
    }
    import spark.implicits._
    val centersDf = broadcast(centers.toSeq.toDF("cell", "centroid"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cell_sim").desc, col("cell"))
    val probes = queries.crossJoin(centersDf)
      .withColumn("cell_sim",
        graft.GraftFunctions.cosineSim(spark, col("qv"), col("centroid")))
      .withColumn("cell_rnk", row_number().over(wCell))
      .filter(col("cell_rnk") <= nProbe)
      .select(col("q_id"), col("qv"), col("cell"))
    val scored = broadcast(probes).join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.GraftFunctions.cosineSim(spark, col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("c_id"), col("rnk"), round(col("cos"), 6).as("score"))
      .orderBy("q_id", "rnk")
  }

  /** SRP-LSH ANN: 4 hash tables × 8 signed-random-projection bits.
    * Corpus is bucketed once (at scale: write bucketed/partitioned by
    * (table_id, bucket)); probes equi-join on bucket keys and rank
    * candidates by exact cosine. */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(Tables.parallel(Tables.load(spark, dir, "embeddings")))

  def annLsh(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val nTables = 4
    val bitsPerTable = 8
    val planes = hyperplanes(nTables * bitsPerTable, 64)

    def withBuckets(df: DataFrame): DataFrame = {
      val buckets = (0 until nTables).map { t =>
        val tablePlanes = planes.slice(t * bitsPerTable, (t + 1) * bitsPerTable)
        struct(lit(t).as("table_id"), srpBucket(tablePlanes, col("embedding")).as("bucket"))
      }
      df.select(col("*"), explode(array(buckets: _*)).as("tb"))
        .select(col("vec_id"), col("embedding"),
          col("tb.table_id").as("table_id"), col("tb.bucket").as("bucket"))
    }

    val corpus = withBuckets(e)
    val queries = broadcast(withBuckets(e.filter(col("vec_id") < 5))
      .select(col("vec_id").as("q_id"), col("table_id"), col("bucket")))
    // Dedup candidate IDs *before* re-attaching 256-byte vectors: the
    // distinct shuffles 16-byte id pairs instead of embedding payloads.
    val candIds = queries.join(corpus.select(col("vec_id"), col("table_id"), col("bucket")),
        Seq("table_id", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("c_id"))
      .distinct()
    val qVecs = broadcast(e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv")))
    val scored = candIds
      .join(qVecs, Seq("q_id"))
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("cv")), Seq("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.GraftFunctions.cosineSim(spark, col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("q_id"), col("c_id"), col("rnk"), round(col("cos"), 6).as("score"))
      .orderBy("q_id", "rnk")
  }
}
