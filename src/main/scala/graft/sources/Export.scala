package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-class export endpoints — the reference's (muccg/bpaotu)
  * "download contextual search results as CSV" and BIOM
  * abundance-matrix exports, surfaced as ROUND TRIPS: each operator
  * writes the artifact and re-reads it, so the correctness gate covers
  * the full write+read path (formatting, schema, partition layout),
  * not just the query shape.
  *
  * Scale notes: both writes stay distributed (many part files — a
  * download endpoint would stream-concatenate); the BIOM write is
  * partitioned by the row key so downstream readers partition-prune
  * (asserted in ExportSpec).
  */
object Export {

  /** Contextual CSV export: joined order+customer context rows →
    * header CSV → re-read under an explicit schema. Timestamps are
    * formatted to dates on the way out so the artifact is
    * engine-neutral text. */
  def contextualCsv(spark: SparkSession, dir: String,
      outPath: String = "/tmp/graft_export/x1_contextual_csv"): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
    val c = Tables.dim(spark, dir, "customer")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"))
      .write.mode("overwrite").option("header", "true").csv(outPath)
    spark.read
      .option("header", "true")
      .schema("c_custkey LONG, c_name STRING, c_mktsegment STRING, " +
        "o_orderkey LONG, o_orderdate STRING, o_totalprice DOUBLE")
      .csv(outPath)
      .orderBy("o_orderkey")
  }

  /** BIOM-shaped abundance matrix export: q7's sample × taxon matrix
    * written as parquet partitioned by the row key (`n_name`), then
    * read back. The partitioned layout is the point: a consumer
    * fetching one sample's row reads one directory. */
  def biomMatrix(spark: SparkSession, dir: String,
      outPath: String = "/tmp/graft_export/x2_biom_matrix"): DataFrame = {
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    // the matrix is aggregate-bounded (samples × taxa), so collapse to
    // one task before the partitioned write — otherwise every shuffle
    // partition opens a file per row-key directory
    graft.operators.Relational.q7AbundanceMatrix(spark, dir)
      .coalesce(1)
      .write.mode("overwrite").partitionBy("n_name").parquet(outPath)
    spark.read.parquet(outPath)
      .select(col("n_name") +: types.map(col): _*)
      .orderBy("n_name")
  }
}
