package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bulk ingest — the reference's flat-file load path re-expressed:
  * schema-enforced CSV read in PERMISSIVE mode with corrupt rows
  * captured (not dropped, not fatal), idempotent re-load via
  * keep-first dedup on the primary key, and a partitioned parquet
  * landing write. Every step is a plain DataFrame transform, so a
  * 100 TB backfill is just more input files.
  */
object Ingest {

  /** Read CSV under an explicit schema; malformed rows land in
    * `_corrupt_record` instead of failing the job. Returns (good,
    * quarantined). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      // PERMISSIVE corrupt-column semantics require materializing once;
      // DISK_ONLY (not MEMORY) so a 100 TB backfill spills instead of
      // thrashing executor memory — the trade is one extra local read.
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }

  /** Idempotent upsert-by-key: re-ingesting the same batch (or an
    * overlapping one) keeps the first row per key — one shuffle on the
    * key, exactly the semantics a re-run backfill needs. */
  def dedupOnKey(df: DataFrame, key: String): DataFrame =
    df.dropDuplicates(key)

  /** Landing write: parquet partitioned by the given column, the
    * layout every downstream query partition-prunes against. */
  def land(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
