package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Typed loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Mapping onto the reference (muccg/bpaotu) data model: `lineitem`
  * plays the `sample_otu` abundance fact, `part` the OTU/taxonomy
  * dimension, and `orders`/`customer`/`nation`/`region` the
  * sample-context dimensions. `documents`/`embeddings`/`events` back
  * the LLM-pipeline and streaming extensions.
  *
  * Scale note: only the fact tables (`lineitem`, `orders`, `events`)
  * grow with SF; every other table is a bounded dimension that should
  * be broadcast in joins.
  */
object Tables {
  val factTables = Set("lineitem", "orders", "events")
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some data
    * generations and TIMESTAMP_NTZ (micros, isAdjustedToUTC=false) in
    * others; downstream operators assume session-TZ TIMESTAMP (they
    * call `unix_micros`). Normalize both shapes here, once:
    *  - NANOS: Spark refuses it by default, so read nanos-as-long and
    *    truncate to micros — the same truncation DuckDB applies on
    *    CAST(ts AS TIMESTAMP), keeping the oracle comparable.
    *  - NTZ: cast to TIMESTAMP. The session TZ is UTC (SparkEntry /
    *    Verify / Bench all pin it), so the cast is lossless and the
    *    DuckDB oracle (which reads the same micros) is unchanged. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Dimension load with a broadcast hint: at 100 TB the fact side is
    * huge but these stay small, so every dim join must be a broadcast
    * hash join (no shuffle of the fact). */
  def dim(spark: SparkSession, dir: String, name: String): DataFrame =
    broadcast(load(spark, dir, name))

  /** Ensure CPU-heavy per-row work can use the whole cluster: a small
    * table written as one parquet row group yields ONE input split, so
    * a signature/trigram/cosine scan would run on a single core. If the
    * scan has fewer splits than the default parallelism, fan it out;
    * at real scale inputs arrive as many files and this is a no-op. */
  def parallel(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate scan splits from BYTES, not file count: Spark bin-packs
    // many small files into few partitions (maxPartitionBytes /
    // openCostInBytes), so "many files" can still mean few splits —
    // and one huge file is split into many. sizeInBytes comes from the
    // already-cached FileIndex listing (no data read, no RDD probe).
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val splits =
      if (bytes > 0 && maxPart > 0)
        ((bytes + maxPart - 1) / maxPart).toLong
      else df.rdd.getNumPartitions.toLong
    if (splits < target) df.repartition(target) else df
  }

  /** Fan a CPU-dense, dimension-bounded frame out across the session's
    * shuffle parallelism before an expensive per-row expression stage
    * (r18 optimization round). AQE coalesces post-shuffle partitions
    * by BYTES (advisoryPartitionSizeInBytes), which is right for
    * I/O-bound stages but wrong for per-row CPU-heavy folds over tiny
    * frames: a few-hundred-KB aggregate lands in ONE post-shuffle
    * partition no matter how expensive its downstream expressions are
    * (measured: q60's log-binomial folds, q65/q58's per-taxon round-12
    * entropy terms and q57's hypergeometric products all ran
    * single-task at sf0.1 — 1.2–2.6 s of serial work on a 32-core
    * box). An explicit-count hash repartition is never coalesced by
    * AQE, so the fold stage keeps its parallelism; the exchange itself
    * moves only the tiny frame. The count is the session's
    * spark.sql.shuffle.partitions — the driver contract's
    * scale-parameterised knob — so cluster sessions fan wider, and
    * values are unchanged because the fanned stages are per-row
    * expressions feeding order-free (exact DECIMAL/integer)
    * aggregates. */
  def fanout(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(df.sparkSession.conf.get(
      "spark.sql.shuffle.partitions", "200").toInt, cols: _*)

  /** Register only the named tables as temp views (a full registerAll
    * re-reads every table's parquet footer on each call). */
  def register(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, all: _*)
}

/** Exact-arithmetic helpers.
  *
  * All money/abundance aggregates go through DECIMAL(18,2): decimal
  * addition is associative+commutative, so the result is independent
  * of partitioning/shuffle order — the same bits on local[32] and on
  * a 1000-executor cluster, and bit-identical to the DuckDB oracle.
  * Double sums would drift with parallelism.
  */
object Dec {
  val D2 = DecimalType(18, 2)
  def dec(c: Column): Column = c.cast(D2)
  /** Order-independent exact sum, surfaced as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  /** Exact decimal mean, surfaced as double. */
  def davg(c: Column): Column =
    (sum(dec(c)).cast("double") / count(lit(1)))
}
