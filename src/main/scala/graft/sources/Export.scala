package graft.sources

import graft.{Dec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * 100 TB contract: every export is a scan-shaped projection plus one
  * distributed write (no collect, no single-file funnel); the only
  * aggregations are the abundance-matrix pivots, which shuffle once on
  * their dimension keys and stay dimension-bounded in the reduce.
  */
object Export {

  /** Run-scoped default export root: `spark.graft.exportDir` when set,
    * else `/tmp/graft_export/<applicationId>` — two concurrent sessions
    * write disjoint trees instead of clobbering each other's artifacts.
    * Explicit `outPath` arguments always win. */
  private def resolve(spark: SparkSession, outPath: String, leaf: String): String =
    Option(outPath).getOrElse {
      val root = spark.conf.getOption("spark.graft.exportDir")
        .getOrElse(s"/tmp/graft_export/${spark.sparkContext.applicationId}")
      s"$root/$leaf"
    }

  /** Contextual CSV export: joined order+customer context rows →
    * header CSV → re-read under an explicit schema. Timestamps are
    * formatted to dates on the way out so the artifact is
    * engine-neutral text. */
  def contextualCsv(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val path = resolve(spark, outPath, "x1_contextual_csv")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
    val c = Tables.dim(spark, dir, "customer")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"))
      .write.mode("overwrite").option("header", "true").csv(path)
    spark.read
      .option("header", "true")
      .schema("c_custkey LONG, c_name STRING, c_mktsegment STRING, " +
        "o_orderkey LONG, o_orderdate STRING, o_totalprice DOUBLE")
      .csv(path)
      .orderBy("o_orderkey")
  }

  /** BIOM-shaped abundance matrix export: q7's sample × taxon matrix
    * written as parquet partitioned by the row key (`n_name`), then
    * read back. The partitioned layout is the point: a consumer
    * fetching one sample's row reads one directory. */
  def biomMatrix(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val path = resolve(spark, outPath, "x2_biom_matrix")
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    // the matrix is aggregate-bounded (samples × taxa), so collapse to
    // one task before the partitioned write — otherwise every shuffle
    // partition opens a file per row-key directory
    graft.operators.Relational.q7AbundanceMatrix(spark, dir)
      .coalesce(1)
      .write.mode("overwrite").partitionBy("n_name").parquet(path)
    spark.read.parquet(path)
      .select(col("n_name") +: types.map(col): _*)
      .orderBy("n_name")
  }

  /** Sample × taxon abundance in sparse triple form (row label + its
    * contextual region, column label, exact-decimal total) — the
    * matrix both BIOM exports serialize. The region rides along as the
    * sample's contextual metadata (functionally dependent on the
    * sample, so the group cardinality is unchanged). One aggregation;
    * all joins are dim broadcasts. */
  private def abundanceTriples(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    l.join(Tables.dim(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dim(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.dim(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.dim(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"), col("p_type"))
      .agg(sum(Dec.dec(col("l_quantity"))).as("qty"))
  }

  /** BIOM v1 (JSON, biom-format 1.0) abundance export — the
    * interchange artifact QIIME-style consumers ingest (the parquet
    * [[biomMatrix]] is the lake-native layout; this is the wire
    * format). The document is assembled DISTRIBUTED-then-bounded: the
    * triples aggregation is the only corpus-scale work, and the JSON
    * concatenation runs over the aggregate-bounded matrix (samples ×
    * taxa), so no driver-side loop touches data. Values are serialized
    * from DECIMAL(18,2) (fixed-point text, no double formatting
    * drift). Returns the matrix RE-READ from the written JSON —
    * the correctness gate covers serialize + parse, and the structural
    * spec in ExportSpec covers BIOM conformance (required keys, shape
    * bounds, dense index range). */
  def biomJson(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val path = resolve(spark, outPath, "x3_biom_json")
    import org.apache.spark.sql.expressions.Window
    def esc(c: Column): Column =
      regexp_replace(c, "([\\\\\"])", "\\\\$1")
    val triples = abundanceTriples(spark, dir)
      // dense 0-based indices by sorted label. Input is the
      // aggregate-bounded matrix (25 nations × 6 types), so a single
      // partition is fine; the constant partition key exists ONLY to
      // keep WindowExec's "no partition" warning out of the logs, so a
      // surviving warning always flags a real unbounded global window.
      // (`length(col)*0`, not `lit(1)`: Spark 4's
      // EliminateWindowPartitions strips foldable partition keys.)
      .withColumn("row_i", dense_rank().over(
        Window.partitionBy(length(col("n_name")) * 0).orderBy("n_name")) - 1)
      .withColumn("col_i", dense_rank().over(
        Window.partitionBy(length(col("p_type")) * 0).orderBy("p_type")) - 1)
    val doc = triples.agg(
      (max(col("row_i")) + 1).as("n_rows"),
      (max(col("col_i")) + 1).as("n_cols"),
      // rows carry the sample's CONTEXTUAL metadata (its region) the
      // way the reference's export attaches contextual columns to each
      // BIOM row — parse-back below reads it through, so the oracle
      // gate covers the metadata field, not just the ids
      array_join(transform(
        array_sort(collect_set(struct(col("row_i"), col("n_name"), col("r_name")))),
        s => format_string("""{"id":"%s","metadata":{"region":"%s"}}""",
          esc(s("n_name")), esc(s("r_name")))), ",")
        .as("rows_json"),
      array_join(transform(
        array_sort(collect_set(struct(col("col_i"), col("p_type")))),
        s => format_string("""{"id":"%s","metadata":null}""", esc(s("p_type")))), ",")
        .as("cols_json"),
      array_join(transform(
        array_sort(collect_list(struct(col("row_i"), col("col_i"), col("qty")))),
        s => format_string("[%d,%d,%s]",
          s("row_i"), s("col_i"), s("qty").cast("string"))), ",")
        .as("data_json"))
    doc.select(concat(
        lit("""{"id":"graft:abundance","format":"Biological Observation Matrix 1.0.0",""" +
          """"format_url":"http://biom-format.org","type":"OTU table",""" +
          """"generated_by":"graft","date":"2026-01-01T00:00:00",""" +
          """"matrix_type":"sparse","matrix_element_type":"float","shape":["""),
        col("n_rows"), lit(","), col("n_cols"),
        lit("""],"rows":["""), col("rows_json"),
        lit("""],"columns":["""), col("cols_json"),
        lit("""],"data":["""), col("data_json"), lit("]}"))
        .as("value"))
      .write.mode("overwrite").text(path)
    // parse-back: indices → labels through the rows/columns arrays,
    // and the row METADATA field read through alongside the id
    val j = spark.read.option("multiLine", "true")
      .schema("rows ARRAY<STRUCT<id: STRING, metadata: STRUCT<region: STRING>>>, " +
        "columns ARRAY<STRUCT<id: STRING>>, " +
        "shape ARRAY<LONG>, data ARRAY<ARRAY<DOUBLE>>")
      .json(path)
    j.select(col("rows"), col("columns"), explode(col("data")).as("t"))
      .withColumn("r",
        element_at(col("rows"), element_at(col("t"), 1).cast("int") + 1))
      .select(
        col("r").getField("id").as("n_name"),
        col("r").getField("metadata").getField("region").as("region"),
        element_at(col("columns"), element_at(col("t"), 2).cast("int") + 1)
          .getField("id").as("p_type"),
        element_at(col("t"), 3).as("abundance"))
      .orderBy("n_name", "p_type")
  }

  /** Krona lineage export: the text-list artifact Krona renders into
    * its interactive hierarchy chart — one LEAF row per distinct
    * 5-level taxonomy path (mfgr → type → brand → container → size),
    * `abundance<TAB>level1..level5` (Krona aggregates interior nodes
    * itself). The TSV write stays distributed; abundances are
    * DECIMAL(18,2) text. Returns the full 5-level ROLLUP recomputed
    * from the RE-READ artifact (exact decimal re-aggregation), so the
    * gate proves the exported leaves carry the entire hierarchy. */
  def kronaTsv(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val path = resolve(spark, outPath, "x4_krona_tsv")
    val l = Tables.load(spark, dir, "lineitem")
    l.join(Tables.dim(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      // the schema has no mfgr/container columns, so the 5 levels are
      // mfgr (TPC-H-style: derived from the brand number, each brand
      // nests under exactly one mfgr) → type → brand → genus (head
      // word of p_name) → size
      .withColumn("p_mfgr", concat(lit("MFGR#"),
        (element_at(split(col("p_brand"), "#"), 2).cast("int") / 10).cast("int").cast("string")))
      .withColumn("p_genus", element_at(split(col("p_name"), " "), 1))
      .groupBy(col("p_mfgr"), col("p_type"), col("p_brand"),
        col("p_genus"), col("p_size"))
      .agg(sum(Dec.dec(col("l_quantity"))).cast("string").as("abundance"))
      .select(col("abundance"), col("p_mfgr"), col("p_type"), col("p_brand"),
        col("p_genus"), col("p_size").cast("string"))
      .write.mode("overwrite").option("delimiter", "\t").csv(path)
    spark.read
      .schema("abundance DECIMAL(18,2), p_mfgr STRING, p_type STRING, " +
        "p_brand STRING, p_genus STRING, p_size STRING")
      .option("delimiter", "\t").csv(path)
      .createOrReplaceTempView("graft_krona_leaves")
    // ROLLUP through SQL (grouping-sets + coalesce trips the DataFrame
    // API's ambiguous-self-join check — same route as q27)
    spark.sql("""
      SELECT coalesce(p_mfgr, 'ALL') AS lvl_mfgr,
             coalesce(p_type, 'ALL') AS lvl_type,
             coalesce(p_brand, 'ALL') AS lvl_brand,
             coalesce(p_genus, 'ALL') AS lvl_genus,
             coalesce(p_size, 'ALL') AS lvl_size,
             CAST(sum(abundance) AS DOUBLE) AS abundance
      FROM graft_krona_leaves
      GROUP BY ROLLUP(p_mfgr, p_type, p_brand, p_genus, p_size)
      ORDER BY lvl_mfgr, lvl_type, lvl_brand, lvl_genus, lvl_size""")
  }

  /** Sharded JSONL training-data export (x6) — the LLM-pipeline wire
    * format: documents as JSON lines, one directory per shard
    * (`shard=K/part-*.json`), shard = Knuth hash of doc_id mod
    * nShards, so the layout is reproducible at any parallelism and a
    * downstream trainer can fetch shard K alone (partition pruning,
    * spec-asserted).
    *
    * Round-trip gate: the returned frame is the per-shard MANIFEST
    * (n_docs, total_chars, doc id range) recomputed from the RE-READ
    * JSON — the oracle computes the same manifest straight from the
    * source table, so a write-side loss (escaping, truncation, a
    * dropped row) breaks the match. The write stays distributed
    * (many part files per shard is fine for a trainer; a download
    * endpoint would stream-concatenate). */
  def jsonlShards(spark: SparkSession, dir: String, nShards: Int = 8,
      outPath: String = null): DataFrame = {
    val path = resolve(spark, outPath, "x6_jsonl")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        (pmod(pmod(col("doc_id"), lit(1000000000L)) * lit(2654435761L),
          lit(2147483647L)) % nShards).as("shard"))
      .write.mode("overwrite").partitionBy("shard").json(path)
    spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING")
      .json(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("shard")
  }

  /** DuckDB oracle for [[jsonlShards]]: the manifest recomputed from
    * the source table — matching it proves the written shards parse
    * back to exactly the source rows. */
  def x6OracleSql(nShards: Int = 8): String = s"""
      SELECT shard, count(*) AS n_docs,
        CAST(sum(length(text)) AS BIGINT) AS total_chars,
        min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM (
        SELECT doc_id, text,
          ((doc_id % 1000000000) * 2654435761) % 2147483647 % $nShards AS shard
        FROM documents) t
      GROUP BY shard ORDER BY shard"""

  /** x7: small-file compaction — THE lakehouse maintenance op for any
    * streaming- or micro-batch-ingested table (thousands of KB-sized
    * files rot scan throughput: per-file open cost, starved row-group
    * pruning, NameNode/listing pressure). Stage 1 deliberately writes
    * the table fragmented ([[FragFiles]] files); stage 2 compacts by
    * re-reading and writing ceil(rows / [[RowsPerFile]]) files via an
    * explicit round-robin repartition. That pays ONE shuffle where a
    * coalesce() would be narrow — but coalesce can only SHRINK the
    * scan's partition count, so its output file count depends on how
    * the scan bin-packed the fragments (the cross-parallelism
    * determinism sweep caught exactly that: 4 files at 8 cores, 3 at
    * 3). A compactor that promises a target layout must own the
    * partitioning; the opportunistic narrow path is only valid when
    * the file count is advisory. Real deployments size by bytes; rows
    * keep the file count oracle-derivable. The gate is x6's: the
    * manifest (counts, char totals, a doc_id×n_chars content
    * signature) is recomputed from the RE-READ compacted output and
    * must equal the oracle's manifest from the source table — plus
    * both physical file counts, which the oracle derives arithmetically. */
  val FragFiles = 64
  val RowsPerFile = 128

  def compact(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val frag = resolve(spark, outPath, "x7_frag")
    val comp = resolve(spark, outPath, "x7_compact") + "_out"
    def countFiles(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, true) // recursive: frag nests bucket=*/
      var n = 0L
      while (it.hasNext)
        if (it.next().getPath.getName.startsWith("part-")) n += 1
      n
    }
    // Fragment DETERMINISTICALLY: bucket by pmod(doc_id, FragFiles),
    // colocate each bucket in one task (repartition on the bucket
    // column) and write partitionBy(bucket) — exactly one data file
    // per occupied bucket, so n_files_before is oracle-derivable as
    // count(DISTINCT doc_id % FragFiles). A plain repartition(N)
    // round-robin is NOT: empty target partitions write no file, but
    // an empty task 0 still writes a schema-only part file, so a
    // corpus under N rows yields a data-dependent count (r9's oracle
    // hardcoded 64 and broke on exactly that).
    Tables.load(spark, dir, "documents")
      .withColumn("bucket", pmod(col("doc_id"), lit(FragFiles)))
      .repartition(FragFiles, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(frag)
    val before = countFiles(frag)
    val reread = spark.read.parquet(frag).drop("bucket")
    val n = reread.count()
    val nAfter = math.max(1L, (n + RowsPerFile - 1) / RowsPerFile).toInt
    reread.repartition(nAfter).write.mode("overwrite").parquet(comp)
    val after = countFiles(comp)
    spark.read.parquet(comp)
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        sum(col("doc_id") * col("n_chars")).as("content_sig"))
      .select(lit(before).as("n_files_before"), lit(after).as("n_files_after"),
        col("n_docs"), col("total_chars"), col("content_sig"))
  }

  /** DuckDB oracle for [[compact]]: the manifest from the source table
    * plus the arithmetically-derived file counts. n_files_before =
    * occupied buckets = count(DISTINCT pmod(doc_id, FragFiles)) —
    * spelled ((doc_id % F) + F) % F because DuckDB's % is
    * sign-preserving while the Spark side buckets with pmod; they'd
    * diverge on negative doc_ids otherwise. One data file per occupied
    * bucket by construction — exact for ANY corpus size, where the old
    * hardcoded FragFiles broke under 64 rows. */
  def x7OracleSql: String = s"""
      SELECT CAST(count(DISTINCT ((doc_id % $FragFiles) + $FragFiles)
          % $FragFiles) AS BIGINT)
        AS n_files_before,
        CAST(greatest(1, (count(*) + ${RowsPerFile - 1}) // $RowsPerFile)
          AS BIGINT) AS n_files_after,
        count(*) AS n_docs,
        CAST(sum(length(text)) AS BIGINT) AS total_chars,
        CAST(sum(doc_id * n_chars) AS BIGINT) AS content_sig
      FROM documents"""

  /** x9: hive-partitioned training-data layout — write the corpus
    * `partitionBy(lang, source)` (the layout a 100 TB corpus ships
    * in: language/source pruning must happen at the DIRECTORY level,
    * before any file is opened), then audit the landed layout by
    * reading it BACK through the partitioned reader. Rows are
    * repartitioned on exactly the partition columns first, so every
    * (lang, source) cell lands in ONE task and writes EXACTLY ONE
    * data file — the small-files discipline partitionBy famously
    * violates when each of N tasks holds rows of every cell (N×cells
    * files); that contract is oracle-exact (`n_files` = 1 per cell,
    * counted from the filesystem, not assumed). Partition PRUNING on
    * the read side is spec-gated (a lang=… filter must reach the
    * scan as a PartitionFilter, scanning only that directory).
    *
    * 100 TB contract: one corpus-scale shuffle (the cell
    * repartition), one streaming write, one partitioned re-read +
    * cell-level aggregate; the per-cell file census is a driver-side
    * directory listing bounded by the (small) cell count. */
  def partitionedExport(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val out = resolve(spark, outPath, "x9_part")
    Tables.load(spark, dir, "documents")
      .repartition(col("lang"), col("source"))
      .write.mode("overwrite")
      // the one-file-per-cell contract must not depend on ambient
      // session config: a deployment that sets
      // spark.sql.files.maxRecordsPerFile would split the single
      // per-cell task into multiple files and break the oracle's
      // n_files = 1 (r11 ADVICE) — 0 pins "no per-file row bound"
      .option("maxRecordsPerFile", 0)
      .partitionBy("lang", "source").parquet(out)
    // per-cell data-file census via input_file_name() on the
    // partitioned re-read — Spark's own partition decoding supplies
    // the cell values, so Hive path escaping (a lang like "pt BR" →
    // lang=pt%20BR, or the null-partition sentinel) can never desync
    // the census keys from the read-back values the way a hand-parsed
    // directory walk did
    spark.read.parquet(out)
      .select(col("lang"), col("source"), col("text"),
        input_file_name().as("fname"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        countDistinct(col("fname")).as("n_files"))
      .orderBy("lang", "source")
  }

  /** DuckDB oracle for [[partitionedExport]] — cell rollup from the
    * source table; `n_files` = 1 per cell is the write-discipline
    * contract itself (repartition on the partition columns ⇒ one
    * task per cell ⇒ one file per cell), not an observation. */
  def x9OracleSql: String = """
      SELECT lang, source, count(*) AS n_docs,
        CAST(sum(length(text)) AS BIGINT) AS total_chars,
        CAST(1 AS BIGINT) AS n_files
      FROM documents GROUP BY lang, source ORDER BY lang, source"""

  /** Bits per dimension of x11's Morton quantization grid (8 ⇒ a
    * 256×256 grid, 16-bit z-values) and the z-prefix shift that folds
    * them into [[ZBuckets]] write buckets (one 16×16 grid cell each). */
  val ZBits = 8
  val ZBuckets = 256

  /** x11: Z-ORDER (Morton) clustered export — the multi-dimensional
    * layout trick behind Delta/Iceberg `ZORDER BY`: interleaving the
    * bits of two quantized key columns makes ONE physical sort order
    * serve range predicates on BOTH columns, so file-level min/max
    * stats prune on either key (a single-column sort prunes on one
    * and shreds the other). Here: quantize (l_orderkey, l_partkey)
    * onto a 2^[[ZBits]]-per-side grid with exact integer arithmetic
    * (div/mod only — no floats, no engine-specific bitwise ops),
    * interleave to a z-value, bucket by its high byte (= a 16×16
    * grid cell), land ONE file per occupied bucket (x9's
    * repartition-then-partitionBy discipline, maxRecordsPerFile
    * pinned to 0), and audit the landed layout by RE-READING it:
    * per-bucket row count, the min/max BOUNDING BOX of both keys
    * (the zone-map a reader would prune with — tight on both
    * dimensions precisely because of the interleave), and the
    * physical file census.
    *
    * 100 TB contract: one corpus-scale shuffle (the bucket
    * repartition — at scale, RANGE-partition by z for balanced
    * files), one streaming write, one re-read rollup. The quantile
    * bounds here are global min/max one-row aggregates composed
    * in-plan (broadcast), never a collect. */
  def zorderExport(spark: SparkSession, dir: String,
      outPath: String = null): DataFrame = {
    val out = resolve(spark, outPath, "x11_zorder")
    // parallel (r18): the two-column pruned scan is ONE split at
    // bench scale, so the DECIMAL(38,0) quantize/interleave ran on
    // 3 tasks (3.3 s of the key's 5.3 s) — fan the scan out; per-row
    // arithmetic, values and the per-bucket file contract unchanged
    val l = Tables.parallel(Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))
    val bounds = l.agg(
      min(col("ok")).as("mn_ok"), max(col("ok")).as("mx_ok"),
      min(col("pk")).as("mn_pk"), max(col("pk")).as("mx_pk"))
    val side = 1L << ZBits
    // exact integer grid cell: (x - mn) * side div (mx - mn + 1) ∈ [0, side)
    // — the widening multiply runs in DECIMAL(38,0) (128-bit-safe):
    // a plain Long (x − mn) * 256 silently wraps once the key range
    // exceeds ~2^55, producing wrong buckets exactly where the
    // HUGEINT-exact oracle keeps the true cell. `div` (IntegralDivide)
    // accepts decimal operands and lands back on BIGINT.
    val zExpr = (0 until ZBits).map { i =>
      s"((qx div ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((qy div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    l.crossJoin(broadcast(bounds))
      .withColumn("qx",
        expr(s"(CAST(ok AS DECIMAL(38,0)) - mn_ok) * $side" +
          s" div (CAST(mx_ok AS DECIMAL(38,0)) - mn_ok + 1)"))
      .withColumn("qy",
        expr(s"(CAST(pk AS DECIMAL(38,0)) - mn_pk) * $side" +
          s" div (CAST(mx_pk AS DECIMAL(38,0)) - mn_pk + 1)"))
      .withColumn("zbucket",
        expr(s"($zExpr) div ${(1L << (2 * ZBits)) / ZBuckets}"))
      .select(col("ok"), col("pk"), col("zbucket"))
      .repartition(col("zbucket"))
      .write.mode("overwrite").option("maxRecordsPerFile", 0)
      .partitionBy("zbucket").parquet(out)
    spark.read.parquet(out)
      // partition-column type inference reads the directory value as
      // int — pin the contract type explicitly
      .select(col("zbucket").cast("long").as("zbucket"), col("ok"), col("pk"),
        input_file_name().as("fname"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("ok")).as("min_ok"), max(col("ok")).as("max_ok"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        countDistinct(col("fname")).as("n_files"))
      .orderBy("zbucket")
  }

  /** DuckDB oracle for [[zorderExport]] — the identical integer
    * quantize/interleave/bucket arithmetic straight off the source
    * table; `n_files` = 1 per occupied bucket is the x9 write
    * contract, not an observation. */
  def x11OracleSql: String = {
    val side = 1L << ZBits
    val zExpr = (0 until ZBits).map { i =>
      s"((qx // ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((qy // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""
      WITH b AS (
        SELECT min(l_orderkey) AS mn_ok, max(l_orderkey) AS mx_ok,
          min(l_partkey) AS mn_pk, max(l_partkey) AS mx_pk
        FROM lineitem),
      q AS (
        SELECT l_orderkey AS ok, l_partkey AS pk,
          CAST((CAST(l_orderkey AS HUGEINT) - mn_ok) * $side
            // (CAST(mx_ok AS HUGEINT) - mn_ok + 1) AS BIGINT) AS qx,
          CAST((CAST(l_partkey AS HUGEINT) - mn_pk) * $side
            // (CAST(mx_pk AS HUGEINT) - mn_pk + 1) AS BIGINT) AS qy
        FROM lineitem, b),
      z AS (
        SELECT ok, pk,
          ($zExpr) // ${(1L << (2 * ZBits)) / ZBuckets} AS zbucket
        FROM q)
      SELECT zbucket, count(*) AS n_rows,
        min(ok) AS min_ok, max(ok) AS max_ok,
        min(pk) AS min_pk, max(pk) AS max_pk,
        CAST(1 AS BIGINT) AS n_files
      FROM z GROUP BY zbucket ORDER BY zbucket"""
  }
}
