package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Emits ONE JSON line whose LAST fields are the
  * primary numbers: `...,"value":N,"queries":{...}}`.
  *
  * The primary timing is NOOP-MATERIALIZED — every result row is
  * produced and handed to the noop datasource-v2 sink. `count()` alone
  * lets Catalyst join-eliminate and column-prune work that doesn't
  * feed the count (it hid a 15× HOF re-evaluation for a full round).
  *
  * Timing protocol (r6): every query runs THREE times; the FIRST rep
  * is discarded (it pays that plan shape's one-time codegen + JIT —
  * up to 10–18 s on the hash-heavy dedup plans) and the reported
  * number is the min of the remaining two. ALL raw rep times are
  * printed under `"raw"` so a loaded machine is visible in the
  * artifact itself instead of masquerading as a code regression —
  * r5's artifact read 4.4× slower purely from driver-machine load,
  * and min-of-2 couldn't prove otherwise.
  *
  * Field ORDER is part of the contract with the harness: the driver
  * captures only a bounded TAIL of the line (the round-3 artifact kept
  * just the legacy count map and lost the materialized numbers), so
  * `value`/`queries` go last (raw reps go BEFORE them) and per-query
  * seconds are rounded to 3 decimals to keep the whole primary
  * section inside a ~2 KB window.
  *
  * The legacy count() pass is opt-in (GRAFT_BENCH_COUNTMODE=1) — it
  * doubled wall time and measured less.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val countMode = sys.env.get("GRAFT_BENCH_COUNTMODE").contains("1")
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: trigger file listing, codegen, and JIT once so the
    // first timed query doesn't pay session start-up costs.
    try SparkEntry.queries.get("q1_pricing_summary")
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    def noopWrite(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val countTimes = if (countMode) names.map { name =>
      name -> time(SparkEntry.queries(name)(spark, sfDir).count())
    } else Nil
    // rep 1 = cold (plan codegen + JIT), discarded; reported value =
    // min of the warm reps. Raw times for ALL reps go in the artifact.
    val rawTimes: Seq[(String, Seq[Double])] = names.map { name =>
      name -> Seq.fill(reps)(
        time(noopWrite(SparkEntry.queries(name)(spark, sfDir))))
    }
    val matTimes = rawTimes.map { case (n, ts) => n -> ts.drop(1).min }

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(ts: Seq[(String, Double)]): String =
      ts.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    def jraw(ts: Seq[(String, Seq[Double])]): String =
      ts.map { case (k, vs) =>
        s"\"" + k + "\":" + vs.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val total = matTimes.map(_._2).sum
    val legacy = if (countMode)
      s""""value_count":${r3(countTimes.map(_._2).sum)},"queries_count":${jmap(countTimes)},"""
    else ""
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir",""" +
      s""""materialized":true,"runs":$reps,"protocol":"drop-first-min-rest",""" +
      s""""raw":${jraw(rawTimes)},$legacy""" +
      s""""value":${r3(total)},"queries":${jmap(matTimes)}}""")
    spark.stop()
  }
}
