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
  * Failure protocol (r11): `"failed"` is a name→MESSAGE map, not a
  * bare name list — r10's g5 convergence failure reached the artifact
  * as just a name while the reason went to stderr, which the driver's
  * bounded tail capture dropped, and diagnosing it cost a 7-minute
  * re-run. Semantics: a query appears in `failed` when AT LEAST ONE
  * rep threw (the message is the first failure's); if only a later
  * rep failed, the surviving warm reps still report a (valid) min, so
  * a query can carry both a failed entry and a plausible time — the
  * -1 raw entries say which reps died. A query whose reported value
  * is -1 had no surviving warm rep and contributes nothing to the
  * suite total (in count mode too: -1 sentinels are filtered from the
  * legacy sum as well).
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

  /** Warm-rep max/min ratio above which a query earns one extra
    * end-of-suite rep (see the contention sanity gate below). */
  val SpreadGate = 3.0

  /** JSON string escape (Verify's rules): backslash, quote, and ALL
    * control chars — exception messages routinely carry newlines. */
  private[graft] def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Run every query `reps` times against `sfDir` and render the
    * one-line JSON artifact. Factored out of main so the failure path
    * is spec-gated (ContractSpec) instead of trusted — r9/r10 both
    * shipped artifact bugs in exactly this code. */
  private[graft] def benchLine(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      reps: Int, countMode: Boolean): String = {
    // A rep that throws must not masquerade as a (fast) timing — r9
    // benched five analysis-broken queries as the wall time of their
    // exception. Track the FIRST failure message per query; failures
    // surface in the artifact's "failed" map and as -1 raw entries.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def time(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try { body; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        if (!failed.contains(name)) failed(name) = msg
        System.err.println(s"[bench] $name FAILED: $msg")
        -1.0
      }
    }
    def noopWrite(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val names = queries.keys.toSeq.sorted
    val countTimes = if (countMode) names.map { name =>
      name -> time(name)(queries(name)(spark, sfDir).count())
    } else Nil
    // rep 1 = cold (plan codegen + JIT), discarded; reported value =
    // min of the warm reps. Raw times for ALL reps go in the artifact.
    // A query whose first rep throws is not re-run (same exception 3×
    // would just triple the noise); its raw entry is [-1].
    val rawTimes0: Seq[(String, Seq[Double])] = names.map { name =>
      val first = time(name)(noopWrite(queries(name)(spark, sfDir)))
      val rest = if (first < 0) Nil else Seq.fill(reps - 1)(
        time(name)(noopWrite(queries(name)(spark, sfDir))))
      name -> (first +: rest)
    }
    // Contention sanity gate (r11, the r8-r10 carried ask): a loaded
    // box shows up as wild warm-rep spread (r10's committed d11 triple
    // was [8.9, 25.6, 55.5] for a true 2.1 s query). Any query whose
    // warm max/min exceeds SpreadGate gets ONE more rep at the END of
    // the suite — by then whatever contended has usually passed, and
    // min-of-warm picks the clean number. The extra rep is visible in
    // the raw array (length reps+1), so the artifact still shows the
    // pollution instead of hiding it.
    val rawTimes: Seq[(String, Seq[Double])] = rawTimes0.map { case (name, ts) =>
      val warm = (if (ts.size > 1) ts.drop(1) else ts).filter(_ >= 0)
      val spread = warm.nonEmpty && warm.min > 0 && warm.max / warm.min > SpreadGate
      if (spread) {
        System.err.println(f"[bench] $name warm spread ${warm.max / warm.min}%.1f× — one clean-up rep")
        name -> (ts :+ time(name)(noopWrite(queries(name)(spark, sfDir))))
      } else name -> ts
    }
    // GRAFT_BENCH_REPS=1 must not crash: with a single rep there is no
    // cold rep to discard, so the lone time IS the reported time.
    // Failed queries (raw [-1]) report -1 — visibly broken, and they
    // do NOT contribute to the suite total.
    val matTimes = rawTimes.map { case (n, ts) =>
      val warm = (if (ts.size > 1) ts.drop(1) else ts).filter(_ >= 0)
      n -> (if (warm.isEmpty) -1.0 else warm.min)
    }

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(ts: Seq[(String, Double)]): String =
      ts.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    def jraw(ts: Seq[(String, Seq[Double])]): String =
      ts.map { case (k, vs) =>
        s"\"" + k + "\":" + vs.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val total = matTimes.map(_._2).filter(_ >= 0).sum
    // -1 sentinels must not bias the legacy sum downward either
    val legacy = if (countMode)
      s""""value_count":${r3(countTimes.map(_._2).filter(_ >= 0).sum)},""" +
        s""""queries_count":${jmap(countTimes)},"""
    else ""
    val failedJson = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => jq(k) + ":" + jq(v) }.mkString("{", ",", "}")
    // Fixpoint step counts (r11 verdict #2): each iterative graph
    // operator records the relaxation steps its DATA needed (g5 took
    // 43 at sf0.1 vs 24 at sf0.01 — the class of silent cost growth
    // wall time alone can't attribute). Emitting them per artifact
    // makes a data regen that doubles an iteration's step count
    // visible as a diff, not a mystery slowdown.
    val stepsJson = {
      import scala.jdk.CollectionConverters._
      graft.operators.Graph.FixpointSteps.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    }
    s"""{"metric":"total","unit":"sec","sf":"$sfDir",""" +
      s""""materialized":true,"runs":$reps,"protocol":"drop-first-min-rest",""" +
      s""""raw":${jraw(rawTimes)},$legacy"fixpoint_steps":$stepsJson,""" +
      s""""failed":$failedJson,""" +
      s""""value":${r3(total)},"queries":${jmap(matTimes)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val countMode = sys.env.get("GRAFT_BENCH_COUNTMODE").contains("1")
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: trigger file listing, codegen, and JIT once so the
    // first timed query doesn't pay session start-up costs.
    try SparkEntry.queries.get("q1_pricing_summary")
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }

    val line = benchLine(spark, sfDir, SparkEntry.queries, reps, countMode)
    println(line)
    // The driver's artifact is a BOUNDED TAIL of stdout: the r6
    // BENCH_r6.json lost its "raw" arrays and the first 11 per-query
    // entries to front-truncation. Persist the FULL line to a repo
    // file per round so the committed evidence never depends on the
    // capture window. Round = max existing BENCH_r<k>.json + 1 (the
    // driver writes its file after this main runs).
    try {
      val cwd = java.nio.file.Paths.get(".")
      val pat = java.util.regex.Pattern.compile("BENCH_r0*([0-9]+)\\.json")
      val it = java.nio.file.Files.list(cwd).iterator()
      var maxR = 0
      while (it.hasNext) {
        val m = pat.matcher(it.next().getFileName.toString)
        if (m.matches()) maxR = math.max(maxR, m.group(1).toInt)
      }
      // Collision-safe: a late re-run (e.g. the driver's post-close pass
      // on a loaded box) must never clobber committed evidence. If the
      // round's artifact already exists, write a timestamp-suffixed
      // sibling instead and leave the original untouched.
      val target0 = cwd.resolve(s"BENCH_LOCAL_r${maxR + 1}.json")
      val target =
        if (java.nio.file.Files.exists(target0))
          cwd.resolve(s"BENCH_LOCAL_r${maxR + 1}_${System.currentTimeMillis()}.json")
        else target0
      java.nio.file.Files.write(target, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // bench must still report on a read-only cwd
    spark.stop()
  }
}
