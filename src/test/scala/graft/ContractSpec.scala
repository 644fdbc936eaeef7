package graft

/** Guards the driver contract itself — the gap that broke r4 (a query
  * changed shape after the last gate run). Every entry in
  * SparkEntry.queries must execute end-to-end, and every query must
  * carry an oracle, so `sbt test` alone catches a broken or orphaned
  * entry before the driver's DuckDB gate ever runs. */
class ContractSpec extends SparkSpec {

  private val tinySf = "/root/testdata/sf0.001"

  test("every query has an oracle entry and vice versa") {
    // rows-only keys (no DuckDB replica exists, e.g. the HLL-sketch
    // e18) must be DECLARED in SparkEntry.rowsOnly — exact-set
    // equality here, so a key can neither silently lose its oracle
    // nor sit in the allowlist while carrying one
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val noQuery = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(noOracle == SparkEntry.rowsOnly,
      s"queries without oracle SQL: $noOracle " +
        s"(declared rows-only: ${SparkEntry.rowsOnly})")
    assert(noQuery.isEmpty, s"oracle SQL without a query: $noQuery")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, tinySf).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, s"queries failed:\n${failures.mkString("\n")}")
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a throwing query is LOUD in the verify artifacts, not absent") {
    // r9's regression shipped green because Verify silently dropped
    // queries that threw; the driver artifact then reported 119/119.
    // Gate the failure path: a broken query must surface in
    // _errors.json AND as a <name>_FAILED sentinel dir.
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val out = java.nio.file.Files.createTempDirectory("verify_loud").toString
    val errs = Verify.dump(spark, tinySf, out, Map(
      "ok_probe" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "region")),
      "broken_probe" -> ((_: SparkSession, _: String) =>
        throw new IllegalStateException("deliberate failure"))))
    assert(errs.keySet == Set("broken_probe"), s"errors: $errs")
    val ej = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/_errors.json")), "UTF-8")
    assert(ej.contains("broken_probe") && ej.contains("deliberate failure"),
      s"_errors.json not loud: $ej")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$out/broken_probe_FAILED")),
      "no _FAILED sentinel dir")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$out/ok_probe")),
      "healthy query's dump missing")
  }

  test("a throwing query's MESSAGE reaches the bench artifact") {
    // r10's g5 failure reached BENCH_LOCAL as just a name; the reason
    // went to stderr and the driver's bounded tail capture dropped it,
    // so diagnosing the failure cost a 7-minute re-run. Gate the
    // failure path: "failed" is a name→message map in the JSON line.
    import org.apache.spark.sql.SparkSession
    val line = Bench.benchLine(spark, tinySf, Map(
      "ok_probe" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "region")),
      "boom_probe" -> ((_: SparkSession, _: String) =>
        throw new IllegalStateException("deliberate bench \"failure\""))),
      reps = 1, countMode = false)
    assert(line.contains(
      """"failed":{"boom_probe":"deliberate bench \"failure\""}"""),
      s"failed map not loud: $line")
    assert(line.contains(""""boom_probe":[-1.000]"""),
      s"raw -1 sentinel missing: $line")
    assert(line.contains(""""ok_probe":["""), s"healthy raw missing: $line")
  }

  test("fixpoint step counts reach the bench artifact") {
    // r11 verdict #2: the cost of the iterative graph family is
    // step count × edge scale, and the step count is DERIVED FROM THE
    // DATA (g5 needed 43 steps at sf0.1 vs 24 at sf0.01). A data
    // regen that silently doubles it must be visible in the committed
    // artifact, not just as an unattributed wall-time jump.
    import org.apache.spark.sql.SparkSession
    graft.operators.Graph.FixpointSteps.clear()
    val line = Bench.benchLine(spark, tinySf, Map(
      "cc_probe" -> ((s: SparkSession, _: String) => {
        import s.implicits._
        graft.operators.Graph.g2ComponentsEdges(
          Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst"))
      })), reps = 1, countMode = false)
    val steps = graft.operators.Graph.FixpointSteps.getOrDefault("g2_edges", 0L)
    assert(steps > 0, s"no step count recorded: $steps")
    assert(line.contains(s""""fixpoint_steps":{"g2_edges":$steps}"""),
      s"steps map not in artifact: $line")
  }

  test("benchLine clears stale fixpoint step tags from earlier runs") {
    // FixpointSteps is process-global; r12's ADVICE: a bench artifact
    // in a JVM that ran other queries first carried their tags,
    // misattributing step counts across artifacts. benchLine must
    // clear the map itself, not trust callers to.
    import org.apache.spark.sql.SparkSession
    graft.operators.Graph.FixpointSteps.put("stale_tag_from_last_run", 99L)
    val line = Bench.benchLine(spark, tinySf, Map(
      "plain_probe" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "region"))), reps = 1, countMode = false)
    assert(!line.contains("stale_tag_from_last_run"),
      s"stale fixpoint tag leaked into artifact: $line")
    assert(line.contains(""""fixpoint_steps":{}"""),
      s"expected empty steps map for a non-iterative suite: $line")
  }

  test("the cross-run gate flags a >3x round-over-round jump as suspect") {
    // r12's committed close-out artifact reported q1 at 7.6 s from a
    // loaded box (clean same-day run: 0.86 s) — every warm rep was
    // polluted, so the within-run spread gate was blind. With a prior
    // reference, the slow query must (a) earn one extra end-of-suite
    // rep and (b) if still slow, land in the artifact's suspect map;
    // a query consistent with its prior must do neither.
    import org.apache.spark.sql.SparkSession
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val line = Bench.benchLine(spark, tinySf, Map(
      "slow_probe" -> ((s: SparkSession, d: String) => {
        calls.incrementAndGet(); Thread.sleep(900)
        Tables.load(s, d, "region")
      }),
      "ok_probe" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "region"))),
      reps = 1, countMode = false,
      prior = Map("slow_probe" -> 0.25, "ok_probe" -> 10.0))
    assert(calls.get() == 2,
      s"slow probe should run 1 rep + 1 cross-run rep, ran ${calls.get()}")
    val suspect = """"suspect":\{([^}]*)\}""".r
      .findFirstMatchIn(line).map(_.group(1)).getOrElse("MISSING")
    assert(suspect.contains("slow_probe") && !suspect.contains("ok_probe"),
      s"suspect map wrong: $line")
  }

  test("loadPriorQueries reads the newest round's per-key min") {
    // Two same-round artifacts (the timestamp-suffixed sibling a late
    // re-run writes): the clean reference is the per-key MIN; an older
    // round must be ignored entirely.
    val dir = java.nio.file.Files.createTempDirectory("bench_prior")
    def w(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    w("BENCH_LOCAL_r7.json", """{"queries":{"q1":9.0}}""")
    w("BENCH_LOCAL_r12.json", """{"raw":{"q1":[1.0]},"queries":{"q1":7.62,"g9":6.25}}""")
    w("BENCH_LOCAL_r12_123.json", """{"queries":{"q1":0.86,"extra":2.0}}""")
    val prior = Bench.loadPriorQueries(dir)
    assert(prior == Map("q1" -> 0.86, "g9" -> 6.25, "extra" -> 2.0),
      s"got $prior")
  }

  test("per-query shuffle bytes reach the bench artifact") {
    // r12 verdict #6: wall time on a shared box is noise; shuffle
    // bytes are a deterministic plan property. A shuffling query must
    // report nonzero [read, written]; a scan-only query must report
    // [0,0]; bytes must attribute to the query that shuffled, not
    // bleed into its neighbour.
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions.{col, count => cnt, lit}
    val line = Bench.benchLine(spark, tinySf, Map(
      "scan_probe" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "region")),
      "shuffle_probe" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "documents")
          .repartition(4, col("doc_id"))
          .groupBy("source").agg(cnt(lit(1)).as("n")))),
      reps = 2, countMode = false)
    val sb = """"shuffle_bytes":\{([^}]*)\}""".r
      .findFirstMatchIn(line).map(_.group(1)).getOrElse("MISSING")
    val scanB = """"scan_probe":\[([0-9-]+),([0-9-]+)\]""".r
      .findFirstMatchIn(sb)
    val shufB = """"shuffle_probe":\[([0-9-]+),([0-9-]+)\]""".r
      .findFirstMatchIn(sb)
    assert(scanB.isDefined && shufB.isDefined, s"shuffle_bytes map: $line")
    assert(scanB.get.group(1).toLong == 0L && scanB.get.group(2).toLong == 0L,
      s"scan-only query claims shuffle bytes: $sb")
    assert(shufB.get.group(1).toLong > 0L && shufB.get.group(2).toLong > 0L,
      s"shuffling query reports no shuffle bytes: $sb")
  }

  test("the bench spread gate earns a polluted query a clean-up rep") {
    // r10's committed artifact carried triples like [8.9, 25.6, 55.5]
    // for a 2.1 s query with no self-correction. Simulate contention
    // hitting exactly one warm rep; the gate must append one extra
    // end-of-suite rep (raw length reps+1) and min-of-warm must report
    // the clean number.
    import org.apache.spark.sql.SparkSession
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val line = Bench.benchLine(spark, tinySf, Map(
      "jitter_probe" -> ((s: SparkSession, d: String) => {
        if (calls.incrementAndGet() == 2) Thread.sleep(1500) // first warm rep
        Tables.load(s, d, "region")
      })), reps = 3, countMode = false)
    assert(calls.get() == 4, s"expected 3 reps + 1 clean-up, ran ${calls.get()}")
    val rawEntry = """"raw":\{"jitter_probe":\[([^\]]*)\]""".r
      .findFirstMatchIn(line).map(_.group(1))
    assert(rawEntry.exists(_.split(",").length == 4),
      s"raw array not lengthened by the clean-up rep: $line")
    val reported = """"queries":\{"jitter_probe":([0-9.]+)""".r
      .findFirstMatchIn(line).map(_.group(1).toDouble)
    assert(reported.exists(_ < 1.0),
      s"reported value did not pick the clean rep: $line")
  }

  test("every query has a SURVEY §2 coverage row") {
    // The §2 table is the judge's grading contract; it silently lost
    // the r4 bench tail once and q33's row in r5. A query key missing
    // from SURVEY.md now fails the suite instead of drifting.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(missing.isEmpty,
      s"queries with no SURVEY §2 row: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
