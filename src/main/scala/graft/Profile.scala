package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: `runMain graft.Profile q1 d3 ...` times the
  * named queries (default: all) with REPS repetitions each (default 3,
  * env GRAFT_PROFILE_REPS) against SPARK_GRAFT_SF_DIR, reporting
  * first/min/max wall seconds under noop materialization. The min
  * strips JIT/codegen warm-up; first-vs-min shows how much of a bench
  * number is one-time cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-24s first=${ts.head}%6.2f min=${ts.min}%6.2f max=${ts.max}%6.2f")
    }
    spark.stop()
  }
}
