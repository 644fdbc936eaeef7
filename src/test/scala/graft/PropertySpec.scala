package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant checks over seeded random data — the properties the
  * 100 TB design leans on. */
class PropertySpec extends SparkSpec {

  private def randomFacts(seed: Long, n: Int) = {
    val rng = new scala.util.Random(seed)
    import spark.implicits._
    (1 to n).map { i =>
      (s"g${rng.nextInt(7)}", i.toLong, math.round(rng.nextDouble() * 10000) / 100.0)
    }.toDF("grp", "id", "amount")
  }

  test("decimal sums are identical at any parallelism") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val df = randomFacts(seed, 5000)
      def total(parts: Int): Map[String, Double] =
        df.repartition(parts).groupBy("grp")
          .agg(Dec.dsum(col("amount")).as("s"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(total(1) == total(13),
        s"seed $seed: decimal sum changed with partitioning")
    }
  }

  test("TopK operator matches window row_number on random data with ties") {
    for (seed <- Seq(7L, 8L)) {
      // coarse rounding forces plenty of exact ties; id breaks them
      val df = randomFacts(seed, 2000)
        .withColumn("amount", round(col("amount"), -2))
      val native = TopK.perGroup(df, Seq("grp"), Seq(("amount", false), ("id", true)), 5)
        .select("grp", "id", "amount", "rnk")
        .orderBy("grp", "rnk").collect().toSeq
      val w = Window.partitionBy("grp").orderBy(col("amount").desc, col("id"))
      val windowed = df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("grp", "id", "amount", "rnk")
        .orderBy("grp", "rnk").collect().toSeq
      assert(native == windowed, s"seed $seed: TopK diverged from window form")
    }
  }

  test("minhash candidate generation is symmetric and self-free") {
    val res = operators.Dedup.minhashLsh(spark, sfDir).collect()
    assert(res.map(_.getLong(0)).distinct.length == res.length, "dup doc rows")
    assert(res.forall(_.getLong(3) >= 0))
  }
}
