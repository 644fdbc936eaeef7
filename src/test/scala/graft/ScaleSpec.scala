package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-mechanism specs: salting preserves semantics; bucketed
  * co-located joins avoid the shuffle entirely. */
class ScaleSpec extends SparkSpec {

  test("salted join preserves inner-join semantics exactly") {
    val l = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val p = Tables.load(spark, sfDir, "part").select("p_partkey", "p_brand")
    val plain = l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(l, p, "l_partkey", "p_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(plain == salted, "salting changed join cardinalities")
  }

  test("bucketed tables join with no exchange on the join key") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains("graft"), s"unexpected warehouse dir $wh")
    val l = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("or_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("or_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles the fact side:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
