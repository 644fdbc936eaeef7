package graft

import graft.operators.ContextualFilter
import graft.operators.ContextualFilter._
import org.apache.spark.sql.functions._

class ContextualFilterSpec extends SparkSpec {

  private lazy val customer = Tables.load(spark, sfDir, "customer")

  test("leaf predicates compile to the expected filters") {
    assert(ContextualFilter(customer, Cmp("c_mktsegment", "=", "BUILDING")).count() ==
      customer.filter(col("c_mktsegment") === "BUILDING").count())
    assert(ContextualFilter(customer, In("c_nationkey", Seq(1, 2, 3))).count() ==
      customer.filter(col("c_nationkey").isin(1, 2, 3)).count())
    assert(ContextualFilter(customer, Between("c_acctbal", 0.0, 1000.0)).count() ==
      customer.filter(col("c_acctbal").between(0.0, 1000.0)).count())
    assert(ContextualFilter(customer, IsNull("c_name")).count() == 0)
  }

  test("and/or/not trees obey boolean algebra") {
    val a = Cmp("c_mktsegment", "=", "BUILDING")
    val b = Cmp("c_acctbal", ">", 5000.0)
    val lhs = ContextualFilter(customer, Not(Or(Seq(a, b)))).count()
    val rhs = ContextualFilter(customer, And(Seq(Not(a), Not(b)))).count()
    assert(lhs == rhs, "De Morgan violated")
    val total = customer.count()
    val orCount = ContextualFilter(customer, Or(Seq(a, b))).count()
    assert(orCount + lhs == total)
  }

  test("sargable leaves of a tree still push to the scan") {
    val df = ContextualFilter(customer,
      And(Seq(Cmp("c_acctbal", ">", 1000.0), Cmp("c_mktsegment", "=", "BUILDING"))))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThan(c_acctbal,1000.0)"), s"not pushed:\n${plan.take(1200)}")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), "equality not pushed")
  }

  test("unknown operator is rejected at compile time") {
    intercept[IllegalArgumentException] {
      ContextualFilter.compile(Cmp("c_name", "~=", "x"))
    }
  }
}
