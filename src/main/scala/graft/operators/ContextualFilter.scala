package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's central abstraction re-expressed: a contextual
  * filter is an arbitrary AND/OR/NOT tree of typed predicates over
  * sample-context fields, built programmatically (bpaotu's query
  * builder UI produces exactly such trees) and compiled to a single
  * Catalyst predicate `Column`.
  *
  * Because the compiled filter is one declarative expression, Catalyst
  * still pushes the sargable leaves into the parquet scan and the
  * whole tree stays inside whole-stage codegen — the DSL costs nothing
  * at execution time.
  *
  * 100 TB contract: compilation is driver-side and O(tree); execution
  * adds zero shuffles and zero joins — the filter rides the scan with
  * its sargable leaves pushed to parquet (PlanSpec-gated), so cost
  * scales with the bytes the scan cannot skip, never with the tree.
  */
object ContextualFilter {

  sealed trait Pred
  final case class Cmp(field: String, op: String, value: Any) extends Pred
  final case class In(field: String, values: Seq[Any]) extends Pred
  final case class Between(field: String, lo: Any, hi: Any) extends Pred
  final case class IsNull(field: String) extends Pred
  final case class ContainsText(field: String, needle: String) extends Pred
  final case class And(ps: Seq[Pred]) extends Pred
  final case class Or(ps: Seq[Pred]) extends Pred
  final case class Not(p: Pred) extends Pred

  def compile(p: Pred): Column = p match {
    case Cmp(f, "=", v) => col(f) === lit(v)
    case Cmp(f, "!=", v) => col(f) =!= lit(v)
    case Cmp(f, "<", v) => col(f) < lit(v)
    case Cmp(f, "<=", v) => col(f) <= lit(v)
    case Cmp(f, ">", v) => col(f) > lit(v)
    case Cmp(f, ">=", v) => col(f) >= lit(v)
    case Cmp(_, op, _) => throw new IllegalArgumentException(s"unknown op $op")
    case In(f, vs) => col(f).isInCollection(vs)
    case Between(f, lo, hi) => col(f).between(lit(lo), lit(hi))
    case IsNull(f) => col(f).isNull
    case ContainsText(f, n) => col(f).contains(n)
    case And(ps) => ps.map(compile).reduce(_ && _)
    case Or(ps) => ps.map(compile).reduce(_ || _)
    case Not(q) => !compile(q)
  }

  def apply(df: DataFrame, p: Pred): DataFrame = df.filter(compile(p))

  /** q25: a representative bpaotu-style contextual search — an OR of
    * two AND-branches with range/in/contains leaves over the order
    * "sample context", aggregated per segment. */
  def q25FilterDsl(spark: SparkSession, dir: String): DataFrame = {
    val tree = Or(Seq(
      And(Seq(
        Cmp("o_orderstatus", "=", "F"),
        Between("o_totalprice", 100000.0, 400000.0),
        In("o_orderpriority", Seq("1-URGENT", "2-HIGH")))),
      And(Seq(
        ContainsText("c_name", "00"),
        Cmp("o_totalprice", ">", 450000.0),
        Not(Cmp("c_mktsegment", "=", "MACHINERY"))))))
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.dim(spark, dir, "customer")
    apply(o.join(c, col("o_custkey") === col("c_custkey")), tree)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.Dec.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("c_mktsegment")
  }
}
