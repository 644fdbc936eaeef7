package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator "top-k rows per group": the workhorse behind
  * "top taxa per environment" / "best neighbours per query" queries.
  *
  * Why a custom operator instead of `row_number().over(...) <= k`:
  * the window form materializes and SORTS every group in full before
  * discarding all but k rows. This operator keeps a bounded heap of k
  * rows per group, and plans as TWO stages — a partial pass that
  * prunes each input partition to ≤ k rows per group *before* the
  * shuffle (safe: a row outside a partition's local top-k cannot be in
  * the global top-k under a total order), then a final pass after
  * hash-partitioning on the group keys. At 100 TB the shuffle carries
  * `partitions × groups × k` rows instead of the whole fact table.
  *
  * Registered via [[graft.GraftExtensions]] (injectPlannerStrategy);
  * built with [[TopK.perGroup]].
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(groupExprs, sortOrder, k, rankAttr, child) =>
      val partial = TopKPerGroupExec(groupExprs, sortOrder, k, None, planLater(child))
      TopKPerGroupExec(groupExprs, sortOrder, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Physical top-k-per-group. With `rankAttr = None` this is the
  * partial (map-side) stage: no distribution requirement, emits the
  * local survivors unranked. The final stage requires clustering on
  * the group keys (EnsureRequirements inserts the hash exchange) and
  * emits rows with a 1-based rank column. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr.toSeq
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsLocal = groupExprs
    val sortOrderLocal = sortOrder
    val childOutput = child.output
    val kLocal = k
    val emitRank = rankAttr.isDefined
    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = GenerateOrdering.generate(sortOrderLocal, childOutput)
      // head of each queue = worst retained row (reverse ordering)
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      if (!emitRank) {
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && groups.hasNext) cur = groups.next().iterator()
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      } else {
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val outProj = UnsafeProjection.create(
          (childOutput :+ rankAttr.get).map(_.dataType).toArray)
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!cur.hasNext && groups.hasNext) {
              val arr = new java.util.ArrayList[UnsafeRow](groups.next())
              arr.sort(new java.util.Comparator[UnsafeRow] {
                override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(a, b)
              })
              val rows = arr.iterator()
              var r = 0
              cur = new Iterator[InternalRow] {
                override def hasNext: Boolean = rows.hasNext
                override def next(): InternalRow = {
                  r += 1
                  rankRow.update(0, r)
                  outProj(joined(rows.next(), rankRow))
                }
              }
            }
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Builder API. */
object TopK {
  /** Top `k` rows per group of `df`, ordered by `orderCols`
    * ((name, ascending) — include a tiebreaker for determinism), with
    * a 1-based `rankName` column appended. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int,
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    graft.GraftFunctions.ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val sortOrder = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    val plan = TopKPerGroupPlan(groupCols.map(attr), sortOrder, k, rankAttr, analyzed)
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark, plan)
  }
}
