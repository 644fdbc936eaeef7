package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handles most
  * cases at runtime (enabled in the session builders); explicit
  * salting is the deterministic fallback for pathological keys — e.g.
  * a handful of "samples" holding a large share of all fact rows.
  *
  * `saltedJoin` fans the small side out `saltFactor`× and scatters the
  * big side's hot keys across `saltFactor` shuffle partitions, turning
  * one straggler partition into `saltFactor` even ones. Equi-join
  * semantics are preserved exactly (inner joins).
  *
  * 100 TB contract: one shuffle on the salted key (the join's own),
  * small-side replication bounded by saltFactor × |small|, and the
  * worst per-task share of a hot key drops by saltFactor — the
  * straggler tail, not total work, is what changes.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(col(bigKey), monotonically_increasing_id()), lit(saltFactor)))
    val fanned = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(fanned,
        salted(bigKey) === fanned(smallKey) && salted("__salt") === fanned("__salt"))
      .drop("__salt")
  }
}
