package graft.operators

import graft.{Dec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch equivalents of the streaming pipeline over `events` (the
  * streaming forms live in [[graft.streaming.StreamingOps]] and share
  * the same column logic — one definition, two execution modes).
  * Window starts are emitted as formatted strings so the DuckDB
  * oracle's type matches exactly.
  */
object Events {
  import Dec._

  /** Event-time tumbling 1-hour window aggregation per event type. */
  def eventWindows(spark: SparkSession, dir: String): DataFrame =
    eventWindows(Tables.load(spark, dir, "events"))

  def eventWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` payload and aggregate it — per-row JSON path evaluation
    * is a codegen'd projection (no UDF), so it scales as a scan. */
  def propsJson(spark: SparkSession, dir: String): DataFrame =
    propsJson(Tables.load(spark, dir, "events"))

  def propsJson(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Rolling window frame: 3-event moving average of `value` per user
    * in event-time order (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) —
    * the exact-decimal sum keeps the frame average engine-identical. */
  def rollingAvg(spark: SparkSession, dir: String): DataFrame =
    rollingAvg(Tables.load(spark, dir, "events"))

  def rollingAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, Window.currentRow)
    events
      .withColumn("rolling_avg",
        round(sum(dec(col("value"))).over(w).cast("double") /
          count(lit(1)).over(w), 6))
      .select("user_id", "event_id", "value", "rolling_avg")
      .orderBy("user_id", "event_id")
  }

  /** Batch form of the stream-stream interval join
    * ([[graft.streaming.StreamingOps.attributeConversions]]): attribute
    * each purchase to the same user's clicks in the preceding window.
    * One shuffle on user_id with a range predicate inside the join —
    * exactly the state layout the streaming form keeps per key. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame =
    intervalJoin(Tables.load(spark, dir, "events"), 30)

  def intervalJoin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"interval $windowMinutes minutes"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  /** Gap-based sessionization (30-min inactivity gap) via window
    * functions: flag session starts with lag(), number sessions with a
    * running sum, aggregate per session. Partitioned by user — at
    * scale one shuffle on user_id, each user's timeline processed
    * independently (the same state layout the streaming
    * flatMapGroupsWithState version keeps per key). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"))

  def sessionize(events: DataFrame): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        ((max(col("us")) - min(col("us"))).cast("double") / lit(1000000.0))
          .as("duration_s"))
      .orderBy("user_id", "session_id")
  }
}
