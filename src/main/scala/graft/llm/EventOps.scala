package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (ts, user_id,
  * event_type, value, props): tumbling/sliding event-time windows,
  * gap-based sessionization, and JSON property extraction.
  *
  * Batch-first, streaming-ready: the windowed aggregations use
  * `functions.window(ts, ...)` — the exact same expression works under
  * Structured Streaming (`readStream` → this groupBy → `writeStream`)
  * once `.withWatermark("ts", ...)` is added; sessionization's
  * lag-and-running-sum form maps to
  * `KeyValueGroupedDataset.flatMapGroupsWithState` in a stream.
  *
  * Scale: each aggregation is one hash exchange on (window, key) —
  * partial aggregation runs map-side, so 100 TB of events reduce to
  * |windows|×|keys| rows before the shuffle. Sessionization shuffles once
  * on user_id; per-user event counts are bounded in practice (and a
  * skewed power-user key can be salted by day first).
  */
object EventOps {

  /** Cross-engine-exact money sum: quantize to integer cents, sum longs,
    * un-quantize.
    */
  def centsSum(c: Column): Column =
    sum(floor(c * 100 + 0.5).cast("long")) / 100.0

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Tumbling event-time windows per event_type: count + exact value sum.
    * Window bounds leave as formatted strings (timestamps don't cross the
    * oracle boundary raw).
    */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), centsSum(col("value")).as("value_sum"))
      .select(fmtTs(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Sliding event-time windows (each event lands in width/slide
    * windows).
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), centsSum(col("value")).as("value_sum"))
      .select(fmtTs(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Gap-based sessionization: a new session starts when the user's gap
    * since the previous event exceeds `gapMinutes`. Timestamp comparison
    * (prev + interval < ts) keeps microsecond precision — no lossy
    * epoch-second casts. Returns one row per session.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(col("ts"), 1).over(byUser)
    val newSession =
      when(prev.isNull || col("ts") > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1)
        .otherwise(0)
    events
      .withColumn("_new", newSession)
      .withColumn("session_idx",
        sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        fmtTs(min(col("ts"))).as("session_start"),
        fmtTs(max(col("ts"))).as("session_end"),
        centsSum(col("value")).as("value_sum"))
  }

  /** Extract an integer property from the JSON `props` column
    * (codegen'd `get_json_object`, no UDF).
    */
  def jsonIntProp(props: Column, field: String): Column =
    get_json_object(props, s"$$.$field").cast("int")
}
