package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every probe row, the latest reference row
  * with `ts` at or before the probe's `ts`, per key.
  *
  * Implementation is the windowed-union form: tag both inputs, union by
  * name, and carry the last non-null reference payload forward with
  * `last(..., ignoreNulls).over(rows unbounded preceding)`. ONE shuffle
  * on the key — never the naive `probe JOIN ref ON key AND ref.ts <=
  * probe.ts` whose candidate set is quadratic per key (at 100 TB, a
  * hot key would explode). Reference rows sort before probe rows at
  * identical timestamps (`_side` 0 < 1), giving at-or-before semantics.
  */
object AsOfJoin {

  /** @param probe rows to annotate (keeps ALL its columns)
    * @param ref reference rows; `payloadCols` are carried to the match
    * @param keyCols equi-join key
    * @param tsCol event-time column name (present in both)
    * @param tieCol a per-row unique column making the order total within
    *        (key, ts, side) — e.g. an event id (used from both sides)
    * @return probe rows + `asof_<payload>` columns (null when no
    *         reference row precedes)
    */
  def backward(
      probe: DataFrame,
      ref: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val refPayload = struct(payloadCols.map(ref(_)): _*)
    val r = ref.select(
      (keyCols.map(ref(_)) :+ ref(tsCol) :+ ref(tieCol)) :+
        refPayload.as("_ref") :+ lit(0).as("_side"): _*)
    val p = probe
      .withColumn("_side", lit(1))
      .withColumn("_ref", lit(null).cast(r.schema("_ref").dataType))
    val unioned = p.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: Seq(col("_side"), col(tieCol)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_ref"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_ref")
    payloadCols.foldLeft(matched) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"_match.`$c`"))
    }.drop("_match")
  }
}
