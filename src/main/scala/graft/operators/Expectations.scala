package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-contract audit (the Great-Expectations shape): a
  * set of named violation predicates plus uniqueness contracts, all
  * evaluated in ONE aggregate pass, reported as an audit table the
  * pipeline gates on — the operational front door a 100 TB ingest needs
  * before any downstream op trusts the batch.
  *
  * Shape: every predicate check is a conditional count inside a single
  * partial-combining aggregate — adding a check adds a column to the
  * agg, not a pass over the data. Uniqueness contracts need exact
  * distinct counts; they ride the SAME aggregate as
  * `count_distinct(struct(keys))` columns (Spark plans multi-distinct
  * with one Expand — ×(1+|contracts|) map-side row fan-out, still one
  * scan, no self-join). The 1-row agg result is unpivoted driver-free
  * via stack into the |checks|-row report.
  *
  * A predicate must be null-safe: rows where the predicate evaluates
  * null are NOT violations (spell `isNull` explicitly when null itself
  * is the violation).
  *
  * Output: (check, n_rows, n_violations, violation_rate round6, pass).
  */
object Expectations {

  def audit(df: DataFrame, violations: Seq[(String, org.apache.spark.sql.Column)],
      uniqueContracts: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(violations.nonEmpty || uniqueContracts.nonEmpty,
      "at least one check required")
    val names = violations.map(_._1) ++ uniqueContracts.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate check names in ${names.mkString(",")}")
    val predCols = violations.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"_v_$name")
    }
    val uniqCols = uniqueContracts.map { case (name, keys) =>
      (count(lit(1)) - count_distinct(struct(keys.map(col): _*)))
        .as(s"_v_$name")
    }
    val agg = df.agg(count(lit(1)).as("_n"), (predCols ++ uniqCols): _*)
    val stackArgs = names
      .map(n => s"'$n', _v_$n")
      .mkString(", ")
    agg.select(col("_n"),
        expr(s"stack(${names.size}, $stackArgs) as (check, n_violations)"))
      .select(col("check"), col("_n").as("n_rows"), col("n_violations"),
        graft.llm.TextOps.round6(col("n_violations").cast("double")
          / col("_n").cast("double")).as("violation_rate"),
        (col("n_violations") === 0).as("pass"))
  }
}
