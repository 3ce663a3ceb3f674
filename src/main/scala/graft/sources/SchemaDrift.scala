package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-drift audit between two parquet snapshots — the contract
  * check a 100 TB ingest runs BEFORE a batch lands: which columns
  * appeared, vanished, or changed type since the last version, so
  * downstream schema-on-read consumers (k4's union-by-name evolution)
  * fail loudly at the audit instead of silently nulling a renamed
  * column.
  *
  * This is deliberately driver-side metadata work: parquet footers are
  * read for SCHEMA only (zero data rows scanned — the read is lazy and
  * never acted on), and the comparison table is |columns|-sized, the
  * same class of legitimate driver scalar as PageRank's node count.
  * Type identity uses Spark's canonical `simpleString` names on both
  * snapshots, so the audit is engine-internal and the REPORT (column,
  * status) is the cross-engine surface.
  *
  * Output: (column, status ∈ added|removed|type_changed|unchanged),
  * sorted by column.
  */
object SchemaDrift {

  def drift(spark: SparkSession, oldPath: String,
      newPath: String): DataFrame = {
    import spark.implicits._
    val om = spark.read.parquet(oldPath).schema.fields
      .map(f => f.name -> f.dataType.simpleString).toMap
    val nm = spark.read.parquet(newPath).schema.fields
      .map(f => f.name -> f.dataType.simpleString).toMap
    (om.keySet ++ nm.keySet).toSeq.sorted.map { c =>
      val status = (om.get(c), nm.get(c)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _ => "unchanged"
      }
      (c, status)
    }.toDF("column", "status")
  }
}
