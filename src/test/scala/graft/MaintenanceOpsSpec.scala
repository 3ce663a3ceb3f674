package graft

import org.apache.spark.sql.functions._
import graft.operators.{Compaction, IncrementalAgg}

/** Table-maintenance operators: incremental aggregate-state merge and the
  * small-file compaction planner.
  */
class MaintenanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 300)
    .map(i => (i.toLong, s"src${i % 5}", (50 + i * 7 % 400).toLong))
    .toDF("id", "src", "sz")

  test("merged incremental state equals full recompute") {
    val full = IncrementalAgg.state(docs, "src", "id", "sz")
    val merged = IncrementalAgg.mergeStates(Seq(
      IncrementalAgg.state(docs.filter(col("id") % 3 === 0), "src", "id", "sz"),
      IncrementalAgg.state(docs.filter(col("id") % 3 === 1), "src", "id", "sz"),
      IncrementalAgg.state(docs.filter(col("id") % 3 === 2), "src", "id", "sz")))
    assert(merged.orderBy("key").collect().toSeq
      === full.orderBy("key").collect().toSeq)
  }

  test("state merge is associative: (a ⊎ b) ⊎ c == a ⊎ (b ⊎ c)") {
    val parts = (0 until 3).map(r =>
      IncrementalAgg.state(docs.filter(col("id") % 3 === r), "src", "id", "sz"))
    val left = IncrementalAgg.mergeStates(Seq(
      IncrementalAgg.mergeStates(parts.take(2)), parts(2)))
    val right = IncrementalAgg.mergeStates(Seq(
      parts.head, IncrementalAgg.mergeStates(parts.drop(1))))
    assert(left.orderBy("key").collect().toSeq
      === right.orderBy("key").collect().toSeq)
  }

  test("a key present only in the delta passes through the merge") {
    val base = IncrementalAgg.state(docs.filter(col("src") =!= "src4"), "src", "id", "sz")
    val delta = IncrementalAgg.state(docs.filter(col("src") === "src4"), "src", "id", "sz")
    val merged = IncrementalAgg.mergeStates(Seq(base, delta))
    assert(merged.filter(col("key") === "src4").count() === 1)
    assert(merged.count() === 5)
  }

  test("withDerived computes the mean from the monoid components") {
    val st = Seq(("a", 4L, 100L, 1L, 9L)).toDF("key", "n_rows", "sum_sz", "min_id", "max_id")
    val row = IncrementalAgg.withDerived(st).select("avg_sz").head()
    assert(row.getDouble(0) === 25.0)
  }

  test("compaction bins preserve file order and partition the listing") {
    val files = Seq(("s", 1L, 900L), ("s", 2L, 900L), ("s", 3L, 900L),
      ("s", 4L, 900L), ("s", 5L, 900L)).toDF("g", "f", "b")
    val plan = Compaction.compactionPlan(files, "g", "f", "b", targetBytes = 2000L)
      .orderBy("out_file").collect()
    // cum-before: 0,900,1800,2700,3600 → bins 0,0,0,1,1
    assert(plan.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((0L, 3L, 2700L), (1L, 2L, 1800L)))
    // every input lands in exactly one bin
    assert(plan.map(_.getLong(2)).sum === 5L)
    // bins cover contiguous file ranges
    assert(plan.map(r => (r.getLong(4), r.getLong(5))).toSeq === Seq((1L, 3L), (4L, 5L)))
  }

  test("planned output count is bounded by ceil(total/target)") {
    val files = (1 to 57).map(i => ("g", i.toLong, (100 + i * 13 % 500).toLong))
      .toDF("g", "f", "b")
    val total = files.agg(sum("b")).head().getLong(0)
    val plan = Compaction.compactionPlan(files, "g", "f", "b", targetBytes = 1500L)
      .orderBy("out_file").collect()
    assert(plan.length <= ((total + 1499) / 1500).toInt)
    // bins partition the byte total and cover disjoint contiguous ranges
    assert(plan.map(_.getLong(3)).sum === total)
    plan.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(4) === a.getLong(5) + 1)
    case _ => ()
    }
  }

  test("executed compaction layout reproduces the plan bin-for-bin") {
    val dir = "/root/testdata/sf0.001"
    val executed = graft.queries.RefSurface.queries("k6_compaction_exec")(spark, dir)
      .select(col("source"), col("out_file").cast("long"), col("n_inputs"),
        col("out_bytes"), col("first_file"), col("last_file"))
      .orderBy("source", "out_file").collect().toSeq
    val planned = Compaction.compactionPlan(
      graft.queries.Tables(spark, dir, "documents")
        .select(col("source"), col("doc_id").as("file_id"),
          col("n_chars").as("bytes")),
      "source", "file_id", "bytes", targetBytes = 16000L)
      .select(col("source"), col("out_file"), col("n_inputs"),
        col("out_bytes"), col("first_file"), col("last_file"))
      .orderBy("source", "out_file").collect().toSeq
    assert(executed === planned)
  }

  test("an oversized single file gets its own bin and later bins stay aligned") {
    val files = Seq(("g", 1L, 10000L), ("g", 2L, 100L), ("g", 3L, 100L))
      .toDF("g", "f", "b")
    val plan = Compaction.compactionPlan(files, "g", "f", "b", targetBytes = 2000L)
      .orderBy("out_file").collect()
    assert(plan.head.getLong(2) === 1L) // the whale compacts alone
    assert(plan.head.getLong(3) === 10000L)
  }

  test("sorted export: files are range-disjoint AND each file is internally sorted") {
    // The k9 audit pins disjointness cross-engine; this pins the half
    // the audit cannot witness — physical row order INSIDE each file —
    // by reading every file individually (one task, parquet row order).
    val out = "/tmp/graft_k9_unit"
    spark.range(0, 2000).select((col("id") * 7919 % 2000).as("k"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length === 4)
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f).select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"file $f not internally sorted")
      (ks.head, ks.last)
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, "file key ranges overlap")
    }
  }
}
