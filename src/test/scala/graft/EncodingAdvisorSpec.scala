package graft

import graft.operators.EncodingAdvisor
import org.apache.spark.sql.functions._

/** The Σ ndv_k − boundary-merges decomposition must equal the run count
  * of the ACTUALLY sorted table — verified against a brute-force sort.
  */
class EncodingAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private def bruteRuns(sorted: Seq[Any]): Long =
    if (sorted.isEmpty) 0L
    else 1L + sorted.sliding(2).count { case Seq(a, b) => a != b; case _ => false }

  test("decomposition equals brute-force runs of the sorted table, incl. a boundary merge") {
    // key k=1 holds c∈{5,9}, k=2 starts at c=9 → ONE boundary merge:
    // sorted (k,c) → c = 5,9,9,9,12 → 3 runs (not Σndv = 2+2 = 4)
    val df = Seq((1, 5), (1, 9), (2, 9), (2, 12)).toDF("k", "c")
    val out = EncodingAdvisor.rleAdvisor(df,
      keys = Seq("k" -> col("k")), targets = Seq("c" -> col("c")))
      .collect().head
    assert(out.getLong(4) === 3L)
    val sortedC = df.orderBy("k", "c").select("c").collect().map(_.getInt(0)).toSeq
    assert(out.getLong(4) === bruteRuns(sortedC))
    assert(out.getLong(2) === 4L && out.getLong(3) === 3L) // n, ndv
  }

  test("randomized tables: decomposition matches brute force for every key/target") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(_ => (rnd.nextInt(5), rnd.nextInt(7), rnd.nextInt(3)))
    val df = rows.toDF("k1", "k2", "c")
    val out = EncodingAdvisor.rleAdvisor(df,
      keys = Seq("k1" -> col("k1"), "k2" -> col("k2")),
      targets = Seq("c" -> col("c"), "k2" -> col("k2")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    for (k <- Seq("k1", "k2"); c <- Seq("c", "k2")) {
      val sorted = df.orderBy(k, c).select(c).collect().map(_.getInt(0)).toSeq
      assert(out((k, c)) === bruteRuns(sorted), s"pair ($k, $c)")
    }
  }
}
