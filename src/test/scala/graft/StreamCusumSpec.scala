package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream

/** X297 streaming CUSUM: nothing emits until the baseline closes, the
  * buffered days then replay through the fold, state carries S± across
  * batches, and a late-appearing type backfills zero days — the
  * streamed rows equal the batch recursion throughout.
  */
class StreamCusumSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("baseline buffering, cross-batch fold, and late-type backfill") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("cusum-").toString
    val q = EventStream.cusumMonitor(events, s"$base/state", s"$base/out",
      baseDays = 7, kPermille = 50L, hPermille = 250L)
    def rows() =
      if (!new java.io.File(s"$base/out").exists()) Seq.empty
      else spark.read.parquet(s"$base/out")
        .select("event_type", "day", "y", "cusum_high_micro", "alarm_high")
        .as[(String, String, Long, Long, Boolean)].collect().toSeq
          .sortBy(r => (r._1, r._2))
    try {
      // batch 1: days 1-5 of type a -> inside the baseline, no emission
      input.addData((1 to 5).map(d => (ts(d), "a", 10.0)): _*)
      q.processAllAvailable()
      assert(rows().isEmpty)
      // batch 2: days 6-10 (drift to 13.00 from day 8) -> baseline
      // closes at day 7, all ten days emit in one replay
      input.addData((6 to 10).map(d =>
        (ts(d), "a", if (d >= 8) 13.0 else 10.0)): _*)
      q.processAllAvailable()
      val r2 = rows().filter(_._1 == "a")
      assert(r2.map(_._2) === (1 to 10).map(d => f"2024-01-$d%02d"))
      // mu0 = 1e9, k = 5e7: clean days pin S+ at 0; each 13.00 day
      // adds 2.5e8
      assert(r2.take(7).forall(_._4 === 0L))
      assert(r2(7)._4 === 250000000L && r2(9)._4 === 750000000L)
      // batch 3: day 11 continues the CARRIED fold (S+ = 1e9 > h
      // fires), and type b appears late -> zero-backfill from day 1
      input.addData((ts(11), "a", 13.0), (ts(11), "b", 5.0))
      q.processAllAvailable()
      val r3 = rows()
      val a11 = r3.find(r => r._1 == "a" && r._2 == "2024-01-11").get
      assert(a11._4 === 1000000000L && a11._5)
      val b = r3.filter(_._1 == "b")
      // b's baseline is seven zero days -> mu0 = 0, its day-11 value
      // accumulates directly; days 1-11 all emitted
      assert(b.map(_._2) === (1 to 11).map(d => f"2024-01-$d%02d"))
      assert(b.take(10).forall(_._3 === 0L))
      assert(b.last._3 === 500L && b.last._4 === 500000000L)
    } finally q.stop()
  }
}
