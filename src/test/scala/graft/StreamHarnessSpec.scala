package graft

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.DataFrame
import graft.streaming.{EventStream, StreamHarness}

/** The file-replay harness that upgrades streaming ops to oracle-grade
  * correctness rows: staged batches must replay as ONE micro-batch each,
  * in staging order — the property every stream_* query's determinism
  * rests on.
  */
class StreamHarnessSpec extends SparkSpec {
  import spark.implicits._

  test("staged batches replay as one micro-batch each, in staging order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val batches = Seq(Seq(1, 2), Seq(3), Seq(4, 5, 6)).map(_.toDF("v"))
    val schema = StreamHarness.stage(batches, s"$dir/in")
    assert(schema.fieldNames.toSeq === Seq("v"))
    val seen = ArrayBuffer.empty[(Long, Seq[Int])]
    StreamHarness.runQuery(spark, s"$dir/in", schema) { src =>
      src.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
        seen.synchronized {
          seen += id -> b.select("v").as[Int].collect().sorted.toSeq
        }
        ()
      }.start()
    }
    assert(seen.sortBy(_._1).map(_._2).toSeq === Seq(Seq(1, 2), Seq(3), Seq(4, 5, 6)))
  }

  test("an empty batch replays as an empty micro-batch without shifting later contents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_e").toString
    val empty = Seq.empty[Int].toDF("v")
    val schema = StreamHarness.stage(Seq(Seq(1).toDF("v"), empty, Seq(2).toDF("v")), s"$dir/in")
    val seen = ArrayBuffer.empty[(Long, Seq[Int])]
    StreamHarness.runQuery(spark, s"$dir/in", schema) { src =>
      src.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
        seen.synchronized { seen += id -> b.select("v").as[Int].collect().toSeq }
        ()
      }.start()
    }
    assert(seen.sortBy(_._1).map(_._2).toSeq === Seq(Seq(1), Seq(), Seq(2)))
  }

  test("tsMicros/microsTs round-trip preserves microsecond precision") {
    val t = Timestamp.valueOf("2024-03-05 11:22:33")
    t.setNanos(123456000) // 123456 µs — the precision the events feed carries
    val us = EventStream.tsMicros(t)
    assert(us % 1000000L === 123456L)
    val back = EventStream.microsTs(us)
    assert(back === t && back.getNanos === 123456000)
  }
}
