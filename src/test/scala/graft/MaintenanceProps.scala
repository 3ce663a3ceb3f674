package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.{Compaction, IncrementalAgg, Triangles, ZOrder}

/** Property-based checks for the table-maintenance and layout operators.
  * Few iterations — each case runs Spark jobs.
  */
object MaintenanceProps extends Properties("MaintenanceOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4)

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  property("compaction bins partition the listing into contiguous ranges within the count bound") =
    forAll(
      Gen.listOfN(40, Gen.choose(1L, 3000L)),
      Gen.choose(500L, 5000L)) { (sizes, target) =>
      val files = sizes.zipWithIndex.map { case (b, i) => ("g", i.toLong, b) }
        .toDF("g", "f", "b")
      val plan = Compaction.compactionPlan(files, "g", "f", "b", target)
        .orderBy("out_file").collect()
      val total = sizes.sum
      val contiguous = plan.sliding(2).forall {
        case Array(x, y) => y.getLong(4) == x.getLong(5) + 1
        case _ => true
      }
      plan.map(_.getLong(3)).sum == total &&
        plan.map(_.getLong(2)).sum == sizes.length.toLong &&
        plan.length <= ((total + target - 1) / target).toInt &&
        contiguous
    }

  property("incremental state merge equals full recompute under any split") =
    forAll(Gen.listOfN(60, Gen.choose(0, 2))) { assign =>
      val rows = assign.zipWithIndex
        .map { case (part, i) => (i.toLong, s"k${i % 4}", (10 + i * 3).toLong, part) }
      val df = rows.toDF("id", "key", "sz", "part")
      val full = IncrementalAgg.state(df, "key", "id", "sz")
        .orderBy("key").collect().toSeq
      val merged = IncrementalAgg.mergeStates((0 to 2).map(p =>
        IncrementalAgg.state(df.filter(col("part") === p), "key", "id", "sz")))
        .orderBy("key").collect().toSeq
      merged == full
    }

  property("zValue round-trips: de-interleaving recovers (x, y) exactly") =
    forAll(Gen.listOfN(24, Gen.zip(Gen.choose(0, 63), Gen.choose(0, 63)))) { pts =>
      val got = pts.toDF("x", "y")
        .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 6).as("z"))
        .as[(Int, Int, Long)].collect()
      got.forall { case (x, y, z) =>
        val xr = (0 until 6).map(i => (((z >> (2 * i)) & 1) << i).toInt).sum
        val yr = (0 until 6).map(i => (((z >> (2 * i + 1)) & 1) << i).toInt).sum
        xr == x && yr == y
      }
    }

  property("triangle count matches brute force on random graphs") =
    forAll(Gen.listOfN(40, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))) { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val brute = (for {
        a <- 0L to 14L; b <- a + 1 to 14L; c <- b + 1 to 14L
        if es((a, b)) && es((b, c)) && es((a, c))
      } yield (a, b, c)).toSet
      val got =
        if (edges.isEmpty) Set.empty[(Long, Long, Long)]
        else Triangles.triangleList(edges.toDF("s", "d"), "s", "d")
          .as[(Long, Long, Long)].collect().toSet
      got == brute
    }
}
