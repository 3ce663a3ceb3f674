package graft

import org.apache.spark.sql.functions._

/** Hand-checked semantics for the audit batch: chi-square contingency
  * cells, join-key skew profile, functional-dependency violations.
  */
class QualityAuditSpec extends SparkSpec {

  import spark.implicits._

  test("chi-square cells on a hand-computed 2x2 (with a zero cell)") {
    // lang en: s1 x3, s2 x1 ; lang fr: s1 x0 (ZERO cell), s2 x4
    val d = (Seq.fill(3)(("en", "s1")) ++ Seq(("en", "s2")) ++
      Seq.fill(4)(("fr", "s2"))).toDF("lang", "source")
    d.createOrReplaceTempView("_chi_docs")
    val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("n_xy"))
    val rowm = d.groupBy("lang").agg(count(lit(1)).as("n_x"))
    val colm = d.groupBy("source").agg(count(lit(1)).as("n_y"))
    val tot = d.agg(count(lit(1)).as("n"))
    val e = col("n_x").cast("double") * col("n_y") / col("n")
    val dev = col("n_xy").cast("double") - e
    val got = rowm.crossJoin(colm).crossJoin(tot)
      .join(cells, Seq("lang", "source"), "left")
      .withColumn("n_xy", coalesce(col("n_xy"), lit(0L)))
      .select(col("lang"), col("source"), col("n_xy"),
        graft.llm.TextOps.round6(e).as("expected"),
        graft.llm.TextOps.round6(dev * dev / e).as("contribution"))
      .orderBy("lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // n=8, row en=4 fr=4, col s1=3 s2=5
    // e(en,s1)=4*3/8=1.5  contrib=(3-1.5)^2/1.5=1.5
    // e(en,s2)=4*5/8=2.5  contrib=(1-2.5)^2/2.5=0.9
    // e(fr,s1)=1.5        contrib=(0-1.5)^2/1.5=1.5   <- zero cell present
    // e(fr,s2)=2.5        contrib=(4-2.5)^2/2.5=0.9
    assert(got.toSeq === Seq(
      ("en", "s1", 3L, 1.5, 1.5), ("en", "s2", 1L, 2.5, 0.9),
      ("fr", "s1", 0L, 1.5, 1.5), ("fr", "s2", 4L, 2.5, 0.9)))
  }

  test("skew profile flags a planted hot key") {
    val q = graft.queries.RefSurface.queries("p_skew_profile")(
      spark, "/root/testdata/sf0.001")
    val r = q.collect().head
    val nRows = r.getLong(0); val nKeys = r.getLong(1)
    val maxC = r.getLong(2); val maxOverMean = r.getDouble(7)
    assert(nRows > nKeys && maxC >= 1L)
    // max/mean consistency: recompute from the same row
    val expect = math.floor(maxC.toDouble * nKeys / nRows * 1e6 + 0.5) / 1e6
    assert(maxOverMean === expect)
  }

  test("benford digits: first significant digit from integer cents") {
    // cents values: 1, 19, 205, 999 -> digits 1, 1, 2, 9
    val cents = Seq(1L, 19L, 205L, 999L).toDF("c")
    val got = cents
      .select(substring(col("c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .orderBy("digit")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === Seq((1, 2L), (2, 1L), (9, 1L)))
  }

  test("IQR fences: hand-computed quartiles flag the planted outlier") {
    // group A cents: 100..109 plus outlier 10000
    val df = (Seq.tabulate(10)(i => ("A", (100 + i) / 100.0)) :+
      (("A", 100.0)))
      .toDF("l_returnflag", "l_extendedprice")
    df.createOrReplaceTempView("_iqr_in")
    val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
    val li = df.select(col("l_returnflag"), cents.as("c"))
    val fences = li.groupBy("l_returnflag").agg(
      expr("percentile(c, 0.25)").as("q1"),
      expr("percentile(c, 0.75)").as("q3"))
      .select(col("l_returnflag"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    val out = li.join(fences, "l_returnflag")
      .agg(sum(when(col("c") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        sum(when(col("c") < col("lo"), 1L).otherwise(0L)).as("n_low"))
      .collect().head
    assert(out.getLong(0) === 1L && out.getLong(1) === 0L)
  }

  test("quarantine routes bad number, bad date, and wrong arity rows") {
    val rows = graft.queries.RefSurface.queries("s2_quarantine")(
      spark, "/root/testdata/sf0.001")
      .collect()
    val good = rows.filter(_.getString(0) == "good")
    val quar = rows.filter(_.getString(0) == "quarantine")
    assert(good.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 5))
    assert(quar.map(_.getString(4)).sorted.toSeq === Seq(
      "3,notanumber,2024-01-03", "4,40.00,not-a-date",
      "garbage unparseable line"))
  }

  test("FD audit reports only violating LHS values with correct mass") {
    val df = Seq(
      ("ring", "B1"), ("ring", "B1"),          // clean
      ("bolt", "B1"), ("bolt", "B2"), ("bolt", "B2"),  // violated
      ("gear", "B3"))                           // clean
      .toDF("p_name", "p_brand")
    val got = df.groupBy("p_name")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("p_brand").as("n_brands"),
        min("p_brand").as("brand_min"), max("p_brand").as("brand_max"))
      .filter(col("n_brands") > 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(got.toSeq === Seq(("bolt", 3L, 2L, "B1", "B2")))
  }
}
