package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximations — the 100 TB substitutes for exact
  * distinct counts and sort-based quantiles. The built-in HLL++/t-digest
  * aggregates aren't bit-comparable across engines, so they're
  * bounds-tested here; `p_profile_approx`'s KMV/hash-sample sketches ARE
  * engine-independent (and hash-oracle-checked by the driver) — this spec
  * additionally pins their error vs the exact profile and the
  * one-scan/no-Expand plan shape.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) lands within its error bound") {
    val words = graft.queries.Tables(spark, dir, "documents")
      .select(explode(graft.llm.TextOps.words(col("text"))).as("w"))
    val (exact, approx) = words
      .agg(countDistinct("w"), approx_count_distinct("w", rsd = 0.02))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"HLL estimate $approx too far from exact $exact")

    // per-user event distincts: the grouped (mergeable, map-side) form
    val perUser = graft.queries.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("exact"),
        approx_count_distinct("event_type", rsd = 0.02).as("approx"))
      .filter(abs(col("approx") - col("exact")) > col("exact") * 0.2)
    assert(perUser.count() === 0)
  }

  test("p_profile_approx: sketch profile matches the exact profile within bounds, in ONE pass") {
    val approx = graft.queries.RefSurface.queries("p_profile_approx")(spark, dir)
    val exact = graft.queries.RefSurface.queries("p_profile")(spark, dir)

    // exact fields ride along unchanged: rows/nulls/min/max must be equal
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    assert(a.keySet === e.keySet && a.size === 6)
    for ((c, er) <- e) {
      val ar = a(c)
      assert(ar.getLong(1) === er.getLong(1), s"$c n_rows")
      assert(ar.getLong(2) === er.getLong(2), s"$c n_nulls")
      assert(ar.getString(4) === er.getString(4), s"$c min_val")
      assert(ar.getString(5) === er.getString(5), s"$c max_val")
      // KMV at k=256: expected relative error ≈ 1/√(k−2) ≈ 6.3%; the
      // estimate is deterministic for fixed data, so a 2.5σ-ish bound is
      // never flaky. Columns whose distinct-hash set fits the sketch
      // (|K| < k) are EXACT — assert that stronger contract directly.
      val (nd, ndA) = (er.getLong(3), ar.getLong(3))
      if (nd < 256) assert(ndA === nd, s"$c small-NDV must be exact")
      else assert(math.abs(ndA - nd).toDouble / nd <= 0.16,
        s"$c ndv approx $ndA vs exact $nd")
    }

    // 1024-row hash-sample medians track the exact percentile on the int
    // columns (rank error ~1/√k ≈ 3%; value bound is loose for safety)
    val med = graft.queries.Tables(spark, dir, "lineitem")
      .agg(expr("percentile(l_partkey, 0.5)")).head().getDouble(0)
    val medA = a("l_partkey").getDouble(6)
    assert(math.abs(medA - med) <= math.max(1.0, med * 0.12),
      s"l_partkey approx median $medA vs exact $med")

    // the scale claim: ONE scan, no Expand (the exact multi-distinct
    // spelling this replaces compiled to an Expand reading every column)
    // (AQE's toString repeats the plan under "== Initial Plan ==" —
    // count scans in the final section only)
    val plan = approx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), "sketch profile must not Expand")
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected exactly one scan, got $scans\n$plan")
  }

  test("llm_kmv_set_ops: union/intersection estimates track exact set sizes") {
    val rows = graft.queries.LlmSurface.queries("llm_kmv_set_ops")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    val vocab = graft.queries.Tables(spark, dir, "documents")
      .select(col("source"), explode(graft.llm.TextOps.words(col("text"))).as("w"))
      .distinct().collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
    // every pair: estimated union/intersection within a generous KMV
    // bound of the exact values (k=128 ⇒ σ ≈ 1/√126 ≈ 9%; estimates are
    // deterministic, so the 3σ-ish bound can never flake)
    for (((a, b), (uEst, iEst)) <- rows) {
      val u = (vocab(a) ++ vocab(b)).size
      val i = (vocab(a) & vocab(b)).size
      assert(math.abs(uEst - u).toDouble / u <= 0.27, s"union $a-$b: $uEst vs $u")
      // intersection inherits error from three operands; bound in UNION
      // units (the estimator's natural scale), not intersection units
      assert(math.abs(iEst - i).toDouble / u <= 0.4, s"intersect $a-$b: $iEst vs $i")
    }
    assert(rows.size === 190)
  }

  test("approx_percentile (t-digest) tracks the exact percentile") {
    val ev = graft.queries.Tables.events(spark, dir)
    val rows = ev.groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact_med"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx_med"))
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, e, a) =>
      assert(math.abs(a - e) <= math.max(1.0, e * 0.05),
        s"$t: approx median $a vs exact $e")
    }
  }

  test("stream_value_quantiles: histogram estimates land within one " +
    "bucket width of the exact order statistic, every day") {
    val W = 800L
    val out = graft.queries.StreamSurface.queries("stream_value_quantiles")(
      spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.nonEmpty)
    // exact per-day rank-r order statistics (r = ceil(p·n), the same
    // rank the histogram walk targets)
    val byDay = graft.queries.Tables.events(spark, dir)
      .select(date_format(date_trunc("day", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("d"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(_._2).sorted }
    assert(out.keySet === byDay.keySet)
    byDay.foreach { case (d, sorted) =>
      val (n, p50, p95) = out(d)
      assert(n === sorted.length.toLong)
      def kth(p: Int) = sorted((p * sorted.length + 99) / 100 - 1)
      assert(math.abs(p50 - kth(50)) <= W,
        s"$d: p50 $p50 vs exact ${kth(50)}")
      assert(math.abs(p95 - kth(95)) <= W,
        s"$d: p95 $p95 vs exact ${kth(95)}")
    }
  }
}
