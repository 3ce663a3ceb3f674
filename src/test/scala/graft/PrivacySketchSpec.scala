package graft

import org.apache.spark.sql.functions._

/** Round-10 wave-4 ops: the k-anonymity / l-diversity privacy audit
  * (X212) and the streaming count-min sketch (X213). The audit is
  * checked against an independently-computed full aggregation (the
  * violations the query emits must be exactly the violating subset);
  * the CMS runs END-TO-END through the streaming harness and is then
  * held to the sketch's analytic guarantees against exact truth.
  */
class PrivacySketchSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("p_kanonymity emits exactly the violating quasi-groups, with " +
    "consistent flags and shares") {
    val out = graft.queries.RefSurface.queries("p_kanonymity")(spark, dir)
      .collect()
    assert(out.nonEmpty, "audit found no violations — vacuous at this sf")

    // independent truth: full per-quasi aggregation, no violation filter
    val full = graft.queries.Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), countDistinct("o_custkey").as("l"))
      .as[(String, String, String, Long, Long)].collect()
      .map { case (p, m, st, n, l) => (p, m, st) -> (n, l) }.toMap

    val emitted = out.map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    val expected = full.collect {
      case (k, (n, l)) if n < 5 || l < 3 => k
    }.toSet
    assert(emitted === expected,
      s"violation set mismatch: missing ${expected -- emitted}, " +
        s"extra ${emitted -- expected}")

    out.foreach { r =>
      val (n, l) = full((r.getString(0), r.getString(1), r.getString(2)))
      assert(r.getLong(3) === n && r.getLong(4) === l)
      assert(l <= n, "more distinct sensitive values than rows")
      val share = r.getDouble(5)
      assert(share > 0.0 && share <= 1.0 + 1e-9)
      assert(r.getBoolean(6) === (n < 5))
      assert(r.getBoolean(7) === (l < 3))
    }
  }

  test("Mondrian partition matches an independent in-memory recursive " +
    "reference on real orders; every leaf holds >= k records") {
    val k = 50; val depth = 8; val w1 = 500000L; val w2 = 30L
    val rows = graft.queries.Tables(spark, dir, "orders").select(
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
        .cast("long").as("eday"))
    val pts = rows.as[(Long, Long)].collect().toSeq

    // plain-Scala reference: same rules (round-robin dim, bucketed
    // weighted median, both-sides >= k stop), recursion made explicit
    var ref: Map[Long, Seq[(Long, Long)]] = Map(0L -> pts)
    (0 until depth).foreach { r =>
      val (w, dim) = if (r % 2 == 0) (w1, 0) else (w2, 1)
      def a(p: (Long, Long)) = if (dim == 0) p._1 else p._2
      ref = ref.toSeq.flatMap { case (region, ps) =>
        val counts = ps.groupBy(a(_) / w).view.mapValues(_.size)
          .toSeq.sortBy(_._1)
        val tot = ps.size
        var cum = 0L; var bcut = 0L; var leftN = 0L; var found = false
        counts.foreach { case (b, n) =>
          if (!found) { cum += n
            if (2 * cum >= tot) { bcut = b; leftN = cum; found = true } }
        }
        if (leftN >= k && tot - leftN >= k) {
          val (l, rt) = ps.partition(a(_) / w <= bcut)
          Seq(region * 2 -> l, region * 2 + 1 -> rt)
        } else Seq(region * 2 -> ps)
      }.toMap
    }

    val got = graft.operators.Mondrian.partition(
      rows, "cents", "eday", k, depth, w1, w2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._3).view
      .mapValues(_.map(t => (t._1, t._2)).sorted.toSeq).toMap
    val want = ref.view.mapValues(_.sorted).toMap

    assert(got.keySet === want.keySet,
      s"leaf region ids differ: ${got.keySet.size} vs ${want.keySet.size}")
    got.foreach { case (region, members) =>
      assert(members === want(region), s"region $region members differ")
    }
    assert(got.size > 1, "no cut ever happened — vacuous")
    got.values.foreach(m => assert(m.size >= k,
      s"leaf smaller than k: ${m.size}"))
    assert(got.values.map(_.size).sum === pts.size,
      "leaves must partition the input")
  }

  test("kCenterGreedy matches an in-memory farthest-point reference; " +
    "radius sequence is non-increasing") {
    val emb = graft.queries.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.llm.VectorOps.quantize(col("embedding")).as("qv"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    val k = 12
    var centers = Vector((emb.head._1, emb.head._2, 0L))
    var best = emb.map { case (id, v) => (id, v, d2(v, emb.head._2)) }
    (2 to k).foreach { _ =>
      val pick = best.minBy { case (id, _, d) => (-d, id) }
      centers :+= pick
      best = best.map { case (id, v, d) =>
        (id, v, math.min(d, d2(v, pick._2))) }
    }

    val got = graft.queries.LlmSurface.queries("llm_coreset")(spark, dir)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.length === k)
    got.zip(centers).foreach { case ((idx, id, dq), (refId, _, refD)) =>
      assert(id === refId && dq === refD, s"pick $idx differs")
    }
    // greedy radius sequence: non-increasing after the seed row
    got.drop(1).sliding(2).foreach { case Array((_, _, a), (_, _, b)) =>
      assert(b <= a, "radius sequence must be non-increasing")
    }
  }

  test("stream_cms_users: estimates dominate truth (one-sided error), " +
    "day totals are exact, overcounts stay within the width bound") {
    val out = graft.queries.StreamSurface.queries("stream_cms_users")(spark, dir)
      .collect()
    assert(out.nonEmpty)

    // exact truth per (day, panel user) and per day
    val ev = graft.queries.Tables.events(spark, dir)
      .select(date_format(date_trunc("day", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("d"), col("user_id"))
    val truth = ev.filter(col("user_id") < 32)
      .groupBy("d", "user_id").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (d, u, n) => (d, u) -> n }.toMap
    val dayTruth = ev.groupBy("d").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

    assert(out.map(_.getString(0)).toSet === dayTruth.keySet,
      "streamed sketch days != event days")

    var positive = 0
    out.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val est = r.getLong(2)
      val dayN = r.getLong(3)
      val exact = truth.getOrElse(key, 0L)
      assert(dayN === dayTruth(key._1),
        s"day_n from sketch row 0 must be exact traffic for ${key._1}")
      // CMS never undercounts...
      assert(est >= exact, s"$key: est $est < exact $exact")
      // ...and min-over-depth overcount stays a small multiple of the
      // expected per-cell collision mass day_n/width (deterministic
      // hashes, so this can't flake; 8x is far beyond anything the
      // 4-row min should ever produce on this data)
      assert(est - exact <= (8L * dayN) / 256 + 1,
        s"$key: overcount ${est - exact} vs day_n $dayN")
      if (est > 0) positive += 1
    }
    assert(positive > 0, "no panel user ever estimated > 0 — vacuous")
  }
}
