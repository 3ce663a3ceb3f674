package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed greedy MAXIMAL matching by locally-minimal edge
  * selection (the deterministic core of Israeli–Itai 1986): each
  * round, an edge joins the matching iff its key is the minimum among
  * ALL edges touching either endpoint — two such edges cannot share a
  * vertex (they would both have to be the unique minimum there), so
  * every round's selection is vertex-disjoint; matched vertices and
  * their edges leave the graph and the rounds repeat until no edge
  * remains. The result is maximal (every surviving edge was adjacent
  * to a matched one), which also yields the classical 2-approximate
  * vertex cover (both endpoints of every matched edge). No reference
  * counterpart (SURVEY §2.6); north-star extension surface — matching
  * is the conflict-free assignment primitive (dedup pair arbitration,
  * 1:1 record-linkage resolution) the greedy sequential algorithm
  * cannot give a cluster.
  *
  * Round bound: with edge keys led by the shared 60-bit md5 hash the
  * key order is pseudorandom, and locally-minimal selection removes a
  * constant expected fraction of edges per round (Israeli–Itai); the
  * cap is enforced LOUDLY. Keys are md5-hash-led but fully unique
  * (the `|a|b` suffix breaks any hash tie deterministically), so both
  * engines pick identical minima — no float, no randomness.
  *
  * Scale: each round is two min-aggregates over edge endpoints
  * (map-side combine, |V| keys) and two semi/anti joins pruning the
  * edge list; the edge list only shrinks, lineage is cut per round
  * with localCheckpoint, and the one driver action per round is the
  * emptiness probe that decides termination.
  *
  * Returns the matching: (a, b, round) — one row per matched edge.
  */
object MaximalMatching {

  def matching(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 40): DataFrame = {
    // unique deterministic key: zero-padded 60-bit md5 prefix, then
    // the endpoint pair (tie-break that makes min() single-valued)
    // Iterate.cut, not plain localCheckpoint: each round joins e with
    // two projections of itself and two anti-joins against sel (itself
    // e-derived) — carried origin stats would grow ~e⁷ per round (the
    // Borůvka BigInteger-overflow gotcha), wedging planning at scale
    var e = Iterate.cut(
      edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
        .withColumn("k", concat(
          lpad(expr("cast(conv(substring(md5(concat('match|', a, '|', b))"
            + ", 1, 15), 16, 10) as bigint)").cast("string"), 19, "0"),
          lit("|"), col("a"), lit("|"), col("b"))))
    var matched: DataFrame = null
    var round = 0
    var done = false
    while (!done) {
      if (e.isEmpty) done = true
      else {
        round += 1
        if (round > maxRounds) throw new IllegalStateException(
          s"MaximalMatching: edges remain after $maxRounds rounds — "
            + "pseudorandom keys make this vanishingly unlikely; "
            + "raise maxRounds")
        val vmin = e.select(col("a").as("n"), col("k"))
          .unionAll(e.select(col("b").as("n"), col("k")))
          .groupBy("n").agg(min("k").as("mk"))
        val sel = e
          .join(vmin.select(col("n").as("a"), col("mk").as("ka")), "a")
          .join(vmin.select(col("n").as("b"), col("mk").as("kb")), "b")
          .filter(col("k") === col("ka") && col("k") === col("kb"))
          .select(col("a"), col("b"), lit(round).as("round"))
          .localCheckpoint(true)
        val mv = sel.select(col("a").as("n"))
          .unionAll(sel.select(col("b").as("n")))
        e = Iterate.cut(e
          .join(mv.withColumnRenamed("n", "a"), Seq("a"), "left_anti")
          .join(mv.withColumnRenamed("n", "b"), Seq("b"), "left_anti"))
        matched = if (matched == null) sel else matched.unionAll(sel)
      }
    }
    if (matched == null)
      edges.sparkSession.emptyDataFrame
        .select(lit(0L).as("a"), lit(0L).as("b"), lit(0).as("round"))
        .limit(0)
    else matched
  }
}
