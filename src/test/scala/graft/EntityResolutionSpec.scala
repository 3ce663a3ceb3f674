package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** PassJoin pigeonhole blocking (EntityResolution): lossless for edit
  * distance <= 1 against in-Spark brute force, equi-join plan (no
  * cartesian anywhere), and deterministic best-match tie-breaking.
  */
class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  test("blocking is lossless vs brute force for every single-edit shape") {
    // edits in the LEFT half, the RIGHT half, at both ends, plus
    // insertion/deletion length changes and non-matches
    val master = Seq(
      (1L, "small ring"), (2L, "red widget"), (3L, "blue bolt"),
      (4L, "hot gear"), (5L, "small king"), (6L, "smell ring"))
      .toDF("mid", "mname")
    val probe = Seq(
      (10L, "small ring"),  // exact
      (11L, "smalX ring"),  // substitution, left half
      (12L, "small rinX"),  // substitution, right half (last char)
      (13L, "Xmall ring"),  // substitution, first char
      (14L, "small rng"),   // deletion, right half
      (15L, "mall ring"),   // deletion, first char
      (16L, "small rings"), // insertion at end
      (17L, "ssmall ring"), // insertion at start
      (18L, "red widgett"), // insertion, other master
      (19L, "zzzz zzzz"),   // matches nothing
      (20L, "small wing"))  // distance 1 of TWO masters (ring/king)
      .toDF("pid", "pname")
    val got = EntityResolution
      .editDistance1Join(master, probe, "mid", "mname", "pid", "pname")
      .orderBy("pid", "mid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = master.crossJoin(probe)
      .withColumn("d", expr("levenshtein(mname, pname)"))
      .filter(col("d") <= 1)
      .select(col("pid"), col("mid"), col("d"))
      .orderBy("pid", "mid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty && got.toSeq === want.toSeq)
    // the two-master case really yields two pairs
    assert(got.count(_._1 == 20L) === 2)
  }

  test("stripped-complement verify ≡ full levenshtein, exhaustively") {
    // r15: the confirm step strips the matched segment (a literal
    // common prefix/suffix by join-key equality) and runs the banded
    // DP on the complements only — exact by the greedy-match lemma
    // lev(xu, xv) = lev(u, v). Exhaust every master/probe pair of
    // lengths 3–4 over {a, b}: 24×24 pairs cover edits AT the split
    // boundary, repeated characters straddling it, and the
    // insertion/deletion length shifts where region overlap happens.
    val all = (for {
      n <- 3 to 4
      i <- 0 until (1 << n)
    } yield (0 until n).map(b => if (((i >> b) & 1) == 0) 'a' else 'b')
      .mkString).zipWithIndex.map { case (s, ix) => (ix.toLong, s) }
    val names = all.toDF("id", "nm")
    val mside = names.select(col("id").as("mid"), col("nm"))
    val pside = names.select(col("id").as("pid"), col("nm"))
    val got = EntityResolution
      .editDistance1Join(mside, pside, "mid", "nm", "pid", "nm")
      .orderBy("pid", "mid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val m2 = names.select(col("id").as("mid"), col("nm").as("m_nm"))
    val p2 = names.select(col("id").as("pid"), col("nm").as("p_nm"))
    val want = m2.crossJoin(p2)
      .withColumn("d", expr("levenshtein(m_nm, p_nm)"))
      .filter(col("d") <= 1)
      .select(col("pid"), col("mid"), col("d"))
      .orderBy("pid", "mid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length === want.length && got.toSeq === want.toSeq)
  }

  test("resolveBest: min distance wins, ties break to smallest master id") {
    val pairs = Seq(
      (20L, 1L, 1), (20L, 5L, 1),  // tie at distance 1 -> master 1
      (10L, 6L, 1), (10L, 1L, 0))  // exact beats near -> master 1
      .toDF("pid", "mid", "dist")
    val probe = Seq(10L, 20L, 99L).toDF("pid") // 99 resolves to null
    val got = EntityResolution.resolveBest(pairs, probe, "pid", "mid")
      .orderBy("pid")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq((10L, 1L), (20L, 1L), (99L, -1L)))
  }

  test("canonicalization is transitive: chains unify through CC") {
    // bolt ~ bolte ~ boltee: bolt/boltee are distance 2 (no direct
    // edge) but must share a canonical form via the middle link
    val names = Seq("bolt", "bolte", "boltee", "ring").toDF("p_name")
    val ma = names.select(col("p_name").as("name_b"),
      col("p_name").as("nm_b"))
    val pr = names.select(col("p_name").as("name_a"),
      col("p_name").as("nm_a"))
    val edges = EntityResolution
      .editDistance1Join(ma, pr, "name_b", "nm_b", "name_a", "nm_a")
      .filter(col("dist") === 1 && col("name_a") < col("name_b"))
    val labels = graft.operators.ConnectedComponents
      .alternatingStars(edges, "name_a", "name_b")
    val canon = names.join(labels, names("p_name") === labels("node"),
      "left")
      .select(col("p_name"),
        coalesce(col("label"), col("p_name")).as("canonical"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(canon("bolt") === "bolt" && canon("bolte") === "bolt" &&
      canon("boltee") === "bolt" && canon("ring") === "ring")
  }

  test("llm_fuzzy_join plan is equi-join only — no cartesian product") {
    val q = graft.queries.LlmSurface.queries("llm_fuzzy_join")(
      spark, "/root/testdata/sf0.001")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"NL join leaked:\n$p")
  }
}
