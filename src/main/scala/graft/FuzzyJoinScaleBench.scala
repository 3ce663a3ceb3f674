package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Candidate-growth artifact for
  * [[graft.operators.EntityResolution.editDistance1Join]] — the
  * empirical proof that the PassJoin segment pigeonhole keeps the
  * candidate set ~LINEAR in corpus size where the naive form is
  * quadratic, recorded in BASELINE.md (exactness is
  * EntityResolutionSpec + the Round8Props edit property + the
  * `llm_fuzzy_join` brute-force oracle; this pins the GROWTH claim,
  * the NearDupScaleBench pattern).
  *
  * Setup: master names shaped like real entity keys — word + digits +
  * word + digits ("small 0123 ring 4567") so BOTH halves carry
  * entropy; low-entropy keys (shared prefixes everywhere) degrade any
  * prefix/suffix blocking and need longer segments or q-gram keys, a
  * documented property of the family, not of this implementation.
  * Probe = 10% of masters with one deterministic deletion. Measured at
  * N and 4N: candidate pairs per probe should stay ~flat while the
  * length-filtered brute-force pair count grows ×4.
  */
object FuzzyJoinScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-fuzzy-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val adjs = Array("small", "large", "red", "blue", "hot")
    val nouns = Array("ring", "bolt", "gear", "widget", "gizmo")

    def run(n: Long): (Double, Long, Long, Long) = {
      // the id itself is embedded in both halves (7-digit zero-pad), the
      // way real entity keys carry identifiers — key entropy grows with
      // the corpus, so segment blocks stay near-singleton at any N. A
      // FIXED-width key space (e.g. id % 9973) saturates: blocks grow
      // linearly with N and candidates super-linearly — measured 15.9×
      // for 4× data before this generator carried the full id. That is
      // a property of low-entropy keys under ANY prefix/suffix
      // blocking (the mitigation is longer segments / q-gram keys),
      // not of this implementation.
      val master = spark.range(n).select(col("id").as("mid"),
        concat_ws(" ",
          element_at(lit(adjs), (col("id") % 5 + 1).cast("int")),
          lpad(col("id").cast("string"), 7, "0"),
          element_at(lit(nouns), (col("id") % 7 % 5 + 1).cast("int")),
          lpad(pmod(col("id") * 2654435761L, lit(10000019L)).cast("string"),
            7, "0")).as("mname"))
      val probe = master.filter(col("mid") % 10 === 0)
        .select(col("mid").as("pid"),
          // delete one character at position 8 + id%4 (inside digits1)
          expr("""concat(substring(mname, 1, 7 + CAST(mid % 4 AS INT)),
                  substring(mname, 9 + CAST(mid % 4 AS INT), 100))""")
            .as("pname"))
      val t0 = System.nanoTime()
      val cands = EntityResolution.editDistance1Candidates(
        master, probe, "mid", "mname", "pid", "pname").count()
      val confirmed = EntityResolution.editDistance1Join(
        master, probe, "mid", "mname", "pid", "pname").count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, cands, confirmed, n / 10)
    }

    run(50000) // warm-up
    val (s1, c1, f1, p1) = run(250000)
    val (s2, c2, f2, p2) = run(1000000)
    println(
      f"""{"metric":"fuzzy_join_growth","n1":250000,"n2":1000000,"sec1":$s1%.3f,"sec2":$s2%.3f,"cands1":$c1,"cands2":$c2,"cands_per_probe1":${c1.toDouble / p1}%.2f,"cands_per_probe2":${c2.toDouble / p2}%.2f,"cand_growth":${c2.toDouble / c1}%.2f,"probe_growth":${p2.toDouble / p1}%.2f,"confirmed1":$f1,"confirmed2":$f2,"brute_pairs1":${250000L * 25000L},"brute_pairs2":${1000000L * 100000L}}""")
    spark.stop()
  }
}
