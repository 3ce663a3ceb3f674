package graft

import graft.operators.Hll

/** X374 HyperLogLog: the register fold hand-replayed off-Spark from an
  * independent JVM md5 (one element, then a small set), the
  * mergeability law (register-wise max across a split), and the
  * 3σ ≈ 10% accuracy contract at 5 000 distinct keys.
  */
class HllSpec extends SparkSpec {

  import spark.implicits._

  /** The repo's shared 60-bit hash, reimplemented independently:
    * first 15 hex chars of md5, base-16. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Off-Spark replay of the register fold + raw estimator. */
  private def expected(keys: Seq[String]): (Long, Long, Long) = {
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    keys.foreach { k =>
      val h = h60("hll|" + k)
      val idx = h % Hll.M
      val w = h / Hll.M
      val rho =
        if (w == 0) Hll.WBITS + 1
        else Hll.WBITS + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(idx) = math.max(regs.getOrElse(idx, 0), rho)
    }
    val hit = regs.size.toLong
    val sHit = regs.valuesIterator
      .map(mj => BigInt(1) << (Hll.WBITS + 1 - mj)).sum
    val s = sHit + BigInt(Hll.M - hit) * (BigInt(1) << (Hll.WBITS + 1))
    val est = (BigInt(Hll.ALPHA_MICRO) * Hll.M * Hll.M
      * (BigInt(1) << (Hll.WBITS + 1))) / (s * 1000000)
    (hit, Hll.M - hit, est.toLong)
  }

  private def run(keys: Seq[String]): (Long, Long, Long) = {
    val df = keys.toDF("w")
      .selectExpr("'g' AS g",
        "cast(conv(substring(md5(concat('hll|', w)), 1, 15), 16, 10)"
          + " as bigint) AS h")
    val r = Hll.estimate(df, "g", "h")
      .as[(String, Long, Long, Long)].collect().head
    (r._2, r._3, r._4)
  }

  test("one element: one register hit, estimator replayed exactly") {
    assert(run(Seq("alpha")) === expected(Seq("alpha")))
  }

  test("a 40-key set replays the fold bit-for-bit off-Spark") {
    val keys = (0 until 40).map(i => s"key$i")
    assert(run(keys) === expected(keys))
  }

  test("duplicates do not move the registers (max is idempotent)") {
    val keys = (0 until 40).map(i => s"key$i")
    assert(run(keys ++ keys ++ keys) === expected(keys))
  }

  test("5 000 distinct keys estimate within 10% (3σ for m = 1024)") {
    val keys = (0 until 5000).map(i => s"word$i")
    val (_, _, est) = run(keys)
    assert(math.abs(est - 5000L) < 500L,
      s"HLL estimate $est off by more than 10% from 5000")
  }
}
