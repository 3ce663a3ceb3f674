package graft

/** X367 hash-split uniformity: the registered query against an
  * independent JVM-MessageDigest mirror of the bucket assignment and
  * the cross-multiplied X² — and the uniform verdict on a clean
  * sequential id range.
  */
class HashUniformitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir = {
    val d = "/tmp/graft_hashuni_fixture"
    (0L until 200L).map(i => (i, "w", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("query matches the MessageDigest mirror; sequential ids pass") {
    def bucket(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$id".getBytes("US-ASCII"))
        .take(2).map(b => f"${b & 0xff}%02x").mkString
      Integer.parseInt(h, 16) % 100
    }
    val o = (0L until 200L).groupBy(bucket).map { case (b, xs) =>
      b -> xs.size.toLong }
    val n = BigInt(200)
    val sd2 = (0 until 100).map { b =>
      val d = 100 * BigInt(o.getOrElse(b, 0L)) - n
      d * d
    }.sum
    val expX2 = (sd2 * 1000000 / (100 * n)).toLong
    val r = graft.queries.LlmSurface
      .queries("p_hash_uniformity")(spark, dir)
      .as[(Long, Long, Boolean)].collect().head
    assert(r._1 === 200L && r._2 === expX2)
    // md5 on sequential ids must look uniform — a rejection here
    // would mean the split leaks id structure
    assert(!r._3)
  }
}
