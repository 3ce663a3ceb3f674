package graft

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** redactPii: category counts, placeholder substitution, and the
  * ordering contract (stage-wise counts can't double-count text a
  * more-specific earlier category already consumed).
  */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) = {
    val out = TextOps.redactPii(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .collect().head
    (out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4))
  }

  private def redact(text: String): String = {
    val df = Seq((1L, text)).toDF("id", "t")
    val redactedCol = TextOps.piiPatterns.foldLeft(col("t")) {
      case (c, (_, pat, token)) => regexp_replace(c, pat, token)
    }
    df.select(redactedCol).as[String].collect().head
  }

  test("each category matches and is replaced by its typed token") {
    val t = "mail a@b.com ip 10.0.0.1 tel +4915112345678 card 4111111111111111 end"
    assert(run(t) === ((1L, 1L, 1L, 1L)))
    assert(redact(t) ===
      "mail <EMAIL> ip <IP> tel <PHONE> card <CARD> end")
  }

  test("digit runs inside an email are not double-counted as cards") {
    // 16-digit local part would match the card pattern — but email
    // redaction runs first, so the card count (taken on the
    // email-redacted text) must be 0
    val (e, ip, ph, card) = run("reach me: 4111111111111111@corp.io thanks")
    assert(e === 1L && card === 0L && ip === 0L && ph === 0L)
  }

  test("multiple matches per category are all counted and replaced") {
    val t = "a@b.co c@d.org 1.2.3.4 5.6.7.8 9.10.11.12"
    val (e, ip, _, _) = run(t)
    assert(e === 2L && ip === 3L)
    assert(!redact(t).contains("@") && !redact(t).matches(".*[0-9]\\.[0-9].*"))
  }

  test("clean text is untouched") {
    val t = "perfectly ordinary words with a year 2024 and v1.2 nearby"
    assert(run(t) === ((0L, 0L, 0L, 0L)))
    assert(redact(t) === t)
  }

  test("plan is one codegen'd narrow pass: no shuffle, no join") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val p = TextOps.redactPii(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"redaction must stay narrow:\n$p")
    assert(p.contains("*(1)"), s"redaction fell out of codegen:\n$p")
  }
}
