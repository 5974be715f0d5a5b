package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scrub1(s: String): String =
    Seq(s).toDF("t").select(Pii.scrub(col("t"))).as[String].head()

  test("each PII class redacts its canonical shapes") {
    assert(scrub1("mail me at jane.doe+spam@sub.example.co.uk today") ==
      "mail me at [EMAIL] today")
    assert(scrub1("server at 192.168.1.254 down") == "server at [IP] down")
    assert(scrub1("ssn 078-05-1120 on file") == "ssn [SSN] on file")
    assert(scrub1("card 4111 1111 1111 1111 exp 12/27") == "card [CARD] exp 12/27")
    assert(scrub1("card 4111-1111-1111-1111.") == "card [CARD].")
    assert(scrub1("amex 3782 822463 10005 ok") == "amex [CARD] ok")
    assert(scrub1("call 555-867-5309 now") == "call [PHONE] now")
    assert(scrub1("call (555) 867-5309 now") == "call [PHONE] now")
    assert(scrub1("call +1 555 867 5309 now") == "call [PHONE] now")
  }

  test("negatives survive: near-miss shapes are preserved") {
    // 17-digit run: too long for a card, separator-free so not a phone
    assert(scrub1("order 12345678901234567 shipped") == "order 12345678901234567 shipped")
    // 12-digit run: too short for a card
    assert(scrub1("ref 123456789012 ok") == "ref 123456789012 ok")
    // two-part decimal, not an IP
    assert(scrub1("version 1.2 is out") == "version 1.2 is out")
    // plain ten-digit run: no separators, not scrubbed
    assert(scrub1("id 5558675309 raw") == "id 5558675309 raw")
    // 3-3-4 without any separator context stays (needs separators)
    assert(scrub1("no at-sign here example.com") == "no at-sign here example.com")
  }

  test("chain order: mixed PII in one string, all classes redacted") {
    val s = "Contact bob@x.io or +1 555 123 4567; ssn 123-45-6789, " +
      "card 5500 0000 0000 0004, host 10.0.0.7"
    val out = scrub1(s)
    assert(out == "Contact [EMAIL] or [PHONE]; ssn [SSN], card [CARD], host [IP]")
  }

  test("stats counts every redaction per class") {
    val s = "a@b.co c@d.net 1.2.3.4 999-88-7777 4111111111111111 555-123-4567 555.123.4567"
    val row = Seq(s).toDF("t")
      .select(Pii.stats(Pii.scrub(col("t"))).as("st"))
      .select("st.emails", "st.ips", "st.ssns", "st.cards", "st.phones")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(row == ((2L, 1L, 1L, 1L, 2L)))
  }

  test("scrub is idempotent and map-only codegen") {
    val df = spark.range(200).select(concat(lit("user"), col("id"),
      lit("@example.com from 10.0.0."), col("id") % 256).as("t"))
    val once = df.select(Pii.scrub(col("t")).as("s"))
    val twice = once.select(Pii.scrub(col("s")).as("s"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
    // whole plan is a single projection over the range — no exchange
    val shuffles = once.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty)
  }
}
