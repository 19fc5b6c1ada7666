package graft.ext

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("audit counts and redacts emails, IPv4s, and phones") {
    val out = Pii.audit(docs(
      (1L, "contact bob.smith+spam@example.co.uk or 10.0.0.1 or 555-123-4567 now"),
      (2L, "clean text with no pii at all"),
      (3L, "two mails a@b.io c@d.org one ip 192.168.1.255")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    // row 1: one of each, all masked
    assert(out(1L)._1 === 1L && out(1L)._2 === 1L && out(1L)._3 === 1L)
    assert(out(1L)._4 === "contact <EMAIL> or <IP> or <PHONE> now")
    // row 2: untouched
    assert(out(2L) === ((0L, 0L, 0L, "clean text with no pii at all")))
    // row 3: two emails, one ip
    assert(out(3L)._1 === 2L && out(3L)._2 === 1L && out(3L)._3 === 0L)
    assert(out(3L)._4 === "two mails <EMAIL> <EMAIL> one ip <IP>")
  }

  test("redaction order: the email eats its digits before phone/ip see them") {
    val out = Pii.audit(docs((1L, "mail 555-123-4567@phones.example.com end")))
      .select("redacted").head().getString(0)
    assert(out === "mail <EMAIL> end")
  }

  test("phone variants: dots, spaces, international prefix") {
    val out = Pii.audit(docs(
      (1L, "call 555.123.4567 or +44 201 555 0199 style +123 456 7890 ok")))
      .select("n_phones").head().getLong(0)
    assert(out >= 2L) // dotted + at least one spaced form
  }
}
