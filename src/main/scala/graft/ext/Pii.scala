package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: find and
  * mask emails, IPv4 addresses, and phone numbers before text reaches
  * a training corpus.
  *
  * Pure regexp expressions — one scan, zero shuffles, inside
  * whole-stage codegen, so the operator costs the same as any other
  * per-row map at 100 TB. The patterns deliberately use only syntax
  * shared by java.util.regex (Spark) and RE2 (DuckDB/Go scrubbers):
  * no backreferences, no lookaround — so the exact same rule set runs
  * on the oracle and on sibling engines.
  */
object Pii {

  /** Shared-regex-subset patterns (java.util.regex ∩ RE2). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Mask all supported PII classes with typed placeholders. Order
    * matters: emails first (an email contains digit runs a phone
    * pattern could nibble), then IPs (dotted digits), then phones.
    */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Per-document PII audit: class counts + redacted text + a keep
    * flag for downstream filtering (a common policy: drop documents
    * that are mostly PII rather than redact them).
    */
  def audit(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", countEmails(t).cast("long"))
      .withColumn("n_ipv4", countIpv4(t).cast("long"))
      .withColumn("n_phones", countPhones(t).cast("long"))
      .withColumn("redacted", redact(t))
  }
}
