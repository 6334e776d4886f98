package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def redact(texts: (Long, String)*): Map[Long, String] =
    texts.toSeq.toDF("id", "t")
      .select($"id", TextOps.redactPii($"t").as("r"))
      .as[(Long, String)].collect().toMap

  test("emails, phone variants, and IPv4 all redact; look-alikes survive") {
    val out = redact(
      1L -> "write to alice.smith+spam@corp.example.co.uk today",
      2L -> "call (415) 555-2671 or +1 415-555-2671 or 415.555.2671",
      3L -> "host 192.168.0.1 and 10.0.0.255 respond",
      // negatives: version strings and short dotted runs are NOT IPs,
      // 7-digit local numbers are NOT NANP phones, bare @ is not an email
      4L -> "version 1.2.3 at 3.14 beats 555-2671 and a @ b")
    assert(out(1L) == "write to <EMAIL> today")
    assert(out(2L) == "call <PHONE> or <PHONE> or <PHONE>")
    assert(out(3L) == "host <IP> and <IP> respond")
    assert(out(4L) == "version 1.2.3 at 3.14 beats 555-2671 and a @ b")
  }

  test("pass order: phone claims dotted 3-3-4 runs before the IP rule; email digits are inert") {
    val out = redact(
      1L -> "dial 415.555.2671 now",       // dotted phone, not an IP
      2L -> "mail bob123@h0st.example.com") // digits inside the email never count as phone/IP
    assert(out(1L) == "dial <PHONE> now")
    assert(out(2L) == "mail <EMAIL>")
  }

  test("piiCounts counts pass-by-pass and matches the redacted text") {
    val (counts, redacted) = TextOps.piiCounts($"t")
    val row = Seq((1L, "a@b.co and c@d.org, call 555-123-0042, ping 8.8.8.8"))
      .toDF("id", "t")
      .select(counts.map { case (k, c) => c.as(s"n_$k") } :+ redacted.as("r"): _*)
      .as[(Long, Long, Long, String)].collect().head
    assert(row == ((2L, 1L, 1L,
      "<EMAIL> and <EMAIL>, call <PHONE>, ping <IP>")))
  }
}
