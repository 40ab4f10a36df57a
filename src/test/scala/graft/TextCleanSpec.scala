package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextClean}

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  test("normalized composes NFC, lowercases, strips controls, collapses whitespace") {
    val rows = Seq(
      "café Deluxe",     // DECOMPOSED e + combining acute, uppercase
      "caf\u00e9 deluxe",   // composed e-acute, already lower
      "  a\t\tb \n c  ",       // whitespace runs + edges
      "ctl\u0007chars\u0000 here", // bell + NUL stripped in place
      "",
    ).toDF("t").select(TextClean.normalized($"t")).as[String].collect().toSeq
    assert(rows(0) == "caf\u00e9 deluxe")
    assert(rows(0) == rows(1), "NFD and NFC encodings must canonicalize identically")
    assert(rows(2) == "a b c")
    assert(rows(3) == "ctlchars here")
    assert(rows(4) == "")
  }

  test("normalization makes byte-different duplicate docs dedup together") {
    val docs = Seq(
      (1L, "café du monde"), // NFD bytes
      (2L, "caf\u00e9 du monde"),  // NFC bytes, same text
      (3L, "something else"),
    ).toDF("doc_id", "text")
    val raw = Dedup.exact(docs, "text", "doc_id").count()
    val canon = Dedup.exact(
      docs.withColumn("text", TextClean.normalized($"text")), "text", "doc_id").count()
    assert(raw == 3 && canon == 2, s"raw=$raw canon=$canon")
  }

  test("redactPii replaces emails/IPs/cards/phones and counts redactions") {
    val out = TextClean.redactPii(Seq(
      (1L, "contact jane.doe+x@example.co.uk or 10.0.255.1 today"),
      (2L, "card 4111 1111 1111 1111 phone +1 555 0100 done"),
      (3L, "perfectly clean text with numbers like 42 and 7"),
    ).toDF("doc_id", "text"), "text")
      .select("doc_id", "redacted", "n_redactions")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

    assert(out(0)._2 == "contact <EMAIL> or <IP> today", out(0)._2)
    assert(out(0)._3 == 2L)
    assert(out(1)._2 == "card <CARD> phone <PHONE> done", out(1)._2)
    assert(out(1)._3 == 2L)
    assert(out(2)._2 == "perfectly clean text with numbers like 42 and 7")
    assert(out(2)._3 == 0L)
  }

  test("dropBoilerplateLines removes lines crossing the doc-frequency cap, keeps order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal prose one\nmore prose\nFOOTER"),
      (2L, "COOKIE BANNER\ndifferent words\nFOOTER"),
      (3L, "COOKIE BANNER\nunique thought\nFOOTER"),
      (4L, "COOKIE BANNER\nFOOTER"), // all boilerplate
    ).toDF("doc_id", "text")
    val out = TextClean.dropBoilerplateLines(docs, "text", "doc_id", maxDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("real prose one\nmore prose", 2L)))
    assert(out(2L) == (("different words", 2L)))
    assert(out(3L) == (("unique thought", 2L)))
    assert(out(4L) == (("", 2L)))
  }

  test("dedupLines keeps the first occurrence of each line in order") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"),
      (2L, "solo"),
    ).toDF("doc_id", "text")
    val out = TextClean.dedupLines(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("alpha\nbeta\ngamma", 2L)))
    assert(out(2L) == (("solo", 0L)))
  }
}
