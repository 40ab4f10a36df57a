package graft

import graft.operators.Bpe

/** Distributed BPE training must agree with an independent single-JVM
  * reference implementation of Sennrich-style word-level BPE (same
  * deterministic tiebreak: freq desc, pair lexicographic asc). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference BPE on a word-frequency map. */
  private def referenceBpe(wordFreq: Map[String, Long], numMerges: Int,
                           minFreq: Long): Seq[(String, String)] = {
    var vocab = wordFreq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val best = counts.toSeq.sortBy { case ((a, b), f) => (-f, a, b) }.headOption
      best match {
        case Some(((a, b), f)) if f >= minFreq =>
          merges += ((a, b))
          vocab = vocab.map { case (syms, n) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toVector, n)
          }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
  ).toDF("text")

  private val wordFreq = Map[String, Long](
    "low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)

  test("train matches the independent reference implementation") {
    val got = Bpe.train(corpus, "text", numMerges = 10, minFreq = 2).merges
    val want = referenceBpe(wordFreq, numMerges = 10, minFreq = 2)
    assert(got === want)
    // sanity on the classic example: 'es' (freq 9) is the first merge,
    // then 'es'+'t' (9)
    assert(got.take(2) === Seq(("e", "s"), ("es", "t")))
  }

  test("encode applies merges greedily in learned order") {
    val m = Bpe.train(corpus, "text", numMerges = 6, minFreq = 2)
    // a word from the corpus tokenizes into learned subwords, an unseen
    // word falls back toward characters (only shared merges apply)
    val out = Bpe.encode(Seq((1L, "newest lowest"), (2L, "")).toDF("id", "text"),
        "text", "id", m)
      .select("id", "bpe_tokens", "n_bpe_tokens")
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1.take(m.encodeWord("newest").length) === m.encodeWord("newest"))
    assert(out(1L)._1.mkString === "newestlowest", "tokens concatenate back to the text")
    assert(out(2L) === ((Seq.empty[String], 0L)))
  }

  test("training is deterministic across repartitionings") {
    val a = Bpe.train(corpus.repartition(7), "text", numMerges = 8, minFreq = 2).merges
    val b = Bpe.train(corpus.repartition(2), "text", numMerges = 8, minFreq = 2).merges
    assert(a === b)
  }
}
