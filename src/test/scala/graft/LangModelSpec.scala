package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** Bigram-LM quality scoring (operators.LangModel): hand-computed smoothed
  * log-probs, unseen-token floor, short-doc NULL contract. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)

  test("score matches hand-computed add-one smoothed bigram log-probs") {
    val corpus = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val m = LangModel.train(corpus, "text")
    assert(m.vocab === 2L) // {a, b}

    val got = LangModel.score(corpus, "text", "doc_id", m)
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap

    // bigrams (a,b):1 (b,a):2; contexts ctx(a)=1 ctx(b)=2 (the
    // bigram-context denominator — doc-final unigram occurrences do
    // not open a bigram and are excluded)
    val lpAB = round6(math.log((1.0 + 1) / (1 + 2)))
    val lpBA = round6(math.log((2.0 + 1) / (2 + 2)))
    val (n1, Some(avg1)) = got(1L)
    assert(n1 === 2L)
    assert(math.abs(avg1 - lpAB.add(lpBA).doubleValue / 2) < 1e-12)
    val (n2, Some(avg2)) = got(2L)
    assert(n2 === 1L)
    assert(math.abs(avg2 - lpBA.doubleValue) < 1e-12)
  }

  test("unseen bigrams and unseen prev-words get the smoothed floor, short docs NULL") {
    val corpus = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val m = LangModel.train(corpus, "text")
    val docs = Seq((10L, "c a"), (11L, "a"), (12L, "a a")).toDF("doc_id", "text")
    val got = LangModel.score(docs, "text", "doc_id", m)
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, lp) => id -> ((n, lp)) }.toMap

    // (c,a): c unseen → cab=0, ctx=0 → ln(1/(0+2))
    assert(math.abs(got(10L)._2.get - round6(math.log(0.5)).doubleValue) < 1e-12)
    assert(got(11L) === ((0L, None)), "single-word doc has no bigram terms")
    // (a,a) unseen bigram but seen prev: ln((0+1)/(ctx(a)=1+2))
    assert(math.abs(got(12L)._2.get - round6(math.log(1.0 / 3)).doubleValue) < 1e-12)
  }

  test("P(.|w_prev) normalizes to exactly 1 over the vocabulary") {
    // the property the bigram-context denominator buys: for every seen
    // context, sum over ALL vocab words of (c(ctx,w)+1)/(ctx+V) == 1
    val corpus = (1L to 200L).map(i =>
      (i, (0 until 30).map(j => s"w${(i * 31 + j * 17) % 97}").mkString(" "))).toDF("doc_id", "text")
    val m = LangModel.train(corpus, "text")
    val v = m.vocab
    val bi = m.bigrams.as[(String, String, Long)].collect()
    val ctx = bi.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(ctx.nonEmpty && v > 1)
    ctx.foreach { case (wp, cCtx) =>
      val seen = bi.filter(_._1 == wp)
      val pSeen = seen.map { case (_, _, c) => (c + 1).toDouble / (cCtx + v) }.sum
      val pUnseen = (v - seen.length) * (1.0 / (cCtx + v))
      assert(math.abs(pSeen + pUnseen - 1.0) < 1e-12,
        s"context '$wp' mass ${pSeen + pUnseen}")
    }
  }

  test("score is repartition-invariant (decimal term sums)") {
    val corpus = (1L to 50L).map(i =>
      (i, (0 until 20).map(j => s"w${(i * 13 + j * 7) % 11}").mkString(" "))).toDF("doc_id", "text")
    val m = LangModel.train(corpus, "text")
    val a = LangModel.score(corpus.repartition(7), "text", "doc_id", m)
      .as[(Long, Long, Option[Double])].collect().toSet
    val b = LangModel.score(corpus.coalesce(1), "text", "doc_id", m)
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(a === b)
  }
}
