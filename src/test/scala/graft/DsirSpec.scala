package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance scoring: target-domain docs must outscore
  * off-domain docs, and the score must be deterministic across
  * partitionings (decimal-summed bucket ratios). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "sci", "pulsar timing array residuals pulsar timing"),
    (2L, "sci", "timing residuals of the pulsar array ephemeris"),
    (3L, "sci", "pulsar ephemeris timing model residuals"),
    (4L, "web", "buy cheap shoes online free shipping today"),
    (5L, "web", "celebrity gossip news and photos daily"),
    (6L, "mix", "pulsar timing and cheap shoes news"),
  ).toDF("doc_id", "domain", "text")

  test("target-domain docs outscore off-domain docs; mixed sits between") {
    val docs = corpus
    val target = docs.filter(col("domain") === "sci")
    val out = Dsir.scores(docs, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sci = Seq(1L, 2L, 3L).map(out)
    val web = Seq(4L, 5L).map(out)
    assert(sci.min > web.max,
      s"every sci doc must outscore every web doc: $out")
    assert(out(6L) > web.max && out(6L) < sci.max,
      s"the mixed doc must sit between the domains: $out")
  }

  test("scores carry per-occurrence multiplicity and are partition-invariant") {
    val docs = corpus
    val target = docs.filter(col("domain") === "sci")
    val a = Dsir.scores(docs, target, "text", "doc_id")
      .collect().map(_.toString).sorted.toSeq
    val b = Dsir.scores(docs.repartition(7), target.repartition(3), "text", "doc_id")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b, "scores must not depend on partitioning")
    // doc 1 repeats 'pulsar timing': n_features counts occurrences
    val n1 = Dsir.scores(docs, target, "text", "doc_id")
      .filter(col("doc_id") === 1L).select("n_features").as[Long].head()
    // 6 unigrams + 5 bigrams
    assert(n1 === 11L)
  }

  test("null-text docs are absent; buckets floor is enforced") {
    val docs = corpus.union(Seq((7L, "web", null.asInstanceOf[String]))
      .toDF("doc_id", "domain", "text"))
    val out = Dsir.scores(docs, docs.filter(col("domain") === "sci"), "text", "doc_id")
    assert(!out.select("doc_id").as[Long].collect().contains(7L))
    intercept[IllegalArgumentException](
      Dsir.scores(docs, docs, "text", "doc_id", buckets = 1))
  }
}
