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

  test("grouped lr·count scores == the per-occurrence decimal-sum form") {
    // scores() now sums lr(25,6) × cnt(12,0) over per-(doc, bucket)
    // counts; this replays the former per-occurrence Σ lr pipeline
    // verbatim and demands bit-equal doubles (the DuckDB oracle's q118
    // contract), on a corpus with heavy per-bucket multiplicity.
    val docs = corpus.union(Seq(
      (8L, "sci", Seq.fill(50)("pulsar timing").mkString(" ")),
      (9L, "web", Seq.fill(40)("cheap shoes shoes").mkString(" "))).toDF("doc_id", "domain", "text"))
    val target = docs.filter(col("domain") === "sci")
    val buckets = 1024
    def feats(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id").as("doc"),
        explode(concat(graft.functions.TextFns.words(col("text")),
          graft.functions.TextFns.shingles(col("text"), 2))).as("f"))
      .select(col("doc"),
        (conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long") % buckets).as("b"))
    val tc = feats(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rc = feats(docs).groupBy("b").agg(count(lit(1)).as("cr"))
    val counts = tc.join(rc, Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"), coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = broadcast(counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr")))
    val dim = counts.crossJoin(totals)
      .select(col("b"),
        (log((col("ct") + lit(1)).cast("double") / (col("nt") + lit(buckets)).cast("double"))
          - log((col("cr") + lit(1)).cast("double") / (col("nr") + lit(buckets)).cast("double")))
          .cast("decimal(38,6)").as("lr"))
    val expected = feats(docs).join(broadcast(dim), Seq("b"))
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_features"), sum(col("lr")).cast("double").as("score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val actual = Dsir.scores(docs, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(actual.keySet === expected.keySet)
    expected.foreach { case (d, (n, s)) =>
      assert(actual(d)._1 === n, s"n_features doc $d")
      assert(actual(d)._2 === s, s"score doc $d must be bit-equal")
    }
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
