package graft

import org.apache.spark.sql.functions._

import graft.operators.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // a 10-token run shared verbatim between docs 1 and 2 (k = 8 ⇒ three
  // shared 8-grams per holder), embedded at different offsets; doc 3
  // shares nothing
  private val run = (1 to 10).map(i => s"s$i").mkString(" ")
  private val docA = s"u1 u2 u3 u4 u5 $run v1 v2 v3 v4 v5" // run at tokens [5, 14]
  private val docB = s"x1 x2 $run y1 y2"                   // run at tokens [2, 11]
  private val docC = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"

  private def docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")

  test("dupSpans finds the exact shared-run extent in each holder") {
    for (hashKeys <- Seq(false, true)) {
      val spans = SubstringDedup.dupSpans(docs, "text", "doc_id", k = 8, hashKeys = hashKeys)
        .as[(Long, Int, Int)].collect().toSet
      assert(spans == Set((1L, 5, 14), (2L, 2, 11)),
        s"hashKeys=$hashKeys: expected the 10-token run at each doc's offset, got $spans")
    }
  }

  test("windowed shared-gram detection == distinct/groupBy/join reference on random docs") {
    // the one-exchange window form (withSharedCounts) replaced a
    // distinct → groupBy → join-back shape; pin row-set equality of the
    // duplicated-position sets on a randomized corpus with repeated and
    // partially-shared runs
    val rng = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val shared = (1 to 12).map(i => s"r$i").mkString(" ")
    val rand = (id: Long) => Seq.fill(8 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val corpus = (1L to 30L).map { id =>
      val t =
        if (id % 3 == 0) s"${rand(id)} $shared ${rand(id)}"
        else rand(id)
      (id, t)
    }.toDF("doc_id", "text")
    for (k <- Seq(4, 8); hashKeys <- Seq(false, true)) {
      val spans = SubstringDedup.dupSpans(corpus, "text", "doc_id", k, hashKeys)
        .as[(Long, Int, Int)].collect().toSet
      // reference: the pre-r14 join form, composed inline
      val grams = corpus.select(col("doc_id").as("__id"),
        posexplode(graft.functions.TextFns.shingles(col("text"), k)).as(Seq("pos", "gram")))
      val keyed = if (hashKeys) grams.withColumn("gram", xxhash64(col("gram"))) else grams
      val sharedG = keyed.select("gram", "__id").distinct()
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).select("gram")
      val refPos = keyed.join(sharedG, Seq("gram")).select("__id", "pos")
      val ref = SubstringDedup.mergeCoverage(refPos, k)
        .as[(Long, Int, Int)].collect().toSet
      assert(spans == ref, s"k=$k hashKeys=$hashKeys")
    }
  }

  test("spanStats reports counts, coverage and zero rows") {
    val stats = SubstringDedup.spanStats(docs, "text", "doc_id", k = 8)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(stats(1L) == ((20L, 1L, 10L, 0.5)))
    assert(stats(2L) == ((14L, 1L, 10L, 10.0 / 14.0)))
    assert(stats(3L) == ((12L, 0L, 0L, 0.0)), "clean docs appear with zero spans")
  }

  test("mergeCoverage unions overlapping windows and splits at real gaps") {
    // k = 8: starts 0 and 5 overlap ([0,7] ∪ [5,12] → [0,12]); start 14
    // leaves token 13 uncovered ⇒ a new span; start 20 overlaps [14,21]
    // and extends it to [14,27]
    val merged = SubstringDedup.mergeCoverage(
        Seq((1L, 0), (1L, 5), (1L, 14), (1L, 20)).toDF("__id", "pos"), k = 8)
      .as[(Long, Int, Int)].collect().toSet
    assert(merged == Set((1L, 0, 12), (1L, 14, 27)))
  }

  test("stripSpans keeps the canonical copy and strips the rest") {
    val stripped = SubstringDedup.stripSpans(docs, "text", "doc_id", k = 8)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stripped(1L) == ((docA, 0L)), "min-id holder keeps its text verbatim")
    assert(stripped(2L) == (("x1 x2 y1 y2", 10L)), "non-canonical holder loses exactly the run")
    assert(stripped(3L) == ((docC, 0L)))
  }

  test("stripSpans reduces a full duplicate to empty and survives re-analysis") {
    val dup = Seq((1L, docA), (2L, docA), (3L, docC)).toDF("doc_id", "text")
    val stripped = SubstringDedup.stripSpans(dup, "text", "doc_id", k = 8)
    val byId = stripped.as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 == docA)
    assert(byId(2L) == (("", 20L)), "a verbatim copy is stripped to nothing")
    // after stripping, no cross-doc duplicated span of ≥ 8 tokens remains
    val residual = SubstringDedup.spanStats(stripped, "text", "doc_id", k = 8)
      .agg(sum(col("dup_tokens"))).as[Long].head()
    assert(residual == 0L)
  }
}
