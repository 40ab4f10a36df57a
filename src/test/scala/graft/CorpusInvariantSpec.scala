package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Randomized invariant checks for the corpus-assembly operators —
  * seeded, so failures reproduce. These pin the algebraic contracts the
  * example-based specs can't sweep: conservation and tiling for sequence
  * packing, scale-invariance for weighted sampling, share fidelity for
  * mixture planning.
  */
class CorpusInvariantSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Corpus

  private def randomDocs(seed: Long, nGroups: Int, maxDocs: Int, maxTok: Int) = {
    val rnd = new Random(seed)
    (0 until nGroups).flatMap { g =>
      (1 to (1 + rnd.nextInt(maxDocs))).map { i =>
        (s"g$g", i.toLong, rnd.nextInt(maxTok + 1)) // includes zero-token docs
      }
    }
  }

  test("packSequences conserves tokens and tiles every sequence exactly (5 seeds)") {
    for (seed <- 1L to 5L) {
      val docs = randomDocs(seed, nGroups = 4, maxDocs = 40, maxTok = 300)
      val df = docs.toDF("source", "doc_id", "ntok")
      val seqLen = 128L
      val out = Corpus.packSequences(df, "source", "doc_id", col("ntok"), seqLen).cache()
      try {
        // (a) conservation: each doc's spans sum to its token count
        val perDoc = out.groupBy("source", "doc_id").agg(sum("n_tokens").as("t"))
          .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
        docs.filter(_._3 > 0).foreach { case (g, id, n) =>
          assert(perDoc((g, id)) == n.toLong, s"seed=$seed doc=($g,$id) tokens")
        }
        assert(perDoc.keySet == docs.filter(_._3 > 0).map(d => (d._1, d._2)).toSet,
          s"seed=$seed zero-token docs must not appear")
        // (b) every sequence except each group's last carries exactly seqLen
        val perSeq = out.groupBy("source", "seq_id").agg(sum("n_tokens").as("t"))
          .as[(String, Long, Long)].collect()
        val lastSeq = perSeq.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        perSeq.foreach { case (g, s, t) =>
          if (s < lastSeq(g)) assert(t == seqLen, s"seed=$seed interior seq ($g,$s) has $t")
          else assert(t >= 1 && t <= seqLen, s"seed=$seed final seq ($g,$s) has $t")
        }
        // (c) spans tile each sequence: sorted [start,end) ranges abut from 0
        val spans = out.select("source", "seq_id", "tok_start", "tok_end")
          .as[(String, Long, Long, Long)].collect()
          .groupBy(r => (r._1, r._2))
        spans.foreach { case ((g, s), rows) =>
          val sorted = rows.map(r => (r._3, r._4)).sortBy(_._1)
          assert(sorted.head._1 == 0L, s"seed=$seed ($g,$s) must start at 0")
          sorted.sliding(2).foreach {
            case Array((_, e1), (s2, _)) => assert(e1 == s2, s"seed=$seed ($g,$s) gap/overlap")
            case _ =>
          }
        }
      } finally { out.unpersist(); () }
    }
  }

  test("packedRows conserves the corpus: concatenated sequences reproduce the concatenated group text (3 seeds)") {
    for (seed <- 21L to 23L) {
      val rnd = new Random(seed)
      val docs = (0 until 3).flatMap { g =>
        (1 to (5 + rnd.nextInt(25))).map { i =>
          val words = Seq.fill(1 + rnd.nextInt(90))(s"w${rnd.nextInt(50)}")
          (s"g$g", i.toLong, words.mkString(" "))
        }
      }
      val df = docs.toDF("source", "doc_id", "text")
      val rows = Corpus.packedRows(df, "source", "doc_id", "text", seqLen = 64L)
        .select("source", "seq_id", "seq_text", "n_tokens")
        .as[(String, Long, String, Long)].collect()
      // interior sequences carry exactly seqLen tokens
      val bySrc = rows.groupBy(_._1)
      bySrc.foreach { case (g, rs) =>
        val last = rs.map(_._2).max
        rs.foreach { case (_, s, text, n) =>
          assert(text.split(" ", -1).length == n, s"seed=$seed ($g,$s) token count")
          if (s < last) assert(n == 64L, s"seed=$seed interior ($g,$s) has $n")
        }
        // conservation: sequences in order == docs in order
        val packedText = rs.sortBy(_._2).map(_._3).mkString(" ")
        val corpusText = docs.filter(_._1 == g).sortBy(_._2).map(_._3).mkString(" ")
        assert(packedText == corpusText, s"seed=$seed group $g corpus not conserved")
      }
    }
  }

  test("weightedSamplePerGroup is invariant under uniform weight scaling and respects k") {
    val rnd = new Random(7L)
    val docs = (1 to 300).map { i =>
      (i.toLong, s"g${i % 3}", s"body ${rnd.nextInt(100000)}", 1L + rnd.nextInt(1000))
    }.toDF("doc_id", "source", "text", "w")
    def pick(weights: org.apache.spark.sql.Column) =
      Corpus.weightedSamplePerGroup(docs, "source", "text", weights, "doc_id", k = 7)
        .select("doc_id").as[Long].collect().toSet
    val base = pick(col("w"))
    assert(base.size == 21, "3 groups x 7")
    // A-ES keys -ln(u)/w order identically under w -> c.w for any c > 0
    assert(pick(col("w") * 1000) == base, "uniform weight scaling must not change the sample")
    assert(pick(col("w") * 0.001) == base)
    // k larger than the group keeps everything with positive weight
    val all = Corpus.weightedSamplePerGroup(docs, "source", "text", col("w"), "doc_id", k = 1000)
    assert(all.count() == 300)
  }

  test("planMixtureEpochs planned tokens realize the target shares exactly (5 seeds)") {
    for (seed <- 11L to 15L) {
      val rnd = new Random(seed)
      val sizes = (0 until 4).map(i => s"s$i" -> (1000L + rnd.nextInt(100000)))
      val df = sizes.toDF("source", "n_tok")
      val shares = Seq("s0" -> 0.4, "s1" -> 0.3, "s2" -> 0.2, "s3" -> 0.1)
      val budget = 50000L + rnd.nextInt(1000000)
      val maxE = 1.0 + rnd.nextInt(8)
      val plan = Corpus.planMixtureEpochs(df, "source", col("n_tok"), shares,
          totalTokens = budget, maxEpochs = maxE)
        .select("source", "tokens", "target_share", "planned_tokens", "epochs")
        .as[(String, Long, Double, Double, Double)].collect()
      val totalPlanned = plan.map(_._4).sum
      plan.foreach { case (src, toks, share, planned, epochs) =>
        assert(math.abs(planned / totalPlanned - share) < 1e-9,
          s"seed=$seed $src share off: $planned / $totalPlanned vs $share")
        assert(epochs <= maxE + 1e-9, s"seed=$seed $src epochs $epochs > cap $maxE")
        assert(math.abs(epochs * toks - planned) < 1e-6 * math.max(1.0, planned))
      }
      assert(totalPlanned <= budget + 1e-6, s"seed=$seed budget exceeded")
      // the plan is tight: either the budget binds or some source hits the cap
      val slack = budget - totalPlanned
      val capped = plan.exists(p => math.abs(p._5 - maxE) < 1e-9)
      assert(slack < 1e-6 * budget || capped,
        s"seed=$seed plan not tight: slack=$slack, no source at cap")
    }
  }
}
