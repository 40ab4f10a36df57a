package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnEval, KnnJoin}

/** ANN recall evaluation: hand-built result sets with known overlap, the
  * self-evaluation identity (recall of exact vs itself is 1.0), and the
  * summary collapse. */
class AnnEvalSpec extends SparkSpec {

  test("recallAt counts ID-set overlap per query, surfacing total misses as 0") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
                    (2L, 20L), (2L, 21L), (2L, 22L),
                    (3L, 30L), (3L, 31L), (3L, 32L)).toDF("q_id", "t_id")
    // q1: 2/3 hit; q2: 0/3 (disjoint ids — an empty/wrong LSH bucket);
    // q3: 3/3; approx also returns pairs NOT in truth (must not count)
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L),
                     (2L, 98L), (2L, 97L),
                     (3L, 30L), (3L, 31L), (3L, 32L)).toDF("q_id", "t_id")
    val out = AnnEval.recallAt(exact, approx)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((3L, 2L, 2.0 / 3.0)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((3L, 3L, 1.0)))
  }

  test("summarize reports macro, micro, and worst recall") {
    val s = spark
    import s.implicits._
    val per = Seq((1L, 3L, 2L, 2.0 / 3.0), (2L, 3L, 0L, 0.0), (3L, 3L, 3L, 1.0))
      .toDF("q_id", "n_exact", "n_hit", "recall")
    val r = AnnEval.summarize(per).head()
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - (2.0 / 3.0 + 0.0 + 1.0) / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 5.0 / 9.0) < 1e-9)
    assert(r.getDouble(3) === 0.0)
  }

  test("an index evaluated against itself scores recall 1.0 on every query") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 5)
    val t = e.filter(col("vec_id") >= 5)
    val exact = KnnJoin.bruteForce(q, t, "embedding", "vec_id", k = 5)
    val out = AnnEval.recallAt(exact, exact)
    assert(out.count() === 5L)
    assert(out.filter(col("recall") < 1.0).count() === 0L)
    // and the LSH index's recall is a proper fraction of it, never > 1
    val approx = KnnJoin.bucketed(q, t, "embedding", "vec_id", k = 5, bits = 4)
    val rel = AnnEval.recallAt(exact, approx)
    assert(rel.filter(col("recall") > 1.0).count() === 0L)
    assert(rel.count() === 5L)
  }
}
