package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, KnnJoin}

class DedupKnnSpec extends SparkSpec {
  import spark.implicits._

  test("Dedup.exact groups identical texts and keeps min id") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"),
    ).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("Dedup.minhashLsh pairs near-duplicate docs, skips unrelated") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val far = "completely different words describing some other topic entirely here now"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("Dedup.minhashLshFast (xxhash64 scale path) pairs near-duplicates like the md5 path") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val far = "completely different words describing some other topic entirely here now"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshFast(df, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH candidates -> jaccardVerify: the scale-shape near-dup pipeline") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val far = "completely different words describing some other topic entirely here now"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")
    val candidates = Dedup.minhashLsh(df, "text", "doc_id")
    val verified = Dedup.jaccardVerify(candidates, df, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    // near1/near2: 11 distinct words each, 10 shared → jaccard = 10/12
    assert(math.abs(verified((1L, 2L)) - 10.0 / 12.0) < 1e-12)
    // the far doc never reached the verify stage (LSH pruned it)
    assert(!verified.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("Dedup.simhash: identical word sets share a fingerprint") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "delta eps zeta"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(df, "text", "doc_id").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("Dedup.byEmbedding finds same-direction vectors in the same bucket") {
    val df = Seq(
      (1L, Array(1.0f, 0.2f, 0.1f, 0.3f)),
      (2L, Array(2.0f, 0.4f, 0.2f, 0.6f)),   // same direction as 1
      (3L, Array(-1.0f, 0.5f, -0.2f, 0.1f)), // different bucket (sign of c1)
    ).toDF("vec_id", "embedding")
    val out = Dedup.byEmbedding(df, "embedding", "vec_id", threshold = 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("KnnJoin.bruteForce ranks by cosine with deterministic ties") {
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val t = Seq(
      (10L, Array(1.0f, 0.0f)),    // cos 1
      (11L, Array(1.0f, 1.0f)),    // cos ~0.707
      (12L, Array(0.0f, 1.0f)),    // cos 0
    ).toDF("vec_id", "embedding")
    val out = KnnJoin.bruteForce(q, t, "embedding", "vec_id", k = 2)
      .orderBy("rank").select("t_id").as[Long].collect().toSeq
    assert(out == Seq(10L, 11L))
  }

  test("VectorFns exact and fast cosine agree to double precision") {
    val df = Seq((Array(0.3f, -0.7f, 0.5f), Array(0.1f, 0.9f, -0.2f))).toDF("a", "b")
    val (exact, fast) = df.select(
      VectorFns.cosineExact(col("a"), col("b")),
      VectorFns.cosine(col("a"), col("b"))).as[(Double, Double)].head()
    assert(math.abs(exact - fast) < 1e-12)
  }

  test("TextFns.shingles builds sliding word n-grams") {
    val df = Seq("a b c d").toDF("text").select(TextFns.shingles(col("text"), 3).as("sh"))
    assert(df.as[Seq[String]].head() == Seq("a b c", "b c d"))
  }

  test("TextFns.langId scores marker words deterministically") {
    val df = Seq("the cat sat on the mat", "el gato es el mejor").toDF("text")
      .select(TextFns.langId(col("text")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es"))
  }
}
