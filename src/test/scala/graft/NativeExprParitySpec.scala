package graft

import org.apache.spark.sql.functions._

import graft.expressions.{MinHashSig, SimHashBits, WordShingles}
import graft.functions.TextFns

/** Randomized parity: each native expression must be value-identical to
  * the builtin composition it replaced (which is what the DuckDB oracles
  * mirror). Fixed seed keeps the corpus deterministic. */
class NativeExprParitySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(23)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "the", "a", "", "x1", "Überlänge", "日本語")

  private def randDoc(): String =
    Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private val docs = (1 to 200).map(i => (i.toLong, randDoc())).toDF("doc_id", "text")

  test("WordShingles == slice/zip_with composition on random docs (incl. empties, unicode)") {
    val ws = split(col("text"), " ")
    val len = greatest(size(ws) - lit(2), lit(0))
    val composed = (0 until 3).map(o => slice(ws, lit(o + 1), len))
      .reduce((acc, p) => zip_with(acc, p, (a, b) => concat(a, lit(" "), b)))
    val rows = docs.select(
      WordShingles.of(col("text"), 3).as("native"),
      composed.as("composed"),
    ).as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, c) => assert(n == c) }
  }

  test("SimHashBits == explode + 16-vote aggregation on random docs") {
    val native = docs.select(col("doc_id"),
      SimHashBits.of(array_distinct(TextFns.words(col("text"))), 16).as("fp"))
      .as[(Long, Long)].collect().toMap
    val wordsDf = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(TextFns.words(col("text")))).as("w"))
      .withColumn("h", md5(col("w")))
    val votes = (0 until 16).map { j =>
      val c = substring(col("h"), j + 1, 1)
      val hexVal = when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)
      sum(when(hexVal % 2 === 1, 1L).otherwise(-1L)).as(s"v$j")
    }
    val fp = (0 until 16).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val composed = wordsDf.groupBy("doc").agg(votes.head, votes.tail: _*)
      .select(col("doc"), fp.as("fp")).as[(Long, Long)].collect().toMap
    // the explode path drops docs with zero words; compare on its domain
    composed.foreach { case (d, f) => assert(native(d) == f, s"doc $d") }
    assert(composed.nonEmpty)
  }

  test("MinHashSig == explode + min(substring(md5)) aggregation on random docs") {
    val eligible = docs.filter(size(TextFns.words(col("text"))) >= 3)
    val native = eligible.select(col("doc_id"),
      MinHashSig.of(TextFns.shingles(col("text"), 3), 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val sh = eligible
      .select(col("doc_id").as("doc"), explode(TextFns.shingles(col("text"), 3)).as("s"))
      .select(col("doc"), md5(col("s")).as("h"))
    val mins = (0 until 8).map(j => min(substring(col("h"), 1 + 4 * j, 4)).as(s"m$j"))
    val composed = sh.groupBy("doc").agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until 8).map(j => col(s"m$j")): _*).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    composed.foreach { case (d, s) => assert(native(d) == s, s"doc $d") }
    assert(composed.nonEmpty)
  }

  test("MinHashBands == word_shingles + minhash_sig + md5(concat(sig slices)) on random docs") {
    import graft.expressions.MinHashBands
    val (numHashes, bands, n) = (8, 2, 3)
    val perBand = numHashes / bands
    val eligible = docs.filter(size(TextFns.words(col("text"))) >= n)
    val native = eligible.select(col("doc_id"),
      MinHashBands.of(col("text"), numHashes, bands, n).as("bk"))
      .as[(Long, Seq[String])].collect().toMap
    val sig = MinHashSig.of(TextFns.shingles(col("text"), n), numHashes)
    val composed = eligible.select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), array((0 until bands).map { b =>
        md5(concat((b * perBand until (b + 1) * perBand)
          .map(i => element_at(col("sig"), i + 1)): _*))
      }: _*).as("bk"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native.keySet == composed.keySet)
    composed.foreach { case (d, b) => assert(native(d) == b, s"doc $d") }
    assert(composed.nonEmpty)
  }

  test("explode(bands) drops exactly the docs a words-count pre-filter would") {
    // bandKeys/fastBandKeys rely on this in place of the former
    // size(words(text)) >= n filter: short and null texts must vanish
    // from the exploded band rows, nothing else may.
    import graft.expressions.{MinHashBands, XxMinHashBands}
    val n = 3
    val withEdge = docs.union(Seq(
      (9001L, "two words"), (9002L, ""), (9003L, null.asInstanceOf[String]),
      (9004L, "  "), (9005L, "exactly three words")).toDF("doc_id", "text"))
    val kept = withEdge.filter(size(TextFns.words(col("text"))) >= n)
      .select("doc_id").as[Long].collect().toSet
    val viaMd5 = withEdge.select(col("doc_id"),
        explode(MinHashBands.of(col("text"), 8, 2, n)).as("b"))
      .select("doc_id").distinct().as[Long].collect().toSet
    val viaXx = withEdge.select(col("doc_id"),
        explode(XxMinHashBands.of(col("text"), 8, 2, n)).as("b"))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(viaMd5 == kept)
    assert(viaXx == kept)
    assert(kept.contains(9004L) && kept.contains(9005L)) // "  " = 3 empty words
    assert(!kept.contains(9001L) && !kept.contains(9002L) && !kept.contains(9003L))
  }

  test("XxMinHashBands == explode + min(xxhash64(sh, i)) + xxhash64 band fold on random docs") {
    import graft.expressions.XxMinHashBands
    val (numHashes, bands, n) = (8, 2, 3)
    val perBand = numHashes / bands
    val eligible = docs.filter(size(TextFns.words(col("text"))) >= n)
    val native = eligible.select(col("doc_id"),
      XxMinHashBands.of(col("text"), numHashes, bands, n).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    val sh = eligible.select(col("doc_id").as("doc"),
      explode(TextFns.shingles(col("text"), n)).as("sh"))
    val hashCols = (0 until numHashes).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val composed = sh.groupBy("doc").agg(hashCols.head, hashCols.tail: _*)
      .select(col("doc"), array((0 until bands).map { b =>
        xxhash64((b * perBand until (b + 1) * perBand).map(i => col(s"h$i")): _*)
      }: _*).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == composed.keySet)
    composed.foreach { case (d, b) => assert(native(d) == b, s"doc $d") }
    assert(composed.nonEmpty)
  }

  test("ArgMaxPack max(long) == max(struct) argmax on random scores, and plans HashAggregate") {
    import graft.expressions.ArgMaxPack
    // random (key, score, label) candidates; scores spaced far above the
    // 2^-48 packing quantization, plus exact-tie rows (label breaks ties)
    val cand = (1 to 2000).map { i =>
      (i % 50L, math.rint(rng.nextDouble() * 1e6) / 1e6 - 0.5, i % 13)
    } ++ Seq((999L, 0.25, 3), (999L, 0.25, 7))
    val df = cand.toDF("k", "score", "lbl")
    val viaStruct = df.groupBy("k").agg(max(struct(col("score"), col("lbl"))).as("b"))
      .select(col("k"), col("b.lbl").as("lbl"), col("b.score").as("score"))
      .as[(Long, Int, Double)].collect().toSet
    val packed = df.groupBy("k").agg(
        max(ArgMaxPack.of(col("score"), col("lbl"), 4)).as("p"),
        max(col("score")).as("score"))
      .select(col("k"), ArgMaxPack.unpackLabel(col("p"), 4).as("lbl"), col("score"))
    assert(packed.as[(Long, Int, Double)].collect().toSet == viaStruct)
    // the whole point: a mutable long buffer → HashAggregate, no sort
    // (sparkPlan, not executedPlan: AQE wraps the tree until execution)
    val sp = packed.queryExecution.sparkPlan
    assert(sp.collect { case e: org.apache.spark.sql.execution.aggregate.SortAggregateExec => e }.isEmpty,
      "packed argmax must not plan SortAggregate")
    assert(sp.collect { case e: org.apache.spark.sql.execution.aggregate.HashAggregateExec => e }.nonEmpty)
    // out-of-range label (13 > 15 is fine; 16 is not) must throw, not mask
    val err = intercept[Exception] {
      Seq((1L, 0.5, 16)).toDF("k", "score", "lbl")
        .select(ArgMaxPack.of(col("score"), col("lbl"), 4)).collect()
    }
    assert(err.getMessage != null)
  }

  test("the full native SQL function surface is registered by GraftSession.install") {
    GraftSession.install(spark)
    val row = Seq(("alpha beta gamma delta", Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("text", "va", "vb")
      .selectExpr(
        "word_shingles(text, 3) AS sh",
        "minhash_sig(word_shingles(text, 3), 8) AS sig",
        "simhash_bits(split(text, ' '), 16) AS sim",
        "dot_product(va, vb) AS dp",
        "argmax_pack(0.5D, 3, 4) AS packed",
        "kepler_solve(1.5D, 0.3D) AS e")
      .head()
    assert(row.getAs[scala.collection.Seq[String]]("sh") ==
      Seq("alpha beta gamma", "beta gamma delta"))
    assert(row.getAs[scala.collection.Seq[String]]("sig").length == 8)
    assert(row.getAs[Double]("dp") == 11.0)
    // parity with the Column-API builders
    val viaCols = Seq(("alpha beta gamma delta", Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("text", "va", "vb")
      .select(
        MinHashSig.of(TextFns.shingles(col("text"), 3), 8).as("sig"),
        graft.expressions.DotProduct.of(col("va"), col("vb")).as("dp"))
      .head()
    assert(row.getAs[scala.collection.Seq[String]]("sig") ==
      viaCols.getAs[scala.collection.Seq[String]]("sig"))
    assert(row.getAs[Double]("dp") == viaCols.getAs[Double]("dp"))

    // width args must be literals — a column reference is a loud error
    val err2 = intercept[Exception] {
      Seq((3, "a b c d")).toDF("n", "text").selectExpr("word_shingles(text, n)").collect()
    }
    assert(err2.getMessage.contains("integer literal"))
  }
}
