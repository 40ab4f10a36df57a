package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING — the vocabulary is
  * itself a training-data-pipeline product (Sennrich et al.'s word-level
  * BPE: learn merges on the corpus' word-frequency table, then tokenize
  * with them). `TextFns.bpeTokenCount` estimates with a fixed heuristic;
  * this learns real corpus-fitted merges.
  *
  * Scale shape per merge round (the classic formulation maps cleanly):
  *  - state = the DISTINCT-WORD table (word symbols, frequency) — corpus
  *    scale drops out after the first count (a 100 TB corpus has ~10⁷
  *    distinct words);
  *  - pair counting = one explode over adjacent symbol pairs + a
  *    map-side-combining weighted count; only the argmax pair crosses to
  *    the driver (TakeOrderedAndProject, deterministic lexicographic
  *    tiebreak);
  *  - the merge itself is a per-row symbol rewrite (mapPartitions-class
  *    work on the word table, not the corpus).
  * State is localCheckpoint'd each round: an iterative map chain would
  * otherwise re-execute all prior rounds at round k (the lineage trap
  * documented on Dedup.resolveClusters).
  */
object Bpe {

  /** Split a string into code-point symbols — NOT UTF-16 units: an
    * astral-plane character (emoji, rare CJK) split into surrogate
    * halves would corrupt to '?' at Spark's UTF8String boundary and
    * conflate distinct characters (same guarantee class as
    * TextFns.occurrences' code-point note). */
  private[operators] def symbols(word: String): Vector[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector

  /** Learned merges, in application order. */
  final case class Model(merges: Seq[(String, String)]) {
    // built once per (deserialized) model, NOT once per word — encode
    // calls encodeWord per corpus word and a per-call toMap of a
    // 10k-merge model would dominate tokenization cost
    @transient private lazy val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Tokenize one word by applying merges in learned order (the
      * standard greedy loop: repeatedly merge the earliest-learned pair
      * present). Driver/executor-side pure function. */
    def encodeWord(word: String): Seq[String] = {
      var syms = Bpe.symbols(word)
      var changed = true
      while (changed && syms.length > 1) {
        var bestIdx = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          rank.get((syms(i), syms(i + 1))).foreach { r =>
            if (r < bestRank) { bestRank = r; bestIdx = i }
          }
          i += 1
        }
        if (bestIdx < 0) changed = false
        else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
      }
      syms
    }
  }

  /** Learn `numMerges` merges from the corpus (stop early when the best
    * remaining pair's weighted frequency drops below `minFreq`). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L): Model = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    val spark = df.sparkSession
    import spark.implicits._

    // corpus → distinct-word frequency table with per-character symbols;
    // this is the ONLY corpus-sized job
    var vocab: Dataset[(Seq[String], Long)] = df
      .select(explode(graft.functions.TextFns.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (symbols(w): Seq[String], n) }
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      // weighted adjacent-pair counts; deterministic argmax (freq desc,
      // pair asc) via a bounded-heap global top-1
      val top = vocab.flatMap { case (syms, n) =>
          syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, n))
        }
        .toDF("a", "b", "n")
        .groupBy("a", "b").agg(sum(col("n")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case Some((a, b, freq)) if freq >= minFreq =>
          merges += ((a, b))
          val merged = a + b
          val next = vocab.map { case (syms, n) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toSeq, n)
          }.localCheckpoint()
          // note: no unpersist — it is a no-op for localCheckpoint
          // blocks; dropping the reference lets ContextCleaner reclaim
          // the previous round's RDD blocks
          vocab = next
        case _ => continue = false
      }
    }
    Model(merges.toSeq)
  }

  /** Tokenize a corpus with a trained model: (id, bpe_tokens,
    * n_bpe_tokens) — join back on id for the full row; the id keeps its
    * ORIGINAL type (a long cast would null string/uuid ids and the join
    * back would silently drop the corpus). A row-typed map (the greedy
    * merge loop is genuinely imperative — the same mapPartitions-class
    * exception as the multimodal codecs; no SQL UDF), with the model
    * (a few thousand merges) shipped once per task in the closure. */
  def encode(df: DataFrame, textCol: String, idCol: String, model: Model): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_bpe_tokens", LongType, nullable = false)))
    df.select(col(idCol), col(textCol))
      .map { r =>
        val text = if (r.isNullAt(1)) null else r.getString(1)
        val toks: Seq[String] =
          if (text == null) Seq.empty[String]
          else text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(model.encodeWord).toSeq
        Row(r.get(0), toks, toks.length.toLong)
      }(Encoders.row(outSchema))
  }
}
