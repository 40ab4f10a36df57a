package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.ParFile

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val parText =
    """PSRJ           J1811-1736
      |RAJ            18:11:34.789
      |F0             9.59444
      |F1             -2.0e-17       1.2e-19
      |PB             18.779168
      |E              0.828011       3e-6
      |NITS           1
      |# a comment
      |C  old-style comment
      |DM             476.0          0
      |""".stripMargin

  test("ParFile.parse mirrors read_par typing rules (binary_tools.py:26)") {
    val entries = ParFile.parse(parText)
    val byName = entries.map(e => e.param -> e).toMap
    assert(!byName.contains("NITS"))               // ignored param
    assert(byName.contains("ECC"))                 // E renamed
    assert(byName("ECC").err.contains(3e-6))
    assert(byName("F0").valueType == "f")
    assert(byName("F1").valueType == "e")          // scientific notation
    assert(byName("F1").err.contains(1.2e-19))
    assert(byName("PSRJ").valueType == "s")
    assert(byName("DM").err.isEmpty)               // trailing 0 is a fit flag, not an error
    assert(ParFile.toParams(entries)("PB") == 18.779168)
  }

  test("ParFile.load parses distributed text files") {
    val dir = java.nio.file.Files.createTempDirectory("par").toFile
    val f = new java.io.File(dir, "test.par")
    java.nio.file.Files.writeString(f.toPath, parText)
    val df = ParFile.load(spark, f.getAbsolutePath)
    assert(df.filter(col("param") === "ECC").count() == 1)
    assert(df.count() == 7)
  }

  test("ParFile.parseColumn: column-level typing, null rows and non-entries drop") {
    val df = Seq(
      (1L, "F0 9.59444 1 1.2e-7"),
      (2L, "E 0.828011"),
      (3L, "NITS 1"),                 // ignored param
      (4L, "F1 -2.0d-17 1"),          // lowercase d: string (case-sensitive D fix)
      (5L, null.asInstanceOf[String]),
      (6L, "TAU +42"),
    ).toDF("id", "l")
    val out = ParFile.parseColumn(df, "id", "l")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 4L, 6L))
    assert(out(1L) === (("F0", "f", Some(9.59444), Some(1.2e-7))))
    assert(out(2L)._1 === "ECC")
    assert(out(4L) === (("F1", "s", None, None)))
    assert(out(6L) === (("TAU", "d", Some(42.0), None)))
  }

  test("SkewJoin.salted matches plain join results") {
    val left = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong)).toDF("key", "id")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = left.join(right, Seq("key")).select("key", "id", "tag")
    val salted = SkewJoin.salted(left, right, "key", "id", saltBuckets = 8)
      .select("key", "id", "tag")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("SkewJoin.autoSalted routes only heavy keys through salting, same results") {
    // "hot" has 100 left rows (duplicated id values exercise multiset
    // equality); every other key has exactly 1
    val left = ((1 to 900).map(i => (s"k$i", i.toLong)) ++
      (1 to 100).map(i => ("hot", (i % 7).toLong))).toDF("key", "id")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("nomatch", "X"))
      .toDF("key", "tag")
    val plain = left.join(right, Seq("key"))
      .select("key", "id", "tag").collect().map(_.toString).sorted.toSeq
    Seq(1L, 50L, 10000L).foreach { thr => // heavy set = {hot}, {hot}, {}
      val auto = SkewJoin.autoSalted(left, right, "key", "id",
          saltBuckets = 8, heavyThreshold = thr)
        .select("key", "id", "tag").collect().map(_.toString).sorted.toSeq
      assert(auto === plain, s"threshold $thr diverged")
    }
  }
}
