package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.ProjectConfig

/** Project-config loader: key = value grammar, comment/override rules,
  * typed wide form, and the flags → decimation-plan expansion — the
  * launcher-shaped chain (project → flags → plan) end to end. */
class ProjectConfigSpec extends SparkSpec {

  // the dm_offset_pta.config shape: comments, trailing spaces on values,
  // a commented-out alternate ABOVE the active assignment, '##' comments
  private val ptaShaped =
    """#Configuration file for MeerTime pipeline (meerpipe)
      |
      |#User
      |user = Aditya
      |
      |type = meertime
      |pipe = old
      |input_path = /data/timing
      |output_path = /data/first_choice
      |#output_path = /data/commented_out
      |calibrators_path = /data/poln_calibration
      |##rm_cat = /data/old_rms.list
      |rm_cat = /data/new_rms.txt
      |flags = saveall
      |ref_freq_list = /cfg/928ch_frequency_reference.npy
      |rfi_alg = MG
      |""".stripMargin

  test("parse: comments skip, values trim, '=' in values survives") {
    val m = ProjectConfig.parse(ptaShaped)
    assert(m("user") === "Aditya")
    assert(m("flags") === "saveall", "trailing space on the value must trim")
    assert(m("calibrators_path") === "/data/poln_calibration")
    assert(m("rm_cat") === "/data/new_rms.txt", "'##' lines are comments too")
    assert(m("output_path") === "/data/first_choice",
      "a commented-out alternate must not override")
    assert(!m.contains("#output_path"))
    assert(ProjectConfig.parse("k = a=b")("k") === "a=b")
    assert(ProjectConfig.parse("= orphan\nnokey\n  #c\n") === Map.empty)
  }

  test("override: later assignment wins, in file order") {
    val m = ProjectConfig.parse("output_path = /a\nuser = u1\noutput_path = /b\n")
    assert(m("output_path") === "/b")
    assert(m("user") === "u1")
    assert(ProjectConfig.parseEntries("k = 1\nk = 2\n") === Seq(("k", "1"), ("k", "2")))
  }

  test("load + typed: per-project wide dimension from files") {
    val dir = Files.createTempDirectory("cfg").toFile
    try {
      Files.write(new java.io.File(dir, "pta.config").toPath,
        ptaShaped.getBytes(StandardCharsets.UTF_8))
      Files.write(new java.io.File(dir, "searchmode.config").toPath,
        "user = B\ntype = meertime\nflags = pscrunch,t 64 f 8,tscrunch\nrfi_alg = CG\n"
          .getBytes(StandardCharsets.UTF_8))
      val t = ProjectConfig.typed(spark, dir.getAbsolutePath + "/*.config")
        .collect().map(r => r.getAs[String]("project") -> r).toMap
      assert(t.keySet === Set("pta", "searchmode"))
      assert(t("pta").getAs[String]("user") === "Aditya")
      assert(t("pta").getAs[String]("rfi_alg") === "MG")
      assert(t("pta").getAs[String]("ref_freq_list").endsWith(".npy"))
      assert(t("pta").getAs[String]("dm_cat") === null, "unset keys surface as null")
      assert(t("searchmode").getAs[String]("flags") === "pscrunch,t 64 f 8,tscrunch")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("launcher chain: flags column expands to decimation plans") {
    import spark.implicits._
    val cfgs = Seq(
      ("pta", "saveall"),
      ("jitter", "pscrunch,t 32 f 8,tscrunch"),
      ("search", "t 64 f16,fscrunch,nozap,subband 2"),
    ).toDF("project", "flags")
    val rows = ProjectConfig.decimationPlans(cfgs, "project", "flags")
      .collect()
      .map(r => (r.getAs[String]("project"), r.getAs[String]("plan"),
        Option(r.getAs[java.lang.Long]("t_factor")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("f_factor")).map(_.toLong),
        r.getAs[String]("global_flags")))
      .toSet
    assert(rows === Set(
      ("pta", null, None, None, "saveall"),
      ("jitter", "t32f8", Some(32L), Some(8L), "pscrunch"),
      ("jitter", "tscrunch", Some(0L), Some(1L), "pscrunch"),
      ("search", "t64f16", Some(64L), Some(16L), "nozap,subband 2"),
      ("search", "fscrunch", Some(1L), Some(0L), "nozap,subband 2"),
    ))
  }

  test("real reference project configs load (guarded: reference tree present)") {
    val refDir = new java.io.File("/root/reference/configuration_files/project_specific")
    assume(refDir.isDirectory, "reference tree not present — skipping")
    val t = ProjectConfig.typed(spark, refDir.getAbsolutePath + "/*.config")
      .collect().map(r => r.getAs[String]("project") -> r).toMap
    assert(t.size === 7, s"expected the 7 shipped configs, got ${t.keySet}")
    assert(t("dm_offset_pta").getAs[String]("rfi_alg") === "MG")
    assert(t("dm_offset_pta").getAs[String]("flags") === "saveall",
      "the shipped trailing space must trim")
    assert(t("dm_offset_pta").getAs[String]("ref_freq_list")
      .endsWith("928ch_frequency_reference.npy"))
    assert(t("meertime_1909_searchmode").getAs[String]("rfi_alg") === "CG")
    // every shipped config is launcher-parseable end to end: the flags
    // column expands without a parse error
    val plans = ProjectConfig.decimationPlans(
      ProjectConfig.typed(spark, refDir.getAbsolutePath + "/*.config"),
      "project", "flags").collect()
    assert(plans.length >= 7)
  }
}
