package graft

/** Timed end-to-end run of the five reference-parity pipeline MAINS
  * (jhub, zoom daily, zoom hst, vk, monkey) against a scaled raw-JSON
  * fixture (`tools/pipeline_scale_gen.py`) — the pipeline-layer
  * analogue of [[Bench]]: the registered queries get a per-round 10×
  * audit, but the parity layer (raw JSON → flatten/explode →
  * partitioned staging + serving sink → reconcile) had only ever run
  * at spec-fixture size. Invokes the real `*Main.main` entry points
  * in-process (argv parsing, glob construction, sink-from-env and the
  * exit-on-failure contract all exercised; no `GRAFT_JDBC_URL` in the
  * env → the mock serving sink, the harness's no-Postgres shape), then
  * recounts every staged table so the printed artifact carries
  * reconciled row counts, not just wall times.
  *
  * Usage: runMain graft.PipelineBench RAW_ROOT STAGING_ROOT
  * Prints ONE JSON line (the [[Bench]] stdout contract).
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val Array(rawRoot, stagingRoot) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // claim the session FIRST with the bench master; the mains'
    // PipelineCli.session() joins it via getOrCreate
    val spark = SessionFactory.session(appName = "graft-pipeline-bench",
      master = Some(s"local[$cpus]"))
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    // host calibration, same contract as [[Bench]]: one mark before the
    // mains and one after the recounts; the artifact carries the min so
    // cross-scale and cross-round parity ratios can be read
    // hostmark-relative (the r16 1x/10x artifacts predate the mark and
    // are compared within their own capture window only)
    Hostmark.warm()
    val marks1t = scala.collection.mutable.ArrayBuffer(Hostmark.mark1t())
    val marksMt = scala.collection.mutable.ArrayBuffer(Hostmark.markMt())
    val runs = scala.collection.mutable.LinkedHashMap[String, Double]()
    runs("jhub") = timed(graft.pipelines.JhubMain.main(
      Array(s"$rawRoot/jhub", s"$stagingRoot/jhub", "all")))
    runs("zoom") = timed(graft.pipelines.ZoomMain.main(
      Array(s"$rawRoot/zoom", s"$stagingRoot/zoom", "air", "overwrite",
        "all")))
    runs("zoom_hst") = timed(graft.pipelines.ZoomHstMain.main(
      Array(s"$rawRoot/zoom", s"$stagingRoot/zoom_hst", "air", "overwrite",
        "all")))
    runs("vk") = timed(graft.pipelines.VkMain.main(
      Array(s"$rawRoot/vk", s"$stagingRoot/vk", "overwrite", "all")))
    runs("monkey") = timed(graft.pipelines.MonkeyMain.main(
      Array(s"$rawRoot/monkey", s"$stagingRoot/monkey", "overwrite")))
    // recount every staged table: the artifact must carry evidence the
    // runs staged real volume, not just that they didn't throw
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    val fs = new org.apache.hadoop.fs.Path(stagingRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    runs.keys.foreach { p =>
      val dir = new org.apache.hadoop.fs.Path(s"$stagingRoot/$p")
      if (fs.exists(dir)) fs.listStatus(dir).filter(_.isDirectory)
        .map(_.getPath).filterNot(_.getName.startsWith("_"))
        .sortBy(_.getName).foreach { t =>
          counts(s"$p/${t.getName}") =
            spark.read.parquet(t.toString).count()
        }
    }
    marks1t += Hostmark.mark1t()
    marksMt += Hostmark.markMt()
    val total = runs.values.sum
    val runsJson = runs.map { case (k, v) =>
      s""""$k":${Bench.trimZeros(f"$v%.2f")}""" }.mkString(",")
    val countsJson = counts.map { case (k, v) => s""""$k":$v""" }
      .mkString(",")
    spark.stop()
    org.apache.log4j.LogManager.getRootLogger
      .setLevel(org.apache.log4j.Level.OFF)
    println(s"""{"metric":"pipeline_total","value":${
      Bench.trimZeros(f"$total%.2f")},"unit":"sec","pipelines":{$runsJson},"staged_rows":{$countsJson},"hostmark_1t":${
      Bench.trimZeros(f"${marks1t.min}%.3f")},"hostmark_mt":${
      Bench.trimZeros(f"${marksMt.min}%.3f")},"hostmark_sink":${
      Hostmark.sinkValue},"raw":"$rawRoot"}""")
  }
}
