package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.sinks.{JdbcSink, MockServingSink, ServingSink}
import graft.sources.Tables

/** O1: the per-pipeline CLI contracts, mirroring the reference's argv
  * shapes (zoom_proc.py:314-337, vk_proc.py:319-336, monkey_proc.py:
  * 219-233, jhub_proc.py:249-276) with the lake location made explicit:
  *
  *   JhubMain   <rawDir> <stagingDir> [all]         — default: previous hour
  *   ZoomMain   <rawDir> <stagingDir> <head air|hst|all> <mode> <date|all>
  *   ZoomHstMain <rawDir> <stagingDir> <head air|hst|all> <mode> <date|all>
  *   VkMain     <rawDir> <stagingDir> <mode> <date|all>
  *   MonkeyMain <rawDir> <stagingDir> [overwrite]
  *
  * The serving sink comes from GRAFT_JDBC_URL/USER/PASSWORD env vars;
  * absent those, a mock sink (parquet staging remains the system of
  * record), matching the harness's no-Postgres environment.
  */
object PipelineCli {

  def parseMode(s: String): SaveMode = s match {
    case "overwrite" => SaveMode.Overwrite
    case "append"    => SaveMode.Append
    case other => throw new IllegalArgumentException(
      s"mode must be overwrite|append, got '$other'")
  }

  /** jhub's incremental default: the previous hour as zero-padded path
    * segments (jhub_proc.py:268-276); "all" widens to wildcards.
    */
  def hourGlob(now: java.time.ZonedDateTime, all: Boolean): String =
    if (all) "year=*/month=*/day=*/hour=*"
    else {
      val prev = now.minusHours(1)
      f"year=${prev.getYear}%04d/month=${prev.getMonthValue}%02d/" +
        f"day=${prev.getDayOfMonth}%02d/hour=${prev.getHour}%02d"
    }

  def sinkFromEnv(env: Map[String, String] = sys.env): ServingSink =
    env.get("GRAFT_JDBC_URL") match {
      case Some(url) => new JdbcSink(url, env.getOrElse("GRAFT_JDBC_USER", ""),
        env.getOrElse("GRAFT_JDBC_PASSWORD", ""))
      case None => new MockServingSink
    }

  def session(): SparkSession =
    graft.SessionFactory.session(appName = "graft-pipeline")

  def now(): Timestamp = new Timestamp(System.currentTimeMillis())

  def finish(ctx: PipelineContext): Unit = {
    ctx.report.foreach {
      case (t, Right(r)) =>
        println(s"[graft] $t: staged=${r.rows} served=${r.served} consistent=${r.consistent}")
      case (t, Left(e)) =>
        System.err.println(s"[graft] $t FAILED: ${e.getMessage}")
    }
    if (ctx.failed.nonEmpty) sys.exit(1)
  }
}

object JhubMain {
  /** `all` reprocesses every hour partition (overwrite); `stream` drains
    * the whole input dir through the checkpointed file stream instead of
    * hour globs — the engine's incrementality upgrade over the
    * reference's previous-hour masks (Streams.jhubStream).
    */
  def main(args: Array[String]): Unit = {
    val Array(rawDir, stagingDir, rest @ _*) = args: @unchecked
    val spark = PipelineCli.session()
    if (rest.contains("stream")) {
      val schema = spark.read.json(s"$rawDir/*/*/*/*/*.json").schema
      val q = graft.streaming.Streams.jhubStream(spark, rawDir, schema,
        s"$stagingDir/jhublogs", s"$stagingDir/_checkpoints/jhublogs").start()
      q.awaitTermination()
    } else {
      val all = rest.contains("all")
      val glob = s"$rawDir/${PipelineCli.hourGlob(java.time.ZonedDateTime.now(), all)}/*.json"
      val mode = if (all) SaveMode.Overwrite else SaveMode.Append
      val ctx = new PipelineContext(spark, PipelineCli.sinkFromEnv(),
        stagingDir, mode)
      JhubPipeline.run(ctx, glob)
      PipelineCli.finish(ctx)
    }
  }
}

object ZoomMain {
  /** Daily pipeline; `head` selects the raw bucket family only
    * (zoom_proc.py:324-337 — hst|air are BUCKET heads, not variants).
    */
  def main(args: Array[String]): Unit = {
    val Array(rawDir, stagingDir, head, modeS, date) = args: @unchecked
    val ctx = new PipelineContext(PipelineCli.session(),
      PipelineCli.sinkFromEnv(), stagingDir, PipelineCli.parseMode(modeS))
    ZoomPipeline.run(ctx,
      ZoomMains.meetingsGlob(rawDir, head, date),
      ZoomMains.participantsGlob(rawDir))
    PipelineCli.finish(ctx)
  }
}

/** History pipeline — the reference's SEPARATE zoom_proc_hst.py script:
  * the hst_* tables can be built over ANY bucket head (air|hst|all,
  * zoom_proc_hst.py:336-349); the variant is the script, not the head.
  */
object ZoomHstMain {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, stagingDir, head, modeS, date) = args: @unchecked
    val ctx = new PipelineContext(PipelineCli.session(),
      PipelineCli.sinkFromEnv(), stagingDir, PipelineCli.parseMode(modeS))
    ZoomPipeline.runHst(ctx,
      ZoomMains.meetingsGlob(rawDir, head, date),
      ZoomMains.participantsGlob(rawDir), PipelineCli.now())
    PipelineCli.finish(ctx)
  }
}

private object ZoomMains {
  def meetingsGlob(rawDir: String, head: String, date: String): String = {
    val h = if (head == "all") "*" else head
    Tables.datedGlob(rawDir,
      s"$h-meetings-logs-{date}*/meetings_logs_{date}*.json", date)
  }
  def participantsGlob(rawDir: String): String =
    s"$rawDir/*-meetings-data/*/participants_*.json"
}

object VkMain {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, stagingDir, modeS, date) = args: @unchecked
    val mode = PipelineCli.parseMode(modeS)
    val ctx = new PipelineContext(PipelineCli.session(),
      PipelineCli.sinkFromEnv(), stagingDir, mode)
    VkPipeline.run(ctx,
      Tables.datedGlob(rawDir, "*{date}*/gsom_ma.json", date),
      Tables.datedGlob(rawDir, "*{date}*/members_full_group_gsom_ma.json", date),
      Tables.datedGlob(rawDir, "*{date}*/wall_owner_id_*.json", date),
      PipelineCli.now())
    PipelineCli.finish(ctx)
  }
}

object MonkeyMain {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, stagingDir, rest @ _*) = args: @unchecked
    val mode = if (rest.contains("overwrite")) SaveMode.Overwrite else SaveMode.Append
    val ctx = new PipelineContext(PipelineCli.session(),
      PipelineCli.sinkFromEnv(), stagingDir, mode)
    MonkeyPipeline.run(ctx, s"$rawDir/details/survey_*.json",
      s"$rawDir/responses/responses_*.json", PipelineCli.now())
    PipelineCli.finish(ctx)
  }
}
