package graft

import org.apache.spark.sql.SparkSession

/** Auxiliary measurement entry points for the optimization rounds — the
  * frozen `graft.Bench` contract stays untouched; this main exists so plan
  * capture and noop-sink isolation (optimization guide §1.4) can be cited in
  * OPTIMIZATION_r*.md without touching the driver-hashed harness.
  *
  * Usage (env mirrors Bench):
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchExtra plans <outDir> [suffix]"
  *     → writes <outDir>/<query><suffix>.txt with .explain("formatted") for
  *       every registry query (streaming gates excluded: their envelope runs
  *       side-effecting staging writes; the interesting plans there are the
  *       micro-batch plans, not a batch explain).
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchExtra noop [q1,q2,...]"
  *     → times each query with the noop sink (computes every column, no
  *       count-path pruning), 2 runs, min reported, one JSON line.
  */
object BenchExtra {

  /** Streaming gates run checkpointed streaming queries inside the query
    * function; a batch explain would still execute the staging writes and
    * the stream. Skip them in plan capture. */
  private val streamingGates = Set(
    "kg_stream_ingest", "kg_stream_sessions", "kg_stream_attrib", "kg_stream_dedup",
    "kg_nt_roundtrip", "kg_nq_roundtrip")

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = session(cpus)
    args.headOption match {
      case Some("plans") =>
        val outDir = args(1)
        val suffix = if (args.length > 2) args(2) else ""
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
        for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
             if !streamingGates(name) && only.forall(_.contains(name))) {
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), plan)
            println(s"[plans] wrote $name")
          } catch {
            case e: Exception => System.err.println(s"[plans] $name failed: ${e.getMessage}")
          }
        }
      case Some("noop") =>
        val only = args.lift(1).map(_.split(",").toSet)
        val runs = sys.env.get("SPARK_GRAFT_QUERY_RUNS").flatMap(_.toIntOption).getOrElse(2)
        val results = for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
                           if only.forall(_.contains(name))) yield {
          spark.sparkContext.setJobDescription(s"noop:$name")
          val times = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            } catch {
              case e: Exception =>
                System.err.println(s"[noop] $name failed: ${e.getMessage}"); -1.0
            }
          }
          val ok = times.filter(_ >= 0)
          name -> (if (ok.nonEmpty) ok.min else -1.0)
        }
        val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
        println(f"""{"metric":"noop_total","value":${results.map(_._2).sum}%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
      case Some("streamprobe") =>
        streamProbe(spark, sfDir)
      case Some("abassign") =>
        abAssign(spark, sfDir)
      case other =>
        System.err.println(s"usage: BenchExtra plans <outDir> [suffix] | noop [q1,q2,...] | streamprobe; got $other")
        sys.exit(2)
    }
    spark.stop()
  }

  /** Interleaved A/B of the r7 map-side argmax/argmin assignment kernels
    * against their defining aggregate formulations (guide §1: the VM's
    * weather swings full-suite runs by ±30%; alternating both forms inside
    * one JVM cancels it to first order). Noop sink — every column computed.
    * A = defining groupBy aggregate, B = map-side native kernel. */
  private def abAssign(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val e = Similarity.withNorms(emb)
    val cb = Similarity.coarseCodebook(e, 16)
    def t(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "assignA" -> (() => Similarity.coarseAssignByAgg(e, cb)),
      "assignB" -> (() => Similarity.coarseAssign(e, cb)),
      "pqA" -> (() => Similarity.pqCodesByAgg(emb, dim = 64)),
      "pqB" -> (() => Similarity.pqCodes(emb, dim = 64)),
      "ivfTrainedB" -> (() => Similarity.ivfTopK(emb, 16, 5, trainIters = 2)),
      "pqTrainedB" -> (() => Similarity.pqCodes(emb, dim = 64, trainIters = 2)))
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").flatMap(_.toIntOption).getOrElse(5)
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 1 to reps; (name, f) <- cases) {
      spark.sparkContext.setJobDescription(s"ab:$name#$r")
      acc(name) = t(f()) :: acc(name)
    }
    val out = cases.map { case (name, _) =>
      f""""$name":${acc(name).min}%.3f"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"abassign_min","reps":$reps,"queries":$out,"sf":"$sfDir"}""")
  }

  /** Stage-isolated timing of the streaming gates' envelope pieces
    * (guide §1: find where the seconds actually go before touching the
    * operators). Mirrors the SparkEntry staging shapes without the gates'
    * result contract — measurement only. */
  private def streamProbe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val ev = t("read events (count)") {
      val d = ss.read.parquet(s"$sfDir/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("event_id"), col("event_type"), col("value"))
      d.count(); d
    }
    t("stage clicks coalesce(1)") {
      ev.filter(col("event_type") === "click").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/c")
    }
    t("stage purchases coalesce(1)") {
      ev.filter(col("event_type") === "purchase").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/p")
    }
    t("stage clicks repartition(1)") {
      ev.filter(col("event_type") === "click").repartition(1)
        .write.mode("overwrite").parquet(s"$root/c2")
    }
    val q = t("attrib stream: plan+run (1 micro-batch)") {
      val cs = ss.readStream.schema(ev.schema).parquet(s"$root/c")
      val ps = ss.readStream.schema(ev.schema).parquet(s"$root/p")
      val out = graft.streaming.StreamingJoins.clickAttribution(cs, ps)
        .select(col("user_id"), col("click_id"), col("purchase_id"))
      val sq = out.writeStream.format("parquet")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      sq.awaitTermination(); sq
    }
    println(s"[probe] attrib batches: ${q.recentProgress.length}")
    q.recentProgress.foreach(p => println(
      s"[probe]   batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}"))
    t("read back (count)") { ss.read.parquet(s"$root/out").count() }

    // sessions shape: 1 real file + sentinels, maxFilesPerTrigger=1
    val batch = ss.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_id"))
    t("sessions stage real coalesce(1)") {
      batch.coalesce(1).write.mode("overwrite").parquet(s"$root/sin")
    }
    val mxMs = batch.agg(max(col("ts"))).head().getTimestamp(0).getTime
    t("sessions stage 2 sentinels") {
      Seq(1, 2).foreach { d =>
        ss.range(1).select(lit(-d.toLong).as("user_id"),
            timestamp_millis(lit(mxMs + d * 86400000L)).as("ts"),
            lit(-d.toLong).as("event_id"))
          .coalesce(1).write.mode("append").parquet(s"$root/sin")
      }
    }
    val q2 = t("sessions stream (3 files, mfpt=1)") {
      val src = ss.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/sin")
      val sq = graft.streaming.StreamingJoins.sessionize(ss, src).toDF()
        .filter(col("user_id") >= 0)
        .select(col("user_id"), unix_micros(col("session_start")).as("s"))
        .writeStream.format("parquet")
        .option("path", s"$root/sout").option("checkpointLocation", s"$root/sckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      sq.awaitTermination(); sq
    }
    println(s"[probe] sessions batches: ${q2.recentProgress.length}")
    q2.recentProgress.foreach(p => println(
      s"[probe]   batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}"))
    t("sessions read back (count)") { ss.read.parquet(s"$root/sout").count() }
  }
}
