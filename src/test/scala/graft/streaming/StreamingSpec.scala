package graft.streaming

import java.nio.file.Files
import graft.pipeline.{SparkSuite, Transcripts}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {

  test("streaming parse: file-source micro-batches produce the batch result") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val input = s"$tmp/input"
    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"

    // Stage the transcript corpus as the streamed input.
    Transcripts.transcripts(spark, sfDir)
      .filter(col("turn_idx") % 2 === 0)
      .write.parquet(input)

    val q = StreamingParse.run(spark, input, out, ckpt)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$out/data")
    assert(streamed.filter(col("error").isNotNull).count() == 0)
    val batch = graft.pipeline.ParseStage.parsedTranscripts(spark, sfDir)
    assert(streamed.count() == batch.filter(col("error").isNull).count())
    // exactness: same multiset of (subj, pred, obj)
    val a = streamed.select("subj", "pred", "obj")
    val b = batch.select("subj", "pred", "obj")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("streaming resume: restart from checkpoint does not duplicate output") {
    val tmp = Files.createTempDirectory("graft_stream2").toString
    val input = s"$tmp/input"
    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    Transcripts.transcripts(spark, sfDir)
      .filter(col("turn_idx") % 2 === 0).limit(50)
      .write.parquet(input)

    StreamingParse.run(spark, input, out, ckpt).awaitTermination(120000)
    val n1 = spark.read.parquet(s"$out/data").count()
    // Restart with the same checkpoint: AvailableNow sees no new files.
    StreamingParse.run(spark, input, out, ckpt).awaitTermination(120000)
    val n2 = spark.read.parquet(s"$out/data").count()
    assert(n1 == n2, "restart must be exactly-once, not re-emit")
  }
}
