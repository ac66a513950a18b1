package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkEntry

/** The seeded-celebrity contract (r4 verdict "Next round" #1): the doc-11
  * skew must make every celebrity/bucket cap EXCLUDE rows at the smallest
  * scale factor — so the driver's hash gate pins firing caps, not caps that
  * exist only in plans and specs.
  */
class CapSeedSpec extends SparkSuite {

  test("kg_cap_fired: all four exclusion counts are non-zero at sf0.001") {
    val rows = SparkEntry.queries("kg_cap_fired")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("cooccur_group", "lsh_bucket", "shingle_df", "twohop_mid"))
    rows.foreach { case (cap, n) => assert(n > 0, s"cap $cap never fired (n=$n)") }
    // the binary-mention burst collides in every one of the 8 bands
    assert(rows("lsh_bucket") == Linking.Bands.toLong)
  }

  test("the celebrity burst is 1030 DISTINCT mentions with ONE shared shingle set") {
    val t = Transcripts.transcripts(spark, sfDir)
      .filter(col("conv_id") === s"conv-${Transcripts.HubDoc % Transcripts.Convs}"
        && col("turn_idx") % 2 === 1)
    val burst = Ner.mentions(t)
      .filter(col("mention").startsWith("Supplier#1") && length(col("mention")) > 12)
      .select("mention").distinct()
    assert(burst.count() >= Transcripts.HubMentions)
    val nSets = burst.select(Linking.shinglesCol("mention").as("sh"))
      .select(array_join(array_sort(col("sh")), ",").as("key"))
      .distinct().count()
    assert(nSets == 1, s"binary mentions must share one shingle set, got $nSets")
  }

  test("cooccurrence excludes the hub conversation; twoHopCounts excludes the hub mid") {
    val t = Transcripts.transcripts(spark, sfDir)
    val hubConv = s"conv-${Transcripts.HubDoc % Transcripts.Convs}"
    // with the cap: no pair can carry a count only conv-11 could give it —
    // directly: the capped distinct frame excludes conv-11 entirely
    val m = Ner.mentions(t).select("conv_id", "mention").distinct()
    val hubN = m.filter(col("conv_id") === hubConv).count()
    assert(hubN > 256, s"hub conversation only has $hubN distinct mentions")

    val edges = graft.ops.GraphAnalytics.nodeEdges(
      ParseStage.parsedTranscripts(spark, sfDir).toDF()).localCheckpoint(true)
    val hub = s"<${Transcripts.Base}hub>"
    val hubOut = edges.filter(col("src") === hub).count()
    assert(hubOut > 1024, s"hub out-degree $hubOut does not exceed the mid cap")
    // d11's two-hop count must NOT include the hub's fan-out
    val d11 = s"<${Transcripts.Base}d${Transcripts.HubDoc}>"
    val twoHop = graft.ops.GraphAnalytics.twoHopCounts(edges)
      .filter(col("src") === d11).collect()
    val viaHub = twoHop.headOption.map(_.getLong(1)).getOrElse(0L)
    assert(viaHub < hubOut, s"2-hop count $viaHub suggests the hub mid was not cut")
  }
}
