package graft.pipeline

import graft.SparkEntry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Physical-plan hygiene: the properties that make these operators behave
  * at 100 TB are asserted from the actual optimized plans, not hoped for —
  * filter pushdown into the parquet scan, broadcast joins where a side is
  * small, partial aggregation, and a shuffle-free parse path.
  */
class PlanSpec extends SparkSuite {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("q3_join: dimension filter is pushed into the parquet scan") {
    val p = plan(q("q3_join"))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("q_broadcast: both dims join as broadcast hash joins") {
    val p = plan(q("q_broadcast"))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("parse path is shuffle-free (no Exchange below the mapPartitions)") {
    // parseTurns over a stored transcript table: scan → project → parse.
    import spark.implicits._
    val stored = Seq(("c1", 0, "<x/>")).toDF("conv_id", "turn_idx", "text")
    val p = plan(ParseStage.parseTurns(stored).toDF())
    assert(!p.contains("Exchange"), p)
  }

  test("parse stage prunes columns before the opaque typed map") {
    // Reading from a parquet table with extra columns: the scan must read
    // only conv_id, turn_idx, text.
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/t"
    Transcripts.transcripts(spark, sfDir).write.parquet(dir)
    val p = plan(ParseStage.parseTurns(spark.read.parquet(dir)).toDF())
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("conv_id") && readSchema.contains("text"), p)
    assert(!readSchema.contains("role") && !readSchema.contains("ts"), readSchema)
  }

  test("broadcast-dictionary linking uses a broadcast join, not a shuffle join") {
    val p = plan(q("kg_linked"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("shingle DF cap plans as an anti-join; no cartesian products anywhere in blocking") {
    // Pin the anti-join on the capped-shingle building block itself: inside
    // ngramJaccardPairs it now sits behind the eager localCheckpoint cut
    // (the thrice-consumed frame is materialized once), so the composed
    // query's plan string no longer shows the pre-cut subplan.
    val docs = Transcripts.documents(spark, sfDir).select("doc_id", "text")
    val capped = Linking.capShingleDf(
      graft.ops.Dedup.wordShingleRows(docs, "doc_id", "text"), Linking.DefaultMaxShingleDf)
    assert(plan(capped).contains("LeftAnti"))
    assert(!plan(capped).contains("CartesianProduct"))
    // the substring ops' pre-cut frames are narrow projections — any Join
    // appearing there would mean the shape regressed
    val anchors = graft.ops.Dedup.substringAnchorRows(docs, 8, 3L)
    assert(!plan(anchors).contains("Join"), plan(anchors))
    // every blocking/candidate path must be an equi-join shape — a
    // CartesianProduct here is the O(n²) plan the whole design avoids
    Seq("dedup_ngram_pairs", "dedup_minhash", "dedup_simhash", "dedup_substring",
        "kg_link_edges", "kg_lsh_candidates", "sim_lsh_topk", "sim_lsh_neardup").foreach { name =>
      assert(!plan(q(name)).contains("CartesianProduct"), name)
    }
  }

  test("MinHash signature stage is shuffle-free (per-row minhash_sig, no Exchange)") {
    import spark.implicits._
    val p = plan(Linking.minhashSignatures(Seq("Supplier#3").toDF("mention")))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("HashAggregate"), p) // no agg — the signature is a projection
  }

  test("MinHash/SimHash signatures stay in whole-stage codegen (no typed-object barrier)") {
    import spark.implicits._
    val df = Linking.minhashSignatures(Seq("Supplier#3").toDF("mention"))
    val p = plan(df)
    assert(!p.contains("SerializeFromObject") && !p.contains("MapGroups"), p)
    val ps = plan(graft.ops.Dedup.simhash(Seq((1L, "a b")).toDF("doc_id", "text")))
    assert(!ps.contains("SerializeFromObject") && !ps.contains("Exchange"), ps)
    // AQE defers codegen until execution — build the same plan with AQE off
    // to prove the native expressions compile into whole-stage generated code.
    // (Range-backed input: ConvertToLocalRelation constant-folds a local Seq
    // through the projection at optimize time, leaving no codegen stage. The
    // shingle `transform` lambda is a CodegenFallback higher-order function —
    // that projection is interpreted either way, exactly as it was feeding
    // the old Generate/explode — so the codegen proof uses a CreateArray
    // input: what matters is that the NATIVE expressions compile.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.functions.{array, concat, lit, col}
      import graft.functions.{GraftFunctions => F}
      val ranged = spark.range(4).select(concat(lit("Supplier#"), col("id")).as("mention"))
      val cg = ranged
        .select(F.minhash_sig(array(col("mention"))).as("sig"),
          F.simhash64(col("mention")).as("sh"))
        .queryExecution.explainString(ExplainMode.fromString("codegen"))
      assert(cg.contains("WholeStageCodegen"), cg.take(2000))
      assert(cg.contains("minhashSig"), cg.take(2000))
      assert(cg.contains("simhash64"), cg.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("materialized triple layout supports partition pruning on pred_bucket") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_bucket").toString
    val rows = Seq(
      ("c1", 0, "<s1>", "<p1>", "<o1>", null: String),
      ("c1", 0, "<s2>", "<p2>", "<o2>", null: String),
    ).toDF("conv_id", "turn_idx", "subj", "pred", "obj", "error")
    Materialize.triples(rows, dir)
    val back = spark.read.parquet(s"$dir/data").filter($"pred_bucket" === 3)
    val p = plan(back)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("pred_bucket"), p)
  }

  test("bucketed triple table: subject self-join is exchange-free (co-located buckets)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = ParseStage.parseTurns(
      Transcripts.transcripts(spark, sfDir).filter(col("turn_idx") % 2 === 0).limit(50)).toDF()
    Materialize.bucketedTriples(rows, "graft_bucketed_test", subjBuckets = 4)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("graft_bucketed_test")
      val joined = t.as("x").join(t.as("y"), "subj")
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p) // both sides come pre-bucketed
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_test")
    }
  }

  test("brute-force top-k broadcasts the query side") {
    val p = plan(q("sim_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("rdfxml DSv2 scan reports file-size statistics: small RDF/XML side auto-broadcasts") {
    // Without SupportsReportStatistics a DSv2 relation sizes as
    // spark.sql.defaultSizeInBytes (infinite) and would ALWAYS sort-merge.
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    for (i <- 1 to 3) {
      val xml = s"""<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://example.org/">
        |  <rdf:Description rdf:about="http://example.org/d$i"><ex:n>$i</ex:n></rdf:Description>
        |</rdf:RDF>""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"d$i.rdf"), xml.getBytes("UTF-8"))
    }
    val small = spark.read.format("rdfxml").load(dir).select("subj", "obj")
    val big = spark.range(100000).selectExpr("concat('<http://example.org/d', id, '>') as subj", "id")
    // Threshold BELOW big's own size estimate (~MBs for 100k string rows):
    // if the rdfxml relation regressed to defaultSizeInBytes (infinite),
    // NEITHER side is broadcastable and the join sort-merges — without this
    // pin the test passed vacuously because big itself was under the 10 MB
    // default and the planner broadcast the wrong (probe) side.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try {
      val p = plan(big.join(small, "subj")) // NO explicit broadcast() hint
      assert(p.contains("BroadcastHashJoin"), p)
      assert(p.contains("BuildRight"), p) // the rdfxml (right) side is the one broadcast
      assert(!p.contains("SortMergeJoin"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("sim LSH queries plan with ZERO driver-side probe jobs when dim is explicit") {
    // r3 verdict: hyperplaneBuckets ran a limit(1).collect() per call to
    // learn the embedding dim — an extra Spark job on every sim query and a
    // scan-pruning hazard at corpus scale. With dim passed (as the
    // SparkEntry queries now do), constructing the plan must launch no job.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.schema // parquet schema inference runs its own job; exclude it
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        names.add(js.stageInfos.map(_.name).mkString("|"))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df1 = graft.ops.Similarity.lshTopK(e, 16, 5, dim = 64)
      val df2 = graft.ops.Similarity.lshNearDupPairs(e, 0.35, dim = 64)
      df1.queryExecution.optimizedPlan // force analysis + optimization
      df2.queryExecution.optimizedPlan
      // Sentinel job: the listener bus is FIFO, so once the sentinel's
      // JobStart has been observed, any probe job launched during plan
      // construction would have been counted already. An RDD count is
      // exactly one job (an SQL count under AQE is two).
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(jobs.get() == 1,
        s"plan construction launched ${jobs.get() - 1} extra Spark job(s): " +
          names.toArray.mkString("; "))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("text_bpe_tokens is map-only: plan-time vocab, no Exchange, no broadcast, pruned read") {
    val p = plan(q("text_bpe_tokens"))
    assert(!p.contains("Exchange"), p) // the vocab rides INSIDE the expression
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema") && !p.contains("lang") && !p.contains("source"), p)
    assert(p.contains("bpecount"), p)
  }

  test("text_pii and text_repetition are map-only: scan → project, no Exchange, pruned read") {
    for (name <- Seq("text_pii", "text_repetition")) {
      val p = plan(q(name))
      assert(!p.contains("Exchange"), s"$name: $p")
      // only the needed columns reach the scan (doc_id + text)
      assert(p.contains("ReadSchema") && !p.contains("lang") && !p.contains("source"),
        s"$name: $p")
    }
  }

  test("text_filter (rule gate) is map-only: every rule runs in the scan's projection") {
    val p = plan(q("text_filter"))
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema") && !p.contains("lang") && !p.contains("source"), p)
    // single evaluation: the token array and the rule cascade are each bound
    // once — CollapseProject must NOT inline the non-cheap aliases into
    // their multiple uses (each inlining would re-split/re-sort per use)
    assert("array_sort".r.findAllIn(p).length == 1, p)
    assert("split\\(text".r.findAllIn(p).length == 1, p)
  }

  test("text_decontaminate: eval grams broadcast; corpus gram index never shuffles") {
    val df = q("text_decontaminate")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // The eval-match join must be map-side over the corpus scan: SOME
    // BroadcastHashJoin's streamed (probe) subtree contains no shuffle —
    // i.e. the corpus gram index reaches its first join without an
    // Exchange. If the broadcast regressed to a shuffle join this fails.
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val bhj = df.queryExecution.sparkPlan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, p)
    val mapSide = bhj.exists { j =>
      val streamed = if (j.buildSide == BuildRight) j.left else j.right
      streamed.collect { case e: ShuffleExchangeLike => e }.isEmpty
    }
    assert(mapSide, p)
  }

  test("graph analytics: every join is an equi-join, aggregations combine map-side") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val triples = Seq(("<a>", "<p>", "<b>", "iri"), ("<b>", "<p>", "<c>", "iri"))
      .toDF("subj", "pred", "obj", "obj_type")
      .withColumn("error", lit(null: String))
    val edges = graft.ops.GraphAnalytics.nodeEdges(triples)

    // degree histogram: two stacked aggregates, both with a partial phase
    val ph = plan(graft.ops.GraphAnalytics.degreeHistogram(triples))
    assert("partial_count".r.findAllIn(ph).length >= 2, ph)

    // 2-hop and triangles: equi-joins only — a CartesianProduct here is the
    // O(|V|²) plan the celebrity cap / ordered-edge design exists to avoid
    val p2 = plan(graft.ops.GraphAnalytics.twoHopCounts(edges))
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoop"), p2)
    val pt = plan(graft.ops.GraphAnalytics.triangleCount(
      Seq(("a", "b")).toDF("a", "b")))
    assert(!pt.contains("CartesianProduct") && !pt.contains("BroadcastNestedLoop"), pt)

    // PageRank's per-iteration plan (what repeats at scale): contribution
    // aggregation is a partial+final HashAggregate over equi-joins
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ranks = edges.select(col("src").as("node")).distinct()
      .withColumn("rank_fp", lit(1000000000L))
    val contribs = edges.join(outdeg, "src")
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), expr("rank_fp div outdeg").as("c"))
      .groupBy("node").agg(sum("c").as("contrib"))
    val pc = plan(contribs)
    assert(!pc.contains("CartesianProduct"), pc)
    assert(pc.contains("partial_sum"), pc)
  }

  test("PQ encode and IVF assignment are map-side: no shuffle Exchange touches the corpus (r7)") {
    // The argmax/argmin kernels replaced the explode + groupBy(vec_id)
    // aggregates whose exchange carried the full embedding column — at
    // corpus scale a full shuffle per Lloyd iteration / encode pass. The
    // only exchanges allowed in pqCodes' plan are broadcast builds of the
    // bounded codebook; coarse assignment may additionally keep the
    // SinglePartition collect of the ≤ nCells codebook rows, but no
    // hash-partitioned exchange may consume the embeddings scan.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pp = plan(graft.ops.Similarity.pqCodes(e, dim = 64))
    assert(!pp.contains("+- Exchange") && !pp.contains(": Exchange"), pp) // broadcast-only
    assert(pp.contains("argminsql2") || pp.contains("argmin_sql2"), pp)
    val en = graft.ops.Similarity.withNorms(e)
    val pa = plan(graft.ops.Similarity.coarseAssign(
      en, graft.ops.Similarity.coarseCodebook(en, 16)))
    // the corpus side: Scan parquet must reach the BroadcastNestedLoopJoin
    // (the 1-row codebook attach) without an Exchange above it
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val sp = graft.ops.Similarity.coarseAssign(
      en, graft.ops.Similarity.coarseCodebook(en, 16)).queryExecution.sparkPlan
    val bnl = sp.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.nonEmpty, pa)
    assert(bnl.forall(j => j.left.collect { case x: ShuffleExchangeLike => x }.isEmpty), pa)
    assert(pa.contains("argmaxcos") || pa.contains("argmax_cos"), pa)
  }

  test("ivfPqTopK never broadcasts the candidate frame (O(corpus) — shuffle equi-join on vec_id)") {
    // r5 verdict: the candidate set is ≈ n·nProbe/nCells rows — an explicit
    // broadcast(cand) is a driver-OOM at index scale. With auto-broadcast
    // disabled, any BroadcastHashJoin in the static plan can only come from
    // an explicit hint; the cand⋈codes join (the ONLY vec_id equi-join in
    // the composed plan) must sort-merge, while the genuinely bounded
    // frames (probe set, PQ codebook, LUT) keep their broadcast hints.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val p = plan(graft.ops.Similarity.ivfPqTopK(e, 16, 5, dim = 64))
      // formatted mode lists join keys in the details section
      assert(p.contains("SortMergeJoin"), p)
      assert("Left keys \\[1\\]: \\[vec_id".r.findAllIn(p).nonEmpty, p)
      assert(p.contains("BroadcastHashJoin"), p) // bounded frames still broadcast
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("dictionary encode is map-only (content-hash ids, no Exchange, no join)") {
    // over a STORED triple table (the materialized snapshot a consumer
    // encodes), not the parse pipeline — whose own reconstruction window
    // legitimately shuffles upstream of the encode projection. Parquet, not
    // a local Seq: constant folding evaluates fnv1a64 over literal rows at
    // plan time and leaves only a LocalTableScan to inspect.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dict").toString + "/t"
    Seq(("<s>", "<p>", "<o>")).toDF("subj", "pred", "obj").write.parquet(dir)
    val p = plan(Materialize.encodeTriples(spark.read.parquet(dir)))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("fnv1a64"), p)
  }
}
