package graft.ops

import graft.pipeline.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GraphAnalyticsSpec extends SparkSuite {

  private def triplesOf(rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj")
      .withColumn("obj_type",
        when(col("obj").startsWith("<"), "iri")
          .when(col("obj").startsWith("_:"), "bnode")
          .otherwise("literal"))
      .withColumn("error", lit(null: String))
  }

  test("nodeEdges keeps IRI/bnode objects, drops literals and error rows, dedups multi-predicate pairs") {
    import spark.implicits._
    val t = triplesOf(Seq(
      ("<a>", "<p>", "<b>"),
      ("<a>", "<q>", "<b>"), // second predicate, same pair → one edge
      ("<a>", "<p>", "_:x"),
      ("<a>", "<p>", "\"lit\""),
    )).union(
      Seq(("bad", "bad", "bad", "iri", "boom")).toDF("subj", "pred", "obj", "obj_type", "error"))
    val edges = GraphAnalytics.nodeEdges(t).as[(String, String)].collect().toSet
    assert(edges == Set("<a>" -> "<b>", "<a>" -> "_:x"))
  }

  test("degreeHistogram: counts nodes per out-degree; totals reconcile with the triple table") {
    import spark.implicits._
    val t = triplesOf(Seq(
      ("<a>", "<p>", "<b>"), ("<a>", "<p>", "\"x\""), ("<a>", "<q>", "<c>"),
      ("<b>", "<p>", "<c>"),
      ("<c>", "<p>", "\"y\""),
    ))
    val hist = GraphAnalytics.degreeHistogram(t).as[(Long, Long)].collect().toMap
    assert(hist == Map(3L -> 1L, 1L -> 2L))
    // conservation: sum(degree * n_nodes) = rows, sum(n_nodes) = distinct subjects
    assert(hist.map { case (d, n) => d * n }.sum == 5L)
    assert(hist.values.sum == 3L)
  }

  test("twoHopCounts: counts distinct 2-hop endpoints; the celebrity cap excludes hot intermediates") {
    import spark.implicits._
    val edges = (Seq(("a", "hub"), ("a", "b"), ("b", "c")) ++
      (1 to 5).map(i => ("hub", s"x$i"))).toDF("src", "dst")
    val uncapped = GraphAnalytics.twoHopCounts(edges).as[(String, Long)].collect().toMap
    assert(uncapped == Map("a" -> 6L)) // c plus x1..x5
    // cap 3 < hub's out-degree 5: paths through hub vanish, only a→b→c stays
    val capped = GraphAnalytics.twoHopCounts(edges, maxMidOut = 3)
      .as[(String, Long)].collect().toMap
    assert(capped == Map("a" -> 1L))
  }

  test("triangleCount: a<b<c ordering counts each triangle exactly once") {
    import spark.implicits._
    // one triangle {a,b,c} + a dangling edge + a second triangle sharing an edge
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"), ("b", "d"),
      ("a", "z")).toDF("a", "b")
    // triangles: (a,b,c) and (a,b,d)
    val n = GraphAnalytics.triangleCount(edges).as[Long].head()
    assert(n == 2L)
  }

  test("pageRank: a cycle is a fixed point at exactly `scale`; a sink hub outranks its sources") {
    import spark.implicits._
    // 3-cycle: every node keeps passing its full rank along, so
    // 0.15*S + 0.85*S = S exactly — the integer recurrence has no drift
    val cycle = triplesOf(Seq(("<a>", "<p>", "<b>"), ("<b>", "<p>", "<c>"), ("<c>", "<p>", "<a>")))
    val r = GraphAnalytics.pageRank(cycle, iterations = 4).as[(String, Long)].collect().toMap
    assert(r == Map("<a>" -> 1000000000L, "<b>" -> 1000000000L, "<c>" -> 1000000000L))

    // star into <hub>: the hub accumulates its sources' mass
    val star = triplesOf((1 to 4).map(i => (s"<s$i>", "<p>", "<hub>")))
    val rs = GraphAnalytics.pageRank(star, iterations = 3).as[(String, Long)].collect().toMap
    assert(rs("<hub>") > rs("<s1>"))
    assert((1 to 4).map(i => rs(s"<s$i>")).toSet.size == 1) // sources symmetric
    // total mass never exceeds nodes × scale (dangling mass only leaks out)
    assert(rs.values.sum <= 5L * 1000000000L)
  }

  test("bfsDistances: shortest hop wins, visited nodes never resettle, maxHops truncates") {
    import spark.implicits._
    // diamond with a shortcut: s→a→b→c and s→c directly; plus unreachable z←y
    val edges = Seq(("s", "a"), ("a", "b"), ("b", "c"), ("s", "c"), ("y", "z"))
      .toDF("src", "dst")
    val seeds = Seq("s").toDF("node")
    val d3 = GraphAnalytics.bfsDistances(edges, seeds, maxHops = 3)
      .as[(String, Int)].collect().toMap
    // c is reachable at hop 1 (direct) and hop 3 (via a,b) — shortest wins
    assert(d3 == Map("s" -> 0, "a" -> 1, "c" -> 1, "b" -> 2))
    // maxHops = 1 drops b entirely
    val d1 = GraphAnalytics.bfsDistances(edges, seeds, maxHops = 1)
      .as[(String, Int)].collect().toMap
    assert(d1 == Map("s" -> 0, "a" -> 1, "c" -> 1))
    // two seeds: each node takes the min over seeds; a seed at distance>0
    // from the other seed still reports 0
    val d2 = GraphAnalytics.bfsDistances(edges, Seq("s", "b").toDF("node"), maxHops = 2)
      .as[(String, Int)].collect().toMap
    assert(d2 == Map("s" -> 0, "b" -> 0, "a" -> 1, "c" -> 1))
  }

  test("cooccurrence: counts conversations not occurrences, canonical a<b, celebrity cap drops mega-threads") {
    import spark.implicits._
    val occ = Seq(
      // conv1: A twice (collapses), B once → one (A,B) pair
      ("c1", "A"), ("c1", "A"), ("c1", "B"),
      // conv2: A and B again, plus C → (A,B) twice overall, (A,C), (B,C)
      ("c2", "A"), ("c2", "B"), ("c2", "C"),
    ).toDF("conv_id", "mention")
    val pairs = GraphAnalytics.cooccurrence(occ)
      .as[(String, String, Long)].collect().toSet
    assert(pairs == Set(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
    // cap 2: conv2 has 3 distinct mentions → excluded, only conv1's pair left
    val capped = GraphAnalytics.cooccurrence(occ, maxPerGroup = 2)
      .as[(String, String, Long)].collect().toSet
    assert(capped == Set(("A", "B", 1L)))
  }

  test("graph analytics over the parsed sf0.001 KG: histogram reconciles with adjacency, pagerank covers every linked node") {
    import graft.pipeline.ParseStage
    val triples = ParseStage.parsedTranscripts(spark, sfDir).toDF()
    val hist = GraphAnalytics.degreeHistogram(triples)
    val fromHist = hist.agg(sum(expr("degree * n_nodes"))).head().getLong(0)
    assert(fromHist == triples.filter(col("error").isNull).count())

    val edges = GraphAnalytics.nodeEdges(triples)
    val nNodes = edges.select("src").union(edges.select("dst")).distinct().count()
    assert(GraphAnalytics.pageRank(triples).count() == nNodes)
  }
}
