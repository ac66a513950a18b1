package graft.sources

import graft.pipeline.{Materialize, ParseStage, SparkSuite}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The N-Triples/N-Quads source: sink → source round trip is the identity on
  * the canonical term-text columns, malformed lines go to the error channel,
  * and the scanner survives the hard tokens (literals with spaces and
  * escaped quotes, language/direction/datatype suffixes, nested RDF 1.2
  * triple terms containing ')>>'-lookalike literal text). */
class NTriplesSpec extends SparkSuite {

  private def parsedSample() = {
    import spark.implicits._
    val docs = Seq(
      ("c1", 0,
        """<?xml version="1.0"?>
          |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:eg="http://e.org/" rdf:version="1.2">
          |  <rdf:Description rdf:about="http://e.org/a" xml:lang="en">
          |    <eg:name>spaced out "quoted" value</eg:name>
          |    <eg:n rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</eg:n>
          |    <eg:friend rdf:nodeID="x"/>
          |    <eg:claim rdf:parseType="Triple">
          |      <rdf:Description rdf:about="http://e.org/s"><eg:p>inner )&gt;&gt; text</eg:p></rdf:Description>
          |    </eg:claim>
          |  </rdf:Description>
          |</rdf:RDF>""".stripMargin),
    ).toDF("conv_id", "turn_idx", "text")
    ParseStage.parseTurns(docs).toDF()
  }

  test("ntriples sink -> source round trip is the identity on term columns") {
    val rows = parsedSample()
    val dir = Files.createTempDirectory("graft_nt").toString
    Materialize.ntriples(rows, dir)
    val back = NTriples.read(spark, dir)
    assert(back.filter(col("error").isNotNull).count() == 0)
    val expected = rows.filter(col("error").isNull)
      .select("subj", "pred", "obj").collect().map(_.toSeq).toSet
    val got = back.select("subj", "pred", "obj").collect().map(_.toSeq).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.exists(_.exists(v => v.toString.contains("<<(")))) // triple term survived
  }

  test("nquads sink -> source round trip preserves the graph column") {
    import spark.implicits._
    val rows = Seq(
      ("<http://e.org/s>", "<http://e.org/p>", "\"v w\"@en--ltr", "http://e.org/g", null: String),
      ("<http://e.org/s>", "<http://e.org/p>", "_:b0", null: String, null: String),
    ).toDF("subj", "pred", "obj", "graph", "error")
    val dir = Files.createTempDirectory("graft_nq").toString
    Materialize.nquads(rows, dir)
    val back = NTriples.readQuads(spark, dir).filter(col("error").isNull)
      .select("subj", "pred", "obj", "graph").collect().map(_.toSeq).toSet
    assert(back == Set(
      Seq("<http://e.org/s>", "<http://e.org/p>", "\"v w\"@en--ltr", "<http://e.org/g>"),
      Seq("<http://e.org/s>", "<http://e.org/p>", "_:b0", null)))
  }

  test("W3C grammar: terms directly followed by the terminating dot, interior label dots, trailing comments") {
    // All spec-valid per the N-Triples grammar (r3 ADVICE): a blank-node
    // label or language tag may abut the statement dot, '.' is a legal
    // INTERIOR blank-node-label character, and a comment may follow the dot.
    val dir = Files.createTempDirectory("graft_nt_w3c")
    Files.write(dir.resolve("in.nt"),
      ("<http://e.org/s> <http://e.org/p> _:b0.\n" +
        "<http://e.org/s> <http://e.org/p> \"x\"@en.\n" +
        "<http://e.org/s> <http://e.org/p> \"x\"@en--ltr. # dir tag abutting dot\n" +
        "<http://e.org/s> <http://e.org/p> <http://e.org/o> . # trailing comment\n" +
        "_:a.b <http://e.org/p> _:c.d .\n" +
        "_:a.b <http://e.org/p> _:c.d. # interior dots AND abutting terminator\n").getBytes("UTF-8"))
    val out = NTriples.read(spark, dir.toString)
    val errs = out.filter(col("error").isNotNull).select("error").collect().map(_.getString(0))
    assert(errs.isEmpty, errs.mkString("; "))
    val objs = out.select("obj").collect().map(_.getString(0)).toSeq
    assert(objs.count(_ == "_:b0") == 1)
    assert(objs.count(_ == "\"x\"@en") == 1)
    assert(objs.count(_ == "\"x\"@en--ltr") == 1)
    assert(objs.count(_ == "_:c.d") == 2)
    assert(out.filter(col("subj") === "_:a.b").count() == 2)
  }

  test("comments and blank lines skipped; malformed lines go to the error channel") {
    val dir = Files.createTempDirectory("graft_nt_err")
    Files.write(dir.resolve("in.nt"),
      ("# a comment\n" +
        "\n" +
        "<http://e.org/s> <http://e.org/p> \"ok \\\" quote\"^^<http://e.org/dt> .\n" +
        "<http://e.org/s> <http://e.org/p> \"unterminated .\n" +
        "<http://e.org/s> <http://e.org/p> <http://e.org/o> extra .\n" +
        "<http://e.org/s> <http://e.org/p> <http://e.org/o>\n").getBytes("UTF-8"))
    val out = NTriples.read(spark, dir.toString)
    assert(out.count() == 4) // 2 comment/blank lines produce nothing
    assert(out.filter(col("error").isNull).count() == 1)
    val errs = out.filter(col("error").isNotNull).select("error").collect().map(_.getString(0))
    assert(errs.exists(_.startsWith("Unterminated literal")))
    assert(errs.exists(_.startsWith("Unexpected term start"))) // 'extra' after 3 terms
    assert(errs.exists(_.startsWith("Missing terminating '.'")))
  }
}
