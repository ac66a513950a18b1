package graft.rdf

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The north_rule metric, computed: micro-averaged triple precision/recall
  * of our parser against the reference's expected quads over every positive
  * case of the extracted behavior corpus (test/RdfXmlParser-test.ts), plus
  * the error-taxonomy agreement rate. Gate: P/R ≥ 0.95 (BASELINE.json);
  * actual is 1.0 — ReferenceCasesSpec pins each case individually, this
  * spec aggregates the corpus-level number the rule asks for.
  */
class PrecisionRecallSpec extends AnyFunSuite {

  test("corpus-level triple P/R vs reference ≥ 0.95; error-taxonomy agreement") {
    val mapper = new ObjectMapper()
    val cases = mapper.readTree(getClass.getResourceAsStream("/reference-cases.json"))

    var tp = 0L // expected triples reproduced (graph-isomorphically)
    var fp = 0L // emitted triples beyond the expected graph
    var fn = 0L // expected triples missed
    var errAgree = 0
    var errTotal = 0
    var positives = 0

    cases.elements().asScala.foreach { c =>
      val input = c.get("input").asText()
      val o = c.get("options")
      val opts = ParserOptions(
        baseIRI = if (o.has("baseIRI")) o.get("baseIRI").asText() else "",
        allowDuplicateRdfIds = o.has("allowDuplicateRdfIds") && o.get("allowDuplicateRdfIds").asBoolean(),
        validateUri = !o.has("validateUri") || o.get("validateUri").asBoolean(),
        parseUnsupportedVersions = o.has("parseUnsupportedVersions") && o.get("parseUnsupportedVersions").asBoolean(),
        version = if (o.has("version")) Some(o.get("version").asText()) else None,
        trackPosition = o.has("trackPosition") && o.get("trackPosition").asBoolean(),
      )
      val result = RdfXmlParser.parse(input, opts)
      if (c.has("error")) {
        errTotal += 1
        if (result.isLeft) errAgree += 1
      } else {
        positives += 1
        val expected = c.get("quads").elements().asScala.map { q =>
          val args = q.elements().asScala.map(_.asText()).toVector
          TestSupport.quad(args(0), args(1), args(2))
        }.toVector
        result match {
          case Right(actual) if TestSupport.isomorphic(actual, expected) =>
            tp += expected.length
          case Right(actual) =>
            // non-isomorphic: credit exact string-level overlap only
            val overlap = actual.map(_.ntriples).toSet.intersect(expected.map(_.ntriples).toSet).size
            tp += overlap
            fp += actual.length - overlap
            fn += expected.length - overlap
          case Left(_) =>
            fn += expected.length
        }
      }
    }

    val precision = tp.toDouble / (tp + fp)
    val recall = tp.toDouble / (tp + fn)
    info(f"triples: tp=$tp fp=$fp fn=$fn over $positives positive cases")
    info(f"precision=$precision%.4f recall=$recall%.4f (gate 0.95)")
    info(f"error taxonomy agreement: $errAgree/$errTotal")
    assert(precision >= 0.95 && recall >= 0.95)
    assert(errAgree == errTotal, "every reference error case must error")
  }
}
