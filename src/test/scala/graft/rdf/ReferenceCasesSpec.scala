package graft.rdf

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Runs the machine-extracted reference behavior corpus
  * (`src/test/resources/reference-cases.json`, derived from
  * `test/RdfXmlParser-test.ts`): every case is a full document parse
  * asserted either against an exact error message or graph isomorphism.
  */
class ReferenceCasesSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val cases = mapper.readTree(getClass.getResourceAsStream("/reference-cases.json"))

  cases.elements().asScala.zipWithIndex.foreach { case (c, idx) =>
    val name = c.get("name").asText()
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

    test(f"ref-$idx%03d: $name") {
      val result = RdfXmlParser.parse(input, opts)
      if (c.has("error")) {
        val expected = c.get("error").asText()
        result match {
          case Left(ParseError(msg)) =>
            if (expected != "*") assert(msg == expected)
          case Right(ts) =>
            fail(s"expected error '$expected' but parsed ${ts.length} triples:\n${TestSupport.describe(ts)}")
        }
      } else {
        val expected = c.get("quads").elements().asScala.map { q =>
          val args = q.elements().asScala.map(_.asText()).toVector
          TestSupport.quad(args(0), args(1), args(2))
        }.toVector
        result match {
          case Right(actual) =>
            assert(
              TestSupport.isomorphic(actual, expected),
              s"\nactual:\n${TestSupport.describe(actual)}\nexpected:\n${TestSupport.describe(expected)}",
            )
          case Left(e) => fail(s"unexpected parse error: ${e.message}")
        }
      }
    }
  }
}
