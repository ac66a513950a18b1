package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** Manifest-driven W3C conformance runner (r4 verdict #3): one ScalaTest
  * test is registered per entry of the vendored
  * `src/test/resources/w3c/manifest.ttl` — the same `mf:action`/`mf:result`
  * shape the reference's `rdf-test-suite` consumes from the live W3C
  * manifests (reference `package.json:74-78`; unreachable in-sandbox).
  * Adding a case = dropping in fixture files + one manifest stanza.
  *
  * Eval entries parse `mf:action` with the official suite's base IRI
  * convention (`http://www.w3.org/2013/RDFXMLTests/<path>`) and require
  * blank-node-bijection isomorphism with the `mf:result` N-Triples graph;
  * NegativeSyntax entries require a `Left` parse error.
  */
class W3cManifestSpec extends AnyFunSuite {

  private def resource(path: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(s"w3c/$path")
    require(in != null, s"missing test resource w3c/$path")
    try scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).mkString
    finally in.close()
  }

  private val entries = W3cManifest.entries(resource("manifest.ttl"))

  test("manifest parses and is non-trivial (eval + negative cases present)") {
    assert(entries.size >= 20, s"only ${entries.size} manifest entries")
    assert(entries.exists(_.kind == "TestXMLEval"))
    assert(entries.exists(_.kind == "TestXMLNegativeSyntax"))
    assert(entries.map(_.name).distinct.size == entries.size, "duplicate mf:name")
  }

  entries.foreach { e =>
    test(s"${e.name} [${e.kind}]") {
      val doc = resource(e.action)
      val base = s"http://www.w3.org/2013/RDFXMLTests/${e.action}"
      val parsed = RdfXmlParser.parse(doc, ParserOptions(baseIRI = base))
      e.kind match {
        case "TestXMLEval" =>
          val expectedNt = resource(e.result.getOrElse(fail(s"${e.name}: eval entry without mf:result")))
          parsed match {
            case Right(actual) =>
              val expected = W3cManifest.readNt(expectedNt)
              assert(TestSupport.isomorphic(actual, expected),
                s"\nactual:\n${TestSupport.describe(actual)}\nexpected:\n${TestSupport.describe(expected)}")
            case Left(err) => fail(s"unexpected parse error: ${err.message}")
          }
        case "TestXMLNegativeSyntax" =>
          assert(parsed.isLeft, s"expected a parse error, got: $parsed")
        case other => fail(s"unsupported test type rdft:$other")
      }
    }
  }
}
