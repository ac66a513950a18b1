package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** Reference-DEVIATION quirk pins and ParserOptions-dependent cases — the
  * residue of the hand-vendored W3C suite after the spec-conformant cases
  * migrated to the file-driven manifest (`src/test/resources/w3c/
  * manifest.ttl`, run by [[W3cManifestSpec]]; r5 verdict #3). Everything
  * here either pins behavior where the reference deliberately or
  * accidentally departs from the W3C expectation (so it must NOT live in a
  * manifest meant to converge on the official rdf-tests files), or
  * exercises a parser OPTION the manifest's fixed-options runner cannot.
  * Names cite the reference source line each quirk is transcribed from.
  */
class W3cCasesSpec extends AnyFunSuite {

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val EG = "http://example.org/"

  private def check(doc: String, expected: (String, String, String)*): Unit = {
    RdfXmlParser.parse(doc) match {
      case Right(actual) =>
        val exp = expected.map { case (s, p, o) => TestSupport.quad(s, p, o) }.toVector
        assert(
          TestSupport.isomorphic(actual, exp),
          s"\nactual:\n${TestSupport.describe(actual)}\nexpected:\n${TestSupport.describe(exp)}")
      case Left(e) => fail(s"unexpected parse error: ${e.message}")
    }
  }

  private def err(doc: String, expectedMsg: String): Unit =
    RdfXmlParser.parse(doc) match {
      case Left(ParseError(msg)) => assert(msg == expectedMsg, msg)
      case Right(ts) => fail(s"expected error '$expectedMsg' but parsed ${ts.size} triples")
    }

  test("quirk: rdf:about (and property attributes) on a ROOT node element are IGNORED") {
    // Reference behavior (`lib/RdfXmlParser.ts:343`): rdf:* attributes are
    // only interpreted under a parent tag, so rdf:about on the ROOT element
    // is dropped and the subject is a fresh bnode. The W3C grammar would
    // honor the attribute; pinned as a deviation, so it stays out of the
    // manifest (which should converge on the official expected graphs).
    check(
      s"""<?xml version="1.0"?>
<eg:Thing xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:about="http://example/root">
  <eg:p>v</eg:p>
</eg:Thing>""",
      ("_:r", s"${RDF}type", s"${EG}Thing"),
      ("_:r", s"${EG}p", "\"v\""))
  }

  test("quirk: parseType=Triple WITHOUT an in-scope rdf:version is silently swallowed") {
    // Reference `lib/RdfXmlParser.ts:857`: without a truthy rdfVersion the
    // triple-term close path emits nothing — no error, no triples.
    RdfXmlParser.parse(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s"><eg:p rdf:resource="http://example/o"/></rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""") match {
      case Right(ts) => assert(ts.isEmpty, TestSupport.describe(ts))
      case Left(e) => fail(e.message)
    }
  }

  test("quirk: parseType=Triple under rdf:version='1.2-basic' also yields a triple term (truthy-version gate)") {
    // Reference quirk (`lib/RdfXmlParser.ts:857`): triple-term emission is
    // gated on a TRUTHY rdfVersion, with no distinction between the '1.2'
    // and '1.2-basic' profiles — pinned as reference behavior.
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2-basic">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s"><eg:p rdf:resource="http://example/o"/></rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", s"<<http://example/s ${EG}p http://example/o>>"))
  }

  test("quirk: its:dir attaches under rdf:version='1.1' too (truthy-version gate)") {
    // Reference `lib/RdfXmlParser.ts:206`: direction is attached whenever
    // ANY rdf:version is in scope, including '1.1'.
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xmlns:its="http://www.w3.org/2005/11/its" rdf:version="1.1">
  <rdf:Description rdf:about="http://example/a" xml:lang="en" its:dir="ltr">
    <eg:p>hello</eg:p>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "\"hello\"@en--ltr"))
  }

  test("quirk: rdf:annotation ON a parseType=Triple property is IGNORED (no reifies emitted)") {
    // Reference quirk (`lib/RdfXmlParser.ts:855-871`): the triple-term close
    // path emits with PARENTTAG.reifier, never the popped property tag's own
    // — so an annotation set on the parseType=Triple element itself has no
    // effect. Pinned as reference behavior, not W3C-required semantics.
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotation="http://example/t1" rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s"><eg:p rdf:resource="http://example/o"/></rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", s"<<http://example/s ${EG}p http://example/o>>"))
  }

  test("option: unsupported rdf:version errors; parseUnsupportedVersions lifts it") {
    val doc =
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="0.9">
  <rdf:Description rdf:about="http://example/a"><eg:p>v</eg:p></rdf:Description>
</rdf:RDF>"""
    err(doc, "Detected unsupported version: 0.9")
    RdfXmlParser.parse(doc, ParserOptions(parseUnsupportedVersions = true)) match {
      case Right(ts) => assert(ts.exists(_.pred == Iri(s"${EG}p")))
      case Left(e) => fail(e.message)
    }
  }

  test("option: trackPosition prefixes errors with line/column at multiple error sites") {
    // duplicate rdf:ID — position points at the second occurrence
    val dup =
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/">
  <rdf:Description rdf:ID="x"><eg:p>1</eg:p></rdf:Description>
  <rdf:Description rdf:ID="x"><eg:p>2</eg:p></rdf:Description>
</rdf:RDF>"""
    val Left(ParseError(msg)) = RdfXmlParser.parse(dup, ParserOptions(trackPosition = true))
    // the message carries the RESOLVED rdf:ID IRI (reference behavior,
    // pinned by the extracted corpus)
    assert(msg.matches("""Line 4 column \d+: Found multiple occurrences of rdf:ID='http://example\.org/#x'\."""), msg)
    // forbidden node element name — line prefix present
    val li = s"""<rdf:RDF xmlns:rdf="$RDF">
  <rdf:li/>
</rdf:RDF>"""
    val Left(ParseError(msg2)) = RdfXmlParser.parse(li, ParserOptions(trackPosition = true))
    assert(msg2.matches("""Line 2 column \d+: Illegal node element name: li"""), msg2)
  }
}
