package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** A hand-vendored subset of the W3C RDF/XML test suite (the rdfcore /
  * rdf-tests eval cases the reference runs via `rdf-test-suite`,
  * reference `package.json:74-78`). The live manifests are fetched at test
  * runtime by the reference and are unreachable from this sandbox, so the
  * grammar features they exercise are transcribed here as self-contained
  * (input, expected-graph) pairs — independent evidence beyond the
  * Jest-derived corpus in reference-cases.json. Names cite the W3C case
  * each test is modeled on.
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

  test("amp-in-url/test001: entity-escaped ampersand in rdf:about survives into the IRI") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Description rdf:about="http://example/q?abc=1&amp;def=2">
    <rdf:value>xxx</rdf:value>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/q?abc=1&def=2", s"${RDF}value", "\"xxx\""))
  }

  test("xmlbase/test001: xml:base resolves rdf:ID on a typed node with a property attribute") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/dir/file">
  <eg:type rdf:ID="frag" eg:value="v"/>
</rdf:RDF>""",
      ("http://example.org/dir/file#frag", s"${RDF}type", s"${EG}type"),
      ("http://example.org/dir/file#frag", s"${EG}value", "\"v\""))
  }

  test("xmlbase/test004-style: an inner xml:base overrides the outer for rdf:about and rdf:resource") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/dir/file">
  <rdf:Description rdf:about="relfile" xml:base="http://example.org/dir2/">
    <eg:rel rdf:resource="other"/>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example.org/dir2/relfile", s"${EG}rel", "http://example.org/dir2/other"))
  }

  test("rdf-containers-syntax-vs-schema/test001-style: rdf:Bag with rdf:li members") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Bag>
    <rdf:li>1</rdf:li>
    <rdf:li>2</rdf:li>
  </rdf:Bag>
</rdf:RDF>""",
      ("_:bag", s"${RDF}type", s"${RDF}Bag"),
      ("_:bag", s"${RDF}_1", "\"1\""),
      ("_:bag", s"${RDF}_2", "\"2\""))
  }

  test("rdf-containers-syntax-vs-schema/test004-style: the rdf:li counter is per-element") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Seq><rdf:li>a</rdf:li></rdf:Seq>
  <rdf:Seq><rdf:li>b</rdf:li></rdf:Seq>
</rdf:RDF>""",
      ("_:s1", s"${RDF}type", s"${RDF}Seq"),
      ("_:s1", s"${RDF}_1", "\"a\""),
      ("_:s2", s"${RDF}type", s"${RDF}Seq"),
      ("_:s2", s"${RDF}_1", "\"b\""))
  }

  test("rdfms-identity-anon-resources/test001-style: a node element without about/ID/nodeID is a fresh bnode") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <eg:thing><eg:p>v</eg:p></eg:thing>
</rdf:RDF>""",
      ("_:a", s"${RDF}type", s"${EG}thing"),
      ("_:a", s"${EG}p", "\"v\""))
  }

  test("rdfms-rdf-names-use: rdf:type as a property element with rdf:resource") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Description rdf:about="http://example/a">
    <rdf:type rdf:resource="http://example/C"/>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${RDF}type", "http://example/C"))
  }

  test("rdfms-reification-required/test001-style: rdf:ID on a property element reifies (1 + 4 triples)") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/file">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:ID="st">v</eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "\"v\""),
      ("http://example.org/file#st", s"${RDF}type", s"${RDF}Statement"),
      ("http://example.org/file#st", s"${RDF}subject", "http://example/a"),
      ("http://example.org/file#st", s"${RDF}predicate", s"${EG}prop"),
      ("http://example.org/file#st", s"${RDF}object", "\"v\""))
  }

  test("datatypes/test001-style: rdf:datatype yields a typed literal") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:n rdf:datatype="http://www.w3.org/2001/XMLSchema#int">123</eg:n>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}n", "\"123\"^^http://www.w3.org/2001/XMLSchema#int"))
  }

  test("rdfms-xmllang scoping: inherited, overridden, and cleared with xml:lang=\"\"") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a" xml:lang="en">
    <eg:p1>A</eg:p1>
    <eg:p2 xml:lang="de">B</eg:p2>
    <eg:p3 xml:lang="">C</eg:p3>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p1", "\"A\"@en"),
      ("http://example/a", s"${EG}p2", "\"B\"@de"),
      ("http://example/a", s"${EG}p3", "\"C\""))
  }

  test("rdfms-syntax-incomplete/test001-style: rdf:nodeID names bnodes on both node and property elements") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:nodeID="a"><eg:p rdf:nodeID="b"/></rdf:Description>
</rdf:RDF>""",
      ("_:a", s"${EG}p", "_:b"))
  }

  test("rdfms-empty-property-elements: an empty property element with no attributes is an empty literal") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a"><eg:p></eg:p></rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "\"\""))
  }

  test("rdf-charmod-uris/test001-style: non-ASCII IRI characters pass through unescaped") {
    check(
      s"""<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example.org/#André">
    <eg:p>v</eg:p>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example.org/#André", s"${EG}p", "\"v\""))
  }

  test("collections: parseType=Collection builds the rdf:first/rdf:rest chain ending in rdf:nil") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:list rdf:parseType="Collection">
      <rdf:Description rdf:about="http://example/x"/>
      <rdf:Description rdf:about="http://example/y"/>
    </eg:list>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}list", "_:c0"),
      ("_:c0", s"${RDF}first", "http://example/x"),
      ("_:c0", s"${RDF}rest", "_:c1"),
      ("_:c1", s"${RDF}first", "http://example/y"),
      ("_:c1", s"${RDF}rest", s"${RDF}nil"))
  }

  private def err(doc: String, expectedMsg: String): Unit =
    RdfXmlParser.parse(doc) match {
      case Left(ParseError(msg)) => assert(msg == expectedMsg, msg)
      case Right(ts) => fail(s"expected error '$expectedMsg' but parsed ${ts.size} triples")
    }

  // ------------------------------------------------- rdf11 grammar features

  test("rdfms-not-id-and-resource-attr/test001: rdf:ID + rdf:resource on a property element reifies the resource triple") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/file">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:ID="st" rdf:resource="http://example/o"/>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "http://example/o"),
      ("http://example.org/file#st", s"${RDF}type", s"${RDF}Statement"),
      ("http://example.org/file#st", s"${RDF}subject", "http://example/a"),
      ("http://example.org/file#st", s"${RDF}predicate", s"${EG}prop"),
      ("http://example.org/file#st", s"${RDF}object", "http://example/o"))
  }

  test("rdfms-difference-between-ID-and-about/test1: rdf:ID='foo' and rdf:about='#foo' name the same resource") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/doc">
  <rdf:Description rdf:ID="foo"><eg:p1>a</eg:p1></rdf:Description>
  <rdf:Description rdf:about="#foo"><eg:p2>b</eg:p2></rdf:Description>
</rdf:RDF>""",
      ("http://example.org/doc#foo", s"${EG}p1", "\"a\""),
      ("http://example.org/doc#foo", s"${EG}p2", "\"b\""))
  }

  test("rdfms-difference-between-ID-and-about/test2: non-ASCII rdf:ID survives as an IRI fragment") {
    check(
      s"""<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/doc">
  <rdf:Description rdf:ID="dürst"><eg:p>v</eg:p></rdf:Description>
</rdf:RDF>""",
      ("http://example.org/doc#dürst", s"${EG}p", "\"v\""))
  }

  test("rdfms-duplicate-member-props/test001: equal rdf:li values still get distinct ordinal properties") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Bag><rdf:li>x</rdf:li><rdf:li>x</rdf:li></rdf:Bag>
</rdf:RDF>""",
      ("_:bag", s"${RDF}type", s"${RDF}Bag"),
      ("_:bag", s"${RDF}_1", "\"x\""),
      ("_:bag", s"${RDF}_2", "\"x\""))
  }

  test("rdfms-seq-representation: explicit rdf:_N does not advance the rdf:li counter") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Seq><rdf:_3>c</rdf:_3><rdf:li>a</rdf:li></rdf:Seq>
</rdf:RDF>""",
      ("_:s", s"${RDF}type", s"${RDF}Seq"),
      ("_:s", s"${RDF}_3", "\"c\""),
      ("_:s", s"${RDF}_1", "\"a\""))
  }

  test("rdfms-empty-property-elements/test002: empty property element with rdf:resource yields the IRI object") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a"><eg:p rdf:resource="http://example/o"/></rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "http://example/o"))
  }

  test("rdfms-empty-property-elements: property attributes on an empty property element hang off a fresh bnode") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a"><eg:p eg:q="v"/></rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "_:b"),
      ("_:b", s"${EG}q", "\"v\""))
  }

  test("xmlbase/test016-style: empty rdf:resource resolves to the in-scope base") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.org/dir/doc">
  <rdf:Description rdf:about="http://example/a"><eg:p rdf:resource=""/></rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "http://example.org/dir/doc"))
  }

  test("unrecognised-xml-attributes/test001: xml:space is ignored and the literal is untouched") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a"><eg:p xml:space="preserve"> v </eg:p></rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "\" v \""))
  }

  test("rdf-element-not-mandatory/test001: a typed node element as document root (no rdf:RDF)") {
    // Reference behavior (`lib/RdfXmlParser.ts:343`): rdf:* attributes are
    // only interpreted under a parent tag, so rdf:about on the ROOT element
    // is ignored and the subject is a fresh bnode.
    check(
      s"""<?xml version="1.0"?>
<eg:Thing xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:about="http://example/root">
  <eg:p>v</eg:p>
</eg:Thing>""",
      ("_:r", s"${RDF}type", s"${EG}Thing"),
      ("_:r", s"${EG}p", "\"v\""))
  }

  test("rdf-ns-prefix-confusion: any prefix bound to the RDF namespace works for elements and attributes") {
    check(
      s"""<?xml version="1.0"?>
<x:RDF xmlns:x="$RDF" xmlns:eg="$EG">
  <x:Description x:about="http://example/a"><eg:p x:resource="http://example/o"/></x:Description>
</x:RDF>""",
      ("http://example/a", s"${EG}p", "http://example/o"))
  }

  test("xml-canon/test001-style: parseType=Literal re-declares in-scope namespaces on top-level literal elements") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:r rdf:parseType="Literal">x<sub>i</sub></eg:r>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}r",
        "\"x<sub xmlns:rdf=\"" + RDF + "\" xmlns:eg=\"" + EG + "\">i</sub>\"^^" + RDF + "XMLLiteral"))
  }

  test("rdfms-para196: whitespace and comments between property elements produce no triples") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <!-- a comment -->
    <eg:p>v</eg:p>
    <!-- another -->
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "\"v\""))
  }

  test("rdfms-rdf-names-use/error: rdf:about as a property element name is illegal") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF">
  <rdf:Description rdf:about="http://example/a"><rdf:about>v</rdf:about></rdf:Description>
</rdf:RDF>""",
      "Illegal property element name: about")
  }

  test("rdf-containers: rdf:ID is not a valid NCName → exact reference error") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xml:base="http://example.org/">
  <rdf:Description rdf:ID="1bad"/>
</rdf:RDF>""",
      "Not a valid NCName: 1bad")
  }

  // -------------------------------------- datatype-vs-parseType conflict taxonomy

  test("conflict: rdf:datatype before rdf:parseType errors with the resolved datatype") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p rdf:datatype="http://example/dt" rdf:parseType="Resource"/>
  </rdf:Description>
</rdf:RDF>""",
      "rdf:parseType is not allowed on property elements with rdf:datatype (http://example/dt)")
  }

  test("conflict: rdf:parseType before rdf:datatype errors with the raw attribute value") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p rdf:parseType="Literal" rdf:datatype="http://example/dt"/>
  </rdf:Description>
</rdf:RDF>""",
      "rdf:parseType is not allowed on property elements with rdf:datatype (http://example/dt)")
  }

  test("conflict: non-rdf property attribute + rdf:datatype") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p eg:q="v" rdf:datatype="http://example/dt"/>
  </rdf:Description>
</rdf:RDF>""",
      "Found both non-rdf:* property attributes and rdf:datatype (http://example/dt).")
  }

  test("conflict: non-rdf property attribute + rdf:parseType") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p eg:q="v" rdf:parseType="Resource"/>
  </rdf:Description>
</rdf:RDF>""",
      "rdf:parseType is not allowed when non-rdf:* property attributes are present")
  }

  test("conflict: rdf:datatype + rdf:parseType='Collection' errors like the Resource/Literal cases") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p rdf:datatype="http://example/dt" rdf:parseType="Collection"/>
  </rdf:Description>
</rdf:RDF>""",
      "rdf:parseType is not allowed on property elements with rdf:datatype (http://example/dt)")
  }

  test("conflict: rdf:datatype + rdf:parseType='Triple' errors even under rdf:version='1.2'") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:p rdf:datatype="http://example/dt" rdf:parseType="Triple"/>
  </rdf:Description>
</rdf:RDF>""",
      "rdf:parseType is not allowed on property elements with rdf:datatype (http://example/dt)")
  }

  test("conflict: non-rdf property attribute + rdf:parseType='Triple' (rdf12 member of the taxonomy)") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:p eg:q="v" rdf:parseType="Triple"/>
  </rdf:Description>
</rdf:RDF>""",
      "rdf:parseType is not allowed when non-rdf:* property attributes are present")
  }

  test("conflict: rdf:nodeID before rdf:resource") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p rdf:nodeID="x" rdf:resource="http://example/o"/>
  </rdf:Description>
</rdf:RDF>""",
      "Found both rdf:resource (http://example/o) and rdf:nodeID (x).")
  }

  test("conflict: rdf:resource before rdf:nodeID") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:p rdf:resource="http://example/o" rdf:nodeID="x"/>
  </rdf:Description>
</rdf:RDF>""",
      "Found both rdf:resource and rdf:nodeID (x).")
  }

  // ------------------------------------------------------ rdf12 eval semantics

  test("rdf12: parseType=Triple under rdf:version=1.2 yields a triple term object") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s">
        <eg:p rdf:resource="http://example/o"/>
      </rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", s"<<http://example/s ${EG}p http://example/o>>"))
  }

  test("rdf12: parseType=Triple WITHOUT an in-scope rdf:version is silently swallowed (reference-pinned)") {
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

  test("rdf12: rdf:version on an INNER node element enables parseType=Triple for its subtree only") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a" rdf:version="1.2">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s"><eg:p rdf:resource="http://example/o"/></rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", s"<<http://example/s ${EG}p http://example/o>>"))
  }

  test("rdf12: triply-nested parseType=Triple builds a depth-3 triple term") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:p1 rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s1">
        <eg:p2 rdf:parseType="Triple">
          <rdf:Description rdf:about="http://example/s2">
            <eg:p3 rdf:parseType="Triple">
              <rdf:Description rdf:about="http://example/s3">
                <eg:p4 rdf:resource="http://example/o"/>
              </rdf:Description>
            </eg:p3>
          </rdf:Description>
        </eg:p2>
      </rdf:Description>
    </eg:p1>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p1",
        s"<<http://example/s1 ${EG}p2 <<http://example/s2 ${EG}p3 <<http://example/s3 ${EG}p4 http://example/o>>>>>>"))
  }

  test("rdf12: triple term with a datatyped literal object") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s">
        <eg:p rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</eg:p>
      </rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop",
        s"<<http://example/s ${EG}p \"5\"^^http://www.w3.org/2001/XMLSchema#int>>"))
  }

  test("rdf12: rdf:annotation reifies a language-tagged literal triple") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop xml:lang="en" rdf:annotation="http://example/t1">blah</eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "\"blah\"@en"),
      ("http://example/t1", s"${RDF}reifies", s"<<http://example/a ${EG}prop \"blah\"@en>>"))
  }

  test("rdf12: its:dir + xml:lang yield a directional language-tagged literal") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xmlns:its="http://www.w3.org/2005/11/its" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a" xml:lang="en" its:dir="ltr">
    <eg:p>hello</eg:p>
    <eg:q its:dir="rtl">bye</eg:q>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}p", "\"hello\"@en--ltr"),
      ("http://example/a", s"${EG}q", "\"bye\"@en--rtl"))
  }

  test("rdf12: invalid its:dir errors with the exact reference message") {
    err(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xmlns:its="http://www.w3.org/2005/11/its" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a" xml:lang="en" its:dir="xyz">
    <eg:p>hello</eg:p>
  </rdf:Description>
</rdf:RDF>""",
      "Base directions must either be 'ltr' or 'rtl', while 'xyz' was found.")
  }

  test("rdf12-basic: parseType=Triple under rdf:version='1.2-basic' also yields a triple term (truthy-version gate)") {
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

  test("version quirk: its:dir attaches under rdf:version='1.1' too (truthy-version gate)") {
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

  test("rdf12: unsupported rdf:version errors; parseUnsupportedVersions lifts it") {
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

  // ----------------- rdf12 eval tail: triple-term nesting + annotation reifiers
  // Modeled on the W3C rdf-tests rdf12 rdf-xml eval cases the reference runs
  // live (`package.json:76-78`); expected graphs cross-checked against the
  // reference suite (`test/RdfXmlParser-test.ts:2706-2943`).

  test("rdf12 eval: parseType=Triple whose inner object is rdf:nodeID (triple term carries the bnode)") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s"><eg:p rdf:nodeID="b1"/></rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/", s"${EG}prop", s"<<http://example/s ${EG}p _:b0>>"))
  }

  test("rdf12 eval: NESTED parseType=Triple — a triple term two levels deep") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s">
        <eg:p rdf:parseType="Triple">
          <rdf:Description rdf:about="http://example/s2"><eg:p2 rdf:resource="http://example/o2"/></rdf:Description>
        </eg:p>
      </rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/", s"${EG}prop",
        s"<<http://example/s ${EG}p <<http://example/s2 ${EG}p2 http://example/o2>>>>"))
  }

  test("rdf12 eval: THREE-deep parseType=Triple nesting (grammar recursion has no depth cliff)") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s1">
        <eg:p1 rdf:parseType="Triple">
          <rdf:Description rdf:about="http://example/s2">
            <eg:p2 rdf:parseType="Triple">
              <rdf:Description rdf:about="http://example/s3"><eg:p3>leaf</eg:p3></rdf:Description>
            </eg:p2>
          </rdf:Description>
        </eg:p1>
      </rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/", s"${EG}prop",
        s"""<<http://example/s1 ${EG}p1 <<http://example/s2 ${EG}p2 <<http://example/s3 ${EG}p3 "leaf">>>>>>"""))
  }

  test("rdf12 eval: rdf:annotation reifies a literal statement via rdf:reifies") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotation="http://example/triple1">blah</eg:prop>
  </rdf:Description>
  <rdf:Description rdf:about="http://example/triple1">
    <eg:prop>foo</eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "\"blah\""),
      ("http://example/triple1", s"${RDF}reifies", s"""<<http://example/a ${EG}prop "blah">>"""),
      ("http://example/triple1", s"${EG}prop", "\"foo\""))
  }

  test("rdf12 eval: rdf:annotationNodeID — the reifier is a blank node") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotationNodeID="triple1">blah</eg:prop>
  </rdf:Description>
  <rdf:Description rdf:nodeID="triple1">
    <eg:prop>foo</eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "\"blah\""),
      ("_:t", s"${RDF}reifies", s"""<<http://example/a ${EG}prop "blah">>"""),
      ("_:t", s"${EG}prop", "\"foo\""))
  }

  test("rdf12 eval: rdf:annotation with an EMPTY object literal") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotation="http://example/triple1" />
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "\"\""),
      ("http://example/triple1", s"${RDF}reifies", s"""<<http://example/a ${EG}prop "">>"""))
  }

  test("rdf12 eval: rdf:annotation + rdf:parseType='Resource' reifies the bnode statement") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotation="http://example/triple1" rdf:parseType="Resource" />
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "_:r"),
      ("http://example/triple1", s"${RDF}reifies", s"<<http://example/a ${EG}prop _:r>>"))
  }

  test("rdf12 eval: rdf:annotation + inline property ATTRIBUTE (implicit bnode object)") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop1 rdf:annotation="http://example/triple1" eg:prop2="val"></eg:prop1>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop1", "_:b"),
      ("_:b", s"${EG}prop2", "\"val\""),
      ("http://example/triple1", s"${RDF}reifies", s"<<http://example/a ${EG}prop1 _:b>>"))
  }

  test("rdf12 eval: rdf:annotation + rdf:resource shortcut (on an rdf:type property element)") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <rdf:type rdf:annotation="http://example/triple1" rdf:resource="http://example/C"/>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${RDF}type", "http://example/C"),
      ("http://example/triple1", s"${RDF}reifies", s"<<http://example/a ${RDF}type http://example/C>>"))
  }

  test("rdf12 eval: rdf:annotation + rdf:nodeID object shortcut") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotation="http://example/triple1" rdf:nodeID="object"/>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "_:o"),
      ("http://example/triple1", s"${RDF}reifies", s"<<http://example/a ${EG}prop _:o>>"))
  }

  test("rdf12 eval: NESTED rdf:annotation — inner and outer statements each get their reifier") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:annotation="http://example/triple1">
      <rdf:Description rdf:about="http://example/b">
        <eg:prop rdf:annotation="http://example/triple2" rdf:resource="http://example/c"/>
      </rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/b", s"${EG}prop", "http://example/c"),
      ("http://example/triple2", s"${RDF}reifies", s"<<http://example/b ${EG}prop http://example/c>>"),
      ("http://example/a", s"${EG}prop", "http://example/b"),
      ("http://example/triple1", s"${RDF}reifies", s"<<http://example/a ${EG}prop http://example/b>>"))
  }

  test("rdf12 eval: rdf:annotation OVER A COLLECTION nested in parseType=Resource (reifier sees the list head)") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example.com/">
  <rdf:Description rdf:about="http://example/eric">
    <rdf:type rdf:parseType="Resource">
      <eg:intersectionOf rdf:annotation="http://example.com/triple1" rdf:parseType="Collection">
        <rdf:Description rdf:about="http://example/Person"/>
        <rdf:Description rdf:about="http://example/Male"/>
      </eg:intersectionOf>
    </rdf:type>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/eric", s"${RDF}type", "_:an0"),
      ("_:an0", s"${EG}intersectionOf", "_:an1"),
      ("http://example.com/triple1", s"${RDF}reifies", s"<<_:an0 ${EG}intersectionOf _:an1>>"),
      ("_:an1", s"${RDF}first", "http://example/Person"),
      ("_:an1", s"${RDF}rest", "_:an2"),
      ("_:an2", s"${RDF}first", "http://example/Male"),
      ("_:an2", s"${RDF}rest", s"${RDF}nil"))
  }

  test("rdf12 eval: annotation INSIDE a collection item — a member's own statement reifies independently") {
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG">
  <rdf:Description rdf:about="http://example/a">
    <eg:list rdf:parseType="Collection">
      <rdf:Description rdf:about="http://example/m1">
        <eg:p rdf:annotation="http://example/t1" rdf:resource="http://example/o1"/>
      </rdf:Description>
    </eg:list>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}list", "_:c0"),
      ("_:c0", s"${RDF}first", "http://example/m1"),
      ("_:c0", s"${RDF}rest", s"${RDF}nil"),
      ("http://example/m1", s"${EG}p", "http://example/o1"),
      ("http://example/t1", s"${RDF}reifies", s"<<http://example/m1 ${EG}p http://example/o1>>"))
  }

  test("rdf12 eval quirk: rdf:annotation ON a parseType=Triple property is IGNORED (no reifies emitted)") {
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

  test("rdf12 eval: reifier + NESTED triple term — annotation on the parent whose object embeds a depth-2 term") {
    // The reifier attaches to the OUTER statement; its quoted object itself
    // contains a nested triple term, so rdf:reifies carries nesting depth 2.
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:claims rdf:annotation="http://example/t1">
      <rdf:Description rdf:about="http://example/b">
        <eg:prop rdf:parseType="Triple">
          <rdf:Description rdf:about="http://example/s"><eg:p rdf:resource="http://example/o"/></rdf:Description>
        </eg:prop>
      </rdf:Description>
    </eg:claims>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}claims", "http://example/b"),
      ("http://example/t1", s"${RDF}reifies", s"<<http://example/a ${EG}claims http://example/b>>"),
      ("http://example/b", s"${EG}prop", s"<<http://example/s ${EG}p http://example/o>>"))
  }

  test("rdf12 eval: rdf:ID + rdf:annotation on ONE property element — classic reification AND rdf:reifies") {
    // Both reifier channels are independent in the reference
    // (`lib/RdfXmlParser.ts:664-675` sets them side by side;
    // `emitTriple`:753+ emits the rdf:reifies triple AND the 4-triple
    // rdf:Statement fan-out from the same call).
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xml:base="http://example/base">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:ID="r" rdf:annotation="http://example/t1">blah</eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", "\"blah\""),
      ("http://example/t1", s"${RDF}reifies", s"""<<http://example/a ${EG}prop "blah">>"""),
      ("http://example/base#r", s"${RDF}type", s"${RDF}Statement"),
      ("http://example/base#r", s"${RDF}subject", "http://example/a"),
      ("http://example/base#r", s"${RDF}predicate", s"${EG}prop"),
      ("http://example/base#r", s"${RDF}object", "\"blah\""))
  }

  test("rdf12 eval: triple term quoting a DIRECTIONAL language-tagged literal") {
    // Interplay of the two rdf12 features: the quoted statement's object is
    // a directional literal, which must survive inside the triple term.
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" xmlns:its="http://www.w3.org/2005/11/its" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:prop rdf:parseType="Triple">
      <rdf:Description rdf:about="http://example/s">
        <eg:p xml:lang="en" its:dir="rtl">bye</eg:p>
      </rdf:Description>
    </eg:prop>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}prop", s"""<<http://example/s ${EG}p "bye"@en--rtl>>"""))
  }

  test("rdf12 eval: triple term INSIDE a collection member's subtree") {
    // A collection member node element carries its own parseType=Triple
    // property: the list chain and the member's triple-term statement are
    // independent emissions.
    check(
      s"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="$RDF" xmlns:eg="$EG" rdf:version="1.2">
  <rdf:Description rdf:about="http://example/a">
    <eg:list rdf:parseType="Collection">
      <rdf:Description rdf:about="http://example/m1">
        <eg:prop rdf:parseType="Triple">
          <rdf:Description rdf:about="http://example/s"><eg:p rdf:resource="http://example/o"/></rdf:Description>
        </eg:prop>
      </rdf:Description>
    </eg:list>
  </rdf:Description>
</rdf:RDF>""",
      ("http://example/a", s"${EG}list", "_:c0"),
      ("_:c0", s"${RDF}first", "http://example/m1"),
      ("_:c0", s"${RDF}rest", s"${RDF}nil"),
      ("http://example/m1", s"${EG}prop", s"<<http://example/s ${EG}p http://example/o>>"))
  }

  test("trackPosition prefixes errors with line/column at other error sites too") {
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
