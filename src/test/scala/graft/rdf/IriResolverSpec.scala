package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** The ~20 golden IRI-resolution behaviors pinned at
  * `test/RdfXmlParser-test.ts:111-215` (reference `#valueToUri`). */
class IriResolverSpec extends AnyFunSuite {
  import IriResolver.resolve

  test("absolute URI with no baseIRI")(assert(resolve("http://example.org/", "") == "http://example.org/"))
  test("absolute URI with empty baseIRI")(assert(resolve("http://example.org/", "") == "http://example.org/"))
  test("absolute URI with a baseIRI")(assert(resolve("http://example.org/", "http://base.org/") == "http://example.org/"))
  test("empty value resolves to base")(assert(resolve("", "http://base.org/") == "http://base.org/"))
  test("relative with missing baseIRI errors") {
    val e = intercept[IriResolver.IriResolutionError](resolve("abc", ""))
    assert(e.message == "Found invalid relative IRI 'abc' for a missing baseIRI")
  }
  test("relative URI against base")(assert(resolve("abc", "http://base.org/") == "http://base.org/abc"))
  test("base fragment ignored")(assert(resolve("abc", "http://base.org/#frag") == "http://base.org/abc"))
  test("hash value appends to base")(assert(resolve("#abc", "http://base.org/") == "http://base.org/#abc"))
  test("value with colon ignores base")(assert(resolve("http:abc", "http://base.org/") == "http:abc"))
  test("non-absolute baseIRI errors") {
    val e = intercept[IriResolver.IriResolutionError](resolve("abc", "def"))
    assert(e.message.contains("Found invalid baseIRI"))
  }
  test("scheme-relative value")(assert(resolve("//abc", "http://base.org/") == "http://abc"))
  test("base without path slash")(assert(resolve("abc", "http://base.org") == "http://base.org/abc"))
  test("base with only scheme://")(assert(resolve("abc", "http://") == "http:abc"))
  test("base http:a")(assert(resolve("abc", "http:a") == "http:abc"))
  test("base http:")(assert(resolve("abc", "http:") == "http:abc"))
  test("absolute path ignores base path")(assert(resolve("/abc/def/", "http://base.org/123/456/") == "http://base.org/abc/def/"))
  test("relative replaces after last slash")(assert(resolve("xyz", "http://aa/a") == "http://aa/xyz"))
  test("parent paths collapse")(assert(resolve("xyz", "http://aa/parent/parent/../../a") == "http://aa/xyz"))
  test("current-dir paths collapse")(assert(resolve("xyz", "http://aa/././a") == "http://aa/xyz"))
}
