package graft.rdf

/** Relative→absolute IRI resolution with the exact edge semantics the
  * reference depends on (it delegates to the `relative-to-absolute-iri`
  * npm package at `lib/RdfXmlParser.ts:161-163`). The ~20 golden behaviors
  * are pinned at `test/RdfXmlParser-test.ts:111-215`; deliberately NOT
  * `java.net.URI`, whose edge semantics differ (e.g. `http:` bases,
  * scheme-relative values, bases without a path slash).
  */
object IriResolver {

  final class IriResolutionError(val message: String) extends RuntimeException(message)

  /** Resolve `value` against `baseIri` (RFC-3986-style, with the reference
    * library's quirks preserved). Throws [[IriResolutionError]] on a
    * relative value with a missing/invalid base.
    */
  def resolve(value: String, baseIri: String): String = {
    var base = if (baseIri == null) "" else baseIri
    // Ignore any fragment in the base IRI (only when not at position 0).
    val baseFragmentPos = base.indexOf('#')
    if (baseFragmentPos > 0) base = base.substring(0, baseFragmentPos)

    // Empty value resolves to the (fragmentless) base itself.
    if (value.isEmpty) return base

    // A hash value appends to the base.
    if (value.charAt(0) == '#') return base + value

    // A value containing a colon is treated as absolute; only its path gets
    // dot-segment normalization.
    val valueColonPos = value.indexOf(':')
    if (valueColonPos >= 0) return removeDotSegmentsOfPath(value, valueColonPos)

    if (base.isEmpty)
      throw new IriResolutionError(s"Found invalid relative IRI '$value' for a missing baseIRI")
    val baseColonPos = base.indexOf(':')
    if (baseColonPos < 0)
      throw new IriResolutionError(s"Found invalid baseIRI '$base' for value '$value'")

    // Scheme-relative value: inherit only the scheme of the base.
    if (value.startsWith("//"))
      return base.substring(0, baseColonPos + 1) + removeDotSegments(value)

    // Query-only value: replace the base query.
    if (value.charAt(0) == '?') {
      val baseQueryPos = base.indexOf('?')
      val stripped = if (baseQueryPos >= 0) base.substring(0, baseQueryPos) else base
      return stripped + value
    }

    // Base without '//' after the scheme (e.g. 'http:', 'http:a'):
    // append the value directly after the scheme.
    if (base.length <= baseColonPos + 1 || base.charAt(baseColonPos + 1) != '/' ||
        base.length <= baseColonPos + 2 || base.charAt(baseColonPos + 2) != '/') {
      return base.substring(0, baseColonPos + 1) + value
    }

    // Base is 'scheme://...': find the end of the authority.
    val authorityStart = baseColonPos + 3
    if (base.length == authorityStart) {
      // Base is exactly 'scheme://' — degenerate: append after the scheme.
      return base.substring(0, baseColonPos + 1) + value
    }
    val pathPos = base.indexOf('/', authorityStart)
    if (pathPos < 0) {
      // 'scheme://authority' with no path.
      if (value.charAt(0) == '/') base + removeDotSegments(value)
      else base + removeDotSegments("/" + value)
    } else if (value.charAt(0) == '/') {
      // Absolute path: keep scheme + authority only.
      base.substring(0, pathPos) + removeDotSegments(value)
    } else {
      // Relative path: merge with the base path up to its last slash.
      val basePathEnd = {
        // Drop query from the base before merging.
        val q = base.indexOf('?', pathPos)
        if (q >= 0) q else base.length
      }
      val basePath = base.substring(pathPos, basePathEnd)
      val lastSlash = basePath.lastIndexOf('/')
      val merged = basePath.substring(0, lastSlash + 1) + value
      base.substring(0, pathPos) + removeDotSegments(merged)
    }
  }

  /** True iff the string could contain a dot SEGMENT at/after `from` — a
    * leading '.' or a "/." anywhere. These are the only shapes any
    * remove_dot_segments branch fires on; dots inside ordinary segments
    * ("file.html") or the authority ("www.w3.org") don't qualify, so a false
    * here proves the removal is the identity. Conservative: a "/." in a
    * query/fragment (or "/..x"-style segment) takes the slow path, which is
    * itself the identity there. This fast path matters because resolution
    * runs for every rdf:about/resource/datatype of every triple — ~25% of
    * the parse profile before it was added. */
  @inline private def maybeDotSegments(s: String, from: Int): Boolean =
    (s.length > from && s.charAt(from) == '.') || s.indexOf("/.", from) >= 0

  /** RFC 3986 §5.2.4 remove_dot_segments over a path (query/fragment of the
    * input, if any, are preserved untouched). */
  private[rdf] def removeDotSegments(pathFull: String): String = {
    if (!maybeDotSegments(pathFull, 0)) return pathFull
    // Split off query/fragment first.
    var cut = pathFull.length
    val q = pathFull.indexOf('?')
    if (q >= 0 && q < cut) cut = q
    val h = pathFull.indexOf('#')
    if (h >= 0 && h < cut) cut = h
    val path = pathFull.substring(0, cut)
    val suffix = pathFull.substring(cut)

    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") {
        in = ""
      } else {
        // Move the first path segment (incl. leading '/') to the output.
        val start = if (in.charAt(0) == '/') 1 else 0
        val nextSlash = in.indexOf('/', start)
        if (nextSlash < 0) { out += in; in = "" }
        else { out += in.substring(0, nextSlash); in = in.substring(nextSlash) }
      }
    }
    out.mkString("") + suffix
  }

  /** Apply dot-segment removal only to the path portion of an absolute IRI
    * whose scheme colon sits at `colonPos` (authority untouched). */
  private[rdf] def removeDotSegmentsOfPath(iri: String, colonPos: Int): String = {
    val searchFrom =
      if (iri.length > colonPos + 2 && iri.charAt(colonPos + 1) == '/' && iri.charAt(colonPos + 2) == '/')
        colonPos + 3
      else colonPos + 1
    val pathPos = iri.indexOf('/', searchFrom)
    if (pathPos < 0) iri
    else if (!maybeDotSegments(iri, pathPos)) iri // identity: no allocation at all
    else iri.substring(0, pathPos) + removeDotSegments(iri.substring(pathPos))
  }
}
