package graft.rdf

import java.util.regex.Pattern

/** IRI + NCName validation.
  *
  * Pragmatic IRI validation mirrors the reference's default strategy (the
  * `validate-iri` npm package, used at `lib/RdfXmlParser.ts:173-180` with
  * `IriValidationStrategy.Pragmatic`): a scheme followed by characters
  * outside the Turtle-forbidden set. Pinned by
  * `test/RdfXmlParser-test.ts:137-145`.
  *
  * The NCName character classes replicate `NCNAME_MATCHER`
  * (`lib/RdfXmlParser.ts:43-54`) verbatim — including the reference's
  * literal `#xB7` quirk inside the continuation class (the chars '#', 'x',
  * 'B', '7' rather than U+00B7).
  */
object IriValidator {

  /** Equivalent to `^[A-Za-z][\d+\-.A-Za-z]*:[^\x00-\x20"<>\\^`{|}]*$` but
    * as a direct char scan — this runs for every IRI of every triple, and
    * the regex engine's per-char predicate lambdas dominated the parse
    * profile. */
  def pragmaticValid(iri: String): Boolean = {
    val n = iri.length
    if (n == 0) return false
    val c0 = iri.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return false
    var i = 1
    var sawColon = false
    while (i < n && !sawColon) {
      val c = iri.charAt(i)
      if (c == ':') sawColon = true
      else if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
                 (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')) return false
      i += 1
    }
    if (!sawColon) return false
    while (i < n) {
      val c = iri.charAt(i)
      if (c <= ' ' || c == '"' || c == '<' || c == '>' || c == '\\' ||
          c == '^' || c == '`' || c == '{' || c == '|' || c == '}') return false
      i += 1
    }
    true
  }

  private val ncNameStartCharClass =
    "A-Za-z\\xC0-\\xD6\\xD8-\\xF6\\x{F8}-\\x{2FF}\\x{370}-\\x{37D}" +
      "\\x{37F}-\\x{1FFF}\\x{200C}-\\x{200D}\\x{2070}-\\x{218F}\\x{2C00}-\\x{2FEF}" +
      "\\x{3001}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFFD}\\x{10000}-\\x{EFFFF}_"

  private val ncNameCharClass =
    ncNameStartCharClass + ".0-9#xB7\\x{0300}-\\x{036F}\\x{203F}-\\x{2040}\\-"

  private val ncNamePattern: Pattern =
    Pattern.compile(s"^([$ncNameStartCharClass])([$ncNameCharClass])*$$")

  def isNcName(value: String): Boolean = ncNamePattern.matcher(value).matches()
}
