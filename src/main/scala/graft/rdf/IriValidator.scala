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
    * profile. The char classes are 128-entry lookup tables: the branchy
    * form cost up to ~10 compares per char and was still ~20% of the kernel
    * profile; a bounds check + array load is one predictable branch. Chars
    * ≥ 128 are scheme-invalid / body-valid, exactly as before. */
  private val schemeOk: Array[Boolean] = {
    val t = new Array[Boolean](128)
    for (c <- 'A' to 'Z') t(c) = true
    for (c <- 'a' to 'z') t(c) = true
    for (c <- '0' to '9') t(c) = true
    t('+') = true; t('-') = true; t('.') = true
    t
  }
  private val badBody: Array[Boolean] = {
    val t = new Array[Boolean](128)
    for (c <- 0 to ' '.toInt) t(c) = true
    for (c <- "\"<>\\^`{|}") t(c) = true
    t
  }

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
      else if (c >= 128 || !schemeOk(c)) return false
      i += 1
    }
    if (!sawColon) return false
    while (i < n) {
      val c = iri.charAt(i)
      if (c < 128 && badBody(c)) return false
      i += 1
    }
    true
  }

  // ------------------------------------------------------------ RFC 3987
  // The reference's `IriValidationStrategy.Strict` (validate-iri npm,
  // `lib/RdfXmlParser.ts:7,71-99`) validates against the full RFC 3987 IRI
  // grammar. Rebuilt here from the published ABNF.

  private val ucschar =
    "\\xA0-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}" +
      (0x1 to 0xD).map { p =>
        val h = Integer.toHexString(p).toUpperCase
        s"\\x{${h}0000}-\\x{${h}FFFD}"
      }.mkString +
      "\\x{E1000}-\\x{EFFFD}"
  private val iprivate = "\\x{E000}-\\x{F8FF}\\x{F0000}-\\x{FFFFD}\\x{100000}-\\x{10FFFD}"
  private val iunreserved = "A-Za-z0-9\\-._~" + ucschar
  private val subDelims = "!$&'()*+,;="
  private val pct = "%[0-9A-Fa-f]{2}"
  private val ipchar = s"(?:[$iunreserved$subDelims:@]|$pct)"
  private val decOctet = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  private val ipv4 = s"$decOctet(?:\\.$decOctet){3}"
  private val h16 = "[0-9A-Fa-f]{1,4}"
  private val ls32 = s"(?:$h16:$h16|$ipv4)"
  private val ipv6 = Seq(
    s"(?:$h16:){6}$ls32",
    s"::(?:$h16:){5}$ls32",
    s"(?:$h16)?::(?:$h16:){4}$ls32",
    s"(?:(?:$h16:){0,1}$h16)?::(?:$h16:){3}$ls32",
    s"(?:(?:$h16:){0,2}$h16)?::(?:$h16:){2}$ls32",
    s"(?:(?:$h16:){0,3}$h16)?::$h16:$ls32",
    s"(?:(?:$h16:){0,4}$h16)?::$ls32",
    s"(?:(?:$h16:){0,5}$h16)?::$h16",
    s"(?:(?:$h16:){0,6}$h16)?::",
  ).mkString("(?:", "|", ")")
  private val ipvFuture = s"v[0-9A-Fa-f]+\\.[A-Za-z0-9\\-._~$subDelims:]+"
  private val ipLiteral = s"\\[(?:$ipv6|$ipvFuture)\\]"
  private val iregName = s"(?:[$iunreserved$subDelims]|$pct)*"
  private val ihost = s"(?:$ipLiteral|$ipv4|$iregName)"
  private val iuserinfo = s"(?:[$iunreserved$subDelims:]|$pct)*"
  private val iauthority = s"(?:$iuserinfo@)?$ihost(?::[0-9]*)?"
  private val isegment = s"$ipchar*"
  private val isegmentNz = s"$ipchar+"
  private val ipathAbempty = s"(?:/$isegment)*"
  private val ipathAbsolute = s"/(?:$isegmentNz(?:/$isegment)*)?"
  private val ipathRootless = s"$isegmentNz(?:/$isegment)*"
  private val ihierPart =
    s"(?://$iauthority$ipathAbempty|$ipathAbsolute|$ipathRootless|)"
  private val iquery = s"(?:[$iunreserved$subDelims:@/?$iprivate]|$pct)*"
  private val ifragment = s"(?:[$iunreserved$subDelims:@/?]|$pct)*"

  private val strictPattern: Pattern = Pattern.compile(
    s"^[A-Za-z][A-Za-z0-9+\\-.]*:$ihierPart(?:\\?$iquery)?(?:#$ifragment)?$$")

  /** Full RFC 3987 validation — the reference's Strict strategy. */
  def strictValid(iri: String): Boolean = strictPattern.matcher(iri).matches()

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
