package graft.rdf

import scala.collection.mutable

/** Minimal readers for the vendored W3C test layout under
  * `src/test/resources/w3c/`: a Turtle subset sufficient for the official
  * rdf-tests `manifest.ttl` shape (`@prefix`, one-subject statements with
  * `;`-chained predicate-object pairs, IRIs, prefixed names, `a`, string
  * literals), and an N-Triples reader for the `mf:result` expected graphs.
  * The live manifests the reference runs (`package.json:74-78` via
  * `rdf-test-suite`) are fetched over the network and unreachable from this
  * sandbox, so a checked-in subset drives the same mechanism: new cases are
  * added by dropping in `.rdf`/`.nt` files plus one manifest stanza — no
  * Scala edits.
  */
object W3cManifest {

  final case class Entry(name: String, kind: String, comment: String,
                         action: String, result: Option[String])

  private val Mf = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val Rdft = "http://www.w3.org/ns/rdftest#"
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Parse the manifest Turtle subset into test entries (document order). */
  def entries(turtle: String): Vector[Entry] = {
    val toks = tokenize(turtle)
    val prefixes = mutable.Map.empty[String, String]
    // subject -> predicate -> object values (IRIs already expanded)
    val subjects = mutable.LinkedHashMap.empty[String, mutable.Map[String, String]]
    var i = 0
    def expand(tok: String): String = tok match {
      case t if t.startsWith("<") => t.substring(1, t.length - 1)
      case "a" => RdfType
      case t if t.startsWith("\"") => t.substring(1, t.length - 1)
      case t =>
        val c = t.indexOf(':')
        require(c >= 0, s"not a prefixed name: $t")
        val p = t.substring(0, c + 1)
        prefixes.getOrElse(p, sys.error(s"undeclared prefix $p")) + t.substring(c + 1)
    }
    while (i < toks.length) {
      if (toks(i) == "@prefix") {
        prefixes(toks(i + 1)) = toks(i + 2).substring(1, toks(i + 2).length - 1)
        require(toks(i + 3) == ".", s"malformed @prefix at ${toks.slice(i, i + 4)}")
        i += 4
      } else {
        val subj = expand(toks(i))
        val po = subjects.getOrElseUpdate(subj, mutable.Map.empty)
        i += 1
        var done = false
        while (!done) {
          val pred = expand(toks(i))
          val obj = expand(toks(i + 1))
          po(pred) = obj
          i += 2
          toks(i) match {
            case ";" => i += 1
            case "." => i += 1; done = true
            case other => sys.error(s"expected ; or . after $pred, got $other")
          }
        }
      }
    }
    subjects.iterator.collect {
      case (_, po) if po.get(RdfType).exists(_.startsWith(Rdft)) =>
        Entry(
          name = po.getOrElse(Mf + "name", sys.error("entry without mf:name")),
          kind = po(RdfType).substring(Rdft.length),
          comment = po.getOrElse(Mf + "comment", ""),
          action = po.getOrElse(Mf + "action", sys.error("entry without mf:action")),
          result = po.get(Mf + "result"))
    }.toVector
  }

  /** Whitespace tokenizer aware of `<...>`, `"..."` (with backslash
    * escapes), and `#` comments; `.` `;` `,` become their own tokens. */
  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '#' => while (i < s.length && s.charAt(i) != '\n') i += 1
        case '<' =>
          val e = s.indexOf('>', i)
          require(e > 0, "unterminated IRI")
          out += s.substring(i, e + 1); i = e + 1
        case '"' =>
          var j = i + 1
          while (j < s.length && s.charAt(j) != '"') { if (s.charAt(j) == '\\') j += 1; j += 1 }
          out += s.substring(i, j + 1); i = j + 1
        case c @ (';' | ',') => out += c.toString; i += 1
        case '.' if i + 1 >= s.length || s.charAt(i + 1).isWhitespace =>
          out += "."; i += 1
        case _ =>
          var j = i
          while (j < s.length && !s.charAt(j).isWhitespace && s.charAt(j) != ';') j += 1
          var t = s.substring(i, j)
          // a trailing statement dot glued to a pname ("... mf:x ." handled
          // above; "...Eval." inside names does not occur in manifests)
          if (t.length > 1 && t.endsWith(".")) { t = t.dropRight(1); out += t; out += "." }
          else out += t
          i = j
      }
    }
    out.result()
  }

  /** Parse an N-Triples expected-result document into kernel triples.
    * Supports IRIs, blank nodes, literals with `\\ \" \n \r \t \uXXXX`
    * escapes, `@lang` (with optional `--dir`), `^^<dt>`, and RDF 1.2
    * triple terms `<<( s p o )>>` (the official rdf12 suite's N-Triples
    * result syntax), nested arbitrarily. */
  def readNt(nt: String): Vector[Triple] =
    nt.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
      val (s, r1) = ntTerm(line)
      val (p, r2) = ntTerm(r1)
      val (o, r3) = ntTerm(r2)
      require(r3.trim == ".", s"malformed N-Triples line: $line")
      Triple(s, p, o)
    }.toVector

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' => b.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 6), 16))); i += 6
          case 'U' => b.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case other => sys.error(s"unsupported escape \\$other")
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** One term off the front of an N-Triples line; returns (term, rest). */
  private def ntTerm(line0: String): (Term, String) = {
    val line = line0.dropWhile(_.isWhitespace)
    if (line.startsWith("<<(")) {
      val (s, r1) = ntTerm(line.substring(3))
      val (p, r2) = ntTerm(r1)
      val (o, r3) = ntTerm(r2)
      val r = r3.dropWhile(_.isWhitespace)
      require(r.startsWith(")>>"), s"unterminated triple term at: $line0")
      (TripleTerm(Triple(s, p, o)), r.substring(3))
    } else if (line.startsWith("<")) {
      val e = line.indexOf('>')
      (Iri(unescape(line.substring(1, e))), line.substring(e + 1))
    } else if (line.startsWith("_:")) {
      // a bnode may be flush against a triple-term closer: `_:b )>>`
      val e0 = line.indexWhere(c => c.isWhitespace || c == ')')
      val e = if (e0 < 0) line.length else e0
      (BNode(line.substring(2, e)), line.substring(e))
    } else if (line.startsWith("\"")) {
      var j = 1
      while (line.charAt(j) != '"') { if (line.charAt(j) == '\\') j += 1; j += 1 }
      val lex = unescape(line.substring(1, j))
      var rest = line.substring(j + 1)
      if (rest.startsWith("^^<")) {
        val e = rest.indexOf('>')
        (Lit(lex, unescape(rest.substring(3, e))), rest.substring(e + 1))
      } else if (rest.startsWith("@")) {
        val e0 = rest.indexWhere(_.isWhitespace)
        val e = if (e0 < 0) rest.length else e0
        val tag = rest.substring(1, e)
        rest = rest.substring(e)
        val dd = tag.indexOf("--")
        if (dd >= 0) (Lit(lex, null, tag.substring(0, dd), tag.substring(dd + 2)), rest)
        else (Lit(lex, null, tag), rest)
      } else (Lit(lex), rest)
    } else sys.error(s"cannot read term at: $line0")
  }
}
