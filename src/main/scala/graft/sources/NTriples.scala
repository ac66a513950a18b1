package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** N-Triples / N-Quads SOURCE — the read half of `Materialize.ntriples` /
  * `.nquads` (and of any standard N-Triples dump): lines → rows carrying the
  * same canonical term TEXT the rest of the pipeline uses in its `subj` /
  * `pred` / `obj` columns. Terms are tokenized, not decoded — the pipeline's
  * column convention IS serialized term text, so a sink→source round trip is
  * the identity on the columns.
  *
  * Scale shape: built on Spark's line-splittable text reader — a 100 TB dump
  * scans at full partition parallelism with no custom connector needed — and
  * the per-line scanner runs inside `mapPartitions` exactly like the RDF/XML
  * parse stage (manual column pruning is moot: text has one column).
  * Malformed lines go to the `error` column instead of killing the task
  * (same error-channel contract as the rdfxml source, reference R28).
  */
object NTriples {

  /** Row: term texts, or `error` for an unparseable line (terms null). */
  final case class NtRow(subj: String, pred: String, obj: String,
      graph: String, error: String)

  /** Read an N-Triples dump: columns (subj, pred, obj, error). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions(_.flatMap(parseLine(_, maxTerms = 3)))
      .toDF()
      .drop("graph")
  }

  /** Read an N-Quads dump: columns (subj, pred, obj, graph, error); `graph`
    * is null for default-graph lines (3 terms). */
  def readQuads(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions(_.flatMap(parseLine(_, maxTerms = 4)))
      .toDF()
  }

  /** Tokenize one line into its term texts. None = nothing to emit (blank or
    * comment line). Term boundaries respect quoted literals (escape-aware),
    * IRI brackets, and nested RDF 1.2 triple terms (`<<( … )>>` — the
    * canonical rendering `graft.rdf.TripleTerm.ntriples` produces, which
    * contains spaces). */
  private[sources] def parseLine(line: String, maxTerms: Int): Option[NtRow] = {
    var i = 0
    val n = line.length
    def skipWs(): Unit = { while (i < n && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1 }
    def err(msg: String): Option[NtRow] =
      Some(NtRow(null, null, null, null, s"$msg: ${line.take(160)}"))
    // Is the '.' at `pos` the statement terminator (followed only by
    // whitespace and/or a '#' comment)? Needed because blank-node labels and
    // language tags may be followed DIRECTLY by the terminating dot in the
    // W3C grammar (`_:b0.` / `"x"@en.`) while '.' is also a legal interior
    // character of a blank-node label (`_:a.b`).
    def isTerminatorDot(pos: Int): Boolean = {
      if (line.charAt(pos) != '.') return false
      var j = pos + 1
      while (j < n && (line.charAt(j) == ' ' || line.charAt(j) == '\t')) j += 1
      j >= n || line.charAt(j) == '#'
    }

    skipWs()
    if (i >= n || line.charAt(i) == '#') return None // blank or comment line

    val terms = scala.collection.mutable.ArrayBuffer.empty[String]
    while (i < n && line.charAt(i) != '.' && terms.length <= maxTerms) {
      val start = i
      line.charAt(i) match {
        case '<' if i + 2 < n && line.charAt(i + 1) == '<' && line.charAt(i + 2) == '(' =>
          // nested triple term: scan to the matching ')>>', skipping quoted
          // literals wholesale (a literal's raw text may contain ')>>')
          var depth = 0
          var closed = false
          while (i < n && !closed) {
            val c = line.charAt(i)
            if (c == '"') {
              i += 1
              var done = false
              while (i < n && !done) {
                val d = line.charAt(i)
                if (d == '\\') i += 2
                else { if (d == '"') done = true; i += 1 }
              }
            }
            else if (line.startsWith("<<(", i)) { depth += 1; i += 3 }
            else if (line.startsWith(")>>", i)) { depth -= 1; i += 3; closed = depth == 0 }
            else i += 1
          }
          if (!closed) return err("Unterminated triple term")
        case '<' =>
          val close = line.indexOf('>', i)
          if (close < 0) return err("Unterminated IRI")
          i = close + 1
        case '"' =>
          i += 1
          var closed = false
          while (i < n && !closed) {
            val c = line.charAt(i)
            if (c == '\\') i += 2
            else if (c == '"') { closed = true; i += 1 }
            else i += 1
          }
          if (!closed) return err("Unterminated literal")
          // language tag / direction / datatype suffix: @en, @en--ltr, ^^<dt>
          if (i < n && line.charAt(i) == '@') {
            while (i < n && line.charAt(i) != ' ' && line.charAt(i) != '\t' && !isTerminatorDot(i)) i += 1
          } else if (i + 1 < n && line.charAt(i) == '^' && line.charAt(i + 1) == '^') {
            i += 2
            if (i >= n || line.charAt(i) != '<') return err("Malformed datatype suffix")
            val close = line.indexOf('>', i)
            if (close < 0) return err("Unterminated datatype IRI")
            i = close + 1
          }
        case '_' =>
          while (i < n && line.charAt(i) != ' ' && line.charAt(i) != '\t' && !isTerminatorDot(i)) i += 1
        case _ =>
          return err("Unexpected term start")
      }
      terms += line.substring(start, i)
      skipWs()
    }
    if (i >= n || line.charAt(i) != '.') return err("Missing terminating '.'")
    i += 1
    skipWs()
    if (i < n && line.charAt(i) != '#') return err("Trailing content after '.'")
    if (terms.length < 3 || terms.length > maxTerms)
      return err(s"Expected 3${if (maxTerms == 4) " or 4" else ""} terms, got ${terms.length}")
    Some(NtRow(terms(0), terms(1), terms(2),
      if (terms.length == 4) terms(3) else null, null))
  }
}
