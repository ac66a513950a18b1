package graft.rdf

import java.nio.file.{Files, Paths}

/** Tiny CLI surface for the pure kernel: parse one RDF/XML file (or stdin)
  * and print canonical N-Triples, mirroring what the per-row automaton does
  * inside the Spark pipeline. Usage: `runMain graft.rdf.ParseCli [file]
  * [baseIRI]`. Exit 1 on parse error (message on stderr).
  */
object ParseCli {
  def main(args: Array[String]): Unit = {
    val text =
      if (args.nonEmpty) new String(Files.readAllBytes(Paths.get(args(0))), "UTF-8")
      else new String(System.in.readAllBytes(), "UTF-8")
    val base = if (args.length > 1) args(1) else ""
    RdfXmlParser.parse(text, ParserOptions(baseIRI = base)) match {
      case Right(triples) =>
        triples.foreach(t => println(t.ntriples))
      case Left(e) =>
        System.err.println(s"parse error: ${e.message}")
        sys.exit(1)
    }
  }
}
