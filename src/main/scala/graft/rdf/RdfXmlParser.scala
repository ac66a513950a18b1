package graft.rdf

import scala.collection.mutable

/** Parser configuration, mirroring `IRdfXmlParserArgs`
  * (`lib/RdfXmlParser.ts:950-990`). */
final case class ParserOptions(
    baseIRI: String = "",
    allowDuplicateRdfIds: Boolean = false,
    validateUri: Boolean = true,
    iriValidation: IriValidation = null, // defaults from validateUri like :94-99
    parseUnsupportedVersions: Boolean = false,
    version: Option[String] = None,
    trackPosition: Boolean = false,
    // Graph stamped on every emitted quad (`lib/RdfXmlParser.ts:90-93`,
    // `:761`; behavior pinned at test:1189-1201). "" = the default graph.
    // Constant per parse, so the Spark side attaches it as a literal column
    // (ParseStage.parseQuads) instead of widening every kernel Triple.
    defaultGraph: String = "",
    // Fresh blank-node label allocation, the factory-controlled part of the
    // reference's `dataFactory.blankNode()` with no argument
    // (`lib/RdfXmlParser.ts:409-419`): called with a per-document counter
    // (0, 1, 2, …) each time the grammar needs an anonymous node. null =
    // the default "b<counter>" labels.
    blankNodeLabel: Int => String = null,
) {
  def effectiveIriValidation: IriValidation =
    if (iriValidation != null) iriValidation
    else if (validateUri) IriValidation.Pragmatic
    else IriValidation.None
}

/** IRI validation strategy — the reference's `iriValidationStrategy`
  * option (`lib/RdfXmlParser.ts:978-981`, validate-iri's Strict / Pragmatic
  * / None), plus a user-supplied hook: `Custom` receives each IRI and
  * returns `Some(errorMessage)` to reject it. */
sealed trait IriValidation
object IriValidation {
  case object Strict extends IriValidation
  case object Pragmatic extends IriValidation
  case object None extends IriValidation
  final case class Custom(validate: String => Option[String]) extends IriValidation
}

/** A grammar/IRI violation. `message` already carries the
  * `Line L column C: ` prefix when position tracking is on
  * (`lib/ParseError.ts:7-12`). */
final case class ParseError(message: String)

private[rdf] final class ParseException(val rawMessage: String, val positioned: Boolean)
    extends RuntimeException(rawMessage)

private[rdf] object ParseMode {
  final val Resource = 0
  final val Property = 1
}

/** Per-XML-element state frame; direct analogue of `IActiveTag`
  * (`lib/RdfXmlParser.ts:992-1019`). One automaton instance exists per
  * document — inside Spark this is a short-lived object per row in a
  * `mapPartitions`, never a Spark datatype. */
private[rdf] final class ActiveTag {
  var subject: Term = _ // Iri | BNode
  var predicate: Iri = _
  var predicateEmitted = false
  var predicateSubPredicates: mutable.ArrayBuffer[Iri] = _
  var predicateSubObjects: mutable.ArrayBuffer[Term] = _
  var hadChildren = false
  var text: String = _
  var language: String = _
  var direction: String = _
  var datatype: Iri = _
  var childrenParseType: Int = ParseMode.Resource
  var baseIRI: String = _
  var listItemCounter: Int = 0
  var reifiedStatementId: Iri = _
  var childrenTagsToString = false
  var childrenStringTags: mutable.ArrayBuffer[String] = _
  var childrenStringEmitClosingTag: String = _
  var childrenCollectionSubject: Term = _
  var childrenCollectionPredicate: Iri = _
  var childrenTagsToTripleTerms = false
  var childrenTripleTerms: mutable.ArrayBuffer[Triple] = _
  var reifier: Term = _ // Iri | BNode
  var rdfVersion: String = _
  var namespaces: mutable.ArrayBuffer[(String, String)] = _
}

/** Streaming RDF/XML → triples automaton. A from-scratch Scala
  * re-expression of the reference's event-driven state machine
  * (`lib/RdfXmlParser.ts`), preserving its observable semantics:
  * single-pass, O(stack-depth) memory, incremental emission (a triple is
  * pushed the moment the closing of a construct determines it), identical
  * error taxonomy, and identical quirks (deferred dangling-property
  * buffering `:690-740`, parseType=Triple buffers swallowing suppressed
  * emissions `:857-873`, attribute-order-dependent literal language on
  * property elements `:702`).
  */
final class RdfXmlParser(opts: ParserOptions, push: Triple => Unit) {
  import RdfVocab._

  val tokenizer = new XmlTokenizer(handleEvent)

  private var mediaTypeVersionToCheck: Option[String] = opts.version
  private var bnodeCounter = 0
  private val nodeIds = mutable.HashSet.empty[String]
  private val stack = mutable.ArrayBuffer.empty[ActiveTag]

  private val ForbiddenNodeElements = RdfXmlParser.ForbiddenNodeElements
  private val ForbiddenPropertyElements = RdfXmlParser.ForbiddenPropertyElements

  // ---------------------------------------------------------------- plumbing

  /** Feed a chunk of the document; mirrors `_transform`
    * (`lib/RdfXmlParser.ts:122-141`) incl. the one-shot media-type version
    * check. */
  def write(chunk: String): Unit = {
    mediaTypeVersionToCheck match {
      case Some(v) =>
        mediaTypeVersionToCheck = None
        if (!isValidVersion(v))
          throw parseError(s"Detected unsupported version as media type parameter: $v")
      case scala.None =>
    }
    tokenizer.write(chunk)
  }

  def end(): Unit = tokenizer.end()

  private def parseError(message: String): ParseException =
    new ParseException(
      if (opts.trackPosition) s"Line ${tokenizer.line} column ${tokenizer.column + 1}: $message"
      else message,
      positioned = true,
    )

  private def isValidVersion(version: String): Boolean =
    opts.parseUnsupportedVersions || RdfXmlParser.SupportedVersions.contains(version)

  private def freshBNode(): BNode = {
    val label =
      if (opts.blankNodeLabel ne null) opts.blankNodeLabel(bnodeCounter) else "b" + bnodeCounter
    bnodeCounter += 1
    BNode(label)
  }

  /** `valueToUri` (`lib/RdfXmlParser.ts:161-163`). */
  private def valueToUri(value: String, tag: ActiveTag): Iri =
    uriToNamedNode(IriResolver.resolve(value, tag.baseIRI))

  /** `uriToNamedNode` with pragmatic validation (`:173-180`). */
  private def uriToNamedNode(uri: String): Iri = {
    opts.effectiveIriValidation match {
      case IriValidation.Pragmatic =>
        if (!IriValidator.pragmaticValid(uri))
          throw parseError(s"Invalid IRI according to RDF Turtle: '$uri'")
      case IriValidation.Strict =>
        if (!IriValidator.strictValid(uri))
          throw parseError(s"Invalid IRI according to RFC 3987: '$uri'")
      case IriValidation.Custom(f) =>
        f(uri).foreach(m => throw parseError(m))
      case IriValidation.None =>
    }
    Iri(uri)
  }

  private def validateNcname(value: String): Unit =
    if (!IriValidator.isNcName(value)) throw parseError(s"Not a valid NCName: $value")

  /** `createLiteral` (`:199-210`): datatype wins over language; direction
    * only under an in-scope rdf:version. */
  private def createLiteral(value: String, tag: ActiveTag): Lit =
    if (tag.datatype != null) Lit(value, tag.datatype.iri)
    else if (tag.language != null)
      Lit(value, null, tag.language, if (tag.rdfVersion != null) tag.direction else null)
    else Lit(value)

  private def setDirection(tag: ActiveTag, value: String): Unit = {
    if (value != null && value.nonEmpty) {
      if (value != "ltr" && value != "rtl")
        throw parseError(s"Base directions must either be 'ltr' or 'rtl', while '$value' was found.")
      tag.direction = value
    } else tag.direction = null
  }

  private def setVersion(tag: ActiveTag, version: String): Unit = {
    tag.rdfVersion = version
    if (!isValidVersion(version)) throw parseError(s"Detected unsupported version: $version")
  }

  /** Duplicate rdf:ID registry (`claimNodeId`, `:807-814`). */
  private def claimNodeId(term: Term): Unit = {
    if (!opts.allowDuplicateRdfIds) {
      val v = term match { case Iri(i) => i; case BNode(b) => b; case other => other.ntriples }
      if (nodeIds.contains(v))
        throw parseError(s"Found multiple occurrences of rdf:ID='$v'.")
      nodeIds += v
    }
  }

  // ---------------------------------------------------------------- emission

  /** `emitTriple` (`:753-798`): suppressible into a triple-term buffer, with
    * reifier / reification fan-out always going to the real output. */
  private def emitTriple(
      subject: Term,
      predicate: Iri,
      obj: Term,
      statementId: Iri,
      childrenTripleTerms: mutable.ArrayBuffer[Triple],
      reifier: Term,
  ): Unit = {
    val t = Triple(subject, predicate, obj)
    if (childrenTripleTerms != null) childrenTripleTerms += t
    else push(t)
    if (reifier != null)
      push(Triple(reifier, RdfXmlParser.IriReifies, TripleTerm(t)))
    if (statementId != null) {
      push(Triple(statementId, RdfXmlParser.IriType, RdfXmlParser.IriStatement))
      push(Triple(statementId, RdfXmlParser.IriSubject, subject))
      push(Triple(statementId, RdfXmlParser.IriPredicate, predicate))
      push(Triple(statementId, RdfXmlParser.IriObject, obj))
    }
  }

  // ------------------------------------------------------------------ events

  private def handleEvent(ev: XmlEvent): Unit = ev match {
    case t: OpenTag    => onTag(t)
    case TextEvent(s)  => onText(s)
    case CloseTag(_)   => onCloseTag()
    case DoctypeEvent(_) => // entities already registered by the tokenizer
  }

  /** `onTag` (`:233-300`). */
  private def onTag(tag: OpenTag): Unit = {
    val parentTag: ActiveTag = if (stack.nonEmpty) stack.last else null
    var currentParseType = ParseMode.Resource
    if (parentTag != null) {
      parentTag.hadChildren = true
      currentParseType = parentTag.childrenParseType
    }

    // parseType=Literal string-capture mode (`:245-266`).
    if (parentTag != null && parentTag.childrenStringTags != null) {
      val sb = new StringBuilder
      sb.append('<').append(tag.name)
      if (parentTag.namespaces != null)
        parentTag.namespaces.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(v).append('"') }
      tag.attributes.foreach { a => sb.append(' ').append(a.qname).append("=\"").append(a.value).append('"') }
      sb.append('>')
      parentTag.childrenStringTags += sb.toString

      val stringTag = new ActiveTag
      stringTag.childrenStringTags = parentTag.childrenStringTags
      stringTag.childrenStringEmitClosingTag = s"</${tag.name}>"
      stack += stringTag
      return
    }

    val activeTag = new ActiveTag
    if (parentTag != null) {
      activeTag.language = parentTag.language
      activeTag.direction = parentTag.direction
      activeTag.baseIRI = parentTag.baseIRI
      activeTag.childrenTripleTerms = parentTag.childrenTripleTerms
      activeTag.rdfVersion = parentTag.rdfVersion
    } else {
      activeTag.baseIRI = opts.baseIRI
    }
    stack += activeTag

    if (currentParseType == ParseMode.Resource)
      onTagResource(tag, activeTag, parentTag, rootTag = parentTag == null)
    else
      onTagProperty(tag, activeTag, parentTag)

    // Capture xmlns declarations for potential XMLLiteral serialization
    // (`:288-299`). Default xmlns follows the saxes key convention `xmlns:`.
    tag.attributes.foreach { a =>
      if (a.prefix == "xmlns") {
        if (activeTag.namespaces == null) activeTag.namespaces = mutable.ArrayBuffer.empty
        activeTag.namespaces += ((s"${a.prefix}:${a.local}", a.value))
      }
    }
    if (parentTag != null && parentTag.namespaces != null) {
      val merged = mutable.ArrayBuffer.empty[(String, String)]
      if (activeTag.namespaces != null) merged ++= activeTag.namespaces
      merged ++= parentTag.namespaces
      activeTag.namespaces = merged
    }
  }

  /** `onTagResource` (`:309-523`): node elements. */
  private def onTagResource(tag: OpenTag, activeTag: ActiveTag, parentTag: ActiveTag, rootTag: Boolean): Unit = {
    activeTag.childrenParseType = ParseMode.Property
    var typedNode = true
    if (tag.uri == RDF) {
      if (!rootTag && ForbiddenNodeElements.contains(tag.local))
        throw parseError(s"Illegal node element name: ${tag.local}")
      tag.local match {
        case "RDF" =>
          activeTag.childrenParseType = ParseMode.Resource
          typedNode = false
        case "Description" =>
          typedNode = false
        case _ =>
      }
    }

    val predicates = mutable.ArrayBuffer.empty[Iri]
    val objects = mutable.ArrayBuffer.empty[String]

    // Collect attributes first; subject is assigned only after all
    // attributes are seen because xml:base may still change (`:332-420`).
    var activeSubjectValue: String = null
    var claimSubjectNodeId = false
    var subjectValueBlank = false
    var explicitType: String = null

    tag.attributes.foreach { attribute =>
      var handled = true
      if (attribute.uri == RDF && attribute.local == "version") {
        setVersion(activeTag, attribute.value)
      } else if (parentTag != null && attribute.uri == RDF) {
        attribute.local match {
          case "about" =>
            if (activeSubjectValue != null)
              throw parseError(s"Only one of rdf:about, rdf:nodeID and rdf:ID can be present, " +
                s"while ${attribute.value} and $activeSubjectValue where found.")
            activeSubjectValue = attribute.value
          case "ID" =>
            if (activeSubjectValue != null)
              throw parseError(s"Only one of rdf:about, rdf:nodeID and rdf:ID can be present, " +
                s"while ${attribute.value} and $activeSubjectValue where found.")
            validateNcname(attribute.value)
            activeSubjectValue = "#" + attribute.value
            claimSubjectNodeId = true
          case "nodeID" =>
            if (activeSubjectValue != null)
              throw parseError(s"Only one of rdf:about, rdf:nodeID and rdf:ID can be present, " +
                s"while ${attribute.value} and $activeSubjectValue where found.")
            validateNcname(attribute.value)
            activeSubjectValue = attribute.value
            subjectValueBlank = true
          case "bagID" => throw parseError("rdf:bagID is not supported.")
          case "type" => explicitType = attribute.value
          case "aboutEach" => throw parseError("rdf:aboutEach is not supported.")
          case "aboutEachPrefix" => throw parseError("rdf:aboutEachPrefix is not supported.")
          case "li" => throw parseError("rdf:li on node elements are not supported.")
          case _ => handled = false
        }
      } else if (attribute.uri == XML && attribute.local == "lang") {
        activeTag.language = if (attribute.value.isEmpty) null else attribute.value.toLowerCase
      } else if (attribute.uri == XML && attribute.local == "base") {
        // xml:base resolves against the parent's base (`:387-391`).
        activeTag.baseIRI = IriResolver.resolve(attribute.value, activeTag.baseIRI)
      } else if (attribute.uri == ITS && attribute.local == "dir") {
        setDirection(activeTag, attribute.value)
      } else handled = false

      if (!handled) {
        // Property attribute — but only namespaced, non-xml(ns) ones (`:397-404`).
        if (attribute.prefix != "xml" && attribute.prefix != "xmlns" &&
            !(attribute.prefix == "" && attribute.local == "xmlns") &&
            attribute.uri.nonEmpty) {
          predicates += uriToNamedNode(attribute.uri + attribute.local)
          objects += attribute.value
        }
      }
    }

    if (activeSubjectValue != null) {
      activeTag.subject =
        if (subjectValueBlank) BNode(activeSubjectValue)
        else valueToUri(activeSubjectValue, activeTag)
      if (claimSubjectNodeId) claimNodeId(activeTag.subject)
    }
    if (activeTag.subject == null) activeTag.subject = freshBNode()

    if (typedNode) {
      val tpe = uriToNamedNode(tag.uri + tag.local)
      emitTriple(activeTag.subject, RdfXmlParser.IriType, tpe,
        if (parentTag != null) parentTag.reifiedStatementId else null,
        activeTag.childrenTripleTerms, activeTag.reifier)
    }

    if (parentTag != null) {
      if (parentTag.predicate != null) {
        if (parentTag.childrenCollectionSubject != null) {
          // rdf:List chaining (`:438-465`).
          val linkTerm = freshBNode()
          val restTerm = RdfXmlParser.IriRest
          val isRestTerm = parentTag.childrenCollectionPredicate == restTerm
          emitTriple(parentTag.childrenCollectionSubject, parentTag.childrenCollectionPredicate,
            linkTerm,
            if (isRestTerm) null else parentTag.reifiedStatementId,
            parentTag.childrenTripleTerms,
            if (isRestTerm) null else parentTag.reifier)
          emitTriple(linkTerm, RdfXmlParser.IriFirst, activeTag.subject, null,
            activeTag.childrenTripleTerms, null)
          parentTag.childrenCollectionSubject = linkTerm
          parentTag.childrenCollectionPredicate = restTerm
        } else {
          // Set-based properties (`:466-496`).
          if (!parentTag.childrenTagsToTripleTerms) {
            emitTriple(parentTag.subject, parentTag.predicate, activeTag.subject,
              parentTag.reifiedStatementId, parentTag.childrenTripleTerms, parentTag.reifier)
            parentTag.predicateEmitted = true
          }
          // Attach buffered dangling property-attributes to this child subject.
          if (parentTag.predicateSubPredicates != null) {
            var i = 0
            while (i < parentTag.predicateSubPredicates.length) {
              emitTriple(activeTag.subject, parentTag.predicateSubPredicates(i),
                parentTag.predicateSubObjects(i), null, parentTag.childrenTripleTerms,
                parentTag.reifier)
              i += 1
            }
            parentTag.predicateSubPredicates = mutable.ArrayBuffer.empty
            parentTag.predicateSubObjects = mutable.ArrayBuffer.empty
          }
        }
      }

      // Emit collected property attributes (`:499-510`).
      var i = 0
      while (i < predicates.length) {
        val obj = createLiteral(objects(i), activeTag)
        emitTriple(activeTag.subject, predicates(i), obj, parentTag.reifiedStatementId,
          parentTag.childrenTripleTerms, parentTag.reifier)
        i += 1
      }
      // rdf:type attribute emits a named node (`:512-521`).
      if (explicitType != null) {
        emitTriple(activeTag.subject, RdfXmlParser.IriType, uriToNamedNode(explicitType), null,
          activeTag.childrenTripleTerms, activeTag.reifier)
      }
    }
  }

  /** `onTagProperty` (`:531-741`): property elements. */
  private def onTagProperty(tag: OpenTag, activeTag: ActiveTag, parentTag: ActiveTag): Unit = {
    activeTag.childrenParseType = ParseMode.Resource
    activeTag.subject = parentTag.subject
    if (tag.uri == RDF && tag.local == "li") {
      // rdf:li → rdf:_N with a per-parent counter (`:535-540`).
      if (parentTag.listItemCounter == 0) parentTag.listItemCounter = 1
      activeTag.predicate = uriToNamedNode(s"${tag.uri}_${parentTag.listItemCounter}")
      parentTag.listItemCounter += 1
    } else {
      activeTag.predicate = uriToNamedNode(tag.uri + tag.local)
    }

    if (tag.uri == RDF && ForbiddenPropertyElements.contains(tag.local))
      throw parseError(s"Illegal property element name: ${tag.local}")

    activeTag.predicateSubPredicates = mutable.ArrayBuffer.empty
    activeTag.predicateSubObjects = mutable.ArrayBuffer.empty
    var parseType = false
    var attributedProperty = false

    var activeSubSubjectValue: String = null
    var subSubjectValueBlank = true
    val predicates = mutable.ArrayBuffer.empty[Iri]
    val objects = mutable.ArrayBuffer.empty[Term]

    tag.attributes.foreach { attribute =>
      var handled = true
      if (attribute.uri == RDF && attribute.local == "version") {
        setVersion(activeTag, attribute.value)
      } else if (attribute.uri == RDF) {
        attribute.local match {
          case "resource" =>
            if (activeSubSubjectValue != null)
              throw parseError(s"Found both rdf:resource (${attribute.value}) and rdf:nodeID ($activeSubSubjectValue).")
            if (parseType)
              throw parseError(s"rdf:parseType is not allowed on property elements with rdf:resource (${attribute.value})")
            activeTag.hadChildren = true
            activeSubSubjectValue = attribute.value
            subSubjectValueBlank = false
          case "datatype" =>
            if (attributedProperty)
              throw parseError(s"Found both non-rdf:* property attributes and rdf:datatype (${attribute.value}).")
            if (parseType)
              throw parseError(s"rdf:parseType is not allowed on property elements with rdf:datatype (${attribute.value})")
            activeTag.datatype = valueToUri(attribute.value, activeTag)
          case "nodeID" =>
            if (attributedProperty)
              throw parseError(s"Found both non-rdf:* property attributes and rdf:nodeID (${attribute.value}).")
            if (activeTag.hadChildren)
              throw parseError(s"Found both rdf:resource and rdf:nodeID (${attribute.value}).")
            if (parseType)
              throw parseError(s"rdf:parseType is not allowed on property elements with rdf:nodeID (${attribute.value})")
            validateNcname(attribute.value)
            activeTag.hadChildren = true
            activeSubSubjectValue = attribute.value
            subSubjectValueBlank = true
          case "bagID" => throw parseError("rdf:bagID is not supported.")
          case "parseType" =>
            if (attributedProperty)
              throw parseError("rdf:parseType is not allowed when non-rdf:* property attributes are present")
            if (activeTag.datatype != null)
              throw parseError(s"rdf:parseType is not allowed on property elements with rdf:datatype (${activeTag.datatype.iri})")
            if (activeSubSubjectValue != null)
              throw parseError(s"rdf:parseType is not allowed on property elements with rdf:nodeID or rdf:resource ($activeSubSubjectValue)")
            attribute.value match {
              case "Resource" =>
                parseType = true
                activeTag.childrenParseType = ParseMode.Property
                // Property element becomes an implicit blank node element (`:630-645`).
                val nested = freshBNode()
                emitTriple(activeTag.subject, activeTag.predicate, nested,
                  activeTag.reifiedStatementId, activeTag.childrenTripleTerms, activeTag.reifier)
                activeTag.subject = nested
                activeTag.predicate = null
              case "Collection" =>
                parseType = true
                activeTag.hadChildren = true
                activeTag.childrenCollectionSubject = activeTag.subject
                activeTag.childrenCollectionPredicate = activeTag.predicate
                subSubjectValueBlank = false
              case "Literal" =>
                parseType = true
                activeTag.childrenTagsToString = true
                activeTag.childrenStringTags = mutable.ArrayBuffer.empty
              case "Triple" =>
                parseType = true
                activeTag.childrenTagsToTripleTerms = true
                activeTag.childrenTripleTerms = mutable.ArrayBuffer.empty
              case _ =>
            }
          case "ID" =>
            validateNcname(attribute.value)
            activeTag.reifiedStatementId = valueToUri("#" + attribute.value, activeTag)
            claimNodeId(activeTag.reifiedStatementId)
          case "annotation" =>
            activeTag.reifier = Iri(attribute.value)
          case "annotationNodeID" =>
            activeTag.reifier = BNode(attribute.value)
          case _ => handled = false
        }
      } else if (attribute.uri == XML && attribute.local == "lang") {
        activeTag.language = if (attribute.value.isEmpty) null else attribute.value.toLowerCase
      } else if (attribute.uri == ITS && attribute.local == "dir") {
        setDirection(activeTag, attribute.value)
      } else if (attribute.uri == ITS && attribute.local == "version") {
        // its:version ignored (`:685-687`).
      } else handled = false

      if (!handled) {
        // Property attributes on a property element → implicit blank node
        // sub-properties (`:690-704`). Literals are created *during* the
        // loop, so xml:lang order matters — quirk preserved.
        if (attribute.prefix != "xml" && attribute.prefix != "xmlns" &&
            !(attribute.prefix == "" && attribute.local == "xmlns") &&
            attribute.uri.nonEmpty) {
          if (parseType || activeTag.datatype != null)
            throw parseError(s"Found illegal rdf:* properties on property element with attribute: ${attribute.value}")
          activeTag.hadChildren = true
          attributedProperty = true
          predicates += uriToNamedNode(attribute.uri + attribute.local)
          objects += createLiteral(attribute.value, activeTag)
        }
      }
    }

    if (activeSubSubjectValue != null) {
      // rdf:resource / rdf:nodeID object shortcut (`:706-732`).
      val subjectParent = activeTag.subject
      activeTag.subject =
        if (subSubjectValueBlank) BNode(activeSubSubjectValue)
        else valueToUri(activeSubSubjectValue, activeTag)
      emitTriple(subjectParent, activeTag.predicate, activeTag.subject,
        activeTag.reifiedStatementId, activeTag.childrenTripleTerms, activeTag.reifier)
      var i = 0
      while (i < predicates.length) {
        emitTriple(activeTag.subject, predicates(i), objects(i), null,
          activeTag.childrenTripleTerms, activeTag.reifier)
        i += 1
      }
      activeTag.predicateEmitted = true
    } else if (subSubjectValueBlank) {
      // Dangling property attributes: buffer until a child subject appears
      // or the tag closes (`:733-740`).
      activeTag.predicateSubPredicates = predicates
      activeTag.predicateSubObjects = objects
      activeTag.predicateEmitted = false
    }
  }

  /** `onText` (`:820-832`) — overwrite, not append. */
  private def onText(text: String): Unit = {
    if (stack.nonEmpty) {
      val activeTag = stack.last
      if (activeTag.childrenStringTags != null) activeTag.childrenStringTags += text
      else if (activeTag.predicate != null) activeTag.text = text
    }
  }

  /** `onCloseTag` (`:837-917`). */
  private def onCloseTag(): Unit = {
    val poppedTag = stack.remove(stack.length - 1)
    val parentTag: ActiveTag = if (stack.nonEmpty) stack.last else null

    if (poppedTag.childrenStringEmitClosingTag != null)
      poppedTag.childrenStringTags += poppedTag.childrenStringEmitClosingTag

    if (poppedTag.childrenTagsToString) {
      poppedTag.datatype = RdfXmlParser.IriXmlLiteral
      poppedTag.text = poppedTag.childrenStringTags.mkString("")
      poppedTag.hadChildren = false
    }

    if (poppedTag.childrenTagsToTripleTerms && poppedTag.predicate != null && poppedTag.rdfVersion != null) {
      if (poppedTag.childrenTripleTerms.length != 1)
        throw parseError(s"Expected exactly one triple term in rdf:parseType=\"Triple\" but got ${poppedTag.childrenTripleTerms.length}")
      poppedTag.childrenTripleTerms.foreach { tripleTerm =>
        emitTriple(poppedTag.subject, poppedTag.predicate, TripleTerm(tripleTerm), null,
          parentTag.childrenTripleTerms, parentTag.reifier)
      }
      poppedTag.predicateEmitted = true
    }

    if (poppedTag.childrenCollectionSubject != null) {
      // Terminate the rdf:List (`:875-883`).
      emitTriple(poppedTag.childrenCollectionSubject, poppedTag.childrenCollectionPredicate,
        RdfXmlParser.IriNil, null, poppedTag.childrenTripleTerms, null)
    } else if (poppedTag.predicate != null) {
      if (!poppedTag.hadChildren && poppedTag.childrenParseType != ParseMode.Property) {
        // Text-only property element → literal (`:884-894`).
        emitTriple(poppedTag.subject, poppedTag.predicate,
          createLiteral(if (poppedTag.text != null) poppedTag.text else "", poppedTag),
          poppedTag.reifiedStatementId, poppedTag.childrenTripleTerms, poppedTag.reifier)
      } else if (!poppedTag.predicateEmitted) {
        // Anonymous property element with buffered sub-properties (`:895-915`).
        val subject = freshBNode()
        emitTriple(poppedTag.subject, poppedTag.predicate, subject,
          poppedTag.reifiedStatementId, poppedTag.childrenTripleTerms, poppedTag.reifier)
        var i = 0
        while (i < poppedTag.predicateSubPredicates.length) {
          emitTriple(subject, poppedTag.predicateSubPredicates(i), poppedTag.predicateSubObjects(i),
            null, poppedTag.childrenTripleTerms, null)
          i += 1
        }
      }
    }
  }
}

object RdfXmlParser {

  // Constant terms, hoisted out of the emission hot path (allocated once per
  // JVM instead of once per triple).
  private[rdf] val IriType = Iri(RdfVocab.RDF + "type")
  private[rdf] val IriStatement = Iri(RdfVocab.RDF + "Statement")
  private[rdf] val IriSubject = Iri(RdfVocab.RDF + "subject")
  private[rdf] val IriPredicate = Iri(RdfVocab.RDF + "predicate")
  private[rdf] val IriObject = Iri(RdfVocab.RDF + "object")
  private[rdf] val IriReifies = Iri(RdfVocab.RDF + "reifies")
  private[rdf] val IriFirst = Iri(RdfVocab.RDF + "first")
  private[rdf] val IriRest = Iri(RdfVocab.RDF + "rest")
  private[rdf] val IriNil = Iri(RdfVocab.RDF + "nil")
  private[rdf] val IriXmlLiteral = Iri(RdfVocab.RDF + "XMLLiteral")

  /** `FORBIDDEN_NODE_ELEMENTS` (`lib/RdfXmlParser.ts:17-28`). */
  val ForbiddenNodeElements: Set[String] = Set(
    "RDF", "ID", "about", "bagID", "parseType", "resource", "nodeID", "li",
    "aboutEach", "aboutEachPrefix")

  /** `FORBIDDEN_PROPERTY_ELEMENTS` (`lib/RdfXmlParser.ts:30-41`). */
  val ForbiddenPropertyElements: Set[String] = Set(
    "Description", "RDF", "ID", "about", "bagID", "parseType", "resource",
    "nodeID", "aboutEach", "aboutEachPrefix")

  /** `SUPPORTED_VERSIONS` (`lib/RdfXmlParser.ts:56-60`). */
  val SupportedVersions: Set[String] = Set("1.2", "1.2-basic", "1.1")

  /** One-shot batch parse: the whole document text → all triples or the
    * first error. This is the per-row entry point used inside Spark
    * `mapPartitions`. */
  def parse(text: String, opts: ParserOptions = ParserOptions()): Either[ParseError, Vector[Triple]] = {
    val out = Vector.newBuilder[Triple]
    runToEither(new RdfXmlParser(opts, out += _), text)(out.result())
  }

  /** Single source of the exception → ParseError mapping shared by every
    * batch entry point — a new error site added to the parser must not make
    * the plain and factory surfaces diverge. */
  private def runToEither[T](parser: RdfXmlParser, text: String)(result: => T): Either[ParseError, T] =
    try {
      parser.write(text)
      parser.end()
      Right(result)
    } catch {
      case e: ParseException => Left(ParseError(e.rawMessage))
      case e: XmlSyntaxException => Left(ParseError(e.getMessage))
      case e: IriResolver.IriResolutionError => Left(ParseError(e.message))
      case e: NumberFormatException => Left(ParseError(s"Invalid character reference: ${e.getMessage}"))
    }

  /** Incremental parse surface for streaming-emission tests: feed chunks,
    * observe pushes. */
  def streaming(opts: ParserOptions)(push: Triple => Unit): RdfXmlParser =
    new RdfXmlParser(opts, push)

  /** Batch parse through a custom [[TermFactory]] — the reference's
    * `dataFactory` surface (`lib/RdfXmlParser.ts:85-93`): every term in the
    * result, including nested triple-term components, is built by `factory`.
    * Combine with [[ParserOptions.blankNodeLabel]] to also control fresh
    * blank-node allocation. */
  def parseWith[N](text: String, factory: TermFactory[N],
      opts: ParserOptions = ParserOptions()): Either[ParseError, Vector[(N, N, N)]] = {
    val out = Vector.newBuilder[(N, N, N)]
    val parser = streamingWith(opts, factory)((s, p, o) => out += ((s, p, o)))
    runToEither(parser, text)(out.result())
  }

  /** Incremental parse through a custom [[TermFactory]]: each emitted triple
    * is converted at the push boundary, preserving the chunk-by-chunk
    * emission contract (R29). */
  def streamingWith[N](opts: ParserOptions, factory: TermFactory[N])(
      push: (N, N, N) => Unit): RdfXmlParser =
    new RdfXmlParser(opts, t => push(
      TermFactory.convert(t.subj, factory),
      TermFactory.convert(t.pred, factory),
      TermFactory.convert(t.obj, factory)))
}
