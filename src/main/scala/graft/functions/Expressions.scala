package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot relational paths (SURVEY §4.2:
  * a codegen `Expression` beats a Scala UDF — UDFs are optimization
  * barriers and box every row through the encoder).
  *
  * All three stay inside whole-stage codegen: `doGenCode` emits either
  * inline Java long arithmetic (fmix64) or a static call (fnv1a64,
  * resolve_iri) — no closure serialization, no InternalRow → object
  * conversion, and JVM `long` arithmetic wraps, so the MinHash mixing needs
  * no ANSI-mode escape hatches (the reason the previous implementation had
  * to fall back to a typed Aggregator).
  */
object ExprHelpers {
  /** FNV-1a over the UTF-16 chars of the string — the exact hash
    * `graft.pipeline.Linking.fnv1a` computes on the Scala side, so pure-JVM
    * consumers and the Catalyst pipeline agree on every signature. */
  def fnv1a64(s: UTF8String): Long = {
    val str = s.toString
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < str.length) { h ^= str.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** RFC-3986-style resolution with the reference's pinned edge semantics
    * (`graft.rdf.IriResolver`, golden cases at reference test:111-215);
    * null on unresolvable input — relational stages keep flowing, the parse
    * kernel is where strict errors live (R28). */
  def resolveIriOrNull(value: UTF8String, base: UTF8String): UTF8String =
    try UTF8String.fromString(graft.rdf.IriResolver.resolve(value.toString, base.toString))
    catch { case _: graft.rdf.IriResolver.IriResolutionError => null }
}

/** murmur3 fmix64 finalizer as inline generated Java — the per-hash-function
  * mixing step of the MinHash family (`Linking.HashSeeds`). */
case class Fmix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    var z = v.asInstanceOf[Long]
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c;
         |$z = ($z ^ ($z >>> 33)) * 0xff51afd7ed558ccdL;
         |$z = ($z ^ ($z >>> 33)) * 0xc4ceb9fe1a85ec53L;
         |${ev.value} = $z ^ ($z >>> 33);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Fmix64 = copy(c)
}

/** 64-bit FNV-1a string hash (see [[ExprHelpers.fnv1a64]]). */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.fnv1a64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.fnv1a64($c)")
  override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
}

/** `resolve_iri(value, base)` — reference R20 as a relational scalar
  * (reference `valueToUri`, `lib/RdfXmlParser.ts:161-163`). Null (not error)
  * on unresolvable input. */
case class ResolveIri(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any, b: Any): Any =
    ExprHelpers.resolveIriOrNull(v.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) => {
      s"""
         |${ev.value} = graft.functions.ExprHelpers.resolveIriOrNull($v, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveIri =
    copy(left = l, right = r)
}

/** Column-API surface + SQL registration. */
object GraftFunctions {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}
  def fmix64(c: Column): Column = column(Fmix64(expression(c)))
  def fnv1a64(c: Column): Column = column(Fnv1a64(expression(c)))
  def resolve_iri(v: Column, base: Column): Column =
    column(ResolveIri(expression(v), expression(base)))

  /** Register the SQL names on a session (the non-extensions path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.GraftSqlBridge.registerTemp
    registerTemp(spark, "fmix64", es => Fmix64(es.head))
    registerTemp(spark, "fnv1a64", es => Fnv1a64(es.head))
    registerTemp(spark, "resolve_iri", es => ResolveIri(es.head, es(1)))
  }
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("fmix64"),
      new ExpressionInfo(classOf[Fmix64].getName, "fmix64"), es => Fmix64(es.head)))
    e.injectFunction((FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"), es => Fnv1a64(es.head)))
    e.injectFunction((FunctionIdentifier("resolve_iri"),
      new ExpressionInfo(classOf[ResolveIri].getName, "resolve_iri"), es => ResolveIri(es.head, es(1))))
  }
}
