package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.extract.ExtractKernel

/** Codegen helper: the single static entry point generated Java calls. */
object ExtractAllHelper {
  def eval(html: UTF8String, lang: UTF8String): InternalRow =
    build(if (html == null) null else html.toString, lang)

  /** BINARY-html entry: pages store html as bytes (input_hint schema), and
    * routing them through a `decode` column op costs two extra full-body
    * copies before the parse (StringDecode materializes a java String AND
    * re-wraps it as UTF8String; the helper then unwraps it again). One
    * UTF-8 decode directly from the stored bytes is the minimum possible —
    * the kernel parses java Strings (JIT-friendly charAt loops). */
  def evalBytes(html: Array[Byte], lang: UTF8String): InternalRow =
    build(if (html == null) null else new String(html, java.nio.charset.StandardCharsets.UTF_8),
      lang)

  private def build(html: String, lang: UTF8String): InternalRow = {
    val f = ExtractKernel.extractAll(
      html,
      if (lang == null) null else lang.toString)
    def s(x: String): AnyRef = if (x == null) null else UTF8String.fromString(x)
    def arr(xs: Seq[String]): GenericArrayData = new GenericArrayData(xs.map(s).toArray[Any])
    new GenericInternalRow(Array[Any](
      s(f.name), s(f.brand), arr(f.categories), s(f.barcode), s(f.imageUrl),
      s(f.priceBefore), s(f.priceAfter), f.offerDaysToAdd, f.ldFound,
      s(f.ldName), s(f.ldBrand), s(f.ldProductId), s(f.ldImage),
      arr(f.breadcrumbs), s(f.metroPriceBefore), s(f.metroPriceAfter),
      s(f.arNameXpath), arr(f.links)))
  }
}

/** Native Catalyst expression for the HTML extraction kernel: ONE parse per
  * page producing the full PageFields struct, generated code calling a
  * static helper — the last ScalaUDF between a 100 TB pages scan and the
  * product sink (VERDICT r03 #4). Same promotion pattern as
  * UrlCanonPartsExpr/BloomMightContainExpr: no per-row converter
  * allocations, and the extract stage stays inside whole-stage codegen
  * instead of ending the codegen span at a ScalaUDF node.
  *
  * Null semantics MATCH the UDF it replaces (not null-intolerant): a null
  * html parses as the empty document (kernel behavior,
  * ExtractKernel.extractAll), a null lang selects the EN sentinel — so the
  * result is never null. Byte-identity vs the reference is ExtractKernelSpec;
  * plan shape is asserted in SchedulerSpec/ExplainPlans §fetch+extract. */
case class ExtractAllExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  // analysis-time type check: a wrongly-typed child fails with a clear
  // analysis error instead of a Janino compile error / ClassCastException
  // at runtime (ADVICE r04; AbstractDataType is private[sql] in Spark 4 so
  // this overrides checkInputDataTypes directly rather than mixing in
  // ExpectsInputTypes). html accepts BINARY (the stored page-body type —
  // decoded once, directly) or STRING (pre-decoded columns / SQL surface).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if ((left.dataType == StringType || left.dataType == BinaryType) &&
        right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_all expects (string|binary, string) inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ExtractAllExpr.schema
  override def nullable: Boolean = false

  private def binaryHtml: Boolean = left.dataType == BinaryType

  override def eval(input: InternalRow): Any =
    if (binaryHtml)
      ExtractAllHelper.evalBytes(
        left.eval(input).asInstanceOf[Array[Byte]],
        right.eval(input).asInstanceOf[UTF8String])
    else
      ExtractAllHelper.eval(
        left.eval(input).asInstanceOf[UTF8String],
        right.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val entry = if (binaryHtml) "evalBytes" else "eval"
    val code =
      code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = graft.plans.ExtractAllHelper.$entry(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtractAllExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "extract_all"
}

object ExtractAllExpr {
  /** Field order/types = ExtractKernel.PageFields exactly (the schema the
    * replaced ScalaUDF's encoder derived). */
  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("brand", StringType),
    StructField("categories", ArrayType(StringType)),
    StructField("barcode", StringType),
    StructField("imageUrl", StringType),
    StructField("priceBefore", StringType),
    StructField("priceAfter", StringType),
    StructField("offerDaysToAdd", IntegerType, nullable = false),
    StructField("ldFound", BooleanType, nullable = false),
    StructField("ldName", StringType),
    StructField("ldBrand", StringType),
    StructField("ldProductId", StringType),
    StructField("ldImage", StringType),
    StructField("breadcrumbs", ArrayType(StringType)),
    StructField("metroPriceBefore", StringType),
    StructField("metroPriceAfter", StringType),
    StructField("arNameXpath", StringType),
    StructField("links", ArrayType(StringType))))

  /** Column API: extractAll(html, lang) -> PageFields struct. */
  def extractAll(html: Column, lang: Column): Column =
    GraftColumnBridge.column(
      ExtractAllExpr(GraftColumnBridge.expression(html), GraftColumnBridge.expression(lang)))
}
