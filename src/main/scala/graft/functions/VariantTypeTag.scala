package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, VariantType}
import org.apache.spark.types.variant.VariantUtil
import org.apache.spark.unsafe.types.VariantVal

/** Native Catalyst expression returning the PHYSICAL type tag of a
  * variant value as a small int — the O(1) header-byte read that the
  * ETL transform's cast dispatch (`graft.etl.Transform`) needs, where
  * `schema_of_variant` would render a full type STRING per attribute
  * per row (and, for object/array values, recursively merge the whole
  * nested schema — unbounded work for a boolean answer).
  *
  * Tags cover exactly the types `parse_json` can produce (JSON has no
  * dates/binaries); anything else — DATE/TIMESTAMP/FLOAT/BINARY/UUID
  * values built by variant constructors other than parse_json — maps
  * to [[VariantTypeTag.TagOther]], which the transform dispatch treats
  * the same way its previous `schema_of_variant` string compares did
  * (no branch matches; NULL result). SQL NULL input stays NULL
  * (UnaryExpression null-intolerance), mirroring
  * `schema_of_variant(NULL)`.
  *
  * Registered as SQL function `graft_variant_tag` via
  * [[graft.GraftExtensions]]; the transform wraps it directly so it
  * works on sessions built without the extension.
  */
case class VariantTypeTag(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[VariantType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_variant_tag requires a variant argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    VariantTypeTag.tagOf(input.asInstanceOf[VariantVal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VariantTypeTag.tagOf($c)")

  override protected def withNewChildInternal(newChild: Expression): VariantTypeTag =
    copy(child = newChild)

  override def prettyName: String = "graft_variant_tag"
}

object VariantTypeTag {

  // Stable tag values (NOT enum ordinals — those are a Spark
  // implementation detail that could shift between releases).
  val TagJsonNull = 0
  val TagBoolean = 1
  val TagLong = 2
  val TagDecimal = 3
  val TagDouble = 4
  val TagString = 5
  val TagObject = 6
  val TagArray = 7
  val TagOther = 8

  /** Called from generated code — keep it static and allocation-free.
    * A VariantVal produced by `parse_json` or `variant_get` always has
    * its value encoding starting at offset 0 (`Variant.getValue` copies
    * the sub-range when extracting), so reading the header there is the
    * whole job.
    */
  def tagOf(v: VariantVal): Int =
    VariantUtil.getType(v.getValue, 0) match {
      case VariantUtil.Type.NULL    => TagJsonNull
      case VariantUtil.Type.BOOLEAN => TagBoolean
      case VariantUtil.Type.LONG    => TagLong
      case VariantUtil.Type.DECIMAL => TagDecimal
      case VariantUtil.Type.DOUBLE  => TagDouble
      case VariantUtil.Type.STRING  => TagString
      case VariantUtil.Type.OBJECT  => TagObject
      case VariantUtil.Type.ARRAY   => TagArray
      case _                        => TagOther
    }
}
