package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One compiled Jackson pass from a ProductView wire line to the FLAT
  * six-field record the pipeline consumes — the schema-projected
  * replacement for `from_json(value, productViewSchema)` +
  * struct-flattening select on the hot path.
  *
  * Why: `from_json` (JsonToStructs) is CodegenFallback — every record
  * pays interpreted dispatch plus the generic row assembly of the full
  * nested schema, then a second projection flattens it. Measured at
  * sf0.1 the from_json leg alone cost ~0.8 s per pass, paid by every
  * batch-parity pipeline query (parse, window count, distinct users,
  * content dedup, ...). This expression parses once, navigates the two
  * nested objects directly, and emits the flat row from inside
  * whole-stage codegen.
  *
  * Semantics replicate `from_json`'s PERMISSIVE + partial-results
  * contract exactly (probed on Spark 4.1 and spec-pinned
  * side-by-side, ProductViewParseSpec):
  *  - malformed JSON, a non-object root (array/scalar/`null`) -> a
  *    NON-null row of all-null fields;
  *  - empty / whitespace-only input -> NULL row (that is what
  *    JsonToStructs returns there — the one case the struct itself is
  *    null);
  *  - missing field or JSON null -> null field;
  *  - a string-typed field holding a non-string token -> the token's
  *    compact JSON text (floats round-trip through double on BOTH
  *    sides — probed: `5.00` -> "5.0" under from_json too — so
  *    DoubleNode.toString reproduces from_json's text; exotic
  *    non-canonical integer forms are outside the wire contract);
  *  - `properties`/`context` present but not an object -> that
  *    SUBTREE's fields null, sibling fields keep their parsed values
  *    (from_json's partial-results mode);
  *  - duplicate keys -> last wins.
  *
  * The dead-letter path ([[graft.streaming.ProductViewPipeline.parseWithRaw]])
  * deliberately stays on `from_json`: it needs PERMISSIVE's
  * corrupt-record CHANNEL (the raw payload captured next to the
  * failure), which is a quarantine feature, not a hot-path one.
  */
case class ProductViewParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ProductViewParse.structType
  override def nullable: Boolean = true
  override def prettyName: String = "product_view_parse"

  override def nullSafeEval(input: Any): Any =
    ProductViewParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.ProductViewParse.parse($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $boxed; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProductViewParse =
    copy(child = newChild)
}

object ProductViewParse {

  val structType: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("messageid", StringType),
    StructField("userid", StringType),
    StructField("productid", StringType),
    StructField("source", StringType),
    StructField("timestamp", StringType)))

  def productViewParse(wire: Column): Column =
    ColumnBridge.column(ProductViewParse(ColumnBridge.expression(wire)))

  // ObjectMapper is thread-safe; floats stay doubles because that is
  // what from_json's raw-copy ALSO round-trips through (probed:
  // messageid: 5.00 -> "5.0" under from_json), so DoubleNode.toString
  // reproduces its text exactly
  private val mapper: ObjectMapper = new ObjectMapper()

  private def allNull(): InternalRow = new GenericInternalRow(6)

  private def str(n: JsonNode): UTF8String =
    if (n == null || n.isNull) null
    else if (n.isTextual) UTF8String.fromString(n.textValue())
    else UTF8String.fromString(n.toString)

  /** Called from generated code — must stay public + static-friendly.
    * Returns null ONLY for blank input (the NULL-struct case). */
  def parse(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val root =
      try mapper.readTree(bytes, 0, bytes.length)
      catch { case _: Exception => return allNull() }
    if (root == null || root.isMissingNode) return null // blank input
    if (!root.isObject) return allNull()
    def nested(objName: String, field: String): UTF8String = {
      val o = root.get(objName)
      if (o == null || !o.isObject) null
      else str(o.get(field))
    }
    val row = new GenericInternalRow(6)
    row.update(0, str(root.get("event")))
    row.update(1, str(root.get("messageid")))
    row.update(2, str(root.get("userid")))
    row.update(3, nested("properties", "productid"))
    row.update(4, nested("context", "source"))
    row.update(5, str(root.get("timestamp")))
    row
  }
}
