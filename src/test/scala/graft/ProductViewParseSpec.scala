package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ProductViewParse
import graft.streaming.{ProductViewPipeline => P, Simulator}

/** Bit-parity of the compiled [[ProductViewParse]] kernel against the
  * `from_json(value, productViewSchema)` + flatten spelling it
  * replaced on the hot path — the VectorExpressions/WinnowFps
  * discipline: a kernel may only be faster, never different. The
  * comparison runs side by side IN Spark, so whatever from_json's
  * PERMISSIVE/partial-results behavior is on this engine version, the
  * kernel must reproduce it.
  */
class ProductViewParseSpec extends SparkSpec {

  private def viaKernel(df: DataFrame): DataFrame =
    df.select(col("value"),
      ProductViewParse.productViewParse(col("value")).as("v"))
      .select(col("value"), col("v").isNull.as("struct_null"),
        col("v.event"), col("v.messageid"), col("v.userid"),
        col("v.productid"), col("v.source"), col("v.timestamp"))

  private def viaFromJson(df: DataFrame): DataFrame =
    df.select(col("value"),
      from_json(col("value"), P.productViewSchema).as("v"))
      .select(col("value"), col("v").isNull.as("struct_null"),
        col("v.event"), col("v.messageid"), col("v.userid"),
        col("v.properties.productid"), col("v.context.source"),
        col("v.timestamp"))

  private def assertParity(df: DataFrame): Unit = {
    val k = viaKernel(df).collect().map(_.toSeq)
    val f = viaFromJson(df).collect().map(_.toSeq)
    val diffs = k.zip(f).collect { case (a, b) if a != b => (a, b) }
    assert(diffs.isEmpty, s"kernel != from_json on ${diffs.take(3).mkString("; ")}")
  }

  test("kernel matches from_json on every simulated wire record") {
    assertParity(Simulator.productViewJson(
      graft.model.Tables.events(spark, sf)))
  }

  test("kernel matches from_json on adversarial payloads (PERMISSIVE + partial results)") {
    import spark.implicits._
    val cases = Seq(
      // the full probed contract: corrupt, blank, null literal, root
      // array/scalar, wrong-typed nested objects with parsed siblings,
      // non-string tokens in string slots, duplicate keys, unicode
      """{"event":"ProductView","messageid":"m1","userid":"u1","properties":{"productid":"p1"},"context":{"source":"desktop"},"timestamp":"2021-03-07 19:01:00.000+0000"}""",
      """{not json""",
      "",
      "   ",
      "null",
      "5",
      "\"str\"",
      """[{"event":"x"}]""",
      """{"event":5,"messageid":{"a":1},"userid":[1,2],"properties":{"productid":7},"context":{"source":true},"timestamp":null}""",
      """{"event":"e","messageid":"m","properties":"notobj","context":{"source":"s"},"timestamp":"t"}""",
      """{"event":"e","context":[1],"properties":{"productid":"p"}}""",
      """{"event":"e","properties":{},"context":{}}""",
      """{"event":"e","properties":null,"context":null}""",
      """{"event":"dup","event":"dup2"}""",
      """{"userid":"u-Ünïcødé é","event":"e\n\t"}""",
      """{"event":"5.00 scale","messageid":5.00}""",
      """{"timestamp":"2021-03-07 19:01:00.123+0000"}""")
    assertParity(cases.toDF("value"))
    // null input column -> null struct on both sides
    val nullIn = Seq[String](null).toDF("value")
    assertParity(nullIn)
  }

  test("product_view_parse stays inside whole-stage codegen") {
    val e = Simulator.productViewJson(graft.model.Tables.events(spark, sf))
      .select(ProductViewParse.productViewParse(col("value")).as("v"))
    val planLine = e.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("product_view_parse")).getOrElse("")
    assert(planLine.trim.startsWith("*("),
      s"product_view_parse not in a codegen span: $planLine")
  }
}
