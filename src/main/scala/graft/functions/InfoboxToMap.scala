package graft.functions

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `infobox_to_map(json)` — flattens a Bangumi infobox JSON array
  * (`[{key, value}]` with polymorphic `value`: string | number | list |
  * dict) into `map<string,string>`.
  *
  * Faithful to the reference's `parse_infobox`
  * (`/root/reference/bangumi_data_ingestion.py:263-295`):
  *  - keys are trimmed; blank/missing keys drop the entry;
  *  - list values: each element contributes `elem.v` if it is a dict with
  *    `v`, else its scalar text; elements joined with ", ";
  *  - dict values contribute `.v` (whole-JSON text if `v` is absent —
  *    the reference uses Python `str(dict)` repr there, we use JSON text);
  *  - scalar values are stringified and trimmed;
  *  - Python-truthiness: entries whose final value is empty are dropped;
  *  - duplicate keys: last one wins;
  *  - malformed JSON / non-array input → null (error-coerce, R4 semantics).
  *
  * A custom Catalyst `Expression` rather than a Scala UDF so null handling
  * is native AND the expression participates in whole-stage codegen for
  * real: `doGenCode` emits a direct static call into [[InfoboxToMap.evalJson]]
  * — no `CodegenFallback` (which re-packs the input row and calls the
  * interpreted path per tuple, a per-row detour the surrounding generated
  * code cannot elide).
  */
case class InfoboxToMap(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"infobox_to_map expects a string column, got ${child.dataType}")

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "infobox_to_map"

  override protected def nullSafeEval(input: Any): Any =
    InfoboxToMap.evalJson(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen handles the child-null short-circuit; the body is a
    // single static call whose null result (malformed input) folds into the
    // expression's own null slot. The parser itself is not inlinable Java —
    // what codegen buys here is staying ON the generated-code path (operand
    // already a UTF8String local, result a MapData local) instead of the
    // fallback's per-row InternalRow repack + interpreted dispatch.
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.InfoboxToMap.evalJson($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object InfoboxToMap {
  private val mapper = new ObjectMapper()

  /** Scalar JSON node → text: strings verbatim, numbers/booleans in JSON
    * notation, containers as compact JSON. */
  private def scalarText(n: JsonNode): String =
    if (n.isTextual) n.asText() else n.toString

  /** The whole parse, callable from both the interpreted path and the
    * generated code (static method → a plain `invokestatic` in the
    * compiled stage). Returns null for malformed/non-array input. */
  def evalJson(input: UTF8String): MapData = {
    val json = input.toString
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isArray) return null
      val out = mutable.LinkedHashMap.empty[String, String]
      root.forEach { item =>
        if (item.isObject) {
          val keyNode = item.get("key")
          val key =
            if (keyNode == null || keyNode.isNull) ""
            else scalarText(keyNode).trim
          if (key.nonEmpty) {
            val vNode = item.get("value")
            val value: String =
              if (vNode == null || vNode.isNull) null
              else if (vNode.isArray) {
                val parts = mutable.ArrayBuffer.empty[String]
                vNode.forEach { el =>
                  if (el.isObject)
                    parts += (if (el.has("v")) scalarText(el.get("v"))
                              else el.toString)
                  else parts += scalarText(el)
                }
                if (parts.isEmpty) null else parts.mkString(", ")
              } else if (vNode.isObject) {
                if (vNode.has("v")) scalarText(vNode.get("v"))
                else vNode.toString
              } else scalarText(vNode).trim
            if (value != null && value.nonEmpty) out(key) = value
          }
        }
      }
      ArrayBasedMapData(
        out.keys.map(UTF8String.fromString).toArray[Any],
        out.values.map(UTF8String.fromString).toArray[Any])
    } catch {
      case _: Exception => null
    }
  }
}
