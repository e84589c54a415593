package graft.gdl.expr

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import scala.collection.mutable

/** Strict JSON parse with duplicate-key detection ≙
  * /root/reference/backend/check_stac_metadata/utils.py:143-171:
  * `json.load(..., object_pairs_hook=...)` records EVERY repeated key in
  * an object (message `Found duplicate object name “k” in “url”`) and
  * keeps the FIRST value; malformed input is a JSON-parse failure.
  *
  * Spark's `from_json` silently keeps the LAST duplicate and reports
  * nothing, and Jackson's STRICT_DUPLICATE_DETECTION throws instead of
  * recording — so this walks the token stream and builds the tree by
  * hand (SURVEY §7.4 risk #2).
  */
object StrictJson {

  final case class ParseOutcome(
      node: Option[JsonNode],
      duplicateKeys: Seq[String],  // in encounter order, repeats included
      parseError: Option[String])

  private val factory = new JsonFactory()
  private val nodes = JsonNodeFactory.instance

  def parse(json: String): ParseOutcome = {
    val dups = mutable.ArrayBuffer.empty[String]
    try {
      val p = factory.createParser(json)
      val first = p.nextToken()
      if (first == null) return ParseOutcome(None, Nil, Some("empty document"))
      val node = readValue(p, first, dups)
      if (p.nextToken() != null)
        return ParseOutcome(None, dups.toSeq, Some("trailing content after JSON value"))
      ParseOutcome(Some(node), dups.toSeq, None)
    } catch {
      case e: Exception => ParseOutcome(None, dups.toSeq, Some(e.getMessage))
    }
  }

  private def readValue(p: JsonParser, tok: JsonToken,
                        dups: mutable.ArrayBuffer[String]): JsonNode = tok match {
    case JsonToken.START_OBJECT =>
      val obj = nodes.objectNode()
      var t = p.nextToken()
      while (t != JsonToken.END_OBJECT) {
        val key = p.currentName()
        val value = readValue(p, p.nextToken(), dups)
        if (obj.has(key)) dups += key // first value wins, dup recorded
        else { val _ = obj.set[JsonNode](key, value) }
        t = p.nextToken()
      }
      obj
    case JsonToken.START_ARRAY =>
      val arr = nodes.arrayNode()
      var t = p.nextToken()
      while (t != JsonToken.END_ARRAY) {
        arr.add(readValue(p, t, dups)): Unit
        t = p.nextToken()
      }
      arr
    case JsonToken.VALUE_STRING => nodes.textNode(p.getText)
    case JsonToken.VALUE_NUMBER_INT => nodes.numberNode(p.getLongValue)
    case JsonToken.VALUE_NUMBER_FLOAT => nodes.numberNode(p.getDoubleValue)
    case JsonToken.VALUE_TRUE => nodes.booleanNode(true)
    case JsonToken.VALUE_FALSE => nodes.booleanNode(false)
    case JsonToken.VALUE_NULL => nodes.nullNode()
    case other => throw new IllegalArgumentException(s"unexpected token $other")
  }
}
