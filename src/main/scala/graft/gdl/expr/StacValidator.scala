package graft.gdl.expr

import com.fasterxml.jackson.databind.JsonNode

/** Structural STAC validator ≙ the reference's Draft-7 JSON-Schema
  * validation of Catalog / Collection / Item documents
  * (/root/reference/backend/check_stac_metadata/stac_validators.py:11-74,
  * schemas bundled from stac-spec 1.0.0-rc.3). The offline build carries
  * no JSON-Schema engine, so this hand-checks the required properties and
  * shapes the pipeline relies on (FIXTURES.md §1); error messages follow
  * jsonschema's "'x' is a required property" phrasing.
  */
object StacValidator {

  val CatalogType = "Catalog"
  val CollectionType = "Collection"
  val ItemType = "Feature" // STAC items are GeoJSON Features

  /** None = valid; Some(message) = first validation error. */
  def validate(node: JsonNode, stacType: String): Option[String] = stacType match {
    case CatalogType => validateCatalogCore(node)
    case CollectionType =>
      validateCatalogCore(node)
        .orElse(requireString(node, "license"))
        .orElse(validateExtent(node))
    case ItemType => validateItem(node)
    case other => Some(s"'$other' is not a known STAC type")
  }

  def typeOf(node: JsonNode): Option[String] =
    Option(node.get("type")).filter(_.isTextual).map(_.asText)

  private def validateCatalogCore(n: JsonNode): Option[String] =
    requireString(n, "type")
      .orElse(requireString(n, "stac_version"))
      .orElse(requireString(n, "id"))
      .orElse(requireString(n, "description"))
      .orElse(requireLinks(n))
      // assets are optional on Catalog/Collection, but when present the
      // crawler harvests them (utils.py:119-124 walks assets of every doc
      // type), so href/file:checksum must validate for ALL types — a
      // malformed catalog asset must surface as a JSON-schema failure
      // row, not a crawler crash
      .orElse(if (n.has("assets"))
        requireObject(n, "assets").orElse(validateAssets(n))
      else None)

  private def validateItem(n: JsonNode): Option[String] =
    requireString(n, "type")
      .orElse(requireString(n, "stac_version"))
      .orElse(requireString(n, "id"))
      .orElse(require(n, "geometry")) // nullable but must be present
      .orElse(requireObject(n, "properties"))
      .orElse(Option(n.get("properties")).flatMap(p => requireString(p, "datetime")))
      .orElse(requireObject(n, "assets"))
      .orElse(validateAssets(n))
      .orElse(requireLinks(n))

  private def validateExtent(n: JsonNode): Option[String] =
    requireObject(n, "extent").orElse {
      val e = n.get("extent")
      requireObject(e, "spatial")
        .orElse(requireArray(e.get("spatial"), "bbox"))
        .orElse(requireObject(e, "temporal"))
        .orElse(requireArray(e.get("temporal"), "interval"))
    }

  private def validateAssets(n: JsonNode): Option[String] = {
    val assets = n.get("assets")
    val it = assets.fields()
    while (it.hasNext) {
      val entry = it.next()
      val a = entry.getValue
      if (!a.isObject) return Some(s"asset '${entry.getKey}' is not an object")
      if (!a.has("href")) return Some(s"'href' is a required property")
      if (!a.has("file:checksum")) return Some(s"'file:checksum' is a required property")
    }
    None
  }

  private def requireLinks(n: JsonNode): Option[String] =
    requireArray(n, "links").orElse {
      val links = n.get("links")
      var i = 0
      while (i < links.size()) {
        if (!links.get(i).isObject || !links.get(i).has("href"))
          return Some(s"'href' is a required property")
        i += 1
      }
      None
    }

  private def require(n: JsonNode, f: String): Option[String] =
    if (n != null && n.has(f)) None else Some(s"'$f' is a required property")

  private def requireString(n: JsonNode, f: String): Option[String] =
    require(n, f).orElse(
      if (n.get(f).isTextual) None else Some(s"'$f' is not of type 'string'"))

  private def requireObject(n: JsonNode, f: String): Option[String] =
    require(n, f).orElse(
      if (n.get(f).isObject) None else Some(s"'$f' is not of type 'object'"))

  private def requireArray(n: JsonNode, f: String): Option[String] =
    require(n, f).orElse(
      if (n.get(f).isArray) None else Some(s"'$f' is not of type 'array'"))
}
