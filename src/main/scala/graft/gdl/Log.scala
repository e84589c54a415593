package graft.gdl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Structured JSON logging ≙ the reference's per-component logger
  * contract (tests/test_import_dataset_logging.py,
  * test_dataset_versions_endpoint_logging.py et al.): every pipeline
  * component logs its input payload as the JSON string
  * `{"event": {...}}` at debug, and failures as `{"error": "..."}` at
  * warning — one JSON object per message, the component identified by
  * the logger name. This is the whole contract the reference pins:
  * message strings are exact JSON (the tests compare `dumps(...)`
  * equality), so ours are produced by Jackson, not string
  * concatenation.
  *
  * The sink is swappable (LogSpec captures lines; default stderr as
  * `component level json`). Driver-side: components log where they
  * coordinate; executor-side work reports through RESULT ROWS
  * (CopyResult, ValidationRow), which is what the status API reads —
  * logging a row stream through a driver sink would serialize the
  * fan-out.
  */
object Log {
  /** (component, level, message) — message is exact JSON. */
  type Sink = (String, String, String) => Unit

  @volatile private var sink: Sink =
    (c, lvl, msg) => System.err.println(s"$c $lvl $msg")

  /** Swap the sink for `f` (tests); restores on exit. Synchronized so
    * concurrent suites can't interleave restores. */
  def withSink[A](s: Sink)(f: => A): A = synchronized {
    val prev = sink
    sink = s
    try f finally sink = prev
  }

  private val mapper = new ObjectMapper()

  private def obj(fields: Seq[(String, Any)]): ObjectNode = {
    val o = mapper.createObjectNode()
    fields.foreach {
      case (k, v: String) => o.put(k, v)
      case (k, v: Long) => o.put(k, v)
      case (k, v: Int) => o.put(k, v)
      case (k, v: Boolean) => o.put(k, v)
      case (k, v: ObjectNode) => { val _ = o.set[ObjectNode](k, v) }
      case (k, v) => o.put(k, String.valueOf(v))
    }
    o
  }

  /** `{"event": {payload}}` at debug — the reference logs every
    * handler's input this way (EVENT_KEY). */
  def debugEvent(component: String, payload: (String, Any)*): Unit = {
    val root = mapper.createObjectNode()
    val _ = root.set[ObjectNode]("event", obj(payload))
    sink(component, "debug", mapper.writeValueAsString(root))
  }

  /** `{"error": "message"}` at warning — the reference's ERROR_KEY
    * shape for validation/lookup failures. */
  def warningError(component: String, message: String): Unit = {
    val root = mapper.createObjectNode()
    root.put("error", message): Unit
    sink(component, "warning", mapper.writeValueAsString(root))
  }

  /** `{"success": bool, "message": "..."}` at info — the validation
    * outcome shape (test_validation_summary_logging.py). */
  def infoOutcome(component: String, success: Boolean,
                  message: String): Unit = {
    val root = mapper.createObjectNode()
    root.put("success", success): Unit
    root.put("message", message): Unit
    sink(component, "info", mapper.writeValueAsString(root))
  }
}
