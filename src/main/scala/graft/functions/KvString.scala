package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F8 — the reference's `k=v|k=v|...` delimiter-encoded record codec
  * (util/StringUtils.java:62-108, used for the session aggregate
  * record, accumulator value, and the page_split_convert_rate output
  * row `split=rate|split=rate`, domain/PageSplitConvertRate.java:5-6).
  *
  * Engine-internal data stays in typed structs (SURVEY §1.4); these
  * functions exist only at the OUTPUT EDGE, for byte-parity with the
  * reference's published string shapes — both are pure built-in
  * compositions, codegen'd.
  */
object KvString {

  /** Pack ordered (key, value-column) pairs into `k=v|k=v|...`. */
  def encode(fields: Seq[(String, Column)]): Column =
    concat_ws("|", fields.map { case (k, v) =>
      concat_ws("=", lit(k), v.cast("string"))
    }: _*)

  /** Reference `getFieldFromConcatString`: extract one field's value
    * from a packed string (null when absent). */
  def field(packed: Column, key: String): Column =
    element_at(decode(packed), key)

  /** Full decode to MapType(String, String) via the built-in
    * str_to_map. */
  def decode(packed: Column): Column =
    str_to_map(packed, lit("\\|"), lit("="))
}
