package graft.export

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal JSON serializer for the terminal export files — mirrors the
  * reference's `json.dumps(indent=4)` / `indent=2, sort_keys=True` output
  * conventions (hardware_report.py:359, annotations.py:100). Driver-side by
  * design: everything serialized here is an already-collected, tiny,
  * fully-aggregated result.
  */
object JsonWriter {

  def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15 && d == d.toLong.toDouble)
      // json.dumps prints floats with .0; keep doubles distinguishable
      s"${d.toLong}.0"
    else d.toString

  /** Serialize Maps/Seqs/primitives (the driver-side shapes). */
  def write(v: Any, indent: Int = 4, sortKeys: Boolean = false, level: Int = 0): String = {
    val pad = " " * (indent * (level + 1))
    val endPad = " " * (indent * level)
    v match {
      case null => "null"
      case None => "null"
      case Some(x) => write(x, indent, sortKeys, level)
      case s: String => esc(s)
      case b: Boolean => b.toString
      case i: Int => i.toString
      case l: Long => l.toString
      case d: Double => num(d)
      case f: Float => num(f.toDouble)
      case m: scala.collection.Map[_, _] =>
        if (m.isEmpty) "{}"
        else {
          // iterate entries directly (linear, and collision-correct:
          // two keys with equal toString each keep their own value) —
          // the earlier find-by-stringified-key rescan was O(n²) and
          // silently emitted the first match's value for both
          val kvs = m.toSeq.map { case (k, value) => (String.valueOf(k), value) }
          val ordered = if (sortKeys) kvs.sortBy(_._1) else kvs
          val entries = ordered.map { case (k, value) =>
            s"$pad${esc(k)}: ${write(value, indent, sortKeys, level + 1)}"
          }
          entries.mkString("{\n", ",\n", s"\n$endPad}")
        }
      case s: Seq[_] =>
        if (s.isEmpty) "[]"
        else
          s.map(e => s"$pad${write(e, indent, sortKeys, level + 1)}")
            .mkString("[\n", ",\n", s"\n$endPad]")
      case other => esc(other.toString)
    }
  }

  /** Convert a Row (with nested structs/maps/arrays) into the plain
    * Map/Seq shapes [[write]] consumes. */
  def rowToAny(value: Any, dataType: DataType): Any = (value, dataType) match {
    case (null, _) => null
    case (r: Row, st: StructType) =>
      scala.collection.immutable.ListMap(
        st.fields.zipWithIndex.map { case (f, i) =>
          f.name -> rowToAny(r.get(i), f.dataType)
        }.toSeq: _*
      )
    case (m: scala.collection.Map[_, _], mt: MapType) =>
      scala.collection.immutable.ListMap(
        m.toSeq.map { case (k, v) =>
          k.toString -> rowToAny(v, mt.valueType)
        }: _*
      )
    // the ordered-JSON-object convention: MapType cannot carry insertion
    // order through collect (scala HashMap above 4 keys), so exports that
    // need Python-dict key order emit an array<struct<k,v>> instead and
    // it serializes as an object in entry order
    case (s: scala.collection.Seq[_], ArrayType(st: StructType, _))
        if st.fields.length == 2 &&
          st.fields(0).name == "k" && st.fields(1).name == "v" =>
      scala.collection.immutable.ListMap(
        s.toSeq.map { case r: Row =>
          String.valueOf(r.get(0)) -> rowToAny(r.get(1), st.fields(1).dataType)
        }: _*
      )
    case (s: scala.collection.Seq[_], at: ArrayType) =>
      s.toSeq.map(e => rowToAny(e, at.elementType))
    case (d: java.sql.Date, _) => d.toString
    case (t: java.sql.Timestamp, _) => t.toString
    case (v, _) => v
  }
}
