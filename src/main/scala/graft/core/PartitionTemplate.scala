package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partition-key templates (reference `PartitionTemplate`,
  * data_types/src/database_rules.rs:200-233): the key is the template
  * parts rendered IN ORDER, joined by `-`. A `Column` part renders
  * `name_value`, or BLANK (empty string, separators kept) when the row
  * has no such column or a null value — matching the reference exactly.
  * `TimeFormat` applies a strftime pattern to the ns `time` column in UTC.
  *
  * The computed key becomes a physical partition column
  * (`df.withColumn("part_key", ...) .write.partitionBy("part_key")`), so
  * Catalyst's partition pruning plays the role of the reference's
  * partition-level chunk pruning.
  */
sealed trait TemplatePart
object TemplatePart {
  case object Table extends TemplatePart
  final case class ColumnValue(name: String) extends TemplatePart
  final case class TimeFormat(strftime: String) extends TemplatePart
}

case class PartitionTemplate(parts: Seq[TemplatePart]) {
  import TemplatePart._

  def keyColumn(tableName: String, schema: StructType): Column =
    concat_ws("-", parts.map {
      case Table => lit(tableName)
      case ColumnValue(name) =>
        if (!schema.fieldNames.contains(name)) lit("")
        else when(col(name).isNotNull,
          concat(lit(name), lit("_"), col(name).cast("string")))
          .otherwise(lit(""))
      case TimeFormat(fmt) =>
        // null time -> BLANK part, separators kept (same contract as a
        // missing column value); bare date_format would return NULL and
        // concat_ws would silently drop the part AND its separator.
        coalesce(
          date_format(NsTime.nsToTimestamp(col(NsTime.TimeColumn)),
            PartitionTemplate.strftimeToJava(fmt)),
          lit(""))
    }: _*)

  /** Driver-side key of ONE line (reference `partition_key`,
    * database_rules.rs:205-228, applied per parsed LP line by
    * entry.rs:58-137 before batches are built): same rendering contract
    * as [[keyColumn]] — `Column` parts read the line's TAGS, falling
    * back to its FIELDS (database_rules.rs:211-217 tries tag_value then
    * field_value; a miss on both renders blank, separators kept), and
    * `TimeFormat` formats the ns timestamp in UTC. `fields` arrive
    * pre-rendered in the cast-to-string spelling [[keyColumn]] uses. */
  def keyOf(tableName: String, tags: Seq[(String, String)],
      timeNs: Long, fields: Seq[(String, String)] = Nil): String =
    parts.map {
      case Table => tableName
      case ColumnValue(name) =>
        tags.collectFirst { case (k, v) if k == name => s"${name}_$v" }
          .orElse(fields.collectFirst {
            case (k, v) if k == name => s"${name}_$v"
          })
          .getOrElse("")
      case TimeFormat(fmt) =>
        java.time.format.DateTimeFormatter
          .ofPattern(PartitionTemplate.strftimeToJava(fmt))
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochSecond(
            Math.floorDiv(timeNs, 1000000000L),
            Math.floorMod(timeNs, 1000000000L)))
    }.mkString("-")
}

object PartitionTemplate {
  /** Minimal strftime -> java.time pattern mapping for the tokens the
    * reference documents (database_rules.rs:233 examples). Literal text
    * outside tokens is single-quoted so java.time does not interpret it. */
  private val tokens = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss",
    "%j" -> "DDD", "%b" -> "MMM", "%%" -> "'%'")

  def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      tokens.find { case (t, _) => fmt.startsWith(t, i) } match {
        case Some((t, j)) => sb ++= j; i += t.length
        case None =>
          val c = fmt.charAt(i)
          if (c.isLetter) sb ++= s"'$c'" else sb += c
          i += 1
      }
    }
    sb.toString
  }
}
