package graft.core

import java.util.regex.Pattern

/** D11 column post-processing: exclude / truncate / mask, configured as
  * regex lists over fully-qualified `keyspace.table.column` names
  * (reference: VitessConnectorConfig.java:612-619 wiring Debezium's
  * column.exclude.list / column.truncate.to.N.chars /
  * column.mask.with.N.chars; exercised by VitessConnectorIT.java:742-897).
  * Truncate/mask apply to string-valued columns only, like the reference.
  */
final case class ColumnRules(
    excludeList: Seq[String] = Nil,
    truncate: Seq[(String, Int)] = Nil,
    mask: Seq[(String, Int)] = Nil) extends Serializable {

  @transient private lazy val exclude =
    excludeList.map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))
  @transient private lazy val trunc =
    truncate.map { case (p, n) => Pattern.compile(p, Pattern.CASE_INSENSITIVE) -> n }
  @transient private lazy val msk =
    mask.map { case (p, n) => Pattern.compile(p, Pattern.CASE_INSENSITIVE) -> n }

  def isExcluded(keyspace: String, table: String, column: String): Boolean = {
    val fq = s"$keyspace.$table.$column"
    exclude.exists(_.matcher(fq).matches())
  }

  /** Apply truncate/mask to a decoded string value. */
  def transformString(keyspace: String, table: String, column: String, value: String): String = {
    val fq = s"$keyspace.$table.$column"
    msk.find(_._1.matcher(fq).matches()) match {
      case Some((_, n)) => "*" * n
      case None =>
        trunc.find(_._1.matcher(fq).matches()) match {
          case Some((_, n)) if value.length > n => value.substring(0, n)
          case _ => value
        }
    }
  }

  def isEmpty: Boolean = excludeList.isEmpty && truncate.isEmpty && mask.isEmpty
}

object ColumnRules {
  val none: ColumnRules = ColumnRules()
}

/** E3: what to do when a raw value fails type conversion (reference:
  * `event.converting.failure.handling.mode`, wired at
  * VitessDatabaseSchema.java:56). */
sealed trait ConvertFailureMode extends Serializable
object ConvertFailureMode {
  /** Propagate the exception, failing the pipeline (default). */
  case object Fail extends ConvertFailureMode
  /** Null the offending column and continue (logs in the reference). */
  case object Warn extends ConvertFailureMode
  /** Drop the whole change record. */
  case object Skip extends ConvertFailureMode
}
