package graft.core

import java.util.regex.Pattern

/** Table include/exclude filtering (reference: Filters.java:29-49 +
  * VitessTableIdToStringMapper.java:22-25).
  *
  * Matching is against the fully-qualified `keyspace.table` name (shard
  * excluded), full-match, case-insensitive — Debezium selector semantics:
  * if an include list is set it wins; otherwise the exclude list drops
  * matches; system schemas are always excluded (Filters.java:22-23).
  *
  * Serializable so it ships into executor closures; patterns are
  * precompiled once per instance. */
final case class TableFilter(
    includeList: Seq[String],
    excludeList: Seq[String],
    excludeHeartbeatTables: Boolean = false) extends Serializable {

  @transient private lazy val include =
    includeList.map(r => Pattern.compile(r, Pattern.CASE_INSENSITIVE))
  @transient private lazy val exclude =
    excludeList.map(r => Pattern.compile(r, Pattern.CASE_INSENSITIVE))

  def included(keyspace: String, table: String): Boolean = {
    if (TableFilter.SystemSchemas.contains(keyspace.toLowerCase)) false
    // H2: Vitess heartbeat tables stream only when opted in (applies
    // before include/exclude, like the reference's server-side flag)
    else if (excludeHeartbeatTables && table.equalsIgnoreCase("heartbeat")) false
    else {
      val fq = s"$keyspace.$table"
      if (include.nonEmpty) include.exists(_.matcher(fq).matches())
      else !exclude.exists(_.matcher(fq).matches())
    }
  }
}

object TableFilter {
  /** Always-excluded MySQL system schemas (reference: Filters.java:22-23). */
  val SystemSchemas: Set[String] =
    Set("mysql", "performance_schema", "sys", "information_schema")

  val acceptAll: TableFilter = TableFilter(Nil, Nil)

  /** From the comma-separated config form (`table.include.list` /
    * `table.exclude.list`). */
  def fromConfig(includeCsv: Option[String], excludeCsv: Option[String]): TableFilter =
    TableFilter(
      includeCsv.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      excludeCsv.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
}
