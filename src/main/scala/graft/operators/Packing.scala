package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: fill fixed-capacity token
  * bins with documents, greedily and deterministically.
  *
  * Packing is inherently sequential *within* a pack group, so the
  * operator makes the group the unit of parallelism: rows are hash-
  * partitioned on the group key, sorted (group, id) within partitions,
  * and packed by a per-group running fill in a single `mapPartitions`
  * pass — the same one-shuffle shape the CDC assembler uses. Groups pack
  * independently, so throughput scales with the number of groups
  * (source, shard, date, …) regardless of corpus size, and the output is
  * a pure function of (group, id order, token counts) — stable across
  * runs, partition counts and engines.
  */
object Packing {

  /** Greedy sequential packing: documents are taken in ascending `idCol`
    * order within each `groupCol`; a document that would overflow the
    * current bin starts a new one; a document larger than `capacity`
    * occupies a bin alone. Returns one row per document with its
    * assigned `bin` (0-based per group) and the bin's fill after
    * placement. */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      capacity: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // fail FAST and NAMED on a null group/id/token: a null id or token
    // would kill the job mid-shuffle with an opaque "Null value appeared
    // in non-nullable field" encoder error, and a null GROUP would
    // silently coalesce every bad-join row into one null-keyed pack —
    // a data-quality error sailing through an operator that advertises
    // fail-fast on bad keys
    def requireSet(c: String) = ColumnGuards.requireNonNull(col(c),
      s"packSequences: null $c — pack order/fill would be undefined")
    df.select(
        requireSet(groupCol).cast("string").as("grp"),
        requireSet(idCol).cast("long").as("id"),
        requireSet(tokensCol).cast("long").as("tokens"))
      .as[(String, Long, Long)]
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
      .mapPartitions { it =>
        var curGrp: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (g, id, t) =>
          if (g != curGrp) { curGrp = g; bin = 0L; fill = 0L }
          if (fill > 0 && fill + t > capacity) { bin += 1; fill = t }
          else fill += t
          (g, id, t, bin, fill)
        }
      }
      .toDF(groupCol, idCol, tokensCol, "bin", "bin_fill")
  }
}
