package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained ANN index over an embedding
  * corpus — the embedding-side twin of [[Dedup.ingestNearDupBatch]]'s
  * minhash loop: train the coarse quantizer ONCE, then encode and probe
  * arbitrarily many new batches without ever touching (or retraining
  * on) the existing corpus.
  *
  * On-disk layout under `indexDir` (all through the Hadoop FileSystem
  * API — HDFS/S3A/local alike):
  *
  * {{{
  *   centroids/               (cid long, centroid array<double>) — bounded
  *   codes/batch_<id>/cid=…/  (vec_id, scale, qvec array<byte>) int8 codes,
  *                            hive-partitioned by assigned cell
  *   vectors/batch_<id>/      (vec_id, embedding array<float>) raw store
  * }}}
  *
  * Scale shape, stage by stage:
  *
  *  - the quantizer (IVF centroids) is trained on a bounded sample
  *    ([[Similarity.trainCentroids]]) and FROZEN at build time — the
  *    FAISS stance: an index whose cells drift per batch cannot be
  *    probed consistently, and retraining per ingest is a corpus-wide
  *    job. `trainIters = 0` is the replay mode shared with
  *    [[Similarity.ivfTopK]] (centroids = first `nCentroids` vectors in
  *    id order), which makes the whole probe SQL-replayable;
  *  - codes are int8 ([[Similarity.quantizeInt8]]): the candidate scan
  *    reads 1 byte/dim instead of 4, and `partitionBy(cid)` means a
  *    probe's cell filter becomes PartitionFilters at the parquet scan —
  *    unprobed cells are never read, which is what keeps probe cost
  *    proportional to `nProbes/nCentroids` of the corpus at 100 TB;
  *  - the exact-rescore stage joins the raw float store on candidate ids
  *    only (`|q|·k·rescoreFactor` rows), never the corpus;
  *  - ingest is a narrow per-row map (assign + quantize) over the new
  *    batch alone — O(batch), zero shuffles, with the same per-batch
  *    overwrite-on-retry discipline as the dedup ingest loop.
  */
object AnnIndex {

  import org.apache.spark.sql.types._

  /** Fixed on-disk schemas: reads always pass them explicitly, so an
    * empty ingest batch (a routine empty micro-batch writes a
    * batch_<id> dir holding only _SUCCESS) can never brick the index on
    * parquet schema inference. Ingest casts to these types. */
  private val codesSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("scale", DoubleType),
    StructField("qvec", ArrayType(ByteType)),
    StructField("cid", LongType)))
  private val vectorsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def fsOf(spark: SparkSession, dir: String) = Dedup.stateFs(spark, dir)

  /** Build a fresh index from an initial corpus: train (or, at
    * `trainIters = 0`, take-by-id) the centroids, persist them, then
    * encode the corpus itself as ingest batch 0. Refuses to overwrite an
    * existing index — rebuilding under live readers is a destructive op
    * the caller must make explicit by choosing a new directory. */
  def build(
      corpus: DataFrame,
      indexDir: String,
      nCentroids: Int = 32,
      trainIters: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainRows: Int = 4096): Unit = {
    val spark = corpus.sparkSession
    val (fs, root) = fsOf(spark, indexDir)
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "centroids")),
      s"ANN index already exists at $indexDir — ingest into it or pick a new dir")
    // trainIters = 0 keeps cid = vec_id of the first `nCentroids` vectors
    // in id order — byte-for-byte the ivfTopK replay rule, so the whole
    // index is oracle-checkable (the ONE shared acquisition)
    val centroids: Array[(Long, Array[Double])] =
      Similarity.coarseCentroids(corpus, nCentroids, trainIters, idCol, vecCol, trainRows)
    val sp = spark
    import sp.implicits._
    centroids.toSeq.toDF("cid", "centroid")
      .coalesce(1).write.mode("errorifexists").parquet(s"$indexDir/centroids")
    // the seed corpus lives under the RESERVED batch_seed name: a
    // foreachBatch loop's ids start at 0, and a numeric seed batch would
    // be OVERWRITTEN by the stream's very first micro-batch
    writeBatch(corpus, indexDir, "batch_seed", idCol, vecCol)
  }

  /** Process-level cache of the frozen quantizer, keyed by (qualified
    * centroids path, its directory mtime). The quantizer is IMMUTABLE
    * once built — [[build]] refuses an existing dir and [[rebuild]]
    * targets a fresh sibling — so the only way the bytes can change is a
    * delete+recreate of the index dir, which changes the directory's
    * modification time, i.e. the cache key (a spec pins the
    * invalidation). Without this, a streaming retrieval or ingest loop
    * pays one parquet-read+collect JOB per micro-batch (probeBatch →
    * probe → readCentroids; foreachBatch ingest → writeBatch →
    * readCentroids) for state that never changes. Bounded: ≤ 64 entries
    * × nCentroids rows. This is metadata reuse within one process, not
    * result caching — every entry is populated by the same run that
    * built the index state it describes. */
  private val centroidCache =
    new java.util.LinkedHashMap[(String, Long), Array[(Long, Array[Double])]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), Array[(Long, Array[Double])]]): Boolean =
        size() > 64
    }

  /** The frozen coarse quantizer — bounded by `nCentroids`, collected
    * once per (path, mtime) per process and shipped in the scoring
    * closures. */
  private def readCentroids(spark: SparkSession, indexDir: String): Array[(Long, Array[Double])] = {
    val (fs, root) = fsOf(spark, s"$indexDir/centroids")
    // one driver-side FS stat (throws if the index was never built)
    val st =
      try fs.getFileStatus(root)
      catch { case _: java.io.FileNotFoundException =>
        throw new IllegalArgumentException(
          s"no centroids at $indexDir — build the index first")
      }
    val key = (root.toString, st.getModificationTime)
    centroidCache.synchronized {
      val hit = centroidCache.get(key)
      if (hit != null) return hit
    }
    val rows = spark.read.parquet(s"$indexDir/centroids")
      .select(col("cid"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, s"no centroids at $indexDir — build the index first")
    centroidCache.synchronized { centroidCache.put(key, rows) }
    rows
  }

  /** Encode one batch of new vectors into the index: assign each to its
    * nearest frozen centroid (argmax cosine, ties → lower cid — the
    * [[Similarity.ivfTopK]] rule, so a probe sees identical cells) and
    * store int8 codes partitioned by cell plus the raw floats for
    * rescoring. A `batchId` makes a foreachBatch retry overwrite its own
    * `batch_<id>` state instead of appending a duplicate copy. */
  def ingest(
      batch: DataFrame,
      indexDir: String,
      batchId: Option[Long],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    // Refuse BOTH corruption directions before any write: a batchId-less
    // append into a batch-layout index (every built index is one) would
    // brick all subsequent reads on the mixed-layout check, and a batch
    // id BELOW an existing one (a reset streaming checkpoint restarting
    // at 0 against old state) would collide with names a compaction
    // sidecar already subsumed — silent data loss, not a retry.
    val (fs, codesRoot) = fsOf(spark, s"$indexDir/codes")
    if (fs.exists(codesRoot)) {
      val entries = fs.listStatus(codesRoot).filter(_.isDirectory).map(_.getPath.getName)
      val anyBatch = entries.filter(_.startsWith("batch_"))
      val batchNums = anyBatch
        .map(_.stripPrefix("batch_").takeWhile(_.isDigit)).filter(_.nonEmpty).map(_.toLong)
      batchId match {
        case None => require(anyBatch.isEmpty,
          s"$indexDir uses the per-batch layout — ingest with a batchId")
        case Some(id) if batchNums.nonEmpty => require(id >= batchNums.max,
          s"batch id $id is below the index's newest batch ${batchNums.max} — " +
            "batch ids must be monotone (a reset checkpoint needs a fresh index dir)")
        case _ => ()
      }
    }
    batchId match {
      case Some(id) => writeBatch(batch, indexDir, s"batch_$id", idCol, vecCol)
      case None     => writeBatch(batch, indexDir, "", idCol, vecCol)
    }
  }

  /** One encode + write pass: `dirName` empty = root append (batchId-less
    * layout), otherwise that batch subdir is STAGED under an invisible
    * tmp name and committed by one atomic rename (retry-safe, and a
    * concurrent reader can never observe a half-written batch dir).
    *
    * The root-append layout is SINGLE-WRITER, NO CONCURRENT READERS: it
    * appends vectors and codes in place (no staging, no atomic commit),
    * so a reader racing a root append can observe codes rows whose
    * vectors are not yet visible — the silently-wrong-neighbors race the
    * batch layout's commit ordering exists to prevent. Any index that
    * serves probes while ingesting MUST use batchIds; root append is for
    * one-shot offline builds only.
    * `vectors` commits BEFORE `codes`: candidates come from codes and
    * rescoring needs vectors, so the commit order gives a concurrent
    * probe the invariant "codes/batch_N visible ⇒ vectors/batch_N
    * visible". (The one remaining race is a REDELIVERY of a failed
    * batch, whose replace deletes the failed attempt's dirs — a probe
    * concurrent with exactly that may fail and should retry; normal
    * ingest never deletes anything a probe can be reading.) */
  private def writeBatch(batch: DataFrame, indexDir: String,
      dirName: String, idCol: String, vecCol: String): Unit = {
    val spark = batch.sparkSession
    val centroids = readCentroids(spark, indexDir)
    val assignUdf = udf { (v: Seq[Float]) => Similarity.nearestCentroid(centroids, v) }
    // one narrow pass: quantize + assign together, no self-join; cast to
    // the fixed index schema so reads with that schema are exact
    val codes = Similarity.quantizeInt8(batch, idCol, vecCol, keepVecAs = Some("__v"))
      .select(col("vec_id").cast("long").as("vec_id"), col("scale"),
        col("qvec"), assignUdf(col("__v")).cast("long").as("cid"))
    def staged(sub: String)(write: String => Unit): Unit =
      if (dirName.isEmpty) write(s"$indexDir/$sub")
      else {
        val (fs, root) = fsOf(spark, s"$indexDir/$sub")
        val tmpName = s"tmp_ingest_$dirName"
        val tmpPath = new org.apache.hadoop.fs.Path(root, tmpName)
        if (fs.exists(tmpPath)) fs.delete(tmpPath, true) // crashed leftover
        write(s"$indexDir/$sub/$tmpName")
        val destPath = new org.apache.hadoop.fs.Path(root, dirName)
        if (fs.exists(destPath)) fs.delete(destPath, true) // redelivery replaces
        if (!fs.rename(tmpPath, destPath))
          throw new IllegalStateException(
            s"ingest commit rename failed: $tmpPath -> $destPath")
      }
    val mode = if (dirName.isEmpty) "append" else "overwrite"
    staged("vectors") { d =>
      batch.select(col(idCol).cast("long").as("vec_id"),
          col(vecCol).cast("array<float>").as("embedding"))
        .write.mode(mode).parquet(d)
    }
    // cluster rows by cell before the partitioned write: each task then
    // writes whole cells (≈1 file per cell) instead of every task
    // opening a file per cell it happens to hold — at corpus scale the
    // difference between O(cells) and O(tasks·cells) files per batch
    staged("codes") { d =>
      codes.repartition(col("cid"))
        .write.mode(mode).partitionBy("cid").parquet(d)
    }
  }

  /** All live `batch_<id>` subdirs of one state subtree. Empty when the
    * index was ingested batchId-less (plain appends at the root). Mixing
    * the two layouts on one index is refused loudly — partition
    * inference cannot see both at once, and silently reading half the
    * codes would be a wrong answer. */
  private def batchDirs(spark: SparkSession, dir: String,
      skip: Set[String]): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    require(fs.exists(root), s"no index state at $dir")
    val entries = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
    val batches = entries.filter(_.startsWith("batch_"))
    // ANY tmp_-prefixed dir is invisible staging (tmp_ingest_* while an
    // ingest is mid-commit, tmp_compact_* while a compaction is) — a
    // concurrent probe treating one as a loose root-append entry would
    // throw the mixed-layout error during every ingest's staging window
    val loose = entries.filterNot(n =>
      n.startsWith("batch_") || n.startsWith("tmp_"))
    require(batches.isEmpty || loose.isEmpty,
      s"$dir mixes per-batch (batch_*) and root-append ingest layouts — " +
        "use a consistent batchId policy per index")
    // a compacted dir's _SUBSUMES sidecar makes the folded originals
    // invisible from the instant its atomic rename lands, even if their
    // deletes never ran (the Dedup.compactIngestState protocol)
    val subsumed = batches.flatMap(n =>
      Dedup.readSubsumes(fs, new org.apache.hadoop.fs.Path(root, n))).toSet
    batches.filterNot(skip).filterNot(subsumed)
      .sorted.map(n => s"$dir/$n").toSeq
  }

  /** Fold the per-batch state subdirs into one compacted batch dir per
    * subtree — the ANN twin of [[Dedup.compactIngestState]], with the
    * same two safety rules: the NEWEST batch (the only one at-least-once
    * redelivery can retry) is never folded, and the staging protocol is
    * safe at every crash point (data + `_SUBSUMES` sidecar under an
    * invisible `tmp_compact_*` name, one atomic rename as the commit,
    * folded dirs deleted after). Codes keep their hive `cid=` layout
    * (clustered one-writer-per-cell), so probe pruning is unchanged;
    * tombstoned ids are PURGED from the folded data — compaction is when
    * logical deletes become physical. Returns the number of dirs folded
    * across both subtrees (0 = nothing to do). */
  def compact(spark: SparkSession, indexDir: String,
      targetPartitions: Int = 8): Int = {
    val tombs = readTombstones(spark, indexDir)
    def one(sub: String, write: (DataFrame, String) => Unit): Int = {
      val dir = s"$indexDir/$sub"
      val (fs, root) = fsOf(spark, dir)
      if (!fs.exists(root)) return 0
      // clean leftovers of earlier crashed runs (compaction staging AND
      // abandoned ingest staging) and finish a committed fold's
      // half-done deletes; folds here are batch_<gen>_c dirs, and only
      // they carry sidecars
      Dedup.sweepFoldLeftovers(fs, root, "tmp_", "batch_")
      val live = batchDirs(spark, dir, Set.empty).map(_.split('/').last)
      def num(n: String): Long = {
        val d = n.stripPrefix("batch_").takeWhile(_.isDigit)
        if (d.nonEmpty) d.toLong else -1L
      }
      val newest = live.sortBy(num).lastOption
      val fold = live.filterNot(newest.contains)
      if (fold.length < 2) return 0
      val gen = fold.map(num).max
      val staging = s"$dir/tmp_compact_$gen"
      val data = (sub match {
        case "codes" => fold
          .map(n => spark.read.schema(codesSchema).option("basePath", s"$dir/$n")
            .parquet(s"$dir/$n")).reduce(_.unionByName(_))
        case _ => spark.read.schema(vectorsSchema)
          .parquet(fold.map(n => s"$dir/$n"): _*)
      }).join(tombs, Seq("vec_id"), "left_anti") // deletes become physical
      write(data, staging)
      Dedup.commitFold(fs, root, s"tmp_compact_$gen", s"batch_${gen}_c", fold)
      fold.length
    }
    one("codes", (df, d) => df.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(d)) +
      one("vectors", (df, d) => df.repartition(targetPartitions)
        .write.mode("overwrite").parquet(d))
  }

  /** Each batch dir is its own hive-partitioned (cid=…) relation — they
    * cannot share one basePath (the batch_<id> level conflicts with
    * partition inference), so they union; Catalyst pushes the probe's
    * cid filter into every union child, keeping pruning intact. `skip`
    * names batch dirs to exclude (a retrying batch's own state). */
  private def readCodes(spark: SparkSession, indexDir: String,
      skip: Set[String] = Set.empty): DataFrame =
    batchDirs(spark, s"$indexDir/codes", skip) match {
      case Seq() if skip.isEmpty =>
        spark.read.schema(codesSchema).parquet(s"$indexDir/codes")
      case Seq() => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], codesSchema)
      case dirs => dirs
        .map(p => spark.read.schema(codesSchema).option("basePath", p).parquet(p))
        .reduce(_.unionByName(_))
    }

  private def readVectors(spark: SparkSession, indexDir: String,
      skip: Set[String] = Set.empty): DataFrame =
    batchDirs(spark, s"$indexDir/vectors", skip) match {
      case Seq() if skip.isEmpty =>
        spark.read.schema(vectorsSchema).parquet(s"$indexDir/vectors")
      case Seq() => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], vectorsSchema)
      case dirs => spark.read.schema(vectorsSchema).parquet(dirs: _*)
    }

  /** Incremental SemDeDup through the persisted index — the embedding
    * twin of [[Dedup.ingestNearDupBatch]]: decide each NEW vector
    * against the already-indexed corpus (and against the batch itself)
    * WITHOUT ever pairing corpus-vs-corpus, then ingest only the
    * survivors. Decision rule, matching [[Similarity.semDedup]] with
    * ids assigned append-only:
    *
    *  - a new vector is dropped iff some CORPUS vector in its assigned
    *    cell is ≥ `threshold` cosine-similar (already-indexed wins), or
    *    a SMALLER-ID same-cell batch vector is (keep-lowest-id within
    *    the batch);
    *  - the corpus side compares against EVERY same-cell corpus member:
    *    when every ingest goes through this operator the corpus holds
    *    only survivors — pairwise-dissimilar vectors, so same-content
    *    piles cannot form and cells stay constant-sized under the
    *    SemDeDup nCentroids ∝ corpus contract; a min-only shortcut
    *    would silently keep duplicates of non-min members of a large
    *    DISTINCT cell. ([[build]] ingests its corpus as-given — run a
    *    raw pile-y corpus through [[Similarity.semDedup]] first to
    *    establish the invariant.) The `hotCellThreshold` star rule
    *    applies only WITHIN the batch, where un-deduplicated piles
    *    genuinely arrive;
    *  - dropped vectors are NOT ingested, so the index stays the
    *    deduplicated corpus and per-batch cost never grows with history.
    *
    * Returns the decision table `(vec_id, cid, kept)`, materialized
    * BEFORE the survivors' state write so the lazily-read index cannot
    * observe the batch's own appends; with a `batchId`, a foreachBatch
    * retry excludes its own failed attempt's state (name skip + id
    * anti-join) and overwrites it. */
  def ingestSemDedupBatch(
      batch: DataFrame,
      indexDir: String,
      threshold: Double = 0.95,
      hotCellThreshold: Int = 4096,
      batchId: Option[Long] = None,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val decisions = semDedupDecisions(batch, indexDir, threshold,
        hotCellThreshold, batchId, idCol, vecCol)
      .localCheckpoint() // materialize before the survivors' state write
    val kept = batch.join(
      decisions.filter(col("kept")).select(col("vec_id").as(idCol)),
      Seq(idCol), "left_semi")
    ingest(kept, indexDir, batchId, idCol, vecCol)
    decisions
  }

  /** The decision PLAN of [[ingestSemDedupBatch]], un-checkpointed —
    * package-visible so the plan-lint spec can assert its join shapes
    * (the public method materializes it before the state write). */
  private[operators] def semDedupDecisions(
      batch: DataFrame,
      indexDir: String,
      threshold: Double,
      hotCellThreshold: Int,
      batchId: Option[Long],
      idCol: String,
      vecCol: String): DataFrame = {
    val spark = batch.sparkSession
    if (batchId.isDefined) requireBatchLayout(spark, s"$indexDir/codes")
    val centroids = readCentroids(spark, indexDir)
    val assignUdf = udf { (v: Seq[Float]) => Similarity.nearestCentroid(centroids, v) }
    // one assignment pass, reused by every consumer below
    val newAssigned = batch
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("cid", assignUdf(col("vec")))
      .localCheckpoint()
    val skip = batchId.map(id => s"batch_$id").toSet
    val newIds = newAssigned.select(col("vec_id"))
    // corpus side: cell membership comes from the CODES (ids + cells,
    // no vectors yet), pruned to the batch's touched cells before any
    // sizing — untouched cells never enter a shuffle
    val corpusCells = readCodes(spark, indexDir, skip)
      .select(col("vec_id").as("corpus_id"), col("cid"))
      .join(newIds.select(col("vec_id").as("corpus_id")), Seq("corpus_id"), "left_anti")
      .join(readTombstones(spark, indexDir).select(col("vec_id").as("corpus_id")),
        Seq("corpus_id"), "left_anti") // deleted corpus never drops new docs
      .join(newAssigned.select("cid").distinct(), Seq("cid"), "left_semi")
    val w = Window.partitionBy(col("cid"))
    // every same-cell corpus member is a candidate: the corpus is
    // deduplicated (survivors only), so its cells cannot be piles and a
    // min-only shortcut would silently keep dups of non-min members
    val corpusCand = corpusCells.select(col("cid"), col("corpus_id"))
    // vectors join back per CANDIDATE, never per cell row
    val corpusVecs = readVectors(spark, indexDir, skip)
      .select(col("vec_id").as("corpus_id"), col("embedding").as("cvec"))
    val corpusDropped = newAssigned.join(corpusCand, Seq("cid"))
      .join(corpusVecs, Seq("corpus_id"))
      .filter(round(Similarity.cosine(col("vec"), col("cvec")), 6) >= threshold)
      .select(col("vec_id"))
    // batch-internal: the semDedup cell rules over the batch alone
    val bSized = newAssigned.select(col("cid"), col("vec_id").as("id"))
      .withColumn("cell_n", count(lit(1)).over(w))
      .withColumn("cell_min", min(col("id")).over(w))
    val bSmall = bSized.filter(col("cell_n") <= hotCellThreshold)
    val bPairs = bSmall.select(col("cid"), col("id").as("id_a"))
      .join(bSmall.select(col("cid"), col("id").as("id_b")), Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .unionByName(bSized
        .filter(col("cell_n") > hotCellThreshold && col("id") =!= col("cell_min"))
        .select(col("cell_min").as("id_a"), col("id").as("id_b")))
    val batchDropped = bPairs
      .join(newAssigned.select(col("vec_id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(newAssigned.select(col("vec_id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .filter(round(Similarity.cosine(col("vec_a"), col("vec_b")), 6) >= threshold)
      .select(col("id_b").as("vec_id"))
    val dropped = corpusDropped.unionByName(batchDropped).distinct()
      .withColumn("is_dropped", lit(true))
    newAssigned.select(col("vec_id"), col("cid"))
      .join(dropped, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cid"),
        not(coalesce(col("is_dropped"), lit(false))).as("kept"))
  }

  private val tombstoneSchema = StructType(Seq(StructField("vec_id", LongType)))

  /** Logical deletes: ids written under `tombstones/` are invisible to
    * [[probe]] and to [[ingestSemDedupBatch]]'s corpus from the moment
    * the write lands — a takedown takes effect without rewriting a
    * single code or vector file. Deletes are idempotent (a duplicate
    * tombstone changes nothing), so retries just append; the read cost
    * is one anti-join against the (deletion-bounded) tombstone set.
    * A deleted id must NOT be re-ingested later — the tombstone
    * suppresses the id for the index's lifetime. Each call appends ONE
    * file (deletes are small); [[compactTombstones]] folds the pile. */
  def delete(ids: DataFrame, indexDir: String, idCol: String = "vec_id"): Unit =
    ids.select(col(idCol).cast("long").as("vec_id")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$indexDir/tombstones")

  /** The live tombstone surface: root-level appended files plus
    * committed `compact_<n>` fold dirs, with files a fold's `_SUBSUMES`
    * sidecar names excluded from the instant the fold's rename lands —
    * so a committed-but-not-yet-deleted fold never double-counts (deletes
    * are idempotent anyway) and a crashed fold's `tmp_compact_*` staging
    * is never read. */
  private def readTombstones(spark: SparkSession, indexDir: String): DataFrame = {
    val (fs, root) = fsOf(spark, s"$indexDir/tombstones")
    if (!fs.exists(root)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tombstoneSchema)
    val entries = fs.listStatus(root)
    val subsumed = entries.iterator
      .filter(e => e.isDirectory && e.getPath.getName.startsWith("compact_"))
      .flatMap(e => Dedup.readSubsumes(fs, e.getPath)).toSet
    val paths = entries.iterator.filter { e =>
      val n = e.getPath.getName
      if (e.isDirectory) n.startsWith("compact_") && !subsumed(n)
      else !n.startsWith("_") && !n.startsWith(".") && !subsumed(n)
    }.map(_.getPath.toString).toSeq
    if (paths.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tombstoneSchema)
    else spark.read.schema(tombstoneSchema).parquet(paths: _*)
  }

  /** Fold the appended tombstone files into ONE deduplicated parquet —
    * [[delete]] appends a file per call and every probe/ingest anti-joins
    * the union of all of them, so an index taking routine takedowns grows
    * an unbounded small-file pile whose LISTING (not its row count)
    * becomes the per-probe cost. The suppression contract is lifetime, so
    * the fold only ever merges, never drops, under the staged-rename +
    * `_SUBSUMES` protocol: data + sidecar under invisible
    * `tmp_compact_<n>`, one atomic rename as the commit, folded files
    * deleted after (a rerun finishes a half-done delete; a crash before
    * the rename leaves only invisible staging). A [[delete]] landing
    * concurrently is safe — its new file is not in the fold's listing and
    * no sidecar names it — but folds must not race probes' parquet scans
    * (same maintenance-window rule as [[compact]]). Returns the number of
    * entries folded (0 = nothing to do). */
  def compactTombstones(spark: SparkSession, indexDir: String): Int = {
    val dir = s"$indexDir/tombstones"
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return 0
    def path(n: String) = new org.apache.hadoop.fs.Path(root, n)
    // crashed staging is garbage by construction; a committed fold's
    // half-done deletes finish here
    Dedup.sweepFoldLeftovers(fs, root, "tmp_compact_", "compact_")
    val live = fs.listStatus(root).filter { e =>
      val n = e.getPath.getName
      if (e.isDirectory) n.startsWith("compact_")
      else !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath.getName).sorted.toSeq
    if (live.length < 2) return 0
    val gen = live.filter(_.startsWith("compact_"))
      .map(_.stripPrefix("compact_").takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toLong).foldLeft(0L)(math.max) + 1
    spark.read.schema(tombstoneSchema).parquet(live.map(n => s"$dir/$n"): _*)
      .distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/tmp_compact_$gen")
    Dedup.commitFold(fs, root, s"tmp_compact_$gen", s"compact_$gen", live)
    live.length
  }

  private def requireBatchLayout(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    if (fs.exists(root)) {
      val loose = fs.listStatus(root)
        .exists(e => e.isDirectory && !e.getPath.getName.startsWith("batch_") &&
          !e.getPath.getName.startsWith("tmp_")) // in-flight/crashed staging is not state
      require(!loose,
        s"$dir uses the root-append layout — batchId-based ingest requires " +
          "per-batch state (build/ingest with a batchId from the start)")
    }
  }

  /** Top-k neighbors for each query through the persisted index, without
    * touching the float corpus until the rescore: each query probes its
    * `nProbes` nearest cells, the int8 codes of ONLY those cells are
    * scanned for approximate-cosine candidates (`k·rescoreFactor` per
    * query, ranked on `round(asim, 9)` ties → lower id — the
    * [[Similarity.int8TopK]] rule), and only candidates join back to the
    * raw store for exact cosine. Deterministic given the persisted
    * centroids, so batch composition is invisible: N ingests and a
    * one-shot build of the same corpus probe identically. */
  def probe(
      queries: DataFrame,
      indexDir: String,
      k: Int,
      nProbes: Int = 4,
      rescoreFactor: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxQueries: Int = 10000): DataFrame = {
    val spark = queries.sparkSession
    val centroids = readCentroids(spark, indexDir)
    // ONE bounded collect replaces three driver-side jobs (the size-guard
    // count, the probe-assignment localCheckpoint and the probed-cell
    // distinct+collect): the query side is broadcast by contract, so it
    // already crosses the driver — pull it once, assign probe cells
    // driver-side with the identical (-sim, cid) rule, and ship both the
    // probe rows and the rescore side as broadcast local relations. Same
    // math, same bound (maxQueries), 3 fewer scheduler round-trips per
    // probe — the cost that dominates a per-micro-batch retrieval loop.
    val qPlan = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val qRows = qPlan.limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"AnnIndex.probe: the query side is broadcast/collected by contract and must " +
        s"hold at most $maxQueries rows (raise maxQueries explicitly if the memory " +
        "budget allows). For an all-pairs self-ANN shape use lshTopK or " +
        "cosineNearDupPairs instead.")
    def probeCells(v: Seq[Float]): Seq[Long] =
      centroids.map { case (cid, c) => (Similarity.cosTo(c, v), cid) }
        .sortBy { case (s, cid) => (-s, cid) }
        .take(nProbes).map(_._2).toSeq
    val qpRows: Seq[org.apache.spark.sql.Row] = qRows.toSeq.flatMap { r =>
      probeCells(r.getSeq[Float](1))
        .map(cid => org.apache.spark.sql.Row(r.get(0), r.get(1), cid))
    }
    val qpSchema = qPlan.schema.add("cid", LongType, nullable = false)
    val qp = spark.createDataFrame(
      java.util.Arrays.asList(qpRows: _*), qpSchema)
    val q = spark.createDataFrame(
      java.util.Arrays.asList(qRows.toSeq: _*), qPlan.schema)
    val probes = broadcast(qp)
    val probedCells = qpRows.map(_.getLong(2)).distinct // bounded by nCentroids
    val deq = readCodes(spark, indexDir)
      // cid is a PARTITION filter: unprobed cells never leave the scan
      .filter(col("cid").isin(probedCells: _*))
      // tombstoned (logically deleted) vectors never become candidates
      .join(readTombstones(spark, indexDir), Seq("vec_id"), "left_anti")
      .select(col("vec_id").as("neighbor_id"), col("cid"),
        transform(col("qvec"), x => x.cast("double") * col("scale")).as("vec_deq"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id"))
    val cand = deq.join(probes, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("asim",
        round(Similarity.cosineGuarded(col("query_vec"), col("vec_deq")), 9))
      .withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= k * rescoreFactor)
      .select(col("query_id"), col("neighbor_id"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .join(readVectors(spark, indexDir)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("vec")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", Similarity.cosine(col("query_vec"), col("vec")))
      .withColumn("rk", row_number().over(we))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("neighbor_id"), round(col("sim"), 6).as("sim"))
  }

  /** `foreachBatch` hook for CONTINUOUS retrieval: probe one micro-batch
    * of queries against the persisted index and write its results under
    * `outDir/batch_<id>` via OVERWRITE, so an at-least-once redelivery
    * of the batch replaces its own previous attempt instead of
    * duplicating result rows — the same retry-overwrite discipline as
    * the ingest loops. Results are plain data (not index state), so
    * batch dirs here are independent: readers union `batch_*` and no
    * newest-batch protection or compaction sidecar applies.
    *
    * Probing is read-only on the index, so probe and ingest streams can
    * run concurrently: ingest stages each batch dir under a tmp name and
    * commits by atomic rename, vectors before codes, so a probe that
    * sees codes/batch_N always finds vectors/batch_N. The one excluded
    * window is the REDELIVERY of a failed ingest batch (its replace
    * deletes the failed attempt's dirs) — a probe concurrent with
    * exactly that may fail and should rely on its own stream retry. */
  def probeBatch(
      queries: DataFrame,
      indexDir: String,
      outDir: String,
      batchId: Long,
      k: Int,
      nProbes: Int = 4,
      rescoreFactor: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxQueries: Int = 10000,
      ingestTsMs: Option[Long] = None): Unit = {
    // the optional ingestion stamp is a CALLER-supplied wall clock
    // (`Some(System.currentTimeMillis())` in a real stream), constant for
    // the batch and never computed in-plan — the operator itself stays
    // deterministic (replayable, spec-checkable) and age-based retention
    // ([[compactProbeResultsByAge]]) gets the column it folds on. A
    // redelivery re-stamps its batch — the overwrite replaces the old
    // rows, so the batch keeps ONE consistent stamp either way.
    val res = probe(queries, indexDir, k, nProbes, rescoreFactor,
      idCol, vecCol, maxQueries)
    ingestTsMs.fold(res)(ts => res.withColumn("ingest_ts", lit(ts)))
      .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
  }

  /** `ingest_ts` (epoch millis, stamped DRIVER-side at write when the
    * caller opts in) is nullable: batches written without stamping read
    * as null under this schema, and null never age-expires. */
  private val probeResultSchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("rk", LongType),
    StructField("neighbor_id", LongType),
    StructField("sim", DoubleType),
    StructField("ingest_ts", LongType)))

  /** Everything [[probeBatch]] has answered under `outDir`: the live
    * `batch_<id>` result dirs plus committed `compact_<n>` folds, with
    * dirs a fold's `_SUBSUMES` sidecar names excluded (so a
    * committed-but-not-yet-deleted fold never yields duplicate rows). */
  def readProbeResults(spark: SparkSession, outDir: String): DataFrame = {
    val (fs, root) = fsOf(spark, outDir)
    if (!fs.exists(root)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], probeResultSchema)
    val entries = fs.listStatus(root).filter(_.isDirectory)
    val subsumed = entries.iterator
      .filter(_.getPath.getName.startsWith("compact_"))
      .flatMap(e => Dedup.readSubsumes(fs, e.getPath)).toSet
    val dirs = entries.iterator.map(_.getPath.getName)
      .filter(n => (n.startsWith("batch_") || n.startsWith("compact_")) && !subsumed(n))
      .map(n => s"$outDir/$n").toSeq
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], probeResultSchema)
    else spark.read.schema(probeResultSchema).parquet(dirs: _*)
  }

  /** Retention for the [[probeBatch]] result side: without it a
    * continuous retrieval stream strands one `batch_<id>` dir per
    * micro-batch forever — the same small-files growth the index state
    * dirs had before [[compact]], just on results. Batches with
    * `id <= horizonBatchId` are folded into one `compact_<n>` dir
    * (`retain = true`, reader union unchanged) or DROPPED outright
    * (`retain = false`, a TTL horizon: results expire — including prior
    * FOLDS once the `_UPTO` coverage sidecar they were committed with
    * falls at or below the horizon, so switching from a retention policy
    * to a TTL one still expires everything). The numerically
    * newest batch is never touched regardless of the horizon — it is the
    * only one an at-least-once redelivery can retry, and its
    * retry-overwrite contract needs the dir intact. Fold staging follows
    * the `_SUBSUMES` protocol ([[compactTombstones]]), so every crash
    * point leaves the reader surface consistent. Returns the number of
    * batch dirs folded or dropped. */
  def compactProbeResults(spark: SparkSession, outDir: String,
      horizonBatchId: Long, retain: Boolean = true,
      targetPartitions: Int = 1): Int = {
    val (fs, root) = fsOf(spark, outDir)
    if (!fs.exists(root)) return 0
    Dedup.sweepFoldLeftovers(fs, root, "tmp_compact_", "compact_")
    val names = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq
    val numbered = names.flatMap(n => probeBatchNum(n).map(_ -> n)).sortBy(_._1)
    val newest = numbered.lastOption.map(_._2)
    val horizon = numbered
      .filter { case (id, n) => id <= horizonBatchId && !newest.contains(n) }
      .map(_._2)
    if (!retain) {
      // TTL drop: expired results are simply gone — including prior
      // FOLDS whose entire `_UPTO` coverage is past the horizon
      val expiredFolds = names.filter(_.startsWith("compact_"))
        .filter(n => probeUptoOf(fs, root, n) <= horizonBatchId)
      return ttlDropProbeDirs(fs, root, outDir, horizon ++ expiredFolds)
    }
    if (horizon.isEmpty) return 0
    // prior folds merge in, so repeated retention passes keep exactly
    // one compact dir, not a chain
    val priorFolds = names.filter(_.startsWith("compact_")).sorted
    val upto = (horizon.flatMap(probeBatchNum) ++
      priorFolds.map(probeUptoOf(fs, root, _)).filter(_ != Long.MaxValue)).max
    foldProbeDirs(spark, outDir, fs, root, horizon ++ priorFolds, priorFolds,
      upto, targetPartitions)
    horizon.length
  }

  /** Wall-clock retention for [[probeBatch]] results: a batch-id horizon
    * ([[compactProbeResults]]) is the right policy for harness/replay
    * pipelines, but a production stream wants "drop results older than
    * N days" — which needs the `ingest_ts` stamp [[probeBatch]] writes
    * when the caller passes `ingestTsMs`. A dir is expired when EVERY
    * row is stamped and its newest stamp is strictly below
    * `cutoffTsMs` (the caller computes the cutoff — now minus the
    * retention window; the operator itself never reads a clock). An
    * unstamped or partially-stamped dir never age-expires — age policy
    * over unstamped data would otherwise silently drop results of
    * unknown age — and the numerically newest batch keeps its
    * redelivery protection regardless. `retain = true` folds the
    * expired dirs (reader surface unchanged) under the same
    * `_SUBSUMES`/`_UPTO` staging as the id-horizon pass; `retain =
    * false` drops them. Returns dirs folded or dropped. */
  def compactProbeResultsByAge(spark: SparkSession, outDir: String,
      cutoffTsMs: Long, retain: Boolean = false,
      targetPartitions: Int = 1): Int = {
    val (fs, root) = fsOf(spark, outDir)
    if (!fs.exists(root)) return 0
    Dedup.sweepFoldLeftovers(fs, root, "tmp_compact_", "compact_")
    val names = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq
    val numbered = names.flatMap(n => probeBatchNum(n).map(_ -> n)).sortBy(_._1)
    val newest = numbered.lastOption.map(_._2)
    // folds hold result rows like any batch, so age applies to them too
    // (their rows carry the stamps they were folded with); in retain
    // mode they merge into the new fold instead
    val candidates = numbered.map(_._2).filterNot(newest.contains) ++
      names.filter(_.startsWith("compact_")).sorted
    if (candidates.isEmpty) return 0
    // ONE scan over the candidate dirs decides expiry: per-dir newest
    // stamp and unstamped-row count (input_file_name → dir name, no
    // per-dir driver jobs)
    val dirCol = regexp_extract(input_file_name(),
      "/((?:batch|compact)_[0-9]+[^/]*)/[^/]*$", 1)
    val stats = spark.read.schema(probeResultSchema)
      .parquet(candidates.map(n => s"$outDir/$n"): _*)
      .groupBy(dirCol.as("__dir"))
      .agg(max(col("ingest_ts")).as("__max_ts"),
        sum(when(col("ingest_ts").isNull, 1L).otherwise(0L)).as("__n_null"))
      .collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2)))).toMap
    // attribution cross-check: a stats key that is not a known candidate
    // means input_file_name did not round-trip the dir name (URI-encoding
    // quirks on object stores, a future nested layout) — the rows it
    // carries belong to SOME candidate that now looks emptier than it is,
    // so every expiry decision is suspect; refuse loudly rather than
    // TTL-drop live results
    val unattributed = stats.keySet -- candidates.toSet
    require(unattributed.isEmpty,
      s"compactProbeResultsByAge: $outDir rows attributed to unknown " +
        s"dirs (${unattributed.toSeq.sorted.mkString(", ")}) — the dir " +
        "attribution regex does not match this layout; not expiring " +
        "anything")
    val expired = candidates.filter { n =>
      stats.get(n) match {
        case None =>
          // absent from the scan = no row attributed to the dir. Confirm
          // genuinely-empty (an empty micro-batch writes _SUCCESS only)
          // with a direct per-dir probe before expiring — an age policy
          // must never drop rows of unknown age, and suspected-empty
          // dirs are rare enough that a per-dir check is bounded
          spark.read.schema(probeResultSchema).parquet(s"$outDir/$n").isEmpty
        case Some((Some(maxTs), 0L)) => maxTs < cutoffTsMs
        case _ => false // any unstamped row: age unknown, never expire
      }
    }
    if (expired.isEmpty) return 0
    if (!retain) return ttlDropProbeDirs(fs, root, outDir, expired)
    val priorFolds = names.filter(_.startsWith("compact_")).sorted
    val fold = (expired ++ priorFolds).distinct
    val upto = (fold.flatMap(probeBatchNum) ++
      priorFolds.map(probeUptoOf(fs, root, _)).filter(_ != Long.MaxValue))
      .foldLeft(-1L)(math.max)
    foldProbeDirs(spark, outDir, fs, root, fold, priorFolds,
      upto, targetPartitions)
    expired.length
  }

  private def probeBatchNum(n: String): Option[Long] = {
    val d = n.stripPrefix("batch_").takeWhile(_.isDigit)
    if (n.startsWith("batch_") && d.nonEmpty) Some(d.toLong) else None
  }

  /** A fold's `_UPTO` sidecar records the max batch id it covers —
    * without it a TTL pass could never expire results that a retention
    * pass folded earlier (the fold dir's own name carries no coverage);
    * a fold missing the sidecar reads as MaxValue = never TTL-dropped. */
  private def probeUptoOf(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, n: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root, s"$n/_UPTO")
    if (!fs.exists(p)) Long.MaxValue
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Drops go rename-THEN-delete: a bare recursive delete can crash
    * after removing a fold's `_UPTO` but before its part files, leaving
    * a half-dir that reads as live results AND (sidecar gone) as
    * MaxValue coverage no later TTL pass would ever expire. The atomic
    * rename to an invisible `tmp_compact_` name is the commit point; a
    * crash mid-delete leaves only invisible garbage the next pass's
    * sweep reclaims. */
  private def ttlDropProbeDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, outDir: String,
      names: Seq[String]): Int = {
    names.foreach { n =>
      val tmp = s"tmp_compact_drop_$n"
      if (!fs.rename(new org.apache.hadoop.fs.Path(root, n),
          new org.apache.hadoop.fs.Path(root, tmp)))
        throw new IllegalStateException(
          s"TTL drop rename failed: $outDir/$n -> $tmp")
      fs.delete(new org.apache.hadoop.fs.Path(root, tmp), true)
    }
    names.length
  }

  private def foldProbeDirs(spark: SparkSession, outDir: String,
      fs: org.apache.hadoop.fs.FileSystem, root: org.apache.hadoop.fs.Path,
      fold: Seq[String], priorFolds: Seq[String], upto: Long,
      targetPartitions: Int): Unit = {
    val gen = priorFolds.map(_.stripPrefix("compact_").takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toLong).foldLeft(0L)(math.max) + 1
    spark.read.schema(probeResultSchema).parquet(fold.map(n => s"$outDir/$n"): _*)
      .repartition(targetPartitions)
      .write.mode("overwrite").parquet(s"$outDir/tmp_compact_$gen")
    Dedup.commitFold(fs, root, s"tmp_compact_$gen", s"compact_$gen", fold,
      extraSidecars = Seq("_UPTO" -> s"$upto\n"))
  }

  /** Per-cell occupancy of the LIVE index (tombstones excluded) — the
    * [[rebuild]]-decision signal. [[build]] freezes the quantizer, so
    * cells only ever grow; once max/mean live-cell size runs far past
    * corpus/nCentroids, every probe's candidate scan and
    * [[ingestSemDedupBatch]]'s same-cell compare pay that factor and a
    * rebuild at a larger nCentroids is due. Reads only the codes
    * relation (ids + cells, partition-pruned columns — never the float
    * vectors), one map-side-combined aggregation. */
  def cellStats(spark: SparkSession, indexDir: String): DataFrame =
    readCodes(spark, indexDir)
      .join(readTombstones(spark, indexDir), Seq("vec_id"), "left_anti")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_live"),
        min(col("vec_id")).as("min_id"),
        max(col("vec_id")).as("max_id"))

  /** One-row maintenance summary joining the data-side signal
    * ([[cellStats]]: live count, used cells, occupancy skew) with the
    * LAYOUT pressure (state dirs per subtree, tombstone entries) that
    * decides when [[compact]] / [[compactTombstones]] are due.
    * Construction-time work is the centroid load and driver-side dir
    * listings (bounded by the very small-files problem they watch for);
    * everything data-sized — the codes scan, the tombstone scan and its
    * distinct count — is ONE lazy plan that runs when the frame does. */
  def indexStats(spark: SparkSession, indexDir: String): DataFrame = {
    val nCentroids = readCentroids(spark, indexDir).length
    def stateDirs(sub: String): Int = {
      val (fs, root) = fsOf(spark, s"$indexDir/$sub")
      if (!fs.exists(root)) 0
      else {
        val batches = batchDirs(spark, s"$indexDir/$sub", Set.empty).length
        if (batches > 0) batches
        else 1 // root-append layout: one flat relation
      }
    }
    def tombstoneEntries: Int = {
      val (fs, root) = fsOf(spark, s"$indexDir/tombstones")
      if (!fs.exists(root)) 0
      else fs.listStatus(root).count { e =>
        val n = e.getPath.getName
        if (e.isDirectory) n.startsWith("compact_")
        else !n.startsWith("_") && !n.startsWith(".")
      }
    }
    val tombIds = readTombstones(spark, indexDir)
      .agg(count_distinct(col("vec_id")).as("n_tombstone_ids"))
    cellStats(spark, indexDir)
      .agg(
        coalesce(sum(col("n_live")), lit(0L)).as("n_live"),
        count(lit(1)).as("n_cells_used"),
        coalesce(max(col("n_live")), lit(0L)).as("max_cell"))
      .withColumn("n_cells_total", lit(nCentroids))
      .withColumn("mean_cell",
        round(col("n_live") / greatest(col("n_cells_used"), lit(1L)), 2))
      .crossJoin(broadcast(tombIds)) // 1 row x 1 row — stays in the plan
      .withColumn("n_code_dirs", lit(stateDirs("codes")))
      .withColumn("n_vector_dirs", lit(stateDirs("vectors")))
      .withColumn("n_tombstone_entries", lit(tombstoneEntries))
  }

  /** Migrate the index to a NEW coarse quantizer — the lifecycle step the
    * frozen-at-build centroids ([[build]]) eventually demand: SemDeDup's
    * own contract is nCentroids ∝ corpus, so a corpus that grows far past
    * its build leaves every cell proportionally fat and probe candidate
    * scans plus [[ingestSemDedupBatch]]'s same-cell compare degrade
    * linearly. `rebuild` retrains from the PERSISTED state (tombstoned
    * ids physically excluded) into a fresh `newDir` — the old index stays
    * fully readable until the caller cuts probes over, because rebuild
    * only ever reads it. The tombstone set is carried over (deduplicated,
    * one file): suppression is a lifetime contract and must survive the
    * migration, or a later re-ingest of a taken-down id would resurface
    * it. `trainIters = 0` keeps the replay rule (centroids = first
    * `nCentroids` surviving ids), making the rebuilt index
    * oracle-checkable end to end. */
  /** Atomic index cutover — the step after [[rebuild]] that was
    * previously caller-coordinated: a `_current/` pointer log inside
    * `rootDir` names which child index dir is authoritative, so a crash
    * between rebuild completion and re-pointing can no longer leave two
    * valid index dirs with no marker. The commit protocol is
    * append-only-highest-wins (the Structured Streaming metadata-log
    * shape), NOT delete-then-rename: each promote stages
    * `tmp_v_<n>_<nonce>` and atomically renames it to `_current/v_<n>`
    * — the commit name is fresh, so there is no window with no pointer
    * at all. The nonce makes each attempt's STAGING name unique too:
    * without it, two same-version promotes share one staging path and
    * the sweep below could delete A's in-flight staging, B could
    * restage the same name, and A's rename would then commit B's
    * pointer CONTENT under A's successful return — the race would
    * invert which index the "winner" promoted. With unique stagings, a
    * racer whose staging was swept or whose version was taken just
    * fails its own rename loudly. [[resolveCurrent]] reads the
    * highest-version file; a crash leaves either the old set (old index
    * wins) or the new file complete (new wins) — every point in time
    * resolves to exactly one readable index. Older pointer files are
    * pruned after the commit; a crash mid-prune is harmless (highest
    * still wins).
    *
    * `indexDirName` is a child dir of `rootDir` (relative, so moving the
    * root wholesale keeps the pointer valid) and must already hold a
    * built index — promoting a half-built dir is refused. Returns the
    * committed version. */
  def promote(spark: SparkSession, rootDir: String,
      indexDirName: String): Long = {
    require(indexDirName.nonEmpty && !indexDirName.contains("/") &&
      !indexDirName.startsWith("_") && !indexDirName.startsWith("tmp_"),
      s"promote: indexDirName must be a plain child dir name, got '$indexDirName'")
    val (fs, root) = fsOf(spark, rootDir)
    require(fs.exists(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, indexDirName), "centroids")),
      s"promote: $rootDir/$indexDirName does not hold a built index " +
        "(no centroids) — build/rebuild it first")
    val curDir = new org.apache.hadoop.fs.Path(root, "_current")
    fs.mkdirs(curDir)
    // crashed stagings are invisible garbage; reclaim them here
    fs.listStatus(curDir).map(_.getPath)
      .filter(_.getName.startsWith("tmp_"))
      .foreach(fs.delete(_, false))
    val versions = currentVersions(fs, curDir)
    val next = versions.map(_._1).foldLeft(0L)(math.max) + 1
    val tmp = new org.apache.hadoop.fs.Path(curDir,
      s"tmp_v_${next}_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(s"$indexDirName\n".getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(curDir, s"v_$next")))
      throw new IllegalStateException(
        s"promote commit rename failed (concurrent promote?): $rootDir v_$next")
    // prune older pointers AFTER the commit — tiny files, and highest
    // wins regardless of how far a crashed prune got
    versions.foreach { case (_, p) => fs.delete(p, false) }
    next
  }

  /** The authoritative index dir under `rootDir` as committed by the
    * latest [[promote]] — the full path, ready for [[probe]] /
    * [[ingest]]. Probe loops that must see cutover-atomically resolve
    * once per micro-batch: every row of a batch then probes the same
    * index, old or new, never a mix.
    *
    * The read races a concurrent promote's post-commit PRUNE: the file
    * picked as newest from the listing can be deleted before the open
    * (a prune only ever removes files that are no longer the highest,
    * so the miss proves a NEWER version exists). The standard
    * metadata-log reader shape closes it: re-list and retry on a
    * missing file, bounded so a genuinely broken layout still fails
    * loudly instead of spinning. */
  def resolveCurrent(spark: SparkSession, rootDir: String): String = {
    val (fs, root) = fsOf(spark, rootDir)
    val curDir = new org.apache.hadoop.fs.Path(root, "_current")
    require(fs.exists(curDir),
      s"no _current pointer under $rootDir — promote an index dir first")
    var attempt = 0
    while (true) {
      val versions = currentVersions(fs, curDir)
      require(versions.nonEmpty,
        s"no committed _current version under $rootDir — promote an index dir first")
      val (_, newest) = versions.maxBy(_._1)
      try {
        val in = fs.open(newest)
        val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        return s"$rootDir/$name"
      } catch {
        case _: java.io.FileNotFoundException if attempt < 5 => attempt += 1
      }
    }
    throw new IllegalStateException(s"unreachable: $rootDir") // while(true) above
  }

  private def currentVersions(fs: org.apache.hadoop.fs.FileSystem,
      curDir: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    fs.listStatus(curDir).map(_.getPath).toSeq
      .filter(p => p.getName.startsWith("v_"))
      .flatMap { p =>
        val d = p.getName.stripPrefix("v_")
        if (d.nonEmpty && d.forall(_.isDigit)) Some(d.toLong -> p) else None
      }

  /** Thresholds that decide when index maintenance is due. Every knob
    * watches a cost that grows without its op: state dirs per subtree
    * (listing + union-plan width per probe → [[compact]]), tombstone
    * surface entries (listing per read → [[compactTombstones]]),
    * probe-result batch dirs (listing per [[readProbeResults]] →
    * [[compactProbeResults]]), and mean live vectors per cell against
    * the frozen quantizer's capacity (candidate-scan factor per probe →
    * [[rebuild]] due). `maxMeanCell` compares `n_live / n_cells_total`
    * — occupancy against CAPACITY, the SemDeDup nCentroids ∝ corpus
    * contract — so a corpus that grew k× past its build reads as k× the
    * build-time mean. */
  final case class MaintenancePolicy(
      maxStateDirs: Int = 8,
      maxTombstoneEntries: Int = 8,
      maxMeanCell: Double = 4096.0,
      probeMaxBatchDirs: Int = 16,
      probeKeepBatches: Int = 4)

  /** What [[maintain]] did and what it recommends: counts from the ops
    * it ran (0 = that op was not due) plus the rebuild flag — rebuild
    * itself is never auto-run (it needs a fresh dir, a retrain budget
    * and a [[promote]] cutover decision; `maintain` is a routine
    * background pass, and those are not routine). */
  final case class MaintenanceReport(
      foldedStateDirs: Int,
      foldedTombstoneEntries: Int,
      foldedProbeBatches: Int,
      rebuildDue: Boolean,
      nLive: Long,
      meanCell: Double)

  /** The consumer of [[cellStats]]/[[indexStats]]: one routine pass that
    * runs exactly the compactions the thresholds say are due and flags
    * rebuild-due, so an operator can schedule `maintain` on a timer
    * instead of hand-reading stats. Runs the stats plan ONCE (one
    * collect of the 1-row summary), then:
    *
    *  - `n_code_dirs` or `n_vector_dirs` over `maxStateDirs` →
    *    [[compact]] (both subtrees — one fold pass);
    *  - `n_tombstone_entries` over `maxTombstoneEntries` →
    *    [[compactTombstones]];
    *  - with `probeOutDir`: live `batch_<id>` result dirs over
    *    `probeMaxBatchDirs` → [[compactProbeResults]] retention fold up
    *    to (newest id − `probeKeepBatches`), keeping the redelivery
    *    window intact (age policies stay explicit:
    *    [[compactProbeResultsByAge]] needs a caller-supplied clock);
    *  - `n_live / n_cells_total` over `maxMeanCell` → `rebuildDue=true`.
    *
    * A below-threshold index is untouched — every op here is a no-op
    * exactly when its signal is; the pass must be safe to over-schedule. */
  def maintain(spark: SparkSession, indexDir: String,
      policy: MaintenancePolicy = MaintenancePolicy(),
      probeOutDir: Option[String] = None): MaintenanceReport = {
    val row = indexStats(spark, indexDir).collect().head
    val nLive = row.getAs[Long]("n_live")
    val nCellsTotal = row.getAs[Int]("n_cells_total")
    val meanCell = if (nCellsTotal == 0) 0.0 else nLive.toDouble / nCellsTotal
    val stateDirsDue = row.getAs[Int]("n_code_dirs") > policy.maxStateDirs ||
      row.getAs[Int]("n_vector_dirs") > policy.maxStateDirs
    val tombsDue = row.getAs[Int]("n_tombstone_entries") > policy.maxTombstoneEntries
    val folded = if (stateDirsDue) compact(spark, indexDir) else 0
    val foldedTombs = if (tombsDue) compactTombstones(spark, indexDir) else 0
    val foldedProbe = probeOutDir.fold(0) { out =>
      val (fs, root) = fsOf(spark, out)
      if (!fs.exists(root)) 0
      else {
        val ids = fs.listStatus(root).filter(_.isDirectory)
          .map(_.getPath.getName).flatMap(probeBatchNum).sorted
        if (ids.length <= policy.probeMaxBatchDirs) 0
        else compactProbeResults(spark, out,
          horizonBatchId = ids.max - policy.probeKeepBatches)
      }
    }
    MaintenanceReport(folded, foldedTombs, foldedProbe,
      rebuildDue = meanCell > policy.maxMeanCell, nLive = nLive,
      meanCell = meanCell)
  }

  def rebuild(
      spark: SparkSession,
      indexDir: String,
      newDir: String,
      nCentroids: Int,
      trainIters: Int = 0,
      trainRows: Int = 4096): Unit = {
    val (fs, newRoot) = fsOf(spark, newDir)
    require(!fs.exists(new org.apache.hadoop.fs.Path(newRoot, "centroids")),
      s"rebuild target $newDir already holds an index — pick a fresh dir")
    // tombstones FIRST: an index becomes probe-able once build() commits
    // its centroids, so writing them after would leave a crash window in
    // which newDir looks complete but has forgotten every takedown — a
    // later re-ingest of a taken-down id would resurface it, and the
    // centroids guard above blocks the retry that would have fixed it.
    // Tombstones over a not-yet-built index are inert.
    val (oldFs, oldTombs) = fsOf(spark, s"$indexDir/tombstones")
    if (oldFs.exists(oldTombs))
      readTombstones(spark, indexDir).distinct().coalesce(1)
        .write.mode("overwrite").parquet(s"$newDir/tombstones")
    val corpus = readVectors(spark, indexDir)
      .join(readTombstones(spark, indexDir), Seq("vec_id"), "left_anti")
    build(corpus, newDir, nCentroids, trainIters, "vec_id", "embedding", trainRows)
  }
}
