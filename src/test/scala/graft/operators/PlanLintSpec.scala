package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression net for the batch analytics queries.
  *
  * The scale story of every query lives in its plan — which filters reach
  * the parquet scan, which joins are broadcast BY HINT (vs by AQE's
  * small-SF accident), where the semi/anti shapes land. These properties
  * are what survive a 100× scale-up; this spec pins them so a refactor
  * that silently turns a pushed filter into a post-scan filter, or
  * force-broadcasts an SF-scaling table, fails the build.
  *
  * The session disables AQE and auto-broadcast so the planned string
  * shows only deliberate choices: any BroadcastExchange present comes
  * from an explicit `broadcast()` hint in the query.
  */
class PlanLintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-lint-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String =
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => df.queryExecution.explainString(m)
    }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  // Queries whose gate functions are pure plan builders (no feed
  // materialization, no persist/count at build time).
  private val lintable = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q10_returned_custs", "q13_order_dist", "q14_promo_share",
    "q15_top_supplier", "q17_small_qty", "q18_large_orders",
    "q19_disjunctive_rev", "q21_sole_supplier", "q22_global_balance",
    "q9_nation_profit", "q_rollup_revenue",
    "q_top_brands", "q_order_priority", "q_customers_no_orders",
    "q_running_supplier", "q_events_daily", "events_funnel",
    "q_interval_signup", "q_overlap_orders", "q2_min_cost_supp", "q11_important_parts",
    "q12_priority_lines", "q16_supplier_diversity", "q20_excess_shippers")

  private def q(name: String): DataFrame =
    Analytics.queries(name)(spark, sfDir)

  test("no cartesian product in any lintable analytics plan (funnel's 1-row cross joins excepted)") {
    for (name <- lintable if name != "events_funnel") {
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product:\n$p")
    }
  }

  test("q6: all three predicates reach the lineitem scan; only 3 columns read") {
    val f = formatted(q("q6_forecast_revenue"))
    assert(f.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(f.contains("LessThan(l_shipdate"), "shipdate upper bound not pushed")
    assert(f.contains("GreaterThanOrEqual(l_discount"), "discount band not pushed")
    assert(f.contains("LessThan(l_quantity"), "quantity cap not pushed")
    val read = f.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .forall(read.contains), s"scan must read exactly the needed columns: $read")
    assert(!read.contains("l_orderkey") && !read.contains("l_partkey"),
      s"scan reads columns the query never uses: $read")
  }

  test("forced broadcasts are exactly the constant dims (auto-broadcast disabled)") {
    // (query, expected BroadcastExchange count from explicit hints)
    val expected = Seq(
      "q3_top_orders"      -> 0, // customer+orders scale with SF: never hinted
      "q_top_brands"       -> 0, // part scales with SF
      "q13_order_dist"     -> 0,
      "q5_nation_revenue"  -> 1, // 25-row nation
      "q_rollup_revenue"   -> 1, // 25-row nation
      "q10_returned_custs" -> 1, // 25-row nation
      "q7_nation_volume"   -> 2, // nation aliased twice
      "q17_small_qty"      -> 2, // one brand's partkeys (SF-stable), hinted in both subtree reuses
      "q9_nation_profit"   -> 1, // 25-row nation; part/supplier/orders left to AQE
      "q22_global_balance" -> 1, // the 1-row global average (scalar subquery)
      "q15_top_supplier"   -> 1) // 1-row global max
    for ((name, n) <- expected) {
      val c = countOf(plan(q(name)), "BroadcastExchange")
      assert(c == n, s"$name: expected $n hinted broadcasts, plan has $c")
    }
    // q8: region-filtered nation semi-join + supplier-nation dim (the
    // inner region⋈nation build may itself plan 1-2 exchanges)
    val c8 = countOf(plan(q("q8_market_share")), "BroadcastExchange")
    assert(c8 >= 2 && c8 <= 3, s"q8_market_share: dim broadcasts expected, got $c8")
  }

  test("q2: correlated min decorrelates to one aggregate + partkey join-back") {
    val p = plan(q("q2_min_cost_supp"))
    // ONLY the constant dims are hinted (region folded into nation);
    // the part band, the supplier set and the min join-back all scale
    // with SF, so they key shuffles — never a forced broadcast. The
    // offers subtree appears twice (min aggregate + join-back; no AQE
    // reuse in this session), so the 1-2 constant-dim exchanges can
    // show up doubled
    val c = countOf(p, "BroadcastExchange")
    assert(c >= 1 && c <= 4,
      s"q2: only the constant region/nation dims may broadcast, got $c:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"q2: the SF-scaling joins must be shuffle joins, not broadcast:\n$p")
    assert(countOf(p, "HashAggregate") >= 2,
      s"q2: the per-part MIN must be a partial+final aggregate:\n$p")
  }

  test("q11: the global fraction is a 1-row broadcast, the comparison never divides") {
    val p = plan(q("q11_important_parts"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"q11: the 1-row global total must broadcast back:\n$p")
    assert(!p.contains("CartesianProduct"), s"q11 has a cartesian:\n$p")
  }

  test("q16: supplier exclusion is an anti join; distinct agg is two-phase; no forced broadcast") {
    val p = plan(q("q16_supplier_diversity"))
    assert(p.contains("LeftAnti"),
      s"q16: the NOT-IN exclusion must plan as an anti join:\n$p")
    // both the part band and the excluded set scale with SF: nothing is
    // broadcast by hint (the session disables auto-broadcast, so any
    // BroadcastExchange here would be a forced one)
    assert(!p.contains("BroadcastExchange"),
      s"q16: SF-scaling sides must not be force-broadcast:\n$p")
    assert(countOf(p, "HashAggregate") >= 3,
      s"q16: count(DISTINCT) must plan as the two-phase expand aggregate:\n$p")
  }

  test("q20: the over-threshold supplier set semi-joins; dates pushed") {
    val p = plan(q("q20_excess_shippers"))
    assert(p.contains("LeftSemi"),
      s"q20: the derived key set must be a semi join:\n$p")
    val f = formatted(q("q20_excess_shippers"))
    assert(f.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(f.contains("LessThan(l_shipdate"), "shipdate upper bound not pushed")
  }

  test("q_overlap_orders: interval-interval overlap plans as an equi-join, never a cartesian") {
    val p = plan(q("q_overlap_orders"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap join must be the bucketed equi-join rewrite:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"overlap join must key a shuffle on (custkey, bucket):\n$p")
  }

  test("q21: the self-correlation is a semi join plus an anti join, both shuffle-based") {
    val p = plan(q("q21_sole_supplier"))
    assert(p.contains("LeftSemi"), "orders-status EXISTS must plan as a semi join")
    assert(p.contains("LeftAnti"), "other-supplier NOT EXISTS must plan as an anti join")
    assert(!p.contains("BroadcastExchange"),
      "both correlation sides scale with SF; nothing may be force-broadcast")
  }

  test("q1: aggregation is partial (map-side combine) before the exchange") {
    val p = plan(q("q1_pricing_summary"))
    assert(countOf(p, "HashAggregate") >= 2, s"expected partial+final aggregate:\n$p")
    assert(p.contains("partial_"), "map-side partial aggregation missing")
  }

  test("funnel: every join/aggregation shuffle is keyed on user_id") {
    val p = plan(q("events_funnel"))
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, "funnel should shuffle on its stage keys")
    assert(exchanges.forall(_.contains("user_id")),
      s"a funnel shuffle is keyed off user_id:\n${exchanges.mkString("\n")}")
  }

  test("interval join plans as an equi-join on (key, bucket), never a nested loop") {
    val p = plan(q("q_interval_signup"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range condition must not fall back to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected a shuffled equi-join on (user_id, time bucket):\n$p")
  }

  test("top-k queries plan TakeOrdered, not a global sort") {
    for (name <- Seq("q3_top_orders", "q_top_brands", "q10_returned_custs",
        "q18_large_orders", "q21_sole_supplier")) {
      val p = plan(q(name))
      assert(p.contains("TakeOrderedAndProject"),
        s"$name: sort+limit should plan as TakeOrdered, not Sort+GlobalLimit:\n$p")
    }
  }

  test("pq ann: candidate selection is a partial map-side top-k, never an exploded exchange") {
    // the ADC candidate stage must stay the bounded-heap mapPartitions:
    // an explode of |queries| scored pairs per corpus row would plan a
    // Generate feeding the rank exchange — the N·|queries| shuffle the
    // operator exists to avoid
    val p = plan(LlmQueries.queries("ann_pq")(spark, sfDir))
    assert(p.contains("MapPartitions"),
      s"ann_pq: expected the bounded-heap candidate stage:\n$p")
    assert(!p.contains("Generate"),
      s"ann_pq: candidate scoring must not explode per-query pairs into the shuffle:\n$p")
    // the per-query rank over local winners still partial-aggregates
    assert(p.contains("WindowGroupLimit"),
      s"ann_pq: final candidate rank should keep the partial WindowGroupLimit:\n$p")
  }

  test("ivf-pq ann: same bounded-candidate shape — heap stage, no explode, partial rank") {
    // the composed operator inherits both contracts: the IVF prune and the
    // PQ ADC scan happen inside one mapPartitions pass over (cid, codes)
    // rows, so the only exchange ahead of the final rank carries at most
    // partitions·|queries|·candidates rows
    val p = plan(LlmQueries.queries("ann_ivfpq")(spark, sfDir))
    assert(p.contains("MapPartitions"),
      s"ann_ivfpq: expected the bounded-heap candidate stage:\n$p")
    assert(!p.contains("Generate"),
      s"ann_ivfpq: candidate scoring must not explode per-query pairs into the shuffle:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"ann_ivfpq: final candidate rank should keep the partial WindowGroupLimit:\n$p")
    assert(!p.contains("CartesianProduct"), s"ann_ivfpq: no cartesian allowed:\n$p")
  }

  test("substring dedup: one Generate, no cartesian, no self-join of the window set") {
    // the duplicate test is a count-over-window on the window text — the
    // exploded window set must be Generated ONCE and shuffled once; a
    // groupBy+semi-join regression doubles both (two Generates in the plan)
    Seq("dedup_substring", "dedup_substring_clean").foreach { g =>
      val p = plan(LlmQueries.queries(g)(spark, sfDir))
      assert(countOf(p, "Generate") == 1,
        s"$g: expected exactly one window explode, plan:\n$p")
      assert(!p.contains("CartesianProduct"), s"$g: no cartesian allowed:\n$p")
    }
  }

  test("incremental dedup: corpus index reduced by semi-join before pairing; no cartesian") {
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val fresh = docs.filter(col("doc_id") % 3 === 0)
    val index = Dedup.minhashIndex(corpus, "text", "doc_id", 3, 64, 16)
    val p = plan(Dedup.incrementalNearDupPairs(fresh, corpus, index, "text", "doc_id",
      threshold = 0.8, shingleN = 3, numHashes = 64, bands = 16))
    // 3 semi-joins: the bucket prefilter + the two candidate re-shingle prunes
    assert(countOf(p, "LeftSemi") >= 3,
      s"incremental dedup: expected bucket + shingle semi-join prunes, plan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"incremental dedup: no cartesian allowed:\n$p")
  }

  test("perceptual hash pairing: bucket equi-join, never a cartesian") {
    val p = plan(LlmQueries.queries("multimodal_phash")(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"multimodal_phash:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"multimodal_phash:\n$p")
  }

  test("semDedup: within-cell equi-join pairing, never a cartesian") {
    val p = plan(LlmQueries.queries("dedup_semantic")(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"dedup_semantic:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"dedup_semantic:\n$p")
  }

  test("ann index probe: partition-pruned codes scan, broadcast probes, no cartesian") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val dir = graft.TempDirs.reclaimOnExit(java.nio.file.Files.createTempDirectory("graft_lint_ann"))
      .resolve("idx").toString
    AnnIndex.build(emb, dir, nCentroids = 8)
    val probe = AnnIndex.probe(emb.filter(col("vec_id") < 2), dir, k = 3, nProbes = 2)
    val p = plan(probe)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ann probe:\n$p")
    // the cell filter must prune at the parquet scan, and the candidate
    // join must broadcast the bounded probe side (never shuffle codes
    // against a tiny query set)
    assert(p.contains("PartitionFilters") &&
      p.split('\n').exists(l => l.contains("PartitionFilters") && l.contains("cid")),
      s"ann probe cell pruning:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"ann probe broadcast:\n$p")
  }

  test("semantic ingest: cell-pruned equi-joins, anti-join guards, no cartesian") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val dir = graft.TempDirs.reclaimOnExit(java.nio.file.Files.createTempDirectory("graft_lint_semingest"))
      .resolve("idx").toString
    AnnIndex.build(emb.filter(col("vec_id") < 25), dir, nCentroids = 8)
    // the un-checkpointed decision plan — the public method materializes
    // it, which would hide the joins from the lint
    val dec = AnnIndex.semDedupDecisions(emb.filter(col("vec_id") >= 25), dir,
      threshold = 0.95, hotCellThreshold = 4096, batchId = Some(1L),
      idCol = "vec_id", vecCol = "embedding")
    val p = plan(dec)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semantic ingest:\n$p")
    assert(countOf(p, "LeftAnti") >= 2, s"semantic ingest anti-join guards:\n$p")
    assert(p.contains("LeftSemi"), s"semantic ingest cell prune:\n$p")
  }

  test("cms estimate: the sketch side joins broadcast, never sort-merge") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sketch = graft.operators.TextOps.cmsBuild(docs, "text")
    val terms = graft.operators.TextOps.topTerms(docs, "text", 20)
    val p = plan(graft.operators.TextOps.cmsEstimate(sketch, terms))
    assert(p.contains("BroadcastHashJoin"),
      s"cmsEstimate must broadcast the bounded sketch:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"cmsEstimate must not shuffle the term side against the sketch:\n$p")
  }

  test("int8 quantizer: one narrow pass, zero shuffles") {
    val p = plan(graft.operators.Similarity.quantizeInt8(
      graft.Tables.embeddings(spark, sfDir)))
    assert(countOf(p, "Exchange") == 0,
      s"quantizeInt8 must be shuffle-free (pure Catalyst narrow map):\n$p")
  }

  test("hashed classifier: one narrow pass, zero shuffles") {
    val n = 16
    val weights = Array.tabulate(n)(b => (b - 8) / 4.0)
    val p = plan(graft.operators.TextOps.hashedBowScore(
      graft.Tables.documents(spark, sfDir), "text", "doc_id", weights))
    assert(countOf(p, "Exchange") == 0,
      s"hashedBowScore must be shuffle-free (broadcast weights, narrow map):\n$p")
  }

  test("temperature sampling: rate dim broadcast to the corpus, which never shuffles") {
    val docs = graft.Tables.documents(spark, sfDir)
    val p = plan(graft.operators.Sampling.temperatureSampleByStrata(
      docs, "doc_id", "source", col("n_chars").cast("long"), 0.5, "t"))
    // the CORPUS side of the final join must arrive broadcast-joined,
    // not shuffled: the only Exchanges allowed are inside the tiny rate
    // derivation (per-source totals agg + its 1-row min)
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for the rate join:\n$p")
  }

  test("quality buckets: one threshold aggregation broadcast back, corpus stays narrow") {
    val docs = graft.Tables.documents(spark, sfDir)
    val p = plan(graft.operators.TextOps.qualityBuckets(docs, "text", "doc_id"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row threshold table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the corpus must never shuffle against the thresholds:\n$p")
  }

  test("url canonicalization: a pure narrow map — zero exchanges") {
    val docs = graft.Tables.documents(spark, sfDir)
    val p = plan(docs.select(col("doc_id"),
      Domains.canonicalizeUrl(col("source")).as("canon"),
      Domains.registeredDomain(col("source")).as("domain")))
    assert(!p.contains("Exchange"),
      s"canonicalizeUrl/registeredDomain must stay a narrow projection:\n$p")
  }

  test("suffix dim table broadcasts onto the corpus, which never shuffles") {
    val sp = spark; import sp.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source").as("url"))
    val dim = Domains.SecondLevelSuffixes.toDF("suffix")
    val p = plan(Domains.withRegisteredDomain(docs, "url", "domain", dim))
    assert(p.contains("BroadcastHashJoin"),
      s"the suffix list must broadcast-join the corpus:\n$p")
    // the one allowed exchange is the tiny dim's own distinct; the
    // corpus side must stay a scan -> project into the broadcast join
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the suffix lookup:\n$p")
    assert(countOf(p, "Exchange hashpartitioning") <= 1,
      s"only the dim's distinct may exchange:\n$p")
  }

  test("domain policy: blocklist is a broadcast anti-join; cap is a pushed group limit") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("source").as("url"))
    val p = plan(Domains.capPerDomain(
      Domains.filterBlockedDomains(docs, "url", Seq("spam.example")),
      "url", Seq(col("n_chars").desc, col("doc_id").asc), n = 4))
    // the hand-curated blocklist must never shuffle the corpus
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"blocklist must be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the blocklist:\n$p")
    // the rank<=n filter must push a partial WindowGroupLimit below the
    // exchange — a hot domain then costs O(n) network, not O(domain)
    assert(countOf(p, "WindowGroupLimit") >= 2,
      s"per-domain cap must run map-side group limit before the shuffle:\n$p")
  }

  test("composed domain pipeline: blocklist/cap shapes survive composition; no cartesian") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"),
        col("source").as("url"))
    val capped = Domains.capPerDomain(
      Domains.filterBlockedDomains(docs, "url", Seq("spam.example")),
      "url", Seq(col("n_chars").desc, col("doc_id").asc), n = 4)
    val scored = TextOps.hashedBowScore(capped, "text", "doc_id",
        Array.fill(16)(0.1), intercept = 0.05)
      .join(capped.select(col("doc_id"), col("source"), col("domain")),
        Seq("doc_id"))
      .filter(col("quality_pass"))
    val p = plan(Sampling.selectUnderTokenBudgetPerGroup(
      scored, "source", Seq(col("score").desc, col("doc_id").asc), "n_tok",
      budgets = Map("a" -> 800L), defaultBudget = 1500L))
    // composing the stages must not degrade the per-stage shapes: the
    // blocklist stays a broadcast anti-join, the cap keeps its map-side
    // group limit, and nothing in the chain plans a cartesian
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"composed blocklist must stay a broadcast anti-join:\n$p")
    assert(countOf(p, "WindowGroupLimit") >= 2,
      s"composed cap must keep the map-side group limit:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"composed domain pipeline must not plan a cartesian:\n$p")
  }

  test("bottom-k sample sketch: global is a TakeOrdered heap, by-group pushes a map-side group limit") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
    // global: per-partition top-k heaps merged at the driver — a full
    // Sort + GlobalLimit would materialize the corpus ordering
    val pg = plan(Sampling.bottomKSample(docs, "doc_id", "n_chars", 16))
    assert(pg.contains("TakeOrderedAndProject"),
      s"global bottom-k must plan per-partition heaps (TakeOrdered):\n$pg")
    // by-group: the rank<=k prune must run map-side before the exchange,
    // so a hot group ships k rows per partition, never its row count
    val pb = plan(Sampling.bottomKSampleByGroup(
      docs, "source", "doc_id", "n_chars", 16))
    assert(countOf(pb, "WindowGroupLimit") >= 2,
      s"by-group bottom-k must run a map-side group limit:\n$pb")
  }
}
