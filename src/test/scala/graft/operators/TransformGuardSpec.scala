package graft.operators

import graft.core.{ShardGtid, Vgtid}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.tools.SpecErrors.messages
import org.scalatest.funsuite.AnyFunSuite

/** Fail-loud guards on the record transforms and the batch backfill —
  * the silent-corruption paths a gate's healthy fixtures never walk. */
class TransformGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("replaceFieldValue: top-level non-string column is rejected, not retyped") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "x")).toDF("n", "s")
      .withColumn("st", struct(col("n").as("a")))
    // string column: fine
    assert(Transforms.replaceFieldValue(df, "s").select("s").head().getString(0) == "")
    // struct (or numeric) column: silently becoming a string would break
    // every downstream consumer of the schema
    val err = intercept[IllegalArgumentException] {
      Transforms.replaceFieldValue(df, "st")
    }
    assert(err.getMessage.contains("string fields"))
    // a nested path to a leaf inside the struct still works
    val nested = Transforms.replaceFieldValue(
      df.withColumn("st", struct(col("s").as("leaf"))), "st.leaf")
    assert(nested.select("st.leaf").head().getString(0) == "")
  }

  test("backfill: a row's shard outside the handover vgtid fails the job loudly") {
    val sp = spark; import sp.implicits._
    val rows = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val handover = Vgtid(Seq(ShardGtid("ks", "0", "MySQL56/h:1-5")))
    // rows shard by id % 4 → shards 1 and 2, NOT covered by {0}
    val out = CdcBackfill.snapshotRecords(
      rows, "ks", "t", Seq("id"), col("id") % 4, handover)
    val err = intercept[Exception] { out.collect() }
    assert(messages(err).exists(_.contains("not covered by the handover vgtid")))
    // covered shards still produce records with their local position
    val ok = CdcBackfill.snapshotRecords(
      rows, "ks", "t", Seq("id"), col("id") % 4,
      Vgtid(Seq(ShardGtid("ks", "1", "MySQL56/h:1-5"),
        ShardGtid("ks", "2", "MySQL56/h:1-7"))))
    assert(ok.count() == 2)
    assert(ok.select("vgtid").as[String].collect().forall(_.nonEmpty))
  }
}
