package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (Test/fork := true). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // localCheckpoint leaves have no stats; the Long.MaxValue default
      // makes Catalyst's multiplicative join-size estimates blow up into
      // huge BigInts on iterative plans
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Edge DataFrame from (src, dst, weight) triples. */
  def edges(ts: (Long, Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    ts.toDF("src", "dst", "weight")
  }

  /** (v -> value) map from a two-column DataFrame. */
  def toMapLL(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  def toMapLD(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Canonicalize a community assignment: relabel each community to its
    * minimum member id, so structurally identical partitions compare equal
    * (SURVEY.md section 7.4).
    */
  def canonicalPartition(assign: Map[Long, Long]): Map[Long, Long] = {
    val minOf = assign.groupBy(_._2).map { case (c, kv) => c -> kv.keys.min }
    assign.map { case (v, c) => v -> minOf(c) }
  }
}
