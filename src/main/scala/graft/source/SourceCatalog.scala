package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source resolution with fallback — the analog of the reference's
  * backend/source resolver (/root/reference/src/core/runtime/
  * resolver.rs:4-35). Production would register an Iceberg catalog and
  * read the source-code table by identifier; no Iceberg runtime jar
  * exists in this environment (SURVEY.md section 7.1), so the parquet
  * path is the active implementation and the resolution is recorded for
  * the run manifest.
  */
trait SourceCatalog {
  /** The (repo, path, commit, lang, content) table. */
  def sourceTable(spark: SparkSession): DataFrame
  def resolved: String
  def fallbackReason: Option[String]
}

final class ParquetCatalog(path: String) extends SourceCatalog {
  def sourceTable(spark: SparkSession): DataFrame =
    spark.read.parquet(path).select("repo", "path", "commit", "lang",
      "content")
  val resolved = s"parquet:$path"
  val fallbackReason: Option[String] = None
}

/** Iceberg-by-identifier; falls back to parquet when the catalog is not
  * configured (the sandbox case). */
final class IcebergCatalog(table: String, parquetFallback: String)
    extends SourceCatalog {
  private var reason: Option[String] = None
  def sourceTable(spark: SparkSession): DataFrame =
    try spark.table(table).select("repo", "path", "commit", "lang", "content")
    catch {
      case e: Exception =>
        reason = Some(s"ICEBERG_UNAVAILABLE: ${e.getClass.getSimpleName}")
        new ParquetCatalog(parquetFallback).sourceTable(spark)
    }
  def resolved: String = reason.map(_ => s"parquet:$parquetFallback")
    .getOrElse(s"iceberg:$table")
  def fallbackReason: Option[String] = reason
}
