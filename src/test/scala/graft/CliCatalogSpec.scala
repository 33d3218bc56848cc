package graft

import org.apache.spark.sql.functions._
import graft.source.{CodeTableSynth, IcebergCatalog, ParquetCatalog}

/** Smoke coverage for the two formerly-untested components: A20 source
  * resolution/fallback (SourceCatalog) and A22 the CLI (Main.runCli
  * run/update/resume round trip). */
class CliCatalogSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("A20: parquet catalog resolves; iceberg catalog falls back with a reason code") {
    val dir = tmpDir("graft-cat")
    CodeTableSynth.sourceTable(spark, 20).write.mode("overwrite")
      .parquet(s"$dir/src")

    val pq = new ParquetCatalog(s"$dir/src")
    assert(pq.sourceTable(spark).count() === 20)
    assert(pq.resolved === s"parquet:$dir/src")
    assert(pq.fallbackReason.isEmpty)

    // no iceberg catalog is registered in this session -> fallback path
    val ice = new IcebergCatalog("nosuch.catalog.tbl", s"$dir/src")
    assert(ice.sourceTable(spark).count() === 20)
    assert(ice.fallbackReason.exists(_.startsWith("ICEBERG_UNAVAILABLE")),
      s"reason=${ice.fallbackReason}")
    assert(ice.resolved === s"parquet:$dir/src")
  }

  test("A22: CLI run/update/resume round trip on a tiny graph") {
    val dir = tmpDir("graft-cli")
    // two triangles bridged later by the update batch
    edges((0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0),
      (10L, 11L, 1.0), (11L, 12L, 1.0), (10L, 12L, 1.0))
      .write.mode("overwrite").parquet(s"$dir/edges")
    edges((2L, 10L, 1.0)).write.mode("overwrite").parquet(s"$dir/delta")

    val ran = Main.runCli(spark, Array("run", s"$dir/edges", s"$dir/ckpt"))
    assert(ran.isDefined)
    val (q0, c0, _, b0) = ran.get
    assert(b0 === 0 && c0 === 2L && q0 > 0.3, s"q=$q0 c=$c0")

    val upd = Main.runCli(spark,
      Array("update", s"$dir/delta", s"$dir/ckpt"))
    assert(upd.isDefined)
    val (_, c1, _, b1) = upd.get
    assert(b1 === 1 && c1 >= 1L && c1 <= 2L)

    val res = Main.runCli(spark, Array("resume", s"$dir/ckpt"))
    assert(res.isDefined)
    // resume reports the assignment row count as the second field
    assert(res.get._2 === 6L)

    intercept[IllegalArgumentException] {
      Main.runCli(spark, Array("frobnicate", "x"))
    }
  }
}
