package graft

import graft.multimodal.Manifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Omero upload-manifest shape (multimodal/Manifest.scala; reference
  * imaging/CreateCSVForUploadToOmero.py): directory-walk inventory,
  * checksum join, unmatched report, single-file CSV write.
  */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTree(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_omero")
    root.toFile.deleteOnExit()
    Seq(("C1", "P1", "PR1", "PA1", "a.png"), ("C1", "P1", "PR1", "PA1", "b.png"),
      ("C2", "P2", "PR2", "PA2", "c.png")).foreach { case (c, p, pr, pa, f) =>
      val d = root.resolve(c).resolve(p).resolve(pr).resolve(pa)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve(f), "fake")
    }
    // a file at the wrong depth must be ignored, as the reference's
    // fixed nested listdir would
    java.nio.file.Files.writeString(root.resolve("C1").resolve("stray.txt"), "x")
    root.toString
  }

  test("inventoryFromDirectory walks the 4-level tree; manifest joins checksums; unmatched reported") {
    val inv = Manifest.inventoryFromDirectory(spark, mkTree())
    assert(inv.count() == 3) // stray.txt at the wrong depth ignored
    val media = Seq(
      ("C1", "P1", "PR1", "PA1", "a.png", "ck_a"),
      ("C2", "P2", "PR2", "PA2", "c.png", "ck_c"))
      .toDF("centre", "pipeline", "procedure", "parameter", "file_name", "checksum")
    val manifest = Manifest.omeroManifest(inv, media).collect()
    assert(manifest.length == 2)
    val paths = manifest.map(_.getAs[String]("download_file_path")).sorted
    assert(paths sameElements Array(
      "https://api.mousephenotype.org/ck_a/a.png",
      "https://api.mousephenotype.org/ck_c/c.png"))
    assert(manifest.forall(_.getAs[String]("datasource_name") == "IMPC"))
    val un = Manifest.unmatched(inv, media).collect()
    assert(un.length == 1 && un(0).getAs[String]("file_name") == "b.png")
  }

  test("writeCsv emits the reference's single fixed-header CSV") {
    val inv = Seq(("C1", "P1", "PR1", "PA1", "a.png"))
      .toDF("centre", "pipeline", "procedure", "parameter", "file_name")
    val media = inv.withColumn("checksum", lit("ck"))
    val out = java.nio.file.Files.createTempDirectory("graft_omero_csv").toString
    Manifest.writeCsv(Manifest.omeroManifest(inv, media), out, "dr99")
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$out/dr99.csv"))
    assert(lines.get(0) == "observation_id,increment_value,download_file_path," +
      "phenotyping_center,pipeline_stable_id,procedure_stable_id," +
      "datasource_name,parameter_stable_id")
    assert(lines.size == 2 &&
      lines.get(1) == "xxx,xxx,https://api.mousephenotype.org/ck/a.png,C1,P1,PR1,IMPC,PA1")
  }
}
