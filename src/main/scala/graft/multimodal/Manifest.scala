package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media upload-manifest assembly — the reference's
  * imaging/CreateCSVForUploadToOmero.py shape (the Omero RPC itself is
  * out of scope): walk a centre/pipeline/procedure/parameter directory
  * tree of image files, find each file's checksum in the media
  * metadata, and emit a fixed-header upload CSV; files with no
  * metadata row are reported, not silently dropped.
  *
  * Spark-first reformulation: the reference scans ALL metadata per
  * file on the driver (findChecksum: O(files × metadata)); here both
  * sides are DataFrames and the lookup is ONE equi-join on the
  * five-part key — broadcast when the metadata side is dim-sized,
  * shuffled hash otherwise — so the same logic runs at any inventory
  * size. The unmatched report is the anti-join of the same key.
  */
object Manifest {

  val HierarchyKeys: Seq[String] =
    Seq("centre", "pipeline", "procedure", "parameter", "file_name")

  /** The upload manifest: inventory rows enriched with their metadata
    * checksum, in the reference CSV's column order
    * (CreateCSVForUploadToOmero.py:60-75; observation_id and
    * increment_value are placeholders there — kept as literals). */
  def omeroManifest(inventory: DataFrame, media: DataFrame,
                    urlPrefix: String = "https://api.mousephenotype.org/",
                    datasource: String = "IMPC"): DataFrame =
    inventory.join(media.select((HierarchyKeys.map(col) :+ col("checksum")): _*),
        HierarchyKeys)
      .select(lit("xxx").as("observation_id"), lit("xxx").as("increment_value"),
        concat(lit(urlPrefix), col("checksum"), lit("/"), col("file_name"))
          .as("download_file_path"),
        col("centre").as("phenotyping_center"),
        col("pipeline").as("pipeline_stable_id"),
        col("procedure").as("procedure_stable_id"),
        lit(datasource).as("datasource_name"),
        col("parameter").as("parameter_stable_id"))

  /** Inventory files with no metadata row — the reference's per-file
    * ERROR prints, as a queryable DataFrame. */
  def unmatched(inventory: DataFrame, media: DataFrame): DataFrame =
    inventory.join(media, HierarchyKeys, "left_anti")

  /** Walk a four-level centre/pipeline/procedure/parameter directory
    * of image files into an inventory DataFrame. Listing runs on the
    * driver (exactly where Spark's own file-source listing lives);
    * rows immediately become a distributed frame. */
  def inventoryFromDirectory(spark: SparkSession, root: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, String, String, String)]()
    val rootPath = fs.makeQualified(p).toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) {
        val rel = f.getPath.toUri.getPath.stripPrefix(rootPath).stripPrefix("/")
        rel.split("/") match {
          case Array(centre, pipe, proc, param, name) =>
            rows += ((centre, pipe, proc, param, name))
          case _ => () // not at the expected depth — ignore, as the reference's nested listdir does
        }
      }
    }
    spark.createDataFrame(rows.toSeq)
      .toDF(HierarchyKeys: _*)
  }

  /** Write the manifest as the reference's single CSV file
    * `<outDir>/<drTag>.csv` (header + rows; one file because the
    * consumer is a manual upload tool, not a distributed reader). */
  def writeCsv(manifest: DataFrame, outDir: String, drTag: String): Unit = {
    val tmp = s"$outDir/_${drTag}_csv_tmp"
    manifest.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(tmp)
    import org.apache.hadoop.fs.Path
    val fs = new Path(tmp).getFileSystem(
      manifest.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new Path(s"$tmp/part-*.csv"))(0).getPath
    val dest = new Path(s"$outDir/$drTag.csv")
    if (fs.exists(dest)) fs.delete(dest, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dest, false,
      manifest.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new Path(tmp), true)
  }
}
