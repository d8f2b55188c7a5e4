package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** §2.1 S2/S6: archive handling ≙ `extractcalaccessrawdata.py` (unzip the
  * export, flatten the `CalAccess/DATA/` TSV names) and the gzip archival
  * sinks.
  *
  * Zip is not a splittable Spark format, so extraction is a driver-side
  * prep step exactly as in the reference (the 1 GB export unzips once,
  * then every downstream stage is distributed). Gzip text, by contrast,
  * is read natively by `spark.read.text`/`csv` — no code needed, which is
  * why only the zip path lives here.
  */
object Archive {

  /** Extract entries matching `keep` into flat files under `outDir`
    * (directory structure flattened to basenames, reference behavior). */
  def unzip(zipPath: String, outDir: String,
      keep: String => Boolean = _.toUpperCase.endsWith(".TSV")): Seq[String] = {
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    val zin = new ZipInputStream(
      new java.io.BufferedInputStream(
        new java.io.FileInputStream(zipPath)))
    val out = Seq.newBuilder[String]
    try {
      var entry: ZipEntry = zin.getNextEntry
      while (entry != null) {
        val base = new java.io.File(entry.getName).getName
        if (!entry.isDirectory && keep(entry.getName)) {
          val target = new java.io.File(dir, base)
          val os = new BufferedOutputStream(new FileOutputStream(target))
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = zin.read(buf)
            while (n >= 0) { os.write(buf, 0, n); n = zin.read(buf) }
          } finally os.close()
          out += target.getPath
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Bundle files into one zip archive under their basenames — the
    * inverse of [[unzip]], used to produce an export-shaped artifact
    * (`dbwebexport.zip` analog) from archived sink output so the
    * extract path can be driven end-to-end (`archive_roundtrip`).
    * Driver-side for the same reason extraction is: zip is not a
    * splittable Spark format. */
  def zip(files: Seq[String], zipPath: String): Unit = {
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(zipPath)))
    try files.foreach { f =>
      val file = new java.io.File(f)
      zos.putNextEntry(new ZipEntry(file.getName))
      val in = new java.io.BufferedInputStream(
        new java.io.FileInputStream(file))
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { zos.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      zos.closeEntry()
    } finally zos.close()
  }

  /** Gzip text reads are native: this is just the documented entry point
    * (S6 archives round-trip through the normal scan). */
  def readGzipText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
