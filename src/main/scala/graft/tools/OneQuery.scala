package graft.tools

import graft.{GraftSession, SparkEntry, Verify}

/** Dev loop helper: run ONE registry query by name and dump its result
  * parquet + oracle_sql.json in the Verify layout, so
  * `scripts/selfcheck.py` can gate a single query without paying the
  * full 120-query Verify pass.
  *
  * Usage: runMain graft.tools.OneQuery <name> <sfDir> <outDir>
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, s"graft-one-$name")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val oracle = SparkEntry.oracleSql.get(name)
      .map(sql => s"${Verify.jsonStr(name)}: ${Verify.jsonStr(sql.trim)}")
      .mkString("{", "", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), oracle)
    spark.stop()
  }
}
