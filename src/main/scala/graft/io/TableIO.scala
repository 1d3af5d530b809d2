package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-table storage behind a thin trait (SURVEY.md §2 rows 1–2).
  *
  * Production target is Iceberg ([[IcebergCatalog]], DSv2 `writeTo`); this
  * sandbox ships no Iceberg jars, so [[ParquetCatalog]] is the local
  * implementation with the same atomic-replace semantics (write to a temp
  * dir, rename over). Both are exercised through the same call sites in
  * [[graft.Dedup]].
  */
trait TableCatalog {
  def write(df: DataFrame, stage: String, partitionBy: Seq[String] = Nil): Unit
  def read(spark: SparkSession, stage: String): DataFrame
  def exists(spark: SparkSession, stage: String): Boolean
  def location(stage: String): String
}

/** Local/posix implementation over a root directory, one subdir per stage.
  * Parquet + overwrite gives the checkpoint/replace semantics; `_SUCCESS`
  * marks completeness (a killed write leaves no marker → stage recomputes).
  */
final class ParquetCatalog(root: String) extends TableCatalog {
  override def location(stage: String): String = s"$root/$stage"

  override def write(df: DataFrame, stage: String, partitionBy: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(location(stage))
  }

  override def read(spark: SparkSession, stage: String): DataFrame =
    spark.read.parquet(location(stage))

  override def exists(spark: SparkSession, stage: String): Boolean = {
    val p = new Path(location(stage), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

/** Documented production implementation: Iceberg tables under a configured
  * catalog (`spark.sql.catalog.<name>` = org.apache.iceberg.spark.SparkCatalog).
  * Uses only the public DSv2 API, so it compiles without Iceberg on the
  * classpath; it requires the catalog at runtime (not available in this
  * sandbox — see SURVEY.md §7.4 item 5).
  */
final class IcebergCatalog(catalogAndDb: String) extends TableCatalog {
  override def location(stage: String): String = s"$catalogAndDb.$stage"

  override def write(df: DataFrame, stage: String, partitionBy: Seq[String]): Unit = {
    // createOrReplace = atomic snapshot swap in Iceberg; partitioning is
    // carried by the existing table spec (bucket(doc_id) / lang in prod).
    df.writeTo(location(stage)).createOrReplace()
  }

  override def read(spark: SparkSession, stage: String): DataFrame =
    spark.read.table(location(stage))

  override def exists(spark: SparkSession, stage: String): Boolean =
    spark.catalog.tableExists(location(stage))
}
