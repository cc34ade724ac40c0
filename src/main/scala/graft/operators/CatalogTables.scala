package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Paths

/** Metastore-backed table surface: maps the reference's named-schema
  * warehouse (`CREATE SCHEMA IF NOT EXISTS bronze` — spark_jobs/
  * bronze.py:16; dbt's custom schemas `staging`/`marts` —
  * dbt_project/macros/generate_schema_name.sql:1-3) onto Spark's catalog,
  * so the engine's maintenance operators (Incremental, Retention,
  * Compaction) work against CATALOG TABLES, not just filesystem paths.
  *
  * Tables are registered EXTERNAL (`USING parquet LOCATION …`): the
  * catalog owns names+schemas+partitions, the parquet layout stays
  * exactly what the path-based operators maintain. Every mutation goes
  * through the table's catalog-resolved location and ends with `sync`
  * (refresh + partition recovery), so `spark.table("staging.stg_orders")`
  * and the path read never diverge. On a Hive/Unity-style metastore the
  * same calls route through the shared catalog — nothing here is
  * local-filesystem-specific except the maintenance operators' own IO.
  */
object CatalogTables {

  /** `CREATE DATABASE IF NOT EXISTS` (bronze.py:16 semantics). */
  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** Register (idempotently) an external parquet table over `path`.
    * Schema — including hive-partition columns — is inferred from the
    * layout; existing partitions are recovered into the catalog. */
  def registerExternal(spark: SparkSession, table: String,
                       path: String): Unit = {
    table.split('.').dropRight(1).foreach(ensureDatabase(spark, _))
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $table USING parquet LOCATION '$path'")
    sync(spark, table)
  }

  /** The table's storage location as a local filesystem path — the
    * catalog is the source of truth; operators never carry paths of
    * registered tables themselves. */
  def location(spark: SparkSession, table: String): String = {
    val loc = spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(col("col_name") === "Location")
      .select(col("data_type")).head().getString(0)
    val uri = java.net.URI.create(loc.replace(" ", "%20"))
    if (uri.getScheme == null) loc else Paths.get(uri).toString
  }

  /** Make the catalog see the path's current state: drop cached
    * file listings/data and re-discover partitions (external datasource
    * tables track partitions in the catalog — a path-level mutation
    * that adds or drops partition dirs must be recovered explicitly). */
  def sync(spark: SparkSession, table: String): Unit = {
    spark.catalog.refreshTable(table)
    // SYNC PARTITIONS both ADDS new partition dirs and DROPS vanished
    // ones (recoverPartitions/plain MSCK only adds — a retention drop
    // would leave ghost partitions in the catalog)
    try spark.sql(s"MSCK REPAIR TABLE $table SYNC PARTITIONS")
    catch { case _: Throwable => () } // unpartitioned tables have nothing to recover
  }
}

/** Incremental materializer addressed by CATALOG TABLE NAME: resolves
  * the location from the metastore, delegates to the path-based
  * `Incremental` (same single-writer lock, same swap protocol), then
  * syncs the catalog so readers of `spark.table(name)` see the new
  * state. `createAs` registers a model's first materialization. */
final class CatalogIncremental(spark: SparkSession,
    store: CommitStore = CommitStore.local) {
  private val inc = new Incremental(spark, store)

  /** First materialization: write `df` to `path` and register `table`
    * over it (CTAS-shaped, but external so maintenance stays
    * partition-granular). */
  def createAs(table: String, path: String, df: DataFrame,
               partitionBy: Option[String] = None): Unit = {
    val w = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    partitionBy.fold(w)(c => w.partitionBy(c)).parquet(path)
    CatalogTables.registerExternal(spark, table, path)
  }

  def upsert(table: String, updates: DataFrame, keys: Seq[String]): Unit = {
    inc.upsert(CatalogTables.location(spark, table), updates, keys)
    CatalogTables.sync(spark, table)
  }

  def upsertPartitioned(table: String, updates: DataFrame,
                        keys: Seq[String], partCol: String): Unit = {
    inc.upsertPartitioned(CatalogTables.location(spark, table), updates,
      keys, partCol)
    CatalogTables.sync(spark, table)
  }

  /** Late-data window against a catalog table's current watermark. */
  def lateWindow(source: DataFrame, table: String, tsCol: String,
                 lookback: String = "1 DAY"): DataFrame =
    inc.lateWindow(source, CatalogTables.location(spark, table), tsCol,
      lookback)
}

/** Lifecycle maintenance addressed by catalog table name: partition
  * retention and small-file compaction run against the catalog-resolved
  * location, then the catalog re-syncs (dropped partition dirs leave the
  * partition list, rewritten files drop from caches). */
final class CatalogMaintenance(spark: SparkSession,
    store: CommitStore = CommitStore.local) {
  private val ret = new Retention(spark, store)
  private val comp = new Compaction(spark, store = store)

  def retainDays(table: String, partCol: String, days: Int,
                 asOf: java.time.LocalDate): Seq[String] = {
    val dropped = ret.retainDays(CatalogTables.location(spark, table),
      partCol, days, asOf)
    CatalogTables.sync(spark, table)
    dropped
  }

  def dropPartitionsBefore(table: String, partCol: String,
                           cutoff: Column): Seq[String] = {
    val dropped = ret.dropPartitionsBefore(
      CatalogTables.location(spark, table), partCol, cutoff)
    CatalogTables.sync(spark, table)
    dropped
  }

  def compact(table: String): Seq[String] = {
    val rewritten = comp.compact(CatalogTables.location(spark, table))
    CatalogTables.sync(spark, table)
    rewritten
  }
}
