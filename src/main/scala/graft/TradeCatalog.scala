package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Persistent queryable catalog — the engine analog of the reference's
  * `trade.duckdb` (etl.py:84-92): the ETL run persists the model
  * tables ONCE, and any later session or tool opens the store and
  * queries them by name without re-running ETL (app.py:24-55
  * `load_data()` does exactly this against the duckdb file).
  *
  * Spark-first shape: `saveAsTable` EXTERNAL parquet tables under one
  * warehouse root. The duckdb-file role is played by the warehouse
  * DIRECTORY — a self-describing parquet layout any fresh session can
  * re-open. [[attach]] is the `duckdb.connect(...)` analog: it
  * re-registers every table in a fresh catalog as metadata-only
  * `CREATE TABLE ... USING parquet LOCATION` statements (O(ms), zero
  * data movement, zero recompute). On a real cluster the same publish
  * code runs against a shared Hive metastore
  * (`--conf spark.sql.catalogImplementation=hive`), where attach is
  * unnecessary because the metastore itself is durable; the external
  * LOCATION layout is identical in both deployments.
  */
object TradeCatalog {

  /** Catalog database holding the published models. */
  val db = "graft_trade"

  /** Default warehouse root — outside the repo, shared across JVMs. */
  def defaultRoot: String =
    s"${System.getProperty("java.io.tmpdir")}/graft-trade-warehouse"

  /** The persisted model tables and the oracle-checked operator each
    * one materializes (reference etl.py writes `trade` plus the
    * kpi_monthly / kpi_products models into trade.duckdb).
    */
  val models: Seq[(String, String)] = Seq(
    "trade" -> "kpi_trade_long",
    "kpi_monthly" -> "kpi_mom_yoy",
    "kpi_prod_monthly" -> "kpi_prod_monthly")

  /** ETL-side write: materialize each model as an external parquet
    * table under `root`. Overwrite = the reference's re-run semantics
    * (etl.py drops and rewrites its duckdb tables each run).
    */
  def publish(spark: SparkSession, sfDir: String,
      root: String = defaultRoot): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    models.foreach { case (table, query) =>
      SparkEntry.queries(query)(spark, sfDir)
        .write.mode("overwrite").format("parquet")
        .option("path", s"$root/$table")
        .saveAsTable(s"$db.$table")
    }
  }

  /** Canonical form of a catalog location for equality comparison:
    * URI-decode (DESCRIBE reports `file:/...` with escaped chars),
    * fall back to the raw string for non-URI input, and strip any
    * trailing slashes.
    */
  private[graft] def normalizePath(location: String): String = {
    val path =
      try {
        val u = new java.net.URI(location)
        if (u.getPath != null && u.getPath.nonEmpty) u.getPath else location
      } catch { case _: java.net.URISyntaxException => location }
    path.reverse.dropWhile(_ == '/').reverse match {
      case "" => "/"
      case p => p
    }
  }

  /** Session-side open: register every table directory found under
    * `root` in this session's catalog. Metadata-only — no scan, no
    * ETL — so a fresh session is queryable in milliseconds, the same
    * contract as opening the reference's duckdb file. Returns the
    * attached table names.
    */
  def attach(spark: SparkSession, root: String = defaultRoot): Seq[String] = {
    val rootPath = Paths.get(root)
    require(Files.isDirectory(rootPath),
      s"no warehouse at $root — run publish (the ETL) first")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // only the KNOWN model tables are attached (a crashed publish can
    // leave partial/staging directories under the shared tmp root —
    // registering arbitrary subdirectories would serve truncated data
    // with no error), and a pre-existing catalog entry pointing at a
    // DIFFERENT location is re-pointed rather than silently winning
    // over the requested root (CREATE TABLE IF NOT EXISTS would
    // no-op and leave reads on the stale warehouse).
    models.map(_._1).filter(t => Files.isDirectory(rootPath.resolve(t)))
      .map { table =>
        val loc = rootPath.resolve(table).toAbsolutePath.toString
        val existing = spark.catalog.tableExists(s"$db.$table")
        // 'same location' must be PATH EQUALITY after normalization,
        // not a suffix test: endsWith would accept any stored root
        // whose path merely ends with the requested one (stale reads),
        // and reject a URI-escaped location (e.g. spaces) that is in
        // fact current (needless DROP/CREATE every attach). The stored
        // value is a URI (file:/...); parse it, take the decoded path,
        // strip trailing slashes, and compare equal.
        val samePath = existing &&
          spark.sql(s"DESCRIBE TABLE EXTENDED $db.`$table`")
            .filter("col_name = 'Location'")
            .collect().headOption.exists { r =>
              normalizePath(r.getString(1)) == normalizePath(loc)
            }
        if (existing && !samePath) spark.sql(s"DROP TABLE $db.`$table`")
        if (!existing || !samePath) {
          spark.sql(s"CREATE TABLE $db.`$table` " +
            s"USING parquet LOCATION '$loc'")
        }
        table
      }.sorted
  }
}
