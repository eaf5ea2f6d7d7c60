package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Advanced, CorpusSelect, Dedup, Etl, Kpi, Multimodal, ReferenceParity, Relational, Similarity, Streaming, TextAnalysis, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {
  /** Every implemented operator, in SURVEY §2 order. */
  def allQueries: Seq[Q] =
    Relational.all ++ Advanced.all ++ Etl.all ++ ReferenceParity.all ++
      Warehouse.all ++ Kpi.all ++
      Dedup.all ++ Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++
      CorpusSelect.all ++ Streaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
