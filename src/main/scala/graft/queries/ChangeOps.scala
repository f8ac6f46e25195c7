package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Change-data / sampling operators:
  *
  *  - [[scd1Upsert]] — MERGE-style SCD-type-1 upsert composed from a full
  *    outer join + column-wise coalesce: updates overwrite matching keys,
  *    inserts append new keys, untouched rows pass through. This is the
  *    upsert path for a plain-parquet lakehouse (Delta/Iceberg MERGE
  *    without the table format); at scale it's one shuffle of base ∪
  *    updates on the key, then an overwrite of the affected partitions.
  *  - [[stratifiedSample]] — deterministic stratified sampling: fixed-size
  *    per-stratum samples ordered by a content hash (md5 — reproducible
  *    across engines AND runs, unlike rand()-based sampleBy). The standard
  *    way to carve eval slices out of a training corpus such that the
  *    sample is stable under reprocessing.
  */
object ChangeOps {

  /** Deterministic "updates batch" derived from the customer table:
    * every 7th key changes (acctbal bump + segment rewrite), every 13th
    * key yields a brand-new synthetic customer. */
  private def updates(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    // insert-key offset derived from the data, not a constant: a fixed
    // +1000000 collides with real keys at larger scale factors, silently
    // turning inserts into updates (and breaking the total order when the
    // same key lands in both branches). +1 because c_custkey starts at 0 —
    // an insert derived from key 0 would otherwise land ON max(c_custkey).
    val maxKey = c.agg(max("c_custkey")).head().getLong(0) + 1
    val changed = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        col("c_name"),
        round(col("c_acctbal") + 100.0, 2).as("c_acctbal"),
        lit("UPDATED").as("c_mktsegment"))
    val inserted = c.filter(col("c_custkey") % 13 === 0)
      .select((col("c_custkey") + lit(maxKey)).as("c_custkey"),
        concat(lit("NEW "), col("c_name")).as("c_name"),
        lit(0.0).as("c_acctbal"),
        lit("NEWSEG").as("c_mktsegment"))
    changed.unionByName(inserted)
  }

  def scd1Upsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val up = updates(s, d)
    base.as("b").join(up.as("u"), base("c_custkey") === up("c_custkey"), "full_outer")
      .select(
        coalesce(col("u.c_custkey"), col("b.c_custkey")).as("c_custkey"),
        coalesce(col("u.c_name"), col("b.c_name")).as("c_name"),
        coalesce(col("u.c_acctbal"), col("b.c_acctbal")).as("c_acctbal"),
        coalesce(col("u.c_mktsegment"), col("b.c_mktsegment")).as("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val scd1UpsertOracle: String = """
WITH up AS (
  SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS c_acctbal,
         'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer),
         concat('NEW ', c_name), 0.0, 'NEWSEG'
  FROM customer WHERE c_custkey % 13 = 0)
SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
       coalesce(u.c_name, b.c_name) AS c_name,
       coalesce(u.c_acctbal, b.c_acctbal) AS c_acctbal,
       coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment
FROM customer b FULL OUTER JOIN up u ON b.c_custkey = u.c_custkey
ORDER BY c_custkey"""

  val SamplePerStratum = 10

  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= SamplePerStratum)
      .select("c_mktsegment", "rnk", "c_custkey", "c_name")
      .orderBy("c_mktsegment", "rnk")
  }

  val stratifiedSampleOracle: String = s"""
SELECT c_mktsegment, rnk, c_custkey, c_name FROM (
  SELECT c_mktsegment, c_custkey, c_name,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
           ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS INT) AS rnk
  FROM customer) t
WHERE rnk <= $SamplePerStratum
ORDER BY c_mktsegment, rnk"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd1_upsert"       -> (scd1Upsert _),
    "stratified_sample" -> (stratifiedSample _)
  )

  val oracleSql: Map[String, String] = Map(
    "scd1_upsert"       -> scd1UpsertOracle,
    "stratified_sample" -> stratifiedSampleOracle
  )
}
