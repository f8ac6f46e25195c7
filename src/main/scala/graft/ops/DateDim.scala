package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar-dimension generator (F1-F4 in SURVEY.md §2.8; reference:
  * etl_script_dlh/etl_lakehouse.py:100-110, etl_script_dwh/etl_dwh.py:52-64).
  *
  * The reference builds a continuous daily calendar spanning
  * [min(order_date), max(order_date)] with `date_sk = int(yyyyMMdd)` plus
  * day/month/year/quarter numbers and English day/month names.
  *
  * Spark-first shape: aggregate the bounds (A1), then `sequence(lo, hi,
  * interval 1 day)` + `explode` — one row in, n rows out, no driver loop.
  * The bounds aggregate is a full pass over the source's date column only
  * (column-pruned parquet scan); the explode happens on a single tiny row.
  * A calendar is at most tens of thousands of rows regardless of data scale,
  * so this operator is scale-independent.
  *
  * Day/month names are mapped from the day-of-week / month NUMBER through
  * explicit English name arrays rather than `date_format` EEEE/MMMM: those
  * patterns follow the JVM default locale, so a non-English JVM would
  * silently break parity with DuckDB's dayname()/monthname() (D4 in
  * SURVEY.md §7.4). The explicit mapping is locale-independent by
  * construction (proven by the Locale.GERMANY spec in MedallionSpec).
  */
object DateDim {

  /** Indexed 1-7 to match `dayofweek` (1 = Sunday). */
  private val DayNames = Seq(
    "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday")

  /** Indexed 1-12 to match `month`. */
  private val MonthNames = Seq(
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December")

  /** Build the calendar dim from the min/max of `dateCol` in `src`.
    * Output schema mirrors the reference's dim_date (etl_lakehouse.py:100-110):
    * full_date, date_sk, day_val, month_val, year_val, quarter_val,
    * day_name, month_name. */
  def fromBounds(src: DataFrame, dateCol: Column): DataFrame = {
    val bounds = src.agg(
      to_date(min(dateCol)).as("lo"),
      to_date(max(dateCol)).as("hi"))
    bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("full_date"))
      .select(
        col("full_date"),
        // arithmetic yyyyMMdd, not date_format("yyyyMMdd"): pattern output
        // digits follow the locale's decimal style on exotic JVMs
        (year(col("full_date")) * 10000 + month(col("full_date")) * 100 +
          dayofmonth(col("full_date"))).cast("int").as("date_sk"),
        dayofmonth(col("full_date")).as("day_val"),
        month(col("full_date")).as("month_val"),
        year(col("full_date")).as("year_val"),
        quarter(col("full_date")).as("quarter_val"),
        element_at(typedlit(DayNames), dayofweek(col("full_date"))).as("day_name"),
        element_at(typedlit(MonthNames), month(col("full_date"))).as("month_name"))
  }
}
