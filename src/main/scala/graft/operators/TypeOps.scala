package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables.t

/** The reference's tested type surface (SURVEY.md §1.2;
  * /root/reference/test/sql/type_support.test) re-expressed with Spark's
  * type system and hash-checked against DuckDB evaluating the *native*
  * types. Data is literal-constructed (the parquet corpus has no
  * unsigned/blob/uuid columns), so these check the type-mapping layer:
  * unsigned widening, decimal arithmetic, temporal/interval math, blob
  * round-trips, UUID canonical form, 128-bit extremes, null semantics.
  *
  * Decimal/extreme outputs are cast to DOUBLE or VARCHAR: DuckDB's
  * pandas bridge renders wide decimals as float64 while Spark parquet
  * keeps exact decimals — a comparator artifact, not an engine gap.
  */
object TypeOps {

  /** Identical SQL text runs on Spark and as the DuckDB oracle. */
  private def sqlBoth(name: String, q: String): NamedQuery =
    NamedQuery(name, Some(q), (s, _) => s.sql(q))

  /** Unsigned types widened per §1.2 (UTINYINT→SMALLINT, USMALLINT→INT,
    * UINTEGER→BIGINT, UBIGINT→DECIMAL(20,0), shown canonically as text);
    * signed extremes exact (type_support.test:21-28,42-44). */
  private val intTypes: NamedQuery = NamedQuery("q33_types_int",
    Some("""SELECT CAST(CAST(255 AS UTINYINT) AS SMALLINT) AS u8,
           |CAST(CAST(65535 AS USMALLINT) AS INTEGER) AS u16,
           |CAST(CAST(4294967295 AS UINTEGER) AS BIGINT) AS u32,
           |CAST(CAST(18446744073709551615 AS UBIGINT) AS VARCHAR) AS u64,
           |CAST(-128 AS TINYINT) AS i8_min, CAST(127 AS TINYINT) AS i8_max,
           |CAST(-32768 AS SMALLINT) AS i16_min,
           |CAST(-2147483648 AS INTEGER) AS i32_min,
           |CAST(9223372036854775807 AS BIGINT) AS i64_max""".stripMargin),
    (s, _) => s.sql(
      """SELECT CAST(255 AS SMALLINT) AS u8, CAST(65535 AS INTEGER) AS u16,
        |CAST(4294967295 AS BIGINT) AS u32, '18446744073709551615' AS u64,
        |CAST(-128 AS TINYINT) AS i8_min, CAST(127 AS TINYINT) AS i8_max,
        |CAST(-32768 AS SMALLINT) AS i16_min,
        |CAST(-2147483648 AS INTEGER) AS i32_min,
        |CAST(9223372036854775807 AS BIGINT) AS i64_max""".stripMargin))

  private val decimalAgg: NamedQuery = sqlBoth("q34_types_decimal",
    """SELECT round(CAST(sum(x) AS DOUBLE), 2) AS sum_d,
      |round(CAST(avg(x) AS DOUBLE), 4) AS avg_d,
      |round(CAST(min(x) AS DOUBLE), 2) AS min_d,
      |round(CAST(max(x) AS DOUBLE), 2) AS max_d, count(x) AS cnt
      |FROM (VALUES (CAST(123.45 AS DECIMAL(10,2))),
      |             (CAST(-67.89 AS DECIMAL(10,2))),
      |             (CAST(0.01 AS DECIMAL(10,2))),
      |             (CAST(9999999.99 AS DECIMAL(10,2))),
      |             (CAST(NULL AS DECIMAL(10,2)))) AS t(x)""".stripMargin)

  private val temporal: NamedQuery = sqlBoth("q35_types_temporal",
    """SELECT CAST(DATE '2024-01-31' + INTERVAL '1' MONTH AS DATE) AS next_month,
      |CAST(TIMESTAMP '2023-06-15 12:30:45' + INTERVAL '90' MINUTE AS TIMESTAMP)
      |  AS plus_90m,
      |CAST(extract(year FROM DATE '2023-06-15') AS BIGINT) AS y,
      |CAST(extract(month FROM DATE '2023-06-15') AS BIGINT) AS m,
      |CAST(extract(day FROM DATE '2023-06-15') AS BIGINT) AS d,
      |CAST(extract(hour FROM TIMESTAMP '2023-06-15 12:30:45') AS BIGINT) AS h,
      |last_day(DATE '2024-02-05') AS ld,
      |CAST(date_trunc('month', DATE '2024-02-15') AS DATE) AS dt""".stripMargin)

  private val blob: NamedQuery = NamedQuery("q36_types_blob",
    Some("""SELECT hex('\xDE\xAD\xBE\xEF'::BLOB) AS h,
           |octet_length('\xDE\xAD\xBE\xEF'::BLOB) AS n,
           |hex('\x00\xFF'::BLOB || '\x10'::BLOB) AS cat""".stripMargin),
    (s, _) => s.sql(
      """SELECT hex(unhex('DEADBEEF')) AS h,
        |CAST(octet_length(unhex('DEADBEEF')) AS BIGINT) AS n,
        |hex(concat(unhex('00FF'), unhex('10'))) AS cat""".stripMargin))

  private val uuid: NamedQuery = NamedQuery("q37_types_uuid",
    Some("""SELECT id, CAST(u AS VARCHAR) AS uuid_str
           |FROM (VALUES (1, CAST('a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11' AS UUID)),
           |             (2, CAST('00000000-0000-0000-0000-000000000000' AS UUID)),
           |             (3, CAST(NULL AS UUID))) AS t(id, u)""".stripMargin),
    (s, _) => s.sql(
      """SELECT id, u AS uuid_str
        |FROM (VALUES (1, 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11'),
        |             (2, '00000000-0000-0000-0000-000000000000'),
        |             (3, CAST(NULL AS STRING))) AS t(id, u)""".stripMargin))

  /** DECIMAL(38,0) covers ±(10^38−1); HUGEINT's true extreme (±1.7e38,
    * 39 digits) exceeds it — carried as VARCHAR, the documented gap
    * (SURVEY §7.4 risk 2). */
  private val hugeint: NamedQuery = NamedQuery("q38_types_hugeint",
    Some("""SELECT CAST(CAST(99999999999999999999999999999999999999 AS HUGEINT)
           |  AS VARCHAR) AS h_max_dec38,
           |CAST(CAST(-99999999999999999999999999999999999999 AS HUGEINT)
           |  AS VARCHAR) AS h_min_dec38,
           |CAST(CAST(170141183460469231731687303715884105727 AS HUGEINT)
           |  AS VARCHAR) AS h_extreme,
           |CAST(CAST(12345678901234567890 AS HUGEINT)
           |  + CAST(98765432109876543210 AS HUGEINT) AS VARCHAR) AS h_sum""".stripMargin),
    (s, _) => s.sql(
      """SELECT CAST(CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0))
        |  AS STRING) AS h_max_dec38,
        |CAST(CAST('-99999999999999999999999999999999999999' AS DECIMAL(38,0))
        |  AS STRING) AS h_min_dec38,
        |'170141183460469231731687303715884105727' AS h_extreme,
        |CAST(CAST(CAST('12345678901234567890' AS DECIMAL(38,0))
        |  + CAST('98765432109876543210' AS DECIMAL(38,0)) AS DECIMAL(38,0))
        |  AS STRING) AS h_sum""".stripMargin))

  private val nulls: NamedQuery = sqlBoth("q39_types_null",
    """SELECT count(*) AS n_all, count(x) AS n_x,
      |CAST(sum(x) AS BIGINT) AS sum_x,
      |coalesce(max(x), -1) AS max_or,
      |CAST(sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |CAST(sum(CASE WHEN x IS NOT DISTINCT FROM y THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_same,
      |CAST(sum(CASE WHEN nullif(x, 2) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_nullif
      |FROM (VALUES (1, 1), (2, NULL), (NULL, NULL), (4, 4), (NULL, 5))
      |  AS t(x, y)""".stripMargin)

  // ---- TIME mapping (§1.2; type_support.test:34,113-121) ----------------
  // Spark has no TIME type: a time-of-day is carried as microseconds since
  // midnight (LONG). Ordering, MIN/MAX and range filters on the LONG are
  // exactly DuckDB's TIME semantics; `timeString` renders DuckDB's
  // canonical display form for output parity.

  /** Time-of-day in microseconds from an epoch-nanosecond LONG column.
    * pmod first (day-remainder ns < 2^47) so the /1000 runs in exact
    * double range — epoch-ns itself exceeds 2^53. */
  def timeOfDayUs(tsNs: Column): Column =
    (pmod(tsNs, lit(86400000000000L)) / lit(1000L)).cast("long")

  /** DuckDB-style TIME rendering: HH:MM:SS with a trailing-zero-trimmed
    * 6-digit fraction ('12:00:00', '01:02:03.5'). */
  def timeString(us: Column): Column = {
    val base = format_string("%02d:%02d:%02d",
      (us / 3600000000L).cast("int"),
      (pmod(us, lit(3600000000L)) / 60000000L).cast("int"),
      (pmod(us, lit(60000000L)) / 1000000L).cast("int"))
    val frac = regexp_replace(
      format_string("%06d", pmod(us, lit(1000000L)).cast("int")), "0+$", "")
    when(frac === "", base).otherwise(concat(base, lit("."), frac))
  }

  /** TIME column: MIN/MAX/filter over events' time-of-day, hash-checked
    * against DuckDB evaluating a native TIME column (ref
    * type_support.test:34,113-121). */
  private val timeType: NamedQuery = NamedQuery("q91_types_time",
    Some("""SELECT count(*) AS n,
           |CAST(min(t) AS VARCHAR) AS min_t,
           |CAST(max(t) AS VARCHAR) AS max_t,
           |CAST(sum(CAST(3600000000 AS BIGINT) * hour(t)
           |  + 60000000 * minute(t) + extract(microseconds FROM t))
           |  AS BIGINT) AS sum_us
           |FROM (SELECT CAST(ts AS TIME) AS t FROM events) x
           |WHERE t >= TIME '06:30:00' AND t < TIME '23:00:00'""".stripMargin),
    (s, d) => {
      t(s, d, "events").select(timeOfDayUs(col("ts_ns")).as("tus"))
        .filter(col("tus") >= 23400000000L && col("tus") < 82800000000L)
        .agg(count(lit(1)).as("n"),
          timeString(min("tus")).as("min_t"),
          timeString(max("tus")).as("max_t"),
          sum("tus").as("sum_us"))
    })

  // ---- stored INTERVAL comparison (§1.2; type_support.test:294-318) -----

  /** DuckDB-style day-time interval rendering: 'N day(s)' plus HH:MM:SS
    * (fraction trimmed), the time part omitted when zero and days
    * nonzero. */
  def dayTimeIntervalString(dur: Column): Column = {
    val d = date_part(lit("DAY"), dur).cast("int")
    val us = (date_part(lit("HOUR"), dur).cast("long") * 3600000000L
      + date_part(lit("MINUTE"), dur).cast("long") * 60000000L
      + (date_part(lit("SECOND"), dur).cast("double") * 1e6).cast("long"))
    val dayPart = when(d === 1, lit("1 day"))
      .otherwise(format_string("%d days", d))
    val timePart = timeString(us)
    when(d === 0, timePart)
      .when(us === 0L, dayPart)
      .otherwise(concat(dayPart, lit(" "), timePart))
  }

  /** DuckDB-style year-month interval rendering ('1 year 2 months'). */
  def yearMonthIntervalString(ym: Column): Column = {
    val y = date_part(lit("YEAR"), ym).cast("int")
    val m = date_part(lit("MONTH"), ym).cast("int")
    val yPart = when(y === 1, lit("1 year"))
      .otherwise(format_string("%d years", y))
    val mPart = when(m === 1, lit("1 month"))
      .otherwise(format_string("%d months", m))
    when(y > 0 && m > 0, concat(yPart, lit(" "), mPart))
      .when(y > 0, yPart).otherwise(mPart)
  }

  /** INTERVAL columns stored in a table, compared against a literal
    * (`dur > INTERVAL '1 day'`), displayed round-trip — the reference's
    * stored-interval surface (type_support.test:294-318). Spark carries
    * ANSI DAY-TO-SECOND / YEAR-TO-MONTH intervals; DuckDB one INTERVAL. */
  private val intervalStored: NamedQuery = NamedQuery("q92_types_interval",
    Some("""SELECT id, CAST(dur AS VARCHAR) AS dur_str,
           |round(CAST(epoch(dur) AS DOUBLE), 1) AS dur_s,
           |CAST(ym AS VARCHAR) AS ym_str
           |FROM (VALUES
           |  (1, INTERVAL '12' HOUR, INTERVAL '3' MONTH),
           |  (2, INTERVAL '1' DAY, INTERVAL '1' YEAR),
           |  (3, INTERVAL '1' DAY + INTERVAL '12' HOUR, INTERVAL '14' MONTH),
           |  (4, INTERVAL '3' DAY + INTERVAL '1' HOUR + INTERVAL '2' MINUTE
           |      + INTERVAL '3500' MILLISECOND, INTERVAL '2' YEAR),
           |  (5, INTERVAL '2' DAY, INTERVAL '1' MONTH)) AS v(id, dur, ym)
           |WHERE dur > INTERVAL '1' DAY ORDER BY id""".stripMargin),
    (s, _) => {
      val rows = s.sql(
        """SELECT id, dur, ym FROM VALUES
          |  (1, INTERVAL '0 12:00:00' DAY TO SECOND, INTERVAL '0-3' YEAR TO MONTH),
          |  (2, INTERVAL '1 00:00:00' DAY TO SECOND, INTERVAL '1-0' YEAR TO MONTH),
          |  (3, INTERVAL '1 12:00:00' DAY TO SECOND, INTERVAL '1-2' YEAR TO MONTH),
          |  (4, INTERVAL '3 01:02:03.5' DAY TO SECOND, INTERVAL '2-0' YEAR TO MONTH),
          |  (5, INTERVAL '2 00:00:00' DAY TO SECOND, INTERVAL '0-1' YEAR TO MONTH)
          |  AS v(id, dur, ym)""".stripMargin)
      val durS = round(
        date_part(lit("DAY"), col("dur")).cast("double") * 86400
          + date_part(lit("HOUR"), col("dur")).cast("double") * 3600
          + date_part(lit("MINUTE"), col("dur")).cast("double") * 60
          + date_part(lit("SECOND"), col("dur")).cast("double"), 1)
      rows.filter(col("dur") > expr("INTERVAL '1 00:00:00' DAY TO SECOND"))
        .select(col("id"),
          dayTimeIntervalString(col("dur")).as("dur_str"),
          durS.as("dur_s"),
          yearMonthIntervalString(col("ym")).as("ym_str"))
        .orderBy("id")
    })

  // ---- TIMESTAMP_NS sub-µs round trip (type_support.test:263-292) -------

  /** Nanosecond precision survives the §1.2 LONG side-channel: Spark
    * carries epoch-nanos as BIGINT (events.ts_ns is this mapping read
    * straight off TIMESTAMP(NANOS) parquet) and renders all 9 fractional
    * digits. The oracle builds the same canonical ns values with BIGINT
    * arithmetic: DuckDB v1.0.0 parses a TIMESTAMP_NS *literal* through
    * the µs path (sub-µs digits are lost before epoch_ns can see them),
    * so integer arithmetic is the precision-honest formulation on both
    * engines. */
  private val timestampNs: NamedQuery = NamedQuery("q93_types_timestamp_ns",
    Some("""SELECT id, CAST(tns AS BIGINT) AS ns_epoch,
           |strftime(make_timestamp(CAST(tns // 1000000000 AS BIGINT)
           |    * 1000000), '%Y-%m-%d %H:%M:%S') || '.' ||
           |  printf('%09d', CAST(tns % 1000000000 AS BIGINT)) AS ns_str
           |FROM (SELECT id, epoch_us(sec) * 1000 + frac AS tns FROM (VALUES
           |  (1, TIMESTAMP '2024-01-01 00:00:00', 123456789),
           |  (2, TIMESTAMP '1999-12-31 23:59:59', 999999999),
           |  (3, TIMESTAMP '2024-06-15 12:30:45', 1)) AS v(id, sec, frac)) x
           |ORDER BY id""".stripMargin),
    (s, _) => s.sql(
      """SELECT id, tns AS ns_epoch,
        |concat(date_format(timestamp_micros((tns DIV 1000000000) * 1000000),
        |  'yyyy-MM-dd HH:mm:ss'), '.',
        |  format_string('%09d', tns % 1000000000)) AS ns_str
        |FROM (SELECT id,
        |  unix_micros(sec) * 1000 + frac AS tns FROM VALUES
        |  (1, TIMESTAMP '2024-01-01 00:00:00', 123456789L),
        |  (2, TIMESTAMP '1999-12-31 23:59:59', 999999999L),
        |  (3, TIMESTAMP '2024-06-15 12:30:45', 1L) AS v(id, sec, frac))
        |ORDER BY id""".stripMargin))

  /** TIMESTAMP_S / TIMESTAMP_MS round-trips (type_support.test:263-292
    * covers all four precisions): Spark's µs TimestampType carries both
    * losslessly; rendering mirrors DuckDB's trailing-zero-trimmed
    * fraction ('.123', '.12', '.001'). */
  private val tsPrecisions: NamedQuery = NamedQuery("q99_types_ts_precisions",
    Some("""SELECT id, CAST(ts_s AS VARCHAR) AS s_str,
           |CAST(ts_ms AS VARCHAR) AS ms_str,
           |CAST(epoch_us(CAST(ts_ms AS TIMESTAMP)) AS BIGINT) AS ms_us
           |FROM (VALUES
           | (1, TIMESTAMP_S '2024-01-01 12:34:56',
           |     TIMESTAMP_MS '2024-01-01 12:34:56.123'),
           | (2, TIMESTAMP_S '1999-12-31 23:59:59',
           |     TIMESTAMP_MS '1999-12-31 23:59:59.120'),
           | (3, TIMESTAMP_S '2000-02-29 00:00:00',
           |     TIMESTAMP_MS '2000-02-29 00:00:00.001'))
           | v(id, ts_s, ts_ms) ORDER BY id""".stripMargin),
    (s, _) => {
      val rows = s.sql(
        """SELECT id, ts_s, ts_ms FROM VALUES
          | (1, TIMESTAMP '2024-01-01 12:34:56',
          |     TIMESTAMP '2024-01-01 12:34:56.123'),
          | (2, TIMESTAMP '1999-12-31 23:59:59',
          |     TIMESTAMP '1999-12-31 23:59:59.120'),
          | (3, TIMESTAMP '2000-02-29 00:00:00',
          |     TIMESTAMP '2000-02-29 00:00:00.001')
          | AS v(id, ts_s, ts_ms)""".stripMargin)
      val frac = regexp_replace(date_format(col("ts_ms"), "SSS"), "0+$", "")
      val msStr = when(frac === "",
        date_format(col("ts_ms"), "yyyy-MM-dd HH:mm:ss"))
        .otherwise(concat(date_format(col("ts_ms"), "yyyy-MM-dd HH:mm:ss"),
          lit("."), frac))
      rows.select(col("id"),
        date_format(col("ts_s"), "yyyy-MM-dd HH:mm:ss").as("s_str"),
        msStr.as("ms_str"),
        unix_micros(col("ts_ms")).as("ms_us"))
        .orderBy("id")
    })

  /** STRUCT / MAP — beyond the reference, which falls back to VARCHAR
    * for nested types (arrow_utils.cpp:616-618; roadmap unchecked).
    * Field access, map extraction, keys/values and cardinality evaluate
    * natively in both engines (DuckDB map extraction yields a list —
    * indexed to the scalar for identical output). */
  private val structMap: NamedQuery = NamedQuery("q100_struct_map",
    Some("""SELECT (struct_pack(a := 7, b := 'x')).a AS sa,
           |(struct_pack(a := 7, b := 'x')).b AS sb,
           |map(['k1','k2'], [10, 20])['k1'][1] AS mv,
           |array_to_string(list_sort(map_keys(map(['k2','k1'], [1, 2]))), ',') AS mk,
           |CAST(cardinality(map(['k1','k2'], [10, 20])) AS BIGINT) AS mlen""".stripMargin),
    (s, _) => s.sql(
      """SELECT named_struct('a', 7, 'b', 'x').a AS sa,
        |named_struct('a', 7, 'b', 'x').b AS sb,
        |map('k1', 10, 'k2', 20)['k1'] AS mv,
        |array_join(sort_array(map_keys(map('k2', 1, 'k1', 2))), ',') AS mk,
        |CAST(size(map('k1', 10, 'k2', 20)) AS BIGINT) AS mlen""".stripMargin))

  def defs: Seq[NamedQuery] =
    Seq(intTypes, decimalAgg, temporal, blob, uuid, hugeint, nulls,
      timeType, intervalStored, timestampNs, tsPrecisions, structMap)
}
